#!/usr/bin/env python3
"""Local mirror of the driver's t2 gate: run graft.Verify, then replay
each oracle SQL in DuckDB over the same parquet tables and compare
row-sets (columns sorted by name, rows sorted, values normalized).

Usage: python3 scripts/check_correctness.py [sfdir] [outdir]
(Verify must have been run first: sbt "runMain graft.Verify <sfdir> <outdir>")
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft-verify")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_val(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, bool):
        return v
    if isinstance(v, int):
        return v
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_val(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def main():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    oracle = json.loads((OUT_DIR / "oracle_sql.json").read_text())
    results = {}
    for name in sorted(p.name for p in OUT_DIR.iterdir() if p.is_dir()):
        res_dir = OUT_DIR / name
        try:
            tbl = pq.read_table(res_dir)
        except Exception as e:
            results[name] = f"UNREADABLE: {e}"
            continue
        got_cols = tbl.column_names
        got_rows = [tuple(row[c] for c in got_cols)
                    for row in tbl.to_pylist()]
        if name not in oracle:
            results[name] = f"rows-only ({len(got_rows)} rows)"
            continue
        try:
            cur = con.execute(oracle[name])
            exp_cols = [d[0] for d in cur.description]
            exp_rows = cur.fetchall()
        except Exception as e:
            results[name] = f"ORACLE ERROR: {e}"
            continue
        gc, gr = norm_rows(got_cols, got_rows)
        ec, er = norm_rows(exp_cols, exp_rows)
        if gc != ec:
            results[name] = f"SCHEMA MISMATCH spark={gc} duck={ec}"
        elif gr != er:
            diff = next((i for i, (a, b) in enumerate(zip(gr, er)) if a != b),
                        min(len(gr), len(er)))
            results[name] = (
                f"VALUE MISMATCH rows spark={len(gr)} duck={len(er)} "
                f"first-diff@{diff}: spark={gr[diff] if diff < len(gr) else '—'} "
                f"duck={er[diff] if diff < len(er) else '—'}")
        else:
            results[name] = f"OK ({len(gr)} rows)"

    n_ok = sum(1 for v in results.values() if v.startswith("OK"))
    n_rowsonly = sum(1 for v in results.values() if v.startswith("rows-only"))
    for k, v in sorted(results.items()):
        flag = " " if v.startswith(("OK", "rows-only")) else "!"
        print(f"{flag} {k}: {v}")
    print(f"\n{n_ok} OK, {n_rowsonly} rows-only, "
          f"{len(results) - n_ok - n_rowsonly} failing, {len(results)} total")
    missing = [k for k in oracle if k not in results]
    if missing:
        print(f"oracle declared but no result written: {missing}")


if __name__ == "__main__":
    main()
