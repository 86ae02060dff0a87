package graft.sql

import org.scalatest.funsuite.AnyFunSuite

/** Rule-3 semantics (`/root/reference/app-gradio.py:138`): strip the
  * `FOR SYSTEM_TIME AS OF` clause from every table, surface one
  * timestamp; plus the numeric-literal ambiguity guards.
  */
class TimeTravelRewriterSpec extends AnyFunSuite {

  test("no clause → unchanged, no timestamp") {
    val r = TimeTravelRewriter.rewrite("SELECT * FROM t")
    assert(r.sql == "SELECT * FROM t" && r.asOfMs.isEmpty)
  }

  test("quoted wall-clock timestamp is stripped and parsed as UTC") {
    val r = TimeTravelRewriter.rewrite(
      "SELECT COUNT(*) FROM customers FOR SYSTEM_TIME AS OF '1970-01-01 00:00:01'")
    assert(r.sql == "SELECT COUNT(*) FROM customers")
    assert(r.asOfMs.contains(1000L))
  }

  test("clause applies to every table — all occurrences stripped (rule 3)") {
    val r = TimeTravelRewriter.rewrite(
      "SELECT * FROM a FOR SYSTEM_TIME AS OF '1970-01-01 00:00:02' " +
        "JOIN b FOR SYSTEM_TIME AS OF '1970-01-01 00:00:02' ON a.id = b.id")
    assert(r.sql == "SELECT * FROM a JOIN b ON a.id = b.id")
    assert(r.asOfMs.contains(2000L))
  }

  test("Spark spelling TIMESTAMP AS OF is accepted") {
    val r = TimeTravelRewriter.rewrite(
      "SELECT * FROM t TIMESTAMP AS OF '2024-01-01'")
    assert(r.sql == "SELECT * FROM t")
    assert(r.asOfMs.contains(
      java.time.LocalDate.parse("2024-01-01").atStartOfDay
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli))
  }

  test("bare date, ISO T separator, and fractional seconds parse") {
    assert(TimeTravelRewriter.parseTimestampMs("2024-01-01") ==
      1704067200000L)
    assert(TimeTravelRewriter.parseTimestampMs("2024-01-01T00:00:00") ==
      1704067200000L)
    assert(TimeTravelRewriter.parseTimestampMs("1970-01-01 00:00:01.500") == 1500L)
    // java.sql.Timestamp.toString trims trailing fraction zeros — every
    // trimmed width must round-trip ('.010' renders '.01', '.100' '.1')
    assert(TimeTravelRewriter.parseTimestampMs("1970-01-01 00:00:01.01") == 1010L)
    assert(TimeTravelRewriter.parseTimestampMs("1970-01-01 00:00:01.1") == 1100L)
    assert(TimeTravelRewriter.parseTimestampMs("1970-01-01 00:00:01.0") == 1000L)
    assert(TimeTravelRewriter.parseTimestampMs(
      "1970-01-01 00:00:01.123456789") == 1123L)
    assert(TimeTravelRewriter.parseTimestampMs("1970-01-01 00:01") == 60000L)
  }

  test("13 digits are epoch millis, 10-11 digits epoch seconds") {
    assert(TimeTravelRewriter.parseTimestampMs("1704067200000") == 1704067200000L)
    assert(TimeTravelRewriter.parseTimestampMs("1704067200") == 1704067200000L)
    assert(TimeTravelRewriter.parseTimestampMs("17040672000") == 17040672000000L)
  }

  test("ambiguous numerics are rejected, not silently guessed") {
    // a bare year
    assertThrows[IllegalArgumentException](TimeTravelRewriter.parseTimestampMs("2026"))
    // a compact date
    assertThrows[IllegalArgumentException](TimeTravelRewriter.parseTimestampMs("20250819"))
    // 12 digits: epoch seconds out to year 33658 but also epoch millis
    // for dates before Sep 2001 — ambiguous either way
    assertThrows[IllegalArgumentException](TimeTravelRewriter.parseTimestampMs("100000000000"))
  }

  test("SYSTEM_VERSION parses a snapshot id, not a timestamp") {
    val r = TimeTravelRewriter.rewrite(
      "SELECT * FROM t FOR SYSTEM_VERSION AS OF 2")
    assert(r.sql == "SELECT * FROM t")
    assert(r.versionId.contains(2L) && r.asOfMs.isEmpty)
    val q = TimeTravelRewriter.rewrite("SELECT * FROM t VERSION AS OF '7'")
    assert(q.versionId.contains(7L))
  }

  test("quoted non-numeric versions are tag refs; bare ones and mixed clauses are rejected") {
    val tg = TimeTravelRewriter.rewrite(
      "SELECT * FROM t FOR SYSTEM_VERSION AS OF 'v1.0'")
    assert(tg.versionTag.contains("v1.0") && tg.versionId.isEmpty)
    // unquoted non-numeric stays an error — a malformed id must not be
    // silently reinterpreted as a ref name
    assertThrows[IllegalArgumentException](
      TimeTravelRewriter.rewrite("SELECT * FROM t FOR SYSTEM_VERSION AS OF abc"))
    assertThrows[IllegalArgumentException](
      TimeTravelRewriter.rewrite(
        "SELECT * FROM a FOR SYSTEM_TIME AS OF '2024-01-01' " +
          "JOIN b FOR SYSTEM_VERSION AS OF 1 ON a.id = b.id"))
  }

  test("garbage literal raises with the offending text") {
    val e = intercept[IllegalArgumentException](
      TimeTravelRewriter.parseTimestampMs("not-a-time"))
    assert(e.getMessage.contains("not-a-time"))
  }
}
