package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL-level corpus curation (the RefinedWeb/C4 "URL filtering" stage —
  * the FIRST gate a web-scale pipeline runs, before any content is even
  * read): parse, registrable-domain extraction, blocklist filtering,
  * per-domain caps, and normalization-based URL dedup.
  *
  * Everything here is scan-local column expressions (Spark's own
  * codegen'd `parse_url` + regexp/array ops) except [[capPerDomain]],
  * which needs one shuffle by domain — the honest minimum, since a cap
  * is a per-group property. At 100 TB the parse/filter stages stream
  * through the scan; the cap's shuffle carries only (domain, key)
  * pairs after column pruning.
  */
object UrlOps {

  /** Scheme/host/port/path/query columns from a URL string — Spark's
    * codegen'd `parse_url` (null per part when absent/unparsable). */
  def parseUrl(df: DataFrame, urlCol: String = "url"): DataFrame = {
    val u = col(urlCol)
    df.withColumn("url_scheme", lower(parse_url(u, lit("PROTOCOL"))))
      .withColumn("url_host", lower(parse_url(u, lit("HOST"))))
      .withColumn("url_path", parse_url(u, lit("PATH")))
      .withColumn("url_query", parse_url(u, lit("QUERY")))
  }

  /** Two-level public suffixes the simplified registrable-domain rule
    * must not split (a bounded, broadcast-as-literal stand-in for the
    * full Mozilla PSL — swap the list, not the logic). */
  val TwoLevelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp", "com.br", "com.cn", "com.mx", "co.in",
    "co.kr", "com.sg", "com.tr", "co.za")

  /** Registrable domain of a lowercased host: last two labels, or last
    * THREE when the last two form a public suffix (`a.b.co.uk` →
    * `b.co.uk`). IPs and single-label hosts pass through unchanged.
    * Pure array ops — scan-local, codegen-friendly. */
  def registrableDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val lastTwo = concat_ws(".",
      element_at(labels, -2), element_at(labels, -1))
    val lastThree = concat_ws(".",
      element_at(labels, -3), element_at(labels, -2), element_at(labels, -1))
    val isIp = host.rlike("^\\d{1,3}(\\.\\d{1,3}){3}$")
    when(host.isNull || isIp || n <= 2, host)
      .when(lastTwo.isin(TwoLevelSuffixes: _*), lastThree)
      .otherwise(lastTwo)
  }

  /** Drop documents whose registrable domain is blocklisted — the
    * adult/spam/SEO-farm gate every web corpus runs. The blocklist is a
    * literal IN set (real deployments broadcast-join a blocklist table;
    * same plan shape, zero corpus shuffle either way). */
  def domainBlocklistFilter(df: DataFrame, blocked: Seq[String],
      hostCol: String = "url_host"): DataFrame =
    df.withColumn("url_domain", registrableDomain(col(hostCol)))
      .filter(!coalesce(col("url_domain").isin(blocked: _*), lit(false)))

  /** Keep at most `maxDocs` documents per registrable domain,
    * deterministically (ordered by `orderCol` — a stable id, so reruns
    * and engines agree). The one shuffle of the URL stage; heavy-domain
    * skew is exactly what the cap REMOVES, so the output is balanced
    * even when the input is not. */
  def capPerDomain(df: DataFrame, maxDocs: Int,
      domainCol: String = "url_domain",
      orderCol: String = "doc_id"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(domainCol)).orderBy(col(orderCol))
    df.withColumn("__domain_rank", row_number().over(w))
      .filter(col("__domain_rank") <= maxDocs)
      .drop("__domain_rank")
  }

  /** Canonical URL for exact-duplicate detection: lowercase scheme+host,
    * default ports stripped, tracking params (`utm_*`, `gclid`,
    * `fbclid`, `ref`) removed, fragment dropped, trailing slash
    * normalized. Two fetches of the same page under different tracking
    * decorations canonicalize identically. */
  def normalizeUrl(url: Column): Column = {
    // fragment first (everything after #), then tracking params, then
    // dangling ?/&, default ports, trailing slash on a non-root path
    val noFrag = regexp_replace(url, "#.*$", "")
    val noTrack = regexp_replace(noFrag,
      "(?i)[?&](utm_[a-z]+|gclid|fbclid|ref)=[^&#]*", "")
    val fixQ = regexp_replace(
      regexp_replace(noTrack, "\\?&", "?"), "[?&]$", "")
    val noPort = regexp_replace(fixQ, "(?i)^(https?://[^/:]+):(80|443)(/|$)", "$1$3")
    // only when a path segment precedes — the root slash IS the path
    val noSlash = regexp_replace(noPort, "(://[^/]+/.*[^/])/$", "$1")
    // scheme+host lowercase, path/query case preserved (the all-Column
    // regexp_replace overload takes the computed replacement)
    regexp_replace(noSlash, lit("^[A-Za-z][A-Za-z0-9+.-]*://[^/]*"),
      lower(regexp_extract(noSlash, "^([A-Za-z][A-Za-z0-9+.-]*://[^/]*)", 1)))
  }

  /** URL-exact dedup: first-writer-wins (smallest `orderCol`) per
    * canonical URL — one map-side-combining aggregation, the same
    * shape as content dedup ([[Dedup.dedupExact]]). */
  def dedupByUrl(df: DataFrame, urlCol: String = "url",
      orderCol: String = "doc_id"): DataFrame = {
    val canon = normalizeUrl(col(urlCol))
    df.withColumn("__canon_url", canon)
      .groupBy(col("__canon_url"))
      .agg(min(col(orderCol)).as("keep_" + orderCol),
        count(lit(1)).as("n_dupes"))
      .withColumnRenamed("__canon_url", "canonical_url")
  }
}
