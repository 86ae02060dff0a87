package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

class UrlOpsSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def domainOf(host: String): String =
    Seq(host).toDF("h")
      .select(UrlOps.registrableDomain(col("h"))).head().getString(0)

  private def normOf(url: String): String =
    Seq(url).toDF("u")
      .select(UrlOps.normalizeUrl(col("u"))).head().getString(0)

  test("registrableDomain: PSL two-level suffixes, IPs, short hosts") {
    assert(domainOf("www.example.com") == "example.com")
    assert(domainOf("a.b.c.example.com") == "example.com")
    assert(domainOf("news.bbc.co.uk") == "bbc.co.uk")
    assert(domainOf("deep.sub.shop.com.au") == "shop.com.au")
    assert(domainOf("example.com") == "example.com")
    assert(domainOf("localhost") == "localhost")
    assert(domainOf("192.168.1.10") == "192.168.1.10")
  }

  test("normalizeUrl: each decoration canonicalizes away") {
    val canon = "https://site.example.com/p"
    assert(normOf("HTTPS://Site.Example.COM/p") == canon)
    assert(normOf("https://site.example.com:443/p") == canon)
    assert(normOf("https://site.example.com/p/") == canon)
    assert(normOf("https://site.example.com/p#section-2") == canon)
    assert(normOf("https://site.example.com/p?utm_source=x&utm_medium=y") ==
      canon)
    assert(normOf("https://site.example.com/p?id=1&utm_campaign=z&ref=tw") ==
      canon + "?id=1")
    assert(normOf("http://site.example.com:80/p") ==
      "http://site.example.com/p")
    // non-default port and real params survive
    assert(normOf("https://site.example.com:8443/p?a=1") ==
      "https://site.example.com:8443/p?a=1")
    // root trailing slash stays (it IS the path)
    assert(normOf("https://site.example.com/") == "https://site.example.com/")
  }

  test("blocklist drops listed domains, keeps null hosts out of the block") {
    val df = Seq(
      (1L, "www.spam.com"), (2L, "ok.org"), (3L, null: String))
      .toDF("doc_id", "url_host")
    val kept = UrlOps.domainBlocklistFilter(df, Seq("spam.com"))
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(2L, 3L))
  }

  test("capPerDomain keeps the smallest ids per domain, deterministically") {
    val df = (1L to 10L).map(i => (i, if (i % 2 == 0) "a.com" else "b.com"))
      .toDF("doc_id", "url_domain")
    val kept = UrlOps.capPerDomain(df, maxDocs = 2)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("dedupByUrl groups decorated variants under one canonical url") {
    val df = Seq(
      (3L, "https://a.com/x?utm_source=s"),
      (1L, "HTTPS://A.com/x#top"),
      (2L, "https://a.com:443/x/"),
      (9L, "https://b.com/y")).toDF("doc_id", "url")
    val out = UrlOps.dedupByUrl(df)
      .as[(String, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      ("https://a.com/x", 1L, 3L), ("https://b.com/y", 9L, 1L)))
  }
}
