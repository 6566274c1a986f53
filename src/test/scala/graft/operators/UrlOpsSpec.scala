package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(u: String): Option[String] =
    Seq(u).toDF("url").select(UrlOps.canonicalize(col("url")))
      .as[Option[String]].head()

  private def dom(u: String): Option[String] =
    Seq(u).toDF("url").select(UrlOps.domain(col("url")))
      .as[Option[String]].head()

  test("canonicalize lowercases scheme+host, keeps path case") {
    assert(canon("HTTPS://WWW.Example.COM/Docs/A") ===
      Some("https://www.example.com/Docs/A"))
  }

  test("canonicalize strips default ports but keeps explicit ones") {
    assert(canon("http://a.com:80/x") === Some("http://a.com/x"))
    assert(canon("https://a.com:443/x") === Some("https://a.com/x"))
    assert(canon("https://a.com:80/x") === Some("https://a.com:80/x"))
    assert(canon("http://a.com:8080/x") === Some("http://a.com:8080/x"))
  }

  test("canonicalize strips fragments and trailing slashes") {
    assert(canon("https://a.com/x/#sec") === Some("https://a.com/x"))
    assert(canon("https://a.com/x///") === Some("https://a.com/x"))
    assert(canon("https://a.com/") === Some("https://a.com"))
  }

  test("canonicalize drops tracking params, keeps the rest in order") {
    assert(canon("https://a.com/p?utm_source=x&id=3&fbclid=z&q=y") ===
      Some("https://a.com/p?id=3&q=y"))
    assert(canon("https://a.com/p?utm_campaign=x") === Some("https://a.com/p"))
    assert(canon("https://a.com/p?gclid=1&ref=r&mc_eid=m&msclkid=k") ===
      Some("https://a.com/p"))
  }

  test("non-URLs and scheme-less strings canonicalize to NULL") {
    assert(canon("not a url 7") === None)
    assert(canon("example.com/path") === None)
    assert(canon("") === None)
  }

  test("domain is registrable eTLD+1 under the default rule") {
    // every subdomain alias (www or deeper) collapses to the last two labels
    assert(dom("https://WWW.News.Site.ORG:8443/a?b=1") === Some("site.org"))
    assert(dom("http://example.com/x") === Some("example.com"))
    assert(dom("http://deep.sub.example.com/x") === Some("example.com"))
    assert(dom("nonsense") === None)
  }

  test("domain resolves PSL multi-label suffixes to suffix + one label") {
    assert(dom("https://a.b.co.uk/x") === Some("b.co.uk"))
    assert(dom("https://www.bbc.co.uk/news") === Some("bbc.co.uk"))
    assert(dom("http://shop.example.com.au/") === Some("example.com.au"))
    assert(dom("https://www.u-tokyo.ac.jp/") === Some("u-tokyo.ac.jp"))
    // a bare public suffix has no registrable domain
    assert(dom("https://co.uk/") === None)
    // IP hosts and single-label hosts group as themselves
    assert(dom("http://192.168.0.1:8080/x") === Some("192.168.0.1"))
    assert(dom("http://localhost/x") === Some("localhost"))
  }

  test("dedupByUrl collapses tracking/fragment/port variants to min id") {
    val df = Seq(
      (10L, "https://a.com/p?utm_source=x&id=1"),
      (3L, "https://a.com:443/p?id=1#frag"),   // same canonical, smaller id
      (7L, "https://a.com/p?id=2"),            // different kept param
      (9L, "garbage")                          // dropped
    ).toDF("doc_id", "url")
    val out = UrlOps.dedupByUrl(df, "url", "doc_id")
      .select("doc_id", "canonical_url")
      .as[(Long, String)].collect().toSet
    assert(out === Set(
      3L -> "https://a.com/p?id=1",
      7L -> "https://a.com/p?id=2"))
  }

  test("capPerDomain keeps top-cap by priority with deterministic ties") {
    val df = Seq(
      (1L, "https://www.a.com/1", 100L),
      (2L, "https://a.com/2", 300L),
      (3L, "https://a.com:443/3", 300L),  // tie with 2 → doc_id asc wins
      (4L, "https://a.com/4", 50L),
      (5L, "https://b.com/1", 10L)
    ).toDF("doc_id", "url", "n_chars")
    val out = UrlOps.capPerDomain(df, "url", "doc_id", "n_chars", cap = 2)
      .select("domain", "domain_rank", "doc_id")
      .as[(String, Int, Long)].collect().toSet
    assert(out === Set(("a.com", 1, 2L), ("a.com", 2, 3L), ("b.com", 1, 5L)))
  }

  test("capPerDomain fail-fast names the hot domain") {
    val df = (1L to 20L).map(i => (i, "https://hot.com/" + i, i))
      .toDF("doc_id", "url", "n_chars")
    val e = intercept[IllegalArgumentException] {
      UrlOps.capPerDomain(df, "url", "doc_id", "n_chars",
        cap = 2, maxDomainRows = 10L)
    }
    assert(e.getMessage.contains("hot.com") && e.getMessage.contains("20"))
  }
}
