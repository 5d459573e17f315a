package graft.text

import graft.SparkSpecBase
import org.apache.spark.sql.functions._

class UrlOpsSpec extends SparkSpecBase {
  import spark.implicits._

  private def norm(urls: String*): Map[String, (String, String)] =
    UrlOps.normalizeUrls(
      urls.zipWithIndex.map { case (u, i) => (i.toLong, u) }
        .toDF("id", "url"), "id", "url")
      .collect().map(r => r.getString(1) ->
        (r.getString(2), r.getString(3))).toMap

  test("the six normalization rules, one URL each") {
    val m = norm(
      "HTTP://WWW.Example.COM:80/a/b/?utm_source=x&q=2#frag",
      "https://sub.example.co.uk:443/",
      "https://example.io:8443/Xy",
      "http://example.com",
      "http://a.com/p?utm_source=1&fbclid=2",
      "http://b.org/q?b=2&a=1")
    // case, www, default port, trailing slash, tracking, fragment
    assert(m("HTTP://WWW.Example.COM:80/a/b/?utm_source=x&q=2#frag") ===
      (("http://example.com/a/b?q=2", "example.com")))
    // https default port; root path stays "/"; multi-label suffix
    assert(m("https://sub.example.co.uk:443/") ===
      (("https://sub.example.co.uk/", "example.co.uk")))
    // non-default port kept; path case preserved
    assert(m("https://example.io:8443/Xy") ===
      (("https://example.io:8443/Xy", "example.io")))
    // empty path becomes "/"
    assert(m("http://example.com") === (("http://example.com/", "example.com")))
    // tracking-only query drops the "?" entirely
    assert(m("http://a.com/p?utm_source=1&fbclid=2") ===
      (("http://a.com/p", "a.com")))
    // surviving params keep their ORIGINAL order (never reordered)
    assert(m("http://b.org/q?b=2&a=1") === (("http://b.org/q?b=2&a=1", "b.org")))
  }

  test("a '?' inside the fragment is NOT a query string (fragment " +
      "strips before path/query parse)") {
    val m = norm(
      "http://a.com/path#a?b=1",
      "http://a.com/p?x=1#y?z=2",
      "http://a.com#?utm_source=t")
    // the fragment's ?b=1 must not survive as a query
    assert(m("http://a.com/path#a?b=1") === (("http://a.com/path", "a.com")))
    // real query kept, fragment (with its inner ?) dropped
    assert(m("http://a.com/p?x=1#y?z=2") === (("http://a.com/p?x=1", "a.com")))
    // fragment-only URL: empty path -> "/", no query
    assert(m("http://a.com#?utm_source=t") === (("http://a.com/", "a.com")))
  }

  test("registrable domain: longest suffix wins; fallbacks are last-two" +
      " labels then the bare host") {
    val hosts = Seq("deep.sub.example.com", "example.co.uk", "x.ac.uk",
      "foo.bar", "localhost").toDF("h")
    val got = hosts.select(col("h"),
      UrlOps.registrableDomain(col("h")).as("d"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("deep.sub.example.com") === "example.com")
    assert(got("example.co.uk") === "example.co.uk")
    assert(got("x.ac.uk") === "x.ac.uk")
    assert(got("foo.bar") === "foo.bar") // unknown suffix: last two labels
    assert(got("localhost") === "localhost") // no dot: bare host
  }

  test("domainCaps: exact integer quota; capped flags only the " +
      "over-quota domains") {
    // 10 docs, cap 30% -> quota 3: a(5 docs) capped, b(3) at quota
    // not capped, c(2) under
    val docs = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c"))
      .zipWithIndex.map { case (d, i) => (i.toLong, d) }
      .toDF("id", "domain")
    val got = UrlOps.domainCaps(docs, "domain", 300000L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getBoolean(5))).toMap
    assert(got("a") === ((5L, 3L, 3L, 2L, true)))
    assert(got("b") === ((3L, 3L, 3L, 0L, false)))
    assert(got("c") === ((2L, 3L, 2L, 0L, false)))
  }

  test("capDocuments keeps the quota-first docs by the stable order " +
      "column, deterministically") {
    val docs = (Seq.fill(4)("a") ++ Seq.fill(2)("b"))
      .zipWithIndex.map { case (d, i) => (i.toLong, d) }
      .toDF("id", "domain")
    // cap 50% of 6 -> quota 3: domain a keeps ids 0,1,2 (drops 3)
    val kept = UrlOps.capDocuments(docs, "domain", "id", 500000L)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Boolean]("kept"))
      .toMap
    assert(kept === Map(0L -> true, 1L -> true, 2L -> true, 3L -> false,
      4L -> true, 5L -> true))
  }
}
