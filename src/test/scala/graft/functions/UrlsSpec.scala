package graft.functions

import org.apache.spark.sql.functions.col

import graft.SparkSuite

class UrlsSpec extends SparkSuite {
  import spark.implicits._

  private def one(url: String, c: org.apache.spark.sql.Column => org.apache.spark.sql.Column): String = {
    val r = Seq(url).toDF("u").select(c(col("u")).as("r")).head()
    if (r.isNullAt(0)) null else r.getString(0)
  }

  test("host/domain/path/param extraction") {
    val u = "https://News.Sub.Example.COM/a/b/c?x=1&lang=en#frag"
    assert(one(u, Urls.host) === "news.sub.example.com")
    assert(one(u, Urls.domain) === "example.com")
    assert(one(u, Urls.path) === "/a/b/c")
    assert(one(u, c => Urls.queryParam(c, "lang")) === "en")
    assert(one(u, c => Urls.queryParam(c, "missing")) === null)
    // bare-host URL: empty path, no query
    assert(one("https://example.com", Urls.domain) === "example.com")
    assert(one("https://example.com", c => Urls.queryParam(c, "x")) === null)
  }

  test("stripTracking removes the pairs and tidies every separator shape") {
    // tracking first, middle, last, and only
    assert(one("https://e.com/p?utm_source=a&keep=1", Urls.stripTracking)
      === "https://e.com/p?keep=1")
    assert(one("https://e.com/p?keep=1&utm_medium=b&also=2", Urls.stripTracking)
      === "https://e.com/p?keep=1&also=2")
    assert(one("https://e.com/p?keep=1&gclid=xyz", Urls.stripTracking)
      === "https://e.com/p?keep=1")
    assert(one("https://e.com/p?fbclid=z", Urls.stripTracking)
      === "https://e.com/p")
    // untouched URLs come back identical
    assert(one("https://e.com/p?a=1&b=2", Urls.stripTracking)
      === "https://e.com/p?a=1&b=2")
    assert(one("https://e.com/plain", Urls.stripTracking)
      === "https://e.com/plain")
  }

  test("stripTracking is anchored: params merely CONTAINING a tracking name survive") {
    // canonical URLs are dedup keys — an unanchored match silently
    // merged '?xgclid=1' with '?x' (distinct URLs, one key)
    assert(one("https://e.com/p?xgclid=1", Urls.stripTracking)
      === "https://e.com/p?xgclid=1")
    assert(one("https://e.com/p?my_utm_test=2", Urls.stripTracking)
      === "https://e.com/p?my_utm_test=2")
    assert(one("https://e.com/p?a=1&nofbclid=3", Urls.stripTracking)
      === "https://e.com/p?a=1&nofbclid=3")
    // while the genuinely-anchored pair still dies, even adjacent ones
    assert(one("https://e.com/p?gclid=1&utm_x=2", Urls.stripTracking)
      === "https://e.com/p")
    assert(one("https://e.com/p?utm_a=1&utm_b=2&lang=en", Urls.stripTracking)
      === "https://e.com/p?lang=en")
  }
}
