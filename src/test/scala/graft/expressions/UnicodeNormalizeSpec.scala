package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSuite

class UnicodeNormalizeSpec extends SparkSuite {
  import spark.implicits._

  private val decomposed = "Cafe" + '\u0301'   // e + combining acute
  private val composed = "Caf\u00e9"      // precomposed é

  test("NFC composes, NFD decomposes, ASCII passes through unchanged") {
    val df = Seq((1L, decomposed), (2L, composed), (3L, "plain ascii"), (4L, null))
      .toDF("id", "s")
    val rows = df.select(col("id"),
      GraftFunctions.unicodeNormalize(col("s"), "NFC").as("nfc"),
      GraftFunctions.unicodeNormalize(col("s"), "NFD").as("nfd"))
      .collect()
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getString(1) === composed)   // NFC composes
    assert(byId(2L).getString(1) === composed)   // already composed: unchanged
    assert(byId(1L).getString(2) === decomposed) // NFD: stays decomposed
    assert(byId(2L).getString(2) === decomposed) // NFD decomposes
    assert(byId(3L).getString(1) === "plain ascii")
    assert(byId(4L).isNullAt(1))                 // null propagates
  }

  test("NFKC folds compatibility characters (ligatures, full-width)") {
    val df = Seq("ﬁle", "ｆｕｌｌ").toDF("s") // fi-ligature; full-width letters
    val out = df.select(GraftFunctions.unicodeNormalize(col("s"), "NFKC"))
      .collect().map(_.getString(0))
    assert(out.toSeq === Seq("file", "full"))
  }

  test("works from pure SQL via the extension registration") {
    val out = spark.sql(
      // combining acute via its UTF-8 bytes: Spark SQL's char() is
      // mod-256 ASCII (not a codepoint constructor like DuckDB's chr)
      s"SELECT graft_unicode_normalize('Cafe' || decode(unhex('CC81'), 'UTF-8'), 'NFC') AS s")
      .head().getString(0)
    assert(out === composed)
  }

  test("normalization makes decomposed and composed spellings fingerprint-equal") {
    // the dedup motivation: same visible text, different codepoints
    val df = Seq((1L, decomposed), (2L, composed)).toDF("id", "s")
    val fps = df.select(
      sha2(GraftFunctions.unicodeNormalize(col("s"), "NFC"), 256).as("fp"))
      .collect().map(_.getString(0))
    assert(fps(0) === fps(1))
    // and WITHOUT normalization they differ — the hole being closed
    val raw = df.select(sha2(col("s"), 256)).collect().map(_.getString(0))
    assert(raw(0) !== raw(1))
  }

  test("invalid form fails analysis loudly") {
    val df = Seq("x").toDF("s")
    val e = intercept[Exception] {
      df.select(GraftFunctions.unicodeNormalize(col("s"), "NFX")).collect()
    }
    assert(e.getMessage.contains("NFC") || e.getMessage.contains("form"))
  }
}
