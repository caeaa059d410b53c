package graft.expressions

import org.apache.spark.sql.functions.col
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSuite

/** Pins [[JaroWinklerSim]] to DuckDB's `jaro_winkler_similarity`.
  * The expected doubles below are DuckDB's own outputs (captured from
  * duckdb 1.x with `SELECT jaro_winkler_similarity(a, b)`); the
  * implementation was additionally fuzz-verified bit-exact against
  * DuckDB over 50k random pairs (ASCII + multi-byte UTF-8, lengths
  * 0-200) before these spot pins were taken. q_jaro_pairs then
  * re-certifies the agreement at data scale every round, UNROUNDED. */
class JaroWinklerSpec extends SparkSuite {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinklerSim.compute(UTF8String.fromString(a), UTF8String.fromString(b))
      .asInstanceOf[Double]

  test("duckdb-pinned values (classic pairs)") {
    assert(jw("martha", "marhta") === 0.9611111111111111)
    assert(jw("dixon", "dicksonx") === 0.8133333333333332)
    assert(jw("jellyfish", "smellyfish") === 0.8962962962962964)
    assert(jw("duane", "dwayne") === 0.8400000000000001)
    assert(jw("crate", "trace") === 0.7333333333333334)
    assert(jw("hello world", "hello word") === 0.9818181818181818)
  }

  test("edges: empties are 0, equality is 1, disjoint is 0, swap-only is 0") {
    assert(jw("", "") === 0.0)
    assert(jw("a", "") === 0.0)
    assert(jw("", "a") === 0.0)
    assert(jw("abc", "abc") === 1.0)
    assert(jw("a", "b") === 0.0)
    assert(jw("ab", "ba") === 0.0)     // window = 0 at length 2
    assert(jw("ABC", "abc") === 0.0)   // case-sensitive, like DuckDB
  }

  test("utf-8 byte semantics (DuckDB convention)") {
    // '日本語' vs '日本': 9 vs 6 bytes, 6 matches
    assert(jw("日本語", "日本") === 0.9333333333333333)
    assert(jw("ü", "u") === 0.0)
    assert(jw("üü", "üü") === 1.0)
  }

  test("winkler boost only above 0.7, prefix capped at 4") {
    // jaro('abcdefgh','abcdxxxx') = 2/3 <= 0.7: no boost despite prefix 4
    assert(jw("abcdefgh", "abcdxxxx") === 0.6666666666666666)
    // dixon/dicksonx: jaro 0.7666..., prefix 2 -> 0.76 + 0.2*(1-0.76)
    assert(jw("dixon", "dicksonx") === 0.8133333333333332)
  }

  test("codegen path (via SQL function) matches interpreted compute") {
    val pairs = Seq(("martha", "marhta"), ("crate", "trace"), ("", ""),
      ("日本語", "日本"), ("abcdefgh", "abcdxxxx"), ("same", "same"))
    val df = pairs.toDF("a", "b")
      .select(col("a"), col("b"), GraftFunctions.jaroWinkler(col("a"), col("b")).as("sim"))
    df.collect().foreach { r =>
      assert(r.getDouble(2) === jw(r.getString(0), r.getString(1)))
    }
    // and through pure SQL (session-extension registration)
    pairs.toDF("a", "b").createOrReplaceTempView("jw_pairs")
    val viaSql = spark.sql(
      "SELECT graft_jaro_winkler(a, b) FROM jw_pairs").collect().map(_.getDouble(0))
    assert(viaSql.toSeq === pairs.map { case (a, b) => jw(a, b) })
  }

  test("nulls propagate; non-string inputs are rejected at analysis") {
    val df = Seq((Some("x"), None: Option[String])).toDF("a", "b")
      .select(GraftFunctions.jaroWinkler(col("a"), col("b")).as("sim"))
    assert(df.head().isNullAt(0))
    val err = intercept[Exception] {
      Seq((1, 2)).toDF("a", "b")
        .select(GraftFunctions.jaroWinkler(col("a"), col("b"))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("string"))
  }
}
