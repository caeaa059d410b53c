package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

class JsonSpec extends SparkSuite {
  import spark.implicits._

  test("parse extracts typed fields against an explicit schema") {
    val df = Seq("""{"k": 42, "tag": "x"}""", """{"k": 7}""").toDF("j")
    val out = df.select(
      Json.extract(col("j"), "k", "k BIGINT, tag STRING").as("k"),
      Json.extract(col("j"), "tag", "k BIGINT, tag STRING").as("tag")).collect()
    assert(out(0).getLong(0) === 42L && out(0).getString(1) === "x")
    assert(out(1).getLong(0) === 7L && out(1).isNullAt(1))
  }

  test("malformed JSON yields null fields, never a failed job") {
    val df = Seq("""{"k": 1}""", "not json at all", null).toDF("j")
    val out = df.select(Json.extract(col("j"), "k", "k BIGINT").as("k")).collect()
    assert(out(0).getLong(0) === 1L)
    assert(out(1).isNullAt(0))
    assert(out(2).isNullAt(0))
  }
}
