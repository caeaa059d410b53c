package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-provided test tables (TESTDATA.md).
  *
  * Mirrors the reference's zone-table reads (reference:
  * src/common/s3.py:84, src/runnerfile.py:82-86) — a table is a
  * parquet directory/file under a zone root. Explicit column pruning
  * and filters are left to callers so Catalyst pushes them into the
  * scan.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // `events.ts` is physically TIMESTAMP(NANOS), which Spark's parquet
    // reader rejects (PARQUET_TYPE_ILLEGAL). Read nanos as LONG and
    // convert to a microsecond timestamp — Spark's native precision.
    // NOTE: the legacy conf is session-wide and deliberately NOT
    // restored (the scan consults it again at execution time); any
    // later read of a DIFFERENT nanos-timestamp parquet in the same
    // session will therefore surface LONG columns instead of failing.
    // No other nanos files exist in this environment.
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
      if (df.schema("ts").dataType == LongType)
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else df
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }
}
