package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

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
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    // `events.ts` is written as micros with isAdjustedToUTC=false, which
    // Spark 4 infers as TIMESTAMP_NTZ. The engine's time family
    // (window(), unix_micros, as-of joins) expects instant semantics, so
    // normalize to TIMESTAMP here. Every entry point pins
    // spark.sql.session.timeZone=UTC, making the cast value-preserving.
    // Older generations wrote NANOS read back as LONG under the legacy
    // conf; keep that normalization too so either vintage loads.
    if (name == "events") df.schema("ts").dataType match {
      case TimestampNTZType => df.withColumn("ts", col("ts").cast("timestamp"))
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _                => df
    } else df
  }
}
