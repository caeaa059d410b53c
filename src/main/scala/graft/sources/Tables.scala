package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
