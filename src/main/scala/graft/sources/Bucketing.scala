package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed tables for co-located joins (build brief: "repartition/
  * bucketing for co-located joins").
  *
  * A fact and dim bucketed by the same key into the same bucket count
  * join WITHOUT a shuffle: each task reads matching bucket files from
  * both sides. On a 100 TB fact joined repeatedly on one key this
  * converts every join's full-fact shuffle into a one-time cost paid
  * at write. `sortBy` within buckets additionally lets the join skip
  * the sort phase of sort-merge join.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table at `path`. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .option("path", path)
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — plans with
    * zero Exchange when bucket specs line up. */
  def coLocatedJoin(spark: SparkSession, left: String, right: String,
                    key: String, joinType: String = "inner"): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key), joinType)
}
