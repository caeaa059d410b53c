package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Top-N / per-group top-k (reference: eda.py:69-110,
  * run_dashboard.py:371-498 O5; SURVEY.md §2.5 [EXT] per-group).
  *
  * Global top-N goes through orderBy+limit, which Spark plans as
  * TakeOrderedAndProject (per-partition heap + driver merge of N —
  * no global sort, safe at any scale). Per-group top-k is a window
  * row_number over one shuffle keyed by the group.
  */
object TopK {

  /** Global top-N by a measure, with a unique tiebreak key so results
    * are deterministic under ties. */
  def topN(df: DataFrame, measure: String, tiebreak: String, n: Int): DataFrame =
    df.orderBy(col(measure).desc, col(tiebreak)).limit(n)

  /** Top-k rows per group by a measure (desc), deterministic tiebreak. */
  def perGroup(df: DataFrame, group: String, measure: String, tiebreak: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col(group)).orderBy(col(measure).desc, col(tiebreak))
    df.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Shuffle-light per-group top-k via [[graft.expressions.TopKAggregator]]:
    * the window formulation shuffles EVERY row to its group; this one
    * partial-aggregates bounded k-buffers map-side, shuffles only
    * them, then joins the k winners' tiebreak keys back for the full
    * rows. Same result set as [[perGroup]]; the choice is a plan
    * trade (tiny group count or huge groups → aggregator wins). The
    * tiebreak column must be unique long-castable keys, and the
    * measure is compared as a DOUBLE: long/decimal measures beyond
    * 2^53 can order differently than [[perGroup]]'s native comparison
    * — keep such measures on the window version. */
  def perGroupViaAggregator(df: DataFrame, group: String, measure: String,
                            tiebreak: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val agg = new graft.expressions.TopKAggregator(k).toColumn
    val winners = df
      .select(col(group).cast("string").as("__g"),
        col(measure).cast("double").as("measure"),
        col(tiebreak).cast("long").as("tiebreak"))
      .as[(String, Double, Long)]
      .groupByKey(_._1)
      .mapValues { case (_, m, t) => graft.expressions.Scored(m, t) }
      .agg(agg.name("topk"))
      .flatMap { case (_, buf) =>
        buf.items.zipWithIndex.map { case (s, i) => (s.tiebreak, i + 1) }
      }
      .toDF("__tb", "rank")
    df.join(winners, col(tiebreak).cast("long") === col("__tb"))
      .drop("__tb")
  }
}
