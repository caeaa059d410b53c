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
}
