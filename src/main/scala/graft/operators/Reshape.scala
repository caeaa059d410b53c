package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Wide↔long reshaping ([EXT]). The wide direction (pivot) lives in
  * [[Reports.pivotSum]] (planned as conditional sums — one aggregate);
  * this is the long direction (melt/unpivot), the standard prep step
  * before per-metric modeling or plotting.
  */
object Reshape {

  /** Melt `valueCols` into (variable, value) rows, keeping `idCols`.
    * Plans as a Generate (row expansion) — no shuffle, no UDF; value
    * columns must share a common type (cast first — Spark refuses to
    * guess a unification, and silent widening would bite downstream).
    * Null values are KEPT (an observed-but-null metric is a real
    * observation; filter afterwards to drop them). */
  def melt(df: DataFrame, idCols: Seq[String], valueCols: Seq[String],
           varName: String = "metric", valueName: String = "value"): DataFrame =
    df.unpivot(idCols.map(col).toArray, valueCols.map(col).toArray, varName, valueName)
}
