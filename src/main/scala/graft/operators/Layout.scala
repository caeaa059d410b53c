package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data layout ([EXT]): Morton (Z-order) clustering,
  * the standard trick for making ONE sort order serve range filters on
  * SEVERAL columns. Parquet keeps per-file/rowgroup min-max statistics;
  * data sorted by a single column prunes only on that column, while
  * data sorted by the interleaved code keeps every file's bounding box
  * small in ALL interleaved dimensions — so a selective filter on any
  * of them skips most files at the scan.
  */
object Layout {

  /** Morton interleave of the low `bits` bits of two non-negative
    * integral columns: bit i of `a` lands at position 2i, bit i of
    * `b` at 2i+1. Pure unrolled shift/mask/or — codegen'd end to end
    * and expressible verbatim in any SQL engine. Callers bucket raw
    * values into [0, 2^bits) first (e.g. `pmod` or range-rank). */
  def mortonInterleave(a: Column, b: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, s"bits must be in [1, 31]: $bits")
    (0 until bits).map { i =>
      (shiftright(a.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))) +
        (shiftright(b.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
    }.reduce(_ + _)
  }

  /** Write `df` Z-clustered on two dimension columns: range-partition
    * then sort by the Morton code, so each output file covers a small
    * bounding box in BOTH dimensions. `numFiles` sizes the layout
    * (files ≈ rowgroups at scale). The code column is dropped — it is
    * layout, not data. */
  def zorderWrite(df: DataFrame, path: String, colA: String, colB: String,
                  bits: Int, numFiles: Int): Unit = {
    require(!df.columns.contains("__z"),
      "zorderWrite reserves the __z column name — rename it on the input")
    val coded = df.withColumn("__z",
      mortonInterleave(col(colA), col(colB), bits))
    coded
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(path)
  }
}
