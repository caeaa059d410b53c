package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Profiling / validation / EDA aggregates (reference:
  * src/runnerfile.py:125-245 V1/V2/V4).
  *
  * The reference runs ~3 Spark jobs *per column* (null count,
  * distinct count, sample). Everything here is a single-pass
  * multi-aggregate — O(1) jobs per table regardless of width, which
  * is the difference between minutes and hours on a 100 TB table.
  */
object Profile {

  private def nullCount(c: String): Column =
    sum(when(col(c).isNull, 1).otherwise(0)).cast("long").as(s"${c}_nulls")

  /** One row, `<col>_nulls` per column — single pass (V2/P2). */
  def nullProfile(df: DataFrame): DataFrame =
    df.agg(nullCount(df.columns.head), df.columns.tail.toSeq.map(nullCount): _*)

  /** Data dictionary: per column -> null count + exact distinct count
    * (reference: src/runnerfile.py:125-153 V1). One wide aggregate
    * (Catalyst plans multi-distinct via Expand: still one shuffle
    * round), then a driver-free unpivot of the single result row. */
  def dataDictionary(df: DataFrame): DataFrame = {
    val aggs = df.columns.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1).otherwise(0)).cast("long").as(s"__n_$c"),
        countDistinct(col(c)).as(s"__d_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail.toSeq: _*)
    val entries = df.columns.map { c =>
      struct(lit(c).as("column_name"),
        col(s"__n_$c").as("null_count"),
        col(s"__d_$c").as("distinct_count"))
    }
    wide.select(explode(array(entries.toSeq: _*)).as("e"))
      .select(col("e.column_name"), col("e.null_count"), col("e.distinct_count"))
      .orderBy(col("column_name"))
  }

  /** Per-column sample values (reference: src/runnerfile.py:135 V1 —
    * the data dictionary's "5 sample values"). One `limit(n)` job,
    * transposed driver-side; deliberately NOT collect_list/collect_set
    * aggregates, whose per-group state is unbounded at scale. */
  def columnSamples(df: DataFrame, n: Int = 5): Map[String, Seq[String]] = {
    val rows = df.limit(n).collect()
    df.columns.zipWithIndex.map { case (c, i) =>
      c -> rows.toSeq.map(r => if (r.isNullAt(i)) "null" else r.get(i).toString)
    }.toMap
  }

  /** Approximate flavor of the data dictionary (reference: SURVEY.md
    * A6): HLL++ `approx_count_distinct` instead of exact distinct.
    * At 100 TB this is the default profiling path — no Expand-based
    * multi-distinct, a single streaming aggregate pass; the exact
    * [[dataDictionary]] stays available on demand. Not DuckDB-oracle
    * comparable (different sketch), so its harness check is rows-only. */
  def approxDataDictionary(df: DataFrame, rsd: Double = 0.05): DataFrame = {
    val aggs = df.columns.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1).otherwise(0)).cast("long").as(s"__n_$c"),
        approx_count_distinct(col(c), rsd).as(s"__d_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail.toSeq: _*)
    val entries = df.columns.map { c =>
      struct(lit(c).as("column_name"),
        col(s"__n_$c").as("null_count"),
        col(s"__d_$c").as("approx_distinct_count"))
    }
    wide.select(explode(array(entries.toSeq: _*)).as("e"))
      .select(col("e.column_name"), col("e.null_count"), col("e.approx_distinct_count"))
      .orderBy(col("column_name"))
  }

  /** value_counts (reference: eda.py:110, src/runnerfile.py:209 A9). */
  def valueCounts(df: DataFrame, c: String): DataFrame =
    df.groupBy(col(c))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(c))

  /** Equi-width histogram (reference: src/runnerfile.py:177-245 V4,
    * eda.py numeric histograms). min/max come from a 1-row aggregate
    * cross-joined back (broadcast — no second shuffle of the data).
    * Degenerate input (min == max, where the bucket expression would
    * be 0/0 = NaN) collapses to a single bucket 0; null values are
    * excluded from the histogram (count them via nullProfile). */
  def histogram(df: DataFrame, c: String, buckets: Int = 10): DataFrame = {
    val mm = df.agg(min(col(c)).cast("double").as("__mn"), max(col(c)).cast("double").as("__mx"))
    df.select(col(c).cast("double").as("__v"))
      .where(col("__v").isNotNull)
      .crossJoin(broadcast(mm))
      .select(
        when(col("__mn") === col("__mx"), lit(0L)).otherwise(
          least(
            floor((col("__v") - col("__mn")) / ((col("__mx") - col("__mn")) / buckets)),
            lit(buckets - 1L))).as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("bucket"))
  }

  /** Exact interpolated quantiles per group (V4-family profiling —
    * median/p90 spread summaries). `percentile` is the EXACT
    * sort-based aggregate (same (1-g)·a + g·b interpolation as
    * standard quantile_cont) — right for profiling runs; switch to
    * `approx_percentile` when a sketch is acceptable at 100 TB. */
  def quantiles(df: DataFrame, key: String, measure: String,
                ps: Seq[Double] = Seq(0.5, 0.9)): DataFrame = {
    val aggs = ps.map(p =>
      percentile(col(measure), lit(p)).as(s"p${math.round(p * 100)}"))
    df.groupBy(col(key))
      .agg(aggs.head, aggs.tail: _*)
      .orderBy(col(key))
  }

  /** Pearson correlation per group via EXPLICIT decimal sums, then
    * one identical double expression over them — unlike the built-in
    * `corr` (Welford-style accumulation, result depends on merge
    * order), this is summation-order independent and run-to-run
    * exact. Cross-engine, the SUMS are bit-exact; the final double
    * can still differ by one ULP through an engine's decimal→double
    * conversion (DuckDB double-rounds hugeint-backed decimals), so
    * comparisons round the ratio. Inputs are assumed money/quantity-
    * scaled (≤2 decimal places); products go through DECIMAL(38,4) —
    * wide enough that values up to ~10^17 square without the non-ANSI
    * overflow-to-null a narrower precision would silently produce. */
  def pearsonExact(df: DataFrame, key: String, x: String, y: String): DataFrame = {
    val agg = df.groupBy(col(key)).agg(
      count(lit(1)).as("__n"),
      sum(col(x).cast(DecimalType(18, 2))).as("__sx"),
      sum(col(y).cast(DecimalType(18, 2))).as("__sy"),
      sum((col(x) * col(x)).cast(DecimalType(38, 4))).as("__sxx"),
      sum((col(y) * col(y)).cast(DecimalType(38, 4))).as("__syy"),
      sum((col(x) * col(y)).cast(DecimalType(38, 4))).as("__sxy"))
    def d(c: String) = col(c).cast("double")
    agg.select(col(key),
      ((d("__n") * d("__sxy") - d("__sx") * d("__sy")) /
        (sqrt(d("__n") * d("__sxx") - d("__sx") * d("__sx")) *
          sqrt(d("__n") * d("__syy") - d("__sy") * d("__sy")))).as("corr"))
      .orderBy(col(key))
  }

  /** Share-of-total per category (reference: dashboard top-6 share pie,
    * run_dashboard.py:399-468). Exact decimal sums; one aggregate for
    * the groups, a broadcast 1-row total joined back. */
  def shareOfTotal(df: DataFrame, key: String, measure: String): DataFrame = {
    val grouped = df.groupBy(col(key))
      .agg(sum(col(measure).cast(DecimalType(18, 2))).as("__grp"))
    val total = df.agg(sum(col(measure).cast(DecimalType(18, 2))).as("__tot"))
    grouped.crossJoin(broadcast(total))
      .select(
        col(key),
        col("__grp").cast("double").as("total_measure"),
        // zero/null total -> null share, not NaN/Infinity
        when(col("__tot").isNull || col("__tot") === 0, lit(null))
          .otherwise(col("__grp").cast("double") / col("__tot").cast("double"))
          .as("share"))
      .orderBy(col(key))
  }
}
