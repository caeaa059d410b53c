package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The reference's two curated report queries, re-expressed over the
  * TPC-H-ish star schema (fact `lineitem` ~ prescriber_drug, dim
  * `part` ~ drug, `supplier`+`nation` ~ prescriber+state).
  *
  * Shape (reference: src/helpers/transform_data.py:77-141): big fact
  * aggregate, then left equi-join against small dimensions — the
  * canonical broadcast-hash-join pattern. We broadcast the dims
  * explicitly: at 100 TB the fact side shuffles only for its own
  * groupBy keys; the dim join adds no shuffle.
  *
  * Money/quantity sums go through DECIMAL(18,s) so results are exact
  * and order-independent (a parallel double sum is neither) — this is
  * also what makes the DuckDB oracle hash-match.
  */
object Reports {

  /** Exact, order-independent sum of a double measure. */
  def dsum(c: org.apache.spark.sql.Column, scale: Int = 2): org.apache.spark.sql.Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** drug_report analog (reference: src/helpers/transform_data.py:89-104
    * A1+J1, src/runnerfile.py:383 A3): per-product claim/cost totals
    * joined to the product dimension. */
  def drugReport(lineitem: DataFrame, part: DataFrame): DataFrame =
    lineitem
      .groupBy(col("l_partkey"))
      .agg(
        dsum(col("l_quantity")).as("total_claims"),
        dsum(col("l_extendedprice")).as("total_cost"))
      .join(broadcast(part.select(col("p_partkey"), col("p_name"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"), "left")
      .select(col("l_partkey"), col("total_claims"), col("total_cost"),
        col("p_name"), col("p_brand"))
      .orderBy(col("l_partkey"))

  /** prescriber_report analog (reference:
    * src/helpers/transform_data.py:120-136 A2+J2+J3,
    * src/runnerfile.py:418-427 A4): per-supplier totals + count,
    * joined to supplier then to nation via the cross-name key
    * (s_nationkey = n_nationkey, like presc_state_code = state_code). */
  def prescriberReport(lineitem: DataFrame, supplier: DataFrame, nation: DataFrame): DataFrame = {
    val totals = lineitem
      .groupBy(col("l_suppkey"))
      .agg(
        count(lit(1)).as("num_prescriptions"),
        dsum(col("l_quantity")).as("total_claims"),
        dsum(col("l_extendedprice")).as("total_cost"))
    totals
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"), "left")
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"), "left")
      .select(col("l_suppkey"), col("num_prescriptions"), col("total_claims"),
        col("total_cost"), col("s_name"), col("n_name").as("state_name"))
      .orderBy(col("l_suppkey"))
  }

  /** TPC-H Q1-shaped pricing summary — the densest version of the
    * reference's groupBy+sum surface (A1/A2). Revenue term is cast to
    * decimal per-row *before* the sum so the aggregate is exact. */
  def pricingSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast(DecimalType(18, 4))).cast("double").as("sum_disc_price"),
        count(lit(1)).as("n_rows"))
      .withColumn("avg_qty", col("sum_qty") / col("n_rows"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** A3 parity query (reference: src/runnerfile.py:371-389): the
    * reference's measure-column heuristic is last-match-wins over
    * `count|qty|...|cost`, so its "prescriptions" column is actually a
    * *cost* sum — reproduced here deliberately (SURVEY.md §2.4 A3).
    * Fact joins broadcast dim first, then aggregates by brand. */
  def brandReport(lineitem: DataFrame, part: DataFrame): DataFrame =
    lineitem.select(col("l_partkey"), col("l_extendedprice"))
      .join(broadcast(part.select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(dsum(col("l_extendedprice")).as("prescriptions"))
      .orderBy(col("prescriptions").desc, col("p_brand"))

  /** Wide pivot: one row per `rowKey`, one decimal-summed measure
    * column per pivot value. `pivotValues` is EXPLICIT: the value set
    * must be known, not discovered, at 100 TB (Spark's `.pivot()`
    * without values runs a driver-side distinct job first), and an
    * explicit list makes the output schema stable. Spelled as
    * conditional sums rather than the `.pivot()` API: `.pivot()`
    * plans an extra aggregate layer (agg by (rowKey, pivotCol), then
    * pivot-agg by rowKey — two shuffles); the `sum(when(...))`
    * spelling is ONE hash aggregate with map-side partials. A
    * (rowKey, pivotValue) pair with no rows yields null, matching
    * SQL's `sum(CASE WHEN ...)`. */
  def pivotSum(df: DataFrame, rowKey: String, pivotCol: String,
               pivotValues: Seq[String], measure: String,
               prefix: String = ""): DataFrame = {
    require(pivotValues.nonEmpty, "pivotSum needs an explicit pivot-value list")
    val aggs = pivotValues.map(v =>
      dsum(when(col(pivotCol) === v, col(measure))).as(s"$prefix$v"))
    df.groupBy(col(rowKey))
      .agg(aggs.head, aggs.tail: _*)
      .orderBy(col(rowKey))
  }

  /** Dashboard KPI row (reference: run_dashboard.py:353-364): distinct
    * drugs/prescribers + total claims/cost, one pass over the fact. */
  def kpis(lineitem: DataFrame): DataFrame =
    lineitem.agg(
      countDistinct(col("l_partkey")).as("n_drugs"),
      countDistinct(col("l_suppkey")).as("n_prescribers"),
      count(lit(1)).as("n_rows"),
      dsum(col("l_quantity")).as("total_claims"),
      dsum(col("l_extendedprice")).as("total_cost"))

  /** TPC-H Q5-shaped multi-hop dimension chain: revenue per nation for
    * one region — fact ⋈ supplier ⋈ nation ⋈ region with the region
    * filter applied BEFORE the broadcasts, so the pruned dims shrink
    * every join build side. The fact never shuffles for the joins;
    * only the final groupBy exchanges one row per nation. */
  def regionalRevenue(lineitem: DataFrame, supplier: DataFrame,
                      nation: DataFrame, region: DataFrame, regionName: String): DataFrame = {
    val dims = supplier.select(col("s_suppkey"), col("s_nationkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"), col("n_regionkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region.where(col("r_name") === regionName).select(col("r_regionkey"))),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("n_name"))
    lineitem.select(col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
      .join(broadcast(dims), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("n_name"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast(DecimalType(18, 4))).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Hierarchical share rollup ([EXT]) — revenue per nation with its
    * share WITHIN the region and the region's share of the grand
    * total: the percent-of-parent drill-down every BI layer puts on
    * top of [[regionalRevenue]]'s flat slice. All shares are windows
    * over the POST-aggregate rows (|nations| rows — bounded by the
    * dimension, never the fact; the tfIdf no-recompute discipline),
    * dividing one exact decimal-derived double by another. The fact
    * is touched once: broadcast dim joins, one nation-keyed
    * aggregate. */
  def shareHierarchy(lineitem: DataFrame, supplier: DataFrame,
                     nation: DataFrame, region: DataFrame): DataFrame = {
    val dims = supplier.select(col("s_suppkey"), col("s_nationkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"), col("n_regionkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region.select(col("r_regionkey"), col("r_name"))),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("n_name"), col("r_name"))
    val byNation = lineitem
      .select(col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
      .join(broadcast(dims), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast(DecimalType(18, 4))).as("__rev"))
    val byRegion = org.apache.spark.sql.expressions.Window.partitionBy(col("r_name"))
    val all = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    byNation
      .withColumn("__region_rev", sum(col("__rev")).over(byRegion))
      .withColumn("__total_rev", sum(col("__rev")).over(all))
      .select(col("r_name"), col("n_name"),
        col("__rev").cast("double").as("revenue"),
        // shares are rendered 6-dp: the decimal window sums are exact,
        // but their double render can differ by one ULP across engines
        // (the q_corr lesson), and a divide amplifies that
        round(col("__rev").cast("double") / col("__region_rev").cast("double"), 6)
          .as("share_in_region"),
        round(col("__region_rev").cast("double") / col("__total_rev").cast("double"), 6)
          .as("region_share"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** Calendar rollup ([EXT]) — order counts and revenue by (year,
    * quarter, month, day-of-week): the date-dimension breakdown every
    * reporting layer derives, certifying the calendar-function
    * surface (`year/quarter/month/dayofweek`) against the oracle.
    * Day-of-week is normalized to ISO 1=Monday..7=Sunday — Spark's
    * `dayofweek` is 1=Sunday..7=Saturday, DuckDB's `dayofweek`
    * 0=Sunday..6=Saturday; both sides map onto the unambiguous ISO
    * convention rather than papering over a different default.
    * One pruned scan, one bounded aggregate. */
  def calendarRollup(orders: DataFrame, tsCol: String = "o_orderdate"): DataFrame = {
    val ts = col(tsCol)
    graft.functions.TimeCol.instant(orders, tsCol)
      .groupBy(year(ts).as("y"), quarter(ts).as("q"),
        month(ts).as("m"),
        // Spark 1=Sun..7=Sat → ISO 1=Mon..7=Sun
        (pmod(dayofweek(ts) + lit(5), lit(7)) + lit(1)).as("iso_dow"))
      .agg(count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("revenue"))
      .orderBy(col("y"), col("q"), col("m"), col("iso_dow"))
  }

  /** Date-range slice of the fact — at scale this is the partition-
    * pruning / row-group-statistics query shape (the predicate lands
    * in PushedFilters). */
  def shippedBetween(lineitem: DataFrame, fromDate: String, untilDate: String): DataFrame =
    lineitem
      .where(col("l_shipdate") >= lit(fromDate).cast("timestamp") &&
        col("l_shipdate") < lit(untilDate).cast("timestamp"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("l_returnflag"))

  /** Revenue per market segment: lineitem ⋈ orders is LARGE-to-LARGE
    * — a genuine shuffle (sort-merge) join on the order key, the one
    * join shape broadcasting can't remove. At scale both sides
    * benefit from being bucketed by the key ([[graft.sources.Bucketing]]);
    * AQE handles skewed order keys. The customer dim stays broadcast. */
  def segmentRevenue(lineitem: DataFrame, orders: DataFrame, customer: DataFrame): DataFrame =
    lineitem.select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      .join(orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer.select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast(DecimalType(18, 4))).cast("double").as("revenue"))
      .orderBy(col("c_mktsegment"))

  /** Customers with at least one order — left-semi join (EXISTS). */
  def customersWithOrders(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.join(orders, customer("c_custkey") === orders("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  /** Customers with no orders — left-anti join (NOT EXISTS). */
  /** Anti-join churn report: customers with NO orders on/after
    * `since`. The cutoff is part of the semantics (an all-time
    * anti-join over the synthetic fact returns the empty set at the
    * small gate scales, and a row that certifies the empty set
    * certifies nothing — the round-15 verdict's vacuity finding); the
    * anti-join itself stays the broadcast-able left_anti Catalyst
    * plans from this shape. */
  def customersWithoutOrders(customer: DataFrame, orders: DataFrame,
                             since: String = "1997-01-01"): DataFrame = {
    val recent = orders.where(col("o_orderdate") >= to_date(lit(since)))
    customer.join(recent, customer("c_custkey") === recent("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** Hierarchical subtotals via ROLLUP: per (flag, status), per flag,
    * and grand total in one pass (Catalyst plans it as one Expand +
    * aggregate — not three queries over the fact). */
  def rollupSummary(lineitem: DataFrame): DataFrame =
    lineitem.rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_rows"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** CUBE over both keys: every subtotal combination (ROLLUP's
    * hierarchical subset plus the column-wise marginals) in one
    * Expand pass — same engine mechanics as [[rollupSummary]]. */
  def cubeSummary(lineitem: DataFrame): DataFrame =
    lineitem.cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_rows"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** GROUPING SETS over an arbitrary (non-hierarchical) set list —
    * the general form ROLLUP and CUBE specialize: here the detail
    * cell, one marginal, and the grand total, in ONE Expand pass.
    * `grouping()` flags ride along so consumers can tell a subtotal
    * NULL from a data NULL — the disambiguation CUBE output needs at
    * scale where group columns are nullable. */
  def groupingSetsSummary(lineitem: DataFrame): DataFrame =
    lineitem.groupingSets(
        Seq(Seq(col("l_returnflag"), col("l_linestatus")),
          Seq(col("l_linestatus")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(grouping(col("l_returnflag")).cast("int").as("g_rf"),
        grouping(col("l_linestatus")).cast("int").as("g_ls"),
        count(lit(1)).as("n_rows"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("g_rf"), col("g_ls"),
        col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** Per-key row-count report (reference: src/runnerfile.py:418 A4). */
  def countPerKey(df: DataFrame, key: String): DataFrame =
    df.groupBy(col(key))
      .agg(count(lit(1)).as("num_prescriptions"))
      .orderBy(col("num_prescriptions").desc, col(key))

  /** Ordered group collect (array_agg): per key, the SORTED list of
    * values rendered as a joined string. collect_list's order is
    * partition-arrival order — nondeterministic — so the sort inside
    * the aggregate output is what makes the result reproducible (and
    * cross-engine comparable; the string rendering mirrors SQL
    * string_agg ... ORDER BY). `n` counts the COLLECTED values —
    * `count(valueCol)`, skipping nulls exactly as collect_list does,
    * so it always equals the rendered list's length (a raw row count
    * would diverge on nullable value columns). Unbounded group state:
    * cap group sizes upstream ([[TopK.perGroup]]) if keys can be
    * hot. */
  def collectPerKey(df: DataFrame, key: String, valueCol: String): DataFrame =
    df.groupBy(col(key))
      .agg(array_join(
        transform(array_sort(collect_list(col(valueCol))), _.cast("string")),
        ",").as("values_csv"),
        count(col(valueCol)).as("n"))
      .orderBy(col(key))

  /** Cohort retention matrix ([EXT]): users grouped by FIRST-activity
    * day; each cell counts how many of a cohort were active again
    * `day_offset` days later — the standard engagement/retention
    * triangle, over the events stream table.
    *
    * Shape: first-activity and the distinct (user, day) activity set
    * are both map-side-combined aggregates keyed by user; the
    * cohort-tag join is keyed by user too, so with AQE it reuses the
    * same hash partitioning (no extra exchange beyond the three
    * aggregates). Cells are counts of an already-distinct set, so a
    * plain `count(*)` is exact — no count-distinct shuffle. Day
    * arithmetic is integer `datediff` on DATE — engine-exact, no
    * timezone rounding (session timezone pins the ts→date cast). */
  /** Ordered funnel analysis ([EXT]) — per-user step completion in
    * strict timestamp order: a user reaches step i at the EARLIEST
    * event of that type occurring strictly after their step-(i-1)
    * time (the standard "min-ts after previous step" funnel, immune
    * to out-of-order step types). One row per step with reach and
    * conversion shares.
    *
    * Shape: one conditional-min aggregate per step, every one keyed
    * on the user column — the same shuffle partitioning reused
    * across all k joins (AQE/exchange reuse; at scale, bucketing the
    * events table by user makes the whole chain exchange-free). k is
    * the funnel length (single digits), never the data. The final
    * rollup is one tiny aggregate over n_users rows; conversion
    * shares divide exact longs (engine-reproducible). */
  def funnel(events: DataFrame, steps: Seq[String],
             typeCol: String = "event_type", tsCol: String = "ts",
             userCol: String = "user_id"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    // (user, t0, t1, ..., t_{k-1}) with NULL from the first missed
    // step on — dropouts stay as rows (left joins), so ONE final
    // aggregate counts every step. No driver action per step (a
    // per-step count() would replay the whole chain k times).
    var acc = events.where(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t0"))
    for ((step, i) <- steps.tail.zipWithIndex) {
      val si = events.where(col(typeCol) === step)
        .join(acc.select(col(userCol), col(s"t$i")), Seq(userCol))
        .where(col(tsCol) > col(s"t$i"))
        .groupBy(col(userCol)).agg(min(col(tsCol)).as(s"t${i + 1}"))
      acc = acc.join(si, Seq(userCol), "left")
    }
    val counts = acc.agg(
      count(col("t0")).as("c0"),
      steps.indices.tail.map(i => count(col(s"t$i")).as(s"c$i")): _*)
    def conv(num: Int, den: Int): Column =
      when(col(s"c$den") > 0,
        round(col(s"c$num").cast("double") / col(s"c$den").cast("double"), 6))
    val entries = steps.zipWithIndex.map { case (name, i) =>
      struct(lit(i).as("step_idx"), lit(name).as("step"),
        col(s"c$i").as("n_users"),
        conv(i, 0).as("conv_from_first"),
        conv(i, math.max(i - 1, 0)).as("conv_from_prev"))
    }
    counts.select(explode(array(entries: _*)).as("e"))
      .select(col("e.step_idx"), col("e.step"), col("e.n_users"),
        col("e.conv_from_first"), col("e.conv_from_prev"))
      .orderBy(col("step_idx"))
  }

  /** Funnel velocity ([EXT]) — [[funnel]] says how many convert, this
    * says how FAST: per adjacent step pair, the median and p90 gap
    * between a user's first step-i and first subsequent step-i+1
    * (the same earliest-qualifying-times chain funnel builds — one
    * pass, no per-step driver action), through the certified
    * percentile == quantile_cont bridge on exact micros. The
    * slow-step diagnosis conversion ratios can't make. */
  def funnelTiming(events: DataFrame, steps: Seq[String],
                   typeCol: String = "event_type", tsCol: String = "ts",
                   userCol: String = "user_id"): DataFrame = {
    require(steps.size >= 2, "funnelTiming needs at least two steps")
    var acc = events.where(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t0"))
    for ((step, i) <- steps.tail.zipWithIndex) {
      val si = events.where(col(typeCol) === step)
        .join(acc.select(col(userCol), col(s"t$i")), Seq(userCol))
        .where(col(tsCol) > col(s"t$i"))
        .groupBy(col(userCol)).agg(min(col(tsCol)).as(s"t${i + 1}"))
      acc = acc.join(si, Seq(userCol), "left")
    }
    val entries = steps.indices.tail.map { i =>
      val gap = (unix_micros(col(s"t$i")) - unix_micros(col(s"t${i - 1}")))
        .cast("double")
      struct(lit(i - 1).as("step_idx"),
        lit(s"${steps(i - 1)} -> ${steps(i)}").as("transition"),
        count(col(s"t$i")).as("n_users"),
        round(percentile(gap, lit(0.5)) / 1000000.0, 3).as("median_s"),
        round(percentile(gap, lit(0.9)) / 1000000.0, 3).as("p90_s"))
        .as(s"__e$i")
    }
    acc.agg(entries.head, entries.tail: _*)
      .select(explode(array(
        steps.indices.tail.map(i => col(s"__e$i")): _*)).as("e"))
      .select(col("e.*"))
      .orderBy(col("step_idx"))
  }

  /** Session-scoped funnel ([EXT]) — [[funnel]] with the SESSION, not
    * the user's whole history, as the conversion unit: "how many
    * sessions view→click→purchase" is the product-analytics number
    * (a purchase three weeks after the view is retention, not
    * funnel conversion). Pure composition: [[graft.operators.Windows
    * .sessionIds]] assigns the unit, a composite key feeds the same
    * funnel chain — the session rollup inherits funnel's one-shuffle-
    * per-step shape on the (user, session) key. */
  def sessionFunnel(events: DataFrame, steps: Seq[String], gapUs: Long): DataFrame =
    funnel(
      graft.operators.Windows.sessionIds(events, gapUs)
        .withColumn("__skey", concat_ws("#", col("user_id"), col("session_seq"))),
      steps, typeCol = "event_type", tsCol = "ts_us", userCol = "__skey")
      .withColumnRenamed("n_users", "n_sessions")

  /** Last-touch attribution ([EXT]) — for every conversion event, the
    * type of the user's most recent PRIOR non-conversion event within
    * a lookback horizon, else `direct`: the standard marketing/
    * channel-attribution query ([[funnel]] measures the designed
    * path; attribution credits the channel that actually preceded
    * each conversion). `gap_us` (conversion minus touch time) is NULL
    * for direct conversions.
    *
    * Shape: one user-keyed shuffle serves both running windows; the
    * two `last(..., ignoreNulls)` calls share one condition, so they
    * read the SAME row (no struct needed for consistency). The frame
    * excludes the current row, so a conversion never attributes to
    * itself, and consecutive conversions skip over each other to the
    * last real touch. (ts, event_id) makes the order total. */
  def lastTouchAttribution(events: DataFrame, convType: String = "purchase",
                           lookbackUs: Long = 7L * 24 * 3600 * 1000000,
                           typeCol: String = "event_type",
                           userCol: String = "user_id"): DataFrame = {
    require(lookbackUs > 0, s"lookback must be positive: $lookbackUs")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col("__us"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val touch = col(typeCol) =!= convType
    val within = col("__lt_us").isNotNull && col("__us") - col("__lt_us") <= lookbackUs
    graft.functions.TimeCol.instant(events)
      .select(col("event_id"), col(userCol).as("user_id"), col(typeCol),
        unix_micros(col("ts")).as("__us"))
      .withColumn("__lt_type", last(when(touch, col(typeCol)), ignoreNulls = true).over(w))
      .withColumn("__lt_us", last(when(touch, col("__us")), ignoreNulls = true).over(w))
      .where(col(typeCol) === convType)
      .select(col("event_id"), col("user_id"), col("__us").as("conv_us"),
        when(within, col("__lt_type")).otherwise(lit("direct")).as("channel"),
        when(within, col("__us") - col("__lt_us")).as("gap_us"))
      .orderBy(col("event_id"))
  }

  /** Position-based (U-shaped) multi-touch attribution ([EXT]) — the
    * fractional-credit complement of [[lastTouchAttribution]]: every
    * touch inside the conversion's lookback window shares the credit
    * (first and last 0.4 each, middles splitting 0.2; single-touch
    * paths take 1.0, two-touch 0.5/0.5 — the standard U-shape).
    * The lookback-window model deliberately lets one touch credit
    * several later conversions (each conversion's path is judged
    * independently — the industry-standard reading).
    *
    * Scale shape: the (conversion, touch) pairs come from a per-user
    * time-predicate join — bounded by per-user activity inside ONE
    * lookback window, never user-history². Credits are rounded to
    * DECIMAL(18,6) BEFORE summing: fractional credits summed as
    * doubles would make channel totals partitioning-dependent. */
  def positionAttribution(events: DataFrame, convType: String = "purchase",
                          lookbackUs: Long = 7L * 24 * 3600 * 1000000,
                          typeCol: String = "event_type",
                          userCol: String = "user_id"): DataFrame = {
    require(lookbackUs > 0, s"lookback must be positive: $lookbackUs")
    import org.apache.spark.sql.expressions.Window
    val ev = graft.functions.TimeCol.instant(events)
      .select(col("event_id"), col(userCol).as("user_id"),
        col(typeCol).as("etype"), unix_micros(col("ts")).as("__us"))
    val convs = ev.where(col("etype") === convType)
      .select(col("user_id"), col("event_id").as("conv_id"),
        col("__us").as("conv_us"))
    val touches = ev.where(col("etype") =!= convType)
      .select(col("user_id"), col("event_id").as("touch_id"),
        col("etype").as("channel"), col("__us").as("touch_us"))
    val pairs = convs.join(touches, Seq("user_id"))
      .where(col("touch_us") < col("conv_us") &&
        col("conv_us") - col("touch_us") <= lookbackUs)
    val byTime = Window.partitionBy(col("conv_id"))
      .orderBy(col("touch_us"), col("touch_id"))
    val path = Window.partitionBy(col("conv_id"))
    val k = count(lit(1)).over(path)
    val rn = row_number().over(byTime)
    val credit = when(k === 1, lit(1.0))
      .when(k === 2, lit(0.5))
      .when(rn === 1 || rn === k, lit(0.4))
      .otherwise(round(lit(0.2) / (k - 2).cast("double"), 6))
      .cast(DecimalType(18, 6))
    pairs.withColumn("__credit", credit)
      .groupBy(col("channel"))
      .agg(countDistinct(col("conv_id")).as("conversions"),
        sum(col("__credit")).cast("double").as("total_credit"))
      .orderBy(col("channel"))
  }

  /** Mergeable partial aggregate for INCREMENTAL aggregate
    * maintenance ([EXT]): one row per key holding the algebraic
    * aggregate STATE (count, exact decimal sum, min, max) for one
    * batch/shard of the fact. The state is closed under merge —
    * `merge(partial(A), partial(B)) == aggregate(A ∪ B)` exactly,
    * because decimal sums are associative-exact, and count/min/max
    * trivially so — which is what lets a 100 TB pipeline maintain
    * per-key totals by aggregating ONLY each new ingest batch and
    * merging its partial rows into the persisted partial table. The
    * history fact is never rescanned; the merge input is
    * O(batches x keys), not O(rows). Same algebra Spark itself uses
    * between map-side and final aggregation — lifted to a PERSISTED,
    * cross-job boundary (and the same trick as the per-shard HLL
    * sketches in [[Profile.sketchShards]], for exact measures). */
  def partialAggregate(df: DataFrame, keys: Seq[String], valueCol: String,
                       scale: Int = 2): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("cnt"),
        sum(col(valueCol).cast(DecimalType(18, scale))).as("psum"),
        min(col(valueCol)).as("pmin"),
        max(col(valueCol)).as("pmax"))

  /** Merge partial-aggregate tables ([[partialAggregate]] outputs —
    * any number of batches, in any order) into the exact full
    * aggregate: `(keys..., n_rows, sum_value, min_value, max_value,
    * avg_value)`. The decimal sum stays decimal through the merge and
    * renders as double only at output (the repo's dsum convention);
    * avg divides the exact decimal sum by the exact count. */
  def mergeAggregates(partials: Seq[DataFrame], keys: Seq[String]): DataFrame = {
    require(partials.nonEmpty, "need at least one partial table")
    partials.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("cnt")).as("n_rows"),
        sum(col("psum")).as("__sum"),
        min(col("pmin")).as("min_value"),
        max(col("pmax")).as("max_value"))
      .select(keys.map(col) ++ Seq(
        col("n_rows"),
        col("__sum").cast("double").as("sum_value"),
        col("min_value"), col("max_value"),
        (col("__sum").cast("double") / col("n_rows")).as("avg_value")): _*)
  }

  /** Shipping-priority report ([EXT]) — the TPC-H Q3 shape: revenue
    * of orders from one market segment that were PLACED before the
    * cutoff but still have lineitems SHIPPING after it (the unshipped
    * backlog a fulfillment dashboard ranks), top `k` by revenue.
    *
    * Shape: both date filters and the segment filter push into their
    * scans BEFORE any join; the segment-filtered customer keys
    * broadcast; the aggregate keys on the order; the top-k is a
    * TakeOrderedAndProject on the EXACT decimal revenue (ordering on
    * the rendered double could mis-rank ULP ties), tiebroken by
    * order key. */
  def shippingPriority(customer: DataFrame, orders: DataFrame,
                       lineitem: DataFrame, segment: String,
                       cutoff: String, k: Int = 10): DataFrame = {
    val cut = lit(cutoff).cast("timestamp")
    val cust = customer.where(col("c_mktsegment") === segment)
      .select(col("c_custkey"))
    val ord = orders.where(col("o_orderdate") < cut)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        col("o_orderpriority"))
    val li = lineitem.where(col("l_shipdate") > cut)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast(DecimalType(18, 4))).as("__rev"))
      .orderBy(col("__rev").desc, col("l_orderkey"))
      .limit(k)
      .select(col("l_orderkey"), col("__rev").cast("double").as("revenue"),
        col("o_orderdate"), col("o_orderpriority"))
  }

  /** Market-basket association rules ([EXT]) — pairwise
    * support / confidence / lift over order baskets (the Apriori
    * 2-itemset level, which is where retail co-purchase analysis
    * lives; higher orders explode combinatorially for marginal
    * insight). For every ordered rule A→B seen in ≥ `minPairCount`
    * baskets:
    *   support    = n(A,B) / n_baskets
    *   confidence = n(A,B) / n(A)
    *   lift       = confidence / (n(B) / n_baskets)
    *
    * Exactness: all counts are exact longs from hash aggregates;
    * every ratio is ONE IEEE expression over them, rounded to 6dp —
    * lift is spelled `(n_ab·n_baskets)/(n_a·n_b)` as a single
    * fraction, not a ratio of rounded ratios. Shape: basket dedup +
    * per-order self-join (pair fan-out bounded by basket size, the
    * q_triangles co-occurrence discipline — never item×item), item
    * counts as a broadcastable side, n_baskets a broadcast 1-row
    * aggregate. Skew note: a promotional item in every basket makes
    * one join key hot; cap basket size upstream if baskets are
    * unbounded (carts are, pallets aren't). */
  def associationRules(baskets: DataFrame, orderCol: String, itemCol: String,
                       minPairCount: Long = 2): DataFrame = {
    val items = baskets
      .select(col(orderCol).as("oid"), col(itemCol).as("item"))
      .where(col("oid").isNotNull && col("item").isNotNull)
      .distinct()
    val nBaskets = items.select(col("oid")).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val itemCounts = items.groupBy(col("item")).agg(count(lit(1)).as("c_item"))
    val pairCounts = items.select(col("oid"), col("item").as("ia"))
      .join(items.select(col("oid"), col("item").as("ib")), Seq("oid"))
      .where(col("ia") < col("ib"))
      .groupBy(col("ia"), col("ib")).agg(count(lit(1)).as("c_ab"))
      .where(col("c_ab") >= minPairCount)
    // each unordered pair yields both rules (A→B and B→A)
    val rules = pairCounts.select(col("ia").as("antecedent"),
        col("ib").as("consequent"), col("c_ab"))
      .unionAll(pairCounts.select(col("ib").as("antecedent"),
        col("ia").as("consequent"), col("c_ab")))
    rules
      .join(itemCounts.select(col("item").as("antecedent"), col("c_item").as("c_a")),
        Seq("antecedent"))
      .join(itemCounts.select(col("item").as("consequent"), col("c_item").as("c_b")),
        Seq("consequent"))
      .crossJoin(broadcast(nBaskets))
      .select(col("antecedent"), col("consequent"), col("c_ab"),
        round(col("c_ab") / col("n_baskets").cast("double"), 6).as("support"),
        round(col("c_ab") / col("c_a").cast("double"), 6).as("confidence"),
        // counts go to double BEFORE the products: overflow-free at
        // any scale, and bit-identical while products stay < 2^53
        round((col("c_ab").cast("double") * col("n_baskets").cast("double")) /
          (col("c_a").cast("double") * col("c_b").cast("double")), 6).as("lift"))
      .orderBy(col("antecedent"), col("consequent"))
  }

  /** ABC / Pareto analysis ([EXT]) — classify keys by cumulative
    * revenue share in descending-revenue order: class A carries the
    * first `aCut` (default 80%) of revenue, B to `bCut` (95%), C the
    * tail — the inventory-prioritization classic. `unitsCol` must be
    * an EXACT integer measure (cents / 10⁻⁴ currency units), which
    * makes the running total order-independent and the class
    * boundaries engine-exact.
    *
    * Scale shape: the global ordered cumsum rides
    * [[Pack.rangeSortedWithOffsets]] (range partition + driver offset
    * fold) — NEVER a single-task unbounded window; the same skeleton
    * behind budget selection, ordinals, and the sweep-line. */
  def abcAnalysis(df: DataFrame, keyCol: String, unitsCol: String,
                  aCut: Double = 0.80, bCut: Double = 0.95): DataFrame = {
    require(0 < aCut && aCut < bCut && bCut < 1,
      s"need 0 < aCut < bCut < 1: $aCut, $bCut")
    val spark = df.sparkSession
    import spark.implicits._
    val (sorted, offsets) = Pack.rangeSortedWithOffsets(
      df.select(col(keyCol).cast("long").as("key"),
          col(unitsCol).cast("long").as("units"))
        .withColumn("__negu", -col("units")),
      Seq("__negu", "key"), col("units"))
    val total = offsets.last
    require(total > 0, "abcAnalysis needs a positive revenue total")
    val cum = sorted.as[(Long, Long, Long)].mapPartitions { it =>
      var acc = offsets(org.apache.spark.TaskContext.getPartitionId())
      it.map { case (key, units, _) => acc += units; (key, units, acc) }
    }.toDF("key", "units", "cum_units")
    val share = round(col("cum_units").cast("double") / lit(total.toDouble), 6)
    cum.select(col("key"), col("units"), col("cum_units"),
        share.as("cum_share"),
        when(share <= aCut, lit("A")).when(share <= bCut, lit("B"))
          .otherwise(lit("C")).as("abc_class"))
      .orderBy(col("cum_units"))
  }

  /** RFM segmentation ([EXT]) — recency / frequency / monetary
    * quintiles per customer, the retention-marketing workhorse.
    * Scores are 1..n with n best (most recent, most frequent, highest
    * spend); tiles are purely positional, so the (metric, custkey)
    * total order makes bucket assignment engine-exact — and the
    * monetary ordering uses the EXACT decimal, never the rendered
    * double (a ULP tie would flip a bucket). Each of the three tile
    * assignments rides [[Pack.positionalTiles]] (prefix-sum skeleton,
    * never a single-task global `ntile` window), re-attached to the
    * customer row by a custkey equi-join — three bounded shuffles of
    * the customer dimension, distributed at any customer count. */
  def rfmSegments(orders: DataFrame, n: Int = 5): DataFrame = {
    require(n >= 2, s"rfmSegments needs n >= 2: $n")
    val per = orders.groupBy(col("o_custkey")).agg(
      max(col("o_orderdate")).as("__last"),
      count(lit(1)).as("frequency"),
      sum(col("o_totalprice").cast(DecimalType(18, 2))).as("__md"))
    val mx = orders.agg(max(col("o_orderdate")).as("__mx"))
    // Pin the per-customer aggregate ONCE: each of the three tile passes
    // below range-partitions its input independently, and without this
    // checkpoint each pass would recompute the orders groupBy from scratch
    // (3x the scan + shuffle for identical bytes).
    val scored = per.crossJoin(broadcast(mx))
      .select(col("o_custkey"),
        datediff(col("__mx"), col("__last")).cast("long").as("recency_days"),
        col("frequency"), col("__md"))
      .localCheckpoint()
    def tiles(metric: String, desc: Boolean, as: String): DataFrame = {
      val order = if (desc) col(metric).desc else col(metric)
      Pack.positionalTiles(scored.select(col("o_custkey"), col(metric)),
          Seq(order, col("o_custkey")), n, as)
        .select(col("o_custkey"), col(as))
    }
    scored
      .join(tiles("recency_days", desc = true, "r"), Seq("o_custkey"))
      .join(tiles("frequency", desc = false, "f"), Seq("o_custkey"))
      .join(tiles("__md", desc = false, "m"), Seq("o_custkey"))
      .select(col("o_custkey"), col("recency_days"), col("frequency"),
        col("__md").cast("double").as("monetary"),
        col("r"), col("f"), col("m"),
        concat(col("r").cast("string"), col("f").cast("string"),
          col("m").cast("string")).as("segment"))
      .orderBy(col("o_custkey"))
  }

  /** Top user paths ([EXT]) — the first `k` event types of each
    * user's history joined into a path string, counted across users:
    * the onboarding-flow / drop-off view product analytics reads
    * before any funnel is even defined (funnels test a HYPOTHESIZED
    * sequence; paths SURFACE the real ones). Users with fewer than
    * `k` events contribute their full shorter path — early
    * abandonment is exactly the signal.
    *
    * Shape: one user-keyed window ranks events, the per-user path is
    * a sort_array(collect_list(struct))-then-join aggregate
    * (deterministic regardless of partitioning — collect_list alone
    * is arrival-ordered), and the path count is a second, path-keyed
    * aggregate whose cardinality is bounded by |event_types|^k. */
  def userPaths(events: DataFrame, k: Int = 3, tsCol: String = "ts",
                userCol: String = "user_id",
                typeCol: String = "event_type"): DataFrame = {
    require(k >= 1, s"userPaths needs k >= 1: $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col("event_id"))
    events
      .select(col(userCol).as("user_id"), col(tsCol), col("event_id"),
        col(typeCol).as("et"))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k)
      .groupBy(col("user_id"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("__rn").as("r"), col("et").as("t")))),
        x => x.getField("t")), ">").as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path"))
  }

  /** Kaplan-Meier survival estimate ([EXT]) — user lifetime curve
    * with right-censoring: users whose last activity falls within
    * `censorDays` of the corpus end are CENSORED (we did not observe
    * their churn), not counted as deaths — the correction naive
    * "average lifetime" metrics get wrong by construction. One row
    * per event time t (days since first activity with ≥ 1 churn):
    * risk-set size, deaths, and `S(t) = Π (1 − d_i/n_i)`.
    *
    * Determinism: the product runs as `exp(Σ round(ln(1 − d/n), 6))`
    * with the log terms DECIMAL-summed over the ordered (bounded)
    * event-time table — order-free, engine-exact; a saturated final
    * time (d = n) short-circuits to 0 explicitly (its ln is −∞, and
    * SQL window sums would silently SKIP a null term — both engines
    * agree on the explicit zero instead).
    *
    * Shape: one per-user aggregate (bounded by |users|), counts per
    * lifetime, then windows over the BOUNDED time table; nothing at
    * fact scale after the first aggregate. */
  def kaplanMeier(events: DataFrame, censorDays: Int = 3,
                  tsCol: String = "ts", userCol: String = "user_id"): DataFrame = {
    require(censorDays >= 0, s"kaplanMeier needs censorDays >= 0: $censorDays")
    val perUser = events.groupBy(col(userCol).as("user_id"))
      .agg(min(to_date(col(tsCol))).as("__first"),
        max(to_date(col(tsCol))).as("__last"))
    val mx = perUser.agg(max(col("__last")).as("__mx"))
    val life = perUser.crossJoin(broadcast(mx))
      .select(datediff(col("__last"), col("__first")).cast("long").as("t"),
        (datediff(col("__mx"), col("__last")) <= censorDays).as("censored"))
    kaplanMeierCurve(life)
  }

  /** [[kaplanMeier]]'s core over ANY prepared life table
    * `(t: long, censored: boolean)` — session durations, ticket
    * resolution times, subscription ages; the wrapper above derives
    * user lifetimes, but the subject definition is the caller's.
    *
    * Scale shape: the wrapper's t is calendar-bounded, but THIS entry
    * point admits second/micro-granularity durations whose distinct-t
    * table scales with the subject count — so both running sums (the
    * risk-set prefix and the log-term cumsum) ride
    * [[Pack.rangeSortedWithOffsetsBy]], never an empty-partition
    * window (the aucExact discipline). The total comes free as the
    * first pass's last offset; log terms cumulate as exact 6-dp micro
    * longs (same rational as the former DECIMAL(18,6) window sum, so
    * the rendered survival is bit-identical and the oracle is
    * unchanged). */
  def kaplanMeierCurve(life: DataFrame): DataFrame = {
    val spark = life.sparkSession
    import spark.implicits._
    // null t = no observable lifetime: dropped (and the partition-local
    // tuple scan below must never see a null primitive)
    val byT = life.where(col("t").isNotNull)
      .groupBy(col("t").cast("long").as("t")).agg(
        count(lit(1)).as("__ending"),
        sum(when(!col("censored"), 1L).otherwise(0L)).as("d"))
    // pass 1: exclusive prefix of endings -> risk set; offsets.last IS
    // the subject total (no separate aggregate)
    val (s1, o1) = Pack.rangeSortedWithOffsetsBy(byT, Seq(col("t")), col("__ending"))
    val total = o1.last
    val risky = s1.as[(Long, Long, Long)].mapPartitions { it =>
      var before = o1(org.apache.spark.TaskContext.getPartitionId())
      it.map { case (t, ending, d) =>
        val nRisk = total - before
        before += ending
        (t, d, nRisk)
      }
    }.toDF("t", "d", "n_risk").where(col("d") > 0)
    // the saturated row (d == n_risk, ln = -inf) contributes 0 to the
    // cumsum — the explicit twin of a SQL window sum skipping its null
    val termMicros = when(col("d") < col("n_risk"),
      (round(log(lit(1.0) - col("d").cast("double") / col("n_risk").cast("double")), 6)
        .cast(DecimalType(18, 6)) * 1000000).cast("long")).otherwise(lit(0L))
    // pass 2: inclusive prefix of the exact micro log-terms
    val (s2, o2) = Pack.rangeSortedWithOffsetsBy(
      risky.withColumn("__tm", termMicros), Seq(col("t")), col("__tm"))
    s2.as[(Long, Long, Long, Long)].mapPartitions { it =>
      var acc = o2(org.apache.spark.TaskContext.getPartitionId())
      it.map { case (t, d, nRisk, tm) =>
        acc += tm
        (t, nRisk, d, acc)
      }
    }.toDF("t", "n_risk", "d", "__cum")
      .select(col("t"), col("n_risk"), col("d"),
        when(col("d") === col("n_risk"), lit(0.0))
          .otherwise(round(exp(col("__cum").cast("double") / 1e6), 6)).as("survival"))
      .orderBy(col("t"))
  }

  /** Two-proportion A/B test ([EXT]) — split users by the portable
    * hash into arms A/B, measure conversion (any `conversionType`
    * event), and report the pooled two-proportion z statistic: the
    * experiment-analysis primitive, and — run on a hash split where
    * NO real treatment differs — the A/A calibration check (|z| ≳ 2
    * on an A/A split means the assignment or the metric is broken).
    * All counts exact; every ratio and the z one IEEE chain, 6dp. */
  def abTest(events: DataFrame, conversionType: String = "purchase",
             typeCol: String = "event_type",
             userCol: String = "user_id"): DataFrame = {
    val users = events.select(col(userCol).as("user_id")).distinct()
      .withColumn("__grp",
        when(conv(substring(md5(col("user_id").cast("string")), 1, 8), 16, 10)
          .cast("long") % 2 === 0, lit("A")).otherwise(lit("B")))
    val converted = events.where(col(typeCol) === conversionType)
      .select(col(userCol).as("user_id")).distinct()
      .withColumn("__c", lit(1L))
    val arms = users.join(converted, Seq("user_id"), "left")
      .groupBy(col("__grp"))
      .agg(count(lit(1)).as("n"), sum(coalesce(col("__c"), lit(0L))).as("x"))
    val wide = arms.groupBy()
      .agg(max(when(col("__grp") === "A", col("n"))).as("n_a"),
        max(when(col("__grp") === "A", col("x"))).as("x_a"),
        max(when(col("__grp") === "B", col("n"))).as("n_b"),
        max(when(col("__grp") === "B", col("x"))).as("x_b"))
    def d(c: Column) = c.cast("double")
    val pa = d(col("x_a")) / d(col("n_a"))
    val pb = d(col("x_b")) / d(col("n_b"))
    val pooled = d(col("x_a") + col("x_b")) / d(col("n_a") + col("n_b"))
    wide.select(col("n_a"), col("x_a"), col("n_b"), col("x_b"),
      round(pa, 6).as("p_a"), round(pb, 6).as("p_b"),
      // degenerate pooled rates (nobody or everybody converts) have
      // zero variance — no z statistic, not a 0/0 NaN
      when(col("x_a") + col("x_b") > 0 &&
          col("x_a") + col("x_b") < col("n_a") + col("n_b"),
        round((pa - pb) / sqrt(pooled * (lit(1.0) - pooled) *
          (lit(1.0) / d(col("n_a")) + lit(1.0) / d(col("n_b")))), 6)).as("z"))
  }

  /** Seasonal-naive forecast backtest ([EXT]) — forecast each day's
    * per-type revenue as the value `period` days earlier (the
    * same-weekday-last-week baseline every real forecasting effort
    * must beat to justify itself) and score it with MAE over the
    * overlap. The evaluation harness matters more than the model:
    * this is the reusable backtest JOIN (actuals ⋈ lag-shifted
    * actuals), and fancier forecasts drop into the same shape.
    * Errors are exact decimal |a − f| sums; MAE is one IEEE division
    * rounded to 6dp. */
  def seasonalNaiveBacktest(events: DataFrame, period: Int = 7,
                            typeCol: String = "event_type",
                            tsCol: String = "ts",
                            valueCol: String = "value"): DataFrame = {
    require(period >= 1, s"seasonalNaiveBacktest needs period >= 1: $period")
    val daily = graft.functions.TimeCol.instant(events, tsCol)
      .groupBy(col(typeCol).as("event_type"), to_date(col(tsCol)).as("day"))
      .agg(sum(col(valueCol).cast(DecimalType(18, 2))).as("__v"))
    val actual = daily.select(col("event_type"), col("day"), col("__v").as("__a"))
    val forecast = daily.select(col("event_type"),
      date_add(col("day"), period).as("day"), col("__v").as("__f"))
    actual.join(forecast, Seq("event_type", "day"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        sum(abs(col("__a") - col("__f"))).as("__sae"))
      .select(col("event_type"), col("n_days"),
        round(col("__sae").cast("double") / col("n_days").cast("double"), 6)
          .as("mae"))
      .orderBy(col("event_type"))
  }

  /** Cumulative unique users by day ([EXT]) — the growth curve: each
    * user counts once, on their FIRST active day, and the running sum
    * over days gives total distinct users to date. A naive
    * count-distinct-over-expanding-window rescans history per day;
    * this is one user aggregate (first day) + one day aggregate +
    * one cumsum over the BOUNDED day table. */
  def cumulativeUsers(events: DataFrame, tsCol: String = "ts",
                      userCol: String = "user_id"): DataFrame = {
    val firstDay = events
      .groupBy(col(userCol).as("user_id"))
      .agg(min(to_date(col(tsCol))).as("day"))
    val perDay = firstDay.groupBy(col("day")).agg(count(lit(1)).as("new_users"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("day"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    perDay
      .withColumn("cumulative_users", sum(col("new_users")).over(w))
      .orderBy(col("day"))
  }

  /** Rolling n-day active users ([EXT]) — WAU/MAU: distinct users
    * active in the window ENDING each day. The expanding-distinct
    * trap again: instead of re-counting a 7-day set per day, each
    * (user, active-day) row fans out to the n window-end days it
    * supports (a bounded explode of n literals) and one distinct
    * count per day finishes. Days past the observed maximum are
    * clipped — a window that ends after the data isn't a real
    * reading. */
  def rollingActiveUsers(events: DataFrame, days: Int = 7,
                         tsCol: String = "ts",
                         userCol: String = "user_id"): DataFrame = {
    require(days >= 1, s"rollingActiveUsers needs days >= 1: $days")
    val active = events
      .select(col(userCol).as("user_id"), to_date(col(tsCol)).as("day"))
      .distinct()
    val maxDay = active.agg(max(col("day")).as("__mx"))
    active
      .select(col("user_id"),
        explode(sequence(lit(0), lit(days - 1))).as("__off"), col("day"))
      .select(col("user_id"), date_add(col("day"), col("__off")).as("day"))
      .distinct()
      .crossJoin(broadcast(maxDay))
      .where(col("day") <= col("__mx"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("active_users"))
      .orderBy(col("day"))
  }

  def cohortRetention(events: DataFrame, tsCol: String = "ts",
                      userCol: String = "user_id"): DataFrame = {
    val days = events.select(col(userCol).as("user_id"),
      to_date(col(tsCol)).as("day"))
    val firstDay = days.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    val active = days.distinct()
    active.join(firstDay, Seq("user_id"))
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("long").as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  /** Cohort LTV curve ([EXT]) — the revenue analog of
    * [[cohortRetention]]'s user counts: per (cohort_day, day_offset),
    * the cohort's cumulative value so far and the per-user LTV — the
    * payback-window number ("the March cohort reaches $X/user by day
    * 30"). Value sums are exact decimals; the cumulative runs as a
    * DECIMAL window over the BOUNDED (cohort, offset) table (a double
    * cumsum would be frame-order-dependent); the per-user division is
    * the single rounded IEEE step. Cohort size = the cohort's day-0
    * user count, fixed for the whole row set (that is what "per
    * acquired user" means — not the day's active count). */
  def cohortLtv(events: DataFrame, tsCol: String = "ts",
                userCol: String = "user_id",
                valueCol: String = "value"): DataFrame = {
    val base = events.select(col(userCol).as("user_id"),
      to_date(col(tsCol)).as("day"),
      col(valueCol).cast(DecimalType(18, 2)).as("v"))
    val firstDay = base.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    val sizes = firstDay.groupBy(col("cohort_day")).agg(
      count(lit(1)).as("cohort_users"))
    val daily = base.join(firstDay, Seq("user_id"))
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("long").as("day_offset"))
      .agg(sum(col("v")).cast(DecimalType(28, 2)).as("__rev"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("cohort_day")).orderBy(col("day_offset"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("__cum", sum(col("__rev")).over(w).cast(DecimalType(28, 2)))
      .join(sizes, Seq("cohort_day"))
      .select(col("cohort_day"), col("day_offset"), col("cohort_users"),
        col("__rev").cast("double").as("revenue"),
        col("__cum").cast("double").as("cum_revenue"),
        round(col("__cum").cast("double") / col("cohort_users").cast("double"), 6)
          .as("ltv_per_user"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  /** TPC-H Q5 shape (local supplier volume) — the 6-table star-join
    * plan audit: revenue per nation for orders placed in a window,
    * shipped by a supplier in the CUSTOMER's own nation, within one
    * region. The join graph is the point: region→nation filters first
    * (broadcast — dims are tiny), the c_nationkey = s_nationkey
    * cross-dimension equality rides the join keys rather than a
    * post-filter, and the date range is pushed into the orders scan.
    * Revenue uses the q_pricing_summary decimal discipline. */
  def localSupplierVolume(customer: DataFrame, orders: DataFrame,
                          lineitem: DataFrame, supplier: DataFrame,
                          nation: DataFrame, region: DataFrame,
                          regionName: String, from: String,
                          until: String): DataFrame = {
    val nations = nation.join(
        broadcast(region.where(col("r_name") === regionName)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val o = orders
      .where(col("o_orderdate") >= lit(from) && col("o_orderdate") < lit(until))
      .select(col("o_orderkey"), col("o_custkey"))
    val c = customer.join(broadcast(nations),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
    val s = supplier.select(col("s_suppkey"), col("s_nationkey"))
    o.join(c, col("o_custkey") === col("c_custkey"))
      .join(lineitem.select(col("l_orderkey"), col("l_suppkey"),
          col("l_extendedprice"), col("l_discount")),
        col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast(DecimalType(18, 4))).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Decile gains/lift table ([EXT]) — the targeting-quality view of
    * a scorer that [[graft.operators.Profile.aucExact]] summarizes to
    * one number: rank by score, cut into positional n-tiles, and per
    * tile report the response rate, cumulative capture of all
    * positives, and lift over the base rate — "the top decile holds
    * 34% of the positives" is the sentence the one-number AUC can't
    * say. Positional tiles over a (score desc, id) total order keep
    * bucket boundaries engine-exact; the tile assignment rides
    * [[Pack.positionalTiles]] (prefix-sum skeleton — a literal
    * `ntile() OVER (ORDER BY ...)` serializes the whole scored fact
    * into one task, the repo's canonical scale anti-pattern). The
    * remaining windows run over the BOUNDED `buckets`-row tile table;
    * all rates/lifts are IEEE chains over exact counts, rounded for
    * the certified output. */
  def gainsTable(df: DataFrame, scoreCol: String, labelCol: String,
                 idCol: String, buckets: Int = 10): DataFrame = {
    require(buckets >= 2, s"gainsTable needs buckets >= 2: $buckets")
    import org.apache.spark.sql.expressions.Window
    val scored = df.select(col(idCol).as("__id"),
        col(scoreCol).as("__s"), col(labelCol).cast("long").as("__y"))
      .where(col("__s").isNotNull && col("__y").isNotNull)
    val tiled = Pack.positionalTiles(scored,
      Seq(col("__s").desc, col("__id")), buckets, "decile")
    val per = tiled.groupBy(col("decile")).agg(
      count(lit(1)).as("n"), sum(col("__y")).as("n_pos"))
    val w = Window.orderBy(col("decile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = per.agg(sum(col("n")).as("__tn"), sum(col("n_pos")).as("__tp"))
    per.withColumn("cum_pos", sum(col("n_pos")).over(w))
      .crossJoin(broadcast(tot))
      .select(col("decile"), col("n"), col("n_pos"),
        round(col("n_pos").cast("double") / col("n").cast("double"), 6)
          .as("response_rate"),
        when(col("__tp") > 0,
          round(col("cum_pos").cast("double") / col("__tp").cast("double"), 6))
          .as("cum_capture"),
        when(col("__tp") > 0,
          round((col("n_pos").cast("double") / col("n").cast("double")) /
            (col("__tp").cast("double") / col("__tn").cast("double")), 6))
          .as("lift"))
      .orderBy(col("decile"))
  }
}
