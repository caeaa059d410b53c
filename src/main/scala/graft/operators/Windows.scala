package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Window-function surface (SURVEY.md §2.5 [EXT]): the reference's
  * README aspires to "trend analysis" with no code behind it; this is
  * the natural Spark shape — per-key monthly series with lag deltas,
  * ranks, and running totals. One shuffle keyed by the partition
  * column serves every window function here.
  */
object Windows {

  /** Monthly claims per supplier with previous-month delta, a
    * month sequence number, and a running cumulative total. */
  def monthlyTrend(lineitem: DataFrame): DataFrame = {
    val monthly = lineitem
      .groupBy(col("l_suppkey"), date_trunc("month", col("l_shipdate")).cast("date").as("month"))
      .agg(Reports.dsum(col("l_quantity")).as("claims"))
    val w = Window.partitionBy(col("l_suppkey")).orderBy(col("month"))
    monthly
      .withColumn("prev_claims", lag(col("claims"), 1).over(w))
      .withColumn("delta", col("claims") - col("prev_claims"))
      .withColumn("month_seq", row_number().over(w))
      // decimal inside the running frame: window aggregation order is
      // engine-internal (segment trees), so a double sum would not be
      // reproducible — a decimal sum is.
      .withColumn("running_claims",
        sum(col("claims").cast(DecimalType(18, 2)))
          .over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("double"))
      .orderBy(col("l_suppkey"), col("month"))
  }

  /** Rank suppliers inside each nation by account balance —
    * rank/dense_rank over one nation-keyed shuffle. */
  def rankInGroup(supplier: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("s_nationkey"))
      .orderBy(col("s_acctbal").desc, col("s_suppkey"))
    supplier
      .withColumn("balance_rank", rank().over(w))
      .withColumn("balance_dense_rank", dense_rank().over(w))
      .orderBy(col("s_nationkey"), col("balance_rank"), col("s_suppkey"))
  }

  /** Sliding-frame features per user over the event stream: 3-event
    * moving average (ROWS frame) and 10-minute trailing sum/count
    * (RANGE frame over the numeric event time) — the standard
    * time-series feature shapes. One user-keyed shuffle serves all
    * four windows.
    *
    * Determinism: frame sums go through DECIMAL(18,2) — sliding-window
    * aggregation order is engine-internal (Spark re-scans the frame,
    * DuckDB uses segment trees), so a double sum would differ in final
    * ULPs between engines; the decimal sum is order-independent. The
    * double→decimal cast agrees cross-engine for any double that is
    * not an exact midpoint between two 2dp values; midpoints DO exist
    * (0.125, 0.375, …) and engines may round them differently
    * (HALF_UP vs half-even) — the events generator emits 2dp-derived
    * values, so none arise here, but a caller feeding arbitrary
    * doubles should pre-round explicitly. (user_id, ts) is unique in
    * the events table, so the window order is total. */
  def movingStats(events: DataFrame): DataFrame = {
    val ev = graft.functions.TimeCol.instant(events).select(
      col("event_id"), col("user_id"),
      unix_micros(col("ts")).as("ts_us"),
      col("value").cast(DecimalType(18, 2)).as("__v"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
    val rows3 = w.rowsBetween(-2, 0)
    val range10m = w.rangeBetween(-600000000L, 0)
    ev.select(
      col("event_id"), col("user_id"), col("ts_us"),
      (sum(col("__v")).over(rows3).cast("double") /
        count(lit(1)).over(rows3)).as("mov_avg3"),
      sum(col("__v")).over(range10m).cast("double").as("sum_10m"),
      count(lit(1)).over(range10m).as("n_10m"))
      .orderBy(col("event_id"))
  }

  /** The distribution window set — ntile buckets, percent_rank and
    * cume_dist — over the same per-nation balance ordering. The
    * doubles derive from identical integer rank arithmetic
    * ((rank-1)/(n-1), rank/n), so results are engine-exact. */
  def distributionStats(supplier: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("s_nationkey"))
      .orderBy(col("s_acctbal").desc, col("s_suppkey"))
    supplier
      .select(col("s_suppkey"), col("s_nationkey"), col("s_acctbal"))
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume", cume_dist().over(w))
      .orderBy(col("s_nationkey"), col("pct_rank"), col("s_suppkey"))
  }

  /** First-order event-transition matrix ([EXT]): per user, each
    * event's PREDECESSOR type in (ts, event_id) order, counted into
    * (from_type, to_type, n, share) — the Markov-chain view of a
    * clickstream that powers next-step prediction features, funnel
    * discovery (which transitions actually happen vs the designed
    * funnel in [[Reports.funnel]]), and bot detection (impossible
    * transition mixes). Each user's first event has no predecessor
    * and feeds no pair.
    *
    * Shape: one user-keyed lag window (the single shuffle), one
    * map-side-combined pair count; `share` normalizes per from-state
    * as a window ON the aggregate rows (bounded by the type-pair
    * cardinality — the tfIdf no-recompute discipline), an unrounded
    * IEEE divide of exact counts. */
  def transitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(unix_micros(col("ts")), col("event_id"))
    val pairs = graft.functions.TimeCol.instant(events)
      .select(col("user_id"), col("event_type"),
        lag(col("event_type"), 1).over(w).as("__prev"))
      .where(col("__prev").isNotNull)
      .groupBy(col("__prev").as("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val byFrom = Window.partitionBy(col("from_type"))
    pairs
      .withColumn("share", col("n").cast("double") /
        sum(col("n")).over(byFrom).cast("double"))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** Time-weighted average ([EXT]) — per user, the piecewise-constant
    * mean of an irregularly sampled measure: Σ vᵢ·Δtᵢ / Σ Δtᵢ with
    * Δtᵢ the micros until the NEXT observation (each value "holds"
    * until replaced; the final observation has no holding interval
    * and feeds neither sum). The correct average for sensor readings,
    * account balances, queue depths — a plain mean over-weights
    * bursts of closely spaced samples.
    *
    * Exactness: value is decimal(18,2), Δt an exact long, their
    * product and sum stay decimal (order-independent); the final
    * ratio renders as a 6-dp-rounded double because DuckDB's
    * hugeint-decimal→double conversion can land one ULP from Spark's
    * BigDecimal cast (the q_corr lesson). Users with one event have
    * no intervals and are absent. One user-keyed lead window + one
    * aggregate — the window's single shuffle. */
  def timeWeighted(events: DataFrame, valueCol: String = "value"): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("__us"), col("event_id"))
    graft.functions.TimeCol.instant(events)
      .select(col("user_id"), col("event_id"),
        col(valueCol).cast(DecimalType(18, 2)).as("__v"),
        unix_micros(col("ts")).as("__us"))
      .withColumn("__dt", lead(col("__us"), 1).over(w) - col("__us"))
      .where(col("__dt").isNotNull)
      .groupBy(col("user_id"))
      .agg(sum(col("__v") * col("__dt")).as("__wsum"),
        sum(col("__dt")).as("__tsum"))
      .select(col("user_id"),
        round(col("__wsum").cast("double") / col("__tsum").cast("double"), 6)
          .as("twa"))
      .orderBy(col("user_id"))
  }

  /** SCD Type-2 dimension build ([EXT]) — collapse an event/change log
    * into validity intervals: one row per (key, attribute-value RUN)
    * with `valid_from_us` (first observation of the run) and
    * `valid_to_us` (start of the next run, NULL while current) — the
    * standard slowly-changing-dimension shape every warehouse keeps
    * for point-in-time joins ([[AsOf.asofJoin]] against the interval
    * table is the lookup side). Consecutive observations of the SAME
    * value extend the run rather than opening a new row.
    *
    * Shape: one key-partitioned shuffle serves the change-detection
    * lag AND the interval lead — the intermediate filter preserves
    * hash partitioning and sort order, so the second window neither
    * re-shuffles nor re-sorts. (ts, tiebreak) totalizes the order;
    * NULL attribute values are a legal run value (null-safe change
    * test). */
  def scd2(events: DataFrame, keyCol: String, attrCol: String,
           tiebreakCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__us"), col(tiebreakCol))
    graft.functions.TimeCol.instant(events)
      .select(col(keyCol), col(attrCol), col(tiebreakCol),
        unix_micros(col("ts")).as("__us"))
      // first-row detection is a SEPARATE lag of a constant: a plain
      // `lag(attr)` returns NULL both out-of-range AND for a genuine
      // NULL attribute in the previous row — conflating "first
      // observation" with "previous value was NULL"
      .withColumn("__changed",
        lag(lit(1), 1).over(w).isNull or
          not(lag(col(attrCol), 1).over(w) <=> col(attrCol)))
      .where(col("__changed"))
      .withColumn("valid_to_us", lead(col("__us"), 1).over(w))
      .select(col(keyCol), col(attrCol),
        col("__us").as("valid_from_us"), col("valid_to_us"),
        col("valid_to_us").isNull.as("is_current"))
      .orderBy(col(keyCol), col("valid_from_us"))
  }

  /** Incremental SCD Type-2 maintenance ([EXT]) — fold an APPEND-ONLY
    * event batch into a persisted [[scd2]] table without recomputing
    * history: the batch's own runs are computed locally, a first run
    * that repeats the user's persisted current value MERGES into it
    * (no spurious row), otherwise the persisted current row is closed
    * at the first surviving change, and the surviving runs append.
    * `scd2Merge(scd2(old), new) == scd2(old ∪ new)` exactly — the
    * q_scd2_merge oracle replays the from-scratch build over the full
    * log to prove it.
    *
    * Scale shape: the history is touched only through its CURRENT
    * rows (one per key — the persisted table's live slice); closed
    * rows pass through untouched. The merge input is O(batch) +
    * O(keys), never O(history events) — the same contract as
    * [[graft.operators.Reports.partialAggregate]] / dfShard.
    *
    * Precondition: every batch event is LATER than every persisted
    * interval start for its key (append-only CDC; out-of-order
    * history needs the from-scratch build). */
  def scd2Merge(persisted: DataFrame, newEvents: DataFrame, keyCol: String,
                attrCol: String, tiebreakCol: String): DataFrame = {
    val batchRuns = scd2(newEvents, keyCol, attrCol, tiebreakCol)
    val current = persisted.where(col("is_current"))
      .select(col(keyCol), col(attrCol).as("__cur_attr"), lit(true).as("__has_cur"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("valid_from_us"))
    // a first batch run repeating the persisted current value is not a
    // change — it extends the current run; a NEW key (no __has_cur)
    // always survives, including a NULL first value
    val surviving = batchRuns
      .withColumn("__rn", row_number().over(w))
      .join(current, Seq(keyCol), "left")
      .where(col("__has_cur").isNull or col("__rn") =!= 1 or
        not(col(attrCol) <=> col("__cur_attr")))
      .drop("__rn", "__cur_attr", "__has_cur")
    val closeAt = surviving.groupBy(col(keyCol))
      .agg(min(col("valid_from_us")).as("__close_us"))
    val carried = persisted
      .join(closeAt, Seq(keyCol), "left")
      .select(col(keyCol), col(attrCol),
        col("valid_from_us"),
        when(col("is_current") && col("__close_us").isNotNull, col("__close_us"))
          .otherwise(col("valid_to_us")).as("valid_to_us"),
        (col("is_current") && col("__close_us").isNull).as("is_current"))
    carried.unionByName(surviving)
      .orderBy(col(keyCol), col("valid_from_us"))
  }

  /** Batch sessionization ([EXT]) — the gap rule (a quiet period
    * LONGER than `gapUs` starts a new session) as plain windows: flag
    * each event whose distance to the user's previous event exceeds
    * the gap, and running-sum the flags into a per-user session
    * sequence number; one aggregate then yields each session's span
    * and depth. The BATCH twin of [[graft.streaming.Sessions]]'
    * streaming `session_window`, replayable over history — and the
    * boundary convention matches it EXACTLY: `session_window` MERGES
    * sessions that touch (an event arriving precisely `gap` after the
    * previous one extends the session — measured, not assumed), so
    * the strict `>` here mirrors it (SessionsSpec proves batch ==
    * streaming including the exact-gap boundary).
    *
    * One user-keyed shuffle serves the lag, the running sum, and (by
    * AQE exchange reuse) the session aggregate. All arithmetic is
    * exact longs; (ts, event_id) totalizes the order. */
  /** Per-EVENT session assignment — [[sessionizeBatch]]'s first half,
    * exposed because session-scoped analyses ([[graft.operators
    * .Reports.sessionFunnel]]) need the assignment, not the rollup.
    * Carries (event_id, user_id, event_type, ts_us, session_seq). */
  def sessionIds(events: DataFrame, gapUs: Long): DataFrame = {
    require(gapUs > 0, s"session gap must be positive: $gapUs")
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    // event_type rides along when present (sessionFunnel needs it);
    // the rollup-only callers pass frames without it
    val carried =
      if (events.columns.contains("event_type")) Seq(col("event_type")) else Seq.empty
    graft.functions.TimeCol.instant(events)
      .select(Seq(col("event_id"), col("user_id")) ++ carried :+
        unix_micros(col("ts")).as("ts_us"): _*)
      .withColumn("__new",
        when(col("ts_us") - lag(col("ts_us"), 1).over(w) > gapUs
          or lag(col("ts_us"), 1).over(w).isNull, 1L).otherwise(0L))
      .withColumn("session_seq",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__new")
  }

  def sessionizeBatch(events: DataFrame, gapUs: Long): DataFrame =
    sessionIds(events, gapUs)
      .groupBy(col("user_id"), col("session_seq"))
      .agg(min(col("ts_us")).as("start_us"), max(col("ts_us")).as("end_us"),
        count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_seq"),
        col("start_us"), col("end_us"),
        (col("end_us") - col("start_us")).as("duration_us"), col("n_events"))
      .orderBy(col("user_id"), col("session_seq"))

  /** Session exit rates ([EXT]) — per event type, the share of its
    * occurrences that ENDED a session (the "where do users leave"
    * product question [[Reports.funnel]]'s fixed step order can't
    * ask). Pure composition over [[sessionIds]]: one row_number per
    * session marks the last event ((ts, event_id) desc — the same
    * tiebreak the session order uses), then one aggregate. Exact
    * counts; the rate is one rounded IEEE division. */
  def exitRates(events: DataFrame, gapUs: Long = 1800000000L): DataFrame = {
    val s = sessionIds(events, gapUs)
    val w = Window.partitionBy(col("user_id"), col("session_seq"))
      .orderBy(col("ts_us").desc, col("event_id").desc)
    s.withColumn("__exit",
        when(row_number().over(w) === 1, 1L).otherwise(0L))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("__exit")).as("n_exits"))
      .withColumn("exit_rate",
        round(col("n_exits").cast("double") / col("n_events").cast("double"), 6))
      .orderBy(col("event_type"))
  }

  /** New-vs-returning daily split ([EXT]) — the acquisition/retention
    * decomposition of [[Reports.rollingActiveUsers]]' totals: each
    * (user, day) active pair is "new" iff the day is that user's
    * FIRST. Two bounded aggregates over the distinct (user, day)
    * table; counts exact. */
  def newVsReturning(events: DataFrame, userCol: String = "user_id",
                     tsCol: String = "ts"): DataFrame = {
    val days = events.select(col(userCol).as("user_id"),
      to_date(col(tsCol)).as("day")).distinct()
    val first = days.groupBy(col("user_id")).agg(min(col("day")).as("__first"))
    days.join(first, Seq("user_id"))
      .groupBy(col("day"))
      .agg(sum(when(col("day") === col("__first"), 1L).otherwise(0L)).as("new_users"),
        sum(when(col("day") =!= col("__first"), 1L).otherwise(0L)).as("returning_users"))
      .orderBy(col("day"))
  }

  /** Concurrency sweep-line ([EXT]) — treat each event as an interval
    * [ts, ts + duration) and compute, at every interval boundary, how
    * many intervals are open: the classic "peak concurrent
    * sessions/users/connections" profile (capacity planning, license
    * audits, connection-pool sizing). Each interval contributes a +1
    * point at its start and a -1 at its end; the running sum of
    * deltas in (t, delta, id) order IS the concurrency after that
    * boundary. Ends sort before starts at equal t (delta -1 < +1), so
    * half-open intervals never overlap at a shared boundary.
    *
    * Scale shape: the naive spelling is `sum(delta) OVER (ORDER BY
    * t)` — a GLOBAL window on a single task. This is instead
    * [[Pack.contiguousBins]]' distributed prefix sum verbatim:
    * range-partition the points by the sort key, prefix-sum the tiny
    * per-partition delta totals on the driver (numPartitions values —
    * a query parameter, not data), then a partition-local running sum
    * plus the broadcast offset. localCheckpoint pins the sampled
    * range bounds so both passes see the same partitioning.
    *
    * Determinism: durations go through DECIMAL(18,2)·10⁶ (exact for
    * the 2dp generator values — [[movingStats]]' midpoint caveat
    * applies to arbitrary doubles), and (t, delta, event_id) is a
    * total order. Zero/negative durations clamp to 1 µs so an
    * interval's end never sorts before its own start. */
  def concurrencyProfile(events: DataFrame, durationCol: String = "value"): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val ev = graft.functions.TimeCol.instant(events).select(
      col("event_id").cast("long").as("event_id"),
      unix_micros(col("ts")).as("s_us"),
      (unix_micros(col("ts")) +
        greatest((col(durationCol).cast(DecimalType(18, 2)) * 1000000).cast("long"),
          lit(1L))).as("e_us"))
    val points = ev.select(col("event_id"), col("s_us").as("t_us"), lit(1L).as("delta"))
      .unionByName(ev.select(col("event_id"), col("e_us").as("t_us"), lit(-1L).as("delta")))
    val (sorted, offsets) = Pack.rangeSortedWithOffsets(points,
      Seq("t_us", "delta", "event_id"), col("delta"))
    sorted.as[(Long, Long, Long)].mapPartitions { it =>
      var acc = offsets(org.apache.spark.TaskContext.getPartitionId())
      it.map { case (id, t, d) => acc += d; (id, t, d, acc) }
    }.toDF("event_id", "t_us", "delta", "concurrency")
      .orderBy(col("t_us"), col("delta"), col("event_id"))
  }

  /** Forward fill / LOCF ([EXT]) — per key, replace NULL measures
    * with the last preceding non-null value in (ts, tiebreak) order:
    * the standard gap-fill before feature windows or model scoring
    * (sensor dropouts, sparse attribute updates, sessionized state).
    * Leading NULLs (no prior observation) stay NULL — no value is
    * invented. The fill only COPIES values (no arithmetic), so the
    * output is engine-exact whatever the column's type.
    *
    * Shape: one key-partitioned running frame — the same single
    * shuffle every window op here pays; at scale, bucketing the
    * table by the key makes it exchange-free. The tiebreak column
    * makes the frame order total (equal timestamps would otherwise
    * fill nondeterministically). */
  def forwardFill(df: DataFrame, key: String, ts: String, c: String,
                  tiebreak: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(tiebreak))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(s"${c}_filled", last(col(c), ignoreNulls = true).over(w))
      .orderBy(col(key), col(ts), col(tiebreak))
  }

  /** Inter-arrival statistics per key ([EXT]) — gap count, mean gap,
    * and the coefficient of variation of the gaps: the burstiness
    * profile (CV ≈ 1 is Poisson-random, CV ≫ 1 is bursty — bot
    * detection, retry storms; CV ≪ 1 is metronomic — schedulers,
    * heartbeats). Gaps are exact micros longs from one lag window;
    * moment sums are exact decimals (gap² ≤ 10²⁵ for month-scale
    * gaps — DECIMAL(38,0) holds it), and mean/CV are single IEEE
    * chains over them, 6dp. Keys with fewer than 2 gaps, or
    * zero-variance gaps, yield null CV by the exact-decimal guard. */
  def interArrival(events: DataFrame, key: String = "user_id"): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col("__us"), col("event_id"))
    val gaps = graft.functions.TimeCol.instant(events)
      .select(col(key), col("event_id"), unix_micros(col("ts")).as("__us"))
      .withColumn("__gap", col("__us") - lag(col("__us"), 1).over(w))
      .where(col("__gap").isNotNull)
    val agg = gaps.groupBy(col(key)).agg(
      count(lit(1)).as("n_gaps"),
      sum(col("__gap").cast(DecimalType(28, 0))).as("__sg"),
      // square in DECIMAL: month-scale micro gaps overflow LONG when
      // squared (2.6e12² = 6.7e24 > 2⁶³) — DuckDB's BIGINT·BIGINT
      // silently widens to HUGEINT; Spark must widen explicitly
      sum((col("__gap").cast(DecimalType(19, 0)) *
        col("__gap").cast(DecimalType(19, 0))).cast(DecimalType(38, 0)))
        .as("__sgg"))
    def d(c: String) = col(c).cast("double")
    val mean = d("__sg") / d("n_gaps")
    val variance = (d("__sgg") - d("__sg") * d("__sg") / d("n_gaps")) /
      (d("n_gaps") - 1)
    // mean_gap_s ships UNROUNDED on purpose: Σgap < 2^53 is exactly
    // representable, so its IEEE chain is bit-equal across engines —
    // while round(x, 6) implementations DIFFER at half-ULP boundaries
    // (sf0.1 hit one: 33374.0610425 split .043/.042 between Spark's
    // BigDecimal rounding and DuckDB's float round). cv stays ROUNDED:
    // its Σgap² exceeds 2^53, so the decimal→double conversion itself
    // can differ by one ULP and rounding is what absorbs that.
    agg.select(col(key), col("n_gaps"),
      (mean / lit(1000000.0)).as("mean_gap_s"),
      when(col("n_gaps") > 1 &&
          col("n_gaps") * col("__sgg") =!= col("__sg") * col("__sg"),
        round(sqrt(variance) / mean, 6)).as("cv"))
      .orderBy(col(key))
  }

  /** Rolling median over the last `k` observations per key ([EXT]) —
    * the robust smoother an EWMA can't be: one wild spike moves every
    * mean-based window it touches, but the median of the frame
    * ignores it entirely (sensor despiking, latency dashboards).
    * Spark's exact `percentile` runs as a WINDOW aggregate over the
    * row frame; DuckDB's windowed `quantile_cont` shares its
    * (1−g)·a + g·b interpolation (the q_quantiles bridge), which is
    * what makes a rolling ORDER STATISTIC cross-engine certifiable.
    * Cost is O(k log k) per row inside one key-partitioned window —
    * fine for dashboard-scale k; for k in the thousands switch to a
    * two-heap mapGroups implementation. */
  def rollingMedian(events: DataFrame, key: String = "event_type",
                    valueCol: String = "value", k: Int = 5): DataFrame = {
    require(k >= 1, s"rollingMedian needs k >= 1: $k")
    val w = Window.partitionBy(col(key))
      .orderBy(col("__us"), col("event_id"))
      .rowsBetween(-(k - 1L), Window.currentRow)
    graft.functions.TimeCol.instant(events)
      .select(col(key), col("event_id"), unix_micros(col("ts")).as("__us"),
        col(valueCol).cast("double").as("__v"))
      .withColumn("rolling_median",
        round(percentile(col("__v"), lit(0.5)).over(w), 6))
      .select(col(key), col("event_id"), col("rolling_median"))
      .orderBy(col(key), col("event_id"))
  }

  /** Lagged cross-correlation between two event-type daily series
    * ([EXT]) — Pearson of (count of `typeA` on day d, count of
    * `typeB` on day d+lag) for every lag in [0, maxLag]: the "does
    * activity today predict conversions in k days" diagnostic, and
    * the lead-lag scan behind campaign-effect and capacity-planning
    * dashboards. Only days where BOTH series observed enter a lag's
    * sample (inner alignment — absent days are unknown, not zero).
    *
    * Exactness: day counts are exact longs; the [[Profile.pearsonExact]]
    * discipline (decimal moments, one double expression, 6-dp) per
    * lag. Shape: the fact collapses to a (type, day) aggregate FIRST
    * — the lag spine (maxLag+1 literals) cross-joins the BOUNDED
    * daily table, never the fact, so the scan cost is one aggregate
    * regardless of maxLag. Degenerate lags (fewer than 2 aligned
    * days, or a constant series) yield null by the exact-decimal
    * guard. */
  def lagCorrelation(events: DataFrame, typeA: String, typeB: String,
                     maxLag: Int, typeCol: String = "event_type"): DataFrame = {
    require(maxLag >= 0, s"lagCorrelation needs maxLag >= 0: $maxLag")
    val daily = graft.functions.TimeCol.instant(events)
      .where(col(typeCol).isin(typeA, typeB))
      .groupBy(col(typeCol), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val a = daily.where(col(typeCol) === typeA)
      .select(col("day").as("day_a"), col("n").as("x"))
    val b = daily.where(col(typeCol) === typeB)
      .select(col("day").as("day_b"), col("n").as("y"))
    val spine = events.sparkSession.range(0, maxLag + 1L)
      .select(col("id").as("lag"))
    val agg = a.crossJoin(broadcast(spine))
      .join(b, date_add(col("day_a"), col("lag").cast("int")) === col("day_b"))
      .groupBy(col("lag")).agg(
        count(lit(1)).as("__n"),
        sum(col("x").cast(DecimalType(28, 0))).as("__sx"),
        sum(col("y").cast(DecimalType(28, 0))).as("__sy"),
        // widen BEFORE the products — long·long wraps past ~3e9
        // events/day while the oracle's BIGINT·BIGINT widens
        sum((col("x").cast(DecimalType(19, 0)) * col("x").cast(DecimalType(19, 0)))
          .cast(DecimalType(38, 0))).as("__sxx"),
        sum((col("y").cast(DecimalType(19, 0)) * col("y").cast(DecimalType(19, 0)))
          .cast(DecimalType(38, 0))).as("__syy"),
        sum((col("x").cast(DecimalType(19, 0)) * col("y").cast(DecimalType(19, 0)))
          .cast(DecimalType(38, 0))).as("__sxy"))
    def d(c: String) = col(c).cast("double")
    agg.select(col("lag"), col("__n").as("n_days"),
      when(col("__n") > 1 &&
          col("__n") * col("__sxx") =!= col("__sx") * col("__sx") &&
          col("__n") * col("__syy") =!= col("__sy") * col("__sy"),
        round((d("__n") * d("__sxy") - d("__sx") * d("__sy")) /
          (sqrt(d("__n") * d("__sxx") - d("__sx") * d("__sx")) *
            sqrt(d("__n") * d("__syy") - d("__sy") * d("__sy"))), 6))
        .as("corr"))
      .orderBy(col("lag"))
  }

  /** Finite-memory EWMA ([EXT]) — per key in (ts, event_id) order,
    * the exponentially weighted moving average with half-life decay
    * (α = 1/2) truncated at `k` lags:
    * `ewma_i = Σ_{j<k} 2^(k−1−j)·x_{i−j} / Σ_{j<k} 2^(k−1−j)`,
    * the denominator counting only lags that EXIST (early rows decay
    * over their shorter history rather than leaking zeros in). The
    * k-term truncation drops < 2⁻ᵏ of the weight mass — at k = 16,
    * below the 6-dp render — and is what makes the computation a
    * FIXED window expression instead of an unbounded recursion.
    *
    * Exactness: dyadic weights are exact powers of two, so each term
    * is `decimal(18,2) value × integer weight` — an exact decimal.
    * The numerator/denominator sums are therefore order-independent
    * and engine-exact; only the final division is IEEE, rounded to
    * 6dp. (A recursive `s = αx + (1−α)s` in doubles would compound
    * representation error AND defeat any engine's window batching.)
    *
    * Shape: all k lags plus the presence indicators come out of ONE
    * key-partitioned window (a single exchange + sort); the per-row
    * cost is k fused column ops inside whole-stage codegen. */
  def ewmaDyadic(events: DataFrame, key: String = "event_type",
                 valueCol: String = "value", k: Int = 16): DataFrame = {
    require(k >= 1 && k <= 62, s"ewmaDyadic needs 1 <= k <= 62: $k")
    val w = Window.partitionBy(col(key)).orderBy(col("__us"), col("event_id"))
    val base = graft.functions.TimeCol.instant(events)
      .select(col(key), col("event_id"),
        unix_micros(col("ts")).as("__us"),
        col(valueCol).cast(DecimalType(18, 2)).as("__v"))
    val weights = (0 until k).map(j => 1L << (k - 1 - j))
    val numer = (0 until k).map { j =>
      coalesce(lag(col("__v"), j).over(w) * lit(weights(j)),
        lit(java.math.BigDecimal.ZERO).cast(DecimalType(18, 2)))
    }.reduce(_ + _)
    // presence = a NON-NULL VALUE at that lag, not mere row existence:
    // a null observation must renormalize out of the denominator (like
    // the short-history start), not enter as a phantom zero
    val denom = (0 until k).map { j =>
      when(lag(col("__v"), j).over(w).isNotNull, lit(weights(j))).otherwise(lit(0L))
    }.reduce(_ + _)
    base
      // an all-null window (current value null, no observed history)
      // has no average — null, not 0/0 NaN
      .withColumn("ewma", when(denom > lit(0L),
        round(numer.cast("double") / denom.cast("double"), 6)))
      .select(col(key), col("event_id"), col("ewma"))
      .orderBy(col(key), col("event_id"))
  }

  /** Per-key DENSE daily count series behind the time-series monitors
    * ([[cusum]], [[mannKendall]], [[seasonalAnomalies]]): the fact
    * collapses to (key, day, cnt) and the per-key [min(day), max(day)]
    * span is densified with cnt=0 rows. Without the spine a monitor
    * only sees days that HAD events — an outage (the exact signal a
    * change-point chart exists for) would be invisible, and the
    * baseline μ biased upward. The spine is bounded by keys × calendar
    * days (a query-shaped quantity, never the fact): one bounded
    * aggregate for the per-key bounds, one `sequence` explode, one
    * left join. */
  private def denseDaily(events: DataFrame, typeCol: String,
                         tsCol: String): DataFrame = {
    // Null-ts rows are DROPPED, explicitly: a null timestamp has no
    // calendar position, so it can't sit on a daily change-point chart
    // (same documented rule as kaplanMeierCurve's null-t drop). Without
    // this filter the drop would still happen — the spine's min/max
    // ignore nulls and the left join is spine-driven — but as an
    // artifact of join direction rather than a stated semantic.
    val daily = events
      .where(to_date(col(tsCol)).isNotNull)
      .groupBy(col(typeCol), to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("cnt"))
    val spine = daily.groupBy(col(typeCol))
      .agg(min(col("day")).as("__d0"), max(col("day")).as("__d1"))
      .select(col(typeCol), explode(sequence(col("__d0"), col("__d1"))).as("day"))
    spine.join(daily, Seq(typeCol, "day"), "left")
      .select(col(typeCol), col("day"), coalesce(col("cnt"), lit(0L)).as("cnt"))
  }

  /** CUSUM change-point monitor ([EXT]) — the control chart (Page
    * 1954): C_t = max(0, C_{t−1} + (x_t − μ − k)) accumulates
    * sustained drift above the per-key baseline and alarms at C > h —
    * catching the slow leak [[seasonalAnomalies]]' per-day spike test
    * can't (ten days each 2σ high never flag a MAD rule; their CUSUM
    * climbs). The recursion unrolls to prefix sums —
    * C_t = Z_t − min(0, min_{s≤t} Z_s) with Z the running sum of
    * (x − μ − k) — so it's two windows over the BOUNDED daily table,
    * not a sequential scan. The series is the DENSE [[denseDaily]]
    * spine: days with zero events enter as cnt=0, so an outage or a
    * downward shift drives the (negated) statistic instead of
    * silently vanishing from the chart, and μ averages over real
    * calendar days, not just active ones.
    *
    * Exactness: everything runs in INTEGER micro-units — μ is the
    * floor-divided (Σ·10⁶)/n, z/Z/C are longs — because window-frame
    * sums are internally tree-ordered and a double cumsum would be
    * engine- and partitioning-dependent; integer addition is
    * associative-exact, so the frame's internal order cannot matter.
    * `slack` (k) and `threshold` (h) are in count units. */
  def cusum(events: DataFrame, typeCol: String = "event_type",
            tsCol: String = "ts", slack: Double = 1.0,
            threshold: Double = 8.0): DataFrame = {
    val daily = denseDaily(events, typeCol, tsCol)
    // integral `div`, NOT `/`: Spark's `/` on longs is true (double)
    // division — the fractional µ would leak IEEE noise into every
    // prefix sum (caught by the oracle gate: 0.6 vs 0.600004)
    val mu = daily.groupBy(col(typeCol).as("__t"))
      .agg(expr("(sum(cnt) * 1000000) div count(*)").as("__mu6"))
    val kMicro = math.round(slack * 1000000L)
    val hMicro = math.round(threshold * 1000000L)
    val byDay = Window.partitionBy(col(typeCol)).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.join(mu, col(typeCol) === col("__t"))
      .withColumn("__z", col("cnt") * 1000000L - col("__mu6") - lit(kMicro))
      .withColumn("__Z", sum(col("__z")).over(byDay))
      .withColumn("__runmin", min(col("__Z")).over(byDay))
      .withColumn("__C", col("__Z") - least(col("__runmin"), lit(0L)))
      .select(col(typeCol), col("day"), col("cnt"),
        round(col("__C").cast("double") / 1000000.0, 6).as("cusum"),
        when(col("__C") > hMicro, lit(1)).otherwise(lit(0)).cast("int")
          .as("alarm"))
      .orderBy(col(typeCol), col("day"))
  }

  /** Mann-Kendall trend test ([EXT]) — "is this series actually
    * trending?" with a DISTRIBUTION-FREE answer ([[Profile.linearFit]]
    * fits a slope; this tests monotonicity without assuming
    * linearity or normality): S = Σ_{i<j} sign(x_j − x_i) over the
    * per-key daily series, with the normal approximation
    * z = (S ∓ 1)/σ, σ² = n(n−1)(2n+5)/18 (no-ties form — count
    * ties and judge applicability from the output).
    *
    * Scale shape: the fact collapses to the (key, day) count table
    * FIRST; the pairwise S runs over that BOUNDED table (a year is
    * ~66k pairs per key — nothing), so scan cost is one pass and the
    * quadratic term never touches raw events. S is an exact integer;
    * z is one guarded IEEE chain (sqrt is IEEE-exact). */
  def mannKendall(events: DataFrame, typeCol: String = "event_type",
                  tsCol: String = "ts"): DataFrame = {
    // dense spine: a quiet spell is DOWNWARD evidence, not a hole
    val daily = denseDaily(events, typeCol, tsCol)
    def side(p: String) = daily.select(col(typeCol).as(s"__t$p"),
      col("day").as(s"${p}_day"), col("cnt").as(s"${p}_cnt"))
    val pairs = side("a").join(side("b"),
      col("__ta") === col("__tb") && col("a_day") < col("b_day"))
    val stats = pairs.groupBy(col("__ta").as(s"$typeCol"))
      .agg(sum(signum((col("b_cnt") - col("a_cnt")).cast("double")).cast("long"))
          .as("s"),
        sum(when(col("b_cnt") === col("a_cnt"), 1L).otherwise(0L)).as("n_ties"))
    val nDays = daily.groupBy(col(typeCol).as("__nt"))
      .agg(count(lit(1)).as("n_days"))
    val n = col("n_days").cast("double")
    val sigma = sqrt(n * (n - 1.0) * (lit(2.0) * n + 5.0) / 18.0)
    stats.join(nDays, col(typeCol) === col("__nt"))
      .select(col(typeCol), col("n_days"), col("s"), col("n_ties"),
        when(col("n_days") >= 3,
          round(when(col("s") > 0, (col("s").cast("double") - 1.0) / sigma)
            .when(col("s") < 0, (col("s").cast("double") + 1.0) / sigma)
            .otherwise(lit(0.0)), 6)).as("z"))
      .orderBy(col(typeCol))
  }

  /** Gaps-and-islands activity streaks ([EXT]) — contiguous runs of
    * active DAYS per key, the classic sequence-reconstruction shape
    * ([[Reports.cumulativeUsers]] counts activity, this finds its
    * RUNS): the epoch-day minus row_number trick labels each
    * consecutive run with a constant, so islands fall out of one
    * grouped aggregate. The fact collapses to the distinct
    * (key, day) table first — the window and the aggregate run over
    * bounded day rows, never the raw events. */
  def activityStreaks(events: DataFrame, typeCol: String = "event_type",
                      tsCol: String = "ts"): DataFrame = {
    val days = events.select(col(typeCol), to_date(col(tsCol)).as("day")).distinct()
    val w = Window.partitionBy(col(typeCol)).orderBy(col("day"))
    days
      .withColumn("__grp",
        datediff(col("day"), lit("1970-01-01").cast("date")).cast("long")
          - row_number().over(w))
      .groupBy(col(typeCol), col("__grp"))
      .agg(min(col("day")).as("streak_start"), max(col("day")).as("streak_end"),
        count(lit(1)).cast("long").as("days"))
      .select(col(typeCol), col("streak_start"), col("streak_end"), col("days"))
      .orderBy(col(typeCol), col("streak_start"))
  }

  /** Seasonal-residual anomaly flags over a daily count series ([EXT])
    * — the STL-shaped monitor every event pipeline wants: per
    * (key, weekday) mean as the seasonal baseline, residual scaled by
    * the per-key MAD (median absolute deviation × the 1.4826
    * consistency constant — the robust σ estimate; [[Profile.madOutliers]]'s
    * discipline applied to a TIME series), |score| > k flags.
    *
    * Scale shape: the fact collapses to a (key, day) aggregate before
    * anything else — baseline, residual, and MAD all run over the
    * bounded day table, so scan cost is one pass regardless of series
    * length; the MAD median rides the certified percentile ==
    * quantile_cont bridge. Determinism: the baseline is ONE double
    * division of exact longs, the score is rounded before the flag
    * compare, so the flagged set itself is engine-exact; zero-MAD
    * keys (metronomic series) yield null scores, never 0/0.
    */
  def seasonalAnomalies(events: DataFrame, typeCol: String = "event_type",
                        tsCol: String = "ts", k: Double = 3.0): DataFrame = {
    // dense spine: a silent day is the anomaly most worth flagging
    val daily = denseDaily(events, typeCol, tsCol)
      .withColumn("__dow", dayofweek(col("day")))
    val base = daily.groupBy(col(typeCol).as("__t"), col("__dow").as("__d"))
      .agg((sum(col("cnt")).cast("double") / count(lit(1)).cast("double"))
        .as("__expected"))
    val resid = daily
      .join(base, col(typeCol) === col("__t") && col("__dow") === col("__d"))
      .withColumn("__resid", col("cnt").cast("double") - col("__expected"))
    val mad = resid.groupBy(col(typeCol).as("__mt"))
      .agg(percentile(abs(col("__resid")), lit(0.5)).as("__mad"))
    resid.join(mad, col(typeCol) === col("__mt"))
      .withColumn("score",
        when(col("__mad") > 0,
          round(col("__resid") / (lit(1.4826) * col("__mad")), 6)))
      .withColumn("is_anomaly",
        when(col("score").isNotNull && abs(col("score")) > lit(k), lit(1))
          .otherwise(lit(0)).cast("int"))
      .select(col(typeCol), col("day"), col("cnt"),
        round(col("__expected"), 6).as("expected"), col("score"), col("is_anomaly"))
      .orderBy(col(typeCol), col("day"))
  }
}
