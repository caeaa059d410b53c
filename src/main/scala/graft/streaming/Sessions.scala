package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.{BooleanType, DecimalType, DoubleType, LongType, StringType, StructField, StructType}

/** Mutable per-user accumulator carried across micro-batches. */
final case class UserState(nEvents: Long, sumValue: Double)

/** One update row emitted per user per micro-batch. */
final case class UserTotals(user_id: Long, n_events: Long, sum_value: Double)

/** One quantile-monitor update per key per micro-batch. */
final case class QuantileUpdate(event_type: String, n: Long,
                                p50: Double, p99: Double)

/** The certified form of a quantile-monitor update: the walk's
  * integer certificate (rank + owning sign/bucket cell) for p50 and
  * p99 instead of the engine-private float representatives. */
final case class QuantileCert(event_type: String, n: Long,
                              rk50: Long, sign50: Long, bucket50: Long,
                              rk99: Long, sign99: Long, bucket99: Long)

/** KMV (k minimum values) distinct sketch carried in keyed state:
  * the k smallest 60-bit value fingerprints seen so far (sorted). */
final case class KmvBuf(hashes: Seq[Long])

/** One distinct-count update per key per micro-batch. */
final case class DistinctUpdate(event_type: String, n_kept: Long,
                                distinct_est: Double)

/** Event-time windowing + sessionization (SURVEY.md §2.10 [EXT] —
  * absent from the reference, which names streaming as future work at
  * reference README.md:507).
  *
  * The transforms are written once over DataFrame and reused for both
  * batch (DuckDB-oracle-verifiable) and Structured Streaming (same
  * plan under `readStream` + watermark).
  */
object Sessions {

  /** Tumbling-window counts/sums per event type. Window start is
    * emitted as epoch seconds so batch results compare across engines
    * without timezone/precision ambiguity. */
  def windowedCounts(events: DataFrame, width: String = "10 minutes"): DataFrame =
    graft.functions.TimeCol.instant(events)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .select(
        col("window.start").cast("long").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))
      .orderBy(col("window_start"), col("event_type"))

  /** Exact distinct keys per tumbling window ([EXT]) — "distinct
    * users per 10 minutes", the audience-size measure. Exact distinct
    * plans as Spark's two-phase Expand aggregate: partial dedup of
    * (window, key) map-side, then the count — one keyed shuffle whose
    * rows are the DISTINCT pairs, not the events. At 100 TB per-window
    * HLL sketches ([[graft.operators.Profile.sketchShards]]) are the
    * mergeable approximate path; this is the exact contract. */
  def windowedDistinct(events: DataFrame, width: String = "10 minutes",
                       keyCol: String = "user_id"): DataFrame =
    graft.functions.TimeCol.instant(events)
      .groupBy(window(col("ts"), width))
      .agg(count_distinct(col(keyCol)).as("n_distinct"),
        count(lit(1)).as("n_events"))
      .select(col("window.start").cast("long").as("window_start"),
        col("n_distinct"), col("n_events"))
      .orderBy(col("window_start"))

  /** Sliding-window event counts. */
  def slidingCounts(events: DataFrame, width: String = "10 minutes",
                    slide: String = "5 minutes"): DataFrame =
    graft.functions.TimeCol.instant(events)
      .groupBy(window(col("ts"), width, slide), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").cast("long").as("window_start"),
        col("event_type"), col("n_events"))
      .orderBy(col("window_start"), col("event_type"))

  /** Gap-based sessionization per user: number of sessions and events.
    * Session semantics = `session_window` (a new session starts when
    * the gap since the previous event is >= the gap parameter). */
  def sessionize(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    graft.functions.TimeCol.instant(events)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"), sum(col("n")).as("n_events"))
      .orderBy(col("user_id"))

  /** Streaming exact dedup by id (SURVEY.md §2.10 [EXT]): drops
    * replayed/duplicate events, keeping dedup state only within the
    * watermark horizon — the state-bounded form (a plain
    * dropDuplicates on a stream retains ALL ids forever and OOMs a
    * long-running job). */
  def streamingDedup(events: DataFrame, idCol: String = "event_id",
                     watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(idCol)

  /** Custom stateful operator (SURVEY.md §2.10 [EXT]):
    * running per-user event count + value sum via
    * `flatMapGroupsWithState` — arbitrary keyed state, the Spark
    * primitive for semantics `groupBy.agg` can't express. Works on
    * both a batch DataFrame (state starts empty, one pass) and a
    * streaming one (state persists across micro-batches; use
    * OutputMode.Update downstream). */
  def statefulUserTotals(events: DataFrame): Dataset[UserTotals] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id").cast("long"), col("value").cast("double"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Double)], state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(0L, 0.0))
          var n = prev.nEvents
          var s = prev.sumValue
          rows.foreach { case (_, v) => n += 1; s += v }
          state.update(UserState(n, s))
          Iterator(UserTotals(user, n, s))
      }
  }

  /** Bounded-state flavor of [[statefulUserTotals]] for genuinely
    * unbounded streams: the NoTimeout variant's per-user state grows
    * forever on a long-running job. Here each user's state expires
    * after `timeout` of processing-time inactivity — on expiry the
    * final totals are emitted once more (an observable flush) and the
    * state is REMOVED, so a later event for that user restarts its
    * totals from zero. State size is thereby bounded by the number of
    * users active within one timeout horizon, not all users ever
    * seen. */
  def statefulUserTotalsWithTimeout(events: DataFrame,
                                    timeout: String = "30 minutes"): Dataset[UserTotals] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id").cast("long"), col("value").cast("double"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.ProcessingTimeTimeout) {
        (user: Long, rows: Iterator[(Long, Double)], state: GroupState[UserState]) =>
          if (state.hasTimedOut) {
            val prev = state.getOption.getOrElse(UserState(0L, 0.0))
            state.remove()
            Iterator(UserTotals(user, prev.nEvents, prev.sumValue))
          } else {
            val prev = state.getOption.getOrElse(UserState(0L, 0.0))
            var n = prev.nEvents
            var s = prev.sumValue
            rows.foreach { case (_, v) => n += 1; s += v }
            state.update(UserState(n, s))
            state.setTimeoutDuration(timeout)
            Iterator(UserTotals(user, n, s))
          }
      }
  }

  /** Streaming heavy-hitters monitor ([EXT]) — completes the
    * bounded-state monitor trio (quantiles = DDSketch, distincts =
    * KMV, frequency = this): a Misra-Gries summary
    * ([[graft.expressions.MisraGriesAggregator]]) in keyed state, ≤
    * `capacity` counters per key forever. The MG DETERMINISTIC
    * guarantee survives the cross-batch merges (Agarwal et al., PODS
    * 2012): after any prefix of the stream, every value with true
    * frequency > n/(capacity+1) is guaranteed PRESENT in the emitted
    * summary — the property the spec asserts. Unlike the other two
    * monitors, MG merge results depend on merge order, so the
    * summary's exact counters are lineage-specific (spec-law'd, not
    * oracled — the guarantee, not the counters, is the contract). */
  def heavyHittersMonitor(events: DataFrame, valueCol: String = "user_id",
                          capacity: Int = 16): Dataset[(String, Long, Map[String, Long])] = {
    val spark = events.sparkSession
    import spark.implicits._
    val agg = new graft.expressions.MisraGriesAggregator(capacity)
    events.select(col("event_type"), col(valueCol).cast("string"))
      .where(col(valueCol).isNotNull)
      .as[(String, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, String)],
         state: GroupState[graft.expressions.MGBuf]) =>
          val buf = rows.foldLeft(state.getOption.getOrElse(agg.zero)) {
            (b, r) => agg.reduce(b, r._2)
          }
          state.update(buf)
          if (buf.n == 0) Iterator.empty
          else Iterator((key, buf.n, buf.counts))
      }
  }

  /** Streaming quantile monitor ([EXT]) — the "p99 per event type,
    * continuously" dashboard primitive, as a DDSketch
    * ([[graft.expressions.DDSketchAggregator]]) carried in keyed
    * state: each micro-batch folds its values into the per-key sketch
    * (bounded FOREVER by the intrinsic log-gamma index range — ≈115
    * counters per decade of value spread, ≤ ~73k even for the full
    * double range — unlike a windowed exact percentile, which buffers
    * rows) and emits the updated p50/p99 from the maxBuckets-capped
    * `finish` view. State stays UNCOLLAPSED so the fold is pure
    * bucket addition: the monitor's estimates after any batch split
    * are IDENTICAL to a one-shot batch sketch over the same rows —
    * the spec asserts exact equality, not approximate agreement —
    * unconditionally, even for ranges past maxBuckets (an in-state
    * collapse would make the floor depend on batch boundaries).
    * Works over a batch frame (one pass) and a stream (state
    * persists; Update mode). */
  /** Streaming distinct-count monitor ([EXT]) — "distinct users per
    * type, continuously" as a KMV sketch in keyed state (the k
    * smallest value fingerprints — the state is k longs per key
    * FOREVER, where exact streaming distinct state grows with the
    * universe). The k-min set of a growing multiset is monotone
    * (a discarded hash can never re-enter), so the fold is
    * order-insensitive: the monitor's estimate after any batch split
    * equals the one-shot batch sketch EXACTLY — and because the
    * fingerprint is the portable md5 fp60 and the estimator the same
    * (k−1)·2^60/h_k arithmetic as [[graft.operators.Profile.kmvEstimate]],
    * the batch twin is hash-certified against a DuckDB replay (this
    * is the ORACLED streaming monitor; the DDSketch one is
    * engine-private). Exact below k distinct values, ±O(1/√k) above. */
  def distinctMonitor(events: DataFrame, k: Int = 64): Dataset[DistinctUpdate] = {
    require(k >= 2, s"KMV needs k >= 2: $k")
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("event_type"), col("user_id").cast("string"))
      .where(col("user_id").isNotNull)
      .as[(String, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, String)], state: GroupState[KmvBuf]) =>
          val md = java.security.MessageDigest.getInstance("MD5")
          def fp(sv: String): Long = { // JVM twin of Portable.fp60
            val hex = md.digest(sv.getBytes("UTF-8")).map("%02x".format(_)).mkString
            java.lang.Long.parseLong(hex.substring(0, 15), 16)
          }
          val prev = state.getOption.map(_.hashes).getOrElse(Seq.empty)
          val merged = (prev.toSet ++ rows.map(r => fp(r._2))).toSeq.sorted.take(k)
          state.update(KmvBuf(merged))
          if (merged.isEmpty) Iterator.empty
          else {
            val est =
              if (merged.size < k) merged.size.toDouble
              else (k - 1).toDouble * 1.152921504606846976e18 / merged.last.toDouble
            Iterator(DistinctUpdate(key, merged.size.toLong, est))
          }
      }
  }

  def quantileMonitor(events: DataFrame, alpha: Double = 0.01,
                      maxBuckets: Int = 2048): Dataset[QuantileUpdate] = {
    val spark = events.sparkSession
    import spark.implicits._
    import graft.expressions.{DDBuf, DDSketch, DDSketchAggregator}
    val agg = new DDSketchAggregator[Double](Double.box, alpha, maxBuckets)
    events.select(col("event_type"), col("value").cast("double"))
      .where(col("value").isNotNull)
      .as[(String, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Double)], state: GroupState[DDBuf]) =>
          val buf = rows.foldLeft(state.getOption.getOrElse(agg.zero)) {
            (b, r) => agg.reduce(b, r._2)
          }
          state.update(buf)
          if (buf.n == 0) Iterator.empty
          else {
            val capped = agg.finish(buf) // maxBuckets applies to the VIEW, not the state
            Iterator(QuantileUpdate(key, capped.n,
              DDSketch.quantile(capped, 0.5, alpha),
              DDSketch.quantile(capped, 0.99, alpha)))
          }
      }
  }

  /** [[quantileMonitor]] in its hash-certifiable form — the same
    * DDSketch-in-keyed-state stateful op, emitting the quantile WALK
    * certificate (rank floor(q·(n−1)) + owning sign/bucket cell, pure
    * integers) instead of the float representatives, which makes the
    * streaming monitor's entire data-touching and rank-walking
    * machinery DuckDB-oracle-replayable (the q_distinct_monitor
    * playbook: that one rode portable fp60 + replayable KMV
    * arithmetic; this one rides the certified bucket spelling +
    * integer walk — only the 3-flop float render is monitor-private,
    * law-tested via [[quantileMonitor]] in SessionsSpec). Default cap
    * is "never collapse" like the certified profile queries: this
    * form exists to replay raw indices; the bounded-view twin is
    * [[quantileMonitor]]'s maxBuckets. */
  def quantileMonitorCert(events: DataFrame, alpha: Double = 0.01,
                          maxBuckets: Int = Int.MaxValue - 1): Dataset[QuantileCert] = {
    val spark = events.sparkSession
    import spark.implicits._
    import graft.expressions.{DDBuf, DDSketch, DDSketchAggregator}
    val agg = new DDSketchAggregator[Double](Double.box, alpha, maxBuckets)
    events.select(col("event_type"), col("value").cast("double"))
      .where(col("value").isNotNull)
      .as[(String, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Double)], state: GroupState[DDBuf]) =>
          val buf = rows.foldLeft(state.getOption.getOrElse(agg.zero)) {
            (b, r) => agg.reduce(b, r._2)
          }
          state.update(buf)
          if (buf.n == 0) Iterator.empty
          else {
            val capped = agg.finish(buf)
            val (s50, b50) = DDSketch.quantileBucket(capped, 0.5)
            val (s99, b99) = DDSketch.quantileBucket(capped, 0.99)
            Iterator(QuantileCert(key, capped.n,
              (0.5 * (capped.n - 1)).toLong, s50.toLong, b50.toLong,
              (0.99 * (capped.n - 1)).toLong, s99.toLong, b99.toLong))
          }
      }
  }

  /** Stream-static enrichment: join a stream against a static
    * dimension, broadcast per micro-batch — stateless (the stream
    * side never buffers), the standard lookup-join shape. Works
    * identically on a batch DataFrame. */
  def enrichWithDim(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")

  /** Stream-stream correlation join: pairs of (left, right) events of
    * the same key where the right event follows the left within
    * `gap`. On streams BOTH sides carry watermarks and the join
    * condition bounds event time, so the state store holds only the
    * watermark+gap horizon — the conditions Structured Streaming
    * requires for an append-mode stream-stream inner join. The same
    * plan runs on batch DataFrames (where it is a plain interval
    * join), which is what the DuckDB oracle checks; streaming ≡ batch
    * is covered by SessionsSpec. */
  def streamCorrelate(left: DataFrame, right: DataFrame, key: String = "user_id",
                      gap: String = "10 minutes",
                      watermark: String = "10 minutes"): DataFrame = {
    def wm(df: DataFrame) = if (df.isStreaming) df.withWatermark("ts", watermark) else df
    val l = wm(left).alias("l")
    val r = wm(right).alias("r")
    l.join(r, expr(s"l.$key = r.$key AND r.ts >= l.ts AND r.ts <= l.ts + interval $gap"))
      .select(col(s"l.$key").as(key),
        col("l.event_id").as("left_id"), col("r.event_id").as("right_id"))
  }

  /** Streaming sink into a lake zone via the built-in parquet file
    * sink — exactly-once through its commit log (a foreachBatch
    * append would be at-least-once: a batch replayed after a crash
    * between the write and the offset commit lands twice). The caller
    * picks the trigger; default drains available data and stops. */
  def streamToParquet(stream: DataFrame, path: String, checkpoint: String,
                      trigger: org.apache.spark.sql.streaming.Trigger =
                        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()

  /** Streaming CDC apply: each micro-batch MERGEs into a keyed lake
    * table via foreachBatch — the continuous flavor of
    * [[graft.sources.Lake.upsertByKey]], closing the loop from a
    * change stream to a queryable current-state table. The merge
    * keeps, per key, whichever of (existing row, incoming changes)
    * has the HIGHEST `seqCol` — one `min_by` aggregate on the negated
    * sequence over `existing ∪ batch`. That single rule buys all
    * three delivery-fault tolerances at once: foreachBatch replay
    * after a crash re-applies the same rows (idempotent), an old
    * change arriving in a later batch can never regress a newer row
    * (a plain key-upsert would), and within-batch duplicates collapse
    * deterministically.
    *
    * The table lives in [[Lake]]'s key-bucketed layout
    * (`__kb=<pmod(hash(keys), numBuckets)>` partitions) and each
    * batch rewrites ONLY the buckets its keys land in
    * ([[Lake.mergeIntoKeyBucketed]]) — a whole-table rewrite per
    * micro-batch is O(table) and would dominate a 100 TB CDC stream;
    * this is O(changed buckets). Each bucket swap is individually
    * atomic and crash-healing; read the current state via
    * [[Lake.readKeyBucketed]]. `numBuckets` fixes the on-disk layout
    * at first write — later runs must pass the same value. */
  def streamUpsert(changes: DataFrame, tablePath: String, checkpoint: String,
                   keys: Seq[String], seqCol: String,
                   numBuckets: Int = 64,
                   trigger: org.apache.spark.sql.streaming.Trigger =
                     org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        graft.sources.Lake.mergeIntoKeyBucketed(
          spark, tablePath, batch, keys, numBuckets) { (existing, incoming) =>
          val all = existing.unionByName(
            incoming.select(existing.columns.toIndexedSeq.map(col): _*))
          // highest sequence per key wins: min_by on the NEGATED
          // sequence. ORDERABLE payload columns follow as tiebreaks —
          // two rows with the SAME key and seq but different payloads
          // must pick a partitioning-independent winner (the sequence
          // alone is not a total order, and keyedDeterministicAgg
          // requires one for determinism). Non-orderable payloads
          // (maps) are skipped: they can't join the ordering, so a
          // same-key-same-seq conflict differing ONLY in a map column
          // falls back to whichever row the ordered columns pick.
          val withNeg = all.withColumn("__neg_seq", -col(seqCol))
          val payloadTiebreaks = withNeg.schema.fields.toSeq
            .filterNot(f => keys.contains(f.name) || f.name == "__neg_seq" ||
              f.name == seqCol)
            .filter(f => org.apache.spark.sql.catalyst.expressions.RowOrdering
              .isOrderable(f.dataType))
            .map(_.name)
          graft.operators.Dedup.keyedDeterministicAgg(
            withNeg, keys, ("__neg_seq" +: payloadTiebreaks): _*)
            .drop("__neg_seq")
        }
        ()
      }
      .start()

  /** Micro-batch row budget for [[streamIngestDedup]] from a target
    * per-batch latency — the measured batch-cost model as code, the
    * [[graft.operators.Clustering.semanticDedupAuto]] discipline of
    * keeping runbook arithmetic in the library instead of a doc.
    *
    * Model (fit on the round-11 three-decade probe, PLANS.md
    * "streamIngest batch-size guidance"): batch wall ≈ `fixedSec` +
    * rows / `rowsPerSec`, with ~3.5 s fixed per micro-batch (trigger +
    * checkpoint + index/bloom probe PLANNING — cluster-side cost, does
    * not shrink with executors) and ~66 k rows/s marginal on the
    * measuring box (the content-keyed dedup + signature probe scan —
    * scales with executor count; re-fit both terms from ONE measured
    * batch per deployment). So a latency bound L buys at most
    * (L − fixed) · rowsPerSec rows per batch: L=30 s → ~1.75 M rows
    * (the measured ×1000 point ran 1.67 M-row batches at ~26 s),
    * L=10 s → ~429 k.
    *
    * The knob this sizes is `maxFilesPerTrigger` × the ingest file's
    * row count — see [[ingestMaxFilesPerTrigger]]. Budgets below
    * [[ingestEfficiencyFloorRows]] (~231 k rows at the measured terms)
    * spend more wall on fixed cost than on rows — legal when the
    * latency demand is real, but named so nobody sizes 10 k-row
    * batches by accident. */
  def ingestBatchRows(targetLatencySec: Double, fixedSec: Double = 3.5,
                      rowsPerSec: Double = 66000.0): Long = {
    require(fixedSec >= 0 && rowsPerSec > 0,
      s"fixedSec must be >= 0 and rowsPerSec positive: $fixedSec, $rowsPerSec")
    require(targetLatencySec > fixedSec,
      f"target latency $targetLatencySec%.1f s is inside the ~$fixedSec%.1f s " +
        "fixed per-batch cost (trigger + checkpoint + probe planning) — " +
        "no batch size reaches it; raise the target or shrink the fixed " +
        "term (fewer probe stages, cheaper checkpoint store)")
    ((targetLatencySec - fixedSec) * rowsPerSec).toLong
  }

  /** Rows per batch where the marginal cost equals the fixed cost —
    * below this, a micro-batch spends most of its wall on trigger +
    * checkpoint + probe planning rather than on data. ~231 k rows at
    * the measured local[32] terms (the PLANS.md "~250 k efficiency
    * floor"). */
  def ingestEfficiencyFloorRows(fixedSec: Double = 3.5,
                                rowsPerSec: Double = 66000.0): Long = {
    require(fixedSec >= 0 && rowsPerSec > 0,
      s"fixedSec must be >= 0 and rowsPerSec positive: $fixedSec, $rowsPerSec")
    (fixedSec * rowsPerSec).toLong
  }

  /** The `maxFilesPerTrigger` value that realizes a latency target,
    * given the ingest files' row count (the content-keyed ingest
    * writes bounded files on purpose): floor(budget / rowsPerFile),
    * at least 1 — one file per trigger is the smallest batch the
    * source can form, so a sub-file budget degrades to the file's own
    * latency rather than failing. */
  def ingestMaxFilesPerTrigger(targetLatencySec: Double, rowsPerFile: Long,
                               fixedSec: Double = 3.5,
                               rowsPerSec: Double = 66000.0): Int = {
    require(rowsPerFile > 0, s"rowsPerFile must be positive: $rowsPerFile")
    val budget = ingestBatchRows(targetLatencySec, fixedSec, rowsPerSec)
    math.max(1L, budget / rowsPerFile).min(Int.MaxValue).toInt
  }

  /** Forward form of the same model: predicted micro-batch wall for a
    * given batch size — fixed + rows/rate. For capacity planning
    * (does tonight's backlog drain before morning?) and for checking
    * a re-fit: the two measured anchors were ~167 k rows → ~3.7 s and
    * ~1.67 M rows → ~26.3 s. */
  def ingestBatchWallSec(rows: Long, fixedSec: Double = 3.5,
                         rowsPerSec: Double = 66000.0): Double = {
    require(rows >= 0 && fixedSec >= 0 && rowsPerSec > 0,
      s"rows/fixedSec must be >= 0 and rowsPerSec positive: $rows, $fixedSec, $rowsPerSec")
    fixedSec + rows / rowsPerSec
  }

  /** Streaming corpus ingestion with dedup — the continuous-crawl
    * loop: each micro-batch of documents is collapsed to one row per
    * distinct content (min-id keeper), filtered against the PERSISTED
    * fingerprint index via the bloom fast path
    * ([[graft.operators.Dedup.newDocs]]), and the survivors are
    * appended to the corpus, the index, and the bloom sketch — so the
    * next batch dedups against everything ingested so far without
    * ever rescanning the corpus text.
    *
    * Exactly-once from at-least-once replay, by construction:
    * corpus/index rows land in an `ingest_id=<key>` partition that a
    * replayed batch OVERWRITES (same input → same rows), the index
    * read EXCLUDES the current batch's own partition (a crashed
    * attempt's partial index write must not make the replay filter
    * its own documents out), and the bloom update is a set-union OR —
    * re-ORing the same elements is a no-op. A bloom polluted by a
    * crashed attempt is harmless: bloom positives always fall through
    * to the exact index anti-join.
    *
    * The partition key is a CONTENT identity — row count plus the
    * bit-XOR of per-row `xxhash64(id, text)`, an order-independent
    * digest of the batch's rows — not the checkpoint's batch number.
    * Batch numbers are stable only within one checkpoint lineage: a
    * fresh checkpoint (or a changed maxFilesPerTrigger) renumbers
    * batches from 0, and a positional key would overwrite partitions
    * holding DIFFERENT documents (silent row loss) while the
    * own-partition exclusion re-admitted duplicates. Content keys
    * make re-ingestion against existing tables safe under ANY
    * batching: a crash replay of the SAME rows lands on the same
    * partition (overwrite, idempotent), while a re-batched replay
    * writes fresh partitions whose docs dedup against the old ones
    * through the index as usual. The digest costs one extra aggregate
    * over the micro-batch (already materialized by the source — no
    * input re-read).
    *
    * The bloom sketch lives at `bloomPath` (one binary row); sizing
    * (`expectedItems`/`numBits`) is fixed at first write — merges
    * require identical geometry.
    *
    * Pass `sigPath` to ALSO near-dedup each batch against everything
    * ingested so far: exact survivors are minhash-signed once, probed
    * against the persisted signature table
    * ([[graft.operators.Dedup.newNearBySignatures]] — banding +
    * signature-agreement verify, history text never read), and the
    * survivors' signatures land in `sigPath/ingest_id=<key>` under the
    * same replay discipline (per-batch overwrite, self-partition
    * exclusion). Near-dup pairs WITHIN one batch both survive — the
    * near filter is against history by design; run the batch through
    * [[graft.operators.Dedup.dedupDocuments]] first if intra-batch
    * near-collapse is wanted. */
  def streamIngestDedup(docs: DataFrame, corpusPath: String, indexPath: String,
                        bloomPath: String, checkpoint: String,
                        idCol: String = "doc_id", textCol: String = "text",
                        expectedItems: Long = 1000000L, numBits: Long = 1L << 23,
                        sigPath: String = null,
                        trigger: org.apache.spark.sql.streaming.Trigger =
                          org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val hconf = spark.sparkContext.hadoopConfiguration
        graft.sources.Lake.healCrashedOverwrite(spark, bloomPath)
        def exists(p: String) =
          new org.apache.hadoop.fs.Path(p).getFileSystem(hconf)
            .exists(new org.apache.hadoop.fs.Path(p))
        // stable content identity of this batch (see scaladoc); the
        // foreachBatch DF is a materialized LogicalRDD, so the digest
        // aggregate never re-reads the source
        val ingestId = {
          val r = batch.agg(
            count(lit(1)).cast("long").as("n"),
            bit_xor(xxhash64(col(idCol), col(textCol))).as("x")).head()
          val x = if (r.isNullAt(1)) 0L else r.getLong(1)
          f"n${r.getLong(0)}-x$x%016x"
        }
        // one row per distinct content within the batch (min-id keeper)
        val reps = graft.operators.Dedup.keyedDeterministicAgg(
          batch.withColumn("__fp", graft.functions.Text.fingerprint(col(textCol))),
          Seq("__fp"), idCol)
        val survivors =
          if (!exists(indexPath)) reps
          else {
            // exclude this batch's own partition: a crashed attempt's
            // index write must not hide the replay's documents
            val index = spark.read.parquet(indexPath)
              .where(col("ingest_id") =!= ingestId)
            val bloom =
              if (exists(bloomPath))
                spark.read.parquet(bloomPath).head().getAs[Array[Byte]]("bloom")
              else null
            // reps already carries the fingerprint — don't pay the
            // normalize+sha256 pass a second time
            val newIds = graft.operators.Dedup.newDocsByFingerprint(
              reps.select(col(idCol).as("doc_id"), col("__fp").as("fingerprint")),
              index, bloom)
              .select(col("doc_id").as(idCol))
            reps.join(newIds, Seq(idCol), "left_semi")
          }
        // optional near-dup stage: sign the exact survivors ONCE, probe
        // the persisted signature table (minus this batch's own
        // partition), keep only near-new docs and their signatures
        val (nearKept, keptSigs) =
          if (sigPath == null) (survivors, None)
          else {
            // localCheckpoint: the signature subtree (shingle explode +
            // k min-aggs) otherwise recomputes in each of the probe's
            // three joins AND the signature write below
            val bSigs = graft.operators.Dedup.minhashSignatures(
              survivors, idCol, textCol).localCheckpoint()
            val keepIds =
              if (!exists(sigPath)) bSigs.select(col("doc_id"))
              else graft.operators.Dedup.newNearBySignatures(bSigs,
                spark.read.parquet(sigPath).where(col("ingest_id") =!= ingestId))
            val keep = keepIds.withColumnRenamed("doc_id", idCol)
            (survivors.join(keep, Seq(idCol), "left_semi"),
              Some(bSigs.join(keepIds, Seq("doc_id"), "left_semi")))
          }
        val out = nearKept.localCheckpoint() // one computation, N writes
        keptSigs.foreach(_.write.mode("overwrite")
          .parquet(s"$sigPath/ingest_id=$ingestId"))
        out.drop("__fp").write.mode("overwrite")
          .parquet(s"$corpusPath/ingest_id=$ingestId")
        out.select(col(idCol).as("doc_id"), col("__fp").as("fingerprint"))
          .write.mode("overwrite").parquet(s"$indexPath/ingest_id=$ingestId")
        val batchBloom = graft.operators.Dedup.fingerprintBloom(
          out.select(col("__fp").as("fingerprint")), "fingerprint",
          expectedItems, numBits)
        if (batchBloom != null) {
          val merged =
            if (!exists(bloomPath)) batchBloom
            else {
              val old = spark.read.parquet(bloomPath).head().getAs[Array[Byte]]("bloom")
              val a = org.apache.spark.util.sketch.BloomFilter
                .readFrom(new java.io.ByteArrayInputStream(old))
              val b = org.apache.spark.util.sketch.BloomFilter
                .readFrom(new java.io.ByteArrayInputStream(batchBloom))
              val bos = new java.io.ByteArrayOutputStream()
              a.mergeInPlace(b).writeTo(bos)
              bos.toByteArray
            }
          import spark.implicits._
          // stage-and-rename: a crash mid-update heals next batch
          graft.sources.Lake.overwriteSelf(Seq(Tuple1(merged)).toDF("bloom"), bloomPath)
        }
        ()
      }
      .start()

  /** Streaming maintenance of the persisted two-level ANN index — the
    * [[streamIngestDedup]] discipline for the embedding family, and the
    * loop a 100 TB crawl actually runs: the FIRST micro-batch
    * bootstraps the index (train k1×k2 deterministic Lloyd + bucketed
    * write + the per-cell error baseline), every later batch
    * frozen-assigns against the stored codebooks and bucket-inserts —
    * one assignment pass over Δ rows per batch, never a retrain — and
    * the batch's drift ratio vs the BUILD-TIME baseline (read from the
    * k1·k2-row stats artifact, the index itself untouched) decides
    * retraining via [[graft.operators.Clustering.twoLevelRetrainNeeded]].
    * This loop only APPENDS; when a batch trips the trigger it logs
    * `RETRAIN NEEDED` and keeps appending — rebuilding the index is a
    * batch job the operator schedules (the 507 s-class cost the append
    * path exists to amortize), not something a micro-batch should
    * absorb.
    *
    * Restart-safe the same way the ingest loop is: the checkpoint
    * replays unprocessed files, the bootstrap branch keys on the
    * index's `_SUCCESS`, and a re-delivered append batch re-inserts —
    * exactly-once for the probe path needs the upstream's file-grain
    * idempotence (AvailableNow + the checkpoint give it). */
  /** Content identity of a vector micro-batch — the
    * [[streamIngestDedup]] digest discipline for the index loops: row
    * count + order-independent bit-XOR of per-row xxhash64(id, vec).
    * The foreachBatch frame is a materialized LogicalRDD, so the
    * aggregate never re-reads the source. */
  private def vecBatchDigest(batch: DataFrame, idCol: String,
                             vecCol: String): String = {
    val r = batch.agg(count(lit(1)).cast("long").as("n"),
      bit_xor(xxhash64(col(idCol), col(vecCol))).as("x")).head()
    val x = if (r.isNullAt(1)) 0L else r.getLong(1)
    f"n${r.getLong(0)}-x$x%016x"
  }

  /** Applied-batch markers for the index-append loops: an append is
    * NOT naturally idempotent (a replayed batch re-inserts its rows —
    * duplicated probe candidates for the two-level index, DOUBLED ADC
    * partial sums for PQ), so each applied batch leaves a marker named
    * by its content digest and a replay — checkpoint-crash re-delivery
    * OR a fresh-checkpoint re-run over the same files — skips. Content
    * keys, not batch numbers: a fresh checkpoint renumbers batches from
    * 0 (the streamIngestDedup lesson). The residual window is a crash
    * BETWEEN the insert and the marker touch — that one batch
    * re-inserts on replay, the bounded exposure the scaladocs name. */
  private def batchApplied(spark: SparkSession, root: String,
                           digest: String): Boolean =
    graft.sources.Lake.pathExists(spark, s"$root/_applied/$digest")

  private def markBatchApplied(spark: SparkSession, root: String,
                               digest: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$root/_applied/$digest")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(p.getParent)
    fs.create(p, true).close()
  }

  // ---- maintenance signals as DATA — the scheduler contract. The
  // loops' RETRAIN/COMPACT decisions were stdout-only (`println`),
  // which nothing can schedule on; each applied batch now also appends
  // ONE tiny row to `$root/_signals` (parquet, append-only) carrying
  // the decision AND the drift ratio it was made on — the same pooled
  // arithmetic the rule used, via
  // [[graft.operators.Clustering.pooledDriftMeans]]. println stays as
  // a courtesy. The signal lands BEFORE the applied marker: a crash
  // between the two duplicates one signal row on replay (consumers
  // dedup by digest), which beats the alternative — an applied batch
  // whose RETRAIN NEEDED signal was lost. ----

  private val signalsSchema = StructType(Seq(
    StructField("seq", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("version", LongType, nullable = false),
    StructField("n_rows", LongType, nullable = false),
    StructField("drift_ratio", DoubleType, nullable = true),
    StructField("retrain_needed", BooleanType, nullable = false),
    StructField("compact_needed", BooleanType, nullable = false),
    StructField("digest", StringType, nullable = false)))

  /** Row count parsed back out of a [[vecBatchDigest]] (format
    * `n<count>-x<hex>`) — the digest already paid the count. */
  private def digestRows(digest: String): Long =
    digest.drop(1).takeWhile(_ != '-').toLong

  /** Files budget for the `_signals` dir before [[appendIndexSignal]]
    * compacts it opportunistically from the loop — the audit trail
    * gained its own growth rule in round 15 ([[compactIndexSignals]])
    * but the trigger was caller-driven, so a long-lived loop still
    * grew one tiny file per batch forever. 64 files ≈ 64 batches of
    * headroom; the rewrite is a few-KB read, safe inside a micro-batch
    * (unlike the index compactions, which stay schedule-don't-absorb). */
  val SignalsCompactMaxFiles: Int = 64

  private def signalsFileCount(spark: SparkSession, root: String): Int = {
    val p = new org.apache.hadoop.fs.Path(s"$root/_signals")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0
    else fs.listStatus(p)
      .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
  }

  private def appendIndexSignal(spark: SparkSession, root: String,
                                kind: String, version: Long, digest: String,
                                driftRatio: Option[Double],
                                retrain: Boolean, compact: Boolean,
                                seqCache: java.util.concurrent.atomic.AtomicLong,
                                signalsCompactMaxFiles: Int = SignalsCompactMaxFiles): Unit = {
    val dir = s"$root/_signals"
    // seq = max existing seq + 1: the loops run their batches serially
    // (foreachBatch is single-threaded per query), so this is a stable
    // per-root sequence; a crash-replayed batch can duplicate one row
    // (see above) — consumers key on digest. The loop caches its last
    // seq in the foreachBatch closure (seqCache, -1 = not yet read), so
    // the max(seq) read — one column, but still a per-file footer
    // listing, O(B²) over a stream's life without the cache — is paid
    // once per loop, not once per batch. max(seq), not count(): the
    // sequence survives duplicates, a [[compactIndexSignals]] rewrite,
    // and interleaved [[acknowledgeMaintenance]] rows (which reuse the
    // current max, never allocating the cache's next value).
    val seq =
      if (seqCache.get() >= 0L) seqCache.get() + 1L
      else if (graft.sources.Lake.pathExists(spark, dir)) {
        val r = spark.read.schema(signalsSchema).parquet(dir)
          .agg(max(col("seq"))).head()
        if (r.isNullAt(0)) 0L else r.getLong(0) + 1L
      } else 0L
    val row = org.apache.spark.sql.Row(seq, kind, version, digestRows(digest),
      driftRatio.map(java.lang.Double.valueOf).orNull, retrain, compact, digest)
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(row), 1), signalsSchema)
      .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(dir)
    seqCache.set(seq)
    // opportunistic audit-trail compaction: rows preserved verbatim,
    // seq derivation unaffected (it reads max(seq), and this loop holds
    // it cached anyway). One name listing per batch, bounded by the
    // budget itself once the rewrite keeps the dir small. External
    // writers ([[acknowledgeMaintenance]]) racing this rewrite is the
    // one coordination gap — run acks from the scheduler that also owns
    // the rewrites, or accept a re-ack (acks are idempotent).
    if (signalsFileCount(spark, root) > signalsCompactMaxFiles)
      compactIndexSignals(spark, root)
  }

  /** The maintenance-signals table of a versioned streaming index root
    * — one row per applied batch: (seq, kind bootstrap|append, version
    * served, n_rows, drift_ratio vs the serving generation's build-time
    * baseline (null for bootstrap), retrain_needed, compact_needed,
    * digest). This is what a scheduler consumes to EXECUTE
    * [[graft.operators.Clustering.twoLevelRetrain]] /
    * [[graft.operators.Clustering.compactTwoLevelIndex]] /
    * [[graft.operators.Clustering.pqRetrain]] /
    * [[graft.operators.Clustering.compactPqIndex]] — and the
    * after-the-fact audit trail of every decision the loop made. */
  def readIndexSignals(spark: SparkSession, root: String): DataFrame =
    spark.read.schema(signalsSchema).parquet(s"$root/_signals")

  /** The scheduler's poll, closed over the staleness rule: FOLD over
    * every signal row made against the CURRENTLY serving generation —
    * pending = some row still needs the action AND no acknowledgement
    * has landed since. Reading only the latest row (the round-15
    * spelling) masked an unanswered retrain: drift is computed
    * per-batch against the build-time baseline, so a drifted batch's
    * retrain_needed=true followed by one in-distribution batch cleared
    * the poll while the drifted rows stayed served under stale
    * codebooks. The fold keeps the decision until it is ANSWERED, by
    * either of two acknowledgements:
    *   - the version protocol: a signal whose version predates
    *     `_latest` is already answered (the retrain it asked for
    *     published a newer generation) — an executed
    *     [[graft.operators.Clustering.twoLevelRetrain]] /
    *     [[graft.operators.Clustering.pqRetrain]] clears with no
    *     writeback;
    *   - an explicit ack row ([[acknowledgeMaintenance]], kinds
    *     `retrained`/`compacted`) at a seq >= the need — the only
    *     protocol compaction has (an executed
    *     [[graft.operators.Clustering.compactPqIndex]] never moves
    *     `_latest`, so without the ack a scheduler acting on this poll
    *     would re-compact in a loop), and the one unversioned in-place
    *     rebuilds have.
    * One aggregate read + one marker read; (false, false) when nothing
    * has been applied yet. Unversioned roots (signal version 0, no
    * marker) fold over all their rows. */
  def pendingMaintenance(spark: SparkSession, root: String): (Boolean, Boolean) = {
    if (!graft.sources.Lake.pathExists(spark, s"$root/_signals")) return (false, false)
    val serving = graft.sources.Lake.latestVersion(spark, root).getOrElse(0L)
    val r = readIndexSignals(spark, root)
      .where(col("version") === serving)
      .agg(max(when(col("retrain_needed"), col("seq"))).as("need_retrain"),
        max(when(col("compact_needed"), col("seq"))).as("need_compact"),
        max(when(col("kind") === "retrained", col("seq"))).as("ack_retrain"),
        max(when(col("kind") === "compacted", col("seq"))).as("ack_compact"))
      .head()
    // pending = the newest need postdates the newest ack (ack rows take
    // seq = the max they answer, so "since the ack" is strict >)
    def pending(need: Int, ack: Int): Boolean =
      !r.isNullAt(need) && (r.isNullAt(ack) || r.getLong(need) > r.getLong(ack))
    (pending(0, 2), pending(1, 3))
  }

  /** Acknowledge an EXECUTED maintenance action in the signals table —
    * the writeback half of [[pendingMaintenance]]'s contract for the
    * actions the version protocol can't answer: `compacted` (a codes/
    * index rewrite never moves `_latest`) and `retrained` on an
    * UNVERSIONED root (an in-place rebuild has no generation to bump).
    * The ack row reuses the CURRENT max seq — "everything decided up
    * to here is answered" — rather than allocating the next one, so it
    * can never collide with the loop's cached sequence; a batch
    * appended after the ack takes max+1 and re-opens the pending state
    * exactly as it should. Idempotent; a no-op on an empty table. */
  def acknowledgeMaintenance(spark: SparkSession, root: String,
                             action: String): Unit = {
    require(action == "retrained" || action == "compacted",
      s"ack kind must be retrained|compacted: $action")
    if (!graft.sources.Lake.pathExists(spark, s"$root/_signals")) return
    val m = readIndexSignals(spark, root).agg(max(col("seq"))).head()
    if (m.isNullAt(0)) return
    val seq = m.getLong(0)
    val serving = graft.sources.Lake.latestVersion(spark, root).getOrElse(0L)
    val row = org.apache.spark.sql.Row(seq, action, serving, 0L, null,
      false, false, s"ack-$action-seq$seq")
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(row), 1), signalsSchema)
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .parquet(s"$root/_signals")
  }

  /** Execute the compaction [[pendingMaintenance]] schedules for a PQ
    * root — versioned (rewrites the SERVING generation's codes dir) or
    * unversioned — and acknowledge it, so the poll clears without
    * waiting for the next append. Returns (filesBefore, filesAfter). */
  def compactServingPqIndex(spark: SparkSession, root: String,
                            targetFiles: Int = 0): (Int, Int) = {
    val dir = graft.sources.Lake.latestVersion(spark, root)
      .map(v => graft.sources.Lake.versionPath(root, v)).getOrElse(root)
    val r = graft.operators.Clustering.compactPqIndex(spark, dir, targetFiles)
    acknowledgeMaintenance(spark, root, "compacted")
    r
  }

  /** [[compactServingPqIndex]]'s two-level twin: compact the serving
    * generation's bucketed index dir (or the unversioned root's) and
    * acknowledge. Opens the index first so the catalog entry the
    * compactor rewrites through exists in this session. */
  def compactServingTwoLevelIndex(spark: SparkSession, tablePrefix: String,
                                  root: String, nBuckets: Int): (Int, Int) = {
    val (table, dir) = graft.sources.Lake.latestVersion(spark, root) match {
      case Some(v) => (s"${tablePrefix}_v$v", graft.sources.Lake.versionPath(root, v))
      case None => (tablePrefix, root)
    }
    graft.operators.Clustering.twoLevelOpenIndex(spark, table, dir, nBuckets)
    val r = graft.operators.Clustering.compactTwoLevelIndex(spark, table, dir,
      nBuckets)
    acknowledgeMaintenance(spark, root, "compacted")
    r
  }

  /** Compact the `_signals` table back to `targetFiles` files — the
    * table grows ONE tiny parquet file per applied batch (the same
    * unbounded-growth pathology [[pruneAppliedMarkers]] and
    * [[graft.operators.Clustering.compactPqIndex]] close for their
    * dirs), and every [[appendIndexSignal]] seq derivation pays the
    * footer listing. Signals are the AUDIT TRAIL, so the treatment is
    * compaction (rows preserved verbatim, seq continues — it derives
    * from max(seq), not file count), never pruning. Same staged
    * crash-healing swap as every rewrite here. */
  def compactIndexSignals(spark: SparkSession, root: String,
                          targetFiles: Int = 1): Unit = {
    require(targetFiles > 0, s"targetFiles must be positive: $targetFiles")
    val dir = s"$root/_signals"
    graft.sources.Lake.healCrashedOverwrite(spark, dir)
    if (graft.sources.Lake.pathExists(spark, dir))
      graft.sources.Lake.overwriteSelf(
        spark.read.schema(signalsSchema).parquet(dir).repartition(targetFiles),
        dir)
  }

  /** Prune the `_applied` marker dir to the newest `keep` markers (by
    * FS modification time) — the dir otherwise grows one empty file
    * per applied batch FOREVER, and at micro-batch cadence its listing
    * cost eventually rivals the data fragmentation the compactor
    * fixes. A `_watermark` file (never a digest name: digests start
    * with 'n') records how many markers pruning has dropped — a
    * CUMULATIVE total carried read-modify-write across prunes (each
    * overwrite folds the previous total in), plus the latest prune's
    * own count.
    *
    * The replay-window tradeoff, explicitly: a replayed batch whose
    * marker was pruned RE-INSERTS. Checkpoint crash-recovery only ever
    * replays the last uncommitted micro-batch, so any keep >= 1 covers
    * it; what pruning deliberately gives up is fresh-checkpoint
    * re-runs over input older than the retained window — size `keep`
    * to the replay horizon you actually operate (markers are empty
    * files, so thousands are cheap; the enemy is millions). Returns
    * the number of markers deleted. */
  def pruneAppliedMarkers(spark: SparkSession, root: String, keep: Int): Int = {
    require(keep >= 1, s"keep must cover at least the crash-replay window: $keep")
    val dir = new org.apache.hadoop.fs.Path(s"$root/_applied")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) return 0
    // skip `_`-prefixed (the watermark) AND `.`-prefixed names: the
    // local ChecksumFileSystem shadows every marker with a `.name.crc`
    // sibling, which is bookkeeping, not a marker (fs.delete of the
    // marker removes its crc with it)
    val markers = fs.listStatus(dir).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))
      .sortBy(-_.getModificationTime)
    if (markers.size <= keep) return 0
    // prune only STRICTLY older than the keep-th newest marker's
    // mtime: under coarse mtime granularity (1 s object-store
    // semantics) several markers tie, and a position-based drop could
    // delete the NEWEST batch's marker while retaining an older tied
    // one — breaking the "any keep >= 1 covers the crash-replay
    // window" guarantee. keep is thereby a lower bound, not an exact
    // count, which is the safe direction for a retention rule.
    val cutoff = markers(keep - 1).getModificationTime
    val drop = markers.drop(keep).filter(_.getModificationTime < cutoff)
    drop.foreach(s => fs.delete(s.getPath, false))
    if (drop.nonEmpty) {
      // cumulative total survives the overwrite: fold the previous
      // watermark's pruned_total in before rewriting (single-writer
      // read-modify-write — prunes run from the maintenance job, not
      // concurrently)
      val wm = new org.apache.hadoop.fs.Path(dir, "_watermark")
      val prior =
        if (!fs.exists(wm)) 0L
        else {
          val in = fs.open(wm)
          val txt =
            try new String(in.readAllBytes(),
              java.nio.charset.StandardCharsets.UTF_8)
            finally in.close()
          "pruned_total=(\\d+)".r.findFirstMatchIn(txt)
            .map(_.group(1).toLong).getOrElse(0L)
        }
      val out = fs.create(wm, true)
      try out.write((s"pruned_total=${prior + drop.size} " +
        s"last_pruned=${drop.size} kept=${math.min(keep, markers.size)}")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
    drop.size
  }

  /** [[streamIndexAppend]] COMPOSED with versioned serving — the
    * deployment shape the two arcs were built for separately: the
    * bootstrap micro-batch trains and PUBLISHES generation 1 through
    * the full staged marker-flip-last protocol
    * ([[graft.operators.Clustering.twoLevelPublishVersion]]), every
    * later batch opens the SERVING generation (`_latest`) and
    * bucket-inserts into its table, drift rides the generation's own
    * build-time stats artifact, and the RETRAIN the signal schedules
    * is actually EXECUTABLE against this root —
    * [[graft.operators.Clustering.twoLevelRetrain]] publishes v2 from
    * v1's own table while v1 keeps serving, and the loop's next batch
    * follows `_latest` to v2 automatically. Decisions land in the
    * `_signals` table ([[readIndexSignals]]), not just stdout.
    *
    * Restart-safety needs no `_SUCCESS` keying here: a crash anywhere
    * BEFORE the publish's marker flip leaves `_latest` unwritten, so
    * the replay re-runs the bootstrap and the publish reclaims its own
    * staging; a crash in the one remaining window — AFTER the flip but
    * before the applied-marker touch — replays the bootstrap batch
    * down the append path, where the generation's own
    * `_bootstrap_digest` artifact (staged atomically WITH the
    * generation) turns it into a heal-and-skip instead of a silent
    * re-insert of the whole bootstrap corpus. Appends keep the
    * content-digest applied markers (a replayed batch is a skip, not a
    * double insert; the bounded exposure is one APPEND batch between
    * its insert and its marker touch). */
  def streamIndexAppendVersioned(vecs: DataFrame, tablePrefix: String,
                                 root: String, checkpoint: String,
                                 nBuckets: Int = 16, k1: Int = 4, k2: Int = 4,
                                 idCol: String = "vec_id",
                                 vecCol: String = "embedding",
                                 trigger: org.apache.spark.sql.streaming.Trigger =
                                   org.apache.spark.sql.streaming.Trigger.AvailableNow(),
                                 compactMaxFiles: Int =
                                   graft.operators.Clustering.IndexCompactFilesPerBucket,
                                 signalsCompactMaxFiles: Int = SignalsCompactMaxFiles)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    // per-loop signal-sequence cache (foreachBatch is single-threaded
    // per query): max(seq) is read from the table once, then advanced
    // in memory — see appendIndexSignal
    val seqCache = new java.util.concurrent.atomic.AtomicLong(-1L)
    vecs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val C = graft.operators.Clustering
        val digest = vecBatchDigest(batch, idCol, vecCol)
        graft.sources.Lake.latestVersion(spark, root) match {
          case None =>
            val (index, cbs) = C.twoLevelIndex(batch, k1, k2,
              idCol = idCol, vecCol = vecCol)
            val v = C.twoLevelPublishVersion(spark, index, cbs, tablePrefix,
              root, nBuckets, bootstrapDigest = Some(digest))
            appendIndexSignal(spark, root, "bootstrap", v, digest,
              driftRatio = None, retrain = false, compact = false, seqCache)
            markBatchApplied(spark, root, digest)
            println(s"[index-append-v] batch=$batchId bootstrap: published v$v")
          case Some(_) if batchApplied(spark, root, digest) =>
            println(s"[index-append-v] batch=$batchId already applied ($digest) — skipped")
          case Some(_) =>
            val gen = C.twoLevelOpenVersion(spark, tablePrefix, root, nBuckets)
            if (C.bootstrapDigestOf(spark, gen.dir).contains(digest)) {
              // the publish-flip-then-crash window: this batch IS the
              // generation's own bootstrap corpus, replayed after its
              // applied marker was lost — heal the marker, never
              // re-insert. The signal-before-marker ordering protects
              // append rows but not this window (the signal lands AFTER
              // the flip), so heal the audit row too, idempotently:
              // without it the trail's first row would be an append
              // against an undocumented generation
              healBootstrapSignal(spark, root, gen.version, digest, seqCache)
              markBatchApplied(spark, root, digest)
              println(s"[index-append-v] batch=$batchId is v${gen.version}'s " +
                "bootstrap corpus — marker healed, skipped")
            } else {
            val appended = C.twoLevelAppend(spark, gen.table, gen.dir, nBuckets,
              batch, idCol, vecCol)
            val drift = C.twoLevelDriftFromStats(
              C.twoLevelReadStats(spark, gen.dir), appended)
            val pooled = C.pooledDriftMeans(drift)
            val retrain = C.retrainNeededFromPooled(pooled)
            val compact = C.indexCompactionNeeded(spark, s"${gen.dir}/index",
              compactMaxFiles)
            appendIndexSignal(spark, root, "append", gen.version, digest,
              pooled.map { case (nm, bm) => nm / bm }, retrain, compact, seqCache,
              signalsCompactMaxFiles)
            markBatchApplied(spark, root, digest)
            println(s"[index-append-v] batch=$batchId appended to v${gen.version}" +
              (if (retrain) " — RETRAIN NEEDED (drift over tolerance)" else "") +
              (if (compact) " — COMPACT NEEDED (bucket fragmentation over threshold)"
               else ""))
            }
        }
        ()
      }
      .start()
  }

  /** Idempotently (re)write a generation's bootstrap signal row from
    * the heal-and-skip branch: a crash between the publish's marker
    * flip and the bootstrap's appendIndexSignal loses that one audit
    * row permanently without this (the replay heals the APPLIED marker
    * but previously wrote no signal). Keyed on (kind, digest) — a
    * second heal of the same window is a no-op. */
  private def healBootstrapSignal(spark: SparkSession, root: String,
                                  version: Long, digest: String,
                                  seqCache: java.util.concurrent.atomic.AtomicLong): Unit = {
    val have = graft.sources.Lake.pathExists(spark, s"$root/_signals") &&
      !readIndexSignals(spark, root)
        .where(col("kind") === "bootstrap" && col("digest") === digest)
        .isEmpty
    if (!have)
      appendIndexSignal(spark, root, "bootstrap", version, digest,
        driftRatio = None, retrain = false, compact = false, seqCache)
  }

  /** [[streamPqIndexAppend]] composed with versioned serving — the PQ
    * twin of [[streamIndexAppendVersioned]]: bootstrap publishes v1
    * via [[graft.operators.Clustering.pqPublishVersion]], appends
    * frozen-encode into the serving generation's codes table, drift
    * rides its build-time stats, decisions land in `_signals`, and the
    * trigger's retrain is executable via
    * [[graft.operators.Clustering.pqRetrain]] against this root (with
    * the caller's CURRENT corpus — PQ codes are lossy, the one
    * structural difference from the two-level arc). The compact signal
    * is [[graft.operators.Clustering.pqCompactionNeeded]] — ADC scans
    * every codes file per probe, so fragmentation here taxes the hot
    * serving path, not just probed buckets. */
  def streamPqIndexAppendVersioned(vecs: DataFrame, root: String,
                                   checkpoint: String,
                                   m: Int = 4, k: Int = 8, dim: Int = 64,
                                   idCol: String = "vec_id",
                                   vecCol: String = "embedding",
                                   trigger: org.apache.spark.sql.streaming.Trigger =
                                     org.apache.spark.sql.streaming.Trigger.AvailableNow(),
                                   compactMaxFiles: Int =
                                     graft.operators.Clustering.PqCompactMaxFiles,
                                   signalsCompactMaxFiles: Int = SignalsCompactMaxFiles)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val seqCache = new java.util.concurrent.atomic.AtomicLong(-1L)
    vecs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val C = graft.operators.Clustering
        val digest = vecBatchDigest(batch, idCol, vecCol)
        graft.sources.Lake.latestVersion(spark, root) match {
          case None =>
            val (codes, cbs) = C.pqTrainEncode(batch, m, k, iters = 2, dim,
              idCol, vecCol)
            val v = C.pqPublishVersion(spark, codes, cbs, root,
              bootstrapDigest = Some(digest))
            appendIndexSignal(spark, root, "bootstrap", v, digest,
              driftRatio = None, retrain = false, compact = false, seqCache)
            markBatchApplied(spark, root, digest)
            println(s"[pq-append-v] batch=$batchId bootstrap: published v$v")
          case Some(_) if batchApplied(spark, root, digest) =>
            println(s"[pq-append-v] batch=$batchId already applied ($digest) — skipped")
          case Some(_) =>
            val gen = C.pqOpenVersion(spark, root)
            if (C.bootstrapDigestOf(spark, gen.dir).contains(digest)) {
              // the publish-flip-then-crash window: a re-encoded replay
              // of the bootstrap corpus would DOUBLE every vector's ADC
              // partial sums — heal the marker instead (and the lost
              // bootstrap audit row, idempotently)
              healBootstrapSignal(spark, root, gen.version, digest, seqCache)
              markBatchApplied(spark, root, digest)
              println(s"[pq-append-v] batch=$batchId is v${gen.version}'s " +
                "bootstrap corpus — marker healed, skipped")
            } else {
            val encoded = C.pqAppend(spark, gen.dir, batch, m, k, dim,
              idCol, vecCol)
            val drift = C.pqDriftFromStats(C.pqReadStats(spark, gen.dir), encoded)
            val pooled = C.pooledDriftMeans(drift)
            val retrain = C.retrainNeededFromPooled(pooled)
            val compact = C.pqCompactionNeeded(spark, gen.dir, compactMaxFiles)
            appendIndexSignal(spark, root, "append", gen.version, digest,
              pooled.map { case (nm, bm) => nm / bm }, retrain, compact, seqCache,
              signalsCompactMaxFiles)
            markBatchApplied(spark, root, digest)
            println(s"[pq-append-v] batch=$batchId appended to v${gen.version}" +
              (if (retrain) " — RETRAIN NEEDED (drift over tolerance)" else "") +
              (if (compact) " — COMPACT NEEDED (codes fragmentation over threshold)"
               else ""))
            }
        }
        ()
      }
      .start()
  }

  def streamIndexAppend(vecs: DataFrame, table: String, root: String,
                        checkpoint: String, nBuckets: Int = 16,
                        k1: Int = 4, k2: Int = 4,
                        idCol: String = "vec_id", vecCol: String = "embedding",
                        trigger: org.apache.spark.sql.streaming.Trigger =
                          org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val seqCache = new java.util.concurrent.atomic.AtomicLong(-1L)
    vecs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val C = graft.operators.Clustering
        val digest = vecBatchDigest(batch, idCol, vecCol)
        // bootstrap keys on the LAST artifact twoLevelWriteIndex lands
        // (index, then codebooks, then STATS): a crash mid-bootstrap
        // leaves index/_SUCCESS without codebooks/stats, and keying on
        // the first artifact would send every replay down an append
        // path that throws reading the missing baseline — wedged
        // forever; keying on the last re-runs the bootstrap, whose
        // Overwrite writes make it idempotent (the PQ loop's rule)
        if (!graft.sources.Lake.pathExists(spark, s"$root/stats/_SUCCESS")) {
          val (index, cbs) = C.twoLevelIndex(batch, k1, k2,
            idCol = idCol, vecCol = vecCol)
          C.twoLevelWriteIndex(index, cbs, table, root, nBuckets)
          // the bootstrap batch's digest too: a checkpoint crash after
          // this write replays batch 0 down the APPEND path (the index
          // exists now) — the marker turns that into a skip, not a
          // duplicate insert of the entire bootstrap corpus
          appendIndexSignal(spark, root, "bootstrap", 0L, digest,
            driftRatio = None, retrain = false, compact = false, seqCache)
          markBatchApplied(spark, root, digest)
          println(s"[index-append] batch=$batchId bootstrap: trained ${k1}x$k2 index")
        } else if (batchApplied(spark, root, digest)) {
          println(s"[index-append] batch=$batchId already applied ($digest) — skipped")
        } else {
          val appended = C.twoLevelAppend(spark, table, root, nBuckets,
            batch, idCol, vecCol)
          val drift = C.twoLevelDriftFromStats(
            C.twoLevelReadStats(spark, root), appended)
          val pooled = C.pooledDriftMeans(drift)
          val retrain = C.retrainNeededFromPooled(pooled)
          // same schedule-don't-absorb contract as the retrain: the
          // rewrite ([[graft.operators.Clustering.compactTwoLevelIndex]])
          // is bounded by the index size — a batch job, not micro-batch
          // work; the rule here is one directory listing
          val compact = C.indexCompactionNeeded(spark, s"$root/index")
          // the unversioned layout signals too (version 0 = no
          // generation protocol) — a scheduler reads the same table
          // either way
          appendIndexSignal(spark, root, "append", 0L, digest,
            pooled.map { case (nm, bm) => nm / bm }, retrain, compact, seqCache)
          markBatchApplied(spark, root, digest)
          println(s"[index-append] batch=$batchId appended" +
            (if (retrain) " — RETRAIN NEEDED (drift over tolerance)" else "") +
            (if (compact) " — COMPACT NEEDED (bucket fragmentation over threshold)"
             else ""))
        }
        ()
      }
      .start()
  }

  /** [[streamIndexAppend]]'s sibling for the PQ index — maintenance
    * parity for the memory-tier artifact a billion-vector service
    * ships: the first micro-batch bootstraps (train per-subspace
    * codebooks + persist codes/codebooks/stats via
    * [[graft.operators.Clustering.pqWriteIndex]]), every later batch
    * frozen-encodes against the stored codebooks and appends m codes
    * per vector ([[graft.operators.Clustering.pqAppend]] — the
    * codebooks table never touched), and the batch's reconstruction-
    * error drift vs the BUILD-TIME stats artifact decides retraining
    * via [[graft.operators.Clustering.pqRetrainNeeded]] (logged and
    * scheduled, never absorbed — the same contract as the two-level
    * loop). Restart-safe the same way: checkpoint replay + the
    * bootstrap branch keyed on the codes table's `_SUCCESS`. */
  def streamPqIndexAppend(vecs: DataFrame, root: String, checkpoint: String,
                          m: Int = 4, k: Int = 8, dim: Int = 64,
                          idCol: String = "vec_id", vecCol: String = "embedding",
                          trigger: org.apache.spark.sql.streaming.Trigger =
                            org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val seqCache = new java.util.concurrent.atomic.AtomicLong(-1L)
    vecs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val C = graft.operators.Clustering
        val digest = vecBatchDigest(batch, idCol, vecCol)
        // bootstrap keys on the LAST artifact pqWriteIndex lands
        // (stats): a crash mid-bootstrap leaves codes without
        // stats/codebooks, and keying on the first artifact would send
        // every replay down an append path that can't read the missing
        // baseline — wedged forever; keying on the last re-runs the
        // bootstrap, whose Overwrite writes make it idempotent
        if (!graft.sources.Lake.pathExists(spark, s"$root/stats/_SUCCESS")) {
          val (codes, cbs) = C.pqTrainEncode(batch, m, k, iters = 2, dim,
            idCol, vecCol)
          C.pqWriteIndex(codes, cbs, root)
          appendIndexSignal(spark, root, "bootstrap", 0L, digest,
            driftRatio = None, retrain = false, compact = false, seqCache)
          markBatchApplied(spark, root, digest)
          println(s"[pq-append] batch=$batchId bootstrap: trained ${m}x$k codebooks")
        } else if (batchApplied(spark, root, digest)) {
          // a replayed append would land every code row twice and
          // DOUBLE those vectors' ADC partial sums — the digest marker
          // makes re-delivery a skip
          println(s"[pq-append] batch=$batchId already applied ($digest) — skipped")
        } else {
          val encoded = C.pqAppend(spark, root, batch, m, k, dim, idCol, vecCol)
          val drift = C.pqDriftFromStats(C.pqReadStats(spark, root), encoded)
          val pooled = C.pooledDriftMeans(drift)
          val retrain = C.retrainNeededFromPooled(pooled)
          val compact = C.pqCompactionNeeded(spark, root)
          appendIndexSignal(spark, root, "append", 0L, digest,
            pooled.map { case (nm, bm) => nm / bm }, retrain, compact, seqCache)
          markBatchApplied(spark, root, digest)
          println(s"[pq-append] batch=$batchId appended" +
            (if (retrain) " — RETRAIN NEEDED (drift over tolerance)" else "") +
            (if (compact) " — COMPACT NEEDED (codes fragmentation over threshold)"
             else ""))
        }
        ()
      }
      .start()
  }

  /** Streaming flavor of `windowedCounts`: file stream + watermark,
    * append mode. Driven synchronously in tests via a memory sink. */
  def streamingWindowedCounts(spark: SparkSession, path: String, schema: StructType,
                              width: String = "10 minutes",
                              watermark: String = "10 minutes"): DataFrame =
    spark.readStream.schema(schema).parquet(path)
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").cast("long").as("window_start"),
        col("event_type"), col("n_events"))
}
