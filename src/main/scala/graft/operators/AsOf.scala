package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark lacks as built-ins ([EXT] — build brief's
  * canonical custom-operator examples). Both are COMPOSED from
  * existing operators (the preference ladder's first rung): no custom
  * physical operator is needed because the composition already has
  * the right distributed shape.
  */
object AsOf {

  /** As-of join: every left row picks the payload columns of the
    * LATEST right row with `r.ts <= l.ts` for the same key (left rows
    * before any right row get null payloads — a LEFT as-of join).
    *
    * Shape: tag and union both sides, then ONE window pass per key
    * ordered by (ts, side) with `last(ignoreNulls)` over a SINGLE
    * struct of all payloads — a single shuffle+sort, the same cost as
    * any keyed window. The struct matters twice: a right row whose
    * payload VALUE is null still wins (the struct wrapper is
    * non-null, so real as-of semantics hold — per-column last() would
    * carry an older non-null value forward), and all payload columns
    * come from the SAME matched row (per-column last() could stitch
    * values from different rows). The naive spelling (theta-join on
    * `r.ts <= l.ts` + max) is a range cross-join that explodes
    * quadratically per key.
    *
    * Preconditions: right rows unique per (key, ts) — dedupe first
    * ([[Dedup]]), otherwise "the" latest row at a timestamp is
    * ambiguous in ANY engine — and payload names must not collide
    * with left's columns (rename, as any equi-join would need).
    * Ties `r.ts == l.ts` are INCLUSIVE (right sorts before left). */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               payloads: Seq[String]): DataFrame = {
    require(payloads.nonEmpty, "asofJoin needs at least one payload column")
    val clash = payloads.toSet.intersect(left.columns.toSet)
    require(clash.isEmpty,
      s"payload columns collide with left columns: $clash — rename one side")
    // the union/window internals claim these names; a left table (or
    // payload) already using one would fail with an ambiguous-column
    // AnalysisException far from the real cause — reject it here
    val reserved = Set("__side", "__p", "__m")
    val reservedClash = (left.columns.toSet ++ payloads).intersect(reserved)
    require(reservedClash.isEmpty,
      s"columns collide with asofJoin's reserved internal names: $reservedClash — rename them")
    val carried = left.columns.toSeq.filterNot(c => c == key || c == ts)
    val payloadStruct = struct(payloads.map(col): _*)
    val l = left.select(
      Seq(col(key), col(ts), lit(1).as("__side")) ++
        carried.map(col) :+
        lit(null).cast(right.select(payloadStruct).schema.head.dataType).as("__p"): _*)
    val r = right.select(
      Seq(col(key), col(ts), lit(0).as("__side")) ++
        carried.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        payloadStruct.as("__p"): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(
        Seq(col(key), col(ts)) ++
          carried.map(col) ++
          payloads.map(c => col(s"__m.`$c`").as(c)): _*)
  }

  /** Interval (range) join: left rows matched to right intervals
    * containing them (`r.start <= l.ts < r.end`), same key.
    *
    * Shape: both sides are tagged with coarse time buckets of
    * `bucketWidth` (right intervals explode to every bucket they
    * overlap — intervals are assumed ≲ a few buckets wide), the join
    * is a plain EQUI-join on (key, bucket) + exact range filter. An
    * interval spanning several buckets meets a given left row in
    * exactly ONE of them (the row's own bucket), so no dedup is
    * needed. A theta-join on the raw inequality is a per-key cross
    * product; this is the standard bucketization that keeps it a
    * shuffle join. `bucketWidth` is in the same units as the
    * timestamps (pick ~ the typical interval length).
    *
    * Degenerate intervals (`end <= start`) match nothing and are
    * dropped BEFORE the bucket explode — without that filter Spark's
    * `sequence(hi, lo)` would generate a DESCENDING bucket array and
    * inflate the join with spurious rows (or overflow the sequence
    * limit on an extreme corrupt row). */
  def rangeJoin(left: DataFrame, right: DataFrame, key: String,
                ts: String, start: String, end: String,
                bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    // integral `div`, not `/`: true division goes through DOUBLE and
    // can floor the wrong way for timestamps that are exact bucket
    // multiples beyond 2^53-ish magnitudes
    val l = left.withColumn("__bucket", expr(s"`$ts` div $bucketWidth"))
    val r = right
      .where(col(end) > col(start))
      .withColumn("__bucket",
        explode(expr(s"sequence(`$start` div $bucketWidth, (`$end` - 1) div $bucketWidth)")))
    l.join(r, Seq(key, "__bucket"))
      .where(col(ts) >= col(start) && col(ts) < col(end))
      .drop("__bucket")
  }

  /** Interval-OVERLAP join ([EXT]): pairs of intervals that intersect
    * — `l.start < r.end AND r.start < l.end` on half-open
    * `[start, end)` intervals — optionally also matched on equi-keys.
    * The missing third member of the temporal-join family: [[asofJoin]]
    * matches points to latest-state, [[rangeJoin]] points to
    * containing intervals, this one intervals to intervals
    * (concurrent sessions, overlapping validity windows, meeting
    * collisions).
    *
    * Shape: both sides explode their intervals to the fixed-width
    * time buckets they touch; the join is a plain equi-join on
    * (keys..., bucket) + the exact overlap predicate. A pair
    * overlapping in several shared buckets would duplicate, so keep
    * each pair only in the bucket of `greatest(l.start, r.start)` —
    * the overlap's first instant, which BOTH intervals contain by
    * construction. That turns dedup into a scalar filter: no DISTINCT
    * shuffle over the (potentially huge) pair set. The naive theta
    * join is a per-key (or global) cross product; here shuffle volume
    * is rows × buckets-touched, and the per-bucket cross term is
    * bounded by interval density per bucket — pick `bucketWidth` ≈
    * the typical interval length (wider: more pairs per bucket;
    * narrower: more replicas per interval).
    *
    * Both sides' columns are carried through — rename collisions
    * before calling, as any self-join needs. Degenerate intervals
    * (`end <= start`, i.e. empty half-open ranges) match nothing and
    * are dropped before the explode. */
  def intervalJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                   lStart: String, lEnd: String, rStart: String, rEnd: String,
                   bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    def explodeBuckets(df: DataFrame, start: String, end: String): DataFrame =
      df.where(col(end) > col(start))
        .withColumn("__bucket",
          explode(expr(s"sequence(`$start` div $bucketWidth, (`$end` - 1) div $bucketWidth)")))
    val l = explodeBuckets(left, lStart, lEnd)
    val r = explodeBuckets(right, rStart, rEnd)
    l.join(r, keys :+ "__bucket")
      .where(col(lStart) < col(rEnd) && col(rStart) < col(lEnd))
      .where(col("__bucket") ===
        expr(s"greatest(`$lStart`, `$rStart`) div $bucketWidth"))
      .drop("__bucket")
  }
}
