package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Per-shard mergeable distinct-count sketches (Datasketches HLL,
    * [EXT] beyond A6): one binary sketch per (shard, column). This is
    * the 100 TB profiling shape `approx_count_distinct` can't give
    * you: `approx_count_distinct` returns only the NUMBER, so every
    * new day of data forces a rescan of the whole corpus, while a
    * persisted sketch TABLE is incremental — profile each new shard
    * as it lands, union sketches at read time, never touch old data
    * again. Sketches also union across tables/clusters (the
    * cross-datacenter dedup-accounting trick). lgK=12 → ~1.6% rsd at
    * 4 KiB per sketch. */
  def sketchShards(df: DataFrame, shardCol: String, cols: Seq[String],
                   lgK: Int = 12): DataFrame = {
    // hll_sketch_agg accepts int/bigint/string/binary only; other
    // types go through an injective string render (distinct count is
    // unchanged — e.g. timestamps sketch their distinct instants)
    val schema = df.schema
    def sketchable(c: String): Column = schema(c).dataType match {
      case org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.StringType | org.apache.spark.sql.types.BinaryType =>
        col(c)
      case _ => col(c).cast("string")
    }
    df.groupBy(col(shardCol)).agg(
      hll_sketch_agg(sketchable(cols.head), lit(lgK)).as(s"${cols.head}_sketch"),
      cols.tail.map(c => hll_sketch_agg(sketchable(c), lit(lgK)).as(s"${c}_sketch")): _*)
  }

  /** Merge a shard-sketch table into corpus-wide distinct estimates —
    * reads ONLY the sketch table (bytes per shard, not the fact). */
  def mergeShardSketches(sketches: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.map(c =>
      hll_sketch_estimate(hll_union_agg(col(s"${c}_sketch"), lit(true)))
        .as(s"__d_$c"))
    sketches.agg(aggs.head, aggs.tail: _*)
  }

  // ---- engine-portable HLL (fp60 registers) ----------------------------
  //
  // The portable-build twin of the Spark-native HLL paths, following
  // the KMV/CMS/DDSketch playbook: the sketch is an INTEGER REGISTER
  // TABLE over the shared fp60 fingerprint (p=12 → m=4096 registers,
  // register = top 12 hash bits, rho = leading-zero run of the low 48
  // bits + 1, kept as max per register), so every stage — hashing,
  // register assignment, max-merge, and the estimator itself — replays
  // bit-exactly in an independent engine. The estimator is made
  // integer-exact by rationalizing Flajolet's alpha_m: est =
  // 7213000·m³·2^49 div (10000·(1000m+1079)·S) where S is the
  // 2^49-scaled harmonic sum (every term a power of two, so S is an
  // exact integer — no float summation order to diverge), with the
  // standard linear-counting fallback m·ln(m/V) (rounded to integer)
  // when the raw estimate is ≤ 2.5m and empty registers remain. The
  // only transcendental is that ln — measured zero half-boundary flips
  // on the gate domains; everything else is integer arithmetic.
  // Deviation from float HLL is < 1 ulp relative — irrelevant for a
  // ±1.6%-rsd estimator, and the price of bit-exact cross-engine
  // reproducibility (the same trade the portable CMS made).
  //
  // Caveat shared with every fp60 consumer: values fingerprint via
  // their STRING render, which for DOUBLE columns is engine-identical
  // only in the plain-decimal range (|x| < 1e7 — Spark switches to
  // scientific notation above it, DuckDB much later); for wider float
  // domains pass an explicit injective render.

  private val HllP = 12
  private val HllM = 1 << HllP // 4096 registers
  private val HllRestBits = 60 - HllP // low bits feeding rho
  private val HllRhoMax = HllRestBits + 1 // rho of an all-zero rest
  // 7213000 * m^3 * 2^49, exact (33 digits)
  private val HllRawNum = "279039421980170247588980719616000"
  private val HllRawDen = 10000L * (1000L * HllM + 1079L) // 40970790000

  /** (prefix..., s) → (prefix..., idx, rho): fp60 the string render,
    * split into register index (top p bits) and rho (leading-zero run
    * of the low 60−p bits, +1), all integer ops both engines share. */
  private def hllIdxRho(long: DataFrame, prefix: Seq[String]): DataFrame = {
    val pow2 = 1L << HllRestBits
    val pre = prefix.map(col)
    long.where(col("s").isNotNull)
      .select(pre :+ graft.functions.Portable.fp60(col("s")).as("h"): _*)
      .select(pre ++ Seq(expr(s"h div $pow2").as("idx"),
        (col("h") % pow2).as("rest")): _*)
      .select(pre ++ Seq(col("idx"),
        when(col("rest") === 0, lit(HllRhoMax))
          .otherwise(lit(HllRhoMax) - length(bin(col("rest")))).as("rho")): _*)
  }

  /** (c, nz, sp, null-safe) → + V, S, raw, est: the integer-exact
    * estimator described above. Input rows carry nz = occupied
    * registers and sp = Σ 2^(49−rho) over them. */
  private def hllFinish(perCol: DataFrame): DataFrame = {
    val m = HllM.toLong
    perCol
      .withColumn("V", lit(m) - col("nz"))
      .withColumn("S", col("sp") + col("V") * lit(1L << HllRhoMax))
      .withColumn("raw", expr(
        s"CAST('$HllRawNum' AS DECIMAL(38,0)) div " +
          s"(CAST($HllRawDen AS DECIMAL(12,0)) * CAST(S AS DECIMAL(20,0)))"))
      .withColumn("est",
        when(col("raw") * 2 <= lit(5 * m) && col("V") > 0,
          floor(lit(m.toDouble) * log(lit(m.toDouble) / col("V").cast("double"))
            + lit(0.5)).cast("long"))
          .otherwise(col("raw")))
  }

  /** Portable-build approximate data dictionary ([EXT], the certified
    * twin of [[approxDataDictionary]]): per-column null count +
    * HLL distinct estimate in ONE exploded scan and one (column,
    * register) shuffle of ≤ cols·4096 groups — the same 100 TB shape
    * as the native path (no Expand-based multi-distinct), with every
    * stage oracle-replayable. */
  def portableHllDictionary(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val cs = if (cols.nonEmpty) cols else df.columns.toSeq
    val entries = cs.map(c => struct(lit(c).as("c"), col(c).cast("string").as("s")))
    val long = df.select(explode(array(entries: _*)).as("e"))
      .select(col("e.c").as("c"), col("e.s").as("s"))
    // nulls ride the SAME (column, register) shuffle as a sentinel
    // idx = −1 register, so the whole dictionary is ONE scan + one
    // bounded shuffle (≤ cols·(4096+1) groups) — at 100 TB a second
    // null-counting pass over the fact would double the query's IO
    val pow2 = 1L << HllRestBits
    val staged = long
      .select(col("c"), graft.functions.Portable.fp60(col("s")).as("h"))
      .select(col("c"),
        when(col("h").isNull, lit(-1L)).otherwise(expr(s"h div $pow2")).as("idx"),
        (col("h") % pow2).as("rest")) // null for null h
      .select(col("c"), col("idx"),
        when(col("rest").isNull, lit(0))
          .when(col("rest") === 0, lit(HllRhoMax))
          .otherwise(lit(HllRhoMax) - length(bin(col("rest")))).as("rho"))
    val perCol = staged.groupBy(col("c"), col("idx"))
      .agg(max(col("rho")).as("mr"), count(lit(1)).as("cnt"))
      .groupBy(col("c")).agg(
        coalesce(sum(when(col("idx") === -1, col("cnt"))), lit(0L))
          .cast("long").as("null_count"),
        count(when(col("idx") =!= -1, 1)).as("nz"),
        coalesce(sum(when(col("idx") =!= -1,
          expr(s"shiftleft(CAST(1 AS BIGINT), $HllRhoMax - mr)"))), lit(0L))
          .as("sp"))
    hllFinish(perCol)
      .select(col("c").as("column_name"), col("null_count"),
        col("est").as("approx_distinct_count"))
      .orderBy(col("column_name"))
  }

  /** Portable per-shard HLL register sketches ([EXT], the certified
    * twin of [[sketchShards]]): one (shard, column, register, rho) row
    * per occupied register — plain parquet-writable integers, no
    * binary blob (the sketch IS its register table, like the portable
    * CMS/DDSketch shards), merged downstream by max per register. */
  def portableHllShards(df: DataFrame, shardCol: String,
                        cols: Seq[String]): DataFrame = {
    val entries = cols.map(c => struct(lit(c).as("c"), col(c).cast("string").as("s")))
    val long = df.select(col(shardCol).cast("string").as("shard"),
        explode(array(entries: _*)).as("e"))
      .select(col("shard"), col("e.c").as("c"), col("e.s").as("s"))
    hllIdxRho(long, Seq("shard", "c"))
      .groupBy(col("shard"), col("c"), col("idx")).agg(max(col("rho")).as("mr"))
  }

  /** Portable-build incremental dictionary ([EXT], the certified twin
    * of [[sketchDictionary]]): shard register sketches → max-merge →
    * integer-exact estimate per column. Max is commutative/idempotent,
    * so next month's shards merge with today's without rescanning —
    * and unlike the native path the whole lifecycle hash-certifies. */
  def portableSketchDictionary(df: DataFrame, shardCol: String,
                               cols: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val perCol = portableHllShards(df, shardCol, cols)
      .groupBy(col("c"), col("idx")).agg(max(col("mr")).as("mr"))
      .groupBy(col("c")).agg(
        count(lit(1)).as("nz"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $HllRhoMax - mr)")).as("sp"))
    val spine = cols.toDF("c")
    hllFinish(spine.join(perCol, Seq("c"), "left").na.fill(0L, Seq("nz", "sp")))
      .select(col("c").as("column_name"), col("est").as("distinct_est"))
      .orderBy(col("column_name"))
  }

  /** Mergeable quantile sketches per group ([EXT]) — DDSketch
    * ([[graft.expressions.DDSketchAggregator]]) completes the
    * mergeable-sketch family: distinct (HLL shards), frequency (CMS /
    * Misra-Gries), membership (bloom), similarity (minhash) and now
    * QUANTILES, each a bounded summary whose merge is commutative —
    * the property that lets a 100 TB pipeline keep per-shard sketches
    * and answer "p99 latency last quarter" from kilobytes instead of
    * re-ranking the data. Where [[exactKthLong]] buys exactness with
    * ≤6 extra scans and `percentile` buffers whole groups, this is
    * the one-pass streaming answer with a RELATIVE-error guarantee
    * (±alpha·value, the right currency for long-tailed measures).
    *
    * The output prices itself: each estimate is emitted next to the
    * exact interpolated percentile (the certified quantile_cont
    * bridge) and the realized relative error — the spec asserts the
    * alpha bound, the query makes it visible. Estimates are
    * engine-private (rows-only harness check, like every sketch). */
  def ddQuantiles(df: DataFrame, key: String, measure: String,
                  qs: Seq[Double] = Seq(0.5, 0.9, 0.99),
                  alpha: Double = 0.01): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val vals = df.select(col(key).cast("string").as("k"),
        col(measure).cast("double").as("v"))
      .where(col("v").isNotNull)
    val agg = new graft.expressions.DDSketchAggregator[(String, Double)](
      t => Double.box(t._2), alpha).toColumn
    val est = vals.as[(String, Double)].groupByKey(_._1).agg(agg)
      .flatMap { case (k, buf) =>
        qs.map(q => (k, q, buf.n, graft.expressions.DDSketch.quantile(buf, q, alpha)))
      }.toDF("key", "q", "n", "dd_est")
    // one aggregate pass for every anchor percentile (array form) —
    // same single-scan discipline as ddQuantileWalk
    val exact = vals.groupBy(col("k").as("key"))
      .agg(percentile(col("v"), array(qs.map(lit): _*)).as("__ex"))
      .select(col("key"), posexplode(col("__ex")).as(Seq("__i", "exact")))
      .select(col("key"),
        element_at(array(qs.map(lit): _*), col("__i") + 1).as("q"), col("exact"))
    est.join(exact, Seq("key", "q"))
      .withColumn("rel_err",
        when(col("exact") =!= 0.0,
          abs(col("dd_est") - col("exact")) / abs(col("exact"))))
      .orderBy(col("key"), col("q"))
  }

  /** DDSketch bucket histogram over an EXACT integer measure ([EXT])
    * — the cross-engine certification the estimate queries can't
    * give: quantile ESTIMATES are engine-private (no independent
    * engine has a DDSketch), but the bucket INDEX
    * ceil(ln(x)/ln(gamma)) is plain IEEE arithmetic an oracle can
    * replay — so this query hash-certifies the sketch's entire
    * data-touching stage (value → bucket → count), leaving only the
    * walk over ≤2·maxBuckets counters law-tested.
    *
    * ULP honesty: JVM `Math.log` and C libm `log` are each ≤1 ulp
    * from the true value but not guaranteed bit-identical, so a
    * value within ~1e-13 of a bucket boundary COULD flip an index
    * cross-engine. On integer inputs the quotient lands that close
    * to an integer only for ln(x) ≈ k·ln(gamma) — measured zero
    * flips across the full sf0.1 integer-cents domain (PLANS.md);
    * x = 1 (ln = 0, exactly bucket 0 in both engines) is the one
    * exact boundary and is consistent by IEEE zero-division rules.
    * The sketch is built by the REAL aggregator (same reduce/merge
    * path as [[ddQuantiles]]), not a parallel SQL spelling. */
  def ddBucketCounts(df: DataFrame, measure: String,
                     alpha: Double = 0.01,
                     maxBuckets: Int = Int.MaxValue - 1): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // This query exists to replay RAW bucket indices against the oracle,
    // so the default cap is effectively "never collapse" — unlike the
    // quantile path, a silent low-bucket merge here would break the
    // value->bucket->count certification the scaladoc promises. Callers
    // who want a bounded histogram pass an explicit maxBuckets.
    val agg = new graft.expressions.DDSketchAggregator[Double](
      Double.box, alpha, maxBuckets)
    val buf = df.select(col(measure).cast("double").as("v"))
      .where(col("v").isNotNull)
      .as[Double]
      .select(agg.toColumn).head()
    val rows =
      buf.neg.toSeq.map { case (b, c) => (-1L, b.toLong, c) } ++
        (if (buf.zero > 0) Seq((0L, 0L, buf.zero)) else Nil) ++
        buf.pos.toSeq.map { case (b, c) => (1L, b.toLong, c) }
    rows.toDF("sign", "bucket", "cnt").orderBy(col("sign"), col("bucket"))
  }

  /** Certified DDSketch quantile walk ([EXT]) — the quantile query in
    * its hash-certifiable form, completing the [[ddBucketCounts]]
    * certification one stage further. [[ddQuantiles]] prices the float
    * ESTIMATE against the exact percentile but stays rows-only because
    * the representative 2·gamma^i/(gamma+1) is a `pow` whose last ulp
    * is libm-private. Everything BEFORE that float render is integer
    * arithmetic an oracle can replay: value → bucket (the certified
    * ceil(ln x/ln gamma) stage), per-key bucket counts, the 0-based
    * rank floor(q·(n−1)), and the value-ordered cumulative walk to the
    * owning (sign, bucket) cell. This query emits exactly that
    * certificate — key, q, n, rank, owning sign+bucket — next to the
    * exact interpolated percentile (the certified quantile_cont
    * bridge), so the sketch's entire data-touching AND rank-walking
    * machinery is cross-engine hash-certified; only the 3-flop
    * representative render stays law-tested (alpha bound in
    * ProfileSpec via [[ddQuantiles]]). Built through the REAL
    * aggregator (same reduce/merge path), not a parallel SQL spelling.
    *
    * Like [[ddBucketCounts]], the default cap is effectively "never
    * collapse": this query exists to replay raw indices, and the
    * walk must see the same buckets the oracle rebuilds. Callers
    * wanting the bounded view pass an explicit maxBuckets (the
    * collapse is deterministic, so the walk stays exact — the oracle
    * would then need the same fold). */
  def ddQuantileWalk(df: DataFrame, key: String, measure: String,
                     qs: Seq[Double] = Seq(0.5, 0.9, 0.99),
                     alpha: Double = 0.01,
                     maxBuckets: Int = Int.MaxValue - 1): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val vals = df.select(col(key).cast("string").as("k"),
        col(measure).cast("double").as("v"))
      .where(col("v").isNotNull)
    val agg = new graft.expressions.DDSketchAggregator[(String, Double)](
      t => Double.box(t._2), alpha, maxBuckets).toColumn
    val walks = vals.as[(String, Double)].groupByKey(_._1).agg(agg)
      .flatMap { case (k, buf) =>
        qs.map { q =>
          val (sign, bucket) = graft.expressions.DDSketch.quantileBucket(buf, q)
          (k, q, buf.n, (q * (buf.n - 1)).toLong, sign.toLong, bucket.toLong)
        }
      }.toDF("key", "q", "n", "rk", "est_sign", "est_bucket")
    // ALL the anchor percentiles in one aggregate pass (percentile
    // takes an array) — a groupBy per q would re-scan the fact |qs|
    // times at 100 TB for identical per-key buffers
    val exact = vals.groupBy(col("k").as("key"))
      .agg(percentile(col("v"), array(qs.map(lit): _*)).as("__ex"))
      .select(col("key"), posexplode(col("__ex")).as(Seq("__i", "exact")))
      .select(col("key"),
        element_at(array(qs.map(lit): _*), col("__i") + 1).as("q"), col("exact"))
    walks.join(exact, Seq("key", "q"))
      .orderBy(col("key"), col("q"))
  }

  /** Persisted-shard twin of [[ddQuantiles]], completing the same
    * lifecycle the HLL/CMS shards have: one DDSketch row per shard
    * (plain parquet-writable maps — no binary blob, the sketch IS its
    * bucket table), so a growing corpus profiles each new shard as it
    * lands and answers "p99 across everything" from the sketch table
    * alone, never rescanning old data. */
  def ddSketchShards(df: DataFrame, shardCol: String, measure: String,
                     alpha: Double = 0.01): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val agg = new graft.expressions.DDSketchAggregator[(String, Double)](
      t => Double.box(t._2), alpha).toColumn
    df.select(col(shardCol).cast("string").as("k"),
        col(measure).cast("double").as("v"))
      .where(col("v").isNotNull)
      .as[(String, Double)].groupByKey(_._1).agg(agg)
      .map { case (k, buf) => (k, buf.neg, buf.zero, buf.pos) }
      .toDF("shard", "neg", "zero", "pos")
  }

  /** Merge a DDSketch shard table into global quantile estimates —
    * reads ONLY the sketch rows (bounded: one bucket map per shard);
    * commutative merges make the result identical to sketching the
    * whole data in one pass, exactly (ProfileSpec law). */
  def ddMergeShards(sketches: DataFrame, qs: Seq[Double] = Seq(0.5, 0.9, 0.99),
                    alpha: Double = 0.01): DataFrame = {
    import graft.expressions.{DDBuf, DDSketch}
    val agg = new graft.expressions.DDSketchAggregator[Double](Double.box, alpha)
    val bufs = sketches.select(col("neg"), col("zero"), col("pos")).collect()
      .map(r => DDBuf(r.getAs[Map[Int, Long]]("neg"), r.getLong(1),
        r.getAs[Map[Int, Long]]("pos")))
    require(bufs.nonEmpty, "ddMergeShards needs at least one shard sketch")
    // finish applies the maxBuckets view AFTER the order-invariant merge
    val merged = agg.finish(bufs.reduce(agg.merge))
    val spark = sketches.sparkSession
    import spark.implicits._
    qs.map(q => (q, merged.n, DDSketch.quantile(merged, q, alpha)))
      .toDF("q", "n", "dd_est").orderBy(col("q"))
  }

  /** Count-min-sketch shards ([EXT]) — the frequency counterpart of
    * [[sketchShards]]: per-shard CMS over a column (Spark's own
    * `count_min_sketch` aggregate, serialized binary), persisted the
    * same way. A point-frequency query then reads ONLY the sketch
    * table: heavy-hitter monitoring over a growing corpus without
    * rescanning old shards. Overestimates only (by ≤ eps·N with
    * `confidence`), never under — the safe direction for "is this
    * token/domain/URL suddenly flooding the crawl" alarms. */
  def cmsShards(df: DataFrame, shardCol: String, c: String,
                eps: Double = 0.01, confidence: Double = 0.99,
                seed: Int = 42): DataFrame =
    df.groupBy(col(shardCol)).agg(
      call_function("count_min_sketch", col(c), lit(eps), lit(confidence),
        lit(seed)).as("cms"),
      count(col(c)).as("n_rows"))

  /** Probe a CMS shard table for the estimated counts of `probes`.
    * Shard sketches merge on the driver — a BOUNDED action (one
    * ~`2/eps · ln(1/(1-conf))`-cell sketch per shard, KBs each; the
    * same "collect sketch bytes, not data" discipline as the bloom
    * and HLL paths). Probes hash through the sketch's binary path
    * (UTF-8 bytes), matching how the SQL aggregate fed strings in.
    * Deterministic for a fixed seed, but the hash family is
    * Spark-specific — rows-only oracle, like [[sketchDictionary]];
    * the accuracy laws (never-under, eps-bounded over, shard-merge ==
    * global) are ProfileSpec's job. */
  def cmsEstimates(shards: DataFrame, probes: Seq[String]): DataFrame = {
    import org.apache.spark.util.sketch.CountMinSketch
    val sketches = shards.select(col("cms")).collect()
      .map(r => CountMinSketch.readFrom(r.getAs[Array[Byte]](0)))
    require(sketches.nonEmpty, "cmsEstimates needs at least one shard sketch")
    val merged = sketches.reduce { (a, b) => a.mergeInPlace(b); a }
    val spark = shards.sparkSession
    import spark.implicits._
    probes.map(p =>
      (p, merged.estimateCount(p.getBytes(java.nio.charset.StandardCharsets.UTF_8))))
      .toDF("term", "cms_est").orderBy(col("term"))
  }

  /** Engine-PORTABLE count-min sketch shards ([EXT]) — the certified
    * twin of [[cmsShards]], built on the repo's fp60 md5 hash family
    * instead of Spark's private CountMinSketch hashes, following the
    * q_dd_buckets playbook: every cell index is
    * `fp60(row || ':' || value) % width` — arithmetic any engine can
    * replay bit-exactly, so the whole sketch (and every estimate read
    * from it) is DuckDB-oracle-certifiable, not just law-tested.
    *
    * The sketch IS its (shard, row, cell, cnt) table — parquet-native
    * (no binary blob), merged across shards by plain summation, at
    * most `depth × width` rows per shard regardless of corpus size.
    * Standard CMS guarantees hold per hash row: estimates only ever
    * OVERcount (by ≈ 2N/width w.h.p. with `depth` independent rows) —
    * the safe direction for flood alarms, same as [[cmsShards]].
    *
    * Scale shape: the depth-way fan-out happens map-side and collapses
    * into a partially-aggregated groupBy whose shuffle carries at most
    * shards × depth × width rows — flat in corpus size. */
  def cmsPortableShards(df: DataFrame, shardCol: String, c: String,
                        depth: Int = 4, width: Int = 256): DataFrame = {
    require(depth >= 1, s"depth must be >= 1: $depth")
    require(width >= 2, s"width must be >= 2: $width")
    df.select(col(shardCol).as("shard"), col(c).cast("string").as("__v"))
      .where(col("__v").isNotNull)
      .select(col("shard"),
        explode(sequence(lit(0), lit(depth - 1))).as("row"), col("__v"))
      .groupBy(col("shard"), col("row"),
        (graft.functions.Portable.fp60(
          concat(col("row").cast("string"), lit(":"), col("__v"))) % width)
          .as("cell"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-frequency estimates from a [[cmsPortableShards]] table:
    * shards merge by summation (a bounded aggregate over ≤ depth×width
    * rows per shard — never a driver collect), each probe hashes
    * through the identical fp60 path, and the estimate is the
    * classic min over the depth rows. Fully distributed AND fully
    * oracle-replayable — this closes the gap that kept the CMS family
    * rows-only. */
  def cmsPortableEstimates(shards: DataFrame, probes: Seq[String],
                           depth: Int = 4, width: Int = 256): DataFrame = {
    require(probes.nonEmpty, "cmsPortableEstimates needs at least one probe")
    val spark = shards.sparkSession
    import spark.implicits._
    val cells = shards.groupBy(col("row"), col("cell"))
      .agg(sum(col("cnt")).as("cnt"))
    val probeCells = probes.toDF("term")
      .select(col("term"), explode(sequence(lit(0), lit(depth - 1))).as("row"))
      .select(col("term"), col("row"),
        (graft.functions.Portable.fp60(
          concat(col("row").cast("string"), lit(":"), col("term"))) % width)
          .as("cell"))
    // the probe side is a literal relation (|probes| × depth rows) —
    // broadcast it so the merged-cell side keeps its partitioning
    cells.join(broadcast(probeCells), Seq("row", "cell"), "right")
      .groupBy(col("term"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
      .orderBy(col("term"))
  }

  /** EXACT distributed AUC (Mann-Whitney) ([EXT]) — the
    * ranking-quality metric for any scalar scorer (quality scores,
    * classifier margins, retrieval scores): the probability a random
    * positive outranks a random negative, ties counted half. Exact,
    * at any scale, via the rank-sum identity — never a per-pair
    * comparison and never a single-task global rank window:
    * the fact collapses to the DISTINCT-SCORE table first (one
    * aggregate), the exclusive rank prefix runs on the
    * [[Pack.rangeSortedWithOffsets]] skeleton (range partition +
    * driver offset fold — distributed, unlike `rank() OVER (ORDER BY
    * score)` which serializes the corpus into one task), and ties
    * stay EXACT with the doubled-rank trick (2·cum + c + 1 is
    * integral where the average rank is x.5): every moment is an
    * exact integer/decimal sum and AUC is ONE rounded IEEE chain.
    * Degenerate inputs (no positives or no negatives) yield null. */
  def aucExact(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val s = df.select(col(scoreCol).cast("double").as("s"),
        col(labelCol).cast("long").as("y"))
      .where(col("s").isNotNull && col("y").isNotNull)
    val perScore = s.groupBy(col("s")).agg(
      count(lit(1)).as("c"), sum(col("y")).as("p"))
    val (sorted, offsets) = Pack.rangeSortedWithOffsets(perScore, Seq("s"), col("c"))
    val outSchema = org.apache.spark.sql.types.StructType(
      sorted.schema :+ org.apache.spark.sql.types.StructField(
        "cum", org.apache.spark.sql.types.LongType, nullable = false))
    val withCum = sorted.mapPartitions { it =>
      var acc = offsets(org.apache.spark.TaskContext.getPartitionId())
      it.map { r =>
        val cum = acc // items strictly below this score
        acc += r.getAs[Long]("c")
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ cum)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
    // doubled rank-sum of positives: Σ p·(2·cum + c + 1); widened to
    // DECIMAL — cum is corpus-sized, the product overflows LONG at
    // ~10^9.5 rows (the linearFit widen-BEFORE-multiplying lesson)
    val dec = DecimalType(38, 0)
    val agg = withCum.agg(
      sum((col("p").cast(dec) * (col("cum").cast(dec) * 2 + col("c") + 1))
        .cast(dec)).as("sdbl"),
      sum(col("p")).as("np"),
      sum(col("c") - col("p")).as("nn"))
    agg.select(
      col("np").cast("long").as("n_pos"),
      col("nn").cast("long").as("n_neg"),
      when(col("np") > 0 && col("nn") > 0,
        round((col("sdbl").cast("double") -
            (col("np").cast(dec) * (col("np") + 1)).cast("double")) /
          (col("np").cast(dec) * col("nn") * 2).cast("double"), 6))
        .as("auc"))
  }

  /** EXACT Gini coefficient ([EXT]) — the inequality of a
    * distribution ("how concentrated is the token budget in few
    * documents", "do a handful of customers carry the revenue"): the
    * rank-weighted identity G = 2·Σrᵢxᵢ/(n·Σx) − (n+1)/n on the same
    * discipline as [[aucExact]] — distinct-value collapse, the
    * distributed prefix skeleton for ranks, and EXACT integer
    * moments: within a tie run the rank-sum is c·cum + c(c+1)/2
    * regardless of order, so ties need no convention; moments are
    * DECIMAL-widened, G is one rounded IEEE chain. Requires
    * non-negative integral values (lengths, cents, counts). */
  def giniExact(df: DataFrame, valueCol: String): DataFrame = {
    val s = df.select(col(valueCol).cast("long").as("v"))
      .where(col("v").isNotNull && col("v") >= 0)
    val perValue = s.groupBy(col("v")).agg(count(lit(1)).as("c"))
    val (sorted, offsets) = Pack.rangeSortedWithOffsets(perValue, Seq("v"), col("c"))
    val outSchema = org.apache.spark.sql.types.StructType(
      sorted.schema :+ org.apache.spark.sql.types.StructField(
        "cum", org.apache.spark.sql.types.LongType, nullable = false))
    val withCum = sorted.mapPartitions { it =>
      var acc = offsets(org.apache.spark.TaskContext.getPartitionId())
      it.map { r =>
        val cum = acc
        acc += r.getAs[Long]("c")
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ cum)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
    val dec = DecimalType(38, 0)
    val agg = withCum.agg(
      sum((col("v").cast(dec) *
        (col("c").cast(dec) * col("cum") + (col("c").cast(dec) * (col("c") + 1)) / 2))
        .cast(dec)).as("srx"),
      sum(col("c")).as("n"),
      sum((col("v").cast(dec) * col("c")).cast(dec)).as("sx"))
    agg.select(
      col("n").cast("long").as("n"),
      col("sx").cast("double").as("total"),
      when(col("n") > 0 && col("sx") > 0,
        round((col("srx").cast(dec) * 2).cast("double") /
            (col("n").cast(dec) * col("sx")).cast("double") -
          (col("n") + 1).cast("double") / col("n").cast("double"), 6))
        .as("gini"))
  }

  /** Lorenz curve ([EXT]) — the decile view behind [[giniExact]]'s
    * one number: rank rows by value ascending, cut into positional
    * n-tiles (the gainsTable discipline: a unique (value, id) total
    * order keeps boundaries engine-exact), and report each tile's
    * exact value share and the cumulative share — "the bottom 80% of
    * documents hold 38% of the tokens". Tile assignment rides
    * [[Pack.positionalTiles]] (prefix-sum skeleton — never the
    * single-task global `ntile` window this operator's input, the
    * full fact, would make fatal); shares divide exact decimal sums
    * on the BOUNDED tile table. */
  def lorenzCurve(df: DataFrame, valueCol: String, idCol: String,
                  buckets: Int = 10): DataFrame = {
    require(buckets >= 2, s"lorenzCurve needs buckets >= 2: $buckets")
    val dec = DecimalType(38, 0)
    val tiled = Pack.positionalTiles(
      df.select(col(idCol).as("__id"), col(valueCol).cast("long").as("__v"))
        .where(col("__v").isNotNull && col("__v") >= 0),
      Seq(col("__v"), col("__id")), buckets, "tile")
    val per = tiled.groupBy(col("tile")).agg(
      count(lit(1)).as("n"), sum(col("__v").cast(dec)).as("__s"))
    val w = Window.orderBy(col("tile"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = per.agg(sum(col("__s")).as("__t"))
    per.withColumn("__cum", sum(col("__s")).over(w))
      .crossJoin(broadcast(tot))
      .select(col("tile"), col("n"),
        col("__s").cast("double").as("tile_total"),
        when(col("__t") > 0,
          round(col("__s").cast("double") / col("__t").cast("double"), 6))
          .as("share"),
        when(col("__t") > 0,
          round(col("__cum").cast("double") / col("__t").cast("double"), 6))
          .as("cum_share"))
      .orderBy(col("tile"))
  }

  /** Concentration indices per categorical column ([EXT]) — the
    * Herfindahl-Hirschman index Σ share² and its reciprocal, the
    * EFFECTIVE category count ("this corpus acts like 4.2 sources,
    * not 20") — the one-number diversification check a training-mix
    * review starts with. One tiny aggregate per column over the value
    * histogram; exact integer moments, one IEEE chain each. */
  def concentration(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "concentration needs at least one column")
    val dec = DecimalType(38, 0)
    cols.map { c =>
      df.select(col(c).as("v")).where(col("v").isNotNull)
        .groupBy(col("v")).agg(count(lit(1)).as("cnt"))
        .agg(count(lit(1)).as("n_categories"),
          sum(col("cnt")).as("__n"),
          sum((col("cnt").cast(dec) * col("cnt")).cast(dec)).as("__s2"))
        .select(lit(c).as("column"),
          col("n_categories").cast("long").as("n_categories"),
          round(col("__s2").cast("double") /
            (col("__n").cast(dec) * col("__n")).cast("double"), 6).as("hhi"),
          round((col("__n").cast(dec) * col("__n")).cast("double") /
            col("__s2").cast("double"), 6).as("effective_n"))
    }.reduce(_ unionByName _).orderBy(col("column"))
  }

  /** EXACT two-sample Kolmogorov-Smirnov distance ([EXT]) — the
    * continuous-measure drift test [[psiDrift]]'s binned shares can't
    * be: D = sup|F_a − F_b| over the two empirical CDFs. Exact at any
    * scale by the same discipline as [[aucExact]]: collapse to the
    * distinct-value table, run BOTH inclusive count prefixes
    * distributed (range partition + driver offset fold — one sort
    * serves both accumulators), and compare ECDFs as the INTEGER
    * cross-products |cum_a·n_b − cum_b·n_a| (a float ECDF difference
    * would make the argmax rounding-dependent); D's one division is
    * the only IEEE step. The sup over the full real line is attained
    * at value step points, so scanning distinct values is exhaustive,
    * not a discretization. */
  def ksDrift(df: DataFrame, groupCol: String, valueCol: String,
              groupA: String, groupB: String): DataFrame = {
    val s = df.select(col(valueCol).cast("double").as("v"), col(groupCol).as("g"))
      .where(col("v").isNotNull && col("g").isin(groupA, groupB))
    val per = s.groupBy(col("v")).agg(
      sum(when(col("g") === groupA, 1L).otherwise(0L)).as("c1"),
      sum(when(col("g") === groupB, 1L).otherwise(0L)).as("c2"))
    val spark = df.sparkSession
    val parts = spark.sparkContext.defaultParallelism
    val sorted = per.repartitionByRange(parts, col("v"))
      .sortWithinPartitions(col("v")).localCheckpoint()
    val totals = sorted.groupBy(spark_partition_id().as("__pid"))
      .agg(sum(col("c1")).as("__w1"), sum(col("c2")).as("__w2"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    val off1 = (0 until parts).scanLeft(0L)((a, p) => a + totals.get(p).map(_._1).getOrElse(0L)).toArray
    val off2 = (0 until parts).scanLeft(0L)((a, p) => a + totals.get(p).map(_._2).getOrElse(0L)).toArray
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("cum1", org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("cum2", org.apache.spark.sql.types.LongType, nullable = false)))
    val cums = sorted.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var a1 = off1(pid); var a2 = off2(pid)
      it.map { r =>
        a1 += r.getAs[Long]("c1"); a2 += r.getAs[Long]("c2") // inclusive: ECDF steps AT the value
        org.apache.spark.sql.Row(a1, a2)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
    val n1 = off1(parts); val n2 = off2(parts)
    val dec = DecimalType(38, 0)
    val d = cums.agg(max(abs(col("cum1").cast(dec) * n2 - col("cum2").cast(dec) * n1)).as("d"))
    d.select(
      lit(n1).as("n_a"), lit(n2).as("n_b"),
      when(lit(n1) > 0 && lit(n2) > 0,
        round(col("d").cast("double") / (lit(n1).cast(dec) * n2).cast("double"), 6))
        .as("ks_d"))
  }

  /** EXACT heavy hitters via the classic two-pass scheme ([EXT]):
    * pass 1 runs the mergeable [[graft.expressions.MisraGriesAggregator]]
    * (capacity k) — its deterministic guarantee is that every item
    * with true frequency > n/(k+1) is in the summary, so the ≤ k
    * surviving keys are a SUPERSET of the true heavy hitters; pass 2
    * recounts ONLY those candidates exactly (the IN-set literal rides
    * the columnar scan as a pushed filter) and keeps items whose
    * exact count clears the n/(k+1) threshold. Output = exactly the
    * true heavy-hitter set with EXACT counts — hash-certifiable
    * against a plain GROUP BY / HAVING oracle, unlike the CMS and HLL
    * paths whose estimates are engine-private.
    *
    * Scale shape: both passes are single scans; the sketch pass
    * shuffles at most k counters per map task, the recount pass
    * shuffles at most k groups. Nothing is ever proportional to the
    * distinct-key count — this is the 100 TB-safe spelling of "top
    * domains/tokens above x% of the corpus", where the naive
    * GROUP BY would shuffle every distinct URL. */
  def heavyHitters(df: DataFrame, c: String, capacity: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val items = df.select(col(c).cast("string").as("item"))
      .where(col("item").isNotNull)
    val agg = new graft.expressions.MisraGriesAggregator(capacity).toColumn
    val summary = items.as[String].select(agg).head()
    val cand = summary.counts.keys.toSeq // bounded: ≤ capacity entries
    val guard = if (cand.isEmpty) lit(false) else col("item").isin(cand: _*)
    items.where(guard)
      .groupBy(col("item"))
      .agg(count(lit(1)).as("n"))
      .where(col("n") * lit(capacity + 1L) > lit(summary.n))
      .orderBy(col("n").desc, col("item"))
  }

  /** EXACT order statistic at scale ([EXT]): the rank-th smallest
    * value (1-based, multiset semantics) of a long-valued column via
    * iterative range narrowing — the classic external selection
    * algorithm. Each pass histograms the surviving value window into
    * `bins` buckets with ONE filtered aggregate (≤ `bins` rows back to
    * the driver), then descends into the bucket containing the rank;
    * the window shrinks ×bins per pass, so even a full 64-bit range
    * resolves in ≤ ⌈64/log₂bins⌉ = 6 scans, each cheaper than the
    * last (the narrowing `v BETWEEN lo AND hi` predicate is pushed
    * into the columnar scan, so parquet row groups outside the
    * window min/max prune away entirely).
    *
    * This is what "exact median of 100 TB" has to look like: a global
    * sort is a full-data shuffle, Spark's exact `percentile` buffers
    * whole groups in memory, and `approx_percentile` gives up
    * exactness. Bounded passes, exact answer, no shuffle at all —
    * the only cluster traffic is `bins` partial counts per pass. */
  def exactKthLong(df: DataFrame, c: String, rank: Long, bins: Int = 4096): DataFrame =
    exactKthImpl(df, c, _ => rank, bins)

  /** Lower median: the ⌈n/2⌉-th smallest value — [[exactKthLong]] at
    * the halfway rank. The rank derives from the count the first
    * narrowing aggregate already computes, so there is NO extra
    * pre-count scan. */
  def exactMedianLong(df: DataFrame, c: String, bins: Int = 4096): DataFrame =
    exactKthImpl(df, c, n => (n + 1) / 2, bins)

  private def exactKthImpl(df: DataFrame, c: String, rankOf: Long => Long,
                           bins: Int): DataFrame = {
    require(bins >= 2, s"bins must be >= 2: $bins")
    val vals = df.select(col(c).cast("long").as("v")).where(col("v").isNotNull)
    val st = vals.agg(min(col("v")), max(col("v")), count(lit(1))).head()
    val n = st.getLong(2)
    require(n > 0, s"exactKthLong: no non-null values in $c")
    val rank = rankOf(n)
    require(rank >= 1 && rank <= n, s"rank $rank out of [1, $n]")
    var lo = st.getLong(0)
    var hi = st.getLong(1)
    // value windows wider than Long.MaxValue can't be binned with
    // long arithmetic — reject loudly rather than overflow silently
    require(Math.subtractExact(hi, lo) >= 0,
      s"value range [$lo, $hi] exceeds Long.MaxValue — rescale the column first")
    var kLeft = rank
    while (lo < hi) {
      val width = (hi - lo) / bins + 1
      val hist = vals
        .where(col("v") >= lo && col("v") <= hi)
        .groupBy(expr(s"(v - ${lo}L) div ${width}L").as("bin"))
        .agg(count(lit(1)).as("cnt"))
        .collect().sortBy(_.getLong(0)) // bounded: ≤ bins rows
      var acc = 0L
      var chosen = -1L
      hist.foreach { r =>
        if (chosen < 0) {
          val cnt = r.getLong(1)
          if (acc + cnt >= kLeft) { chosen = r.getLong(0); kLeft -= acc }
          else acc += cnt
        }
      }
      lo = lo + chosen * width
      // overflow-safe upper bound: `lo + width - 1` can wrap past
      // Long.MaxValue when the chosen bucket abuts the top of the
      // range (silently exiting a pass early with a WRONG answer) —
      // compare in subtracted form instead
      hi = if (lo > hi - (width - 1)) hi else lo + width - 1
    }
    val spark = df.sparkSession
    import spark.implicits._
    Seq((rank, lo, n)).toDF("rank", "value", "n")
  }

  // ---- KMV (k-minimum-values) distinct sketches ([EXT]) ----
  // The ENGINE-PORTABLE member of the sketch family: where the HLL
  // and CMS paths hash with Spark-internal families (rows-only
  // oracles), KMV keeps the k smallest values of the repo's md5
  // 60-bit fingerprint — every engine computes the identical sketch,
  // so estimates are hash-certifiable against DuckDB. KMV also
  // supports what HLL union cannot: set-INTERSECTION estimates
  // between groups (source-overlap audits) via the union sketch +
  // inclusion–exclusion [Beyer et al., "On Synopses for Distinct-
  // Value Estimation Under Multiset Operations", SIGMOD'07].

  /** 60-bit engine-portable value fingerprint (the gramFp spelling:
    * 15 hex digits — 16 could exceed signed-long range in engines
    * parsing signed hex). Injective string render first, so any
    * input type sketches its distinct values. */
  private def fp60(c: Column): Column = graft.functions.Portable.fp60(c)

  /** Per-group KMV sketch as ROWS: the k smallest distinct value
    * fingerprints, ranked. Mergeable exactly like [[dfShard]]'s df
    * table: union shards, re-rank, keep k ([[kmvMerge]]) — the sketch
    * of a union is computable from sketches alone, so per-batch
    * sketches maintain corpus-wide distinct estimates with no rescan.
    *
    * Shape: one (group, fp) distinct aggregate (map-side partial
    * dedup — the shuffle carries distinct pairs, not rows), then the
    * per-group rank window ON those deduped rows; output is ≤ k rows
    * per group. */
  def kmvSketch(df: DataFrame, groupCol: String, valueCol: String,
                k: Int = 256): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2: $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("group")).orderBy(col("h"))
    df.select(col(groupCol).as("group"), fp60(col(valueCol)).as("h"))
      .distinct()
      .withColumn("r", row_number().over(w))
      .where(col("r") <= k)
  }

  /** Fold KMV shard sketches (same group/value space, same k; shards
    * may cover OVERLAPPING row sets — distinct-ness dedups) into one
    * sketch table: union, re-dedup, re-rank, keep k. */
  def kmvMerge(k: Int, shards: DataFrame*): DataFrame = {
    require(shards.nonEmpty, "kmvMerge needs at least one shard")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("group")).orderBy(col("h"))
    shards.reduce(_ unionByName _)
      .select(col("group"), col("h")).distinct()
      .withColumn("r", row_number().over(w))
      .where(col("r") <= k)
  }

  /** Distinct-count estimates from a KMV sketch table: groups holding
    * fewer than k fingerprints are EXACT (the sketch saw every
    * value); saturated groups estimate `(k-1) · 2^60 / h_k` with h_k
    * the k-th smallest fingerprint. Exact-IEEE arithmetic on exact
    * integer inputs — bit-equal across engines, hence the oracle. */
  def kmvEstimate(sketch: DataFrame, k: Int = 256): DataFrame =
    sketch.groupBy(col("group"))
      .agg(count(lit(1)).cast("long").as("n_kept"),
        max(col("h")).as("h_max"))
      .select(col("group"), col("n_kept"),
        when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(lit((k - 1).toDouble * 1.152921504606846976e18) /
            col("h_max").cast("double"))
          .as("distinct_est"))
      .orderBy(col("group"))

  /** Pairwise set-overlap estimates between groups, from sketches
    * alone: for each group pair, the union sketch is the k smallest
    * of the merged fingerprint sets → |A∪B| estimate; intersection by
    * inclusion–exclusion, clamped at 0 (small-sketch noise can push
    * it negative); Jaccard from the two. The cross-SOURCE audit
    * ("how many users/documents do these two shards share?") that
    * the union-only HLL family cannot answer.
    *
    * Shape: the sketch table is tiny (≤ k rows per group), so the
    * pair join is a broadcast self-join of sketches — the corpus is
    * never re-read. */
  def kmvOverlap(sketch: DataFrame, k: Int = 256): DataFrame = {
    // KminA ∪ KminB contains every one of the k smallest values of
    // A∪B (each is in A or B, and within its group's k smallest), so
    // re-ranking the merged rows yields a VALID KMV sketch of the
    // union; n_kept < k implies both sketches were complete, making
    // the union count exact — the same saturation rule as
    // [[kmvEstimate]], inherited pair-wise.
    val groups = sketch.select(col("group")).distinct()
    val pairs = groups.select(col("group").as("group_a"))
      .crossJoin(groups.select(col("group").as("group_b")))
      .where(col("group_a") < col("group_b"))
    val pairRows = pairs
      .join(sketch.select(col("group"), col("h")),
        col("group") === col("group_a") || col("group") === col("group_b"))
      .select(col("group_a"), col("group_b"), col("h")).distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("group_a"), col("group_b")).orderBy(col("h"))
    val unionEst = pairRows
      .withColumn("r", row_number().over(w)).where(col("r") <= k)
      .groupBy(col("group_a"), col("group_b"))
      .agg(count(lit(1)).cast("long").as("n_union"), max(col("h")).as("h_max"))
      .select(col("group_a"), col("group_b"),
        when(col("n_union") < k, col("n_union").cast("double"))
          .otherwise(lit((k - 1).toDouble * 1.152921504606846976e18) /
            col("h_max").cast("double"))
          .as("est_union"))
    val est = kmvEstimate(sketch, k)
    unionEst
      .join(broadcast(est.select(col("group").as("group_a"),
        col("distinct_est").as("est_a"))), Seq("group_a"))
      .join(broadcast(est.select(col("group").as("group_b"),
        col("distinct_est").as("est_b"))), Seq("group_b"))
      .select(col("group_a"), col("group_b"), col("est_a"), col("est_b"),
        col("est_union"),
        greatest(lit(0.0), col("est_a") + col("est_b") - col("est_union"))
          .as("est_intersection"),
        (greatest(lit(0.0), col("est_a") + col("est_b") - col("est_union")) /
          col("est_union")).as("jaccard_est"))
      .orderBy(col("group_a"), col("group_b"))
  }

  /** End-to-end incremental dictionary: sketch per shard → union →
    * one (column_name, distinct_est) row per column. Deterministic
    * for a given input set (HLL is order-insensitive), but not
    * cross-engine comparable — rows-only oracle, like
    * [[approxDataDictionary]]. */
  def sketchDictionary(df: DataFrame, shardCol: String, cols: Seq[String],
                       lgK: Int = 12): DataFrame = {
    val merged = mergeShardSketches(sketchShards(df, shardCol, cols, lgK), cols)
    val entries = cols.map { c =>
      struct(lit(c).as("column_name"), col(s"__d_$c").as("distinct_est"))
    }
    merged.select(explode(array(entries: _*)).as("e"))
      .select(col("e.column_name"), col("e.distinct_est"))
      .orderBy(col("column_name"))
  }

  /** Referential-integrity audit ([EXT]) — one row per foreign-key
    * relationship: child rows, orphans (a non-null key with no parent),
    * null keys (not orphans — SQL FK semantics), and the orphan share.
    * The data-quality gate a lake runs after every load; the reference
    * validates row counts only, which misses broken joins entirely.
    *
    * Each relationship is ONE pass over the child: a left join against
    * the parent's distinct keys (broadcast when the dim is small, the
    * usual case) feeding a single conditional-count aggregate — never
    * one job per metric. Relationships are independent plan branches
    * unioned at the end (k 1-row branches). */
  def integrityAudit(rels: Seq[(String, DataFrame, String, DataFrame, String)])
      : DataFrame = {
    require(rels.nonEmpty, "integrityAudit needs at least one relationship")
    rels.map { case (name, child, childKey, parent, parentKey) =>
      val parents = parent.select(col(parentKey).as("__pk")).distinct()
      child.select(col(childKey).as("__ck"))
        .join(parents, col("__ck") === col("__pk"), "left")
        .agg(
          count(lit(1)).as("child_rows"),
          count(when(col("__ck").isNotNull && col("__pk").isNull, lit(1)))
            .as("orphan_rows"),
          count(when(col("__ck").isNull, lit(1))).as("null_key_rows"))
        .select(lit(name).as("relationship"), col("child_rows"),
          col("orphan_rows"), col("null_key_rows"),
          when(col("child_rows") > 0,
            round(col("orphan_rows").cast("double") /
              col("child_rows").cast("double"), 6)).as("orphan_share"))
    }.reduce(_ unionByName _).orderBy(col("relationship"))
  }

  /** Winsorize ([EXT]): clip `c` into its [lo, hi] percentile range —
    * the standard outlier guard before scaling/aggregating features
    * (a fat-fingered 1e12 value otherwise owns the mean). Exact
    * `percentile` keeps the DuckDB oracle byte-exact; at 100 TB swap
    * in `approx_percentile` (sketch-based, one pass, mergeable) via
    * `exact = false`. The 1-row bounds broadcast back onto the fact —
    * two scans, zero shuffles of the data itself, and clipping is
    * pure comparison (no arithmetic), so no cross-engine ULP risk
    * beyond the bounds themselves. */
  def winsorize(df: DataFrame, c: String, lo: Double = 0.01, hi: Double = 0.99,
                exact: Boolean = true): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo < hi, s"need 0 <= lo < hi <= 1: ($lo, $hi)")
    val v = col(c).cast("double")
    val bounds =
      if (exact) df.agg(percentile(v, lit(lo)).as("__lo"), percentile(v, lit(hi)).as("__hi"))
      else df.agg(approx_percentile(v, lit(lo), lit(10000)).as("__lo"),
        approx_percentile(v, lit(hi), lit(10000)).as("__hi"))
    df.crossJoin(broadcast(bounds))
      .withColumn(s"${c}_w", least(greatest(v, col("__lo")), col("__hi")))
      .drop("__lo", "__hi")
  }

  /** Chi-square contingency cells ([EXT]): the full a×b spine
    * (including never-observed combinations — omitting zero cells
    * understates dependence) with observed counts, expected counts
    * under independence (row·col/N), and each cell's chi-square term
    * (obs-exp)²/exp. Complements [[psiDrift]] (numeric distribution
    * drift) with the CATEGORICAL-association view: "did the
    * language×source mix shift" is a chi-square question. The total
    * statistic is the sum of `term` — left to the caller because a
    * cross-engine-stable double sum needs the decimal-rounding
    * convention, while the per-cell terms are pure IEEE on exact
    * counts (multiply, divide, square — all exactly specified) and
    * ship unrounded.
    *
    * Shape: ONE fact scan (the pair count aggregate); the spine is a
    * cross join of two bounded distinct aggregates; row/col/grand
    * totals are windows ON the spine rows (bounded by |a|·|b| — the
    * psiDrift discipline; the unpartitioned window sees only those
    * rows, never the fact). */
  def chi2Cells(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val obs = df.groupBy(col(aCol), col(bCol)).agg(count(lit(1)).as("__n"))
    // broadcast the b-side of the category cross: both sides are
    // bounded distinct-value dims, and the hint keeps the repo-wide
    // no-unguarded-cross convention mechanical (plan-gate enforced)
    val spine = df.select(col(aCol)).distinct()
      .crossJoin(broadcast(df.select(col(bCol)).distinct()))
    val full = spine.join(obs, Seq(aCol, bCol), "left")
      .select(col(aCol), col(bCol), coalesce(col("__n"), lit(0L)).as("n_obs"))
    val byA = Window.partitionBy(col(aCol))
    val byB = Window.partitionBy(col(bCol))
    val all = Window.partitionBy()
    full
      .withColumn("expected",
        sum(col("n_obs")).over(byA).cast("double") *
          sum(col("n_obs")).over(byB).cast("double") /
          sum(col("n_obs")).over(all).cast("double"))
      .withColumn("term",
        (col("n_obs").cast("double") - col("expected")) *
          (col("n_obs").cast("double") - col("expected")) / col("expected"))
      .orderBy(col(aCol), col(bCol))
  }

  /** Cramér's V ([EXT]) — the EFFECT SIZE [[chi2Cells]]'s statistic
    * needs for comparability: χ² grows with N (everything is
    * "significant" at 100 TB), V = sqrt(χ² / (N·(min(r,c)−1))) ∈
    * [0,1] doesn't. Rides the same cell table; per-cell terms are
    * ROUNDED then decimal-summed (a raw double sum over cells would
    * make χ² partitioning-dependent), and V is one guarded IEEE
    * finish; degenerate tables (a single row or column category)
    * yield null, not 0/0. */
  def cramersV(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = chi2Cells(df, aCol, bCol)
    val agg = cells.agg(
      sum(round(col("term"), 6).cast(DecimalType(18, 6))).as("__chi2"),
      sum(col("n_obs")).as("__n"),
      countDistinct(col(aCol)).as("__r"),
      countDistinct(col(bCol)).as("__c"))
    val k = least(col("__r"), col("__c")).cast("double") - 1.0
    agg.select(
      col("__n").cast("long").as("n"),
      col("__r").cast("long").as("n_rows_cat"),
      col("__c").cast("long").as("n_cols_cat"),
      round(col("__chi2").cast("double"), 6).as("chi2"),
      when(col("__n") > 0 && least(col("__r"), col("__c")) > 1,
        round(sqrt(col("__chi2").cast("double") /
          (col("__n").cast("double") * k)), 6)).as("cramers_v"))
  }

  /** Robust outlier report via the median absolute deviation ([EXT]):
    * per group, med = median(v), mad = median(|v - med|); rows with
    * |v - med| > k·mad are flagged with their robust score
    * |v - med|/mad (the "modified z-score" family, Iglewicz & Hoaglin
    * 1993 — mean/stddev-based z-scores ([[zscoreBy]]) let one extreme
    * value inflate its own yardstick; medians don't budge). The
    * production gate for "impossible" numeric values in a feed whose
    * tails are fat by nature.
    *
    * Shape: two keyed aggregates of exact `percentile` (group medians
    * broadcast back between them — group cardinality is bounded, the
    * IVF-centroid discipline) + a per-row filter riding the scan; the
    * fact itself never shuffles. At 100 TB swap `approx_percentile`
    * for the medians (sketch-based, mergeable) — the contract is the
    * same. A group with mad = 0 (over half its values identical)
    * flags nothing — score would divide by zero; gate such groups on
    * exact-match rules instead ([[Quality]]). Score and thresholds
    * are pure IEEE on exact inputs — bit-equal across engines,
    * shipped unrounded. */
  def madOutliers(df: DataFrame, groupCol: String, valueCol: String,
                  idCols: Seq[String], k: Double = 3.5,
                  exact: Boolean = true): DataFrame = {
    require(k > 0, s"need k > 0: $k")
    val v = col(valueCol).cast("double")
    def med(c: Column) =
      if (exact) percentile(c, lit(0.5)) else approx_percentile(c, lit(0.5), lit(10000))
    val meds = df.groupBy(col(groupCol)).agg(med(v).as("med"))
    // dev feeds BOTH the mad aggregate and the final filter. A
    // localCheckpoint here was MEASURED SLOWER (2.7 s -> 3.2 s at
    // sf0.1): the broadcast-join recompute it saves is cheaper than
    // materializing 600k rows and breaking codegen fusion — the exact
    // percentile aggregates dominate either way. Left unpinned on
    // purpose.
    val dev = df.join(broadcast(meds), Seq(groupCol))
      .withColumn("__ad", abs(v - col("med")))
    val mads = dev.groupBy(col(groupCol)).agg(med(col("__ad")).as("mad"))
    dev.join(broadcast(mads), Seq(groupCol))
      .filter(col("mad") > 0 && col("__ad") > lit(k) * col("mad"))
      .select(idCols.map(col) ++ Seq(col(groupCol), v.as("value"),
        col("med"), col("mad"), (col("__ad") / col("mad")).as("score")): _*)
      .orderBy(idCols.map(col): _*)
  }

  /** Quantile-bucket assignment: label every row with which of `n`
    * equal-population buckets its value falls in (0-based; bucket i
    * spans (q_{i/n}, q_{(i+1)/n}]) — the stratum column for
    * difficulty- or size-stratified sampling (pair with
    * [[Sampling.stratifiedByHash]]) and for balanced split audits.
    * Unlike `ntile` (a GLOBAL sort window — one task at corpus scale),
    * the boundaries come from one aggregate of exact `percentile`s
    * (swap `approx_percentile` at 100 TB) broadcast back, and the
    * assignment is a per-row comparison chain riding the scan. Ties
    * on a boundary go to the LOWER bucket (`<= bound`), matching the
    * inclusive-upper quantile convention, so the same value always
    * lands in the same bucket regardless of row order. */
  def quantileBuckets(df: DataFrame, c: String, n: Int,
                      exact: Boolean = true): DataFrame = {
    require(n >= 2, s"need at least 2 buckets: $n")
    val v = col(c).cast("double")
    val ps = (1 until n).map(_.toDouble / n)
    val aggs = ps.zipWithIndex.map { case (p, i) =>
      if (exact) percentile(v, lit(p)).as(s"__q$i")
      else approx_percentile(v, lit(p), lit(10000)).as(s"__q$i")
    }
    val bounds = df.agg(aggs.head, aggs.tail: _*)
    val bucket = (0 until n - 1).reverse.foldLeft(lit(n - 1): Column) {
      (acc, i) => when(v <= col(s"__q$i"), lit(i)).otherwise(acc)
    }
    df.crossJoin(broadcast(bounds))
      // a null value belongs to no bucket (the when-chain's otherwise
      // would silently file it in the top bucket)
      .withColumn("bucket", when(v.isNotNull, bucket).cast("int"))
      .drop((0 until n - 1).map(i => s"__q$i"): _*)
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

  /** Population Stability Index drift report ([EXT]) — the standard
    * ML-monitoring comparison of a column's distribution between a
    * reference batch and a current batch over FIXED bins:
    * `PSI = Σ (p_i − q_i)·ln(p_i/q_i)`. Rule of thumb: < 0.1 stable,
    * 0.1–0.25 drifting, > 0.25 broken — the alarm a feature pipeline
    * or crawl-mix monitor runs per load, next to [[nullProfile]]'s
    * structural checks. Fixed `[lo, hi)` edges (not per-batch
    * quantiles) so the same query is comparable across runs; out-of-
    * range values clamp into the edge bins; NULLs are excluded.
    *
    * Shape: one bin-count aggregate per side (bin-bounded shuffles),
    * joined onto a generated bin spine so empty bins surface as 0;
    * totals are an unpartitioned window over the POST-aggregate rows
    * (bounded by nBins — never the data; a second aggregate would
    * rescan both inputs). Shares are Laplace-smoothed
    * (`(n+0.5)/(t+0.5·nBins)`) so empty bins contribute finite terms.
    * All doubles derive from exact integer counts through one rounded
    * expression — engine-reproducible when `lo`/`hi` and the implied
    * bin width are exactly-representable literals. */
  def psiDrift(ref: DataFrame, cur: DataFrame, c: String,
               lo: Double, hi: Double, nBins: Int = 10): DataFrame = {
    require(nBins > 0, "psiDrift needs at least one bin")
    require(hi > lo, "psiDrift needs hi > lo")
    val w = (hi - lo) / nBins
    def binned(df: DataFrame, n: String) =
      df.select(col(c).cast("double").as("__v")).where(col("__v").isNotNull)
        .select(least(greatest(floor((col("__v") - lo) / w), lit(0.0)),
          lit((nBins - 1).toDouble)).cast("long").as("bin"))
        .groupBy(col("bin")).agg(count(lit(1)).as(n))
    val bins = ref.sparkSession.range(nBins).withColumnRenamed("id", "bin")
    val joined = bins.join(binned(ref, "__nr"), Seq("bin"), "left")
      .join(binned(cur, "__nc"), Seq("bin"), "left")
      .select(col("bin"), coalesce(col("__nr"), lit(0L)).as("n_ref"),
        coalesce(col("__nc"), lit(0L)).as("n_cur"))
    val all = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)
    val p = (col("n_ref").cast("double") + lit(0.5)) /
      (col("__tr").cast("double") + lit(0.5 * nBins))
    val q = (col("n_cur").cast("double") + lit(0.5)) /
      (col("__tc").cast("double") + lit(0.5 * nBins))
    joined
      .withColumn("__tr", sum(col("n_ref")).over(all))
      .withColumn("__tc", sum(col("n_cur")).over(all))
      .select(col("bin"),
        // edges and shares are pure exactly-specified IEEE arithmetic
        // on exact integers/literals — bit-equal across engines
        // UNROUNDED (round() near an exact 6-dp tie is engine-
        // dependent); only psi_term passes through ln and needs the
        // rounded render
        (lit(lo) + col("bin") * w).as("bin_lo"),
        (lit(lo) + (col("bin") + 1) * w).as("bin_hi"),
        col("n_ref"), col("n_cur"),
        p.as("p_ref"), q.as("p_cur"),
        round((p - q) * log(p / q), 6).as("psi_term"))
      .orderBy(col("bin"))
  }

  /** Exact mode per column ([EXT]) — the most frequent non-null value
    * of each listed column, with its count: the one-line data-quality
    * summary next to [[dataDictionary]] (a dominant constant in a
    * supposedly-informative column is the classic dead-feature /
    * default-value smell). Values are compared as STRINGS (pass
    * integer/string columns; float renders differ across engines).
    *
    * Shape: one unpivot Generate (no shuffle) feeds one (column,
    * value) aggregate; the mode pick is a row_number over the
    * aggregate rows — bounded by per-column cardinality, never the
    * fact. Ties break on the smaller value, deterministically. */
  def columnModes(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "columnModes needs at least one column")
    val counted = Reshape
      .melt(df.select(cols.map(c => col(c).cast("string").as(c)): _*),
        Seq.empty, cols, "col_name", "value")
      .where(col("value").isNotNull)
      .groupBy(col("col_name"), col("value"))
      .agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("col_name")).orderBy(col("n").desc, col("value"))
    counted.withColumn("__rk", row_number().over(w))
      .where(col("__rk") === 1).drop("__rk")
      .orderBy(col("col_name"))
  }

  /** Fixed-bin histogram SHARD ([EXT]) — [[psiDrift]]'s clamped
    * equi-width binning over one batch, emitted as mergeable state:
    * (bin, n) rows closed under [[histogramMerge]] exactly (counts
    * add), the [[graft.operators.Reports.partialAggregate]] /
    * [[dfShard]] incremental-maintenance algebra applied to
    * distribution profiling. Fixed `[lo, hi)` edges — not per-batch
    * min/max — are what MAKE shards mergeable (and runs comparable);
    * out-of-range values clamp into the edge bins, NULLs are
    * excluded. Empty bins are absent from a shard (the merge
    * re-spines). */
  def histogramShard(df: DataFrame, c: String,
                     lo: Double, hi: Double, nBins: Int = 10): DataFrame = {
    require(nBins > 0, "histogramShard needs at least one bin")
    require(hi > lo, "histogramShard needs hi > lo")
    val w = (hi - lo) / nBins
    df.select(col(c).cast("double").as("__v")).where(col("__v").isNotNull)
      .select(least(greatest(floor((col("__v") - lo) / w), lit(0.0)),
        lit((nBins - 1).toDouble)).cast("long").as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("n"))
  }

  /** Merge histogram shards: union + one bin-keyed sum, joined onto
    * the full bin spine so empty bins surface as 0 — equal to
    * [[histogramShard]] over the concatenated input, exactly. The
    * shuffle carries O(shards × bins) rows, never the data. */
  def histogramMerge(shards: Seq[DataFrame], nBins: Int): DataFrame = {
    require(shards.nonEmpty, "histogramMerge needs at least one shard")
    val bins = shards.head.sparkSession.range(nBins).withColumnRenamed("id", "bin")
    bins.join(
        shards.reduce(_ unionByName _).groupBy(col("bin")).agg(sum(col("n")).as("n")),
        Seq("bin"), "left")
      .select(col("bin"), coalesce(col("n"), lit(0L)).as("n"))
      .orderBy(col("bin"))
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

  /** Join-skew diagnostic: the per-key row-count distribution of a
    * prospective shuffle key, plus an integer skew ratio (max/avg in
    * basis points) and the salt count that would flatten the hottest
    * key to ~average. Run BEFORE a big join/agg to choose between a
    * plain shuffle, AQE's skew handling, or [[Skew.saltedSum]]'s
    * explicit two-phase salt. Cost: one map-side-combined groupBy +
    * one tiny global aggregate over the per-key counts. Ratios use
    * integral division (positive operands, so floor == truncate and
    * every engine agrees). */
  def keySkew(df: DataFrame, key: String): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .agg(
        count(lit(1)).as("n_keys"),
        sum(col("n")).as("n_rows"),
        max(col("n")).as("max_n"),
        percentile(col("n"), lit(0.5)).as("p50_n"),
        percentile(col("n"), lit(0.99)).as("p99_n"))
      // divide FIRST (avg = n_rows DIV n_keys >= 1): the naive
      // max_n * n_keys * 10000 overflows Long at ~1e9 keys x 1e6-row
      // hot key — exactly the corpus this diagnostic exists for
      .withColumn("skew_ratio_bp", expr("max_n * 10000 DIV (n_rows DIV n_keys)"))
      .withColumn("suggested_salt", expr("greatest(1L, max_n DIV (n_rows DIV n_keys))"))

  /** Per-group z-score normalization (feature standardization):
    * `z = (x - mean) / sampleStddev` within each key group — the
    * feature-engineering primitive for normalizing measures before
    * modeling or embedding-metadata scoring. Same exactness design as
    * [[pearsonExact]]: group moments as EXPLICIT decimal sums
    * (order-independent, engine-exact), then ONE canonical double
    * expression — the built-in `stddev` accumulates Welford-style and
    * drifts with merge order. Degenerate groups (n = 1, or variance
    * not strictly positive after rounding) yield null, decided by a
    * guard on the SAME deterministic double, so every engine agrees
    * on which rows are null. Cost: one map-side-combined aggregate +
    * a joined-back stats table (AQE broadcasts it when keys are few). */
  def zscoreNormalize(df: DataFrame, key: String, measure: String): DataFrame = {
    val stats = df.groupBy(col(key)).agg(
      count(lit(1)).as("__n"),
      sum(col(measure).cast(DecimalType(18, 2))).as("__s"),
      sum((col(measure) * col(measure)).cast(DecimalType(38, 4))).as("__ss"))
    def d(c: Column) = c.cast("double")
    val n = d(col("__n"))
    val mean = d(col("__s")) / n
    val variance = (d(col("__ss")) - d(col("__s")) * d(col("__s")) / n) / (n - 1)
    // null-SAFE join: groupBy produces a stats row for the null-key
    // group, but an equi-join would drop every null-key input row —
    // a normalizer must return all its input
    df.join(stats.withColumnRenamed(key, "__key"),
        col(key) <=> col("__key"), "left")
      // rounded to 6dp: decimal→double casts are correctly rounded in
      // the JVM but computed as int128/10^s in some engines — a 1-ulp
      // input difference the rounding absorbs (same convention as the
      // cosine scores)
      .withColumn("z",
        when(col("__n") > 1 && variance > 0,
          round((d(col(measure)) - mean) / sqrt(variance), 6)))
      .drop("__key", "__n", "__s", "__ss")
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

  /** Spearman rank correlation per group ([EXT]) — Pearson over
    * average ranks, the monotone-association complement of
    * [[pearsonExact]] (robust to the heavy-tailed measures a price
    * column always has; detects nonlinear-but-monotone coupling the
    * linear corr underestimates).
    *
    * Exactness: average ranks are multiples of 1/2, so both rank
    * columns are DOUBLED to stay integral — `2·avgrank = 2·rank() +
    * ties − 1` (rank() is the min rank of the tie run; the average of
    * the run `r..r+t−1` is `r + (t−1)/2`). Scaling both variables by
    * the same constant leaves the correlation unchanged, and integer
    * ranks mean the moment sums are EXACT decimals — summation-order
    * independent, engine-exact — with the same one-double-expression
    * finish as [[pearsonExact]]. Moment widths: doubled ranks ≤ 2n,
    * so Σr ≤ 2n² (DECIMAL(28,0) holds n = 10¹² rows per group) and
    * Σr·r ≤ 4n³ (DECIMAL(38,0) likewise).
    *
    * Shape: ONE hash exchange on the group key serves both rank
    * windows (the tie-count windows partition by (key, value), which
    * hash-partitioning on key already clusters; only re-sorts are
    * inserted), then the moment aggregate rides the same
    * partitioning. No join, no second shuffle. */
  def spearmanExact(df: DataFrame, key: String, x: String, y: String): DataFrame = {
    val byX = Window.partitionBy(col(key)).orderBy(col(x))
    val byY = Window.partitionBy(col(key)).orderBy(col(y))
    val tiesX = Window.partitionBy(col(key), col(x))
    val tiesY = Window.partitionBy(col(key), col(y))
    // incomplete pairs are EXCLUDED (standard Spearman) — ranking a
    // NULL as "smallest" would also diverge across engines (Spark
    // windows sort NULLS FIRST, DuckDB NULLS LAST)
    val ranked = df.select(col(key), col(x), col(y))
      .where(col(x).isNotNull && col(y).isNotNull)
      .withColumn("__rx",
        lit(2L) * rank().over(byX) + count(lit(1)).over(tiesX) - 1)
      .withColumn("__ry",
        lit(2L) * rank().over(byY) + count(lit(1)).over(tiesY) - 1)
    // widen to DECIMAL BEFORE squaring: long·long wraps at rx ~ 3e9
    // (n ~ 1.5e9 rows/group) while DuckDB's BIGINT·BIGINT widens to
    // HUGEINT — the interArrival overflow lesson applied here
    def d19(c: Column) = c.cast(DecimalType(19, 0))
    val agg = ranked.groupBy(col(key)).agg(
      count(lit(1)).as("__n"),
      sum(col("__rx").cast(DecimalType(28, 0))).as("__sx"),
      sum(col("__ry").cast(DecimalType(28, 0))).as("__sy"),
      sum((d19(col("__rx")) * d19(col("__rx"))).cast(DecimalType(38, 0))).as("__sxx"),
      sum((d19(col("__ry")) * d19(col("__ry"))).cast(DecimalType(38, 0))).as("__syy"),
      sum((d19(col("__rx")) * d19(col("__ry"))).cast(DecimalType(38, 0))).as("__sxy"))
    def d(c: String) = col(c).cast("double")
    agg.select(col(key),
      // all-tied groups (zero rank variance) yield null, not NaN
      when(col("__n") > 1 &&
          col("__n") * col("__sxx") =!= col("__sx") * col("__sx") &&
          col("__n") * col("__syy") =!= col("__sy") * col("__sy"),
        round((d("__n") * d("__sxy") - d("__sx") * d("__sy")) /
          (sqrt(d("__n") * d("__sxx") - d("__sx") * d("__sx")) *
            sqrt(d("__n") * d("__syy") - d("__sy") * d("__sy"))), 6))
        .as("spearman"))
      .orderBy(col(key))
  }

  /** Robust per-group scaling ([EXT]) — `(x − median) / IQR`, the
    * outlier-resistant twin of [[zscoreNormalize]]: one wild value
    * shifts a mean/stddev scaler's own yardstick, but moves the
    * median and quartiles not at all. The standard feature-scaling
    * choice for heavy-tailed measures before modeling.
    *
    * Same shape as zscoreNormalize: one bounded per-group stats
    * aggregate (exact interpolated percentiles — Spark `percentile`
    * and DuckDB `quantile_cont` share the (1−g)·a + g·b rule, the
    * q_quantiles-certified bridge) joined back null-safely, then one
    * deterministic double expression rounded to 6dp. Zero-IQR groups
    * (over half the values identical) yield null by the same
    * deterministic guard. */
  def robustScale(df: DataFrame, key: String, measure: String): DataFrame = {
    val stats = df.groupBy(col(key)).agg(
      percentile(col(measure), lit(0.5)).as("__med"),
      percentile(col(measure), lit(0.25)).as("__p25"),
      percentile(col(measure), lit(0.75)).as("__p75"))
    val iqr = col("__p75") - col("__p25")
    df.join(stats.withColumnRenamed(key, "__key"),
        col(key) <=> col("__key"), "left")
      .withColumn("robust_z",
        when(iqr > 0,
          round((col(measure).cast("double") - col("__med")) / iqr, 6)))
      .drop("__key", "__med", "__p25", "__p75")
  }

  /** Per-group ordinary-least-squares line fit ([EXT]) — slope and
    * intercept of `y ~ x` per key, the "trend per segment" query
    * behind every dashboard sparkline (and the drift detector's
    * numeric core). Callers pass INTEGRAL x (e.g. epoch days) and a
    * money/quantity-scaled y; moments are exact decimal sums (the
    * [[pearsonExact]] discipline — order-independent, engine-exact),
    * and BOTH outputs are single closed-form double expressions over
    * those sums — the intercept deliberately avoids referencing a
    * rounded slope: `b = (Σy·Σxx − Σx·Σxy) / (nΣxx − (Σx)²)`.
    * Degenerate groups (n < 2 or zero x-variance) yield null by a
    * guard on the same exact decimals. Shape: one map-side-combined
    * aggregate; nothing else. */
  def linearFit(df: DataFrame, key: String, x: String, y: String): DataFrame = {
    // widen x BEFORE squaring: an IntegerType x (epoch days, sequence
    // index) wraps int·int at |x| > 46340 with no error under
    // non-ANSI semantics, while the oracle's arithmetic widens
    val xd = col(x).cast(DecimalType(19, 0))
    val agg = df.groupBy(col(key)).agg(
      count(lit(1)).as("__n"),
      sum(col(x).cast(DecimalType(28, 0))).as("__sx"),
      sum(col(y).cast(DecimalType(18, 2))).as("__sy"),
      sum((xd * xd).cast(DecimalType(38, 0))).as("__sxx"),
      sum((xd * col(y).cast(DecimalType(18, 2))).cast(DecimalType(38, 2))).as("__sxy"))
    def d(c: String) = col(c).cast("double")
    val ok = col("__n") > 1 &&
      col("__n") * col("__sxx") =!= col("__sx") * col("__sx")
    val den = d("__n") * d("__sxx") - d("__sx") * d("__sx")
    agg.select(col(key),
      col("__n").as("n"),
      when(ok, round((d("__n") * d("__sxy") - d("__sx") * d("__sy")) / den, 6))
        .as("slope"),
      when(ok, round((d("__sy") * d("__sxx") - d("__sx") * d("__sxy")) / den, 6))
        .as("intercept"))
      .orderBy(col(key))
  }

  /** Benford first-digit audit ([EXT]) — the fraud/fabrication smell
    * test: naturally-occurring multi-magnitude amounts follow
    * `P(d) = log10(1 + 1/d)`; invented numbers don't. Reports each
    * leading digit's observed share against the Benford expectation
    * and the deviation. The first digit comes from the INTEGER cent
    * value's decimal string — no float formatting, no log10 edge
    * cases; zero/negative amounts are excluded (no leading digit).
    * One aggregate over 9 possible groups. */
  def benfordAudit(df: DataFrame, amountCol: String): DataFrame = {
    val cents = col(amountCol).cast(DecimalType(18, 2)) * 100
    val digit = substring(cents.cast("long").cast("string"), 1, 1)
    val counts = df.where(cents > 0)
      .groupBy(digit.as("digit")).agg(count(lit(1)).as("n"))
    val total = df.where(cents > 0).agg(count(lit(1)).as("__t"))
    counts.crossJoin(broadcast(total))
      .select(col("digit"), col("n"),
        round(col("n").cast("double") / col("__t").cast("double"), 6).as("share"),
        round(log(10.0, lit(1.0) + lit(1.0) /
          col("digit").cast("double")), 6).as("benford"),
        round(col("n").cast("double") / col("__t").cast("double") -
          log(10.0, lit(1.0) + lit(1.0) / col("digit").cast("double")), 6)
          .as("deviation"))
      .orderBy(col("digit"))
  }

  /** Quantile transform ([EXT]) — map each value to its percentile
    * rank within its group (`percent_rank`: ties share a rank, range
    * [0,1]): the rank-based feature normalization that is immune to
    * ANY monotone distortion of the raw scale — where [[zscoreNormalize]]
    * still believes outliers and [[robustScale]] still believes the
    * IQR, the quantile transform only believes order. One
    * key-partitioned sort window; singleton groups are 0 by the SQL
    * convention. */
  def quantileTransform(df: DataFrame, key: String, measure: String): DataFrame = {
    // NULL measures must stay OUT of the rank window (Spark sorts
    // NULLS FIRST, DuckDB NULLS LAST — inside the window a single
    // null would shift every rank differently per engine) and get a
    // null q of their own: rank over the non-null slice, union the
    // null rows back untouched
    val w = Window.partitionBy(col(key)).orderBy(col(measure))
    df.where(col(measure).isNotNull)
      .withColumn("q", round(percent_rank().over(w), 6))
      .unionAll(df.where(col(measure).isNull)
        .withColumn("q", lit(null).cast("double")))
  }

  /** Mutual information between two categorical columns ([EXT]) —
    * `MI = H(X) + H(Y) − H(X,Y)` in nats, plus the three entropies:
    * the dependence measure chi-square ([[chi2Cells]]) tests but
    * does not QUANTIFY (MI is comparable across column pairs; a chi²
    * statistic is not). Association audits: does `lang` determine
    * `source`? Is a feature redundant with the label?
    *
    * Each entropy comes from one count aggregate via the
    * [[tokenEntropy]] discipline — `H = ln N − Σ round(n·ln n, 6)/N`
    * with the contributions DECIMAL-summed (order-free) — and the
    * joint aggregate subsumes both margins as second-phase
    * aggregates ON its (bounded) cell rows, so the fact is scanned
    * ONCE. Output is one row; every value one IEEE chain, 6dp. */
  def mutualInformation(df: DataFrame, x: String, y: String): DataFrame = {
    val cells = df.groupBy(col(x).as("__x"), col(y).as("__y"))
      .agg(count(lit(1)).as("__n"))
    def entropySum(counts: DataFrame) = counts.agg(
      sum(round(col("__n") * log(col("__n").cast("double")), 6)
        .cast(DecimalType(18, 6))).as("__s"),
      sum(col("__n")).as("__t"))
    val jointS = entropySum(cells)
    val xS = entropySum(cells.groupBy(col("__x")).agg(sum(col("__n")).as("__n")))
    val yS = entropySum(cells.groupBy(col("__y")).agg(sum(col("__n")).as("__n")))
    def h(s: Column, t: Column) = log(t.cast("double")) - s.cast("double") / t.cast("double")
    jointS.select(col("__s").as("__sxy"), col("__t").as("__t"))
      .crossJoin(broadcast(xS.select(col("__s").as("__sx"))))
      .crossJoin(broadcast(yS.select(col("__s").as("__sy"))))
      .select(
        col("__t").as("n_rows"),
        round(h(col("__sx"), col("__t")), 6).as("h_x"),
        round(h(col("__sy"), col("__t")), 6).as("h_y"),
        round(h(col("__sxy"), col("__t")), 6).as("h_xy"),
        round(h(col("__sx"), col("__t")) + h(col("__sy"), col("__t")) -
          h(col("__sxy"), col("__t")), 6).as("mutual_info"))
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
