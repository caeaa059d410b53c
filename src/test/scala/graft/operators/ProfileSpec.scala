package graft.operators

import org.apache.spark.sql.functions.{col, explode, lit, lower}

import graft.SparkSuite

class ProfileSpec extends SparkSuite {
  import spark.implicits._

  private val df = Seq(
    (Some(1), Some("a"), Some(10.0)),
    (Some(2), None, Some(20.0)),
    (None, Some("a"), Some(30.0)),
    (Some(4), Some("b"), None)).toDF("id", "cat", "x")

  test("nullProfile counts nulls per column in one row") {
    val r = Profile.nullProfile(df).head()
    assert(r.getAs[Long]("id_nulls") === 1L)
    assert(r.getAs[Long]("cat_nulls") === 1L)
    assert(r.getAs[Long]("x_nulls") === 1L)
  }

  test("dataDictionary reports null and distinct counts per column") {
    val rows = Profile.dataDictionary(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows("id") === ((1L, 3L)))
    assert(rows("cat") === ((1L, 2L)))
    assert(rows("x") === ((1L, 3L)))
  }

  test("valueCounts orders by frequency desc then value") {
    val out = Profile.valueCounts(df, "cat").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq === Seq(("a", 2L), (null, 1L), ("b", 1L)) ||
      out.toSeq === Seq(("a", 2L), ("b", 1L), (null, 1L)))
  }

  test("histogram buckets uniformly, clamps max into last bucket") {
    val data = (0 to 100).map(_.toDouble).toDF("v")
    val h = Profile.histogram(data, "v", 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(h.keySet === (0L to 9L).toSet)
    assert(h.values.sum === 101L)
    assert(h(9L) === 11L) // 90..100 inclusive: max clamped into bucket 9
  }

  test("histogram degenerate min==max collapses to bucket 0 (was: NaN)") {
    val h = Seq(5.0, 5.0, 5.0).toDF("v")
    val out = Profile.histogram(h, "v", 10).collect()
    assert(out.length === 1)
    assert(out.head.getLong(0) === 0L && out.head.getLong(1) === 3L)
  }

  test("histogram excludes nulls") {
    val h = Seq(Some(1.0), None, Some(2.0)).toDF("v")
    assert(Profile.histogram(h, "v", 2).collect().map(_.getLong(1)).sum === 2L)
  }

  test("columnModes: most frequent non-null value per column, ties to the smaller value") {
    val df2 = Seq(
      (Some("a"), 1), (Some("a"), 1), (Some("b"), 2), (None, 2), (Some("c"), 3))
      .toDF("cat2", "k")
    val out = Profile.columnModes(df2, Seq("cat2", "k")).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out("cat2") === (("a", 2L)))   // null never counts
    assert(out("k") === (("1", 2L)))      // 1 and 2 tie at 2; smaller value wins
  }

  test("histogramShard merge == from-scratch shard over the union, empty bins spined") {
    val all = (0 to 100).map(_.toDouble) ++ Seq(-5.0, 250.0) // clamp both edges
    val shards = all.grouped(40).map(g =>
      Profile.histogramShard(g.toDF("v"), "v", lo = 0.0, hi = 100.0, nBins = 10)).toSeq
    val merged = Profile.histogramMerge(shards, nBins = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val scratch = Profile.histogramShard(all.toDF("v"), "v", 0.0, 100.0, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(merged === (0L to 9L).map(b => b -> scratch.getOrElse(b, 0L)).toMap)
    assert(merged.values.sum === all.length.toLong)
    // a shard column absent everywhere still surfaces as a 0 bin
    val sparse = Profile.histogramMerge(
      Seq(Profile.histogramShard(Seq(5.0).toDF("v"), "v", 0.0, 100.0, 10)), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(sparse === (0L to 9L).map(b => b -> (if (b == 0L) 1L else 0L)).toMap)
  }

  test("columnSamples: n values per column, nulls rendered") {
    val s = Profile.columnSamples(df.orderBy("id"), 3)
    assert(s.keySet === Set("id", "cat", "x"))
    assert(s("id").length === 3)
    assert(s.values.exists(_.contains("null")))
  }

  test("pearsonExact survives large magnitudes (no decimal overflow-to-null)") {
    // values ~1e13: squares ~1e26 overflowed the old DECIMAL(28,4)
    // accumulator to null under non-ANSI arithmetic; DECIMAL(38,4)
    // holds them with room to spare
    val big = Seq(("g", 1.0e13, 2.0e13), ("g", 2.0e13, 4.0e13), ("g", 3.0e13, 6.0e13))
      .toDF("k", "x", "y")
    val out = Profile.pearsonExact(big, "k", "x", "y").collect()
    assert(out.length === 1 && !out.head.isNullAt(1), "corr must not be null")
    assert(math.abs(out.head.getDouble(1) - 1.0) < 1e-9) // y = 2x exactly
  }

  test("shareOfTotal with zero total yields null shares, not NaN") {
    val z = Seq(("a", 0.0), ("b", 0.0)).toDF("k", "m")
    val out = Profile.shareOfTotal(z, "k", "m").collect()
    assert(out.forall(_.isNullAt(2)))
  }

  test("shareOfTotal shares sum to 1.0") {
    val out = Profile.shareOfTotal(df.na.drop(Seq("x")), "cat", "x").collect()
    val shares = out.map(_.getDouble(2))
    assert(math.abs(shares.sum - 1.0) < 1e-12)
    val m = out.map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("a") === 40.0)
  }

  test("winsorize clips both tails to the percentile bounds, interior untouched") {
    val vals = (1 to 100).map(_.toDouble) :+ 1.0e12 // one absurd outlier
    val data = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val out = Profile.winsorize(data, "v", lo = 0.10, hi = 0.90)
      .select("id", "v", "v_w").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val clipped = out.values.map(_._2)
    val lo = clipped.min
    val hi = clipped.max
    assert(lo >= 10.0 && lo <= 12.0, s"low bound ~p10, got $lo")
    assert(hi <= 92.0, s"outlier must be clipped to ~p90, got $hi")
    assert(out(100L)._2 === hi, "the 1e12 outlier lands exactly on the hi bound")
    // interior values pass through unchanged
    assert(out(49L)._1 === out(49L)._2)
    // approximate flavor stays within one rank of exact on this data
    val approx = Profile.winsorize(data, "v", lo = 0.10, hi = 0.90, exact = false)
      .select("v_w").collect().map(_.getDouble(0))
    assert(math.abs(approx.max - hi) <= 1.0 && math.abs(approx.min - lo) <= 1.0)
  }

  test("sketchDictionary: shard-merged estimate == single global sketch (mergeability)") {
    import org.apache.spark.sql.functions._
    val data = (1L to 5000L).map(i => (i % 7, i % 1000, s"u${i % 321}"))
      .toDF("shard", "num", "str")
    val viaShards = Profile.sketchDictionary(data, "shard", Seq("num", "str"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the law that makes the per-shard table trustworthy: unioning
    // shard sketches must give the same estimate as sketching the
    // whole corpus in one pass
    val global = data.agg(
      hll_sketch_estimate(hll_sketch_agg(col("num"), lit(12))).as("num"),
      hll_sketch_estimate(hll_sketch_agg(col("str"), lit(12))).as("str")).head()
    assert(viaShards("num") === global.getLong(0))
    assert(viaShards("str") === global.getLong(1))
  }

  test("sketchDictionary estimates land within 3x the lgK=12 rsd of exact") {
    val data = (1L to 20000L).map(i => (i % 4, i % 2913, s"v${i % 8117}"))
      .toDF("shard", "num", "str")
    val est = Profile.sketchDictionary(data, "shard", Seq("num", "str"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // lgK=12 -> rsd ~= 1.04/sqrt(4096) ~= 1.6%; allow 3x
    val tol = 3 * 1.04 / math.sqrt(1 << 12)
    assert(math.abs(est("num") - 2913.0) / 2913.0 < tol, s"num est ${est("num")}")
    assert(math.abs(est("str") - 8117.0) / 8117.0 < tol, s"str est ${est("str")}")
  }

  test("portable HLL: accuracy within 3x rsd, shard-merge invariance, LC exactness") {
    val data = (1L to 20000L).map(i => (i % 4, i % 2913, s"v${i % 8117}"))
      .toDF("shard", "num", "str")
    val dict = Profile.portableHllDictionary(data, Seq("num", "str"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toList
    val est = dict.map(t => t._1 -> t._3).toMap
    val tol = 3 * 1.04 / math.sqrt(1 << 12) // p=12 -> rsd ~1.6%
    assert(math.abs(est("num") - 2913.0) / 2913.0 < tol, s"num est ${est("num")}")
    assert(math.abs(est("str") - 8117.0) / 8117.0 < tol, s"str est ${est("str")}")
    assert(dict.forall(_._2 === 0L)) // null counts exact
    // merging per-shard register sketches must equal the one-pass build
    // (max is commutative/idempotent — the incremental-profiling law)
    val viaShards = Profile.portableSketchDictionary(data, "shard", Seq("num", "str"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaShards("num") === est("num") && viaShards("str") === est("str"))
    // linear counting: tiny cardinalities come back EXACT (V large,
    // every distinct value its own register with overwhelming odds)
    val tiny = (1 to 1000).map(i => (i % 3, Option.empty[String]))
      .toDF("k", "allnull")
    val tinyDict = Profile.portableHllDictionary(tiny)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toList
    assert(tinyDict === List(("allnull", 1000L, 0L), ("k", 0L, 3L)))
  }

  test("keySkew: hand-computed ratio and salt on a hot-key distribution") {
    // 10 cold keys x 1 row + 1 hot key x 90 rows
    val rows = ((1 to 10).map(k => k.toLong) ++ Seq.fill(90)(99L)).zipWithIndex
      .map { case (k, i) => (k, i) }.toDF("k", "v")
    val r = Profile.keySkew(rows, "k").head()
    assert(r.getLong(0) === 11L)          // n_keys
    assert(r.getLong(1) === 100L)         // n_rows
    assert(r.getLong(2) === 90L)          // max_n
    assert(r.getDouble(3) === 1.0)        // p50
    // avg = 100 DIV 11 = 9 (divide-first, overflow-safe at 1e9 keys);
    // ratio = 90 * 10000 DIV 9 = 100000 bp, salt = 90 DIV 9 = 10
    assert(r.getLong(5) === 100000L, s"skew_ratio_bp ${r.getLong(5)}")
    assert(r.getLong(6) === 10L)
    // uniform data: ratio collapses to ~1x and salt to the 1 floor
    val uniform = (1 to 100).map(i => (i.toLong % 10, i)).toDF("k", "v")
    val u = Profile.keySkew(uniform, "k").head()
    assert(u.getLong(5) === 10000L && u.getLong(6) === 1L)
  }

  test("zscoreNormalize: hand-computed z; degenerate groups go null") {
    val df = Seq(
      (1L, "a", 1.0), (2L, "a", 2.0), (3L, "a", 3.0), // mean 2, sample sd 1
      (4L, "b", 7.0),                                 // n = 1
      (5L, "c", 5.0), (6L, "c", 5.0))                 // zero variance
      .toDF("id", "k", "x")
    def zMap(src: org.apache.spark.sql.DataFrame) =
      Profile.zscoreNormalize(src, "k", "x").select("id", "z").collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    val out = zMap(df)
    assert(out(1L).exists(z => math.abs(z + 1.0) < 1e-12))
    assert(out(2L).exists(z => math.abs(z) < 1e-12))
    assert(out(3L).exists(z => math.abs(z - 1.0) < 1e-12))
    assert(out(4L) === None, "a singleton group has no spread to normalize by")
    assert(out(5L) === None && out(6L) === None, "zero variance must not divide")
    // moments are decimal sums: the same rows under a different
    // partitioning give bit-identical z
    assert(zMap(df.repartition(7)) === out)
    // null-key rows normalize within their own (null) group instead of
    // being dropped by the join
    val withNullKey = Seq(
      (10L, Option("a"), 1.0), (11L, Option("a"), 3.0),
      (12L, Option.empty[String], 1.0), (13L, Option.empty[String], 3.0))
      .toDF("id", "k", "x")
    val z2 = zMap(withNullKey)
    assert(z2.size === 4, "every input row must come back")
    assert(z2(12L).exists(z => math.abs(z + math.sqrt(0.5)) < 1e-6))
    assert(z2(13L).exists(z => math.abs(z - math.sqrt(0.5)) < 1e-6))
  }

  test("quantileBuckets: equal-population strata, boundary ties to lower, null stays null") {
    val df = ((1 to 100).map(i => (i.toLong, Some(i.toDouble))) :+ (101L, None))
      .toDF("id", "x")
    val out = Profile.quantileBuckets(df, "x", 4).select("id", "bucket").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    // quartile bounds of 1..100: 25.75, 50.5, 75.25
    assert(out(1L) === Some(0) && out(25L) === Some(0))
    assert(out(26L) === Some(1) && out(50L) === Some(1))
    assert(out(51L) === Some(2) && out(75L) === Some(2))
    assert(out(76L) === Some(3) && out(100L) === Some(3))
    assert(out(101L) === None, "null value must not land in the top bucket")
    val sizes = Profile.quantileBuckets(df, "x", 4).where($"bucket".isNotNull)
      .groupBy("bucket").count().collect().map(_.getLong(1))
    assert(sizes.forall(_ === 25L), "equal-population buckets")
  }

  test("integrityAudit: orphans, null keys, and clean edges in one pass each") {
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val child = Seq(Some(1L), Some(1L), Some(9L), None).toDF("fk")
    val out = Profile.integrityAudit(Seq(
      ("child.fk->parent", child, "fk", parent, "pk"),
      ("parent.pk->parent", parent, "pk", parent, "pk")))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), Option(r.get(4)).map(_.asInstanceOf[Double])))).toMap
    // 4 child rows: 2 matched, 1 orphan (fk=9), 1 null key (NOT an orphan)
    assert(out("child.fk->parent") === ((4L, 1L, 1L, Some(0.25))))
    assert(out("parent.pk->parent") === ((3L, 0L, 0L, Some(0.0))))
  }

  test("CMS shards: never-under, eps-bounded over, shard-merge == one global sketch") {
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val toks = docs.select(col("source"),
      explode(graft.functions.Text.tokens(lower(col("text")))).as("term"))
    val probes = Seq("join", "hash", "scan", "definitely-absent-token")
    val exact = toks.where(col("term").isin(probes: _*))
      .groupBy("term").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap.withDefaultValue(0L)
    val total = toks.count()
    val eps = 0.01
    val sharded = Profile.cmsEstimates(
      Profile.cmsShards(toks, "source", "term", eps = eps), probes)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    probes.foreach { p =>
      assert(sharded(p) >= exact(p), s"CMS must never under-count: $p")
      assert(sharded(p) <= exact(p) + math.ceil(eps * total).toLong,
        s"CMS over-count beyond eps bound: $p ${sharded(p)} vs ${exact(p)}")
    }
    // shard-merge equals a single global sketch (CMS merge is exact)
    val global = Profile.cmsEstimates(
      Profile.cmsShards(toks.withColumn("one", lit(1)), "one", "term", eps = eps),
      probes).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sharded === global)
  }

  test("portable CMS: never-under, width-bounded over, shard-merge == global, bounded size") {
    val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val toks = docs.select(col("source"),
      explode(graft.functions.Text.tokens(lower(col("text")))).as("term"))
    val probes = Seq("join", "hash", "scan", "definitely-absent-token")
    val exact = toks.where(col("term").isin(probes: _*))
      .groupBy("term").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap.withDefaultValue(0L)
    val total = toks.count()
    val depth = 4
    val width = 256
    val shards = Profile.cmsPortableShards(toks, "source", "term", depth, width)
    // the sketch is bounded by shards x depth x width, never the corpus
    val nShards = toks.select("source").distinct().count()
    assert(shards.count() <= nShards * depth * width)
    val est = Profile.cmsPortableEstimates(shards, probes, depth, width)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    probes.foreach { p =>
      assert(est(p) >= exact(p), s"portable CMS must never under-count: $p")
      // Markov bound per row: E[over] = (N - c_p)/width; 8x slack keeps
      // the law tight enough to catch a broken hash without flaking
      assert(est(p) <= exact(p) + 8L * (total / width + 1),
        s"portable CMS over-count implausibly large: $p ${est(p)} vs ${exact(p)}")
    }
    // shard-merge equals a single global build (summation is exact)
    val global = Profile.cmsPortableEstimates(
      Profile.cmsPortableShards(toks.withColumn("one", lit(1)), "one", "term",
        depth, width), probes, depth, width)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est === global)
  }

  test("chi2Cells: full spine incl. zero cells; independent data has ~0 terms") {
    // perfectly independent 2x2: every term exactly 0
    val ind = (Seq.fill(20)(("a", "x")) ++ Seq.fill(20)(("a", "y")) ++
      Seq.fill(20)(("b", "x")) ++ Seq.fill(20)(("b", "y"))).toDF("u", "v")
    val indOut = Profile.chi2Cells(ind, "u", "v").collect()
    assert(indOut.length === 4)
    assert(indOut.forall(_.getAs[Double]("term") === 0.0))
    // a never-observed combination appears as a zero cell with its
    // expected mass — dropping it would understate dependence
    val dep = (Seq.fill(30)(("a", "x")) ++ Seq.fill(10)(("b", "y"))).toDF("u", "v")
    val depOut = Profile.chi2Cells(dep, "u", "v")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getAs[Double]("expected"))).toMap
    assert(depOut.size === 4)
    assert(depOut(("a", "y")) === (0L, 30.0 * 10 / 40))
    assert(depOut(("b", "x")) === (0L, 10.0 * 30 / 40))
    val chi2 = Profile.chi2Cells(dep, "u", "v").collect()
      .map(_.getAs[Double]("term")).sum
    assert(chi2 === 40.0, "fully dependent 2x2 with these margins: chi2 == N")
  }

  test("madOutliers: flags only beyond k mads, immune to the outlier's own pull") {
    // group g: 9 values near 10 plus one wild 1000; group h: constant (mad 0)
    val rows = ((1L to 9L).map(i => (i, "g", 9.0 + (i % 3))) :+ (10L, "g", 1000.0)) ++
      (11L to 15L).map(i => (i, "h", 5.0))
    val df = rows.toDF("id", "grp", "v")
    val out = Profile.madOutliers(df, "grp", "v", Seq("id"), k = 3.5).collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(10L), "only the wild value flags")
    val r = out.head
    assert(r.getAs[String]("grp") === "g")
    assert(r.getAs[Double]("value") === 1000.0)
    assert(r.getAs[Double]("score") > 3.5)
    // median/mad are robust: the 1000 doesn't drag the yardstick like
    // mean/stddev would (zscore on this data flags nothing at 2 sigma)
    assert(r.getAs[Double]("med") === 10.0)
    // a constant group has mad 0: flags nothing rather than dividing by 0
    assert(!out.exists(_.getAs[String]("grp") === "h"))
  }

  test("psiDrift: identical batches score ~0, a shifted batch alarms, edges clamp") {
    val ref = (Seq.fill(50)(10.0) ++ Seq.fill(30)(30.0) ++ Seq.fill(20)(50.0))
      .toDF("v")
    val same = Profile.psiDrift(ref, ref, "v", lo = 0.0, hi = 60.0, nBins = 6)
      .collect()
    assert(same.length === 6, "every bin surfaces, empty ones included")
    // identical distributions: p == q in every bin, each term exactly 0
    assert(same.forall(_.getAs[Double]("psi_term") === 0.0))
    // mass moved from bin 0 to bin 4 → a clearly alarming PSI
    val cur = (Seq.fill(20)(10.0) ++ Seq.fill(30)(30.0) ++ Seq.fill(50)(50.0))
      .toDF("v")
    val drift = Profile.psiDrift(ref, cur, "v", lo = 0.0, hi = 60.0, nBins = 6)
      .collect()
    assert(drift.map(_.getAs[Double]("psi_term")).sum > 0.25)
    assert(drift.forall(r => !r.getAs[Double]("psi_term").isNaN &&
      !r.getAs[Double]("psi_term").isInfinite), "empty bins stay finite")
    // out-of-range values clamp into the edge bins; NULLs are excluded
    val ragged = Seq(Some(-5.0), Some(999.0), None).toDF("v")
    val edges = Profile.psiDrift(ragged, ragged, "v", 0.0, 60.0, nBins = 6)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_ref")).toMap
    assert(edges(0L) === 1L && edges(5L) === 1L)
    assert(edges.values.sum === 2L, "NULL rows must not land in any bin")
  }

  test("kmv: exact below saturation, rsd-bounded above, shard-merge == direct") {
    val k = 128
    // group "small": 50 distinct values — under k, estimate must be EXACT
    // group "big": 20000 distinct values — saturated, ~1/sqrt(k) rsd
    val rows = ((1 to 50).map(v => ("small", v.toLong)) ++
      (1 to 20000).map(v => ("big", v.toLong + 1000000L))).toDF("g", "v")
    val est = Profile.kmvEstimate(Profile.kmvSketch(rows, "g", "v", k), k)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(est("small") === ((50L, 50.0)), "unsaturated groups are exact")
    val (kept, e) = est("big")
    assert(kept === k.toLong)
    assert(math.abs(e - 20000.0) / 20000.0 < 3.0 / math.sqrt(k.toDouble),
      s"saturated estimate outside 3 rsd: $e")
    // merge law: sketches of overlapping halves fold to the direct sketch
    val merged = Profile.kmvMerge(k,
      Profile.kmvSketch(rows.where($"v" % 3 =!= 0), "g", "v", k),
      Profile.kmvSketch(rows.where($"v" % 2 === 1), "g", "v", k),
      Profile.kmvSketch(rows.where($"v" % 6 === 0), "g", "v", k))
    // the overlapping slices cover every residue mod 6:
    // {1,2,4,5} ∪ {1,3,5} ∪ {0} = all
    val direct = Profile.kmvSketch(rows, "g", "v", k)
    assert(merged.collect().toSet === direct.collect().toSet,
      "union of shard sketches must re-rank to exactly the direct sketch")
  }

  test("kmv overlap: inclusion–exclusion recovers known intersections") {
    val k = 256
    // A = 1..3000, B = 2001..5000 (|∩| = 1000), C = 10001..13000 (disjoint)
    val rows = ((1 to 3000).map(v => ("A", v.toLong)) ++
      (2001 to 5000).map(v => ("B", v.toLong)) ++
      (10001 to 13000).map(v => ("C", v.toLong))).toDF("g", "v")
    val out = Profile.kmvOverlap(Profile.kmvSketch(rows, "g", "v", k), k)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getDouble(4), r.getDouble(5), r.getDouble(6)))).toMap
    val (unionAB, interAB, jacAB) = out(("A", "B"))
    assert(math.abs(unionAB - 5000.0) / 5000.0 < 0.25, s"union est: $unionAB")
    assert(interAB > 200.0 && interAB < 2200.0,
      s"intersection est should be near 1000: $interAB")
    assert(jacAB > 0.0 && jacAB < 0.6)
    val (_, interAC, _) = out(("A", "C"))
    assert(interAC < 700.0,
      s"disjoint intersection stays near 0 (clamped): $interAC")
  }

  test("exactKthLong matches sorted-rank truth across ranks, dups, negatives") {
    val rnd = new scala.util.Random(23)
    val data = Seq.fill(997)(rnd.nextInt(2000).toLong - 1000) ++
      Seq.fill(50)(-123L) // a heavy duplicate
    val df = data.toDF("v")
    val sorted = data.sorted
    for (rank <- Seq(1L, 2L, 500L, data.size / 2L, data.size.toLong)) {
      val r = Profile.exactKthLong(df, "v", rank, bins = 16).head()
      assert(r.getLong(0) === rank)
      assert(r.getLong(1) === sorted((rank - 1).toInt), s"rank $rank")
      assert(r.getLong(2) === data.size.toLong)
    }
  }

  test("exactKthLong survives a huge value range (multiple narrowing passes)") {
    val data = Seq(Long.MinValue / 4, -5L, 0L, 3L, 3L, Long.MaxValue / 4, 17L)
    val df = data.toDF("v")
    val sorted = data.sorted
    (1 to data.size).foreach { k =>
      assert(Profile.exactKthLong(df, "v", k.toLong).head().getLong(1)
        === sorted(k - 1), s"rank $k")
    }
  }

  test("exactKthLong is exact when the window abuts Long.MaxValue (no wrap)") {
    // regression: `lo + width - 1` used to overflow when the chosen
    // bucket touched the top of the long range, silently exiting a
    // pass early with a wrong answer
    val data = Seq(1L, Long.MaxValue - 1, Long.MaxValue)
    val df = data.toDF("v")
    val sorted = data.sorted
    (1 to 3).foreach { k =>
      assert(Profile.exactKthLong(df, "v", k.toLong).head().getLong(1)
        === sorted(k - 1), s"rank $k")
    }
  }

  test("exactMedianLong is the lower median and ignores nulls") {
    val df = Seq(Some(10L), Some(20L), Some(30L), Some(40L), None).toDF("v")
    val r = Profile.exactMedianLong(df, "v").head()
    // n = 4 non-null, lower median = 2nd smallest = 20
    assert(r.getLong(0) === 2L && r.getLong(1) === 20L && r.getLong(2) === 4L)
  }

  test("exactKthLong rejects out-of-range ranks and overflowing windows") {
    val df = Seq(1L, 2L).toDF("v")
    intercept[IllegalArgumentException](Profile.exactKthLong(df, "v", 0L))
    intercept[IllegalArgumentException](Profile.exactKthLong(df, "v", 3L))
    val wide = Seq(Long.MinValue, Long.MaxValue).toDF("v")
    intercept[ArithmeticException](Profile.exactKthLong(wide, "v", 1L))
  }

  test("benfordAudit: integer-cent first digits, zero/negative excluded") {
    val df = Seq(1.23, 19.99, 150.0, 0.0, -5.0, 9000.0, 1.0).toDF("amount")
    val out = Profile.benfordAudit(df, "amount").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // cents: 123, 1999, 15000, 900000, 100 -> digits 1,1,1,9,1
    assert(out("1") === ((4L, 0.8)))
    assert(out("9") === ((1L, 0.2)))
    assert(!out.contains("0") && !out.contains("-"))
    // benford expectation for digit 1 is log10(2)
    val b1 = Profile.benfordAudit(df, "amount").collect()
      .find(_.getString(0) == "1").get.getDouble(3)
    assert(b1 === 0.30103)
  }

  test("quantileTransform: evenly spread ranks, ties share") {
    val df = Seq(("g", 1, 10.0), ("g", 2, 20.0), ("g", 3, 30.0),
      ("g", 4, 40.0), ("g", 5, 50.0)).toDF("k", "id", "v")
    val q = Profile.quantileTransform(df, "k", "v").collect()
      .map(r => r.getInt(1) -> r.getDouble(3)).toMap
    assert(q === Map(1 -> 0.0, 2 -> 0.25, 3 -> 0.5, 4 -> 0.75, 5 -> 1.0))
    val ties = Seq(("g", 1, 1.0), ("g", 2, 1.0), ("g", 3, 2.0)).toDF("k", "id", "v")
    val tq = Profile.quantileTransform(ties, "k", "v").collect()
      .map(r => r.getInt(1) -> r.getDouble(3)).toMap
    assert(tq === Map(1 -> 0.0, 2 -> 0.0, 3 -> 1.0))
    // null measures stay out of the rank window (they'd shift ranks
    // engine-dependently) and come back with a null q
    val withNull = Seq(("g", 1, Some(1.0)), ("g", 2, None), ("g", 3, Some(2.0)))
      .toDF("k", "id", "v")
    val nq = Profile.quantileTransform(withNull, "k", "v").collect()
      .map(r => r.getInt(1) -> (if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .toMap
    assert(nq === Map(1 -> Some(0.0), 2 -> None, 3 -> Some(1.0)))
  }

  test("mutualInformation: zero when independent, H(X) when determined") {
    val indep = Seq(("a", "p"), ("a", "q"), ("b", "p"), ("b", "q"))
      .toDF("x", "y")
    val mi0 = Profile.mutualInformation(indep, "x", "y").head()
    assert(mi0.getAs[Double]("mutual_info") === 0.0)
    assert(mi0.getAs[Double]("h_x") === 0.693147)
    val dep = Seq(("a", "p"), ("a", "p"), ("b", "q"), ("b", "q")).toDF("x", "y")
    val mi1 = Profile.mutualInformation(dep, "x", "y").head()
    assert(mi1.getAs[Double]("mutual_info") === mi1.getAs[Double]("h_x"))
    assert(mi1.getAs[Double]("h_xy") === mi1.getAs[Double]("h_x"))
  }

  test("ddQuantiles: every estimate is within the alpha relative-error bound") {
    // long-tailed deterministic values — the distribution DDSketch's
    // relative (not rank) guarantee exists for
    val vals = (1 to 4000).map(i => ("g" + (i % 3), math.exp((i * 37 % 1000) / 100.0)))
    val out = Profile.ddQuantiles(vals.toDF("k", "v"), "k", "v", alpha = 0.01)
      .collect()
    assert(out.length === 9) // 3 groups x 3 quantiles
    // the sketch guarantees alpha=1% against the ORDER STATISTIC at
    // the lower rank (law-tested exactly below); the rel_err column
    // compares against the INTERPOLATED percentile, which sits up to
    // two ~1% value-gaps away on this grid — hence the looser bound
    out.foreach { r =>
      assert(r.getAs[Double]("rel_err") <= 0.032,
        s"${r.getAs[String]("key")} q=${r.getAs[Double]("q")}: ${r.getAs[Double]("rel_err")}")
    }
    // partitioning invariance: commutative merges -> identical rows
    val re = Profile.ddQuantiles(vals.toDF("k", "v").repartition(17), "k", "v",
      alpha = 0.01).collect()
    assert(out.map(_.toSeq).toSeq === re.map(_.toSeq).toSeq)
  }

  test("DDSketch laws: shard-merge == whole, merge commutes, signs preserved") {
    import graft.expressions.{DDBuf, DDSketch, DDSketchAggregator}
    val agg = new DDSketchAggregator[Double](Double.box, 0.02)
    def build(xs: Seq[Double]): DDBuf = xs.foldLeft(agg.zero)(agg.reduce)
    val a = Seq(-50.0, -1.0, 0.0, 0.0, 3.5, 700.0)
    val b = Seq(-2.25, 0.0, 9.0, 9.0, 12345.0)
    val whole = build(a ++ b)
    val merged = agg.merge(build(a), build(b))
    assert(merged === whole)                          // exact, not approximate
    assert(agg.merge(build(b), build(a)) === merged)  // commutative
    // sign preservation and exact zeros
    val s = build(Seq(-10.0, -10.0, 0.0, 0.0, 0.0, 5.0))
    assert(DDSketch.quantile(s, 0.0, 0.02) < 0)
    assert(DDSketch.quantile(s, 0.5, 0.02) === 0.0)
    assert(DDSketch.quantile(s, 1.0, 0.02) > 0)
    // the p0/p100 estimates bracket the true extremes within alpha
    assert(math.abs(DDSketch.quantile(s, 0.0, 0.02) - (-10.0)) <= 0.02 * 10.0)
    assert(math.abs(DDSketch.quantile(s, 1.0, 0.02) - 5.0) <= 0.02 * 5.0)
    // THE guarantee, tested exactly: for any q, the estimate is within
    // alpha (relative) of the order statistic at rank ⌊q·(n−1)⌋
    val xs = (1 to 5000).map(i => math.exp((i * 613 % 5000) / 500.0))
    val sorted = xs.sorted
    val big = xs.foldLeft(agg.zero)(agg.reduce)
    for (q <- Seq(0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 0.999, 1.0)) {
      val truth = sorted(((q * (xs.size - 1)).toLong).toInt)
      val est = DDSketch.quantile(big, q, 0.02)
      // + 1 ULP-ish slack: a value EXACTLY on a bucket edge (x = 1.0,
      // index 0) realizes the bound with equality in double arithmetic
      assert(math.abs(est - truth) <= 0.02 * truth + 1e-12,
        s"q=$q est=$est truth=$truth")
    }
  }

  test("giniExact: equality -> 0, all-in-one -> (n-1)/n, hand value, tie-proof") {
    def gini(xs: Seq[Long]) = Profile.giniExact(
      xs.map(Tuple1(_)).toDF("v"), "v").head().getDouble(2)
    assert(gini(Seq(7L, 7L, 7L, 7L)) === 0.0)
    // one holder of everything: G = (n-1)/n
    assert(gini(Seq(0L, 0L, 0L, 100L)) === 0.75)
    // hand case {1,2,3,4}: sum r*x = 1+4+9+16 = 30; G = 60/(4*10) - 5/4 = 0.25
    assert(gini(Seq(1L, 2L, 3L, 4L)) === 0.25)
    // ties across partitions: same value everywhere in any order
    val big = (1 to 1000).map(i => (i * 37 % 10).toLong)
    val a = Profile.giniExact(big.map(Tuple1(_)).toDF("v"), "v").head().getDouble(2)
    val b = Profile.giniExact(big.reverse.map(Tuple1(_)).toDF("v").repartition(13), "v")
      .head().getDouble(2)
    assert(a === b)
  }

  test("lorenzCurve: equality is the diagonal; concentration bends it") {
    // 20 equal values in 4 tiles: every share 0.25, cum = diagonal
    val eq = (1L to 20L).map(i => (i, 10L)).toDF("id", "v")
    val e = Profile.lorenzCurve(eq, "v", "id", buckets = 4).collect()
    assert(e.map(_.getDouble(3)).toSeq === Seq(0.25, 0.25, 0.25, 0.25))
    assert(e.map(_.getDouble(4)).toSeq === Seq(0.25, 0.5, 0.75, 1.0))
    // one whale: last tile holds everything
    val skew = ((1L to 19L).map(i => (i, 0L)) :+ (20L, 100L)).toDF("id", "v")
    val s = Profile.lorenzCurve(skew, "v", "id", buckets = 4).collect()
    assert(s.map(_.getDouble(4)).toSeq === Seq(0.0, 0.0, 0.0, 1.0))
    // tile assignment rides the prefix-sum skeleton, never a global ntile
    val plan = Profile.lorenzCurve(eq, "v", "id", buckets = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ntile"), s"global ntile leaked into lorenzCurve:\n$plan")
  }

  test("concentration: uniform -> effective n == k, monopoly -> hhi 1") {
    val uniform = (1 to 40).map(i => ("s" + (i % 4), "x")).toDF("src", "y")
    val u = Profile.concentration(uniform, Seq("src")).head()
    assert(u.getLong(1) === 4L)
    assert(u.getDouble(2) === 0.25 && u.getDouble(3) === 4.0)
    val mono = (1 to 40).map(_ => ("only", "x")).toDF("src", "y")
    val m = Profile.concentration(mono, Seq("src")).head()
    assert(m.getDouble(2) === 1.0 && m.getDouble(3) === 1.0)
  }

  test("cramersV: perfect association scores 1, independence 0, degenerate null") {
    // x determines y exactly -> V = 1 (2x2, 10 rows per diagonal cell)
    val perfect = ((1 to 10).map(_ => ("a", "p")) ++ (1 to 10).map(_ => ("b", "q")))
      .toDF("x", "y")
    val p = Profile.cramersV(perfect, "x", "y").head()
    assert(p.getAs[Double]("cramers_v") === 1.0)
    assert(p.getAs[Double]("chi2") === 20.0)
    // perfectly balanced independent table -> chi2 = 0, V = 0
    val indep = (for { a <- Seq("a", "b"); b <- Seq("p", "q"); _ <- 1 to 5 }
      yield (a, b)).toDF("x", "y")
    assert(Profile.cramersV(indep, "x", "y").head()
      .getAs[Double]("cramers_v") === 0.0)
    // one-category column: no association is definable -> null
    val degen = Seq(("a", "p"), ("a", "q")).toDF("x", "y")
    assert(Profile.cramersV(degen, "x", "y").head().isNullAt(4))
  }

  test("aucExact: hand value with ties, flip symmetry, monotone invariance") {
    val df = Seq((1.0, 0L), (2.0, 0L), (2.0, 1L), (3.0, 1L)).toDF("sc", "y")
    def auc(d: org.apache.spark.sql.DataFrame) =
      Profile.aucExact(d, "sc", "y").head()
    // pairs: (2,1)=win, (2,2)=tie half, (3,1)=win, (3,2)=win -> 3.5/4
    val r = auc(df)
    assert(r.getLong(0) === 2L && r.getLong(1) === 2L)
    assert(r.getDouble(2) === 0.875)
    // label flip: AUC' = 1 - AUC (ties stay half either way)
    val flipped = df.select(col("sc"), (lit(1L) - col("y")).as("y"))
    assert(auc(flipped).getDouble(2) === 0.125)
    // monotone score transform changes nothing
    val mono = df.select((col("sc") * 10 + 7).as("sc"), col("y"))
    assert(auc(mono).getDouble(2) === 0.875)
    // perfect separation and degenerate labels
    val perfect = Seq((1.0, 0L), (2.0, 0L), (5.0, 1L)).toDF("sc", "y")
    assert(auc(perfect).getDouble(2) === 1.0)
    val onlyPos = Seq((1.0, 1L), (2.0, 1L)).toDF("sc", "y")
    assert(auc(onlyPos).isNullAt(2))
    // partitioning invariance (the prefix-sum skeleton, not luck)
    val big = (1 to 2000).map(i => ((i * 7 % 97).toDouble, (i % 3 == 0).compareTo(false).toLong))
    val a1 = Profile.aucExact(big.toDF("sc", "y"), "sc", "y").head().getDouble(2)
    val a2 = Profile.aucExact(big.toDF("sc", "y").repartition(13), "sc", "y").head().getDouble(2)
    assert(a1 === a2)
  }

  test("ksDrift: hand values, identical samples -> 0, disjoint -> 1") {
    def ks(rows: Seq[(String, Double)]) =
      Profile.ksDrift(rows.toDF("g", "v"), "g", "v", "a", "b").head()
    // a = {1,2}, b = {2,3}: ECDFs F_a = .5 at 1, 1 at 2; F_b = .5 at 2
    // -> sup gap .5 (at v=1 or v=2)
    val r = ks(Seq("a" -> 1.0, "a" -> 2.0, "b" -> 2.0, "b" -> 3.0))
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) === ((2L, 2L, 0.5)))
    // identical samples: D = 0
    val same = Seq("a" -> 1.0, "a" -> 5.0, "b" -> 1.0, "b" -> 5.0)
    assert(ks(same).getDouble(2) === 0.0)
    // disjoint supports: D = 1
    val disj = Seq("a" -> 1.0, "a" -> 2.0, "b" -> 9.0, "b" -> 10.0)
    assert(ks(disj).getDouble(2) === 1.0)
    // unequal sizes, hand-checked: a={1,1,4}, b={2}: F_a(1)=2/3 vs
    // F_b(1)=0 -> gap 2/3; F_a(2)=2/3 vs 1 -> 1/3 -> D = 2/3
    val r2 = ks(Seq("a" -> 1.0, "a" -> 1.0, "a" -> 4.0, "b" -> 2.0))
    assert(r2.getDouble(2) === BigDecimal(2.0 / 3.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // partitioning invariance
    val big = (1 to 3000).map(i => (if (i % 2 == 0) "a" else "b", (i * 11 % 211).toDouble))
    val k1 = Profile.ksDrift(big.toDF("g", "v"), "g", "v", "a", "b").head().getDouble(2)
    val k2 = Profile.ksDrift(big.toDF("g", "v").repartition(17), "g", "v", "a", "b")
      .head().getDouble(2)
    assert(k1 === k2)
  }

  test("ddSketchShards: parquet round-trip + merge == one-pass sketch, exactly") {
    import graft.expressions.{DDBuf, DDSketch, DDSketchAggregator}
    val vals = (1 to 3000).map(i => ("s" + (i % 7), math.exp((i * 13 % 600) / 60.0)))
    val df = vals.toDF("shard", "v")
    val dir = java.nio.file.Files.createTempDirectory("ddshards").toString
    Profile.ddSketchShards(df, "shard", "v").write.mode("overwrite").parquet(dir)
    val probe = Profile.ddMergeShards(spark.read.parquet(dir))
      .collect().map(r => r.getDouble(0) -> r.getDouble(2)).toMap
    // one-pass sketch over the SAME values — must agree exactly:
    // commutative merges mean shard boundaries are invisible
    val agg = new DDSketchAggregator[Double](Double.box, 0.01)
    val whole = vals.map(_._2).foldLeft(agg.zero)(agg.reduce)
    for (q <- Seq(0.5, 0.9, 0.99))
      assert(probe(q) === DDSketch.quantile(whole, q, 0.01))
  }

  test("DDSketch collapse caps the buckets and keeps the upper quantiles") {
    import graft.expressions.{DDSketch, DDSketchAggregator}
    val agg = new DDSketchAggregator[Double](Double.box, 0.01, maxBuckets = 32)
    // 3 decades of range: far more than 32 natural buckets at 1%
    val xs = (1 to 2000).map(i => i.toDouble)
    // the RAW fold stays uncollapsed (addition-only reduce);
    // the cap applies to the finished view
    val buf = agg.finish(xs.foldLeft(agg.zero)(agg.reduce))
    assert(buf.pos.size <= 32)
    // upper quantiles keep the guarantee (collapse eats the LOW tail)
    val p99 = DDSketch.quantile(buf, 0.99, 0.01)
    val exact = 1981.0 // 0.99*(2000-1) = 1979.01 -> lower rank 1979 -> value 1980? see below
    assert(math.abs(p99 - 1980.0) / 1980.0 <= 0.011 ||
      math.abs(p99 - exact) / exact <= 0.011)
  }

  test("ddBucketCounts: signs split, zeros exact, buckets match the index formula") {
    val df = Seq(-100L, 0L, 0L, 1L, 1L, 50L, 50L, 50L).toDF("v")
    val out = Profile.ddBucketCounts(df, "v", alpha = 0.01).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val gamma = (1 + 0.01) / (1 - 0.01)
    def idx(x: Double) = math.ceil(math.log(x) / math.log(gamma)).toLong
    assert(out === Map(
      (-1L, idx(100.0)) -> 1L,  // negative magnitude bucket
      (0L, 0L) -> 2L,           // exact zero count
      (1L, 0L) -> 2L,           // ln(1)=0 -> bucket 0, the one exact boundary
      (1L, idx(50.0)) -> 3L))
    // counts conserve the input multiset
    assert(out.values.sum === 8L)
  }

  test("DDSketch merge is associative even past maxBuckets (collapse only in finish)") {
    import graft.expressions.{DDSketch, DDSketchAggregator}
    val agg = new DDSketchAggregator[Double](Double.box, 0.01, maxBuckets = 16)
    def build(xs: Seq[Double]) = xs.foldLeft(agg.zero)(agg.reduce)
    // three shards far apart in magnitude: an in-flight collapse floor
    // would depend on which pair merged first
    val a = build((1 to 200).map(i => i * 1e-6))
    val b = build((1 to 200).map(i => i.toDouble))
    val c = build((1 to 200).map(i => i * 1e6))
    val left = agg.merge(agg.merge(a, b), c)
    val right = agg.merge(a, agg.merge(b, c))
    assert(left === right)                            // exact, not approximate
    assert(agg.finish(left) === agg.finish(right))    // and so is the capped view
    assert(agg.finish(left).pos.size <= 16)
    // the finished view equals finishing a one-shot build of everything
    val whole = build((1 to 200).flatMap(i => Seq(i * 1e-6, i.toDouble, i * 1e6)))
    assert(agg.finish(whole) === agg.finish(left))
  }
}
