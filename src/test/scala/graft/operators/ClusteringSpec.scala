package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class ClusteringSpec extends SparkSuite {
  import spark.implicits._

  // two tight clusters around (0,0) and (10,10), ids interleaved so
  // the seeds (lowest 2 ids) land one in each cluster
  private val pts = Seq(
    (0L, Array(0.0f, 0.1f)),
    (1L, Array(10.0f, 9.9f)),
    (2L, Array(0.1f, -0.1f)),
    (3L, Array(9.9f, 10.1f)),
    (4L, Array(-0.1f, 0.0f)),
    (5L, Array(10.1f, 10.0f)))
    .toDF("vec_id", "embedding")

  test("kmeans separates two obvious clusters from deterministic seeds") {
    val out = Clustering.kmeans(pts, k = 2, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out(0L) === out(2L) && out(2L) === out(4L))
    assert(out(1L) === out(3L) && out(3L) === out(5L))
    assert(out(0L) !== out(1L))
  }

  test("assignment is identical under any input partitioning") {
    val base = Clustering.kmeans(pts, k = 2, iters = 2).collect().toSeq
    val repart = Clustering.kmeans(pts.repartition(7), k = 2, iters = 2)
      .collect().toSeq
    assert(base === repart)
  }

  test("WCSS is non-increasing across Lloyd iterations on real embeddings") {
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    def wcss(iters: Int): Double =
      Clustering.kmeans(emb, k = 8, iters = iters)
        .agg(sum(col("dist2"))).head().getDouble(0)
    val w = (1 to 4).map(wcss)
    w.sliding(2).foreach { case Seq(a, b) =>
      // micro-rounded centroid updates can nudge the exact Lloyd bound
      // by at most the quantization step; allow that epsilon
      assert(b <= a + 1e-3, s"WCSS increased across an iteration: $w")
    }
    // and training actually helps: 4 iterations beat the seed assignment
    assert(w.last < w.head)
  }

  test("semanticDedup agrees with a brute-force within-cell one-hop rule") {
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val tau = 0.35
    val out = Clustering.semanticDedup(emb, k = 8, threshold = tau)
    // row-preserving: one row per vector, keep flag not a filter
    assert(out.count() === emb.count())
    // brute-force reference: recompute cells, then per-cell all-pairs
    val cells = Clustering.kmeans(emb, k = 8, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val expectDrop = vecs.keySet.filter { id =>
      vecs.keySet.exists(o => o < id && cells(o) == cells(id) &&
        cos(vecs(o), vecs(id)) >= tau)
    }
    val gotDrop = out.where(!col("keep")).collect().map(_.getLong(0)).toSet
    assert(gotDrop === expectDrop)
    assert(gotDrop.nonEmpty, "threshold should drop something on real data")
  }

  test("semanticDedup maxCell cap: oversized cells contribute no drops") {
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    // cap below every cell size -> no pairs anywhere -> everything kept
    val capped = Clustering.semanticDedup(emb, k = 8, threshold = 0.35, maxCell = 1)
    assert(capped.where(!col("keep")).count() === 0L)
    // and a cap above every cell size is a no-op vs the explicit
    // uncapped opt-in (maxCell = 0)
    val loose = Clustering.semanticDedup(emb, k = 8, threshold = 0.35,
      maxCell = emb.count().toInt)
    val uncapped = Clustering.semanticDedup(emb, k = 8, threshold = 0.35,
      maxCell = 0)
    assert(loose.collect().toSeq === uncapped.collect().toSeq)
    // the DEFAULT is the deployment form: finite cap, uncapped only by
    // explicit opt-in (the ×100 probe measured uncapped at 52×/decade)
    val default = Clustering.semanticDedup(emb, k = 8, threshold = 0.35)
    assert(default.collect().toSeq === uncapped.collect().toSeq,
      "at toy scale (every cell under the default cap) default == uncapped")
  }

  test("semanticDedupAuto: k tracks the corpus, result == manual k at that value") {
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val n = emb.count() // 100 at sf0.001
    // targetCell 13 -> k = ceil(100/13) = 8, cap defaults to 4*13 = 52
    val auto = Clustering.semanticDedupAuto(emb, targetCell = 13, threshold = 0.35)
    val manual = Clustering.semanticDedup(emb, k = ((n + 12) / 13).toInt,
      threshold = 0.35, maxCell = 52)
    assert(auto.collect().toSeq === manual.collect().toSeq)
    // a corpus 4x the size under the same targetCell gets 4x the cells
    val emb4 = (0 until 4).map(i => emb.withColumn("vec_id",
      col("vec_id") + lit(i.toLong * 1000000L))).reduce(_ unionByName _)
    // k = ceil(400/13) = 31; Lloyd may leave a few seeds empty, but the
    // occupied-cell count must clearly outgrow the 100-vector corpus's 8
    val cells4 = Clustering.semanticDedupAuto(emb4, targetCell = 13,
      threshold = 0.35).select("cell").distinct().count()
    assert(cells4 > 8 && cells4 <= ((4 * n + 12) / 13),
      s"k should scale with n, got $cells4 occupied cells")
  }

  test("assignCells: the large-k norm-trick argmin agrees with the exact spelling") {
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val cents = Clustering.seedCentroids(emb, 40)
    def cells(kHint: Int) = Clustering.assignCells(emb, cents, kHint = kHint)
      .select("vec_id", "cell").collect().map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq
    // argmin_c ||c||^2 - 2 v.c (codegen path) picks the same cell as the
    // exact left-fold dist2 on real data (a flip needs an exact
    // floating-point near-tie); the emitted dist2 is the exact spelling
    // in both paths
    assert(cells(40) === cells(0))
    val d = Clustering.assignCells(emb, cents, kHint = 40)
      .select("vec_id", "dist2").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val dExact = Clustering.assignCells(emb, cents)
      .select("vec_id", "dist2").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(d === dExact)
  }

  test("twoLevelAssign degenerate laws: either level at k=1 collapses to flat kmeans") {
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    def flat(k: Int) = Clustering.kmeans(emb, k = k, iters = 2)
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).sorted.toSeq
    def twoLevel(k1: Int, k2: Int) = Clustering.twoLevelAssign(emb, k1, k2)
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sorted.toSeq
    // k2 = 1: every fine cell is 0, so cell == cell1 == flat kmeans(k1)
    assert(twoLevel(6, 1) === flat(6))
    // k1 = 1: one coarse cell holds the corpus, so the fine level IS a
    // flat Lloyd over all vectors — cell == flat kmeans(k2)
    assert(twoLevel(1, 6) === flat(6))
  }

  test("twoLevelAssign is identical under any input partitioning") {
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    def run(df: org.apache.spark.sql.DataFrame) =
      Clustering.twoLevelAssign(df, k1 = 4, k2 = 4)
        .select("vec_id", "cell1", "fine", "cell", "dist2").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getDouble(4)))
        .sorted.toSeq
    assert(run(emb) === run(emb.repartition(13)))
  }

  test("semanticDedupTwoLevel agrees with brute force over the two-level cells") {
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val tau = 0.35
    val out = Clustering.semanticDedupTwoLevel(emb, k1 = 4, k2 = 4,
      threshold = tau, maxCell = 0)
    assert(out.count() === emb.count())
    val cells = Clustering.twoLevelAssign(emb, k1 = 4, k2 = 4)
      .select("vec_id", "cell").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val expectDrop = vecs.keySet.filter { id =>
      vecs.keySet.exists(o => o < id && cells(o) == cells(id) &&
        cos(vecs(o), vecs(id)) >= tau)
    }
    val gotDrop = out.where(!col("keep")).collect().map(_.getLong(0)).toSet
    assert(gotDrop === expectDrop)
    assert(gotDrop.nonEmpty, "threshold should drop something on real data")
  }

  test("ivfIndexExact: same probe contract as ivfIndex, reproducible bit-exactly") {
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val (assigned, centers) = Clustering.ivfIndexExact(emb, nCells = 8, iters = 2)
    val (assigned2, centers2) = Clustering.ivfIndexExact(
      emb.repartition(13), nCells = 8, iters = 2)
    // bit-exact reproducibility across runs and partitionings
    assert(centers.map(_.toSeq).toSeq === centers2.map(_.toSeq).toSeq)
    assert(assigned.select("vec_id", "__cell").collect().map(r => (r.getLong(0), r.getInt(1))).sorted
      === assigned2.select("vec_id", "__cell").collect().map(r => (r.getLong(0), r.getInt(1))).sorted)
    // probing recovers most of the brute-force top-10 (ANN recall)
    val q = Similarity.vectorOf(emb, 7L)
    val exact = Similarity.topK(emb, q, 10).collect().map(_.getLong(0)).toSet
    val probed = Similarity.ivfTopK(assigned, centers, q, 10, nprobe = 4)
      .collect().map(_.getLong(0)).toSet
    assert(exact.intersect(probed).size >= 6,
      s"IVF(nprobe=4 of 8) recall too low: ${exact.intersect(probed)}")
  }

  test("twoLevelIndex/topK: reproducible codebooks, ANN recall, query self-hit") {
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val (idx, cbs) = Clustering.twoLevelIndex(emb, k1 = 4, k2 = 4)
    // bit-exact reproducibility across partitionings (the property
    // Spark-ML-trained ivfIndex can't give)
    val (_, cbs2) = Clustering.twoLevelIndex(emb.repartition(13), k1 = 4, k2 = 4)
    assert(cbs.map { case (c, v) => (c, v.toSeq) }.toSeq ===
      cbs2.map { case (c, v) => (c, v.toSeq) }.toSeq)
    // probing recovers most of the brute-force top-10 (ANN recall) at
    // the same 50% scan fraction the ivfIndexExact test uses (8 of 16
    // cells — these embeddings are unnormalized, so the L2 cell
    // ranking only approximates the cosine target; callers wanting
    // tight cosine recall should L2-normalize, as with any IVF), and
    // always finds the query's own vector
    val q = Similarity.vectorOf(emb, 7L)
    val exact = Similarity.topK(emb, q, 10).collect().map(_.getLong(0)).toSet
    val probed = Clustering.twoLevelTopK(idx, cbs, q, 10, nprobe = 8)
      .collect().map(_.getLong(0)).toSet
    assert(probed.contains(7L), "probe lost the query vector itself")
    assert(exact.intersect(probed).size >= 6,
      s"two-level(nprobe=8 of 16) recall too low: ${exact.intersect(probed)}")
  }

  test("twoLevelWriteIndex/OpenIndex: disk round-trip == in-memory; probe is bucket-pruned") {
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val (idx, cbs) = Clustering.twoLevelIndex(emb, k1 = 4, k2 = 4)
    val root = java.nio.file.Files.createTempDirectory("graft_tl_idx_spec").toString
    val table = "tl_idx_spec_" + java.lang.Long.toHexString(System.nanoTime())
    Clustering.twoLevelWriteIndex(idx, cbs, table, root, nBuckets = 16)
    // drop the catalog entry so openIndex exercises the fresh-session
    // re-registration path (external CREATE TABLE over existing files)
    spark.sql(s"DROP TABLE $table")
    val (idx2, cbs2) = Clustering.twoLevelOpenIndex(spark, table, root, nBuckets = 16)
    assert(cbs2.map { case (c, v) => (c, v.toSeq) }.toSeq ===
      cbs.map { case (c, v) => (c, v.toSeq) }.toSeq,
      "codebooks changed across the parquet round-trip")
    val q = Similarity.vectorOf(emb, 7L)
    val mem = Clustering.twoLevelTopK(idx, cbs, q, 10, nprobe = 4).collect().toSeq
    val disk = Clustering.twoLevelTopK(idx2, cbs2, q, 10, nprobe = 4)
    // THE plan gate the persisted row exists for: the probe must read
    // only the buckets its nprobe cells hash to — never the full index
    val plan = disk.queryExecution.executedPlan.toString
    val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(plan)
    assert(sel.isDefined, s"probe scan is not bucket-pruned:\n$plan")
    assert(sel.get.group(2).toInt === 16 && sel.get.group(1).toInt <= 4,
      s"probe read ${sel.get.group(1)} of ${sel.get.group(2)} buckets — expected <= nprobe (4)")
    assert(disk.collect().toSeq === mem,
      "bucketed on-disk probe diverged from the in-memory probe")
    spark.sql(s"DROP TABLE $table")
  }

  test("twoLevelTopKMulti == Q sequential probes, through ONE bucket-pruned scan") {
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val (idx, cbs) = Clustering.twoLevelIndex(emb, k1 = 4, k2 = 4)
    val root = java.nio.file.Files.createTempDirectory("graft_tl_multi_spec").toString
    val table = "tl_multi_spec_" + java.lang.Long.toHexString(System.nanoTime())
    Clustering.twoLevelWriteIndex(idx, cbs, table, root, nBuckets = 16)
    val (disk, cbs2) = Clustering.twoLevelOpenIndex(spark, table, root, nBuckets = 16)
    val qids = Seq(1L, 7L, 13L)
    val qvecs = qids.map(id => id -> Similarity.vectorOf(emb, id))
    val multi = Clustering.twoLevelTopKMulti(disk, cbs2, qvecs, k = 10, nprobe = 4)
    // equivalence: each query's slice == its sequential twoLevelTopK
    val got = multi.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val want = qvecs.flatMap { case (qid, qv) =>
      Clustering.twoLevelTopK(disk, cbs2, qv, k = 10, nprobe = 4).collect()
        .map(r => (qid, r.getLong(0), r.getDouble(1)))
    }
    assert(got === want, "batched probe diverged from sequential probes")
    // THE plan gate the batched form exists for: ONE scan of the index
    // (never Q), and that scan bucket-pruned to the UNION of the
    // per-query nprobe cell sets. AQE's toString repeats the tree under
    // "== Initial Plan ==" — gate the FINAL plan section only.
    val plan = multi.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val scans = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findAllMatchIn(plan).toSeq
    assert(scans.size === 1,
      s"expected exactly ONE bucket-pruned index scan, found ${scans.size}:\n$plan")
    assert(scans.head.group(2).toInt === 16 &&
      scans.head.group(1).toInt <= 3 * 4,
      s"probe read ${scans.head.group(1)} of 16 buckets — expected <= Q*nprobe (12)")
    spark.sql(s"DROP TABLE $table")
  }

  test("twoLevelAppend: no retrain, probes stay bucket-pruned and find appended rows") {
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val base = emb.where(col("vec_id") % 2 === 0)
    val delta = emb.where(col("vec_id") % 2 === 1)
    val root = java.nio.file.Files.createTempDirectory("graft_tl_append_spec").toString
    val table = "tl_append_spec_" + java.lang.Long.toHexString(System.nanoTime())
    val (idx, cbs) = Clustering.twoLevelIndex(base, k1 = 4, k2 = 4)
    Clustering.twoLevelWriteIndex(idx, cbs, table, root, nBuckets = 16)
    val cbsBefore = Clustering.twoLevelOpenIndex(spark, table, root, 16)._2
    Clustering.twoLevelAppend(spark, table, root, nBuckets = 16, delta)
    val (disk, cbs2) = Clustering.twoLevelOpenIndex(spark, table, root, nBuckets = 16)
    // every base AND appended row is in the table; codebooks FROZEN
    assert(disk.count() === emb.count())
    assert(cbs2.map { case (c, v) => (c, v.toSeq) }.toSeq ===
      cbsBefore.map { case (c, v) => (c, v.toSeq) }.toSeq,
      "append must not touch the trained codebooks")
    // probe for an APPENDED vector: its frozen-assign cell is the
    // argmin combined centroid — the same metric the probe ranks cells
    // by — so rank-1 always scans it and the self-hit must appear
    val q = Similarity.vectorOf(emb, 7L)
    val res = Clustering.twoLevelTopK(disk, cbs2, q, 10, nprobe = 4)
    val plan = res.queryExecution.executedPlan.toString
    val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(plan)
    assert(sel.isDefined && sel.get.group(1).toInt <= 4,
      s"post-append probe lost bucket pruning:\n$plan")
    assert(res.collect().map(_.getLong(0)).contains(7L),
      "probe lost an appended vector")
    spark.sql(s"DROP TABLE $table")
  }

  test("twoLevelDrift anchors: same-distribution append ~1x (no retrain), 3x-scaled ~9x (retrain)") {
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val base = emb.where(col("vec_id") % 2 === 0)
    val delta = emb.where(col("vec_id") % 2 === 1)
    val (idx, cbs) = Clustering.twoLevelIndex(base, k1 = 4, k2 = 4)
    val idxPinned = idx.localCheckpoint()
    def pooledRatio(drift: org.apache.spark.sql.DataFrame): Double = {
      // mirrors twoLevelRetrainNeeded's pooling: each side null-skips
      // independently over the FULL-join report
      val r = drift
        .agg((sum(col("new_mean_d2") * col("n_new")) / sum(col("n_new"))) /
          (sum(col("base_mean_d2") * col("n_base")) / sum(col("n_base"))))
        .head()
      r.getDouble(0)
    }
    // same-distribution batch: quantization error matches the build
    // baseline (measured anchor: ratio ~= 1 on the real sf0.001 halves)
    val same = Clustering.twoLevelDrift(idxPinned,
      Clustering.twoLevelAssignFrozen(delta, cbs))
    val rSame = pooledRatio(same)
    assert(rSame > 0.5 && rSame < 1.5, s"same-distribution ratio drifted: $rSame")
    assert(!Clustering.twoLevelRetrainNeeded(same),
      s"rule fired on a same-distribution append (ratio $rSame)")
    // distribution shift: 3x-scaled vectors against the unscaled
    // codebook — dist2 is squared, so the ratio lands near 9x
    val shifted = delta.withColumn("embedding",
      transform(col("embedding"), x => x * lit(3.0f)))
    val shift = Clustering.twoLevelDrift(idxPinned,
      Clustering.twoLevelAssignFrozen(shifted, cbs))
    val rShift = pooledRatio(shift)
    assert(rShift > 4.0, s"shifted-batch ratio too small to anchor the rule: $rShift")
    assert(Clustering.twoLevelRetrainNeeded(shift),
      s"rule missed a distribution shift (ratio $rShift)")
    // the tolerance sits between the two measured anchors with margin
    assert(rSame < Clustering.TwoLevelDriftTolerance * 0.75 &&
      rShift > Clustering.TwoLevelDriftTolerance * 2,
      s"anchors too close to the tolerance: $rSame / $rShift vs ${Clustering.TwoLevelDriftTolerance}")
  }

  test("pqTrainEncode emits m codes per vector in [0, k), stable under partitioning") {
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val (codes, cbs) = Clustering.pqTrainEncode(emb, m = 4, k = 8, iters = 2, dim = 64)
    val n = emb.count()
    val rows = codes.collect()
    assert(rows.length === 4 * n)
    assert(rows.forall { r =>
      val c = r.getInt(2); c >= 0 && c < 8 && r.getInt(1) >= 0 && r.getInt(1) < 4
    })
    // codebooks: one cvec of dim/m doubles per (subspace, cell)
    val cb = cbs.collect()
    assert(cb.forall(_.getSeq[Double](2).size === 16))
    // repartitioning must not change a single code (micro-sum discipline)
    val (codes2, _) = Clustering.pqTrainEncode(
      emb.repartition(13), m = 4, k = 8, iters = 2, dim = 64)
    assert(codes.select("vec_id", "subspace", "code").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sorted.toSeq ===
      codes2.select("vec_id", "subspace", "code").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sorted.toSeq)
  }

  test("semanticDedupTwoLevelAuto: sides track sqrt(n/targetCell), result == manual") {
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val n = emb.count()
    // targetCell 40 -> k = ceil(n/40), side = ceil(sqrt(k)), cap 4*40
    val k = (n + 39) / 40
    val side = math.ceil(math.sqrt(k.toDouble)).toInt
    val auto = Clustering.semanticDedupTwoLevelAuto(emb, targetCell = 40,
      threshold = 0.35)
    val manual = Clustering.semanticDedupTwoLevel(emb, side, side,
      threshold = 0.35, maxCell = 160)
    assert(auto.collect().toSeq === manual.collect().toSeq)
  }

  test("the registered auto row's derived sides stay on the exact-argmin side of the bound") {
    // q_semantic_twolevel_auto (targetCell=25) is oracled with the
    // EXACT left-fold argmin spelling; its derivation must therefore
    // stay at side <= ExactArgminMaxK at both gate scales, or the
    // Scala side would silently switch to the norm-trick branch while
    // the DuckDB side keeps folding — certification by construction
    // would become certification by near-tie luck. 500 embeddings at
    // sf0.001/sf0.01 and 2000 at sf0.1 are the driver's testdata
    // contract (TESTDATA.md).
    // asserts against the wrapper's OWN derivation (Clustering.autoSide),
    // not a local re-spelling that could silently diverge from it
    def side(n: Long) = Clustering.autoSide(n, targetCell = 25)
    assert(side(500) === 5)
    assert(side(2000) === 9)
    assert(side(2000) <= Clustering.ExactArgminMaxK,
      "q_semantic_twolevel_auto's sf0.1 derivation crossed the norm-trick " +
        "bound — re-oracle the row with the wide spelling or lower targetCell")
    // EVERY registry k whose oracle replays the EXACT left-fold argmin
    // (lloydCtes / twoLevelCtes / pqTrainCtes) must sit at or under the
    // bound, or the Scala side silently switches to the norm-trick
    // branch while the DuckDB side keeps folding — certification by
    // construction degrades to near-tie luck (the round-12 q_pq_recall
    // lesson: its k=16 config crossed the bound and had to be
    // re-oracled with pqWideCtes). Update this list when registering a
    // new exact-oracled row or re-oracling one wide.
    val exactOracledKs = Map(
      "q_kmeans/q_semantic_dedup/q_semantic_capped/q_drop_audit (lloydCtes)" -> 8,
      "q_two_level_* coarse+fine (twoLevelCtes(4,4))" -> 4,
      "q_two_level_cells_wide coarse level (twoLevelWideCtes(2,40))" -> 2,
      "q_pq_encode/q_pq_adc/q_pq_persisted (pqTrainCtes(4,8))" -> 8,
      "q_pq_append train + frozen encode (pqTrainCtes(4,8,src) + exact argmin)" -> 8,
      "q_semantic_twolevel_auto sf0.1 side (lloydCtesE auto)" -> side(2000))
    exactOracledKs.foreach { case (row, k) =>
      assert(k <= Clustering.ExactArgminMaxK,
        s"$row replays the exact argmin at k=$k > ExactArgminMaxK=" +
          s"${Clustering.ExactArgminMaxK} — the Scala side would take the " +
          "norm-trick branch; re-oracle wide or raise the bound")
    }
  }

  test("tlAssign: the large-k2 norm-trick argmin agrees with the exact spelling") {
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    // 2 coarse cells, a 40-entry fine codebook per cell (lowest-id
    // members), past the kHint threshold
    val coarse = Clustering.assignCells(emb,
        Clustering.seedCentroids(emb, 2, "vec_id", "embedding"),
        "vec_id", "embedding")
      .select(col("vec_id"), col("__v"), col("cell").as("cell1"))
      .localCheckpoint()
    val cbs = coarse.withColumn("cell",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("cell1")).orderBy(col("vec_id"))) - 1)
      .where(col("cell") < 40)
      .select(col("cell1"), col("cell"), col("__v").as("cvec"))
      .localCheckpoint()
    def fine(kHint: Int) =
      Clustering.tlAssign(coarse, cbs, "vec_id", broadcastCodebooks = true, kHint)
        .select("vec_id", "cell1", "fine", "dist2").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3))).sorted.toSeq
    assert(fine(40) === fine(0))
  }

  test("pqAssign: the large-k norm-trick argmin agrees with the exact spelling") {
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val slices = Clustering.pqSlices(emb, m = 4, dim = 64, "vec_id", "embedding")
    // a 40-codeword codebook per subspace: the 40 lowest-id vectors'
    // slices (seedCentroids' convention), past the kHint threshold
    val seedIds = emb.orderBy(col("vec_id")).limit(40)
      .select(col("vec_id"),
        (row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("vec_id"))) - 1).as("cell"))
    val cbs = slices.join(broadcast(seedIds), Seq("vec_id"))
      .select(col("subspace"), col("cell"), col("sv").as("cvec"))
    def codes(kHint: Int) = Clustering.pqAssign(slices, cbs, "vec_id", kHint)
      .select("vec_id", "subspace", "code", "dist2").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3))).sorted.toSeq
    // same codes AND the same exact-spelling dist2 from both paths
    assert(codes(40) === codes(0))
  }

  test("twoLevelDrift: a batch landing in base-EMPTY cells still reaches the trigger") {
    import spark.implicits._
    // the failure the full-outer join exists for: the final assignment
    // can leave a trained codebook cell with zero members, yet a frozen
    // assign can still route new vectors there — an out-of-distribution
    // batch lands in exactly those sparse cells, and a left join from
    // the base side would silently drop every such row
    val index = Seq((1L, 0L, 0.01), (2L, 0L, 0.03), (3L, 1L, 0.02))
      .toDF("vec_id", "cell", "dist2")
    // entire batch in cell 5 — which the base never populated — with
    // huge quantization error
    val appended = Seq((10L, 5L, 9.0), (11L, 5L, 11.0))
      .toDF("vec_id", "cell", "dist2")
    val drift = Clustering.twoLevelDrift(index, appended)
    val rows = drift.collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(0L, 1L, 5L),
      "base-empty cell 5 must appear in the report")
    val cell5 = rows.find(_.getLong(0) == 5L).get
    assert(cell5.isNullAt(1) && cell5.getLong(3) === 2L,
      "cell 5 carries the batch counts with NULL base columns")
    // the trigger pools each side independently, so the batch's 10.0
    // mean error vs the base's 0.02 baseline must fire
    assert(Clustering.twoLevelRetrainNeeded(drift),
      "an OOD batch concentrated in base-empty cells must trigger a retrain")
    // and an empty batch never does
    assert(!Clustering.twoLevelRetrainNeeded(
      Clustering.twoLevelDrift(index, appended.limit(0))))
  }

  test("pqAppend: frozen encode is the build encode; appended codes are ADC-searchable") {
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val base = emb.where(col("vec_id") % 2 === 0)
    val delta = emb.where(col("vec_id") % 2 === 1)
    val (codes, cbs) = Clustering.pqTrainEncode(base, m = 4, k = 8, iters = 2, dim = 64)
    // law: re-encoding the TRAINING vectors against the frozen final
    // codebooks reproduces the build-time codes exactly (the build's
    // last step IS this assignment)
    val reEnc = Clustering.pqEncodeFrozen(base, cbs, m = 4, k = 8, dim = 64)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id", "subspace", "code").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sorted.toSeq
    assert(key(reEnc) === key(codes))
    // disk round-trip + append: codes table grows by m rows per new
    // vector, codebooks untouched, ADC finds the appended query itself
    val root = java.nio.file.Files.createTempDirectory("graft_pq_append_spec").toString
    Clustering.pqWriteIndex(codes, cbs, root)
    Clustering.pqAppend(spark, root, delta, m = 4, k = 8, dim = 64)
    val (codes2, cbs2) = Clustering.pqReadIndex(spark, root)
    assert(codes2.count() === 4L * emb.count())
    assert(cbs2.collect().length === cbs.collect().length)
    val adcTop = Clustering.pqTopK(codes2, cbs2,
      Similarity.vectorOf(emb, 7L), m = 4, k = 25)
      .collect().map(_.getLong(0)).toSet
    assert(adcTop.contains(7L), "ADC lost the appended query vector")
  }

  test("compactPqIndex: threshold rule, file collapse, bit-identical ADC, codebooks/stats untouched") {
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val base = emb.where(col("vec_id") % 4 === 0)
    val (codes, cbs) = Clustering.pqTrainEncode(base, m = 4, k = 8, iters = 2, dim = 64)
    val root = java.nio.file.Files.createTempDirectory("graft_pq_compact_spec").toString
    Clustering.pqWriteIndex(codes, cbs, root)
    // three append batches fragment the codes dir — each lands its own
    // file(s); ADC pays every one of them per probe (no pruning tier)
    (1 to 3).foreach { r =>
      Clustering.pqAppend(spark, root,
        emb.where(col("vec_id") % 4 === r).coalesce(1), m = 4, k = 8, dim = 64)
    }
    val frag = Clustering.pqCodesFileCount(spark, root)
    assert(frag >= 4, s"appends must fragment the codes dir: $frag files")
    assert(Clustering.pqCompactionNeeded(spark, root, maxFiles = 3),
      "the threshold rule must fire on the fragmented dir")
    // probe results + row content before the rewrite
    val qv = Similarity.vectorOf(emb, 7L)
    def probe() = Clustering.pqTopK(
      spark.read.parquet(s"$root/codes"), spark.read.parquet(s"$root/codebooks"),
      qv, m = 4, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    def rows() =
      spark.read.parquet(s"$root/codes")
        .select("vec_id", "subspace", "code", "dist2").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._2)).toSeq
    val (probeBefore, rowsBefore) = (probe(), rows())
    val cbsBefore = spark.read.parquet(s"$root/codebooks").collect()
      .map(_.toString).sorted.toSeq
    val statsBefore = spark.read.parquet(s"$root/stats").collect()
      .map(_.toString).sorted.toSeq
    val (b, a) = Clustering.compactPqIndex(spark, root, targetFiles = 2)
    assert(b === frag && a === 2, s"rewrite must collapse $frag -> 2, got $b -> $a")
    assert(!Clustering.pqCompactionNeeded(spark, root, maxFiles = 3),
      "the rule must clear after the rewrite")
    // bit-identical: row content, probe answer, and the artifacts the
    // rewrite must never touch
    assert(rows() === rowsBefore, "compaction changed code row content")
    assert(probe() === probeBefore, "compaction changed an ADC answer")
    assert(spark.read.parquet(s"$root/codebooks").collect()
      .map(_.toString).sorted.toSeq === cbsBefore)
    assert(spark.read.parquet(s"$root/stats").collect()
      .map(_.toString).sorted.toSeq === statsBefore)
  }

  test("versioned retrain arc: trigger fires, v2 publishes, v1 serves untouched throughout") {
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val base = emb.where(col("vec_id") % 2 === 0)
    // 3x-scaled odd half: the out-of-distribution append (the measured
    // ~9x anchor) that must trip the trigger and justify the retrain
    val delta = emb.where(col("vec_id") % 2 === 1)
      .withColumn("embedding", transform(col("embedding"),
        x => (x.cast("double") * lit(3.0)).cast("float")))
    val root = java.nio.file.Files.createTempDirectory("graft_tl_retrain_spec").toString
    val pfx = "tl_retrain_spec_" + java.lang.Long.toHexString(System.nanoTime())
    val (idx, cbs) = Clustering.twoLevelIndex(base, k1 = 4, k2 = 4)
    assert(Clustering.twoLevelPublishVersion(spark, idx, cbs, pfx, root, 16) === 1L)
    val v1 = Clustering.twoLevelOpenVersion(spark, pfx, root, 16)
    assert(v1.version === 1L)
    val appended = Clustering.twoLevelAppend(spark, v1.table, v1.dir, 16, delta)
    val drift = Clustering.twoLevelDriftFromStats(
      Clustering.twoLevelReadStats(spark, v1.dir), appended)
    assert(Clustering.twoLevelRetrainNeeded(drift),
      "the scaled batch must trip the retrain trigger")
    // pin generation 1's serving state: probe answer + exact file
    // inventory of its index dir
    val qBase = Similarity.vectorOf(emb, 6L)
    val p1 = Clustering.twoLevelTopK(v1.index, v1.codebooks, qBase, 10, nprobe = 4)
      .collect().toSeq
    def inventory(dir: String): Seq[(String, Long)] = {
      val p = new org.apache.hadoop.fs.Path(s"$dir/index")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(p).toSeq.map(s => (s.getPath.getName, s.getLen)).sorted
    }
    val inv1 = inventory(v1.dir)
    // the retrain: rebuilds on the corpus read back from v1's own
    // table, publishes v2, flips the marker LAST
    assert(Clustering.twoLevelRetrain(spark, pfx, root, 16, k1 = 4, k2 = 4) === 2L)
    assert(graft.sources.Lake.latestVersion(spark, root) === Some(2L))
    // NEVER A TORN READ: generation 1's files are byte-identical after
    // the rebuild, and a pinned open reproduces the pre-retrain answer
    assert(inventory(v1.dir) === inv1, "retrain touched the serving generation's files")
    val v1again = Clustering.twoLevelOpenVersion(spark, pfx, root, 16, version = 1L)
    assert(Clustering.twoLevelTopK(v1again.index, v1again.codebooks, qBase, 10,
      nprobe = 4).collect().toSeq === p1,
      "pinned generation-1 probe diverged after the retrain")
    // generation 2: full corpus, RETRAINED codebooks, and the probe
    // finds the re-assigned scaled vector
    val v2 = Clustering.twoLevelOpenVersion(spark, pfx, root, 16)
    assert(v2.version === 2L)
    assert(v2.index.count() === emb.count())
    assert(v2.codebooks.map { case (c, v) => (c, v.toSeq) }.toSeq !==
      v1.codebooks.map { case (c, v) => (c, v.toSeq) }.toSeq,
      "retrain must produce fresh codebooks on the shifted corpus")
    val qScaled = Similarity.vectorOf(delta, 1L)
    val res = Clustering.twoLevelTopK(v2.index, v2.codebooks, qScaled, 10, nprobe = 4)
    val plan = res.queryExecution.executedPlan.toString
    val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(plan)
    assert(sel.isDefined && sel.get.group(1).toInt <= 4,
      s"generation-2 probe lost bucket pruning:\n$plan")
    assert(res.collect().map(_.getLong(0)).contains(1L),
      "generation-2 probe lost the re-assigned scaled vector")
    spark.sql(s"DROP TABLE IF EXISTS ${v1.table}")
    spark.sql(s"DROP TABLE IF EXISTS ${v2.table}")
  }

  test("compactTwoLevelIndex: telemetry sees fragmentation; rewrite is bit-identical and stays pruned") {
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val base = emb.where(col("vec_id") % 4 === 0)
    val root = java.nio.file.Files.createTempDirectory("graft_tl_compact_spec").toString
    val table = "tl_compact_spec_" + java.lang.Long.toHexString(System.nanoTime())
    val (idx, cbs) = Clustering.twoLevelIndex(base, k1 = 4, k2 = 4)
    Clustering.twoLevelWriteIndex(idx, cbs, table, root, nBuckets = 16)
    // three append batches -> O(batches) files per touched bucket
    (1 to 3).foreach(r => Clustering.twoLevelAppend(spark, table, root, 16,
      emb.where(col("vec_id") % 4 === r)))
    val statsBefore = Clustering.indexFileStats(spark, s"$root/index")
      .agg(sum(col("n_files")).cast("long"), max(col("n_files")).cast("long")).head()
    assert(statsBefore.getLong(1) >= 3,
      s"appends should fragment buckets, saw max ${statsBefore.getLong(1)} files/bucket")
    // the rule-as-code: fragmented at a tight threshold, clean after
    assert(Clustering.indexCompactionNeeded(spark, s"$root/index",
      maxFilesPerBucket = 2))
    val (disk, cbs2) = Clustering.twoLevelOpenIndex(spark, table, root, 16)
    val q = Similarity.vectorOf(emb, 7L)
    val before = Clustering.twoLevelTopK(disk, cbs2, q, 10, nprobe = 4)
      .collect().toSeq
    val fullBefore = disk.orderBy(col("vec_id")).collect().toSeq
    val (fb, fa) = Clustering.compactTwoLevelIndex(spark, table, root, 16)
    assert(fb.toLong === statsBefore.getLong(0) && fa < fb && fa <= 16,
      s"compaction should shrink $fb files to <= 16, got $fa")
    assert(!Clustering.indexCompactionNeeded(spark, s"$root/index",
      maxFilesPerBucket = 2))
    // bit-identical content AND probe answer; bucket pruning preserved
    val disk2 = spark.table(table)
    assert(disk2.orderBy(col("vec_id")).collect().toSeq === fullBefore,
      "compaction changed the table contents")
    val after = Clustering.twoLevelTopK(disk2, cbs2, q, 10, nprobe = 4)
    val plan = after.queryExecution.executedPlan.toString
    val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(plan)
    assert(sel.isDefined && sel.get.group(1).toInt <= 4,
      s"post-compaction probe lost bucket pruning:\n$plan")
    assert(after.collect().toSeq === before,
      "compaction changed the probe answer")
    spark.sql(s"DROP TABLE IF EXISTS $table")
  }

  test("pqTopKMulti == Q sequential pqTopK probes, through ONE scan of the codes") {
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val (codes, cbs) = Clustering.pqTrainEncode(emb, m = 4, k = 8, iters = 2, dim = 64)
    val root = java.nio.file.Files.createTempDirectory("graft_pq_multi_spec").toString
    Clustering.pqWriteIndex(codes, cbs, root)
    val (codes2, cbs2) = Clustering.pqReadIndex(spark, root)
    val qids = Seq(1L, 7L, 13L)
    val qvecs = qids.map(id => id -> Similarity.vectorOf(emb, id))
    val multi = Clustering.pqTopKMulti(codes2, cbs2, qvecs, m = 4, k = 10)
    val got = multi.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val want = qvecs.flatMap { case (qid, qv) =>
      Clustering.pqTopK(codes2, cbs2, qv, m = 4, k = 10)
        .orderBy(col("adc_dist2"), col("vec_id"))
        .select(col("vec_id"), round(col("adc_dist2"), 6).as("adc_dist2"))
        .collect().map(r => (qid, r.getLong(0), r.getDouble(1)))
    }
    assert(got === want, "batched ADC diverged from sequential probes")
    // THE plan gate: the codes table is scanned ONCE for all Q queries
    // (the codebook side is a second, m·k-row broadcast scan). AQE's
    // toString repeats the tree under "== Initial Plan ==" — gate the
    // FINAL plan section only (the twoLevelTopKMulti gate's convention).
    val plan = multi.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val scans = "(?m)^.*Scan parquet.*$".r.findAllIn(plan).toSeq
    assert(scans.count(_.contains("codes")) === 1,
      s"expected exactly ONE scan of the codes table:\n${scans.mkString("\n")}\n$plan")
  }

  test("pq drift anchors: same-distribution ~1x (no retrain), 3x-scaled trips pqRetrainNeeded") {
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val base = emb.where(col("vec_id") % 2 === 0)
    val delta = emb.where(col("vec_id") % 2 === 1)
    val (codes, cbs) = Clustering.pqTrainEncode(base, m = 4, k = 8, iters = 2, dim = 64)
    val root = java.nio.file.Files.createTempDirectory("graft_pq_drift_spec").toString
    Clustering.pqWriteIndex(codes, cbs, root)
    // the persisted baseline equals the in-line one (one artifact, one
    // arithmetic), and the drift report is identical through either
    val enc = Clustering.pqEncodeFrozen(delta, cbs, m = 4, k = 8, dim = 64)
      .localCheckpoint()
    val viaStats = Clustering.pqDriftFromStats(
      Clustering.pqReadStats(spark, root), enc).collect().toSeq
    assert(Clustering.pqDrift(codes, enc).collect().toSeq === viaStats)
    def pooledRatio(drift: org.apache.spark.sql.DataFrame): Double =
      drift.agg((sum(col("new_mean_d2") * col("n_new")) / sum(col("n_new"))) /
        (sum(col("base_mean_d2") * col("n_base")) / sum(col("n_base"))))
        .head().getDouble(0)
    val rSame = pooledRatio(Clustering.pqDriftFromStats(
      Clustering.pqReadStats(spark, root), enc))
    assert(rSame > 0.5 && rSame < 1.5, s"same-distribution PQ ratio drifted: $rSame")
    assert(!Clustering.pqRetrainNeeded(Clustering.pqDrift(codes, enc)),
      s"PQ rule fired on a same-distribution batch (ratio $rSame)")
    val shifted = delta.withColumn("embedding",
      transform(col("embedding"), x => x * lit(3.0f)))
    val enc2 = Clustering.pqEncodeFrozen(shifted, cbs, m = 4, k = 8, dim = 64)
      .localCheckpoint()
    val d2 = Clustering.pqDriftFromStats(Clustering.pqReadStats(spark, root), enc2)
    val rShift = pooledRatio(d2)
    assert(rShift > 4.0, s"shifted-batch PQ ratio too small to anchor the rule: $rShift")
    assert(Clustering.pqRetrainNeeded(d2),
      s"PQ rule missed a distribution shift (ratio $rShift)")
  }

  test("pq versioned retrain arc: trigger fires, v2 publishes, v1 serves untouched") {
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val base = emb.where(col("vec_id") % 2 === 0)
    val delta = emb.where(col("vec_id") % 2 === 1)
      .withColumn("embedding", transform(col("embedding"),
        x => (x.cast("double") * lit(3.0)).cast("float")))
    val root = java.nio.file.Files.createTempDirectory("graft_pq_retrain_spec").toString
    val (codes, cbs) = Clustering.pqTrainEncode(base, m = 4, k = 8, iters = 2, dim = 64)
    assert(Clustering.pqPublishVersion(spark, codes, cbs, root) === 1L)
    val v1 = Clustering.pqOpenVersion(spark, root)
    val encoded = Clustering.pqAppend(spark, v1.dir, delta, m = 4, k = 8, dim = 64)
    assert(Clustering.pqRetrainNeeded(Clustering.pqDriftFromStats(
      Clustering.pqReadStats(spark, v1.dir), encoded)),
      "the scaled batch must trip the PQ trigger")
    val q = Similarity.vectorOf(emb, 6L) // a base vector
    // re-open AFTER the append: a generation dir is append-only, so the
    // pinned-probe contract covers its POST-append content (the frame
    // opened pre-append carries that older file listing — comparing
    // against it would conflate append visibility with retrain safety)
    val v1Post = Clustering.pqOpenVersion(spark, root)
    val p1 = Clustering.pqTopK(v1Post.codes, v1Post.codebooks, q, m = 4, k = 10)
      .collect().map(_.getLong(0)).toSeq
    def inventory(dir: String): Seq[(String, Long)] = {
      val p = new org.apache.hadoop.fs.Path(s"$dir/codebooks")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(p).toSeq.map(s => (s.getPath.getName, s.getLen)).sorted
    }
    val inv1 = inventory(v1.dir)
    // the retrain trains on the caller's CURRENT corpus (codes are
    // lossy — the one structural difference from twoLevelRetrain)
    assert(Clustering.pqRetrain(spark, root,
      base.unionByName(delta), m = 4, k = 8, dim = 64) === 2L)
    assert(graft.sources.Lake.latestVersion(spark, root) === Some(2L))
    assert(inventory(v1.dir) === inv1,
      "retrain touched the serving generation's codebooks")
    val v1again = Clustering.pqOpenVersion(spark, root, version = 1L)
    assert(Clustering.pqTopK(v1again.codes, v1again.codebooks, q, m = 4, k = 10)
      .collect().map(_.getLong(0)).toSeq === p1,
      "pinned generation-1 ADC probe diverged after the retrain")
    val v2 = Clustering.pqOpenVersion(spark, root)
    assert(v2.version === 2L)
    assert(v2.codes.select("vec_id").distinct().count() === emb.count())
    def cbKey(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => ((r.getInt(0), r.getInt(1)),
        r.getSeq[Double](2).toSeq)).sortBy(_._1).toSeq
    assert(cbKey(v2.codebooks) !== cbKey(v1.codebooks),
      "retrain must produce fresh codebooks on the shifted corpus")
    val qScaled = Similarity.vectorOf(delta, 1L)
    assert(Clustering.pqTopK(v2.codes, v2.codebooks, qScaled, m = 4, k = 25)
      .collect().map(_.getLong(0)).contains(1L),
      "generation-2 ADC lost the re-encoded scaled vector")
  }

  test("pq reconstruction error shrinks with training; ADC finds the query's cluster") {
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    def sse(iters: Int): Double = {
      val (codes, _) = Clustering.pqTrainEncode(emb, m = 4, k = 8, iters = iters, dim = 64)
      codes.agg(sum(col("dist2"))).head().getDouble(0)
    }
    val s1 = sse(1); val s3 = sse(3)
    assert(s3 < s1, s"training did not reduce reconstruction SSE: $s1 -> $s3")
    // ADC ranking approximates exact top-k (generous floor: PQ at
    // m=4,k=8 is a coarse 12-bit code; we only demand real signal)
    val (codes, cbs) = Clustering.pqTrainEncode(emb, m = 4, k = 8, iters = 3, dim = 64)
    val q = Similarity.vectorOf(emb, 7L)
    val adcTop = Clustering.pqTopK(codes, cbs, q, m = 4, k = 25)
      .collect().map(_.getLong(0)).toSet
    // the query itself must be among its own nearest reconstructions
    assert(adcTop.contains(7L), "ADC lost the query vector itself")
  }

  test("ivfPq: m codes/vector tagged by cell, bit-stable under partitioning, residuals beat flat PQ") {
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val (codes, coarse, pqCbs) = Clustering.ivfPqTrainEncode(emb,
      k1 = 4, k2 = 4, m = 4, k = 8, dim = 64)
    val n = emb.count()
    assert(codes.count() === n,
      "packed IVF-PQ codes must carry ONE row per vector (m code columns)")
    (0 until 4).foreach { ss =>
      assert(codes.agg(min(col(s"c$ss")), max(col(s"c$ss"))).head().toSeq
        .map(_.asInstanceOf[Int]).forall(c => c >= 0 && c < 8),
        s"c$ss out of the codeword range")
    }
    val cellIds = coarse.map(_._1).toSet
    assert(codes.select("cell").distinct().collect().map(_.getLong(0))
      .forall(cellIds), "every code row's cell must be a trained combined cell")
    // bit-exact reproducibility across partitionings (both trainings)
    val (codes2, coarse2, _) = Clustering.ivfPqTrainEncode(emb.repartition(13),
      k1 = 4, k2 = 4, m = 4, k = 8, dim = 64)
    assert(coarse.map { case (c, v) => (c, v.toSeq) }.toSeq ===
      coarse2.map { case (c, v) => (c, v.toSeq) }.toSeq)
    assert(codes.collect().map(_.toString).sorted.toSeq ===
      codes2.collect().map(_.toString).sorted.toSeq)
    // THE reason residuals exist: quantizing (v − centroid) with the
    // same m×k code budget reconstructs strictly better than
    // quantizing raw vectors — residuals concentrate near zero
    val (flat, _) = Clustering.pqTrainEncode(emb, m = 4, k = 8, iters = 2, dim = 64)
    val sseIvfPq = codes.agg(sum(col("dist2"))).head().getDouble(0)
    val sseFlat = flat.agg(sum(col("dist2"))).head().getDouble(0)
    assert(sseIvfPq < sseFlat,
      s"residual PQ must beat flat PQ at equal code budget: $sseIvfPq !< $sseFlat")
    // probe sanity at a full-candidate budget (nprobe = all 16 cells):
    // ADC over residual codes must rank the query's own vector into its
    // top reconstructions (the pq spec's self-hit law)
    val q = Similarity.vectorOf(emb, 7L)
    val allTop = Clustering.ivfPqTopK(codes, coarse, pqCbs, q,
      m = 4, k = 25, nprobe = 16).collect().map(_.getLong(0)).toSet
    assert(allTop.contains(7L), "IVF-PQ ADC lost the query vector itself")
  }

  test("ivfPqWriteIndex/OpenIndex: disk round-trip == in-memory; probes bucket-pruned to nprobe cells") {
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val (codes, coarse, pqCbs) = Clustering.ivfPqTrainEncode(emb,
      k1 = 4, k2 = 4, m = 4, k = 8, dim = 64)
    val root = java.nio.file.Files.createTempDirectory("graft_ivfpq_spec").toString
    val table = "ivfpq_spec_" + java.lang.Long.toHexString(System.nanoTime())
    Clustering.ivfPqWriteIndex(codes, coarse, pqCbs, table, root, nBuckets = 16)
    spark.sql(s"DROP TABLE $table") // exercise fresh-session re-registration
    val (codesD, coarseD, pqCbsD) = Clustering.ivfPqOpenIndex(spark, table, root,
      nBuckets = 16)
    assert(coarseD.map { case (c, v) => (c, v.toSeq) }.toSeq ===
      coarse.map { case (c, v) => (c, v.toSeq) }.toSeq)
    val q = Similarity.vectorOf(emb, 7L)
    val mem = Clustering.ivfPqTopK(codes, coarse, pqCbs, q,
      m = 4, k = 10, nprobe = 4).collect().toSeq
    val disk = Clustering.ivfPqTopK(codesD, coarseD, pqCbsD, q,
      m = 4, k = 10, nprobe = 4)
    // the plan gate the composition exists for: the probe reads only
    // the buckets its nprobe cells hash to — of a table that is m
    // BYTES per vector, not d floats (the two-parent win in one scan)
    val plan = disk.queryExecution.executedPlan.toString
    val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(plan)
    assert(sel.isDefined, s"IVF-PQ probe scan is not bucket-pruned:\n$plan")
    assert(sel.get.group(2).toInt === 16 && sel.get.group(1).toInt <= 4,
      s"probe read ${sel.get.group(1)} of 16 buckets — expected <= nprobe (4)")
    assert(disk.collect().toSeq === mem,
      "bucketed on-disk IVF-PQ probe diverged from the in-memory probe")
    spark.sql(s"DROP TABLE $table")
  }

  test("ivfPqTopKMulti == Q sequential probes, through ONE bucket-pruned scan") {
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val (codes, coarse, pqCbs) = Clustering.ivfPqTrainEncode(emb,
      k1 = 4, k2 = 4, m = 4, k = 8, dim = 64)
    val root = java.nio.file.Files.createTempDirectory("graft_ivfpq_multi_spec").toString
    val table = "ivfpq_multi_spec_" + java.lang.Long.toHexString(System.nanoTime())
    Clustering.ivfPqWriteIndex(codes, coarse, pqCbs, table, root, nBuckets = 16)
    val (codesD, coarseD, pqCbsD) = Clustering.ivfPqOpenIndex(spark, table, root,
      nBuckets = 16)
    val qids = Seq(1L, 7L, 13L)
    val qvecs = qids.map(id => id -> Similarity.vectorOf(emb, id))
    val multi = Clustering.ivfPqTopKMulti(codesD, coarseD, pqCbsD, qvecs,
      m = 4, k = 10, nprobe = 4)
    // equivalence: each query's slice bit-matches its sequential
    // ivfPqTopK — same candidates, same ADC doubles, same rank order
    // (the broadcast LUT carries the very doubles the single-query
    // probe bakes in as literals, summed in the same subspace order)
    val got = multi.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val want = qvecs.flatMap { case (qid, qv) =>
      Clustering.ivfPqTopK(codesD, coarseD, pqCbsD, qv,
        m = 4, k = 10, nprobe = 4).collect()
        .map(r => (qid, r.getLong(0), r.getDouble(1)))
    }
    assert(got === want, "batched IVF-PQ probe diverged from sequential probes")
    // the plan gate the batched form exists for: ONE scan of the codes
    // (never Q), bucket-pruned to the union of per-query cell sets
    // (AQE repeats the tree under "== Initial Plan ==" — gate the
    // FINAL section only, the twoLevelTopKMulti convention)
    val plan = multi.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val scans = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findAllMatchIn(plan).toSeq
    assert(scans.size === 1,
      s"expected exactly ONE bucket-pruned codes scan, found ${scans.size}:\n$plan")
    assert(scans.head.group(2).toInt === 16 &&
      scans.head.group(1).toInt <= 3 * 4,
      s"probe read ${scans.head.group(1)} of 16 buckets — expected <= Q*nprobe (12)")
    spark.sql(s"DROP TABLE $table")
  }
}
