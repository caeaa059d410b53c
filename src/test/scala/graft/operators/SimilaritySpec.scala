package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class SimilaritySpec extends SparkSuite {
  import spark.implicits._

  // Orthogonal + parallel unit-ish vectors with known cosines.
  private val emb = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(2.0f, 0.0f, 0.0f)),   // cosine(0,1) = 1
    (2L, Array(0.0f, 1.0f, 0.0f)),   // cosine(0,2) = 0
    (3L, Array(1.0f, 1.0f, 0.0f)))   // cosine(0,3) = 1/sqrt(2)
    .toDF("vec_id", "embedding")

  test("dot/cosine on known vectors") {
    val r = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0, 6.0))).toDF("a", "b")
      .select(
        Similarity.dot(col("a"), col("b")).as("d"),
        Similarity.cosine(col("a"), col("a")).as("self"))
      .head()
    assert(r.getDouble(0) === 32.0)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
  }

  test("topK ranks by cosine against the query vector") {
    val q = Similarity.vectorOf(emb, 0L)
    assert(q === Seq(1.0, 0.0, 0.0))
    val out = Similarity.topK(emb, q, 3).collect().map(_.getLong(0))
    assert(out.take(2).toSet === Set(0L, 1L)) // both cosine 1.0
    assert(out(2) === 3L)
  }

  test("knnJoin: each id gets k neighbors ranked by cosine") {
    val out = Similarity.knnJoin(emb, 2).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.sortBy(_.getInt(3)).map(_.getLong(1)).toSeq).toMap
    assert(out(2L).head === 3L) // 3 is nearest to 2 (cosine 1/sqrt(2) vs 0)
    assert(out(0L).toSet.subsetOf(Set(1L, 3L)))
    assert(out.values.forall(_.length === 2))
  }

  test("brute-force paths fail fast above maxBroadcastRows, pointing to lshKnnJoin") {
    // the guard is code, not a comment: a 10B-row table must die with
    // a diagnosis BEFORE the driver-OOMing broadcast collect
    val e = intercept[IllegalArgumentException] {
      Similarity.knnJoin(emb, 2, maxBroadcastRows = 3)
    }
    assert(e.getMessage.contains("lshKnnJoin"))
    assert(e.getMessage.contains("maxBroadcastRows=3"))
    val e2 = intercept[IllegalArgumentException] {
      Similarity.hardNegatives(emb.withColumn("label",
        org.apache.spark.sql.functions.lit("x")), 2, maxBroadcastRows = 3)
    }
    assert(e2.getMessage.contains("lshKnnJoin"))
    // at or under the cap the operator runs untouched
    assert(Similarity.knnJoin(emb, 2, maxBroadcastRows = emb.count()).count() > 0)
  }

  test("lshKnnJoin returns a subset of brute-force pairs with identical cosines") {
    val brute = Similarity.knnJoin(emb, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = Similarity.lshKnnJoin(emb, 3, dim = 3, nBits = 4).collect()
    assert(lsh.nonEmpty)
    lsh.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(brute.contains(key))
      assert(math.abs(brute(key) - r.getDouble(2)) < 1e-12)
    }
  }

  test("lshKnnJoin hot-bucket cap: capped output is a subset; cap=1 empties it") {
    val all = Similarity.lshKnnJoin(emb, 3, dim = 3, nBits = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = Similarity.lshKnnJoin(emb, 3, dim = 3, nBits = 4, maxBucket = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.subsetOf(all))
    // every pair needs a shared bucket of >= 2 members, so capping at 1
    // removes all pair-producing buckets
    assert(Similarity.lshKnnJoin(emb, 3, dim = 3, nBits = 4, maxBucket = 1).count() === 0)
  }

  test("IVF index + probe: high recall against brute force on real embeddings") {
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val q = Similarity.vectorOf(emb, 7L)
    val exact = Similarity.topK(emb, q, 10).collect().map(_.getLong(0)).toSet
    val (assigned, centroids) = Similarity.ivfIndex(emb, nCells = 8)
    val approx = Similarity.ivfTopK(assigned, centroids, q, 10, nprobe = 4)
      .collect().map(_.getLong(0)).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall too low: $recall")
    // probing every cell must reproduce brute force exactly
    val full = Similarity.ivfTopK(assigned, centroids, q, 10, nprobe = 8)
      .collect().map(_.getLong(0)).toSet
    assert(full === exact)
  }

  test("multi-seed LSH recall >= single-seed recall against brute force") {
    val embR = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .where(col("vec_id") < 200)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // nBits=4: this corpus' neighbor cosines are ~0.3-0.4 (angle ~70°),
    // so per-plane agreement is ~0.6 and per-seed bucket collision
    // 0.6^nBits — at 8 bits recall is single-digit % BY MATH, not by
    // bug; 4 bits gives each seed a fighting chance and the multi-seed
    // union must then dominate the single seed.
    val brute = pairSet(Similarity.knnJoin(embR, 3))
    val single = pairSet(Similarity.lshKnnJoin(embR, 3, dim = 64, nBits = 4))
    val multi = pairSet(Similarity.lshKnnJoinMultiSeed(embR, 3, dim = 64, nBits = 4,
      seeds = Seq(42L, 43L, 44L)))
    def recall(s: Set[(Long, Long)]) = s.intersect(brute).size.toDouble / brute.size
    assert(recall(multi) >= recall(single),
      s"multi ${recall(multi)} < single ${recall(single)}")
    assert(recall(multi) > 0.2, s"3-seed recall unreasonably low: ${recall(multi)}")
  }

  test("dedupByEmbedding merges parallel vectors, leaves dissimilar ones") {
    // 0 and 1 are parallel (cosine 1.0, same sign pattern -> same
    // bucket); 3 is at 1/sqrt(2) to both — below the 0.9 threshold
    val out = Similarity.dedupByEmbedding(emb, threshold = 0.9, dim = 3, nBits = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out === Seq((0L, 0L), (1L, 0L), (2L, 2L), (3L, 3L)))
  }

  test("stored IVF index prunes unprobed cells at the scan (bucket pruning)") {
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val (assigned, centroids) = Similarity.ivfIndex(emb, nCells = 8)
    val root = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    try {
      Similarity.ivfWriteIndex(assigned, "ivf_idx", s"$root/ivf", nCells = 8)
      val q = Similarity.vectorOf(emb, 7L)
      // probe-only plans have no join/agg on the bucket column, so the
      // DisableUnnecessaryBucketedScan rule would drop the bucketed
      // scan (and with it file-level pruning) — pin it on, as a
      // probe-serving session would
      withSQLConf("spark.sql.sources.bucketing.autoBucketedScan.enabled" -> "false") {
        val probed = Similarity.ivfTopK(spark.table("ivf_idx"), centroids, q, 10, nprobe = 2)
        val plan = probed.queryExecution.executedPlan.toString
        assert(plan.contains("SelectedBucketsCount: 2 out of 8"),
          s"expected the probe scan to read only 2 of 8 cell buckets:\n$plan")
        // pruned probe result identical to probing the in-memory assignment
        val mem = Similarity.ivfTopK(assigned, centroids, q, 10, nprobe = 2)
          .collect().map(_.getLong(0)).toSeq
        assert(probed.collect().map(_.getLong(0)).toSeq === mem)
      }
    } finally spark.sql("DROP TABLE IF EXISTS ivf_idx")
  }

  test("hyperplanes are deterministic under a fixed seed") {
    assert(Similarity.hyperplanes(8, 4, 42L) === Similarity.hyperplanes(8, 4, 42L))
    assert(Similarity.hyperplanes(8, 4, 42L) !== Similarity.hyperplanes(8, 4, 43L))
  }

  test("hardNegatives returns the nearest CROSS-label vectors, filter before rank") {
    import spark.implicits._
    // label 0: two near-identical vectors; label 1: one distant, one near label 0
    val emb = Seq(
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(0.99f, 0.14f), 0),     // same-label near neighbor of 1
      (3L, Array(0.9f, 0.44f), 1),      // cross-label, fairly close to 1
      (4L, Array(-1.0f, 0.0f), 1))      // cross-label, opposite
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegatives(emb, k = 2).collect()
      .map(r => (r.getLong(0), r.getInt(5)) -> r.getLong(2)).toMap
    // vector 1's top hard negative must be 3 (2 is nearer but same-label)
    assert(out((1L, 1)) === 3L)
    assert(out((1L, 2)) === 4L)
    // every returned pair crosses labels
    val cross = Similarity.hardNegatives(emb, k = 2).collect()
      .forall(r => r.getInt(1) != r.getInt(3))
    assert(cross)
  }

  test("labelCentroids: exact micro-sums per (label, dim), partitioning-independent") {
    import spark.implicits._
    val emb = Seq(
      (0, Array(1.0f, -0.5f)),
      (0, Array(0.5f, 0.25f)),
      (1, Array(-1.0f, 2.0f)))
      .toDF("label", "embedding")
    def collect(df: org.apache.spark.sql.DataFrame) =
      Similarity.labelCentroids(df).collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val out = collect(emb)
    assert(out((0, 0L)) === ((2L, 1500000L)))   // 1.0 + 0.5
    assert(out((0, 1L)) === ((2L, -250000L)))   // -0.5 + 0.25
    assert(out((1, 0L)) === ((1L, -1000000L)))
    assert(out((1, 1L)) === ((1L, 2000000L)))
    assert(collect(emb.repartition(7)) === out)
  }

  test("quantizeEmbeddings: exact codes on a known grid, error within half a step") {
    import spark.implicits._
    // dim 0 spans [0,10]; dim 1 is CONSTANT (degenerate: codes 0, err 0)
    val emb = Seq(
      (0L, Array(0.0f, 3.0f)),
      (1L, Array(5.0f, 3.0f)),
      (2L, Array(10.0f, 3.0f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.quantizeEmbeddings(emb).collect()
      .map(r => r.getLong(0) -> ((r.getSeq[Int](1), r.getDouble(2)))).toMap
    assert(out(0L)._1 === Seq(0, 0))
    assert(out(1L)._1 === Seq(128, 0))  // round(5*255/10) = round(127.5) = 128
    assert(out(2L)._1 === Seq(255, 0))
    // max reconstruction error bounded by half a grid step (10/255/2);
    // the reported err is rounded to 6 dp, so allow that quantum
    val step = 10.0 / 255
    out.values.foreach { case (_, err) => assert(err <= step / 2 + 5e-7) }
  }

  test("quantized cosine preserves brute-force top-k on real embeddings") {
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val q = Similarity.vectorOf(emb, 1L)
    val exact = Similarity.topK(emb, q, 10).collect().map(_.getLong(0)).toSet
    // dequantize codes back to doubles and rank by cosine against the
    // SAME dequantized query — the drift the ANN candidate stage sees
    val bounds = emb.select(posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("pos")).agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
      .collect().sortBy(_.getInt(0)).map(r => (r.getFloat(1).toDouble, r.getFloat(2).toDouble))
    val dequantized = Similarity.quantizeEmbeddings(emb)
      .select(col("vec_id"), col("codes")).collect().map { r =>
        val codes = r.getSeq[Int](1)
        val vec = codes.zipWithIndex.map { case (code, i) =>
          val (mn, mx) = bounds(i); mn + code.toDouble * (mx - mn) / 255 }
        r.getLong(0) -> vec
      }.toMap
    val qDeq = dequantized(1L)
    def cos(a: Seq[Double], b: Seq[Double]) = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      d / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val approx = dequantized.toSeq
      .map { case (id, v) => (id, cos(v, qDeq)) }
      .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
    // int8 grids on 64-dim vectors keep top-10 overlap high
    assert(exact.intersect(approx).size >= 8,
      s"quantized top-10 overlap too low: ${exact.intersect(approx)}")
  }

  test("randomProject: JL distance preservation and partitioning invariance") {
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val out = Similarity.randomProject(emb, outDim = 16, dim = 64)
    // deterministic under repartitioning (planes are plan literals)
    assert(out.collect().toSeq ===
      Similarity.randomProject(emb.repartition(11), outDim = 16, dim = 64).collect().toSeq)
    val orig = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val proj = out.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def d2(a: Array[Double], b: Array[Double]) =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    // E[|Rx - Ry|^2] = |x - y|^2: the ratio should center on 1 with
    // JL concentration; assert the sampled mean lands in a wide band
    val ids = orig.keys.toSeq.sorted.take(40)
    val ratios = for {
      i <- ids.indices; j <- (i + 1) until ids.length
      dOrig = d2(orig(ids(i)), orig(ids(j))) if dOrig > 0
    } yield d2(proj(ids(i)), proj(ids(j))) / dOrig
    val mean = ratios.sum / ratios.size
    assert(mean > 0.7 && mean < 1.3, s"JL mean distortion off: $mean")
  }

  test("randomProject candidates recover most of the exact top-k (two-stage ANN)") {
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val exact = Similarity.knnJoin(emb.where(col("vec_id") < 100), k = 5)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(_.getLong(1)).toSet }
    val proj = Similarity.randomProject(emb.where(col("vec_id") < 100),
      outDim = 32, dim = 64).withColumnRenamed("rvec", "embedding")
    val approx = Similarity.knnJoin(proj, k = 20)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(_.getLong(1)).toSet }
    // the candidate stage is deliberately generous (k=20 in 32-dim
    // space, then exact rescoring keeps 5): on near-orthogonal
    // synthetic vectors the projected ranking is noisy, so recall is
    // measured at the CANDIDATE stage, where a 4x overfetch should
    // catch most of the true cosine top-5
    val recalls = exact.map { case (id, ex) =>
      ex.intersect(approx.getOrElse(id, Set.empty)).size.toDouble / ex.size }
    val meanRecall = recalls.sum / recalls.size
    assert(meanRecall >= 0.6, s"mean 2-stage recall too low: $meanRecall")
  }

  test("embeddingCovariance: exact moments vs brute force; upper triangle only") {
    import spark.implicits._
    val vecs = Seq(
      Array(1.0f, 2.0f, -1.5f),
      Array(0.5f, -1.0f, 2.0f),
      Array(2.0f, 0.0f, 0.25f),
      Array(-1.0f, 1.0f, 1.0f))
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
    val out = Similarity.embeddingCovariance(df, dim = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6))))
      .toMap
    assert(out.size === 6, "d=3 upper triangle has 6 cells")
    assert(out.keySet.forall { case (i, j) => j >= i })
    // brute-force micro-unit moments
    val micro = vecs.map(_.map(x => math.round(x.toDouble * 1e6)))
    for (((i, j), (n, s2, si, sj, cov)) <- out) {
      assert(n === 4L)
      val expS2 = micro.map(v => v(i.toInt) * v(j.toInt)).sum
      val expSi = micro.map(_(i.toInt)).sum
      val expSj = micro.map(_(j.toInt)).sum
      assert(s2 === expS2 && si === expSi && sj === expSj)
      // cov ships unrounded (pure IEEE chain): expect bit-equality
      val expCov =
        (expS2.toDouble / 4 - (expSi.toDouble / 4) * (expSj.toDouble / 4)) / 1.0e12
      assert(cov === expCov, s"($i,$j): $cov vs $expCov")
    }
    // null embeddings are excluded, not crashed on
    val withNull = df.union(Seq((9L, null.asInstanceOf[Array[Float]]))
      .toDF("vec_id", "embedding"))
    assert(Similarity.embeddingCovariance(withNull, dim = 3).collect()
      .forall(_.getLong(2) === 4L))
  }

  test("pcaComponents: dominant direction recovered, orthonormal, eigs decreasing") {
    import spark.implicits._
    // points spread mostly along (1,1,0)/√2, tiny noise elsewhere
    val base = Seq(-3.0, -1.5, -0.5, 0.5, 1.5, 3.0)
    val df = base.zipWithIndex.map { case (t, i) =>
      (i.toLong, Array((t + 0.01 * i).toFloat, (t - 0.01 * i).toFloat,
        (0.02 * (i % 2)).toFloat))
    }.toDF("vec_id", "embedding")
    val (comps, eigs, mean) = Similarity.pcaComponents(df, k = 3, dim = 3)
    val c0 = comps(0)
    val align = math.abs((c0(0) + c0(1)) / math.sqrt(2.0) /
      math.sqrt(c0.map(x => x * x).sum))
    assert(align > 0.99, s"component 0 must align with (1,1,0): $align")
    for (i <- 0 until 3; j <- i until 3) {
      val dot = comps(i).zip(comps(j)).map { case (a, b) => a * b }.sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-6,
        s"components must be orthonormal: ($i,$j)=$dot")
    }
    assert(eigs.sliding(2).forall(p => p(0) >= p(1) - 1e-12), "eigs must decrease")
    assert(eigs.forall(_ >= -1e-9), "covariance eigenvalues are nonnegative")
    assert(mean.length === 3 && math.abs(mean(2) - 0.01) < 1e-6)
  }

  test("pcaProject: centered coordinates, partitioning-invariant, beats JL at equal dim") {
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val a = Similarity.pcaProject(emb, k = 8, dim = 64).collect()
    val b = Similarity.pcaProject(emb.repartition(17), k = 8, dim = 64).collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
    // mean of each projected coordinate ~ 0 (projection is centered)
    val sums = a.map(_.getSeq[Double](1)).reduce((x, y) =>
      x.zip(y).map { case (p, q) => p + q })
    assert(sums.forall(s => math.abs(s / a.length) < 1e-3))
    // captured variance == sum of top-k eigenvalues (consistency), and
    // >= the best axis-aligned 8-subspace (optimality law: no 8 raw
    // dimensions can hold more variance than the top-8 PCA subspace)
    val pcaVar = a.map(_.getSeq[Double](1).map(x => x * x).sum).sum / a.length
    val (_, eigs, _) = Similarity.pcaComponents(emb, k = 8, dim = 64)
    assert(math.abs(pcaVar - eigs.sum) < 0.01 * math.max(eigs.sum, 1e-9),
      s"captured variance $pcaVar vs eigenvalue sum ${eigs.sum}")
    val topDiag = Similarity.embeddingCovariance(emb, dim = 64).collect()
      .filter(r => r.getLong(0) === r.getLong(1)).map(_.getDouble(6))
      .sorted.reverse.take(8).sum
    assert(pcaVar >= topDiag - 1e-6,
      s"PCA-8 variance $pcaVar must dominate best axis subspace $topDiag")
  }

  test("pcaComponentsLocal == pcaComponents on the same sample (pure-JVM twin law)") {
    import spark.implicits._
    // the fixture derivation's own sample, fed to BOTH solvers: the
    // pure-JVM moments + shared eigensolve must reproduce the Spark
    // covariance path bit-for-bit — this is what lets q_pca_apply's
    // literal planes stand in for the distributed trainer's arithmetic
    val rnd = new java.util.Random(99L)
    val sample = Seq.fill(60)(Array.tabulate(6)(j =>
      rnd.nextGaussian() * (1.0 + j / 3.0) + 0.25 * j))
    val (lc, le, lm) = Similarity.pcaComponentsLocal(sample, k = 3)
    val df = sample.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
    val (sc, se, sm) = Similarity.pcaComponents(df, k = 3, dim = 6)
    assert(lc.map(_.toSeq).toSeq === sc.map(_.toSeq).toSeq,
      "pure-JVM components diverged from the Spark covariance path")
    assert(le.toSeq === se.toSeq && lm.toSeq === sm.toSeq)
  }

  test("fixturePcaPlanes: orthonormal learned planes; projectOnPlanes is pcaProject's spelling") {
    val (comps, mean) = Similarity.fixturePcaPlanes()
    assert(comps.length === 8 && comps.forall(_.length === 64) && mean.length === 64)
    for (i <- comps.indices; j <- i until comps.length) {
      val dot = comps(i).zip(comps(j)).map { case (a, b) => a * b }.sum
      // power iteration converges geometrically in the eigen-gap; at
      // 500 iterations on the ramp spectrum residual cross-talk sits
      // well under 1e-4 (exact orthogonality would need a direct solve)
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-4,
        s"fixture planes must be orthonormal: ($i,$j)=$dot")
    }
    // the variance ramp makes the sample mean shift real — the oracle's
    // literal shift term must be load-bearing, not ~0
    assert(mean.exists(m => math.abs(m) > 0.1), "fixture mean shift degenerate")
    // projectOnPlanes == the inline dot-minus-shift spelling pcaProject
    // used before the refactor (pin: the factoring changed nothing)
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val got = Similarity.projectOnPlanes(emb, comps, mean).collect()
    val manual = emb.select(org.apache.spark.sql.functions.col("vec_id"),
      org.apache.spark.sql.functions.array(comps.map { comp =>
        val shift = comp.zip(mean).map { case (a, b) => a * b }.sum
        org.apache.spark.sql.functions.round(
          graft.expressions.GraftFunctions.dot(
            org.apache.spark.sql.functions.col("embedding"),
            org.apache.spark.sql.functions.typedLit(comp.toSeq)) -
            org.apache.spark.sql.functions.lit(shift), 6)
      }.toIndexedSeq: _*).as("pvec"))
      .orderBy(org.apache.spark.sql.functions.col("vec_id")).collect()
    assert(got.map(_.toString).toSeq === manual.map(_.toString).toSeq)
  }
}
