package graft.operators

import graft.SparkSuite

class SamplingSpec extends SparkSuite {
  import spark.implicits._

  private val df = (1L to 2000L).map(i => (i, s"row$i")).toDF("id", "v")

  test("byHash is deterministic and partitioning-independent") {
    val a = Sampling.byHash(df, "id", 0.2).select("id").as[Long].collect().sorted
    val b = Sampling.byHash(df.repartition(13), "id", 0.2)
      .select("id").as[Long].collect().sorted
    assert(a.toSeq === b.toSeq, "sample must not depend on partitioning")
    assert(a.nonEmpty)
    // rate lands near 20% (hash-uniformity sanity, wide tolerance)
    assert(math.abs(a.length / 2000.0 - 0.2) < 0.05, s"rate off: ${a.length / 2000.0}")
  }

  test("samples are nested: the 10% sample is a subset of the 30% sample") {
    val small = Sampling.byHash(df, "id", 0.1).select("id").as[Long].collect().toSet
    val large = Sampling.byHash(df, "id", 0.3).select("id").as[Long].collect().toSet
    assert(small.subsetOf(large))
    assert(small.size < large.size)
  }

  test("assignSplit: stable under corpus growth, proportions near weights") {
    val weights = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val small = Sampling.assignSplit(df.where($"id" <= 1000), "id", weights)
      .select("id", "split").as[(Long, String)].collect().toMap
    val full = Sampling.assignSplit(df, "id", weights)
      .select("id", "split").as[(Long, String)].collect().toMap
    // no row migrates between splits when the corpus doubles — the
    // eval-contamination guarantee
    small.foreach { case (id, s) => assert(full(id) === s, s"row $id migrated") }
    val counts = full.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(math.abs(counts("train") / 2000.0 - 0.8) < 0.05)
    assert(math.abs(counts("val") / 2000.0 - 0.1) < 0.05)
    assert(math.abs(counts("test") / 2000.0 - 0.1) < 0.05)
  }

  test("mixtureSample: rates derive from target weights; absent domain dropped") {
    // 1000 'a' rows, 100 'b' rows, 100 'c' rows; targets a=50% b=50%,
    // fraction 0.2 of 1200 = 240 budget -> quota 120 each:
    // a thinned to ~12%, b capped at rate 1 (120 > 100), c dropped.
    val mixed = (1L to 1200L).map(i =>
      (i, if (i <= 1000) "a" else if (i <= 1100) "b" else "c")).toDF("id", "dom")
    val out = Sampling.mixtureSample(mixed, "id", "dom",
      Map("a" -> 0.5, "b" -> 0.5), fraction = 0.2)
      .select("id", "dom").as[(Long, String)].collect()
    val byDom = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(!byDom.contains("c"), "domain absent from the target mix must be dropped")
    assert(byDom("b") === 100, "under-represented domain is taken whole (rate caps at 1)")
    assert(math.abs(byDom("a") - 120) < 40, s"'a' should thin to ~120 rows: $byDom")
    // deterministic + partitioning-independent, like every hash sampler
    val again = Sampling.mixtureSample(mixed.repartition(7), "id", "dom",
      Map("a" -> 0.5, "b" -> 0.5), fraction = 0.2)
      .select("id", "dom").as[(Long, String)].collect()
    assert(out.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
  }

  test("mixtureSample: fraction growth only adds rows per domain (nesting)") {
    val mixed = (1L to 1200L).map(i =>
      (i, if (i <= 1000) "a" else "b")).toDF("id", "dom")
    val w = Map("a" -> 0.6, "b" -> 0.4)
    val small = Sampling.mixtureSample(mixed, "id", "dom", w, fraction = 0.1)
      .select("id").as[Long].collect().toSet
    val large = Sampling.mixtureSample(mixed, "id", "dom", w, fraction = 0.3)
      .select("id").as[Long].collect().toSet
    assert(small.subsetOf(large))
    assert(small.size < large.size)
  }

  test("pearsonExact: 1 on a perfect line, sign flips with the slope") {
    val line = (1 to 100).map(i => ("g", i.toDouble, 2.0 * i + 3))
      .toDF("k", "x", "y")
    val r = Profile.pearsonExact(line, "k", "x", "y").head().getDouble(1)
    assert(math.abs(r - 1.0) < 1e-9, s"perfect line must give corr 1, got $r")
    val anti = (1 to 100).map(i => ("g", i.toDouble, -1.5 * i + 7))
      .toDF("k", "x", "y")
    val r2 = Profile.pearsonExact(anti, "k", "x", "y").head().getDouble(1)
    assert(math.abs(r2 + 1.0) < 1e-9, s"anti-line must give corr -1, got $r2")
  }

  test("stratifiedByHash applies per-stratum rates with a default") {
    val strat = (1L to 3000L).map(i => (i, if (i % 3 == 0) "hot" else "cold"))
      .toDF("id", "s")
    val out = Sampling.stratifiedByHash(strat, "id", "s",
      Map("hot" -> 0.5), default = 0.05)
    val byStratum = out.groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(byStratum("hot") / 1000.0 - 0.5) < 0.1)
    assert(math.abs(byStratum.getOrElse("cold", 0L) / 2000.0 - 0.05) < 0.05)
    // stratification never invents rows outside the hash sample
    val all = Sampling.byHash(strat, "id", 1.0).count()
    assert(all === 3000L, "rate 1.0 must keep everything")
  }

  test("capPerGroup: bounds every group, deterministic, nested across caps") {
    val groups = (1L to 900L).map(i => (i, s"g${i % 3}")).toDF("id", "g")
    val capped = Sampling.capPerGroup(groups, "id", "g", 50)
    val sizes = capped.groupBy("g").count().collect().map(_.getLong(1))
    assert(sizes.forall(_ === 50L), "every group lands exactly at the cap")
    // partitioning-independent choice of WHICH rows survive
    val a = capped.select("id").as[Long].collect().sorted.toSeq
    val b = Sampling.capPerGroup(groups.repartition(17), "id", "g", 50)
      .select("id").as[Long].collect().sorted.toSeq
    assert(a === b)
    // nested: raising the cap only ADDS rows (hash-order prefix)
    val wider = Sampling.capPerGroup(groups, "id", "g", 80)
      .select("id").as[Long].collect().toSet
    assert(a.toSet.subsetOf(wider))
    // a group below the cap is untouched
    val tiny = Sampling.capPerGroup(groups.where($"id" <= 10), "id", "g", 50)
    assert(tiny.count() === 10L)
  }

  test("byWeight: keep rate tracks the weight; monotone in the weight") {
    import org.apache.spark.sql.functions.{col, lit, least}
    val rows = (1L to 4000L).map(i => (i, if (i <= 2000) 0.1 else 0.9))
      .toDF("id", "w")
    val out = Sampling.byWeight(rows, "id", col("w"))
      .groupBy("w").count().collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(math.abs(out.getOrElse(0.1, 0L) / 2000.0 - 0.1) < 0.05)
    assert(math.abs(out.getOrElse(0.9, 0L) / 2000.0 - 0.9) < 0.05)
    // raising every weight only ADDS rows
    val low = Sampling.byWeight(rows, "id", col("w")).select("id").as[Long].collect().toSet
    val high = Sampling.byWeight(rows, "id", least(lit(1.0), col("w") * 2))
      .select("id").as[Long].collect().toSet
    assert(low.subsetOf(high))
  }

  test("seededShuffle: reproducible permutation, fresh order per seed") {
    val rows = (1L to 500L).map(i => (i, s"v$i")).toDF("id", "v")
    def order(seed: String, df: org.apache.spark.sql.DataFrame) =
      Sampling.seededShuffle(df, "id", seed).select("id").as[Long].collect().toSeq
    val e1 = order("epoch1", rows)
    assert(e1 === order("epoch1", rows.repartition(13)),
      "same seed must give the same order regardless of partitioning")
    val e2 = order("epoch2", rows)
    assert(e1 !== e2, "a new seed must give a fresh permutation")
    assert(e1.sorted === e2.sorted, "a permutation, not a resample")
    assert(e1 !== e1.sorted, "and it actually shuffles")
  }

  test("temperatureSample: sqrt tempering upweights small domains vs their raw share") {
    // 900 "big" rows vs 100 "small": raw shares 90/10, sqrt-tempered
    // weights 30/10 -> small's sampled share must land well above 10%
    val rows = ((1L to 900L).map(i => (i, "big")) ++
      (901L to 1000L).map(i => (i, "small"))).toDF("id", "dom")
    val out = Sampling.temperatureSample(rows, "id", "dom", fraction = 0.3)
      .select($"id", $"dom").as[(Long, String)].collect()
    val byDom = out.groupBy(_._2).view.mapValues(_.length).toMap
    val smallShare = byDom("small").toDouble / out.length
    assert(smallShare > 0.15 && smallShare < 0.40,
      s"tempered small-domain share: $smallShare (raw would be ~0.10)")
    // deterministic + partitioning-independent
    val again = Sampling.temperatureSample(rows.repartition(7), "id", "dom", 0.3)
      .select($"id", $"dom").as[(Long, String)].collect()
    assert(out.toSet === again.toSet)
  }

  test("groupSplit: whole groups share a split; unmapped rows split by own id") {
    val rows = (1L to 300L).map(i => (i, s"doc$i")).toDF("id", "v")
    // groups of 3: rows 1-3 -> group 1, 4-6 -> group 4, ...
    val groups = (1L to 300L).map(i => (i, ((i - 1) / 3) * 3 + 1)).toDF("id", "gid")
    val out = Sampling.groupSplit(rows, "id", groups, "gid",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select($"id", $"split").as[(Long, String)].collect().toMap
    assert(out.size === 300)
    for (g <- 1L to 298L by 3)
      assert(Set(out(g), out(g + 1), out(g + 2)).size === 1,
        s"group at $g straddles splits")
    // unmapped rows fall back to their own id = assignSplit behavior
    val noMap = Sampling.groupSplit(rows, "id", groups.filter($"id" < 0), "gid",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select($"id", $"split").as[(Long, String)].collect().toMap
    val direct = Sampling.assignSplit(rows, "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select($"id", $"split").as[(Long, String)].collect().toMap
    assert(noMap === direct)
  }

  test("classBalance: every class lands exactly at the min class count, deterministically") {
    val rows = ((1L to 500L).map(i => (i, "big")) ++
      (501L to 560L).map(i => (i, "mid")) ++
      (561L to 580L).map(i => (i, "small"))).toDF("id", "label")
    val out = Sampling.classBalance(rows, "id", "label")
      .select($"id", $"label").as[(Long, String)].collect()
    val byLabel = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(byLabel === Map("big" -> 20, "mid" -> 20, "small" -> 20))
    // deterministic and partitioning-independent
    val again = Sampling.classBalance(rows.repartition(7), "id", "label")
      .select($"id", $"label").as[(Long, String)].collect()
    assert(out.toSet === again.toSet)
    // growing a class never changes OTHER classes' picks
    val grown = (rows.collect().map(r => (r.getLong(0), r.getString(1))) ++
      (1000L to 1100L).map(i => (i, "big"))).toSeq.toDF("id", "label")
    val g = Sampling.classBalance(grown, "id", "label")
      .select($"id", $"label").as[(Long, String)].collect()
    assert(g.filter(_._2 == "mid").toSet === out.filter(_._2 == "mid").toSet)
    assert(g.filter(_._2 == "small").toSet === out.filter(_._2 == "small").toSet)
  }

  test("classBalance pre-thins a pathologically hot class and still picks the exact rows") {
    // 200k-row hot class vs a 5-row minority: the rank window must see
    // a hash-thinned slice of "hot", not all 200k rows, and the picked
    // rows must be identical to the unthinned selection (the thin
    // filter is a hash-prefix of the rank order).
    val rows = ((1L to 200000L).map(i => (i, "hot")) ++
      (900001L to 900005L).map(i => (i, "rare"))).toDF("id", "label")
    val out = Sampling.classBalance(rows, "id", "label")
      .select($"id", $"label").as[(Long, String)].collect()
    assert(out.count(_._2 == "hot") === 5)
    assert(out.count(_._2 == "rare") === 5)
    // ground truth: the 5 lowest (hashBp, id) rows of each class,
    // computed without any window
    val expected = rows
      .withColumn("__h", Sampling.hashBp($"id"))
      .as[(Long, String, Long)].collect()
      .groupBy(_._2).values
      .flatMap(_.sortBy(r => (r._3, r._1)).take(5).map(r => (r._1, r._2)))
      .toSet
    assert(out.toSet === expected)
    // the guard really bounds the window input: the hot class's cutoff
    // targets 2*min + 10000 = 10010 expected survivors, i.e. cutoff
    // ceil(10010*10000/200000) = 501 bp -> ~10k of 200k rows pass the
    // pre-filter (binomial concentration keeps it within a few percent)
    val cut = math.ceil((2 * 5 + 10000) * 10000.0 / 200000).toLong
    assert(cut === 501L)
    val survivors = rows.where($"label" === "hot")
      .where(Sampling.hashBp($"id") < cut).count()
    assert(survivors < 12000L, s"pre-thin must bound the window input, saw $survivors")
    assert(survivors >= 5L, "margin must keep at least the quota")
  }

  test("capTokensPerGroup: groups budget independently, docs never partially taken") {
    val docs = Seq(
      (1L, "a", 10.0, 60L), // a rank 1: cum 60
      (2L, "a", 5.0, 30L),  // a rank 2: cum 90
      (3L, "a", 1.0, 20L),  // a rank 3: cum 110 > 100 -> dropped, not trimmed
      (4L, "b", 9.0, 100L), // b rank 1: cum 100 == budget -> kept
      (5L, "b", 8.0, 1L))   // b rank 2: cum 101 -> dropped
      .toDF("doc_id", "source", "score", "n_tokens")
    val out = Sampling.capTokensPerGroup(docs, "source", "doc_id",
      "score", "n_tokens", budget = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(4)))
    assert(out.toSeq === Seq((1L, 60L), (2L, 90L), (4L, 100L)))
  }

  test("exactSize returns exactly k rows, nested across k, stable under partitioning") {
    val df = (1L to 500L).toDF("id")
    val s50 = Sampling.exactSize(df, "id", 50).collect().map(_.getLong(0)).toSet
    val s200 = Sampling.exactSize(df, "id", 200).collect().map(_.getLong(0)).toSet
    assert(s50.size === 50 && s200.size === 200)
    assert(s50.subsetOf(s200), "bottom-k samples must nest")
    val s50r = Sampling.exactSize(df.repartition(17), "id", 50)
      .collect().map(_.getLong(0)).toSet
    assert(s50 === s50r)
    // k beyond n returns everything; k=0 nothing
    assert(Sampling.exactSize(df, "id", 1000).count() === 500L)
    assert(Sampling.exactSize(df, "id", 0).count() === 0L)
  }

  test("weightedExactSize: exact k, deterministic, weight-monotone, skew-sensitive") {
    import org.apache.spark.sql.functions.{col, lit, when}
    // 50 heavy rows (w=50) among 450 unit rows: 10% of the population
    val df = (1L to 500L).toDF("id")
      .withColumn("w", when(col("id") <= 50, lit(50.0)).otherwise(lit(1.0)))
    val s = Sampling.weightedExactSize(df, "id", col("w"), 100)
      .collect().map(_.getLong(0)).toSet
    assert(s.size === 100)
    // partitioning invariance
    val s2 = Sampling.weightedExactSize(df.repartition(13), "id", col("w"), 100)
      .collect().map(_.getLong(0)).toSet
    assert(s === s2)
    // heavy rows must be strongly overrepresented vs their 10% share
    val heavyIn = s.count(_ <= 50)
    assert(heavyIn > 30, s"expected heavy overrepresentation, got $heavyIn/100")
    // raising one excluded row's weight can only pull it IN (E-S key
    // is monotone in w for fixed u)
    val out = (1L to 500L).find(i => i > 50 && !s.contains(i)).get
    val df2 = df.withColumn("w", when(col("id") === out, lit(1e6)).otherwise(col("w")))
    val s3 = Sampling.weightedExactSize(df2, "id", col("w"), 100)
      .collect().map(_.getLong(0)).toSet
    assert(s3.contains(out), "raised weight must admit the row")
    // non-positive weights are excluded
    val df3 = df.withColumn("w", when(col("id") === 1, lit(0.0)).otherwise(col("w")))
    assert(!Sampling.weightedExactSize(df3, "id", col("w"), 100)
      .collect().map(_.getLong(0)).contains(1L))
  }

  test("exactSize composes exactly with same-key range pre-thinning") {
    val df = (1L to 2000L).toDF("id")
    val direct = Sampling.exactSize(df, "id", 30).collect().map(_.getLong(0)).toSet
    // pre-thin on the SAME sample key at a threshold far above the
    // 30th-smallest key (~0.2 of the 2^60 key space vs ~0.015
    // expected), then bottom-k — must select the identical set.
    // NOTE: byHash uses a different (8-hex-char) key, so thinning
    // with byHash would NOT compose — same-key thinning is the
    // contract the scaladoc prescribes.
    val threshold = (BigInt(16).pow(15) / 5).toLong
    val thinned = Sampling.exactSize(
      df.where(Sampling.sampleKey(org.apache.spark.sql.functions.col("id"))
        < org.apache.spark.sql.functions.lit(threshold)), "id", 30)
      .collect().map(_.getLong(0)).toSet
    assert(direct === thinned)
  }

  test("bootstrapMeanCI: brackets the point mean, deterministic, sane width") {
    import org.apache.spark.sql.functions.col
    val df = (1L to 2000L).map(i => (i, 100.0 + (i % 37))).toDF("id", "v")
    val r = Sampling.bootstrapMeanCI(df, "id", col("v"), b = 60).head()
    val (point, n, lo, hi, se) = (r.getDouble(0), r.getLong(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(n === 60L)
    assert(lo <= point && point <= hi) // percentile CI brackets the mean
    assert(hi - lo < 5.0 && hi - lo > 0.0) // sd≈10.7, n=2000 -> SE≈0.24
    assert(se > 0.05 && se < 2.0)
    // deterministic: the hash draw ignores partitioning entirely
    val r2 = Sampling.bootstrapMeanCI(df.repartition(13), "id", col("v"), b = 60).head()
    assert(r.toSeq === r2.toSeq)
    // resample means really vary (the multiplicities aren't constant)
    assert(hi > lo)
  }
}
