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
}
