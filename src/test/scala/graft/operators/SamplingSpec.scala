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
