package graft.operators

import graft.SparkSuite

class GraphSpec extends SparkSuite {
  import spark.implicits._

  /** Independent reference: the same integer fixed-point update run
    * sequentially with BigInt — any distributed-arithmetic drift
    * (overflow, rounding-order, decimal precision) breaks equality. */
  private def reference(edges: Seq[(String, String, Long)], iters: Int): Map[String, Long] = {
    val u = Graph.MassUnits
    val states = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = states.size.toLong
    val out = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val tele = (3L * u) / (20L * n)
    var r = states.map(_ -> u / n).toMap
    for (_ <- 0 until iters) {
      val d = states.filterNot(out.contains).map(r).sum
      val dShare = (17L * d) / (20L * n)
      r = states.map { j =>
        val contrib = edges.collect {
          case (i, j2, w) if j2 == j =>
            ((BigInt(17) * r(i) * w) / (BigInt(20) * out(i))).toLong
        }.sum
        j -> (tele + dShare + contrib)
      }.toMap
    }
    r
  }

  private def run(edges: Seq[(String, String, Long)], iters: Int,
                  driverEdgeLimit: Long = 1000000L): Map[String, Long] =
    Graph.stationaryDistribution(
      edges.toDF("from_type", "to_type", "n"), iters, driverEdgeLimit)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("BOTH paths (driver fast path and distributed loop) equal the BigInt reference") {
    val rnd = new scala.util.Random(19)
    val states = (0 until 9).map(i => s"s$i")
    val edges = (for {
      i <- states; j <- states if i != j && rnd.nextInt(3) == 0
    } yield (i, j, 1L + rnd.nextInt(50).toLong)).toSeq
    for (iters <- Seq(1, 5, 12)) {
      val want = reference(edges, iters)
      assert(run(edges, iters) === want, s"driver path, iters=$iters")
      // driverEdgeLimit=0 forces the distributed loop on the same input
      assert(run(edges, iters, driverEdgeLimit = 0L) === want,
        s"distributed path, iters=$iters")
    }
  }

  test("symmetric two-state chain stays uniform") {
    val edges = Seq(("a", "b", 5L), ("b", "a", 5L))
    val r = run(edges, 15)
    assert(r("a") === r("b"))
    // mass conserved up to truncation: N units lost at most per step
    assert(math.abs(r.values.sum - Graph.MassUnits) <= 15L * 3)
  }

  test("dangling state keeps rank and redistributes its mass") {
    // a -> b, b dangling: b accumulates from a, leaks back uniformly
    val r = run(Seq(("a", "b", 1L)), 20)
    assert(r("b") > r("a"), s"expected sink to outrank source: $r")
    assert(r.values.forall(_ > 0))
  }

  test("heavier edges attract proportionally more mass") {
    val r = run(Seq(("hub", "big", 9L), ("hub", "small", 1L),
      ("big", "hub", 1L), ("small", "hub", 1L)), 20)
    assert(r("big") > r("small"))
  }

  private def tri(edges: Seq[(Long, Long)]): (Long, Long, Long) = {
    val r = Graph.triangleCount(edges.toDF("src", "dst")).head()
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("triangleCount: K4 has 4 triangles, a path has none") {
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    assert(tri(k4) === ((4L, 6L, 4L)))
    assert(tri(Seq((1L, 2L), (2L, 3L), (3L, 4L))) === ((4L, 3L, 0L)))
  }

  test("triangleCount canonicalizes: direction, duplicates, self-loops") {
    // the same triangle reported both ways, duplicated, with a loop
    val messy = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 3L),
      (2L, 2L), (1L, 2L))
    assert(tri(messy) === ((3L, 3L, 1L)))
  }

  test("kHopReachable: min-hop labels on a path, direction-insensitive") {
    // path 1-2-3-4-5 with reversed edge directions mixed in
    val path = Seq((1L, 2L), (3L, 2L), (3L, 4L), (5L, 4L)).toDF("src", "dst")
    val out = Graph.kHopReachable(path, Seq(1L), k = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
    // diamond: two routes to 4; the SHORTER labels it
    val diamond = Seq((1L, 2L), (1L, 4L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val d = Graph.kHopReachable(diamond, Seq(1L), k = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d(4L) === 1L)
    // k = 0 returns exactly the seeds; absent seeds still labeled 0
    val z = Graph.kHopReachable(path, Seq(1L, 99L), k = 0).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(z === Map(1L -> 0L, 99L -> 0L))
  }

  test("localClustering: K4 corners are fully clustered, star center is not") {
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val cc = Graph.localClustering(k4.toDF("src", "dst")).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) Double.NaN else r.getDouble(3)))).toMap
    (1L to 4L).foreach { v => assert(cc(v) === ((3L, 3L, 1.0))) }
    // star 0-(1..6) with rim edge (1,2): center barely clustered,
    // rim pair fully, leaves null (degree 1 has no possible wedge)
    val star = (1L to 6L).map(v => (0L, v)) :+ ((1L, 2L))
    val sc = Graph.localClustering(star.toDF("src", "dst")).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(sc(0L).getLong(1) === 6L && sc(0L).getDouble(3) === 0.066667)
    assert(sc(1L).getDouble(3) === 1.0 && sc(2L).getDouble(3) === 1.0)
    assert(sc(3L).isNullAt(3))
    // triangle-free vertex with degree >= 2 scores 0, not null
    val path = Seq((1L, 2L), (2L, 3L))
    val pc = Graph.localClustering(path.toDF("src", "dst")).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(pc(2L).getDouble(3) === 0.0)
  }

  test("triangleCount: hub star plus one closed rim pair") {
    // star center 0 to 1..6, plus rim edge (1,2): exactly one triangle
    val star = (1L to 6L).map(v => (0L, v)) :+ ((1L, 2L))
    assert(tri(star) === ((7L, 7L, 1L)))
    // brute-force cross-check on a denser random-ish graph
    val edges = (for (a <- 1L to 9L; b <- (a + 1) to 9L
                      if (a * 31 + b * 17) % 3 == 0) yield (a, b)).toSeq
    val expect = (for (x <- 1L to 9L; y <- (x + 1) to 9L; z <- (y + 1) to 9L
                       if Seq((x, y), (y, z), (x, z)).forall(edges.contains))
                    yield 1).size.toLong
    assert(tri(edges)._3 === expect)
  }

  test("degreeDistribution: canonical dedup, histogram by degree") {
    // triangle 1-2-3 plus pendant 4 on 1; duplicate and reversed
    // edges must not inflate degrees
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (1L, 3L), (1L, 4L), (1L, 4L))
      .toDF("src", "dst")
    val out = Graph.degreeDistribution(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // degrees: 1 -> 3, 2 -> 2, 3 -> 2, 4 -> 1
    assert(out === Map(1L -> 1L, 2L -> 2L, 3L -> 1L))
  }
}
