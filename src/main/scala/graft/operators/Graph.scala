package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics composed from joins + aggregates ([EXT]).
  * Complements the connected-components path in [[Dedup]]: where CC
  * answers "which nodes belong together", the stationary distribution
  * answers "which nodes matter" — the PageRank-style importance score
  * over a weighted transition graph (domain authority for crawl
  * prioritization, event-type equilibrium occupancy, hub detection in
  * citation/link graphs).
  */
object Graph {

  /** Total probability mass in fixed-point units (1e12 — small enough
    * that every intermediate product fits DECIMAL(38,0) exactly, big
    * enough for 12 significant digits of rank). */
  val MassUnits: Long = 1000000000000L

  /** Damped power iteration for the stationary distribution of the
    * Markov chain defined by an edge-count table `(from_type,
    * to_type, n)` — PageRank with damping 17/20 = 0.85 over weighted
    * edges. Each of the `iters` steps computes
    *
    *   r'(j) = (3·U)/(20·N)  +  (17·D)/(20·N)
    *           + Σᵢ (17 · r(i) · n(i,j)) / (20 · out(i))
    *
    * with U the total mass, N the state count, out(i) the total
    * outgoing edge weight, and D the mass parked on DANGLING states
    * (no outgoing edges) — redistributed uniformly, the standard
    * PageRank correction, so mass is conserved up to truncation.
    *
    * Determinism across engines is the whole design: ranks live as
    * INTEGER mass units and every product/divide is exact integer
    * arithmetic (DECIMAL(38,0) holds 17·r·n without overflow; the
    * truncating `div` matches floor on these all-positive values), so
    * partial-aggregation order cannot perturb a single unit and the
    * result hash-matches an unrolled SQL replay — no float drift
    * after any number of iterations. The final `rank` renders as
    * units/1e12, an IEEE-exact divide of a <2^53 integer by a power
    * of ten.
    *
    * Scale shape: the classic distributed PageRank loop — one
    * (join edges + aggregate by destination) per iteration, dangling
    * mass as a broadcast 1-row aggregate, `localCheckpoint` per step
    * to pin lineage (the kmeans/BPE loop discipline). State count N
    * is a driver scalar (one count job); everything else stays
    * distributed, so millions of states (domains, URLs) iterate at
    * one shuffle per step.
    */
  def stationaryDistribution(edges: DataFrame, iters: Int,
                             driverEdgeLimit: Long = 1000000L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    // Small-graph fast path (the connectedKeepers union-find
    // discipline): below `driverEdgeLimit` edges — a BOUNDED collect —
    // the whole iteration runs on the driver in exact BigInt
    // arithmetic. Identical results by construction (same integer
    // update, same truncation; GraphSpec proves distributed ==
    // sequential bit-for-bit), but ~60 Spark jobs collapse to one
    // collect + one parallelize: iterative plans over tiny state
    // tables are pure scheduler/codegen overhead. The distributed
    // loop below stays the scale path for web-graph-sized inputs.
    // the bounded-count trick needs limit(), which caps at Int.MaxValue
    // — for larger (or "disabled") cutoffs the check can't be made
    // cheaply, so those route straight to the distributed loop rather
    // than mis-detecting a huge graph as collectible
    val smallEnough = driverEdgeLimit < Int.MaxValue.toLong && {
      val edgeCount = edges.limit(driverEdgeLimit.toInt + 1).count()
      edgeCount <= driverEdgeLimit
    }
    if (smallEnough)
      return stationaryOnDriver(edges, iters)
    // states render as STRING in both paths — without this the output
    // schema (and tie order) would depend on which path the data
    // volume selected
    val e = edges.select(col("from_type").cast("string").as("from_type"),
      col("to_type").cast("string").as("to_type"), col("n"))
      .localCheckpoint() // referenced 2x per iteration — pin it once
    val states = e.select(col("from_type").as("state"))
      .unionByName(e.select(col("to_type").as("state")))
      .distinct()
      .localCheckpoint()
    val n = states.count()
    require(n > 0, "stationaryDistribution needs a non-empty edge table")
    val outs = e.groupBy(col("from_type").as("state"))
      .agg(sum(col("n")).as("outn"))
      .localCheckpoint()
    // the dangling state SET is fixed across iterations (only its
    // mass changes) — derive it once instead of an anti-join per step
    val danglingStates = states.join(outs, Seq("state"), "left_anti")
      .localCheckpoint()
    val tele = (3L * MassUnits) / (20L * n)
    var r = states.withColumn("units", lit(MassUnits / n))
    for (i <- 0 until iters) {
      val dangling = r.join(danglingStates, Seq("state"), "left_semi")
        .agg(coalesce(sum(col("units")), lit(0L)).as("d"))
      val contrib = r.join(outs, Seq("state"))
        .join(e, col("state") === col("from_type"))
        .select(col("to_type").as("cstate"),
          expr("CAST(17 AS DECIMAL(38,0)) * units * n div " +
            "(CAST(20 AS DECIMAL(38,0)) * outn)").as("term"))
        .groupBy(col("cstate")).agg(sum(col("term")).as("c"))
      r = states
        .join(contrib, col("state") === col("cstate"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("state"),
          (lit(tele) + expr(s"(17 * d) div (20 * $n)") +
            coalesce(col("c"), lit(0L))).as("units"))
      // pin lineage every few steps, not every step: each checkpoint
      // is an eager job, and per-job latency (not data) dominates the
      // tiny-state case — a 4-step plan stays small while cutting the
      // job count 4×. The final step always checkpoints so callers
      // get a bounded plan.
      if (i % 4 == 3 || i == iters - 1) r = r.localCheckpoint()
    }
    r.select(col("state"), col("units"),
      (col("units").cast("double") / lit(1.0e12)).as("rank"))
      .orderBy(col("units").desc, col("state"))
  }

  /** The driver-side twin of the distributed loop — same integer
    * update, same truncating division (BigInt holds the 17·r·n
    * products the distributed path holds in DECIMAL(38,0)). */
  private def stationaryOnDriver(edges: DataFrame, iters: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val es = edges.select(col("from_type").cast("string"),
      col("to_type").cast("string"), col("n").cast("long"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    require(es.nonEmpty, "stationaryDistribution needs a non-empty edge table")
    val states = (es.map(_._1) ++ es.map(_._2)).distinct.sorted
    val n = states.length.toLong
    val out = es.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val inbound = es.groupBy(_._2)
    val tele = (3L * MassUnits) / (20L * n)
    var r = states.map(_ -> MassUnits / n).toMap
    for (_ <- 0 until iters) {
      val d = states.iterator.filterNot(out.contains).map(r).sum
      val dShare = (17L * d) / (20L * n)
      r = states.map { j =>
        val contrib = inbound.getOrElse(j, Array.empty[(String, String, Long)])
          .iterator.map { case (i, _, w) =>
            ((BigInt(17) * r(i) * w) / (BigInt(20) * out(i))).toLong
          }.sum
        j -> (tele + dShare + contrib)
      }.toMap
    }
    states.toSeq.map(s => (s, r(s), r(s).toDouble / 1.0e12))
      .toDF("state", "units", "rank")
      .orderBy(col("units").desc, col("state"))
  }

  /** Exact triangle count of an undirected graph via degree-ordered
    * orientation (the compact-forward / node-iterator++ scheme,
    * Latapy 2008; also the shape GraphX's TriangleCount uses). Input
    * is any edge list — either direction, duplicates, self-loops all
    * tolerated: edges canonicalize to distinct `a < b` pairs first.
    *
    * Why orientation matters at scale: counting wedges from EVERY
    * vertex explodes on hubs (a degree-d vertex contributes d²/2
    * wedge candidates — a celebrity node in a 100 TB interaction
    * graph is a single-key quadratic bomb). Orienting each edge from
    * its lower (degree, id) endpoint caps every out-degree at
    * O(√m), so total wedge volume is O(m^1.5) worst-case and far less
    * on real skewed graphs — the hub's wedges are charged to its
    * low-degree neighbors instead. Each triangle {x,y,z} then appears
    * EXACTLY once: as the wedge at its (degree,id)-minimal corner
    * closed by the oriented edge between the other two.
    *
    * Shape: one distinct, one degree aggregate joined back (broadcast
    * when the vertex set allows), one wedge self-join on the oriented
    * source, one closing equi-join — all hash joins on keys, never a
    * cross product. Returns one row: (n_nodes, n_edges, n_triangles). */
  def triangleCount(edges: DataFrame, src: String = "src",
                    dst: String = "dst"): DataFrame = {
    val (und, deg, closed) = triangleMachinery(edges, src, dst)
    und.agg(count(lit(1)).as("n_edges"))
      .crossJoin(broadcast(deg.agg(count(lit(1)).as("n_nodes"))))
      .crossJoin(broadcast(closed.agg(count(lit(1)).as("n_triangles"))))
      .select(col("n_nodes"), col("n_edges"), col("n_triangles"))
  }

  /** Local clustering coefficient per vertex — `2·tri(v) / (d(v)·
    * (d(v)−1))`, the "how clique-like is this node's neighborhood"
    * score (community cores vs pure hubs: a celebrity node with
    * thousands of mutually-unacquainted followers scores ~0, a tight
    * working group ~1). Shares [[triangleCount]]'s degree-ordered
    * machinery; the only additions are a 3-way explode of the closed
    * wedges (each triangle credits its three corners) and one keyed
    * aggregate — still O(m^1.5)-bounded, never vertex-centric.
    * Degree-1 vertices have no possible wedge and yield null (0/0 is
    * not "perfectly clustered"); triangle-free vertices score 0. */
  def localClustering(edges: DataFrame, src: String = "src",
                      dst: String = "dst"): DataFrame = {
    val (_, deg, closed) = triangleMachinery(edges, src, dst)
    val perNode = closed
      .select(explode(array(col("u"), col("w1"), col("w2"))).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("n_tri"))
    deg.join(perNode, Seq("v"), "left")
      .select(col("v"), col("d").as("degree"),
        coalesce(col("n_tri"), lit(0L)).as("n_triangles"),
        when(col("d") >= 2,
          round(lit(2.0) * coalesce(col("n_tri"), lit(0L)) /
            (col("d") * (col("d") - 1)), 6))
          .as("clustering_coef"))
      .orderBy(col("v"))
  }

  /** Bounded-depth BFS reachability ([EXT]) — every vertex within
    * `k` undirected hops of the seed set, labeled with its MINIMUM
    * hop distance: the blast-radius query (which parts co-occur
    * within 2 orders of a recalled part; which accounts sit within 3
    * hops of a flagged one). Bounded depth is the point — an
    * unbounded transitive closure on a connected graph is "all of
    * it"; investigations ask "how close".
    *
    * Shape: the classic frontier loop — per hop one equi-join of the
    * (shrinking) frontier against the adjacency list, a distinct,
    * and an anti-join against the reached set, with `localCheckpoint`
    * pinning lineage (the kmeans/BPE loop discipline). Hop count is a
    * query parameter, so the plan is k bounded stages, never a
    * data-dependent fixpoint. Each vertex is labeled once, at its
    * first (= minimum) hop. */
  def kHopReachable(edges: DataFrame, seeds: Seq[Long], k: Int,
                    src: String = "src", dst: String = "dst"): DataFrame = {
    require(seeds.nonEmpty, "kHopReachable needs a non-empty seed set")
    require(k >= 0, s"kHopReachable needs k >= 0: $k")
    val spark = edges.sparkSession
    import spark.implicits._
    val adj = edges.select(col(src).as("a"), col(dst).as("b"))
      .unionAll(edges.select(col(dst).as("a"), col(src).as("b")))
      .where(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .distinct().localCheckpoint()
    var reached = seeds.distinct.toDF("v").withColumn("hop", lit(0L))
    var frontier = reached.select(col("v"))
    for (h <- 1 to k if !frontier.isEmpty) {
      val next = frontier.join(adj, col("v") === col("a"))
        .select(col("b").as("v")).distinct()
        .join(reached.select(col("v")), Seq("v"), "left_anti")
        .localCheckpoint()
      reached = reached.unionAll(next.withColumn("hop", lit(h.toLong)))
        .localCheckpoint()
      frontier = next
    }
    reached.orderBy(col("v"))
  }

  /** Co-purchase edge list from a lineitem-shaped frame: parts
    * sharing a high-quantity order. ONE definition feeds the harness
    * queries (q_triangles / q_clustering_coef / q_khop) AND the
    * ScaleProbe — a threshold change cannot desynchronize the probe
    * from the queries it characterizes. */
  def copurchaseEdges(lineitem: DataFrame, minQuantity: Double = 40): DataFrame = {
    val li = lineitem.where(col("l_quantity") >= minQuantity)
      .select(col("l_orderkey").as("ok"), col("l_partkey"))
    li.select(col("ok"), col("l_partkey").as("pa"))
      .join(li.select(col("ok"), col("l_partkey").as("pb")), Seq("ok"))
      .where(col("pa") < col("pb"))
      .select(col("pa").as("src"), col("pb").as("dst"))
  }

  /** Shared core: canonical undirected edges, degrees, and the
    * closed (u, w1, w2) wedge rows — one row per triangle, anchored
    * at its (degree, id)-minimal corner. */
  private def triangleMachinery(edges: DataFrame, src: String, dst: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val und = edges
      .select(least(col(src), col(dst)).as("a"), greatest(col(src), col(dst)).as("b"))
      .where(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .distinct()
    val deg = und.select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))
    val withDeg = und
      .join(deg.select(col("v").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("v").as("b"), col("d").as("db")), Seq("b"))
    // orient from the (degree, id)-smaller endpoint; a < b already,
    // so the tie on equal degrees keeps the canonical direction
    val oriented = withDeg.select(
      when(col("da") <= col("db"), col("a")).otherwise(col("b")).as("u"),
      when(col("da") <= col("db"), col("b")).otherwise(col("a")).as("v"))
    val wedges = oriented.select(col("u"), col("v").as("w1"))
      .join(oriented.select(col("u"), col("v").as("w2")), Seq("u"))
      .where(col("w1") =!= col("w2"))
    val closed = wedges.join(
      oriented.select(col("u").as("w1"), col("v").as("w2")), Seq("w1", "w2"))
    (und, deg, closed)
  }

  /** Degree distribution ([EXT]) — the first thing to look at on ANY
    * graph (hub structure, power-law tails, disconnection smell):
    * canonical-dedup the edges, count each node's incident edges, and
    * histogram the degrees. Two keyed aggregates; the histogram is
    * bounded by the max degree, never the node count. */
  def degreeDistribution(edges: DataFrame, src: String = "src",
                         dst: String = "dst"): DataFrame = {
    val e = edges.select(least(col(src), col(dst)).as("a"),
        greatest(col(src), col(dst)).as("b"))
      .where(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .distinct()
    e.select(col("a").as("v")).unionAll(e.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("degree"))
      .groupBy(col("degree")).agg(count(lit(1)).as("n_nodes"))
      .orderBy(col("degree"))
  }
}
