package graft

class SparkEntrySpec extends SparkSuite {

  test("every oracle entry has a matching query") {
    val orphans = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(orphans.isEmpty, s"oracleSql keys without a query: $orphans")
  }

  test("rows-only queries are the deliberate exceptions") {
    val rowsOnly = SparkEntry.queries.keySet.diff(SparkEntry.oracleSql.keySet)
    // HLL sketch estimates aren't cross-engine comparable (rsd-bounded
    // in ProfileSpec instead); the BPE training loop is iterative with
    // no SQL oracle (verified against an independent reference
    // implementation in BpeSpec instead); the PCA eigensolve is
    // iterative (alignment/orthonormality/variance laws in
    // SimilaritySpec); DDSketch quantile estimates are engine-private
    // (alpha-bound + merge laws in ProfileSpec). q_cms_heavy_hitters
    // left this set in round 10: the portable fp60 CMS is
    // oracle-replayable, so the CMS family is now hash-certified.
    // q_dd_quantiles and q_quantile_monitor left late in round 10:
    // the walk CERTIFICATE (rank + owning sign/bucket) replays in
    // DuckDB for both the profile query and the stateful streaming
    // monitor; only the float representative stays law-tested
    // (ddQuantiles / quantileMonitor APIs). q_approx_dictionary and
    // q_sketch_dictionary followed via the portable fp60 HLL build
    // (integer register table + integer-exact estimator); the
    // Spark-native HLL twins keep their rsd laws in ProfileSpec.
    // The two remaining are irreducibly loop-shaped: the BPE training
    // loop (bit-exact vs an independent impl in BpeSpec) and the PCA
    // eigensolve (laws in SimilaritySpec; its covariance prefix is
    // hash-certified as q_embedding_cov).
    assert(rowsOnly === Set("q_bpe_train", "q_pca"),
      "every other query must carry a DuckDB oracle")
  }

  test("flagship entry returns rows on the smoke scale") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("registry smoke: every registered query executes against the real sf0.001 files") {
    // Round-7 lesson: every suite built literal DataFrames, so when the
    // driver regenerated events.parquet with a TIMESTAMP_NTZ ts column,
    // 271 tests stayed green while 8 registered queries broke at
    // analysis time. This test runs the actual registry against the
    // actual files so schema drift fails `sbt test`, not the round's
    // correctness report. Loop-style builders that run a full streaming
    // or iterative job inside the query function are exercised by their
    // own dedicated specs and skipped here for time.
    val d = "/root/testdata/sf0.001"
    val loopy = Set("q_stream_ingest_final", "q_bpe_train", "q_kmeans",
      "q_semantic_dedup", "q_semantic_capped", "q_dedup_embeddings", "q_pca",
      "q_two_level_cells", "q_semantic_twolevel", "q_two_level_topk",
      "q_kmeans_wide", "q_two_level_cells_wide", "q_two_level_persisted",
      "q_two_level_knn_multi", "q_two_level_append", "q_two_level_drift",
      "q_two_level_retrain", "q_two_level_compact", "q_pq_append",
      "q_pq_retrain", "q_stream_index_final")
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      if (loopy(name)) None
      else scala.util.Try(fn(spark, d).count()).failed.toOption
        .map(e => s"$name: ${e.toString.linesIterator.take(2).mkString(" | ").take(300)}")
    }
    assert(failures.isEmpty, s"${failures.size} registry queries failed on real testdata:\n" +
      failures.mkString("\n"))
  }

  test("structural plan gate: unpartitioned windows only over bounded tables; ntile nowhere") {
    // The repo's signature scale discipline, asserted MECHANICALLY over
    // the whole registry: an empty-partition Window serializes its
    // input into one task, so it is only ever allowed over a table
    // bounded by a query parameter (tiles, distinct categories,
    // calendar days, bootstrap replicas) — never the fact. Every
    // offender below carries its boundedness justification; a new
    // query that plans a global window over unbounded input fails this
    // test, not the 100 TB deploy. ntile is banned outright: the
    // positional-tile operators ride Pack.positionalTiles instead.
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val d = "/root/testdata/sf0.001"
    // the six loop-style queries are exempt HERE because the whole
    // query is a driver loop / streaming job — but their per-iteration
    // stage plans get the SAME assertions in LoopStageGateSpec, so the
    // exemption covers only the unplannable wrappers
    val loopy = Set("q_stream_ingest_final", "q_bpe_train", "q_kmeans",
      "q_semantic_dedup", "q_semantic_capped", "q_dedup_embeddings", "q_pca",
      "q_two_level_cells", "q_semantic_twolevel", "q_two_level_topk",
      "q_kmeans_wide", "q_two_level_cells_wide", "q_two_level_persisted",
      "q_two_level_knn_multi", "q_two_level_append", "q_two_level_drift",
      "q_two_level_retrain", "q_two_level_compact", "q_pq_append",
      "q_pq_retrain", "q_stream_index_final")
    import org.apache.spark.sql.catalyst.expressions.NTile
    // every allowed empty-partition window runs over a table bounded
    // by a QUERY PARAMETER, never the fact — the justification is the
    // contract; changing this set (either direction) is a reviewable event
    val boundedAllow: Map[String, String] = Map(
      "q_chi2" -> "category spine: |a|x|b| distinct-value cross, psiDrift discipline",
      "q_cramers_v" -> "same chi2 category spine",
      "q_psi_drift" -> "bin spine: nBins rows, a query parameter",
      "q_cumulative_users" -> "day table: calendar-bounded",
      "q_drop_audit" -> "seedCentroids' window runs POST-limit(k): k rows, a query parameter (same as q_kmeans's exempt seed; the audit's other families are window-free)",
      "q_gains" -> "cumulative capture over the `buckets`-row tile table",
      "q_lorenz" -> "same: tile table bounded by `buckets`",
      "q_pq_adc" -> "rank over k centroids per subspace, k a query parameter",
      "q_pq_encode" -> "same k-bounded codebook ranking",
      "q_pq_encode_wide" -> "same k-bounded codebook ranking (k=40 seed window, post-limit)",
      "q_pq_drift" -> "same k-bounded codebook seed ranking (the even-half training windows ride the drift report's lineage)",
      "q_ivfpq_topk" -> "same k-bounded codebook seed ranking (ivfPqTrainEncode trains fresh per invocation, so pqTrainEncode's seed windows ride its lineage; the persisted/multi twins read the built index and never plan the training)",
      "q_share_hierarchy" -> "grand-total window over the 25-row nation aggregate",
      "q_temperature_mix" -> "domain-count table: one row per domain")
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      if (loopy(name)) None
      else scala.util.Try {
        val globals = fn(spark, d).queryExecution.optimizedPlan.collect {
          case w: LWindow if w.partitionSpec.isEmpty => w }
        val globalNtile = globals.exists(_.windowExpressions
          .exists(e => e.collect { case _: NTile => 1 }.nonEmpty))
        (name, globals.nonEmpty, globalNtile)
      }.toOption
    }
    // a PARTITIONED ntile (per-group positional quartiles) is fine;
    // an ntile with no partition spec is the single-task tile sort
    // Pack.positionalTiles exists to kill
    val ntileUsers = offenders.collect { case (n, _, true) => n }
    assert(ntileUsers.isEmpty, s"global ntile planned in: $ntileUsers")
    val globalWindows = offenders.collect { case (n, true, _) => n }.toSet
    assert(globalWindows === boundedAllow.keySet,
      s"empty-partition window set drifted.\n  gained: ${
        (globalWindows -- boundedAllow.keySet).toSeq.sorted.mkString(", ")
      }\n  lost: ${
        (boundedAllow.keySet -- globalWindows).toSeq.sorted.mkString(", ")
      }\nEach allowed entry must be bounded by a query parameter; update the map WITH a justification.")
  }

  test("structural plan gate: cross joins must broadcast-hint their bounded side") {
    // the companion to the window gate: a condition-free Cross join
    // whose build side isn't bounded is an n x m explosion. Round-10
    // tightening (the round-9 verdict's point): a statically-tiny side
    // alone no longer passes — a 100-row side crossed against a 10 B-row
    // fact is safe exactly when the 100 rows BROADCAST, so the explicit
    // hint (which pins the bounded side as the build side, leaving the
    // fact as the probe side) is required unconditionally. The shared
    // predicate lives in PlanGates so the loop-stage gates can't drift.
    val d = "/root/testdata/sf0.001"
    val loopy = Set("q_stream_ingest_final", "q_bpe_train", "q_kmeans",
      "q_semantic_dedup", "q_semantic_capped", "q_dedup_embeddings", "q_pca",
      "q_two_level_cells", "q_semantic_twolevel", "q_two_level_topk",
      "q_kmeans_wide", "q_two_level_cells_wide", "q_two_level_persisted",
      "q_two_level_knn_multi", "q_two_level_append", "q_two_level_drift",
      "q_two_level_retrain", "q_two_level_compact", "q_pq_append",
      "q_pq_retrain", "q_stream_index_final")
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      if (loopy(name)) None
      else scala.util.Try {
        name -> PlanGates.wildCrossJoins(fn(spark, d)).nonEmpty
      }.toOption
    }
    val crossers = offenders.collect { case (n, true) => n }.toSet
    assert(crossers.isEmpty,
      s"condition-free cross joins without an explicit broadcast hint in: ${
        crossers.toSeq.sorted.mkString(", ")
      }\nbroadcast()-wrap the parameter-bounded side (tiny maxRows alone no longer passes).")
  }

  test("structural plan gate: filters reach the scan, projections prune columns") {
    // the PLANS.md pushdown claims as enforced specs, on representative
    // queries — a regression that silently turns a pruned scan into a
    // full read fails here, not in a cluster bill
    val d = "/root/testdata/sf0.001"
    // watermark slice: the > max-id predicate must be IN the parquet scan
    val inc = SparkEntry.queries("q_incremental")(spark, d)
      .queryExecution.executedPlan.toString
    assert(inc.contains("PushedFilters") && inc.contains("GreaterThan"),
      s"watermark filter not pushed into the scan:\n$inc")
    // single-key count: the orders scan must read ONLY the grouping key
    val cpk = SparkEntry.queries("q_count_per_key")(spark, d)
      .queryExecution.executedPlan.toString
    val readSchemas = "ReadSchema: [^\\n]+".r.findAllIn(cpk).toList
    assert(readSchemas.nonEmpty && readSchemas.forall(s =>
        s.contains("o_custkey") && !s.contains("o_totalprice") && !s.contains("o_orderdate")),
      s"count-per-key reads more than the key column:\n$cpk")
    // pricing summary: the lineitem scan must not read join-only columns
    val ps = SparkEntry.queries("q_pricing_summary")(spark, d)
      .queryExecution.executedPlan.toString
    val psSchemas = "ReadSchema: [^\\n]+".r.findAllIn(ps).toList
    assert(psSchemas.nonEmpty && psSchemas.forall(s =>
        !s.contains("l_comment") && !s.contains("l_shipmode")),
      s"pricing summary reads unprojected columns:\n$ps")
    // documents family: a text-stats query must not drag the unused
    // corpus columns (lang/source/n_chars) through the scan — at
    // 100 TB, `text` is the payload and the rest is free only if pruned
    val ds = SparkEntry.queries("q_doc_stats")(spark, d)
      .queryExecution.executedPlan.toString
    val dsSchemas = "ReadSchema: [^\\n]+".r.findAllIn(ds).toList
    assert(dsSchemas.nonEmpty && dsSchemas.forall(s =>
        !s.contains("lang") && !s.contains("source") && !s.contains("n_chars")),
      s"doc_stats reads unused corpus columns:\n$ds")
    // embeddings family: the kNN scan must not read the label column
    val knn = SparkEntry.queries("q_knn_small")(spark, d)
      .queryExecution.executedPlan.toString
    val knnSchemas = "ReadSchema: [^\\n]+".r.findAllIn(knn).toList
    assert(knnSchemas.nonEmpty && knnSchemas.forall(s => !s.contains("label")),
      s"knn reads the unused label column:\n$knn")
  }

  test("q_sql_topk (SQL text surface) matches q_topk_cosine (Column API)") {
    val d = "/root/testdata/sf0.001"
    val viaCol = SparkEntry.queries("q_topk_cosine")(spark, d).collect().toSeq
    val viaSql = SparkEntry.queries("q_sql_topk")(spark, d).collect().toSeq
    assert(viaSql === viaCol)
  }

  test("oracle_sql.json content round-trips through a strict JSON parser") {
    import org.json4s.jackson.JsonMethods
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${JsonEscape(k)}: ${JsonEscape(v)}" }.mkString("{", ",", "}")
    val parsed = JsonMethods.parse(json)
    val keys = parsed.values.asInstanceOf[Map[String, String]]
    assert(keys.keySet === SparkEntry.oracleSql.keySet)
    assert(keys("q_pricing_summary").contains("DECIMAL(18,2)"))
  }

  test("JsonEscape handles quotes, backslashes, and control characters") {
    import org.json4s.jackson.JsonMethods
    val nasty = "a\"b\\c\nd\te\rfg"
    val parsed = JsonMethods.parse(s"{${JsonEscape("k")}: ${JsonEscape(nasty)}}")
    assert(parsed.values.asInstanceOf[Map[String, String]]("k") === nasty)
  }
}
