package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{PlanGates, SparkSuite}
import graft.sources.Tables

/** Closes the structural-gate blind spot the round-9 verdict named:
  * the six loop-style registry queries (`q_stream_ingest_final`,
  * `q_bpe_train`, `q_kmeans`, `q_semantic_dedup`, `q_dedup_embeddings`,
  * `q_pca`) are exempt from the registry-wide window/cross-join gates
  * because the whole query is a driver loop or a streaming job — but
  * their PER-ITERATION stage plans are exactly where a global window or
  * wild cross join could silently land. This spec gates each family's
  * stage functions directly: every DataFrame a loop iteration (or one
  * streaming micro-batch) plans gets the same assertions the other 258
  * queries get. The loopy exemption in SparkEntrySpec now covers only
  * the genuinely unplannable wrappers (the driver loop / the streaming
  * harness), not the dataflow inside them. */
class LoopStageGateSpec extends SparkSuite {

  private val d = "/root/testdata/sf0.001"
  private def docs: DataFrame = Tables.load(spark, d, "documents")
  private def emb: DataFrame = Tables.load(spark, d, "embeddings")

  test("k-means loop stages: seed, assignment, centroid update (q_kmeans, PQ)") {
    // seedCentroids' global window is allowed: it runs POST-limit(k),
    // so the single task holds exactly k rows — a query parameter
    // (same contract as the registry gate's boundedAllow entries)
    val seeds = Clustering.seedCentroids(emb, 8, "vec_id", "embedding")
    PlanGates.assertCleanStage("seedCentroids", seeds, allowGlobalWindow = true)
    assert(!PlanGates.hasGlobalNtile(seeds))
    // iteration 1 inherits the seed window in its broadcast subtree —
    // still k-bounded, so allowed with the same justification
    val assigned = Clustering.assignCells(emb, seeds, "vec_id", "embedding")
    PlanGates.assertCleanStage("assignCells (iter 1)", assigned,
      allowGlobalWindow = true)
    // checkpoint severs the seed lineage so each later stage is judged
    // on ITS OWN dataflow (the per-iteration plan), not iteration 1's
    val pinned = assigned.localCheckpoint()
    val cent2 = Clustering.updateCentroids(pinned)
    PlanGates.assertCleanStage("updateCentroids", cent2)
    // steady state (every iteration after the first): centroids come
    // from updateCentroids — the plan must be STRICTLY clean
    PlanGates.assertCleanStage("assignCells (steady state)",
      Clustering.assignCells(emb, cent2, "vec_id", "embedding"))
  }

  test("BPE loop stages: word table, pair counts, merge application (q_bpe_train)") {
    val vocab = Bpe.wordTable(docs)
    PlanGates.assertCleanStage("wordTable", vocab)
    // the per-iteration argmax source: weighted adjacent-pair counts
    // over the current segmentation
    PlanGates.assertCleanStage("pairCounts", Bpe.pairCounts(vocab))
    // the per-iteration state update: mergeFold applied to the vocab
    PlanGates.assertCleanStage("mergeFold step",
      vocab.select(col("word"), Bpe.mergeFold(col("syms"), "t", "h").as("syms"),
        col("cnt")))
  }

  test("PCA stages: moment pass and projection (q_pca)") {
    // the distributed prefix q_embedding_cov certifies by hash; gate
    // its plan here too so the loop family owns the assertion
    PlanGates.assertCleanStage("embeddingCovariance",
      Similarity.embeddingCovariance(emb, dim = 64))
    // the post-eigensolve projection — the only other distributed plan
    // in the family (the eigensolve itself is a driver-side iteration
    // over the collected dim x dim moment matrix, a query parameter)
    PlanGates.assertCleanStage("pcaProject",
      Similarity.pcaProject(emb, k = 4, dim = 64))
  }

  test("semantic-dedup join stage (q_semantic_dedup)") {
    // semanticDedup checkpoints the Lloyd assignment (lazily — the
    // LogicalRDD boundary exists at plan time either way), so the
    // returned frame's plan IS the per-run pair-join stage — gate it
    PlanGates.assertCleanStage("semanticDedup pair stage",
      Clustering.semanticDedup(emb, k = 8, threshold = 0.35))
  }

  test("two-level quantizer loop stages (q_two_level_cells, q_semantic_twolevel)") {
    // the fine level's seed window is PARTITIONED by the coarse cell
    // (bounded per-cell, never global); each fine iteration's assign +
    // grouped micro-sum update must plan clean on its own dataflow
    val coarse = Clustering.assignCells(emb,
        Clustering.seedCentroids(emb, 4, "vec_id", "embedding"),
        "vec_id", "embedding")
      .select(col("vec_id"), col("__v"), col("cell").as("cell1"))
      .localCheckpoint()
    // full first-shot plan: seeds + assignment in one dataflow
    PlanGates.assertCleanStage("two-level fine seed+assign",
      Clustering.twoLevelAssign(emb, k1 = 4, k2 = 4))
    // steady state: the pair stage over the combined cells
    PlanGates.assertCleanStage("semanticDedupTwoLevel pair stage",
      Clustering.semanticDedupTwoLevel(emb, k1 = 4, k2 = 4, threshold = 0.35))
    assert(coarse.count() > 0)
  }

  test("wide-k norm-trick loop stages (q_kmeans_wide, q_two_level_cells_wide)") {
    // same gate battery as the small-k stages, PLUS the branch
    // assertion: past kHint=ExactArgminMaxK the plan must carry the
    // codegen'd graft_dot norm trick, not the interpreted HOF dist2
    // over all (vector, centroid) pairs — the at-scale arithmetic the
    // registered wide rows now hash-certify per round
    val seeds = Clustering.seedCentroids(emb, 40, "vec_id", "embedding")
    val assigned = Clustering.assignCells(emb, seeds, "vec_id", "embedding",
      kHint = 40)
    PlanGates.assertCleanStage("assignCells wide (iter 1)", assigned,
      allowGlobalWindow = true)
    assert(assigned.queryExecution.optimizedPlan.toString.contains("graft_dot"),
      "kHint>ExactArgminMaxK assignCells did not take the codegen'd norm-trick branch")
    val cent2 = Clustering.updateCentroids(assigned.localCheckpoint())
    val steady = Clustering.assignCells(emb, cent2, "vec_id", "embedding",
      kHint = 40)
    PlanGates.assertCleanStage("assignCells wide (steady state)", steady)
    assert(steady.queryExecution.optimizedPlan.toString.contains("graft_dot"))
    // wide FINE level: the coarse assignment is checkpointed inside
    // twoLevelCore, so this plan IS the fine seed+assign dataflow —
    // its seed window is partitioned by cell1, and the k2=40 assign
    // must norm-trick
    val tl = Clustering.twoLevelAssign(emb, k1 = 2, k2 = 40)
    PlanGates.assertCleanStage("twoLevelAssign wide fine", tl)
    assert(tl.queryExecution.optimizedPlan.toString.contains("graft_dot"),
      "kHint>ExactArgminMaxK tlAssign did not take the codegen'd norm-trick branch")
    // wide PQ level: q_pq_encode_wide's m=4, k=40 config — the third
    // at-scale argmin spelling, same branch gate as the other two
    val slices = Clustering.pqSlices(emb, m = 4, dim = 64, "vec_id", "embedding")
      .localCheckpoint()
    val seedIds = emb.orderBy(col("vec_id")).limit(40)
      .select(col("vec_id"),
        (row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("vec_id"))) - 1).as("cell"))
    val pqCbs = slices.join(broadcast(seedIds), Seq("vec_id"))
      .select(col("subspace"), col("cell"), col("sv").as("cvec"))
      .localCheckpoint()
    val pq = Clustering.pqAssign(slices, pqCbs, "vec_id", kHint = 40)
    PlanGates.assertCleanStage("pqAssign wide", pq)
    assert(pq.queryExecution.optimizedPlan.toString.contains("graft_dot"),
      "kHint>ExactArgminMaxK pqAssign did not take the codegen'd norm-trick branch")
    // the streaming maintenance loop's per-batch append stage: the
    // frozen assign is the norm trick UNCONDITIONALLY (not a
    // codebook-count branch), and its plan must be clean
    val frozenCbs = (0 until 16).map(i =>
      (i.toLong, Array.fill(64)(i.toDouble / 16))).toArray
    val frozen = Clustering.twoLevelAssignFrozen(emb, frozenCbs)
    PlanGates.assertCleanStage("twoLevelAssignFrozen (append stage)", frozen)
    assert(frozen.queryExecution.optimizedPlan.toString.contains("graft_dot"),
      "twoLevelAssignFrozen did not take the codegen'd norm-trick branch")
  }

  test("embedding-CC dedup stages: LSH candidate pairs, keeper join (q_dedup_embeddings)") {
    PlanGates.assertCleanStage("lshSimilarPairs",
      Similarity.lshSimilarPairs(emb, threshold = 0.3, dim = 64))
    // the full operator's returned plan: keeper-root left join after
    // the (bounded) union-find — the union-find itself consumes the
    // gated pair stage above
    PlanGates.assertCleanStage("dedupByEmbedding output",
      Similarity.dedupByEmbedding(emb, threshold = 0.3, dim = 64))
  }

  test("streaming-ingest micro-batch stages (q_stream_ingest_final)") {
    // one foreachBatch body = keyed content dedup + exact fingerprint
    // anti-join vs the index + near-dup probe vs persisted signatures;
    // build each against real sf0.001 shapes and gate the plans
    val batch = docs.limit(500)
    val reps = Dedup.keyedDeterministicAgg(
      batch.withColumn("__fp", graft.functions.Text.fingerprint(col("text"))),
      Seq("__fp"), "doc_id")
    PlanGates.assertCleanStage("batch content dedup", reps)
    val index = Dedup.fingerprintIndex(docs)
    PlanGates.assertCleanStage("newDocsByFingerprint (exact verify)",
      Dedup.newDocsByFingerprint(
        reps.select(col("doc_id"), col("__fp").as("fingerprint")), index,
        bloom = null))
    val bSigs = Dedup.minhashSignatures(batch, "doc_id", "text")
    val history = Dedup.minhashSignatures(docs, "doc_id", "text")
    PlanGates.assertCleanStage("newNearBySignatures (near probe)",
      Dedup.newNearBySignatures(bSigs, history, maxBucket = 64))
  }
}
