package graft.operators

import graft.expressions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Engine-exact Lloyd k-means over an embedding column ([EXT]) — the
  * trained coarse quantizer behind IVF ANN indexes and corpus
  * clustering reports (topic balance, dedup-cluster audits).
  *
  * Two k-means flavors coexist deliberately:
  *  - [[Similarity.ivfIndex]] wraps Spark ML's KMeans — fast,
  *    well-tuned (k-means||), but its float-sum reductions make the
  *    trained centroids partitioning-DEPENDENT (run-to-run drift), so
  *    results can't be oracled or reproduced bit-exactly;
  *  - this implementation is fully deterministic: seeds are the k
  *    lowest-id vectors, every centroid update is an exact integer
  *    micro-sum (same discipline as [[Similarity.labelCentroids]]),
  *    and distances fold left-to-right — identical bits on ANY
  *    partitioning and ANY engine that follows the same order. That
  *    buys reproducible index builds (a re-run of a 100 TB index job
  *    produces byte-identical cell assignments) at the cost of a
  *    dumber init than k-means||.
  *
  * Scale shape per iteration: one broadcast cross join (k centroid
  * rows against the corpus — k·dim doubles, always broadcastable),
  * one map-side-combinable argmin aggregate by vector id, one
  * (cell, pos) micro-sum aggregate whose shuffle carries k·dim rows
  * per task — flat in corpus size. `iters` is a driver loop of
  * distributed jobs (Lloyd is inherently synchronous); each iteration
  * re-reads the input, so callers at scale should cache/persist the
  * embedding projection across iterations.
  */
object Clustering {

  /** Squared L2 distance with left-to-right fold order — the order
    * DuckDB's `list_reduce` uses, so oracle distances are
    * bit-identical. Products (x-y)² are never -0.0, so the 0.0 init
    * is exact. */
  def dist2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), _ + _)

  /** Deterministic seeds: the k lowest-id vectors, cell ids 0..k-1 in
    * id order. The window runs on k rows post-limit (TakeOrdered picks
    * them in parallel); the single-task window is bounded by k. */
  def seedCentroids(embeddings: DataFrame, k: Int,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    embeddings.orderBy(col(idCol)).limit(k)
      .select((row_number().over(Window.orderBy(col(idCol))) - 1).as("cell"),
        Similarity.asDouble(col(vecCol)).as("cvec"))

  /** Assign every vector to its nearest centroid (ties broken by the
    * lower cell id). `centroids` is a (cell, cvec array<double>)
    * frame — k rows, always broadcast. The argmin is a min-of-struct
    * hash aggregate (map-side combinable), NOT a window — a window
    * would sort the full k×n candidate set. */
  def assignCells(embeddings: DataFrame, centroids: DataFrame,
                  idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    embeddings
      .select(col(idCol), Similarity.asDouble(col(vecCol)).as("__v"))
      .crossJoin(broadcast(centroids))
      .select(col(idCol), col("__v"),
        struct(dist2(col("__v"), col("cvec")).as("d"), col("cell").as("cell")).as("__dc"))
      .groupBy(col(idCol))
      // every row of the group carries the same __v (it's keyed by the
      // vector id), so first() is deterministic here
      .agg(min(col("__dc")).as("__m"), first(col("__v")).as("__v"))
      .select(col(idCol), col("__v"),
        col("__m.cell").as("cell"), col("__m.d").as("dist2"))

  /** One Lloyd update: per-(cell, dim) exact micro-sums, rendered as
    * double centroids. Empty cells drop out (their seed was a
    * duplicate of an earlier one and lost every tie) — standard Lloyd
    * behavior, deterministic here. */
  def updateCentroids(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cell"), posexplode(col("__v")).as(Seq("pos", "v")))
      .groupBy(col("cell"), col("pos"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("v") * 1000000, 0).cast("long")).as("s"))
      .groupBy(col("cell"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"),
          (col("s").cast("double") / col("n") / lit(1000000.0)).as("c")))),
        x => x.getField("c")).as("cvec"))

  /** `iters` Lloyd iterations from the deterministic seeds; the raw
    * final assignment (id, __v, cell, dist2) for operators that need
    * the double vectors alongside the cells. */
  private[operators] def lloydAssign(embeddings: DataFrame, k: Int, iters: Int,
                                     idCol: String, vecCol: String): DataFrame = {
    require(k > 0 && iters > 0, s"k and iters must be positive: k=$k iters=$iters")
    var centroids = seedCentroids(embeddings, k, idCol, vecCol)
    var assigned = assignCells(embeddings, centroids, idCol, vecCol)
    for (_ <- 2 to iters) {
      centroids = updateCentroids(assigned)
      assigned = assignCells(embeddings, centroids, idCol, vecCol)
    }
    assigned
  }

  /** `iters` full Lloyd iterations from the deterministic seeds.
    * Returns the final per-vector assignment: (id, cell, dist2). */
  def kmeans(embeddings: DataFrame, k: Int, iters: Int,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    lloydAssign(embeddings, k, iters, idCol, vecCol)
      .select(col(idCol), col("cell"), round(col("dist2"), 6).as("dist2"))
      .orderBy(col(idCol))

  /** SemDeDup-style semantic dedup ([EXT]; Abbas et al. 2023,
    * arXiv:2303.09540): cluster the embedding space with the
    * deterministic quantizer, then compare vectors ONLY within their
    * cell — a pair of semantic near-dups lands in the same cell with
    * high probability, so the quadratic pair stage is bounded by the
    * cell size, never the corpus. A vector is dropped when a
    * same-cell neighbor with a SMALLER id has cosine >= `threshold`
    * (the repo's one-hop min-id keeper convention, matching
    * [[Dedup.dedupDocuments]]); chains beyond one hop are the CC
    * variant's job ([[Similarity.dedupByEmbedding]]).
    *
    * Returns every vector: (id, cell, keep) — the keep flag rather
    * than a filtered table, so the drop rate is auditable per cell.
    *
    * Scale shape: the k-row centroid set broadcasts; assignment is
    * one map-side-combinable argmin per vector; the pair stage is a
    * cell-keyed self-equi-join (never all-pairs). At 100 TB, k grows
    * with the corpus (cells of ~10-100k vectors), and `maxCell`
    * guards the skew tail: cells larger than the cap contribute NO
    * pairs — conservative (their vectors all survive) and monitored,
    * the same contract as the LSH hot-bucket caps. */
  def semanticDedup(embeddings: DataFrame, k: Int, threshold: Double,
                    iters: Int = 2, maxCell: Int = 0,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // the assignment feeds BOTH self-join sides and the output frame;
    // left declarative, the whole iterative Lloyd subtree (2 shuffles
    // + a broadcast per iteration) replays three times — checkpoint
    // once, reuse thrice (same discipline as connectedKeepers)
    val assigned = lloydAssign(embeddings, k, iters, idCol, vecCol)
      .withColumn("__nrm", sqrt(GraftFunctions.dot(col("__v"), col("__v"))))
      .localCheckpoint()
    val pruned =
      if (maxCell > 0) {
        val sizes = assigned.groupBy(col("cell")).agg(count(lit(1)).as("__n"))
        assigned.join(sizes, Seq("cell")).where(col("__n") <= maxCell).drop("__n")
      } else assigned
    val a = pruned.select(col("cell"), col(idCol).as("__ida"),
      col("__v").as("__va"), col("__nrm").as("__na"))
    val b = pruned.select(col("cell"), col(idCol).as("__idb"),
      col("__v").as("__vb"), col("__nrm").as("__nb"))
    // distinct ids, not pairs: only the "has any smaller near-neighbor"
    // bit survives, so the shuffle after the join carries one row per
    // dropped vector
    val dropped = a.join(b, Seq("cell"))
      .where(col("__ida") < col("__idb"))
      .where(GraftFunctions.dot(col("__va"), col("__vb")) / (col("__na") * col("__nb"))
        >= threshold)
      .select(col("__idb").as(idCol)).distinct()
      .withColumn("__drop", lit(true))
    assigned.select(col(idCol), col("cell"))
      .join(dropped, Seq(idCol), "left")
      .select(col(idCol), col("cell"), col("__drop").isNull.as("keep"))
      .orderBy(col(idCol))
  }

  /** IVF index built on the DETERMINISTIC quantizer: same (assigned,
    * centroids) contract as [[Similarity.ivfIndex]] — probe with
    * [[Similarity.ivfTopK]], persist with [[Similarity.ivfWriteIndex]]
    * — but reproducible bit-exactly across runs and partitionings.
    * The k-row centroid collect is a bounded driver action (query
    * parameters for the probe side), not a data collect. */
  def ivfIndexExact(embeddings: DataFrame, nCells: Int, iters: Int = 3,
                    idCol: String = "vec_id", vecCol: String = "embedding")
      : (DataFrame, Array[Array[Double]]) = {
    var centroids = seedCentroids(embeddings, nCells, idCol, vecCol)
    for (_ <- 2 to iters)
      centroids = updateCentroids(assignCells(embeddings, centroids, idCol, vecCol))
    val assigned = assignCells(embeddings, centroids, idCol, vecCol)
      .select(col(idCol), col("cell").as("__cell"))
      .join(embeddings, Seq(idCol))
    val centers = centroids.collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).sortBy(_._1)
    // cells are re-packed densely for ivfTopK's positional centroid
    // array; assignment rows keep the original cell ids, so remap
    val remap = centers.map(_._1).zipWithIndex.toMap
    val remapCol = map(remap.flatMap { case (o, n) => Seq(lit(o), lit(n)) }.toSeq: _*)
    (assigned.withColumn("__cell", element_at(remapCol, col("__cell"))),
      centers.map(_._2))
  }
}
