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

  /** Largest k for which [[assignCells]]/[[tlAssign]]/[[pqAssign]]
    * use the exact left-fold argmin; past it they score with the
    * codegen'd norm trick. This bound is an ORACLE boundary, not a
    * performance crossover: the round-12 ProbeOp sweep (×100, 200 k
    * vectors, d=64, k ∈ {2,4,8,16,24,32,40,64}) found NO crossover —
    * the norm trick wins at every k, 2.6× at k=2 (1.30 vs 3.35 s)
    * through 17× at k=32 (2.60 vs 44.3 s), because the left-fold HOF
    * lambda is interpreted while graft_dot is codegen'd, and the
    * trick's winner-join overhead is a constant ~1 s at this scale.
    * The exact branch is kept ONLY as the bit-certifiable spelling
    * whose DuckDB replay (lloydCtes left-fold argmin) matches by
    * construction; the bound sits just above the largest k any
    * REGISTERED row replays exactly (side = 9, the
    * q_semantic_twolevel_auto derivation at the sf0.1 gate —
    * ClusteringSpec pins that derivation AND every other exact-oracled
    * registry k under this bound). Every deployment-scale k takes the
    * norm trick, which carries its own by-construction certificates
    * for all three assignment spellings (q_kmeans_wide,
    * q_two_level_cells_wide, q_pq_encode_wide) — and q_pq_recall's
    * k=16 training replay is the wide spelling too (pqWideCtes), so
    * no registered row pairs a norm-trick run with an exact-fold
    * oracle. */
  val ExactArgminMaxK: Int = 9

  /** Squared L2 distance with left-to-right fold order — the order
    * DuckDB's `list_reduce` uses, so oracle distances are
    * bit-identical. Products (x-y)² are never -0.0, so the 0.0 init
    * is exact.
    *
    * Round 16: the spelling moved from the `aggregate(zip_with(...))`
    * higher-order functions (interpreted lambda per element, an
    * intermediate array per row) to the codegen'd
    * [[graft.expressions.Dist2]] native loop — SAME arithmetic, SAME
    * fold order, bit-identical results (Dist2Spec pins HOF == native
    * on real embeddings); event-log profiling showed the interpreted
    * fold as the dominant task time of every small-k training row. */
  def dist2(a: Column, b: Column): Column = GraftFunctions.dist2(a, b)

  /** Deterministic seeds: the k lowest-id vectors, cell ids 0..k-1 in
    * id order. The window runs on k rows post-limit (TakeOrdered picks
    * them in parallel); the single-task window is bounded by k. */
  def seedCentroids(embeddings: DataFrame, k: Int,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    embeddings.orderBy(col(idCol)).limit(k)
      .select((row_number().over(Window.orderBy(col(idCol))) - 1).as("cell"),
        Similarity.asDouble(col(vecCol)).as("cvec"))

  /** Largest candidate count the single-pass row-wise argmin
    * ([[argminOverSlots]]) unrolls statically. The unrolled spelling
    * removes the per-assignment corpus shuffle (see [[assignCells]]),
    * but its plan grows linearly with the slot count — deployment-
    * scale FROZEN assigns can carry 10^5 candidates, where the
    * join+aggregate spelling remains the right shape. Every registered
    * training/append row sits well under this bound (largest: k=40,
    * the q_kmeans_wide / q_two_level_cells_wide norm-trick rows). */
  val ArgminUnrollMaxK: Int = 64

  /** Row-wise argmin over the first `n` slots of a per-row candidate
    * array `cands` (array<struct<cell, cvec[, __cn2]>>, sorted by
    * cell): evaluates the same per-candidate distance the aggregate
    * spelling evaluates — exact left-fold [[dist2]], or the norm-trick
    * score ‖c‖²−2·v·c when `wide` — and takes `least` over the
    * (d, cell) structs, which is the SAME lexicographic ordering
    * min-of-struct used, so winners and tie-breaks (lower cell id) are
    * bit-identical. Slots past the array's end are null and least
    * skips them; a candidate array longer than `n` raises rather than
    * silently dropping candidates. The wide struct carries the slot
    * position so the caller can fetch the winner's centroid without a
    * join (ordering never reaches it: cell is unique per array). */
  private def argminOverSlots(cands: Column, n: Int, v: Column,
                              wide: Boolean): Column = {
    val slots = (1 to n).map { i =>
      val c = element_at(cands, i)
      val d =
        if (wide) c.getField("__cn2") -
          lit(2.0) * GraftFunctions.dot(v, c.getField("cvec"))
        else dist2(v, c.getField("cvec"))
      val s =
        if (wide) struct(d.as("d"), c.getField("cell").as("cell"),
          lit(i).as("__pos"))
        else struct(d.as("d"), c.getField("cell").as("cell"))
      when(size(cands) >= i, s)
    }
    val best = if (slots.size == 1) slots.head else least(slots: _*)
    when(size(cands) <= n, best)
      .otherwise(raise_error(concat(
        lit(s"argminOverSlots: candidate count exceeds unroll bound $n: "),
        size(cands).cast("string"))))
  }

  /** Assign every vector to its nearest centroid (ties broken by the
    * lower cell id). `centroids` is a (cell, cvec array<double>)
    * frame — k rows, always broadcast.
    *
    * `kHint` picks the argmin arithmetic: the small-k form evaluates
    * the exact left-fold [[dist2]] on every (vector, centroid) pair —
    * the bit-reproducible, oracle-replayable spelling the small-k
    * REGISTERED queries use (k ≤ [[ExactArgminMaxK]]). Past that the
    * wide form scores with the codegen'd [[GraftFunctions.dot]] via
    * the norm trick — argmin_c (‖c‖² − 2·v·c), the ‖v‖² shift being
    * constant per vector — then recomputes the TRUE exact dist2 only
    * for the n winners. Same cells up to floating-point near-ties
    * (different summation order can flip an exactly-equidistant pair);
    * the wide path carries its own by-construction oracles
    * (q_kmeans_wide / q_two_level_cells_wide replay the norm-trick
    * spelling verbatim), and the emitted dist2 column is always the
    * exact spelling.
    *
    * `nCands` (round 16) is the TRUE upper bound on centroid rows when
    * the caller knows it: 0 < nCands ≤ [[ArgminUnrollMaxK]] selects the
    * single-pass row-wise argmin — all k centroids ride ONE broadcast
    * row as a sorted candidate array and [[argminOverSlots]] unrolls
    * the same per-candidate arithmetic into a codegen'd projection.
    * That removes the crossJoin→groupBy(id) exchange, which shuffled
    * the whole corpus WITH its vector payload once per Lloyd iteration
    * (at 100 TB, the dominant training cost; locally, most of every
    * training row's fixed overhead — event-log profiled round 16).
    * Identical output values and tie-breaks by construction
    * (ArgminUnrollSpec pins both branch pairs bit-for-bit); with
    * nCands = 0 (unknown) or above the bound, the aggregate spellings
    * below remain. One behavioral note: the aggregate spelling
    * collapsed duplicate ids to one row (nondeterministically via
    * first(__v)); the unrolled spelling keeps one row per input row —
    * every graft caller feeds unique ids, where the two agree. */
  def assignCells(embeddings: DataFrame, centroids: DataFrame,
                  idCol: String = "vec_id", vecCol: String = "embedding",
                  kHint: Int = 0, nCands: Int = 0): DataFrame = {
    val v = embeddings.select(col(idCol), Similarity.asDouble(col(vecCol)).as("__v"))
    val wide = kHint > ExactArgminMaxK
    if (nCands > 0 && nCands <= ArgminUnrollMaxK) {
      val candStruct =
        if (wide) struct(col("cell"), col("cvec"),
          GraftFunctions.dot(col("cvec"), col("cvec")).as("__cn2"))
        else struct(col("cell"), col("cvec"))
      val cands = broadcast(centroids
        .agg(array_sort(collect_list(candStruct)).as("__cands"))
        .withColumn("__j", lit(1)))
      val joined = v.withColumn("__j", lit(1)).join(cands, Seq("__j"))
        // the aggregate spelling's inner join drops every row when the
        // centroid side is empty; the global agg instead emits one
        // empty-array row — filter it for exact equivalence
        .where(size(col("__cands")) > 0)
      val best = argminOverSlots(col("__cands"), nCands, col("__v"), wide)
      if (wide)
        joined.select(col(idCol), col("__v"),
          best.getField("cell").as("cell"),
          dist2(col("__v"), element_at(col("__cands"), best.getField("__pos"))
            .getField("cvec")).as("dist2"))
      else
        joined.select(col(idCol), col("__v"),
          best.getField("cell").as("cell"), best.getField("d").as("dist2"))
    } else if (wide) {
      val cn = broadcast(centroids.select(col("cell"), col("cvec"),
        GraftFunctions.dot(col("cvec"), col("cvec")).as("__cn2")))
      val arg = v.crossJoin(cn)
        .select(col(idCol), struct(
          (col("__cn2") - lit(2.0) * GraftFunctions.dot(col("__v"), col("cvec"))).as("d"),
          col("cell").as("cell")).as("__dc"))
        .groupBy(col(idCol)).agg(min(col("__dc")).as("__m"))
        .select(col(idCol), col("__m.cell").as("cell"))
      v.join(arg, Seq(idCol))
        .join(broadcast(centroids.select(col("cell"), col("cvec"))), Seq("cell"))
        .select(col(idCol), col("__v"), col("cell"),
          dist2(col("__v"), col("cvec")).as("dist2"))
    } else
      v.crossJoin(broadcast(centroids))
        .select(col(idCol), col("__v"),
          struct(dist2(col("__v"), col("cvec")).as("d"), col("cell").as("cell")).as("__dc"))
        .groupBy(col(idCol))
        // every row of the group carries the same __v (it's keyed by the
        // vector id), so first() is deterministic here
        .agg(min(col("__dc")).as("__m"), first(col("__v")).as("__v"))
        .select(col(idCol), col("__v"),
          col("__m.cell").as("cell"), col("__m.d").as("dist2"))
  }

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
    var assigned = assignCells(embeddings, centroids, idCol, vecCol, kHint = k, nCands = k)
    for (_ <- 2 to iters) {
      centroids = updateCentroids(assigned)
      assigned = assignCells(embeddings, centroids, idCol, vecCol, kHint = k, nCands = k)
    }
    assigned
  }

  /** The cells a [[semanticDedup]] `maxCell` cap discards, with their
    * sizes — the monitoring twin of [[graft.operators.Dedup.droppedBuckets]]
    * / [[graft.operators.Fuzzy.droppedBlocks]] for the embedding-space
    * family: cells larger than the cap contribute NO pairs
    * (conservative — their vectors all survive), and this report is
    * where that discarded pair mass becomes visible. Bounded by k
    * rows. */
  def droppedCells(embeddings: DataFrame, k: Int, maxCell: Int,
                   iters: Int = 2, idCol: String = "vec_id",
                   vecCol: String = "embedding"): DataFrame = {
    require(maxCell > 0, "droppedCells needs a positive cap")
    lloydAssign(embeddings, k, iters, idCol, vecCol)
      .groupBy(col("cell")).agg(count(lit(1)).as("n_members"))
      .where(col("n_members") > maxCell)
      .select(col("cell"), col("n_members"))
      .orderBy(col("cell"))
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
    * the same contract as the LSH hot-bucket caps.
    *
    * `maxCell` DEFAULTS to a finite cap (1024 — ≤2^20 within-cell pair
    * evaluations per cell): the ×100 decade probe measured the
    * uncapped form at 52× wall growth per data decade (at fixed k,
    * cells grow linearly with the corpus and the within-cell join is
    * quadratic in cell size), so uncapped is the explicit opt-in
    * (`maxCell = 0`), never the default a deployment inherits. */
  def semanticDedup(embeddings: DataFrame, k: Int, threshold: Double,
                    iters: Int = 2, maxCell: Int = 1024,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // the assignment feeds BOTH self-join sides and the output frame;
    // left declarative, the whole iterative Lloyd subtree (2 shuffles
    // + a broadcast per iteration) replays three times — checkpoint
    // once, reuse thrice (same discipline as connectedKeepers).
    // eager = false: construction stays free, the pin lands on first
    // action
    val assigned = lloydAssign(embeddings, k, iters, idCol, vecCol)
      .select(col(idCol), col("__v"), col("cell"))
      .localCheckpoint(eager = false)
    cellPairKeep(assigned, threshold, maxCell, idCol)
  }

  /** The SemDeDup pair stage, shared by the flat ([[semanticDedup]])
    * and two-level ([[semanticDedupTwoLevel]]) quantizers: within each
    * `cell`, a vector drops when a SMALLER-id neighbor has cosine >=
    * `threshold`; cells above `maxCell` contribute no pairs
    * (conservative — their vectors all survive; [[droppedCells]] is
    * the monitor). `assigned` must carry (idCol, __v, cell). */
  private def cellPairKeep(assigned: DataFrame, threshold: Double,
                           maxCell: Int, idCol: String): DataFrame = {
    val normed = assigned
      .withColumn("__nrm", sqrt(GraftFunctions.dot(col("__v"), col("__v"))))
    val pruned =
      if (maxCell > 0) {
        val sizes = normed.groupBy(col("cell")).agg(count(lit(1)).as("__n"))
        normed.join(sizes, Seq("cell")).where(col("__n") <= maxCell).drop("__n")
      } else normed
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

  /** [[semanticDedup]] with k derived from the corpus — the ×100
    * decade probe's runbook rule as CODE instead of prose: at fixed k
    * cells grow linearly with the corpus and the within-cell pair
    * join is quadratic in cell size (measured 52× per data decade
    * uncapped), so k must track n. k = ceil(n / targetCell) keeps the
    * EXPECTED cell at `targetCell` vectors; `maxCell` (default
    * 4·targetCell) still backstops the skew tail with the usual
    * conservative-drop + [[droppedCells]] observability. The count()
    * is one bounded driver action (a long), the same class as the
    * centroid-seed collect.
    *
    * Honest cost accounting (measured, PLANS.md): bounding the cells
    * moves the quadratic — flat-centroid assignment is O(n·k·d), and
    * with k ∝ n that is itself quadratic in the corpus. This wrapper
    * is therefore the MID-SCALE form (bounded cells, exact SemDeDup
    * semantics, k up to a few thousand); at true 100 TB scale use
    * [[semanticDedupTwoLevel]] — the coarse→fine composition reaches
    * the same cell granularity at O(n·√k) assignment — or
    * [[Similarity.dedupByEmbedding]] — sign-LSH buckets cost O(n)
    * with no centroid loop (measured 1.8× per data decade). The
    * quadratic lives in the FLAT quantizer's assignment math;
    * factoring k into two levels is what removes it. */
  def semanticDedupAuto(embeddings: DataFrame, targetCell: Int,
                        threshold: Double, iters: Int = 2, maxCell: Int = 0,
                        idCol: String = "vec_id",
                        vecCol: String = "embedding"): DataFrame = {
    require(targetCell > 0, s"targetCell must be positive: $targetCell")
    val n = embeddings.count()
    val kL = math.max(1L, (n + targetCell - 1) / targetCell)
    // a silent .toInt wrap past Int.MaxValue would hand Lloyd a
    // negative/garbage k; fail loud and name the at-scale alternatives
    require(kL <= Int.MaxValue,
      s"semanticDedupAuto: derived k=$kL exceeds Int.MaxValue (n=$n, " +
        s"targetCell=$targetCell) — at this scale use " +
        "Similarity.dedupByEmbedding or semanticDedupTwoLevel")
    val cap = if (maxCell > 0) maxCell else 4 * targetCell
    semanticDedup(embeddings, kL.toInt, threshold, iters, cap, idCol, vecCol)
  }

  // ---- Two-level quantizer (coarse IVF cell -> per-cell fine
  // assignment) — the 100 TB SemDeDup path the flat quantizer's
  // honest cost accounting points at: k = k1·k2 effective cells for
  // O(n·(k1+k2)·d) assignment work instead of the flat form's
  // O(n·k·d). With k1 ≈ k2 ≈ √k that is the O(n·√k) assignment that
  // makes bounded-cell exact-SemDeDup semantics reachable at corpus
  // scale — semanticDedupAuto's k∝n rule stops being quadratic when
  // each level only tracks √n. Same deterministic Lloyd discipline as
  // [[kmeans]] (lowest-id seeds, integer micro-sum updates, left-fold
  // distances), so the two-level cells are engine-reproducible and
  // DuckDB-oracled like the flat ones. ----

  /** Fine seeds: the k2 lowest-id vectors WITHIN each coarse cell,
    * fine ids 0..k2-1 in id order — [[seedCentroids]]' convention per
    * cell. The window is PARTITIONED by cell1 (never global). */
  private def tlSeed(coarse: DataFrame, k2: Int, idCol: String): DataFrame =
    coarse
      .withColumn("cell", row_number().over(
        Window.partitionBy(col("cell1")).orderBy(col(idCol))) - 1)
      .where(col("cell") < k2)
      .select(col("cell1"), col("cell"), col("__v").as("cvec"))

  /** Nearest fine centroid within the vector's own coarse cell: the
    * codebook join is keyed on cell1 (each vector meets only its
    * cell's ≤k2 entries — never all k1·k2), argmin as a min-of-struct
    * aggregate. `broadcastCodebooks` hints the k1·k2-row codebook side
    * (dim doubles per row — fits executor memory up to ~10^5 cells);
    * flip it off at extreme k1·k2 and the planner falls back to a
    * shuffle join on cell1, still linear in the corpus.
    *
    * `kHint` mirrors [[assignCells]]/[[pqAssign]]: past
    * [[ExactArgminMaxK]] fine centroids per cell the wide form scores
    * the argmin with the codegen'd norm trick (no measured crossover —
    * the interpreted left-fold loses at every k) and recomputes the
    * exact dist2 only for the n winners; the exact branch below the
    * bound is the oracle-replayable spelling the small-k registered
    * rows certify against. */
  private[operators] def tlAssign(vecs: DataFrame, codebooks: DataFrame,
                                  idCol: String, broadcastCodebooks: Boolean,
                                  kHint: Int = 0, nCands: Int = 0): DataFrame = {
    def maybeB(df: DataFrame) = if (broadcastCodebooks) broadcast(df) else df
    val wide = kHint > ExactArgminMaxK
    if (nCands > 0 && nCands <= ArgminUnrollMaxK) {
      // round 16: single-pass row-wise argmin (the assignCells unroll,
      // keyed form) — each coarse cell's ≤ nCands fine candidates ride
      // ONE grouped broadcast row; removes the groupBy(id, cell1)
      // exchange that shuffled the corpus + payload per fine iteration
      val candStruct =
        if (wide) struct(col("cell"), col("cvec"),
          GraftFunctions.dot(col("cvec"), col("cvec")).as("__cn2"))
        else struct(col("cell"), col("cvec"))
      val cands = maybeB(codebooks.groupBy(col("cell1"))
        .agg(array_sort(collect_list(candStruct)).as("__cands")))
      val joined = vecs.join(cands, Seq("cell1"))
      val best = argminOverSlots(col("__cands"), nCands, col("__v"), wide)
      if (wide)
        joined.select(col(idCol), col("cell1"), col("__v"),
          best.getField("cell").as("fine"),
          dist2(col("__v"), element_at(col("__cands"), best.getField("__pos"))
            .getField("cvec")).as("dist2"))
      else
        joined.select(col(idCol), col("cell1"), col("__v"),
          best.getField("cell").as("fine"), best.getField("d").as("dist2"))
    } else if (wide) {
      val cn = maybeB(codebooks.select(col("cell1"), col("cell"),
        GraftFunctions.dot(col("cvec"), col("cvec")).as("__cn2"), col("cvec")))
      vecs.join(cn, Seq("cell1"))
        .select(col(idCol), col("cell1"), col("__v"),
          struct(
            (col("__cn2") - lit(2.0) * GraftFunctions.dot(col("__v"), col("cvec"))).as("d"),
            col("cell").as("cell")).as("__dc"))
        .groupBy(col(idCol), col("cell1"))
        .agg(min(col("__dc")).as("__m"), first(col("__v")).as("__v"))
        .select(col(idCol), col("cell1"), col("__v"), col("__m.cell").as("fine"))
        .join(maybeB(codebooks.select(col("cell1"), col("cell").as("fine"), col("cvec"))),
          Seq("cell1", "fine"))
        .select(col(idCol), col("cell1"), col("__v"), col("fine"),
          dist2(col("__v"), col("cvec")).as("dist2"))
    } else
      vecs.join(maybeB(codebooks), Seq("cell1"))
        .select(col(idCol), col("cell1"), col("__v"),
          struct(dist2(col("__v"), col("cvec")).as("d"), col("cell").as("cell")).as("__dc"))
        .groupBy(col(idCol), col("cell1"))
        .agg(min(col("__dc")).as("__m"), first(col("__v")).as("__v"))
        .select(col(idCol), col("cell1"), col("__v"),
          col("__m.cell").as("fine"), col("__m.d").as("dist2"))
  }

  /** One grouped fine-Lloyd update across ALL coarse cells at once:
    * per-(cell1, fine, dim) exact integer micro-sums — k1·k2·d rows
    * out of the aggregate whatever the corpus size (the
    * [[pqTrainEncode]] grouped-update shape with cell1 playing the
    * subspace role). */
  private def tlUpdate(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cell1"), col("fine").as("cell"),
        posexplode(col("__v")).as(Seq("pos", "v")))
      .groupBy(col("cell1"), col("cell"), col("pos"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("v") * 1000000, 0).cast("long")).as("s"))
      .groupBy(col("cell1"), col("cell"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"),
          (col("s").cast("double") / col("n") / lit(1000000.0)).as("c")))),
        x => x.getField("c")).as("cvec"))

  /** Two-level assignment: `iters` coarse Lloyd iterations over the
    * corpus (k1 cells — the norm-trick argmin kicks in past k1 > ExactArgminMaxK,
    * so the coarse level is where large k goes), then `iters` fine
    * Lloyd iterations WITHIN each coarse cell (k2 cells per coarse
    * cell, trained for every cell in one grouped pass per iteration —
    * no per-cell driver loop). Returns one row per vector:
    * (idCol, cell1, fine, cell = cell1·k2 + fine, __v, dist2) with
    * dist2 the exact left-fold distance to the winning fine centroid.
    *
    * Scale shape per fine iteration: one k1·k2-row codebook side
    * (broadcast by default), one map-side-combinable argmin keyed on
    * (vector, cell1), one k1·k2·d-row micro-sum — flat in corpus
    * size. The coarse assignment is checkpointed once (it feeds the
    * fine seeds, every fine iteration, and the final output). */
  def twoLevelAssign(embeddings: DataFrame, k1: Int, k2: Int, iters: Int = 2,
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     broadcastCodebooks: Boolean = true): DataFrame =
    twoLevelCore(embeddings, k1, k2, iters, idCol, vecCol, broadcastCodebooks)._1

  /** The shared two-level training loop: returns the final assignment
    * frame AND the trained fine codebooks (cell1, cell, cvec —
    * k1·k2 rows, the probe parameters [[twoLevelTopK]] ranks). */
  private def twoLevelCore(embeddings: DataFrame, k1: Int, k2: Int, iters: Int,
                           idCol: String, vecCol: String,
                           broadcastCodebooks: Boolean): (DataFrame, DataFrame) = {
    require(k1 > 0 && k2 > 0 && iters > 0,
      s"k1, k2 and iters must be positive: k1=$k1 k2=$k2 iters=$iters")
    var c1 = seedCentroids(embeddings, k1, idCol, vecCol)
    for (_ <- 2 to iters)
      c1 = updateCentroids(assignCells(embeddings, c1, idCol, vecCol, kHint = k1, nCands = k1))
    val coarse = assignCells(embeddings, c1, idCol, vecCol, kHint = k1, nCands = k1)
      .select(col(idCol), col("__v"), col("cell").as("cell1"))
      .localCheckpoint(eager = false)
    var cbs = tlSeed(coarse, k2, idCol)
    var fine = tlAssign(coarse, cbs, idCol, broadcastCodebooks, kHint = k2, nCands = k2)
    for (_ <- 2 to iters) {
      // pin each iteration's codebooks (k1·k2 rows — bytes, not data):
      // the returned cbs AND the final fine assignment both hang off
      // this frame, and without the pin every downstream action
      // (codebook collect, index write, drift report) re-runs the
      // whole fine-training chain — the ×1000 build-split probe
      // measured the duplicated recompute at ~2× the build wall
      // (904 s unpinned vs 480 s train-once + 5 s write)
      cbs = tlUpdate(fine).localCheckpoint(eager = false)
      fine = tlAssign(coarse, cbs, idCol, broadcastCodebooks, kHint = k2, nCands = k2)
    }
    (fine.select(col(idCol), col("cell1"), col("fine"),
      (col("cell1").cast("long") * k2 + col("fine")).as("cell"),
      col("__v"), col("dist2")),
      cbs)
  }

  /** Two-level IVF index: the combined-cell assignment (joined back to
    * the storage-typed vectors) plus the trained fine codebooks
    * collected as PROBE PARAMETERS — (combined cell, centroid), k1·k2
    * entries, a bounded driver action like [[ivfIndexExact]]'s
    * centroid collect. Build once at the two-level training cost
    * (O(n·(k1+k2)·d) — the point of the composition vs a flat k-cell
    * IVF's O(n·k·d)), probe many times with [[twoLevelTopK]]; persist
    * with [[Similarity.ivfWriteIndex]] semantics by bucketing on
    * `cell`. */
  def twoLevelIndex(embeddings: DataFrame, k1: Int, k2: Int, iters: Int = 2,
                    idCol: String = "vec_id", vecCol: String = "embedding")
      : (DataFrame, Array[(Long, Array[Double])]) = {
    val (assigned, cbs) = twoLevelCore(embeddings, k1, k2, iters, idCol, vecCol,
      broadcastCodebooks = true)
    // dist2 (exact left-fold, to the winning fine centroid) rides along
    // in the index payload: it is the BUILD-TIME quantization-error
    // baseline [[twoLevelDrift]] compares appended batches against —
    // one double per row, and parquet column pruning keeps probes
    // ([[twoLevelTopK]]) from ever reading it
    // pin the assembled index: the codebook collect below is the first
    // action, and the caller's write/probe/drift actions must reuse
    // the one training run instead of replaying the final assignment
    // scan per action (the other half of the ×1000 build-split win)
    val index = assigned.select(col(idCol), col("cell"), col("dist2"))
      .join(embeddings.select(col(idCol), col(vecCol)), Seq(idCol))
      .localCheckpoint(eager = false)
    val centers = cbs.collect()
      .map(r => (r.getInt(0).toLong * k2 + r.getInt(1),
        r.getSeq[Double](2).toArray))
      .sortBy(_._1)
    (index, centers)
  }

  /** Assign NEW vectors against a FROZEN two-level codebook — the
    * incremental-maintenance primitive: no retraining, one argmin over
    * the k1·k2 combined fine centroids per vector (the same metric
    * [[twoLevelTopK]] ranks probe cells by, so an appended vector lands
    * exactly where the probe will look for it). k1·k2 is
    * deployment-scale, so the argmin takes the codegen'd norm-trick
    * branch (kHint = the codebook size); the emitted dist2 is the
    * exact left-fold spelling — the drift signal's input. Returns
    * (idCol, __v, cell, dist2). */
  def twoLevelAssignFrozen(newVecs: DataFrame, codebooks: Array[(Long, Array[Double])],
                           idCol: String = "vec_id",
                           vecCol: String = "embedding"): DataFrame = {
    require(codebooks.nonEmpty, "twoLevelAssignFrozen needs a trained codebook")
    val spark = newVecs.sparkSession
    import spark.implicits._
    val cents = codebooks.toSeq.map { case (c, v) => (c, v.toSeq) }
      .toDF("cell", "cvec")
    // the norm-trick branch UNCONDITIONALLY — not kHint = codebooks.length:
    // tlUpdate emits only populated cells, so a sparse training could
    // leave ≤ ExactArgminMaxK codebook rows and silently flip this to
    // the exact fold while the oracle (tlAppendCtes) always replays the
    // wide spelling — the q_pq_recall near-tie-luck class. Deployment
    // k1·k2 is always wide; the oracle matches by construction.
    assignCells(newVecs, cents, idCol, vecCol, kHint = ExactArgminMaxK + 1,
      nCands = codebooks.length)
  }

  /** Append a batch to a PERSISTED two-level index without retraining:
    * frozen-assign against the stored codebooks, then insert the
    * (id, cell, dist2, vector) rows into the bucketed table — the
    * catalog's bucket spec applies to the insert, so the new files
    * land in their cells' buckets and probes stay bucket-pruned. The
    * 100 TB contract this completes: the 904 s-class full rebuild is
    * paid at build time (or at a drift-triggered retrain), never per
    * ingest batch — an append costs one assignment pass over Δ rows
    * plus a bucketed write of Δ rows ([[Dedup]]'s q_new_near_persisted
    * discipline for the ANN family). Returns the batch assignment
    * (id, cell, dist2) — feed it to [[twoLevelDrift]] /
    * [[twoLevelRetrainNeeded]] for the retrain signal. */
  def twoLevelAppend(spark: org.apache.spark.sql.SparkSession, table: String,
                     root: String, nBuckets: Int, newVecs: DataFrame,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val (index, cbs) = twoLevelOpenIndex(spark, table, root, nBuckets)
    // the assignment feeds BOTH the insert and the returned drift
    // frame — pin it so the argmin runs once (lazily: first action)
    val assigned = twoLevelAssignFrozen(newVecs, cbs, idCol, vecCol)
      .localCheckpoint(eager = false)
    assigned.select(col(idCol), col("cell"), col("dist2"))
      .join(newVecs.select(col(idCol), col(vecCol)), Seq(idCol))
      .select(index.columns.map(col).toSeq: _*)
      .write.insertInto(table)
    assigned.select(col(idCol), col("cell"), col("dist2"))
  }

  /** Per-cell drift report: the build-time quantization-error baseline
    * (the index's stored dist2) vs an appended batch's frozen-assign
    * dist2 — the retrain-trigger signal for the persisted index.
    * Sums ride the decimal discipline (6-dp rounded, DECIMAL(18,6) —
    * order-independent, engine-portable), so the report is
    * hash-certifiable; means and the ratio are IEEE divides of those
    * exact sums. The join is FULL OUTER: cells the batch never touched
    * carry NULL new columns, and — the case a left join would silently
    * drop — appended rows landing in codebook cells the base left
    * EMPTY (the final assignment can leave a trained cell unchosen)
    * carry NULL base columns instead of vanishing from the report; an
    * out-of-distribution batch lands in exactly those sparse cells.
    * Bounded by k1·k2 rows. */
  def twoLevelDrift(index: DataFrame, appended: DataFrame): DataFrame =
    twoLevelDriftFromStats(twoLevelStats(index), appended)

  /** [[twoLevelDrift]] against a PREBUILT baseline ([[twoLevelStats]],
    * usually read back via [[twoLevelReadStats]]) — the per-append form:
    * O(batch) work plus a k1·k2-row join, the index itself untouched. */
  def twoLevelDriftFromStats(stats: DataFrame, appended: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val a = appended.groupBy(col("cell")).agg(count(lit(1)).as("n_new"),
      sum(round(col("dist2"), 6).cast(DecimalType(18, 6))).as("__ns"))
    stats.join(a, Seq("cell"), "full")
      .select(col("cell"), col("n_base"),
        round(col("__bs").cast("double") / col("n_base"), 6).as("base_mean_d2"),
        col("n_new"),
        round(col("__ns").cast("double") / col("n_new"), 6).as("new_mean_d2"),
        round((col("__ns").cast("double") / col("n_new")) /
          (col("__bs").cast("double") / col("n_base")), 6).as("drift_ratio"))
      .orderBy(col("cell"))
  }

  /** Default [[twoLevelRetrainNeeded]] tolerance: retrain when the
    * appended batch's overall mean quantization error exceeds the
    * build-time baseline by 2× (dist2 is squared distance, so 2× ≈
    * vectors landing 1.4× further from their codebook than the corpus
    * the codebook was trained on). Measured anchors (ClusteringSpec,
    * real sf0.001 embeddings): a same-distribution append holds the
    * ratio near 1 (measured ≈1.0), a 3×-scaled batch (the codebook
    * trained on the unscaled corpus) lands ≈9× — the rule separates
    * the two with a wide margin on both sides. */
  val TwoLevelDriftTolerance: Double = 2.0

  /** The retrain trigger as CODE (the semanticDedupAuto /
    * ingestBatchRows discipline, third instance): over a
    * [[twoLevelDrift]] report, pool each side back to corpus level
    * INDEPENDENTLY (append-weighted new mean over every cell the batch
    * touched — including cells the base left empty, where the batch's
    * error is highest — vs the build-weighted baseline over every base
    * cell) and retrain when the mean ratio crosses `tolerance`. An
    * empty appended batch never triggers. */
  def twoLevelRetrainNeeded(drift: DataFrame,
                            tolerance: Double = TwoLevelDriftTolerance): Boolean =
    retrainNeededFromPooled(pooledDriftMeans(drift), tolerance)

  /** The retrain rule applied to an already-pooled (new_mean,
    * base_mean) pair — the ONE spelling of the comparison, shared by
    * [[twoLevelRetrainNeeded]]/[[pqRetrainNeeded]] and the streaming
    * loops (which pool once via [[pooledDriftMeans]] to feed BOTH the
    * persisted signal and the decision; re-spelling the rule at those
    * call sites would let signal and decision diverge if the rule ever
    * changes). */
  def retrainNeededFromPooled(pooled: Option[(Double, Double)],
                              tolerance: Double = TwoLevelDriftTolerance): Boolean = {
    require(tolerance > 0, s"tolerance must be positive: $tolerance")
    pooled.exists { case (nm, bm) => nm > tolerance * bm }
  }

  /** The (new_mean, base_mean) pair the retrain rule compares, pooled
    * from a drift report back to corpus level — public so the
    * streaming maintenance loops can persist the SIGNAL (the ratio a
    * scheduler reads) with the same arithmetic the decision used,
    * instead of re-running the aggregate. None when either side is
    * empty (an empty appended batch never triggers). */
  def pooledDriftMeans(drift: DataFrame): Option[(Double, Double)] = {
    // each side null-skips independently (SQL sum semantics), so a
    // batch concentrated in base-empty cells still counts in full; the
    // 6-dp render granularity is orders of magnitude below the 2x
    // threshold
    val pooled = drift
      .agg((sum(col("new_mean_d2") * col("n_new")) / sum(col("n_new"))).as("nm"),
        (sum(col("base_mean_d2") * col("n_base")) / sum(col("n_base"))).as("bm"))
      .head()
    if (pooled.isNullAt(0) || pooled.isNullAt(1)) None
    else Some((pooled.getDouble(0), pooled.getDouble(1)))
  }

  /** Top-k against one query via the two-level index: rank the k1·k2
    * FINE centroids by exact query distance (driver-side over probe
    * parameters — fine centroids localize their members far better
    * than coarse ones, so nprobe combined cells beat nprobe coarse
    * cells at equal scan budget), scan only those cells' vectors,
    * exact-rank by cosine. Deterministic end to end (distances fold
    * left-to-right, ties break on the combined cell id), so the whole
    * probe is DuckDB-replayable — unlike [[Similarity.ivfTopK]], whose
    * Spark-ML-trained centroids are partitioning-dependent.
    *
    * Cell ranking is L2 (the IVF convention); for a COSINE top-k on
    * unnormalized embeddings that ranking is approximate — L2-normalize
    * the corpus first (standard for cosine ANN) or raise nprobe. */
  def twoLevelTopK(index: DataFrame, codebooks: Array[(Long, Array[Double])],
                   queryVec: Seq[Double], k: Int, nprobe: Int = 4,
                   idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(nprobe > 0 && k > 0, s"k and nprobe must be positive: k=$k nprobe=$nprobe")
    def d2(c: Array[Double]): Double = {
      var s = 0.0
      var i = 0
      while (i < c.length) { val d = c(i) - queryVec(i); s += d * d; i += 1 }
      s
    }
    val probeCells = codebooks.map { case (cell, c) => (d2(c), cell) }
      .sortBy(identity).take(nprobe).map(_._2)
    val q = typedLit(queryVec)
    index.where(col("cell").isin(probeCells.toSeq: _*))
      .select(col(idCol), Similarity.nativeCosine(
        Similarity.asDouble(col(vecCol)), q).as("cosine_sim"))
      .orderBy(col("cosine_sim").desc, col(idCol))
      .limit(k)
      .select(col(idCol), round(col("cosine_sim"), 6).as("cosine_sim"))
  }

  /** Batched multi-query top-k via the two-level index — the ANN
    * SERVING form [[twoLevelTopK]]'s scaladoc implies but a per-query
    * loop can't deliver: Q sequential probes pay Q scan set-ups (the
    * ×1000 probe measured 0.22 s/probe — a serving anti-pattern at any
    * real QPS), while this form ranks each query's fine centroids
    * driver-side (over the SAME k1·k2 probe parameters), unions the
    * per-query nprobe cell sets into ONE bucket-pruned scan of the
    * index, and ranks per query with a window PARTITIONED by query id
    * (bounded per partition by the probed cells' members — never
    * global). Per query, the candidate set and the (cosine desc, id)
    * ranking are exactly [[twoLevelTopK]]'s, so each query's k rows
    * match the single-query contract bit-for-bit; ties in the
    * driver-side cell ranking break on the combined cell id, and all
    * distances fold left-to-right, so the whole batch is
    * DuckDB-replayable.
    *
    * Returns (query_id, idCol, cosine_sim, rank) ordered by
    * (query_id, rank). `queries` is a bounded driver-side parameter
    * list (Q query vectors), not data. */
  def twoLevelTopKMulti(index: DataFrame, codebooks: Array[(Long, Array[Double])],
                        queries: Seq[(Long, Seq[Double])], k: Int, nprobe: Int = 4,
                        idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(queries.nonEmpty && nprobe > 0 && k > 0,
      s"queries, k and nprobe must be non-empty/positive: q=${queries.size} k=$k nprobe=$nprobe")
    // a duplicated query id would double its candidate rows through the
    // (query_id, cell) join and corrupt that query's rank — fail loud
    require(queries.map(_._1).distinct.size == queries.size,
      "twoLevelTopKMulti: query ids must be distinct")
    def d2(c: Array[Double], q: Seq[Double]): Double = {
      var s = 0.0
      var i = 0
      while (i < c.length) { val d = c(i) - q(i); s += d * d; i += 1 }
      s
    }
    // per-query probe cells, ranked exactly as twoLevelTopK ranks them
    val probe: Seq[(Long, Long, Seq[Double])] = queries.flatMap { case (qid, qv) =>
      codebooks.map { case (cell, c) => (d2(c, qv), cell) }
        .sortBy(identity).take(nprobe).map { case (_, cell) => (qid, cell, qv) }
    }
    val unionCells = probe.map(_._2).distinct
    val spark = index.sparkSession
    import spark.implicits._
    // Q·nprobe rows of query parameters — broadcast by construction
    val probeDf = broadcast(probe.toDF("query_id", "cell", "__qv"))
    index.where(col("cell").isin(unionCells: _*))
      .join(probeDf, Seq("cell"))
      .select(col("query_id"), col(idCol),
        Similarity.nativeCosine(Similarity.asDouble(col(vecCol)), col("__qv")).as("__c"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("__c").desc, col(idCol))))
      .where(col("rank") <= k)
      .select(col("query_id"), col(idCol),
        round(col("__c"), 6).as("cosine_sim"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Persist a two-level index for build-once/probe-many — the form
    * 100 TB actually runs (training once is O(n·(k1+k2)·d); the probe
    * must then read nprobe buckets, not re-train or full-scan). The
    * (id, cell, vector) assignment is written BUCKETED AND SORTED by
    * the combined `cell` ([[Similarity.ivfWriteIndex]] semantics):
    * a probe's `cell IN (nprobe cells)` prunes to the matching bucket
    * files, and because each file is sorted by cell its parquet
    * min/max stats cover few cells even when the bucketed scan is
    * disabled — the IO win survives either way. The fine codebooks
    * land as a k1·k2-row parquet table of probe parameters. */
  def twoLevelWriteIndex(index: DataFrame, codebooks: Array[(Long, Array[Double])],
                         table: String, root: String, nBuckets: Int): Unit = {
    graft.sources.Bucketing.writeBucketed(index, table, "cell", nBuckets,
      s"$root/index")
    val spark = index.sparkSession
    import spark.implicits._
    codebooks.toSeq.map { case (c, v) => (c, v.toSeq) }.toDF("cell", "cvec")
      .coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$root/codebooks")
    // the build-time per-cell error baseline as a k1·k2-row artifact:
    // an append-time drift check then reads THESE rows instead of
    // re-scanning the (100 TB-class) index's dist2 column per batch —
    // and the baseline stays the codebook's own training distribution
    // no matter how many batches have been appended since
    twoLevelStats(index).coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$root/stats")
  }

  /** The per-cell build baseline [[twoLevelDriftFromStats]] consumes:
    * (cell, n_base, __bs) with the sum under the decimal discipline.
    * One scan of the index's (cell, dist2) columns — paid at build
    * time by [[twoLevelWriteIndex]], never per append. */
  def twoLevelStats(index: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    index.groupBy(col("cell")).agg(count(lit(1)).as("n_base"),
      sum(round(col("dist2"), 6).cast(DecimalType(18, 6))).as("__bs"))
  }

  def twoLevelReadStats(spark: org.apache.spark.sql.SparkSession,
                        root: String): DataFrame =
    spark.read.parquet(s"$root/stats")

  /** Open a persisted two-level index: re-registers the bucketed table
    * when this session's catalog doesn't have it yet (external CREATE
    * TABLE over the existing files — schema from the parquet footers,
    * bucket spec re-declared so the probe keeps BUCKET PRUNING), and
    * collects the k1·k2 codebook rows back as probe parameters (a
    * bounded driver action — query parameters, not data). Feed the
    * pair straight into [[twoLevelTopK]]. */
  def twoLevelOpenIndex(spark: org.apache.spark.sql.SparkSession, table: String,
                        root: String, nBuckets: Int)
      : (DataFrame, Array[(Long, Array[Double])]) = {
    if (!spark.catalog.tableExists(table)) {
      val ddl = spark.read.parquet(s"$root/index").schema.toDDL
      spark.sql(s"CREATE TABLE $table ($ddl) USING PARQUET " +
        s"CLUSTERED BY (cell) SORTED BY (cell) INTO $nBuckets BUCKETS " +
        s"LOCATION '$root/index'")
    }
    val cbs = spark.read.parquet(s"$root/codebooks").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).sortBy(_._1)
    (spark.table(table), cbs)
  }

  // ---- versioned serving + retrain execution (the arc the drift
  // trigger schedules): index generations live in immutable-LAYOUT
  // version dirs $root/v=%06d/{index,codebooks,stats} with Lake's
  // `_latest` staged-marker protocol deciding which generation serves.
  // Within a generation the bucketed index table is APPEND-ONLY
  // ([[twoLevelAppend]] bucket-inserts new files; codebooks/stats never
  // change after publish); a retrain publishes generation N+1 from
  // scratch while every probe keeps answering from generation N — the
  // marker flip is the last step, so there is never a torn read. ----

  /** A served index generation: the catalog table + version dir behind
    * the (index, codebooks) pair the probe/append/drift APIs consume. */
  final case class TwoLevelVersion(version: Long, table: String, dir: String,
                                   index: DataFrame,
                                   codebooks: Array[(Long, Array[Double])])

  /** Publish a trained index as the NEXT generation under a versioned
    * root: stage the full index/codebooks/stats triple into
    * `v=N.__staging`, rename the dir (atomic), then advance `_latest`
    * ([[graft.sources.Lake.advanceLatest]]) — the marker commit is
    * last, so readers racing the publish resolve either generation
    * N-1 or N, never a mix, and a crash anywhere before the marker
    * flip leaves an unpublished dir the next publish reclaims.
    * Returns the new version number. */
  def twoLevelPublishVersion(spark: org.apache.spark.sql.SparkSession,
                             index: DataFrame, codebooks: Array[(Long, Array[Double])],
                             tablePrefix: String, root: String, nBuckets: Int,
                             bootstrapDigest: Option[String] = None): Long = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val next = graft.sources.Lake.latestVersion(spark, root).getOrElse(0L) + 1
    val targetDir = graft.sources.Lake.versionPath(root, next)
    val (target, staging) = (new Path(targetDir), new Path(targetDir + ".__staging"))
    // a crashed prior attempt at THIS version is unpublished by
    // definition (the marker never advanced) — reclaim it
    if (fs.exists(target)) fs.delete(target, true)
    if (fs.exists(staging)) fs.delete(staging, true)
    // bucketBy needs a catalog entry; stage under a throwaway name and
    // drop it after the write (external table: the files stay put)
    val stagingTable = s"${tablePrefix}_v${next}_staging"
    spark.sql(s"DROP TABLE IF EXISTS $stagingTable")
    twoLevelWriteIndex(index, codebooks, stagingTable, targetDir + ".__staging",
      nBuckets)
    spark.sql(s"DROP TABLE IF EXISTS $stagingTable")
    bootstrapDigest.foreach(d =>
      writeBootstrapDigest(spark, targetDir + ".__staging", d))
    if (!fs.rename(staging, target))
      throw new java.io.IOException(s"failed to publish $staging as $target")
    graft.sources.Lake.advanceLatest(spark, root, next)
    next
  }

  /** The content digest of the batch a generation was BOOTSTRAPPED
    * from, staged INSIDE the version dir so it commits atomically with
    * the generation itself. This closes the versioned streaming loops'
    * one non-idempotent crash window: a crash between the publish's
    * marker flip and the loop's applied-marker touch replays the
    * bootstrap batch down the APPEND path (the marker now exists) —
    * without this artifact that replay would silently re-insert the
    * ENTIRE bootstrap corpus (doubled probe candidates; for PQ, doubled
    * ADC partial sums). The append path compares digests and turns the
    * replay into a heal-and-skip instead. */
  private def writeBootstrapDigest(spark: org.apache.spark.sql.SparkSession,
                                   dir: String, digest: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/_bootstrap_digest")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(digest.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Read a generation dir's bootstrap digest, if it carries one. */
  def bootstrapDigestOf(spark: org.apache.spark.sql.SparkSession,
                        dir: String): Option[String] = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/_bootstrap_digest")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).trim)
      finally in.close()
    }
  }

  /** Open a generation of a versioned index: the `_latest` marker's
    * target by default, or a pinned `version` (published dirs are
    * never rewritten, so a pinned open is reproducible — probes
    * in-flight during a retrain keep answering from their pinned
    * generation). */
  def twoLevelOpenVersion(spark: org.apache.spark.sql.SparkSession,
                          tablePrefix: String, root: String, nBuckets: Int,
                          version: Long = -1L): TwoLevelVersion = {
    val v =
      if (version >= 0) version
      else graft.sources.Lake.latestVersion(spark, root).getOrElse(
        throw new java.util.NoSuchElementException(
          s"no published index version under $root"))
    val dir = graft.sources.Lake.versionPath(root, v)
    val (index, cbs) = twoLevelOpenIndex(spark, s"${tablePrefix}_v$v", dir, nBuckets)
    TwoLevelVersion(v, s"${tablePrefix}_v$v", dir, index, cbs)
  }

  /** Execute the retrain the drift trigger schedules: rebuild the
    * index on the CURRENT corpus — every base and appended vector,
    * read back from the serving generation's own table (the vectors
    * are index payload, so no upstream re-scan) — and publish it as
    * generation N+1 with fresh codebooks and a fresh stats baseline.
    * The serving generation is never touched: its table keeps
    * answering bucket-pruned probes throughout the rebuild, and the
    * `_latest` flip at the very end is what moves new opens to N+1.
    * This is the 507 s-class batch job [[twoLevelAppend]] exists to
    * amortize — scheduled (by [[twoLevelRetrainNeeded]] /
    * the streaming loop's RETRAIN NEEDED log), never absorbed into an
    * ingest batch. Returns the new version number. */
  def twoLevelRetrain(spark: org.apache.spark.sql.SparkSession,
                      tablePrefix: String, root: String, nBuckets: Int,
                      k1: Int, k2: Int, iters: Int = 2,
                      idCol: String = "vec_id", vecCol: String = "embedding"): Long = {
    val cur = twoLevelOpenVersion(spark, tablePrefix, root, nBuckets)
    val corpus = cur.index.select(col(idCol), col(vecCol))
    val (index, cbs) = twoLevelIndex(corpus, k1, k2, iters, idCol, vecCol)
    twoLevelPublishVersion(spark, index, cbs, tablePrefix, root, nBuckets)
  }

  // ---- append-path hygiene: file telemetry + bucket compaction.
  // Every [[twoLevelAppend]] batch lands O(1) new files per touched
  // bucket; after B batches a probe pays O(B) file opens per probed
  // bucket. The rule-as-code below decides when to pay the rewrite
  // (the semanticDedupAuto / ingestBatchRows discipline, fourth
  // instance), and the compactor rewrites bucket-aligned so results
  // and bucket pruning are preserved bit-for-bit. ----

  /** Per-bucket (fileCount, bytes) from ONE directory listing of a
    * bucketed index dir — no data read. Bucket ids parse from Spark's
    * bucketed-file naming (`..._NNNNN.c000...`); -1 collects files the
    * pattern doesn't cover. */
  private def bucketFileCounts(spark: org.apache.spark.sql.SparkSession,
                               dir: String): Seq[(Int, Int, Long)] = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bucketRe = "_(\\d{5})\\.".r
    fs.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => (bucketRe.findFirstMatchIn(s.getPath.getName)
        .map(_.group(1).toInt).getOrElse(-1), s.getLen))
      .groupBy(_._1).toSeq
      .map { case (b, fsz) => (b, fsz.size, fsz.map(_._2).sum) }
      .sortBy(_._1)
  }

  /** Files-per-bucket telemetry for a persisted index dir (the
    * `$root/index` of [[twoLevelWriteIndex]]): (bucket, n_files,
    * bytes), one row per bucket that has files. The number an ingest
    * loop watches to schedule [[compactTwoLevelIndex]]. */
  def indexFileStats(spark: org.apache.spark.sql.SparkSession,
                     dir: String): DataFrame = {
    import spark.implicits._
    bucketFileCounts(spark, dir).toDF("bucket", "n_files", "bytes")
  }

  /** Default [[indexCompactionNeeded]] threshold: compact a bucket's
    * worth of probe IO once any bucket fragments past 8 files — at one
    * file per touched bucket per append batch that is ~8 ingest
    * batches of headroom, while the rewrite it schedules is bounded by
    * the index (not corpus) size. */
  val IndexCompactFilesPerBucket: Int = 8

  /** The compaction trigger as CODE: true when any bucket of the index
    * dir holds more than `maxFilesPerBucket` files. One directory
    * listing; pair with [[compactTwoLevelIndex]] (the streaming loop
    * logs COMPACT NEEDED on this rule and leaves the rewrite to a
    * scheduled batch job, like the retrain). */
  def indexCompactionNeeded(spark: org.apache.spark.sql.SparkSession, dir: String,
                            maxFilesPerBucket: Int = IndexCompactFilesPerBucket): Boolean = {
    require(maxFilesPerBucket > 0,
      s"maxFilesPerBucket must be positive: $maxFilesPerBucket")
    bucketFileCounts(spark, dir).exists(_._2 > maxFilesPerBucket)
  }

  /** Bucket-preserving compaction of a persisted two-level index:
    * rewrite `$root/index` so each bucket holds ONE file again. The
    * rewrite repartitions by the bucket key into `nBuckets` tasks —
    * HashPartitioning and the table's bucket spec share the same
    * murmur3-pmod arithmetic, so each task holds exactly one bucket's
    * rows — then re-writes through the same bucketed+sorted writer the
    * build used (results and SelectedBucketsCount pruning preserved
    * bit-for-bit; only the file layout changes). The swap is the
    * [[graft.sources.Lake.overwriteSelf]] move-aside ordering (stage,
    * park live, promote, delete parked — crash anywhere heals via
    * [[graft.sources.Lake.healCrashedOverwrite]] on next entry), and
    * the staged write EXECUTES the read of the live files before any
    * rename. Returns (filesBefore, filesAfter). */
  def compactTwoLevelIndex(spark: org.apache.spark.sql.SparkSession,
                           table: String, root: String, nBuckets: Int): (Int, Int) = {
    import org.apache.hadoop.fs.Path
    val dir = s"$root/index"
    graft.sources.Lake.healCrashedOverwrite(spark, dir)
    val before = bucketFileCounts(spark, dir).map(_._2).sum
    val stagingTable = table + "__compact"
    spark.sql(s"DROP TABLE IF EXISTS $stagingTable")
    graft.sources.Bucketing.writeBucketed(
      spark.table(table).repartition(nBuckets, col("cell")),
      stagingTable, "cell", nBuckets, dir + ".__staging")
    spark.sql(s"DROP TABLE IF EXISTS $stagingTable")
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (target, staging, old) =
      (new Path(dir), new Path(dir + ".__staging"), new Path(dir + ".__old"))
    if (fs.exists(old)) fs.delete(old, true)
    if (fs.exists(target) && !fs.rename(target, old))
      throw new java.io.IOException(s"failed to move $target aside to $old")
    if (!fs.rename(staging, target)) {
      val restored = fs.exists(old) && fs.rename(old, target)
      throw new java.io.IOException(s"failed to promote $staging into $target" +
        (if (restored) " (original restored)" else s" (original left at $old)"))
    }
    if (fs.exists(target)) fs.delete(old, true): Unit
    // the catalog caches file listings; the files under LOCATION changed
    spark.sql(s"REFRESH TABLE $table")
    (before, bucketFileCounts(spark, dir).map(_._2).sum)
  }

  /** SemDeDup over the two-level quantizer: [[twoLevelAssign]] cells
    * feed the same within-cell cosine pair stage as [[semanticDedup]]
    * (one-hop min-id keeper, `maxCell` skew guard, conservative
    * drops). This is the at-scale exact-SemDeDup form: expected cell
    * size is n/(k1·k2) with each level only √(k1·k2) wide, so holding
    * cells at a fixed target as the corpus grows costs O(n·√k)
    * assignment — vs the flat quantizer's O(n·k) (measured ~49×/decade
    * at k∝n) and the uncapped fixed-k form's quadratic pair join
    * (measured 52×/decade). Returns (idCol, cell, keep), cell the
    * combined long id. */
  def semanticDedupTwoLevel(embeddings: DataFrame, k1: Int, k2: Int,
                            threshold: Double, iters: Int = 2,
                            maxCell: Int = 1024,
                            idCol: String = "vec_id",
                            vecCol: String = "embedding"): DataFrame = {
    val assigned = twoLevelAssign(embeddings, k1, k2, iters, idCol, vecCol)
      .select(col(idCol), col("__v"), col("cell"))
      .localCheckpoint(eager = false)
    cellPairKeep(assigned, threshold, maxCell, idCol)
  }

  /** The combined cells a [[semanticDedupTwoLevel]] `maxCell` cap
    * discards, with their sizes — [[droppedCells]]' twin for the
    * two-level quantizer, feeding the same unified
    * [[graft.operators.Audit.dropAudit]] quarantine surface. Bounded
    * by k1·k2 rows. */
  def droppedCellsTwoLevel(embeddings: DataFrame, k1: Int, k2: Int,
                           maxCell: Int, iters: Int = 2,
                           idCol: String = "vec_id",
                           vecCol: String = "embedding"): DataFrame = {
    require(maxCell > 0, "droppedCellsTwoLevel needs a positive cap")
    twoLevelAssign(embeddings, k1, k2, iters, idCol, vecCol)
      .groupBy(col("cell")).agg(count(lit(1)).as("n_members"))
      .where(col("n_members") > maxCell)
      .select(col("cell"), col("n_members"))
      .orderBy(col("cell"))
  }

  /** [[semanticDedupTwoLevel]] with both levels derived from the
    * corpus — the at-scale twin of [[semanticDedupAuto]]'s k∝n rule:
    * k = ceil(n / targetCell) effective cells, factored as
    * k1 = k2 = ceil(√k), so holding the expected cell at `targetCell`
    * as the corpus grows costs O(n·√(n/targetCell)·d) assignment
    * instead of the flat form's O(n·(n/targetCell)·d). The two
    * bounded driver actions (count, and the k1-row seed collect
    * inside Lloyd) are query parameters, not data collects. */
  /** The √(n/targetCell) side derivation [[semanticDedupTwoLevelAuto]]
    * deploys — exposed so the spec that pins the derivation under
    * [[ExactArgminMaxK]] asserts against THIS arithmetic, not a local
    * re-spelling that could silently diverge from it. */
  private[graft] def autoSide(n: Long, targetCell: Int): Int = {
    require(targetCell > 0, s"targetCell must be positive: $targetCell")
    val k = math.max(1L, (n + targetCell - 1) / targetCell)
    math.ceil(math.sqrt(k.toDouble)).toInt
  }

  def semanticDedupTwoLevelAuto(embeddings: DataFrame, targetCell: Int,
                                threshold: Double, iters: Int = 2,
                                maxCell: Int = 0,
                                idCol: String = "vec_id",
                                vecCol: String = "embedding"): DataFrame = {
    val side = autoSide(embeddings.count(), targetCell)
    val cap = if (maxCell > 0) maxCell else 4 * targetCell
    semanticDedupTwoLevel(embeddings, side, side, threshold, iters, cap,
      idCol, vecCol)
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
      centroids = updateCentroids(assignCells(embeddings, centroids, idCol, vecCol, kHint = nCells, nCands = nCells))
    val assigned = assignCells(embeddings, centroids, idCol, vecCol, kHint = nCells, nCands = nCells)
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

  // ---- Product quantization ([EXT]; Jégou, Douze, Schmid, "Product
  // Quantization for Nearest Neighbor Search", TPAMI 2011) ----
  // The memory tier below [[Similarity.quantizeInt8]]: int8 keeps one
  // byte PER DIMENSION (64 B for dim-64), PQ keeps one code per
  // SUBSPACE (m bytes — 4 B here), an order of magnitude smaller
  // index for billion-vector corpora, at the cost of a trained
  // codebook. Built on the same deterministic Lloyd discipline as
  // [[kmeans]] so codes and ADC scores are engine-reproducible.

  /** (vec_id, subspace, sv) slice rows: dim split into m contiguous
    * blocks of dim/m. All-subspaces-at-once — ONE pass over the data
    * trains every subspace codebook (a per-subspace driver loop would
    * read the corpus m times). */
  private[operators] def pqSlices(embeddings: DataFrame, m: Int, dim: Int,
                                  idCol: String, vecCol: String): DataFrame = {
    require(dim % m == 0, s"dim $dim not divisible by m $m subspaces")
    val w = dim / m
    embeddings
      .select(col(idCol), Similarity.asDouble(col(vecCol)).as("__v"))
      .select(col(idCol),
        posexplode(expr(s"transform(sequence(1, ${dim - w + 1}, $w), " +
          s"st -> slice(__v, st, $w))"))
          .as(Seq("subspace", "sv")))
  }

  /** Nearest-codebook-entry assignment for every (vector, subspace)
    * slice: broadcast the m·k codebook rows, argmin as a min-of-struct
    * aggregate (map-side combinable, never a window).
    *
    * `kHint` mirrors [[assignCells]]: past [[ExactArgminMaxK]]
    * codewords per subspace the wide form scores the argmin with the
    * codegen'd norm trick (‖c‖² − 2·sv·c — the ‖sv‖² shift is
    * constant per slice) and recomputes the TRUE exact dist2 only for
    * the m·n winners — the interpreted left-fold HOF loses to it at
    * every measured k, so the exact branch exists purely as the
    * bit-reproducible spelling the registered PQ rows (k=8) certify
    * against. Same codes up to exact floating-point near-ties; the
    * emitted dist2 is always the exact spelling. */
  private[operators] def pqAssign(slices: DataFrame, codebooks: DataFrame,
                                  idCol: String, kHint: Int = 0,
                                  nCands: Int = 0): DataFrame = {
    val wide = kHint > ExactArgminMaxK
    if (nCands > 0 && nCands <= ArgminUnrollMaxK) {
      // round 16: single-pass row-wise argmin (the assignCells unroll,
      // subspace-keyed form) — removes the groupBy(id, subspace)
      // exchange that shuffled every slice row per Lloyd iteration
      val candStruct =
        if (wide) struct(col("cell"), col("cvec"),
          GraftFunctions.dot(col("cvec"), col("cvec")).as("__cn2"))
        else struct(col("cell"), col("cvec"))
      val cands = broadcast(codebooks.groupBy(col("subspace"))
        .agg(array_sort(collect_list(candStruct)).as("__cands")))
      val joined = slices.join(cands, Seq("subspace"))
      val best = argminOverSlots(col("__cands"), nCands, col("sv"), wide)
      if (wide)
        joined.select(col(idCol), col("subspace"), col("sv"),
          best.getField("cell").as("code"),
          dist2(col("sv"), element_at(col("__cands"), best.getField("__pos"))
            .getField("cvec")).as("dist2"))
      else
        joined.select(col(idCol), col("subspace"), col("sv"),
          best.getField("cell").as("code"), best.getField("d").as("dist2"))
    } else if (wide) {
      val cn = broadcast(codebooks.select(col("subspace"), col("cell"),
        GraftFunctions.dot(col("cvec"), col("cvec")).as("__cn2"), col("cvec")))
      slices
        .join(cn, Seq("subspace"))
        .select(col(idCol), col("subspace"), col("sv"),
          struct(
            (col("__cn2") - lit(2.0) * GraftFunctions.dot(col("sv"), col("cvec"))).as("d"),
            col("cell").as("cell")).as("__dc"))
        .groupBy(col(idCol), col("subspace"))
        .agg(min(col("__dc")).as("__m"), first(col("sv")).as("sv"))
        .select(col(idCol), col("subspace"), col("sv"), col("__m.cell").as("code"))
        .join(broadcast(codebooks.withColumnRenamed("cell", "code")),
          Seq("subspace", "code"))
        .select(col(idCol), col("subspace"), col("sv"), col("code"),
          dist2(col("sv"), col("cvec")).as("dist2"))
    } else slices
      .join(broadcast(codebooks), Seq("subspace"))
      .select(col(idCol), col("subspace"), col("sv"),
        struct(dist2(col("sv"), col("cvec")).as("d"), col("cell").as("cell")).as("__dc"))
      .groupBy(col(idCol), col("subspace"))
      .agg(min(col("__dc")).as("__m"), first(col("sv")).as("sv"))
      .select(col(idCol), col("subspace"), col("sv"),
        col("__m.cell").as("code"), col("__m.d").as("dist2"))
  }

  /** One grouped Lloyd update across all subspaces: exact per-
    * (subspace, cell, dim) micro-sums, k·m·(dim/m) = k·dim rows out
    * of the aggregate whatever the corpus size. */
  private def pqUpdate(assigned: DataFrame): DataFrame =
    assigned
      .select(col("subspace"), col("code").as("cell"),
        posexplode(col("sv")).as(Seq("pos", "v")))
      .groupBy(col("subspace"), col("cell"), col("pos"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("v") * 1000000, 0).cast("long")).as("s"))
      .groupBy(col("subspace"), col("cell"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"),
          (col("s").cast("double") / col("n") / lit(1000000.0)).as("c")))),
        x => x.getField("c")).as("cvec"))

  /** Train per-subspace codebooks and encode the corpus in one call:
    * `iters` grouped Lloyd iterations (seeds = the k lowest-id
    * vectors' slices, cells 0..k-1 in id order — [[seedCentroids]]'
    * convention per subspace), then the final assignment IS the
    * encoding. Returns (codes, codebooks):
    * codes = (idCol, subspace, code, dist2) — m rows per vector, the
    * PQ index payload; codebooks = (subspace, cell, cvec).
    *
    * Scale shape per iteration: one broadcast of m·k codebook rows,
    * one argmin aggregate, one k·dim-row micro-sum — flat in corpus
    * size; the slice explode multiplies rows by m but each carries
    * dim/m values, so total bytes stay ~constant. */
  def pqTrainEncode(embeddings: DataFrame, m: Int, k: Int, iters: Int, dim: Int,
                    idCol: String = "vec_id", vecCol: String = "embedding")
      : (DataFrame, DataFrame) = {
    require(k > 0 && iters > 0, s"k and iters must be positive: k=$k iters=$iters")
    val slices = pqSlices(embeddings, m, dim, idCol, vecCol).localCheckpoint()
    val seedIds = embeddings.orderBy(col(idCol)).limit(k)
      .select(col(idCol),
        (row_number().over(Window.orderBy(col(idCol))) - 1).as("cell"))
    var codebooks = slices.join(broadcast(seedIds), Seq(idCol))
      .select(col("subspace"), col("cell"), col("sv").as("cvec"))
    var assigned = pqAssign(slices, codebooks, idCol, kHint = k, nCands = k)
    for (_ <- 2 to iters) {
      codebooks = pqUpdate(assigned)
      assigned = pqAssign(slices, codebooks, idCol, kHint = k, nCands = k)
    }
    (assigned.select(col(idCol), col("subspace"), col("code"), col("dist2")),
      codebooks)
  }

  /** Persist a trained PQ index — codes (m small ints per vector, the
    * entire searchable payload) and codebooks as parquet tables; the
    * probe side then never touches the base vectors OR retrains. The
    * PQ twin of [[Similarity.ivfWriteIndex]]; at 100 TB the codes
    * table is ~m bytes/vector vs 4·dim for raw floats — the artifact
    * a billion-vector ANN service actually ships. */
  def pqWriteIndex(codes: DataFrame, codebooks: DataFrame, root: String): Unit = {
    codes.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$root/codes")
    codebooks.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$root/codebooks")
    // build-time per-(subspace, codeword) reconstruction-error baseline
    // — the twoLevelWriteIndex stats discipline for the PQ family, so
    // an append-time drift check reads these m·k rows instead of
    // re-scanning the codes table, and the baseline stays the
    // codebook's own training distribution however many batches have
    // been appended since. Aggregated from the JUST-WRITTEN parquet,
    // not the incoming plan: the codes frame usually still carries the
    // whole training lineage (only its slices are checkpointed), and
    // aggregating the plan would re-run the full assignment pass a
    // third time per build — a whole extra corpus scan at 100 TB.
    pqStats(codes.sparkSession.read.parquet(s"$root/codes")).coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$root/stats")
  }

  /** The per-(subspace, codeword) build baseline [[pqDriftFromStats]]
    * consumes: (subspace, code, n_base, __bs) with the quantization-
    * error sum under the decimal discipline — [[twoLevelStats]] keyed
    * by the PQ index's natural cell, the codeword. One scan of the
    * codes table's (subspace, code, dist2) columns, paid at build time
    * by [[pqWriteIndex]], never per append. */
  def pqStats(codes: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    codes.groupBy(col("subspace"), col("code")).agg(count(lit(1)).as("n_base"),
      sum(round(col("dist2"), 6).cast(DecimalType(18, 6))).as("__bs"))
  }

  def pqReadStats(spark: org.apache.spark.sql.SparkSession,
                  root: String): DataFrame =
    spark.read.parquet(s"$root/stats")

  /** Per-(subspace, codeword) drift report for the PQ index: the
    * build-time reconstruction-error baseline vs a frozen-encoded
    * batch's dist2 ([[pqEncodeFrozen]]/[[pqAppend]]'s return) — the
    * [[twoLevelDriftFromStats]] contract with (subspace, code) playing
    * the cell role, same decimal-sum discipline, same FULL OUTER join
    * (a batch landing on codewords the base never used still reaches
    * the trigger). Bounded by m·k rows. */
  def pqDriftFromStats(stats: DataFrame, encoded: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val a = encoded.groupBy(col("subspace"), col("code"))
      .agg(count(lit(1)).as("n_new"),
        sum(round(col("dist2"), 6).cast(DecimalType(18, 6))).as("__ns"))
    stats.join(a, Seq("subspace", "code"), "full")
      .select(col("subspace"), col("code"), col("n_base"),
        round(col("__bs").cast("double") / col("n_base"), 6).as("base_mean_d2"),
        col("n_new"),
        round(col("__ns").cast("double") / col("n_new"), 6).as("new_mean_d2"),
        round((col("__ns").cast("double") / col("n_new")) /
          (col("__bs").cast("double") / col("n_base")), 6).as("drift_ratio"))
      .orderBy(col("subspace"), col("code"))
  }

  /** [[pqDriftFromStats]] with the baseline computed in-line — the
    * in-memory form; persisted callers read the build-time artifact
    * ([[pqReadStats]]) instead of rescanning codes. */
  def pqDrift(codes: DataFrame, encoded: DataFrame): DataFrame =
    pqDriftFromStats(pqStats(codes), encoded)

  /** The PQ retrain trigger: [[twoLevelRetrainNeeded]]'s pooled rule
    * verbatim — the report carries the same measure columns
    * (n_base/base_mean_d2/n_new/new_mean_d2), so the rule and its
    * measured anchors (same-distribution ≈1×, 3×-scaled ≈9×, tolerance
    * 2.0 between them) transfer unchanged. */
  def pqRetrainNeeded(drift: DataFrame,
                      tolerance: Double = TwoLevelDriftTolerance): Boolean =
    twoLevelRetrainNeeded(drift, tolerance)

  def pqReadIndex(spark: org.apache.spark.sql.SparkSession,
                  root: String): (DataFrame, DataFrame) =
    (spark.read.parquet(s"$root/codes"), spark.read.parquet(s"$root/codebooks"))

  /** Encode NEW vectors against FROZEN per-subspace codebooks — the PQ
    * twin of [[twoLevelAssignFrozen]]: no retraining, one pass of
    * [[pqAssign]] (slices join the broadcast m·k codebook, argmin per
    * slice), the exact same arithmetic a build-time encode runs, so a
    * from-scratch replay of train-on-base + encode-delta certifies the
    * path. Returns the [[pqTrainEncode]] codes contract:
    * (idCol, subspace, code, dist2). */
  def pqEncodeFrozen(newVecs: DataFrame, codebooks: DataFrame, m: Int, k: Int,
                     dim: Int, idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame =
    pqAssign(pqSlices(newVecs, m, dim, idCol, vecCol), codebooks, idCol,
      kHint = k, nCands = k)
      .select(col(idCol), col("subspace"), col("code"), col("dist2"))

  /** Append a batch to a persisted PQ index without retraining:
    * frozen-encode against the stored codebooks, append the m codes per
    * vector to the codes table — the codebooks table is never touched.
    * Per ingest batch this costs one encode pass over Δ rows plus an
    * m·Δ-row parquet append, vs a full corpus re-encode; ADC probes
    * ([[pqTopK]]) see base and appended codes transparently. The
    * returned encoding (with its exact dist2) is the drift signal —
    * the same quantization-error ratio discipline as
    * [[twoLevelDrift]], with codes keyed by (subspace, code). */
  def pqAppend(spark: org.apache.spark.sql.SparkSession, root: String,
               newVecs: DataFrame, m: Int, k: Int, dim: Int,
               idCol: String = "vec_id",
               vecCol: String = "embedding"): DataFrame = {
    val (_, codebooks) = pqReadIndex(spark, root)
    val encoded = pqEncodeFrozen(newVecs, codebooks, m, k, dim, idCol, vecCol)
      .localCheckpoint(eager = false)
    encoded.write.mode(org.apache.spark.sql.SaveMode.Append)
      .parquet(s"$root/codes")
    encoded
  }

  // ---- PQ append-path hygiene: codes-dir telemetry + compaction —
  // the two-level family's fragmentation discipline for the PQ index.
  // ADC has no pruning tier (it scans EVERY codes file per probe by
  // design — m small ints per vector), so after B ingest batches the
  // HOT SERVING PATH pays O(B) file opens per probe; the two-level
  // index only paid per probed bucket. The rewrite is one pass over
  // the m·n-row codes table — bounded by index (not corpus) size. ----

  /** Parquet file count of a PQ codes dir — one directory listing, no
    * data read. The number an ingest loop watches to schedule
    * [[compactPqIndex]]. */
  def pqCodesFileCount(spark: org.apache.spark.sql.SparkSession,
                       root: String): Int = {
    val p = new org.apache.hadoop.fs.Path(s"$root/codes")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0
    else fs.listStatus(p)
      .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
  }

  /** Default [[pqCompactionNeeded]] threshold — the two-level rule's
    * rationale transferred: each [[pqAppend]] batch lands O(1) new
    * files, so 16 files ≈ 16 ingest batches of headroom before the
    * rewrite; unlike the bucketed index the probe pays EVERY file
    * here, so the budget is per-dir, not per-bucket. */
  val PqCompactMaxFiles: Int = 16

  /** The PQ compaction trigger as CODE: true when the codes dir holds
    * more than `maxFiles` parquet files. One directory listing; pair
    * with [[compactPqIndex]] (the streaming loop logs COMPACT NEEDED
    * on this rule and leaves the rewrite to a scheduled batch job,
    * like the retrain). */
  def pqCompactionNeeded(spark: org.apache.spark.sql.SparkSession, root: String,
                         maxFiles: Int = PqCompactMaxFiles): Boolean = {
    require(maxFiles > 0, s"maxFiles must be positive: $maxFiles")
    pqCodesFileCount(spark, root) > maxFiles
  }

  /** Compact a PQ index's codes table back to `targetFiles` files —
    * [[compactTwoLevelIndex]]'s sibling for the unbucketed codes dir.
    * Row CONTENT is copied verbatim (one read → repartition → staged
    * write through [[graft.sources.Lake.overwriteSelf]], whose
    * move-aside ordering never leaves the live dir as the only copy
    * and heals a crash on next entry); results are bit-identical by
    * construction because ADC never depends on file layout — each
    * (vector, subspace) row contributes exactly one LUT distance to
    * [[pqTopK]]'s per-subspace conditional sums, so the fold order the
    * layout could perturb has exactly one operand. Certified by
    * identity oracle (q_pq_compact replays q_pq_append's oracle
    * verbatim). Codebooks and stats are never touched. Returns
    * (filesBefore, filesAfter). */
  def compactPqIndex(spark: org.apache.spark.sql.SparkSession, root: String,
                     targetFiles: Int = 0): (Int, Int) = {
    require(targetFiles >= 0, s"targetFiles must be >= 0 (0 = auto): $targetFiles")
    // default sizes to the box, not a tiny constant: ADC probes SCAN
    // the whole codes table, so task parallelism tracks file count for
    // a table this small-per-row — the ×1000 soak measured a 4-file
    // compacted probe at 115 s vs 21 s for the same rows in 32 files
    // (PLANS.md round 15). Compaction's job here is bounding the
    // O(batches) file-open tail, not minimizing file count.
    val n =
      if (targetFiles > 0) targetFiles
      else math.max(4, spark.sparkContext.defaultParallelism)
    // heal BEFORE the eager schema read below: a prior compaction
    // crashed between move-aside and promote leaves codes parked at
    // .__old, and spark.read.parquet would throw PATH_NOT_FOUND before
    // overwriteSelf's own entry heal ever ran (the compactTwoLevelIndex
    // ordering)
    graft.sources.Lake.healCrashedOverwrite(spark, s"$root/codes")
    val before = pqCodesFileCount(spark, root)
    graft.sources.Lake.overwriteSelf(
      spark.read.parquet(s"$root/codes").repartition(n),
      s"$root/codes")
    (before, pqCodesFileCount(spark, root))
  }

  // ---- PQ versioned serving + retrain — the twoLevelRetrain arc for
  // the PQ family, with ONE structural difference the scaladocs make
  // explicit: PQ codes are LOSSY (m bytes per vector), so a rebuild
  // cannot read the corpus back out of the index the way
  // twoLevelRetrain does — the caller passes the CURRENT corpus (its
  // upstream table). Generations live under $root/v=%06d/{codes,
  // codebooks,stats} committed by the same staged `_latest`-marker
  // protocol; probes keep answering from generation N throughout a
  // rebuild, and the marker flip is last. ----

  /** A served PQ generation: version + dir + the (codes, codebooks)
    * pair the ADC probes consume. */
  final case class PqVersion(version: Long, dir: String,
                             codes: DataFrame, codebooks: DataFrame)

  /** Publish a trained PQ index as the NEXT generation (stage the
    * codes/codebooks/stats triple into `v=N.__staging`, rename, advance
    * `_latest` last). Returns the new version number. */
  def pqPublishVersion(spark: org.apache.spark.sql.SparkSession,
                       codes: DataFrame, codebooks: DataFrame,
                       root: String,
                       bootstrapDigest: Option[String] = None): Long = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val next = graft.sources.Lake.latestVersion(spark, root).getOrElse(0L) + 1
    val targetDir = graft.sources.Lake.versionPath(root, next)
    val (target, staging) = (new Path(targetDir), new Path(targetDir + ".__staging"))
    if (fs.exists(target)) fs.delete(target, true)
    if (fs.exists(staging)) fs.delete(staging, true)
    pqWriteIndex(codes, codebooks, targetDir + ".__staging")
    bootstrapDigest.foreach(d =>
      writeBootstrapDigest(spark, targetDir + ".__staging", d))
    if (!fs.rename(staging, target))
      throw new java.io.IOException(s"failed to publish $staging as $target")
    graft.sources.Lake.advanceLatest(spark, root, next)
    next
  }

  /** Open a PQ generation: the `_latest` target by default, or a pinned
    * `version` (published dirs are append-only within a generation —
    * [[pqAppend]] into `gen.dir` — and never rewritten, so pinned opens
    * stay reproducible across later retrains). */
  def pqOpenVersion(spark: org.apache.spark.sql.SparkSession, root: String,
                    version: Long = -1L): PqVersion = {
    val v =
      if (version >= 0) version
      else graft.sources.Lake.latestVersion(spark, root).getOrElse(
        throw new java.util.NoSuchElementException(
          s"no published PQ index version under $root"))
    val dir = graft.sources.Lake.versionPath(root, v)
    val (codes, cbs) = pqReadIndex(spark, dir)
    PqVersion(v, dir, codes, cbs)
  }

  /** Execute the retrain [[pqRetrainNeeded]] schedules: train fresh
    * per-subspace codebooks on `corpus` — the caller's CURRENT upstream
    * (base + every appended batch; the codes table cannot reconstruct
    * it, unlike the two-level index's stored vectors) — and publish
    * generation N+1 with a fresh stats baseline while generation N
    * keeps serving ADC probes. Returns the new version number. */
  def pqRetrain(spark: org.apache.spark.sql.SparkSession, root: String,
                corpus: DataFrame, m: Int, k: Int, dim: Int, iters: Int = 2,
                idCol: String = "vec_id", vecCol: String = "embedding"): Long = {
    val (codes, cbs) = pqTrainEncode(corpus, m, k, iters, dim, idCol, vecCol)
    pqPublishVersion(spark, codes, cbs, root)
  }

  /** Asymmetric-distance (ADC) top-k: approximate squared L2 from the
    * query's RAW slices to each base vector's RECONSTRUCTION — the
    * codes table joins its codebook entries (a broadcast of m·k rows;
    * at scale this join is the in-memory distance-table lookup of the
    * PQ paper), per-subspace partial distances fold in subspace order
    * (array_sort + left fold — the engine-portable summation
    * discipline), and TakeOrderedAndProject keeps k rows. The base
    * corpus is never touched — ADC reads codes only, m bytes per
    * vector. */
  def pqTopK(codes: DataFrame, codebooks: DataFrame, query: Seq[Double],
             m: Int, k: Int, idCol: String = "vec_id"): DataFrame = {
    require(query.nonEmpty && query.size % m == 0,
      s"query dim ${query.size} not divisible by m $m")
    val w = query.size / m
    val spark = codes.sparkSession
    import spark.implicits._
    val qSlices = query.grouped(w).zipWithIndex
      .map { case (s, i) => (i, s) }.toSeq.toDF("subspace", "qs")
    // the LUT MATERIALIZED before touching the codes: the per-entry
    // distance has only m·k distinct values, so the interpreted dist2
    // fold runs m·k times here instead of once per code row (n·m
    // interpreted folds — the kHint lesson, measured 0.9 s/query at a
    // mere 200 k vectors before this). The codes-side plan is then one
    // broadcast-hash join plus [[adcTotal]]'s codegen'd fixed-order sum.
    val lut = broadcast(
      codebooks.withColumnRenamed("cell", "code")
        .join(broadcast(qSlices), Seq("subspace"))
        .select(col("subspace"), col("code"), dist2(col("qs"), col("cvec")).as("d")))
    codes
      .join(lut, Seq("subspace", "code"))
      .groupBy(col(idCol))
      .agg(adcTotal(m).as("adc_dist2"))
      .orderBy(col("adc_dist2").asc, col(idCol).asc)
      .limit(k)
  }

  /** The per-vector ADC total as a codegen-friendly aggregate: one
    * conditional sum per subspace (each (vector, subspace) carries
    * exactly one LUT distance by construction) added LEFT-TO-RIGHT in
    * subspace order from a 0.0 seed — bit-identical to the previous
    * collect_list → array_sort → interpreted-fold spelling (and to the
    * oracle's `list_reduce(list(d ORDER BY subspace))`: the 0.0 seed is
    * exact, partial distances are never -0.0), but whole-stage
    * codegen'd instead of per-row interpreted. */
  private def adcTotal(m: Int, dCol: String = "d"): Column =
    (0 until m).map(ss => sum(when(col("subspace") === ss, col(dCol))))
      .foldLeft(lit(0.0))(_ + _)

  /** Batched multi-query ADC top-k — [[twoLevelTopKMulti]]'s serving
    * parity for the PQ index: Q sequential [[pqTopK]] calls pay Q scans
    * of the codes table, while this form joins ONE pass over the codes
    * against a broadcast per-query distance table (the Q·m query-slice
    * rows crossed with the m·k codebook — the PQ paper's in-memory LUT,
    * spelled as two broadcast joins) and ranks per query with a window
    * PARTITIONED by query id. Per query, the candidate scores and the
    * (adc asc, id) ranking are exactly [[pqTopK]]'s — per-subspace
    * partials fold in subspace order — so each query's k rows match the
    * single-query contract bit-for-bit and the whole batch replays in
    * DuckDB. Returns (query_id, idCol, adc_dist2 6-dp, rank) ordered by
    * (query_id, rank); `queries` is a bounded driver-side parameter
    * list. */
  def pqTopKMulti(codes: DataFrame, codebooks: DataFrame,
                  queries: Seq[(Long, Seq[Double])], m: Int, k: Int,
                  idCol: String = "vec_id"): DataFrame = {
    require(queries.nonEmpty && k > 0,
      s"queries and k must be non-empty/positive: q=${queries.size} k=$k")
    require(queries.map(_._1).distinct.size == queries.size,
      "pqTopKMulti: query ids must be distinct")
    require(queries.forall(q => q._2.nonEmpty && q._2.size % m == 0),
      s"every query dim must be divisible by m=$m")
    // one slice width serves the whole batch — a shorter query would
    // silently lose its tail subspaces from the LUT join and rank on a
    // partial distance; fail loud instead
    require(queries.forall(_._2.size == queries.head._2.size),
      s"pqTopKMulti: all query dims must match, got ${queries.map(_._2.size).distinct}")
    val w = queries.head._2.size / m
    val spark = codes.sparkSession
    import spark.implicits._
    // Q·m rows of query-slice parameters — broadcast by construction
    val qSlices = queries.flatMap { case (qid, qv) =>
      qv.grouped(w).zipWithIndex.map { case (s, i) => (qid, i, s) }
    }.toDF("query_id", "subspace", "qs")
    // the PQ paper's distance table, literally: m·k·Q entries computed
    // ONCE (the only interpreted dist2 folds in the plan), then one
    // broadcast join against the single codes pass — without this the
    // fold ran per (code row × query), n·m·Q interpreted evaluations
    val lut = broadcast(
      codebooks.withColumnRenamed("cell", "code")
        .join(broadcast(qSlices), Seq("subspace"))
        .select(col("query_id"), col("subspace"), col("code"),
          dist2(col("qs"), col("cvec")).as("d")))
    codes
      .join(lut, Seq("subspace", "code"))
      .groupBy(col("query_id"), col(idCol))
      .agg(adcTotal(m).as("__adc"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("__adc").asc, col(idCol).asc)))
      .where(col("rank") <= k)
      .select(col("query_id"), col(idCol),
        round(col("__adc"), 6).as("adc_dist2"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  // ---- IVF-PQ ([EXT]; Jégou et al. TPAMI 2011 §IVFADC) — the
  // COMPOSITION of the repo's two ANN families, and the standard
  // 100 TB shape: the two-level index contributes bucket pruning (a
  // probe scans nprobe cells, not the corpus), PQ contributes m bytes
  // per vector (codes, not raw floats). The codes quantize RESIDUALS
  // (vector − its fine centroid): residuals concentrate near zero, so
  // one SHARED per-subspace codebook (trained over all cells' residuals
  // — the paper's memory/accuracy compromise vs per-cell codebooks)
  // quantizes them far better than it would raw vectors. Every stage
  // reuses the deterministic pieces the parents certified: two-level
  // Lloyd for the cells, grouped PQ Lloyd for the residual codebooks,
  // the exact left-fold dist2, and ADC's fixed-subspace-order sum —
  // so the whole arc (assign → residual → encode → probe) replays in
  // DuckDB from scratch. ----

  /** Train an IVF-PQ index: two-level cells ([[twoLevelIndex]]'s
    * training), per-vector residuals against the winning fine
    * centroid, then ONE shared PQ codebook set over all residuals
    * ([[pqTrainEncode]] verbatim — same seeds-by-lowest-id, grouped
    * micro-sum Lloyd). Returns (codes, coarse codebooks, pq codebooks):
    * codes = ONE row per vector in the PQ paper's contiguous-code
    * layout — (idCol, cell, dist2, c0..c{m-1}) with the combined cell
    * for bucket pruning, the exact total reconstruction error (the
    * per-subspace dist2 folded in subspace order), and the m codes as
    * int columns. The packed layout is a PROBE-PLAN decision, not just
    * compression: [[ivfPqTopK]] scores a packed row with one literal
    * lookup per subspace — a shuffle-free single-stage plan — where an
    * m-rows-per-vector layout forced a per-probe groupBy (measured
    * ~0.2 s/probe of pure plan overhead at ×100). Coarse codebooks =
    * the k1·k2 (cell, centroid) probe parameters; pq codebooks =
    * (subspace, cell, cvec) over residual space.
    *
    * Scale shape: the two-level training is O(n·(k1+k2)·d), the
    * residual join is a broadcast of k1·k2 centroid rows, and PQ
    * training rides the same flat-per-iteration grouped aggregates as
    * [[pqTrainEncode]] — nothing here is quadratic or per-cell-looped. */
  def ivfPqTrainEncode(embeddings: DataFrame, k1: Int, k2: Int,
                       m: Int, k: Int, dim: Int, iters: Int = 2,
                       idCol: String = "vec_id", vecCol: String = "embedding")
      : (DataFrame, Array[(Long, Array[Double])], DataFrame) = {
    val (assigned, cbs) = twoLevelCore(embeddings, k1, k2, iters, idCol, vecCol,
      broadcastCodebooks = true)
    // residual = vector − its fine centroid, element-wise exact (both
    // sides double; the centroid is the micro-sum rational rendered
    // once — the same value the oracle's fm1 CTE computes). Pinned:
    // it feeds PQ training (via the slices checkpoint) AND the final
    // cell join, and without the pin each action would re-run the
    // whole two-level training chain.
    val resid = assigned
      .join(broadcast(cbs.select(col("cell1"), col("cell").as("fine"),
        col("cvec"))), Seq("cell1", "fine"))
      .select(col(idCol), col("cell"),
        zip_with(col("__v"), col("cvec"), (a, b) => a - b).as("__rv"))
      .localCheckpoint(eager = false)
    val (codes, pqCbs) = pqTrainEncode(resid.select(col(idCol), col("__rv")),
      m, k, iters, dim, idCol, "__rv")
    // pack m (subspace, code) rows into one row per vector: exactly one
    // row per (vector, subspace) exists, so the conditional max IS that
    // row's code; dist2 folds in subspace order from a 0.0 seed
    // ([[adcTotal]]'s spelling — exact, partials are never -0.0)
    val codeCols = (0 until m).map(ss =>
      max(when(col("subspace") === ss, col("code"))).cast("int").as(s"c$ss"))
    val packed = codes.groupBy(col(idCol))
      .agg(codeCols.head, (codeCols.tail :+ adcTotal(m, "dist2").as("dist2")): _*)
    val withCell = packed.join(resid.select(col(idCol), col("cell")), Seq(idCol))
      .select(Seq(col(idCol), col("cell"), col("dist2")) ++
        (0 until m).map(ss => col(s"c$ss")): _*)
    val centers = cbs.collect()
      .map(r => (r.getInt(0).toLong * k2 + r.getInt(1),
        r.getSeq[Double](2).toArray))
      .sortBy(_._1)
    (withCell, centers, pqCbs)
  }

  /** IVF-PQ top-k: rank the k1·k2 fine centroids by exact query
    * distance (driver-side, [[twoLevelTopK]]'s ranking verbatim — ties
    * on cell id), then scan ONLY the nprobe probed cells' packed code
    * rows (bucket-pruned when persisted via [[ivfPqWriteIndex]]) and
    * score by ADC over the PER-CELL residual query: qr(cell) = query −
    * that cell's centroid. The whole distance table (nprobe·m·k
    * doubles) is computed DRIVER-SIDE with the exact left-fold dist2
    * and baked into the plan as literal arrays, so the scan is ONE
    * codegen'd projection — per row, a CASE over the nprobe cells
    * selecting m element_at lookups summed in subspace order — into
    * TakeOrderedAndProject: no broadcast job, no shuffle, no join (the
    * m-rows-per-vector spelling paid a groupBy per probe — measured
    * ~0.2 s/probe of plan overhead at ×100). vs [[twoLevelTopK]] the
    * probed rows are m bytes, not d floats; vs [[pqTopK]] only nprobe
    * cells are read, not every code file. Returns (idCol, adc_dist2
    * 6-dp) ordered (adc asc, id). */
  /** The residual-codebook parameter table collected once per probe
    * call: subspace → populated (codeword id, centroid) rows sorted by
    * id. Bounded (m·k rows), shared by the single- and multi-query
    * probes. */
  private def pqCodewords(pqCbs: DataFrame): Map[Int, Array[(Int, Array[Double])]] =
    pqCbs.collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
      .groupBy(_._1)
      .map { case (ss, rows) => ss -> rows.map(t => (t._2, t._3)).sortBy(_._1) }

  /** The PQ paper's distance table for ONE (query, probed cell) pair,
    * computed driver-side: lut(subspace)(code) = exact left-fold dist2
    * between the cell's residual-query slice (query − cell centroid)
    * and the codeword — m·k bounded PARAMETERS (the pqTopK LUT lesson
    * taken to its end: zero interpreted folds anywhere in the executed
    * plan). Array POSITION = codeword id + 1 (element_at is 1-based);
    * the final codebook only carries POPULATED codewords, so ids can
    * be sparse — unreferenced gaps stay NaN (codes always point at
    * codewords the final assignment ranked, which all exist). */
  private def residualLut(cwords: Map[Int, Array[(Int, Array[Double])]],
                          cent: Array[Double], query: Seq[Double],
                          m: Int, w: Int): Array[Array[Double]] = {
    val qr = Array.tabulate(query.size)(i => query(i) - cent(i))
    Array.tabulate(m) { ss =>
      val slice = qr.slice(ss * w, (ss + 1) * w)
      val arr = Array.fill(cwords(ss).map(_._1).max + 1)(Double.NaN)
      cwords(ss).foreach { case (code, cw) =>
        var s = 0.0
        var i = 0
        while (i < w) { val d = slice(i) - cw(i); s += d * d; i += 1 }
        arr(code) = s
      }
      arr
    }
  }

  def ivfPqTopK(codes: DataFrame, coarseCbs: Array[(Long, Array[Double])],
                pqCbs: DataFrame, query: Seq[Double], m: Int, k: Int,
                nprobe: Int = 4, idCol: String = "vec_id"): DataFrame = {
    require(nprobe > 0 && k > 0, s"k and nprobe must be positive: k=$k nprobe=$nprobe")
    require(coarseCbs.nonEmpty, "ivfPqTopK needs trained coarse codebooks")
    require(query.nonEmpty && query.size % m == 0,
      s"query dim ${query.size} not divisible by m $m")
    val w = query.size / m
    def d2c(c: Array[Double]): Double = {
      var s = 0.0
      var i = 0
      while (i < c.length) { val d = c(i) - query(i); s += d * d; i += 1 }
      s
    }
    val probe = coarseCbs.map { case (cell, c) => (d2c(c), cell) }
      .sortBy(identity).take(nprobe).map(_._2)
    val cmap = coarseCbs.toMap
    val cwords = pqCodewords(pqCbs)
    // per probed cell: sum of m literal-array lookups, added in
    // subspace order (left-to-right — the oracle's list_reduce order)
    def cellScore(cell: Long): Column = {
      val lut = residualLut(cwords, cmap(cell), query, m, w)
      (0 until m).map(ss =>
        element_at(array(lut(ss).map(lit).toIndexedSeq: _*), col(s"c$ss") + 1))
        .reduceLeft(_ + _)
    }
    val scored = probe.tail.foldLeft(
      when(col("cell") === probe.head, cellScore(probe.head))) {
      (acc, cell) => acc.when(col("cell") === cell, cellScore(cell))
    }
    codes.where(col("cell").isin(probe.toSeq: _*))
      .select(col(idCol), scored.as("__adc"))
      .orderBy(col("__adc").asc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), round(col("__adc"), 6).as("adc_dist2"))
  }

  /** Persist an IVF-PQ index for build-once/probe-many: the codes land
    * BUCKETED AND SORTED by `cell` ([[twoLevelWriteIndex]] semantics —
    * a probe's `cell IN (nprobe cells)` prunes to matching bucket
    * files), coarse and PQ codebooks as small parquet parameter
    * tables. At 100 TB the codes table is ~m bytes/vector AND
    * bucket-pruned — the artifact neither parent ships alone. */
  def ivfPqWriteIndex(codes: DataFrame, coarseCbs: Array[(Long, Array[Double])],
                      pqCbs: DataFrame, table: String, root: String,
                      nBuckets: Int): Unit = {
    graft.sources.Bucketing.writeBucketed(codes, table, "cell", nBuckets,
      s"$root/codes")
    val spark = codes.sparkSession
    import spark.implicits._
    coarseCbs.toSeq.map { case (c, v) => (c, v.toSeq) }.toDF("cell", "cvec")
      .coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$root/coarse_codebooks")
    pqCbs.coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$root/pq_codebooks")
  }

  /** Open a persisted IVF-PQ index: re-register the bucketed codes
    * table if this session's catalog lacks it (bucket spec re-declared
    * so probes keep SelectedBucketsCount pruning), read both codebook
    * parameter tables back. Feed the triple straight to [[ivfPqTopK]]. */
  def ivfPqOpenIndex(spark: org.apache.spark.sql.SparkSession, table: String,
                     root: String, nBuckets: Int)
      : (DataFrame, Array[(Long, Array[Double])], DataFrame) = {
    if (!spark.catalog.tableExists(table)) {
      val ddl = spark.read.parquet(s"$root/codes").schema.toDDL
      spark.sql(s"CREATE TABLE $table ($ddl) USING PARQUET " +
        s"CLUSTERED BY (cell) SORTED BY (cell) INTO $nBuckets BUCKETS " +
        s"LOCATION '$root/codes'")
    }
    val coarse = spark.read.parquet(s"$root/coarse_codebooks").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).sortBy(_._1)
    (spark.table(table), coarse, spark.read.parquet(s"$root/pq_codebooks"))
  }

  /** Batched multi-query IVF-PQ top-k — the ANN SERVING form for the
    * composed family ([[twoLevelTopKMulti]] / [[pqTopKMulti]]'s twin),
    * and the form the ×100 probe measurement argues for: a single
    * probe's wall is almost all fixed plan/scan setup (~0.3 s/probe
    * against milliseconds of actual ADC arithmetic), so Q sequential
    * probes pay Q setups. This form ranks each query's probe cells
    * driver-side (exactly [[ivfPqTopK]]'s ranking — ties on combined
    * cell id), unions the per-query nprobe cell sets into ONE
    * bucket-pruned scan of the packed codes, joins a broadcast
    * (query_id, cell, lut) parameter table — Q·nprobe rows, each
    * carrying its m·k distance table computed driver-side with the
    * exact left-fold ([[residualLut]], the same doubles the
    * single-query probe bakes in as literals) — scores each
    * (code row × probing query) with m nested element_at lookups
    * summed in subspace order, and ranks per query with a window
    * PARTITIONED by query id (bounded by the probed cells' members —
    * never global). Per query, candidates and the (adc, id) ranking
    * are exactly [[ivfPqTopK]]'s — spec-asserted bit-match.
    *
    * Returns (query_id, idCol, adc_dist2 6-dp, rank) ordered by
    * (query_id, rank). `queries` is a bounded driver-side parameter
    * list, not data. */
  def ivfPqTopKMulti(codes: DataFrame, coarseCbs: Array[(Long, Array[Double])],
                     pqCbs: DataFrame, queries: Seq[(Long, Seq[Double])],
                     m: Int, k: Int, nprobe: Int = 4,
                     idCol: String = "vec_id"): DataFrame = {
    require(queries.nonEmpty && nprobe > 0 && k > 0,
      s"queries, k and nprobe must be non-empty/positive: q=${queries.size} k=$k nprobe=$nprobe")
    // a duplicated query id would double its candidate rows through the
    // (query_id, cell) join and corrupt that query's rank — fail loud
    require(queries.map(_._1).distinct.size == queries.size,
      "ivfPqTopKMulti: query ids must be distinct")
    require(queries.forall(q => q._2.nonEmpty && q._2.size % m == 0),
      s"every query dim must be divisible by m=$m")
    require(queries.forall(_._2.size == queries.head._2.size),
      s"ivfPqTopKMulti: all query dims must match, got ${queries.map(_._2.size).distinct}")
    require(coarseCbs.nonEmpty, "ivfPqTopKMulti needs trained coarse codebooks")
    val w = queries.head._2.size / m
    val cmap = coarseCbs.toMap
    val cwords = pqCodewords(pqCbs)
    def d2(c: Array[Double], q: Seq[Double]): Double = {
      var s = 0.0
      var i = 0
      while (i < c.length) { val d = c(i) - q(i); s += d * d; i += 1 }
      s
    }
    // per (query, probed cell): the cell id and that pair's LUT —
    // Q·nprobe rows of probe parameters, broadcast by construction
    val probes: Seq[(Long, Long, Seq[Seq[Double]])] =
      queries.flatMap { case (qid, qv) =>
        coarseCbs.map { case (cell, c) => (d2(c, qv), cell) }
          .sortBy(identity).take(nprobe).map { case (_, cell) =>
            (qid, cell,
              residualLut(cwords, cmap(cell), qv, m, w).map(_.toSeq).toSeq)
          }
      }
    val unionCells = probes.map(_._2).distinct
    val spark = codes.sparkSession
    import spark.implicits._
    val probeDf = broadcast(probes.toDF("query_id", "cell", "__lut"))
    codes.where(col("cell").isin(unionCells: _*))
      .join(probeDf, Seq("cell"))
      .select(col("query_id"), col(idCol),
        (0 until m).map(ss =>
          element_at(element_at(col("__lut"), ss + 1), col(s"c$ss") + 1))
          .reduceLeft(_ + _).as("__adc"))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("__adc").asc, col(idCol).asc)))
      .where(col("rank") <= k)
      .select(col("query_id"), col(idCol),
        round(col("__adc"), 6).as("adc_dist2"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }
}
