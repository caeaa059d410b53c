package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expressions.GraftFunctions

/** Embedding similarity search (SURVEY.md §2.3 [EXT]).
  *
  * All math in double precision via codegen'd higher-order functions
  * (`zip_with` + `aggregate`) — no UDFs, so the dot product stays
  * inside whole-stage codegen.
  *
  * Scale path: `topK` against one query is an embarrassingly parallel
  * scan + TakeOrderedAndProject. `knnJoin` is quadratic and is meant
  * for small/medium corpora or per-bucket use; `lshKnnJoin` prunes
  * candidates by random-hyperplane bucket first, which is the shape
  * you'd run at 100 TB (bucket join instead of cross join).
  */
object Similarity {

  def asDouble(vec: Column): Column = transform(vec, _.cast("double"))

  /** Sequential-order dot product via built-in higher-order functions
    * (left-to-right, matching a scalar loop — reproducible across
    * engines). Works without session registration; the DataFrame-level
    * operators below use the native [[graft.expressions.DotProduct]]
    * instead, which produces bit-identical results without the
    * intermediate product array. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, _ * _), lit(0.0), _ + _)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Cosine via the codegen'd native dot product (requires
    * [[GraftFunctions.register]]); accepts float or double arrays. */
  def nativeCosine(a: Column, b: Column): Column =
    GraftFunctions.dot(a, b) /
      (sqrt(GraftFunctions.dot(a, a)) * sqrt(GraftFunctions.dot(b, b)))

  /** Cosine similarity of every vector against one query vector. */
  def scoresAgainst(embeddings: DataFrame, queryVec: Seq[Double],
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    GraftFunctions.register(embeddings.sparkSession)
    val q = typedLit(queryVec)
    embeddings.select(col(idCol),
      nativeCosine(col(vecCol), q).as("cosine_sim"))
  }

  /** Fetch a stored vector to use as the query (driver-side scalar —
    * a query *parameter*, not data). */
  def vectorOf(embeddings: DataFrame, id: Long,
               idCol: String = "vec_id", vecCol: String = "embedding"): Seq[Double] =
    embeddings.where(col(idCol) === id).select(col(vecCol))
      .head().getSeq[Float](0).map(_.toDouble)

  /** Brute-force top-k: full scan + TakeOrderedAndProject (true top-k,
    * no global sort materialization). */
  def topK(embeddings: DataFrame, queryVec: Seq[Double], k: Int,
           idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    scoresAgainst(embeddings, queryVec, idCol, vecCol)
      .orderBy(col("cosine_sim").desc, col(idCol))
      .limit(k)

  /** Fail-fast guard for the brute-force broadcast paths: a comment
    * saying "small corpora only" is not a guard — a caller handing
    * [[knnJoin]] a 10 B-row table would OOM the DRIVER on the
    * broadcast collect, the worst failure mode (takes the whole app
    * down, not one task). One cheap `limit(max+1).count()` bounds the
    * check itself (never a full scan of an oversized table). */
  private def requireBroadcastable(embeddings: DataFrame, maxRows: Long,
                                   op: String): Unit = {
    require(maxRows > 0, s"maxBroadcastRows must be positive: $maxRows")
    // A threshold at or past Int.MaxValue would clamp the probe limit and
    // make the guard vacuous (probe <= maxRows always true) while the
    // "cheap" probe itself counts ~2^31 rows — and any broadcast that
    // large is unconditionally fatal anyway, so reject the configuration.
    require(maxRows < Int.MaxValue,
      s"maxBroadcastRows=$maxRows disables the guard (probe limit clamps " +
        "at Int.MaxValue); a broadcast that size is fatal regardless — " +
        "use lshKnnJoin for corpus-scale inputs")
    val probeRows = maxRows.toInt + 1
    val probe = embeddings.limit(probeRows).count()
    require(probe <= maxRows,
      s"$op broadcasts the full embedding table, but it exceeds " +
        s"maxBroadcastRows=$maxRows — this is the documented small/medium " +
        "path. At corpus scale use lshKnnJoin (bucketed sign-LSH, never " +
        "all-pairs), or raise maxBroadcastRows deliberately.")
  }

  /** All-pairs k-NN join (brute force). Broadcast one side; only for
    * corpora whose one side fits the broadcast threshold — enforced
    * by a fail-fast row-count guard (`maxBroadcastRows`), with
    * [[lshKnnJoin]] as the at-scale alternative. Vectors stay
    * in their storage type (float) end-to-end — half the broadcast
    * and shuffle width of an array<double> cast. */
  def knnJoin(embeddings: DataFrame, k: Int,
              idCol: String = "vec_id", vecCol: String = "embedding",
              maxBroadcastRows: Long = 1000000L): DataFrame = {
    requireBroadcastable(embeddings, maxBroadcastRows, "knnJoin")
    GraftFunctions.register(embeddings.sparkSession)
    // the probe side keeps its input partitioning through a broadcast
    // join — an embeddings table read from one file would compute the
    // whole cross product on a single task; spread it explicitly
    // (REPARTITION_BY_NUM: exempt from AQE's bytes-based coalescing)
    val spread = embeddings.repartition(
      embeddings.sparkSession.sparkContext.defaultParallelism, col(idCol))
    val a = spread.select(col(idCol).as("id_a"), col(vecCol).as("v_a"))
    val b = embeddings.select(col(idCol).as("id_b"), col(vecCol).as("v_b"))
    val w = Window.partitionBy(col("id_a"))
      .orderBy(col("cosine_sim").desc, col("id_b"))
    a.crossJoin(broadcast(b))
      .where(col("id_a") =!= col("id_b"))
      .withColumn("cosine_sim", nativeCosine(col("v_a"), col("v_b")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("id_a"), col("id_b"), col("cosine_sim"), col("rank"))
  }

  /** Hard-negative mining for contrastive/embedding training: for
    * each vector, the k most-similar vectors carrying a DIFFERENT
    * label — the near-misses that teach a metric model the most. The
    * label filter runs BEFORE ranking (filtering after top-k would
    * starve vectors whose neighborhoods are same-label and return
    * fewer than k negatives). Same broadcast brute-force shape as
    * [[knnJoin]] for small/medium corpora (same fail-fast
    * `maxBroadcastRows` guard); at 100 TB feed the pair
    * stage from [[lshKnnJoin]]'s buckets instead and widen k to cover
    * bucket recall. */
  def hardNegatives(embeddings: DataFrame, k: Int,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    labelCol: String = "label",
                    maxBroadcastRows: Long = 1000000L): DataFrame = {
    requireBroadcastable(embeddings, maxBroadcastRows, "hardNegatives")
    GraftFunctions.register(embeddings.sparkSession)
    val spread = embeddings.repartition(
      embeddings.sparkSession.sparkContext.defaultParallelism, col(idCol))
    val a = spread.select(col(idCol).as("id_a"), col(vecCol).as("v_a"),
      col(labelCol).as("label_a"))
    val b = embeddings.select(col(idCol).as("id_b"), col(vecCol).as("v_b"),
      col(labelCol).as("label_b"))
    val w = Window.partitionBy(col("id_a"))
      .orderBy(col("cosine_sim").desc, col("id_b"))
    a.crossJoin(broadcast(b))
      .where(col("id_a") =!= col("id_b") && col("label_a") =!= col("label_b"))
      .withColumn("cosine_sim", nativeCosine(col("v_a"), col("v_b")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("id_a"), col("label_a"), col("id_b"), col("label_b"),
        col("cosine_sim"), col("rank"))
  }

  /** Deterministic random hyperplanes (seeded) for sign-LSH. */
  def hyperplanes(dim: Int, nBits: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(nBits)(Seq.fill(dim)(rng.nextGaussian()))
  }

  /** Johnson-Lindenstrauss projection planes: the same deterministic
    * seeded-Gaussian family as [[hyperplanes]], scaled by
    * `1/sqrt(outDim)` so projected L2 distances estimate original
    * distances (E[|Rx|²] = |x|²). */
  def projectionPlanes(dim: Int, outDim: Int, seed: Long = 7L): Seq[Seq[Double]] =
    hyperplanes(dim, outDim, seed).map(_.map(_ / math.sqrt(outDim.toDouble)))

  /** Random-projection dimensionality reduction ([EXT]; Johnson-
    * Lindenstrauss): each output component is one dot product with a
    * fixed seeded-Gaussian plane — 64-dim float vectors become
    * `outDim`-dim summaries whose pairwise distances approximate the
    * originals. The cheap front half of a two-stage ANN: candidate
    * generation in the reduced space (outDim/dim of the flops and
    * bytes), exact rescoring on the full vectors for survivors — the
    * same candidates-then-verify layout as [[quantizeEmbeddings]],
    * trading the int8 grid for a dense low-dim real space.
    *
    * Embarrassingly parallel: the planes are literals baked into the
    * plan (no side table, no broadcast, no driver state), one
    * codegen'd [[graft.expressions.DotProduct]] per output dim riding
    * the scan. Components are rounded to 6 dp — reproducible across
    * engines and partitionings. */
  def randomProject(embeddings: DataFrame, outDim: Int, dim: Int, seed: Long = 7L,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val planes = projectionPlanes(dim, outDim, seed)
    embeddings.select(col(idCol),
      array(planes.map(p =>
        round(GraftFunctions.dot(col(vecCol), typedLit(p)), 6)): _*).as("rvec"))
      .orderBy(col(idCol))
  }

  /** Sign-LSH bucket id: one bit per hyperplane (uses the native dot
    * product; callers must have registered [[GraftFunctions]]). */
  def lshBucket(vec: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(GraftFunctions.dot(vec, typedLit(p)) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** IVF (inverted-file) ANN: a k-means coarse quantizer partitions
    * the corpus into cells; a query scans only the `nprobe` cells
    * whose centroids are nearest. The index (cell assignments) is a
    * one-time cost amortized over queries; at 100 TB the assigned
    * table would be written bucketed by cell so a probe reads only
    * its cells' files. Recall < 1 by construction (like every ANN).
    *
    * Returns (cell-assigned corpus, centroids) — build once, probe
    * many times with [[ivfTopK]]. */
  def ivfIndex(embeddings: DataFrame, nCells: Int = 16, seed: Long = 42L,
               idCol: String = "vec_id", vecCol: String = "embedding")
      : (DataFrame, Array[Array[Double]]) = {
    GraftFunctions.register(embeddings.sparkSession)
    val assembled = embeddings.select(col(idCol), col(vecCol),
      org.apache.spark.ml.functions.array_to_vector(col(vecCol)).as("__features"))
    val model = new org.apache.spark.ml.clustering.KMeans()
      .setK(nCells).setSeed(seed).setFeaturesCol("__features").setPredictionCol("__cell")
      .fit(assembled)
    val assigned = model.transform(assembled).drop("__features")
    (assigned, model.clusterCenters.map(_.toArray))
  }

  /** Persist IVF cell assignments bucketed by `__cell`: a probe's
    * `isin(probed cells)` filter then prunes whole bucket FILES at the
    * scan (`SelectedBucketsCount: nprobe out of nCells` in the plan) —
    * at 100 TB a probe touches only its cells' bytes, not the corpus.
    * Probe the stored index with `ivfTopK(spark.table(table), ...)`.
    *
    * Two pruning layers: (1) bucket-file pruning needs the bucketed
    * scan, and Spark's DisableUnnecessaryBucketedScan rule turns that
    * off for plans with no join/agg on the bucket column — probe-only
    * sessions should set
    * `spark.sql.sources.bucketing.autoBucketedScan.enabled=false` to
    * keep it; (2) even without it, `sortBy(__cell)` means each file's
    * parquet min/max stats cover one cell, so the pushed `In` filter
    * skips foreign row groups — the IO win survives, just not as
    * visible file-level pruning. */
  def ivfWriteIndex(assigned: DataFrame, table: String, path: String, nCells: Int): Unit =
    graft.sources.Bucketing.writeBucketed(assigned, table, "__cell", nCells, path)

  /** Top-k against one query via the IVF index: probe the nprobe
    * nearest cells only — the scan shrinks by ~nCells/nprobe. */
  def ivfTopK(assigned: DataFrame, centroids: Array[Array[Double]],
              queryVec: Seq[Double], k: Int, nprobe: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    def dist2(c: Array[Double]) =
      c.zip(queryVec).map { case (a, b) => (a - b) * (a - b) }.sum
    val probeCells = centroids.zipWithIndex.sortBy { case (c, _) => dist2(c) }
      .take(nprobe).map(_._2)
    val q = typedLit(queryVec)
    assigned.where(col("__cell").isin(probeCells.toSeq: _*))
      .select(col(idCol), nativeCosine(col(vecCol), q).as("cosine_sim"))
      .orderBy(col("cosine_sim").desc, col(idCol))
      .limit(k)
  }

  /** Drop rows of buckets holding more than `maxBucket` rows (no-op
    * when the cap is off). The bucket histogram is a tiny aggregate —
    * bounded by the bucket-id space — and always broadcastable. */
  private def capBuckets(tagged: DataFrame, bucketCols: Seq[String],
                         maxBucket: Int): DataFrame =
    if (maxBucket <= 0) tagged
    else {
      val small = tagged.groupBy(bucketCols.map(col): _*)
        .agg(count(lit(1)).as("__n")).where(col("__n") <= maxBucket)
      tagged.join(broadcast(small), bucketCols).drop("__n")
    }

  /** (bucket, id, v) with sign-LSH bucket tags, hot buckets pruned
    * when `maxBucket > 0` — the shared front of the bucketed ANN
    * joins. */
  private def lshTagged(embeddings: DataFrame, dim: Int, nBits: Int, seed: Long,
                        idCol: String, vecCol: String, maxBucket: Int): DataFrame = {
    GraftFunctions.register(embeddings.sparkSession)
    val planes = hyperplanes(dim, nBits, seed)
    val tagged = embeddings.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("bucket", lshBucket(col("v"), planes))
    capBuckets(tagged, Seq("bucket"), maxBucket)
  }

  /** ANN k-NN join pruned by shared LSH bucket: the quadratic work
    * happens only inside buckets (equi-join on bucket id — a plain
    * shuffle join that scales out). Recall < 1 by construction.
    *
    * `dim` is the embedding dimensionality, a query parameter — taken
    * explicitly so NO driver-side action runs before the plan executes
    * (a `head()` probe would scan a partition at plan-build time).
    *
    * Hot-bucket guard: sign-LSH buckets of a skewed corpus (many
    * near-identical vectors, e.g. zero/padding embeddings) can hold an
    * unbounded share of the rows, making one bucket's self-join
    * quadratic in corpus size. `maxBucket > 0` excludes buckets above
    * the cap from BOTH join sides before the pair expansion — their
    * members get no neighbors from this index (rerun them through
    * [[topK]]/[[ivfTopK]] or a finer hash if they matter). 0 (default)
    * = uncapped. */
  def lshKnnJoin(embeddings: DataFrame, k: Int, dim: Int, nBits: Int = 8, seed: Long = 42L,
                 idCol: String = "vec_id", vecCol: String = "embedding",
                 maxBucket: Int = 0): DataFrame = {
    val pruned = lshTagged(embeddings, dim, nBits, seed, idCol, vecCol, maxBucket)
    val a = pruned.select(col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val b = pruned.select(col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
    val w = Window.partitionBy(col("id_a"))
      .orderBy(col("cosine_sim").desc, col("id_b"))
    a.join(b, Seq("bucket"))
      .where(col("id_a") =!= col("id_b"))
      .withColumn("cosine_sim", nativeCosine(col("v_a"), col("v_b")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("id_a"), col("id_b"), col("cosine_sim"), col("rank"))
  }

  /** Multi-probe flavor of [[lshKnnJoin]]: one INDEPENDENT hyperplane
    * set per seed; a candidate pair shares a bucket under ANY seed
    * (same band structure as MinHash-LSH). Recall rises toward 1 with
    * the seed count — each seed is an independent partition of the
    * sphere, so a near pair split by one partition is usually joined
    * by another — at linearly more candidate work: the standard
    * recall/cost dial. Pairs found under several seeds are
    * deduplicated BEFORE ranking (cosine is deterministic, so the
    * distinct collapses them exactly). */
  def lshKnnJoinMultiSeed(embeddings: DataFrame, k: Int, dim: Int, nBits: Int = 8,
                          seeds: Seq[Long] = Seq(42L, 43L),
                          idCol: String = "vec_id", vecCol: String = "embedding",
                          maxBucket: Int = 0): DataFrame = {
    GraftFunctions.register(embeddings.sparkSession)
    require(seeds.nonEmpty, "lshKnnJoinMultiSeed needs at least one seed")
    val bandCols = seeds.zipWithIndex.map { case (s, i) =>
      struct(lit(i).as("band"), lshBucket(col("v"), hyperplanes(dim, nBits, s)).as("bucket"))
    }
    val tagged0 = embeddings.select(col(idCol).as("id"), col(vecCol).as("v"))
      .select(col("id"), col("v"), explode(array(bandCols: _*)).as("e"))
      .select(col("id"), col("v"), col("e.band").as("band"), col("e.bucket").as("bucket"))
    val tagged = capBuckets(tagged0, Seq("band", "bucket"), maxBucket)
    val a = tagged.select(col("band"), col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val b = tagged.select(col("band"), col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
    val w = Window.partitionBy(col("id_a"))
      .orderBy(col("cosine_sim").desc, col("id_b"))
    a.join(b, Seq("band", "bucket"))
      .where(col("id_a") =!= col("id_b"))
      .withColumn("cosine_sim", nativeCosine(col("v_a"), col("v_b")))
      .select(col("id_a"), col("id_b"), col("cosine_sim"))
      .distinct()
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }

  /** Unordered candidate pairs (doc_a < doc_b) sharing an LSH bucket
    * with cosine >= threshold — the pair stage of embedding near-dup
    * dedup. Each vector lives in exactly one bucket (single nBits-bit
    * hash), so no pair appears twice. */
  def lshSimilarPairs(embeddings: DataFrame, threshold: Double, dim: Int,
                      nBits: Int = 8, seed: Long = 42L,
                      idCol: String = "vec_id", vecCol: String = "embedding",
                      maxBucket: Int = 0): DataFrame = {
    val pruned = lshTagged(embeddings, dim, nBits, seed, idCol, vecCol, maxBucket)
    val a = pruned.select(col("bucket"), col("id").as("doc_a"), col("v").as("v_a"))
    val b = pruned.select(col("bucket"), col("id").as("doc_b"), col("v").as("v_b"))
    a.join(b, Seq("bucket"))
      .where(col("doc_a") < col("doc_b"))
      .withColumn("cosine_sim", nativeCosine(col("v_a"), col("v_b")))
      .where(col("cosine_sim") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("cosine_sim"))
  }

  /** End-to-end embedding near-dup dedup: LSH-bucketed cosine pairs
    * above `threshold` form a graph; every vector keeps the min id of
    * its connected component (via [[Dedup.connectedKeepers]] — the
    * same adaptive components engine as document dedup). Returns
    * (idCol, keeper_id) for EVERY vector; unmatched vectors keep
    * themselves. Recall < 1 inherits from the LSH bucketing: a
    * cross-bucket near-dup pair is not seen (raise nBits' inverse or
    * run multiple seeds for higher recall). */
  def dedupByEmbedding(embeddings: DataFrame, threshold: Double, dim: Int,
                       nBits: Int = 8, seed: Long = 42L,
                       idCol: String = "vec_id", vecCol: String = "embedding",
                       maxBucket: Int = 0): DataFrame = {
    val pairs = lshSimilarPairs(embeddings, threshold, dim, nBits, seed,
      idCol, vecCol, maxBucket).select(col("doc_a"), col("doc_b"))
    val roots = graft.operators.Dedup.connectedKeepers(pairs)
      .withColumnRenamed("doc_id", idCol)
    embeddings.select(col(idCol))
      .join(roots, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("root"), col(idCol)).as("keeper_id"))
      .orderBy(col(idCol))
  }

  /** Int8 scalar quantization of an embedding column: per-DIMENSION
    * global min/max define a 256-level uniform grid; each element maps
    * to `round((x - mn) * 255 / (mx - mn))` — 4x smaller vectors (64
    * int8 codes vs 64 floats) for ANN candidate generation, with exact
    * rescoring on the float column for the survivors (the standard
    * compressed-index layout: codes in memory, floats on disk).
    *
    * Returns (id, codes array<int>, max_abs_err) — the error column
    * (largest per-element reconstruction error, rounded) is the
    * quality surface: it bounds how far quantized dot products drift.
    * A constant dimension (mx == mn) codes to 0 with zero error.
    *
    * Shape: the per-dimension stats are one posexplode + (pos) hash
    * aggregate — map-side combined, shuffle carries dim rows per task
    * (flat in corpus size, same argument as [[labelCentroids]]); the
    * 1-row (mn[], mx[]) bound broadcasts back, so the encode pass is
    * embarrassingly parallel. min/max of floats are exact (no
    * float-sum nondeterminism), making the codes engine-exact. */
  def quantizeEmbeddings(embeddings: DataFrame, idCol: String = "vec_id",
                         vecCol: String = "embedding"): DataFrame = {
    val dims = embeddings
      .select(posexplode(col(vecCol)).as(Seq("pos", "v")))
      .groupBy(col("pos"))
      .agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
    // rebuild the per-dimension stats as 1-row arrays ordered by pos
    // (array_sort on (pos, stat) structs orders by pos — the struct's
    // leading field — so the transform extracts values in dim order)
    val bounds = dims.agg(
      transform(array_sort(collect_list(struct(col("pos"), col("mn")))),
        s => s.getField("mn")).as("__mn"),
      transform(array_sort(collect_list(struct(col("pos"), col("mx")))),
        s => s.getField("mx")).as("__mx"))
    val idx = sequence(lit(1), size(col(vecCol)))
    def at(c: String, i: Column) = element_at(col(c), i).cast("double")
    // code and err are built in ONE per-element struct: an err lambda
    // that referenced a separate `codes` alias got that alias INLINED
    // (CollapseProject), re-evaluating the whole 64-element code
    // transform per error element — O(dim²)/row, measured 66x on the
    // encode pass. Same HOF-lambda trap as the n-gram builds, one
    // level up: never reference a computed-array alias from inside
    // another lambda over the same width.
    val pairs = transform(idx, i => {
      val x = at(vecCol, i)
      val mn = at("__mn", i)
      val mx = at("__mx", i)
      val code = when(mx === mn, lit(0))
        .otherwise(round((x - mn) * lit(255) / (mx - mn), 0).cast("int"))
      struct(code.as("code"),
        abs(mn + code.cast("double") * (mx - mn) / lit(255) - x).as("err"))
    })
    embeddings.crossJoin(broadcast(bounds))
      .withColumn("__qe", pairs)
      .select(col(idCol),
        transform(col("__qe"), s => s.getField("code")).as("codes"),
        round(array_max(transform(col("__qe"), s => s.getField("err"))), 6)
          .as("max_abs_err"))
      .orderBy(col(idCol))
  }

  /** Per-label centroid components in EXACT integer form: for every
    * (label, dimension) the count and the sum of elements scaled to
    * micro-units (`round(x * 1e6)` as BIGINT) — class prototypes /
    * IVF cell statistics without float-sum nondeterminism. A double
    * `avg` differs run-to-run with partitioning (addition order);
    * integer micro-sums are order-independent and engine-exact. The
    * caller divides (`sum_micro / n_vecs / 1e6`) when materializing
    * float centroids — the division is NOT done here because integral
    * division semantics differ across engines for negative values
    * (floor vs truncate), which would break the oracle.
    *
    * Shape: posexplode fans each vector ×dim, but the (label, pos)
    * hash aggregate combines map-side, so the shuffle carries
    * |labels| × dim rows per task — flat in corpus size. */
  def labelCentroids(embeddings: DataFrame, labelCol: String = "label",
                     vecCol: String = "embedding"): DataFrame =
    embeddings
      .select(col(labelCol).as("label"), posexplode(col(vecCol)).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos").cast("long").as("pos"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(round(col("v").cast("double") * 1000000, 0).cast("long")).as("sum_micro"))
      .orderBy(col("label"), col("pos"))

  /** Exact embedding covariance matrix ([EXT]) — for every dimension
    * pair (i, j ≥ i): the vector count, the micro-unit second-moment
    * and per-dimension sums (all exact BIGINTs, [[labelCentroids]]'
    * order-independence discipline), and the sample covariance
    * `(Σxy/n − (Σx/n)(Σy/n))`. The d×d matrix feeds whitening, PCA
    * (eigensolve the d² result on the driver — bounded), and
    * redundant-dimension audits before quantization
    * ([[quantizeEmbeddings]]) or projection ([[randomProject]]).
    * `dim` is explicit (the LSH-dim contract: no pre-plan driver
    * action); NULL and ragged rows are excluded.
    *
    * Shape: ONE pass through [[graft.expressions.CovMomentsAggregator]]
    * — d(d+1)/2 fused multiply-adds per row into a primitive long
    * buffer, partial-combined map-side, so the shuffle ships one
    * ~(d²/2)-cell buffer per task (KBs, flat in corpus size). An
    * explode-based spelling (d(d+1)/2 structs per row through
    * Generate + HashAggregate) has the same shuffle bound but paid
    * ~10× the CPU (3.1 s → 0.3 s at sf0.1). The final matrix
    * materializes driver-side from the single merged buffer —
    * bounded, like the IVF centroid collect.
    *
    * The `cov` render is deliberately UNROUNDED: every op (int→double
    * cast, /, *, −) is exactly-specified IEEE, so the double is
    * bit-equal across engines — while round() near an exact 6-dp tie
    * is resolved differently by Spark (HALF_UP on the double's full
    * binary expansion) and DuckDB, and exact ties are COMMON for
    * rationals with small denominators (measured at sf0.01). */
  def embeddingCovariance(embeddings: DataFrame, dim: Int,
                          vecCol: String = "embedding"): DataFrame = {
    require(dim > 0, "embeddingCovariance needs dim > 0")
    val spark = embeddings.sparkSession
    import spark.implicits._
    val vm = embeddings
      .where(col(vecCol).isNotNull && size(col(vecCol)) === dim)
      .select(transform(col(vecCol),
        x => round(x.cast("double") * 1000000, 0).cast("long")).as("vm"))
      .as[Array[Long]]
    val m = vm.select(
      new graft.expressions.CovMomentsAggregator(dim).toColumn.name("m")).head()
    val nPairs = dim * (dim + 1) / 2
    val n = m(nPairs + dim)
    val out =
      if (n == 0L) Seq.empty[(Long, Long, Long, Long, Long, Long, Double)]
      else {
        var idx = -1
        for { i <- 0 until dim; j <- i until dim } yield {
          idx += 1
          val (s2, si, sj) = (m(idx), m(nPairs + i), m(nPairs + j))
          val cov = (s2.toDouble / n.toDouble -
            (si.toDouble / n.toDouble) * (sj.toDouble / n.toDouble)) / 1.0e12
          (i.toLong, j.toLong, n, s2, si, sj, cov)
        }
      }
    out.toDF("i", "j", "n_vecs", "sum_micro2", "sum_micro_i", "sum_micro_j", "cov")
      .orderBy(col("i"), col("j"))
  }

  /** Top-k principal components from [[embeddingCovariance]]'s exact
    * moments: deterministic power iteration with deflation on the
    * d×d matrix. Returns (components[k][d], eigenvalues[k],
    * means[d]). The covariance collect is a BOUNDED driver action —
    * d(d+1)/2 rows of integer moments (query parameters, the
    * [[ivfIndex]] centroid discipline), never the data. Everything
    * downstream is fixed double arithmetic on those exact inputs, so
    * components are reproducible across runs and partitionings. */
  def pcaComponents(embeddings: DataFrame, k: Int, dim: Int, iters: Int = 50,
                    vecCol: String = "embedding")
      : (Array[Array[Double]], Array[Double], Array[Double]) = {
    require(k > 0, "pcaComponents needs k > 0")
    val rows = embeddingCovariance(embeddings, dim, vecCol).collect()
    require(rows.nonEmpty, "pcaComponents needs at least one vector")
    val d = dim
    require(k <= d, s"k=$k exceeds dimensionality $d")
    val n = rows.head.getLong(2).toDouble
    val cov = Array.ofDim[Double](d, d)
    val mean = new Array[Double](d)
    rows.foreach { r =>
      val (i, j, c) = (r.getLong(0).toInt, r.getLong(1).toInt, r.getDouble(6))
      cov(i)(j) = c; cov(j)(i) = c
      if (i == j) mean(i) = r.getLong(4).toDouble / n / 1.0e6
    }
    val (comps, eigs) = powerIterate(cov, k, iters)
    (comps, eigs, mean)
  }

  /** The deterministic power-iteration-with-deflation eigensolve
    * behind [[pcaComponents]] — factored so [[pcaComponentsLocal]]
    * (the pure-JVM fixture derivation) runs the IDENTICAL arithmetic
    * on its in-memory covariance. */
  private def powerIterate(cov: Array[Array[Double]], k: Int, iters: Int)
      : (Array[Array[Double]], Array[Double]) = {
    val d = cov.length
    def matVec(m: Array[Array[Double]], v: Array[Double]) =
      m.map(row => row.zip(v).map { case (a, b) => a * b }.sum)
    def norm(v: Array[Double]) = math.sqrt(v.map(x => x * x).sum)
    val comps = Array.ofDim[Double](k, d)
    val eigs = new Array[Double](k)
    val work = cov.map(_.clone())
    for (c <- 0 until k) {
      // fixed all-positive start (generic: never orthogonal to a
      // nonnegative-dominant eigenvector, and deterministic)
      var v = Array.tabulate(d)(i => 1.0 / math.sqrt(i + c + 1.0))
      for (_ <- 1 to iters) {
        val w = matVec(work, v)
        val nw = norm(w)
        if (nw > 0) v = w.map(_ / nw)
      }
      val lambda = v.zip(matVec(work, v)).map { case (a, b) => a * b }.sum
      comps(c) = v; eigs(c) = lambda
      for (i <- 0 until d; j <- 0 until d) // deflate
        work(i)(j) -= lambda * v(i) * v(j)
    }
    (comps, eigs)
  }

  /** Pure-JVM twin of [[embeddingCovariance]]+[[pcaComponents]] over an
    * in-memory sample: the same integer micro-sum moments
    * (round(x·10⁶) longs, exact sums) and the same eigensolve (shared
    * [[powerIterate]]) with no Spark in the loop — the derivation the
    * q_pca_apply fixture row and its DuckDB oracle both call, so their
    * plane literals cannot drift. */
  def pcaComponentsLocal(vecs: Seq[Array[Double]], k: Int, iters: Int = 50)
      : (Array[Array[Double]], Array[Double], Array[Double]) = {
    require(vecs.nonEmpty, "pcaComponentsLocal needs at least one vector")
    val d = vecs.head.length
    require(k > 0 && k <= d, s"k=$k out of range for dim $d")
    require(vecs.forall(_.length == d), "ragged input vectors")
    def micro(x: Double): Long = java.math.BigDecimal.valueOf(x * 1000000.0)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue
    val vm = vecs.map(_.map(micro))
    val n = vecs.size.toDouble
    val si = new Array[Long](d)
    val s2 = Array.ofDim[Long](d, d)
    vm.foreach { v =>
      var i = 0
      while (i < d) {
        si(i) += v(i)
        var j = i
        while (j < d) { s2(i)(j) += v(i) * v(j); j += 1 }
        i += 1
      }
    }
    val cov = Array.ofDim[Double](d, d)
    val mean = Array.tabulate(d)(i => si(i).toDouble / n / 1.0e6)
    for (i <- 0 until d; j <- i until d) {
      val c = (s2(i)(j).toDouble / n -
        (si(i).toDouble / n) * (si(j).toDouble / n)) / 1.0e12
      cov(i)(j) = c; cov(j)(i) = c
    }
    val (comps, eigs) = powerIterate(cov, k, iters)
    (comps, eigs, mean)
  }

  /** Deterministic fixture planes for the PCA APPLY certificate: a
    * seed-fixed synthetic sample (java.util.Random Gaussians — the
    * [[hyperplanes]] discipline — with a per-dimension variance ramp
    * and alternating offsets so the principal directions and the mean
    * shift are both non-trivial), solved by the REAL eigensolve
    * ([[pcaComponentsLocal]]). Pure JVM, so the registered query and
    * the DuckDB oracle string derive identical (comps, mean) literals
    * — q_random_projection's seeded-literal discipline with LEARNED
    * planes, closing the serving half of the rows-only q_pca. */
  def fixturePcaPlanes(k: Int = 8, dim: Int = 64, n: Int = 256, seed: Long = 11L)
      : (Array[Array[Double]], Array[Double]) =
    // deterministic in its arguments — memoize per JVM (the registered
    // row AND its oracle builder call this; the 500-iteration solve was
    // otherwise re-run per invocation, ~1 s/call of pure driver work)
    fixturePlanesCache.computeIfAbsent((k, dim, n, seed), _ => {
      val rnd = new java.util.Random(seed)
      val sample = Seq.fill(n)(Array.tabulate(dim)(j =>
        rnd.nextGaussian() * (1.0 + (dim - j).toDouble / 8.0) +
          (if (j % 2 == 0) 0.5 else -0.25)))
      // 500 iterations (vs the distributed trainer's 50): pure-JVM, so
      // the extra convergence is free, and the tighter orthonormality
      // makes the fixture planes a cleaner serving parameter set
      val (comps, _, mean) = pcaComponentsLocal(sample, k, iters = 500)
      (comps, mean)
    })

  private val fixturePlanesCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int, Long),
      (Array[Array[Double]], Array[Double])]()

  /** The literal scalar shift `μ·v_c` of one projection plane — shared
    * by [[projectOnPlanes]] and the oracle builder so the two sides'
    * shift literals come from one arithmetic. */
  def planeShift(comp: Array[Double], mean: Array[Double]): Double =
    comp.zip(mean).map { case (a, b) => a * b }.sum

  /** Project embeddings onto explicit (components, mean) planes — the
    * SERVING half of [[pcaProject]], factored so the trained row and
    * the fixture-certified row (q_pca_apply) share one spelling: k
    * codegen'd [[graft.expressions.DotProduct]]s against literal
    * arrays plus a literal scalar shift, riding the scan — zero
    * Exchange, zero broadcast. */
  def projectOnPlanes(embeddings: DataFrame, comps: Array[Array[Double]],
                      mean: Array[Double], idCol: String = "vec_id",
                      vecCol: String = "embedding"): DataFrame =
    embeddings.select(col(idCol),
      array(comps.map { comp =>
        round(GraftFunctions.dot(col(vecCol), typedLit(comp.toSeq)) -
          lit(planeShift(comp, mean)), 6)
      }.toIndexedSeq: _*).as("pvec"))
      .orderBy(col(idCol))

  /** PCA projection ([EXT]) — each vector's coordinates on the top-k
    * principal components of the corpus, mean-centered:
    * `(x − μ)·v_c = x·v_c − μ·v_c`, so the plan is k codegen'd
    * [[graft.expressions.DotProduct]]s against literal component
    * arrays plus a literal scalar shift, riding the scan — zero
    * Exchange, zero broadcast (the [[randomProject]] shape, with
    * learned planes instead of random ones). The data-aware
    * counterpart of [[randomProject]] for embedding compression /
    * two-stage ANN: same output contract, strictly better variance
    * capture. Rows-only by design (the eigensolve is iterative —
    * no SQL oracle; accuracy laws live in SimilaritySpec). */
  def pcaProject(embeddings: DataFrame, k: Int, dim: Int, iters: Int = 50,
                 idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val (comps, _, mean) = pcaComponents(embeddings, k, dim, iters, vecCol)
    projectOnPlanes(embeddings, comps, mean, idCol, vecCol)
  }
}
