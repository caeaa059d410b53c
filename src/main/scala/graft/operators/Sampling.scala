package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic sampling for training-data pipelines ([EXT] —
  * SURVEY.md §2.6 samples via `limit`; real corpus work needs more).
  *
  * `df.sample()` / `sampleBy()` draw from a seeded RNG whose stream
  * depends on partitioning — a repartition or cluster resize changes
  * WHICH rows you get. Hash-mod sampling is a pure function of the
  * row id: reproducible across runs, engines, partitionings and
  * cluster sizes, trivially auditable ("why is this row in the
  * sample?"), and NESTED — the p% sample is a strict subset of the
  * q% sample for p < q, so growing a training set never discards
  * previously selected rows. The md5-prefix hash is the same
  * engine-portable trick as the shingle hash (Dedup.shingleHash),
  * which is what makes a DuckDB oracle possible. */
object Sampling {

  /** Uniform hash in [0, 10000) — basis-point granularity. */
  def hashBp(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10).cast("long") % 10000

  /** Keep ~`rate` of rows (rate in [0,1], basis-point resolution). */
  def byHash(df: DataFrame, idCol: String, rate: Double): DataFrame = {
    require(rate >= 0 && rate <= 1, s"rate must be in [0,1]: $rate")
    df.where(hashBp(col(idCol)) < math.round(rate * 10000))
  }

  /** Weighted deterministic sampling: per-row keep probability equal
    * to a weight expression in [0,1] (a quality score, a source
    * priority, an upsample factor capped at 1) — the "sample good
    * documents more" primitive of quality-weighted corpus selection.
    * Keep iff hash(id) < floor(w * 10000); same engine-portable
    * hash-mod as [[byHash]], still a pure per-row filter (no shuffle),
    * and monotone in the weight: raising any row's weight can only
    * ADD it, so re-weighting a corpus never silently swaps rows. */
  def byWeight(df: DataFrame, idCol: String, weight: Column): DataFrame =
    df.where(hashBp(col(idCol)) < floor(weight * 10000))

  /** Deterministic train/val/test assignment: the hash space is cut
    * into contiguous ranges proportional to `weights` (insertion
    * order). Pure function of the id — a row NEVER migrates between
    * splits across runs, partitionings, or corpus growth, the
    * property that keeps eval sets uncontaminated as a training
    * corpus evolves. Weights must sum to 1 (basis-point rounding on
    * the boundaries). */
  def assignSplit(df: DataFrame, idCol: String,
                  weights: Seq[(String, Double)]): DataFrame = {
    require(weights.nonEmpty && math.abs(weights.map(_._2).sum - 1.0) < 1e-9,
      s"weights must sum to 1: $weights")
    val bounds = weights.scanLeft(0L) { case (acc, (_, w)) =>
      acc + math.round(w * 10000)
    }.tail
    val h = hashBp(col(idCol))
    val expr = weights.map(_._1).zip(bounds).reverse.tail
      .foldLeft(lit(weights.last._1): Column) { case (acc, (name, hi)) =>
        when(h < hi, name).otherwise(acc)
      }
    df.withColumn("split", expr)
  }

  /** Training-data mixture sampling: given TARGET mixture weights
    * (the share each domain should have in the sampled corpus) and an
    * overall sample fraction, derive each domain's keep-rate from its
    * ACTUAL row count and apply the deterministic hash-mod filter.
    * domain d's quota is `weight(d) * fraction * N_total`; its rate is
    * `min(1, quota / count(d))` — an under-represented domain is taken
    * whole (rate caps at 1; the mix then under-shoots its target
    * rather than inventing rows), an over-represented one is thinned.
    * Domains absent from `targetWeights` get rate 0, and rows with a
    * NULL domain are likewise excluded (the rate join is an equi-join;
    * assign unlabeled rows an explicit domain first if they should
    * participate in the mix).
    *
    * Fully declarative — the counts pass is a map-side-combined
    * aggregate whose result (one row per domain) broadcast-joins back
    * onto the fact, so no driver collect and no second shuffle; at
    * 100 TB the extra cost over [[stratifiedByHash]] is one
    * counts-only scan. Rate boundaries use floor() on basis points:
    * floor is the one rounding mode every engine agrees on, which is
    * what keeps the DuckDB oracle exact. Same nesting property as
    * [[byHash]]: raising `fraction` only ever ADDS rows per domain. */
  def mixtureSample(df: DataFrame, idCol: String, domainCol: String,
                    targetWeights: Map[String, Double],
                    fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction must be in [0,1]: $fraction")
    require(targetWeights.nonEmpty &&
      math.abs(targetWeights.values.sum - 1.0) < 1e-9,
      s"target weights must sum to 1: $targetWeights")
    require(targetWeights.values.forall(w => w >= 0),
      "target weights must be non-negative")
    val weightExpr = targetWeights.foldLeft(lit(0.0)) {
      case (acc, (d, w)) => when(col("__domain") === d, lit(w)).otherwise(acc)
    }
    val counts = df.groupBy(col(domainCol).as("__domain"))
      .agg(count(lit(1)).as("__cnt"))
    val total = counts.agg(sum(col("__cnt")).as("__n"))
    val rates = counts.crossJoin(broadcast(total)).select(
      col("__domain"),
      least(lit(10000L),
        floor(weightExpr * lit(fraction) * col("__n") * lit(10000) / col("__cnt"))
          .cast("long")).as("__rate_bp"))
    df.join(broadcast(rates), col(domainCol) === col("__domain"))
      .where(hashBp(col(idCol)) < col("__rate_bp"))
      .drop("__domain", "__rate_bp")
  }

  /** Cap every group at `n` rows, chosen DETERMINISTICALLY by hash
    * order (domain caps for training mixes: "no single source may
    * contribute more than n documents"). Unlike a rate, a cap bounds
    * the absolute contribution of a group however large it grows —
    * the guard against one crawl domain flooding the mix. Hash order
    * (not "first n") makes the kept set a uniform, reproducible,
    * partitioning-independent choice, and growing a group only evicts
    * rows at the hash boundary.
    *
    * Shape: one shuffle on the group key + per-group sort truncated by
    * the filter. For few pathologically hot groups, the bounded-heap
    * route ([[graft.operators.TopK.perGroupViaAggregator]]) carries at
    * most n rows per (task, group) through the shuffle instead. */
  def capPerGroup(df: DataFrame, idCol: String, groupCol: String, n: Int): DataFrame = {
    require(n > 0, s"cap must be positive: $n")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(hashBp(col(idCol)), col(idCol))
    df.withColumn("__rn", org.apache.spark.sql.functions.row_number().over(w))
      .where(col("__rn") <= n)
      .drop("__rn")
  }

  /** Per-group TOKEN-budget cap ([EXT]) — [[capPerGroup]]'s cousin
    * with the budget in tokens, not rows: each group keeps its
    * highest-scoring documents until the group's token budget is
    * spent (the per-SOURCE allocation step of mixture building —
    * [[graft.operators.Pack.selectUnderBudget]] is the GLOBAL form
    * and needs the distributed prefix sum; per-group running sums are
    * ordinary windows because each partition is one group, bounded).
    * A document is kept only if it fits fully. */
  def capTokensPerGroup(df: DataFrame, groupCol: String, idCol: String,
                        scoreCol: String, tokensCol: String,
                        budget: Long): DataFrame = {
    require(budget >= 0, s"token budget must be non-negative: $budget")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    df.withColumn("cum_tokens",
        org.apache.spark.sql.functions.sum(col(tokensCol)).over(w))
      .where(col("cum_tokens") <= budget)
      .orderBy(col(groupCol), col("cum_tokens"))
  }

  /** Deterministic corpus shuffle for training order: a `shuffle_key`
    * that is a pure function of (seed, id). Writing ordered by the key
    * IS the shuffled epoch order — same data, different seed, a fresh
    * reproducible permutation; no RNG state, no partitioning
    * dependence, resumable mid-epoch from any key offset. The global
    * orderBy plans as a range exchange (sampled range partitioner),
    * the scalable way to produce a totally ordered write — each output
    * file holds one contiguous key range. */
  def seededShuffle(df: DataFrame, idCol: String, seed: String): DataFrame =
    df.withColumn("shuffle_key",
        md5(concat_ws(":", lit(seed), col(idCol).cast("string"))))
      .orderBy(col("shuffle_key"))

  /** Temperature-scaled mixture sampling ([EXT]): domain weights
    * DERIVED from the data as `sqrt(n_d) / Σ sqrt(n_d)` — the
    * standard temperature-T=2 rebalancing of multilingual/multi-
    * source corpora (Conneau & Lample 2019 style): big domains are
    * tempered, small domains upweighted, but still ∝ a power of
    * their true mass (unlike a uniform mix, which floods tail
    * domains with repetition). `fraction` is the overall sample
    * share; per-domain rates derive exactly as in [[mixtureSample]]
    * (quota / count, capped at 1, floor to basis points).
    *
    * The exponent is FIXED at 1/2 because `sqrt` is one of the few
    * exactly-specified IEEE operations — an arbitrary `pow(n, a)` is
    * library-dependent and would break the cross-engine oracle. The
    * Σ sqrt normalizer is a sum of per-domain doubles: each sqrt is
    * rounded to 6 dp and DECIMAL-summed (the dsum convention) so the
    * normalizer is order-independent and engine-exact. Same shape as
    * [[mixtureSample]]: one counts aggregate, weights on the BOUNDED
    * domain rows, rates broadcast back, pure hash filter on the
    * fact. */
  def temperatureSample(df: DataFrame, idCol: String, domainCol: String,
                        fraction: Double): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction must be in [0,1]: $fraction")
    val counts = df.groupBy(col(domainCol).as("__domain"))
      .agg(count(lit(1)).as("__cnt"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    val rates = counts
      .withColumn("__w", round(sqrt(col("__cnt").cast("double")), 6)
        .cast(org.apache.spark.sql.types.DecimalType(18, 6)))
      .withColumn("__wsum", sum(col("__w")).over(w)) // bounded: one row per domain
      .withColumn("__n", sum(col("__cnt")).over(w))
      .select(col("__domain"),
        least(lit(10000L),
          floor(col("__w").cast("double") / col("__wsum").cast("double") *
            lit(fraction) * col("__n") * lit(10000) / col("__cnt"))
            .cast("long")).as("__rate_bp"))
    df.join(broadcast(rates), col(domainCol) === col("__domain"))
      .where(hashBp(col(idCol)) < col("__rate_bp"))
      .drop("__domain", "__rate_bp")
  }

  /** Leakage-safe split: [[assignSplit]] hashed on a GROUP key
    * instead of the row id, so every row of a group lands in the SAME
    * split. Splitting near-duplicate documents independently leaks
    * eval content into training (the test doc's near-twin is trained
    * on — the classic silent-eval-inflation bug); hashing the dedup
    * cluster id (or source domain, or patient id) closes it. `groups`
    * maps each row id to its group (e.g. [[Dedup.dedupDocuments]]'s
    * `(doc_id, keeper_id)`); rows without a group keep their own id
    * as the group (a singleton can't leak).
    *
    * Shape: one equi-join on the row id (the group map is a dedup
    * output — same cardinality as the corpus, so this is a plain
    * shuffle join, broadcast when the map side is small) + the pure
    * per-row hash filter. Split boundaries and the hash are
    * [[assignSplit]]'s — engine-portable, row-stable as the corpus
    * grows. */
  def groupSplit(df: DataFrame, idCol: String, groups: DataFrame,
                 groupIdCol: String, weights: Seq[(String, Double)]): DataFrame = {
    val g = groups.select(col(idCol).as("__gid_key"), col(groupIdCol).as("__group"))
    val joined = df.join(g, col(idCol) === col("__gid_key"), "left")
      .withColumn("__group", coalesce(col("__group"), col(idCol)))
    assignSplit(joined, "__group", weights).drop("__gid_key", "__group")
  }

  /** Balance classes by downsampling every class to the SIZE OF THE
    * SMALLEST class — the standard rebalancing step before training a
    * classifier on skewed labels (a 95/5 label mix trains a
    * majority-class parrot). Rows are kept in deterministic hash
    * order (ties broken by id), so the balanced set is reproducible,
    * partitioning-independent, and stable under reruns; growing a
    * class only evicts rows at its hash boundary.
    *
    * Shape: one map-side-combined counts aggregate (rows = number of
    * classes, broadcast back) + one rank window per class. The window
    * shuffles by label, so a pathologically hot class would serialize
    * its full row count into one partition; hot classes are therefore
    * PRE-THINNED by the same hash before the window. The thin filter
    * keeps rows with `hashBp < cutoff` where the per-class cutoff
    * targets `2*min + 10000` expected survivors — and because the
    * rank order is (hashBp, id), the lowest-`min` rows of the thinned
    * class are EXACTLY the lowest-`min` rows of the full class
    * whenever at least `min` rows survive the filter (the kept rows
    * are a hash-prefix of the class), which the 2x+10000 margin makes
    * overwhelmingly certain under the uniform md5 hash. Classes at or
    * under the margin get cutoff 10000 (no thinning, exact as
    * before). The cutoff floor is 1 basis point, so the worst-case
    * window input for one class is `count/10000` — bounded reduction,
    * not unbounded serialization. */
  def classBalance(df: DataFrame, idCol: String, labelCol: String): DataFrame = {
    val counts = df.groupBy(col(labelCol).as("__label"))
      .agg(count(lit(1)).as("__cnt"))
    val minCnt = counts.agg(min(col("__cnt")).as("__min_cnt"))
    val cutoffs = counts.crossJoin(broadcast(minCnt))
      .select(col("__label"), col("__min_cnt"),
        least(lit(10000L), greatest(lit(1L),
          ceil(((col("__min_cnt") * 2 + 10000) * 10000).cast("double") / col("__cnt"))
            .cast("long"))).as("__cut_bp"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(labelCol)).orderBy(hashBp(col(idCol)), col(idCol))
    df.join(broadcast(cutoffs), col(labelCol) === col("__label"))
      .where(hashBp(col(idCol)) < col("__cut_bp"))
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= col("__min_cnt"))
      .drop("__label", "__cut_bp", "__rn", "__min_cnt")
  }

  /** Stratified flavor: per-stratum rates, `default` for strata not
    * in the map. One pass, no shuffle — the rate is a when-chain on
    * the stratum column, the membership test stays the hash-mod. */
  def stratifiedByHash(df: DataFrame, idCol: String, stratumCol: String,
                       rates: Map[String, Double], default: Double = 0.0): DataFrame = {
    require((rates.values.toSeq :+ default).forall(r => r >= 0 && r <= 1),
      "all rates must be in [0,1]")
    val rateBp = rates.foldLeft(lit(math.round(default * 10000)): Column) {
      case (acc, (stratum, r)) =>
        when(col(stratumCol) === stratum, lit(math.round(r * 10000))).otherwise(acc)
    }
    df.where(hashBp(col(idCol)) < rateBp)
  }

  /** 60-bit engine-portable sample key (the gramFp spelling on the
    * row id): fine enough that real-world id sets see no ties, and
    * any tie is broken by the id itself at the call sites. */
  def sampleKey(id: Column): Column = graft.functions.Portable.fp60(id)

  /** EXACTLY-k uniform sample ([EXT]): the k rows with the smallest
    * hash keys — "bottom-k sampling", the deterministic counterpart
    * of reservoir sampling. Where [[byHash]] keeps a RATE (±binomial
    * noise in the count), this keeps a COUNT ("sample exactly 10M
    * docs for the ablation"), and the two compose: both are nested
    * (the bottom-k set is a strict subset of the bottom-k' set for
    * k < k'), so growing a sample never discards chosen rows.
    *
    * Scale shape: `ORDER BY key LIMIT k` plans as
    * TakeOrderedAndProject — each partition reduces to its own top-k,
    * the driver merges numPartitions·k rows, NO global sort-shuffle.
    * That bounds the driver at partitions·k rows: fine up to k in the
    * ~1M range; for larger k, pre-thin with a range filter on the
    * SAME [[sampleKey]] (`sampleKey < c·k/n · 2^60`) first — same-key
    * thinning composes exactly (the surviving bottom-k is unchanged),
    * whereas thinning with [[byHash]]'s coarser key would not. */
  def exactSize(df: DataFrame, idCol: String, k: Int): DataFrame = {
    require(k >= 0, s"k must be >= 0: $k")
    df.orderBy(sampleKey(col(idCol)), col(idCol)).limit(k)
  }

  /** WEIGHTED exactly-k sample without replacement (Efraimidis &
    * Spirakis 2006, "Weighted random sampling with a reservoir"):
    * each row draws the deterministic uniform u = (fp60(id)+1)/2^60
    * ∈ (0,1] and ranks by uᵢ^(1/wᵢ); the k LARGEST keys are a
    * without-replacement sample where selection probability tracks
    * the weights — the "sample 10M docs proportional to quality
    * score" primitive. [[byWeight]] thins at a RATE per row;
    * [[exactSize]] is the uniform COUNT form; this is the weighted
    * COUNT form completing the family. Rows with weight ≤ 0 are
    * excluded (their E-S key is undefined).
    *
    * Deterministic and auditable like every sampler here (the draw is
    * the portable hash), with one caveat the uniform samplers don't
    * have: `pow` is correct to ≤ 1 ulp but not bit-specified across
    * engines, so two DISTINCT keys within an ulp at the rank-k
    * boundary could in principle swap — the q_kmeans float-compare
    * risk class, vanishingly unlikely on continuous weights. Plans as
    * TakeOrderedAndProject, same driver bound as [[exactSize]]. */
  def weightedExactSize(df: DataFrame, idCol: String, weight: Column,
                        k: Int): DataFrame = {
    require(k >= 0, s"k must be >= 0: $k")
    val u = (sampleKey(col(idCol)).cast("double") + 1.0) /
      lit(1152921504606846976.0) // 2^60: the fp60 key space
    val esKey = pow(u, lit(1.0) / weight.cast("double"))
    df.where(weight.cast("double") > 0)
      .orderBy(esKey.desc, col(idCol)).limit(k)
  }

  /** Poisson(1) bootstrap multiplicity thresholds in fp60 space:
    * floor(CDF(k) · 2^60) for k = 0..5 — INTEGER literals, so the
    * multiplicity function is exact integer logic on the portable
    * hash in BOTH engines (a float CDF compare would put hashes near
    * a boundary at the mercy of rounding). Tail above k = 6 has mass
    * < 6e-5 and is capped (documented bias far below sampling noise). */
  private val PoissonCdf60: Seq[Long] = Seq(
    424136118829305344L, 848272237658610688L, 1060340297073263360L,
    1131029650211480960L, 1148701988496035328L, 1152236456152946176L)

  /** Poisson-bootstrap confidence interval for a mean (Chamandy,
    * Muralidharan, Najmi & Naidu, "Estimating uncertainty for massive
    * data streams", Google 2012) — error bars on an aggregate in ONE
    * pass, the way that actually works at 100 TB: true resampling
    * needs Binomial(n, 1/n) multiplicities (global n — a barrier);
    * Poissonization makes each row's multiplicity in each of the B
    * resamples an INDEPENDENT Poisson(1) draw, so every row streams
    * once, emitting its B (resample, multiplicity) contributions, and
    * map-side combine means only B partial sums per task cross the
    * wire. The draw is the deterministic portable hash fp60(id':'b)
    * against integer CDF thresholds — reproducible, auditable, and
    * replayable by an independent engine (hash-certified), where
    * `rand()`-based resampling is none of those.
    *
    * Output: one row — the point mean, the percentile CI of the B
    * resample means (the certified percentile bridge), and the
    * bootstrap SE from exact decimal moments of the 6-dp-rounded
    * resample means. `idCol` must be unique per row (the draw's
    * identity), as with every deterministic sampler here. */
  def bootstrapMeanCI(df: DataFrame, idCol: String, measure: Column,
                      b: Int = 100, level: Double = 0.95): DataFrame = {
    require(b >= 2, s"bootstrapMeanCI needs b >= 2: $b")
    require(level > 0 && level < 1, s"level must be in (0,1): $level")
    // ONE md5 per ROW (not per row×resample — at B=100 that multiplies
    // scan cost ~50×, measured 99 s vs ~4 s at sf0.1): the per-resample
    // uniform is the row hash XOR a per-resample 60-bit mask, itself
    // md5-derived ("mask:b" — same derivation the oracle replays in
    // SQL). Resamples therefore share one base hash per row — the
    // documented at-scale trade (each resample is still an exact
    // uniform hash sample across rows; only resample-PAIR joint
    // structure is scrambled rather than independent, a second-order
    // effect on the SE). The fan-out is inline() over a LITERAL
    // (rb, mask) array — a codegen'd Generate; a crossJoin(broadcast)
    // spelling plans as BroadcastNestedLoopJoin, which is NOT
    // whole-stage-codegen'd and ran the 60M-row subtree interpreted
    // (measured 80 s vs 4 s at sf0.1).
    val base = df.select(col(idCol).cast("string").as("__id"),
        measure.cast(DecimalType(18, 2)).as("__x"))
      .where(col("__x").isNotNull)
      .withColumn("__fp", graft.functions.Portable.fp60(col("__id")))
      // exact integer cents: the hot loop below multiplies/sums
      // PRIMITIVE longs inside codegen (a per-row Decimal op allocates
      // a BigDecimal 60M times)
      .withColumn("__xc", (col("__x") * 100).cast("long"))
    val md = java.security.MessageDigest.getInstance("MD5")
    val maskPairs = (0 until b).map { rb =>
      val hex = md.digest(s"mask:$rb".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      struct(lit(rb.toLong).as("__rb"),
        lit(java.lang.Long.parseLong(hex.substring(0, 15), 16)).as("__mask"))
    }
    val fanned = base.select(col("__xc"), col("__fp"),
      inline(array(maskPairs: _*)))
    val u = col("__fp").bitwiseXOR(col("__mask"))
    val mult = PoissonCdf60.zipWithIndex.foldRight(lit(6): Column) {
      case ((t, k), rest) => when(u < t, lit(k)).otherwise(rest)
    }
    // two-level aggregation: per-(resample, task) partials stay LONG
    // (bounded by rows-per-task × 6 × cents — safe for any money-like
    // column under a ~$10^9 per-value bound), the cross-task final is
    // DECIMAL — exact at any total scale without a Decimal in the
    // 60M-row loop
    val means = fanned.withColumn("__k", mult.cast("long"))
      .groupBy(col("__rb"), spark_partition_id().as("__pid")).agg(
        sum(col("__k") * col("__xc")).as("__psx"),
        sum(col("__k")).as("__psk"))
      .groupBy(col("__rb")).agg(
        sum(col("__psx").cast(DecimalType(38, 0))).as("__sxc"),
        sum(col("__psk")).as("__sk"))
      .where(col("__sk") > 0) // an empty resample (tiny inputs) has no mean
      .select(round(col("__sxc").cast("double") /
        (col("__sk").cast("double") * 100.0), 6).as("__mu"))
      // barrier: percentile is an ObjectHashAggregate; keep the heavy
      // aggregate in its own whole-stage-codegen'd stage
      .localCheckpoint()
    val lo = (1 - level) / 2
    val point = base.agg(
      round(sum(col("__x")).cast("double") /
        count(lit(1)).cast("double"), 6).as("point_mean"))
    // SE from exact INTEGER micro-unit moments of the rounded means —
    // the order-independent stddev spelling that also dodges both
    // engines' decimal-multiply width rules (micro² rides int128/
    // DECIMAL(38) exactly); sqrt is IEEE-correctly-rounded, so the
    // one final chain is engine-identical
    val muI = (col("__mu").cast(DecimalType(18, 6)) * 1000000).cast("long")
    val withI = means.withColumn("__mi", muI)
    point.crossJoin(broadcast(withI.agg(
      count(lit(1)).cast("long").as("n_resamples"),
      round(percentile(col("__mu"), lit(lo)), 6).as("ci_lo"),
      round(percentile(col("__mu"), lit(1 - lo)), 6).as("ci_hi"),
      round(sqrt(
        (sum((col("__mi").cast(DecimalType(38, 0)) * col("__mi"))
            .cast(DecimalType(38, 0))).cast("double") -
          sum(col("__mi")).cast("double") * sum(col("__mi")).cast("double") /
            count(lit(1)).cast("double")) /
        (count(lit(1)).cast("double") - 1.0)) / 1000000.0, 6).as("se_boot"))))
  }
}
