package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys (build brief: "skewed keys → salting
  * or AQE skew-join").
  *
  * AQE (`spark.sql.adaptive.skewJoin.enabled`, on by default) already
  * splits skewed SHUFFLE JOIN partitions at runtime. What AQE does
  * NOT fix is a skewed aggregation: one reducer still receives every
  * row of a hot group's partial state when partial aggregation is
  * ineffective (high-cardinality aggregate state, e.g. collect-style
  * or exact-distinct). Salting splits each hot key into `salts`
  * sub-keys, aggregates partially per sub-key, then merges — two
  * small shuffles instead of one skewed one.
  */
object Skew {

  /** Deterministic salt in [0, salts): hash of the whole row spread
    * uniformly (not of the group key — that would put the whole hot
    * group in one salt bucket again).
    *
    * MUST stay a pure function of row values: a position- or
    * random-based salt is nondeterministic under shuffle-map task
    * retry (recomputed rows re-salt differently than the copies
    * reducers already fetched → silently duplicated/lost rows, the
    * SPARK-23207 failure class) — on the multi-thousand-task jobs this
    * operator exists for, retries are routine. Known limitation, by
    * choice: a hot key whose rows are BIT-IDENTICAL collapses into one
    * salt bucket. For sums that is only the perf corner map-side
    * partial aggregation already absorbs (identical rows combine
    * before the shuffle); if it matters, include a unique id column
    * (every real fact table has one) in the hashed `cols`. */
  def saltCol(salts: Int, cols: Seq[Column]): Column =
    pmod(hash(cols: _*), lit(salts))

  /** Skew-safe `groupBy(key).agg(sum(measure))`: phase 1 aggregates
    * (key, salt) — at most `salts` rows per key reach phase 2, no
    * matter how hot the key is. Decimal partials keep the two-phase
    * sum exact and order-independent. */
  def saltedSum(df: DataFrame, key: String, measure: String,
                salts: Int = 16, scale: Int = 2): DataFrame = {
    val partial = df
      .withColumn("__salt", saltCol(salts, df.columns.map(col).toSeq))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(measure).cast(org.apache.spark.sql.types.DecimalType(18, scale)))
        .as("__psum"))
    partial.groupBy(col(key))
      .agg(sum(col("__psum")).cast("double").as(s"sum_$measure"))
  }

  /** Skew-safe fact⋈dim equi-join for when the dim is too large to
    * broadcast and a fact key is hot: fact rows get a deterministic
    * row-hash salt in [0, salts); every dim row is replicated once per
    * salt value; the join key becomes (key, salt), so a hot key's fact
    * rows spread across `salts` reducers instead of one. Emits exactly
    * the plain join's rows. Cost: dim shuffle volume × salts — the
    * explicit fallback for when AQE's runtime skew-join can't help
    * (e.g. a monster key inside one partition of a bucketed table, or
    * a sort-merge join AQE already committed to). Only fact-preserving
    * join types are allowed: dim-preserving ones (right/full) would
    * null-extend unmatched dim rows once per salt. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int = 16,
                 joinType: String = "inner"): DataFrame = {
    require(Seq("inner", "left", "left_outer", "left_semi", "left_anti").contains(joinType),
      s"saltedJoin supports fact-preserving join types only, not $joinType")
    require(salts > 0, s"salts must be positive: $salts")
    require(!fact.columns.contains("__salt") && !dim.columns.contains("__salt"),
      "saltedJoin reserves the __salt column name — rename it on the input")
    val saltedFact = fact.withColumn("__salt", saltCol(salts, fact.columns.map(col).toSeq))
    val repDim = dim.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(repDim, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Bloom-pruned fact⋈dim equi-join ([EXT]) — runtime semi-join
    * reduction: build a bloom filter over the dim's join keys (one
    * bounded BINARY sketch on the driver), filter the FACT through it
    * before the join shuffles anything, then run the exact join. No
    * false negatives means no lost rows; false positives survive the
    * prune but die in the join — the result is bit-identical to the
    * plain join, only the shuffle volume changes. The explicit,
    * persistable form of Spark's own runtime bloom pushdown
    * (`spark.sql.optimizer.runtime.bloomFilter.*`), for when the dim
    * side is a subquery the optimizer won't sketch, or the sketch is
    * reused across jobs.
    *
    * At 100 TB this is THE join cost lever after broadcasting and
    * bucketing: a selective dim (the common dimensional-filter query)
    * prunes the fact at the SCAN (the filter rides columnar batches,
    * no shuffle), so the join moves only matching-plus-ε rows.
    *
    * Only fact-preserving join types that DROP unmatched fact rows
    * are legal: a left-outer join must keep pruned rows null-extended,
    * which the prune violates by construction. */
  def bloomPrunedJoin(fact: DataFrame, dim: DataFrame,
                      factKey: String, dimKey: String,
                      expectedItems: Long = 1000000L,
                      numBits: Long = 8L * 1024 * 1024,
                      joinType: String = "inner"): DataFrame = {
    require(Seq("inner", "left_semi").contains(joinType),
      s"bloomPrunedJoin drops unmatched fact rows; $joinType would not")
    graft.expressions.GraftFunctions.register(fact.sparkSession)
    val bloom = dim
      .agg(graft.expressions.GraftFunctions
        .bloomAgg(xxhash64(col(dimKey)), expectedItems, numBits).as("b"))
      .head().getAs[Array[Byte]](0)
    // NULL fact keys are NOT pruned here — xxhash64(NULL) is the seed
    // constant (a real hash), so a null-key row can survive the probe
    // as a false positive; the equi-join drops it, which is why only
    // join types that drop unmatched fact rows are legal above. Do not
    // reuse `pruned` as if it were null-key-free.
    val pruned = fact.where(graft.expressions.GraftFunctions
      .bloomContains(lit(bloom), xxhash64(col(factKey))))
    pruned.join(dim, pruned(factKey) === dim(dimKey), joinType)
  }

  /** Skew-safe exact distinct count per key: the distinct set is
    * sharded by value hash so no single reducer holds a hot key's
    * whole set; phase 2 sums disjoint shard counts. */
  def saltedCountDistinct(df: DataFrame, key: String, valueCol: String,
                          salts: Int = 16): DataFrame = {
    val partial = df
      .withColumn("__salt", pmod(hash(col(valueCol)), lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(countDistinct(col(valueCol)).as("__pd"))
    partial.groupBy(col(key))
      .agg(sum(col("__pd")).cast("long").as(s"distinct_$valueCol"))
  }
}
