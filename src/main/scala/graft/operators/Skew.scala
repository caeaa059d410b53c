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
    * group in one salt bucket again). */
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
