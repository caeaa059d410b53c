package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
}
