package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pre-training ([EXT]): documents in
  * deterministic id order are laid head-to-tail and cut into fixed
  * token-budget bins (the standard concat-then-chunk layout). The
  * assignment for each document is where its FIRST token lands:
  * bin = floor(tokens_before / budget), offset = tokens_before % budget.
  *
  * Scale shape: the naive spelling is `sum() OVER (ORDER BY id)` — a
  * GLOBAL window that Spark executes on a single task, a non-starter
  * at 100 TB. This is instead the textbook distributed prefix sum:
  *  1. range-partition by id (partition i holds a contiguous id range,
  *     sorted within);
  *  2. one tiny aggregate collects the per-partition token totals
  *     (numPartitions rows — a query parameter, not data, on the
  *     driver) and prefix-sums them into partition offsets;
  *  3. a partition-local cumulative sum adds the broadcast offset.
  * The input is localCheckpoint-pinned so steps 2 and 3 see the SAME
  * physical partitioning (range partitioning samples its bounds; two
  * independent recomputations could disagree).
  */
object Pack {

  /** The shared distributed-prefix-sum skeleton (steps 1-2 of the
    * scaladoc above), used by [[contiguousBins]], [[globalOrdinals]],
    * and [[Windows.concurrencyProfile]]: range-partition `df` into a
    * contiguous total order, pin the sampled partitioning with
    * localCheckpoint (two independent recomputations could disagree
    * on the sampled range bounds), and fold the tiny per-partition
    * `weight` totals into per-partition starting offsets on the
    * driver (numPartitions values — a query parameter, not data).
    * Callers finish with a partition-local scan indexed by
    * `TaskContext.getPartitionId`. `weight` must be non-null. */
  private[operators] def rangeSortedWithOffsets(
      df: DataFrame, orderCols: Seq[String],
      weight: org.apache.spark.sql.Column): (DataFrame, Array[Long]) =
    rangeSortedWithOffsetsBy(df, orderCols.map(col), weight)

  /** Column-expression variant of [[rangeSortedWithOffsets]]:
    * `orderCols` may carry sort direction (`col(...).desc`), which
    * `repartitionByRange`/`sortWithinPartitions` both honor — the
    * descending orders [[positionalTiles]] needs never pay a value
    * negation (which would be lossy for decimals near the precision
    * edge and impossible for strings). */
  private[operators] def rangeSortedWithOffsetsBy(
      df: DataFrame, orderCols: Seq[org.apache.spark.sql.Column],
      weight: org.apache.spark.sql.Column): (DataFrame, Array[Long]) = {
    val spark = df.sparkSession
    val parts = spark.sparkContext.defaultParallelism
    val sorted = df
      .repartitionByRange(parts, orderCols: _*)
      .sortWithinPartitions(orderCols: _*)
      .localCheckpoint()
    val totals = sorted.groupBy(spark_partition_id().as("__pid"))
      .agg(sum(weight).as("__w"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until parts).scanLeft(0L)((acc, pid) =>
      acc + totals.getOrElse(pid, 0L)).toArray
    (sorted, offsets)
  }

  /** Distributed positional n-tiles ([EXT]) — every row gets its SQL
    * `ntile(buckets) OVER (ORDER BY orderCols)` bucket (1-based,
    * BIGINT) WITHOUT the single-task global window that spelling
    * executes as: ordinals come from the [[rangeSortedWithOffsets]]
    * prefix-sum skeleton, and the tile is derived arithmetically with
    * the exact ANSI fill rule — the first `n mod buckets` tiles hold
    * `n/buckets + 1` rows, the rest `n/buckets`. PackSpec pins the
    * assignment bit-equal to the ENGINE's own `ntile` window across
    * ragged fills; the driver's oracle gate pins it against DuckDB's
    * `ntile` (the gains / RFM / Lorenz oracles stayed hash-green,
    * unchanged, after the swap). The total row count is
    * `offsets.last` — already on the driver, free.
    *
    * Preconditions as [[globalOrdinals]]: `orderCols` must be a total
    * order (unique combination); direction-carrying columns
    * (`col(c).desc`) are honored. All input columns pass through. */
  def positionalTiles(df: DataFrame, orderCols: Seq[org.apache.spark.sql.Column],
                      buckets: Int, tileCol: String = "tile"): DataFrame = {
    require(buckets >= 1, s"positionalTiles needs buckets >= 1: $buckets")
    val (sorted, offsets) = rangeSortedWithOffsetsBy(df, orderCols, lit(1L))
    val n = offsets.last
    val q = n / buckets
    val r = n % buckets
    val outSchema = org.apache.spark.sql.types.StructType(
      sorted.schema :+ org.apache.spark.sql.types.StructField(
        tileCol, org.apache.spark.sql.types.LongType, nullable = false))
    sorted.mapPartitions { it =>
      var o = offsets(TaskContext.getPartitionId())
      it.map { row =>
        val tile =
          if (o < r * (q + 1)) o / (q + 1) + 1
          else r + (o - r * (q + 1)) / q + 1
        o += 1
        org.apache.spark.sql.Row.fromSeq(row.toSeq :+ tile)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Preconditions (as with [[AsOf.asofJoin]]/[[graft.sources.Lake.upsertByKey]]):
    * `idCol` must be UNIQUE — duplicate ids sort arbitrarily within a
    * partition, making their relative offsets nondeterministic — and
    * NON-NULL. Null token counts are treated as 0 (the document
    * occupies no budget). */
  def contiguousBins(docs: DataFrame, idCol: String, tokensCol: String,
                     budget: Long): DataFrame = {
    require(budget > 0, s"token budget must be positive: $budget")
    val spark = docs.sparkSession
    import spark.implicits._
    val (sorted, offsets) = rangeSortedWithOffsets(
      docs.select(col(idCol).cast("long").as("doc_id"),
        coalesce(col(tokensCol).cast("long"), lit(0L)).as("n_tokens")),
      Seq("doc_id"), col("n_tokens"))
    sorted.as[(Long, Long)].mapPartitions { it =>
      var acc = offsets(TaskContext.getPartitionId())
      it.map { case (id, n) =>
        val before = acc
        acc += n
        (id, before / budget, before % budget)
      }
    }.toDF("doc_id", "bin", "bin_offset")
  }

  /** Distributed global ordinal assignment ([EXT]) — every row gets
    * its 0-based position in the total `orderCols` order, WITHOUT the
    * single-task `row_number() OVER (ORDER BY ...)` window: the
    * [[contiguousBins]] prefix-sum machinery with a count of 1 per
    * row, generalized to arbitrary row schemas via a Row encoder.
    * The primitive behind systematic sampling (every N-th row),
    * stable pagination, and deterministic epoch numbering.
    *
    * Preconditions: `orderCols` must be a total order (unique key
    * combination) — ties sort arbitrarily within a partition and
    * would make ordinals nondeterministic. */
  def globalOrdinals(df: DataFrame, orderCols: Seq[String]): DataFrame = {
    require(orderCols.nonEmpty, "globalOrdinals needs at least one order column")
    val (sorted, offsets) = rangeSortedWithOffsets(df, orderCols, lit(1L))
    val outSchema = org.apache.spark.sql.types.StructType(
      sorted.schema :+ org.apache.spark.sql.types.StructField(
        "ordinal", org.apache.spark.sql.types.LongType, nullable = false))
    sorted.mapPartitions { it =>
      var acc = offsets(TaskContext.getPartitionId())
      it.map { r =>
        val o = acc; acc += 1
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ o)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Token-budget corpus selection ([EXT]) — keep documents greedily
    * in (score desc, id) order until the GLOBAL token budget is
    * spent: the standard data-selection policy when compute, not
    * data, is the binding constraint (take the highest-quality
    * fraction that fits the training budget). The score column is
    * the pluggable policy slot — quality score, LM logprob,
    * dedup-cluster priority, whatever ranks docs.
    *
    * Output: kept docs with their running `cum_tokens` (inclusive);
    * a doc is kept iff the budget covers it fully. Same distributed
    * shape as [[globalOrdinals]] ([[rangeSortedWithOffsets]] — the
    * naive spelling is a single-task global running-sum window).
    * Scores sort negated because the skeleton's range partitioner
    * orders ascending; negation round-trips doubles exactly. */
  def selectUnderBudget(docs: DataFrame, idCol: String, scoreCol: String,
                        tokensCol: String, budget: Long): DataFrame = {
    require(budget >= 0, s"token budget must be non-negative: $budget")
    val spark = docs.sparkSession
    import spark.implicits._
    val (sorted, offsets) = rangeSortedWithOffsets(
      docs.select(col(idCol).cast("long").as("doc_id"),
        negate(col(scoreCol).cast("double")).as("__negscore"),
        coalesce(col(tokensCol).cast("long"), lit(0L)).as("n_tokens")),
      Seq("__negscore", "doc_id"), col("n_tokens"))
    sorted.as[(Long, Double, Long)].mapPartitions { it =>
      var acc = offsets(TaskContext.getPartitionId())
      it.map { case (id, negScore, n) =>
        acc += n
        (id, -negScore, n, acc)
      }
    }.toDF("doc_id", "score", "n_tokens", "cum_tokens")
      .where(col("cum_tokens") <= budget)
      .orderBy(col("cum_tokens"))
  }

  /** Sequence-length bucketing, the other batching layout: pad-to-
    * boundary batches of similar-length documents (vs [[contiguousBins]]'
    * concat-then-chunk). Each document gets the smallest boundary that
    * fits its token count (`pad_to`) — batches then group by `pad_to`
    * and waste at most `pad_to - n_tokens` pad positions per row.
    * Documents longer than the largest boundary get `pad_to = -1`
    * (route them to [[Ngrams.chunk]] first). Pure per-row projection:
    * no shuffle, rides the scan. */
  def lengthBuckets(docs: DataFrame, boundaries: Seq[Int],
                    idCol: String = "doc_id", tokensCol: String = "n_tokens"): DataFrame = {
    require(boundaries.nonEmpty && boundaries == boundaries.sorted && boundaries.head > 0,
      s"boundaries must be positive and ascending: $boundaries")
    val padTo = boundaries.reverse.foldLeft(lit(-1): org.apache.spark.sql.Column) {
      (acc, b) => when(col(tokensCol) <= b, lit(b)).otherwise(acc)
    }
    docs.select(col(idCol), col(tokensCol), padTo.cast("int").as("pad_to"))
  }
}
