package graft.expressions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** DDSketch state: log-gamma bucket counts for the positive and
  * negative magnitudes plus an exact zero count. Bucket i covers
  * (gamma^(i-1), gamma^i], so every stored value is within relative
  * error alpha of its bucket's midpoint representative. */
final case class DDBuf(neg: Map[Int, Long], zero: Long, pos: Map[Int, Long]) {
  def n: Long = zero + neg.valuesIterator.sum + pos.valuesIterator.sum
}

/** Mergeable relative-error quantile sketch (DDSketch — Masson,
  * Rim & Lee, VLDB 2019) as a typed Aggregator — the quantile member
  * of the mergeable-sketch family next to the HLL shards (distinct),
  * CMS shards (frequency, randomized) and Misra-Gries (frequency,
  * deterministic): a fixed-size summary whose merge is pure bucket
  * addition — commutative and associative, so the result is IDENTICAL
  * under any partitioning or merge order (unlike t-digest, whose
  * centroids drift with merge order — on a cluster that means
  * non-reproducible answers), and per-shard sketches persisted today
  * can be merged with next month's without touching the data again.
  *
  * Guarantee: a quantile estimate is within RELATIVE error `alpha` of
  * the true value (sign-preserving; exact for zeros) — rank-uniform
  * sketches (GK / KLL / t-digest) give rank error instead, which for
  * long-tailed latency/price/size distributions is the wrong currency:
  * DDSketch's p99 of a heavy tail is off by at most alpha·value,
  * not by "a few ranks" that may span an order of magnitude.
  *
  * Memory: buckets span the value range logarithmically, and the map
  * is INTRINSICALLY bounded — every positive double (denormals
  * included) indexes into ≈[−37.6k, +35.5k] at alpha = 1%, so an
  * uncapped per-sign map never exceeds ~73k counters (≈1 MB) no
  * matter the row count, and real data spanning d decades occupies
  * only ≈115·d of them. `maxBuckets` additionally collapses the
  * SMALLEST-magnitude buckets into one (the published collapsing
  * variant: upper quantiles keep their guarantee, only the extreme
  * low tail degrades) — but ONLY in `finish`, never in
  * reduce/merge: an in-flight collapse would make the collapse floor
  * depend on which partials merged first, breaking (a+b)+c ==
  * a+(b+c) exactly when the cap triggers. With addition-only
  * reduce/merge the order-invariance guarantee below is
  * unconditional, and the finished sketch is still ≤ maxBuckets per
  * sign.
  *
  * Determinism: bucket index is ceil(log(x)/log(gamma)) in fixed JVM
  * double arithmetic, and reduce/merge are pure bucket addition —
  * commutative AND associative — so the same input multiset yields
  * the same sketch bit-for-bit under ANY partitioning or merge
  * order; `finish`'s collapse is a deterministic function of that
  * merged multiset. Estimates are engine-private (an independent
  * engine has no DDSketch), so harness checks are rows-only and the
  * accuracy laws live in the spec, like every other sketch here.
  */
class DDSketchAggregator[IN](f: IN => java.lang.Double, alpha: Double = 0.01,
                             maxBuckets: Int = 2048)
    extends Aggregator[IN, DDBuf, DDBuf] {
  require(alpha > 0 && alpha < 1, s"alpha must be in (0,1): $alpha")
  require(maxBuckets >= 2, s"maxBuckets must be >= 2: $maxBuckets")

  private val gamma = (1 + alpha) / (1 - alpha)
  private val logGamma = math.log(gamma)

  // every positive double (denormals included) has a finite index
  // here: ln(4.9e-324)/ln(gamma at 1%) ≈ -37k, far inside Int range
  private def index(mag: Double): Int =
    math.ceil(math.log(mag) / logGamma).toInt

  private def collapse(m: Map[Int, Long]): Map[Int, Long] =
    if (m.size <= maxBuckets) m
    else {
      // fold the smallest-magnitude buckets into the lowest survivor
      val keep = m.keysIterator.toArray.sorted.takeRight(maxBuckets)
      val floor = keep(0)
      val folded = m.iterator.collect { case (i, c) if i < floor => c }.sum
      m.filter { case (i, _) => i >= floor }
        .updated(floor, m.getOrElse(floor, 0L) + folded)
    }

  override def zero: DDBuf = DDBuf(Map.empty, 0L, Map.empty)

  // reduce and merge are ADDITION ONLY (no collapse): the map is
  // intrinsically bounded by the double index range, and deferring
  // the collapse to finish() is what makes the fold exactly
  // order-invariant even past maxBuckets (see class scaladoc)
  override def reduce(b: DDBuf, in: IN): DDBuf = {
    val v = f(in)
    if (v == null || v.isNaN) b // nothing to rank
    else {
      val x = v.doubleValue()
      if (x == 0.0) b.copy(zero = b.zero + 1)
      else if (x > 0) {
        val i = index(x)
        b.copy(pos = b.pos.updated(i, b.pos.getOrElse(i, 0L) + 1))
      } else {
        val i = index(-x)
        b.copy(neg = b.neg.updated(i, b.neg.getOrElse(i, 0L) + 1))
      }
    }
  }

  override def merge(a: DDBuf, b: DDBuf): DDBuf = {
    def add(x: Map[Int, Long], y: Map[Int, Long]) =
      y.foldLeft(x) { case (m, (i, c)) => m.updated(i, m.getOrElse(i, 0L) + c) }
    DDBuf(add(a.neg, b.neg), a.zero + b.zero, add(a.pos, b.pos))
  }

  override def finish(buf: DDBuf): DDBuf =
    DDBuf(collapse(buf.neg), buf.zero, collapse(buf.pos))
  override def bufferEncoder: Encoder[DDBuf] = Encoders.product[DDBuf]
  override def outputEncoder: Encoder[DDBuf] = Encoders.product[DDBuf]
}

object DDSketch {
  /** The walk's integer certificate: the (sign, bucket) pair that owns
    * the q·(n−1) rank, found by walking buckets in value order
    * (most-negative → zero → most-positive). This is everything the
    * quantile estimate is EXCEPT the final float representative —
    * pure integer arithmetic over the bucket table, which is what
    * makes it DuckDB-oracle-replayable where the estimate
    * (2·gamma^i/(gamma+1), a `pow` whose last ulp is libm-private)
    * is not. sign is −1/0/+1; bucket is 0 for the zero bucket. */
  def quantileBucket(buf: DDBuf, q: Double): (Int, Int) = {
    require(q >= 0 && q <= 1, s"q must be in [0,1]: $q")
    val n = buf.n
    require(n > 0, "quantile of an empty sketch")
    val rank = (q * (n - 1)).toLong // 0-based lower rank
    var seen = 0L
    // negatives: larger bucket index = larger magnitude = smaller value
    for (i <- buf.neg.keysIterator.toArray.sorted(Ordering[Int].reverse)) {
      seen += buf.neg(i)
      if (seen > rank) return (-1, i)
    }
    seen += buf.zero
    if (seen > rank) return (0, 0)
    for (i <- buf.pos.keysIterator.toArray.sorted) {
      seen += buf.pos(i)
      if (seen > rank) return (1, i)
    }
    // unreachable: ranks are < n by construction
    throw new IllegalStateException(s"rank $rank beyond sketch size $n")
  }

  /** Quantile estimate from a sketch built with the same alpha: the
    * [[quantileBucket]] walk's owning bucket rendered as its midpoint
    * representative 2·gamma^i/(gamma+1), within relative error alpha
    * of the true order statistic (0 exactly for the zero bucket). */
  def quantile(buf: DDBuf, q: Double, alpha: Double = 0.01): Double = {
    val gamma = (1 + alpha) / (1 - alpha)
    val (sign, i) = quantileBucket(buf, q)
    sign * 2.0 * math.pow(gamma, i) / (gamma + 1)
  }
}
