package graft.expressions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries summary: at most `k` tracked counters plus the total
  * item count seen by this buffer. */
final case class MGBuf(counts: Map[String, Long], n: Long)

/** Mergeable Misra-Gries frequent-items aggregator (SURVEY.md §2.11
  * typed-UDAF tier). Deterministic counterpart to the CMS shards in
  * [[graft.operators.Profile.cmsShards]]: where CMS gives randomized
  * overestimates, Misra-Gries gives a DETERMINISTIC guarantee — after
  * any stream of n items, every tracked count undercounts its true
  * frequency by at most n/(k+1), so every item with true frequency
  * > n/(k+1) is guaranteed present in the summary (Misra & Gries 1982).
  * The merge rule (sum counters, then subtract the (k+1)-th largest
  * count and drop non-positives) preserves that bound across partial
  * buffers — Agarwal et al., "Mergeable Summaries" (PODS 2012) — which
  * is exactly what Spark's two-phase aggregation needs: map-side
  * partials of at most k entries each, one tiny shuffle, no row ever
  * leaves its scan task.
  *
  * The total `n` rides in the buffer so the candidate set AND the
  * threshold denominator come out of ONE pass over the data.
  */
class MisraGriesAggregator(k: Int) extends Aggregator[String, MGBuf, MGBuf] {
  require(k >= 1, s"Misra-Gries capacity must be >= 1, got $k")

  override def zero: MGBuf = MGBuf(Map.empty, 0L)

  override def reduce(buf: MGBuf, item: String): MGBuf = {
    val m = buf.counts
    m.get(item) match {
      case Some(c)            => MGBuf(m.updated(item, c + 1), buf.n + 1)
      case None if m.size < k => MGBuf(m.updated(item, 1L), buf.n + 1)
      case None =>
        // classic decrement step: the incoming item and every tracked
        // counter each lose one; zeroed counters fall out of the map
        MGBuf(m.collect { case (w, c) if c > 1 => w -> (c - 1) }, buf.n + 1)
    }
  }

  override def merge(a: MGBuf, b: MGBuf): MGBuf = {
    val sum = b.counts.foldLeft(a.counts) { case (m, (w, c)) =>
      m.updated(w, m.getOrElse(w, 0L) + c)
    }
    val kept =
      if (sum.size <= k) sum
      else {
        // subtract the (k+1)-th largest count from everything: at most
        // k counters stay strictly positive (ties at the cut drop to 0)
        val cut = sum.valuesIterator.toArray.sorted(Ordering[Long].reverse).apply(k)
        sum.collect { case (w, c) if c > cut => w -> (c - cut) }
      }
    MGBuf(kept, a.n + b.n)
  }

  override def finish(buf: MGBuf): MGBuf = buf
  override def bufferEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]
  override def outputEncoder: Encoder[MGBuf] = Encoders.product[MGBuf]
}
