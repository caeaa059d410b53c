package graft.expressions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One (measure, tiebreak) entry in a top-k buffer. */
final case class Scored(measure: Double, tiebreak: Long)

/** Bounded top-k buffer (sorted, at most k entries). */
final case class TopKBuf(items: List[Scored])

/** Bounded-heap top-k aggregator — the typed-UDAF tier (SURVEY.md
  * §2.11) where a built-in falls short: Spark has min_by/max_by but
  * no bounded top-k aggregate, so the usual per-group top-k is a
  * Window (full shuffle of EVERY row plus a per-partition sort). This
  * aggregator keeps at most k entries per group per map task, so
  * partial aggregation shrinks the shuffle from n rows per group to
  * k * map-tasks — the difference between shuffling a 100 TB fact
  * and shuffling kilobytes.
  *
  * Ordering: measure descending, tiebreak ascending (deterministic
  * under measure ties — same contract as TopK.perGroup).
  */
class TopKAggregator(k: Int) extends Aggregator[Scored, TopKBuf, TopKBuf] {

  private val ord: Ordering[Scored] = Ordering.by(s => (-s.measure, s.tiebreak))

  override def zero: TopKBuf = TopKBuf(Nil)

  override def reduce(buf: TopKBuf, row: Scored): TopKBuf =
    TopKBuf((row :: buf.items).sorted(ord).take(k))

  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf =
    TopKBuf((a.items ++ b.items).sorted(ord).take(k))

  override def finish(buf: TopKBuf): TopKBuf = buf

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
}
