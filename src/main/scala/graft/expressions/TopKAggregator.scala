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

  /** Sorted-insert only when the row beats the current k-th entry —
    * the common miss path on a full buffer is a single comparison,
    * no allocation (a per-row full re-sort would be O(k log k) per
    * input on the map side). */
  override def reduce(buf: TopKBuf, row: Scored): TopKBuf = {
    val items = buf.items
    if (items.lengthCompare(k) >= 0 && ord.lteq(items.last, row)) buf
    else {
      val (before, after) = items.span(s => ord.lt(s, row))
      TopKBuf((before ::: row :: after).take(k))
    }
  }

  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf = {
    // merge of two sorted lists, truncated at k
    @annotation.tailrec
    def go(x: List[Scored], y: List[Scored], n: Int, acc: List[Scored]): List[Scored] =
      if (n == 0) acc.reverse
      else (x, y) match {
        case (Nil, Nil) => acc.reverse
        case (xs, Nil) => acc.reverse ::: xs.take(n)
        case (Nil, ys) => acc.reverse ::: ys.take(n)
        case (xh :: xt, yh :: _) if ord.lteq(xh, yh) => go(xt, y, n - 1, xh :: acc)
        case (_, yh :: yt) => go(x, yt, n - 1, yh :: acc)
      }
    TopKBuf(go(a.items, b.items, k, Nil))
  }

  override def finish(buf: TopKBuf): TopKBuf = buf

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
}
