package graft.expressions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Exact covariance-moment accumulator for fixed-`d` micro-unit
  * vectors — the typed-UDAF tier (SURVEY.md §2.11) where the
  * declarative spelling falls short: the explode-based moment build
  * materializes d(d+1)/2 structs PER ROW through Generate +
  * HashAggregate (measured 3.1 s at sf0.1), while this buffer does
  * the same d(d+1)/2 fused multiply-adds into one primitive long
  * array per map task. Partial aggregation ships ONE ~(d²/2+d+1)-cell
  * buffer per task (KBs), so the shuffle is flat in corpus size —
  * same safety property, ~10× less CPU.
  *
  * Buffer layout: [d(d+1)/2 upper-triangle pair sums in (i, j≥i)
  * row-major order][d element sums][count]. All cells are exact
  * integer sums (order-independent, engine-exact — the
  * labelCentroids discipline). Per-buffer sums hold to ~10^18 micro²
  * (≈10^6 unit-scale vectors per task partial); beyond that, upcast
  * the buffer to BigInt/DECIMAL — same layout, wider cells.
  */
class CovMomentsAggregator(d: Int)
    extends Aggregator[Array[Long], Array[Long], Array[Long]] {
  private val nPairs = d * (d + 1) / 2

  override def zero: Array[Long] = new Array[Long](nPairs + d + 1)

  override def reduce(b: Array[Long], vm: Array[Long]): Array[Long] = {
    var idx = 0
    var i = 0
    while (i < d) {
      val vi = vm(i)
      var j = i
      while (j < d) { b(idx) += vi * vm(j); idx += 1; j += 1 }
      b(nPairs + i) += vi
      i += 1
    }
    b(nPairs + d) += 1L
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(b: Array[Long]): Array[Long] = b

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}
