package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro-Winkler similarity as a native codegen Expression — the
  * entity-resolution scorer the built-in `levenshtein` can't replace:
  * edit distance treats "prefix typo" and "suffix typo" alike, while
  * record linkage on names wants transposition tolerance plus the
  * Winkler common-prefix boost (Winkler 1990, the Census Bureau
  * string comparator). Spark ships no Jaro function at all (§2.11
  * ladder: a codegen Expression, not a UDF — the O(len·window) scan
  * runs inside whole-stage codegen with two small boolean buffers).
  *
  * Semantics are pinned to DuckDB's `jaro_winkler_similarity`
  * (fuzz-verified bit-exact over 50k random pairs, incl. multi-byte
  * UTF-8 and 200-char strings — see JaroWinklerSpec):
  *  - operates on UTF-8 BYTES (DuckDB convention; identical to
  *    codepoints for ASCII, and a multi-byte codepoint can only match
  *    its own bytes so cross-script matches don't false-positive);
  *  - either side empty → 0.0; equal strings → 1.0;
  *  - match window `max(l1,l2)/2 - 1` (floored at 0), greedy
  *    left-to-right matching, transpositions halved by integer div;
  *  - jaro = (m/l1 + m/l2 + (m−t)/m) / 3 in exactly that IEEE
  *    association order;
  *  - Winkler boost `sim + 0.1·prefix·(1−sim)` (prefix ≤ 4 bytes)
  *    applied only when jaro > 0.7.
  */
case class JaroWinklerSim(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: StringType, _: StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string arguments, got ${l.simpleString} and ${r.simpleString}")
    }

  override def prettyName: String = "graft_jaro_winkler"
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerSim.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.JaroWinklerSim.compute($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinklerSim {

  /** Static entry for both eval and generated code. */
  def compute(s1: UTF8String, s2: UTF8String): Double = {
    val a = s1.getBytes
    val b = s2.getBytes
    val l1 = a.length
    val l2 = b.length
    if (l1 == 0 || l2 == 0) return 0.0
    if (java.util.Arrays.equals(a, b)) return 1.0
    val window = {
      val w = (if (l1 > l2) l1 else l2) / 2 - 1
      if (w < 0) 0 else w
    }
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = if (i - window > 0) i - window else 0
      val hi = if (i + window + 1 < l2) i + window + 1 else l2
      var j = lo
      var open = true
      while (j < hi && open) {
        if (!m2(j) && a(i) == b(j)) {
          m1(i) = true; m2(j) = true; m += 1; open = false
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: walk both matched subsequences in order
    var t = 0
    var j = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(j)) j += 1
        if (a(i) != b(j)) t += 1
        j += 1
      }
      i += 1
    }
    t /= 2
    // exactly this association order — the oracle's IEEE chain
    val sim = (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3.0
    if (sim > 0.7) {
      val lim = {
        val s = if (l1 < l2) l1 else l2
        if (s < 4) s else 4
      }
      var p = 0
      var go = true
      var k = 0
      while (k < lim && go) {
        if (a(k) == b(k)) p += 1 else go = false
        k += 1
      }
      sim + 0.1 * p * (1.0 - sim)
    } else sim
  }
}
