package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Jaccard similarity of two string arrays in one pass:
  * |distinct(a) ∩ distinct(b)| / (|a| + |b| - inter).
  *
  * Exactly the formula `size(array_intersect(a,b)) / (size(a)+size(b)
  * - size(array_intersect(a,b)))` — but `array_intersect` is
  * CodegenFallback (interpreted per element) and is evaluated twice
  * in that spelling. The hot use passes already-distinct shingle
  * arrays, where raw sizes equal set sizes (also what the DuckDB
  * oracle computes with `list_intersect`/`len`).
  */
case class JaccardSim(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> arguments, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def prettyName: String = "graft_jaccard"
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    JaccardSim.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.JaccardSim.compute($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaccardSim {
  def compute(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    val setA = new java.util.HashSet[UTF8String](na * 2)
    var i = 0
    while (i < na) { setA.add(a.getUTF8String(i)); i += 1 }
    val hitB = new java.util.HashSet[UTF8String](nb * 2)
    var inter = 0
    i = 0
    while (i < nb) {
      val v = b.getUTF8String(i)
      if (setA.contains(v) && hitB.add(v)) inter += 1
      i += 1
    }
    val union = na + nb - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }
}
