package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial rolling hash over a string's codepoints:
  * fold(0, acc -> (acc*31 + cp) mod (2^31-1)).
  *
  * Same value as the HOF spelling
  * `aggregate(transform(split(c,""), ascii), 0L, (a,x) -> (a*31+x)%P)`
  * — which is interpreted per character (HOFs are CodegenFallback) —
  * and as the DuckDB oracle's `list_reduce` over `string_split`.
  * One fused loop per row inside whole-stage codegen. */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.simpleString}")

  override def prettyName: String = "graft_rolling_hash"
  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any =
    java.lang.Long.valueOf(RollingHash.compute(v.asInstanceOf[UTF8String]))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.RollingHash.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHash {
  private val P = 2147483647L

  def compute(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      acc = (acc * 31 + cp) % P
      i += Character.charCount(cp)
    }
    acc
  }
}
