package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct character n-gram shingles of a string, as one native
  * expression.
  *
  * Why not `array_distinct(transform(sequence(...), substr))`: Spark's
  * higher-order functions are CodegenFallback — the lambda is
  * interpreted per array element, which made shingling (300 substrings
  * per document) the hottest stage of the minhash pipeline, ahead of
  * the md5 hashing itself. This computes the distinct shingle set in
  * one pass over the string; `doGenCode` emits a call to the static
  * helper so the enclosing projection stays inside whole-stage
  * codegen.
  *
  * Semantics match the HOF formulation exactly (and DuckDB
  * `list_distinct([substr(text,i,n) ...])`): 1-based positions,
  * `max(len-n+1, 1)` windows (short strings yield one short shingle),
  * first-occurrence order.
  */
case class DistinctShingles(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument and a positive length, " +
        s"got ${child.dataType.simpleString}, n=$n")

  override def prettyName: String = "graft_shingles"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    DistinctShingles.compute(v.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.DistinctShingles.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DistinctShingles {
  /** Shared by interpreted eval and generated code. */
  def compute(s: UTF8String, n: Int): ArrayData = {
    val len = s.numChars()
    val count = math.max(len - n + 1, 1)
    val seen = new java.util.LinkedHashSet[UTF8String](count * 2)
    var i = 0
    while (i < count) {
      // substringSQL is 1-based and clamps the window at the end
      seen.add(s.substringSQL(i + 1, n))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }
}
