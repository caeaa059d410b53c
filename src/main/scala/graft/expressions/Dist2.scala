package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native squared-L2 distance over two numeric arrays (float or double
  * elements), accumulated in double, strictly left-to-right — the same
  * arithmetic and summation order as
  * `aggregate(zip_with(a,b,(x,y)=>(x-y)*(x-y)), 0.0, _+_)`, so results
  * are bit-identical to the higher-order-function formulation (and to
  * the sequential scalar loop the DuckDB oracle replays via
  * `list_reduce`): per element one double subtract then one double
  * multiply, folded into the accumulator with one double add.
  *
  * Why a custom Expression instead of the built-ins (the
  * [[DotProduct]] rationale, round-16 measurement): `zip_with`
  * materializes an intermediate difference-square array per row and
  * `aggregate` interprets a lambda per element — and Lloyd assignment
  * evaluates this k times per vector per iteration, which event-log
  * profiling showed to be the dominant task time of every small-k
  * training row (the exact-argmin branch of
  * [[graft.operators.Clustering.assignCells]]). This generates a tight
  * no-allocation while-loop inside whole-stage codegen.
  *
  * A null element in either compared position makes the result null,
  * matching the HOF spelling's null propagation. Mismatched lengths
  * use the shorter prefix (zip_with instead pads-with-null and returns
  * null — the prefix is the useful semantics for vectors, and the
  * [[DotProduct]] convention; no graft caller compares ragged arrays).
  */
case class Dist2(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> arguments, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def prettyName: String = "graft_dist2"
  override def dataType: DataType = DoubleType

  /** Must account for element nullability: a null ELEMENT nulls the
    * result even when both array columns are non-null (the
    * [[DotProduct]] lesson — without this, codegen materializes
    * ev.isNull as the literal `false` and the null path cannot fire). */
  override def nullable: Boolean = !childrenResolved ||
    left.nullable || right.nullable || (Seq(left, right).exists(_.dataType match {
      case ArrayType(_, containsNull) => containsNull
      case _ => true
    }))

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      val d = xv - yv
      s += d * d
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  /** Same two-branch shape as [[DotProduct.doGenCode]]: when no element
    * can be null the generated code must never assign `ev.isNull`
    * (nullSafeCodeGen substitutes the literal `false` there, and
    * `false = true;` fails Janino — silently dropping the stage back to
    * interpreted execution on exactly the densest inputs). */
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def get(e: Expression, arr: String, i: String): String =
      if (elemType(e) == FloatType) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
    val elemsNullable = Seq(left, right).exists(_.dataType match {
      case ArrayType(_, containsNull) => containsNull
      case _ => true
    })
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      if (!elemsNullable)
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $d = ${get(left, a, i)} - ${get(right, b, i)};
           |  $s += $d * $d;
           |}
           |${ev.value} = $s;
         """.stripMargin
      else
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $s = 0.0;
           |for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
           |  if ($a.isNullAt($i) || $b.isNullAt($i)) {
           |    ${ev.isNull} = true;
           |  } else {
           |    double $d = ${get(left, a, i)} - ${get(right, b, i)};
           |    $s += $d * $d;
           |  }
           |}
           |${ev.value} = $s;
         """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
