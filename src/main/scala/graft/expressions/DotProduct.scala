package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Native dot product over two numeric arrays (float or double
  * elements), accumulated in double, strictly left-to-right — the
  * same summation order as `aggregate(zip_with(a,b,_*_), 0.0, _+_)`,
  * so results are bit-identical to the higher-order-function
  * formulation (and to a sequential scalar loop in any engine, which
  * is what the DuckDB oracle runs).
  *
  * Why a custom Expression instead of the built-ins (SURVEY.md §2.3):
  * `zip_with` materializes an intermediate product array per row and
  * `aggregate` interprets a lambda per element; on a billion-vector
  * embedding corpus that is the hot loop. This generates a tight
  * no-allocation while-loop inside whole-stage codegen, and reads
  * float arrays directly (no up-front cast to array<double>, halving
  * shuffle width for float embeddings).
  *
  * A null element in either compared position makes the result null,
  * matching the HOF spelling's null propagation. Mismatched lengths
  * use the shorter prefix (zip_with instead pads-with-null and
  * returns null — the prefix is the useful semantics for vectors).
  */
case class DotProduct(left: Expression, right: Expression)
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

  override def prettyName: String = "graft_dot"
  override def dataType: DataType = DoubleType

  /** Must account for element nullability: a null ELEMENT nulls the
    * result even when both array columns are non-null. Without this,
    * codegen materializes ev.isNull as the literal `false` and the
    * null path silently cannot fire. */
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
      s += xv * yv
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  /** When NO element can be null (both arrays containsNull=false) the
    * generated code must not reference `ev.isNull` at all: if the
    * expression as a whole is also non-nullable, nullSafeCodeGen
    * substitutes the literal `false` for it and an assignment
    * `false = true;` fails Janino compilation — which silently drops
    * the WHOLE stage back to interpreted execution, defeating the
    * expression's purpose on exactly the densest inputs. */
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
      if (!elemsNullable)
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $s += ${get(left, a, i)} * ${get(right, b, i)};
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
           |    $s += ${get(left, a, i)} * ${get(right, b, i)};
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

/** Registration + Column-level API for the custom expressions (the
  * public `Column` constructor took an `Expression` in Spark 3 but is
  * `ColumnNode`-backed in Spark 4, so the supported route is the
  * function registry + `call_function`). */
object GraftFunctions {
  val DotName = "graft_dot"
  val Dist2Name = "graft_dist2"
  val ShinglesName = "graft_shingles"
  val JaccardName = "graft_jaccard"
  val RollingHashName = "graft_rolling_hash"
  val BloomAggName = "graft_bloom_agg"
  val BloomContainsName = "graft_bloom_contains"
  val UnicodeNormalizeName = "graft_unicode_normalize"
  val JaroWinklerName = "graft_jaro_winkler"

  /** Extract a required non-null literal argument at function-build
    * time, failing with a readable message instead of the NPE /
    * unbound-attribute internal error a raw `.eval()` throws on
    * `NULL`, a column reference, or a missing argument. */
  private[graft] def literalArg(e: Seq[Expression], i: Int,
                                fn: String, arg: String): Any = {
    require(e.length > i, s"$fn: missing argument <$arg> (position ${i + 1})")
    require(e(i).foldable, s"$fn: <$arg> must be a literal, got ${e(i).sql}")
    val v = e(i).eval()
    require(v != null, s"$fn: <$arg> must not be NULL")
    v
  }

  /** Idempotent per-session registration. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      DotName, exprs => DotProduct(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      Dist2Name, exprs => Dist2(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      ShinglesName, exprs => DistinctShingles(exprs(0),
        literalArg(exprs, 1, ShinglesName, "n").asInstanceOf[Int]), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      JaccardName, exprs => JaccardSim(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      RollingHashName, exprs => RollingHash(exprs(0)), "scala_udf")
    // Spark's own runtime-filter bloom expressions (catalyst
    // BloomFilterAggregate / BloomFilterMightContain) are not in the
    // public function registry; expose them under graft names so the
    // incremental-dedup fast path (Dedup.newDocs) stays UDF-free and
    // sketch-mergeable (map-side partial blooms OR together).
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      BloomAggName, exprs =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          exprs(0), exprs(1), exprs(2)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      BloomContainsName, exprs =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      UnicodeNormalizeName, exprs =>
        UnicodeNormalize(exprs(0),
          literalArg(exprs, 1, UnicodeNormalizeName, "form").toString), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      JaroWinklerName, exprs => JaroWinklerSim(exprs(0), exprs(1)), "scala_udf")
  }

  def dot(a: Column, b: Column): Column = call_function(DotName, a, b)

  /** Squared L2 distance, bit-identical to the HOF left-fold spelling
    * (see [[Dist2]]). */
  def dist2(a: Column, b: Column): Column = call_function(Dist2Name, a, b)

  def distinctShingles(c: Column, n: Int): Column =
    call_function(ShinglesName, c, org.apache.spark.sql.functions.lit(n))

  def jaccard(a: Column, b: Column): Column = call_function(JaccardName, a, b)

  def rollingHash(c: Column): Column = call_function(RollingHashName, c)

  /** DuckDB-pinned Jaro-Winkler similarity (see [[JaroWinklerSim]]). */
  def jaroWinkler(a: Column, b: Column): Column =
    call_function(JaroWinklerName, a, b)

  /** Distributed bloom-filter build over `xxhash64(value)` longs.
    * Returns one BINARY row (the serialized sketch). `estItems` /
    * `numBits` are clamped by Spark to
    * `spark.sql.optimizer.runtime.bloomFilter.max{NumItems,NumBits}`. */
  def bloomAgg(value: Column, estItems: Long, numBits: Long): Column = {
    import org.apache.spark.sql.functions.lit
    call_function(BloomAggName, value, lit(estItems), lit(numBits))
  }

  /** Membership probe against a serialized bloom (no false negatives;
    * false-positive rate set by the build parameters). `bloom` must be
    * foldable (a literal), `value` a LONG (xxhash64 output). */
  def bloomContains(bloom: Column, value: Column): Column =
    call_function(BloomContainsName, bloom, value)

  /** Unicode normalization; `form` ∈ NFC/NFD/NFKC/NFKD. */
  def unicodeNormalize(c: Column, form: String = "NFC"): Column =
    call_function(UnicodeNormalizeName, c,
      org.apache.spark.sql.functions.lit(form))
}
