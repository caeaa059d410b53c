package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.operators.Similarity

class DotProductSpec extends SparkSuite {
  import spark.implicits._

  test("native dot is bit-identical to the higher-order-function fold") {
    GraftFunctions.register(spark)
    val df = Seq.tabulate(50)(i =>
      (Array.tabulate(64)(j => (math.sin(i * 64 + j) * 10).toFloat),
        Array.tabulate(64)(j => (math.cos(i * 64 + j) * 10).toFloat)))
      .toDF("a", "b")
    val both = df.select(
      GraftFunctions.dot(col("a"), col("b")).as("native"),
      Similarity.dot(Similarity.asDouble(col("a")), Similarity.asDouble(col("b"))).as("hof"))
      .collect()
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("mixed float/double operands and shorter-prefix semantics") {
    GraftFunctions.register(spark)
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(10.0, 20.0))).toDF("f", "d")
    assert(df.select(GraftFunctions.dot(col("f"), col("d"))).head().getDouble(0) === 50.0)
    assert(df.select(GraftFunctions.dot(col("d"), col("f"))).head().getDouble(0) === 50.0)
  }

  test("null input arrays yield null, not a crash") {
    GraftFunctions.register(spark)
    val df = Seq((Some(Array(1.0, 2.0)), Option.empty[Array[Double]])).toDF("a", "b")
    assert(df.select(GraftFunctions.dot(col("a"), col("b"))).head().isNullAt(0))
  }

  test("the expression participates in whole-stage codegen (no fallback)") {
    GraftFunctions.register(spark)
    // non-literal input so the optimizer can't constant-fold the call
    val df = spark.range(10)
      .select(array(col("id").cast("double"), lit(2.0)).as("a"))
      .select(GraftFunctions.dot(col("a"), col("a")).as("d"))
    val plan = df.queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [graft_dot"), s"expected graft_dot inside WSCG in:\n$plan")
    assert(df.collect().map(_.getDouble(0)).take(3).toSeq === Seq(4.0, 5.0, 8.0))
  }
}
