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

  test("a null ELEMENT propagates null (matches the HOF spelling)") {
    GraftFunctions.register(spark)
    // non-literal path so both codegen and eval see the null slot
    val df = spark.range(2)
      .select(array(col("id").cast("double"),
        when(col("id") === 1, lit(null)).otherwise(lit(2.0))).as("a"))
      .select(col("a"), GraftFunctions.dot(col("a"), col("a")).as("d"))
      .orderBy(col("a"))
    val rows = df.collect()
    assert(rows.exists(!_.isNullAt(1)), "dense row must produce a value")
    assert(rows.exists(_.isNullAt(1)), "row with a null element must produce null")
  }

  test("distinctShingles matches the HOF array_distinct(transform(...)) exactly") {
    GraftFunctions.register(spark)
    val texts = Seq("hello world hello", "ab", "", "aaaaaaa", "中文文本中文")
    val df = texts.toDF("t")
    val pairs = df.select(
      GraftFunctions.distinctShingles(col("t"), 5).as("native"),
      array_distinct(graft.operators.Dedup.shingles(col("t"), 5)).as("hof"))
      .collect()
    pairs.foreach { r =>
      assert(r.getSeq[String](0) === r.getSeq[String](1))
    }
  }

  test("jaccard matches the array_intersect formula exactly") {
    GraftFunctions.register(spark)
    val df = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d")),
      (Seq("a"), Seq("b"))).toDF("x", "y")
    val out = df.select(
      GraftFunctions.jaccard(col("x"), col("y")).as("native"),
      (size(array_intersect(col("x"), col("y"))).cast("double") /
        (size(col("x")) + size(col("y")) - size(array_intersect(col("x"), col("y"))))
          .cast("double")).as("hof")).collect()
    assert(out(0).getDouble(0) === 0.5)
    assert(out(0).getDouble(0) === out(0).getDouble(1))
    assert(out(1).getDouble(0) === 0.0)
    assert(out(1).getDouble(0) === out(1).getDouble(1))
    // the HOF spelling throws DIVIDE_BY_ZERO (ANSI) on empty/empty;
    // the native expression defines it as 0
    val empty = Seq((Seq.empty[String], Seq.empty[String])).toDF("x", "y")
      .select(GraftFunctions.jaccard(col("x"), col("y"))).head()
    assert(empty.getDouble(0) === 0.0)
  }

  test("rollingHash matches the HOF fold exactly, incl. CJK codepoints") {
    GraftFunctions.register(spark)
    val df = Seq("hello world", "", "a", "中文 mixed 123", "  spaces  ").toDF("t")
    val out = df.select(
      GraftFunctions.rollingHash(col("t")).as("native"),
      graft.functions.Text.rollingHash(col("t")).as("hof")).collect()
    out.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("the expression participates in whole-stage codegen (no fallback)") {
    GraftFunctions.register(spark)
    // non-literal input so the optimizer can't constant-fold the call.
    // This shape (non-null array of non-null elements) makes the whole
    // expression non-nullable — the case where nullSafeCodeGen renders
    // ev.isNull as the literal `false`, so any generated assignment to
    // it fails Janino compilation. With codegen.fallback disabled that
    // failure surfaces as an error instead of a silent interpreted run
    // (the plan string alone can't catch it: it renders pre-compile).
    withSQLConf("spark.sql.codegen.fallback" -> "false") {
      val df = spark.range(10)
        .select(array(col("id").cast("double"), lit(2.0)).as("a"))
        .select(GraftFunctions.dot(col("a"), col("a")).as("d"))
      val plan = df.queryExecution.executedPlan.toString
      // the "*(n)" prefix marks operators inside a WholeStageCodegen stage
      assert(plan.contains("*(1) Project [graft_dot"), s"expected graft_dot inside WSCG in:\n$plan")
      assert(df.collect().map(_.getDouble(0)).take(3).toSeq === Seq(4.0, 5.0, 8.0))
    }
  }

  test("nullable-element inputs still compile and propagate null (fallback disabled)") {
    GraftFunctions.register(spark)
    withSQLConf("spark.sql.codegen.fallback" -> "false") {
      val df = spark.range(3)
        .select(array(col("id").cast("double"),
          when(col("id") === 1, lit(null)).otherwise(lit(2.0))).as("a"))
        .select(col("a"), GraftFunctions.dot(col("a"), col("a")).as("d"))
      val rows = df.orderBy(col("a")).collect()
      assert(rows.count(_.isNullAt(1)) === 1)
      assert(rows.count(!_.isNullAt(1)) === 2)
    }
  }
}
