package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Round-16 optimization gate: [[Dist2]] replaced the interpreted
  * `aggregate(zip_with(...))` fold inside
  * [[graft.operators.Clustering.dist2]] — every training row's argmin
  * and every drift baseline ride it, so the replacement must be
  * BIT-identical, not merely close. */
class Dist2Spec extends SparkSuite {
  import spark.implicits._

  /** The exact pre-round-16 spelling of Clustering.dist2. */
  private def hofDist2(a: org.apache.spark.sql.Column,
                       b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), _ + _)

  test("native dist2 is bit-identical to the higher-order-function fold") {
    GraftFunctions.register(spark)
    val df = Seq.tabulate(200)(i =>
      (Array.tabulate(64)(j => (math.sin(i * 64 + j) * 10).toFloat),
        Array.tabulate(64)(j => (math.cos(i * 64 + j) * 10).toFloat)))
      .toDF("a", "b")
    val both = df.select(
      GraftFunctions.dist2(
        graft.operators.Similarity.asDouble(col("a")),
        graft.operators.Similarity.asDouble(col("b"))).as("native"),
      hofDist2(
        graft.operators.Similarity.asDouble(col("a")),
        graft.operators.Similarity.asDouble(col("b"))).as("hof"))
      .collect()
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("bit-identical on REAL sf0.001 embeddings against a stored centroid") {
    GraftFunctions.register(spark)
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val q = graft.operators.Similarity.vectorOf(emb, 1L)
    val both = emb.select(
      GraftFunctions.dist2(
        graft.operators.Similarity.asDouble(col("embedding")), typedLit(q)).as("native"),
      hofDist2(
        graft.operators.Similarity.asDouble(col("embedding")), typedLit(q)).as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("float operands read directly (no pre-cast) match the casted fold") {
    GraftFunctions.register(spark)
    val df = Seq.tabulate(20)(i =>
      (Array.tabulate(8)(j => (i + j * 0.25).toFloat),
        Array.tabulate(8)(j => (i - j * 0.5).toFloat))).toDF("a", "b")
    val both = df.select(
      GraftFunctions.dist2(col("a"), col("b")).as("native"),
      hofDist2(graft.operators.Similarity.asDouble(col("a")),
        graft.operators.Similarity.asDouble(col("b"))).as("hof")).collect()
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("null array and null element both yield null") {
    GraftFunctions.register(spark)
    val df = Seq((Some(Array(1.0, 2.0)), Option.empty[Array[Double]])).toDF("a", "b")
    assert(df.select(GraftFunctions.dist2(col("a"), col("b"))).head().isNullAt(0))
    val withNullElem = spark.range(2)
      .select(array(col("id").cast("double"),
        when(col("id") === 1, lit(null)).otherwise(lit(2.0))).as("a"))
      .select(GraftFunctions.dist2(col("a"), col("a")).as("d"))
      .collect()
    assert(withNullElem.exists(!_.isNullAt(0)), "dense row must produce a value")
    assert(withNullElem.exists(_.isNullAt(0)), "null element must produce null")
  }

  test("resolves through the pure-SQL extension route in a fresh newSession") {
    val s2 = spark.newSession()
    val d = s2.sql(
      "SELECT graft_dist2(array(1.0D, 2.0D), array(3.0D, 5.0D)) AS d").head().getDouble(0)
    assert(d === 13.0)
  }
}
