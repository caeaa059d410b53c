package graft.operators

import graft.SparkSuite

class SkewSpec extends SparkSuite {
  import spark.implicits._

  // one hot key (90% of rows) + a long tail
  private val skewed = (Seq.fill(900)(("hot", 1.25)) ++
    (1 to 100).map(i => (s"k$i", 2.50))).toDF("k", "v")

  test("saltedSum matches the plain aggregate exactly") {
    val salted = Skew.saltedSum(skewed, "k", "v").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val plain = skewed.groupBy("k")
      .agg(org.apache.spark.sql.functions.sum(
        $"v".cast(org.apache.spark.sql.types.DecimalType(18, 2))).cast("double"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(salted === plain)
    assert(salted("hot") === 1125.0)
  }

  test("salted partial phase bounds rows per key by the salt count") {
    val partialRows = skewed
      .withColumn("__salt", Skew.saltCol(8, skewed.columns.map(org.apache.spark.sql.functions.col).toSeq))
      .groupBy("k", "__salt").count()
      .groupBy("k").count()
      .collect().map(_.getLong(1))
    assert(partialRows.max <= 8)
  }

  test("saltedCountDistinct matches exact distinct counts") {
    val df = (Seq.fill(500)(("hot", "a")) ++ Seq(("hot", "b"), ("hot", "c"), ("cold", "z")))
      .toDF("k", "u")
    val out = Skew.saltedCountDistinct(df, "k", "u").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("hot" -> 3L, "cold" -> 1L))
  }
}
