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

  test("saltedJoin emits exactly the plain join's rows (inner and left)") {
    val dim = (1 to 50).map(i => (s"k$i", i)).toDF("k", "d") // no "hot" row
    val plainInner = skewed.join(dim, Seq("k")).collect().map(_.toSeq).toSeq
    val saltedInner = Skew.saltedJoin(skewed, dim, "k", salts = 8).collect().map(_.toSeq).toSeq
    assert(saltedInner.sortBy(_.toString) === plainInner.sortBy(_.toString))
    // left: the hot key (absent from dim) must null-extend ONCE per
    // fact row, not once per salt
    val plainLeft = skewed.join(dim, Seq("k"), "left").collect().map(_.toSeq).toSeq
    val saltedLeft = Skew.saltedJoin(skewed, dim, "k", salts = 8, "left")
      .collect().map(_.toSeq).toSeq
    assert(saltedLeft.sortBy(_.toString) === plainLeft.sortBy(_.toString))
  }

  test("saltedJoin spreads a hot key over the salt space and rejects dim-preserving types") {
    // hot rows with DISTINCT payloads (a unique id, as real fact rows
    // have): the deterministic row hash must cover most salt buckets.
    // Bit-identical rows collapsing to one bucket is the documented
    // trade-off for salt determinism under task retry (SPARK-23207).
    val hotDistinct = (1 to 900).map(i => ("hot", i.toDouble)).toDF("k", "v")
    val salts = hotDistinct
      .withColumn("__s", Skew.saltCol(8, hotDistinct.columns.map(org.apache.spark.sql.functions.col).toSeq))
      .select("__s").distinct().count()
    assert(salts >= 6, s"900 distinct hot rows should cover most of 8 salt buckets, got $salts")
    val dim = Seq(("hot", 1)).toDF("k", "d")
    intercept[IllegalArgumentException](Skew.saltedJoin(skewed, dim, "k", 8, "right"))
    intercept[IllegalArgumentException](Skew.saltedJoin(skewed, dim, "k", 8, "full"))
    // reserved-name guard: a pre-existing __salt must fail loudly, not
    // be silently clobbered and dropped
    intercept[IllegalArgumentException](
      Skew.saltedJoin(skewed.withColumnRenamed("v", "__salt"), dim, "k", 8))
  }

  test("saltedCountDistinct matches exact distinct counts") {
    val df = (Seq.fill(500)(("hot", "a")) ++ Seq(("hot", "b"), ("hot", "c"), ("cold", "z")))
      .toDF("k", "u")
    val out = Skew.saltedCountDistinct(df, "k", "u").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("hot" -> 3L, "cold" -> 1L))
  }

  test("bloomPrunedJoin: identical rows to the plain join; null fact keys pruned") {
    val factWithNull = Seq((Some(1L), "a"), (Some(2L), "b"), (Some(3L), "c"),
      (Some(97L), "d"), (None: Option[Long], "n")).toDF("fk", "payload")
    val dim = Seq((1L, "x"), (97L, "y")).toDF("dk", "attr")
    val pruned = Skew.bloomPrunedJoin(factWithNull, dim, "fk", "dk")
      .select("fk", "payload", "attr").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val plain = factWithNull.join(dim, factWithNull("fk") === dim("dk"))
      .select("fk", "payload", "attr").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(pruned === plain)
    assert(pruned === Set((1L, "a", "x"), (97L, "d", "y")))
  }
}
