package graft.operators

import graft.SparkSuite

class TopKSpec extends SparkSuite {
  import spark.implicits._

  private val df = Seq(
    ("g1", 1L, 10.0), ("g1", 2L, 30.0), ("g1", 3L, 20.0),
    ("g2", 4L, 30.0), ("g2", 5L, 30.0))
    .toDF("g", "id", "m")

  test("topN global with deterministic tiebreak") {
    val out = TopK.topN(df, "m", "id", 3).collect().map(_.getLong(1))
    assert(out.toSeq === Seq(2L, 4L, 5L)) // 30.0 ties broken by id
  }

  test("perGroup top-k with rank column") {
    val out = TopK.perGroup(df, "g", "m", "id", 2)
      .orderBy("g", "rank").collect().map(r => (r.getString(0), r.getLong(1), r.getInt(3)))
    assert(out.toSeq === Seq(("g1", 2L, 1), ("g1", 3L, 2), ("g2", 4L, 1), ("g2", 5L, 2)))
  }

  test("perGroupViaAggregator returns the same winners and ranks as the window form") {
    val window = TopK.perGroup(df, "g", "m", "id", 2)
      .select("g", "id", "rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    val agg = TopK.perGroupViaAggregator(df, "g", "m", "id", 2)
      .select("g", "id", "rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(agg === window)
  }

  test("perGroupViaAggregator on a larger skewed input matches the window form") {
    import spark.implicits._
    val big = (1 to 5000).map(i => (s"g${i % 7}", i.toLong, (i % 97).toDouble))
      .toDF("g", "id", "m")
    val w = TopK.perGroup(big, "g", "m", "id", 5).select("g", "id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val a = TopK.perGroupViaAggregator(big, "g", "m", "id", 5).select("g", "id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(a === w)
  }
}
