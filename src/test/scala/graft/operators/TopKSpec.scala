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
}
