package graft.operators

import graft.SparkSuite

class ReshapeSpec extends SparkSuite {
  import spark.implicits._

  test("melt turns wide metric columns into (metric, value) rows, keeping nulls") {
    val df = Seq((1L, Some(10.0), Some(2.0)), (2L, Some(20.0), None))
      .toDF("id", "m1", "m2")
    val out = Reshape.melt(df, Seq("id"), Seq("m1", "m2"))
      .orderBy("id", "metric").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(out.toSeq === Seq(
      (1L, "m1", Some(10.0)), (1L, "m2", Some(2.0)),
      (2L, "m1", Some(20.0)), (2L, "m2", None)))
  }

  test("melt round-trips with the pivot spelling") {
    val wide = Seq((1L, 3.0, 4.0), (2L, 5.0, 6.0)).toDF("id", "a", "b")
    val long = Reshape.melt(wide, Seq("id"), Seq("a", "b"))
    val back = long.groupBy("id")
      .pivot("metric", Seq("a", "b")).sum("value").orderBy("id")
    assert(back.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
      === Seq((1L, 3.0, 4.0), (2L, 5.0, 6.0)))
  }
}
