package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class QualitySpec extends SparkSuite {
  import spark.implicits._

  private val df = Seq(
    (Some(1L), Some(10.0), "A", "ok-1"),
    (Some(2L), Some(60.0), "A", "ok-2"),   // range violation
    (Some(3L), None, "B", "bad 3"),        // null qty; flag + regex violations
    (None, Some(5.0), "A", "ok-4"),        // null id
    (Some(5L), Some(-1.0), null, "ok-5")   // range + (null flag passes set rule)
  ).toDF("id", "qty", "flag", "name")

  test("report counts each rule's violations with explicit null semantics") {
    val out = Quality.report(df, Seq(
      Quality.notNull("id"),
      Quality.inRange("qty", 0, 50),
      Quality.inSet("flag", Seq("A")),
      Quality.matches("name", "^ok-\\d$"),
      Quality.check("qty_lt_100", col("qty") < 100)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map(
      "not_null:id" -> 1L,       // row 4
      "range:qty" -> 2L,         // rows 2 and 5; NULL qty passes
      "set:flag" -> 1L,          // row 3; NULL flag passes
      "regex:name" -> 1L,        // row 3
      "check:qty_lt_100" -> 1L)) // row 3: NULL predicate = violation
  }

  test("report: rates divide exact counts; n_rows constant across rules") {
    val out = Quality.report(df, Seq(Quality.notNull("id"), Quality.notNull("qty")))
      .collect()
    assert(out.forall(_.getLong(2) === 5L))
    val rates = out.map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(rates("not_null:id") === 1.0 / 5)
    assert(rates("not_null:qty") === 1.0 / 5)
  }

  test("all scan rules evaluate in a single aggregate pass (one scan in the plan)") {
    val plan = Quality.report(df, Seq(
      Quality.notNull("id"), Quality.inRange("qty", 0, 50),
      Quality.inSet("flag", Seq("A")))).queryExecution.executedPlan.toString
    val scans = plan.linesIterator.count(_.contains("Scan"))
    assert(scans === 1, s"expected exactly one scan:\n$plan")
    assert(plan.contains("partial_count"), s"expected map-side partials:\n$plan")
  }

  test("uniqueRule counts rows beyond the first per key") {
    val d = Seq((1, "a"), (1, "a"), (1, "b"), (2, "a")).toDF("k", "s")
    val one = Quality.uniqueRule(d, Seq("k", "s")).collect().head
    assert(one.getString(0) === "unique:k,s")
    assert(one.getLong(1) === 1L) // (1,a) twice
    assert(one.getLong(2) === 4L)
    val both = Quality.uniqueRule(d, Seq("k")).collect().head
    assert(both.getLong(1) === 2L) // k=1 three times
  }
}
