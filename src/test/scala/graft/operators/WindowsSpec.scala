package graft.operators

import java.sql.Timestamp

import graft.SparkSuite

class WindowsSpec extends SparkSuite {
  import spark.implicits._

  test("monthlyTrend: lag delta, sequence, running total per supplier") {
    val li = Seq(
      (10L, Timestamp.valueOf("2024-01-05 00:00:00"), 3.0),
      (10L, Timestamp.valueOf("2024-01-20 00:00:00"), 2.0),
      (10L, Timestamp.valueOf("2024-02-10 00:00:00"), 7.0),
      (11L, Timestamp.valueOf("2024-03-01 00:00:00"), 1.0))
      .toDF("l_suppkey", "l_shipdate", "l_quantity")
    val out = Windows.monthlyTrend(li).collect()
    assert(out.length === 3)
    val jan = out(0)
    assert(jan.getAs[Double]("claims") === 5.0)
    assert(jan.isNullAt(jan.fieldIndex("prev_claims")))
    assert(jan.getAs[Int]("month_seq") === 1)
    val feb = out(1)
    assert(feb.getAs[Double]("prev_claims") === 5.0)
    assert(feb.getAs[Double]("delta") === 2.0)
    assert(feb.getAs[Double]("running_claims") === 12.0)
  }

  test("rankInGroup: rank vs dense_rank inside each nation") {
    val s = Seq((1L, "a", 7, 100.0), (2L, "b", 7, 100.0), (3L, "c", 7, 50.0), (4L, "d", 8, 10.0))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    val out = Windows.rankInGroup(s).collect()
      .map(r => (r.getLong(0), r.getAs[Int]("balance_rank"), r.getAs[Int]("balance_dense_rank")))
    // ties broken by suppkey in ordering, but rank() sees distinct sort keys
    assert(out.toSeq === Seq((1L, 1, 1), (2L, 2, 2), (3L, 3, 3), (4L, 1, 1)))
  }

  test("concurrencyProfile: sweep-line running sum, ends before starts at equal t") {
    val ev = Seq(
      (1L, Timestamp.valueOf("2024-01-01 00:00:00"), 10.0), // [0, 10)
      (2L, Timestamp.valueOf("2024-01-01 00:00:05"), 10.0), // [5, 15)
      (3L, Timestamp.valueOf("2024-01-01 00:00:10"), 10.0)) // [10, 20)
      .toDF("event_id", "ts", "value")
    val out = Windows.concurrencyProfile(ev).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    // 1 ends at t=10 BEFORE 3 starts: concurrency never reaches 3
    assert(out.toSeq === Seq(
      (1L, 1L, 1L), (2L, 1L, 2L), (1L, -1L, 1L),
      (3L, 1L, 2L), (2L, -1L, 1L), (3L, -1L, 0L)))
  }

  test("scd2: same-value runs extend, NULL is a legal run value, last run is current") {
    val ev = Seq(
      (1L, 1L, Some("a"), Timestamp.valueOf("2024-01-01 10:00:00")),
      (2L, 1L, Some("a"), Timestamp.valueOf("2024-01-01 11:00:00")), // same run
      (3L, 1L, None, Timestamp.valueOf("2024-01-01 12:00:00")),      // null run opens
      (4L, 1L, None, Timestamp.valueOf("2024-01-01 13:00:00")),      // null run extends
      (5L, 1L, Some("b"), Timestamp.valueOf("2024-01-01 14:00:00")),
      (6L, 2L, Some("x"), Timestamp.valueOf("2024-01-01 10:00:00")))
      .toDF("event_id", "user_id", "event_type", "ts")
    val out = Windows.scd2(ev, "user_id", "event_type", "event_id").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)),
        Option(r.get(3)).isEmpty, r.getBoolean(4)))
    assert(out.toSeq === Seq(
      (1L, Some("a"), false, false),
      (1L, None, false, false),
      (1L, Some("b"), true, true),
      (2L, Some("x"), true, true)))
    // interval chain: each valid_to equals the next valid_from
    val u1 = Windows.scd2(ev, "user_id", "event_type", "event_id").collect()
      .filter(_.getLong(0) == 1L)
    assert(u1(0).getLong(3) === u1(1).getLong(2))
    assert(u1(1).getLong(3) === u1(2).getLong(2))
  }

  test("scd2Merge == from-scratch: continuations merge, changes close, new keys append") {
    val old = Seq(
      (1L, 1L, Some("a"), Timestamp.valueOf("2024-01-01 10:00:00")),
      (2L, 1L, Some("b"), Timestamp.valueOf("2024-01-01 11:00:00")),
      (3L, 2L, Some("x"), Timestamp.valueOf("2024-01-01 10:00:00")),
      (4L, 4L, None, Timestamp.valueOf("2024-01-01 10:00:00")))
      .toDF("event_id", "user_id", "event_type", "ts")
    val batch = Seq(
      (5L, 1L, Some("b"), Timestamp.valueOf("2024-01-02 10:00:00")), // continues run
      (6L, 1L, Some("c"), Timestamp.valueOf("2024-01-02 11:00:00")), // change
      (7L, 3L, Some("z"), Timestamp.valueOf("2024-01-02 10:00:00")), // new key
      (8L, 4L, None, Timestamp.valueOf("2024-01-02 10:00:00")))      // null continues null
      .toDF("event_id", "user_id", "event_type", "ts")
    // user 2 is absent from the batch: its current row must stay current
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getLong(0), Option(r.getString(1)), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getBoolean(4))).toSeq
    val merged = canon(Windows.scd2Merge(
      Windows.scd2(old, "user_id", "event_type", "event_id"),
      batch, "user_id", "event_type", "event_id"))
    val scratch = canon(Windows.scd2(old.unionByName(batch),
      "user_id", "event_type", "event_id"))
    assert(merged === scratch)
    // the continuation did NOT open a spurious row: user 1 has runs a, b, c
    assert(merged.count(_._2.contains("b")) === 1)
    assert(merged.filter(_._1 == 2L).map(_._5) === Seq(true))
  }

  test("sessionizeBatch: gap rule splits sessions; equal-gap boundary stays inside") {
    val ev = Seq(
      (1L, 1L, Timestamp.valueOf("2024-01-01 10:00:00")),
      (2L, 1L, Timestamp.valueOf("2024-01-01 10:10:00")), // 10 min: same session
      (3L, 1L, Timestamp.valueOf("2024-01-01 11:10:00")), // 60 min: new session
      (4L, 2L, Timestamp.valueOf("2024-01-01 10:00:00")), // other user isolated
      (5L, 2L, Timestamp.valueOf("2024-01-01 10:30:00"))) // EXACTLY the gap: same
      .toDF("event_id", "user_id", "ts")
    val out = Windows.sessionizeBatch(ev, gapUs = 1800000000L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4), r.getLong(5)))
    assert(out.toSeq === Seq(
      (1L, 1L, 600000000L, 2L),   // user 1 session 1: events 1+2, 10 min span
      (1L, 2L, 0L, 1L),           // user 1 session 2: event 3 alone
      (2L, 1L, 1800000000L, 2L))) // user 2: session_window MERGES touching
    //   sessions, so the exact-gap event extends (SessionsSpec proves parity)
  }

  test("concurrencyProfile clamps zero durations to 1 microsecond") {
    val ev = Seq((1L, Timestamp.valueOf("2024-01-01 00:00:00"), 0.0))
      .toDF("event_id", "ts", "value")
    val out = Windows.concurrencyProfile(ev).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    val base = out(0)._1
    assert(out.toSeq === Seq((base, 1L, 1L), (base + 1L, -1L, 0L)))
  }

  test("approxDataDictionary: nulls exact, distinct within rsd") {
    val df = Seq(Some(1), Some(2), Some(2), None).toDF("x")
    val r = Profile.approxDataDictionary(df).head()
    assert(r.getString(0) === "x")
    assert(r.getLong(1) === 1L)
    assert(math.abs(r.getLong(2) - 2L) <= 1)
  }

  test("movingStats: ROWS frame averages and time-RANGE frame sums per user") {
    import org.apache.spark.sql.functions._
    // user 1: events at t=0s, 60s, 400s, 700s with values 10, 20, 40, 2
    val minute = 60L * 1000000
    val ev = Seq(
      (1L, 1L, 0L, 10.0), (2L, 1L, minute, 20.0),
      (3L, 1L, 400L * 1000000, 40.0), (4L, 1L, 700L * 1000000, 2.0),
      (5L, 2L, 0L, 5.0))
      .toDF("event_id", "user_id", "us", "value")
      .withColumn("ts", timestamp_micros(col("us")))
    val out = Windows.movingStats(ev).collect()
      .map(r => r.getLong(0) -> (r.getDouble(3), r.getDouble(4), r.getLong(5))).toMap
    assert(out(1L) === ((10.0, 10.0, 1L)))
    assert(out(2L) === ((15.0, 30.0, 2L)))           // both frames: events 1+2
    assert(out(3L) === ((70.0 / 3, 70.0, 3L)))       // rows: 1,2,3; range [−200s,400s]: all 3
    assert(out(4L) === ((62.0 / 3, 42.0, 2L)))       // rows: 2,3,4; range: 3,4
    assert(out(5L) === ((5.0, 5.0, 1L)))             // user 2 isolated
  }

  test("approxDataDictionary tracks the exact dictionary within 3*rsd on real tables") {
    // quantitative bound for the one query the oracle can't hash-check
    // (HLL sketches differ across engines): every approximate distinct
    // count must sit within 3 relative standard deviations of exact.
    for (table <- Seq("orders", "lineitem", "customer")) {
      val df = graft.sources.Tables.load(spark, "/root/testdata/sf0.001", table)
      val exact = Profile.dataDictionary(df).collect()
        .map(r => r.getString(0) -> r.getLong(2)).toMap
      val approx = Profile.approxDataDictionary(df, rsd = 0.05).collect()
        .map(r => r.getString(0) -> r.getLong(2)).toMap
      assert(approx.keySet === exact.keySet)
      approx.foreach { case (c, a) =>
        val e = exact(c)
        val tol = math.max(1L, math.ceil(3 * 0.05 * e).toLong)
        assert(math.abs(a - e) <= tol,
          s"$table.$c: approx $a vs exact $e exceeds 3*rsd tolerance $tol")
      }
    }
  }

  test("forwardFill: gaps take the last prior value, leading nulls stay, keys isolated") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf(_: String)
    val df = Seq(
      // u1: leading null, then a value, then a gap, then a tie on ts
      (1L, 1L, ts("2024-01-01 10:00:00"), None),
      (2L, 1L, ts("2024-01-01 11:00:00"), Some(5.0)),
      (3L, 1L, ts("2024-01-01 12:00:00"), None),
      (4L, 1L, ts("2024-01-01 12:00:00"), Some(7.0)), // same ts: event_id breaks tie
      (5L, 1L, ts("2024-01-01 13:00:00"), None),
      // u2: fills never cross keys
      (6L, 2L, ts("2024-01-01 09:00:00"), None))
      .toDF("event_id", "user_id", "ts", "value")
    val out = Windows.forwardFill(df, "user_id", "ts", "value", "event_id")
      .collect().map(r => r.getLong(0) ->
        Option(r.get(4)).map(_.asInstanceOf[Double])).toMap
    assert(out(1L) === None, "leading null: no value invented")
    assert(out(2L) === Some(5.0))
    assert(out(3L) === Some(5.0), "gap takes the last prior value")
    assert(out(4L) === Some(7.0), "own value wins at its row")
    assert(out(5L) === Some(7.0), "tie resolved by event_id before filling on")
    assert(out(6L) === None, "fills must not cross keys")
  }

  test("transitions: per-user ordered pairs; first events feed nothing; shares sum to 1") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), "view"),
      (2L, 1L, ts("2024-01-01 10:01:00"), "click"),
      (3L, 1L, ts("2024-01-01 10:02:00"), "buy"),
      (4L, 2L, ts("2024-01-01 11:00:00"), "view"),
      (5L, 2L, ts("2024-01-01 11:05:00"), "click"),
      (6L, 2L, ts("2024-01-01 11:06:00"), "view"),
      (7L, 3L, ts("2024-01-01 12:00:00"), "view")) // lone event: no pair
      .toDF("event_id", "user_id", "ts", "event_type")
    val out = Windows.transitions(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(out === Map(
      ("view", "click") -> (2L, 1.0),
      ("click", "buy") -> (1L, 0.5),
      ("click", "view") -> (1L, 0.5)))
  }

  test("timeWeighted: holding-interval mean, not the sample mean") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // u1 holds 10.0 for 9 minutes then 100.0 for 1 minute: twa = 19.0
    // (the plain mean of observed samples would be 40.0)
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), 10.0),
      (2L, 1L, ts("2024-01-01 10:09:00"), 100.0),
      (3L, 1L, ts("2024-01-01 10:10:00"), 7.0), // final: no interval
      (4L, 2L, ts("2024-01-01 10:00:00"), 5.0)) // lone event: absent
      .toDF("event_id", "user_id", "ts", "value")
    val out = Windows.timeWeighted(ev).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out === Map(1L -> 19.0))
  }
}
