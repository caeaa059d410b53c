package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.Row

import graft.SparkSuite

/** Rank-correlation / robust-scaling / trend-fit / EWMA laws
  * (Profile.spearmanExact, robustScale, linearFit; Windows.ewmaDyadic). */
class StatsSpec extends SparkSuite {
  import spark.implicits._

  test("spearman is 1 for any monotone map, -1 for anti-monotone") {
    val xs = Seq(1.0, 2.0, 5.0, 9.0, 11.0)
    val up = xs.map(x => ("g", x, x * x * x)).toDF("k", "x", "y")
    val down = xs.map(x => ("g", x, -x * x * x)).toDF("k", "x", "y")
    assert(Profile.spearmanExact(up, "k", "x", "y").head().getDouble(1) === 1.0)
    assert(Profile.spearmanExact(down, "k", "x", "y").head().getDouble(1) === -1.0)
  }

  test("spearman averages tied ranks (hand-computed case)") {
    // x ranks doubled: (2,5,5,8); y ranks doubled: (4,7,7,2)
    // pearson over those = -6/18 = -1/3
    val df = Seq(("g", 1.0, 10.0), ("g", 2.0, 20.0),
      ("g", 2.0, 20.0), ("g", 3.0, 5.0)).toDF("k", "x", "y")
    assert(Profile.spearmanExact(df, "k", "x", "y").head().getDouble(1) === -0.333333)
  }

  test("spearman yields null for constant columns and singletons") {
    val const = Seq(("g", 1.0, 1.0), ("g", 1.0, 2.0)).toDF("k", "x", "y")
    assert(Profile.spearmanExact(const, "k", "x", "y").head().isNullAt(1))
    val single = Seq(("g", 1.0, 1.0)).toDF("k", "x", "y")
    assert(Profile.spearmanExact(single, "k", "x", "y").head().isNullAt(1))
  }

  test("spearman excludes incomplete pairs (standard listwise deletion)") {
    val xs = Seq(1.0, 2.0, 5.0, 9.0)
    val clean = xs.map(x => ("g", Some(x), Some(x * x))).toDF("k", "x", "y")
    val noisy = (xs.map(x => ("g", Some(x), Some(x * x))) ++
      Seq(("g", None: Option[Double], Some(99.0)),
        ("g", Some(3.0), None: Option[Double]))).toDF("k", "x", "y")
    assert(Profile.spearmanExact(noisy, "k", "x", "y").collect().toSeq ===
      Profile.spearmanExact(clean, "k", "x", "y").collect().toSeq)
  }

  test("robustScale centers at the median and scales by IQR") {
    val df = (1 to 9).map(i => ("g", i, i.toDouble)).toDF("k", "id", "v")
    val z = Profile.robustScale(df, "k", "v").collect()
      .map(r => r.getInt(1) -> r.getAs[Double]("robust_z")).toMap
    assert(z(5) === 0.0)
    assert(z(9) === 1.0)   // (9-5)/(7-3)
    assert(z(1) === -1.0)
    // zero-IQR group -> null, deterministic guard
    val flat = Seq(("g", 1, 5.0), ("g", 2, 5.0), ("g", 3, 5.0)).toDF("k", "id", "v")
    assert(Profile.robustScale(flat, "k", "v").collect().forall(_.isNullAt(3)))
  }

  test("linearFit recovers an exact line per group; singleton yields null") {
    val pts = (0 to 10).map(x => ("a", x, 2.0 * x + 3.0)) :+ (("b", 7, 1.0))
    val fit = Profile.linearFit(pts.toDF("k", "x", "y"), "k", "x", "y")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(fit("a").getDouble(2) === 2.0)
    assert(fit("a").getDouble(3) === 3.0)
    assert(fit("b").isNullAt(2) && fit("b").isNullAt(3))
  }

  test("linearFit is invariant to row order / partitioning") {
    val pts = (0 to 50).map(x => ("a", x, 0.5 * x - 4.0 + (x % 3)))
    val df = pts.toDF("k", "x", "y")
    val a = Profile.linearFit(df, "k", "x", "y").collect().toSeq
    val b = Profile.linearFit(df.repartition(7), "k", "x", "y").collect().toSeq
    assert(a === b)
  }

  private def ev(rows: (String, Long, Long, Double)*) =
    rows.map { case (k, id, sec, v) => (k, id, new Timestamp(sec * 1000L), v) }
      .toDF("event_type", "event_id", "ts", "value")

  test("ewmaDyadic: first row is the value itself; constants stay fixed") {
    val df = ev(("a", 1, 10, 4.0), ("a", 2, 20, 4.0), ("a", 3, 30, 4.0),
      ("b", 9, 10, 7.5))
    val out = Windows.ewmaDyadic(df).collect()
      .map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(out(1) === 4.0 && out(2) === 4.0 && out(3) === 4.0)
    assert(out(9) === 7.5)
  }

  test("ewmaDyadic halves the weight per lag and renormalizes short history") {
    // second row: (2*x2 + x1) / 3
    val df = ev(("a", 1, 10, 1.0), ("a", 2, 20, 10.0))
    val out = Windows.ewmaDyadic(df).collect()
      .map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(out(1) === 1.0)
    assert(out(2) === 7.0)  // (2*10 + 1)/3
  }

  test("lagCorrelation finds the shift that aligns two series") {
    // A: counts 1,2,3 on days 1-3; B: counts 3,2,1 on days 3-5 —
    // at lag 2 the series anti-align exactly
    def burst(tpe: String, day: Int, n: Int) = (1 to n).map { i =>
      (tpe, (day.toLong * 100 + i),
        new Timestamp(86400000L * day + i * 1000L), 0.0)
    }
    val rows = burst("view", 1, 1) ++ burst("view", 2, 2) ++ burst("view", 3, 3) ++
      burst("purchase", 3, 3) ++ burst("purchase", 4, 2) ++ burst("purchase", 5, 1)
    val df = rows.toDF("event_type", "event_id", "ts", "value")
    val out = Windows.lagCorrelation(df, "view", "purchase", maxLag = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) Double.NaN else r.getDouble(2)))).toMap
    assert(out(2L) === ((3L, -1.0)))
    assert(out(1L) === ((2L, -1.0)))   // two non-constant points: +-1
    assert(out(3L) === ((2L, -1.0)))
    assert(out(0L)._1 === 1L && out(0L)._2.isNaN)  // single aligned day -> null
  }

  test("interArrival: metronomic keys null out CV, bursty keys exceed it") {
    // regular: gaps all 5s -> zero variance -> null CV
    // bursty: gaps 1s, 1s, 10s -> cv = 1.299038
    val rows =
      (0 to 4).map(i => ("reg", 100L + i, 5L * i, 0.0)) ++
        Seq(("burst", 200L, 0L, 0.0), ("burst", 201L, 1L, 0.0),
          ("burst", 202L, 2L, 0.0), ("burst", 203L, 12L, 0.0))
    val df = rows.map { case (k, id, sec, v) =>
      (k, id, new Timestamp(sec * 1000L), v)
    }.toDF("user_id", "event_id", "ts", "value")
    val out = Windows.interArrival(df).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2),
          if (r.isNullAt(3)) Double.NaN else r.getDouble(3)))).toMap
    assert(out("reg")._1 === 4L && out("reg")._2 === 5.0)
    assert(out("reg")._3.isNaN)
    assert(out("burst")._1 === 3L && out("burst")._2 === 4.0)
    assert(out("burst")._3 === 1.299038)
  }

  test("rollingMedian interpolates even frames and ignores spikes") {
    val df = ev(("a", 1, 10, 10.0), ("a", 2, 20, 90.0), ("a", 3, 30, 20.0),
      ("a", 4, 40, 1000.0), ("a", 5, 50, 30.0), ("a", 6, 60, 25.0))
    val out = Windows.rollingMedian(df, k = 3).collect()
      .map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(out(1) === 10.0)
    assert(out(2) === 50.0)   // (10+90)/2 — interpolated even frame
    assert(out(3) === 20.0)
    assert(out(5) === 30.0)   // frame (20, 1000, 30): the spike is ignored
    assert(out(6) === 30.0)   // frame (1000, 30, 25) -> 30
  }

  test("ewmaDyadic renormalizes over null observations instead of phantom zeros") {
    // constant 4.0 with a null in the middle: the null must drop out
    // of both numerator and denominator, keeping the average at 4.0
    val rows = Seq(("a", 1L, new Timestamp(10000L), Some(4.0)),
      ("a", 2L, new Timestamp(20000L), None),
      ("a", 3L, new Timestamp(30000L), Some(4.0)))
    val df = rows.toDF("event_type", "event_id", "ts", "value")
    val out = Windows.ewmaDyadic(df).collect()
      .map(r => r.getLong(1) ->
        (if (r.isNullAt(2)) Double.NaN else r.getDouble(2))).toMap
    assert(out(1) === 4.0)
    assert(out(2) === 4.0)  // only the lag-1 observation contributes
    assert(out(3) === 4.0)
  }

  test("ewmaDyadic forgets beyond k lags entirely") {
    // 17 points: the first value is outside the k=16 window of the last row
    val rows = (1 to 17).map(i => ("a", i.toLong, i * 10L,
      if (i == 1) 1000000.0 else 2.0))
    val out = Windows.ewmaDyadic(ev(rows: _*)).collect()
      .map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(out(17) === 2.0)  // the spike fell off the window
  }

  test("exitRates and newVsReturning: hand session ends and first days") {
    import java.sql.Timestamp
    def ts(d: Int, min: Int) = Timestamp.valueOf(f"2024-04-0$d 10:$min%02d:00")
    // u1 day1: view,click | (31-min gap) view -> two sessions ending
    // in click and view; u2 day1: view; u2 day2: click
    val df = Seq(
      (1L, 1L, "view", ts(1, 0)), (2L, 1L, "click", ts(1, 5)),
      (3L, 1L, "view", ts(1, 37)),
      (4L, 2L, "view", ts(1, 0)), (5L, 2L, "click", ts(2, 0))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val er = Windows.exitRates(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // exits: u1s1 click, u1s2 view, u2s1 view, u2s2 click
    assert(er("view") === ((3L, 2L, 0.666667)))
    assert(er("click") === ((2L, 2L, 1.0)))
    val nr = Windows.newVsReturning(df).collect()
      .map(r => r.getDate(0).toString -> (r.getLong(1), r.getLong(2))).toMap
    assert(nr("2024-04-01") === ((2L, 0L))) // both users new on day 1
    assert(nr("2024-04-02") === ((0L, 1L))) // u2 returns
  }

  test("cusum: level shift accumulates and alarms; steady series stays at 0") {
    import java.sql.Timestamp
    // "s": 10 days at 10/day then 10 days at 13/day -> mu = 11.5, k = 1:
    // pre-shift z = -2.5 (C pinned at 0), post-shift z = +0.5 -> C = 0.5j
    // "flat": constant 5/day -> z = -k forever, C = 0, no alarms
    val rows = for {
      d <- 0 until 20
      (typ, n) <- Seq(("s", if (d < 10) 10 else 13), ("flat", 5))
      _ <- 0 until n
    } yield (typ, Timestamp.valueOf(f"2024-03-${d + 1}%02d 12:00:00"))
    val out = Windows.cusum(rows.toDF("event_type", "ts"),
        slack = 1.0, threshold = 3.0).collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        (r.getDouble(3), r.getInt(4))).toMap
    assert(out(("s", "2024-03-10")) === ((0.0, 0)))  // decline keeps C at 0
    assert(out(("s", "2024-03-11")) === ((0.5, 0)))  // shift starts climbing
    assert(out(("s", "2024-03-20")) === ((5.0, 1)))  // C = 0.5 * 10
    val alarms = out.collect { case ((t, d), (_, 1)) if t == "s" => d }.toSeq.sorted
    assert(alarms === Seq("2024-03-17", "2024-03-18", "2024-03-19", "2024-03-20"))
    assert(out.forall { case ((t, _), (c, a)) => t != "flat" || (c == 0.0 && a == 0) })
  }

  test("monitors densify the day spine: silent days surface as cnt=0") {
    import java.sql.Timestamp
    // type g: 10/day on days 1-3 and 6-8; days 4-5 have NO events —
    // without the dense spine the outage is simply absent from the
    // chart and mu is biased to the active days
    val rows = for {
      d <- Seq(0, 1, 2, 5, 6, 7)
      _ <- 0 until 10
    } yield ("g", Timestamp.valueOf(f"2024-03-${d + 1}%02d 12:00:00"))
    val out = Windows.cusum(rows.toDF("event_type", "ts"), slack = 1.0)
      .collect().map(r => r.getDate(1).toString -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out.size === 8)                       // 8 calendar days, not 6
    // mu = 60/8 = 7.5, k = 1: active z = +1.5, outage z = -8.5 (C pins at 0)
    assert(out("2024-03-04") === ((0L, 0.0)))
    assert(out("2024-03-05") === ((0L, 0.0)))
    assert(out("2024-03-03") === ((10L, 4.5)))
    assert(out("2024-03-08") === ((10L, 4.5)))   // recovery climbs from the pinned 0
    // mannKendall sees the quiet spell as DOWNWARD evidence: series
    // [3,2,0,0,1] over the dense 5-day spine -> S = -5, one 0-0 tie
    val mk = for {
      (d, n) <- Seq((0, 3), (1, 2), (4, 1)); _ <- 0 until n
    } yield ("m", Timestamp.valueOf(f"2024-04-${d + 1}%02d 12:00:00"))
    val m = Windows.mannKendall(mk.toDF("event_type", "ts")).head()
    assert(m.getLong(1) === 5L)                  // dense day count
    assert(m.getLong(2) === -5L && m.getLong(3) === 1L)
  }

  test("mannKendall: monotone series hit +-S_max, flat scores z = 0") {
    import java.sql.Timestamp
    // "up": 1,2,3,4 events on days 1..4 -> every pair ascending, S = 6
    // "down": 4,3,2,1 -> S = -6; "flat": 2,2,2,2 -> S = 0, ties = 6
    val rows = for {
      d <- 0 until 4
      (typ, n) <- Seq(("up", d + 1), ("down", 4 - d), ("flat", 2))
      _ <- 0 until n
    } yield (typ, Timestamp.valueOf(f"2024-02-0${d + 1} 08:00:00"))
    val out = Windows.mannKendall(rows.toDF("event_type", "ts")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toMap
    val sigma = math.sqrt(4.0 * 3.0 * 13.0 / 18.0)
    assert(out("up")._1 === 4L)
    assert(out("up")._2 === 6L && out("up")._3 === 0L)
    assert(out("up")._4 === BigDecimal(5.0 / sigma)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(out("down")._2 === -6L)
    assert(out("down")._4 === -out("up")._4)
    assert(out("flat")._2 === 0L && out("flat")._3 === 6L)
    assert(out("flat")._4 === 0.0)
  }

  test("activityStreaks: islands split exactly at the missing day") {
    import java.sql.Timestamp
    def ts(day: Int) = Timestamp.valueOf(f"2024-05-$day%02d 09:00:00")
    // a: days 1-3 then 5-6 (gap at 4); b: one day; duplicate events
    // on a day must not split or lengthen a streak
    val df = Seq(("a", ts(1)), ("a", ts(2)), ("a", ts(2)), ("a", ts(3)),
      ("a", ts(5)), ("a", ts(6)), ("b", ts(9))).toDF("event_type", "ts")
    val out = Windows.activityStreaks(df).collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getDate(2).toString, r.getLong(3)))
    assert(out.toSeq === Seq(
      ("a", "2024-05-01", "2024-05-03", 3L),
      ("a", "2024-05-05", "2024-05-06", 2L),
      ("b", "2024-05-09", "2024-05-09", 1L)))
  }

  test("seasonalAnomalies: planted spike flags; metronomic series has null scores") {
    import java.sql.Timestamp
    // 4 weeks of daily events: type a exactly 2/day (zero MAD -> null
    // scores); type b alternates 2/3 per day with a 40-event spike
    val rows = for {
      d <- 0 until 28
      typ <- Seq("a", "b")
      n = if (typ == "a") 2 else if (d == 15) 40 else 2 + (d % 2)
      _ <- 0 until n
    } yield (typ, Timestamp.valueOf(f"2024-03-${d + 1}%02d 12:00:00"))
    val out = Windows.seasonalAnomalies(rows.toDF("event_type", "ts")).collect()
    val a = out.filter(_.getString(0) == "a")
    assert(a.length === 28)
    assert(a.forall(r => r.isNullAt(4) && r.getInt(5) === 0))
    val b = out.filter(_.getString(0) == "b")
      .map(r => r.getDate(1).toString -> r).toMap
    assert(b("2024-03-16").getInt(5) === 1) // the planted spike
    assert(b("2024-03-16").getDouble(4) > 3.0)
    // days outside the spike's weekday column stay clean (their
    // baseline never saw the spike)
    val spikeDow = java.time.LocalDate.of(2024, 3, 16).getDayOfWeek
    val clean = b.filter { case (day, _) =>
      java.time.LocalDate.parse(day).getDayOfWeek != spikeDow }
    assert(clean.nonEmpty && clean.values.forall(_.getInt(5) === 0))
  }
}
