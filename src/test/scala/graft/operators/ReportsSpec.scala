package graft.operators

import org.apache.spark.sql.functions.{lit, pmod, sum}

import graft.SparkSuite

class ReportsSpec extends SparkSuite {
  import spark.implicits._

  // fact: (partkey, suppkey, qty, price, discount, flag, status)
  private val li = Seq(
    (1L, 10L, 2.0, 100.10, 0.10, "A", "F"),
    (1L, 10L, 3.0, 50.20, 0.00, "A", "F"),
    (2L, 11L, 1.0, 10.01, 0.05, "R", "O"))
    .toDF("l_partkey", "l_suppkey", "l_quantity", "l_extendedprice",
      "l_discount", "l_returnflag", "l_linestatus")
  private val part = Seq((1L, "widget", "B1"), (2L, "gadget", "B2"), (3L, "unused", "B1"))
    .toDF("p_partkey", "p_name", "p_brand")
  private val supplier = Seq((10L, "s10", 100), (11L, "s11", 101))
    .toDF("s_suppkey", "s_name", "s_nationkey")
  private val nation = Seq((100, "GERMANY", 1), (101, "FRANCE", 1))
    .toDF("n_nationkey", "n_name", "n_regionkey")

  test("dsum is an exact decimal sum rendered as double") {
    val out = Seq(0.1, 0.2, 0.3).toDF("x")
      .agg(Reports.dsum(org.apache.spark.sql.functions.col("x")).as("s"))
      .head().getDouble(0)
    assert(out === 0.6) // naive double sum gives 0.6000000000000001
  }

  test("drugReport aggregates per part and joins dims") {
    val out = Reports.drugReport(li, part).collect()
    assert(out.length === 2)
    val r1 = out.head
    assert(r1.getLong(0) === 1L)
    assert(r1.getDouble(1) === 5.0)      // total_claims
    assert(r1.getDouble(2) === 150.30)   // total_cost, exact
    assert(r1.getString(3) === "widget")
  }

  test("prescriberReport chains supplier and nation joins") {
    val out = Reports.prescriberReport(li, supplier, nation).collect()
    assert(out.length === 2)
    assert(out.head.getAs[Long]("num_prescriptions") === 2L)
    assert(out.head.getAs[String]("state_name") === "GERMANY")
  }

  test("pricingSummary computes exact discounted revenue") {
    val out = Reports.pricingSummary(li).collect()
    val af = out.find(r => r.getString(0) == "A").get
    assert(af.getAs[Double]("sum_qty") === 5.0)
    assert(af.getAs[Double]("sum_base_price") === 150.30)
    // 100.10*0.9 + 50.20*1.0 = 90.09 + 50.20 = 140.29 exactly
    assert(af.getAs[Double]("sum_disc_price") === 140.29)
    assert(af.getAs[Double]("avg_qty") === 2.5)
  }

  test("brandReport reproduces the reference's cost-as-prescriptions quirk") {
    val out = Reports.brandReport(li, part).collect()
    assert(out.head.getString(0) === "B1")
    assert(out.head.getDouble(1) === 150.30)
  }

  test("kpis single row") {
    val r = Reports.kpis(li).head()
    assert(r.getAs[Long]("n_drugs") === 2L)
    assert(r.getAs[Long]("n_prescribers") === 2L)
    assert(r.getAs[Long]("n_rows") === 3L)
    assert(r.getAs[Double]("total_claims") === 6.0)
  }

  test("countPerKey orders by count desc with key tiebreak") {
    val out = Reports.countPerKey(li, "l_suppkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === Seq((10L, 2L), (11L, 1L)))
  }

  test("pivotSum: per-value decimal sums, empty cells null, one aggregate in the plan") {
    import spark.implicits._
    val df = Seq(("a", "x", 1.5), ("a", "x", 2.5), ("b", "y", 3.0)).toDF("k", "p", "m")
    val out = Reports.pivotSum(df, "k", "p", Seq("x", "y"), "m", prefix = "m_")
    val rows = out.collect()
    assert(out.columns.toSeq === Seq("k", "m_x", "m_y"))
    assert(rows(0).getString(0) === "a" && rows(0).getDouble(1) === 4.0 && rows(0).isNullAt(2))
    assert(rows(1).getString(0) === "b" && rows(1).isNullAt(1) && rows(1).getDouble(2) === 3.0)
    // one hash aggregate (partial + final = ONE exchange), not the
    // .pivot() API's two-layer plan
    val nAggExchanges = "Exchange hashpartitioning".r
      .findAllIn(out.queryExecution.executedPlan.toString).length
    assert(nAggExchanges <= 2, // agg exchange + oracle-only sort exchange
      s"expected the single-aggregate pivot plan:\n${out.queryExecution.executedPlan}")
  }

  test("collectPerKey is deterministic under input partitioning (sorted inside the agg)") {
    import spark.implicits._
    val rows = (1 to 200).map(i => ((i % 7).toLong, (i * 131 % 997).toLong))
    val a = Reports.collectPerKey(rows.toDF("k", "v"), "k", "v").collect().toSeq
    val b = Reports.collectPerKey(rows.reverse.toDF("k", "v").repartition(13), "k", "v")
      .collect().toSeq
    assert(a === b)
    val first = a.head
    // values_csv is ascending within the group
    val vals = first.getString(1).split(",").map(_.toLong)
    assert(vals.sorted.toSeq === vals.toSeq && vals.length === first.getLong(2))
  }

  test("collectPerKey: n counts collected values, staying equal to the list length under nulls") {
    import spark.implicits._
    val df = Seq((1L, Some(2L)), (1L, Option.empty[Long]), (1L, Some(1L)))
      .toDF("k", "v")
    val r = Reports.collectPerKey(df, "k", "v").head()
    assert(r.getString(1) === "1,2")
    assert(r.getLong(2) === 2L, "null values are not collected, so n must not count them")
  }

  test("cohortRetention counts each user once per day offset from first activity") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf(_: String)
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00")),  // u1 cohort day 1
      (1L, ts("2024-01-01 23:00:00")),  // same day: counted once
      (1L, ts("2024-01-03 01:00:00")),  // offset 2
      (2L, ts("2024-01-01 05:00:00")),  // u2 cohort day 1
      (3L, ts("2024-01-02 00:00:00")))  // u3 cohort day 2
      .toDF("user_id", "ts")
    val out = Reports.cohortRetention(events).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)) -> r.getLong(2)).toMap
    assert(out === Map(
      ("2024-01-01", 0L) -> 2L,   // u1 + u2 on their first day
      ("2024-01-01", 2L) -> 1L,   // u1 returns two days later
      ("2024-01-02", 0L) -> 1L))  // u3's cohort
  }

  test("funnel: strict ts order per step; out-of-order steps don't count") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf(_: String)
    val events = Seq(
      // u1 completes the funnel in order
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 11:00:00")),
      (1L, "purchase", ts("2024-01-01 12:00:00")),
      // u2 clicked BEFORE viewing: click must not count, purchase unreachable
      (2L, "click", ts("2024-01-01 09:00:00")),
      (2L, "view", ts("2024-01-01 10:00:00")),
      (2L, "purchase", ts("2024-01-01 11:00:00")),
      // u3 views only
      (3L, "view", ts("2024-01-01 08:00:00")),
      // u4 never enters the funnel
      (4L, "purchase", ts("2024-01-01 08:00:00")))
      .toDF("user_id", "event_type", "ts")
    val out = Reports.funnel(events, Seq("view", "click", "purchase")).collect()
      .map(r => r.getString(1) -> ((r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]),
        Option(r.get(4)).map(_.asInstanceOf[Double])))).toMap
    assert(out("view") === ((3L, Some(1.0), Some(1.0))))
    assert(out("click") === ((1L, Some(0.333333), Some(0.333333))))
    assert(out("purchase") === ((1L, Some(0.333333), Some(1.0))))
  }

  test("funnel: a later same-type event after the previous step still counts") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf(_: String)
    // u1 clicks before AND after viewing: the later click re-enters
    val events = Seq(
      (1L, "click", ts("2024-01-01 09:00:00")),
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 10:30:00")))
      .toDF("user_id", "event_type", "ts")
    val out = Reports.funnel(events, Seq("view", "click")).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(out === Map("view" -> 1L, "click" -> 1L))
  }

  test("lastTouchAttribution: last prior touch wins; no prior or stale touch is direct") {
    import spark.implicits._
    val ts = java.sql.Timestamp.valueOf(_: String)
    val events = Seq(
      // u1: view then click then purchase -> click (the LAST touch)
      (1L, 1L, "view", ts("2024-01-01 10:00:00")),
      (2L, 1L, "click", ts("2024-01-01 11:00:00")),
      (3L, 1L, "purchase", ts("2024-01-01 12:00:00")),
      // u1's second purchase skips over the first one to the click
      (4L, 1L, "purchase", ts("2024-01-01 13:00:00")),
      // u2: no prior event at all -> direct
      (5L, 2L, "purchase", ts("2024-01-01 09:00:00")),
      // u3: touch outside the lookback -> direct
      (6L, 3L, "view", ts("2024-01-01 00:00:00")),
      (7L, 3L, "purchase", ts("2024-01-10 00:00:00")))
      .toDF("event_id", "user_id", "event_type", "ts")
    val out = Reports.lastTouchAttribution(events,
      lookbackUs = 24L * 3600 * 1000000).collect()
      .map(r => r.getLong(0) -> ((r.getString(3),
        Option(r.get(4)).map(_.asInstanceOf[Long])))).toMap
    assert(out(3L) === (("click", Some(3600L * 1000000))))
    assert(out(4L) === (("click", Some(2L * 3600 * 1000000))))
    assert(out(5L) === (("direct", None)))
    assert(out(7L) === (("direct", None)))
  }

  test("partialAggregate/mergeAggregates: merge == from-scratch, any batching, any order") {
    val rng = new scala.util.Random(7)
    val rows = (1L to 2000L).map(i =>
      (i, s"k${i % 7}", math.round(rng.nextDouble() * 10000) / 100.0))
    val df = rows.toDF("id", "k", "v")
    val direct = Reports.mergeAggregates(
      Seq(Reports.partialAggregate(df, Seq("k"), "v")), Seq("k"))
      .orderBy("k").collect().toSeq
    // 3-way batch split, merged in a different order
    val batches = Seq(0, 1, 2).map(b =>
      Reports.partialAggregate(df.filter(pmod($"id", lit(3)) === b), Seq("k"), "v"))
    val merged = Reports.mergeAggregates(batches.reverse, Seq("k"))
      .orderBy("k").collect().toSeq
    assert(merged === direct)
    // and merge of merges (re-partialed) still agrees on the exact sums
    val m = Reports.mergeAggregates(batches.take(2), Seq("k"))
    val expectSum = df.groupBy($"k")
      .agg(sum($"v".cast(org.apache.spark.sql.types.DecimalType(18, 2)))
        .cast("double").as("s"))
      .orderBy("k").select("s").as[Double].collect().toSeq
    assert(direct.map(_.getDouble(2)) === expectSum)
    assert(m.count() === 7)
  }

  test("kaplanMeier: censored users leave the risk set without dying") {
    def ts(day: Int) = new java.sql.Timestamp(86400000L * day)
    // u1,u2: lifetime 1 (churn); u3: lifetime 2 (churn); u4: lifetime
    // 10 and still active at corpus end (censored, margin 3)
    val ev = Seq((1L, ts(0)), (1L, ts(1)), (2L, ts(0)), (2L, ts(1)),
      (3L, ts(0)), (3L, ts(2)), (4L, ts(0)), (4L, ts(10)))
      .toDF("user_id", "ts")
    val out = Reports.kaplanMeier(ev).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out.keySet === Set(1L, 2L))       // censored time 10 is no event
    assert(out(1L) === ((4L, 2L, 0.5)))
    assert(out(2L) === ((2L, 1L, 0.25)))
    // full saturation: the censored user's lifetime (0, single event
    // at corpus end) is SHORTER than the last churn time, so the
    // remaining risk set dies entirely at t=1 -> survival 0 exactly
    val sat = Seq((1L, ts(0)), (1L, ts(1)), (2L, ts(0)), (2L, ts(1)),
      (9L, ts(10))).toDF("user_id", "ts")
    val s = Reports.kaplanMeier(sat, censorDays = 0).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(s === Map(1L -> 0.0))             // d == n_risk at the last time
  }

  test("abTest: exact hash-arm counts, directional z, degenerate guard") {
    def ts(day: Int) = new java.sql.Timestamp(86400000L * day)
    def arm(u: Long): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(u.toString.getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.substring(0, 8)
      if (java.lang.Long.parseLong(hex, 16) % 2 == 0) "A" else "B"
    }
    val users = (1L to 40L)
    val aUsers = users.filter(arm(_) == "A")
    // every A user converts, no B user does -> z strongly positive
    val ev = users.map(u => (u, ts(1), "view")) ++
      aUsers.map(u => (u, ts(2), "purchase"))
    val r = Reports.abTest(ev.toDF("user_id", "ts", "event_type")).head()
    assert(r.getLong(0) === aUsers.size.toLong)
    assert(r.getLong(1) === aUsers.size.toLong)
    assert(r.getLong(2) === (users.size - aUsers.size).toLong)
    assert(r.getLong(3) === 0L)
    assert(r.getDouble(6) > 3.0)
    // everybody converts -> zero pooled variance -> null z, not NaN
    val all = users.map(u => (u, ts(1), "purchase"))
    assert(Reports.abTest(all.toDF("user_id", "ts", "event_type")).head().isNullAt(6))
  }

  test("seasonalNaiveBacktest: MAE vs the value 7 days earlier, overlap only") {
    def ts(day: Int) = new java.sql.Timestamp(86400000L * day)
    // type "a": day1=100, day2=50, day8=130, day9=80 ->
    // overlap day8 (|130-100|=30) and day9 (|80-50|=30) -> MAE 30
    val ev = Seq(("a", ts(1), 100.0), ("a", ts(2), 50.0),
      ("a", ts(8), 130.0), ("a", ts(9), 80.0),
      ("b", ts(1), 10.0)) // no day+7 partner -> absent from output
      .toDF("event_type", "ts", "value")
    val out = Reports.seasonalNaiveBacktest(ev).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out === Map("a" -> ((2L, 30.0))))
  }

  test("cumulativeUsers: each user counts once, on their first day") {
    def ts(day: Int) = new java.sql.Timestamp(86400000L * day)
    val ev = Seq((1L, ts(1)), (1L, ts(3)), (2L, ts(1)), (3L, ts(3)), (3L, ts(5)))
      .toDF("user_id", "ts")
    val out = Reports.cumulativeUsers(ev).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(("1970-01-02", 2L, 2L), ("1970-01-04", 1L, 3L)))
  }

  test("rollingActiveUsers: window coverage, dedup, and trailing clip") {
    def ts(day: Int) = new java.sql.Timestamp(86400000L * day)
    // u1 active day1; u2 active day1 and day2 (dedup within window)
    val ev = Seq((1L, ts(1)), (2L, ts(1)), (2L, ts(2)))
      .toDF("user_id", "ts")
    val out = Reports.rollingActiveUsers(ev, days = 3).collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    // observed days: jan2 (day1), jan3 (day2); windows past jan3 clipped
    assert(out === Map("1970-01-02" -> 2L, "1970-01-03" -> 2L))
  }

  test("abcAnalysis: cumulative-share classes at exact boundaries") {
    val rev = Seq((1L, 80L), (2L, 15L), (3L, 5L)).toDF("k", "units")
    val out = Reports.abcAnalysis(rev, "k", "units").collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getDouble(3), r.getString(4))))
      .toMap
    assert(out(1L) === ((80L, 0.8, "A")))     // exactly at the A cut
    assert(out(2L) === ((95L, 0.95, "B")))    // exactly at the B cut
    assert(out(3L) === ((100L, 1.0, "C")))
    // equal revenues order by key — deterministic under reshuffling
    val tie = Seq((9L, 10L), (1L, 10L), (5L, 10L)).toDF("k", "units")
    val cum = Reports.abcAnalysis(tie.repartition(3), "k", "units").collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(cum.toSeq === Seq((1L, 10L), (5L, 20L), (9L, 30L)))
  }

  test("rfmSegments: quintiles follow the metric orders, best = n") {
    def ts(day: Int) = new java.sql.Timestamp(86400000L * day)
    // 5 customers, strictly increasing recency/frequency/spend for c1..c5
    val orders = (1 to 5).flatMap { c =>
      (1 to c).map(i => (c.toLong, ts(c * 10), 100.0 * c))
    }.toDF("o_custkey", "o_orderdate", "o_totalprice")
    val out = Reports.rfmSegments(orders).collect()
      .map(r => r.getLong(0) -> r.getString(7)).toMap
    // c5: most recent (day 50), most orders (5), highest spend -> 555
    assert(out(5L) === "555")
    assert(out(1L) === "111")
    assert(out(3L) === "333")
  }

  test("userPaths: first-k path per user, short histories keep their prefix") {
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    val ev = Seq(
      (1L, 10L, ts(1), "view"), (1L, 11L, ts(2), "click"),
      (1L, 12L, ts(3), "purchase"), (1L, 13L, ts(4), "view"), // 4th event ignored
      (2L, 20L, ts(1), "view"), (2L, 21L, ts(2), "click"), (2L, 22L, ts(3), "purchase"),
      (3L, 30L, ts(5), "view"), (3L, 31L, ts(6), "error"))    // short history
      .toDF("user_id", "event_id", "ts", "event_type")
    val out = Reports.userPaths(ev, k = 3).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map("view>click>purchase" -> 2L, "view>error" -> 1L))
    // equal timestamps break on event_id — deterministic
    val tie = Seq((9L, 2L, ts(1), "b"), (9L, 1L, ts(1), "a"))
      .toDF("user_id", "event_id", "ts", "event_type")
    assert(Reports.userPaths(tie, k = 2).collect().head.getString(0) === "a>b")
  }

  test("shippingPriority: segment + both date filters, exact-decimal top-k order") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    val customer = Seq((1, "BUILDING"), (2, "AUTOMOBILE"), (3, "BUILDING"))
      .toDF("c_custkey", "c_mktsegment")
    val orders = Seq(
      (10, 1, ts("1998-05-01"), "1-URGENT"),   // qualifies
      (11, 1, ts("1998-07-01"), "2-HIGH"),     // ordered after cutoff
      (12, 2, ts("1998-05-01"), "3-MEDIUM"),   // wrong segment
      (13, 3, ts("1998-05-02"), "2-HIGH"))     // qualifies
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val lineitem = Seq(
      (10, ts("1998-07-01"), 100.0, 0.1),  // 90.00
      (10, ts("1998-08-01"), 50.0, 0.0),   // 50.00 -> order 10 rev 140
      (10, ts("1998-01-01"), 999.0, 0.0),  // shipped before cutoff: excluded
      (11, ts("1998-08-01"), 10.0, 0.0),
      (12, ts("1998-08-01"), 10.0, 0.0),
      (13, ts("1998-07-03"), 200.0, 0.25)) // order 13 rev 150
      .toDF("l_orderkey", "l_shipdate", "l_extendedprice", "l_discount")
    val out = Reports.shippingPriority(customer, orders, lineitem,
      "BUILDING", "1998-06-01", k = 10).collect()
    assert(out.map(_.getInt(0)).toSeq === Seq(13, 10)) // by revenue desc
    assert(out.map(_.getDouble(1)).toSeq === Seq(150.0, 140.0))
  }

  test("associationRules: hand-computed support/confidence/lift, both directions") {
    // baskets: {A,B,C}, {A,B}, {A,B,B dup}, {C} -> n=4, c(A)=c(B)=3,
    // c(C)=2, c(AB)=3; only AB clears minPairCount=2
    val rows = Seq((1, "A"), (1, "B"), (1, "C"), (2, "A"), (2, "B"),
      (3, "A"), (3, "B"), (3, "B"), (4, "C")).toDF("oid", "item")
    val out = Reports.associationRules(rows, "oid", "item", minPairCount = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(out.keySet === Set(("A", "B"), ("B", "A")))
    assert(out(("A", "B")) === ((3L, 0.75, 1.0, 1.333333)))
    assert(out(("B", "A")) === ((3L, 0.75, 1.0, 1.333333)))
    // asymmetric confidence: A in 3 baskets, C with A only once ->
    // with minPairCount=1, conf(C->A)=1/2 but conf(A->C)=1/3
    val one = Reports.associationRules(rows, "oid", "item", minPairCount = 1)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(4)).toMap
    assert(one(("C", "A")) === 0.5)
    assert(one(("A", "C")) === 0.333333)
  }

  test("localSupplierVolume: region, window, and local-supplier filters all bite") {
    import java.sql.Timestamp
    val customer = Seq((1L, 10L), (2L, 11L), (3L, 20L))
      .toDF("c_custkey", "c_nationkey")
    val supplier = Seq((100L, 10L), (101L, 11L), (102L, 20L))
      .toDF("s_suppkey", "s_nationkey")
    val nation = Seq((10L, "JAPAN", 1L), (11L, "CHINA", 1L), (20L, "PERU", 2L))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val region = Seq((1L, "ASIA"), (2L, "AMERICA")).toDF("r_regionkey", "r_name")
    def d(s: String) = Timestamp.valueOf(s + " 00:00:00")
    val orders = Seq(
      (1000L, 1L, d("1996-06-01")), // in window, JAPAN customer
      (1001L, 2L, d("1995-01-01")), // before window -> excluded
      (1002L, 3L, d("1996-06-01")), // PERU customer -> wrong region
      (1003L, 2L, d("1997-12-31"))  // in window, CHINA customer
    ).toDF("o_orderkey", "o_custkey", "o_orderdate")
    val lineitem = Seq(
      (1000L, 100L, 100.0, 0.1), // JAPAN supplier, local -> 90
      (1000L, 101L, 50.0, 0.0),  // CHINA supplier for JAPAN cust -> not local
      (1003L, 101L, 200.0, 0.5), // CHINA local -> 100
      (1001L, 101L, 999.0, 0.0), // excluded order
      (1002L, 102L, 999.0, 0.0)  // wrong region
    ).toDF("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    val out = Reports.localSupplierVolume(customer, orders, lineitem,
      supplier, nation, region, "ASIA", "1996-01-01", "1998-01-01")
      .collect().map(r => r.getString(0) -> r.getDouble(1))
    assert(out.toSeq === Seq("CHINA" -> 100.0, "JAPAN" -> 90.0))
  }

  test("cohortLtv: cumulative per-user value against the day-0 cohort size") {
    import java.sql.Timestamp
    def ts(d: Int) = Timestamp.valueOf(f"2024-06-0$d 10:00:00")
    // cohort day 1: users 1,2 (sizes fixed at 2 even when only one
    // returns); cohort day 2: user 3
    val df = Seq(
      (1L, ts(1), 10.0), (2L, ts(1), 20.0),   // day 0: 30 total
      (1L, ts(2), 5.0),                       // day 1: only u1 returns
      (3L, ts(2), 7.0)                        // second cohort starts
    ).toDF("user_id", "ts", "value")
    val out = Reports.cohortLtv(df).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1)) ->
        (r.getLong(2), r.getDouble(4), r.getDouble(5))).toMap
    assert(out(("2024-06-01", 0L)) === ((2L, 30.0, 15.0)))
    assert(out(("2024-06-01", 1L)) === ((2L, 35.0, 17.5))) // divisor stays 2
    assert(out(("2024-06-02", 0L)) === ((1L, 7.0, 7.0)))
  }

  test("funnelTiming: hand medians; dropouts and repeat events don't pollute") {
    import java.sql.Timestamp
    def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
    val df = Seq(
      // u1: view@0 -> click@10 (gap 600 s) -> buy@40 (gap 1800 s)
      (1L, "view", ts(0)), (1L, "click", ts(10)), (1L, "purchase", ts(40)),
      // u2: view@0 -> click@30 (gap 1800 s), never buys
      (2L, "view", ts(0)), (2L, "click", ts(30)),
      // u3: click before any view -> never enters the funnel tail
      (3L, "click", ts(5)), (3L, "view", ts(6)),
      // u1's SECOND click must not matter (first qualifying wins)
      (1L, "click", ts(20))
    ).map { case (u, e, t) => (u * 100 + t.getTime / 60000, u, e, t) }
      .toDF("event_id", "user_id", "event_type", "ts")
    val out = Reports.funnelTiming(df, Seq("view", "click", "purchase"))
      .collect().map(r => r.getString(1) -> (r.getLong(2), r.getDouble(3))).toMap
    // view->click gaps: u1 600 s, u2 1800 s, u3 none -> median 1200 s
    assert(out("view -> click") === ((2L, 1200.0)))
    assert(out("click -> purchase") === ((1L, 1800.0)))
  }

  test("positionAttribution: U-shape credits by path length, conservation") {
    import java.sql.Timestamp
    def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    // u1: ad, email, ad, email -> purchase (k=4: 0.4/0.4 ends, 0.1 mids)
    // u2: ad -> purchase (k=1: full credit)
    // u3: ad, email -> purchase (k=2: 0.5 each)
    val df = Seq(
      (1L, 1L, "ad", ts(0)), (2L, 1L, "email", ts(1)),
      (3L, 1L, "ad", ts(2)), (4L, 1L, "email", ts(3)),
      (5L, 1L, "purchase", ts(4)),
      (6L, 2L, "ad", ts(0)), (7L, 2L, "purchase", ts(5)),
      (8L, 3L, "ad", ts(0)), (9L, 3L, "email", ts(1)),
      (10L, 3L, "purchase", ts(2))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = Reports.positionAttribution(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // u1 path [ad,email,ad,email]: ad 0.4+0.1, email 0.1+0.4
    // u2: ad 1.0; u3: ad 0.5, email 0.5
    assert(out("ad") === ((3L, 0.5 + 1.0 + 0.5)))
    assert(out("email") === ((2L, 0.5 + 0.5)))
    // credit conserves: one unit per conversion
    assert(out.values.map(_._2).sum === 3.0)
  }

  test("gainsTable: hand-computed rates, capture, and lift per tile") {
    // 8 rows, scores 8..1; positives at scores 8, 7, 4 -> base rate 3/8
    val df = (1L to 8L).map(i => (i, i, if (Set(8L, 7L, 4L)(i)) 1L else 0L))
      .toDF("id", "s", "y")
    val out = Reports.gainsTable(df, "s", "y", "id", buckets = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    assert(out(1L) === ((2L, 2L, 1.0, 0.666667, 2.666667)))
    assert(out(2L) === ((2L, 0L, 0.0, 0.666667, 0.0)))
    assert(out(3L) === ((2L, 1L, 0.5, 1.0, 1.333333)))
    assert(out(4L) === ((2L, 0L, 0.0, 1.0, 0.0)))
  }

  test("gainsTable and rfmSegments plan no global ntile window over the input") {
    // the tile assignment must ride the prefix-sum skeleton; the only
    // Window allowed is the cumulative sum over the BOUNDED tile table
    val df = (1L to 100L).map(i => (i, i, i % 3))
      .toDF("id", "s", "y")
    val gPlan = Reports.gainsTable(df, "s", "y", "id")
      .queryExecution.executedPlan.toString
    assert(!gPlan.contains("ntile"), s"global ntile leaked into gainsTable:\n$gPlan")
    def ts(day: Int) = new java.sql.Timestamp(86400000L * day)
    val orders = (1 to 20).map(c => (c.toLong, ts(c), 10.0 * c))
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
    val rPlan = Reports.rfmSegments(orders)
      .queryExecution.executedPlan.toString
    assert(!rPlan.contains("ntile"), s"global ntile leaked into rfmSegments:\n$rPlan")
    assert(!rPlan.contains("Window"), s"rfmSegments should be window-free:\n$rPlan")
  }
}
