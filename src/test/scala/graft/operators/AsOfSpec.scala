package graft.operators

import graft.SparkSuite

class AsOfSpec extends SparkSuite {
  import spark.implicits._

  test("asofJoin picks the latest right row at or before each left ts") {
    val left = Seq((1L, 5L, "e1"), (1L, 15L, "e2"), (1L, 25L, "e3"), (2L, 10L, "e4"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, 10L, "r10"), (1L, 20L, "r20"), (2L, 10L, "s10"))
      .toDF("k", "ts", "p")
    val out = AsOf.asofJoin(left, right, "k", "ts", Seq("p"))
      .orderBy("k", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), Option(r.getString(3))))
    assert(out.toSeq === Seq(
      (1L, 5L, "e1", None),          // before any right row
      (1L, 15L, "e2", Some("r10")),
      (1L, 25L, "e3", Some("r20")),
      (2L, 10L, "e4", Some("s10")))) // tie is inclusive
  }

  test("asofJoin: a matched row with NULL payload wins (no stale carry-forward)") {
    val left = Seq((1L, 15L, "e")).toDF("k", "ts", "tag")
    val right = Seq((1L, 5L, Some("old")), (1L, 10L, Option.empty[String]))
      .toDF("k", "ts", "p")
    val out = AsOf.asofJoin(left, right, "k", "ts", Seq("p")).collect()
    assert(out.length === 1 && out.head.isNullAt(3),
      "the ts=10 row IS the as-of match; its null payload must not be " +
        "replaced by the older non-null one")
  }

  test("asofJoin: multiple payloads always come from the SAME matched row") {
    val left = Seq((1L, 20L, "e")).toDF("k", "ts", "tag")
    val right = Seq((1L, 5L, Some("a1"), Option.empty[String]),
      (1L, 10L, Option.empty[String], Some("b2")))
      .toDF("k", "ts", "pa", "pb")
    val r = AsOf.asofJoin(left, right, "k", "ts", Seq("pa", "pb")).head()
    // match is the ts=10 row: pa null, pb "b2" — never (a1, b2) stitched
    assert(r.isNullAt(3) && r.getString(4) === "b2")
  }

  test("asofJoin rejects payload names that collide with left columns") {
    val left = Seq((1L, 1L, "x")).toDF("k", "ts", "p")
    val right = Seq((1L, 1L, "y")).toDF("k", "ts", "p")
    intercept[IllegalArgumentException](AsOf.asofJoin(left, right, "k", "ts", Seq("p")))
  }

  test("asofJoin rejects columns using its reserved internal names") {
    val right = Seq((1L, 1L, "y")).toDF("k", "ts", "pay")
    // a left column named __side would silently collide inside the union
    val badLeft = Seq((1L, 1L, "x")).toDF("k", "ts", "__side")
    intercept[IllegalArgumentException](AsOf.asofJoin(badLeft, right, "k", "ts", Seq("pay")))
    // ... as would a payload named __m inside the window projection
    val left = Seq((1L, 1L, "x")).toDF("k", "ts", "tag")
    val badRight = Seq((1L, 1L, "y")).toDF("k", "ts", "__m")
    intercept[IllegalArgumentException](AsOf.asofJoin(left, badRight, "k", "ts", Seq("__m")))
  }

  test("rangeJoin drops degenerate intervals instead of exploding descending buckets") {
    val left = Seq((1L, 100L, 1L)).toDF("k", "ts", "lid")
    val right = Seq((1L, 1L, 500L, 200L), (2L, 1L, 50L, 150L)) // first: end < start
      .toDF("win_id", "k", "start", "end")
    val out = AsOf.rangeJoin(left, right, "k", "ts", "start", "end", 64L)
      .select("win_id").collect().map(_.getLong(0))
    assert(out.toSeq === Seq(2L))
  }

  test("asofJoin equals the brute-force theta-join + max on random data") {
    val rng = new scala.util.Random(7)
    val left = Seq.tabulate(300)(i => (rng.nextInt(5).toLong, rng.nextInt(1000).toLong, i.toLong))
      .toDF("k", "ts", "lid")
    val right = Seq.tabulate(80)(i => (rng.nextInt(5).toLong, i * 13L, s"p$i"))
      .distinct.toDF("k", "ts", "p")
    // right unique per (k, ts) by construction (ts = i*13 unique)
    val got = AsOf.asofJoin(left, right, "k", "ts", Seq("p"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), Option(r.getString(3)))).toSet
    val rightRows = right.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val expect = left.collect().map { r =>
      val (k, ts, lid) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val best = rightRows.filter(x => x._1 == k && x._2 <= ts)
        .sortBy(_._2).lastOption.map(_._3)
      (k, ts, lid, best)
    }.toSet
    assert(got === expect)
  }

  test("rangeJoin equals the brute-force inequality join, across bucket widths") {
    val rng = new scala.util.Random(11)
    val left = Seq.tabulate(300)(i => (rng.nextInt(4).toLong, rng.nextInt(2000).toLong, i.toLong))
      .toDF("k", "ts", "lid")
    val ivs = Seq.tabulate(40)(i =>
      (i.toLong, rng.nextInt(4).toLong, rng.nextInt(1800).toLong))
      .map { case (id, k, s) => (id, k, s, s + 150 + rng.nextInt(400)) }
    val right = ivs.toDF("win_id", "k", "start", "end")
    val expect = {
      val ls = left.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      (for {
        (id, k, s, e) <- ivs
        (lk, ts, lid) <- ls if lk == k && ts >= s && ts < e
      } yield (id, lid)).toSet
    }
    for (width <- Seq(64L, 150L, 1000L)) {
      val got = AsOf.rangeJoin(left, right, "k", "ts", "start", "end", width)
        .select("win_id", "lid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === expect, s"width $width mismatch")
    }
  }

  test("intervalJoin equals the brute-force overlap join, across bucket widths") {
    val rng = new scala.util.Random(13)
    def mkIvs(n: Int, tag: String) = Seq.tabulate(n) { i =>
      val s = rng.nextInt(2000).toLong
      (s"$tag$i", rng.nextInt(3).toLong, s, s + rng.nextInt(500).toLong)
    }
    val la = mkIvs(60, "a")
    val rb = mkIvs(60, "b")
    val left = la.toDF("aid", "k", "start_a", "end_a")
    val right = rb.toDF("bid", "k2", "start_b", "end_b")
    // brute force, half-open overlap, keyed on k == k2
    val expect = (for {
      (aid, k, sa, ea) <- la if ea > sa
      (bid, k2, sb, eb) <- rb if eb > sb && k == k2 && sa < eb && sb < ea
    } yield (aid, bid)).toSet
    for (width <- Seq(37L, 250L, 5000L)) {
      val got = AsOf.intervalJoin(
        left.withColumnRenamed("k", "kk"), right.withColumnRenamed("k2", "kk"),
        Seq("kk"), "start_a", "end_a", "start_b", "end_b", width)
        .select("aid", "bid").collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(got === expect, s"width $width mismatch")
    }
  }

  test("intervalJoin with no keys is the pure temporal overlap; empties drop") {
    val left = Seq(("a1", 0L, 10L), ("a2", 5L, 5L), ("a3", 20L, 30L))
      .toDF("aid", "start_a", "end_a")
    val right = Seq(("b1", 9L, 21L), ("b2", 30L, 40L))
      .toDF("bid", "start_b", "end_b")
    val got = AsOf.intervalJoin(left, right, Nil,
      "start_a", "end_a", "start_b", "end_b", bucketWidth = 8L)
      .select("aid", "bid").collect().map(r => (r.getString(0), r.getString(1))).toSet
    // a2 is empty ([5,5)); a3=[20,30) overlaps b1=[9,21) but NOT b2=[30,40)
    // (half-open: the shared boundary 30 is in neither)
    assert(got === Set(("a1", "b1"), ("a3", "b1")))
  }
}
