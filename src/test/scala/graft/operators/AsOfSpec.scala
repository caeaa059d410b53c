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
}
