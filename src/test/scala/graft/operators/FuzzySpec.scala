package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class FuzzySpec extends SparkSuite {
  import spark.implicits._

  test("blockedMatch finds within-distance pairs inside a block") {
    val dict = Seq("small ring", "small gizmo", "red widget").toDF("name")
    val qs = Seq("small rin", "red wdget", "blue bolt").toDF("q")
    val out = Fuzzy.blockedMatch(qs, dict, "q", "name", maxDist = 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq === Seq(
      ("red wdget", "red widget", 1L),
      ("small rin", "small ring", 1L))) // "blue bolt" has no block partner
  }

  test("blockedMatch never compares across blocks (the recall trade-off)") {
    // "ball" vs "call": distance 1, but different first tokens — the
    // blocking key excludes the pair by design
    val out = Fuzzy.blockedMatch(
      Seq("ball").toDF("q"), Seq("call").toDF("name"), "q", "name", maxDist = 2)
    assert(out.count() === 0)
  }

  test("blockedMatch equals brute force within blocks, dedups inputs, drops nulls") {
    val dict = Seq("hot gear", "hot gears", "hot bear", null).toDF("name")
    val qs = Seq("hot gea", "hot gea", null).toDF("q") // duplicate + null query
    val out = Fuzzy.blockedMatch(qs, dict, "q", "name", maxDist = 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // brute force: levenshtein("hot gea", x) = 1, 2, 2 — all within 2
    assert(out.toSeq === Seq(
      ("hot gea", "hot bear", 2L),
      ("hot gea", "hot gear", 1L),
      ("hot gea", "hot gears", 2L)))
  }

  test("a null blocking key drops the row explicitly (documented recall edge)") {
    // block on the second '-'-separated field: "solo" has none -> null
    // key -> excluded even though an exact dictionary duplicate exists
    val block: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      c => try_element_at(split(c, "-"), lit(2))
    val out = Fuzzy.blockedMatch(
      Seq("solo", "a-x").toDF("q"), Seq("solo", "a-x").toDF("name"),
      "q", "name", maxDist = 2, block = block)
    assert(out.collect().map(r => (r.getString(0), r.getLong(2))).toSeq === Seq(("a-x", 0L)))
  }

  test("custom blocking key overrides the first-token default") {
    // block on string length: pairs with equal length only
    val out = Fuzzy.blockedMatch(
      Seq("abcd").toDF("q"), Seq("abcx", "abc").toDF("name"), "q", "name",
      maxDist = 2, block = length)
    assert(out.collect().map(_.getString(1)).toSeq === Seq("abcx"))
  }

  test("resolveEntities: transitive chains collapse to the lexicographic min") {
    // marthaXX ~ marthaXY ~ marthaYY chain: the ends may not pair
    // directly, but the component still collapses to one canonical
    val df = Seq("green marthaxx", "green marthaxy", "green marthayy",
      "green unrelatedzzz", "blue solo").toDF("name")
    val out = Fuzzy.resolveEntities(df, "name", minSim = 0.9).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("green marthaxx") === "green marthaxx")
    assert(out("green marthaxy") === "green marthaxx")
    assert(out("green marthayy") === "green marthaxx")
    assert(out("green unrelatedzzz") === "green unrelatedzzz")
    assert(out("blue solo") === "blue solo")
  }

  test("jaroWinklerPairs: each near pair once (a < b), cross-block never compared") {
    val df = Seq("green martha", "green marhta", "green xylophone",
      "blue martha", "green martha").toDF("name")
    val out = Fuzzy.jaroWinklerPairs(df, "name", minSim = 0.9)
    val pairs = out.collect().map(r => (r.getString(0), r.getString(1))).toSeq
    // the transposed pair survives; duplicates collapse via distinct;
    // "blue martha" shares no block with the greens
    assert(pairs === Seq(("green marhta", "green martha")))
    val sim = out.collect().head.getDouble(2)
    assert(sim > 0.9 && sim < 1.0)
  }
}
