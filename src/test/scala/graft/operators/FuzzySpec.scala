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

  test("fsWeights: hand-computed likelihood ratio, null fields are uninformative") {
    import org.apache.spark.sql.functions.col
    // 4 records in one block; u-stats over the whole table
    val df = Seq(
      (1L, "acme pump", "B1", 10),
      (2L, "acme pump", "B1", 10),   // agrees with 1 on both fields
      (3L, "acme pump", "B2", 10),   // agrees on size only
      (4L, "acme pump", "B3", 20)    // agrees on nothing
    ).toDF("k", "name", "brand", "size")
    val out = Fuzzy.fsWeights(df, "k", "name",
      Seq("brand" -> "0.90", "size" -> "0.80"), lower = 0.0, upper = 5.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getInt(2), r.getInt(3), r.getDouble(4), r.getString(5))).toMap
    // u_brand = sum c(c-1) / N(N-1) = 2/12; u_size = (3*2)/12 = 1/2
    val uB = 2.0 / 12.0; val uS = 6.0 / 12.0
    val agreeB = 0.90 / uB; val disB = 0.10 / (1.0 - uB)
    val agreeS = 0.80 / uS; val disS = 0.20 / (1.0 - uS)
    assert(out((1L, 2L)) === ((1, 1, agreeB * agreeS, "match")))
    assert(out((1L, 3L)) === ((0, 1, disB * agreeS, "possible")))
    assert(out((1L, 4L))._3 === disB * disS)
    assert(out.size === 6) // all C(4,2) pairs at lower=0
    // a NULL on either side is UNINFORMATIVE (factor 1, standard FS):
    // missing data is neither evidence for nor against — scoring it as
    // disagreement would bury sparse records below any useful `lower`
    val withNull = Seq((1L, "x", null.asInstanceOf[String], "B1"),
      (2L, "x", null.asInstanceOf[String], "B1"),  // null-vs-null brand
      (3L, "x", "Z9", "B1"))                       // null-vs-value brand with 1
      .toDF("k", "name", "brand", "other")
    val nOut = Fuzzy.fsWeights(withNull, "k", "name",
      Seq("brand" -> "0.90", "other" -> "0.80"), lower = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getInt(2), r.getDouble(4))).toMap
    // u_other = 3*2/(3*2) = 1 is degenerate; only brand's term varies:
    // null comparisons contribute exactly 1.0 * other-term, and the
    // agree flag stays 0 (observed agreement only)
    val otherTerm = 0.80 / 1.0
    assert(nOut((1L, 2L)) === ((0, 1.0 * otherTerm)))  // null vs null
    assert(nOut((1L, 3L)) === ((0, 1.0 * otherTerm)))  // null vs value
    assert(nOut((2L, 3L)) === ((0, 1.0 * otherTerm)))
    // and the threshold filter drops the weak pairs
    val filtered = Fuzzy.fsWeights(df, "k", "name",
      Seq("brand" -> "0.90", "size" -> "0.80"), lower = 2.0)
      .select(col("a_key"), col("b_key")).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(filtered.toSet === Set((1L, 2L))) // only the double-agreement clears 2.0
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

  test("maxBlock caps drop hot blocks before pair expansion; droppedBlocks reports them") {
    import org.apache.spark.sql.functions.col
    // hot block: 20 near-identical "acme ..." names; cold block: 2 "zen ..." names
    val hot = (1 to 20).map(i => s"acme pump unit $i")
    val cold = Seq("zen filter a", "zen filter b")
    val df = (hot ++ cold).toDF("name")
    val uncapped = Fuzzy.jaroWinklerPairs(df, "name", minSim = 0.7)
    val capped = Fuzzy.jaroWinklerPairs(df, "name", minSim = 0.7, maxBlock = 10)
    // the hot block's C(20,2) pairs vanish; the cold block survives intact
    assert(uncapped.where(col("name_a").startsWith("acme")).count() > 0)
    assert(capped.where(col("name_a").startsWith("acme")).count() === 0)
    assert(capped.where(col("name_a").startsWith("zen")).count() ===
      uncapped.where(col("name_a").startsWith("zen")).count())
    // maxBlock = 0 (default) is bit-identical to the uncapped spelling
    assert(Fuzzy.jaroWinklerPairs(df, "name", 0.7, Fuzzy.firstToken, 0)
      .collect().toSeq === uncapped.collect().toSeq)
    // the monitor reports exactly the discarded block and its size
    val dropped = Fuzzy.droppedBlocks(df, "name", maxBlock = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(dropped.toSeq === Seq("acme" -> 20L))
    // same cap discipline on the record-linkage path: fsWeights with a
    // hot name block emits zero pairs from it, keeps the cold block
    val recs = (1 to 20).map(i => (i.toLong, "acme pump", s"B$i")) ++
      Seq((21L, "zen filter", "Z1"), (22L, "zen filter", "Z1"))
    val fsCapped = Fuzzy.fsWeights(recs.toDF("k", "name", "brand"), "k", "name",
      Seq("brand" -> "0.90"), lower = 0.0, maxBlock = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(fsCapped.toSeq === Seq((21L, 22L)))
    val fsDropped = Fuzzy.droppedBlocks(recs.toDF("k", "name", "brand"), "name",
      maxBlock = 10, distinctFirst = false)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(fsDropped.toSeq === Seq("acme" -> 20L))
    // blockedMatch honors the cap on both sides
    val m = Fuzzy.blockedMatch(df, df, "name", "name", maxDist = 2, maxBlock = 10)
    assert(m.where(col("q_text").startsWith("acme")).count() === 0)
  }
}
