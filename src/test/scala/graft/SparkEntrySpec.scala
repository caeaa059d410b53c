package graft

class SparkEntrySpec extends SparkSuite {

  test("every oracle entry has a matching query") {
    val orphans = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(orphans.isEmpty, s"oracleSql keys without a query: $orphans")
  }

  test("rows-only queries are the deliberate exceptions") {
    val rowsOnly = SparkEntry.queries.keySet.diff(SparkEntry.oracleSql.keySet)
    // HLL sketch estimates aren't cross-engine comparable (rsd-bounded
    // in ProfileSpec instead); the BPE training loop is iterative with
    // no SQL oracle (verified against an independent reference
    // implementation in BpeSpec instead); CMS estimates use Spark's
    // own hash family (never-under + eps-bound laws in ProfileSpec);
    // the PCA eigensolve is iterative (alignment/orthonormality/
    // variance laws in SimilaritySpec); DDSketch quantile estimates
    // are engine-private (alpha-bound + merge laws in ProfileSpec)
    assert(rowsOnly === Set("q_approx_dictionary", "q_sketch_dictionary",
      "q_bpe_train", "q_cms_heavy_hitters", "q_pca", "q_dd_quantiles",
      "q_quantile_monitor"),
      "every other query must carry a DuckDB oracle")
  }

  test("flagship entry returns rows on the smoke scale") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("registry smoke: every registered query executes against the real sf0.001 files") {
    // Round-7 lesson: every suite built literal DataFrames, so when the
    // driver regenerated events.parquet with a TIMESTAMP_NTZ ts column,
    // 271 tests stayed green while 8 registered queries broke at
    // analysis time. This test runs the actual registry against the
    // actual files so schema drift fails `sbt test`, not the round's
    // correctness report. Loop-style builders that run a full streaming
    // or iterative job inside the query function are exercised by their
    // own dedicated specs and skipped here for time.
    val d = "/root/testdata/sf0.001"
    val loopy = Set("q_stream_ingest_final", "q_bpe_train", "q_kmeans",
      "q_semantic_dedup", "q_dedup_embeddings", "q_pca")
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      if (loopy(name)) None
      else scala.util.Try(fn(spark, d).count()).failed.toOption
        .map(e => s"$name: ${e.toString.linesIterator.take(2).mkString(" | ").take(300)}")
    }
    assert(failures.isEmpty, s"${failures.size} registry queries failed on real testdata:\n" +
      failures.mkString("\n"))
  }

  test("q_sql_topk (SQL text surface) matches q_topk_cosine (Column API)") {
    val d = "/root/testdata/sf0.001"
    val viaCol = SparkEntry.queries("q_topk_cosine")(spark, d).collect().toSeq
    val viaSql = SparkEntry.queries("q_sql_topk")(spark, d).collect().toSeq
    assert(viaSql === viaCol)
  }

  test("oracle_sql.json content round-trips through a strict JSON parser") {
    import org.json4s.jackson.JsonMethods
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${JsonEscape(k)}: ${JsonEscape(v)}" }.mkString("{", ",", "}")
    val parsed = JsonMethods.parse(json)
    val keys = parsed.values.asInstanceOf[Map[String, String]]
    assert(keys.keySet === SparkEntry.oracleSql.keySet)
    assert(keys("q_pricing_summary").contains("DECIMAL(18,2)"))
  }

  test("JsonEscape handles quotes, backslashes, and control characters") {
    import org.json4s.jackson.JsonMethods
    val nasty = "a\"b\\c\nd\te\rfg"
    val parsed = JsonMethods.parse(s"{${JsonEscape("k")}: ${JsonEscape(nasty)}}")
    assert(parsed.values.asInstanceOf[Map[String, String]]("k") === nasty)
  }
}
