package graft.expressions

import graft.SparkSuite

/** The shared test session is built with
  * `spark.sql.extensions=graft.GraftExtensions` (SparkSuite), so these
  * tests prove the extension-injected SQL surface — NOT the temp-
  * function route: `newSession()` drops every temp function but keeps
  * the session blueprint's extensions, so a function resolving there
  * can only have come from the plugin. */
class ExtensionsSpec extends SparkSuite {

  test("extension-injected functions resolve in a fresh newSession (no temp registry)") {
    val s2 = spark.newSession()
    val row = s2.sql(
      """SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |       graft_jaccard(array('a','b'), array('b','c')) AS j,
        |       size(graft_shingles('the quick brown fox jumps', 3)) AS ns,
        |       graft_rolling_hash('hello') AS rh
        |""".stripMargin).head()
    assert(row.getDouble(0) === 11.0)
    assert(math.abs(row.getDouble(1) - (1.0 / 3.0)) < 1e-12)
    // 25-char string -> 23 distinct character 3-shingles
    assert(row.getInt(2) === 23)
    // same value the temp-function route computes
    val viaRegister = {
      GraftFunctions.register(spark)
      import org.apache.spark.sql.functions._
      spark.range(1).select(GraftFunctions.rollingHash(lit("hello"))).head().getLong(0)
    }
    assert(row.getLong(3) === viaRegister)
  }

  test("bloom agg + probe work through the pure-SQL extension route") {
    val s2 = spark.newSession()
    s2.range(0, 100).createOrReplaceTempView("ids")
    // build the sketch over 0..99, probe members and a non-member
    val rows = s2.sql(
      """WITH bf AS (SELECT graft_bloom_agg(xxhash64(id), 1000L, 8192L) AS b FROM ids)
        |SELECT id, graft_bloom_contains((SELECT b FROM bf), xxhash64(id)) AS hit
        |FROM VALUES (1L), (50L), (12345L) AS t(id)
        |""".stripMargin).collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(rows(1L) && rows(50L), "members always probe true (no false negatives)")
    // 12345 MAY false-positive in principle; with 8192 bits / 100 items
    // the fpp is ~1e-7 and the hash seed is fixed, so this is stable
    assert(!rows(12345L))
  }

  test("SQL and Column routes build identical plans for graft_dot") {
    import org.apache.spark.sql.functions._
    val viaSql = spark.sql(
      "SELECT graft_dot(array(1.0D,2.0D,3.0D), array(4.0D,5.0D,6.0D)) AS d")
    val viaCol = spark.range(1).select(
      GraftFunctions.dot(
        array(lit(1.0), lit(2.0), lit(3.0)),
        array(lit(4.0), lit(5.0), lit(6.0))).as("d"))
    assert(viaSql.head().getDouble(0) === 32.0)
    assert(viaCol.head().getDouble(0) === 32.0)
  }
}
