package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy string matching ([EXT]) — entity resolution between a
  * query set and a reference dictionary (typo-tolerant joins, the
  * text-table cousin of [[Similarity]]'s embedding ANN).
  *
  * Scale shape: all-pairs edit distance is O(n·m·L²) — a non-starter.
  * Standard practice, implemented here: (1) fuzzy-match DICTIONARIES,
  * not raw rows — `distinct()` both sides first (a 100 TB fact has
  * few distinct dirty strings relative to rows; re-attach matches by
  * equi-join afterwards); (2) BLOCK candidate pairs on a cheap
  * equality key so the quadratic term is bounded per block, and the
  * pair generation is a plain shuffle equi-join; (3) verify survivors
  * with exact `levenshtein` (codegen'd built-in). Blocking trades
  * recall for cost — a pair whose blocking keys differ is never
  * compared; pick a key the expected error class cannot touch (the
  * default, first whitespace token, survives suffix typos).
  */
object Fuzzy {

  /** Default blocking key: first whitespace token. */
  def firstToken(c: Column): Column = element_at(split(c, " "), 1)

  /** Match every distinct `queries` string to the distinct `dictionary`
    * strings within `maxDist` edits, comparing only within equal
    * blocking keys. Returns (q_text, match_text, dist) — one row per
    * surviving pair; a query with no match emits nothing (left-join
    * the result back to keep misses). */
  def blockedMatch(queries: DataFrame, dictionary: DataFrame,
                   queryCol: String, dictCol: String, maxDist: Int = 2,
                   block: Column => Column = firstToken): DataFrame = {
    require(maxDist >= 0, s"maxDist must be non-negative: $maxDist")
    val q = queries.select(col(queryCol).as("q_text")).where(col("q_text").isNotNull)
      .distinct().withColumn("__b", block(col("q_text")))
    val d = dictionary.select(col(dictCol).as("match_text")).where(col("match_text").isNotNull)
      .distinct().withColumn("__b", block(col("match_text")))
    q.join(d, Seq("__b"))
      .withColumn("dist", levenshtein(col("q_text"), col("match_text")).cast("long"))
      .where(col("dist") <= maxDist)
      .select(col("q_text"), col("match_text"), col("dist"))
      .orderBy(col("q_text"), col("match_text"))
  }
}
