package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.{Json, Scrub, Text}
import graft.multimodal.Multimodal
import graft.operators.{Anonymize, AsOf, Clustering, CorpusStats, Dedup, Fuzzy, Graph, Layout, Ngrams, Pack, Profile, Quality, Reports, Reshape, Sampling, SetSimilarity, Similarity, Skew, TopK, Windows}
import graft.sources.{Bucketing, Lake, Tables}
import graft.streaming.Sessions

/** Driver contract (SURVEY.md §7): every operator from SURVEY.md §2
  * exposed as a named query over the driver's test tables, each with a
  * DuckDB-equivalent oracle SQL for the correctness gate.
  *
  * Determinism rules shared by every (query, oracle) pair:
  *  - money/measure sums go through DECIMAL(18,2|4) on BOTH sides so
  *    the aggregate is exact and summation-order independent;
  *  - every query ends in a total ORDER BY (unique tiebreak keys);
  *  - column names and types are aligned pairwise (counts are BIGINT
  *    on both sides, ratios are IEEE-double of identical operands).
  */
object SparkEntry {

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    Reports.drugReport(Reg.t(spark, dir, "lineitem"), Reg.t(spark, dir, "part"))
  }

  /** One entry per implemented operator from SURVEY.md §2 — the
    * registrations live in [[RegistryQueriesA]]/[[RegistryQueriesB]]
    * (a mechanical by-family split of what was one 5,200-line object;
    * same map, same names). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RegistryQueriesA.queries ++ RegistryQueriesB.queries

  /** DuckDB-runnable oracle per query (same tables, same column names,
    * same ORDER BY), split across [[RegistryOraclesA]]/[[RegistryOraclesB]]/
    * [[RegistryOraclesC]]; shared SQL spellings live in [[OracleShared]].
    * Rows-only (no-oracle) queries are deliberate: sketch estimates and
    * iterative trainers are engine-private, pinned by spec laws. */
  def oracleSql: Map[String, String] =
    RegistryOraclesA.sql ++ RegistryOraclesB.sql ++ RegistryOraclesC.sql
}
