package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.{Json, Scrub, Text}
import graft.multimodal.Multimodal
import graft.operators.{Anonymize, AsOf, Clustering, CorpusStats, Dedup, Fuzzy, Graph, Layout, Ngrams, Pack, Profile, Quality, Reports, Reshape, Sampling, SetSimilarity, Similarity, Skew, TopK, Windows}
import graft.sources.{Bucketing, Lake, Tables}
import graft.streaming.Sessions

/** Shared helpers behind the split query/oracle registry files
  * (RegistryQueriesA/B, RegistryOraclesA/B/C) — the registry is one
  * logical unit ([[SparkEntry]]) split mechanically by family so
  * per-round diffs stay reviewable; determinism rules live on
  * [[SparkEntry]]'s scaladoc. */
private[graft] object Reg {
  def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Temp dir for a NON-IDEMPOTENT registry row (append rows, the
    * streaming loops): fresh per invocation — an append replayed into
    * a reused dir would double its rows — but registered for
    * end-of-JVM cleanup, so repeated verify/bench runs stop stranding
    * parquet under /tmp. Deletion happens at JVM exit because the
    * returned lazy frame still reads the dir for the row's lifetime. */
  private val tempDirs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  private lazy val cleanupHook: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      tempDirs.forEach { d =>
        scala.util.Try(Lake.deleteRecursivelyLocal(d)); ()
      }))
  def tempDir(prefix: String): String = {
    cleanupHook
    val d = java.nio.file.Files.createTempDirectory(prefix).toString
    tempDirs.add(d)
    d
  }

  /** Co-purchase graph behind q_triangles / q_clustering_coef /
    * q_khop — the shared [[Graph.copurchaseEdges]] definition. */
  def copurchaseEdges(s: SparkSession, d: String): DataFrame =
    Graph.copurchaseEdges(t(s, d, "lineitem"))

  /** Exact decimal sum rendered as double — DuckDB spelling of
    * [[Reports.dsum]]. */
  def sqlDsum(c: String, scale: Int = 2): String =
    s"CAST(sum(CAST($c AS DECIMAL(18,$scale))) AS DOUBLE)"

  /** DuckDB twin of [[Windows.ewmaDyadic]] at k = 16 — the lag chain
    * and dyadic weights generated from the same loop the engine uses,
    * so the two spellings cannot drift. */
  def ewmaOracleSql: String = {
    val k = 16
    val terms = (0 until k).map { j =>
      s"coalesce((lag(v, $j) OVER w) * ${1L << (k - 1 - j)}, 0)"
    }.mkString(" + ")
    val dens = (0 until k).map { j =>
      s"(CASE WHEN lag(v, $j) OVER w IS NOT NULL THEN ${1L << (k - 1 - j)} ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH b AS (SELECT event_type, event_id, ts,
          CAST(value AS DECIMAL(18,2)) AS v FROM events)
        SELECT event_type, event_id,
          CASE WHEN ($dens) > 0
               THEN round(CAST($terms AS DOUBLE) / CAST($dens AS DOUBLE), 6)
          END AS ewma
        FROM b WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
        ORDER BY event_type, event_id"""
  }

  /** Shared CTE chain for the Laplace bigram LM — one text, two
    * oracles (`q_bigram_logprob`, `q_lm_filter`), zero drift. */
  val bigramLmCtes: String =
    """tok AS (SELECT doc_id,
          regexp_split_to_array(trim(lower(text)), '\s+') AS t FROM documents),
       bg AS (SELECT doc_id,
         unnest([t[i] || ' ' || t[i+1] for i in range(1, len(t))]) AS bigram
         FROM tok WHERE len(t) >= 2),
       tf AS (SELECT doc_id, bigram, count(*) AS tf FROM bg GROUP BY doc_id, bigram),
       c12 AS (SELECT bigram, sum(tf) AS c12 FROM tf GROUP BY bigram),
       c1 AS (SELECT split_part(bigram, ' ', 1) AS w1, sum(tf) AS c1
              FROM tf GROUP BY 1),
       v AS (SELECT count(DISTINCT term) AS v FROM
         (SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
          FROM documents)),
       lm AS (SELECT tf.doc_id, CAST(sum(tf.tf) AS BIGINT) AS n_bigrams,
         sum(CAST(round(tf.tf * ln((c12 + 1)::DOUBLE / (c1 + v)::DOUBLE), 6)
           AS DECIMAL(18,6))) AS lp_dec
         FROM tf JOIN c12 USING (bigram)
                 JOIN c1 ON split_part(tf.bigram, ' ', 1) = c1.w1, v
         GROUP BY tf.doc_id)"""

}
