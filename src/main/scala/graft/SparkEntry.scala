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

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Co-purchase graph behind q_triangles / q_clustering_coef /
    * q_khop — the shared [[Graph.copurchaseEdges]] definition. */
  private def copurchaseEdges(s: SparkSession, d: String): DataFrame =
    Graph.copurchaseEdges(t(s, d, "lineitem"))

  /** Exact decimal sum rendered as double — DuckDB spelling of
    * [[Reports.dsum]]. */
  private def sqlDsum(c: String, scale: Int = 2): String =
    s"CAST(sum(CAST($c AS DECIMAL(18,$scale))) AS DOUBLE)"

  /** DuckDB twin of [[Windows.ewmaDyadic]] at k = 16 — the lag chain
    * and dyadic weights generated from the same loop the engine uses,
    * so the two spellings cannot drift. */
  private def ewmaOracleSql: String = {
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
  private val bigramLmCtes: String =
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

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    Reports.drugReport(t(spark, dir, "lineitem"), t(spark, dir, "part"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- relational core (SURVEY §2.1-2.4, §2.6) ----
    "q_pricing_summary" -> ((s, d) => Reports.pricingSummary(t(s, d, "lineitem"))),
    // robust outlier gate ([EXT]): modified z-score via group medians
    // and median absolute deviation — fat-tail-proof, unlike q_zscore
    "q_mad_outliers" -> ((s, d) =>
      Profile.madOutliers(t(s, d, "lineitem"), "l_returnflag", "l_extendedprice",
        Seq("l_orderkey", "l_linenumber"), k = 1.8)),
    // survivorship merge ([EXT]): per-field first-non-null across
    // prioritized source feeds — the golden record after entity
    // resolution; deterministic nulls/conflicts synthesized per-source
    "q_golden_record" -> ((s, d) => {
      val c = t(s, d, "customer")
      val s1 = c.select(col("c_custkey"), lit(1).as("prio"),
        when(col("c_custkey") % 3 === 0, lit(null)).otherwise(col("c_name")).as("name"),
        when(col("c_custkey") % 7 === 0, lit(null)).otherwise(col("c_mktsegment")).as("segment"),
        when(col("c_custkey") % 5 === 0, lit(null)).otherwise(col("c_acctbal")).as("acctbal"))
      val s2 = c.select(col("c_custkey"), lit(2).as("prio"),
        col("c_name").as("name"),
        concat(lit("legacy:"), col("c_mktsegment")).as("segment"),
        col("c_acctbal").as("acctbal"))
      Dedup.goldenRecord(s1.unionByName(s2), Seq("c_custkey"), "prio", "prio",
        Seq("name", "segment", "acctbal"))
        .orderBy(col("c_custkey"))
    }),
    // exact distinct keys per tumbling window ([EXT])
    "q_window_distinct" -> ((s, d) => Sessions.windowedDistinct(t(s, d, "events"))),
    // declarative data-quality gate ([EXT]): every scan rule is one
    // conditional count inside ONE aggregate pass; keyed uniqueness
    // runs as its own bounded aggregate and unions in
    "q_dq_rules" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      Quality.report(li, Seq(
        Quality.notNull("l_orderkey"),
        Quality.inRange("l_quantity", 1, 45),
        Quality.inRange("l_discount", 0, 0.05),
        Quality.inSet("l_returnflag", Seq("A", "R")),
        Quality.matches("l_linestatus", "^[OF]$"),
        Quality.check("positive_net_price",
          col("l_extendedprice") * (lit(1) - col("l_discount")) > 0)))
        .unionByName(Quality.uniqueRule(li, Seq("l_orderkey", "l_linenumber")))
        .orderBy(col("rule"))
    }),
    // incremental aggregate maintenance ([EXT]): per-batch mergeable
    // partial aggregates merged into the exact full aggregate — the
    // oracle recomputes from scratch, proving merge == rescan without
    // ever rescanning history in production
    "q_agg_merge" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val batches = (0 until 4).map(b =>
        Reports.partialAggregate(li.filter(pmod(col("l_orderkey"), lit(4)) === b),
          Seq("l_returnflag", "l_linestatus"), "l_extendedprice"))
      Reports.mergeAggregates(batches, Seq("l_returnflag", "l_linestatus"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),
    "q_drug_report" -> ((s, d) =>
      Reports.drugReport(t(s, d, "lineitem"), t(s, d, "part"))),
    "q_prescriber_report" -> ((s, d) =>
      Reports.prescriberReport(t(s, d, "lineitem"), t(s, d, "supplier"), t(s, d, "nation"))),
    "q_brand_report" -> ((s, d) =>
      Reports.brandReport(t(s, d, "lineitem"), t(s, d, "part"))),
    "q_kpis" -> ((s, d) => Reports.kpis(t(s, d, "lineitem"))),
    "q_regional_revenue" -> ((s, d) =>
      Reports.regionalRevenue(t(s, d, "lineitem"), t(s, d, "supplier"),
        t(s, d, "nation"), t(s, d, "region"), regionName = "ASIA")),
    // percent-of-parent drill-down ([EXT]): nation share within
    // region, region share of total — shares as windows over the
    // bounded post-aggregate rows, fact touched once
    "q_share_hierarchy" -> ((s, d) =>
      Reports.shareHierarchy(t(s, d, "lineitem"), t(s, d, "supplier"),
        t(s, d, "nation"), t(s, d, "region"))),
    "q_shipped_between" -> ((s, d) =>
      Reports.shippedBetween(t(s, d, "lineitem"), "1997-01-01", "1998-01-01")),
    // calendar rollup ([EXT]): year/quarter/month/ISO-dow breakdown —
    // certifies the calendar-function surface (both engines map their
    // different dayofweek conventions onto ISO)
    "q_calendar" -> ((s, d) => Reports.calendarRollup(t(s, d, "orders"))),
    "q_segment_revenue" -> ((s, d) =>
      Reports.segmentRevenue(t(s, d, "lineitem"), t(s, d, "orders"), t(s, d, "customer"))),
    "q_customers_with_orders" -> ((s, d) =>
      Reports.customersWithOrders(t(s, d, "customer"), t(s, d, "orders"))),
    "q_customers_without_orders" -> ((s, d) =>
      Reports.customersWithoutOrders(t(s, d, "customer"), t(s, d, "orders"))),
    "q_count_per_key" -> ((s, d) => Reports.countPerKey(t(s, d, "orders"), "o_custkey")),
    // ordered array_agg rendered as CSV (collect_list alone is
    // partition-arrival-ordered — nondeterministic)
    "q_collect" -> ((s, d) =>
      Reports.collectPerKey(t(s, d, "orders").where(col("o_custkey") < 100),
        "o_custkey", "o_orderkey")),
    "q_salted_sum" -> ((s, d) =>
      Skew.saltedSum(t(s, d, "lineitem").select("l_returnflag", "l_quantity"),
        "l_returnflag", "l_quantity").orderBy(col("l_returnflag"))),
    // salted fact⋈dim join (the skew fallback when AQE can't split):
    // same rows as the plain join, verified by the plain-join oracle
    "q_salted_join" -> ((s, d) => {
      val li = t(s, d, "lineitem").select(col("l_partkey"), col("l_quantity"))
      val pt = t(s, d, "part").select(col("p_partkey").as("l_partkey"), col("p_brand"))
      Skew.saltedJoin(li, pt, "l_partkey", salts = 8)
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_rows"), Reports.dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("p_brand"))
    }),
    // bloom-pruned join ([EXT]): the dim's key sketch prunes the fact
    // at the scan before any shuffle — result bit-identical to the
    // plain join (no false negatives; FPs die in the join)
    "q_bloom_join" -> ((s, d) => {
      val dim = t(s, d, "orders").where(col("o_orderkey") % 97 === 0)
        .select(col("o_orderkey"), col("o_totalprice"))
      Skew.bloomPrunedJoin(
        t(s, d, "lineitem").select(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice")),
        dim, "l_orderkey", "o_orderkey")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_extendedprice"), col("o_totalprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),
    "q_rollup" -> ((s, d) => Reports.rollupSummary(t(s, d, "lineitem"))),
    "q_cube" -> ((s, d) => Reports.cubeSummary(t(s, d, "lineitem"))),
    // GROUPING SETS ([EXT]): the general form rollup/cube specialize,
    // with grouping() flags disambiguating subtotal NULLs
    "q_grouping_sets" -> ((s, d) => Reports.groupingSetsSummary(t(s, d, "lineitem"))),
    "q_pivot" -> ((s, d) =>
      Reports.pivotSum(t(s, d, "lineitem"), "l_returnflag", "l_linestatus",
        Seq("F", "O"), "l_quantity", prefix = "qty_")),
    "q_quantiles" -> ((s, d) =>
      Profile.quantiles(t(s, d, "lineitem"), "l_returnflag", "l_quantity")),
    // corr rounded to 6dp: the decimal sums are exact on both sides,
    // but DuckDB's hugeint-decimal -> double conversion can double-
    // round one ULP away from Spark's BigDecimal cast
    "q_corr" -> ((s, d) =>
      Profile.pearsonExact(t(s, d, "lineitem"), "l_returnflag",
        "l_quantity", "l_extendedprice")
        .select(col("l_returnflag"), round(col("corr"), 6).as("corr"))),
    // Spearman rank correlation ([EXT]): monotone association over
    // doubled-integer average ranks — exact moments, one shuffle
    "q_spearman" -> ((s, d) =>
      Profile.spearmanExact(t(s, d, "lineitem"), "l_returnflag",
        "l_quantity", "l_extendedprice")),
    // robust scaling ([EXT]): (x - median)/IQR per group — the
    // outlier-resistant zscore twin, quantile-bridge certified
    "q_robust_scale" -> ((s, d) =>
      Profile.robustScale(
        t(s, d, "lineitem").select(col("l_orderkey"), col("l_linenumber"),
          col("l_returnflag"), col("l_extendedprice")),
        "l_returnflag", "l_extendedprice")
        .select(col("l_orderkey"), col("l_linenumber"), col("robust_z"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),
    // per-segment OLS trend ([EXT]): slope/intercept of daily revenue
    // vs epoch day per event type — exact decimal moments, closed-form
    // doubles (intercept never references a rounded slope)
    "q_trend_fit" -> ((s, d) => {
      val ev = graft.functions.TimeCol.instant(t(s, d, "events"))
      val daily = ev.groupBy(col("event_type"), to_date(col("ts")).as("day"))
        // the (18,2) re-cast keeps the x*y product inside DECIMAL(38,2)
        // exactly (a (28,2) sum would push the product past precision 38)
        .agg(sum(col("value").cast(DecimalType(18, 2)))
          .cast(DecimalType(18, 2)).as("y"))
        .withColumn("x",
          datediff(col("day"), lit(java.sql.Date.valueOf("1970-01-01"))))
      Profile.linearFit(daily, "event_type", "x", "y")
    }),
    // finite-memory EWMA ([EXT]): half-life smoothing with exact
    // dyadic weights — k lags from ONE window, decimal-exact sums
    "q_ewma" -> ((s, d) => Windows.ewmaDyadic(t(s, d, "events"))),
    // deterministic split assignment ([EXT]): per-split row counts
    "q_split" -> ((s, d) =>
      Sampling.assignSplit(t(s, d, "orders"), "o_orderkey",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .groupBy(col("split")).agg(count(lit(1)).as("n"))
        .orderBy(col("split"))),
    // temperature-scaled mixture ([EXT]): domain weights DERIVED from
    // the data (∝ sqrt(n_d), the T=2 multilingual rebalance) instead
    // of q_mixture_sample's explicit targets
    "q_temperature_mix" -> ((s, d) =>
      Sampling.temperatureSample(
        t(s, d, "documents").select(col("doc_id"), col("lang")),
        "doc_id", "lang", fraction = 0.4)
        .orderBy(col("doc_id"))),
    // leakage-safe split ([EXT]): split by the DEDUP CLUSTER hash so a
    // test doc's near-twin can never land in train (the silent
    // eval-inflation bug); composes dedupDocuments' keeper mapping
    "q_group_split" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val groups = Dedup.dedupDocuments(docs, threshold = 0.5)
      Sampling.groupSplit(docs, "doc_id", groups, "keeper_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select(col("doc_id"), col("split")).orderBy(col("doc_id"))
    }),
    // class balancing ([EXT]): every label downsampled to the smallest
    // class's count, kept rows chosen in deterministic hash order
    "q_class_balance" -> ((s, d) =>
      Sampling.classBalance(t(s, d, "documents").select(col("doc_id"), col("lang")),
        "doc_id", "lang").orderBy(col("doc_id"))),
    "q_top_parts" -> ((s, d) => TopK.topN(t(s, d, "part"), "p_retailprice", "p_partkey", 100)),
    "q_top_parts_per_brand" -> ((s, d) =>
      TopK.perGroup(t(s, d, "part"), "p_brand", "p_retailprice", "p_partkey", 3)
        .orderBy(col("p_brand"), col("rank"))),
    "q_topk_agg" -> ((s, d) =>
      TopK.perGroupViaAggregator(t(s, d, "part"), "p_brand", "p_retailprice", "p_partkey", 3)
        .orderBy(col("p_brand"), col("rank"))),
    // ---- window functions (SURVEY §2.5 [EXT]) ----
    "q_monthly_trend" -> ((s, d) => Windows.monthlyTrend(t(s, d, "lineitem"))),
    "q_rank_in_group" -> ((s, d) => Windows.rankInGroup(t(s, d, "supplier"))),
    "q_window_stats" -> ((s, d) => Windows.distributionStats(t(s, d, "supplier"))),
    // sliding ROWS + time-RANGE frames over the event stream
    "q_moving_avg" -> ((s, d) => Windows.movingStats(t(s, d, "events"))),
    // Morton/Z-order code for multi-dim layout ([EXT]); the pruning
    // effect itself is demonstrated in LayoutSpec (per-file bounding
    // boxes), the oracle pins the interleave arithmetic
    "q_zorder" -> ((s, d) =>
      t(s, d, "orders").select(col("o_orderkey"),
        Layout.mortonInterleave(
          pmod(col("o_custkey"), lit(256)), pmod(col("o_orderkey"), lit(256)), 8)
          .as("zval"))
        .orderBy(col("o_orderkey"))),
    // ---- dedup (SURVEY §2.7) ----
    "q_dedup_exact" -> ((s, d) =>
      Dedup.exact(t(s, d, "lineitem"), Seq("l_returnflag", "l_linestatus"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))),
    "q_dedup_keyed" -> ((s, d) =>
      Dedup.keyedDeterministic(
        t(s, d, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity"),
        Seq("l_orderkey"), "l_linenumber", "l_quantity").orderBy(col("l_orderkey"))),
    // aggregate-shaped twin of q_dedup_keyed: min_by partial-aggregates
    // map-side with no per-group sort — same oracle, cheaper plan
    "q_dedup_keyed_agg" -> ((s, d) =>
      Dedup.keyedDeterministicAgg(
        t(s, d, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity"),
        Seq("l_orderkey"), "l_linenumber", "l_quantity").orderBy(col("l_orderkey"))),
    // ---- profiling / validation (SURVEY §2.9) ----
    "q_null_profile" -> ((s, d) => Profile.nullProfile(t(s, d, "customer"))),
    "q_data_dictionary" -> ((s, d) => Profile.dataDictionary(t(s, d, "supplier"))),
    // exact per-column modes ([EXT]): dominant-value smell test —
    // string-compared, int/string columns only (float renders differ
    // across engines)
    "q_column_modes" -> ((s, d) =>
      Profile.columnModes(t(s, d, "lineitem"),
        Seq("l_returnflag", "l_linestatus", "l_linenumber"))),
    "q_value_counts" -> ((s, d) => Profile.valueCounts(t(s, d, "orders"), "o_orderpriority")),
    "q_approx_dictionary" -> ((s, d) => Profile.approxDataDictionary(t(s, d, "orders"))),
    // mergeable per-shard HLL sketches ([EXT]): incremental profiling —
    // rows-only oracle (sketch estimates aren't cross-engine comparable)
    "q_sketch_dictionary" -> ((s, d) =>
      Profile.sketchDictionary(t(s, d, "orders"), "o_orderpriority",
        Seq("o_custkey", "o_orderdate", "o_orderstatus"))),
    // KMV distinct sketch ([EXT]): the ENGINE-PORTABLE sketch (md5
    // fingerprints) — unlike the HLL/CMS families its estimates are
    // hash-certified against the oracle, and it supports intersection
    "q_kmv_distinct" -> ((s, d) =>
      Profile.kmvEstimate(
        Profile.kmvSketch(t(s, d, "events"), "event_type", "user_id", k = 64), k = 64)),
    // pairwise audience overlap between event types from sketches
    // alone (inclusion–exclusion on the union sketch)
    "q_kmv_overlap" -> ((s, d) =>
      Profile.kmvOverlap(
        Profile.kmvSketch(t(s, d, "events"), "event_type", "user_id", k = 64), k = 64)),
    "q_histogram" -> ((s, d) => Profile.histogram(t(s, d, "lineitem"), "l_quantity", 10)),
    // join-skew diagnostic ([EXT]): per-key count distribution +
    // integer skew ratio + suggested salt for the hot-key plan choice
    "q_key_skew" -> ((s, d) => Profile.keySkew(t(s, d, "lineitem"), "l_partkey")),
    // quantile-bucket assignment ([EXT]): equal-population strata via
    // broadcast percentile bounds (ntile is a single-task global sort)
    "q_quantile_buckets" -> ((s, d) =>
      Profile.quantileBuckets(
        t(s, d, "lineitem").select("l_orderkey", "l_linenumber", "l_extendedprice"),
        "l_extendedprice", n = 4)
        .orderBy(col("l_orderkey"), col("l_linenumber"))),
    // per-group z-score normalization ([EXT]): explicit decimal
    // moments, one canonical double expression (built-in stddev is
    // merge-order dependent)
    "q_zscore" -> ((s, d) =>
      Profile.zscoreNormalize(
        t(s, d, "lineitem")
          .select("l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice"),
        "l_returnflag", "l_extendedprice")
        .orderBy(col("l_orderkey"), col("l_linenumber"))),
    // percentile clipping ([EXT]): outlier guard before feature scaling
    "q_winsorize" -> ((s, d) =>
      Profile.winsorize(
        t(s, d, "lineitem").select("l_orderkey", "l_linenumber", "l_extendedprice"),
        "l_extendedprice", lo = 0.05, hi = 0.95)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice_w"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),
    "q_share_of_total" -> ((s, d) =>
      Profile.shareOfTotal(t(s, d, "lineitem"), "l_returnflag", "l_extendedprice")),
    // ---- anonymization (SURVEY §2.8) ----
    "q_anonymize" -> ((s, d) =>
      Anonymize.anonymize(t(s, d, "customer").select("c_custkey", "c_name"), Seq("c_name"))
        .orderBy(col("c_custkey"))),
    "q_vault" -> ((s, d) => Anonymize.vault(t(s, d, "customer"), "c_name").orderBy(col("original"))),
    // k-anonymity risk report ([EXT]): quasi-identifier group sizes —
    // the release gate hashing alone doesn't give
    "q_k_anonymity" -> ((s, d) =>
      Anonymize.kAnonymity(t(s, d, "customer"), Seq("c_nationkey", "c_mktsegment"), k = 5)),
    // l-diversity audit ([EXT]): distinct sensitive values per QI
    // group — k-anonymity's necessary complement
    "q_l_diversity" -> ((s, d) =>
      Anonymize.lDiversity(t(s, d, "customer"),
        Seq("c_nationkey", "c_mktsegment"), "c_acctbal")),
    // dynamic-partition backfill ([EXT]): one day's partition
    // overwritten with corrected values; every other partition must
    // survive untouched (partitionOverwriteMode=dynamic)
    "q_backfill" -> ((s, d) => {
      val dir = java.nio.file.Files.createTempDirectory("graft_backfill").toString
      val ev = graft.functions.TimeCol.instant(t(s, d, "events"))
        .withColumn("day", to_date(col("ts")))
      ev.repartition(col("day")) // day-clustered write (see q_partition_prune)
        .write.mode("overwrite").partitionBy("day").parquet(dir)
      val fixed = ev.where(col("day") === lit("2024-01-05").cast("date"))
        .withColumn("value", col("value") * 2)
      val prior = s.conf.getOption("spark.sql.sources.partitionOverwriteMode")
      s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      try fixed.write.mode("overwrite").partitionBy("day").parquet(dir)
      finally prior match {
        case Some(v) => s.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None    => s.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
      s.read.parquet(dir)
        .groupBy(col("day"))
        .agg(count(lit(1)).as("n_events"), Reports.dsum(col("value")).as("sum_value"))
        .orderBy(col("day"))
    }),
    "q_deanonymize" -> ((s, d) => {
      val cust = t(s, d, "customer").select("c_custkey", "c_name")
      val anon = Anonymize.anonymize(cust, Seq("c_name"))
      val vaultDf = Anonymize.vault(t(s, d, "customer"), "c_name")
      Anonymize.deanonymize(anon, vaultDf, "c_name")
        .select("c_custkey", "c_name").orderBy(col("c_custkey"))
    }),
    // ---- incremental ingest watermark (SURVEY §2.1 S4/A5) ----
    "q_incremental" -> ((s, d) => {
      // "existing" = a prior landed snapshot (here: the orders of the
      // first 100 customers); the slice is everything above its max id.
      val orders = t(s, d, "orders")
      val existing = orders.where(col("o_custkey") < 100)
      val w = Lake.maxWatermark(existing, "o_orderkey")
      Lake.incrementalSlice(orders, "o_orderkey", w)
        .select("o_orderkey", "o_custkey", "o_totalprice").orderBy(col("o_orderkey"))
    }),
    // deterministic hash-mod sampling ([EXT]): reproducible across
    // engines/runs/partitionings; nested subsets across rates
    "q_sample" -> ((s, d) =>
      Sampling.byHash(t(s, d, "orders").select("o_orderkey", "o_custkey", "o_totalprice"),
        "o_orderkey", 0.2).orderBy(col("o_orderkey"))),
    // exactly-k bottom-k sample ([EXT]): count-exact, nested, and
    // TakeOrderedAndProject-planned (per-partition top-k, no global
    // sort shuffle) — the deterministic reservoir
    "q_exact_sample" -> ((s, d) =>
      Sampling.exactSize(
        t(s, d, "documents").select("doc_id", "source"), "doc_id", 100)
        .orderBy(col("doc_id"))),
    // weighted exactly-k sample ([EXT], Efraimidis-Spirakis): the
    // count-exact form of quality-weighted corpus selection
    "q_weighted_reservoir" -> ((s, d) =>
      Sampling.weightedExactSize(
        t(s, d, "documents").select("doc_id", "source", "n_chars"),
        "doc_id", col("n_chars"), 100)
        .orderBy(col("doc_id"))),
    "q_stratified_sample" -> ((s, d) =>
      Sampling.stratifiedByHash(
        t(s, d, "lineitem").select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"),
        "l_orderkey", "l_returnflag", Map("A" -> 0.5, "N" -> 0.1), default = 0.02)
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))),
    // target-mixture sampling ([EXT]): per-domain rates derived from
    // target mix weights and actual counts, fr deliberately absent
    "q_mixture_sample" -> ((s, d) =>
      Sampling.mixtureSample(t(s, d, "documents").select("doc_id", "lang"),
        "doc_id", "lang",
        Map("en" -> 0.5, "zh" -> 0.2, "es" -> 0.2, "de" -> 0.1), fraction = 0.4)
        .orderBy(col("doc_id"))),
    // weighted sampling ([EXT]): keep probability = a per-row quality
    // proxy (longer docs likelier kept, capped at 1)
    "q_weighted_sample" -> ((s, d) =>
      Sampling.byWeight(t(s, d, "documents").select("doc_id", "n_chars"),
        "doc_id", least(lit(1.0), col("n_chars") / 2000.0)).orderBy(col("doc_id"))),
    // Poisson-bootstrap CI ([EXT]): error bars on a mean in ONE pass
    // — deterministic hash multiplicities against integer CDF
    // thresholds, B partial sums per task, certified end-to-end
    "q_bootstrap_ci" -> ((s, d) =>
      Sampling.bootstrapMeanCI(
        t(s, d, "lineitem").withColumn("rid",
          concat_ws(":", col("l_orderkey"), col("l_linenumber"))),
        "rid", col("l_extendedprice"), b = 100)),
    // domain cap ([EXT]): at most 10 docs per source, hash-chosen —
    // bounds any one source's contribution to a training mix
    "q_group_cap" -> ((s, d) =>
      Sampling.capPerGroup(t(s, d, "documents").select("doc_id", "source"),
        "doc_id", "source", 10).orderBy(col("doc_id"))),
    // deterministic epoch shuffle ([EXT]): shuffle_key is a pure
    // function of (seed, id) — reproducible training order
    "q_shuffle" -> ((s, d) =>
      Sampling.seededShuffle(t(s, d, "documents").select("doc_id", "lang"),
        "doc_id", "epoch1")),
    // CDC snapshot diff ([EXT] — S4's watermark only covers appends):
    // synthetic old/new snapshots derived deterministically from orders
    "q_snapshot_diff" -> ((s, d) => {
      val orders = t(s, d, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
      val prev = orders.where(col("o_orderkey") % 3 =!= 0)
      val next = orders.where(col("o_orderkey") % 7 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 5 === 0, col("o_totalprice") + 1)
            .otherwise(col("o_totalprice")))
      Lake.snapshotDiff(prev, next, Seq("o_orderkey")).orderBy(col("o_orderkey"))
    }),
    // MERGE/upsert ([EXT]): updates win on key collision, everything
    // else survives — the apply half of the CDC loop
    "q_upsert" -> ((s, d) => {
      val orders = t(s, d, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
      val updates = orders.where(col("o_orderkey") % 5 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1)
      Lake.upsertByKey(orders, updates, Seq("o_orderkey")).orderBy(col("o_orderkey"))
    }),
    // snapshot versioning ([EXT]): publish two immutable versions,
    // read back the PINNED first one — time travel must survive the
    // later publish (the reproducible-training-snapshot contract)
    // CSV corrupt-row quarantine ([EXT]): PERMISSIVE parse routes
    // malformed lines to _corrupt_record instead of failing the job —
    // the ETL-robustness contract; every doc_id % 50 == 0 line gets a
    // deterministic type-corrupt measure, the rest survive. The
    // driver-side collect builds the FIXTURE (bounded input file),
    // not the computation.
    "q_csv_quarantine" -> ((s, d) => {
      import s.implicits._
      val dir = java.nio.file.Files.createTempDirectory("graft_csvq").toString
      val lines = t(s, d, "documents").select(col("doc_id"), col("n_chars"))
        .orderBy(col("doc_id"))
        .collect().map { r =>
          val (id, nc) = (r.getLong(0), r.getLong(1))
          if (id % 50 == 0) s"$id,notanumber" else s"$id,$nc"
        }
      java.nio.file.Files.write(java.nio.file.Paths.get(dir, "docs.csv"),
        (Seq("doc_id,n_chars") ++ lines).mkString("\n").getBytes)
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("n_chars",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("_corrupt_record",
          org.apache.spark.sql.types.StringType)))
      val parsed = s.read.schema(schema)
        .option("header", "true").option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(s"$dir/docs.csv")
        .localCheckpoint() // corrupt-record visibility needs a materialized parse
      parsed.where(col("_corrupt_record").isNull)
        .select(col("doc_id"), col("n_chars"))
        .orderBy(col("doc_id"))
    }),
    // parquet schema evolution ([EXT]): two file generations with
    // different columns read as ONE table via mergeSchema — old files
    // surface the new column as NULL
    "q_schema_evolution" -> ((s, d) => {
      val dir = java.nio.file.Files.createTempDirectory("graft_evo").toString
      val cust = t(s, d, "customer")
      cust.where(col("c_custkey") % 2 === 0).select(col("c_custkey"), col("c_name"))
        .write.mode("overwrite").parquet(s"$dir/gen=1")
      cust.where(col("c_custkey") % 2 === 1)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        .write.mode("overwrite").parquet(s"$dir/gen=2")
      s.read.option("mergeSchema", "true").parquet(dir)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        .orderBy(col("c_custkey"))
    }),
    // partition-pruned read ([EXT]): hive-partitioned layout queried
    // through a partition filter — results certified through the
    // partitioned path (the reference's dropped-partitionBy fix, S6)
    "q_partition_prune" -> ((s, d) => {
      val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
      graft.functions.TimeCol.instant(t(s, d, "events"))
        .withColumn("day", to_date(col("ts")))
        // cluster by the partition column before the partitioned write:
        // without it every input task writes a file into every day —
        // the classic small-files explosion at scale
        .repartition(col("day"))
        .write.mode("overwrite").partitionBy("day").parquet(dir)
      s.read.parquet(dir)
        .where(col("day") === lit("2024-01-05").cast("date"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"))
        .orderBy(col("event_type"))
    }),
    // JSON-lines source round-trip ([EXT]): documents written as JSONL
    // and read back with schema inference — certifies the engine's
    // third file format end-to-end (escaping, nulls, type inference);
    // the oracle is the untouched source table
    "q_jsonl_roundtrip" -> ((s, d) => {
      val dir = java.nio.file.Files.createTempDirectory("graft_jsonl").toString
      t(s, d, "documents").select("doc_id", "lang", "source", "n_chars", "text")
        .write.mode("overwrite").json(dir)
      s.read.json(dir)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"), col("text"))
        .orderBy(col("doc_id"))
    }),
    // ORC source/sink round-trip ([EXT]): the other columnar format
    // Spark ships natively — same pushdown/pruning surface as parquet.
    // Events (timestamp + double + string cols) written to ORC and read
    // back; the oracle is the untouched source table, so the compare
    // certifies type fidelity (micros timestamps, IEEE doubles) across
    // the format boundary.
    "q_orc_roundtrip" -> ((s, d) => {
      val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString
      Lake.writeOrc(t(s, d, "events"), dir)
      Lake.readOrc(s, dir)
        .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
          col("user_id"), col("event_type"), col("value"), col("props"))
        .orderBy(col("event_id"))
    }),
    "q_time_travel" -> ((s, d) => {
      val root = java.nio.file.Files.createTempDirectory("graft_versions").toString
      val v1 = t(s, d, "customer").select(col("c_custkey"), col("c_acctbal"))
      Lake.writeVersion(v1, root)
      Lake.writeVersion(v1.withColumn("c_acctbal", col("c_acctbal") + 100), root)
      Lake.readVersion(s, root, 1).orderBy(col("c_custkey"))
    }),
    // the BOUNDED-REWRITE upsert against the on-disk key-bucketed
    // layout: materialize orders bucketed, MERGE the same update set
    // rewriting only touched buckets, read the merged table back.
    // Same contract, same oracle as q_upsert — this row proves the
    // at-scale CDC path end-to-end (layout + partition-pruned merge +
    // per-bucket swap), not just the in-memory merge expression.
    "q_upsert_partitioned" -> ((s, d) => {
      val orders = t(s, d, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
      val updates = orders.where(col("o_orderkey") % 5 === 0)
        .withColumn("o_totalprice", col("o_totalprice") + 1)
      val path = java.nio.file.Files.createTempDirectory("graft_upsert_kb")
        .resolve("orders").toString
      Lake.writeKeyBucketed(orders, path, Seq("o_orderkey"), numBuckets = 16)
      Lake.upsertByKeyPartitioned(s, path, updates, Seq("o_orderkey"), numBuckets = 16)
      Lake.readKeyBucketed(s, path).orderBy(col("o_orderkey"))
    }),
    // set difference ([EXT] §2.7): old-version rows gone from the new
    // snapshot (removed or replaced by an update)
    "q_except" -> ((s, d) => {
      val orders = t(s, d, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
      val prev = orders.where(col("o_orderkey") % 3 =!= 0)
      val next = orders.where(col("o_orderkey") % 7 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 5 === 0, col("o_totalprice") + 1)
            .otherwise(col("o_totalprice")))
      prev.except(next).orderBy(col("o_orderkey"))
    }),
    // set intersection ([EXT] §2.7): rows identical in both snapshots
    // (the unchanged complement of q_except's removed/replaced set)
    "q_intersect" -> ((s, d) => {
      val orders = t(s, d, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
      val prev = orders.where(col("o_orderkey") % 3 =!= 0)
      val next = orders.where(col("o_orderkey") % 7 =!= 0)
        .withColumn("o_totalprice",
          when(col("o_orderkey") % 5 === 0, col("o_totalprice") + 1)
            .otherwise(col("o_totalprice")))
      prev.intersect(next).orderBy(col("o_orderkey"))
    }),
    // temporal joins ([EXT]): as-of (union + one window, no range
    // cross-join) and bucketized interval join. Checkpoint rows
    // (event_id % 10 == 0) act as the slowly-changing right side.
    "q_asof" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"), col("value"))
      val ckpt0 = ev.where(col("event_id") % 10 === 0)
        .select(col("user_id"), col("ts_us"),
          col("event_id").as("ckpt_id"), col("value").as("ckpt_value"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"), col("ts_us")).orderBy(col("ckpt_id").desc)
      val ckpt = ckpt0.withColumn("__rn", row_number().over(w))
        .where(col("__rn") === 1).select("user_id", "ts_us", "ckpt_value")
      AsOf.asofJoin(
        ev.where(col("event_id") % 10 =!= 0).select("user_id", "ts_us", "event_id"),
        ckpt, "user_id", "ts_us", Seq("ckpt_value"))
        .select(col("event_id"), col("user_id"), col("ts_us"), col("ckpt_value"))
        .orderBy(col("event_id"))
    }),
    "q_range_join" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"))
      val win = ev.where(col("event_id") % 10 === 0)
        .select(col("event_id").as("win_id"), col("user_id"),
          col("ts_us").as("start_us"), (col("ts_us") + lit(1800000000L)).as("end_us"))
      AsOf.rangeJoin(ev.where(col("event_id") % 10 =!= 0), win,
        "user_id", "ts_us", "start_us", "end_us", bucketWidth = 1800000000L)
        .groupBy(col("win_id")).agg(count(lit(1)).as("n_events"))
        .orderBy(col("win_id"))
    }),
    // semi-structured payload parse ([EXT]): explicit schema, one
    // from_json per row, typed field projection
    "q_json_props" -> ((s, d) =>
      t(s, d, "events").select(
        col("event_id"), col("event_type"),
        Json.extract(col("props"), "k", "k BIGINT").as("k"))
        .orderBy(col("event_id"))),
    // unpivot/melt ([EXT]): wide metrics to (metric, value) rows
    "q_unpivot" -> ((s, d) =>
      Reshape.melt(
        t(s, d, "orders").select(col("o_orderkey"), col("o_totalprice"),
          col("o_custkey").cast("double").as("o_custkey_d")),
        Seq("o_orderkey"), Seq("o_totalprice", "o_custkey_d"))
        .orderBy(col("o_orderkey"), col("metric"))),
    // ---- event-time windows / sessionization (SURVEY §2.10 [EXT]) ----
    "q_windowed_counts" -> ((s, d) => Sessions.windowedCounts(t(s, d, "events"))),
    // cohort retention triangle ([EXT]): engagement analytics over the
    // events table
    "q_cohort_retention" -> ((s, d) => Reports.cohortRetention(t(s, d, "events"))),
    // cohort LTV curve ([EXT]): cumulative revenue per acquired user
    // — decimal cumsum over the bounded (cohort, offset) table
    "q_cohort_ltv" -> ((s, d) =>
      Reports.cohortLtv(graft.functions.TimeCol.instant(t(s, d, "events")))),
    // first-order event-transition matrix ([EXT]): the Markov view of
    // the clickstream — next-step features, funnel discovery
    "q_transitions" -> ((s, d) => Windows.transitions(t(s, d, "events"))),
    // stationary distribution ([EXT]): damped power iteration
    // (PageRank α=0.85) over the transition graph — exact integer
    // fixed-point units, so 20 distributed iterations hash-match the
    // oracle's unrolled SQL replay with zero float drift
    "q_stationary" -> ((s, d) => {
      val edges = Windows.transitions(t(s, d, "events"))
        .select("from_type", "to_type", "n")
      Graph.stationaryDistribution(edges, iters = 20)
    }),
    // interval sweep-line ([EXT]): peak-concurrency profile as a
    // distributed prefix sum — never a single-task global window
    "q_concurrency" -> ((s, d) => Windows.concurrencyProfile(t(s, d, "events"))),
    // batch sessionization ([EXT]): 30-min gap rule as lag + running
    // sum — the replayable complement of the streaming session_window
    "q_sessions_batch" -> ((s, d) =>
      Windows.sessionizeBatch(t(s, d, "events"), gapUs = 1800000000L)),
    // interval-overlap join ([EXT]): concurrent cross-user session
    // pairs — the interval×interval member of the temporal-join
    // family. Bucketized equi-join + first-shared-bucket filter, never
    // a theta cross-join; the oracle spells the same pairs as a plain
    // inequality self-join over the session CTE.
    "q_interval_join" -> ((s, d) => {
      val sess = Windows.sessionizeBatch(t(s, d, "events"), gapUs = 1800000000L)
        .select(col("user_id"), col("session_seq"), col("start_us"), col("end_us"))
      val a = sess.select(col("user_id").as("user_a"), col("session_seq").as("seq_a"),
        col("start_us").as("start_a"), col("end_us").as("end_a"))
      val b = sess.select(col("user_id").as("user_b"), col("session_seq").as("seq_b"),
        col("start_us").as("start_b"), col("end_us").as("end_b"))
      AsOf.intervalJoin(a, b, Nil, "start_a", "end_a", "start_b", "end_b",
        bucketWidth = 3600000000L)
        .where(col("user_a") < col("user_b"))
        .select(col("user_a"), col("seq_a"), col("user_b"), col("seq_b"),
          (least(col("end_a"), col("end_b")) -
            greatest(col("start_a"), col("start_b"))).as("overlap_us"))
        .orderBy(col("user_a"), col("seq_a"), col("user_b"), col("seq_b"))
    }),
    // SCD Type-2 build ([EXT]): the event log collapsed into validity
    // intervals per (user, event_type run) — the point-in-time
    // dimension shape the as-of join then consumes
    "q_scd2" -> ((s, d) =>
      Windows.scd2(t(s, d, "events"), "user_id", "event_type", "event_id")),
    // incremental SCD2 maintenance ([EXT]): history folded with an
    // append-only batch touching only current rows — the oracle
    // replays the from-scratch build over the full log, so the
    // compare IS the merge==scratch proof
    "q_scd2_merge" -> ((s, d) => {
      val ev = graft.functions.TimeCol.instant(t(s, d, "events"))
      val cut = lit("2024-01-15 00:00:00").cast("timestamp")
      Windows.scd2Merge(
        Windows.scd2(ev.where(col("ts") < cut), "user_id", "event_type", "event_id"),
        ev.where(col("ts") >= cut), "user_id", "event_type", "event_id")
    }),
    // point-in-time lookup ([EXT]): each purchase joined as-of against
    // the SCD2 run table built from the user's NON-purchase events —
    // the composition the SCD shape exists for (DuckDB oracles it
    // with its native ASOF JOIN)
    "q_scd2_lookup" -> ((s, d) => {
      val ev = t(s, d, "events")
      val dim = Windows.scd2(ev.where(col("event_type") =!= "purchase"),
          "user_id", "event_type", "event_id")
        .select(col("user_id"), col("valid_from_us").as("us"),
          col("event_type").as("state"))
      val purchases = graft.functions.TimeCol.instant(ev)
        .where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
      AsOf.asofJoin(purchases, dim, "user_id", "us", Seq("state"))
        .orderBy(col("event_id"))
    }),
    // incremental histogram maintenance ([EXT]): 3 disjoint shards
    // merged; the oracle computes the histogram from scratch — the
    // compare IS the merge==scratch proof
    "q_hist_merge" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      Profile.histogramMerge(
        (0 to 2).map(i => Profile.histogramShard(
          li.where(col("l_orderkey") % 3 === i), "l_extendedprice",
          lo = 0.0, hi = 110000.0, nBins = 11)),
        nBins = 11)
    }),
    // time-weighted average ([EXT]): piecewise-constant mean over
    // irregular samples — a plain mean over-weights sample bursts
    "q_time_weighted" -> ((s, d) => Windows.timeWeighted(t(s, d, "events"))),
    // chi-square contingency cells ([EXT]): categorical-association
    // drift (lang x source), zero cells included via the full spine
    "q_chi2" -> ((s, d) => Profile.chi2Cells(t(s, d, "documents"), "lang", "source")),
    // Cramér's V ([EXT]): the N-free effect size over the chi² cells
    // — rounded-then-decimal term sum, one guarded sqrt finish
    "q_cramers_v" -> ((s, d) => Profile.cramersV(t(s, d, "documents"), "lang", "source")),
    // forward fill / LOCF ([EXT]): deterministic synthetic gaps
    // (event_id % 7) filled per user; ts drives the frame order but
    // stays out of the output (nanos-vs-micros render across engines)
    "q_gap_fill" -> ((s, d) => {
      val ev = t(s, d, "events").select(col("event_id"), col("user_id"), col("ts"),
        when(col("event_id") % 7 === 0, lit(null)).otherwise(col("value"))
          .as("value"))
      Windows.forwardFill(ev, "user_id", "ts", "value", "event_id")
        .select("event_id", "user_id", "value", "value_filled")
    }),
    // ordered funnel: min-ts-after-previous-step, one shuffle key (user)
    "q_funnel" -> ((s, d) =>
      Reports.funnel(t(s, d, "events"), Seq("view", "click", "purchase"))),
    // funnel velocity ([EXT]): median/p90 step-to-step gap on the same
    // earliest-qualifying-times chain — the slow-step diagnosis
    "q_funnel_timing" -> ((s, d) =>
      Reports.funnelTiming(graft.functions.TimeCol.instant(t(s, d, "events")),
        Seq("view", "click", "purchase"))),
    // session-scoped funnel ([EXT]): conversion within the 30-min
    // session, not the user's whole history — the product-analytics
    // number (funnel ∘ sessionIds composition)
    "q_session_funnel" -> ((s, d) =>
      Reports.sessionFunnel(t(s, d, "events"),
        Seq("view", "click", "purchase"), gapUs = 1800000000L)),
    // last-touch attribution ([EXT]): the channel that actually
    // preceded each conversion, 'direct' outside the 7-day lookback
    "q_attribution" -> ((s, d) =>
      Reports.lastTouchAttribution(t(s, d, "events"))),
    // U-shaped multi-touch attribution ([EXT]): fractional credit per
    // channel, decimal-rounded BEFORE summing (partitioning-blind)
    "q_attribution_position" -> ((s, d) =>
      Reports.positionAttribution(t(s, d, "events"))),
    // co-bucketed join through the on-disk bucketed layout ([EXT]):
    // both sides written bucketed+sorted on the join key, then joined
    // exchange-free (BucketingSpec asserts the no-Exchange plan; this
    // row certifies the RESULTS through the same path)
    "q_bucket_join" -> ((s, d) => {
      val root = java.nio.file.Files.createTempDirectory("graft_bjoin").toString
      val sfx = java.lang.Long.toHexString(System.nanoTime())
      Bucketing.writeBucketed(
        t(s, d, "lineitem").select(col("l_orderkey").as("orderkey"),
          col("l_linenumber"), col("l_extendedprice")),
        s"bj_fact_$sfx", "orderkey", 8, s"$root/fact")
      Bucketing.writeBucketed(
        t(s, d, "orders").select(col("o_orderkey").as("orderkey"), col("o_totalprice")),
        s"bj_dim_$sfx", "orderkey", 8, s"$root/dim")
      Bucketing.coLocatedJoin(s, s"bj_fact_$sfx", s"bj_dim_$sfx", "orderkey")
        .orderBy(col("orderkey"), col("l_linenumber"))
    }),
    // referential-integrity audit over the star schema's FK edges
    "q_integrity" -> ((s, d) => Profile.integrityAudit(Seq(
      ("lineitem.l_orderkey->orders", t(s, d, "lineitem"), "l_orderkey",
        t(s, d, "orders"), "o_orderkey"),
      ("lineitem.l_partkey->part", t(s, d, "lineitem"), "l_partkey",
        t(s, d, "part"), "p_partkey"),
      ("lineitem.l_suppkey->supplier", t(s, d, "lineitem"), "l_suppkey",
        t(s, d, "supplier"), "s_suppkey"),
      ("orders.o_custkey->customer", t(s, d, "orders"), "o_custkey",
        t(s, d, "customer"), "c_custkey")))),
    // CMS heavy-hitter probe: per-source sketch shards, driver-merged
    // (sketch bytes only); rows-only — Spark's CMS hash family isn't
    // reproducible in SQL, accuracy laws live in ProfileSpec
    "q_cms_heavy_hitters" -> ((s, d) => {
      val toks = t(s, d, "documents").select(col("source"),
        explode(Text.tokens(lower(col("text")))).as("term"))
      Profile.cmsEstimates(Profile.cmsShards(toks, "source", "term"),
        Seq("join", "hash", "row", "batch", "scan", "column"))
    }),
    // DDSketch mergeable quantiles ([EXT]): relative-error p50/p90/p99
    // per group, self-priced against the exact percentile; rows-only —
    // the sketch is engine-private, alpha-bound laws in ProfileSpec
    "q_dd_quantiles" -> ((s, d) =>
      Profile.ddQuantiles(t(s, d, "lineitem"), "l_returnflag", "l_extendedprice")),
    // DDSketch bucket histogram ([EXT]): the sketch's data-touching
    // stage hash-certified — ceil(ln(x)/ln(gamma)) on exact integer
    // cents is replayable IEEE arithmetic (unlike the estimates);
    // built through the REAL aggregator, not a parallel SQL spelling
    "q_dd_buckets" -> ((s, d) =>
      Profile.ddBucketCounts(
        t(s, d, "lineitem").select(
          (col("l_extendedprice") * 100).cast("long").as("cents")),
        "cents")),
    // EXACT order statistic ([EXT]): the median of the fact measure
    // in cents, by iterative range-narrowing histograms — ≤ 6 pushed-
    // filter scans and zero shuffles at ANY scale, where a sort-based
    // median is a full-data shuffle. The oracle is the plain
    // ORDER BY/OFFSET spelling.
    // floor() on BOTH sides: a bare cast diverges — Spark double→long
    // TRUNCATES while DuckDB CAST AS BIGINT ROUNDS, and ~5.6% of
    // l_extendedprice*100 doubles sit just below their integer (e.g.
    // 17.95*100 = 1794.999…), so the multisets would differ and the
    // match would be data-luck
    "q_exact_median" -> ((s, d) =>
      Profile.exactMedianLong(
        t(s, d, "lineitem").select(
          floor(col("l_extendedprice") * 100).cast("long").as("cents")),
        "cents")),
    // EXACT heavy hitters ([EXT]): Misra-Gries candidate pass (≤ 32
    // counters shuffled, never the distinct-key space) + exact
    // recount of the candidates — deterministic superset guarantee
    // makes the output the EXACT set of tokens above n/(k+1), so this
    // row hash-certifies against a plain GROUP BY/HAVING oracle,
    // unlike the CMS row above
    "q_heavy_hitters" -> ((s, d) => {
      val toks = t(s, d, "documents")
        .select(explode(Text.tokens(lower(col("text")))).as("term"))
        .where(length(col("term")) > 0)
      Profile.heavyHitters(toks, "term", capacity = 32)
    }),
    // stream-stream correlation shape on its batch twin: clicks
    // followed by a same-user event of another type within 10 min
    "q_stream_correlate" -> ((s, d) => {
      val ev = t(s, d, "events")
      Sessions.streamCorrelate(
        ev.where(col("event_type") === "click"),
        ev.where(col("event_type") =!= "click"))
        .orderBy(col("left_id"), col("right_id"))
    }),
    "q_sliding_counts" -> ((s, d) => Sessions.slidingCounts(t(s, d, "events"))),
    "q_sessionize" -> ((s, d) => Sessions.sessionize(t(s, d, "events"))),
    // the streaming ingest LOOP end-to-end, oracled: documents split
    // into 3 deterministic batches (doc_id % 3), replayed through
    // streamIngestDedup (one file per trigger, order pinned via
    // mtimes), final corpus read back. The end state is deterministic
    // — per content fingerprint the keeper is the min-id doc of the
    // earliest batch containing it — so plain SQL can replay it.
    "q_stream_ingest_final" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val root = java.nio.file.Files.createTempDirectory("graft_ingest_e2e").toString
      (0 until 3).foreach { b =>
        docs.where(pmod(col("doc_id"), lit(3)) === b).coalesce(1)
          .write.mode("overwrite").parquet(s"$root/in/f$b")
        new java.io.File(s"$root/in/f$b").listFiles()
          .foreach(f => { f.setLastModified(1600000000000L + b * 60000L); () })
      }
      val schema = s.read.parquet(s"$root/in/f0").schema
      val q = graft.streaming.Sessions.streamIngestDedup(
        s.readStream.schema(schema).option("maxFilesPerTrigger", "1")
          .parquet(s"$root/in/*"),
        s"$root/corpus", s"$root/index", s"$root/bloom", s"$root/ckpt")
      q.awaitTermination(300000)
      s.read.parquet(s"$root/corpus").select("doc_id", "text").orderBy("doc_id")
    }),
    // ---- text analysis (SURVEY §2.2 [EXT]) ----
    // Flesch reading-ease ([EXT]): words/sentences/vowel-group
    // syllables, one rounded IEEE chain — the classic readability
    // feature beside the Gopher battery
    "q_readability" -> ((s, d) => {
      val c = col("text")
      t(s, d, "documents").select(col("doc_id"),
          Text.tokenCount(c).cast("long").as("n_words"),
          Text.sentenceCount(c).cast("long").as("n_sentences"),
          Text.syllableCount(c).cast("long").as("n_syllables"),
          Text.fleschScore(c).as("flesch"))
        .orderBy(col("doc_id"))
    }),
    "q_doc_stats" -> ((s, d) => {
      graft.expressions.GraftFunctions.register(s)
      val c = col("text")
      t(s, d, "documents").select(
        col("doc_id"),
        Text.tokenCount(c).cast("long").as("n_tokens"),
        Text.bpeTokenCount(c).cast("long").as("n_bpe_tokens"),
        graft.expressions.GraftFunctions.rollingHash(c).as("rolling_hash"),
        Text.nonSpaceChars(c).cast("long").as("n_nonspace"),
        Text.digitCount(c).cast("long").as("n_digits"),
        Text.punctCount(c).cast("long").as("n_punct"),
        Text.avgTokenLen(c).as("avg_token_len"),
        Text.digitRatio(c).as("digit_ratio"),
        Text.stopwordRatio(c).as("stopword_ratio"),
        Text.fingerprint(c).as("fingerprint")).orderBy(col("doc_id"))
    }),
    "q_lang_id" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), col("lang"), Text.langId(col("text")).as("lang_pred"))
        .orderBy(col("doc_id"))),
    "q_quality_filter" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), Text.isQuality(col("text")).as("keep"))
        .orderBy(col("doc_id"))),
    // ---- corpus hygiene ([EXT]): PII scrub, web-text normalization,
    // repetition signals, benchmark decontamination, chunking, tf-idf.
    // The PII/markup fixtures are appended deterministically to the
    // documents text (the synthetic corpus has none), IDENTICALLY in
    // the oracle SQL — so the redaction/normalization genuinely fires.
    // URL surface ([EXT]): synthesized crawl URLs parsed back through
    // parse_url + canonicalized (tracking params stripped) — every
    // part certified against table-stated expectations
    "q_url_meta" -> ((s, d) => {
      val url = concat(lit("https://"), col("source"), lit(".Example.com/docs/"),
        col("doc_id"), lit("?utm_source=feed&lang="), col("lang"), lit("&fbclid=x1"))
      t(s, d, "documents").select(col("doc_id"), url.as("__u"))
        .select(col("doc_id"),
          graft.functions.Urls.host(col("__u")).as("host"),
          graft.functions.Urls.domain(col("__u")).as("domain"),
          graft.functions.Urls.path(col("__u")).as("path"),
          graft.functions.Urls.queryParam(col("__u"), "lang").as("q_lang"),
          graft.functions.Urls.stripTracking(col("__u")).as("canonical_url"))
        .orderBy(col("doc_id"))
    }),
    "q_pii_scrub" -> ((s, d) => {
      val aug = concat(col("text"), lit(" reach user"), col("doc_id"),
        lit("@mail.example.com or 555-867-5309 ssn 123-45-6789 host 10.0.0."),
        col("doc_id") % 250)
      t(s, d, "documents").select(
        col("doc_id"),
        Scrub.emailCount(aug).cast("long").as("n_emails"),
        Scrub.ssnCount(aug).cast("long").as("n_ssns"),
        Scrub.phoneCount(aug).cast("long").as("n_phones"),
        Scrub.ipCount(aug).cast("long").as("n_ips"),
        Scrub.piiScrub(aug).as("scrubbed")).orderBy(col("doc_id"))
    }),
    "q_normalize" -> ((s, d) => {
      val aug = concat(lit("<div class=\"doc\"> "), col("text"),
        lit(" &amp; more&nbsp;text <br/> </div>"))
      t(s, d, "documents")
        .select(col("doc_id"), Scrub.normalizeText(aug).as("normalized"))
        .orderBy(col("doc_id"))
    }),
    // Unicode NFC canonicalization ([EXT]): the codepoint-level
    // normalization Scrub.normalizeText doesn't do — a deterministic
    // decomposed suffix (e + combining acute) is appended so the
    // compare proves real composition (norm_len == raw_len - 1), via
    // the native graft_unicode_normalize codegen Expression against
    // DuckDB's independent nfc_normalize implementation
    "q_nfc_normalize" -> ((s, d) => {
      val aug = concat(col("text"), lit("e" + '\u0301'))
      val norm = graft.expressions.GraftFunctions.unicodeNormalize(aug, "NFC")
      t(s, d, "documents")
        .select(col("doc_id"), norm.as("norm_text"),
          length(norm).as("norm_len"), length(aug).as("raw_len"))
        .orderBy(col("doc_id"))
    }),
    "q_repetition" -> ((s, d) => CorpusStats.repetitionSignals(t(s, d, "documents"))),
    // benchmark set = every 41st doc; the rest is the training corpus
    "q_decontaminate" -> ((s, d) => {
      val docs = t(s, d, "documents")
      Ngrams.decontaminate(
        docs.where(col("doc_id") % 41 =!= 0),
        docs.where(col("doc_id") % 41 === 0))
    }),
    // graded contamination: rate over the doc's own distinct grams,
    // same 41-modulus benchmark split as q_decontaminate
    "q_contamination_rate" -> ((s, d) => {
      val docs = t(s, d, "documents")
      Ngrams.contaminationRate(
        docs.where(col("doc_id") % 41 =!= 0),
        docs.where(col("doc_id") % 41 === 0))
    }),
    // fuzzy benchmark leakage ([EXT]): minhash near-match against the
    // same 41-modulus benchmark split — catches paraphrased/partially
    // quoted eval items the exact 8-gram screen misses
    "q_decontaminate_near" -> ((s, d) => {
      val docs = t(s, d, "documents")
      Ngrams.decontaminateNear(
        docs.where(col("doc_id") % 41 =!= 0),
        docs.where(col("doc_id") % 41 === 0))
    }),
    "q_chunk" -> ((s, d) => Ngrams.chunk(t(s, d, "documents"))),
    // substring-level dedup signal ([EXT]): spans shared across docs —
    // trigrams so the synthetic corpus yields shared spans; production
    // uses ~50-gram spans per the substring-dedup literature
    "q_dup_spans" -> ((s, d) => Ngrams.dupSpans(t(s, d, "documents"), n = 3)),
    // inter-source overlap matrix ([EXT]): which sources republish
    // each other — trigrams so the synthetic corpus yields a dense
    // matrix; production uses longer grams
    "q_source_overlap" -> ((s, d) =>
      Ngrams.sourceOverlap(t(s, d, "documents"), n = 3)),
    // winnowing fingerprints ([EXT]): MOSS window-min selection over
    // rolling gram hashes — trigrams/w=4 so the synthetic corpus
    // selects densely; production uses ~5-grams with w~50
    "q_winnow" -> ((s, d) =>
      Ngrams.winnowFingerprints(t(s, d, "documents"), n = 3, w = 4)),
    // winnowed passage-overlap pairs ([EXT]): substring-level
    // complement of the minhash whole-document near-dup join
    "q_winnow_overlap" -> ((s, d) =>
      Ngrams.winnowOverlap(t(s, d, "documents"), n = 3, w = 4, minShared = 5)),
    "q_tfidf" -> ((s, d) => CorpusStats.tfIdf(t(s, d, "documents"))),
    // BM25 top-k retrieval ([EXT]): the query-term filter lands before
    // any shuffle — the aggregate never sees the corpus vocabulary
    "q_bm25" -> ((s, d) =>
      CorpusStats.bm25(t(s, d, "documents"), Seq("join", "hash", "window"))),
    // PMI collocations ([EXT]): adjacent-pair lift over corpus
    // unigram/bigram distributions
    "q_pmi" -> ((s, d) => CorpusStats.pmiCollocations(t(s, d, "documents"))),
    // shared-prefix boilerplate detection ([EXT]): k=3 so the synthetic
    // corpus yields shared prefixes; production uses ~20-50 tokens
    "q_boilerplate" -> ((s, d) =>
      CorpusStats.boilerplatePrefixes(t(s, d, "documents"), k = 3)),
    // PSI drift report ([EXT]): price distribution across an orderkey
    // split; fixed bin edges so runs stay comparable
    "q_psi_drift" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      Profile.psiDrift(li.where(col("l_orderkey") % 2 === 0),
        li.where(col("l_orderkey") % 2 === 1), "l_extendedprice",
        lo = 0.0, hi = 110000.0, nBins = 11)
    }),
    // exact covariance matrix ([EXT]): micro-unit integer moments, the
    // labelCentroids exactness discipline over dimension pairs
    "q_embedding_cov" -> ((s, d) =>
      Similarity.embeddingCovariance(t(s, d, "embeddings"), dim = 64)),
    // vocab coverage ([EXT]): top-20 of the synthetic corpus's 31
    // distinct tokens, so OOV discriminates; production uses 32k-256k
    "q_vocab_coverage" -> ((s, d) =>
      CorpusStats.vocabCoverage(t(s, d, "documents"), vocabSize = 20)),
    // unigram-LM document scoring ([EXT]): perplexity-proxy quality signal
    "q_unigram_logprob" -> ((s, d) => CorpusStats.unigramLogprob(t(s, d, "documents"))),
    // context-aware LM score ([EXT]): Laplace-smoothed bigram model —
    // catches shuffled-real-word spam the unigram score cannot see
    "q_bigram_logprob" -> ((s, d) => CorpusStats.bigramLogprob(t(s, d, "documents"))),
    // LM perplexity gate ([EXT]): keep docs whose per-bigram average
    // logprob clears the bar — the CCNet-style quality filter; the
    // kept SET is engine-exact because the threshold compares the
    // ROUNDED average
    "q_lm_filter" -> ((s, d) =>
      CorpusStats.lmQualityFilter(t(s, d, "documents"), minAvgLogprob = -3.42)),
    // token-blocklist scrub ([EXT]): stopword/markup removal as a
    // literal-array filter riding the scan — zero joins, zero shuffles
    "q_blocklist_scrub" -> ((s, d) =>
      CorpusStats.removeBlockedTokens(t(s, d, "documents"),
        Seq("a", "the", "and", "of", "to", "in"))),
    // per-source type/token diversity ([EXT]): templated/generated
    // sources show collapsed bigram ratios
    "q_ngram_diversity" -> ((s, d) => CorpusStats.ngramDiversity(t(s, d, "documents"))),
    // mergeable document-frequency maintenance ([EXT]): three disjoint
    // pmod shards folded by dfMerge must equal the direct corpus df —
    // the incremental-stats contract a streaming ingest relies on
    "q_df_incremental" -> ((s, d) => {
      val docs = t(s, d, "documents")
      CorpusStats.dfMerge(
        (0 until 3).map(b =>
          CorpusStats.dfShard(docs.where(pmod(col("doc_id"), lit(3)) === b))): _*)
    }),
    // character-class composition ([EXT]): the mojibake/binary-junk
    // structural gate; classes partition the doc's length
    "q_char_classes" -> ((s, d) =>
      t(s, d, "documents").select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars"),
        Text.alphaCount(col("text")).cast("long").as("n_alpha"),
        Text.digitCount(col("text")).cast("long").as("n_digits"),
        Text.whitespaceCount(col("text")).cast("long").as("n_space"),
        Text.punctCount(col("text")).cast("long").as("n_punct"),
        Text.replacementCharCount(col("text")).cast("long").as("n_replacement"))
        .orderBy(col("doc_id"))),
    "q_token_entropy" -> ((s, d) => CorpusStats.tokenEntropy(t(s, d, "documents"))),
    // tokenizer induction ([EXT]): the first BPE merge's pair counts
    "q_bpe_pairs" -> ((s, d) => CorpusStats.bpePairCounts(t(s, d, "documents"))),
    // full BPE training loop ([EXT]): rows-only by design — the
    // iterative driver loop has no SQL oracle (like the ML baseline);
    // BpeSpec verifies against an independent reference implementation
    "q_bpe_train" -> ((s, d) =>
      graft.operators.Bpe.trainAsDataFrame(s, t(s, d, "documents"), nMerges = 12)),
    // per-source dataset card ([EXT]): the release summary table —
    // volumes, length spread, language mix, quality-gate share
    "q_corpus_card" -> ((s, d) => CorpusStats.corpusCard(t(s, d, "documents"))),
    // blocked fuzzy match ([EXT]): the part-name dictionary vs its
    // last-char-dropped corruption (deterministic, mirrored in SQL) —
    // suffix typos survive the first-token blocking by construction
    "q_fuzzy_match" -> ((s, d) => {
      val names = t(s, d, "part").select(col("p_name"))
      val corrupted = names
        .select(expr("substring(p_name, 1, length(p_name) - 1)").as("q_name"))
      Fuzzy.blockedMatch(corrupted, names, "q_name", "p_name", maxDist = 2)
    }),
    // Jaro-Winkler near-name pairs ([EXT]): the codegen Expression
    // scored UNROUNDED against DuckDB's NATIVE jaro_winkler_similarity
    // — two independent implementations agreeing bit-for-bit
    "q_jaro_pairs" -> ((s, d) =>
      Fuzzy.jaroWinklerPairs(t(s, d, "part"), "p_name", minSim = 0.85)),
    // exact triangle count ([EXT]): degree-ordered orientation over
    // the co-purchase graph (parts sharing a high-quantity order) —
    // hub wedges charged to low-degree endpoints, O(m^1.5) bound
    "q_triangles" -> ((s, d) => Graph.triangleCount(copurchaseEdges(s, d))),
    // degree distribution ([EXT]): the hub/power-law fingerprint —
    // histogram bounded by max degree, never node count
    "q_degree_dist" -> ((s, d) => Graph.degreeDistribution(copurchaseEdges(s, d))),
    // dedup cluster-size profile ([EXT]): the corpus-duplication
    // fingerprint over the same CC assignment
    "q_cluster_sizes" -> ((s, d) =>
      Dedup.clusterSizeProfile(t(s, d, "documents"), threshold = 0.5)),
    // local clustering coefficient ([EXT]): community cores vs pure
    // hubs per part — the same machinery, per-corner credit
    "q_clustering_coef" -> ((s, d) => Graph.localClustering(copurchaseEdges(s, d))),
    // market-basket association rules ([EXT]): pairwise support /
    // confidence / lift over order baskets, exact counts + one IEEE
    // expression per ratio
    "q_market_basket" -> ((s, d) =>
      Reports.associationRules(t(s, d, "lineitem"), "l_orderkey", "l_partkey",
        minPairCount = 2)),
    // lagged cross-correlation ([EXT]): does view activity predict
    // purchases k days out — daily-aggregate-first, bounded spine join
    "q_lag_corr" -> ((s, d) =>
      Windows.lagCorrelation(t(s, d, "events"), "view", "purchase", maxLag = 7)),
    // TPC-H Q3 shape: unshipped-backlog revenue top-10 — pushed
    // filters, broadcast segment keys, top-k on the EXACT decimal
    // TPC-H Q5 shape: 6-table star join, region filter broadcast down,
    // cross-dimension c_nationkey = s_nationkey on the join keys
    // streaming quantile monitor ([EXT]) in its batch twin: DDSketch
    // carried in keyed state, p50/p99 per type — rows-only (sketch
    // estimates are engine-private; stream==batch law in SessionsSpec)
    "q_quantile_monitor" -> ((s, d) =>
      Sessions.quantileMonitor(graft.functions.TimeCol.instant(t(s, d, "events")))
        .toDF().orderBy(col("event_type"))),
    // streaming distinct monitor ([EXT]) in its batch twin: KMV in
    // keyed state — portable fp60 + the kmvEstimate arithmetic make
    // this streaming monitor ORACLE-certifiable
    "q_distinct_monitor" -> ((s, d) =>
      Sessions.distinctMonitor(t(s, d, "events"))
        .toDF().orderBy(col("event_type"))),
    "q_tpch_q5" -> ((s, d) =>
      Reports.localSupplierVolume(t(s, d, "customer"), t(s, d, "orders"),
        t(s, d, "lineitem"), t(s, d, "supplier"), t(s, d, "nation"),
        t(s, d, "region"), "ASIA", "1996-01-01", "1998-01-01")),
    // one-row NB evaluation summary: accuracy + Cohen's kappa (the
    // chance-corrected agreement a majority-class baseline can't fake)
    "q_nb_summary" -> ((s, d) =>
      graft.ml.NaiveBayes.summary(t(s, d, "documents"))),
    "q_shipping_priority" -> ((s, d) =>
      Reports.shippingPriority(t(s, d, "customer"), t(s, d, "orders"),
        t(s, d, "lineitem"), "BUILDING", "1998-06-01")),
    // rolling median ([EXT]): order-statistic smoothing per key —
    // exact percentile as a WINDOW aggregate, despikes where EWMA can't
    "q_rolling_median" -> ((s, d) => Windows.rollingMedian(t(s, d, "events"))),
    // seasonal-residual anomaly flags ([EXT]): (type, weekday) mean
    // baseline, MAD-scaled residual, |score| > 3 on the ROUNDED score
    "q_ts_anomaly" -> ((s, d) =>
      Windows.seasonalAnomalies(graft.functions.TimeCol.instant(t(s, d, "events")))),
    // Naive Bayes as pure dataflow ([EXT]): train/predict/confusion
    // entirely in aggregates+joins — the oracle replays the whole
    // chain, certifying a TRAINED model cross-engine
    "q_nb_confusion" -> ((s, d) =>
      graft.ml.NaiveBayes.confusion(t(s, d, "documents"))),
    // per-class precision/recall/F1 over the same held-out matrix —
    // the evaluation sheet, engine-exact ratios from exact counts
    "q_nb_metrics" -> ((s, d) =>
      graft.ml.NaiveBayes.metrics(t(s, d, "documents"))),
    // decile gains/lift table ([EXT]): the targeting view of a scorer
    // — positional ntiles, response/capture/lift per tile
    "q_gains" -> ((s, d) =>
      Reports.gainsTable(
        t(s, d, "documents")
          .withColumn("y", when(col("lang") === "en", 1L).otherwise(0L)),
        "n_chars", "y", "doc_id")),
    // gaps-and-islands activity streaks ([EXT]): epoch-day minus
    // row_number labels each contiguous run per type
    "q_streaks" -> ((s, d) =>
      Windows.activityStreaks(graft.functions.TimeCol.instant(t(s, d, "events")))),
    // Mann-Kendall trend test ([EXT]): distribution-free monotonicity
    // — exact integer S over the bounded daily table, guarded z chain
    "q_trend_test" -> ((s, d) =>
      Windows.mannKendall(graft.functions.TimeCol.instant(t(s, d, "events")))),
    // CUSUM control chart ([EXT]): sustained-drift alarms via the
    // prefix-sum unroll, all integer micro-units (frame-order-proof)
    "q_cusum" -> ((s, d) =>
      Windows.cusum(graft.functions.TimeCol.instant(t(s, d, "events")))),
    // session exit rates ([EXT]): share of each event type's
    // occurrences that ended a session — sessionIds composition
    "q_exit_rates" -> ((s, d) => Windows.exitRates(t(s, d, "events"))),
    // new-vs-returning daily split ([EXT]): acquisition vs retention
    // over the distinct (user, day) table
    "q_new_returning" -> ((s, d) =>
      Windows.newVsReturning(graft.functions.TimeCol.instant(t(s, d, "events")))),
    // EXACT Gini coefficient ([EXT]): rank-weighted identity on the
    // prefix-sum skeleton, tie-proof integer moments
    "q_gini" -> ((s, d) => Profile.giniExact(t(s, d, "documents"), "n_chars")),
    // Lorenz curve ([EXT]): the decile view behind the Gini number —
    // positional tiles, exact decimal shares
    "q_lorenz" -> ((s, d) =>
      Profile.lorenzCurve(t(s, d, "documents"), "n_chars", "doc_id")),
    // concentration indices ([EXT]): HHI + effective category count
    // per column — the training-mix diversification check
    "q_concentration" -> ((s, d) =>
      Profile.concentration(t(s, d, "documents"), Seq("source", "lang"))),
    // EXACT two-sample KS drift ([EXT]): sup|ECDF diff| as integer
    // cross-products over the distinct-value table, dual prefix sums
    // on one distributed sort
    "q_ks_drift" -> ((s, d) =>
      Profile.ksDrift(t(s, d, "documents"), "source", "n_chars", "src0", "src1")),
    // EXACT distributed AUC ([EXT]): rank-sum identity on the
    // distinct-score table + the distributed prefix-sum skeleton —
    // never per-pair, never a one-task global rank window
    "q_auc" -> ((s, d) =>
      Profile.aucExact(
        t(s, d, "documents")
          .withColumn("y", when(col("lang") === "en", 1L).otherwise(0L)),
        "n_chars", "y")),
    // sparse tf-idf cosine join ([EXT]): df-capped inverted index —
    // the WEIGHTED near-dup complement of q_jaccard_join
    "q_sparse_cosine" -> ((s, d) =>
      SetSimilarity.sparseCosineJoin(t(s, d, "documents"))),
    // hashing-trick featurizer ([EXT]): vocabulary-free fixed-width
    // features, signed-tf longs — exact, no float anywhere
    "q_hash_features" -> ((s, d) =>
      CorpusStats.hashFeatures(t(s, d, "documents"))),
    // top user paths ([EXT]): the real sequences product analytics
    // reads before hypothesizing a funnel
    "q_user_paths" -> ((s, d) => Reports.userPaths(t(s, d, "events"))),
    // ABC / Pareto classes ([EXT]): global ordered cumsum on the
    // shared prefix-sum skeleton — never a single-task window
    "q_abc_analysis" -> ((s, d) => {
      val rev = t(s, d, "lineitem").groupBy(col("l_partkey"))
        .agg((sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast(DecimalType(18, 4))) * 10000).cast("long").as("units"))
      Reports.abcAnalysis(rev, "l_partkey", "units")
    }),
    // RFM quintiles ([EXT]): positional ntile over total orders —
    // monetary buckets on the EXACT decimal, never the double
    "q_rfm" -> ((s, d) => Reports.rfmSegments(t(s, d, "orders"))),
    // Gopher rule battery ([EXT]): the published filter set as one
    // scan pass; every rule compares the ROUNDED metric
    "q_gopher_rules" -> ((s, d) => CorpusStats.gopherQuality(t(s, d, "documents"))),
    // bounded-depth BFS ([EXT]): blast radius — min-hop labels within
    // 2 undirected hops of the seed parts; k bounded frontier stages
    "q_khop" -> ((s, d) =>
      Graph.kHopReachable(copurchaseEdges(s, d), Seq(1L, 2L, 3L), k = 2)),
    // t-closeness ([EXT]): completes the privacy triad — per-group
    // total-variation distance to the global sensitive distribution,
    // absent values folded in algebraically (no spine)
    "q_t_closeness" -> ((s, d) =>
      Anonymize.tCloseness(t(s, d, "documents"), Seq("source"), "lang")),
    // growth curve ([EXT]): users count once, on their first day —
    // never an expanding re-count
    "q_cumulative_users" -> ((s, d) => Reports.cumulativeUsers(t(s, d, "events"))),
    // rolling 7-day actives / WAU ([EXT]): bounded n-literal fan-out
    // instead of a per-day distinct re-count
    "q_rolling_active" -> ((s, d) => Reports.rollingActiveUsers(t(s, d, "events"))),
    // quantile transform ([EXT]): rank-based normalization immune to
    // any monotone distortion — ties share a percent_rank
    "q_quantile_transform" -> ((s, d) =>
      Profile.quantileTransform(
        t(s, d, "lineitem").select(col("l_orderkey"), col("l_linenumber"),
          col("l_returnflag"), col("l_extendedprice")),
        "l_returnflag", "l_extendedprice")
        .select(col("l_orderkey"), col("l_linenumber"), col("q"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),
    // mutual information ([EXT]): the dependence chi2 tests but does
    // not quantify — one fact scan, margins on the bounded cell rows
    "q_mutual_info" -> ((s, d) =>
      Profile.mutualInformation(t(s, d, "documents"), "lang", "source")),
    // fightin' words ([EXT]): z-scored log-odds with informative
    // Dirichlet prior — which terms distinguish src0 from src1
    "q_log_odds" -> ((s, d) =>
      CorpusStats.logOddsTerms(t(s, d, "documents"), "src0", "src1")),
    // inter-arrival burstiness ([EXT]): Poisson-vs-bursty CV per user
    "q_interarrival" -> ((s, d) => Windows.interArrival(t(s, d, "events"))),
    // contrastive pair mining ([EXT]): near-dup positives + portable-
    // hash-addressed random negatives over the ordinal index
    "q_contrastive_pairs" -> ((s, d) =>
      Dedup.contrastivePairs(t(s, d, "documents"))),
    // seasonal-naive backtest ([EXT]): the same-weekday-last-week
    // baseline + MAE — the backtest join fancier models drop into
    "q_seasonal_naive" -> ((s, d) =>
      Reports.seasonalNaiveBacktest(t(s, d, "events"))),
    // null-semantics battery ([EXT]): the ANSI traps certified in one
    // row — NOT IN vs NOT EXISTS under nulls, null-safe joins,
    // count(col) vs count(*), trichotomy failure
    "q_null_semantics" -> ((s, d) => {
      t(s, d, "orders").createOrReplaceTempView("ns_orders")
      s.sql("""
        WITH o AS (SELECT CASE WHEN o_orderkey % 97 = 0 THEN NULL
                               ELSE o_orderkey END AS k,
                          CASE WHEN o_orderkey % 53 = 0 THEN NULL
                               ELSE o_totalprice END AS v
                   FROM ns_orders),
             p AS (SELECT CASE WHEN o_orderkey % 91 = 0 THEN NULL
                               ELSE o_orderkey END AS k FROM ns_orders)
        SELECT
          (SELECT count(*) FROM o) AS n_rows,
          (SELECT count(k) FROM o) AS n_k,
          (SELECT count(DISTINCT k) FROM o) AS n_distinct_k,
          (SELECT count(*) FROM o WHERE k IS NULL) AS n_null_k,
          (SELECT count(*) FROM o JOIN p ON o.k = p.k) AS n_join,
          (SELECT count(*) FROM o JOIN p ON o.k <=> p.k) AS n_nullsafe_join,
          (SELECT count(*) FROM o WHERE k NOT IN (SELECT k FROM p)) AS n_not_in,
          (SELECT count(*) FROM o
             WHERE NOT EXISTS (SELECT 1 FROM p WHERE p.k = o.k)) AS n_not_exists,
          (SELECT CAST(sum(CAST(v AS DECIMAL(18,2))) AS DOUBLE) FROM o) AS sum_v,
          (SELECT count(*) FROM o WHERE v > 0 OR NOT (v > 0)) AS n_trichotomy""")
    }),
    // Kaplan-Meier survival ([EXT]) over SESSION durations: sessions
    // still inside the gap window at corpus end are censored (their
    // true length is unobserved) — the correction a naive duration
    // histogram misses; minutes-granularity event times
    "q_kaplan_meier" -> ((s, d) => {
      val gapUs = 1800000000L
      val sess = Windows.sessionizeBatch(t(s, d, "events"), gapUs)
      val mx = sess.agg(max(col("end_us")).as("__mx"))
      val life = sess.crossJoin(broadcast(mx))
        .select(expr("duration_us div 60000000").as("t"),
          (col("end_us") > col("__mx") - gapUs).as("censored"))
      Reports.kaplanMeierCurve(life)
    }),
    // two-proportion z on a hash split ([EXT]): the experiment
    // primitive, doubling as the A/A calibration check
    "q_ab_test" -> ((s, d) => Reports.abTest(t(s, d, "events"))),
    // Benford first-digit audit ([EXT]): integer-cent leading digits
    // vs log10(1 + 1/d) — the fabrication smell test
    "q_benford" -> ((s, d) => Profile.benfordAudit(t(s, d, "orders"), "o_totalprice")),
    // per-doc keywords ([EXT]): top-3 tf-idf terms, zero-model tagger
    "q_keywords" -> ((s, d) => CorpusStats.keywords(t(s, d, "documents"))),
    // entity resolution capstone ([EXT]): fuzzy edges -> connected
    // components -> lexicographic canonical per cluster
    "q_entity_resolution" -> ((s, d) =>
      Fuzzy.resolveEntities(t(s, d, "part"), "p_name", minSim = 0.88)),
    // Fellegi-Sunter linkage ([EXT]): same-name candidate pairs scored
    // by the data-estimated likelihood ratio over brand/type/size
    // evidence — pure IEEE arithmetic, certified UNROUNDED
    "q_fs_weights" -> ((s, d) =>
      Fuzzy.fsWeights(t(s, d, "part"), "p_partkey", "p_name",
        Seq("p_brand" -> "0.95", "p_type" -> "0.90", "p_size" -> "0.85"),
        block = c => c)),
    // calendar-edge battery ([EXT]): month-end clamping, leap days,
    // ISO weeks — certified on the month-end order slice
    "q_date_edges" -> ((s, d) => {
      val o = t(s, d, "orders")
      o.where(dayofmonth(col("o_orderdate")) >= 29)
        .select(col("o_orderkey"),
          to_date(col("o_orderdate")).as("d"),
          add_months(to_date(col("o_orderdate")), 1).as("plus_month"),
          last_day(to_date(col("o_orderdate"))).as("month_end"),
          quarter(col("o_orderdate")).cast("long").as("q"),
          weekofyear(col("o_orderdate")).cast("long").as("iso_week"),
          dayofyear(col("o_orderdate")).cast("long").as("doy"))
        .orderBy(col("o_orderkey"))
    }),
    // end-to-end corpus pipeline ([EXT] capstone): the hygiene
    // operators COMPOSED the way a training-data run uses them —
    // quality gate -> exact dedup (min-id keeper) -> drop benchmark
    // members and benchmark-contaminated docs -> fixed-budget chunks.
    // Every stage is an existing operator; the oracle chains the same
    // stages as CTEs.
    "q_corpus_pipeline" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val kept = docs.where(Text.isQuality(col("text")))
      val fp = kept.select(col("doc_id"), col("text"),
        Text.fingerprint(col("text")).as("f"))
      // min_by keeps the min-id row (with ITS raw text) in ONE
      // aggregate — the fp⋈fp.groupBy self-join spelling computes the
      // quality+sha256 subtree twice
      val keepers = fp.groupBy(col("f"))
        .agg(min_by(struct(col("doc_id"), col("text")), col("doc_id")).as("r"))
        .select(col("r.doc_id").as("doc_id"), col("r.text").as("text"))
      // train feeds three plan subtrees (decontaminate's gram explode,
      // its passthrough join, and chunk); measured: pinning it with
      // localCheckpoint does NOT help (4.5 s vs 4.4 s at sf0.1) — the
      // recomputed subtree is cheap relative to the gram explode and
      // chunk stages, and the checkpoint job adds its own cost
      val train = keepers.where(col("doc_id") % 41 =!= 0)
      val bench = docs.where(col("doc_id") % 41 === 0)
      // anti-join on the CONTAMINATED ids (few) instead of inner-join
      // on the clean ids (nearly all): same rows, but the broadcast
      // side shrinks to the hits — measured 3.9 s vs 4.4 s at sf0.1
      val dirtyIds = Ngrams.decontaminate(train, bench)
        .where(col("contaminated")).select("doc_id")
      Ngrams.chunk(train.join(dirtyIds, Seq("doc_id"), "left_anti"))
    }),
    // training-mix capstone ([EXT]): the SAMPLING-side counterpart of
    // q_corpus_pipeline — quality gate → exact-dedup keepers → target
    // mixture → train/val/test split → epoch shuffle key, all
    // deterministic, composed purely from existing operators
    "q_training_mix" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val keepers = docs.where(Text.isQuality(col("text")))
        .select(col("doc_id"), col("lang"), Text.fingerprint(col("text")).as("f"))
        .groupBy(col("f"))
        .agg(min_by(struct(col("doc_id"), col("lang")), col("doc_id")).as("r"))
        .select(col("r.doc_id").as("doc_id"), col("r.lang").as("lang"))
      val mixed = Sampling.mixtureSample(keepers, "doc_id", "lang",
        Map("en" -> 0.5, "zh" -> 0.2, "es" -> 0.2, "de" -> 0.1), fraction = 0.5)
      val split = Sampling.assignSplit(mixed, "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      Sampling.seededShuffle(split, "doc_id", "epoch0").orderBy(col("doc_id"))
    }),
    // ---- document dedup family (SURVEY §2.7 [EXT]) ----
    "q_exact_docs" -> ((s, d) => Dedup.exactDocs(t(s, d, "documents"))),
    // bloom-guarded incremental dedup ([EXT]): batch = genuinely-new
    // odd docs + re-crawled copies of history docs under fresh ids
    // (the crawler pattern); bloom-negatives skip the verify join,
    // result exact regardless of sketch sizing
    "q_bloom_new_docs" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val history = docs.where(col("doc_id") % 2 === 0)
      val batch = docs.where(col("doc_id") % 2 === 1)
        .unionByName(docs.where(col("doc_id") % 10 === 0)
          .withColumn("doc_id", col("doc_id") + 1000000))
      val index = Dedup.fingerprintIndex(history)
      Dedup.newDocs(batch, index, Dedup.fingerprintBloom(index))
    }),
    // incremental NEAR-dup ([EXT]): batch signatures banded against a
    // persisted history signature table; verification = MinHash
    // Jaccard estimator (signature agreement), so history text is
    // never re-read. Batch = genuinely-new odd docs + lightly-edited
    // re-crawls of history docs (near- but not exact-dups).
    "q_new_near_docs" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val history = docs.where(col("doc_id") % 2 === 0)
      val batch = docs.where(col("doc_id") % 2 === 1)
        .unionByName(docs.where(col("doc_id") % 10 === 0)
          .withColumn("doc_id", col("doc_id") + 1000000)
          .withColumn("text", concat(col("text"), lit(" updated rev"))))
      Dedup.newNearDocs(batch, Dedup.minhashSignatures(history, "doc_id", "text"))
    }),
    // hot-bucket-capped twin (same guard family as q_minhash_capped /
    // q_lsh_knn_capped): boilerplate history buckets above the cap
    // contribute no candidates — recall trade, never wrong answers
    "q_new_near_capped" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val history = docs.where(col("doc_id") % 2 === 0)
      val batch = docs.where(col("doc_id") % 2 === 1)
        .unionByName(docs.where(col("doc_id") % 10 === 0)
          .withColumn("doc_id", col("doc_id") + 1000000)
          .withColumn("text", concat(col("text"), lit(" updated rev"))))
      Dedup.newNearDocs(batch, Dedup.minhashSignatures(history, "doc_id", "text"),
        maxBucket = 3)
    }),
    // the PRODUCTION shape of the incremental near-dup probe: the
    // history signature table is PERSISTED (built once, here lazily
    // per scale dir) and only READ per batch — so this entry's bench
    // time is the true per-batch increment cost, where q_new_near_docs
    // re-signs the whole history in-query (an upper bound). Same
    // result, same oracle.
    "q_new_near_persisted" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val sigDir = new java.io.File(sys.props("java.io.tmpdir"),
        "graft_hist_sigs_" + d.replaceAll("[^A-Za-z0-9.]", "_")).toString
      if (!new java.io.File(sigDir, "_SUCCESS").exists())
        Dedup.minhashSignatures(docs.where(col("doc_id") % 2 === 0), "doc_id", "text")
          .write.mode("overwrite").parquet(sigDir)
      val batch = docs.where(col("doc_id") % 2 === 1)
        .unionByName(docs.where(col("doc_id") % 10 === 0)
          .withColumn("doc_id", col("doc_id") + 1000000)
          .withColumn("text", concat(col("text"), lit(" updated rev"))))
      Dedup.newNearDocs(batch, s.read.parquet(sigDir), materialize = true)
    }),
    "q_minhash_candidates" -> ((s, d) => Dedup.minhashCandidates(t(s, d, "documents"))),
    // hot-bucket guard on: buckets above the cap are dropped before
    // pair expansion (the 100 TB safety valve; cap chosen to actually
    // drop a bucket at the gate's scale)
    "q_minhash_capped" -> ((s, d) =>
      Dedup.minhashCandidates(t(s, d, "documents"), maxBucket = 3)),
    "q_near_dup_pairs" -> ((s, d) => Dedup.nearDupPairs(t(s, d, "documents"), threshold = 0.5)),
    // cross-source duplication matrix ([EXT]): verified near-dup PAIR
    // counts per source pair — the number a curation run acts on
    // (sourceOverlap's gram-mass audit is the cheap early warning)
    "q_cross_source_dups" -> ((s, d) =>
      Dedup.crossSourceDups(t(s, d, "documents"), threshold = 0.5)),
    // EXACT set-similarity join ([EXT]): every pair with true Jaccard
    // >= t via prefix filtering — recall 1 by construction (the
    // contract-grade complement to the probabilistic minhash family,
    // and the recall yardstick for it)
    "q_jaccard_join" -> ((s, d) => SetSimilarity.jaccardJoin(t(s, d, "documents"), threshold = 0.5)),
    // asymmetric containment ([EXT]): |A∩B|/|A| >= t — "B quotes A"
    // detection that symmetric Jaccard misses when the container dwarfs
    // the contained doc
    "q_containment" -> ((s, d) => SetSimilarity.containmentJoin(t(s, d, "documents"), threshold = 0.8)),
    // persisted-set twin ([EXT]): jaccardJoin reading a materialized
    // ranked gram-set table — the production shape (the set build is
    // the reusable artifact; inline variant re-derives it 4x). Same
    // oracle as q_jaccard_join: identical results by construction.
    "q_jaccard_persisted" -> ((s, d) => {
      val setsDir = new java.io.File(sys.props("java.io.tmpdir"),
        "graft_gram_sets_" + d.replaceAll("[^A-Za-z0-9.]", "_")).toString
      if (!new java.io.File(setsDir, "_SUCCESS").exists())
        SetSimilarity.rankedGramSets(t(s, d, "documents"))
          .write.mode("overwrite").parquet(setsDir)
      SetSimilarity.jaccardJoinOfSets(s.read.parquet(setsDir), threshold = 0.5)
    }),
    // LSH recall audit ([EXT]): banded minhash candidates scored
    // against the exact Jaccard pairs ON THE SAME gram space — the
    // empirical recall/cost curve a pipeline checks before trusting
    // LSH dedup at scale
    "q_lsh_recall" -> ((s, d) => SetSimilarity.lshRecallAudit(t(s, d, "documents"))),
    "q_dedup_docs" -> ((s, d) => Dedup.dedupDocuments(t(s, d, "documents"), threshold = 0.5)),
    // quality-aware keeper re-election ([EXT]): same clusters, but the
    // representative is the longest doc (n_chars desc, id tiebreak) —
    // the "keep the cleanest copy" policy real corpus dedup wants
    "q_dedup_quality" -> ((s, d) => {
      val docs = t(s, d, "documents")
      Dedup.keeperByQuality(
        Dedup.dedupDocuments(docs, threshold = 0.5),
        docs.select(col("doc_id"), col("n_chars").as("score")))
    }),
    // transitive-closure keeper policy (connected components of the
    // verified near-dup graph) vs q_dedup_docs' one-hop policy
    "q_dedup_docs_cc" -> ((s, d) => Dedup.dedupDocumentsCC(t(s, d, "documents"), threshold = 0.5)),
    // quality-aware dedup policy ([EXT]): same clusters, best-scoring
    // member kept (longest copy, ties to smaller id) — the LLM-corpus
    // standard keeper rule
    "q_dedup_keep_best" -> ((s, d) =>
      Dedup.dedupKeepBest(t(s, d, "documents"), scoreCol = "n_chars", threshold = 0.5)),
    "q_simhash" -> ((s, d) => Dedup.simhash32(t(s, d, "documents"))),
    // simhash near-dup join ([EXT]): block-LSH candidates (pigeonhole
    // recall 1 within the radius) + exact hamming verify — the
    // one-fingerprint-per-doc member of the near-dup family
    "q_simhash_near" -> ((s, d) =>
      Dedup.simhashNearDup(t(s, d, "documents"), maxDist = 3)),
    // per-source token budgets ([EXT]): the mixture-allocation step —
    // each source keeps its best docs until ITS budget is spent
    "q_budget_per_source" -> ((s, d) => {
      graft.expressions.GraftFunctions.register(s)
      Sampling.capTokensPerGroup(
        t(s, d, "documents").select(col("doc_id"), col("source"),
          col("n_chars").cast("double").as("score"),
          Text.tokenCount(col("text")).cast("long").as("n_tokens")),
        "source", "doc_id", "score", "n_tokens", budget = 800L)
    }),
    // token-budget selection ([EXT]): highest-scoring docs until the
    // global budget is spent — the compute-bound data-selection
    // policy; score slot here = n_chars (pluggable)
    "q_budget_select" -> ((s, d) => {
      graft.expressions.GraftFunctions.register(s)
      Pack.selectUnderBudget(
        t(s, d, "documents").select(col("doc_id"),
          col("n_chars").cast("double").as("score"),
          Text.tokenCount(col("text")).cast("long").as("n_tokens")),
        "doc_id", "score", "n_tokens", budget = 20000L)
    }),
    // systematic sampling ([EXT]): every 100th row of the total order
    // via the distributed global-ordinal primitive — never a
    // single-task row_number window
    "q_systematic_sample" -> ((s, d) =>
      Pack.globalOrdinals(
        t(s, d, "lineitem").select("l_orderkey", "l_linenumber"),
        Seq("l_orderkey", "l_linenumber"))
        .where(col("ordinal") % 100 === 0)
        .orderBy(col("ordinal"))),
    // sequence packing ([EXT]): concat-then-chunk bin assignment via
    // a distributed prefix sum (never a single-task global window)
    "q_pack" -> ((s, d) => {
      graft.expressions.GraftFunctions.register(s)
      val sized = t(s, d, "documents")
        .select(col("doc_id"), Text.tokenCount(col("text")).cast("long").as("n_tokens"))
      Pack.contiguousBins(sized, "doc_id", "n_tokens", budget = 512)
        .orderBy(col("doc_id"))
    }),
    // length bucketing ([EXT]): pad-to-boundary batching layout —
    // per-row projection, no shuffle
    "q_length_buckets" -> ((s, d) =>
      Pack.lengthBuckets(
        t(s, d, "documents")
          .select(col("doc_id"), Text.bpeTokenCount(col("text")).cast("long").as("n_tokens")),
        boundaries = Seq(64, 128, 256, 512)).orderBy(col("doc_id"))),
    // ---- similarity search (SURVEY §2.3 [EXT]) ----
    // pairwise-cosine distribution ([EXT]): the embedding-collapse
    // diagnostic — consecutive-id pairs (deterministic, linear in
    // corpus size, no self-join blowup), cosine rounded 6-dp THEN
    // binned so the bucket edges are engine-stable
    "q_cosine_histogram" -> ((s, d) => {
      graft.expressions.GraftFunctions.register(s)
      val emb = t(s, d, "embeddings")
      val a = emb.select(col("vec_id").as("ida"), col("embedding").as("ea"))
      val b = emb.select((col("vec_id") - 1).as("ida"), col("embedding").as("eb"))
      val dot = graft.expressions.GraftFunctions.dot _
      a.join(b, Seq("ida"))
        .select(round(
          dot(col("ea"), col("eb")) /
            (sqrt(dot(col("ea"), col("ea"))) * sqrt(dot(col("eb"), col("eb")))), 6)
          .as("c"))
        .select(least(greatest(floor(col("c") * 10), lit(-10.0)), lit(9.0))
          .cast("long").as("bin"))
        .groupBy(col("bin")).agg(count(lit(1)).as("n"))
        .orderBy(col("bin"))
    }),
    "q_topk_cosine" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Similarity.topK(emb, Similarity.vectorOf(emb, 1L), 10)
        .select(col("vec_id"), round(col("cosine_sim"), 6).as("cosine_sim"))
    }),
    // Same top-k, but expressed entirely as SQL text over the
    // extension-injected functions (GraftExtensions) — proves a
    // pure-SQL client reproduces the Column-API results bit-for-bit.
    "q_sql_topk" -> ((s, d) => {
      graft.expressions.GraftFunctions.register(s)
      t(s, d, "embeddings").createOrReplaceTempView("graft_sql_embeddings")
      s.sql(
        """WITH q AS (SELECT embedding AS qv FROM graft_sql_embeddings WHERE vec_id = 1),
          |sc AS (SELECT vec_id,
          |  graft_dot(embedding, qv) /
          |    (sqrt(graft_dot(embedding, embedding)) * sqrt(graft_dot(qv, qv))) AS c
          |  FROM graft_sql_embeddings CROSS JOIN q)
          |SELECT vec_id, round(c, 6) AS cosine_sim FROM sc
          |ORDER BY c DESC, vec_id LIMIT 10""".stripMargin)
    }),
    "q_knn_small" -> ((s, d) =>
      Similarity.knnJoin(t(s, d, "embeddings").where(col("vec_id") < 100), 5)
        .select(col("id_a"), col("id_b"), round(col("cosine_sim"), 6).as("cosine_sim"), col("rank"))
        .orderBy(col("id_a"), col("rank"))),
    // hard-negative mining ([EXT]): nearest CROSS-label vectors, the
    // contrastive-training pair source; label filter before ranking
    "q_hard_negatives" -> ((s, d) =>
      Similarity.hardNegatives(t(s, d, "embeddings").where(col("vec_id") < 100), 5)
        .select(col("id_a"), col("label_a"), col("id_b"), col("label_b"),
          round(col("cosine_sim"), 6).as("cosine_sim"), col("rank"))
        .orderBy(col("id_a"), col("rank"))),
    "q_lsh_knn" -> ((s, d) =>
      Similarity.lshKnnJoin(t(s, d, "embeddings"), 5, dim = 64, nBits = 8)
        .select(col("id_a"), col("id_b"), round(col("cosine_sim"), 6).as("cosine_sim"), col("rank"))
        .orderBy(col("id_a"), col("rank"))),
    "q_lsh_knn_capped" -> ((s, d) =>
      Similarity.lshKnnJoin(t(s, d, "embeddings"), 5, dim = 64, nBits = 8, maxBucket = 6)
        .select(col("id_a"), col("id_b"), round(col("cosine_sim"), 6).as("cosine_sim"), col("rank"))
        .orderBy(col("id_a"), col("rank"))),
    // multi-seed LSH: recall dial — pairs bucketed under ANY seed
    "q_lsh_knn_multi" -> ((s, d) =>
      Similarity.lshKnnJoinMultiSeed(t(s, d, "embeddings"), 5, dim = 64, nBits = 8,
        seeds = Seq(42L, 43L))
        .select(col("id_a"), col("id_b"), round(col("cosine_sim"), 6).as("cosine_sim"), col("rank"))
        .orderBy(col("id_a"), col("rank"))),
    // embedding-cosine near-dup keeper map (LSH pairs -> connected
    // components); threshold sized to the synthetic corpus' cosine range
    "q_dedup_embeddings" -> ((s, d) =>
      Similarity.dedupByEmbedding(t(s, d, "embeddings"), threshold = 0.3, dim = 64)),
    // per-label centroid components ([EXT]): class prototypes / IVF
    // cell stats in exact integer-micro form (no float-sum order
    // nondeterminism; division left to the caller — floor-vs-truncate
    // semantics diverge across engines on negatives)
    "q_centroids" -> ((s, d) => Similarity.labelCentroids(t(s, d, "embeddings"))),
    // int8 scalar quantization ([EXT]): 4x-compressed ANN codes with a
    // per-vector reconstruction-error bound. The operator returns the
    // array form; the REGISTERED query posexplodes to scalar rows so
    // the driver's pandas hash-compare (which can't sort array cells)
    // can certify it.
    "q_quantize" -> ((s, d) =>
      Similarity.quantizeEmbeddings(t(s, d, "embeddings"))
        .select(col("vec_id"), posexplode(col("codes")).as(Seq("pos", "code")),
          col("max_abs_err"))
        .select(col("vec_id"), col("pos").cast("long").as("pos"), col("code"),
          col("max_abs_err"))
        .orderBy(col("vec_id"), col("pos"))),
    // deterministic Lloyd k-means ([EXT]): engine-exact seeds/updates/
    // distances, so the full 2-iteration training run is oracled
    "q_kmeans" -> ((s, d) =>
      graft.operators.Clustering.kmeans(t(s, d, "embeddings"), k = 8, iters = 2)),
    // product quantization ([EXT], Jégou et al. 2011): per-subspace
    // deterministic Lloyd codebooks trained + corpus encoded in one
    // grouped pass — the full training run is oracled, like q_kmeans
    "q_pq_encode" -> ((s, d) => {
      val (codes, _) = graft.operators.Clustering.pqTrainEncode(
        t(s, d, "embeddings"), m = 4, k = 8, iters = 2, dim = 64)
      codes.select(col("vec_id"), col("subspace"), col("code"),
        round(col("dist2"), 6).as("dist2"))
        .orderBy(col("vec_id"), col("subspace"))
    }),
    // PQ recall audit ([EXT]): ADC top-10 vs the exact L2 top-10 in
    // one certified row — the q_lsh_recall discipline for the PQ
    // index (measured recall, not a hope)
    "q_pq_recall" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val q = Similarity.vectorOf(emb, 1L)
      val (codes0, cbs) = graft.operators.Clustering.pqTrainEncode(
        emb, m = 16, k = 16, iters = 2, dim = 64)
      // adc/exact each feed a join AND a count — checkpoint so the
      // 2-iteration training DAG and both top-10 pipelines run ONCE,
      // not once per downstream aggregate
      val codes = codes0.localCheckpoint()
      val adc = Clustering.pqTopK(codes, cbs, q, m = 16, k = 10)
        .select(col("vec_id")).localCheckpoint()
      val exact = emb.select(col("vec_id"),
        Clustering.dist2(Similarity.asDouble(col("embedding")),
          array(q.map(lit): _*)).as("d"))
        .orderBy(col("d"), col("vec_id")).limit(10).select(col("vec_id"))
        .localCheckpoint()
      val hits = exact.join(adc, Seq("vec_id"))
      exact.agg(count(lit(1)).as("n_exact"))
        .crossJoin(broadcast(adc.agg(count(lit(1)).as("n_adc"))))
        .crossJoin(broadcast(hits.agg(count(lit(1)).as("n_hit"))))
        .select(col("n_exact"), col("n_adc"), col("n_hit"),
          (col("n_hit").cast("double") / col("n_exact").cast("double")).as("recall"))
    }),
    // ADC search over the PQ index: codes + codebooks only, the base
    // vectors never re-read; per-subspace partials fold in subspace
    // order so the top-10 selection is engine-exact
    "q_pq_adc" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val (codes, cbs) = graft.operators.Clustering.pqTrainEncode(
        emb, m = 4, k = 8, iters = 2, dim = 64)
      Clustering.pqTopK(codes, cbs, Similarity.vectorOf(emb, 1L), m = 4, k = 10)
        // order on the RAW distance (matching the oracle's ORDER BY
        // adc_raw), THEN project the 6-dp render — ordering on the
        // rounded value could diverge from the oracle on near-ties
        .orderBy(col("adc_dist2"), col("vec_id"))
        .select(col("vec_id"), round(col("adc_dist2"), 6).as("adc_dist2"))
    }),
    // the PRODUCTION probe shape: same ADC math, but codes+codebooks
    // round-trip a persisted parquet index first — base vectors and
    // training never touched at query time (the q_jaccard_persisted
    // discipline, so the q_pq_adc oracle certifies this path too)
    "q_pq_persisted" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val (codes, cbs) = graft.operators.Clustering.pqTrainEncode(
        emb, m = 4, k = 8, iters = 2, dim = 64)
      val root = java.nio.file.Files.createTempDirectory("graft_pq_idx").toString
      Clustering.pqWriteIndex(codes, cbs, root)
      val (codes2, cbs2) = Clustering.pqReadIndex(s, root)
      Clustering.pqTopK(codes2, cbs2, Similarity.vectorOf(emb, 1L), m = 4, k = 10)
        .orderBy(col("adc_dist2"), col("vec_id"))
        .select(col("vec_id"), round(col("adc_dist2"), 6).as("adc_dist2"))
    }),
    // SemDeDup: within-cell cosine pairs on the same deterministic
    // quantizer; one-hop min-id keeper flag
    "q_semantic_dedup" -> ((s, d) =>
      graft.operators.Clustering.semanticDedup(t(s, d, "embeddings"),
        k = 8, threshold = 0.35)),
    // Johnson-Lindenstrauss reduction: 64-dim floats -> 16 seeded-
    // Gaussian dot products, planes baked into the plan as literals.
    // Registered in posexploded scalar form (same reason as q_quantize).
    "q_random_projection" -> ((s, d) =>
      Similarity.randomProject(t(s, d, "embeddings"), outDim = 16, dim = 64)
        .select(col("vec_id"), posexplode(col("rvec")).as(Seq("pos", "component")))
        .select(col("vec_id"), col("pos").cast("long").as("pos"), col("component"))
        .orderBy(col("vec_id"), col("pos"))),
    // PCA projection ([EXT]): learned planes from the exact covariance
    // — rows-only by design (iterative eigensolve; laws in
    // SimilaritySpec), like the other trained-model queries. Also
    // posexploded so the harness can count rows without choking on the
    // array column.
    "q_pca" -> ((s, d) =>
      Similarity.pcaProject(t(s, d, "embeddings"), k = 8, dim = 64)
        .select(col("vec_id"), posexplode(col("pvec")).as(Seq("pos", "component")))
        .select(col("vec_id"), col("pos").cast("long").as("pos"), col("component"))
        .orderBy(col("vec_id"), col("pos"))),
    // ---- multimodal plumbing (SURVEY [EXT]) ----
    "q_payload_meta" -> ((s, d) =>
      Multimodal.payloadMeta(Multimodal.attachPayload(t(s, d, "documents")))),
    "q_decode_stub" -> ((s, d) =>
      Multimodal.decodeStub(Multimodal.attachPayload(t(s, d, "documents")))
        .toDF().orderBy(col("doc_id"))),
    "q_frame_sample" -> ((s, d) =>
      Multimodal.frameSampleStub(Multimodal.attachPayload(t(s, d, "documents")))
        .toDF().orderBy(col("doc_id"), col("frame_idx"))),
    // REAL image-header decode ([EXT]): PNG/GIF/BMP container bytes
    // synthesized from table fields, parsed back by the pure-JVM
    // header parser — builder ∘ parser == identity, oracle-certified
    "q_image_meta" -> ((s, d) =>
      Multimodal.imageMeta(Multimodal.synthesizeImages(t(s, d, "documents")))
        .toDF().orderBy(col("doc_id"))),
    // REAL audio header decode ([EXT]): RIFF/WAVE fmt+data chunks —
    // rate/channels/depth/duration without any codec
    "q_audio_meta" -> ((s, d) =>
      Multimodal.audioMeta(Multimodal.synthesizeAudio(t(s, d, "documents")))
        .toDF().orderBy(col("doc_id"))),
    // REAL video container decode ([EXT]): ISO-BMFF box walk —
    // brand/timescale/duration/dims/tracks, completing the
    // image/audio/video header-parsing trio without any codec
    "q_video_meta" -> ((s, d) =>
      Multimodal.videoMeta(Multimodal.synthesizeVideo(t(s, d, "documents")))
        .toDF().orderBy(col("doc_id"))))

  /** DuckDB-runnable oracle per query (same tables, same column names,
    * same ORDER BY). Only `q_approx_dictionary` is omitted: HLL
    * sketches are engine-specific, so its check is rows-only (pinned
    * by SparkEntrySpec). */
  def oracleSql: Map[String, String] = {
    // DuckDB spellings shared across oracles.
    val fingerprint = "sha256(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))"
    val shingles = "[substr(text, i, 5) for i in range(1, greatest(len(text)-4, 1)+1)]"
    def fold(products: String) = s"list_reduce($products, (x, y) -> x + y)"
    // shared NB train->predict->confusion chain: q_nb_confusion replays
    // it directly, q_nb_metrics derives the precision/recall/F1 sheet
    // from the same matrix
    val nbCm =
      """WITH train AS (SELECT * FROM documents WHERE doc_id % 5 <> 0),
               test AS (SELECT * FROM documents WHERE doc_id % 5 = 0),
               trt AS (SELECT lang AS c,
                 unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
                 FROM train),
               ctc AS (SELECT c, term, count(*) AS n FROM trt GROUP BY 1, 2),
               ctot AS (SELECT c, count(*) AS tot FROM trt GROUP BY 1),
               v AS (SELECT count(DISTINCT term) AS v FROM trt),
               pri AS (SELECT lang AS c, CAST(round(ln(count(*) /
                   CAST((SELECT count(*) FROM train) AS DOUBLE)), 6)
                   AS DECIMAL(18,6)) AS logprior
                 FROM train GROUP BY 1),
               tet AS (SELECT doc_id, term, count(*) AS tf FROM
                 (SELECT doc_id,
                    unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
                  FROM test) GROUP BY 1, 2),
               sc AS (SELECT t.doc_id, p.c, p.logprior +
                   sum(CAST(round(t.tf * ln((coalesce(ctc.n, 0) + 1) /
                     CAST(ctot.tot + v.v AS DOUBLE)), 6) AS DECIMAL(18,6))) AS score
                 FROM tet t
                 CROSS JOIN pri p
                 JOIN ctot ON ctot.c = p.c
                 LEFT JOIN ctc ON ctc.c = p.c AND ctc.term = t.term
                 CROSS JOIN v
                 GROUP BY t.doc_id, p.c, p.logprior),
               pred AS (SELECT doc_id, c AS predicted,
                 row_number() OVER (PARTITION BY doc_id
                   ORDER BY score DESC, c DESC) AS rn FROM sc),
           cm AS (SELECT te.lang AS actual, p.predicted, count(*) AS n
             FROM pred p JOIN test te USING (doc_id) WHERE rn = 1
             GROUP BY 1, 2)"""
    def dotSelf(v: String) =
      fold(s"[$v[i]::DOUBLE * $v[i]::DOUBLE for i in range(1, len($v)+1)]")
    // MinHash CTEs mirroring Dedup.minhashSignatures/lshBands (k=16, 4
    // bands), parameterized over the source relation.
    val minCols = (0 until 16).map(i =>
      s"min((h * ${Dedup.aCoef(i)} + ${Dedup.bCoef(i)}) % ${Dedup.MinhashP}) AS m$i").mkString(", ")
    val bandRows = (0 until 4).map { b =>
      val cat = (b * 4 until (b + 1) * 4).map(i => s"m$i::VARCHAR").mkString(" || ',' || ")
      s"SELECT doc_id, $b AS band, md5($cat) AS band_hash FROM sig"
    }.mkString(" UNION ALL ")
    def minhashCtesFrom(src: String, cap: Int = 0) = {
      // cap > 0 = the hot-bucket guard: buckets holding more than
      // `cap` docs contribute no candidate pairs
      val bs =
        if (cap > 0)
          "bs AS (SELECT band, band_hash, count(*) AS n FROM b GROUP BY band, band_hash),\n          "
        else ""
      val capJoin = if (cap > 0) " JOIN bs USING (band, band_hash)" else ""
      val capCond = if (cap > 0) s" AND bs.n <= $cap" else ""
      s"""sh AS (SELECT doc_id, unnest(list_distinct($shingles)) AS s FROM $src),
          hh AS (SELECT doc_id, ('0x' || substr(md5(s), 1, 8))::BIGINT AS h FROM sh),
          sig AS (SELECT doc_id, $minCols FROM hh GROUP BY doc_id),
          b AS ($bandRows),
          ${bs}cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
                   FROM b x JOIN b y USING (band, band_hash)$capJoin
                   WHERE x.doc_id < y.doc_id$capCond)"""
    }
    val minhashCtes = minhashCtesFrom("documents")
    // Word-trigram set rows for the exact set-similarity joins:
    // distinct (doc_id, 60-bit gram fingerprint) plus per-doc set
    // size, gram document frequency, and global-rarity rank — the
    // SetSimilarity.rankedGramSets algebra.
    val wordGramSetCtes =
      """tk AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
               FROM documents),
         ng AS (SELECT doc_id, unnest(list_distinct(
                  [array_to_string(toks[i:i+2], ' ') for i in range(1, len(toks)-1)])) AS ng
                FROM tk),
         tok AS (SELECT DISTINCT doc_id, ('0x' || substr(md5(ng), 1, 15))::BIGINT AS fp
                 FROM ng),
         st AS (SELECT doc_id, fp,
                  count(*) OVER (PARTITION BY fp) AS df,
                  count(*) OVER (PARTITION BY doc_id) AS n FROM tok),
         rk AS (SELECT doc_id, fp, n,
                  row_number() OVER (PARTITION BY doc_id ORDER BY df, fp) AS r FROM st)"""
    val jaccardJoinOracle =
      s"""WITH $wordGramSetCtes,
          pf AS (SELECT doc_id, fp, n FROM rk WHERE r <= n - ceil(0.5 * n) + 1),
          cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     a.n AS na, b.n AS nb
                   FROM pf a JOIN pf b USING (fp)
                   WHERE a.doc_id < b.doc_id
                     AND least(a.n, b.n) >= 0.5 * greatest(a.n, b.n)),
          iv AS (SELECT c.doc_a, c.doc_b, c.na, c.nb, count(*) AS inter
                 FROM cand c
                 JOIN tok ta ON ta.doc_id = c.doc_a
                 JOIN tok tb ON tb.doc_id = c.doc_b AND tb.fp = ta.fp
                 GROUP BY ALL)
          SELECT doc_a, doc_b, inter,
            inter::DOUBLE / (na + nb - inter) AS jaccard
          FROM iv WHERE inter >= 0.5 * (na + nb - inter)
          ORDER BY doc_a, doc_b"""
    // Verified-pair CTEs (cand -> exact jaccard >= threshold), shared
    // by q_near_dup_pairs and q_dedup_docs.
    def verifiedPairCtes(src: String) =
      s"""sets AS (SELECT doc_id, list_distinct($shingles) AS sd FROM $src),
          j AS (SELECT cand.doc_a, cand.doc_b,
            len(list_intersect(a.sd, bb.sd)) AS inter,
            len(a.sd) + len(bb.sd) - len(list_intersect(a.sd, bb.sd)) AS un
            FROM cand JOIN sets a ON cand.doc_a = a.doc_id
                      JOIN sets bb ON cand.doc_b = bb.doc_id),
          verified AS (SELECT doc_a, doc_b, CAST(inter AS DOUBLE) / un AS jac
                       FROM j WHERE CAST(inter AS DOUBLE) / un >= 0.5)"""
    // The sign-LSH hyperplanes are deterministic (seeded JVM RNG);
    // embedding them as double literals makes the whole ANN join
    // SQL-expressible. Shortest-repr double text round-trips to
    // identical bits in any correct parser. dim=64 matches the
    // driver-generated embeddings tables. cap > 0 = the hot-bucket
    // guard: buckets above the cap are removed from both join sides.
    // Shared CTEs for the sign-LSH embedding oracles: bucket-tagged
    // vectors (t), optional hot-bucket cap (bc), norms (n).
    // Literal sign-LSH bucket expression for one seeded hyperplane set.
    def lshBucketExpr(seed: Long): String = {
      val planes = Similarity.hyperplanes(64, 8, seed)
      def dotLit(p: Seq[Double]) = {
        val arr = p.map(_.toString).mkString("[", ", ", "]")
        fold(s"[embedding[i]::DOUBLE * ($arr)[i] for i in range(1, len(embedding)+1)]")
      }
      planes.zipWithIndex.map { case (p, i) =>
        s"(CASE WHEN ${dotLit(p)} >= 0 THEN ${1L << i} ELSE 0 END)"
      }.mkString(" + ")
    }
    def lshNormCtes(cap: Int): String = {
      val bucket = lshBucketExpr(42L)
      val bc =
        if (cap > 0) s"bc AS (SELECT bucket, count(*) AS n FROM t GROUP BY bucket),\n            "
        else ""
      val capJoin = if (cap > 0) s" JOIN bc USING (bucket) WHERE bc.n <= $cap" else ""
      s"""t AS (SELECT vec_id, embedding, $bucket AS bucket FROM embeddings),
          ${bc}n AS (SELECT vec_id, embedding, bucket, sqrt(${dotSelf("embedding")}) AS nrm
             FROM t$capJoin)"""
    }
    val pairCos =
      fold("[a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE for i in range(1, len(a.embedding)+1)]") +
        " / (a.nrm * b.nrm)"
    def lshKnnOracle(cap: Int): String =
      s"""WITH ${lshNormCtes(cap)},
          p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, $pairCos AS c
            FROM n a JOIN n b USING (bucket) WHERE a.vec_id <> b.vec_id)
          SELECT id_a, id_b, round(c, 6) AS cosine_sim,
            CAST(row_number() OVER (PARTITION BY id_a ORDER BY c DESC, id_b) AS INTEGER) AS "rank"
          FROM p QUALIFY "rank" <= 5 ORDER BY id_a, "rank""""
    // incremental near-dup oracle (q_new_near_docs family): prefixed
    // signature/band CTEs so history and batch coexist; cap > 0 = the
    // history-side hot-bucket guard
    def newNearOracle(cap: Int): String = {
      def sigCtes(p: String, src: String) =
        s"""${p}sh AS (SELECT doc_id, unnest(list_distinct($shingles)) AS s FROM $src),
            ${p}hh AS (SELECT doc_id, ('0x' || substr(md5(s), 1, 8))::BIGINT AS h FROM ${p}sh),
            ${p}sig AS (SELECT doc_id, $minCols FROM ${p}hh GROUP BY doc_id)"""
      def bandRowsP(p: String) = (0 until 4).map { b =>
        val cat = (b * 4 until (b + 1) * 4).map(i => s"m$i::VARCHAR").mkString(" || ',' || ")
        s"SELECT doc_id, $b AS band, md5($cat) AS band_hash FROM ${p}sig"
      }.mkString(" UNION ALL ")
      val agree = (0 until 16)
        .map(i => s"CASE WHEN b.m$i = h.m$i THEN 1 ELSE 0 END").mkString(" + ")
      val bs =
        if (cap > 0)
          "bs AS (SELECT band, band_hash, count(*) AS bn FROM hb GROUP BY band, band_hash),\n          "
        else ""
      val capJoin = if (cap > 0) " JOIN bs USING (band, band_hash)" else ""
      val capCond = if (cap > 0) s" AND bs.bn <= $cap" else ""
      s"""WITH hsrc AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0),
               bsrc AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
                        UNION ALL
                        SELECT doc_id + 1000000 AS doc_id, text || ' updated rev' AS text
                        FROM documents WHERE doc_id % 10 = 0),
               ${sigCtes("h", "hsrc")},
               ${sigCtes("b", "bsrc")},
               hb AS (${bandRowsP("h")}),
               bb AS (${bandRowsP("b")}),
               ${bs}cand AS (SELECT DISTINCT bb.doc_id AS batch_id, hb.doc_id AS hist_id
                        FROM bb JOIN hb USING (band, band_hash)$capJoin
                        WHERE 1 = 1$capCond),
               dup AS (SELECT DISTINCT c.batch_id
                       FROM cand c JOIN bsig b ON c.batch_id = b.doc_id
                                   JOIN hsig h ON c.hist_id = h.doc_id
                       WHERE $agree >= 8)
          SELECT doc_id FROM bsrc
          WHERE NOT EXISTS (SELECT 1 FROM dup d WHERE d.batch_id = bsrc.doc_id)
          ORDER BY doc_id"""
    }
    // fuzzy decontamination oracle: the newNearOracle CTE family with
    // the 41-modulus benchmark as "history" and a contaminated flag
    // instead of an anti-join
    val decontamNearOracle: String = {
      def sigCtes(p: String, src: String) =
        s"""${p}sh AS (SELECT doc_id, unnest(list_distinct($shingles)) AS s FROM $src),
            ${p}hh AS (SELECT doc_id, ('0x' || substr(md5(s), 1, 8))::BIGINT AS h FROM ${p}sh),
            ${p}sig AS (SELECT doc_id, $minCols FROM ${p}hh GROUP BY doc_id)"""
      def bandRowsP(p: String) = (0 until 4).map { b =>
        val cat = (b * 4 until (b + 1) * 4).map(i => s"m$i::VARCHAR").mkString(" || ',' || ")
        s"SELECT doc_id, $b AS band, md5($cat) AS band_hash FROM ${p}sig"
      }.mkString(" UNION ALL ")
      val agree = (0 until 16)
        .map(i => s"CASE WHEN x.m$i = y.m$i THEN 1 ELSE 0 END").mkString(" + ")
      s"""WITH tsrc AS (SELECT doc_id, text FROM documents WHERE doc_id % 41 <> 0),
               bsrc AS (SELECT doc_id, text FROM documents WHERE doc_id % 41 = 0),
               ${sigCtes("t", "tsrc")},
               ${sigCtes("b", "bsrc")},
               tb AS (${bandRowsP("t")}),
               bb AS (${bandRowsP("b")}),
               cand AS (SELECT DISTINCT tb.doc_id AS train_id, bb.doc_id AS bench_id
                        FROM tb JOIN bb USING (band, band_hash)),
               dup AS (SELECT DISTINCT c.train_id
                       FROM cand c JOIN tsig x ON c.train_id = x.doc_id
                                   JOIN bsig y ON c.bench_id = y.doc_id
                       WHERE $agree >= 8)
          SELECT doc_id,
            EXISTS (SELECT 1 FROM dup d WHERE d.train_id = tsrc.doc_id) AS contaminated
          FROM tsrc ORDER BY doc_id"""
    }
    // Unrolled damped power iteration (Graph.stationaryDistribution):
    // 20 r-CTEs, each the exact integer-unit update — teleport +
    // dangling redistribution + per-edge contribution. HUGEINT holds
    // the 17·r·n products (Spark side: DECIMAL(38,0)); `//` == `div`
    // on these all-positive values, so both engines truncate
    // identically and the BIGINT units hash-match bit-for-bit.
    val stationaryOracle = {
      val u = graft.operators.Graph.MassUnits
      val rCtes = (0 until 20).map { i =>
        s"""r${i + 1} AS MATERIALIZED (
              SELECT s.state,
                CAST((3 * $u) // (20 * (SELECT count(*) FROM states))
                  + (17 * (SELECT COALESCE(sum(r.units), 0) FROM r$i r
                           LEFT JOIN outs o ON r.state = o.state
                           WHERE o.state IS NULL))
                    // (20 * (SELECT count(*) FROM states))
                  + COALESCE((SELECT CAST(sum(
                        (CAST(17 AS HUGEINT) * r2.units * e.n)
                          // (CAST(20 AS HUGEINT) * o2.outn)) AS BIGINT)
                      FROM r$i r2
                      JOIN outs o2 ON o2.state = r2.state
                      JOIN edges e ON e.from_type = r2.state
                      WHERE e.to_type = s.state), 0) AS BIGINT) AS units
              FROM states s)"""
      }.mkString(",\n")
      s"""WITH pr AS (SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id
                 ORDER BY epoch_ns(ts), event_id) AS prev
             FROM events),
           edges AS MATERIALIZED (SELECT prev AS from_type, event_type AS to_type,
                       count(*) AS n
                     FROM pr WHERE prev IS NOT NULL GROUP BY 1, 2),
           states AS MATERIALIZED (SELECT from_type AS state FROM edges
                      UNION SELECT to_type FROM edges),
           outs AS MATERIALIZED (SELECT from_type AS state, sum(n) AS outn
                    FROM edges GROUP BY 1),
           r0 AS MATERIALIZED (SELECT state,
                    CAST($u // (SELECT count(*) FROM states) AS BIGINT) AS units
                  FROM states),
           $rCtes
         SELECT state, units, units / 1000000000000.0 AS rank
         FROM r20 ORDER BY units DESC, state"""
    }
    // Shared PQ training replay (Clustering.pqTrainEncode iters=2
    // dim=64, parameterized over m subspaces × k cells): slices,
    // lowest-id seeds, one micro-sum Lloyd update, final assignment —
    // the q_kmeans oracle with a subspace dimension. MATERIALIZED pins
    // each stage to one evaluation.
    def pqTrainCtes(m: Int, k: Int) = {
      val w = 64 / m
      val subs = (0 until m).mkString(", ")
      val dist = "list_reduce([(sv[i]-cvec[i])*(sv[i]-cvec[i]) " +
        "for i in range(1, len(sv)+1)], (x, y) -> x + y)"
      s"""e AS MATERIALIZED (
              SELECT vec_id, [x::DOUBLE for x in embedding] AS v FROM embeddings),
          sl AS MATERIALIZED (
              SELECT vec_id, s.s AS subspace, v[s.s*$w+1 : (s.s+1)*$w] AS sv
              FROM e, (SELECT unnest([$subs]) AS s) s),
          sd AS (SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cell
                 FROM e ORDER BY vec_id LIMIT $k),
          c0 AS (SELECT sl.subspace, sd.cell, sl.sv AS cvec
                 FROM sl JOIN sd USING (vec_id)),
          a1 AS MATERIALIZED (
              SELECT sl.vec_id, sl.subspace, sl.sv, c0.cell, $dist AS d
              FROM sl JOIN c0 ON c0.subspace = sl.subspace
              QUALIFY row_number() OVER (PARTITION BY sl.vec_id, sl.subspace
                ORDER BY d, c0.cell) = 1),
          m1p AS (SELECT subspace, cell, pos, count(*) AS n, sum(vm) AS s FROM
                    (SELECT subspace, cell,
                       unnest([i for i in range(0, len(sv))]) AS pos,
                       unnest([round(x * 1000000, 0)::BIGINT for x in sv]) AS vm
                     FROM a1)
                  GROUP BY subspace, cell, pos),
          m1 AS MATERIALIZED (
              SELECT subspace, cell,
                list(s::DOUBLE / n / 1000000.0 ORDER BY pos) AS cvec
              FROM m1p GROUP BY subspace, cell),
          a2 AS MATERIALIZED (
              SELECT sl.vec_id, sl.subspace, sl.sv, m1.cell, $dist AS d
              FROM sl JOIN m1 ON m1.subspace = sl.subspace
              QUALIFY row_number() OVER (PARTITION BY sl.vec_id, sl.subspace
                ORDER BY d, m1.cell) = 1)"""
    }
    // ADC distances fold in subspace order on both engines; shared by
    // the in-memory (q_pq_adc) and persisted-index (q_pq_persisted)
    // probe paths.
    val pqAdcOracle =
      s"""WITH ${pqTrainCtes(4, 8)},
             q AS (SELECT v FROM e WHERE vec_id = 1),
             qs AS (SELECT s.s AS subspace, q.v[s.s*16+1 : (s.s+1)*16] AS qsv
                    FROM q, (SELECT unnest([0, 1, 2, 3]) AS s) s),
             pd AS (SELECT a2.vec_id, a2.subspace,
                      list_reduce([(qs.qsv[i] - m1.cvec[i]) * (qs.qsv[i] - m1.cvec[i])
                                   for i in range(1, len(qs.qsv)+1)],
                        (x, y) -> x + y) AS d
                    FROM a2
                    JOIN m1 ON m1.subspace = a2.subspace AND m1.cell = a2.cell
                    JOIN qs ON qs.subspace = a2.subspace),
             adc AS (SELECT vec_id,
                       list_reduce(list(d ORDER BY subspace), (x, y) -> x + y)
                         AS adc_raw
                     FROM pd GROUP BY vec_id),
             sel AS (SELECT vec_id, adc_raw FROM adc
                     ORDER BY adc_raw, vec_id LIMIT 10)
         SELECT vec_id, round(adc_raw, 6) AS adc_dist2
         FROM sel ORDER BY adc_raw, vec_id"""
    Map(
      // MAD outliers: quantile_cont == Spark's exact percentile
      // interpolation; score/threshold are pure IEEE on exact inputs.
      "q_mad_outliers" ->
        """WITH m AS (SELECT l_returnflag AS g, quantile_cont(l_extendedprice::DOUBLE, 0.5) AS med
                      FROM lineitem GROUP BY 1),
           d AS (SELECT l_orderkey, l_linenumber, l_returnflag,
                   l_extendedprice::DOUBLE AS v, med,
                   abs(l_extendedprice::DOUBLE - med) AS ad
                 FROM lineitem JOIN m ON l_returnflag = g),
           md AS (SELECT l_returnflag AS g2, quantile_cont(ad, 0.5) AS mad FROM d GROUP BY 1)
           SELECT l_orderkey, l_linenumber, l_returnflag, v AS value, med, mad,
             ad / mad AS score
           FROM d JOIN md ON l_returnflag = g2
           WHERE mad > 0 AND ad > 1.8 * mad
           ORDER BY l_orderkey, l_linenumber""",
      // Golden record: struct min is lexicographic in both engines;
      // the CASE's null skips rows with a null field, so each column
      // independently falls back to the lower-priority source.
      "q_golden_record" ->
        """WITH s1 AS (SELECT c_custkey, 1 AS prio,
               CASE WHEN c_custkey % 3 = 0 THEN NULL ELSE c_name END AS name,
               CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_mktsegment END AS segment,
               CASE WHEN c_custkey % 5 = 0 THEN NULL ELSE c_acctbal END AS acctbal
             FROM customer),
           s2 AS (SELECT c_custkey, 2 AS prio, c_name AS name,
               'legacy:' || c_mktsegment AS segment, c_acctbal FROM customer),
           u AS (SELECT * FROM s1 UNION ALL SELECT * FROM s2)
           SELECT c_custkey,
             (min(CASE WHEN name IS NOT NULL THEN {'p': prio, 't': prio, 'v': name} END)).v AS name,
             (min(CASE WHEN segment IS NOT NULL THEN {'p': prio, 't': prio, 'v': segment} END)).v AS segment,
             (min(CASE WHEN acctbal IS NOT NULL THEN {'p': prio, 't': prio, 'v': acctbal} END)).v AS acctbal
           FROM u GROUP BY c_custkey ORDER BY c_custkey""",
      "q_window_distinct" ->
        """SELECT (epoch_ns(ts) // 600000000000) * 600 AS window_start,
             count(DISTINCT user_id) AS n_distinct, count(*) AS n_events
           FROM events GROUP BY 1 ORDER BY 1""",
      // Data-quality gate: FILTERed counts keep every count BIGINT
      // (a bare sum(CASE) is HUGEINT in DuckDB and would dtype-
      // mismatch); rates are unrounded IEEE divides on exact counts.
      "q_dq_rules" ->
        """WITH t AS (SELECT count(*) AS n,
             count(*) FILTER (WHERE l_orderkey IS NULL) AS v_nn,
             count(*) FILTER (WHERE COALESCE(l_quantity < 1 OR l_quantity > 45, FALSE)) AS v_rq,
             count(*) FILTER (WHERE COALESCE(l_discount < 0 OR l_discount > 0.05, FALSE)) AS v_rd,
             count(*) FILTER (WHERE COALESCE(l_returnflag NOT IN ('A','R'), FALSE)) AS v_set,
             count(*) FILTER (WHERE COALESCE(NOT regexp_matches(l_linestatus, '^[OF]$'), FALSE)) AS v_re,
             count(*) FILTER (WHERE COALESCE(NOT (l_extendedprice * (1 - l_discount) > 0), TRUE)) AS v_ck
             FROM lineitem),
           u AS (SELECT count(*) AS n, count(*) -
               (SELECT count(*) FROM (SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem)) AS v
             FROM lineitem)
           SELECT rule, n_violations, n_rows,
             n_violations::DOUBLE / n_rows AS violation_rate FROM (
             SELECT 'check:positive_net_price' AS rule, v_ck AS n_violations, n AS n_rows FROM t
             UNION ALL SELECT 'not_null:l_orderkey', v_nn, n FROM t
             UNION ALL SELECT 'range:l_discount', v_rd, n FROM t
             UNION ALL SELECT 'range:l_quantity', v_rq, n FROM t
             UNION ALL SELECT 'regex:l_linestatus', v_re, n FROM t
             UNION ALL SELECT 'set:l_returnflag', v_set, n FROM t
             UNION ALL SELECT 'unique:l_orderkey,l_linenumber', v, n FROM u)
           ORDER BY rule""",
      // Incremental aggregate maintenance: the oracle aggregates the
      // WHOLE fact from scratch — equality proves the per-batch
      // partial/merge algebra is exact (decimal sums associate).
      "q_agg_merge" ->
        s"""SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
            ${sqlDsum("l_extendedprice")} AS sum_value,
            min(l_extendedprice) AS min_value,
            max(l_extendedprice) AS max_value,
            ${sqlDsum("l_extendedprice")} / count(*) AS avg_value
            FROM lineitem GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus""",
      "q_pricing_summary" ->
        s"""SELECT l_returnflag, l_linestatus,
            ${sqlDsum("l_quantity")} AS sum_qty,
            ${sqlDsum("l_extendedprice")} AS sum_base_price,
            ${sqlDsum("l_extendedprice * (1 - l_discount)", 4)} AS sum_disc_price,
            count(*) AS n_rows,
            ${sqlDsum("l_quantity")} / count(*) AS avg_qty
            FROM lineitem GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus""",
      "q_drug_report" ->
        s"""SELECT a.l_partkey, a.total_claims, a.total_cost, p.p_name, p.p_brand
            FROM (SELECT l_partkey, ${sqlDsum("l_quantity")} AS total_claims,
                  ${sqlDsum("l_extendedprice")} AS total_cost
                  FROM lineitem GROUP BY l_partkey) a
            LEFT JOIN part p ON a.l_partkey = p.p_partkey
            ORDER BY a.l_partkey""",
      "q_prescriber_report" ->
        s"""SELECT a.l_suppkey, a.num_prescriptions, a.total_claims, a.total_cost,
                   s.s_name, n.n_name AS state_name
            FROM (SELECT l_suppkey, count(*) AS num_prescriptions,
                  ${sqlDsum("l_quantity")} AS total_claims,
                  ${sqlDsum("l_extendedprice")} AS total_cost
                  FROM lineitem GROUP BY l_suppkey) a
            LEFT JOIN supplier s ON a.l_suppkey = s.s_suppkey
            LEFT JOIN nation n ON s.s_nationkey = n.n_nationkey
            ORDER BY a.l_suppkey""",
      "q_brand_report" ->
        s"""SELECT p.p_brand, ${sqlDsum("l.l_extendedprice")} AS prescriptions
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            GROUP BY p.p_brand ORDER BY prescriptions DESC, p.p_brand""",
      "q_kpis" ->
        s"""SELECT count(DISTINCT l_partkey) AS n_drugs,
            count(DISTINCT l_suppkey) AS n_prescribers,
            count(*) AS n_rows,
            ${sqlDsum("l_quantity")} AS total_claims,
            ${sqlDsum("l_extendedprice")} AS total_cost
            FROM lineitem""",
      "q_regional_revenue" ->
        s"""SELECT n.n_name, ${sqlDsum("l.l_extendedprice * (1 - l.l_discount)", 4)} AS revenue
            FROM lineitem l
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n ON s.s_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            WHERE r.r_name = 'ASIA'
            GROUP BY n.n_name ORDER BY revenue DESC, n.n_name""",
      "q_calendar" -> // DuckDB's isodow IS the ISO convention; years are INTs
        s"""SELECT CAST(year(o_orderdate) AS INTEGER) AS y,
              CAST(quarter(o_orderdate) AS INTEGER) AS q,
              CAST(month(o_orderdate) AS INTEGER) AS m,
              CAST(isodow(o_orderdate) AS INTEGER) AS iso_dow,
              CAST(count(*) AS BIGINT) AS n_orders,
              ${sqlDsum("o_totalprice")} AS revenue
            FROM orders GROUP BY 1, 2, 3, 4 ORDER BY y, q, m, iso_dow""",
      "q_share_hierarchy" -> // decimal window sums; shares 6-dp (ULP render)
        s"""WITH a AS (SELECT r.r_name, n.n_name,
                 sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))) AS rev
               FROM lineitem l
               JOIN supplier s ON l.l_suppkey = s.s_suppkey
               JOIN nation n ON s.s_nationkey = n.n_nationkey
               JOIN region r ON n.n_regionkey = r.r_regionkey
               GROUP BY r.r_name, n.n_name)
            SELECT r_name, n_name, CAST(rev AS DOUBLE) AS revenue,
              round(CAST(rev AS DOUBLE) /
                CAST(sum(rev) OVER (PARTITION BY r_name) AS DOUBLE), 6) AS share_in_region,
              round(CAST(sum(rev) OVER (PARTITION BY r_name) AS DOUBLE) /
                CAST(sum(rev) OVER () AS DOUBLE), 6) AS region_share
            FROM a ORDER BY r_name, n_name""",
      "q_shipped_between" ->
        s"""SELECT l_returnflag, count(*) AS n_rows, ${sqlDsum("l_quantity")} AS sum_qty
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
            GROUP BY l_returnflag ORDER BY l_returnflag""",
      "q_segment_revenue" ->
        s"""SELECT c.c_mktsegment, ${sqlDsum("l.l_extendedprice * (1 - l.l_discount)", 4)} AS revenue
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""",
      "q_customers_with_orders" ->
        """SELECT c_custkey, c_name FROM customer
           WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
           ORDER BY c_custkey""",
      "q_customers_without_orders" ->
        """SELECT c_custkey, c_name FROM customer
           WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
           ORDER BY c_custkey""",
      "q_count_per_key" ->
        """SELECT o_custkey, count(*) AS num_prescriptions FROM orders
           GROUP BY o_custkey ORDER BY num_prescriptions DESC, o_custkey""",
      "q_collect" -> // string_agg ORDER BY = the sorted array_agg rendering;
        // count(col) not count(*): n = collected (non-null) values
        """SELECT o_custkey,
             string_agg(o_orderkey::VARCHAR, ',' ORDER BY o_orderkey) AS values_csv,
             count(o_orderkey) AS n
           FROM orders WHERE o_custkey < 100
           GROUP BY o_custkey ORDER BY o_custkey""",
      "q_bloom_join" -> // plain join: the bloom prune must not change the result
        """SELECT l.l_orderkey, l.l_linenumber, l.l_extendedprice, o.o_totalprice
           FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
           WHERE o.o_orderkey % 97 = 0
           ORDER BY l.l_orderkey, l.l_linenumber""",
      "q_salted_join" -> // plain join: salting must not change the result
        s"""SELECT p.p_brand, count(*) AS n_rows, ${sqlDsum("l.l_quantity")} AS sum_qty
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            GROUP BY p.p_brand ORDER BY p.p_brand""",
      "q_rollup" -> // NULLS FIRST: Spark's ASC default; DuckDB defaults NULLS LAST
        s"""SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
            ${sqlDsum("l_quantity")} AS sum_qty
            FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
            ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
      "q_grouping_sets" -> // grouping() flags disambiguate subtotal NULLs
        s"""SELECT l_returnflag, l_linestatus,
            CAST(GROUPING(l_returnflag) AS INTEGER) AS g_rf,
            CAST(GROUPING(l_linestatus) AS INTEGER) AS g_ls,
            count(*) AS n_rows, ${sqlDsum("l_quantity")} AS sum_qty
            FROM lineitem
            GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
            ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
      "q_cube" -> // NULLS FIRST: Spark's ASC default; DuckDB defaults NULLS LAST
        s"""SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
            ${sqlDsum("l_quantity")} AS sum_qty
            FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
            ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""",
      "q_pivot" -> // sum(CASE ...) is SQL's pivot spelling; empty cell -> NULL both sides
        s"""SELECT l_returnflag,
            CAST(sum(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_F,
            CAST(sum(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_O
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
      "q_quantiles" -> // quantile_cont = the same (1-g)*a + g*b interpolation as Spark's percentile
        """SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS p50,
             quantile_cont(l_quantity, 0.9) AS p90
           FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
      "q_winsorize" -> // clip is pure comparison; bounds via the shared interpolation
        """WITH b AS (SELECT quantile_cont(l_extendedprice::DOUBLE, 0.05) AS lo,
                             quantile_cont(l_extendedprice::DOUBLE, 0.95) AS hi
                      FROM lineitem)
           SELECT l_orderkey, l_linenumber,
             least(greatest(l_extendedprice::DOUBLE, lo), hi) AS l_extendedprice_w
           FROM lineitem, b ORDER BY l_orderkey, l_linenumber""",
      "q_salted_sum" ->
        s"""SELECT l_returnflag, ${sqlDsum("l_quantity")} AS sum_l_quantity
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
      "q_top_parts" ->
        "SELECT * FROM part ORDER BY p_retailprice DESC, p_partkey LIMIT 100",
      "q_top_parts_per_brand" ->
        """SELECT * FROM (
             SELECT p.*, CAST(row_number() OVER (
               PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS INTEGER) AS "rank"
             FROM part p) WHERE "rank" <= 3 ORDER BY p_brand, "rank"""",
      "q_topk_agg" -> // aggregator path, identical result contract
        """SELECT * FROM (
             SELECT p.*, CAST(row_number() OVER (
               PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS INTEGER) AS "rank"
             FROM part p) WHERE "rank" <= 3 ORDER BY p_brand, "rank"""",
      "q_monthly_trend" ->
        s"""WITH m AS (SELECT l_suppkey, date_trunc('month', l_shipdate)::DATE AS month,
              ${sqlDsum("l_quantity")} AS claims
              FROM lineitem GROUP BY 1, 2)
            SELECT l_suppkey, month, claims,
              lag(claims) OVER w AS prev_claims,
              claims - lag(claims) OVER w AS delta,
              CAST(row_number() OVER w AS INTEGER) AS month_seq,
              CAST(sum(CAST(claims AS DECIMAL(18,2))) OVER
                (PARTITION BY l_suppkey ORDER BY month
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_claims
            FROM m WINDOW w AS (PARTITION BY l_suppkey ORDER BY month)
            ORDER BY l_suppkey, month""",
      "q_rank_in_group" ->
        """SELECT s_suppkey, s_name, s_nationkey, s_acctbal,
             CAST(rank() OVER w AS INTEGER) AS balance_rank,
             CAST(dense_rank() OVER w AS INTEGER) AS balance_dense_rank
           FROM supplier WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
           ORDER BY s_nationkey, balance_rank, s_suppkey""",
      "q_window_stats" ->
        """SELECT s_suppkey, s_nationkey, s_acctbal,
             CAST(ntile(4) OVER w AS INTEGER) AS quartile,
             percent_rank() OVER w AS pct_rank,
             cume_dist() OVER w AS cume
           FROM supplier WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)
           ORDER BY s_nationkey, pct_rank, s_suppkey""",
      "q_moving_avg" -> // decimal frame sums: windowed agg order is engine-internal
        """WITH e AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS ts_us,
             CAST(value AS DECIMAL(18,2)) AS v FROM events)
           SELECT event_id, user_id, ts_us,
             CAST(sum(v) OVER w3 AS DOUBLE) / count(*) OVER w3 AS mov_avg3,
             CAST(sum(v) OVER wr AS DOUBLE) AS sum_10m,
             count(*) OVER wr AS n_10m
           FROM e
           WINDOW w3 AS (PARTITION BY user_id ORDER BY ts_us
                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
                  wr AS (PARTITION BY user_id ORDER BY ts_us
                         RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
           ORDER BY event_id""",
      "q_zorder" -> { // the same unrolled shift/mask/or as Layout.mortonInterleave
        val terms = (0 until 8).map(i =>
          s"(((o_custkey % 256) >> $i) & 1) * ${1L << (2 * i)} + " +
            s"(((o_orderkey % 256) >> $i) & 1) * ${1L << (2 * i + 1)}").mkString(" + ")
        s"SELECT o_orderkey, $terms AS zval FROM orders ORDER BY o_orderkey"
      },
      "q_dedup_exact" ->
        """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
           ORDER BY l_returnflag, l_linestatus""",
      "q_dedup_keyed" ->
        """SELECT l_orderkey, l_linenumber, l_quantity FROM (
             SELECT l_orderkey, l_linenumber, l_quantity,
               row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_quantity) AS rn
             FROM lineitem) WHERE rn = 1 ORDER BY l_orderkey""",
      "q_dedup_keyed_agg" -> // same contract as q_dedup_keyed, by design
        """SELECT l_orderkey, l_linenumber, l_quantity FROM (
             SELECT l_orderkey, l_linenumber, l_quantity,
               row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_quantity) AS rn
             FROM lineitem) WHERE rn = 1 ORDER BY l_orderkey""",
      "q_null_profile" -> {
        val cols = Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
        cols.map(c => s"CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS ${c}_nulls")
          .mkString("SELECT ", ", ", " FROM customer")
      },
      "q_data_dictionary" -> {
        val cols = Seq("s_acctbal", "s_name", "s_nationkey", "s_suppkey")
        cols.map(c =>
          s"""SELECT '$c' AS column_name,
              CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_count,
              CAST(count(DISTINCT $c) AS BIGINT) AS distinct_count FROM supplier""")
          .mkString("SELECT * FROM (", " UNION ALL ", ") ORDER BY column_name")
      },
      "q_value_counts" ->
        """SELECT o_orderpriority, count(*) AS n FROM orders
           GROUP BY o_orderpriority ORDER BY n DESC, o_orderpriority""",
      "q_distinct_monitor" -> // the stateful monitor's batch twin == the KMV chain
        """WITH h AS (SELECT DISTINCT event_type,
                 ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
               FROM events WHERE user_id IS NOT NULL),
               r AS (SELECT event_type, h,
                 row_number() OVER (PARTITION BY event_type ORDER BY h) AS r FROM h),
               s AS (SELECT event_type, h FROM r WHERE r <= 64)
           SELECT event_type, CAST(count(*) AS BIGINT) AS n_kept,
             CASE WHEN count(*) < 64 THEN count(*)::DOUBLE
                  ELSE 63.0 * 1152921504606846976::DOUBLE / max(h)::DOUBLE END
               AS distinct_est
           FROM s GROUP BY event_type ORDER BY event_type""",
      "q_kmv_distinct" -> // same md5 60-bit fp, same (k-1)·2^60/h_k estimator
        """WITH h AS (SELECT DISTINCT event_type AS "group",
                 ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
               FROM events),
               r AS (SELECT "group", h,
                 row_number() OVER (PARTITION BY "group" ORDER BY h) AS r FROM h),
               s AS (SELECT "group", h FROM r WHERE r <= 64)
           SELECT "group", CAST(count(*) AS BIGINT) AS n_kept,
             CASE WHEN count(*) < 64 THEN count(*)::DOUBLE
                  ELSE 63.0 * 1152921504606846976::DOUBLE / max(h)::DOUBLE END
               AS distinct_est
           FROM s GROUP BY "group" ORDER BY "group"""",
      "q_kmv_overlap" -> // union sketch from the two k-min sets; inclusion–exclusion
        """WITH h AS (SELECT DISTINCT event_type AS "group",
                 ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
               FROM events),
               r AS (SELECT "group", h,
                 row_number() OVER (PARTITION BY "group" ORDER BY h) AS r FROM h),
               s AS (SELECT "group", h FROM r WHERE r <= 64),
               e AS (SELECT "group", CASE WHEN count(*) < 64 THEN count(*)::DOUBLE
                       ELSE 63.0 * 1152921504606846976::DOUBLE / max(h)::DOUBLE END AS est
                     FROM s GROUP BY "group"),
               g AS (SELECT DISTINCT "group" FROM s),
               p AS (SELECT a."group" AS group_a, b."group" AS group_b
                     FROM g a, g b WHERE a."group" < b."group"),
               pr AS (SELECT DISTINCT group_a, group_b, h
                      FROM p JOIN s ON s."group" = group_a OR s."group" = group_b),
               u AS (SELECT group_a, group_b, h,
                 row_number() OVER (PARTITION BY group_a, group_b ORDER BY h) AS r
                 FROM pr),
               ue AS (SELECT group_a, group_b,
                 CASE WHEN count(*) < 64 THEN count(*)::DOUBLE
                      ELSE 63.0 * 1152921504606846976::DOUBLE / max(h)::DOUBLE END
                   AS est_union
                 FROM u WHERE r <= 64 GROUP BY group_a, group_b)
           SELECT group_a, group_b, ea.est AS est_a, eb.est AS est_b, est_union,
             greatest(0.0, ea.est + eb.est - est_union) AS est_intersection,
             greatest(0.0, ea.est + eb.est - est_union) / est_union AS jaccard_est
           FROM ue JOIN e ea ON ue.group_a = ea."group"
                   JOIN e eb ON ue.group_b = eb."group"
           ORDER BY group_a, group_b""",
      "q_histogram" ->
        """WITH mm AS (SELECT CAST(min(l_quantity) AS DOUBLE) AS mn,
                              CAST(max(l_quantity) AS DOUBLE) AS mx FROM lineitem)
           SELECT CAST(CASE WHEN mn = mx THEN 0 ELSE
                    least(floor((CAST(l_quantity AS DOUBLE) - mn) / ((mx - mn) / 10)), 9)
                  END AS BIGINT) AS bucket, count(*) AS n
           FROM lineitem, mm WHERE l_quantity IS NOT NULL
           GROUP BY 1 ORDER BY bucket""",
      "q_key_skew" -> // positive operands: floor (//) == truncate (DIV)
        """WITH c AS (SELECT l_partkey, count(*) AS n FROM lineitem GROUP BY l_partkey)
           SELECT CAST(count(*) AS BIGINT) AS n_keys, CAST(sum(n) AS BIGINT) AS n_rows,
             CAST(max(n) AS BIGINT) AS max_n,
             quantile_cont(n, 0.5) AS p50_n, quantile_cont(n, 0.99) AS p99_n,
             CAST(max(n) * 10000 // (sum(n) // count(*)) AS BIGINT) AS skew_ratio_bp,
             CAST(greatest(1, max(n) // (sum(n) // count(*))) AS BIGINT) AS suggested_salt
           FROM c""",
      "q_quantile_buckets" -> // quantile_cont == percentile interpolation; ties to lower
        """WITH b AS (SELECT quantile_cont(l_extendedprice::DOUBLE, 0.25) AS q0,
                             quantile_cont(l_extendedprice::DOUBLE, 0.5) AS q1,
                             quantile_cont(l_extendedprice::DOUBLE, 0.75) AS q2
                      FROM lineitem)
           SELECT l_orderkey, l_linenumber, l_extendedprice,
             CAST(CASE WHEN l_extendedprice IS NULL THEN NULL
                       WHEN l_extendedprice::DOUBLE <= q0 THEN 0
                       WHEN l_extendedprice::DOUBLE <= q1 THEN 1
                       WHEN l_extendedprice::DOUBLE <= q2 THEN 2 ELSE 3 END AS INTEGER)
               AS bucket
           FROM lineitem, b ORDER BY l_orderkey, l_linenumber""",
      "q_zscore" -> // same decimal moments + the same double expression, op for op
        """WITH s AS (SELECT l_returnflag, count(*) AS n,
                sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sx,
                sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,4))) AS sxx
              FROM lineitem GROUP BY l_returnflag)
           SELECT l_orderkey, l_linenumber, l.l_returnflag, l_extendedprice,
             CASE WHEN n > 1 AND
               (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                  / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1) > 0
             THEN round((CAST(l_extendedprice AS DOUBLE)
                     - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                  / sqrt((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                       / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1)), 6)
             END AS z
           FROM lineitem l JOIN s ON l.l_returnflag IS NOT DISTINCT FROM s.l_returnflag
           ORDER BY l_orderkey, l_linenumber""",
      "q_share_of_total" ->
        """WITH g AS (SELECT l_returnflag, sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS grp
                      FROM lineitem GROUP BY l_returnflag),
                t AS (SELECT sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS tot FROM lineitem)
           SELECT l_returnflag, CAST(grp AS DOUBLE) AS total_measure,
                  CAST(grp AS DOUBLE) / NULLIF(CAST(tot AS DOUBLE), 0) AS share
           FROM g, t ORDER BY l_returnflag""",
      "q_anonymize" ->
        "SELECT c_custkey, sha256(c_name) AS c_name FROM customer ORDER BY c_custkey",
      "q_vault" ->
        """SELECT DISTINCT c_name AS original, sha256(c_name) AS hashed FROM customer
           WHERE c_name IS NOT NULL ORDER BY original""",
      "q_deanonymize" ->
        "SELECT c_custkey, c_name FROM customer ORDER BY c_custkey",
      "q_k_anonymity" ->
        """SELECT c_nationkey, c_mktsegment,
             CAST(count(*) AS BIGINT) AS group_size, count(*) < 5 AS at_risk
           FROM customer GROUP BY c_nationkey, c_mktsegment
           ORDER BY c_nationkey, c_mktsegment""",
      "q_l_diversity" ->
        """SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(count(DISTINCT c_acctbal) AS BIGINT) AS l_diversity
           FROM customer GROUP BY c_nationkey, c_mktsegment
           ORDER BY c_nationkey, c_mktsegment""",
      "q_backfill" -> // only the corrected day changes; decimal sums both sides
        s"""SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS n_events,
              CAST(sum(CAST(CASE WHEN CAST(ts AS DATE) = DATE '2024-01-05'
                THEN value * 2 ELSE value END AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
            FROM events GROUP BY 1 ORDER BY day""",
      "q_cohort_retention" -> // DATE casts pinned by the UTC session tz
        """WITH d AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
               f AS (SELECT user_id, min(day) AS cohort_day FROM d GROUP BY user_id),
               a AS (SELECT DISTINCT user_id, day FROM d)
           SELECT f.cohort_day,
             CAST(date_diff('day', f.cohort_day, a.day) AS BIGINT) AS day_offset,
             CAST(count(*) AS BIGINT) AS n_users
           FROM a JOIN f USING (user_id)
           GROUP BY f.cohort_day, day_offset
           ORDER BY cohort_day, day_offset""",
      "q_cohort_ltv" -> // decimal cumsum per cohort; day-0 size denominator
        """WITH b AS (SELECT user_id, CAST(ts AS DATE) AS day,
               CAST(value AS DECIMAL(18,2)) AS v FROM events),
           f AS (SELECT user_id, min(day) AS cohort_day FROM b GROUP BY user_id),
           sz AS (SELECT cohort_day, CAST(count(*) AS BIGINT) AS cohort_users
             FROM f GROUP BY cohort_day),
           daily AS (SELECT f.cohort_day,
               CAST(date_diff('day', f.cohort_day, b.day) AS BIGINT) AS day_offset,
               CAST(sum(b.v) AS DECIMAL(28,2)) AS rev
             FROM b JOIN f USING (user_id)
             GROUP BY f.cohort_day, day_offset),
           c AS (SELECT cohort_day, day_offset, rev,
               CAST(sum(rev) OVER (PARTITION BY cohort_day ORDER BY day_offset
                 ROWS UNBOUNDED PRECEDING) AS DECIMAL(28,2)) AS cum
             FROM daily)
           SELECT c.cohort_day, c.day_offset, sz.cohort_users,
             CAST(rev AS DOUBLE) AS revenue,
             CAST(cum AS DOUBLE) AS cum_revenue,
             round(CAST(cum AS DOUBLE) / CAST(sz.cohort_users AS DOUBLE), 6)
               AS ltv_per_user
           FROM c JOIN sz USING (cohort_day)
           ORDER BY cohort_day, day_offset""",
      "q_gap_fill" -> // LOCF copies values (no arithmetic) — engine-exact
        """WITH g AS (SELECT event_id, user_id, ts,
                 CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END AS value
               FROM events)
           SELECT event_id, user_id, value,
             last_value(value IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled
           FROM g ORDER BY user_id, event_id""",
      "q_attribution_position" -> // U-shape credits, decimal-rounded pre-sum
        """WITH ev AS (SELECT event_id, user_id, event_type,
               epoch_us(ts) AS us FROM events),
           convs AS (SELECT user_id, event_id AS conv_id, us AS conv_us
             FROM ev WHERE event_type = 'purchase'),
           touches AS (SELECT user_id, event_id AS touch_id,
               event_type AS channel, us AS touch_us
             FROM ev WHERE event_type <> 'purchase'),
           pairs AS (SELECT c.conv_id, t.channel, t.touch_us, t.touch_id
             FROM convs c JOIN touches t USING (user_id)
             WHERE t.touch_us < c.conv_us
               AND c.conv_us - t.touch_us <= 604800000000),
           scored AS (SELECT conv_id, channel,
               count(*) OVER (PARTITION BY conv_id) AS k,
               row_number() OVER (PARTITION BY conv_id
                 ORDER BY touch_us, touch_id) AS rn
             FROM pairs)
           SELECT channel,
             CAST(count(DISTINCT conv_id) AS BIGINT) AS conversions,
             CAST(sum(CAST(CASE WHEN k = 1 THEN 1.0
                 WHEN k = 2 THEN 0.5
                 WHEN rn = 1 OR rn = k THEN 0.4
                 ELSE round(0.2 / CAST(k - 2 AS DOUBLE), 6)
               END AS DECIMAL(18,6))) AS DOUBLE) AS total_credit
           FROM scored GROUP BY channel ORDER BY channel""",
      "q_attribution" -> // two IGNORE NULLS windows share one condition: same row
        """WITH o AS (SELECT event_id, user_id, event_type, epoch_ns(ts) // 1000 AS us,
                 last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                   IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt_type,
                 last_value(CASE WHEN event_type <> 'purchase' THEN epoch_ns(ts) // 1000 END
                   IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt_us
               FROM events)
           SELECT event_id, user_id, us AS conv_us,
             CASE WHEN lt_us IS NOT NULL AND us - lt_us <= 604800000000
                  THEN lt_type ELSE 'direct' END AS channel,
             CASE WHEN lt_us IS NOT NULL AND us - lt_us <= 604800000000
                  THEN us - lt_us END AS gap_us
           FROM o WHERE event_type = 'purchase' ORDER BY event_id""",
      "q_bucket_join" -> // the bucketed layout must not change the join's rows
        """SELECT l.l_orderkey AS orderkey, l.l_linenumber, l.l_extendedprice,
                  o.o_totalprice
           FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
           ORDER BY orderkey, l_linenumber""",
      "q_session_funnel" -> // the funnel chain keyed by (user, session)
        """WITH o AS (SELECT event_id, user_id, event_type, epoch_ns(ts) // 1000 AS us,
                 lag(epoch_ns(ts) // 1000) OVER (PARTITION BY user_id
                   ORDER BY epoch_ns(ts) // 1000, event_id) AS prev
               FROM events),
               se AS (SELECT user_id || '#' || sum(CASE WHEN prev IS NULL
                          OR us - prev > 1800000000 THEN 1 ELSE 0 END)
                        OVER (PARTITION BY user_id ORDER BY us, event_id
                              ROWS UNBOUNDED PRECEDING) AS skey,
                        event_type, us
                      FROM o),
               s0 AS (SELECT skey, min(us) AS t0 FROM se
                      WHERE event_type = 'view' GROUP BY skey),
               s1 AS (SELECT e.skey, min(e.us) AS t1 FROM se e JOIN s0 USING (skey)
                      WHERE e.event_type = 'click' AND e.us > s0.t0 GROUP BY e.skey),
               s2 AS (SELECT e.skey, min(e.us) AS t2 FROM se e JOIN s1 USING (skey)
                      WHERE e.event_type = 'purchase' AND e.us > s1.t1 GROUP BY e.skey),
               c AS (SELECT (SELECT count(*) FROM s0) AS c0,
                            (SELECT count(*) FROM s1) AS c1,
                            (SELECT count(*) FROM s2) AS c2)
           SELECT * FROM (
             SELECT 0 AS step_idx, 'view' AS step, CAST(c0 AS BIGINT) AS n_sessions,
               CASE WHEN c0 > 0 THEN round(c0::DOUBLE / c0::DOUBLE, 6) END AS conv_from_first,
               CASE WHEN c0 > 0 THEN round(c0::DOUBLE / c0::DOUBLE, 6) END AS conv_from_prev
             FROM c
             UNION ALL
             SELECT 1, 'click', CAST(c1 AS BIGINT),
               CASE WHEN c0 > 0 THEN round(c1::DOUBLE / c0::DOUBLE, 6) END,
               CASE WHEN c0 > 0 THEN round(c1::DOUBLE / c0::DOUBLE, 6) END
             FROM c
             UNION ALL
             SELECT 2, 'purchase', CAST(c2 AS BIGINT),
               CASE WHEN c0 > 0 THEN round(c2::DOUBLE / c0::DOUBLE, 6) END,
               CASE WHEN c1 > 0 THEN round(c2::DOUBLE / c1::DOUBLE, 6) END
             FROM c)
           ORDER BY step_idx""",
      "q_funnel" -> // min-ts-after-previous-step; conversions divide exact BIGINTs
        """WITH s0 AS (SELECT user_id, min(ts) AS t0 FROM events
                       WHERE event_type = 'view' GROUP BY user_id),
               s1 AS (SELECT e.user_id, min(e.ts) AS t1 FROM events e JOIN s0 USING (user_id)
                      WHERE e.event_type = 'click' AND e.ts > s0.t0 GROUP BY e.user_id),
               s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
                      WHERE e.event_type = 'purchase' AND e.ts > s1.t1 GROUP BY e.user_id),
               c AS (SELECT (SELECT count(*) FROM s0) AS c0,
                            (SELECT count(*) FROM s1) AS c1,
                            (SELECT count(*) FROM s2) AS c2)
           SELECT * FROM (
             SELECT 0 AS step_idx, 'view' AS step, CAST(c0 AS BIGINT) AS n_users,
               CASE WHEN c0 > 0 THEN round(c0::DOUBLE / c0::DOUBLE, 6) END AS conv_from_first,
               CASE WHEN c0 > 0 THEN round(c0::DOUBLE / c0::DOUBLE, 6) END AS conv_from_prev
             FROM c
             UNION ALL
             SELECT 1, 'click', CAST(c1 AS BIGINT),
               CASE WHEN c0 > 0 THEN round(c1::DOUBLE / c0::DOUBLE, 6) END,
               CASE WHEN c0 > 0 THEN round(c1::DOUBLE / c0::DOUBLE, 6) END
             FROM c
             UNION ALL
             SELECT 2, 'purchase', CAST(c2 AS BIGINT),
               CASE WHEN c0 > 0 THEN round(c2::DOUBLE / c0::DOUBLE, 6) END,
               CASE WHEN c1 > 0 THEN round(c2::DOUBLE / c1::DOUBLE, 6) END
             FROM c)
           ORDER BY step_idx""",
      "q_funnel_timing" -> // same chain; gap percentiles via the bridge
        """WITH s0 AS (SELECT user_id, min(ts) AS t0 FROM events
                       WHERE event_type = 'view' GROUP BY user_id),
               s1 AS (SELECT e.user_id, min(e.ts) AS t1 FROM events e JOIN s0 USING (user_id)
                      WHERE e.event_type = 'click' AND e.ts > s0.t0 GROUP BY e.user_id),
               s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
                      WHERE e.event_type = 'purchase' AND e.ts > s1.t1 GROUP BY e.user_id),
               g1 AS (SELECT CAST(epoch_us(s1.t1) - epoch_us(s0.t0) AS DOUBLE) AS gap
                      FROM s1 JOIN s0 USING (user_id)),
               g2 AS (SELECT CAST(epoch_us(s2.t2) - epoch_us(s1.t1) AS DOUBLE) AS gap
                      FROM s2 JOIN s1 USING (user_id))
           SELECT * FROM (
             SELECT 0 AS step_idx, 'view -> click' AS transition,
               (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n_users,
               (SELECT round(quantile_cont(gap, 0.5) / 1000000.0, 3) FROM g1) AS median_s,
               (SELECT round(quantile_cont(gap, 0.9) / 1000000.0, 3) FROM g1) AS p90_s
             UNION ALL
             SELECT 1, 'click -> purchase',
               (SELECT CAST(count(*) AS BIGINT) FROM s2),
               (SELECT round(quantile_cont(gap, 0.5) / 1000000.0, 3) FROM g2),
               (SELECT round(quantile_cont(gap, 0.9) / 1000000.0, 3) FROM g2))
           ORDER BY step_idx""",
      "q_integrity" -> { // one left-join + conditional-count block per FK edge
        def edge(name: String, child: String, ck: String,
                 parent: String, pk: String) =
          s"""SELECT '$name' AS relationship,
                CAST(count(*) AS BIGINT) AS child_rows,
                CAST(count(CASE WHEN c.$ck IS NOT NULL AND p.$pk IS NULL THEN 1 END)
                  AS BIGINT) AS orphan_rows,
                CAST(count(CASE WHEN c.$ck IS NULL THEN 1 END) AS BIGINT) AS null_key_rows,
                CASE WHEN count(*) > 0 THEN
                  round(count(CASE WHEN c.$ck IS NOT NULL AND p.$pk IS NULL THEN 1 END)::DOUBLE
                    / count(*)::DOUBLE, 6) END AS orphan_share
              FROM $child c LEFT JOIN (SELECT DISTINCT $pk FROM $parent) p
                ON c.$ck = p.$pk"""
        Seq(
          edge("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
          edge("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
          edge("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
          edge("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"))
          .mkString("SELECT * FROM (", " UNION ALL ", ") ORDER BY relationship")
      },
      "q_incremental" ->
        """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
           WHERE o_orderkey > (SELECT max(o_orderkey) FROM orders WHERE o_custkey < 100)
           ORDER BY o_orderkey""",
      "q_corr" -> // same decimal sums, same double expression — bit-identical
        """WITH a AS (SELECT l_returnflag, count(*) AS n,
             sum(CAST(l_quantity AS DECIMAL(18,2))) AS sx,
             sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
             sum(CAST(l_quantity * l_quantity AS DECIMAL(38,4))) AS sxx,
             sum(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,4))) AS syy,
             sum(CAST(l_quantity * l_extendedprice AS DECIMAL(38,4))) AS sxy
             FROM lineitem GROUP BY l_returnflag)
           SELECT l_returnflag, round(
             (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
             (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
              sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
             6) AS corr
           FROM a ORDER BY l_returnflag""",
      "q_spearman" -> // doubled average ranks (integral), then the q_corr machinery
        """WITH r AS (SELECT l_returnflag,
             2*rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
               + count(*) OVER (PARTITION BY l_returnflag, l_quantity) - 1 AS rx,
             2*rank() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice)
               + count(*) OVER (PARTITION BY l_returnflag, l_extendedprice) - 1 AS ry
             FROM lineitem),
           a AS (SELECT l_returnflag, count(*) AS n,
             sum(CAST(rx AS DECIMAL(28,0))) AS sx,
             sum(CAST(ry AS DECIMAL(28,0))) AS sy,
             sum(CAST(rx*rx AS DECIMAL(38,0))) AS sxx,
             sum(CAST(ry*ry AS DECIMAL(38,0))) AS syy,
             sum(CAST(rx*ry AS DECIMAL(38,0))) AS sxy
             FROM r GROUP BY l_returnflag)
           SELECT l_returnflag,
             CASE WHEN n > 1 AND n*sxx <> sx*sx AND n*syy <> sy*sy THEN round(
               (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
               (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
                sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
               6) END AS spearman
           FROM a ORDER BY l_returnflag""",
      "q_robust_scale" -> // quantile_cont == percentile (the q_quantiles bridge)
        """WITH s AS (SELECT l_returnflag,
             quantile_cont(l_extendedprice::DOUBLE, 0.5) AS med,
             quantile_cont(l_extendedprice::DOUBLE, 0.25) AS p25,
             quantile_cont(l_extendedprice::DOUBLE, 0.75) AS p75
             FROM lineitem GROUP BY l_returnflag)
           SELECT l_orderkey, l_linenumber,
             CASE WHEN p75 - p25 > 0
                  THEN round((CAST(l_extendedprice AS DOUBLE) - med) / (p75 - p25), 6)
             END AS robust_z
           FROM lineitem JOIN s USING (l_returnflag)
           ORDER BY l_orderkey, l_linenumber""",
      "q_trend_fit" -> // exact decimal moments; closed-form slope AND intercept
        """WITH daily AS (SELECT event_type,
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS x,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS y
             FROM events GROUP BY event_type, CAST(ts AS DATE)),
           m AS (SELECT event_type, count(*) AS n,
             sum(CAST(x AS DECIMAL(28,0))) AS sx,
             sum(CAST(y AS DECIMAL(18,2))) AS sy,
             sum(CAST(x*x AS DECIMAL(38,0))) AS sxx,
             sum(CAST(CAST(x AS DECIMAL(10,0)) * y AS DECIMAL(38,2))) AS sxy
             FROM daily GROUP BY event_type)
           SELECT event_type, n,
             CASE WHEN n > 1 AND n*sxx <> sx*sx THEN round(
               (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
               (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)),
               6) END AS slope,
             CASE WHEN n > 1 AND n*sxx <> sx*sx THEN round(
               (CAST(sy AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sxy AS DOUBLE)) /
               (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)),
               6) END AS intercept
           FROM m ORDER BY event_type""",
      "q_ewma" -> ewmaOracleSql,
      "q_split" ->
        """SELECT CASE
             WHEN ('0x' || substr(md5(o_orderkey::VARCHAR), 1, 8))::BIGINT % 10000 < 8000 THEN 'train'
             WHEN ('0x' || substr(md5(o_orderkey::VARCHAR), 1, 8))::BIGINT % 10000 < 9000 THEN 'val'
             ELSE 'test' END AS split, count(*) AS n
           FROM orders GROUP BY 1 ORDER BY split""",
      "q_sample" ->
        """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
           WHERE ('0x' || substr(md5(o_orderkey::VARCHAR), 1, 8))::BIGINT % 10000 < 2000
           ORDER BY o_orderkey""",
      "q_exact_sample" -> // bottom-k by the 60-bit portable key
        """SELECT doc_id, source FROM (
             SELECT doc_id, source FROM documents
             ORDER BY ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT, doc_id
             LIMIT 100)
           ORDER BY doc_id""",
      "q_weighted_reservoir" -> // E-S keys: u^(1/w) on the portable hash
        """SELECT doc_id, source, n_chars FROM (
             SELECT doc_id, source, n_chars,
               pow((('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT + 1.0)
                     / 1152921504606846976.0,
                   1.0 / CAST(n_chars AS DOUBLE)) AS es_key
             FROM documents WHERE CAST(n_chars AS DOUBLE) > 0
             ORDER BY es_key DESC, doc_id LIMIT 100)
           ORDER BY doc_id""",
      "q_stratified_sample" ->
        """SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity FROM lineitem
           WHERE ('0x' || substr(md5(l_orderkey::VARCHAR), 1, 8))::BIGINT % 10000 <
             CASE WHEN l_returnflag = 'N' THEN 1000
                  WHEN l_returnflag = 'A' THEN 5000 ELSE 200 END
           ORDER BY l_orderkey, l_linenumber, l_quantity""",
      "q_mixture_sample" ->
        """WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
                t AS (SELECT sum(cnt) AS n FROM c),
                r AS (SELECT lang, least(10000, floor(
                        CASE lang WHEN 'en' THEN 0.5::DOUBLE WHEN 'zh' THEN 0.2::DOUBLE
                                  WHEN 'es' THEN 0.2::DOUBLE WHEN 'de' THEN 0.1::DOUBLE
                                  ELSE 0.0::DOUBLE END
                        * 0.4::DOUBLE * n::DOUBLE * 10000 / cnt::DOUBLE))::BIGINT AS rate_bp
                      FROM c, t)
           SELECT d.doc_id, d.lang FROM documents d JOIN r USING (lang)
           WHERE ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 8))::BIGINT % 10000 < rate_bp
           ORDER BY d.doc_id""",
      // Temperature mix: sqrt is exactly-specified IEEE (pow is not);
      // the normalizer is 6-dp-rounded sqrts DECIMAL-summed (dsum) so
      // it is order-independent on both engines.
      "q_temperature_mix" ->
        """WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
           w AS (SELECT lang, cnt,
                   CAST(round(sqrt(cnt::DOUBLE), 6) AS DECIMAL(18,6)) AS wgt FROM c),
           t AS (SELECT sum(wgt) AS wsum, sum(cnt) AS n FROM w),
           r AS (SELECT lang, least(10000, floor(
                   wgt::DOUBLE / wsum::DOUBLE * 0.4::DOUBLE * n::DOUBLE
                   * 10000 / cnt::DOUBLE))::BIGINT AS rate_bp
                 FROM w, t)
           SELECT d.doc_id, d.lang FROM documents d JOIN r USING (lang)
           WHERE ('0x' || substr(md5(d.doc_id::VARCHAR), 1, 8))::BIGINT % 10000 < rate_bp
           ORDER BY d.doc_id""",
      "q_weighted_sample" ->
        """SELECT doc_id, n_chars FROM documents
           WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 10000
             < floor(least(1.0, n_chars / 2000.0) * 10000)
           ORDER BY doc_id""",
      "q_bootstrap_ci" -> // Poisson bootstrap replayed draw-for-draw
        """WITH base AS (SELECT l_orderkey || ':' || l_linenumber AS rid,
               CAST(l_extendedprice AS DECIMAL(18,2)) AS x
             FROM lineitem WHERE l_extendedprice IS NOT NULL),
           fb AS (SELECT rid, CAST(x * 100 AS BIGINT) AS xc,
               ('0x' || substr(md5(rid), 1, 15))::BIGINT AS fp FROM base),
           masks AS (SELECT rb,
               ('0x' || substr(md5('mask:' || rb), 1, 15))::BIGINT AS mk
             FROM (SELECT unnest(range(0, 100)) AS rb)),
           km AS (SELECT xc, rb,
               CASE WHEN u <  424136118829305344 THEN 0
                    WHEN u <  848272237658610688 THEN 1
                    WHEN u < 1060340297073263360 THEN 2
                    WHEN u < 1131029650211480960 THEN 3
                    WHEN u < 1148701988496035328 THEN 4
                    WHEN u < 1152236456152946176 THEN 5
                    ELSE 6 END AS k
             FROM (SELECT xc, rb, xor(fp, mk) AS u FROM fb, masks)),
           means AS (SELECT round(CAST(sum(k * xc) AS DOUBLE)
                 / (CAST(sum(k) AS DOUBLE) * 100.0), 6) AS mu
             FROM km GROUP BY rb HAVING sum(k) > 0),
           md AS (SELECT CAST(CAST(mu AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS mi,
               mu FROM means),
           pt AS (SELECT round(CAST(sum(x) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
               AS point_mean FROM base),
           agg AS (SELECT CAST(count(*) AS BIGINT) AS n_resamples,
               round(quantile_cont(mu, 0.025), 6) AS ci_lo,
               round(quantile_cont(mu, 0.975), 6) AS ci_hi,
               round(sqrt((CAST(sum(CAST(mi AS HUGEINT) * mi) AS DOUBLE)
                   - CAST(sum(mi) AS DOUBLE) * CAST(sum(mi) AS DOUBLE)
                     / CAST(count(*) AS DOUBLE))
                 / (CAST(count(*) AS DOUBLE) - 1.0)) / 1000000.0, 6) AS se_boot
             FROM md)
           SELECT point_mean, n_resamples, ci_lo, ci_hi, se_boot FROM pt, agg""",
      "q_group_cap" ->
        """SELECT doc_id, source FROM documents
           QUALIFY row_number() OVER (PARTITION BY source
             ORDER BY ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 10000, doc_id) <= 10
           ORDER BY doc_id""",
      "q_shuffle" ->
        """SELECT doc_id, lang, md5('epoch1:' || doc_id::VARCHAR) AS shuffle_key
           FROM documents ORDER BY shuffle_key""",
      "q_snapshot_diff" ->
        """WITH o AS (SELECT o_orderkey, o_custkey, o_totalprice FROM orders
                      WHERE o_orderkey % 3 <> 0),
                n AS (SELECT o_orderkey, o_custkey,
                        CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1
                             ELSE o_totalprice END AS o_totalprice
                      FROM orders WHERE o_orderkey % 7 <> 0)
           SELECT * FROM (
             SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
               CASE WHEN o.o_orderkey IS NULL THEN 'added'
                    WHEN n.o_orderkey IS NULL THEN 'removed'
                    WHEN o.o_custkey IS DISTINCT FROM n.o_custkey
                      OR o.o_totalprice IS DISTINCT FROM n.o_totalprice THEN 'changed'
               END AS change
             FROM o FULL JOIN n ON o.o_orderkey = n.o_orderkey)
           WHERE change IS NOT NULL ORDER BY o_orderkey""",
      "q_upsert" ->
        """WITH u AS (SELECT o_orderkey, o_custkey, o_totalprice + 1 AS o_totalprice
                      FROM orders WHERE o_orderkey % 5 = 0)
           SELECT * FROM u
           UNION ALL
           SELECT o.o_orderkey, o.o_custkey, o.o_totalprice FROM orders o
           WHERE NOT EXISTS (SELECT 1 FROM u WHERE u.o_orderkey = o.o_orderkey)
           ORDER BY o_orderkey""",
      "q_time_travel" -> // the pinned v1 is the untouched base table
        """SELECT c_custkey, c_acctbal FROM customer ORDER BY c_custkey""",
      // same merged-table contract through the on-disk bucketed layout
      "q_upsert_partitioned" ->
        """WITH u AS (SELECT o_orderkey, o_custkey, o_totalprice + 1 AS o_totalprice
                      FROM orders WHERE o_orderkey % 5 = 0)
           SELECT * FROM u
           UNION ALL
           SELECT o.o_orderkey, o.o_custkey, o.o_totalprice FROM orders o
           WHERE NOT EXISTS (SELECT 1 FROM u WHERE u.o_orderkey = o.o_orderkey)
           ORDER BY o_orderkey""",
      "q_except" ->
        """WITH o AS (SELECT o_orderkey, o_custkey, o_totalprice FROM orders
                      WHERE o_orderkey % 3 <> 0),
                n AS (SELECT o_orderkey, o_custkey,
                        CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1
                             ELSE o_totalprice END AS o_totalprice
                      FROM orders WHERE o_orderkey % 7 <> 0)
           SELECT * FROM o EXCEPT SELECT * FROM n ORDER BY o_orderkey""",
      "q_intersect" ->
        """WITH o AS (SELECT o_orderkey, o_custkey, o_totalprice FROM orders
                      WHERE o_orderkey % 3 <> 0),
                n AS (SELECT o_orderkey, o_custkey,
                        CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1
                             ELSE o_totalprice END AS o_totalprice
                      FROM orders WHERE o_orderkey % 7 <> 0)
           SELECT * FROM o INTERSECT SELECT * FROM n ORDER BY o_orderkey""",
      "q_asof" -> // DuckDB's native ASOF is the oracle for the composed window form
        """WITH e AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS ts_us, value FROM events),
            ck0 AS (SELECT user_id, ts_us, event_id AS ckpt_id, value AS ckpt_value
                    FROM e WHERE event_id % 10 = 0),
            ck AS (SELECT user_id, ts_us, ckpt_value FROM (
                     SELECT *, row_number() OVER (PARTITION BY user_id, ts_us
                       ORDER BY ckpt_id DESC) AS rn FROM ck0) WHERE rn = 1),
            l AS (SELECT user_id, ts_us, event_id FROM e WHERE event_id % 10 <> 0)
           SELECT l.event_id, l.user_id, l.ts_us, ck.ckpt_value
           FROM l ASOF LEFT JOIN ck ON l.user_id = ck.user_id AND l.ts_us >= ck.ts_us
           ORDER BY l.event_id""",
      "q_range_join" ->
        """WITH e AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS ts_us FROM events),
            w AS (SELECT event_id AS win_id, user_id, ts_us AS start_us,
                    ts_us + 1800000000 AS end_us FROM e WHERE event_id % 10 = 0),
            l AS (SELECT event_id, user_id, ts_us FROM e WHERE event_id % 10 <> 0)
           SELECT w.win_id, count(*) AS n_events
           FROM l JOIN w ON l.user_id = w.user_id
             AND l.ts_us >= w.start_us AND l.ts_us < w.end_us
           GROUP BY w.win_id ORDER BY w.win_id""",
      "q_stream_correlate" -> // micros truncation matches Tables.load's NANOS->micros read
        """WITH e AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS ts_us, event_type
                      FROM events),
            l AS (SELECT * FROM e WHERE event_type = 'click'),
            r AS (SELECT * FROM e WHERE event_type <> 'click')
           SELECT l.user_id, l.event_id AS left_id, r.event_id AS right_id
           FROM l JOIN r ON l.user_id = r.user_id
             AND r.ts_us >= l.ts_us AND r.ts_us <= l.ts_us + 600000000
           ORDER BY left_id, right_id""",
      "q_json_props" ->
        """SELECT event_id, event_type,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
           FROM events ORDER BY event_id""",
      "q_unpivot" -> // UNION ALL is the portable unpivot spelling
        """SELECT o_orderkey, 'o_totalprice' AS metric, o_totalprice AS value FROM orders
           UNION ALL
           SELECT o_orderkey, 'o_custkey_d' AS metric,
             CAST(o_custkey AS DOUBLE) AS value FROM orders
           ORDER BY o_orderkey, metric""",
      "q_stationary" -> stationaryOracle,
      "q_transitions" ->
        """WITH o AS (SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id
                 ORDER BY epoch_ns(ts), event_id) AS prev
             FROM events),
           p AS (SELECT prev AS from_type, event_type AS to_type, count(*) AS n
                 FROM o WHERE prev IS NOT NULL GROUP BY 1, 2)
           SELECT from_type, to_type, n,
             n::DOUBLE / (sum(n) OVER (PARTITION BY from_type))::DOUBLE AS share
           FROM p ORDER BY from_type, to_type""",
      "q_concurrency" -> // decimal-exact durations; ends before starts at equal t
        """WITH ev AS (SELECT event_id, epoch_ns(ts) // 1000 AS s_us,
                         epoch_ns(ts) // 1000 +
                           greatest(CAST(CAST(value AS DECIMAL(18,2)) * 1000000 AS BIGINT), 1)
                           AS e_us
                       FROM events),
               pts AS (SELECT event_id, s_us AS t_us, CAST(1 AS BIGINT) AS delta FROM ev
                       UNION ALL
                       SELECT event_id, e_us, CAST(-1 AS BIGINT) FROM ev)
           SELECT event_id, t_us, delta,
             CAST(sum(delta) OVER (ORDER BY t_us, delta, event_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS concurrency
           FROM pts ORDER BY t_us, delta, event_id""",
      "q_scd2" -> // lag(1) detects first rows; IS DISTINCT FROM detects changes
        """WITH o AS (SELECT user_id, event_type, event_id, epoch_ns(ts) // 1000 AS us,
                 lag(1) OVER w IS NULL AS first,
                 lag(event_type) OVER w AS prev
               FROM events
               WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000, event_id)),
               c AS (SELECT user_id, event_type, event_id, us FROM o
                     WHERE first OR prev IS DISTINCT FROM event_type),
               v AS (SELECT user_id, event_type, us AS valid_from_us,
                       lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
                         AS valid_to_us
                     FROM c)
           SELECT user_id, event_type, valid_from_us, valid_to_us,
             valid_to_us IS NULL AS is_current
           FROM v ORDER BY user_id, valid_from_us""",
      "q_scd2_merge" -> // the from-scratch build IS the merge oracle
        """WITH o AS (SELECT user_id, event_type, event_id, epoch_ns(ts) // 1000 AS us,
                 lag(1) OVER w IS NULL AS first,
                 lag(event_type) OVER w AS prev
               FROM events
               WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000, event_id)),
               c AS (SELECT user_id, event_type, event_id, us FROM o
                     WHERE first OR prev IS DISTINCT FROM event_type),
               v AS (SELECT user_id, event_type, us AS valid_from_us,
                       lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
                         AS valid_to_us
                     FROM c)
           SELECT user_id, event_type, valid_from_us, valid_to_us,
             valid_to_us IS NULL AS is_current
           FROM v ORDER BY user_id, valid_from_us""",
      "q_scd2_lookup" -> // DuckDB's native ASOF JOIN against the run table
        """WITH np AS (SELECT * FROM events WHERE event_type <> 'purchase'),
               o AS (SELECT user_id, event_type, event_id, epoch_ns(ts) // 1000 AS us,
                       lag(1) OVER w IS NULL AS first, lag(event_type) OVER w AS prev
                     FROM np
                     WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000, event_id)),
               c AS (SELECT user_id, event_type AS state, us FROM o
                     WHERE first OR prev IS DISTINCT FROM event_type),
               p AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS us
                     FROM events WHERE event_type = 'purchase')
           SELECT p.user_id, p.us, p.event_id, c.state
           FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.us >= c.us
           ORDER BY p.event_id""",
      "q_csv_quarantine" -> // only the deterministically-corrupted rows vanish
        """SELECT doc_id, n_chars FROM documents
           WHERE doc_id % 50 <> 0 ORDER BY doc_id""",
      "q_schema_evolution" -> // old-generation files surface the new column as NULL
        """SELECT c_custkey, c_name,
             CASE WHEN c_custkey % 2 = 1 THEN c_acctbal END AS c_acctbal
           FROM customer ORDER BY c_custkey""",
      "q_partition_prune" -> // the partitioned path must not change the day's rows
        """SELECT event_type, CAST(count(*) AS BIGINT) AS n_events
           FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-05'
           GROUP BY event_type ORDER BY event_type""",
      "q_jsonl_roundtrip" -> // the untouched source table: write+read is identity
        """SELECT doc_id, lang, source, n_chars, text FROM documents ORDER BY doc_id""",
      "q_orc_roundtrip" -> // ORC write+read is identity incl. micros timestamps
        """SELECT event_id, epoch_ns(ts) // 1000 AS ts_us, user_id, event_type,
             value, props
           FROM events ORDER BY event_id""",
      "q_exact_median" -> // multi-pass selection == ORDER BY/OFFSET; floor
        // (not bare CAST, which rounds in DuckDB but truncates in Spark)
        """WITH v AS (SELECT CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents
                      FROM lineitem WHERE l_extendedprice IS NOT NULL),
               nn AS (SELECT count(*) AS n FROM v)
           SELECT (SELECT (n + 1) // 2 FROM nn) AS rank,
             (SELECT cents FROM v ORDER BY cents
              LIMIT 1 OFFSET (SELECT (n + 1) // 2 - 1 FROM nn)) AS value,
             (SELECT n FROM nn) AS n""",
      "q_dd_buckets" -> // ceil(ln(x)/ln(gamma)) on exact integer cents is replayable
        // IEEE arithmetic; gamma is REBUILT as (1+0.01)/(1-0.01) in doubles,
        // not stated as a literal, so both engines derive the identical double
        """WITH v AS (SELECT CAST(l_extendedprice * 100 AS BIGINT) AS cents
                      FROM lineitem WHERE l_extendedprice IS NOT NULL),
           idx AS (SELECT
               CAST(CASE WHEN cents = 0 THEN 0 WHEN cents > 0 THEN 1
                    ELSE -1 END AS BIGINT) AS sign,
               CASE WHEN cents = 0 THEN CAST(0 AS BIGINT)
                 ELSE CAST(ceil(ln(CAST(abs(cents) AS DOUBLE)) /
                   ln((CAST(1.0 AS DOUBLE) + CAST(0.01 AS DOUBLE)) /
                      (CAST(1.0 AS DOUBLE) - CAST(0.01 AS DOUBLE)))) AS BIGINT)
               END AS bucket
             FROM v)
           SELECT sign, bucket, CAST(count(*) AS BIGINT) AS cnt
           FROM idx GROUP BY 1, 2 ORDER BY 1, 2""",
      "q_heavy_hitters" -> // exact two-pass heavy hitters == plain GROUP BY/HAVING
        """WITH tok AS (SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
                        FROM documents WHERE text IS NOT NULL),
               tok2 AS (SELECT term AS item FROM tok WHERE length(term) > 0),
               c AS (SELECT item, count(*) AS n FROM tok2 GROUP BY item),
               tt AS (SELECT count(*) AS total FROM tok2)
           SELECT item, CAST(n AS BIGINT) AS n FROM c, tt
           WHERE n * 33 > total ORDER BY n DESC, item""",
      "q_column_modes" -> // per-column top value; ties to the smaller value
        """WITH m AS (
             SELECT 'l_returnflag' AS col_name, l_returnflag AS value
             FROM lineitem WHERE l_returnflag IS NOT NULL
             UNION ALL
             SELECT 'l_linestatus', l_linestatus FROM lineitem
             WHERE l_linestatus IS NOT NULL
             UNION ALL
             SELECT 'l_linenumber', CAST(l_linenumber AS VARCHAR) FROM lineitem
             WHERE l_linenumber IS NOT NULL),
             cgrp AS (SELECT col_name, value, count(*) AS n FROM m GROUP BY 1, 2),
             r AS (SELECT col_name, value, n,
                     row_number() OVER (PARTITION BY col_name ORDER BY n DESC, value) AS rk
                   FROM cgrp)
           SELECT col_name, value, CAST(n AS BIGINT) AS n
           FROM r WHERE rk = 1 ORDER BY col_name""",
      "q_sessions_batch" -> // gap flags running-summed into session ids
        """WITH o AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS us,
                 lag(epoch_ns(ts) // 1000) OVER (PARTITION BY user_id
                   ORDER BY epoch_ns(ts) // 1000, event_id) AS prev
               FROM events),
               f AS (SELECT event_id, user_id, us,
                       CASE WHEN prev IS NULL OR us - prev > 1800000000
                            THEN 1 ELSE 0 END AS nw
                     FROM o),
               s AS (SELECT user_id, us,
                       sum(nw) OVER (PARTITION BY user_id ORDER BY us, event_id
                         ROWS UNBOUNDED PRECEDING) AS session_seq
                     FROM f)
           SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
             min(us) AS start_us, max(us) AS end_us,
             max(us) - min(us) AS duration_us, CAST(count(*) AS BIGINT) AS n_events
           FROM s GROUP BY user_id, session_seq ORDER BY user_id, session_seq""",
      "q_interval_join" -> // overlap pairs as a plain inequality self-join
        """WITH o AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS us,
                 lag(epoch_ns(ts) // 1000) OVER (PARTITION BY user_id
                   ORDER BY epoch_ns(ts) // 1000, event_id) AS prev
               FROM events),
               f AS (SELECT event_id, user_id, us,
                       CASE WHEN prev IS NULL OR us - prev > 1800000000
                            THEN 1 ELSE 0 END AS nw
                     FROM o),
               sq AS (SELECT user_id, us,
                        sum(nw) OVER (PARTITION BY user_id ORDER BY us, event_id
                          ROWS UNBOUNDED PRECEDING) AS session_seq
                      FROM f),
               s AS (SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
                       min(us) AS start_us, max(us) AS end_us
                     FROM sq GROUP BY user_id, session_seq)
           SELECT a.user_id AS user_a, a.session_seq AS seq_a,
             b.user_id AS user_b, b.session_seq AS seq_b,
             least(a.end_us, b.end_us) - greatest(a.start_us, b.start_us)
               AS overlap_us
           FROM s a JOIN s b
             ON a.user_id < b.user_id
             AND a.start_us < b.end_us AND b.start_us < a.end_us
           WHERE a.end_us > a.start_us AND b.end_us > b.start_us
           ORDER BY user_a, seq_a, user_b, seq_b""",
      "q_hist_merge" -> // from-scratch histogram == the engine's shard merge
        """WITH b AS (SELECT CAST(least(greatest(floor(l_extendedprice / 10000.0), 0), 10)
                        AS BIGINT) AS bin
                      FROM lineitem WHERE l_extendedprice IS NOT NULL),
               c AS (SELECT bin, count(*) AS n FROM b GROUP BY bin)
           SELECT r.bin, CAST(COALESCE(c.n, 0) AS BIGINT) AS n
           FROM range(0, 11) r(bin) LEFT JOIN c USING (bin) ORDER BY bin""",
      "q_time_weighted" -> // decimal v*dt sums; 6-dp render (the q_corr ULP lesson)
        """WITH o AS (SELECT user_id, CAST(value AS DECIMAL(18,2)) AS v,
               epoch_ns(ts) // 1000 AS us,
               lead(epoch_ns(ts) // 1000) OVER (PARTITION BY user_id
                 ORDER BY epoch_ns(ts) // 1000, event_id) AS nxt
             FROM events)
           SELECT user_id,
             round(CAST(sum(v * (nxt - us)) AS DOUBLE) /
                   CAST(sum(nxt - us) AS DOUBLE), 6) AS twa
           FROM o WHERE nxt IS NOT NULL GROUP BY user_id ORDER BY user_id""",
      // Chi-square cells: expected/term are pure IEEE on exact counts
      // (the exact-IEEE-render family) — identical expression shape on
      // both sides, unrounded.
      "q_chi2" ->
        """WITH obs AS (SELECT lang, source, count(*) AS n FROM documents GROUP BY 1, 2),
           sp AS (SELECT lang, source FROM (SELECT DISTINCT lang FROM documents)
                  CROSS JOIN (SELECT DISTINCT source FROM documents)),
           f AS (SELECT sp.lang, sp.source, COALESCE(n, 0) AS n_obs
                 FROM sp LEFT JOIN obs USING (lang, source)),
           t AS (SELECT lang, source, n_obs,
                   (sum(n_obs) OVER (PARTITION BY lang))::DOUBLE *
                   (sum(n_obs) OVER (PARTITION BY source))::DOUBLE /
                   (sum(n_obs) OVER ())::DOUBLE AS expected
                 FROM f)
           SELECT lang, source, n_obs, expected,
             (n_obs::DOUBLE - expected) * (n_obs::DOUBLE - expected) / expected AS term
           FROM t ORDER BY lang, source""",
      "q_cramers_v" -> // rounded-then-decimal chi2 sum; guarded sqrt finish
        """WITH obs AS (SELECT lang, source, count(*) AS n FROM documents GROUP BY 1, 2),
           sp AS (SELECT lang, source FROM (SELECT DISTINCT lang FROM documents)
                  CROSS JOIN (SELECT DISTINCT source FROM documents)),
           f AS (SELECT sp.lang, sp.source, COALESCE(n, 0) AS n_obs
                 FROM sp LEFT JOIN obs USING (lang, source)),
           t AS (SELECT lang, source, n_obs,
                   (sum(n_obs) OVER (PARTITION BY lang))::DOUBLE *
                   (sum(n_obs) OVER (PARTITION BY source))::DOUBLE /
                   (sum(n_obs) OVER ())::DOUBLE AS expected
                 FROM f),
           a AS (SELECT
               sum(CAST(round((n_obs::DOUBLE - expected) * (n_obs::DOUBLE - expected)
                 / expected, 6) AS DECIMAL(18,6))) AS chi2d,
               CAST(sum(n_obs) AS BIGINT) AS n,
               CAST(count(DISTINCT lang) AS BIGINT) AS r,
               CAST(count(DISTINCT source) AS BIGINT) AS c
             FROM t)
           SELECT n, r AS n_rows_cat, c AS n_cols_cat,
             round(CAST(chi2d AS DOUBLE), 6) AS chi2,
             CASE WHEN n > 0 AND least(r, c) > 1 THEN
               round(sqrt(CAST(chi2d AS DOUBLE)
                 / (CAST(n AS DOUBLE) * (CAST(least(r, c) AS DOUBLE) - 1.0))), 6)
             END AS cramers_v
           FROM a""",
      "q_windowed_counts" ->
        s"""SELECT (epoch_ns(ts) // 600000000000) * 600 AS window_start, event_type,
            count(*) AS n_events, ${sqlDsum("value")} AS sum_value
            FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
      "q_sliding_counts" ->
        """SELECT window_start, event_type, count(*) AS n_events FROM (
             SELECT unnest([(epoch_ns(ts) // 300000000000) * 300 - 300,
                            (epoch_ns(ts) // 300000000000) * 300]) AS window_start,
                    event_type
             FROM events) GROUP BY 1, 2 ORDER BY 1, 2""",
      "q_sessionize" ->
        """WITH m AS (SELECT user_id,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                    OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
             FROM events)
           SELECT user_id, CAST(sum(new_s) AS BIGINT) AS n_sessions, count(*) AS n_events
           FROM m GROUP BY user_id ORDER BY user_id""",
      // streaming ingest loop end state: per fingerprint the keeper is
      // the min-id doc of the earliest (doc_id % 3) batch holding it
      "q_stream_ingest_final" ->
        s"""WITH fp AS (SELECT doc_id, text, $fingerprint AS f, doc_id % 3 AS b
                        FROM documents),
               w AS (SELECT f, min(b) AS mb FROM fp GROUP BY f),
               k AS (SELECT fp.f, min(fp.doc_id) AS kid
                     FROM fp JOIN w ON fp.f = w.f AND fp.b = w.mb GROUP BY fp.f)
           SELECT d.doc_id, d.text FROM documents d JOIN k ON d.doc_id = k.kid
           ORDER BY d.doc_id""",
      "q_readability" -> // same regexes verbatim; one rounded IEEE chain
        """SELECT doc_id,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
               AS n_words,
             CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT)
               AS n_sentences,
             CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT)
               AS n_syllables,
             CASE WHEN len(regexp_split_to_array(trim(text), '\s+')) > 0 THEN
               round(206.835
                 - 1.015 * (CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE)
                   / CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS DOUBLE))
                 - 84.6 * (CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS DOUBLE)
                   / CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE)), 6)
             END AS flesch
           FROM documents ORDER BY doc_id""",
      "q_doc_stats" ->
        """SELECT doc_id,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
             CAST(len(regexp_extract_all(text, '[\p{L}\p{N}]+|[^\p{L}\p{N}\s]')) AS BIGINT) AS n_bpe_tokens,
             list_reduce(list_prepend(0, [ascii(x)::BIGINT for x in string_split(text, '')]),
               (acc, x) -> (acc * 31 + x) % 2147483647) AS rolling_hash,
             CAST(len(regexp_replace(text, '\s', '', 'g')) AS BIGINT) AS n_nonspace,
             CAST(len(text) - len(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS n_digits,
             CAST(len(text) - len(regexp_replace(text, '[^\p{L}\p{N}\s]', '', 'g')) AS BIGINT) AS n_punct,
             CAST(len(regexp_replace(text, '\s', '', 'g')) AS DOUBLE)
               / len(regexp_split_to_array(trim(text), '\s+')) AS avg_token_len,
             CAST(len(text) - len(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
               / len(text) AS digit_ratio,
             CAST(len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|is|a)\b')) AS DOUBLE)
               / len(regexp_split_to_array(trim(text), '\s+')) AS stopword_ratio,
             sha256(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint
           FROM documents ORDER BY doc_id""",
      "q_lang_id" -> {
        val pats = Seq(
          "de" -> "\\b(der|die|das|und|ist|ein|nicht)\\b",
          "en" -> "\\b(the|and|of|to|in|is|a)\\b",
          "es" -> "\\b(el|los|de|que|y|es|una)\\b",
          "fr" -> "\\b(le|les|et|des|un|dans|est)\\b",
          "zh" -> "[\\x{4e00}-\\x{9fff}]")
        val hitCols = pats.map { case (l, p) =>
          s"len(regexp_extract_all(lower(text), '$p')) AS h_$l" }.mkString(", ")
        val best = "greatest(h_de, h_en, h_es, h_fr, h_zh)"
        val branches = pats.init.map { case (l, _) =>
          s"WHEN h_$l = $best THEN '$l'" }.mkString(" ")
        s"""WITH h AS (SELECT doc_id, lang, $hitCols FROM documents)
            SELECT doc_id, lang,
              CASE WHEN $best IS NULL THEN NULL
                   WHEN $best = 0 THEN 'unknown' $branches ELSE 'zh' END AS lang_pred
            FROM h ORDER BY doc_id"""
      },
      "q_quality_filter" ->
        """SELECT doc_id,
             len(regexp_split_to_array(trim(text), '\s+')) >= 5
             AND CAST(len(regexp_replace(text, '\s', '', 'g')) AS DOUBLE)
                 / len(regexp_split_to_array(trim(text), '\s+')) <= 15.0
             AND CAST(len(text) - len(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
                 / len(text) <= 0.3
             AND CAST(len(text) - len(regexp_replace(text, '[^\p{L}\p{N}\s]', '', 'g')) AS DOUBLE)
                 / len(text) <= 0.3 AS keep
           FROM documents ORDER BY doc_id""",
      "q_url_meta" -> // expected URL parts stated FROM the table — certifies parse_url
        """SELECT doc_id,
             lower(source || '.Example.com') AS host,
             'example.com' AS domain,
             '/docs/' || doc_id AS path,
             lang AS q_lang,
             'https://' || source || '.Example.com/docs/' || doc_id ||
               '?lang=' || lang AS canonical_url
           FROM documents ORDER BY doc_id""",
      "q_pii_scrub" -> {
        // same pattern set and replacement ORDER as Scrub.piiScrub
        val email = Scrub.EmailPattern
        val ssn = Scrub.SsnPattern
        val phone = Scrub.PhonePattern
        val ip = Scrub.Ipv4Pattern
        s"""WITH a AS (SELECT doc_id,
              text || ' reach user' || doc_id || '@mail.example.com or 555-867-5309 ssn 123-45-6789 host 10.0.0.' || (doc_id % 250) AS aug
              FROM documents)
            SELECT doc_id,
              CAST(len(regexp_extract_all(aug, '$email')) AS BIGINT) AS n_emails,
              CAST(len(regexp_extract_all(aug, '$ssn')) AS BIGINT) AS n_ssns,
              CAST(len(regexp_extract_all(aug, '$phone')) AS BIGINT) AS n_phones,
              CAST(len(regexp_extract_all(aug, '$ip')) AS BIGINT) AS n_ips,
              regexp_replace(regexp_replace(regexp_replace(regexp_replace(aug,
                '$email', '<EMAIL>', 'g'), '$ssn', '<SSN>', 'g'),
                '$phone', '<PHONE>', 'g'), '$ip', '<IP>', 'g') AS scrubbed
            FROM a ORDER BY doc_id"""
      },
      "q_nfc_normalize" -> // DuckDB's independent NFC vs the codegen Expression
        """SELECT doc_id,
             nfc_normalize(text || chr(101) || chr(769)) AS norm_text,
             CAST(length(nfc_normalize(text || chr(101) || chr(769))) AS INTEGER)
               AS norm_len,
             CAST(length(text || chr(101) || chr(769)) AS INTEGER) AS raw_len
           FROM documents ORDER BY doc_id""",
      "q_normalize" -> // same strip -> decode (&amp; LAST) -> collapse -> lower order as Scrub.normalizeText
        """WITH a AS (SELECT doc_id,
             '<div class="doc"> ' || text || ' &amp; more&nbsp;text <br/> </div>' AS aug
             FROM documents)
           SELECT doc_id, lower(trim(regexp_replace(
             regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
               regexp_replace(aug, '<[^>]*>', ' ', 'g'),
               '&nbsp;', ' ', 'g'), '&lt;', '<', 'g'), '&gt;', '>', 'g'),
               '&quot;', '"', 'g'), '&amp;', '&', 'g'),
             '\s+', ' ', 'g'))) AS normalized
           FROM a ORDER BY doc_id""",
      "q_repetition" ->
        """WITH tk AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
                       FROM documents),
               b AS (SELECT doc_id, toks, list_distinct(toks) AS dt,
                       [toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))] AS bg
                     FROM tk)
           SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             CAST(len(dt) AS BIGINT) AS n_distinct_tokens,
             CAST(list_max(list_transform(dt, t -> len(list_filter(toks, x -> x = t)))) AS DOUBLE)
               / len(toks) AS top_token_frac,
             CASE WHEN len(bg) > 0
               THEN 1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / len(bg) END AS dup_bigram_frac
           FROM b ORDER BY doc_id""",
      "q_decontaminate" ->
        """WITH tk AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
                       FROM documents),
               ng AS (SELECT doc_id,
                        [array_to_string(toks[i:i+7], ' ') for i in range(1, len(toks)-6)] AS grams
                      FROM tk),
               tr AS (SELECT DISTINCT doc_id, ng FROM
                        (SELECT doc_id, unnest(grams) AS ng FROM ng WHERE doc_id % 41 <> 0)),
               be AS (SELECT DISTINCT ng FROM
                        (SELECT unnest(grams) AS ng FROM ng WHERE doc_id % 41 = 0)),
               h AS (SELECT doc_id, count(*) AS n_shared FROM tr JOIN be USING (ng)
                     GROUP BY doc_id)
           SELECT d.doc_id, CAST(COALESCE(h.n_shared, 0) AS BIGINT) AS n_shared_ngrams,
             COALESCE(h.n_shared, 0) > 0 AS contaminated
           FROM (SELECT doc_id FROM documents WHERE doc_id % 41 <> 0) d
           LEFT JOIN h USING (doc_id) ORDER BY doc_id""",
      "q_contamination_rate" -> // q_decontaminate's CTEs + per-doc distinct-gram denominators
        """WITH tk AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
                       FROM documents),
               ng AS (SELECT doc_id,
                        [array_to_string(toks[i:i+7], ' ') for i in range(1, len(toks)-6)] AS grams
                      FROM tk),
               tr AS (SELECT DISTINCT doc_id, ng FROM
                        (SELECT doc_id, unnest(grams) AS ng FROM ng WHERE doc_id % 41 <> 0)),
               be AS (SELECT DISTINCT ng FROM
                        (SELECT unnest(grams) AS ng FROM ng WHERE doc_id % 41 = 0)),
               gc AS (SELECT doc_id, count(*) AS n_grams FROM tr GROUP BY doc_id),
               h AS (SELECT doc_id, count(*) AS hits FROM tr JOIN be USING (ng)
                     GROUP BY doc_id)
           SELECT d.doc_id, CAST(COALESCE(gc.n_grams, 0) AS BIGINT) AS n_grams,
             CAST(COALESCE(h.hits, 0) AS BIGINT) AS n_shared,
             CASE WHEN COALESCE(gc.n_grams, 0) > 0
               THEN round(COALESCE(h.hits, 0)::DOUBLE / gc.n_grams::DOUBLE, 6) END
               AS contamination,
             CASE WHEN COALESCE(gc.n_grams, 0) > 0
               THEN COALESCE(h.hits, 0)::DOUBLE / gc.n_grams::DOUBLE >= 0.05
               ELSE false END AS flagged
           FROM (SELECT doc_id FROM documents WHERE doc_id % 41 <> 0) d
           LEFT JOIN gc USING (doc_id) LEFT JOIN h USING (doc_id)
           ORDER BY doc_id""",
      "q_source_overlap" -> // per-row gram dedup, then the sorted-pair convention
        """WITH tk AS (SELECT source, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
                       FROM documents),
               ng AS (SELECT source,
                        [array_to_string(toks[i:i+2], ' ') for i in range(1, len(toks)-1)] AS grams
                      FROM tk),
               sg AS (SELECT DISTINCT source,
                        ('0x' || substr(md5(ng), 1, 15))::BIGINT AS ng FROM
                        (SELECT source, unnest(grams) AS ng FROM ng)),
               p AS (SELECT a.source AS source_a, b.source AS source_b
                     FROM sg a JOIN sg b ON a.ng = b.ng AND a.source < b.source)
           SELECT source_a, source_b, count(*) AS n_shared_grams
           FROM p GROUP BY source_a, source_b ORDER BY source_a, source_b""",
      "q_dup_spans" -> // per-row distinct grams, 60-bit fp, df-as-window
        """WITH tk AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
                       FROM documents),
               ng AS (SELECT doc_id,
                        [array_to_string(toks[i:i+2], ' ') for i in range(1, len(toks)-1)] AS grams
                      FROM tk),
               g AS (SELECT DISTINCT doc_id,
                       ('0x' || substr(md5(ng), 1, 15))::BIGINT AS fp FROM
                       (SELECT doc_id, unnest(grams) AS ng FROM ng)),
               w AS (SELECT doc_id, count(*) OVER (PARTITION BY fp) AS df FROM g),
               a AS (SELECT doc_id, count(*) AS n_spans,
                       sum(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS n_dup,
                       max(df) AS max_df
                     FROM w GROUP BY doc_id)
           SELECT d.doc_id,
             CAST(COALESCE(a.n_spans, 0) AS BIGINT) AS n_spans,
             CAST(COALESCE(a.n_dup, 0) AS BIGINT) AS n_dup_spans,
             CAST(COALESCE(a.max_df, 0) AS BIGINT) AS max_span_df,
             CAST(a.n_dup AS DOUBLE) / a.n_spans AS dup_span_frac
           FROM documents d LEFT JOIN a USING (doc_id) ORDER BY doc_id""",
      "q_winnow" -> // same gram hash, window-min over starts only
        """WITH tk AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
                       FROM documents),
               ng AS (SELECT doc_id,
                        [{'pos': i - 1, 'g': array_to_string(toks[i:i+2], ' ')}
                         for i in range(1, len(toks) - 1)] AS lst
                      FROM tk),
               g AS (SELECT doc_id, CAST(u.pos AS BIGINT) AS pos,
                       ('0x' || substr(md5(u.g), 1, 15))::BIGINT AS fp
                     FROM (SELECT doc_id, unnest(lst) AS u FROM ng)),
               wm AS (SELECT doc_id, pos, count(*) OVER (PARTITION BY doc_id) AS m,
                        min(fp) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin
                      FROM g)
           SELECT DISTINCT doc_id, wmin AS fp FROM wm
           WHERE pos <= greatest(m - 4, 0) ORDER BY doc_id, fp""",
      "q_winnow_overlap" -> // pair counts over the selected sets
        """WITH tk AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
                       FROM documents),
               ng AS (SELECT doc_id,
                        [{'pos': i - 1, 'g': array_to_string(toks[i:i+2], ' ')}
                         for i in range(1, len(toks) - 1)] AS lst
                      FROM tk),
               g AS (SELECT doc_id, CAST(u.pos AS BIGINT) AS pos,
                       ('0x' || substr(md5(u.g), 1, 15))::BIGINT AS fp
                     FROM (SELECT doc_id, unnest(lst) AS u FROM ng)),
               wm AS (SELECT doc_id, pos, count(*) OVER (PARTITION BY doc_id) AS m,
                        min(fp) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin
                      FROM g),
               sel AS (SELECT DISTINCT doc_id, wmin AS fp FROM wm
                       WHERE pos <= greatest(m - 4, 0))
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  CAST(count(*) AS BIGINT) AS n_shared_fps
           FROM sel a JOIN sel b ON a.fp = b.fp AND a.doc_id < b.doc_id
           GROUP BY 1, 2 HAVING count(*) >= 5 ORDER BY doc_a, doc_b""",
      "q_chunk" ->
        """WITH tk AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
                       FROM documents WHERE text IS NOT NULL),
               c AS (SELECT doc_id, toks,
                       unnest(range(0, ((len(toks)-1)//16) + 1)) AS chunk_idx
                     FROM tk)
           SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
             CAST(len(toks[chunk_idx*16+1 : chunk_idx*16+16]) AS BIGINT) AS n_chunk_tokens,
             array_to_string(toks[chunk_idx*16+1 : chunk_idx*16+16], ' ') AS chunk_text
           FROM c ORDER BY doc_id, chunk_idx""",
      "q_tfidf" -> // ln arg derived identically; final weight rounded (ULP guard)
        """WITH term AS (SELECT doc_id,
                unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term FROM documents),
               tf AS (SELECT doc_id, term, count(*) AS tf FROM term GROUP BY doc_id, term),
               dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
               n AS (SELECT count(*) AS n_docs FROM documents)
           SELECT tf.doc_id, tf.term, tf.tf, dfq.df,
             round(CAST(tf.tf AS DOUBLE) * ln(CAST(n_docs + 1 AS DOUBLE) / (df + 1)), 6) AS tfidf
           FROM tf JOIN dfq USING (term), n
           WHERE tf.tf >= 2 ORDER BY doc_id, term""",
      "q_keywords" -> // rank on (rounded tfidf desc, term) — total order
        """WITH term AS (SELECT doc_id,
                unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term FROM documents),
               tf AS (SELECT doc_id, term, count(*) AS tf FROM term GROUP BY doc_id, term),
               dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
               n AS (SELECT count(*) AS n_docs FROM documents),
               sc AS (SELECT tf.doc_id, tf.term,
                 round(CAST(tf.tf AS DOUBLE) * ln(CAST(n_docs + 1 AS DOUBLE) / (df + 1)), 6)
                   AS tfidf
                 FROM tf JOIN dfq USING (term), n WHERE tf.tf >= 2),
               rk AS (SELECT doc_id, term, tfidf,
                 CAST(row_number() OVER (PARTITION BY doc_id
                   ORDER BY tfidf DESC, term) AS BIGINT) AS rk FROM sc)
           SELECT doc_id, rk, term, tfidf FROM rk WHERE rk <= 3
           ORDER BY doc_id, rk""",
      "q_bm25" -> // k1/b reach both engines as the same decimal text;
        // contributions rounded then DECIMAL-summed (dsum convention)
        """WITH tk AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS toks
                       FROM documents),
               lens AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM tk),
               stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                                CAST(sum(dl) AS BIGINT) AS sum_dl FROM lens),
               tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM
                        (SELECT doc_id, unnest(toks) AS term FROM tk)
                      WHERE term IN ('join', 'hash', 'window') GROUP BY doc_id, term),
               dfd AS (SELECT *, count(*) OVER (PARTITION BY term) AS df FROM tf),
               c AS (SELECT t.doc_id,
                       round(ln((s.n_docs::DOUBLE - t.df::DOUBLE + 0.5) / (t.df::DOUBLE + 0.5) + 1.0)
                         * (t.tf::DOUBLE * (1.2 + 1.0))
                         / (t.tf::DOUBLE + 1.2 * (0.25 + 0.75 * (l.dl::DOUBLE / (s.sum_dl::DOUBLE / s.n_docs::DOUBLE)))),
                         6)::DECIMAL(18,6) AS contrib
                     FROM dfd t JOIN lens l USING (doc_id) CROSS JOIN stats s)
           SELECT doc_id, CAST(sum(contrib) AS DOUBLE) AS bm25
           FROM c GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT 20""",
      "q_pmi" -> // exact integer counts; one rounded ln expression
        """WITH tk AS (SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS toks
                       FROM documents),
               uni AS (SELECT term, CAST(count(*) AS BIGINT) AS c FROM
                         (SELECT unnest(toks) AS term FROM tk) GROUP BY term),
               bi AS (SELECT bigram, CAST(count(*) AS BIGINT) AS c_ab FROM
                        (SELECT unnest([toks[i] || ' ' || toks[i+1]
                                        for i in range(1, len(toks))]) AS bigram FROM tk)
                      GROUP BY bigram HAVING count(*) >= 5),
               tot AS (SELECT CAST(sum(len(toks)) AS BIGINT) AS t_uni,
                              CAST(sum(greatest(len(toks) - 1, 0)) AS BIGINT) AS t_bi FROM tk)
           SELECT b.bigram, b.c_ab, ua.c AS c_a, ub.c AS c_b,
             round(ln((b.c_ab::DOUBLE / t.t_bi::DOUBLE) /
               ((ua.c::DOUBLE / t.t_uni::DOUBLE) * (ub.c::DOUBLE / t.t_uni::DOUBLE))), 6) AS pmi
           FROM bi b
           JOIN uni ua ON ua.term = split_part(b.bigram, ' ', 1)
           JOIN uni ub ON ub.term = split_part(b.bigram, ' ', 2)
           CROSS JOIN tot t
           ORDER BY pmi DESC, bigram LIMIT 100""",
      "q_boilerplate" -> // share is an exact-integer IEEE division: UNROUNDED
        """WITH p AS (SELECT source,
                 array_to_string((regexp_split_to_array(trim(lower(text)), '\s+'))[1:3], ' ') AS prefix
               FROM documents),
               c AS (SELECT source, prefix, CAST(count(*) AS BIGINT) AS n_docs
                     FROM p GROUP BY 1, 2),
               w AS (SELECT *, sum(n_docs) OVER (PARTITION BY source) AS source_docs FROM c)
           SELECT source, prefix, n_docs, CAST(source_docs AS BIGINT) AS source_docs,
             n_docs::DOUBLE / source_docs::DOUBLE AS share,
             (n_docs >= 2 AND n_docs::DOUBLE / source_docs::DOUBLE >= 0.2) AS flagged
           FROM w ORDER BY source, prefix""",
      "q_psi_drift" -> // fixed exact-literal bin edges; Laplace-smoothed shares
        """WITH bins AS (SELECT unnest(range(11)) AS bin),
               r AS (SELECT CAST(least(greatest(floor((l_extendedprice::DOUBLE - 0.0) / 10000.0), 0.0), 10.0) AS BIGINT) AS bin,
                            CAST(count(*) AS BIGINT) AS n
                     FROM lineitem WHERE l_orderkey % 2 = 0 AND l_extendedprice IS NOT NULL GROUP BY 1),
               c AS (SELECT CAST(least(greatest(floor((l_extendedprice::DOUBLE - 0.0) / 10000.0), 0.0), 10.0) AS BIGINT) AS bin,
                            CAST(count(*) AS BIGINT) AS n
                     FROM lineitem WHERE l_orderkey % 2 = 1 AND l_extendedprice IS NOT NULL GROUP BY 1),
               j AS (SELECT b.bin, CAST(COALESCE(r.n, 0) AS BIGINT) AS n_ref,
                            CAST(COALESCE(c.n, 0) AS BIGINT) AS n_cur
                     FROM bins b LEFT JOIN r USING (bin) LEFT JOIN c USING (bin)),
               w AS (SELECT *, sum(n_ref) OVER () AS tr, sum(n_cur) OVER () AS tc FROM j)
           SELECT bin, 0.0::DOUBLE + bin::DOUBLE * 10000.0::DOUBLE AS bin_lo,
             0.0::DOUBLE + (bin + 1)::DOUBLE * 10000.0::DOUBLE AS bin_hi, n_ref, n_cur,
             (n_ref::DOUBLE + 0.5) / (tr::DOUBLE + 5.5) AS p_ref,
             (n_cur::DOUBLE + 0.5) / (tc::DOUBLE + 5.5) AS p_cur,
             round(((n_ref::DOUBLE + 0.5) / (tr::DOUBLE + 5.5) - (n_cur::DOUBLE + 0.5) / (tc::DOUBLE + 5.5)) *
               ln(((n_ref::DOUBLE + 0.5) / (tr::DOUBLE + 5.5)) / ((n_cur::DOUBLE + 0.5) / (tc::DOUBLE + 5.5))), 6) AS psi_term
           FROM w ORDER BY bin""",
      "q_embedding_cov" -> // zipped unnests; exact BIGINT micro-moments
        """WITH e AS (SELECT vec_id,
               unnest([k for k in range(0, len(embedding))]) AS pos,
               unnest([round(x::DOUBLE * 1000000, 0)::BIGINT for x in embedding]) AS vm
             FROM embeddings WHERE embedding IS NOT NULL AND len(embedding) = 64)
           SELECT CAST(a.pos AS BIGINT) AS i, CAST(b.pos AS BIGINT) AS j,
             CAST(count(*) AS BIGINT) AS n_vecs,
             CAST(sum(a.vm * b.vm) AS BIGINT) AS sum_micro2,
             CAST(sum(a.vm) AS BIGINT) AS sum_micro_i,
             CAST(sum(b.vm) AS BIGINT) AS sum_micro_j,
             (sum(a.vm * b.vm)::DOUBLE / count(*)::DOUBLE -
               (sum(a.vm)::DOUBLE / count(*)::DOUBLE) * (sum(b.vm)::DOUBLE / count(*)::DOUBLE))
               / 1000000000000.0::DOUBLE AS cov
           FROM e a JOIN e b ON a.vec_id = b.vec_id AND b.pos >= a.pos
           GROUP BY a.pos, b.pos ORDER BY i, j""",
      "q_vocab_coverage" -> // top-V cut total-ordered (cnt desc, term)
        """WITH term AS (SELECT doc_id,
                unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term FROM documents),
               c AS (SELECT term, count(*) AS cnt FROM term GROUP BY term),
               v AS (SELECT term, 1 AS vin FROM c ORDER BY cnt DESC, term LIMIT 20),
               p AS (SELECT t.doc_id, count(*) AS n_tokens,
                       sum(COALESCE(v.vin, 0)) AS n_in
                     FROM term t LEFT JOIN v USING (term) GROUP BY t.doc_id)
           SELECT d.doc_id,
             CAST(COALESCE(p.n_tokens, 0) AS BIGINT) AS n_tokens,
             CAST(COALESCE(p.n_in, 0) AS BIGINT) AS n_in_vocab,
             1.0 - CAST(p.n_in AS DOUBLE) / p.n_tokens AS oov_frac
           FROM documents d LEFT JOIN p USING (doc_id) ORDER BY doc_id""",
      "q_decontaminate_near" -> decontamNearOracle,
      "q_bigram_logprob" -> // Laplace bigram LM: c12/c1 windows on tf rows; dsum contributions
        s"""WITH $bigramLmCtes
           SELECT doc_id, n_bigrams, CAST(lp_dec AS DOUBLE) AS logprob
           FROM lm ORDER BY doc_id""",
      "q_lm_filter" -> // exact micro-nat integer average; integer threshold compare
        s"""WITH $bigramLmCtes
           SELECT doc_id, n_bigrams,
             -((-CAST(lp_dec * 1000000 AS BIGINT)) // n_bigrams)
               AS avg_logprob_micro
           FROM lm
           WHERE -((-CAST(lp_dec * 1000000 AS BIGINT)) // n_bigrams) >= -3420000
           ORDER BY doc_id""",
      "q_blocklist_scrub" -> // literal-array token filter; same split convention
        """WITH tok AS (SELECT doc_id,
                regexp_split_to_array(trim(lower(text)), '\s+') AS t FROM documents),
               k AS (SELECT doc_id, t,
                 list_filter(t, x -> NOT list_contains(['a', 'the', 'and', 'of', 'to', 'in'], x)) AS kept
                 FROM tok)
           SELECT doc_id, array_to_string(kept, ' ') AS text_clean,
             CAST(len(t) - len(kept) AS BIGINT) AS n_removed
           FROM k ORDER BY doc_id""",
      "q_ngram_diversity" -> // per-source type/token ratios, both gram orders
        """WITH tok AS (SELECT source,
                regexp_split_to_array(trim(lower(text)), '\s+') AS t FROM documents),
               uni AS (SELECT source, CAST(count(*) AS BIGINT) AS n_unigrams,
                 CAST(count(DISTINCT g) AS BIGINT) AS n_distinct_unigrams FROM
                 (SELECT source, unnest(t) AS g FROM tok) GROUP BY source),
               bi AS (SELECT source, CAST(count(*) AS BIGINT) AS n_bigrams,
                 CAST(count(DISTINCT g) AS BIGINT) AS n_distinct_bigrams FROM
                 (SELECT source, unnest([t[i] || ' ' || t[i+1] for i in range(1, len(t))]) AS g
                  FROM tok WHERE len(t) >= 2) GROUP BY source)
           SELECT uni.source, n_unigrams, n_distinct_unigrams,
             round(n_distinct_unigrams::DOUBLE / n_unigrams::DOUBLE, 6) AS unigram_ttr,
             CAST(coalesce(n_bigrams, 0) AS BIGINT) AS n_bigrams,
             CAST(coalesce(n_distinct_bigrams, 0) AS BIGINT) AS n_distinct_bigrams,
             CASE WHEN n_bigrams > 0
               THEN round(n_distinct_bigrams::DOUBLE / n_bigrams::DOUBLE, 6) END AS bigram_ttr
           FROM uni LEFT JOIN bi USING (source) ORDER BY uni.source""",
      "q_df_incremental" -> // shard-merge must equal the direct corpus df
        """WITH term AS (SELECT DISTINCT doc_id, term FROM
                 (SELECT doc_id,
                    unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
                  FROM documents))
           SELECT term, CAST(count(*) AS BIGINT) AS df
           FROM term GROUP BY term ORDER BY term""",
      "q_char_classes" -> // length-difference counts, classes partition len(text)
        """SELECT doc_id, CAST(len(text) AS BIGINT) AS n_chars,
             CAST(len(text) - len(regexp_replace(text, '\p{L}', '', 'g')) AS BIGINT) AS n_alpha,
             CAST(len(text) - len(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS n_digits,
             CAST(len(text) - len(regexp_replace(text, '\s', '', 'g')) AS BIGINT) AS n_space,
             CAST(len(text) - len(regexp_replace(text, '[^\p{L}\p{N}\s]', '', 'g')) AS BIGINT)
               AS n_punct,
             CAST(len(text) - len(regexp_replace(text, '�', '', 'g')) AS BIGINT)
               AS n_replacement
           FROM documents ORDER BY doc_id""",
      "q_unigram_logprob" -> // contributions rounded then DECIMAL-summed (order-independent)
        """WITH term AS (SELECT doc_id,
                unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term FROM documents),
               tf AS (SELECT doc_id, term, count(*) AS tf FROM term GROUP BY doc_id, term),
               ct AS (SELECT term, sum(tf) AS cnt FROM tf GROUP BY term),
               n AS (SELECT count(*) AS n_tok FROM term)
           SELECT tf.doc_id, CAST(sum(tf.tf) AS BIGINT) AS n_tokens,
             CAST(sum(CAST(round(tf.tf * ln(cnt::DOUBLE / n_tok::DOUBLE), 6)
               AS DECIMAL(18,6))) AS DOUBLE) AS logprob
           FROM tf JOIN ct USING (term), n
           GROUP BY tf.doc_id ORDER BY tf.doc_id""",
      "q_token_entropy" -> // c·ln c rounded then DECIMAL-summed; H = ln(n) - dsum/n
        """WITH term AS (SELECT doc_id,
                unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term FROM documents),
               tf AS (SELECT doc_id, term, count(*) AS tf FROM term GROUP BY doc_id, term)
           SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS n_distinct,
             round(ln(CAST(sum(tf) AS DOUBLE)) -
               CAST(sum(CAST(round(tf * ln(tf::DOUBLE), 6) AS DECIMAL(18,6))) AS DOUBLE)
                 / CAST(sum(tf) AS DOUBLE), 6) AS entropy
           FROM tf GROUP BY doc_id ORDER BY doc_id""",
      "q_bpe_pairs" -> // word-frequency table first; total-ordered top-N
        """WITH w AS (SELECT word, count(*) AS cnt FROM
                 (SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS word
                  FROM documents)
               GROUP BY word),
               p AS (SELECT cnt,
                       unnest([substr(word, i, 2) for i in range(1, len(word))]) AS pair
                     FROM w WHERE len(word) >= 2)
           SELECT pair, CAST(sum(cnt) AS BIGINT) AS n_occurrences
           FROM p GROUP BY pair ORDER BY n_occurrences DESC, pair LIMIT 50""",
      "q_fuzzy_match" -> // same blocking (first token) + exact edit-distance verify
        """WITH q AS (SELECT DISTINCT substr(p_name, 1, length(p_name) - 1) AS q_text
                      FROM part WHERE p_name IS NOT NULL),
               d AS (SELECT DISTINCT p_name AS match_text FROM part
                     WHERE p_name IS NOT NULL)
           SELECT q.q_text, d.match_text,
             CAST(levenshtein(q.q_text, d.match_text) AS BIGINT) AS dist
           FROM q JOIN d
             ON split_part(q.q_text, ' ', 1) = split_part(d.match_text, ' ', 1)
           WHERE levenshtein(q.q_text, d.match_text) <= 2
           ORDER BY q_text, match_text""",
      "q_jaro_pairs" -> // native jaro_winkler_similarity vs the graft Expression, UNROUNDED
        """WITH n AS (SELECT DISTINCT p_name AS name FROM part WHERE p_name IS NOT NULL),
               b AS (SELECT name, split_part(name, ' ', 1) AS blk FROM n
                     WHERE split_part(name, ' ', 1) IS NOT NULL)
           SELECT x.name AS name_a, y.name AS name_b,
             jaro_winkler_similarity(x.name, y.name) AS sim
           FROM b x JOIN b y ON x.blk = y.blk AND x.name < y.name
           WHERE jaro_winkler_similarity(x.name, y.name) >= 0.85
           ORDER BY name_a, name_b""",
      "q_fs_weights" -> // FS likelihood ratios, replayed term-by-term in the same IEEE order
        """WITH base AS (
             SELECT CAST(p_partkey AS BIGINT) AS k, p_name AS b,
                    p_brand, p_type, p_size
             FROM part WHERE p_name IS NOT NULL),
           stats AS (
             SELECT (SELECT count(*) FROM base) AS n,
               (SELECT sum(c*(c-1)) FROM (SELECT count(*) AS c FROM base
                  WHERE p_brand IS NOT NULL GROUP BY p_brand)) AS s_brand,
               (SELECT sum(c*(c-1)) FROM (SELECT count(*) AS c FROM base
                  WHERE p_type IS NOT NULL GROUP BY p_type)) AS s_type,
               (SELECT sum(c*(c-1)) FROM (SELECT count(*) AS c FROM base
                  WHERE p_size IS NOT NULL GROUP BY p_size)) AS s_size),
           scored AS (
             SELECT a.k AS a_key, b.k AS b_key,
               CASE WHEN a.p_brand = b.p_brand THEN 1 ELSE 0 END AS agree_p_brand,
               CASE WHEN a.p_type  = b.p_type  THEN 1 ELSE 0 END AS agree_p_type,
               CASE WHEN a.p_size  = b.p_size  THEN 1 ELSE 0 END AS agree_p_size,
               (((CASE WHEN a.p_brand IS NULL OR b.p_brand IS NULL THEN 1.0
                   WHEN a.p_brand = b.p_brand
                   THEN 0.95 / (CAST(s.s_brand AS DOUBLE) / CAST(s.n*(s.n-1) AS DOUBLE))
                   ELSE 0.05 / (1.0 - CAST(s.s_brand AS DOUBLE) / CAST(s.n*(s.n-1) AS DOUBLE)) END)
                * (CASE WHEN a.p_type IS NULL OR b.p_type IS NULL THEN 1.0
                   WHEN a.p_type = b.p_type
                   THEN 0.90 / (CAST(s.s_type AS DOUBLE) / CAST(s.n*(s.n-1) AS DOUBLE))
                   ELSE 0.10 / (1.0 - CAST(s.s_type AS DOUBLE) / CAST(s.n*(s.n-1) AS DOUBLE)) END))
               * (CASE WHEN a.p_size IS NULL OR b.p_size IS NULL THEN 1.0
                   WHEN a.p_size = b.p_size
                   THEN 0.85 / (CAST(s.s_size AS DOUBLE) / CAST(s.n*(s.n-1) AS DOUBLE))
                   ELSE 0.15 / (1.0 - CAST(s.s_size AS DOUBLE) / CAST(s.n*(s.n-1) AS DOUBLE)) END)) AS lr
             FROM base a JOIN base b ON a.b = b.b AND a.k < b.k, stats s)
           SELECT a_key, b_key, agree_p_brand, agree_p_type, agree_p_size, lr,
             CASE WHEN lr >= 1000.0 THEN 'match' ELSE 'possible' END AS fs_class
           FROM scored WHERE lr >= 10.0
           ORDER BY a_key, b_key""",
      "q_entity_resolution" -> // recursive min-label CC over name-ordinal edges
        """WITH RECURSIVE n AS (SELECT DISTINCT p_name AS name FROM part
                                WHERE p_name IS NOT NULL),
             b AS (SELECT name, split_part(name, ' ', 1) AS blk FROM n
                   WHERE split_part(name, ' ', 1) IS NOT NULL),
             pr AS (SELECT x.name AS name_a, y.name AS name_b
                    FROM b x JOIN b y ON x.blk = y.blk AND x.name < y.name
                    WHERE jaro_winkler_similarity(x.name, y.name) >= 0.88),
             o AS (SELECT name, row_number() OVER (ORDER BY name) - 1 AS ordinal FROM n),
             e0 AS (SELECT oa.ordinal AS s, ob.ordinal AS d FROM pr
                    JOIN o oa ON oa.name = pr.name_a
                    JOIN o ob ON ob.name = pr.name_b),
             e AS (SELECT s, d FROM e0 UNION ALL SELECT d, s FROM e0),
             reach(doc, lab) AS (SELECT DISTINCT s, s FROM e
               UNION SELECT e.d, reach.lab FROM reach JOIN e ON reach.doc = e.s),
             roots AS (SELECT doc, min(lab) AS root FROM reach GROUP BY doc)
           SELECT o.name, COALESCE(oc.name, o.name) AS canonical
           FROM o LEFT JOIN roots ON roots.doc = o.ordinal
                  LEFT JOIN o oc ON oc.ordinal = roots.root
           ORDER BY o.name""",
      "q_degree_dist" -> // canonical distinct edges; degree histogram
        """WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= 40),
               e AS (SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
                     FROM li x JOIN li y
                       ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey),
               deg AS (SELECT v, CAST(count(*) AS BIGINT) AS degree FROM
                         (SELECT a AS v FROM e UNION ALL SELECT b FROM e)
                       GROUP BY v)
           SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes
           FROM deg GROUP BY degree ORDER BY degree""",
      "q_cluster_sizes" -> // same CC chain; two histogram aggregates on top
        s"""WITH RECURSIVE fp AS (SELECT doc_id, text, $fingerprint AS f FROM documents),
            g AS (SELECT f, min(doc_id) AS ek FROM fp GROUP BY f),
            wk AS (SELECT fp.doc_id, fp.text, g.ek FROM fp JOIN g ON fp.f = g.f),
            kd AS (SELECT doc_id, text FROM wk WHERE doc_id = ek),
            ${minhashCtesFrom("kd")},
            ${verifiedPairCtes("kd")},
            e AS (SELECT doc_a AS s, doc_b AS d FROM verified
                  UNION ALL SELECT doc_b AS s, doc_a AS d FROM verified),
            reach(doc, lab) AS (SELECT DISTINCT s, s FROM e
              UNION SELECT e.d, reach.lab FROM reach JOIN e ON reach.doc = e.s),
            roots AS (SELECT doc, min(lab) AS root FROM reach GROUP BY doc),
            asn AS (SELECT wk.doc_id, COALESCE(r.root, wk.ek) AS cluster_id
                    FROM wk LEFT JOIN roots r ON wk.ek = r.doc),
            cs AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS cluster_size
                   FROM asn GROUP BY cluster_id)
            SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters
            FROM cs GROUP BY cluster_size ORDER BY cluster_size""",
      "q_triangles" -> // canonical a<b edges; x<y<z triple-join counts each triangle once
        """WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= 40),
               e AS (SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
                     FROM li x JOIN li y
                       ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey),
               nn AS (SELECT count(DISTINCT v) AS n_nodes FROM
                        (SELECT a AS v FROM e UNION ALL SELECT b FROM e)),
               ne AS (SELECT count(*) AS n_edges FROM e),
               nt AS (SELECT count(*) AS n_triangles
                      FROM e e1 JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
                                JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b)
           SELECT CAST(n_nodes AS BIGINT) AS n_nodes, CAST(n_edges AS BIGINT) AS n_edges,
                  CAST(n_triangles AS BIGINT) AS n_triangles
           FROM nn, ne, nt""",
      "q_clustering_coef" -> // per-corner triangle credit; 2e0 keeps the ratio DOUBLE
        """WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= 40),
               e AS (SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
                     FROM li x JOIN li y
                       ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey),
               tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
                       FROM e e1 JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
                                 JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b),
               pn AS (SELECT v, count(*) AS n_tri FROM
                        (SELECT unnest([x, y, z]) AS v FROM tri) GROUP BY v),
               deg AS (SELECT v, count(*) AS d FROM
                        (SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e) GROUP BY v)
           SELECT deg.v, CAST(d AS BIGINT) AS degree,
             CAST(coalesce(n_tri, 0) AS BIGINT) AS n_triangles,
             CASE WHEN d >= 2
                  THEN round(2e0 * coalesce(n_tri, 0) / (d * (d - 1)), 6)
             END AS clustering_coef
           FROM deg LEFT JOIN pn USING (v) ORDER BY v""",
      "q_market_basket" -> // exact counts; each ratio ONE IEEE expression
        """WITH items AS (SELECT DISTINCT l_orderkey AS oid, l_partkey AS item
                          FROM lineitem
                          WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
               nb AS (SELECT count(DISTINCT oid) AS n_baskets FROM items),
               ic AS (SELECT item, count(*) AS c_item FROM items GROUP BY item),
               pc AS (SELECT x.item AS ia, y.item AS ib, count(*) AS c_ab
                      FROM items x JOIN items y ON x.oid = y.oid AND x.item < y.item
                      GROUP BY 1, 2 HAVING count(*) >= 2),
               rules AS (SELECT ia AS antecedent, ib AS consequent, c_ab FROM pc
                         UNION ALL SELECT ib, ia, c_ab FROM pc)
           SELECT antecedent, consequent, CAST(c_ab AS BIGINT) AS c_ab,
             round(c_ab / CAST(n_baskets AS DOUBLE), 6) AS support,
             round(c_ab / CAST(c_a AS DOUBLE), 6) AS confidence,
             round((CAST(c_ab AS DOUBLE) * CAST(n_baskets AS DOUBLE)) /
                   (CAST(c_a AS DOUBLE) * CAST(c_b AS DOUBLE)), 6) AS lift
           FROM rules
           JOIN (SELECT item AS antecedent, c_item AS c_a FROM ic) USING (antecedent)
           JOIN (SELECT item AS consequent, c_item AS c_b FROM ic) USING (consequent)
           CROSS JOIN nb
           ORDER BY antecedent, consequent""",
      "q_lag_corr" -> // daily-aggregate-first; the q_corr machinery per lag
        """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
                          FROM events WHERE event_type IN ('view', 'purchase')
                          GROUP BY 1, 2),
               a AS (SELECT day AS day_a, n AS x FROM daily WHERE event_type = 'view'),
               b AS (SELECT day AS day_b, n AS y FROM daily WHERE event_type = 'purchase'),
               l AS (SELECT CAST(unnest(range(0, 8)) AS BIGINT) AS lag),
               m AS (SELECT lag, count(*) AS n,
                 sum(CAST(x AS DECIMAL(28,0))) AS sx,
                 sum(CAST(y AS DECIMAL(28,0))) AS sy,
                 sum(CAST(x*x AS DECIMAL(38,0))) AS sxx,
                 sum(CAST(y*y AS DECIMAL(38,0))) AS syy,
                 sum(CAST(x*y AS DECIMAL(38,0))) AS sxy
                 FROM a CROSS JOIN l JOIN b ON day_a + CAST(lag AS INT) = day_b
                 GROUP BY lag)
           SELECT lag, CAST(n AS BIGINT) AS n_days,
             CASE WHEN n > 1 AND n*sxx <> sx*sx AND n*syy <> sy*sy THEN round(
               (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
               (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
                sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
               6) END AS corr
           FROM m ORDER BY lag""",
      "q_tpch_q5" -> // 6-table star join; q_pricing_summary revenue discipline
        s"""SELECT n_name,
             ${sqlDsum("l_extendedprice * (1 - l_discount)", 4)} AS revenue
           FROM customer, orders, lineitem, supplier, nation, region
           WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
             AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
             AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
             AND r_name = 'ASIA'
             AND o_orderdate >= TIMESTAMP '1996-01-01'
             AND o_orderdate < TIMESTAMP '1998-01-01'
           GROUP BY n_name
           ORDER BY revenue DESC, n_name""",
      "q_nb_summary" -> // accuracy + kappa over the replayed matrix
        (nbCm + """,
           tot AS (SELECT sum(CASE WHEN actual = predicted THEN n ELSE 0 END)
               AS diag, sum(n) AS nt FROM cm),
           ma AS (SELECT actual AS c, sum(n) AS a FROM cm GROUP BY 1),
           mp AS (SELECT predicted AS c, sum(n) AS p FROM cm GROUP BY 1),
           pen AS (SELECT coalesce(sum(CAST(a AS HUGEINT) * p), 0) AS pen
             FROM ma JOIN mp USING (c))
           SELECT CAST(nt AS BIGINT) AS n_test,
             round(CAST(diag AS DOUBLE) / CAST(nt AS DOUBLE), 6) AS accuracy,
             CASE WHEN CAST(pen AS DOUBLE)
                 / (CAST(nt AS DOUBLE) * CAST(nt AS DOUBLE)) <> 1.0
               THEN round((CAST(diag AS DOUBLE) / CAST(nt AS DOUBLE)
                   - CAST(pen AS DOUBLE) / (CAST(nt AS DOUBLE) * CAST(nt AS DOUBLE)))
                 / (1.0 - CAST(pen AS DOUBLE)
                     / (CAST(nt AS DOUBLE) * CAST(nt AS DOUBLE))), 6)
             END AS kappa
           FROM tot, pen"""),
      "q_shipping_priority" -> // top-k ranked on the EXACT decimal, rendered after
        """WITH agg AS (
             SELECT l_orderkey, o_orderdate, o_orderpriority,
               sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS rev
             FROM lineitem
             JOIN orders ON l_orderkey = o_orderkey
             JOIN customer ON o_custkey = c_custkey
             WHERE c_mktsegment = 'BUILDING'
               AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
               AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
             GROUP BY l_orderkey, o_orderdate, o_orderpriority)
           SELECT l_orderkey, CAST(rev AS DOUBLE) AS revenue,
                  o_orderdate, o_orderpriority
           FROM agg ORDER BY rev DESC, l_orderkey LIMIT 10""",
      "q_ts_anomaly" -> // weekday baseline + MAD residual over the DENSE day spine
        """WITH sparse AS (SELECT event_type, CAST(ts AS DATE) AS day,
               count(*) AS cnt FROM events GROUP BY 1, 2),
             bounds AS (SELECT event_type, min(day) AS d0, max(day) AS d1
               FROM sparse GROUP BY 1),
             spine AS (SELECT event_type,
                 CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
               FROM bounds),
             daily AS (SELECT s.event_type, s.day,
                 CAST(coalesce(sp.cnt, 0) AS BIGINT) AS cnt
               FROM spine s LEFT JOIN sparse sp USING (event_type, day)),
             base AS (SELECT event_type, dayofweek(day) AS dw,
               CAST(sum(cnt) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS expected
               FROM daily GROUP BY 1, 2),
             r AS (SELECT d.event_type, d.day, d.cnt, b.expected,
                 CAST(d.cnt AS DOUBLE) - b.expected AS resid
               FROM daily d JOIN base b
                 ON d.event_type = b.event_type AND dayofweek(d.day) = b.dw),
             m AS (SELECT event_type, quantile_cont(abs(resid), 0.5) AS mad
               FROM r GROUP BY 1)
           SELECT r.event_type, r.day, r.cnt,
             round(r.expected, 6) AS expected,
             CASE WHEN m.mad > 0
               THEN round(r.resid / (1.4826 * m.mad), 6) END AS score,
             CAST(CASE WHEN m.mad > 0 AND
                 abs(round(r.resid / (1.4826 * m.mad), 6)) > 3.0
               THEN 1 ELSE 0 END AS INTEGER) AS is_anomaly
           FROM r JOIN m USING (event_type)
           ORDER BY event_type, day""",
      "q_rolling_median" -> // windowed quantile_cont == windowed percentile (the bridge)
        """SELECT event_type, event_id,
             round(quantile_cont(CAST(value AS DOUBLE), 0.5) OVER (
               PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6) AS rolling_median
           FROM events ORDER BY event_type, event_id""",
      "q_nb_confusion" -> // the full train->predict chain replayed; decimal scores
        (nbCm + "\nSELECT actual, predicted, n FROM cm ORDER BY 1, 2"),
      "q_gains" -> // positional deciles; rates/lifts as rounded IEEE chains
        """WITH scored AS (SELECT doc_id, n_chars AS s,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
             FROM documents WHERE n_chars IS NOT NULL),
           tiled AS (SELECT y, CAST(ntile(10) OVER (ORDER BY s DESC, doc_id) AS BIGINT)
               AS decile FROM scored),
           per AS (SELECT decile, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(y) AS BIGINT) AS n_pos FROM tiled GROUP BY decile),
           tot AS (SELECT CAST(sum(n) AS BIGINT) AS tn,
               CAST(sum(n_pos) AS BIGINT) AS tp FROM per),
           cum AS (SELECT decile, n, n_pos,
               CAST(sum(n_pos) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)
                 AS BIGINT) AS cum_pos FROM per)
           SELECT decile, n, n_pos,
             round(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE), 6) AS response_rate,
             CASE WHEN tp > 0 THEN
               round(CAST(cum_pos AS DOUBLE) / CAST(tp AS DOUBLE), 6) END AS cum_capture,
             CASE WHEN tp > 0 THEN
               round((CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE))
                 / (CAST(tp AS DOUBLE) / CAST(tn AS DOUBLE)), 6) END AS lift
           FROM cum, tot ORDER BY decile""",
      "q_exit_rates" -> // session assignment replayed in exact micros
        """WITH e AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS us
             FROM events),
           m AS (SELECT *, CASE WHEN lag(us) OVER w IS NULL
                 OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_s
             FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
           s AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id
               ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS sess FROM m),
           x AS (SELECT event_type,
               CASE WHEN row_number() OVER (PARTITION BY user_id, sess
                 ORDER BY us DESC, event_id DESC) = 1 THEN 1 ELSE 0 END AS ex
             FROM s)
           SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
             CAST(sum(ex) AS BIGINT) AS n_exits,
             round(CAST(sum(ex) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
               AS exit_rate
           FROM x GROUP BY 1 ORDER BY 1""",
      "q_new_returning" -> // first-day classification over distinct (user, day)
        """WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
           f AS (SELECT user_id, min(day) AS fd FROM d GROUP BY 1)
           SELECT day,
             CAST(sum(CASE WHEN day = fd THEN 1 ELSE 0 END) AS BIGINT) AS new_users,
             CAST(sum(CASE WHEN day <> fd THEN 1 ELSE 0 END) AS BIGINT)
               AS returning_users
           FROM d JOIN f USING (user_id)
           GROUP BY day ORDER BY day""",
      "q_cusum" -> // integer micro-unit prefix sums over the DENSE day spine
        """WITH sparse AS (SELECT event_type, CAST(ts AS DATE) AS day,
               count(*) AS cnt FROM events GROUP BY 1, 2),
           bounds AS (SELECT event_type, min(day) AS d0, max(day) AS d1
             FROM sparse GROUP BY 1),
           spine AS (SELECT event_type,
               CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
             FROM bounds),
           daily AS (SELECT s.event_type, s.day,
               CAST(coalesce(sp.cnt, 0) AS BIGINT) AS cnt
             FROM spine s LEFT JOIN sparse sp USING (event_type, day)),
           mu AS (SELECT event_type, (sum(cnt) * 1000000) // count(*) AS mu6
             FROM daily GROUP BY 1),
           z AS (SELECT d.event_type, d.day, d.cnt,
               d.cnt * 1000000 - m.mu6 - 1000000 AS z6
             FROM daily d JOIN mu m USING (event_type)),
           runs AS (SELECT event_type, day, cnt,
               sum(z6) OVER (PARTITION BY event_type ORDER BY day
                 ROWS UNBOUNDED PRECEDING) AS zz
             FROM z),
           rm AS (SELECT event_type, day, cnt, zz,
               min(zz) OVER (PARTITION BY event_type ORDER BY day
                 ROWS UNBOUNDED PRECEDING) AS runmin
             FROM runs)
           SELECT event_type, day, cnt,
             round(CAST(zz - least(runmin, 0) AS DOUBLE) / 1000000.0, 6) AS cusum,
             CAST(CASE WHEN zz - least(runmin, 0) > 8000000 THEN 1 ELSE 0 END
               AS INTEGER) AS alarm
           FROM rm ORDER BY event_type, day""",
      "q_trend_test" -> // exact integer S over the DENSE day spine; z replayed verbatim
        """WITH sparse AS (SELECT event_type, CAST(ts AS DATE) AS day,
               count(*) AS cnt FROM events GROUP BY 1, 2),
           bounds AS (SELECT event_type, min(day) AS d0, max(day) AS d1
             FROM sparse GROUP BY 1),
           spine AS (SELECT event_type,
               CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
             FROM bounds),
           daily AS (SELECT s.event_type, s.day,
               CAST(coalesce(sp.cnt, 0) AS BIGINT) AS cnt
             FROM spine s LEFT JOIN sparse sp USING (event_type, day)),
           pr AS (SELECT a.event_type,
               CASE WHEN b.cnt > a.cnt THEN 1
                    WHEN b.cnt < a.cnt THEN -1 ELSE 0 END AS sg,
               CASE WHEN b.cnt = a.cnt THEN 1 ELSE 0 END AS tie
             FROM daily a JOIN daily b
               ON a.event_type = b.event_type AND a.day < b.day),
           st AS (SELECT event_type, CAST(sum(sg) AS BIGINT) AS s,
               CAST(sum(tie) AS BIGINT) AS n_ties
             FROM pr GROUP BY 1),
           nd AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
             FROM daily GROUP BY 1)
           SELECT st.event_type, n_days, s, n_ties,
             CASE WHEN n_days >= 3 THEN
               round(CASE WHEN s > 0 THEN (CAST(s AS DOUBLE) - 1.0)
                   / sqrt(CAST(n_days AS DOUBLE) * (CAST(n_days AS DOUBLE) - 1.0)
                     * (2.0 * CAST(n_days AS DOUBLE) + 5.0) / 18.0)
                 WHEN s < 0 THEN (CAST(s AS DOUBLE) + 1.0)
                   / sqrt(CAST(n_days AS DOUBLE) * (CAST(n_days AS DOUBLE) - 1.0)
                     * (2.0 * CAST(n_days AS DOUBLE) + 5.0) / 18.0)
                 ELSE 0.0 END, 6)
             END AS z
           FROM st JOIN nd USING (event_type)
           ORDER BY st.event_type""",
      "q_streaks" -> // epoch-day minus row_number labels each run
        """WITH days AS (SELECT DISTINCT event_type, CAST(ts AS DATE) AS day
             FROM events),
           g AS (SELECT event_type, day,
               date_diff('day', DATE '1970-01-01', day)
                 - row_number() OVER (PARTITION BY event_type ORDER BY day) AS grp
             FROM days)
           SELECT event_type, min(day) AS streak_start, max(day) AS streak_end,
             CAST(count(*) AS BIGINT) AS days
           FROM g GROUP BY event_type, grp
           ORDER BY event_type, streak_start""",
      "q_lorenz" -> // positional tiles on a unique total order; exact shares
        """WITH tiled AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS v,
               CAST(ntile(10) OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS tile
             FROM documents WHERE n_chars IS NOT NULL AND n_chars >= 0),
           per AS (SELECT tile, CAST(count(*) AS BIGINT) AS n,
               sum(v) AS s FROM tiled GROUP BY tile),
           tot AS (SELECT sum(s) AS t FROM per),
           cum AS (SELECT tile, n, s,
               sum(s) OVER (ORDER BY tile ROWS UNBOUNDED PRECEDING) AS cs
             FROM per)
           SELECT tile, n, CAST(s AS DOUBLE) AS tile_total,
             CASE WHEN t > 0 THEN round(CAST(s AS DOUBLE) / CAST(t AS DOUBLE), 6)
               END AS share,
             CASE WHEN t > 0 THEN round(CAST(cs AS DOUBLE) / CAST(t AS DOUBLE), 6)
               END AS cum_share
           FROM cum, tot ORDER BY tile""",
      "q_gini" -> // rank-weighted identity; tie runs contribute c·cum + c(c+1)/2
        """WITH s AS (SELECT CAST(n_chars AS BIGINT) AS v FROM documents
             WHERE n_chars IS NOT NULL AND n_chars >= 0),
           pv AS (SELECT v, count(*) AS c FROM s GROUP BY v),
           r AS (SELECT v, c, coalesce(sum(c) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
             FROM pv),
           a AS (SELECT sum(v * (c*cum + (c*(c+1))//2)) AS srx,
               sum(c) AS n, sum(v*c) AS sx FROM r)
           SELECT CAST(n AS BIGINT) AS n, CAST(sx AS DOUBLE) AS total,
             CASE WHEN n > 0 AND sx > 0 THEN
               round(CAST(srx*2 AS DOUBLE) / CAST(n*sx AS DOUBLE)
                 - CAST(n+1 AS DOUBLE) / CAST(n AS DOUBLE), 6)
             END AS gini
           FROM a""",
      "q_concentration" -> // HHI and effective-N per column; exact moments
        """SELECT * FROM (
             SELECT 'source' AS "column",
               CAST(count(*) AS BIGINT) AS n_categories,
               round(CAST(sum(c*c) AS DOUBLE) / CAST(sum(c)*sum(c) AS DOUBLE), 6) AS hhi,
               round(CAST(sum(c)*sum(c) AS DOUBLE) / CAST(sum(c*c) AS DOUBLE), 6)
                 AS effective_n
             FROM (SELECT count(*) AS c FROM documents
                   WHERE source IS NOT NULL GROUP BY source)
             UNION ALL
             SELECT 'lang',
               CAST(count(*) AS BIGINT),
               round(CAST(sum(c*c) AS DOUBLE) / CAST(sum(c)*sum(c) AS DOUBLE), 6),
               round(CAST(sum(c)*sum(c) AS DOUBLE) / CAST(sum(c*c) AS DOUBLE), 6)
             FROM (SELECT count(*) AS c FROM documents
                   WHERE lang IS NOT NULL GROUP BY lang))
           ORDER BY "column"""",
      "q_ks_drift" -> // sup ECDF gap at step points; integer cross-products
        """WITH s AS (SELECT CAST(n_chars AS DOUBLE) AS v, source AS g
             FROM documents
             WHERE n_chars IS NOT NULL AND source IN ('src0', 'src1')),
           per AS (SELECT v,
               sum(CASE WHEN g = 'src0' THEN 1 ELSE 0 END) AS c1,
               sum(CASE WHEN g = 'src1' THEN 1 ELSE 0 END) AS c2
             FROM s GROUP BY v),
           r AS (SELECT
               sum(c1) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum1,
               sum(c2) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum2
             FROM per),
           t AS (SELECT CAST(coalesce((SELECT sum(c1) FROM per), 0) AS BIGINT) AS n1,
                        CAST(coalesce((SELECT sum(c2) FROM per), 0) AS BIGINT) AS n2)
           SELECT n1 AS n_a, n2 AS n_b,
             CASE WHEN n1 > 0 AND n2 > 0 THEN
               round(CAST((SELECT max(abs(cum1*t.n2 - cum2*t.n1)) FROM r) AS DOUBLE)
                 / CAST(n1*n2 AS DOUBLE), 6)
             END AS ks_d
           FROM t""",
      "q_auc" -> // rank-sum AUC, doubled ranks keep ties integral
        """WITH s AS (SELECT CAST(n_chars AS DOUBLE) AS sc,
               CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
             FROM documents WHERE n_chars IS NOT NULL),
           ps AS (SELECT sc, count(*) AS c, sum(y) AS p FROM s GROUP BY sc),
           r AS (SELECT c, p, coalesce(sum(c) OVER (ORDER BY sc
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
             FROM ps),
           a AS (SELECT sum(p*(2*cum+c+1)) AS sdbl, sum(p) AS np,
               sum(c-p) AS nn FROM r)
           SELECT CAST(np AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg,
             CASE WHEN np > 0 AND nn > 0 THEN
               round((CAST(sdbl AS DOUBLE) - CAST(np*(np+1) AS DOUBLE))
                 / CAST(np*nn*2 AS DOUBLE), 6)
             END AS auc
           FROM a""",
      "q_nb_metrics" -> // precision/recall/F1 sheet over the same replayed matrix
        (nbCm + """,
           act AS (SELECT actual AS clazz, CAST(sum(n) AS BIGINT) AS actual_n
                   FROM cm GROUP BY 1),
           prd AS (SELECT predicted AS pc, CAST(sum(n) AS BIGINT) AS pn
                   FROM cm GROUP BY 1),
           tpt AS (SELECT actual AS tc, n AS tpn FROM cm WHERE actual = predicted)
           SELECT clazz,
             CAST(coalesce(tpn, 0) AS BIGINT) AS tp,
             actual_n,
             CAST(coalesce(pn, 0) AS BIGINT) AS predicted_n,
             CASE WHEN coalesce(pn, 0) > 0
               THEN round(CAST(coalesce(tpn, 0) AS DOUBLE) / CAST(coalesce(pn, 0) AS DOUBLE), 6)
             END AS prec,
             round(CAST(coalesce(tpn, 0) AS DOUBLE) / CAST(actual_n AS DOUBLE), 6) AS rec,
             CASE WHEN coalesce(pn, 0) > 0 AND
                 (CAST(coalesce(tpn, 0) AS DOUBLE) / CAST(coalesce(pn, 0) AS DOUBLE)
                  + CAST(coalesce(tpn, 0) AS DOUBLE) / CAST(actual_n AS DOUBLE)) > 0.0
               THEN round((2.0 * (CAST(coalesce(tpn, 0) AS DOUBLE) / CAST(coalesce(pn, 0) AS DOUBLE))
                     * (CAST(coalesce(tpn, 0) AS DOUBLE) / CAST(actual_n AS DOUBLE)))
                    / (CAST(coalesce(tpn, 0) AS DOUBLE) / CAST(coalesce(pn, 0) AS DOUBLE)
                       + CAST(coalesce(tpn, 0) AS DOUBLE) / CAST(actual_n AS DOUBLE)), 6)
             END AS f1
           FROM act LEFT JOIN prd ON clazz = pc LEFT JOIN tpt ON clazz = tc
           ORDER BY clazz"""),
      "q_sparse_cosine" -> // df-capped inverted index; rounded-then-decimal sums
        """WITH tk AS (SELECT doc_id,
                 regexp_split_to_array(trim(lower(text)), '\s+') AS toks FROM documents),
               ng AS (SELECT doc_id, unnest(
                 [array_to_string(toks[i:i+2], ' ') for i in range(1, len(toks)-1)]) AS ng
                 FROM tk),
               tf AS (SELECT doc_id, ('0x' || substr(md5(ng), 1, 15))::BIGINT AS fp,
                 count(*) AS tf FROM ng GROUP BY 1, 2),
               nd AS (SELECT count(*) AS n_docs FROM documents),
               wd AS (SELECT doc_id, fp, tf,
                 count(*) OVER (PARTITION BY fp) AS df FROM tf),
               w AS (SELECT doc_id, fp, round(CAST(tf AS DOUBLE) *
                   ln(CAST(n_docs + 1 AS DOUBLE) / CAST(df + 1 AS DOUBLE)), 6) AS w
                 FROM wd, nd WHERE df <= 64),
               norms AS (SELECT doc_id, sqrt(CAST(sum(CAST(round(w * w, 6)
                 AS DECIMAL(18,6))) AS DOUBLE)) AS norm FROM w GROUP BY 1),
               dots AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                 sum(CAST(round(a.w * b.w, 6) AS DECIMAL(18,6))) AS dot
                 FROM w a JOIN w b USING (fp) WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
           SELECT doc_a, doc_b,
             round(CAST(dot AS DOUBLE) / (na.norm * nb.norm), 6) AS cosine
           FROM dots JOIN norms na ON na.doc_id = dots.doc_a
                     JOIN norms nb ON nb.doc_id = dots.doc_b
           WHERE round(CAST(dot AS DOUBLE) / (na.norm * nb.norm), 6) >= 0.3
           ORDER BY doc_a, doc_b""",
      "q_hash_features" -> // portable md5 bucket + sign bit; exact signed-tf longs
        """WITH t AS (SELECT doc_id,
                 unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
                 FROM documents),
               tf AS (SELECT doc_id, term, count(*) AS tf FROM t GROUP BY 1, 2),
               h AS (SELECT doc_id,
                 ('0x' || substr(md5(term), 1, 8))::BIGINT % 32 AS pos,
                 (CASE WHEN ('0x' || substr(md5(term), 9, 1))::BIGINT % 2 = 0
                       THEN 1 ELSE -1 END) * tf AS sv
                 FROM tf)
           SELECT doc_id, pos, CAST(sum(sv) AS BIGINT) AS value
           FROM h GROUP BY 1, 2 ORDER BY doc_id, pos""",
      "q_user_paths" -> // first-k path per user, counted; ties broken by path
        """WITH r AS (SELECT user_id, event_type,
                 row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
               FROM events),
             p AS (SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
               FROM r WHERE rn <= 3 GROUP BY user_id)
           SELECT path, count(*) AS n_users FROM p GROUP BY path
           ORDER BY n_users DESC, path""",
      "q_abc_analysis" -> // desc-revenue cumulative share; total order makes RANGE==ROWS
        """WITH rev AS (SELECT l_partkey AS key,
                 CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
                   * 10000 AS BIGINT) AS units
               FROM lineitem GROUP BY 1),
             tot AS (SELECT sum(units) AS t FROM rev),
             c AS (SELECT key, units,
                 CAST(sum(units) OVER (ORDER BY units DESC, key) AS BIGINT) AS cum_units
               FROM rev)
           SELECT key, units, cum_units,
             round(CAST(cum_units AS DOUBLE) / CAST(t AS DOUBLE), 6) AS cum_share,
             CASE WHEN round(CAST(cum_units AS DOUBLE) / CAST(t AS DOUBLE), 6) <= 0.80 THEN 'A'
                  WHEN round(CAST(cum_units AS DOUBLE) / CAST(t AS DOUBLE), 6) <= 0.95 THEN 'B'
                  ELSE 'C' END AS abc_class
           FROM c, tot ORDER BY cum_units""",
      "q_rfm" -> // positional ntile over (metric, custkey) total orders
        """WITH per AS (SELECT o_custkey, max(o_orderdate) AS last_order,
                 count(*) AS frequency,
                 sum(CAST(o_totalprice AS DECIMAL(18,2))) AS md
               FROM orders GROUP BY 1),
             mx AS (SELECT max(o_orderdate) AS mxo FROM orders),
             s AS (SELECT o_custkey,
                 date_diff('day', CAST(last_order AS DATE), CAST(mxo AS DATE)) AS recency_days,
                 frequency, md FROM per, mx),
             t AS (SELECT o_custkey, recency_days, frequency, md,
                 ntile(5) OVER (ORDER BY recency_days DESC, o_custkey) AS r,
                 ntile(5) OVER (ORDER BY frequency, o_custkey) AS f,
                 ntile(5) OVER (ORDER BY md, o_custkey) AS m FROM s)
           SELECT o_custkey, CAST(recency_days AS BIGINT) AS recency_days,
             CAST(frequency AS BIGINT) AS frequency, CAST(md AS DOUBLE) AS monetary,
             CAST(r AS BIGINT) AS r, CAST(f AS BIGINT) AS f, CAST(m AS BIGINT) AS m,
             r::VARCHAR || f::VARCHAR || m::VARCHAR AS segment
           FROM t ORDER BY o_custkey""",
      "q_gopher_rules" -> // every rule compares the ROUNDED metric — kept set engine-exact
        """WITH b AS (SELECT doc_id, text,
                 regexp_split_to_array(trim(lower(text)), '\s+') AS t FROM documents),
             m AS (SELECT doc_id,
                 CAST(len(t) AS BIGINT) AS n_tokens,
                 round(CAST(len(regexp_replace(text, '\s', '', 'g')) AS DOUBLE)
                   / CAST(len(t) AS DOUBLE), 6) AS mean_word_len,
                 round(CAST(len(regexp_extract_all(text, '#|\.\.\.')) AS DOUBLE)
                   / CAST(len(t) AS DOUBLE), 6) AS symbol_ratio,
                 round(CAST(len(list_filter(t, x -> regexp_matches(x, '\p{L}'))) AS DOUBLE)
                   / CAST(len(t) AS DOUBLE), 6) AS alpha_word_ratio,
                 CAST(len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|is|a)\b'))
                   AS BIGINT) AS stopword_hits
               FROM b)
           SELECT doc_id, n_tokens, mean_word_len, symbol_ratio, alpha_word_ratio,
             stopword_hits,
             (n_tokens >= 50 AND n_tokens <= 100000) AS ok_tokens,
             (mean_word_len >= 3.0 AND mean_word_len <= 10.0) AS ok_word_len,
             (symbol_ratio <= 0.1) AS ok_symbols,
             (alpha_word_ratio >= 0.8) AS ok_alpha,
             (stopword_hits >= 2) AS ok_stopwords,
             (n_tokens >= 50 AND n_tokens <= 100000
               AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
               AND symbol_ratio <= 0.1 AND alpha_word_ratio >= 0.8
               AND stopword_hits >= 2) AS pass
           FROM m ORDER BY doc_id""",
      "q_khop" -> // unrolled frontier CTEs; min-hop via NOT IN earlier rings
        """WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem WHERE l_quantity >= 40),
               e AS (SELECT DISTINCT x.l_partkey AS a, y.l_partkey AS b
                     FROM li x JOIN li y
                       ON x.l_orderkey = y.l_orderkey AND x.l_partkey <> y.l_partkey),
               s0 AS (SELECT CAST(unnest([1, 2, 3]) AS BIGINT) AS v),
               r1 AS (SELECT DISTINCT e.b AS v FROM s0 JOIN e ON e.a = s0.v),
               r2 AS (SELECT DISTINCT e.b AS v FROM r1 JOIN e ON e.a = r1.v),
               lab AS (SELECT v, 0 AS hop FROM s0
                 UNION ALL SELECT v, 1 FROM r1 WHERE v NOT IN (SELECT v FROM s0)
                 UNION ALL SELECT v, 2 FROM r2
                   WHERE v NOT IN (SELECT v FROM s0)
                     AND v NOT IN (SELECT v FROM r1))
           SELECT v, CAST(hop AS BIGINT) AS hop FROM lab ORDER BY v""",
      "q_t_closeness" -> // absent sensitive values fold in as 1 - sum(q_present)
        """WITH g AS (SELECT lang AS s, count(*) AS ns FROM documents GROUP BY 1),
               n AS (SELECT count(*) AS n FROM documents),
               q AS (SELECT s, CAST(ns AS DOUBLE) / CAST(n AS DOUBLE) AS q FROM g, n),
               c AS (SELECT source, lang AS s, count(*) AS ngs FROM documents
                     GROUP BY 1, 2),
               cw AS (SELECT source, s, ngs,
                 sum(ngs) OVER (PARTITION BY source) AS ng FROM c),
               j AS (SELECT source, ng,
                 CAST(round(abs(CAST(ngs AS DOUBLE) / CAST(ng AS DOUBLE) - q), 6)
                   AS DECIMAL(18,6)) AS d,
                 CAST(round(q, 6) AS DECIMAL(18,6)) AS qp
                 FROM cw JOIN q ON cw.s IS NOT DISTINCT FROM q.s)
           SELECT source, CAST(max(ng) AS BIGINT) AS n_rows,
             round(0.5 * (CAST(sum(d) AS DOUBLE) + (1.0 - CAST(sum(qp) AS DOUBLE))), 6)
               AS t_closeness
           FROM j GROUP BY source ORDER BY source""",
      "q_cumulative_users" -> // first-day counting; cumsum over the bounded day table
        """WITH f AS (SELECT user_id, min(CAST(ts AS DATE)) AS day FROM events GROUP BY 1),
               p AS (SELECT day, count(*) AS new_users FROM f GROUP BY 1)
           SELECT day, new_users,
             CAST(sum(new_users) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cumulative_users
           FROM p ORDER BY day""",
      "q_rolling_active" -> // n-literal fan-out; windows past the data clipped
        """WITH a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
               mx AS (SELECT max(day) AS m FROM a),
               s AS (SELECT DISTINCT user_id, day + CAST(off AS INT) AS day
                     FROM a CROSS JOIN (SELECT unnest(range(0, 7)) AS off) o)
           SELECT day, count(*) AS active_users
           FROM s, mx WHERE day <= m GROUP BY day ORDER BY day""",
      "q_quantile_transform" -> // ties share a percent_rank in both engines
        """SELECT l_orderkey, l_linenumber,
             round(percent_rank() OVER (
               PARTITION BY l_returnflag ORDER BY l_extendedprice), 6) AS q
           FROM lineitem ORDER BY l_orderkey, l_linenumber""",
      "q_mutual_info" -> // three entropies via round-then-decimal n*ln n sums
        """WITH cells AS (SELECT lang AS x, source AS y, count(*) AS n
                          FROM documents GROUP BY 1, 2),
               js AS (SELECT sum(CAST(round(n * ln(CAST(n AS DOUBLE)), 6)
                        AS DECIMAL(18,6))) AS sxy, sum(n) AS t FROM cells),
               xs AS (SELECT sum(CAST(round(n * ln(CAST(n AS DOUBLE)), 6)
                        AS DECIMAL(18,6))) AS sx FROM
                        (SELECT x, sum(n) AS n FROM cells GROUP BY x)),
               ys AS (SELECT sum(CAST(round(n * ln(CAST(n AS DOUBLE)), 6)
                        AS DECIMAL(18,6))) AS sy FROM
                        (SELECT y, sum(n) AS n FROM cells GROUP BY y))
           SELECT CAST(t AS BIGINT) AS n_rows,
             round(ln(CAST(t AS DOUBLE)) - CAST(sx AS DOUBLE) / CAST(t AS DOUBLE), 6) AS h_x,
             round(ln(CAST(t AS DOUBLE)) - CAST(sy AS DOUBLE) / CAST(t AS DOUBLE), 6) AS h_y,
             round(ln(CAST(t AS DOUBLE)) - CAST(sxy AS DOUBLE) / CAST(t AS DOUBLE), 6) AS h_xy,
             round((ln(CAST(t AS DOUBLE)) - CAST(sx AS DOUBLE) / CAST(t AS DOUBLE))
                 + (ln(CAST(t AS DOUBLE)) - CAST(sy AS DOUBLE) / CAST(t AS DOUBLE))
                 - (ln(CAST(t AS DOUBLE)) - CAST(sxy AS DOUBLE) / CAST(t AS DOUBLE)), 6)
               AS mutual_info
           FROM js, xs, ys""",
      "q_log_odds" -> // Monroe 2008 informative-prior log-odds z
        """WITH tm AS (SELECT source AS src,
                 unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
               FROM documents WHERE source IN ('src0', 'src1')),
             c AS (SELECT term,
                 sum(CASE WHEN src = 'src0' THEN 1 ELSE 0 END) AS ya,
                 sum(CASE WHEN src = 'src1' THEN 1 ELSE 0 END) AS yb
               FROM tm GROUP BY term),
             tt AS (SELECT sum(ya) AS na, sum(yb) AS nb FROM c),
             s AS (SELECT term, ya, yb,
                 10.0 * CAST(ya + yb AS DOUBLE) / CAST(na + nb AS DOUBLE) AS aw,
                 CAST(ya AS DOUBLE) AS yad, CAST(yb AS DOUBLE) AS ybd,
                 CAST(na AS DOUBLE) AS nad, CAST(nb AS DOUBLE) AS nbd
               FROM c, tt),
             z AS (SELECT term, CAST(ya AS BIGINT) AS ya, CAST(yb AS BIGINT) AS yb,
                 round(ln((yad + aw) / (nad + 10.0 - yad - aw))
                     - ln((ybd + aw) / (nbd + 10.0 - ybd - aw)), 6) AS delta,
                 round((ln((yad + aw) / (nad + 10.0 - yad - aw))
                     - ln((ybd + aw) / (nbd + 10.0 - ybd - aw)))
                   / sqrt(1.0 / (yad + aw) + 1.0 / (ybd + aw)), 6) AS z
               FROM s)
           SELECT term, ya, yb, delta, z FROM z
           ORDER BY abs(z) DESC, term LIMIT 50""",
      "q_interarrival" -> // exact micros gaps; decimal moments; CV guard on exact sums
        """WITH g AS (SELECT user_id, epoch_us(ts)
                 - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 AS gap FROM events),
             a AS (SELECT user_id, count(*) AS n_gaps,
                 sum(CAST(gap AS DECIMAL(28,0))) AS sg,
                 sum(CAST(CAST(gap AS DECIMAL(19,0)) * CAST(gap AS DECIMAL(19,0))
                   AS DECIMAL(38,0))) AS sgg
               FROM g WHERE gap IS NOT NULL GROUP BY user_id)
           SELECT user_id, CAST(n_gaps AS BIGINT) AS n_gaps,
             (CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE)) / 1000000.0
               AS mean_gap_s,
             CASE WHEN n_gaps > 1 AND n_gaps * sgg <> sg * sg THEN
               round(sqrt((CAST(sgg AS DOUBLE)
                   - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE))
                 / (CAST(n_gaps AS DOUBLE) - 1))
                 / (CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE)), 6) END AS cv
           FROM a ORDER BY user_id""",
      "q_corpus_card" ->
        """WITH per_doc AS (SELECT source, lang,
             CAST(len(regexp_extract_all(text, '[\p{L}\p{N}]+|[^\p{L}\p{N}\s]')) AS BIGINT)
               AS tok,
             CASE WHEN len(regexp_split_to_array(trim(text), '\s+')) >= 5
               AND CAST(len(regexp_replace(text, '\s', '', 'g')) AS DOUBLE)
                   / len(regexp_split_to_array(trim(text), '\s+')) <= 15.0
               AND CAST(len(text) - len(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
                   / len(text) <= 0.3
               AND CAST(len(text) - len(regexp_replace(text, '[^\p{L}\p{N}\s]', '', 'g')) AS DOUBLE)
                   / len(text) <= 0.3 THEN 1 ELSE 0 END AS q
             FROM documents)
           SELECT source, count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS n_tokens,
             min(tok) AS min_tokens, max(tok) AS max_tokens,
             CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
             CAST(sum(q) AS BIGINT) AS n_quality,
             CAST(sum(q) AS BIGINT) * 10000 // count(*) AS quality_pct
           FROM per_doc GROUP BY source ORDER BY source""",
      "q_corpus_pipeline" -> // the same stages chained as CTEs
        s"""WITH q AS (SELECT doc_id, text FROM documents WHERE
              len(regexp_split_to_array(trim(text), '\\s+')) >= 5
              AND CAST(len(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE)
                  / len(regexp_split_to_array(trim(text), '\\s+')) <= 15.0
              AND CAST(len(text) - len(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
                  / len(text) <= 0.3
              AND CAST(len(text) - len(regexp_replace(text, '[^\\p{L}\\p{N}\\s]', '', 'g')) AS DOUBLE)
                  / len(text) <= 0.3),
            fp AS (SELECT doc_id, text, $fingerprint AS f FROM q),
            g AS (SELECT f, min(doc_id) AS k FROM fp GROUP BY f),
            kd AS (SELECT fp.doc_id, fp.text FROM fp JOIN g ON fp.f = g.f
                   WHERE fp.doc_id = g.k),
            tr AS (SELECT doc_id, text FROM kd WHERE doc_id % 41 <> 0),
            ttk AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS lt
                    FROM tr),
            tg AS (SELECT doc_id, unnest(list_distinct(
                     [array_to_string(lt[i:i+7], ' ') for i in range(1, len(lt)-6)])) AS ng
                   FROM ttk),
            btk AS (SELECT regexp_split_to_array(trim(lower(text)), '\\s+') AS lt
                    FROM documents WHERE doc_id % 41 = 0),
            bg AS (SELECT DISTINCT ng FROM
                     (SELECT unnest([array_to_string(lt[i:i+7], ' ')
                        for i in range(1, len(lt)-6)]) AS ng FROM btk)),
            dirty AS (SELECT DISTINCT tg.doc_id FROM tg JOIN bg USING (ng)),
            clean AS (SELECT tr.doc_id, tr.text FROM tr
                      LEFT JOIN dirty ON tr.doc_id = dirty.doc_id
                      WHERE dirty.doc_id IS NULL),
            ctk AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
                    FROM clean WHERE text IS NOT NULL),
            c AS (SELECT doc_id, toks,
                    unnest(range(0, ((len(toks)-1)//16) + 1)) AS chunk_idx FROM ctk)
            SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
              CAST(len(toks[chunk_idx*16+1 : chunk_idx*16+16]) AS BIGINT) AS n_chunk_tokens,
              array_to_string(toks[chunk_idx*16+1 : chunk_idx*16+16], ' ') AS chunk_text
            FROM c ORDER BY doc_id, chunk_idx""",
      "q_exact_docs" ->
        s"""SELECT min(doc_id) AS keeper_id, count(*) AS n_copies, fingerprint
            FROM (SELECT doc_id, $fingerprint AS fingerprint FROM documents)
            GROUP BY fingerprint ORDER BY keeper_id""",
      "q_training_mix" -> // each stage's established oracle spelling, chained
        s"""WITH q AS (SELECT doc_id, lang, text FROM documents WHERE
                 len(regexp_split_to_array(trim(text), '\\s+')) >= 5
                 AND CAST(len(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE)
                     / len(regexp_split_to_array(trim(text), '\\s+')) <= 15.0
                 AND CAST(len(text) - len(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
                     / len(text) <= 0.3
                 AND CAST(len(text) - len(regexp_replace(text, '[^\\p{L}\\p{N}\\s]', '', 'g')) AS DOUBLE)
                     / len(text) <= 0.3),
                 fp AS (SELECT doc_id, lang, $fingerprint AS f FROM q),
                 keep AS (SELECT doc_id, lang FROM
                   (SELECT doc_id, lang,
                      row_number() OVER (PARTITION BY f ORDER BY doc_id) AS rn FROM fp)
                   WHERE rn = 1),
                 c AS (SELECT lang, count(*) AS cnt FROM keep GROUP BY lang),
                 t AS (SELECT sum(cnt) AS n FROM c),
                 r AS (SELECT lang, least(10000, floor(
                         CASE lang WHEN 'en' THEN 0.5::DOUBLE WHEN 'zh' THEN 0.2::DOUBLE
                                   WHEN 'es' THEN 0.2::DOUBLE WHEN 'de' THEN 0.1::DOUBLE
                                   ELSE 0.0::DOUBLE END
                         * 0.5::DOUBLE * n::DOUBLE * 10000 / cnt::DOUBLE))::BIGINT AS rate_bp
                       FROM c, t),
                 m AS (SELECT k.doc_id, k.lang FROM keep k JOIN r USING (lang)
                       WHERE ('0x' || substr(md5(k.doc_id::VARCHAR), 1, 8))::BIGINT % 10000
                         < rate_bp),
                 s AS (SELECT doc_id, lang,
                         CASE WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 10000 < 8000
                                THEN 'train'
                              WHEN ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 10000 < 9000
                                THEN 'val'
                              ELSE 'test' END AS split
                       FROM m)
            SELECT doc_id, lang, split, md5('epoch0:' || doc_id::VARCHAR) AS shuffle_key
            FROM s ORDER BY doc_id""",
      "q_bloom_new_docs" ->
        s"""WITH fp AS (SELECT doc_id, $fingerprint AS fingerprint FROM documents),
                 hist AS (SELECT fingerprint FROM fp WHERE doc_id % 2 = 0),
                 batch AS (SELECT doc_id, fingerprint FROM fp WHERE doc_id % 2 = 1
                           UNION ALL
                           SELECT doc_id + 1000000 AS doc_id, fingerprint FROM fp
                           WHERE doc_id % 10 = 0)
            SELECT doc_id, fingerprint FROM batch b
            WHERE NOT EXISTS (SELECT 1 FROM hist h WHERE h.fingerprint = b.fingerprint)
            ORDER BY doc_id""",
      "q_new_near_docs" -> newNearOracle(cap = 0),
      // identical math — the engine side reads a persisted signature
      // table instead of re-signing history, result is the same
      "q_new_near_persisted" -> newNearOracle(cap = 0),
      "q_new_near_capped" -> newNearOracle(cap = 3),
      "q_minhash_candidates" ->
        s"""WITH $minhashCtes
            SELECT doc_a, doc_b FROM cand ORDER BY doc_a, doc_b""",
      "q_minhash_capped" ->
        s"""WITH ${minhashCtesFrom("documents", cap = 3)}
            SELECT doc_a, doc_b FROM cand ORDER BY doc_a, doc_b""",
      "q_near_dup_pairs" ->
        s"""WITH $minhashCtes,
            ${verifiedPairCtes("documents")}
            SELECT doc_a, doc_b, round(jac, 6) AS jaccard
            FROM verified ORDER BY doc_a, doc_b""",
      "q_contrastive_pairs" -> // positives + fp60-addressed negative draws
        s"""WITH $minhashCtes,
            ${verifiedPairCtes("documents")},
            pos AS (SELECT doc_a AS anchor, doc_b AS other FROM verified),
            pboth AS (SELECT anchor, other FROM pos
                      UNION ALL SELECT other, anchor FROM pos),
            ordx AS (SELECT doc_id, row_number() OVER (ORDER BY doc_id) - 1 AS ordinal
                     FROM documents),
            nn AS (SELECT count(*) AS n FROM documents),
            draw AS (SELECT a.anchor,
                ('0x' || substr(md5(a.anchor::VARCHAR || ':' || j::VARCHAR), 1, 15))::BIGINT
                  % n AS ordinal
              FROM (SELECT DISTINCT anchor FROM pos) a
              CROSS JOIN (SELECT unnest(range(1, 3)) AS j) js, nn),
            negs AS (SELECT DISTINCT d.anchor, o.doc_id AS other
              FROM draw d JOIN ordx o USING (ordinal)
              WHERE o.doc_id <> d.anchor
                AND NOT EXISTS (SELECT 1 FROM pboth p
                                WHERE p.anchor = d.anchor AND p.other = o.doc_id))
            SELECT anchor, other, 'pos' AS label FROM pos
            UNION ALL SELECT anchor, other, 'neg' AS label FROM negs
            ORDER BY anchor, label, other""",
      "q_seasonal_naive" -> // backtest join: actuals vs day-shifted actuals
        """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
                 sum(CAST(value AS DECIMAL(18,2))) AS v FROM events GROUP BY 1, 2),
             j AS (SELECT a.event_type, abs(a.v - f.v) AS ae
               FROM daily a JOIN daily f
                 ON a.event_type = f.event_type AND a.day = f.day + 7)
           SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
             round(CAST(sum(ae) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS mae
           FROM j GROUP BY event_type ORDER BY event_type""",
      "q_kaplan_meier" -> // exp of decimal-summed rounded ln terms; saturated tail -> 0
        """WITH o AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS us,
                 lag(epoch_ns(ts) // 1000) OVER (PARTITION BY user_id
                   ORDER BY epoch_ns(ts) // 1000, event_id) AS prev
               FROM events),
             f AS (SELECT event_id, user_id, us,
                 CASE WHEN prev IS NULL OR us - prev > 1800000000
                      THEN 1 ELSE 0 END AS nw FROM o),
             sq AS (SELECT user_id, us,
                 sum(nw) OVER (PARTITION BY user_id ORDER BY us, event_id
                   ROWS UNBOUNDED PRECEDING) AS session_seq FROM f),
             sess AS (SELECT user_id, session_seq, min(us) AS start_us,
                 max(us) AS end_us FROM sq GROUP BY user_id, session_seq),
             mx AS (SELECT max(end_us) AS m FROM sess),
             life AS (SELECT (end_us - start_us) // 60000000 AS t,
                 end_us > m - 1800000000 AS cens FROM sess, mx),
             tot AS (SELECT count(*) AS total FROM life),
             bt AS (SELECT t, count(*) AS ending,
                 sum(CASE WHEN NOT cens THEN 1 ELSE 0 END) AS d FROM life GROUP BY t),
             rk AS (SELECT t, d, total - coalesce(sum(ending) OVER (
                 ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS n_risk
               FROM bt, tot),
             ev AS (SELECT t, n_risk, d,
                 CASE WHEN d < n_risk THEN CAST(round(ln(1.0
                   - CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE)), 6)
                   AS DECIMAL(18,6)) END AS term
               FROM rk WHERE d > 0),
             cm AS (SELECT t, n_risk, d,
                 sum(term) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS cum
               FROM ev)
           SELECT t, CAST(n_risk AS BIGINT) AS n_risk, CAST(d AS BIGINT) AS d,
             CASE WHEN d = n_risk THEN 0.0
                  ELSE round(exp(CAST(cum AS DOUBLE)), 6) END AS survival
           FROM cm ORDER BY t""",
      "q_ab_test" -> // pooled two-proportion z from exact counts
        """WITH u AS (SELECT DISTINCT user_id FROM events),
             g AS (SELECT user_id,
                 CASE WHEN ('0x' || substr(md5(user_id::VARCHAR), 1, 8))::BIGINT % 2 = 0
                      THEN 'A' ELSE 'B' END AS grp FROM u),
             cv AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
             arms AS (SELECT grp, count(*) AS n,
                 sum(CASE WHEN cv.user_id IS NOT NULL THEN 1 ELSE 0 END) AS x
               FROM g LEFT JOIN cv USING (user_id) GROUP BY grp),
             w AS (SELECT max(CASE WHEN grp = 'A' THEN n END) AS n_a,
                 max(CASE WHEN grp = 'A' THEN x END) AS x_a,
                 max(CASE WHEN grp = 'B' THEN n END) AS n_b,
                 max(CASE WHEN grp = 'B' THEN x END) AS x_b FROM arms)
           SELECT CAST(n_a AS BIGINT) AS n_a, CAST(x_a AS BIGINT) AS x_a,
             CAST(n_b AS BIGINT) AS n_b, CAST(x_b AS BIGINT) AS x_b,
             round(CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE), 6) AS p_a,
             round(CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE), 6) AS p_b,
             CASE WHEN x_a + x_b > 0 AND x_a + x_b < n_a + n_b THEN
               round((CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE)
                   - CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE))
                 / sqrt((CAST(x_a + x_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
                   * (1.0 - CAST(x_a + x_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
                   * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))), 6)
             END AS z
           FROM w""",
      "q_benford" -> // integer-cent leading digit, no float formatting
        """WITH b AS (SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                 AS cents FROM orders
               WHERE CAST(o_totalprice AS DECIMAL(18,2)) * 100 > 0),
             c AS (SELECT substr(CAST(cents AS VARCHAR), 1, 1) AS digit,
                 count(*) AS n FROM b GROUP BY 1),
             t AS (SELECT count(*) AS t FROM b)
           SELECT digit, n,
             round(CAST(n AS DOUBLE) / CAST(t AS DOUBLE), 6) AS share,
             round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) AS benford,
             round(CAST(n AS DOUBLE) / CAST(t AS DOUBLE)
               - log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) AS deviation
           FROM c, t ORDER BY digit""",
      "q_null_semantics" -> // ANSI null traps, one certified row
        """WITH o AS (SELECT CASE WHEN o_orderkey % 97 = 0 THEN NULL
                                  ELSE o_orderkey END AS k,
                             CASE WHEN o_orderkey % 53 = 0 THEN NULL
                                  ELSE o_totalprice END AS v
                      FROM orders),
                p AS (SELECT CASE WHEN o_orderkey % 91 = 0 THEN NULL
                                  ELSE o_orderkey END AS k FROM orders)
           SELECT
             (SELECT count(*) FROM o) AS n_rows,
             (SELECT count(k) FROM o) AS n_k,
             (SELECT count(DISTINCT k) FROM o) AS n_distinct_k,
             (SELECT count(*) FROM o WHERE k IS NULL) AS n_null_k,
             (SELECT count(*) FROM o JOIN p ON o.k = p.k) AS n_join,
             (SELECT count(*) FROM o JOIN p ON o.k IS NOT DISTINCT FROM p.k)
               AS n_nullsafe_join,
             (SELECT count(*) FROM o WHERE k NOT IN (SELECT k FROM p)) AS n_not_in,
             (SELECT count(*) FROM o
                WHERE NOT EXISTS (SELECT 1 FROM p WHERE p.k = o.k)) AS n_not_exists,
             (SELECT CAST(sum(CAST(v AS DECIMAL(18,2))) AS DOUBLE) FROM o) AS sum_v,
             (SELECT count(*) FROM o WHERE v > 0 OR NOT (v > 0)) AS n_trichotomy""",
      "q_date_edges" -> // clamped month-add, leap days, ISO weeks on month-end rows
        """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d,
             CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS DATE) AS plus_month,
             last_day(CAST(o_orderdate AS DATE)) AS month_end,
             CAST(quarter(o_orderdate) AS BIGINT) AS q,
             CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week,
             CAST(dayofyear(o_orderdate) AS BIGINT) AS doy
           FROM orders WHERE day(CAST(o_orderdate AS DATE)) >= 29
           ORDER BY o_orderkey""",
      "q_cross_source_dups" -> // verified pairs rolled up per source pair
        s"""WITH $minhashCtes,
            ${verifiedPairCtes("documents")},
            sp AS (SELECT least(da.source, db.source) AS source_a,
                          greatest(da.source, db.source) AS source_b
                   FROM verified v
                   JOIN documents da ON v.doc_a = da.doc_id
                   JOIN documents db ON v.doc_b = db.doc_id)
            SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_dup_pairs
            FROM sp GROUP BY 1, 2 ORDER BY source_a, source_b""",
      // Exact prefix-filtered Jaccard join over word-trigram sets
      // (60-bit gram fingerprints, the sourceOverlap spelling). The
      // oracle mirrors the candidate algebra (prefix + length filter)
      // rather than brute-forcing all pairs; SetSimilaritySpec
      // carries the independent brute-force equivalence proof. The
      // positional filter is result-set-neutral (a pure candidate
      // prune) and is omitted here on purpose. jaccard ships
      // unrounded: BIGINT casts + one IEEE divide are bit-equal
      // across engines.
      "q_jaccard_join" -> jaccardJoinOracle,
      // persisted-set twin: identical math, engine side reads the
      // materialized set table — result is the same by construction
      "q_jaccard_persisted" -> jaccardJoinOracle,
      // LSH recall audit: the jaccard-join chain gives exact pairs;
      // minhash over the SAME fp rows (fp reduced mod P before the
      // multiply — 60-bit fp times a 30-bit coefficient would
      // overflow), banded at 2/4/8 bands; counts via subqueries stay
      // BIGINT; recall is an unrounded IEEE divide.
      "q_lsh_recall" -> {
        val p = Dedup.MinhashP
        val minCols = (0 until 16).map(i =>
          s"min(((fp % $p) * ${Dedup.aCoef(i)} + ${Dedup.bCoef(i)}) % $p) AS m$i")
          .mkString(", ")
        def bandCte(b: Int) = {
          val r = 16 / b
          val rows = (0 until b).map { j =>
            val cat = (j * r until (j + 1) * r).map(i => s"m$i::VARCHAR")
              .mkString(" || ',' || ")
            s"SELECT doc_id, $j AS band, md5($cat) AS band_hash FROM sig"
          }.mkString(" UNION ALL ")
          s"""b$b AS ($rows),
              cand$b AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
                         FROM b$b x JOIN b$b y USING (band, band_hash)
                         WHERE x.doc_id < y.doc_id)"""
        }
        val rows = Seq(2, 4, 8).map { b =>
          s"""SELECT $b AS bands,
               (SELECT count(*) FROM cand$b) AS n_candidates,
               (SELECT count(*) FROM exact) AS n_true_pairs,
               (SELECT count(*) FROM cand$b JOIN exact USING (doc_a, doc_b)) AS n_hit,
               (SELECT count(*) FROM cand$b JOIN exact USING (doc_a, doc_b))::DOUBLE /
                 (SELECT count(*) FROM exact) AS recall"""
        }.mkString(" UNION ALL ")
        s"""WITH $wordGramSetCtes,
            pfx AS (SELECT doc_id, fp, n FROM rk WHERE r <= n - ceil(0.5 * n) + 1),
            cdx AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                      a.n AS na, b.n AS nb
                    FROM pfx a JOIN pfx b USING (fp)
                    WHERE a.doc_id < b.doc_id
                      AND least(a.n, b.n) >= 0.5 * greatest(a.n, b.n)),
            ivx AS (SELECT c.doc_a, c.doc_b, c.na, c.nb, count(*) AS inter
                    FROM cdx c
                    JOIN tok ta ON ta.doc_id = c.doc_a
                    JOIN tok tb ON tb.doc_id = c.doc_b AND tb.fp = ta.fp
                    GROUP BY ALL),
            exact AS (SELECT doc_a, doc_b FROM ivx
                      WHERE inter >= 0.5 * (na + nb - inter)),
            sig AS (SELECT doc_id, $minCols FROM tok GROUP BY doc_id),
            ${bandCte(2)}, ${bandCte(4)}, ${bandCte(8)}
            SELECT * FROM ($rows) ORDER BY bands"""
      },
      // Asymmetric containment: one-sided prefix on the contained
      // side, full set rows on the container side.
      "q_containment" ->
        s"""WITH $wordGramSetCtes,
            pf AS (SELECT doc_id, fp, n FROM rk WHERE r <= n - ceil(0.8 * n) + 1),
            cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                       a.n AS na, b.n AS nb
                     FROM pf a JOIN rk b USING (fp)
                     WHERE a.doc_id <> b.doc_id AND b.n >= 0.8 * a.n),
            iv AS (SELECT c.doc_a, c.doc_b, c.na, c.nb, count(*) AS inter
                   FROM cand c
                   JOIN tok ta ON ta.doc_id = c.doc_a
                   JOIN tok tb ON tb.doc_id = c.doc_b AND tb.fp = ta.fp
                   GROUP BY ALL)
            SELECT doc_a AS doc_id, doc_b AS container_id, inter,
              inter::DOUBLE / na AS containment
            FROM iv WHERE inter >= 0.8 * na
            ORDER BY doc_id, container_id""",
      // Leakage-safe split: the q_dedup_docs keeper chain, then the
      // q_split hash boundaries applied to the KEEPER id (so every
      // member of a dedup cluster shares its keeper's split).
      "q_group_split" ->
        s"""WITH fp AS (SELECT doc_id, text, $fingerprint AS f FROM documents),
            g AS (SELECT f, min(doc_id) AS ek FROM fp GROUP BY f),
            wk AS (SELECT fp.doc_id, fp.text, g.ek FROM fp JOIN g ON fp.f = g.f),
            kd AS (SELECT doc_id, text FROM wk WHERE doc_id = ek),
            ${minhashCtesFrom("kd")},
            ${verifiedPairCtes("kd")},
            n AS (SELECT doc_b, min(doc_a) AS nk FROM verified GROUP BY doc_b),
            k AS (SELECT wk.doc_id,
                    CASE WHEN wk.ek <> wk.doc_id THEN wk.ek
                         ELSE COALESCE(n.nk, wk.doc_id) END AS keeper
                  FROM wk LEFT JOIN n ON wk.doc_id = n.doc_b)
            SELECT doc_id, CASE
              WHEN ('0x' || substr(md5(keeper::VARCHAR), 1, 8))::BIGINT % 10000 < 8000 THEN 'train'
              WHEN ('0x' || substr(md5(keeper::VARCHAR), 1, 8))::BIGINT % 10000 < 9000 THEN 'val'
              ELSE 'test' END AS split
            FROM k ORDER BY doc_id""",
      // Class balancing: every label's rows ranked by the portable
      // basis-point hash (id tiebreak), truncated at the min class
      // count.
      "q_class_balance" ->
        """WITH c AS (SELECT lang, count(*) AS cnt FROM documents GROUP BY lang),
           m AS (SELECT min(cnt) AS mc FROM c),
           r AS (SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
                   ORDER BY ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 10000,
                            doc_id) AS rn
                 FROM documents)
           SELECT doc_id, lang FROM r, m WHERE rn <= mc ORDER BY doc_id""",
      "q_dedup_docs" ->
        s"""WITH fp AS (SELECT doc_id, text, $fingerprint AS f FROM documents),
            g AS (SELECT f, min(doc_id) AS ek FROM fp GROUP BY f),
            wk AS (SELECT fp.doc_id, fp.text, g.ek FROM fp JOIN g ON fp.f = g.f),
            kd AS (SELECT doc_id, text FROM wk WHERE doc_id = ek),
            ${minhashCtesFrom("kd")},
            ${verifiedPairCtes("kd")},
            n AS (SELECT doc_b, min(doc_a) AS nk FROM verified GROUP BY doc_b)
            SELECT wk.doc_id,
              CASE WHEN wk.ek <> wk.doc_id THEN wk.ek
                   ELSE COALESCE(n.nk, wk.doc_id) END AS keeper_id,
              CASE WHEN wk.ek <> wk.doc_id THEN 'exact'
                   WHEN n.nk IS NOT NULL THEN 'near'
                   ELSE 'unique' END AS reason
            FROM wk LEFT JOIN n ON wk.doc_id = n.doc_b ORDER BY wk.doc_id""",
      "q_dedup_quality" -> // q_dedup_docs clusters + per-cluster argmax(n_chars, -id)
        s"""WITH fp AS (SELECT doc_id, text, $fingerprint AS f FROM documents),
            g AS (SELECT f, min(doc_id) AS ek FROM fp GROUP BY f),
            wk AS (SELECT fp.doc_id, fp.text, g.ek FROM fp JOIN g ON fp.f = g.f),
            kd AS (SELECT doc_id, text FROM wk WHERE doc_id = ek),
            ${minhashCtesFrom("kd")},
            ${verifiedPairCtes("kd")},
            n AS (SELECT doc_b, min(doc_a) AS nk FROM verified GROUP BY doc_b),
            a AS (SELECT wk.doc_id,
                    CASE WHEN wk.ek <> wk.doc_id THEN wk.ek
                         ELSE COALESCE(n.nk, wk.doc_id) END AS keeper_id
                  FROM wk LEFT JOIN n ON wk.doc_id = n.doc_b),
            sc AS (SELECT a.doc_id, a.keeper_id, d.n_chars
                   FROM a JOIN documents d ON a.doc_id = d.doc_id),
            r AS (SELECT keeper_id, doc_id AS best, row_number() OVER
                    (PARTITION BY keeper_id ORDER BY n_chars DESC, doc_id) AS rn
                  FROM sc)
            SELECT sc.doc_id, r.best AS keeper_id
            FROM sc JOIN r ON sc.keeper_id = r.keeper_id AND r.rn = 1
            ORDER BY sc.doc_id""",
      "q_dedup_docs_cc" ->
        s"""WITH RECURSIVE fp AS (SELECT doc_id, text, $fingerprint AS f FROM documents),
            g AS (SELECT f, min(doc_id) AS ek FROM fp GROUP BY f),
            wk AS (SELECT fp.doc_id, fp.text, g.ek FROM fp JOIN g ON fp.f = g.f),
            kd AS (SELECT doc_id, text FROM wk WHERE doc_id = ek),
            ${minhashCtesFrom("kd")},
            ${verifiedPairCtes("kd")},
            e AS (SELECT doc_a AS s, doc_b AS d FROM verified
                  UNION ALL SELECT doc_b AS s, doc_a AS d FROM verified),
            reach(doc, lab) AS (SELECT DISTINCT s, s FROM e
              UNION SELECT e.d, reach.lab FROM reach JOIN e ON reach.doc = e.s),
            roots AS (SELECT doc, min(lab) AS root FROM reach GROUP BY doc)
            SELECT wk.doc_id,
              COALESCE(r.root, wk.ek) AS keeper_id,
              CASE WHEN wk.doc_id <> wk.ek THEN 'exact'
                   WHEN r.root IS NOT NULL AND r.root <> wk.doc_id THEN 'near'
                   ELSE 'unique' END AS reason
            FROM wk LEFT JOIN roots r ON wk.ek = r.doc
            ORDER BY wk.doc_id""",
      "q_dedup_keep_best" -> // same clusters, argmax-quality keeper
        s"""WITH RECURSIVE fp AS (SELECT doc_id, text, $fingerprint AS f FROM documents),
            g AS (SELECT f, min(doc_id) AS ek FROM fp GROUP BY f),
            wk AS (SELECT fp.doc_id, fp.text, g.ek FROM fp JOIN g ON fp.f = g.f),
            kd AS (SELECT doc_id, text FROM wk WHERE doc_id = ek),
            ${minhashCtesFrom("kd")},
            ${verifiedPairCtes("kd")},
            e AS (SELECT doc_a AS s, doc_b AS d FROM verified
                  UNION ALL SELECT doc_b AS s, doc_a AS d FROM verified),
            reach(doc, lab) AS (SELECT DISTINCT s, s FROM e
              UNION SELECT e.d, reach.lab FROM reach JOIN e ON reach.doc = e.s),
            roots AS (SELECT doc, min(lab) AS root FROM reach GROUP BY doc),
            asn AS (SELECT wk.doc_id, COALESCE(r.root, wk.ek) AS cluster_id
                    FROM wk LEFT JOIN roots r ON wk.ek = r.doc),
            best AS (SELECT cluster_id, doc_id AS best_id FROM (
              SELECT a.cluster_id, a.doc_id,
                row_number() OVER (PARTITION BY a.cluster_id
                  ORDER BY dd.n_chars DESC, a.doc_id) AS rn
              FROM asn a JOIN documents dd ON a.doc_id = dd.doc_id)
              WHERE rn = 1)
            SELECT a.doc_id, a.cluster_id, b.best_id,
              CAST(CASE WHEN a.doc_id = b.best_id THEN 1 ELSE 0 END AS INTEGER) AS kept
            FROM asn a JOIN best b ON a.cluster_id = b.cluster_id
            ORDER BY a.doc_id""",
      "q_simhash" ->
        """WITH tok AS (SELECT doc_id,
             unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS t FROM documents),
           h AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 8))::BIGINT AS h FROM tok),
           bits AS (SELECT doc_id, r.j AS j,
             sum(CASE WHEN (h >> r.j) & 1 = 1 THEN 1 ELSE -1 END) AS s
             FROM h, range(0, 32) r(j) GROUP BY doc_id, r.j)
           SELECT doc_id,
             CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS simhash
           FROM bits GROUP BY doc_id ORDER BY doc_id""",
      "q_simhash_near" -> // q_simhash CTEs + 8-bit block equi-join + xor bit-count verify
        """WITH tok AS (SELECT doc_id,
             unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS t FROM documents),
           h AS (SELECT doc_id, ('0x' || substr(md5(t), 1, 8))::BIGINT AS h FROM tok),
           bits AS (SELECT doc_id, r.j AS j,
             sum(CASE WHEN (h >> r.j) & 1 = 1 THEN 1 ELSE -1 END) AS s
             FROM h, range(0, 32) r(j) GROUP BY doc_id, r.j),
           sh AS (SELECT doc_id,
             CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS simhash
             FROM bits GROUP BY doc_id),
           k AS (SELECT doc_id, simhash, b.b AS blk, (simhash >> (b.b * 8)) & 255 AS key
                 FROM sh, range(0, 4) b(b)),
           p AS (SELECT DISTINCT a.doc_id AS doc_a, x.doc_id AS doc_b,
                   a.simhash AS sa, x.simhash AS sb
                 FROM k a JOIN k x ON a.blk = x.blk AND a.key = x.key
                   AND a.doc_id < x.doc_id)
           SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS INTEGER) AS hamming
           FROM p WHERE bit_count(xor(sa, sb)) <= 3 ORDER BY doc_a, doc_b""",
      "q_budget_per_source" -> // per-group running sums are plain windows
        """WITH s AS (SELECT doc_id, source, CAST(n_chars AS DOUBLE) AS score,
                 CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
               FROM documents),
               o AS (SELECT doc_id, source, score, n_tokens,
                       sum(n_tokens) OVER (PARTITION BY source
                         ORDER BY score DESC, doc_id
                         ROWS UNBOUNDED PRECEDING) AS cum
                     FROM s)
           SELECT doc_id, source, score, n_tokens, CAST(cum AS BIGINT) AS cum_tokens
           FROM o WHERE cum <= 800 ORDER BY source, cum_tokens""",
      "q_budget_select" -> // the single-window spelling of the budget prefix sum
        """WITH s AS (SELECT doc_id, CAST(n_chars AS DOUBLE) AS score,
                 CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
               FROM documents),
               o AS (SELECT doc_id, score, n_tokens,
                       sum(n_tokens) OVER (ORDER BY score DESC, doc_id
                         ROWS UNBOUNDED PRECEDING) AS cum
                     FROM s)
           SELECT doc_id, score, n_tokens, CAST(cum AS BIGINT) AS cum_tokens
           FROM o WHERE cum <= 20000 ORDER BY cum_tokens""",
      "q_systematic_sample" -> // the single-window spelling of the ordinal primitive
        """WITH o AS (SELECT l_orderkey, l_linenumber,
                 row_number() OVER (ORDER BY l_orderkey, l_linenumber) - 1 AS ordinal
               FROM lineitem)
           SELECT l_orderkey, l_linenumber, CAST(ordinal AS BIGINT) AS ordinal
           FROM o WHERE ordinal % 100 = 0 ORDER BY ordinal""",
      "q_pack" -> // the sequential spelling of the distributed prefix sum
        """WITH s AS (SELECT doc_id,
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
             FROM documents),
           c AS (SELECT doc_id,
             COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
             FROM s)
           SELECT doc_id, CAST(before // 512 AS BIGINT) AS bin,
             CAST(before % 512 AS BIGINT) AS bin_offset
           FROM c ORDER BY doc_id""",
      "q_length_buckets" ->
        """WITH tc AS (SELECT doc_id,
             CAST(len(regexp_extract_all(text, '[\p{L}\p{N}]+|[^\p{L}\p{N}\s]')) AS BIGINT)
               AS n_tokens FROM documents)
           SELECT doc_id, n_tokens,
             CAST(CASE WHEN n_tokens <= 64 THEN 64 WHEN n_tokens <= 128 THEN 128
                       WHEN n_tokens <= 256 THEN 256 WHEN n_tokens <= 512 THEN 512
                       ELSE -1 END AS INTEGER) AS pad_to
           FROM tc ORDER BY doc_id""",
      "q_centroids" -> // zipped unnests; micro-unit BIGINT sums (order-independent)
        """WITH e AS (SELECT label,
             unnest([i for i in range(0, len(embedding))]) AS pos,
             unnest([round(x::DOUBLE * 1000000, 0)::BIGINT for x in embedding]) AS vm
             FROM embeddings)
           SELECT label, pos, count(*) AS n_vecs, CAST(sum(vm) AS BIGINT) AS sum_micro
           FROM e GROUP BY label, pos ORDER BY label, pos""",
      "q_quantize" -> // per-dim min/max grid; codes integral before ::INT
        """WITH s AS (SELECT pos, min(v) AS mn, max(v) AS mx FROM
                 (SELECT unnest([i for i in range(0, len(embedding))]) AS pos,
                         unnest(embedding) AS v FROM embeddings)
               GROUP BY pos),
               b AS (SELECT list(mn ORDER BY pos) AS mn, list(mx ORDER BY pos) AS mx FROM s),
               c AS (SELECT vec_id, embedding, mn, mx,
                       [CASE WHEN mx[i] = mn[i] THEN 0
                          ELSE round((embedding[i]::DOUBLE - mn[i]::DOUBLE) * 255
                            / (mx[i]::DOUBLE - mn[i]::DOUBLE), 0)::INTEGER END
                        for i in range(1, len(embedding)+1)] AS codes
                     FROM embeddings, b),
               f AS (SELECT vec_id, codes,
                 round(list_max(
                   [abs(mn[i]::DOUBLE + codes[i]::DOUBLE * (mx[i]::DOUBLE - mn[i]::DOUBLE) / 255
                      - embedding[i]::DOUBLE)
                    for i in range(1, len(embedding)+1)]), 6) AS max_abs_err
               FROM c)
           SELECT vec_id,
             unnest([i for i in range(0, len(codes))])::BIGINT AS pos,
             unnest(codes) AS code, max_abs_err
           FROM f ORDER BY vec_id, pos""",
      "q_pq_encode" -> // the grouped per-subspace replay of the q_kmeans oracle
        s"""WITH ${pqTrainCtes(4, 8)}
           SELECT vec_id, subspace, CAST(cell AS INTEGER) AS code,
             round(d, 6) AS dist2
           FROM a2 ORDER BY vec_id, subspace""",
      "q_pq_adc" -> pqAdcOracle,
      // persisted-index twin: identical ADC math, probe side reads the
      // materialized codes/codebooks — same oracle by construction
      // (the q_jaccard_persisted discipline)
      "q_pq_persisted" -> pqAdcOracle,
      "q_pq_recall" -> // ADC top-10 ∩ exact L2 top-10, one certified row;
        // m=16×k=16 (64-bit codes) — the production-shaped config, vs
        // the compact-code extreme certified by q_pq_encode/q_pq_adc
        s"""WITH ${pqTrainCtes(16, 16)},
               q AS (SELECT v AS qv FROM e WHERE vec_id = 1),
               qs AS (SELECT s.s AS subspace, q.qv[s.s*4+1 : (s.s+1)*4] AS qsv
                      FROM q, (SELECT unnest([${(0 until 16).mkString(", ")}]) AS s) s),
               pd AS (SELECT a2.vec_id, a2.subspace,
                        list_reduce([(qs.qsv[i] - m1.cvec[i]) * (qs.qsv[i] - m1.cvec[i])
                                     for i in range(1, len(qs.qsv)+1)],
                          (x, y) -> x + y) AS d
                      FROM a2
                      JOIN m1 ON m1.subspace = a2.subspace AND m1.cell = a2.cell
                      JOIN qs ON qs.subspace = a2.subspace),
               adc AS (SELECT vec_id,
                         list_reduce(list(d ORDER BY subspace), (x, y) -> x + y)
                           AS adc_raw
                       FROM pd GROUP BY vec_id),
               sel AS (SELECT vec_id FROM adc ORDER BY adc_raw, vec_id LIMIT 10),
               ex AS (SELECT e.vec_id,
                        list_reduce([(e.v[i] - q.qv[i]) * (e.v[i] - q.qv[i])
                                     for i in range(1, len(e.v)+1)],
                          (x, y) -> x + y) AS d
                      FROM e, q ORDER BY d, vec_id LIMIT 10)
           SELECT (SELECT count(*) FROM ex) AS n_exact,
             (SELECT count(*) FROM sel) AS n_adc,
             (SELECT count(*) FROM ex JOIN sel USING (vec_id)) AS n_hit,
             (SELECT count(*) FROM ex JOIN sel USING (vec_id))::DOUBLE /
               (SELECT count(*) FROM ex) AS recall""",
      "q_kmeans" -> // seeds=lowest ids; micro-sum updates; fold distances
        """WITH e AS (SELECT vec_id, [x::DOUBLE for x in embedding] AS v FROM embeddings),
               c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v AS cvec
                      FROM e ORDER BY vec_id LIMIT 8),
               a1 AS (SELECT vec_id, v, cell,
                        list_reduce([(v[i]-cvec[i])*(v[i]-cvec[i])
                                     for i in range(1, len(v)+1)], (x, y) -> x + y) AS d
                      FROM e, c0
                      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) = 1),
               m1p AS (SELECT cell, pos, count(*) AS n, sum(vm) AS s FROM
                         (SELECT cell,
                            unnest([i for i in range(0, len(v))]) AS pos,
                            unnest([round(x * 1000000, 0)::BIGINT for x in v]) AS vm
                          FROM a1)
                       GROUP BY cell, pos),
               m1 AS (SELECT cell, list(s::DOUBLE / n / 1000000.0 ORDER BY pos) AS cvec
                      FROM m1p GROUP BY cell),
               a2 AS (SELECT vec_id, cell,
                        list_reduce([(v[i]-cvec[i])*(v[i]-cvec[i])
                                     for i in range(1, len(v)+1)], (x, y) -> x + y) AS d
                      FROM e, m1
                      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) = 1)
           SELECT vec_id, CAST(cell AS INTEGER) AS cell, round(d, 6) AS dist2
           FROM a2 ORDER BY vec_id""",
      "q_semantic_dedup" -> // q_kmeans cells + within-cell cosine, one-hop min-id keeper
        """WITH e AS (SELECT vec_id, [x::DOUBLE for x in embedding] AS v FROM embeddings),
               c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v AS cvec
                      FROM e ORDER BY vec_id LIMIT 8),
               a1 AS (SELECT vec_id, v, cell,
                        list_reduce([(v[i]-cvec[i])*(v[i]-cvec[i])
                                     for i in range(1, len(v)+1)], (x, y) -> x + y) AS d
                      FROM e, c0
                      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) = 1),
               m1p AS (SELECT cell, pos, count(*) AS n, sum(vm) AS s FROM
                         (SELECT cell,
                            unnest([i for i in range(0, len(v))]) AS pos,
                            unnest([round(x * 1000000, 0)::BIGINT for x in v]) AS vm
                          FROM a1)
                       GROUP BY cell, pos),
               m1 AS (SELECT cell, list(s::DOUBLE / n / 1000000.0 ORDER BY pos) AS cvec
                      FROM m1p GROUP BY cell),
               a2 AS (SELECT vec_id, v, cell,
                        list_reduce([(v[i]-cvec[i])*(v[i]-cvec[i])
                                     for i in range(1, len(v)+1)], (x, y) -> x + y) AS d
                      FROM e, m1
                      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) = 1),
               nn AS (SELECT vec_id, cell, v,
                        sqrt(list_reduce([v[i]*v[i] for i in range(1, len(v)+1)],
                          (x, y) -> x + y)) AS nrm FROM a2),
               p AS (SELECT DISTINCT y.vec_id AS idb
                     FROM nn x JOIN nn y ON x.cell = y.cell AND x.vec_id < y.vec_id
                     WHERE list_reduce([x.v[i]*y.v[i] for i in range(1, len(x.v)+1)],
                             (q, w) -> q + w) / (x.nrm * y.nrm) >= 0.35)
           SELECT a2.vec_id, CAST(a2.cell AS INTEGER) AS cell, (p.idb IS NULL) AS keep
           FROM a2 LEFT JOIN p ON a2.vec_id = p.idb ORDER BY a2.vec_id""",
      "q_random_projection" -> { // JL planes as double literals (same trick as the LSH oracles)
        val comps = Similarity.projectionPlanes(64, 16, 7L).map { p =>
          val arr = p.map(_.toString).mkString("[", ", ", "]")
          s"round(${fold(s"[embedding[i]::DOUBLE * ($arr)[i] for i in range(1, len(embedding)+1)]")}, 6)"
        }.mkString("[", ",\n             ", "]")
        s"""WITH r AS (SELECT vec_id, $comps AS rvec FROM embeddings)
            SELECT vec_id,
              unnest([i for i in range(0, len(rvec))])::BIGINT AS pos,
              unnest(rvec) AS component
            FROM r ORDER BY vec_id, pos"""
      },
      "q_cosine_histogram" -> // same dot spelling as q_topk_cosine; 6-dp then bin
        s"""WITH p AS (SELECT a.embedding AS ea, b.embedding AS eb
              FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1),
            c AS (SELECT round(
                ${fold("[ea[i]::DOUBLE * eb[i]::DOUBLE for i in range(1, len(ea)+1)]")}
                  / (sqrt(${dotSelf("ea")}) * sqrt(${dotSelf("eb")})), 6) AS c
              FROM p)
            SELECT CAST(least(greatest(floor(c * 10), -10), 9) AS BIGINT) AS bin,
              CAST(count(*) AS BIGINT) AS n
            FROM c GROUP BY 1 ORDER BY bin""",
      "q_topk_cosine" ->
        s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 1),
            sc AS (SELECT vec_id,
              ${fold("[embedding[i]::DOUBLE * qv[i]::DOUBLE for i in range(1, len(embedding)+1)]")}
                / (sqrt(${dotSelf("embedding")}) * sqrt(${dotSelf("qv")})) AS c
              FROM embeddings, q)
            SELECT vec_id, round(c, 6) AS cosine_sim FROM sc
            ORDER BY c DESC, vec_id LIMIT 10""",
      "q_sql_topk" -> // same contract as q_topk_cosine, by design
        s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 1),
            sc AS (SELECT vec_id,
              ${fold("[embedding[i]::DOUBLE * qv[i]::DOUBLE for i in range(1, len(embedding)+1)]")}
                / (sqrt(${dotSelf("embedding")}) * sqrt(${dotSelf("qv")})) AS c
              FROM embeddings, q)
            SELECT vec_id, round(c, 6) AS cosine_sim FROM sc
            ORDER BY c DESC, vec_id LIMIT 10""",
      "q_knn_small" ->
        s"""WITH n AS (SELECT vec_id, embedding, sqrt(${dotSelf("embedding")}) AS nrm
              FROM embeddings WHERE vec_id < 100),
            p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
              ${fold("[a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE for i in range(1, len(a.embedding)+1)]")}
                / (a.nrm * b.nrm) AS c
              FROM n a, n b WHERE a.vec_id <> b.vec_id)
            SELECT id_a, id_b, round(c, 6) AS cosine_sim,
              CAST(row_number() OVER (PARTITION BY id_a ORDER BY c DESC, id_b) AS INTEGER) AS "rank"
            FROM p QUALIFY "rank" <= 5 ORDER BY id_a, "rank"""",
      "q_hard_negatives" -> // knn_small + labels, cross-label filter BEFORE ranking
        s"""WITH n AS (SELECT vec_id, label, embedding, sqrt(${dotSelf("embedding")}) AS nrm
              FROM embeddings WHERE vec_id < 100),
            p AS (SELECT a.vec_id AS id_a, a.label AS label_a,
              b.vec_id AS id_b, b.label AS label_b,
              ${fold("[a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE for i in range(1, len(a.embedding)+1)]")}
                / (a.nrm * b.nrm) AS c
              FROM n a, n b WHERE a.vec_id <> b.vec_id AND a.label <> b.label)
            SELECT id_a, label_a, id_b, label_b, round(c, 6) AS cosine_sim,
              CAST(row_number() OVER (PARTITION BY id_a ORDER BY c DESC, id_b) AS INTEGER) AS "rank"
            FROM p QUALIFY "rank" <= 5 ORDER BY id_a, "rank"""",
      "q_lsh_knn" -> lshKnnOracle(cap = 0),
      "q_lsh_knn_capped" -> lshKnnOracle(cap = 6),
      "q_lsh_knn_multi" -> // pairs bucketed under EITHER seed; UNION dedups
        s"""WITH t AS (SELECT vec_id, embedding, ${lshBucketExpr(42L)} AS b0,
                ${lshBucketExpr(43L)} AS b1 FROM embeddings),
            n AS (SELECT vec_id, embedding, b0, b1, sqrt(${dotSelf("embedding")}) AS nrm FROM t),
            p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, $pairCos AS c
                  FROM n a JOIN n b ON a.b0 = b.b0 AND a.vec_id <> b.vec_id
                  UNION
                  SELECT a.vec_id AS id_a, b.vec_id AS id_b, $pairCos AS c
                  FROM n a JOIN n b ON a.b1 = b.b1 AND a.vec_id <> b.vec_id)
            SELECT id_a, id_b, round(c, 6) AS cosine_sim,
              CAST(row_number() OVER (PARTITION BY id_a ORDER BY c DESC, id_b) AS INTEGER) AS "rank"
            FROM p QUALIFY "rank" <= 5 ORDER BY id_a, "rank"""",
      "q_dedup_embeddings" ->
        s"""WITH RECURSIVE ${lshNormCtes(0)},
            p AS (SELECT a.vec_id AS s, b.vec_id AS d, $pairCos AS c
              FROM n a JOIN n b USING (bucket) WHERE a.vec_id < b.vec_id),
            v AS (SELECT s, d FROM p WHERE c >= 0.3),
            e AS (SELECT s, d FROM v UNION ALL SELECT d AS s, s AS d FROM v),
            reach(doc, lab) AS (SELECT DISTINCT s, s FROM e
              UNION SELECT e.d, reach.lab FROM reach JOIN e ON reach.doc = e.s),
            roots AS (SELECT doc, min(lab) AS root FROM reach GROUP BY doc)
            SELECT em.vec_id, COALESCE(r.root, em.vec_id) AS keeper_id
            FROM embeddings em LEFT JOIN roots r ON em.vec_id = r.doc
            ORDER BY em.vec_id""",
      "q_image_meta" -> // expected dims stated FROM THE TABLE — certifies the byte parser
        """SELECT doc_id,
             CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'png'
                  WHEN 1 THEN 'gif' ELSE 'bmp' END AS format,
             CAST(n_chars % 1000 + 1 AS INTEGER) AS width,
             CAST(doc_id % 500 + 1 AS INTEGER) AS height
           FROM documents ORDER BY doc_id""",
      "q_audio_meta" -> // expected audio facts FROM the table — certifies parseWav
        """SELECT doc_id,
             CAST(8000 + (doc_id % 8) * 4000 AS INTEGER) AS sample_rate,
             CAST(1 + doc_id % 2 AS INTEGER) AS channels,
             CAST(16 AS INTEGER) AS bits,
             CAST(n_chars % 100000 AS BIGINT) AS n_samples,
             CAST((n_chars % 100000) * 1000 // (8000 + (doc_id % 8) * 4000) AS BIGINT)
               AS duration_ms
           FROM documents ORDER BY doc_id""",
      "q_video_meta" -> // expected video facts FROM the table — certifies the box walk
        """SELECT doc_id,
             CASE WHEN doc_id % 2 = 0 THEN 'isom' ELSE 'mp42' END AS brand,
             CAST(1000 * (1 + doc_id % 3) AS INTEGER) AS timescale_hz,
             CAST((n_chars % 1000000) * 1000 // (1000 * (1 + doc_id % 3)) AS BIGINT)
               AS duration_ms,
             CAST(16 + doc_id % 1905 AS INTEGER) AS width,
             CAST(16 + doc_id % 1065 AS INTEGER) AS height,
             CAST(1 AS INTEGER) AS n_tracks
           FROM documents ORDER BY doc_id""",
      "q_payload_meta" ->
        """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             sha256(text) AS payload_sha256
           FROM documents ORDER BY doc_id""",
      "q_decode_stub" ->
        """SELECT doc_id,
             CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
             CAST(64 + octet_length(encode(text)) % 512 AS INTEGER) AS width,
             CAST(64 + (octet_length(encode(text)) * 7) % 512 AS INTEGER) AS height,
             CAST(1 + octet_length(encode(text)) % 16 AS INTEGER) AS n_frames
           FROM documents WHERE text IS NOT NULL ORDER BY doc_id""",
      "q_frame_sample" ->
        """SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
             sha256(text || '#' || i::VARCHAR) AS frame_sha256
           FROM (SELECT doc_id, text,
                   unnest(range(0, 1 + octet_length(encode(text)) % 16)) AS i
                 FROM documents WHERE text IS NOT NULL)
           ORDER BY doc_id, frame_idx""")
  }
}
