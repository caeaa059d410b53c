package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.{Json, Scrub, Text}
import graft.multimodal.Multimodal
import graft.operators.{Anonymize, AsOf, Clustering, CorpusStats, Dedup, Fuzzy, Graph, Layout, Ngrams, Pack, Profile, Quality, Reports, Reshape, Sampling, SetSimilarity, Similarity, Skew, TopK, Windows}
import graft.sources.{Bucketing, Lake, Tables}
import graft.streaming.Sessions

/** Query registrations, part A: relational core, windows, dedup,
  * profiling, anonymization, ingest, streaming (SURVEY §2.1-2.10).
  * Mechanical split of [[SparkEntry.queries]]; see its scaladoc for
  * the determinism rules every entry follows. */
private[graft] object RegistryQueriesA {
  import Reg._

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
    // ORACLED since round 10 (late): the PORTABLE HLL build (fp60
    // registers + integer-exact estimator) replays bit-exactly in
    // DuckDB; the Spark-native approx_count_distinct twin
    // (approxDataDictionary) keeps its rsd laws in ProfileSpec
    "q_approx_dictionary" -> ((s, d) => Profile.portableHllDictionary(t(s, d, "orders"))),
    // ORACLED since round 10 (late): portable per-shard register
    // sketches -> max-merge -> integer-exact estimate, the whole
    // incremental lifecycle hash-certified; the Datasketches binary
    // twin (sketchDictionary) keeps its laws in ProfileSpec
    "q_sketch_dictionary" -> ((s, d) =>
      Profile.portableSketchDictionary(t(s, d, "orders"), "o_orderpriority",
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
      val dir = tempDir("graft_backfill")
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
    // the PARTITIONED incremental-JDBC semantics replayed on a parquet
    // mirror (S3/S4 at-scale form): watermark = max id of the landed
    // prefix, slice = ids above it (the pushed filter), each slice row
    // assigned the stride Spark's JDBC source would fetch it on
    // (Lake.strideIndex == JDBCRelation.columnPartition, pinned to a
    // live Derby read in LakeSpec) — per-stride row counts and id
    // ranges are the oracle-checkable contract of the striped read
    "q_jdbc_strides" -> ((s, d) => {
      val o = t(s, d, "orders").select(col("o_orderkey").cast("long").as("k"))
      val b = o.agg(max(col("k")).as("mx"))
        .select(col("mx"), expr("mx div 2").as("wm"))
      o.crossJoin(broadcast(b))
        .where(col("k") > col("wm"))
        .withColumn("__lo", col("wm") + 1)
        .withColumn("stride_id", Lake.strideIndex("k", "__lo", "mx", 8))
        .groupBy(col("stride_id"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("k")).as("min_key"), max(col("k")).as("max_key"))
        .orderBy(col("stride_id"))
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
      val dir = tempDir("graft_csvq")
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
      val dir = tempDir("graft_evo")
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
      val dir = tempDir("graft_part")
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
      val dir = tempDir("graft_jsonl")
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
      val dir = tempDir("graft_orc")
      Lake.writeOrc(t(s, d, "events"), dir)
      Lake.readOrc(s, dir)
        .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
          col("user_id"), col("event_type"), col("value"), col("props"))
        .orderBy(col("event_id"))
    }),
    "q_time_travel" -> ((s, d) => {
      val root = tempDir("graft_versions")
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
      val path = java.nio.file.Paths.get(tempDir("graft_upsert_kb"))
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
      val root = tempDir("graft_bjoin")
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
    // ORACLED since round 10: the portable fp60 CMS replays bit-exactly
    // in DuckDB (the q_dd_buckets playbook), so the whole
    // shard->merge->min-estimate lifecycle is hash-certified; the
    // Spark-native binary-sketch twin (cmsShards/cmsEstimates) keeps
    // its never-under + eps accuracy laws in ProfileSpec
    "q_cms_heavy_hitters" -> ((s, d) => {
      val toks = t(s, d, "documents").select(col("source"),
        explode(Text.tokens(lower(col("text")))).as("term"))
      Profile.cmsPortableEstimates(Profile.cmsPortableShards(toks, "source", "term"),
        Seq("join", "hash", "row", "batch", "scan", "column"))
    }),
    // DDSketch mergeable quantiles ([EXT]): relative-error p50/p90/p99
    // ORACLED since round 10 (late): the walk CERTIFICATE — per-key
    // rank + owning (sign, bucket) cell, next to the exact percentile
    // anchor — replays bit-exactly in DuckDB; only the 3-flop float
    // representative stays law-tested (ddQuantiles keeps the
    // self-priced estimate view as API, alpha laws in ProfileSpec)
    "q_dd_quantiles" -> ((s, d) =>
      Profile.ddQuantileWalk(t(s, d, "lineitem"), "l_returnflag", "l_extendedprice")),
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
      val root = tempDir("graft_ingest_e2e")
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
  )
}
