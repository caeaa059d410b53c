package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.{Json, Scrub, Text}
import graft.multimodal.Multimodal
import graft.operators.{Anonymize, AsOf, Clustering, CorpusStats, Dedup, Fuzzy, Graph, Layout, Ngrams, Pack, Profile, Quality, Reports, Reshape, Sampling, SetSimilarity, Similarity, Skew, TopK, Windows}
import graft.sources.{Bucketing, Lake, Tables}
import graft.streaming.Sessions

/** Oracle SQL, part A: relational/profiling/anonymization/ingest families.
  * Mechanical split of [[SparkEntry.oracleSql]]; column names/types
  * and ORDER BY are aligned pairwise with the matching query. */
private[graft] object RegistryOraclesA {
  import Reg._
  import OracleShared._

  def sql: Map[String, String] = Map(
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
      "q_customers_without_orders" -> // the since-cutoff keeps the
        // certified set NON-EMPTY at every gate scale (1 row at sf0.01,
        // 17 at sf0.1) — an anti-join certifying the empty set
        // certifies nothing
        """SELECT c_custkey, c_name FROM customer
           WHERE NOT EXISTS (SELECT 1 FROM orders
                             WHERE o_custkey = c_custkey
                               AND o_orderdate >= DATE '1997-01-01')
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
      "q_approx_dictionary" -> {
        // portable HLL: fp60 register table (idx = top 12 bits, rho =
        // leading-zero run of the low 48 + 1 via length(bin(rest))) and
        // the integer-exact estimator 7213000*m^3*2^49 // (10000*(1000m+1079)*S),
        // S = 2^49-scaled harmonic sum (exact integer); LC fallback
        // round(m*ln(m/V)) when raw <= 2.5m and V > 0
        val cols = Seq("o_custkey", "o_orderdate", "o_orderkey",
          "o_orderpriority", "o_orderstatus", "o_totalprice")
        val longSql = cols.map(c =>
          s"SELECT '$c' AS c, CAST($c AS VARCHAR) AS s FROM orders")
          .mkString(" UNION ALL ")
        s"""WITH long AS ($longSql),
           nulls AS (SELECT c, CAST(sum(CASE WHEN s IS NULL THEN 1 ELSE 0 END)
                 AS BIGINT) AS null_count FROM long GROUP BY c),
           h AS (SELECT c, ('0x' || substr(md5(s), 1, 15))::BIGINT AS h
             FROM long WHERE s IS NOT NULL),
           rr AS (SELECT c, h // 281474976710656 AS idx,
               h % 281474976710656 AS rest FROM h),
           rho AS (SELECT c, idx,
               CASE WHEN rest = 0 THEN 49 ELSE 49 - length(bin(rest)) END AS rho
             FROM rr),
           regs AS (SELECT c, idx, max(rho) AS mr FROM rho GROUP BY c, idx),
           pc AS (SELECT c, CAST(count(*) AS BIGINT) AS nz,
               CAST(sum(1::BIGINT << (49 - mr)) AS BIGINT) AS sp
             FROM regs GROUP BY c),
           je AS (SELECT nulls.c, nulls.null_count, coalesce(pc.nz, 0) AS nz,
               coalesce(pc.sp, 0) AS sp FROM nulls LEFT JOIN pc ON pc.c = nulls.c),
           sv AS (SELECT c, null_count, 4096 - nz AS V,
               sp + (4096 - nz) * (1::BIGINT << 49) AS S FROM je),
           fin AS (SELECT c, null_count, V,
               CAST('279039421980170247588980719616000'::HUGEINT //
                 (40970790000::HUGEINT * S::HUGEINT) AS BIGINT) AS raw
             FROM sv)
           SELECT c AS column_name, null_count,
             CASE WHEN raw * 2 <= 20480 AND V > 0
                  THEN CAST(floor(CAST(4096 AS DOUBLE) *
                    ln(CAST(4096 AS DOUBLE) / CAST(V AS DOUBLE)) + 0.5) AS BIGINT)
                  ELSE raw END AS approx_distinct_count
           FROM fin ORDER BY column_name"""
      },
      "q_sketch_dictionary" -> {
        // the incremental lifecycle replayed end-to-end: per-shard
        // register sketches -> max-merge across shards -> the same
        // integer-exact estimator as q_approx_dictionary
        val cols = Seq("o_custkey", "o_orderdate", "o_orderstatus")
        val longSql = cols.map(c =>
          s"SELECT CAST(o_orderpriority AS VARCHAR) AS shard, '$c' AS c, CAST($c AS VARCHAR) AS s FROM orders")
          .mkString(" UNION ALL ")
        val spineSql = cols.map(c => s"SELECT '$c' AS c").mkString(" UNION ALL ")
        s"""WITH long AS ($longSql),
           h AS (SELECT shard, c, ('0x' || substr(md5(s), 1, 15))::BIGINT AS h
             FROM long WHERE s IS NOT NULL),
           rr AS (SELECT shard, c, h // 281474976710656 AS idx,
               h % 281474976710656 AS rest FROM h),
           rho AS (SELECT shard, c, idx,
               CASE WHEN rest = 0 THEN 49 ELSE 49 - length(bin(rest)) END AS rho
             FROM rr),
           shards AS (SELECT shard, c, idx, max(rho) AS mr
             FROM rho GROUP BY shard, c, idx),
           merged AS (SELECT c, idx, max(mr) AS mr FROM shards GROUP BY c, idx),
           pc AS (SELECT c, CAST(count(*) AS BIGINT) AS nz,
               CAST(sum(1::BIGINT << (49 - mr)) AS BIGINT) AS sp
             FROM merged GROUP BY c),
           spine AS ($spineSql),
           je AS (SELECT spine.c, coalesce(pc.nz, 0) AS nz,
               coalesce(pc.sp, 0) AS sp FROM spine LEFT JOIN pc ON pc.c = spine.c),
           sv AS (SELECT c, 4096 - nz AS V,
               sp + (4096 - nz) * (1::BIGINT << 49) AS S FROM je),
           fin AS (SELECT c, V,
               CAST('279039421980170247588980719616000'::HUGEINT //
                 (40970790000::HUGEINT * S::HUGEINT) AS BIGINT) AS raw
             FROM sv)
           SELECT c AS column_name,
             CASE WHEN raw * 2 <= 20480 AND V > 0
                  THEN CAST(floor(CAST(4096 AS DOUBLE) *
                    ln(CAST(4096 AS DOUBLE) / CAST(V AS DOUBLE)) + 0.5) AS BIGINT)
                  ELSE raw END AS distinct_est
           FROM fin ORDER BY column_name"""
      },
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
      "q_quantile_monitor" -> // the stateful DDSketch monitor's certificate form:
        // per-key bucket counts with the certified index spelling, the value-ordered
        // cumulative walk, and the owning (sign, bucket) cell at ranks
        // floor(0.5*(n-1)) and floor(0.99*(n-1)) — all integer arithmetic
        """WITH vals AS (SELECT CAST(event_type AS VARCHAR) AS event_type,
                    CAST(value AS DOUBLE) AS v
                  FROM events WHERE value IS NOT NULL),
           b AS (SELECT event_type,
               CAST(CASE WHEN v = 0 THEN 0 WHEN v > 0 THEN 1
                    ELSE -1 END AS BIGINT) AS sign,
               CASE WHEN v = 0 THEN CAST(0 AS BIGINT)
                 ELSE CAST(ceil(ln(abs(v)) /
                   ln((CAST(1.0 AS DOUBLE) + CAST(0.01 AS DOUBLE)) /
                      (CAST(1.0 AS DOUBLE) - CAST(0.01 AS DOUBLE)))) AS BIGINT)
               END AS bucket,
               count(*) AS cnt
             FROM vals GROUP BY 1, 2, 3),
           w AS (SELECT event_type, sign, bucket, cnt,
               sum(cnt) OVER (PARTITION BY event_type ORDER BY sign, sign * bucket
                              ROWS UNBOUNDED PRECEDING) AS cum
             FROM b),
           r AS (SELECT event_type, CAST(sum(cnt) AS BIGINT) AS n,
               CAST(floor(0.5 * (sum(cnt) - 1)) AS BIGINT) AS rk50,
               CAST(floor(0.99 * (sum(cnt) - 1)) AS BIGINT) AS rk99
             FROM b GROUP BY 1),
           s50 AS (SELECT r.event_type, w.sign AS sign50, w.bucket AS bucket50
             FROM r JOIN w ON w.event_type = r.event_type
               AND w.cum > r.rk50 AND w.cum - w.cnt <= r.rk50),
           s99 AS (SELECT r.event_type, w.sign AS sign99, w.bucket AS bucket99
             FROM r JOIN w ON w.event_type = r.event_type
               AND w.cum > r.rk99 AND w.cum - w.cnt <= r.rk99)
           SELECT r.event_type, r.n, r.rk50, s50.sign50, s50.bucket50,
             r.rk99, s99.sign99, s99.bucket99
           FROM r JOIN s50 USING (event_type) JOIN s99 USING (event_type)
           ORDER BY r.event_type""",
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
      "q_jdbc_strides" -> // JDBCRelation.columnPartition (SPARK-34843 form,
        // pinned to live reads in LakeSpec): stride = span//n, lower
        // aligned up by (span%n + 1)//2, ends open. Slice keeps k >= lo
        // so k-lo-shift >= -shift: DuckDB floor-// and Spark truncating
        // div agree after the greatest(...,0) clamp
        """WITH b AS (SELECT max(o_orderkey) AS mx, max(o_orderkey) // 2 AS wm
                      FROM orders),
             s AS (SELECT o.o_orderkey AS k, b.wm + 1 AS lo,
                     (b.mx - (b.wm + 1)) // 8 AS stride,
                     (((b.mx - (b.wm + 1)) % 8) + 1) // 2 AS shift
                   FROM orders o, b WHERE o.o_orderkey > b.wm)
           SELECT CAST(least(greatest(CASE WHEN stride <= 0 THEN 0
                    ELSE (k - lo - shift) // stride END, 0), 7) AS INTEGER) AS stride_id,
             CAST(count(*) AS BIGINT) AS n_rows,
             min(k) AS min_key, max(k) AS max_key
           FROM s GROUP BY 1 ORDER BY stride_id""",
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
  )
}
