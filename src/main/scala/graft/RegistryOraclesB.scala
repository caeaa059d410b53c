package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.{Json, Scrub, Text}
import graft.multimodal.Multimodal
import graft.operators.{Anonymize, AsOf, Clustering, CorpusStats, Dedup, Fuzzy, Graph, Layout, Ngrams, Pack, Profile, Quality, Reports, Reshape, Sampling, SetSimilarity, Similarity, Skew, TopK, Windows}
import graft.sources.{Bucketing, Lake, Tables}
import graft.streaming.Sessions

/** Oracle SQL, part B: set ops, as-of/range joins, sampling, graph, streaming families.
  * Mechanical split of [[SparkEntry.oracleSql]]; column names/types
  * and ORDER BY are aligned pairwise with the matching query. */
private[graft] object RegistryOraclesB {
  import Reg._
  import OracleShared._

  def sql: Map[String, String] = Map(
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
      "q_dd_quantiles" -> // the DDSketch quantile WALK is integer arithmetic over the
        // certified bucket table: rebuild per-key (sign, bucket) counts with the
        // q_dd_buckets index spelling, order by value (sign, sign*bucket), take a
        // running sum, and the owning cell of rank floor(q*(n-1)) is the first with
        // cum > rank; the exact anchor rides the certified quantile_cont bridge
        """WITH vals AS (SELECT CAST(l_returnflag AS VARCHAR) AS key,
                    CAST(l_extendedprice AS DOUBLE) AS v
                  FROM lineitem WHERE l_extendedprice IS NOT NULL),
           b AS (SELECT key,
               CAST(CASE WHEN v = 0 THEN 0 WHEN v > 0 THEN 1
                    ELSE -1 END AS BIGINT) AS sign,
               CASE WHEN v = 0 THEN CAST(0 AS BIGINT)
                 ELSE CAST(ceil(ln(abs(v)) /
                   ln((CAST(1.0 AS DOUBLE) + CAST(0.01 AS DOUBLE)) /
                      (CAST(1.0 AS DOUBLE) - CAST(0.01 AS DOUBLE)))) AS BIGINT)
               END AS bucket,
               count(*) AS cnt
             FROM vals GROUP BY 1, 2, 3),
           w AS (SELECT key, sign, bucket, cnt,
               sum(cnt) OVER (PARTITION BY key ORDER BY sign, sign * bucket
                              ROWS UNBOUNDED PRECEDING) AS cum
             FROM b),
           tot AS (SELECT key, CAST(sum(cnt) AS BIGINT) AS n FROM b GROUP BY 1),
           qv AS (SELECT CAST(unnest([0.5, 0.9, 0.99]) AS DOUBLE) AS q),
           r AS (SELECT key, q, n,
               CAST(floor(q * (n - 1)) AS BIGINT) AS rk FROM tot, qv),
           sel AS (SELECT r.key, r.q, r.n, r.rk,
               w.sign AS est_sign, w.bucket AS est_bucket
             FROM r JOIN w ON w.key = r.key
               AND w.cum > r.rk AND w.cum - w.cnt <= r.rk),
           ex AS (SELECT key, CAST(0.5 AS DOUBLE) AS q,
                    quantile_cont(v, 0.5) AS exact FROM vals GROUP BY key
             UNION ALL SELECT key, CAST(0.9 AS DOUBLE),
                    quantile_cont(v, 0.9) FROM vals GROUP BY key
             UNION ALL SELECT key, CAST(0.99 AS DOUBLE),
                    quantile_cont(v, 0.99) FROM vals GROUP BY key)
           SELECT sel.key, sel.q, sel.n, sel.rk, sel.est_sign, sel.est_bucket,
             ex.exact
           FROM sel JOIN ex ON ex.key = sel.key AND ex.q = sel.q
           ORDER BY sel.key, sel.q""",
      "q_cms_heavy_hitters" -> // portable fp60 CMS: cell = fp60(row||':'||term) % 256,
        // shards merge by summation, estimate = min over the 4 hash rows —
        // identical IEEE-free integer arithmetic in both engines
        """WITH tok AS (SELECT source,
                 unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
               FROM documents),
             rows_ AS (SELECT unnest(range(0, 4)) AS row),
             sk AS (SELECT source AS shard, rows_.row AS row,
                 ('0x' || substr(md5(concat(rows_.row, ':', term)), 1, 15))::BIGINT
                   % 256 AS cell,
                 CAST(count(*) AS BIGINT) AS cnt
               FROM tok, rows_ GROUP BY 1, 2, 3),
             cells AS (SELECT row, cell, CAST(sum(cnt) AS BIGINT) AS cnt
               FROM sk GROUP BY 1, 2),
             probes AS (SELECT unnest(['join','hash','row','batch','scan','column'])
               AS term),
             pc AS (SELECT term, rows_.row AS row,
                 ('0x' || substr(md5(concat(rows_.row, ':', term)), 1, 15))::BIGINT
                   % 256 AS cell
               FROM probes, rows_)
           SELECT pc.term, CAST(min(coalesce(cells.cnt, 0)) AS BIGINT) AS cms_est
           FROM pc LEFT JOIN cells USING (row, cell)
           GROUP BY pc.term ORDER BY pc.term""",
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
      "q_bpe_segment" -> { // the greedy mergeFold apply path replayed as
        // a separator-wrapped replace chain: each symbol is wrapped
        // chr(1)·sym·chr(1) (symbols never contain the control char),
        // so one merge (a, b) is ONE non-overlapping left-to-right
        // replace of wrap(a)||wrap(b) with wrap(ab) — matches share no
        // characters (each symbol carries its own separators), which is
        // exactly the fold's greedy semantics, fresh merges never
        // re-merging within a pass. The 12-merge list is
        // Bpe.fixtureMerges — the SAME pure-JVM derivation the
        // registered query calls. Token count = separator count / 2.
        val sep = "chr(1)"
        def wrap(sym: String): String =
          s"$sep || '${sym.replace("'", "''")}' || $sep"
        val seeded = s"$sep || array_to_string(" +
          s"[word[i] for i in range(1, len(word)+1)], $sep || $sep) || $sep"
        val chain = graft.operators.Bpe.fixtureMerges(12)
          .foldLeft(seeded) { case (acc, (a, b)) =>
            s"replace($acc, ${wrap(a)} || ${wrap(b)}, ${wrap(a + b)})"
          }
        s"""WITH w AS (SELECT doc_id,
                 unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS word
               FROM documents),
             seg AS (SELECT doc_id, $chain AS s FROM w
                     WHERE len(word) > 0 AND NOT contains(word, chr(1))),
             pd AS (SELECT doc_id,
                      CAST(sum((len(s) - len(replace(s, chr(1), ''))) // 2) AS BIGINT) AS n
                    FROM seg GROUP BY doc_id)
           SELECT d.doc_id, coalesce(pd.n, 0) AS n_bpe_tokens
           FROM documents d LEFT JOIN pd USING (doc_id) ORDER BY doc_id"""
      },
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
      "q_jaro_capped" -> // the maxBlock cap replayed as a HAVING filter on block size;
        // same planted 40-name hot block as the Spark side
        """WITH src AS (SELECT p_name AS name FROM part WHERE p_name IS NOT NULL
                        UNION ALL
                        SELECT 'zzhot variant ' || p_partkey FROM part
                        WHERE p_partkey <= 40),
               n AS (SELECT DISTINCT name FROM src),
               b AS (SELECT name, split_part(name, ' ', 1) AS blk FROM n
                     WHERE split_part(name, ' ', 1) IS NOT NULL),
               keep AS (SELECT blk FROM b GROUP BY blk HAVING count(*) <= 30),
               k AS (SELECT b.name, b.blk FROM b JOIN keep USING (blk))
           SELECT x.name AS name_a, y.name AS name_b,
             jaro_winkler_similarity(x.name, y.name) AS sim
           FROM k x JOIN k y ON x.blk = y.blk AND x.name < y.name
           WHERE jaro_winkler_similarity(x.name, y.name) >= 0.85
           ORDER BY name_a, name_b""",
      "q_dropped_blocks" -> // the cap's observability surface: exactly the planted block
        """WITH src AS (SELECT p_name AS name FROM part WHERE p_name IS NOT NULL
                        UNION ALL
                        SELECT 'zzhot variant ' || p_partkey FROM part
                        WHERE p_partkey <= 40),
               n AS (SELECT DISTINCT name FROM src),
               b AS (SELECT split_part(name, ' ', 1) AS blk FROM n
                     WHERE split_part(name, ' ', 1) IS NOT NULL)
           SELECT blk AS block_key, CAST(count(*) AS BIGINT) AS n_members
           FROM b GROUP BY blk HAVING count(*) > 30
           ORDER BY block_key""",
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
  )
}
