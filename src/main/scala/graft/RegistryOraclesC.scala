package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.{Json, Scrub, Text}
import graft.multimodal.Multimodal
import graft.operators.{Anonymize, AsOf, Clustering, CorpusStats, Dedup, Fuzzy, Graph, Layout, Ngrams, Pack, Profile, Quality, Reports, Reshape, Sampling, SetSimilarity, Similarity, Skew, TopK, Windows}
import graft.sources.{Bucketing, Lake, Tables}
import graft.streaming.Sessions

/** Oracle SQL, part C: stats battery, corpus hygiene, dedup/similarity, multimodal families.
  * Mechanical split of [[SparkEntry.oracleSql]]; column names/types
  * and ORDER BY are aligned pairwise with the matching query. */
private[graft] object RegistryOraclesC {
  import Reg._
  import OracleShared._

  // the COMPOSED versioned-streaming corpus, shared by
  // q_stream_index_versioned and q_stream_pq_versioned: what the
  // retrained generation 2 actually trains on — the bootstrap third ∪
  // the clean appended third unscaled, the drifted third scaled 3×
  // (scale rides double arithmetic cast back to REAL, matching the
  // float column the index stores appended batches in)
  private val svStreamSrc: String =
    """(SELECT vec_id, embedding FROM embeddings WHERE vec_id % 3 < 2
        UNION ALL
        SELECT vec_id, [CAST(x::DOUBLE * 3.0 AS REAL) for x in embedding] AS embedding
        FROM embeddings WHERE vec_id % 3 = 2) sv_src"""

  // the scaled probe vector of the composed rows: vec_id=2 is a member
  // of the drifted third (2 % 3 = 2) — rows the bootstrap never saw
  private val svQuerySelect: String =
    """SELECT [CAST(x::DOUBLE * 3.0 AS REAL)::DOUBLE for x in embedding] AS qv
       FROM embeddings WHERE vec_id = 2"""

  // PQ incremental maintenance replayed from scratch, shared by
  // q_pq_append and q_pq_compact: train on the even half (pqTrainCtes
  // over a filtered source), frozen-encode the odd half against m1
  // (the pqEncodeFrozen spelling — exact argmin, k=8 under the bound),
  // union the codes, ADC probe for the APPENDED query vec_id=1
  private val pqAppendProbeOracle: String = {
    val dist = "list_reduce([(sv[i]-cvec[i])*(sv[i]-cvec[i]) " +
      "for i in range(1, len(sv)+1)], (x, y) -> x + y)"
    s"""WITH ${pqTrainCtes(4, 8,
          "(SELECT * FROM embeddings WHERE vec_id % 2 = 0) pq_base")},
         ne AS (SELECT vec_id, [x::DOUBLE for x in embedding] AS v
                FROM embeddings WHERE vec_id % 2 = 1),
         nsl AS (SELECT vec_id, s.s AS subspace, v[s.s*16+1 : (s.s+1)*16] AS sv
                 FROM ne, (SELECT unnest([0, 1, 2, 3]) AS s) s),
         na AS (SELECT nsl.vec_id, nsl.subspace, m1.cell, $dist AS d
                FROM nsl JOIN m1 ON m1.subspace = nsl.subspace
                QUALIFY row_number() OVER (PARTITION BY nsl.vec_id, nsl.subspace
                  ORDER BY d, m1.cell) = 1),
         allc AS (SELECT vec_id, subspace, cell FROM a2
                  UNION ALL SELECT vec_id, subspace, cell FROM na),
         q AS (SELECT [x::DOUBLE for x in embedding] AS v
               FROM embeddings WHERE vec_id = 1),
         qs AS (SELECT s.s AS subspace, q.v[s.s*16+1 : (s.s+1)*16] AS qsv
                FROM q, (SELECT unnest([0, 1, 2, 3]) AS s) s),
         pd AS (SELECT allc.vec_id, allc.subspace,
                  list_reduce([(qs.qsv[i] - m1.cvec[i]) * (qs.qsv[i] - m1.cvec[i])
                               for i in range(1, len(qs.qsv)+1)],
                    (x, y) -> x + y) AS d
                FROM allc
                JOIN m1 ON m1.subspace = allc.subspace AND m1.cell = allc.cell
                JOIN qs ON qs.subspace = allc.subspace),
         adc AS (SELECT vec_id,
                   list_reduce(list(d ORDER BY subspace), (x, y) -> x + y)
                     AS adc_raw
                 FROM pd GROUP BY vec_id),
         sel AS (SELECT vec_id, adc_raw FROM adc
                 ORDER BY adc_raw, vec_id LIMIT 10)
       SELECT vec_id, round(adc_raw, 6) AS adc_dist2
       FROM sel ORDER BY adc_raw, vec_id"""
  }

  // IVF-PQ replayed from scratch, shared by q_ivfpq_topk and
  // q_ivfpq_persisted (identical by construction — the bucketed
  // on-disk layout changes IO, never arithmetic): two-level training
  // (prefix "t" — the q_two_level_topk spelling), per-vector residuals
  // v − fine-centroid (exact double subtraction on both engines), ONE
  // shared PQ codebook set trained on all residuals (pqTrainCtes over
  // the residual relation — seeds by lowest vec_id, grouped micro-sum
  // Lloyd, exact argmin at k=8), then the IVFADC probe: rank the
  // k1·k2 fine centroids for the query (ties on combined cell id),
  // take nprobe=4 cells, per-cell residual query → per-cell m·k LUT,
  // ADC partials fold in subspace order, top-10 on (adc, vec_id).
  // the residual relation both IVF-PQ oracles train PQ codebooks on:
  // every vector minus its winning fine centroid (exact double
  // subtraction on both engines)
  private val ivfPqResidSrc: String =
    """(SELECT f2.vec_id,
          [f2.v[i] - fm.cvec[i] for i in range(1, len(f2.v)+1)] AS embedding
        FROM tf2 f2 JOIN tfm1 fm
          ON fm.cell1 = f2.cell1 AND fm.cell = f2.fine) resid_src"""

  private val ivfPqOracle: String = {
    val residSrc = ivfPqResidSrc
    s"""WITH ${twoLevelCtes(4, 4, "t")},
           ${pqTrainCtes(4, 8, residSrc)},
           cbl AS (SELECT cell1 * 4 + cell AS cell, cvec FROM tfm1),
           q AS (SELECT [x::DOUBLE for x in embedding] AS qv
                 FROM embeddings WHERE vec_id = 1),
           cd AS (SELECT cbl.cell,
                    list_reduce([(cbl.cvec[i]-q.qv[i])*(cbl.cvec[i]-q.qv[i])
                                 for i in range(1, len(cbl.cvec)+1)],
                      (x, y) -> x + y) AS d
                  FROM cbl, q),
           pc AS (SELECT cell FROM cd ORDER BY d, cell LIMIT 4),
           qr AS (SELECT cbl.cell,
                    [q.qv[i] - cbl.cvec[i] for i in range(1, len(cbl.cvec)+1)] AS rv
                  FROM cbl JOIN pc USING (cell) CROSS JOIN q),
           qs AS (SELECT qr.cell, s.s AS subspace,
                    qr.rv[s.s*16+1 : (s.s+1)*16] AS qsv
                  FROM qr, (SELECT unnest([0, 1, 2, 3]) AS s) s),
           vc AS (SELECT vec_id, cell1 * 4 + fine AS cell FROM tf2),
           pd AS (SELECT a2.vec_id, a2.subspace,
                    list_reduce([(qs.qsv[i] - m1.cvec[i]) * (qs.qsv[i] - m1.cvec[i])
                                 for i in range(1, len(qs.qsv)+1)],
                      (x, y) -> x + y) AS d
                  FROM a2
                  JOIN vc ON vc.vec_id = a2.vec_id
                  JOIN qs ON qs.subspace = a2.subspace AND qs.cell = vc.cell
                  JOIN m1 ON m1.subspace = a2.subspace AND m1.cell = a2.cell),
           adc AS (SELECT vec_id,
                     list_reduce(list(d ORDER BY subspace), (x, y) -> x + y)
                       AS adc_raw
                   FROM pd GROUP BY vec_id),
           sel AS (SELECT vec_id, adc_raw FROM adc
                   ORDER BY adc_raw, vec_id LIMIT 10)
       SELECT vec_id, round(adc_raw, 6) AS adc_dist2
       FROM sel ORDER BY adc_raw, vec_id"""
  }

  def sql: Map[String, String] = Map(
      "q_ivfpq_topk" -> ivfPqOracle,
      "q_ivfpq_persisted" -> ivfPqOracle,
      "q_ivfpq_knn_multi" -> // ivfPqOracle's probe replayed PER QUERY
        // (vec_ids 1, 7, 13): per-query coarse ranking (ties on
        // combined cell id), per-query residual-query slices over its
        // nprobe cells, per-query ADC fold in subspace order,
        // per-query (adc asc, vec_id) rank — the batched Spark plan
        // (ONE bucket-pruned pass, broadcast per-(query, cell) LUTs)
        // and Q sequential ivfPqTopK probes are the same arithmetic by
        // construction
        s"""WITH ${twoLevelCtes(4, 4, "t")},
             ${pqTrainCtes(4, 8, ivfPqResidSrc)},
             cbl AS (SELECT cell1 * 4 + cell AS cell, cvec FROM tfm1),
             q AS (SELECT vec_id AS query_id, [x::DOUBLE for x in embedding] AS qv
                   FROM embeddings WHERE vec_id IN (1, 7, 13)),
             cd AS (SELECT q.query_id, cbl.cell,
                      list_reduce([(cbl.cvec[i]-q.qv[i])*(cbl.cvec[i]-q.qv[i])
                                   for i in range(1, len(cbl.cvec)+1)],
                        (x, y) -> x + y) AS d
                    FROM cbl, q),
             pc AS (SELECT query_id, cell FROM cd
                    QUALIFY row_number() OVER (PARTITION BY query_id
                      ORDER BY d, cell) <= 4),
             qr AS (SELECT pc.query_id, pc.cell,
                      [q.qv[i] - cbl.cvec[i] for i in range(1, len(cbl.cvec)+1)] AS rv
                    FROM pc JOIN cbl ON cbl.cell = pc.cell
                    JOIN q ON q.query_id = pc.query_id),
             qs AS (SELECT qr.query_id, qr.cell, s.s AS subspace,
                      qr.rv[s.s*16+1 : (s.s+1)*16] AS qsv
                    FROM qr, (SELECT unnest([0, 1, 2, 3]) AS s) s),
             vc AS (SELECT vec_id, cell1 * 4 + fine AS cell FROM tf2),
             pd AS (SELECT qs.query_id, a2.vec_id, a2.subspace,
                      list_reduce([(qs.qsv[i] - m1.cvec[i]) * (qs.qsv[i] - m1.cvec[i])
                                   for i in range(1, len(qs.qsv)+1)],
                        (x, y) -> x + y) AS d
                    FROM a2
                    JOIN vc ON vc.vec_id = a2.vec_id
                    JOIN qs ON qs.subspace = a2.subspace AND qs.cell = vc.cell
                    JOIN m1 ON m1.subspace = a2.subspace AND m1.cell = a2.cell),
             adc AS (SELECT query_id, vec_id,
                       list_reduce(list(d ORDER BY subspace), (x, y) -> x + y)
                         AS adc_raw
                     FROM pd GROUP BY query_id, vec_id),
             sel AS (SELECT query_id, vec_id, adc_raw,
                       CAST(row_number() OVER (PARTITION BY query_id
                         ORDER BY adc_raw, vec_id) AS INTEGER) AS "rank"
                     FROM adc QUALIFY "rank" <= 10)
           SELECT query_id, vec_id, round(adc_raw, 6) AS adc_dist2, "rank"
           FROM sel ORDER BY query_id, "rank"""",
      "q_maintenance_cycle" -> // the poll-driven cycle gates the SAME
        // final state the composed row certifies: v2 trained on the
        // full streamed corpus, probed for the scaled drifted vector
        twoLevelProbeSqlOn(twoLevelCtes(4, 4, "", svStreamSrc), svQuerySelect),
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
      "q_drop_audit" -> // minhash hot buckets (cap 3) UNION fuzzy hot blocks (cap 30)
        // UNION semantic k-means cells (cap 50) — one normalized
        // (family, drop_key, n_members) audit surface
        s"""WITH ${minhashCtesFrom("documents")},
            bsz AS (SELECT band, band_hash, count(*) AS n
                    FROM b GROUP BY band, band_hash),
            bdrop AS (SELECT 'minhash_bucket' AS family,
                        concat(band, ':', band_hash) AS drop_key,
                        CAST(n AS BIGINT) AS n_members
                      FROM bsz WHERE n > 3),
            fsrc AS (SELECT p_name AS name FROM part WHERE p_name IS NOT NULL
                     UNION ALL
                     SELECT 'zzhot variant ' || p_partkey FROM part
                     WHERE p_partkey <= 40),
            fn AS (SELECT DISTINCT name FROM fsrc),
            fb AS (SELECT split_part(name, ' ', 1) AS blk FROM fn
                   WHERE split_part(name, ' ', 1) IS NOT NULL),
            fdrop AS (SELECT 'fuzzy_block' AS family, blk AS drop_key,
                        CAST(count(*) AS BIGINT) AS n_members
                      FROM fb GROUP BY blk HAVING count(*) > 30),
            $lloyd2Ctes,
            cdrop AS (SELECT 'semantic_cell' AS family,
                        CAST(cell AS VARCHAR) AS drop_key,
                        CAST(count(*) AS BIGINT) AS n_members
                      FROM a2 GROUP BY cell HAVING count(*) > 50),
            ${twoLevelCtes(4, 4, "t")},
            tdrop AS (SELECT 'two_level_cell' AS family,
                        CAST(cell1 * 4 + fine AS VARCHAR) AS drop_key,
                        CAST(count(*) AS BIGINT) AS n_members
                      FROM tf2 GROUP BY cell1, fine HAVING count(*) > 40)
            SELECT family, drop_key, n_members
            FROM (SELECT * FROM bdrop UNION ALL SELECT * FROM fdrop
                  UNION ALL SELECT * FROM cdrop UNION ALL SELECT * FROM tdrop)
            ORDER BY family, drop_key""",
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
      "q_lsh_recall" -> lshRecallOracle(wordGramSetCtes),
      // the runbook form: the SAME audit over the deterministic
      // fp60-smallest-2000 sample — absolutely bounded at any corpus
      // size, and still fully oracle-replayable (the sample is an
      // ORDER BY portable-hash LIMIT both engines compute identically)
      "q_lsh_recall_sampled" -> lshRecallOracle(
        s"""smp AS (SELECT doc_id, text FROM documents
                    ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT,
                      doc_id
                    LIMIT 2000),
            ${wordGramSetCtesFrom("smp")}"""),
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
      "q_pq_append" -> pqAppendProbeOracle,
      "q_pq_compact" -> // PQ compaction certified by IDENTITY (the
        // q_two_level_compact discipline): the Spark side rewrites the
        // fragmented codes dir before probing, and the replay is
        // q_pq_append's oracle verbatim — file layout must never reach
        // the answer
        pqAppendProbeOracle,
      "q_stream_index_versioned" -> // the COMPOSED arc replayed from
        // scratch: generation 2 trains on the FULL streamed corpus
        // (exactly what twoLevelRetrain reads back from v1's own table
        // after bootstrap + both appends), then the standard two-level
        // probe for the scaled, drifted-batch vec_id=2
        twoLevelProbeSqlOn(twoLevelCtes(4, 4, "", svStreamSrc), svQuerySelect),
      "q_stream_pq_versioned" -> // the PQ composed arc replayed from
        // scratch: generation 2's codebooks train on the full streamed
        // corpus (the caller's CURRENT upstream — PQ codes are lossy),
        // then the standard ADC probe for the scaled vec_id=2
        s"""WITH ${pqTrainCtes(4, 8, svStreamSrc)},
               q AS ($svQuerySelect),
               qq AS (SELECT qv AS v FROM q),
               qs AS (SELECT s.s AS subspace, qq.v[s.s*16+1 : (s.s+1)*16] AS qsv
                      FROM qq, (SELECT unnest([0, 1, 2, 3]) AS s) s),
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
           FROM sel ORDER BY adc_raw, vec_id""",
      // persisted-index twin: identical ADC math, probe side reads the
      // materialized codes/codebooks — same oracle by construction
      // (the q_jaccard_persisted discipline)
      "q_pq_persisted" -> pqAdcOracle,
      "q_pq_knn_multi" -> // the pqAdcOracle probe replayed PER QUERY
        // (vec_ids 1, 7, 13): per-query slice table, per-query ADC fold
        // in subspace order, per-query (adc asc, vec_id) rank — the
        // batched Spark plan (ONE pass over the codes, broadcast LUT)
        // and Q sequential pqTopK probes are the same arithmetic by
        // construction
        s"""WITH ${pqTrainCtes(4, 8)},
             q AS (SELECT vec_id AS query_id, v FROM e WHERE vec_id IN (1, 7, 13)),
             qs AS (SELECT q.query_id, s.s AS subspace,
                      q.v[s.s*16+1 : (s.s+1)*16] AS qsv
                    FROM q, (SELECT unnest([0, 1, 2, 3]) AS s) s),
             pd AS (SELECT qs.query_id, a2.vec_id, a2.subspace,
                      list_reduce([(qs.qsv[i] - m1.cvec[i]) * (qs.qsv[i] - m1.cvec[i])
                                   for i in range(1, len(qs.qsv)+1)],
                        (x, y) -> x + y) AS d
                    FROM a2
                    JOIN m1 ON m1.subspace = a2.subspace AND m1.cell = a2.cell
                    JOIN qs ON qs.subspace = a2.subspace),
             adc AS (SELECT query_id, vec_id,
                       list_reduce(list(d ORDER BY subspace), (x, y) -> x + y)
                         AS adc_raw
                     FROM pd GROUP BY query_id, vec_id),
             sel AS (SELECT query_id, vec_id, adc_raw,
                       CAST(row_number() OVER (PARTITION BY query_id
                         ORDER BY adc_raw, vec_id) AS INTEGER) AS "rank"
                     FROM adc QUALIFY "rank" <= 10)
           SELECT query_id, vec_id, round(adc_raw, 6) AS adc_dist2, "rank"
           FROM sel ORDER BY query_id, "rank"""",
      "q_pq_drift" -> { // the PQ retrain-trigger signal replayed: the
        // even-half training's exact per-(subspace, codeword) dist2
        // baseline vs the odd half frozen-encoded against m1 (the
        // q_pq_append na spelling), pooled under the decimal-sum
        // discipline, FULL joined so codewords only one side uses
        // still reach the trigger
        val dist = "list_reduce([(sv[i]-cvec[i])*(sv[i]-cvec[i]) " +
          "for i in range(1, len(sv)+1)], (x, y) -> x + y)"
        s"""WITH ${pqTrainCtes(4, 8,
              "(SELECT * FROM embeddings WHERE vec_id % 2 = 0) pq_base")},
             ne AS (SELECT vec_id, [x::DOUBLE for x in embedding] AS v
                    FROM embeddings WHERE vec_id % 2 = 1),
             nsl AS (SELECT vec_id, s.s AS subspace, v[s.s*16+1 : (s.s+1)*16] AS sv
                     FROM ne, (SELECT unnest([0, 1, 2, 3]) AS s) s),
             na AS (SELECT nsl.vec_id, nsl.subspace, m1.cell, $dist AS d
                    FROM nsl JOIN m1 ON m1.subspace = nsl.subspace
                    QUALIFY row_number() OVER (PARTITION BY nsl.vec_id, nsl.subspace
                      ORDER BY d, m1.cell) = 1),
             b AS (SELECT subspace, cell AS code, CAST(count(*) AS BIGINT) AS n_base,
                     sum(CAST(round(d, 6) AS DECIMAL(18,6))) AS bs
                   FROM a2 GROUP BY 1, 2),
             a AS (SELECT subspace, cell AS code, CAST(count(*) AS BIGINT) AS n_new,
                     sum(CAST(round(d, 6) AS DECIMAL(18,6))) AS ns
                   FROM na GROUP BY 1, 2)
           SELECT subspace, CAST(code AS INTEGER) AS code, n_base,
             round(CAST(bs AS DOUBLE) / n_base, 6) AS base_mean_d2,
             n_new,
             round(CAST(ns AS DOUBLE) / n_new, 6) AS new_mean_d2,
             round((CAST(ns AS DOUBLE) / n_new) /
               (CAST(bs AS DOUBLE) / n_base), 6) AS drift_ratio
           FROM b FULL JOIN a USING (subspace, code) ORDER BY subspace, code"""
      },
      "q_pq_encode_wide" -> // the pqAssign WIDE norm-trick branch under
        // oracle (the q_kmeans_wide discipline for the subspace level):
        // k=40 codewords per subspace flips pqAssign past
        // ExactArgminMaxK, and the replay ranks by the SAME
        // ||c||^2 - 2*sv.c spelling — certification by construction
        s"""WITH ${pqWideCtes(4, 40)}
           SELECT vec_id, subspace, CAST(cell AS INTEGER) AS code,
             round(d, 6) AS dist2
           FROM a2 ORDER BY vec_id, subspace""",
      "q_pq_recall" -> // ADC top-10 ∩ exact L2 top-10, one certified row;
        // m=16×k=16 (64-bit codes) — the production-shaped config, vs
        // the compact-code extreme certified by q_pq_encode/q_pq_adc.
        // k=16 > ExactArgminMaxK, so pqAssign runs the norm-trick
        // branch — the training replay is pqWideCtes (that spelling
        // verbatim), keeping the certification by construction rather
        // than near-tie luck
        s"""WITH ${pqWideCtes(16, 16)},
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
      "q_pq_retrain" -> { // the PQ retrain replayed from scratch:
        // generation 2's codebooks train on even ∪ 3×-scaled-odd (the
        // corpus the caller hands pqRetrain — scale rides double
        // arithmetic cast back to REAL like the index stores it), then
        // the standard ADC probe for the scaled appended vec_id=1
        val pqRtSrc =
          """(SELECT vec_id, embedding FROM embeddings WHERE vec_id % 2 = 0
              UNION ALL
              SELECT vec_id, [CAST(x::DOUBLE * 3.0 AS REAL) for x in embedding] AS embedding
              FROM embeddings WHERE vec_id % 2 = 1) pq_rt"""
        s"""WITH ${pqTrainCtes(4, 8, pqRtSrc)},
               q AS (SELECT [CAST(x::DOUBLE * 3.0 AS REAL)::DOUBLE for x in embedding] AS v
                     FROM embeddings WHERE vec_id = 1),
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
      },
      "q_kmeans" -> // seeds=lowest ids; micro-sum updates; fold distances
        s"""WITH $lloyd2Ctes
           SELECT vec_id, CAST(cell AS INTEGER) AS cell, round(d, 6) AS dist2
           FROM a2 ORDER BY vec_id""",
      "q_semantic_dedup" -> // q_kmeans cells + within-cell cosine, one-hop min-id
        // keeper — replaying the DEFAULT deployment cap (maxCell=1024):
        // cells over the cap contribute no pairs, exactly the
        // q_semantic_capped spelling at the default cap value
        s"""WITH $lloyd2Ctes,
               sz AS (SELECT cell, count(*) AS n FROM a2 GROUP BY cell),
               nn AS (SELECT a2.vec_id, a2.cell, v,
                        sqrt(list_reduce([v[i]*v[i] for i in range(1, len(v)+1)],
                          (x, y) -> x + y)) AS nrm
                      FROM a2 JOIN sz ON sz.cell = a2.cell AND sz.n <= 1024),
               p AS (SELECT DISTINCT y.vec_id AS idb
                     FROM nn x JOIN nn y ON x.cell = y.cell AND x.vec_id < y.vec_id
                     WHERE list_reduce([x.v[i]*y.v[i] for i in range(1, len(x.v)+1)],
                             (q, w) -> q + w) / (x.nrm * y.nrm) >= 0.35)
           SELECT a2.vec_id, CAST(a2.cell AS INTEGER) AS cell, (p.idb IS NULL) AS keep
           FROM a2 LEFT JOIN p ON a2.vec_id = p.idb ORDER BY a2.vec_id""",
      "q_semantic_capped" -> // the maxCell cap replayed as a cell-size filter feeding
        // the SAME pair logic (the fuzzy capBlocks playbook): over-cap cells
        // contribute no pairs, so all their vectors keep
        s"""WITH $lloyd2Ctes,
               sz AS (SELECT cell, count(*) AS n FROM a2 GROUP BY cell),
               nn AS (SELECT a2.vec_id, a2.cell, v,
                        sqrt(list_reduce([v[i]*v[i] for i in range(1, len(v)+1)],
                          (x, y) -> x + y)) AS nrm
                      FROM a2 JOIN sz ON sz.cell = a2.cell AND sz.n <= 60),
               p AS (SELECT DISTINCT y.vec_id AS idb
                     FROM nn x JOIN nn y ON x.cell = y.cell AND x.vec_id < y.vec_id
                     WHERE list_reduce([x.v[i]*y.v[i] for i in range(1, len(x.v)+1)],
                             (q, w) -> q + w) / (x.nrm * y.nrm) >= 0.35)
           SELECT a2.vec_id, CAST(a2.cell AS INTEGER) AS cell, (p.idb IS NULL) AS keep
           FROM a2 LEFT JOIN p ON a2.vec_id = p.idb ORDER BY a2.vec_id""",
      "q_two_level_cells" -> // coarse lloydCtes(4) + per-cell fine Lloyd, combined cell id
        s"""WITH ${twoLevelCtes(4, 4)}
           SELECT vec_id, CAST(cell1 AS INTEGER) AS cell1,
             CAST(fine AS INTEGER) AS fine,
             CAST(cell1 * 4 + fine AS BIGINT) AS cell, round(d, 6) AS dist2
           FROM f2 ORDER BY vec_id""",
      "q_semantic_twolevel" -> // two-level cells + the q_semantic_capped pair
        // spelling keyed on (cell1, fine), cap 40
        s"""WITH ${twoLevelCtes(4, 4)},
               sz AS (SELECT cell1, fine, count(*) AS n FROM f2 GROUP BY cell1, fine),
               nn AS (SELECT f2.vec_id, f2.cell1, f2.fine, v,
                        sqrt(list_reduce([v[i]*v[i] for i in range(1, len(v)+1)],
                          (x, y) -> x + y)) AS nrm
                      FROM f2 JOIN sz ON sz.cell1 = f2.cell1 AND sz.fine = f2.fine
                        AND sz.n <= 40),
               p AS (SELECT DISTINCT y.vec_id AS idb
                     FROM nn x JOIN nn y ON x.cell1 = y.cell1 AND x.fine = y.fine
                       AND x.vec_id < y.vec_id
                     WHERE list_reduce([x.v[i]*y.v[i] for i in range(1, len(x.v)+1)],
                             (q, w) -> q + w) / (x.nrm * y.nrm) >= 0.35)
           SELECT f2.vec_id, CAST(f2.cell1 * 4 + f2.fine AS BIGINT) AS cell,
             (p.idb IS NULL) AS keep
           FROM f2 LEFT JOIN p ON f2.vec_id = p.idb ORDER BY f2.vec_id""",
      "q_semantic_twolevel_auto" -> { // the auto wrapper's √(n/targetCell) side
        // derivation replayed: side = ceil(sqrt(ceil(n/25))) comes from
        // count(*) (scalar subquery in LIMIT / QUALIFY), cap = 4·25
        val side = "(SELECT side FROM prm)"
        s"""WITH prm AS (SELECT CAST(ceil(sqrt(
                 (((SELECT count(*) FROM embeddings) + 24) // 25)::DOUBLE))
               AS BIGINT) AS side),
               ${twoLevelCtesE(side, side, "")},
               sz AS (SELECT cell1, fine, count(*) AS n FROM f2 GROUP BY cell1, fine),
               nn AS (SELECT f2.vec_id, f2.cell1, f2.fine, v,
                        sqrt(list_reduce([v[i]*v[i] for i in range(1, len(v)+1)],
                          (x, y) -> x + y)) AS nrm
                      FROM f2 JOIN sz ON sz.cell1 = f2.cell1 AND sz.fine = f2.fine
                        AND sz.n <= 100),
               p AS (SELECT DISTINCT y.vec_id AS idb
                     FROM nn x JOIN nn y ON x.cell1 = y.cell1 AND x.fine = y.fine
                       AND x.vec_id < y.vec_id
                     WHERE list_reduce([x.v[i]*y.v[i] for i in range(1, len(x.v)+1)],
                             (q, w) -> q + w) / (x.nrm * y.nrm) >= 0.35)
           SELECT f2.vec_id, CAST(f2.cell1 * $side + f2.fine AS BIGINT) AS cell,
             (p.idb IS NULL) AS keep
           FROM f2 LEFT JOIN p ON f2.vec_id = p.idb ORDER BY f2.vec_id"""
      },
      "q_two_level_topk" -> // fine-centroid ranking (ties on combined cell id)
        // -> nprobe-cell scan -> exact cosine; selection on RAW cosine,
        // 6-dp render projected after (shared text in OracleShared)
        twoLevelTopkOracle,
      // persisted bucketed-index twin: identical probe math, the index
      // round-trips a cell-bucketed parquet table first — same oracle
      // by construction (the q_pq_persisted discipline)
      "q_two_level_persisted" -> twoLevelTopkOracle,
      "q_two_level_knn_multi" -> // the twoLevelTopkOracle probe replayed per
        // query (vec_ids 1, 7, 13): per-query fine-centroid ranking
        // (ties on combined cell), per-query nprobe cell scan, per-query
        // (cosine desc, vec_id) rank — the batched Spark plan and Q
        // sequential probes are the same arithmetic by construction
        s"""WITH ${twoLevelCtes(4, 4)},
             q AS (SELECT vec_id AS query_id, v AS qv FROM e
                   WHERE vec_id IN (1, 7, 13)),
             qn AS (SELECT query_id, qv,
                      sqrt(${fold("[qv[i]*qv[i] for i in range(1, len(qv)+1)]")})
                        AS qnrm FROM q),
             cd AS (SELECT q.query_id, fm1.cell1 * 4 + fm1.cell AS cell,
                      list_reduce([(fm1.cvec[i]-q.qv[i])*(fm1.cvec[i]-q.qv[i])
                                   for i in range(1, len(fm1.cvec)+1)],
                        (x, y) -> x + y) AS d
                    FROM fm1, q),
             pc AS (SELECT query_id, cell FROM cd
                    QUALIFY row_number() OVER (PARTITION BY query_id
                      ORDER BY d, cell) <= 4),
             m AS (SELECT pc.query_id, f2.vec_id, f2.v
                   FROM f2 JOIN pc ON f2.cell1 * 4 + f2.fine = pc.cell),
             sc AS (SELECT m.query_id, m.vec_id,
                      ${fold("[m.v[i]*qn.qv[i] for i in range(1, len(m.v)+1)]")} /
                        (sqrt(${fold("[m.v[i]*m.v[i] for i in range(1, len(m.v)+1)]")})
                          * qn.qnrm) AS c
                    FROM m JOIN qn USING (query_id)),
             sel AS (SELECT query_id, vec_id, c,
                       CAST(row_number() OVER (PARTITION BY query_id
                         ORDER BY c DESC, vec_id) AS INTEGER) AS "rank"
                     FROM sc QUALIFY "rank" <= 10)
           SELECT query_id, vec_id, round(c, 6) AS cosine_sim, "rank"
           FROM sel ORDER BY query_id, "rank"""",
      "q_two_level_append" -> // incremental maintenance replayed FROM
        // SCRATCH: train on the even half, frozen-assign the odd half
        // to the combined codebooks (tlAppendCtes — the norm-trick
        // spelling), union into one index, probe (query vec_id=1 is an
        // APPENDED vector)
        tlAppendProbeSql(tlAppendCtes),
      "q_two_level_compact" -> // compaction certified by IDENTITY: the
        // Spark side compacts the appended index before probing, and
        // the replay is q_two_level_append's oracle verbatim — file
        // layout must never reach the answer
        tlAppendProbeSql(tlAppendCtes),
      "q_stream_index_final" -> // the STREAMING maintenance loop's end
        // state replayed: the bootstrap micro-batch (vec_id % 3 = 0 —
        // first file by modification time) trains the index, the two
        // later batches frozen-append; batch order can't matter because
        // frozen assignment is row-independent, so the replay is one
        // train + one combined frozen-assign + the probe
        tlAppendProbeSql(tlAppendCtesP("vec_id % 3 = 0", "vec_id % 3 <> 0")),
      "q_two_level_retrain" -> // the retrain ARC replayed from scratch
        // (OracleShared.tlRetrainOracle): generation 2 = train on
        // even ∪ 3x-scaled-odd (the corpus the Spark side reads back
        // from generation 1's own table after the drifted append), then
        // the standard probe for the scaled, re-assigned vec_id=1
        tlRetrainOracle,
      "q_two_level_drift" -> // the retrain-trigger signal replayed: the
        // base index's exact build-time dist2 vs the appended batch's
        // frozen-assign dist2 (exact spelling recomputed for winners),
        // pooled per cell under the decimal-sum discipline
        s"""WITH $tlAppendCtes,
             fad AS (SELECT fa.vec_id, fa.cell,
                       list_reduce([(fa.v[i]-cbs.cvec[i])*(fa.v[i]-cbs.cvec[i])
                                    for i in range(1, len(fa.v)+1)],
                         (x, y) -> x + y) AS d
                     FROM fa JOIN cbs USING (cell)),
             b AS (SELECT cell1 * 4 + fine AS cell,
                     CAST(count(*) AS BIGINT) AS n_base,
                     sum(CAST(round(d, 6) AS DECIMAL(18,6))) AS bs
                   FROM f2 GROUP BY 1),
             a AS (SELECT cell, CAST(count(*) AS BIGINT) AS n_new,
                     sum(CAST(round(d, 6) AS DECIMAL(18,6))) AS ns
                   FROM fad GROUP BY 1)
           SELECT cell, n_base,
             round(CAST(bs AS DOUBLE) / n_base, 6) AS base_mean_d2,
             n_new,
             round(CAST(ns AS DOUBLE) / n_new, 6) AS new_mean_d2,
             round((CAST(ns AS DOUBLE) / n_new) /
               (CAST(bs AS DOUBLE) / n_base), 6) AS drift_ratio
           FROM b FULL JOIN a USING (cell) ORDER BY cell""",
      "q_kmeans_wide" -> // the norm-trick argmin replayed verbatim (see
        // lloydWideCtes) — certifies the wide norm-trick branch by construction
        s"""WITH ${lloydWideCtes(40)}
           SELECT vec_id, CAST(cell AS INTEGER) AS cell, round(d, 6) AS dist2
           FROM a2 ORDER BY vec_id""",
      "q_two_level_cells_wide" -> // wide FINE level (k2=40): coarse pass
        // exact (k1=2), fine assigns replay the tlAssign norm trick
        s"""WITH ${twoLevelWideCtes(2, 40)}
           SELECT vec_id, CAST(cell1 AS INTEGER) AS cell1,
             CAST(fine AS INTEGER) AS fine,
             CAST(cell1 * 40 + fine AS BIGINT) AS cell, round(d, 6) AS dist2
           FROM f2 ORDER BY vec_id""",
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
      "q_pca_apply" -> { // the PCA serving half replayed with LEARNED
        // literal planes: Similarity.fixturePcaPlanes (pure-JVM exact
        // covariance + the real power-iteration eigensolve over a
        // seed-fixed sample) feeds BOTH this string and the registered
        // query, so the k dot-minus-shift projections replay verbatim
        // (the q_random_projection discipline with a mean shift)
        val (comps, mean) = Similarity.fixturePcaPlanes()
        val compExprs = comps.map { comp =>
          val arr = comp.map(_.toString).mkString("[", ", ", "]")
          s"round(${fold(s"[embedding[i]::DOUBLE * ($arr)[i] for i in range(1, len(embedding)+1)]")} - (${Similarity.planeShift(comp, mean)}), 6)"
        }.mkString("[", ",\n             ", "]")
        s"""WITH r AS (SELECT vec_id, $compExprs AS pvec FROM embeddings)
            SELECT vec_id,
              unnest([i for i in range(0, len(pvec))])::BIGINT AS pos,
              unnest(pvec) AS component
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
