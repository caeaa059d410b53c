package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.{Json, Scrub, Text}
import graft.multimodal.Multimodal
import graft.operators.{Anonymize, AsOf, Clustering, CorpusStats, Dedup, Fuzzy, Graph, Layout, Ngrams, Pack, Profile, Quality, Reports, Reshape, Sampling, SetSimilarity, Similarity, Skew, TopK, Windows}
import graft.sources.{Bucketing, Lake, Tables}
import graft.streaming.Sessions

/** DuckDB spellings shared across oracle entries in
  * RegistryOraclesA/B/C — hoisted from the original oracleSql body
  * so one text feeds every oracle that replays it (zero drift). */
private[graft] object OracleShared {
  import Reg._
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
    def wordGramSetCtesFrom(src: String) =
      s"""tk AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS toks
               FROM $src),
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
    val wordGramSetCtes = wordGramSetCtesFrom("documents")
    // Two deterministic Lloyd iterations over the embeddings table
    // (seeds = lowest ids; integer-micro centroid sums; left-fold
    // distances) — ONE spelling feeding q_kmeans, q_semantic_dedup,
    // and the q_drop_audit semantic-cell family. a2 carries (vec_id,
    // v, cell, d); consumers project what they need. Parameterized
    // over k so the two-level oracle's coarse pass shares the text —
    // as a STRING expression, so the auto rows can pass a scalar
    // subquery (DuckDB accepts one in LIMIT) that derives k from
    // count(*) exactly as the Scala auto wrappers do.
    def lloydCtesE(kExpr: String, p: String, src: String = "embeddings"): String =
      s"""${p}e AS (SELECT vec_id, [x::DOUBLE for x in embedding] AS v FROM $src),
         ${p}c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v AS cvec
                FROM ${p}e ORDER BY vec_id LIMIT $kExpr),
         ${p}a1 AS (SELECT vec_id, v, cell,
                  list_reduce([(v[i]-cvec[i])*(v[i]-cvec[i])
                               for i in range(1, len(v)+1)], (x, y) -> x + y) AS d
                FROM ${p}e, ${p}c0
                QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) = 1),
         ${p}m1p AS (SELECT cell, pos, count(*) AS n, sum(vm) AS s FROM
                   (SELECT cell,
                      unnest([i for i in range(0, len(v))]) AS pos,
                      unnest([round(x * 1000000, 0)::BIGINT for x in v]) AS vm
                    FROM ${p}a1)
                 GROUP BY cell, pos),
         ${p}m1 AS (SELECT cell, list(s::DOUBLE / n / 1000000.0 ORDER BY pos) AS cvec
                FROM ${p}m1p GROUP BY cell),
         ${p}a2 AS (SELECT vec_id, v, cell,
                  list_reduce([(v[i]-cvec[i])*(v[i]-cvec[i])
                               for i in range(1, len(v)+1)], (x, y) -> x + y) AS d
                FROM ${p}e, ${p}m1
                QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d, cell) = 1)"""
    def lloydCtes(k: Int, p: String = ""): String = lloydCtesE(k.toString, p)
    val lloyd2Ctes = lloydCtes(8)
    // Two-level quantizer replay (Clustering.twoLevelAssign, iters=2
    // both levels): the coarse pass IS lloydCtes(k1); the fine pass is
    // the same seed/assign/micro-sum/assign chain PARTITIONED by the
    // coarse cell (seeds = k2 lowest ids per cell, updates grouped by
    // (cell1, cell)). f2 carries (vec_id, v, cell1, fine, d).
    def twoLevelCtesE(k1Expr: String, k2Expr: String, p: String,
                      src: String = "embeddings"): String = {
      val dist = "list_reduce([(v[i]-cvec[i])*(v[i]-cvec[i]) " +
        "for i in range(1, len(v)+1)], (x, y) -> x + y)"
      s"""${lloydCtesE(k1Expr, p, src)},
         ${p}ca AS MATERIALIZED (SELECT vec_id, v, cell AS cell1 FROM ${p}a2),
         ${p}f0 AS (SELECT cell1,
                  row_number() OVER (PARTITION BY cell1 ORDER BY vec_id) - 1 AS cell,
                  v AS cvec
                FROM ${p}ca QUALIFY cell < $k2Expr),
         ${p}f1 AS (SELECT ca.vec_id, ca.cell1, ca.v, f0.cell, $dist AS d
                FROM ${p}ca ca JOIN ${p}f0 f0 ON f0.cell1 = ca.cell1
                QUALIFY row_number() OVER (PARTITION BY ca.vec_id
                  ORDER BY d, f0.cell) = 1),
         ${p}fm1p AS (SELECT cell1, cell, pos, count(*) AS n, sum(vm) AS s FROM
                    (SELECT cell1, cell,
                       unnest([i for i in range(0, len(v))]) AS pos,
                       unnest([round(x * 1000000, 0)::BIGINT for x in v]) AS vm
                     FROM ${p}f1)
                  GROUP BY cell1, cell, pos),
         ${p}fm1 AS (SELECT cell1, cell, list(s::DOUBLE / n / 1000000.0 ORDER BY pos) AS cvec
                 FROM ${p}fm1p GROUP BY cell1, cell),
         ${p}f2 AS MATERIALIZED (
             SELECT ca.vec_id, ca.cell1, ca.v, fm1.cell AS fine, $dist AS d
             FROM ${p}ca ca JOIN ${p}fm1 fm1 ON fm1.cell1 = ca.cell1
             QUALIFY row_number() OVER (PARTITION BY ca.vec_id
               ORDER BY d, fm1.cell) = 1)"""
    }
    def twoLevelCtes(k1: Int, k2: Int, p: String = "",
                     src: String = "embeddings"): String =
      twoLevelCtesE(k1.toString, k2.toString, p, src)
    // The kHint>ExactArgminMaxK NORM-TRICK argmin replayed verbatim (the branch
    // Clustering.assignCells/tlAssign run at scale): candidates rank by
    // dn = ||c||^2 - 2*v.c — BOTH dots strict left-to-right folds,
    // bit-identical to the codegen'd graft_dot loop — ties on cell, and
    // the emitted d is the EXACT left-fold dist2 recomputed for the
    // winner only, exactly as the wide branch does. Certification is by
    // construction (same arithmetic both engines), not near-tie luck.
    private val wideDn =
      "list_reduce([cvec[i]*cvec[i] for i in range(1, len(cvec)+1)], (x, y) -> x + y) " +
        "- 2.0 * list_reduce([v[i]*cvec[i] for i in range(1, len(v)+1)], (x, y) -> x + y)"
    // Two wide-k Lloyd iterations (lloydCtes' twin with the norm-trick
    // argmin): a2 carries (vec_id, v, cell, d).
    def lloydWideCtes(k: Int, p: String = ""): String = {
      val dist = "list_reduce([(v[i]-cvec[i])*(v[i]-cvec[i]) " +
        "for i in range(1, len(v)+1)], (x, y) -> x + y)"
      s"""${p}e AS (SELECT vec_id, [x::DOUBLE for x in embedding] AS v FROM embeddings),
         ${p}c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v AS cvec
                FROM ${p}e ORDER BY vec_id LIMIT $k),
         ${p}w1 AS (SELECT vec_id, v, cell FROM ${p}e, ${p}c0
                QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY $wideDn, cell) = 1),
         ${p}m1p AS (SELECT cell, pos, count(*) AS n, sum(vm) AS s FROM
                   (SELECT cell,
                      unnest([i for i in range(0, len(v))]) AS pos,
                      unnest([round(x * 1000000, 0)::BIGINT for x in v]) AS vm
                    FROM ${p}w1)
                 GROUP BY cell, pos),
         ${p}m1 AS (SELECT cell, list(s::DOUBLE / n / 1000000.0 ORDER BY pos) AS cvec
                FROM ${p}m1p GROUP BY cell),
         ${p}a2 AS (SELECT w.vec_id, w.v, w.cell, $dist AS d
                FROM (SELECT vec_id, v, cell FROM ${p}e, ${p}m1
                      QUALIFY row_number() OVER (PARTITION BY vec_id
                        ORDER BY $wideDn, cell) = 1) w
                JOIN ${p}m1 ON ${p}m1.cell = w.cell)"""
    }
    // Two-level replay with a WIDE fine level (k2 > 32): coarse pass is
    // the exact lloydCtes (registered rows keep k1 <= 32 there), fine
    // assigns rank by the norm trick — the tlAssign wide branch —
    // with exact dist2 joined back for winners. f2 carries
    // (vec_id, cell1, v, fine, d).
    def twoLevelWideCtes(k1: Int, k2: Int, p: String = ""): String = {
      val dist = "list_reduce([(v[i]-cvec[i])*(v[i]-cvec[i]) " +
        "for i in range(1, len(v)+1)], (x, y) -> x + y)"
      s"""${lloydCtes(k1, p)},
         ${p}ca AS MATERIALIZED (SELECT vec_id, v, cell AS cell1 FROM ${p}a2),
         ${p}f0 AS (SELECT cell1,
                  row_number() OVER (PARTITION BY cell1 ORDER BY vec_id) - 1 AS cell,
                  v AS cvec
                FROM ${p}ca QUALIFY cell < $k2),
         ${p}f1 AS (SELECT ca.vec_id, ca.cell1, ca.v, f0.cell
                FROM ${p}ca ca JOIN ${p}f0 f0 ON f0.cell1 = ca.cell1
                QUALIFY row_number() OVER (PARTITION BY ca.vec_id
                  ORDER BY ($wideDn), f0.cell) = 1),
         ${p}fm1p AS (SELECT cell1, cell, pos, count(*) AS n, sum(vm) AS s FROM
                    (SELECT cell1, cell,
                       unnest([i for i in range(0, len(v))]) AS pos,
                       unnest([round(x * 1000000, 0)::BIGINT for x in v]) AS vm
                     FROM ${p}f1)
                  GROUP BY cell1, cell, pos),
         ${p}fm1 AS (SELECT cell1, cell, list(s::DOUBLE / n / 1000000.0 ORDER BY pos) AS cvec
                 FROM ${p}fm1p GROUP BY cell1, cell),
         ${p}f2 AS MATERIALIZED (
             SELECT w.vec_id, w.cell1, w.v, w.fine, $dist AS d
             FROM (SELECT ca.vec_id, ca.cell1, ca.v, fm1.cell AS fine
                   FROM ${p}ca ca JOIN ${p}fm1 fm1 ON fm1.cell1 = ca.cell1
                   QUALIFY row_number() OVER (PARTITION BY ca.vec_id
                     ORDER BY ($wideDn), fm1.cell) = 1) w
             JOIN ${p}fm1 fm1 ON fm1.cell1 = w.cell1 AND fm1.cell = w.fine)"""
    }
    // Incremental two-level maintenance replay, shared by
    // q_two_level_append and q_two_level_drift: train on the EVEN half
    // (twoLevelCtes over a filtered source), then frozen-assign the odd
    // half against the COMBINED k1*k2 codebooks via the norm trick —
    // the twoLevelAssignFrozen spelling verbatim (kHint = 16 >
    // ExactArgminMaxK, ties on the combined cell id). fa carries
    // (vec_id, v, cell) for the appended batch; cbs the combined
    // codebooks; f2/fm1 the base training artifacts.
    def tlAppendCtesP(basePred: String, deltaPred: String): String =
      s"""${twoLevelCtes(4, 4, "",
            s"(SELECT * FROM embeddings WHERE $basePred) base_src")},
         nv AS (SELECT vec_id, [x::DOUBLE for x in embedding] AS v
                FROM embeddings WHERE $deltaPred),
         cbs AS (SELECT cell1 * 4 + cell AS cell, cvec FROM fm1),
         fa AS (SELECT nv.vec_id, nv.v, cbs.cell
                FROM nv, cbs
                QUALIFY row_number() OVER (PARTITION BY nv.vec_id
                  ORDER BY ($wideDn), cbs.cell) = 1)"""
    val tlAppendCtes: String = tlAppendCtesP("vec_id % 2 = 0", "vec_id % 2 = 1")
    // build+append+probe replay over any base/delta split: union the
    // base assignment (f2) with the frozen-appended rows (fa), rank the
    // combined codebook cells for the query, scan nprobe cells, exact
    // cosine top-10 — shared by q_two_level_append (the %2 split) and
    // q_stream_index_final (the streaming %3 split: bootstrap batch
    // trains, later batches append)
    def tlAppendProbeSql(ctes: String): String =
      s"""WITH $ctes,
           uni AS (SELECT vec_id, v, cell1 * 4 + fine AS cell FROM f2
                   UNION ALL SELECT vec_id, v, cell FROM fa),
           q AS (SELECT [x::DOUBLE for x in embedding] AS qv
                 FROM embeddings WHERE vec_id = 1),
           qn AS (SELECT qv,
                    sqrt(${fold("[qv[i]*qv[i] for i in range(1, len(qv)+1)]")})
                      AS qnrm FROM q),
           cd AS (SELECT cbs.cell,
                    list_reduce([(cbs.cvec[i]-q.qv[i])*(cbs.cvec[i]-q.qv[i])
                                 for i in range(1, len(cbs.cvec)+1)],
                      (x, y) -> x + y) AS d
                  FROM cbs, q),
           pc AS (SELECT cell FROM cd ORDER BY d, cell LIMIT 4),
           m AS (SELECT uni.vec_id, uni.v FROM uni JOIN pc USING (cell)),
           sc AS (SELECT m.vec_id,
                    ${fold("[m.v[i]*qn.qv[i] for i in range(1, len(m.v)+1)]")} /
                      (sqrt(${fold("[m.v[i]*m.v[i] for i in range(1, len(m.v)+1)]")})
                        * qn.qnrm) AS c
                  FROM m, qn),
           sel AS (SELECT vec_id, c FROM sc ORDER BY c DESC, vec_id LIMIT 10)
         SELECT vec_id, round(c, 6) AS cosine_sim
         FROM sel ORDER BY c DESC, vec_id"""
    // LSH recall audit, parameterized by the gram-set CTE prefix so the
    // full-corpus and sampled flavors share ONE spelling: the
    // jaccard-join chain gives exact pairs; minhash over the SAME fp
    // rows (fp reduced mod P before the multiply — a 60-bit fp times a
    // 30-bit coefficient would overflow), banded at 2/4/8; counts via
    // subqueries stay BIGINT; recall is an unrounded IEEE divide.
    def lshRecallOracle(gramCtes: String): String = {
      val p = graft.operators.Dedup.MinhashP
      val minCols = (0 until 16).map(i =>
        s"min(((fp % $p) * ${graft.operators.Dedup.aCoef(i)} + ${graft.operators.Dedup.bCoef(i)}) % $p) AS m$i")
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
      s"""WITH $gramCtes,
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
    }
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
    def pqTrainCtes(m: Int, k: Int, src: String = "embeddings") = {
      val w = 64 / m
      val subs = (0 until m).mkString(", ")
      val dist = "list_reduce([(sv[i]-cvec[i])*(sv[i]-cvec[i]) " +
        "for i in range(1, len(sv)+1)], (x, y) -> x + y)"
      s"""e AS MATERIALIZED (
              SELECT vec_id, [x::DOUBLE for x in embedding] AS v FROM $src),
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
    // PQ training replay with the WIDE norm-trick argmin — the
    // pqAssign branch every k > ExactArgminMaxK config actually runs
    // (the lloydWideCtes discipline for the subspace level): candidates
    // rank by dn = ||cvec||^2 - 2*sv.cvec (both dots strict left folds,
    // bit-identical to the codegen'd graft_dot loop), ties on cell, and
    // the final a2 recomputes the EXACT left-fold dist2 for winners
    // only, exactly as the wide branch does. Emits the same CTE names
    // as pqTrainCtes (e, sl, a2, m1) so downstream probe/recall SQL is
    // spelling-agnostic.
    def pqWideCtes(m: Int, k: Int) = {
      val w = 64 / m
      val subs = (0 until m).mkString(", ")
      val dist = "list_reduce([(sv[i]-cvec[i])*(sv[i]-cvec[i]) " +
        "for i in range(1, len(sv)+1)], (x, y) -> x + y)"
      val dn =
        "list_reduce([cvec[i]*cvec[i] for i in range(1, len(cvec)+1)], (x, y) -> x + y) " +
          "- 2.0 * list_reduce([sv[i]*cvec[i] for i in range(1, len(sv)+1)], (x, y) -> x + y)"
      s"""e AS MATERIALIZED (
              SELECT vec_id, [x::DOUBLE for x in embedding] AS v FROM embeddings),
          sl AS MATERIALIZED (
              SELECT vec_id, s.s AS subspace, v[s.s*$w+1 : (s.s+1)*$w] AS sv
              FROM e, (SELECT unnest([$subs]) AS s) s),
          sd AS (SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cell
                 FROM e ORDER BY vec_id LIMIT $k),
          c0 AS (SELECT sl.subspace, sd.cell, sl.sv AS cvec
                 FROM sl JOIN sd USING (vec_id)),
          w1 AS MATERIALIZED (
              SELECT sl.vec_id, sl.subspace, sl.sv, c0.cell
              FROM sl JOIN c0 ON c0.subspace = sl.subspace
              QUALIFY row_number() OVER (PARTITION BY sl.vec_id, sl.subspace
                ORDER BY ($dn), c0.cell) = 1),
          m1p AS (SELECT subspace, cell, pos, count(*) AS n, sum(vm) AS s FROM
                    (SELECT subspace, cell,
                       unnest([i for i in range(0, len(sv))]) AS pos,
                       unnest([round(x * 1000000, 0)::BIGINT for x in sv]) AS vm
                     FROM w1)
                  GROUP BY subspace, cell, pos),
          m1 AS MATERIALIZED (
              SELECT subspace, cell,
                list(s::DOUBLE / n / 1000000.0 ORDER BY pos) AS cvec
              FROM m1p GROUP BY subspace, cell),
          a2 AS MATERIALIZED (
              SELECT w.vec_id, w.subspace, w.sv AS sv, w.cell, $dist AS d
              FROM (SELECT sl.vec_id, sl.subspace, sl.sv, m1.cell
                    FROM sl JOIN m1 ON m1.subspace = sl.subspace
                    QUALIFY row_number() OVER (PARTITION BY sl.vec_id, sl.subspace
                      ORDER BY ($dn), m1.cell) = 1) w
              JOIN m1 ON m1.subspace = w.subspace AND m1.cell = w.cell)"""
    }
    // ADC distances fold in subspace order on both engines; shared by
    // the in-memory (q_pq_adc) and persisted-index (q_pq_persisted)
    // probe paths.
    // twoLevelTopK replay (training via twoLevelCtes, fine-centroid
    // ranking ties on combined cell id, selection on RAW cosine with
    // the 6-dp render projected after) — shared by q_two_level_topk
    // and its persisted twin (identical results by construction: the
    // bucketed on-disk path changes IO, not arithmetic).
    def twoLevelProbeSqlOn(ctes: String, qSelect: String): String =
      s"""WITH $ctes,
           q AS ($qSelect),
           qn AS (SELECT qv,
                    sqrt(${fold("[qv[i]*qv[i] for i in range(1, len(qv)+1)]")})
                      AS qnrm FROM q),
           cd AS (SELECT fm1.cell1 * 4 + fm1.cell AS cell,
                    list_reduce([(fm1.cvec[i]-q.qv[i])*(fm1.cvec[i]-q.qv[i])
                                 for i in range(1, len(fm1.cvec)+1)],
                      (x, y) -> x + y) AS d
                  FROM fm1, q),
           pc AS (SELECT cell FROM cd ORDER BY d, cell LIMIT 4),
           m AS (SELECT f2.vec_id, f2.v
                 FROM f2 JOIN pc ON f2.cell1 * 4 + f2.fine = pc.cell),
           sc AS (SELECT m.vec_id,
                    ${fold("[m.v[i]*qn.qv[i] for i in range(1, len(m.v)+1)]")} /
                      (sqrt(${fold("[m.v[i]*m.v[i] for i in range(1, len(m.v)+1)]")})
                        * qn.qnrm) AS c
                  FROM m, qn),
           sel AS (SELECT vec_id, c FROM sc ORDER BY c DESC, vec_id LIMIT 10)
         SELECT vec_id, round(c, 6) AS cosine_sim
         FROM sel ORDER BY c DESC, vec_id"""
    val twoLevelTopkOracle =
      twoLevelProbeSqlOn(twoLevelCtes(4, 4), "SELECT v AS qv FROM e WHERE vec_id = 1")
    // the retrain arc replayed FROM SCRATCH: generation 2's training
    // corpus is the even half UNION the 3x-scaled odd half — the scale
    // rides double arithmetic cast back to REAL, matching the float
    // column the Spark index table stores the appended batch in — and
    // the probe's query is the scaled vec_id=1 (an appended,
    // re-assigned vector). Training + probe are the standard two-level
    // spellings over that corpus.
    val tlRetrainSrc: String =
      """(SELECT vec_id, embedding FROM embeddings WHERE vec_id % 2 = 0
          UNION ALL
          SELECT vec_id, [CAST(x::DOUBLE * 3.0 AS REAL) for x in embedding] AS embedding
          FROM embeddings WHERE vec_id % 2 = 1) rt_src"""
    val tlRetrainOracle: String = twoLevelProbeSqlOn(
      twoLevelCtes(4, 4, "", tlRetrainSrc),
      """SELECT [CAST(x::DOUBLE * 3.0 AS REAL)::DOUBLE for x in embedding] AS qv
         FROM embeddings WHERE vec_id = 1""")
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
}
