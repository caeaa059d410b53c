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
  * default, first whitespace token, survives suffix typos). A NULL
  * blocking key excludes its row entirely (made explicit by a filter,
  * not left to equi-join null semantics — even an exact duplicate is
  * unmatchable without a key).
  *
  * Hot-block guard (the [[Dedup.minhashCandidates]] `maxBucket`
  * discipline, applied to every pair join in this family): one
  * pathological block — every record named "john", an empty-string
  * normalization artifact, a null-ish sentinel that survives the
  * isNotNull guard — expands C(block, 2) pairs on a SINGLE task; at
  * fact scale that is a quadratic bomb no cluster size fixes.
  * `maxBlock > 0` drops blocks larger than the cap BEFORE pair
  * expansion, bounding per-task pair mass at C(maxBlock, 2); an
  * oversized block is near-worthless for linkage anyway (everything
  * "matches" everything — the blocking key has stopped discriminating
  * and should be refined instead). [[droppedBlocks]] is the
  * observability surface for what a cap discards. 0 (default) =
  * uncapped, bit-identical to the pre-cap behavior. */
object Fuzzy {

  /** Default blocking key: first whitespace token. */
  def firstToken(c: Column): Column = element_at(split(c, " "), 1)

  /** Drop every member of a `__b` block larger than `maxBlock` BEFORE
    * any pair expansion (0 = uncapped). One bounded aggregate over
    * block keys + an equi-join — never touches pair space. */
  private def capBlocks(blocked: DataFrame, maxBlock: Int): DataFrame =
    if (maxBlock <= 0) blocked
    else {
      val sizes = blocked.groupBy(col("__b")).agg(count(lit(1)).as("__bn"))
      blocked.join(sizes.where(col("__bn") <= maxBlock), Seq("__b")).drop("__bn")
    }

  /** The blocks a cap of `maxBlock` discards, with their member
    * counts — the monitoring twin of [[Dedup.droppedBuckets]] (log
    * the count, route the keys to a blocking-strategy review).
    * `distinctFirst` mirrors the capped operator's shape: true for
    * the name-pair family ([[jaroWinklerPairs]]/[[blockedMatch]]/
    * [[resolveEntities]] block DISTINCT strings), false for
    * [[fsWeights]] (blocks raw keyed records). */
  def droppedBlocks(df: DataFrame, nameCol: String, maxBlock: Int,
                    block: Column => Column = firstToken,
                    distinctFirst: Boolean = true): DataFrame = {
    require(maxBlock > 0, "droppedBlocks needs a positive cap")
    val names = df.select(col(nameCol).as("name")).where(col("name").isNotNull)
    val base = if (distinctFirst) names.distinct() else names
    base.withColumn("__b", block(col("name")))
      .where(col("__b").isNotNull)
      .groupBy(col("__b")).agg(count(lit(1)).as("n_members"))
      .where(col("n_members") > maxBlock)
      .select(col("__b").as("block_key"), col("n_members"))
      .orderBy(col("block_key"))
  }

  /** Match every distinct `queries` string to the distinct `dictionary`
    * strings within `maxDist` edits, comparing only within equal
    * blocking keys. Returns (q_text, match_text, dist) — one row per
    * surviving pair; a query with no match emits nothing (left-join
    * the result back to keep misses). The edit distance uses the
    * threshold form — O(L·maxDist) with early exit instead of the
    * full O(L²) table per pair; survivors and their distances are
    * identical. */
  def blockedMatch(queries: DataFrame, dictionary: DataFrame,
                   queryCol: String, dictCol: String, maxDist: Int = 2,
                   block: Column => Column = firstToken,
                   maxBlock: Int = 0): DataFrame = {
    require(maxDist >= 0, s"maxDist must be non-negative: $maxDist")
    def side(src: DataFrame, from: String, as: String) =
      capBlocks(src.select(col(from).as(as)).where(col(as).isNotNull)
        .distinct().withColumn("__b", block(col(as)))
        .where(col("__b").isNotNull), maxBlock)
    val q = side(queries, queryCol, "q_text")
    val d = side(dictionary, dictCol, "match_text")
    q.join(d, Seq("__b"))
      // the threshold form returns -1 beyond maxDist, never a partial value
      .withColumn("dist",
        levenshtein(col("q_text"), col("match_text"), maxDist).cast("long"))
      .where(col("dist") >= 0)
      .select(col("q_text"), col("match_text"), col("dist"))
      .orderBy(col("q_text"), col("match_text"))
  }

  /** Near-duplicate NAME pairs within one column, scored by
    * Jaro-Winkler ([[graft.expressions.JaroWinklerSim]] — a codegen
    * Expression pinned bit-exact to DuckDB's native
    * `jaro_winkler_similarity`, which is what lets an independent
    * engine certify the scores UNROUNDED). Same scale discipline as
    * [[blockedMatch]]: distinct the dictionary first, block on a
    * cheap equality key, order pairs `a < b` so each survives once.
    * Edit distance ranks "marhta" far from "martha"; Jaro-Winkler's
    * transposition handling plus prefix boost is the record-linkage
    * scorer those swaps need. */
  /** Entity resolution end-to-end ([EXT]) — the MDM composition:
    * [[jaroWinklerPairs]] edges above `minSim`, transitively closed
    * into clusters ([[Dedup.connectedKeepers]] — bounded union-find
    * with the distributed min-label fallback), each name mapped to
    * its cluster's canonical representative. Canonical = the
    * LEXICOGRAPHICALLY SMALLEST name: the dense ordinal index
    * ([[Pack.globalOrdinals]] over name order) makes min-ordinal ==
    * min-name, so the integral-id CC machinery resolves string
    * entities with no hashing collisions and no arbitrary roots.
    * Names with no near-duplicate are their own canonical. */
  def resolveEntities(df: DataFrame, nameCol: String, minSim: Double,
                      block: Column => Column = firstToken,
                      maxBlock: Int = 0): DataFrame = {
    // ONE distinct name table feeds both the pair join and the
    // ordinal index, and the pair core stays UNSORTED — the ordinal
    // joins would destroy jaroWinklerPairs' terminal ordering, so
    // paying that global sort here would be pure waste. A capped-away
    // hot block simply yields no edges: its names stay their own
    // canonicals (the safe direction — under-merge, never mis-merge).
    val names = distinctNames(df, nameCol)
    val pairs = pairsOfNames(names, minSim, block, maxBlock)
    val ord = Pack.globalOrdinals(names, Seq("name"))
    val edges = pairs
      .join(ord.select(col("name").as("name_a"), col("ordinal").as("doc_a")),
        Seq("name_a"))
      .join(ord.select(col("name").as("name_b"), col("ordinal").as("doc_b")),
        Seq("name_b"))
      .select(col("doc_a"), col("doc_b"))
    val cc = Dedup.connectedKeepers(edges)
    ord
      .join(cc.select(col("doc_id").as("ordinal"), col("root")), Seq("ordinal"), "left")
      .join(ord.select(col("ordinal").as("__r"), col("name").as("__canon")),
        col("root") === col("__r"), "left")
      .select(col("name"), coalesce(col("__canon"), col("name")).as("canonical"))
      .orderBy(col("name"))
  }

  /** Fellegi-Sunter probabilistic record linkage (Fellegi & Sunter
    * 1969; the scoring layer [[jaroWinklerPairs]]/[[resolveEntities]]
    * lack — those say "similar NAME", this weighs the EVIDENCE of
    * every compared field, including disagreements).
    *
    * For each candidate pair (same blocking key, `a_key < b_key` once)
    * and each field f with assumed match-agreement probability m_f,
    * the likelihood ratio multiplies per-field terms
    * `m_f / u_f` on agreement and `(1-m_f) / (1-u_f)` on
    * disagreement, where u_f — the chance two RANDOM records agree on
    * f — is estimated from the data itself as Σ c_v(c_v−1) / N(N−1)
    * over f's value histogram (the standard unlabeled-u estimate; an
    * EM refinement would update m too, but m stays a stated prior
    * here and is part of the operator's contract). A NULL on either
    * side makes the field UNINFORMATIVE (factor 1) — standard
    * Fellegi-Sunter missing-data handling: absence is neither
    * evidence for nor against a match (scoring it as disagreement
    * would systematically under-score sparse records below `lower`
    * and silently drop them). NULLs are likewise excluded from u's
    * numerator, and the agree_f flag reports 0 for a null comparison
    * (it flags OBSERVED agreement only).
    *
    * Scale shape: u-stats are one tiny aggregate per field over the
    * (deduplicated) record table, broadcast as a 1-row frame — no
    * driver collect, no second scan at pair time; pairs come from the
    * same bounded block join as every other linkage operator here;
    * the output keeps only pairs clearing `lower` (on 100 TB the
    * non-match mass is ~all pairs — emitting it would be the
    * scale bug). Determinism: every term is pure IEEE arithmetic
    * (divisions and one fixed-order product — no logs, whose libm
    * implementations differ across engines), from exact integer
    * counts and exact decimal-literal priors, so the UNROUNDED ratio
    * is bit-identical cross-engine and hash-certifiable.
    *
    * `fields` maps field name → m_f as a decimal STRING ("0.95"):
    * the disagreement numerator 1−m_f is derived in exact decimal and
    * only then converted to double — a double `1 - 0.95` would differ
    * from the oracle's decimal-literal `0.05` by one ULP.
    */
  def fsWeights(records: DataFrame, keyCol: String, nameCol: String,
                fields: Seq[(String, String)],
                lower: Double = 10.0, upper: Double = 1000.0,
                block: Column => Column = firstToken,
                maxBlock: Int = 0): DataFrame = {
    require(fields.nonEmpty, "at least one comparison field")
    val base = records
      .select((col(keyCol).cast("long").as("__k") +:
        block(col(nameCol)).as("__b") +:
        fields.map { case (f, _) => col(f) }): _*)
      .where(col("__b").isNotNull)
    // 1-row stats frame: N plus per-field agreeing-pair counts. The
    // u-estimates deliberately come from the UNCAPPED base — they are
    // DATA statistics; the cap only bounds candidate generation.
    val stats = fields.foldLeft(base.agg(count(lit(1)).as("__n"))) {
      case (acc, (f, _)) =>
        val grouped = base.where(col(f).isNotNull)
          .groupBy(col(f)).agg(count(lit(1)).as("__c"))
        acc.crossJoin(broadcast(grouped.agg(
          coalesce(sum(col("__c") * (col("__c") - 1)), lit(0L)).as(s"__s_$f"))))
    }
    val kept = capBlocks(base, maxBlock)
    def side(p: String) = kept.select((col("__b") +:
      col("__k").as(s"${p}_key") +:
      fields.map { case (f, _) => col(f).as(s"${p}_$f") }): _*)
    val pairs = side("a").join(side("b"), Seq("__b"))
      .where(col("a_key") < col("b_key"))
      .crossJoin(broadcast(stats))
    val den = (col("__n") * (col("__n") - lit(1L))).cast("double")
    val lr = fields.map { case (f, m) =>
      val u = col(s"__s_$f").cast("double") / den
      // three-way term: null on either side -> uninformative (1.0)
      when(col(s"a_$f").isNull || col(s"b_$f").isNull, lit(1.0))
        .when(col(s"a_$f") === col(s"b_$f"), lit(m.toDouble) / u)
        .otherwise(lit((BigDecimal(1) - BigDecimal(m)).toDouble) / (lit(1.0) - u))
    }.reduceLeft(_ * _) // fixed left-assoc order, mirrored in the oracle
    val flags = fields.map { case (f, _) =>
      when(col(s"a_$f") === col(s"b_$f"), lit(1)).otherwise(lit(0))
        .cast("int").as(s"agree_$f")
    }
    val out = (col("a_key") +: col("b_key") +: flags) ++ Seq(
      col("lr"),
      when(col("lr") >= lit(upper), lit("match")).otherwise(lit("possible"))
        .as("fs_class"))
    pairs.withColumn("lr", lr)
      .where(col("lr") >= lit(lower))
      .select(out: _*)
      .orderBy(col("a_key"), col("b_key"))
  }

  def jaroWinklerPairs(df: DataFrame, nameCol: String, minSim: Double,
                       block: Column => Column = firstToken,
                       maxBlock: Int = 0): DataFrame =
    pairsOfNames(distinctNames(df, nameCol), minSim, block, maxBlock)
      .orderBy(col("name_a"), col("name_b"))

  private def distinctNames(df: DataFrame, nameCol: String): DataFrame =
    df.select(col(nameCol).as("name")).where(col("name").isNotNull).distinct()

  /** Unsorted pair core — [[resolveEntities]] consumes this directly
    * (its joins would destroy a sort anyway) and reuses the caller's
    * distinct name table; the public [[jaroWinklerPairs]] adds the
    * deterministic terminal ordering the harness compare needs. */
  private def pairsOfNames(names: DataFrame, minSim: Double,
                           block: Column => Column,
                           maxBlock: Int = 0): DataFrame = {
    require(minSim > 0.0 && minSim <= 1.0, s"minSim must be in (0,1]: $minSim")
    // call_function resolves through the session registry — register
    // defensively so vanilla sessions (no graft extension conf) work
    graft.expressions.GraftFunctions.register(names.sparkSession)
    val blocked = capBlocks(names.withColumn("__b", block(col("name")))
      .where(col("__b").isNotNull), maxBlock)
    val sim = graft.expressions.GraftFunctions.jaroWinkler(col("name_a"), col("name_b"))
    blocked.select(col("__b"), col("name").as("name_a"))
      .join(blocked.select(col("__b"), col("name").as("name_b")), Seq("__b"))
      .where(col("name_a") < col("name_b"))
      .withColumn("sim", sim)
      .where(col("sim") >= minSim)
      .select(col("name_a"), col("name_b"), col("sim"))
  }
}
