package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Deduplication family (reference: src/helpers/preprocessing_data.py:84-123
  * D1/D2 for exact; [EXT] near-dup for the LLM-pipeline surface).
  *
  * Scale notes:
  *  - exact dedup = shuffle on the dedup key (or its hash) — never a
  *    global sort, never a driver collect.
  *  - MinHash LSH turns the O(n^2) near-dup problem into a shuffle
  *    join on (band, band_hash): only documents sharing a band bucket
  *    are compared exactly. At 100 TB the candidate join is the only
  *    quadratic-risk step and its size is controlled by bands*rows.
  */
object Dedup {

  /** Full-row / projected-column exact dedup (D1). */
  def exact(df: DataFrame, cols: Seq[String] = Nil): DataFrame =
    if (cols.isEmpty) df.distinct()
    else df.select(cols.map(col): _*).distinct()

  /** Keyed dedup keeping a *deterministic* representative (the
    * reference's dropDuplicates keeps an arbitrary row — not
    * reproducible across runs; we keep the min-by-tiebreak row). The
    * tiebreak columns must uniquely order rows within a key group. */
  def keyedDeterministic(df: DataFrame, keys: Seq[String], tiebreaks: String*): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(tiebreaks.map(col): _*)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** Exact document dedup on normalized-text fingerprint: one group
    * per distinct content, keeping min doc id. */
  def exactDocs(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol), Text.fingerprint(col(textCol)).as("fingerprint"))
      .groupBy(col("fingerprint"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))
      .select(col("keeper_id"), col("n_copies"), col("fingerprint"))
      .orderBy(col("keeper_id"))

  /** Character n-gram shingles of the raw text. */
  def shingles(c: Column, n: Int = 5): Column = {
    val starts = sequence(lit(1), greatest(length(c) - lit(n - 1), lit(1)))
    transform(starts, i => c.substr(i, lit(n)))
  }

  /** MinHash signature: k independent hash functions, each = min over
    * shingles of md5(seed:shingle). Hex-string min is a valid
    * order-preserving min-hash and is reproducible in any engine with
    * md5 (which is what makes the DuckDB oracle possible). */
  def minhashSignature(c: Column, k: Int = 16, shingleLen: Int = 5): Column = {
    val sh = shingles(c, shingleLen)
    array((0 until k).map { i =>
      array_min(transform(sh, s => md5(concat(lit(s"$i:"), s))))
    }: _*)
  }

  /** (doc_id, band, band_hash) — LSH banding of the signature. */
  def lshBands(docs: DataFrame, idCol: String, textCol: String,
               k: Int = 16, bands: Int = 4, shingleLen: Int = 5): DataFrame = {
    val r = k / bands
    val sig = docs.select(col(idCol).as("doc_id"),
      minhashSignature(col(textCol), k, shingleLen).as("sig"))
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        md5(concat_ws(",", slice(col("sig"), b * r + 1, r))).as("band_hash"))
    }
    sig.select(col("doc_id"), explode(array(bandCols: _*)).as("e"))
      .select(col("doc_id"), col("e.band"), col("e.band_hash"))
  }

  /** Candidate near-dup pairs: equi-join on (band, band_hash) —
    * documents agreeing on any full band. Distributed as a plain
    * shuffle join; no cross join anywhere. */
  def minhashCandidates(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
                        k: Int = 16, bands: Int = 4, shingleLen: Int = 5): DataFrame = {
    val b = lshBands(docs, idCol, textCol, k, bands, shingleLen)
    val a = b.select(col("band"), col("band_hash"), col("doc_id").as("doc_a"))
    val c = b.select(col("band"), col("band_hash"), col("doc_id").as("doc_b"))
    a.join(c, Seq("band", "band_hash"))
      .where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** LSH candidates verified by exact n-gram Jaccard >= threshold —
    * the end-to-end near-duplicate detector. */
  def nearDupPairs(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
                   threshold: Double = 0.5, k: Int = 16, bands: Int = 4,
                   shingleLen: Int = 5): DataFrame = {
    val cand = minhashCandidates(docs, idCol, textCol, k, bands, shingleLen)
    val sets = docs.select(col(idCol).as("id"),
      array_distinct(shingles(col(textCol), shingleLen)).as("sh"))
    val withA = cand.join(sets.select(col("id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
    val withB = withA.join(sets.select(col("id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
    val inter = size(array_intersect(col("sh_a"), col("sh_b")))
    val union = size(col("sh_a")) + size(col("sh_b")) - inter
    withB
      .withColumn("jaccard", inter.cast("double") / union.cast("double"))
      .where(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** 32-bit SimHash over whitespace tokens (weighted by occurrence).
    * Distributed as explode + one groupBy(doc) shuffle. */
  def simhash32(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val tok = docs.select(col(idCol).as("doc_id"),
      explode(Text.tokens(lower(col(textCol)))).as("tok"))
      .withColumn("h", conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long"))
    val bitSums = (0 until 32).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"__b$j")
    }
    val fp = (0 until 32).map { j =>
      when(col(s"__b$j") > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    tok.groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"), fp.as("simhash"))
      .orderBy(col("doc_id"))
  }

  /** Hamming distance between two simhash fingerprints. */
  def hamming32(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
