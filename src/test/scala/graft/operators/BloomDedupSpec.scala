package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.expressions.GraftFunctions

/** Bloom-guarded incremental dedup (Dedup.fingerprintIndex /
  * fingerprintBloom / newDocs): exactness regardless of sketch sizing,
  * no false negatives, empty-history degeneracy, and the persisted-
  * sketch round trip that makes the "build once, probe every batch"
  * deployment real. */
class BloomDedupSpec extends SparkSuite {
  import spark.implicits._

  // history: 100 distinct texts; batch: 50 genuinely new + 20
  // re-crawled history texts under fresh ids (the crawler pattern)
  private def corpus = {
    val history = (0L until 100L).map(i => (i, s"history document number $i body"))
      .toDF("doc_id", "text")
    val fresh = (1000L until 1050L).map(i => (i, s"brand new document $i"))
    val recrawled = (0L until 20L).map(i => (2000L + i, s"history document number $i body"))
    val batch = (fresh ++ recrawled).toDF("doc_id", "text")
    (history, batch)
  }

  test("newDocs matches the plain anti-join (exact regardless of bloom)") {
    val (history, batch) = corpus
    val index = Dedup.fingerprintIndex(history)
    val bloom = Dedup.fingerprintBloom(index)
    assert(bloom != null)
    val got = Dedup.newDocs(batch, index, bloom)
      .select("doc_id").as[Long].collect().sorted
    val want = Dedup.fingerprintIndex(batch)
      .join(index.select("fingerprint"), Seq("fingerprint"), "left_anti")
      .select("doc_id").as[Long].collect().sorted
    assert(got.toSeq === want.toSeq)
    assert(got.length === 50, "only the genuinely-new docs survive")
    assert(got.forall(_ >= 1000L) && got.forall(_ < 2000L))
  }

  test("an undersized bloom (high fpp) degrades to the verify join, never to wrong answers") {
    val (history, batch) = corpus
    val index = Dedup.fingerprintIndex(history)
    // 64 bits for 100 items: nearly every probe is a false positive
    val tiny = Dedup.fingerprintBloom(index, expectedItems = 100, numBits = 64)
    val got = Dedup.newDocs(batch, index, tiny)
      .select("doc_id").as[Long].collect().sorted
    assert(got.length === 50 && got.forall(_ >= 1000L))
  }

  test("no false negatives: every history fingerprint probes true") {
    val (history, _) = corpus
    val index = Dedup.fingerprintIndex(history)
    val bloom = Dedup.fingerprintBloom(index)
    val misses = index
      .where(!GraftFunctions.bloomContains(lit(bloom), xxhash64(col("fingerprint"))))
      .count()
    assert(misses === 0L, "bloom filters must never miss an inserted element")
  }

  test("empty history: bloom is null and the whole batch is new") {
    val (history, batch) = corpus
    val index = Dedup.fingerprintIndex(history.limit(0))
    val bloom = Dedup.fingerprintBloom(index)
    assert(bloom == null, "Spark's empty-sketch convention")
    assert(Dedup.newDocs(batch, index, bloom).count() === batch.count())
  }

  test("null bloom against a NON-empty index still verifies (lost sketch != lost dedup)") {
    val (history, batch) = corpus
    val index = Dedup.fingerprintIndex(history)
    val got = Dedup.newDocs(batch, index, bloom = null)
      .select("doc_id").as[Long].collect().sorted
    assert(got.length === 50 && got.forall(_ >= 1000L),
      "a missing sketch must degrade to the exact anti-join, not re-ingest duplicates")
  }

  test("null-text docs dedup across batches instead of re-admitting forever") {
    // history already ingested one null-text doc; the batch carries two
    // more plus one real new doc. Null fingerprints must match the
    // indexed null (null-safe verify) — with and without a bloom.
    val history = Seq((1L, "real history doc"), (2L, null)).toDF("doc_id", "text")
    val batch = Seq((10L, null), (11L, null), (12L, "genuinely new doc"))
      .toDF("doc_id", "text")
    val index = Dedup.fingerprintIndex(history)
    val bloom = Dedup.fingerprintBloom(index)
    Seq(bloom, null).foreach { b =>
      val got = Dedup.newDocs(batch, index, b).select("doc_id").as[Long].collect().sorted
      assert(got.toSeq === Seq(12L),
        s"null-text docs must dedup against the indexed null (bloom=${b != null}): ${got.toSeq}")
    }
    // no null in history: the batch's null docs are new (once)
    val freshIndex = Dedup.fingerprintIndex(history.where(col("text").isNotNull))
    val got2 = Dedup.newDocs(batch, freshIndex, Dedup.fingerprintBloom(freshIndex))
      .select("doc_id").as[Long].collect().sorted
    assert(got2.toSeq === Seq(10L, 11L, 12L))
  }

  test("the sketch survives a parquet round trip (build once, probe per batch)") {
    val (history, batch) = corpus
    val index = Dedup.fingerprintIndex(history)
    val bloom = Dedup.fingerprintBloom(index)
    val dir = java.nio.file.Files.createTempDirectory("bloom").toString
    Seq(Tuple1(bloom)).toDF("bloom").write.mode("overwrite").parquet(dir)
    val reloaded = spark.read.parquet(dir).head().getAs[Array[Byte]]("bloom")
    val got = Dedup.newDocs(batch, index, reloaded).select("doc_id").as[Long].collect().sorted
    val direct = Dedup.newDocs(batch, index, bloom).select("doc_id").as[Long].collect().sorted
    assert(got.toSeq === direct.toSeq)
  }
}
