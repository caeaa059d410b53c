package graft.multimodal

import graft.SparkSuite

class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private val docs = Seq((1L, "hello"), (2L, "héllo")).toDF("doc_id", "text")

  test("attachPayload + payloadMeta: UTF-8 byte length and stable sha256") {
    val out = Multimodal.payloadMeta(Multimodal.attachPayload(docs)).collect()
    assert(out(0).getLong(1) === 5L)
    assert(out(1).getLong(1) === 6L) // é is 2 bytes in UTF-8
    assert(out(0).getString(2).length === 64)
    assert(out(0).getString(2) !== out(1).getString(2))
  }

  test("resizeStub: deterministic target dims and size-bound hash") {
    val a = Multimodal.resizeStub(Multimodal.attachPayload(docs), 224, 224)
      .collect().sortBy(_.doc_id)
    assert(a.forall(r => r.width == 224 && r.height == 224 && r.n_bytes == 224 * 224 * 3))
    val b = Multimodal.resizeStub(Multimodal.attachPayload(docs), 64, 64)
      .collect().sortBy(_.doc_id)
    assert(a(0).sha256 !== b(0).sha256, "hash must bind to the target size")
  }

  test("frameSampleStub: one-to-many frames with per-frame hashes") {
    val frames = Multimodal.frameSampleStub(Multimodal.attachPayload(docs)).collect()
    val byDoc = frames.groupBy(_.doc_id)
    assert(byDoc(1L).length === 1 + 5 % 16)
    byDoc.values.foreach { fs =>
      assert(fs.map(_.frame_idx).sorted.toSeq === (0 until fs.length))
      assert(fs.map(_.frame_sha256).distinct.length === fs.length)
    }
  }

  test("decodeStub skips null payloads instead of crashing") {
    val withNull = Seq((1L, Some("ok")), (2L, Option.empty[String])).toDF("doc_id", "text")
    val out = Multimodal.decodeStub(Multimodal.attachPayload(withNull)).collect()
    assert(out.map(_.doc_id).toSeq === Seq(1L))
  }

  test("decodeStub is deterministic and partition-parallel") {
    val a = Multimodal.decodeStub(Multimodal.attachPayload(docs)).collect().sortBy(_.doc_id)
    val b = Multimodal.decodeStub(Multimodal.attachPayload(docs.repartition(4)))
      .collect().sortBy(_.doc_id)
    assert(a.toSeq === b.toSeq)
    assert(a(0).n_bytes === 5)
    assert(a(0).width === 64 + 5 % 512 && a(0).n_frames === 1 + 5 % 16)
  }
}
