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
