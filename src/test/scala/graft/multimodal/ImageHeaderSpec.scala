package graft.multimodal

import graft.SparkSuite

class ImageHeaderSpec extends SparkSuite {
  import spark.implicits._

  test("builders round-trip through the parser (png/gif/bmp)") {
    for ((w, h) <- Seq((1, 1), (640, 480), (65535, 1), (1920, 1080))) {
      assert(ImageHeader.parse(ImageHeader.pngBytes(w, h))
        === Some(ImageHeader.Dims("png", w, h)))
      if (w <= 65535 && h <= 65535)
        assert(ImageHeader.parse(ImageHeader.gifBytes(w, h))
          === Some(ImageHeader.Dims("gif", w, h)))
      assert(ImageHeader.parse(ImageHeader.bmpBytes(w, h))
        === Some(ImageHeader.Dims("bmp", w, h)))
    }
  }

  test("jpeg SOF scan finds dimensions past APP segments") {
    // minimal JPEG: SOI, APP0 (JFIF, 16 bytes), SOF0 with 300x200
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    val jpeg = b(0xff, 0xd8) ++                                     // SOI
      b(0xff, 0xe0, 0x00, 0x10) ++ Array.fill(14)(0x4a.toByte) ++   // APP0 len 16
      b(0xff, 0xc0, 0x00, 0x11, 0x08,                               // SOF0 len 17, prec 8
        200 >> 8, 200 & 0xff, 300 >> 8, 300 & 0xff, 3) ++           // h=200 w=300
      Array.fill(10)(0.toByte)
    assert(ImageHeader.parse(jpeg) === Some(ImageHeader.Dims("jpeg", 300, 200)))
    // progressive SOF2 also matches; DHT (C4) is skipped, not a frame
    val prog = b(0xff, 0xd8) ++
      b(0xff, 0xc4, 0x00, 0x04, 0, 0) ++                            // DHT len 4
      b(0xff, 0xc2, 0x00, 0x11, 0x08, 0, 50, 0, 70, 3)              // SOF2 50x70
    assert(ImageHeader.parse(prog) === Some(ImageHeader.Dims("jpeg", 70, 50)))
  }

  test("bmp top-down negative height is reported as magnitude") {
    val bytes = ImageHeader.bmpBytes(10, 20)
    // flip height to -20 (two's complement little-endian at offset 22)
    val neg = bytes.clone()
    val v = -20
    (0 until 4).foreach(i => neg(22 + i) = ((v >>> (8 * i)) & 0xff).toByte)
    assert(ImageHeader.parse(neg) === Some(ImageHeader.Dims("bmp", 10, 20)))
  }

  test("garbage, truncation, and null never throw") {
    assert(ImageHeader.parse(null) === None)
    assert(ImageHeader.parse(Array.empty[Byte]) === None)
    assert(ImageHeader.parse("not an image at all".getBytes) === None)
    assert(ImageHeader.parse(ImageHeader.pngBytes(9, 9).take(10)) === None)
    assert(ImageHeader.parse(Array(0xff, 0xd8, 0xff).map(_.toByte)) === None)
  }

  test("hardening: BM-prefixed text, bad DIB sizes, and negative dims are None") {
    // 'BM' magic alone must not classify a document as an image
    assert(ImageHeader.parse(
      "BMW annual report 2025, all figures in EUR thousands".getBytes) === None)
    // corrupt PNG width FF FF FF FF (reads as -1) must not leak out
    val png = ImageHeader.pngBytes(5, 5)
    (16 until 20).foreach(i => png(i) = 0xff.toByte)
    assert(ImageHeader.parse(png) === None)
    // BMP height Int.MinValue: |h| is still negative — rejected
    val bmp = ImageHeader.bmpBytes(5, 5)
    bmp(22) = 0; bmp(23) = 0; bmp(24) = 0; bmp(25) = 0x80.toByte
    assert(ImageHeader.parse(bmp) === None)
    // OS/2 BITMAPCOREHEADER (DIB size 12, u16 dims) parses correctly
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    val core = b('B', 'M') ++ Array.fill(12)(0.toByte) ++
      b(12, 0, 0, 0) ++ b(17, 0) ++ b(23, 0) ++ b(1, 0, 24, 0)
    assert(ImageHeader.parse(core) === Some(ImageHeader.Dims("bmp", 17, 23)))
  }

  test("hardening: wav chunk-length overflow and short fmt chunks cannot hang or lie") {
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    // chunk length 0xFFFFFFF8: an Int advance would wrap to 0 and
    // spin forever — must terminate with None
    val spin = b('R', 'I', 'F', 'F', 0, 0, 0, 0, 'W', 'A', 'V', 'E') ++
      "junk".getBytes ++ b(0xf8, 0xff, 0xff, 0xff) ++ Array.fill(8)(0.toByte)
    assert(ImageHeader.parseWav(spin) === None)
    // fmt declaring only 4 payload bytes must not read neighbor bytes
    val shortFmt = b('R', 'I', 'F', 'F', 0, 0, 0, 0, 'W', 'A', 'V', 'E') ++
      "fmt ".getBytes ++ b(4, 0, 0, 0) ++ b(1, 0, 2, 0) ++
      "data".getBytes ++ b(0, 0, 0, 0)
    assert(ImageHeader.parseWav(shortFmt) === None)
  }

  test("wav builder round-trips; chunk walk skips odd-length pads; junk is None") {
    val w = ImageHeader.parseWav(ImageHeader.wavBytes(16000, 2, 16, 48000)).get
    assert((w.sampleRate, w.channels, w.bitsPerSample, w.nSamples)
      === ((16000, 2, 16, 48000L)))
    // an extra odd-length chunk before fmt must not break alignment
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    val base = ImageHeader.wavBytes(8000, 1, 8, 100)
    val withList = base.take(12) ++
      "LIST".getBytes ++ b(3, 0, 0, 0) ++ b(1, 2, 3) ++ b(0) ++ // odd chunk + pad
      base.drop(12)
    val w2 = ImageHeader.parseWav(withList).get
    assert((w2.sampleRate, w2.nSamples) === ((8000, 100L)))
    assert(ImageHeader.parseWav("RIFFxxxx".getBytes) === None)
    assert(ImageHeader.parseWav(null) === None)
    assert(ImageHeader.parseWav(ImageHeader.pngBytes(2, 2)) === None)
  }

  test("imageMeta dataset decodes synthesized payloads; junk rows survive") {
    val docs = Seq((3L, "abcdefgh", 8), (4L, "xy", 2), (5L, "hello", 5))
      .toDF("doc_id", "text", "n_chars")
    val out = Multimodal.imageMeta(Multimodal.synthesizeImages(docs))
      .collect().map(m => m.doc_id -> ((m.format, m.width, m.height))).toMap
    assert(out(3L) === (("png", 9, 4)))   // 8 % 1000 + 1, 3 % 500 + 1
    assert(out(4L) === (("gif", 3, 5)))
    assert(out(5L) === (("bmp", 6, 6)))
    val junk = Seq((9L, "zz".getBytes)).toDF("doc_id", "payload")
    val j = Multimodal.imageMeta(junk).collect().head
    assert((j.format, j.width, j.height) === (("unknown", -1, -1)))
  }
}
