package graft.multimodal

import graft.SparkSuite

class Mp4HeaderSpec extends SparkSuite {

  private def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  test("builder round-trips through the parser") {
    for {
      (scale, dur) <- Seq((1000, 0), (600, 3600), (90000, 999999))
      (w, h) <- Seq((16, 16), (1920, 1080), (65535, 1))
    } {
      val m = Mp4Header.parse(Mp4Header.mp4Bytes("isom", scale, dur, w, h)).get
      assert(m.brand === "isom")
      assert(m.timescaleHz === scale)
      assert(m.durationMs === dur.toLong * 1000 / scale)
      assert((m.width, m.height) === ((w, h)))
      assert(m.nTracks === 1)
    }
    assert(Mp4Header.parse(Mp4Header.mp4Bytes("mp42", 1000, 1, 1, 1)).get.brand === "mp42")
  }

  test("v1 mvhd (64-bit times) parses the same timescale/duration") {
    // hand-build: ftyp + moov(mvhd v1). mvhd v1 payload = 4 + 8 + 8 + 4 + 8 = 32
    // (+ rate/volume/matrix tail the parser never reads — omit, box size covers it)
    val out = new java.io.ByteArrayOutputStream()
    def be32w(v: Long): Unit = Seq(24, 16, 8, 0).foreach(s => out.write(((v >>> s) & 0xff).toInt))
    def be64w(v: Long): Unit = { be32w(v >>> 32); be32w(v & 0xffffffffL) }
    def tag(t: String): Unit = t.foreach(c => out.write(c.toInt))
    be32w(16); tag("ftyp"); tag("isom"); be32w(0)
    be32w(8 + 40); tag("moov")
    be32w(40); tag("mvhd"); out.write(1); out.write(0); out.write(0); out.write(0)
    be64w(0L); be64w(0L)      // creation, modification (u64 in v1)
    be32w(48000L)             // timescale
    be64w(96000L)             // duration: 2 seconds
    val m = Mp4Header.parse(out.toByteArray).get
    assert(m.timescaleHz === 48000)
    assert(m.durationMs === 2000L)
    assert(m.nTracks === 0)   // audio-only skeleton: no trak, dims 0
    assert((m.width, m.height) === ((0, 0)))
  }

  test("largesize (size==1 + 64-bit length) and size==0 (to end) boxes") {
    val base = Mp4Header.mp4Bytes("isom", 1000, 5000, 320, 240)
    // wrap a free box with largesize between ftyp and moov
    val out = new java.io.ByteArrayOutputStream()
    out.write(base, 0, 16) // ftyp
    def be32w(v: Long): Unit = Seq(24, 16, 8, 0).foreach(s => out.write(((v >>> s) & 0xff).toInt))
    be32w(1); "free".foreach(c => out.write(c.toInt)); be32w(0); be32w(24) // largesize 24 = 16 hdr + 8 pad
    be32w(0); be32w(0)
    out.write(base, 16, base.length - 16)
    assert(Mp4Header.parse(out.toByteArray).map(_.width) === Some(320))
    // a trailing size==0 mdat extends to EOF and is skipped
    val tail = new java.io.ByteArrayOutputStream()
    Seq(24, 16, 8, 0).foreach(s => tail.write(0))
    "mdat".foreach(c => tail.write(c.toInt))
    tail.write(Array.fill(32)(7.toByte), 0, 32)
    assert(Mp4Header.parse(base ++ tail.toByteArray).map(_.durationMs) === Some(5000L))
  }

  test("garbage, truncation, nulls, and lying sizes never throw") {
    assert(Mp4Header.parse(null) === None)
    assert(Mp4Header.parse(Array.empty[Byte]) === None)
    assert(Mp4Header.parse("definitely not an mp4 container".getBytes) === None)
    val good = Mp4Header.mp4Bytes("isom", 1000, 1000, 64, 64)
    for (n <- Seq(4, 8, 15, 20, 40, good.length - 1))
      assert(Mp4Header.parse(good.take(n)) === None)
    // box size smaller than its own header → corrupt, refuse
    val lying = good.clone()
    lying(16) = 0; lying(17) = 0; lying(18) = 0; lying(19) = 4 // moov size 4 < 8
    assert(Mp4Header.parse(lying) === None)
    // WAV/PNG bytes are not MP4s
    assert(Mp4Header.parse(ImageHeader.wavBytes(8000, 1, 16, 100)) === None)
    assert(Mp4Header.parse(ImageHeader.pngBytes(5, 5)) === None)
  }

  test("first VIDEO track wins; audio (0x0) tracks don't claim dims") {
    // two traks: first with 0x0 (audio), second 640x360
    val video = Mp4Header.mp4Bytes("isom", 1000, 100, 640, 360)
    // extract the trak box (last 100 bytes) and an audio twin with 0x0 dims
    val trakV = video.takeRight(100)
    val trakA = Mp4Header.mp4Bytes("isom", 1000, 100, 0, 0).takeRight(100)
    val mvhdBox = video.slice(16 + 8, 16 + 8 + 108)
    val out = new java.io.ByteArrayOutputStream()
    def be32w(v: Long): Unit = Seq(24, 16, 8, 0).foreach(s => out.write(((v >>> s) & 0xff).toInt))
    out.write(video, 0, 16) // ftyp
    be32w(8 + 108 + 100 + 100); "moov".foreach(c => out.write(c.toInt))
    out.write(mvhdBox, 0, mvhdBox.length)
    out.write(trakA, 0, trakA.length)
    out.write(trakV, 0, trakV.length)
    val m = Mp4Header.parse(out.toByteArray).get
    assert(m.nTracks === 2)
    assert((m.width, m.height) === ((640, 360)))
  }

  test("videoMeta spec: dataset decode matches the builder inputs") {
    import spark.implicits._
    val docs = Seq((0L, 120L), (1L, 2500L), (2L, 7L)).toDF("doc_id", "n_chars")
    val metas = Multimodal.videoMeta(Multimodal.synthesizeVideo(docs))
      .collect().sortBy(_.doc_id)
    assert(metas.map(_.brand).toSeq === Seq("isom", "mp42", "isom"))
    assert(metas.map(_.timescale_hz).toSeq === Seq(1000, 2000, 3000))
    assert(metas.map(_.width).toSeq === Seq(16, 17, 18))
    assert(metas(1).duration_ms === 2500L * 1000 / 2000)
  }
}
