package graft.multimodal

/** REAL MP4 (ISO BMFF) container-header parsing — the video member of
  * the image/audio/video trio ([[ImageHeader]] covers the first two).
  * Pure JVM byte arithmetic over the box ("atom") structure: `ftyp`
  * for the major brand, `moov/mvhd` for timescale + duration,
  * `moov/trak/tkhd` for presentation dimensions (16.16 fixed-point),
  * plus the track count. These are exactly the fields a 100 TB video
  * crawl filters and partitions on (drop sub-720p, cap duration,
  * split by brand) BEFORE any frame decode — which still needs codecs
  * and stays a disclosed stub in [[Multimodal]].
  *
  * Same safety contract as [[ImageHeader]]: every read bounds-checked,
  * cursors advance in Long (a u32 box size near 2^32 must not wrap an
  * Int and spin the task), truncated/alien payloads yield None —
  * a corrupt blob in a billion-row scan must not kill the stage.
  */
object Mp4Header {

  final case class Mp4Meta(brand: String, timescaleHz: Int, durationMs: Long,
                           width: Int, height: Int, nTracks: Int)

  private def u8(b: Array[Byte], i: Long): Int = b(i.toInt) & 0xff
  private def be16(b: Array[Byte], i: Long): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def be32(b: Array[Byte], i: Long): Long =
    (be16(b, i).toLong << 16) | be16(b, i + 2)
  private def be64(b: Array[Byte], i: Long): Long =
    (be32(b, i) << 32) | be32(b, i + 4)
  private def fourcc(b: Array[Byte], i: Long): String =
    new String(b.slice(i.toInt, i.toInt + 4), "US-ASCII")

  /** One box header at `at` inside [at, end): returns (type, payload
    * start, payload end) or None if malformed. Handles the 64-bit
    * `largesize` escape (size == 1) and the extends-to-end form
    * (size == 0, top-level only in practice but legal anywhere). */
  private def box(b: Array[Byte], at: Long, end: Long): Option[(String, Long, Long)] = {
    if (at + 8 > end) return None
    val size32 = be32(b, at)
    val typ = fourcc(b, at + 4)
    val (size, hdr) =
      if (size32 == 0L) (end - at, 8L)
      else if (size32 == 1L) {
        if (at + 16 > end) return None
        (be64(b, at + 8), 16L)
      } else (size32, 8L)
    // size covers the header itself; anything smaller (or overrunning
    // the parent) is corrupt, and a non-positive advance would loop
    if (size < hdr || at + size > end) None
    else Some((typ, at + hdr, at + size))
  }

  /** mvhd payload: version(1) flags(3), then v0 packs creation/
    * modification/timescale/duration as u32, v1 widens the times (not
    * the timescale) to u64. Returns (timescaleHz, durationTicks). */
  private def mvhd(b: Array[Byte], p: Long, end: Long): Option[(Int, Long)] = {
    if (p + 4 > end) return None
    u8(b, p) match {
      case 0 if p + 20 <= end => Some((be32(b, p + 12).toInt, be32(b, p + 16)))
      case 1 if p + 32 <= end => Some((be32(b, p + 20).toInt, be64(b, p + 24)))
      case _ => None
    }
  }

  /** tkhd: the presentation width/height are the LAST two u32s of the
    * payload, as 16.16 fixed point (v1's wider times shift them by 12
    * bytes, so anchoring at the payload END handles both versions the
    * same way). Audio tracks carry 0×0 — the caller keeps the first
    * track with a positive area. */
  private def tkhd(b: Array[Byte], p: Long, end: Long): Option[(Int, Int)] =
    if (end - p >= 84) // v0 payload size; v1 is 96 — both end in w/h
      Some(((be32(b, end - 8) >>> 16).toInt, (be32(b, end - 4) >>> 16).toInt))
    else None

  def parse(b: Array[Byte]): Option[Mp4Meta] = {
    if (b == null || b.length < 8) return None
    // an MP4 must OPEN with ftyp (well-formed files do; this also
    // stops random binaries whose bytes happen to contain 'moov')
    if (fourcc(b, 4) != "ftyp") return None
    val len = b.length.toLong
    var brand: String = null
    var scale = -1
    var ticks = -1L
    var w = 0; var h = 0; var tracks = 0
    var i = 0L
    while (i + 8 <= len) {
      box(b, i, len) match {
        case None => return None // lost box sync: refuse, don't guess
        case Some((typ, p, e)) =>
          typ match {
            case "ftyp" if e - p >= 4 => brand = fourcc(b, p)
            case "moov" =>
              var j = p
              while (j + 8 <= e) {
                box(b, j, e) match {
                  case None => return None
                  case Some((ct, cp, ce)) =>
                    ct match {
                      case "mvhd" =>
                        mvhd(b, cp, ce).foreach { case (s, d) => scale = s; ticks = d }
                      case "trak" =>
                        tracks += 1
                        var k = cp
                        while (k + 8 <= ce) {
                          box(b, k, ce) match {
                            case None => return None
                            case Some((tt, tp, te)) =>
                              if (tt == "tkhd" && w * h == 0)
                                tkhd(b, tp, te).foreach { case (tw, th) =>
                                  if (tw > 0 && th > 0) { w = tw; h = th }
                                }
                              k = te
                          }
                        }
                      case _ => ()
                    }
                    j = ce
                }
              }
            case _ => () // mdat/free/skip/uuid…: fly over, never read
          }
          i = e
      }
    }
    if (brand != null && scale > 0 && ticks >= 0)
      Some(Mp4Meta(brand, scale, ticks * 1000L / scale, w, h, tracks))
    else None
  }

  /** Builder twin of [[parse]] — a structurally valid
    * ftyp + moov(mvhd v0 + trak(tkhd v0)) skeleton; used by the
    * harness to synthesize real container bytes from table fields and
    * by tests (production rows arrive with genuine media bytes).
    * Width/height must fit 16 bits (the 16.16 integer part). */
  def mp4Bytes(brand: String, timescaleHz: Int, durationTicks: Int,
               w: Int, h: Int): Array[Byte] = {
    require(brand.length == 4, "brand is a 4cc")
    val out = new java.io.ByteArrayOutputStream()
    def be32w(v: Long): Unit = Seq(24, 16, 8, 0).foreach(s => out.write(((v >>> s) & 0xff).toInt))
    def tag(t: String): Unit = t.foreach(c => out.write(c.toInt))
    def zeros(n: Int): Unit = (0 until n).foreach(_ => out.write(0))
    // ftyp: major brand + minor version (no compatible-brand list)
    be32w(16); tag("ftyp"); tag(brand); be32w(0)
    // moov = 8 + mvhd(108) + trak(8 + tkhd(92))
    be32w(216); tag("moov")
    be32w(108); tag("mvhd"); zeros(4) // version 0 + flags
    be32w(0); be32w(0)                // creation, modification
    be32w(timescaleHz.toLong); be32w(durationTicks.toLong)
    be32w(0x00010000L); out.write(1); out.write(0); zeros(2) // rate 1.0, volume 1.0, reserved
    zeros(8)                          // reserved
    Seq(0x00010000L, 0L, 0L, 0L, 0x00010000L, 0L, 0L, 0L, 0x40000000L)
      .foreach(be32w)                 // identity matrix
    zeros(24)                         // pre_defined
    be32w(2)                          // next_track_ID
    be32w(100); tag("trak")
    be32w(92); tag("tkhd"); zeros(4)  // version 0 + flags
    be32w(0); be32w(0)                // creation, modification
    be32w(1); be32w(0); be32w(durationTicks.toLong) // track id, reserved, duration
    zeros(8); zeros(2); zeros(2); zeros(2); zeros(2) // reserved, layer, group, volume, reserved
    Seq(0x00010000L, 0L, 0L, 0L, 0x00010000L, 0L, 0L, 0L, 0x40000000L)
      .foreach(be32w)
    be32w(w.toLong << 16); be32w(h.toLong << 16) // 16.16 fixed point
    out.toByteArray
  }
}
