package graft.multimodal

/** REAL image-container header parsing — pure JVM byte arithmetic, no
  * media libraries: PNG (IHDR), GIF (logical screen descriptor), BMP
  * (BITMAPINFOHEADER), and JPEG (SOF marker scan). This is the part
  * of "multimodal decode" that genuinely needs no codec: dimensions,
  * format detection, and header sanity live in the first bytes, and a
  * 100 TB media crawl filters/partitions on exactly these fields
  * BEFORE any expensive decode (the [[Multimodal]] decode/resize
  * steps remain disclosed stubs — pixel work does need codecs).
  *
  * Safety: every read is bounds-checked; a truncated or alien payload
  * yields None, never an exception — a corrupt blob in a billion-row
  * scan must not kill the stage.
  */
object ImageHeader {

  final case class Dims(format: String, width: Int, height: Int)

  /** Every parser funnels through this: non-positive dimensions mean
    * a corrupt header (and -1 would collide with the downstream
    * "unknown" sentinel) — None, not confident garbage. */
  private def dims(format: String, w: Int, h: Int): Option[Dims] =
    if (w > 0 && h > 0) Some(Dims(format, w, h)) else None

  def parse(b: Array[Byte]): Option[Dims] = {
    if (b == null) None
    else if (isPng(b)) parsePng(b)
    else if (isGif(b)) parseGif(b)
    else if (isBmp(b)) parseBmp(b)
    else if (isJpeg(b)) parseJpeg(b)
    else None
  }

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def be32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def le32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)

  private val PngSig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def isPng(b: Array[Byte]): Boolean =
    b.length >= 8 && b.take(8).sameElements(PngSig)

  /** PNG: signature, then the IHDR chunk (len + "IHDR" + 13-byte
    * payload); width/height are the first two big-endian ints. */
  private def parsePng(b: Array[Byte]): Option[Dims] =
    if (b.length >= 24 && b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      dims("png", be32(b, 16), be32(b, 20))
    else None

  private def isGif(b: Array[Byte]): Boolean =
    b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
      (b(4) == '7' || b(4) == '9') && b(5) == 'a'

  /** GIF: logical screen width/height, little-endian u16 at 6/8. */
  private def parseGif(b: Array[Byte]): Option[Dims] =
    if (b.length >= 10) dims("gif", le16(b, 6), le16(b, 8)) else None

  private def isBmp(b: Array[Byte]): Boolean =
    b.length >= 2 && b(0) == 'B' && b(1) == 'M'

  /** Known DIB header sizes: BITMAPCOREHEADER (12) and the
    * BITMAPINFOHEADER family — the 2-byte 'BM' magic alone would
    * classify any "BM..."-prefixed payload as an image. */
  private val DibSizes = Set(12, 40, 52, 56, 64, 108, 124)

  /** BMP: validate the DIB size field, then read the right layout —
    * i32 LE at 18/22 for the INFOHEADER family (negative height =
    * top-down row order, dimensions are |height|), u16 LE at 18/20
    * for the OS/2 COREHEADER. */
  private def parseBmp(b: Array[Byte]): Option[Dims] = {
    if (b.length < 26) return None
    val dib = le32(b, 14)
    if (!DibSizes.contains(dib)) None
    else if (dib == 12) dims("bmp", le16(b, 18), le16(b, 20))
    else {
      val h = le32(b, 22)
      if (h == Int.MinValue) None
      else dims("bmp", le32(b, 18), math.abs(h))
    }
  }

  private def isJpeg(b: Array[Byte]): Boolean =
    b.length >= 2 && u8(b, 0) == 0xff && u8(b, 1) == 0xd8

  /** JPEG: walk the marker stream to the first SOFn frame header
    * (C0-CF excluding DHT C4, DAC CC, RSTn); height/width are
    * big-endian u16 at +5/+7 inside it. */
  private def parseJpeg(b: Array[Byte]): Option[Dims] = {
    var i = 2
    while (i + 3 < b.length) {
      if (u8(b, i) != 0xff) return None // lost marker sync
      val marker = u8(b, i + 1)
      if (marker == 0xff) { i += 1 } // fill byte
      else if (marker >= 0xd0 && marker <= 0xd9) { i += 2 } // RSTn/SOI/EOI: no length
      else {
        val len = be16(b, i + 2)
        if (len < 2) return None
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (isSof) {
          return if (i + 8 < b.length)
            dims("jpeg", be16(b, i + 7), be16(b, i + 5))
          else None
        }
        i += 2 + len
      }
    }
    None
  }

  final case class WavMeta(sampleRate: Int, channels: Int, bitsPerSample: Int,
                           nSamples: Long)

  /** WAV (RIFF/WAVE) header: walk the chunk list to `fmt ` for
    * sample rate / channels / bit depth, and to `data` for the
    * payload size, from which the per-channel sample count follows.
    * Same contract as [[parse]]: bounds-checked, None on anything
    * malformed. */
  def parseWav(b: Array[Byte]): Option[WavMeta] = {
    if (b == null || b.length < 12 ||
      !(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return None
    // the cursor advances in LONG: a 32-bit chunk length near 2^32
    // would wrap an Int advance to <= 0 and spin the task thread
    // forever — the exact corrupt-blob hang this parser must never
    // allow — and a legitimate >= 2 GiB data chunk would go negative
    var i = 12L
    var rate = -1; var ch = -1; var bits = -1; var dataLen = -1L
    while (i + 8 <= b.length && (rate < 0 || dataLen < 0)) {
      val at = i.toInt
      val id = new String(b.slice(at, at + 4), "US-ASCII")
      val len = le32(b, at + 4).toLong & 0xffffffffL
      // honor the DECLARED fmt length: a short fmt chunk must not
      // read its neighbors' bytes as audio facts
      if (id == "fmt " && len >= 16 && i + 8 + 16 <= b.length) {
        ch = le16(b, at + 10); rate = le32(b, at + 12); bits = le16(b, at + 22)
      } else if (id == "data") dataLen = len
      // chunks are word-aligned: odd lengths carry a pad byte
      i += 8L + len + (len % 2)
    }
    if (rate > 0 && ch > 0 && bits > 0 && dataLen >= 0)
      Some(WavMeta(rate, ch, bits, dataLen / (ch.toLong * (bits / 8).max(1))))
    else None
  }

  /** Builder twin of [[parseWav]] — a structurally valid RIFF/WAVE
    * header with an empty-bytes data chunk of `nSamples` frames. */
  def wavBytes(sampleRate: Int, channels: Int, bitsPerSample: Int,
               nSamples: Int): Array[Byte] = {
    val dataLen = nSamples * channels * (bitsPerSample / 8)
    val out = new java.io.ByteArrayOutputStream()
    "RIFF".foreach(c => out.write(c.toInt)); writeLe32(out, 36 + dataLen)
    "WAVE".foreach(c => out.write(c.toInt))
    "fmt ".foreach(c => out.write(c.toInt)); writeLe32(out, 16)
    writeLe16(out, 1); writeLe16(out, channels); writeLe32(out, sampleRate)
    writeLe32(out, sampleRate * channels * (bitsPerSample / 8))
    writeLe16(out, channels * (bitsPerSample / 8)); writeLe16(out, bitsPerSample)
    "data".foreach(c => out.write(c.toInt)); writeLe32(out, dataLen)
    // data bytes themselves are not needed for header parsing
    out.toByteArray
  }

  // ---- header builders (the parser's inverse, used by the harness
  // query to synthesize REAL container bytes from table fields and by
  // tests; production rows arrive with genuine media bytes) ----

  def pngBytes(w: Int, h: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    PngSig.foreach(b => out.write(b & 0xff))
    Seq(0, 0, 0, 13).foreach(out.write) // IHDR length
    out.write('I'); out.write('H'); out.write('D'); out.write('R')
    writeBe32(out, w); writeBe32(out, h)
    // bit depth, color type, compression, filter, interlace + fake CRC
    Seq(8, 2, 0, 0, 0, 0, 0, 0, 0).foreach(out.write)
    out.toByteArray
  }

  def gifBytes(w: Int, h: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    "GIF89a".foreach(c => out.write(c.toInt))
    writeLe16(out, w); writeLe16(out, h)
    Seq(0, 0, 0).foreach(out.write) // GCT flags, bg color, aspect
    out.toByteArray
  }

  def bmpBytes(w: Int, h: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write('B'); out.write('M')
    writeLe32(out, 54); writeLe16(out, 0); writeLe16(out, 0); writeLe32(out, 54)
    writeLe32(out, 40) // BITMAPINFOHEADER size
    writeLe32(out, w); writeLe32(out, h)
    writeLe16(out, 1); writeLe16(out, 24)
    (0 until 24).foreach(_ => out.write(0))
    out.toByteArray
  }

  private def writeBe32(o: java.io.ByteArrayOutputStream, v: Int): Unit =
    Seq(24, 16, 8, 0).foreach(s => o.write((v >>> s) & 0xff))
  private def writeLe16(o: java.io.ByteArrayOutputStream, v: Int): Unit =
    Seq(0, 8).foreach(s => o.write((v >>> s) & 0xff))
  private def writeLe32(o: java.io.ByteArrayOutputStream, v: Int): Unit =
    Seq(0, 8, 16, 24).foreach(s => o.write((v >>> s) & 0xff))
}
