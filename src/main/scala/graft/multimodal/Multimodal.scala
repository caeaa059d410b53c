package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md [EXT]): image/audio/video
  * payloads modeled as opaque `binary` columns with typed metadata.
  *
  * The decode step is a clearly-marked deterministic STUB (the
  * image/audio libraries are not in this environment); everything
  * around it — schema, batch shape, partition-parallel execution via
  * `mapPartitions` (the Scala analog of `mapInPandas`) — is real.
  */
object Multimodal {

  /** Pretend payload: utf-8 bytes of the text column. In production
    * this column is the raw media bytes read from the lake. */
  def attachPayload(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("payload", encode(col(textCol), "UTF-8"))

  /** Payload metadata, computed without ever decoding: byte length +
    * content hash. Pure codegen'd built-ins. */
  def payloadMeta(withPayload: DataFrame, idCol: String = "doc_id"): DataFrame =
    withPayload.select(
      col(idCol),
      octet_length(col("payload")).cast("long").as("n_bytes"),
      sha2(col("payload"), 256).as("payload_sha256"))
      .orderBy(col(idCol))

  final case class DecodedMeta(doc_id: Long, n_bytes: Int, width: Int, height: Int, n_frames: Int)
  final case class ResizedMeta(doc_id: Long, width: Int, height: Int, n_bytes: Int, sha256: String)
  final case class Frame(doc_id: Long, frame_idx: Int, frame_sha256: String)

  /** STUB decoder: stands in for image/audio decode (no media libs in
    * this container). Deterministic fake features derived from the
    * payload so tests are stable. Runs partition-parallel over an
    * iterator batch — the exact execution shape a real decoder
    * (or `mapInPandas` in PySpark) would use. */
  /** STUB resize: a real implementation decodes, scales to (w, h),
    * and re-encodes; the stub derives deterministic output metadata
    * (target dims, a plausible byte count, a content hash bound to
    * the target size). Same partition-parallel batch shape. */
  /** Media tables often arrive as few large files (one row group =
    * one Spark partition); repartitioning the slim (id, payload) rows
    * spreads the per-document decode work across the cluster. */
  private def spread(df: DataFrame, idCol: String): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism, col(idCol))

  def resizeStub(withPayload: DataFrame, w: Int, h: Int,
                 idCol: String = "doc_id"): Dataset[ResizedMeta] = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    spread(withPayload.select(col(idCol).cast("long"), col("payload"))
      .where(col("payload").isNotNull), idCol)
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("SHA-256")
        it.map { case (id, bytes) =>
          md.reset()
          md.update(bytes)
          md.update(s":$w:$h".getBytes("UTF-8"))
          val hex = md.digest().map("%02x".format(_)).mkString
          ResizedMeta(id, w, h, w * h * 3, hex)
        }
      }
  }

  /** STUB frame sampling: one-to-many decode shape (a video payload
    * yields multiple frame rows). Frame count reuses decodeStub's
    * deterministic fake; each frame gets a content hash derived from
    * (payload, frame index). */
  def frameSampleStub(withPayload: DataFrame, idCol: String = "doc_id"): Dataset[Frame] = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    spread(withPayload.select(col(idCol).cast("long"), col("payload"))
      .where(col("payload").isNotNull), idCol)
      .as[(Long, Array[Byte])]
      .mapPartitions { it => // one digest per partition, not per row
        val md = java.security.MessageDigest.getInstance("SHA-256")
        it.flatMap { case (id, bytes) =>
          val nFrames = 1 + (bytes.length % 16)
          (0 until nFrames).iterator.map { i =>
            md.reset()
            md.update(bytes)
            md.update(s"#$i".getBytes("UTF-8"))
            Frame(id, i, md.digest().map("%02x".format(_)).mkString)
          }
        }
      }
  }

  final case class ImageMeta(doc_id: Long, format: String, width: Int, height: Int)

  /** Synthesize REAL container bytes (PNG / GIF / BMP headers via
    * [[ImageHeader]]'s builders) from table fields — the harness
    * stand-in for a genuine media column. Format and dimensions
    * derive deterministically from the row, so the oracle can state
    * the expected parse output without touching bytes: certifying
    * [[imageMeta]] means builder ∘ parser == identity on real
    * binary container formats. */
  def synthesizeImages(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"),
        col("n_chars").cast("long").as("__n"))
      .as[(Long, Long)]
      .map { case (id, n) =>
        val w = (n % 1000 + 1).toInt
        val h = (id % 500 + 1).toInt
        val bytes = (id % 3) match {
          case 0 => ImageHeader.pngBytes(w, h)
          case 1 => ImageHeader.gifBytes(w, h)
          case _ => ImageHeader.bmpBytes(w, h)
        }
        (id, bytes)
      }.toDF("doc_id", "payload")
  }

  /** REAL header decode — format + dimensions from the container
    * bytes ([[ImageHeader]]; no media libs needed for this layer).
    * Unrecognized / truncated payloads yield ("unknown", -1, -1)
    * rows rather than failing the stage. Same partition-parallel
    * batch shape as the decode stubs. */
  def imageMeta(withPayload: DataFrame, idCol: String = "doc_id"): Dataset[ImageMeta] = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    spread(withPayload.select(col(idCol).cast("long"), col("payload"))
      .where(col("payload").isNotNull), idCol)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        ImageHeader.parse(bytes) match {
          case Some(d) => ImageMeta(id, d.format, d.width, d.height)
          case None    => ImageMeta(id, "unknown", -1, -1)
        }
      })
  }

  final case class AudioMeta(doc_id: Long, sample_rate: Int, channels: Int,
                             bits: Int, n_samples: Long, duration_ms: Long)

  /** Audio twin of [[synthesizeImages]]: structurally valid RIFF/WAVE
    * headers from table fields. */
  def synthesizeAudio(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"),
        col("n_chars").cast("long").as("__n"))
      .as[(Long, Long)]
      .map { case (id, n) =>
        val rate = 8000 + (id % 8).toInt * 4000
        val ch = 1 + (id % 2).toInt
        (id, ImageHeader.wavBytes(rate, ch, 16, (n % 100000).toInt))
      }.toDF("doc_id", "payload")
  }

  /** REAL audio header decode ([[ImageHeader.parseWav]]): sample
    * rate, channels, bit depth, frame count, and the derived duration
    * — the pre-codec audio filter layer (drop sub-8kHz, cap length)
    * a speech pipeline applies before any resampling. */
  def audioMeta(withPayload: DataFrame, idCol: String = "doc_id"): Dataset[AudioMeta] = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    spread(withPayload.select(col(idCol).cast("long"), col("payload"))
      .where(col("payload").isNotNull), idCol)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        ImageHeader.parseWav(bytes) match {
          case Some(w) => AudioMeta(id, w.sampleRate, w.channels,
            w.bitsPerSample, w.nSamples, w.nSamples * 1000L / w.sampleRate)
          case None => AudioMeta(id, -1, -1, -1, -1L, -1L)
        }
      })
  }

  final case class VideoMeta(doc_id: Long, brand: String, timescale_hz: Int,
                             duration_ms: Long, width: Int, height: Int,
                             n_tracks: Int)

  /** Video member of the synthesize family: structurally valid
    * ISO-BMFF `ftyp` + `moov(mvhd + trak(tkhd))` skeletons from table
    * fields ([[Mp4Header.mp4Bytes]]). Dimensions stay under 16 bits
    * (the tkhd 16.16 integer part) by construction. */
  def synthesizeVideo(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long").as("doc_id"),
        col("n_chars").cast("long").as("__n"))
      .as[(Long, Long)]
      .map { case (id, n) =>
        val brand = if (id % 2 == 0) "isom" else "mp42"
        val scale = 1000 * (1 + (id % 3).toInt)
        (id, Mp4Header.mp4Bytes(brand, scale, (n % 1000000).toInt,
          16 + (id % 1905).toInt, 16 + (id % 1065).toInt))
      }.toDF("doc_id", "payload")
  }

  /** REAL video container decode ([[Mp4Header.parse]]): brand,
    * timescale, duration, presentation dims, track count — the
    * pre-codec filter/partition layer (drop sub-720p, cap duration,
    * route by brand) a video pipeline applies before any frame work.
    * Unparseable payloads yield a ("unknown", -1…) row, never a
    * stage failure. */
  def videoMeta(withPayload: DataFrame, idCol: String = "doc_id"): Dataset[VideoMeta] = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    spread(withPayload.select(col(idCol).cast("long"), col("payload"))
      .where(col("payload").isNotNull), idCol)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        Mp4Header.parse(bytes) match {
          case Some(m) => VideoMeta(id, m.brand, m.timescaleHz, m.durationMs,
            m.width, m.height, m.nTracks)
          case None => VideoMeta(id, "unknown", -1, -1L, -1, -1, -1)
        }
      })
  }

  def decodeStub(withPayload: DataFrame, idCol: String = "doc_id"): Dataset[DecodedMeta] = {
    val spark = withPayload.sparkSession
    import spark.implicits._
    spread(withPayload.select(col(idCol).cast("long"), col("payload"))
      .where(col("payload").isNotNull), idCol) // null media: nothing to decode
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          // STUB: a real implementation hands `bytes` to a decoder
          // library here and returns true dimensions / frame counts.
          val n = bytes.length
          DecodedMeta(id, n, 64 + (n % 512), 64 + ((n * 7) % 512), 1 + (n % 16))
        }
      }
  }
}
