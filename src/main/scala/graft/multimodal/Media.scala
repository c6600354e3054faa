package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads plus typed metadata, with decode / feature-extraction /
  * frame-sampling as per-partition batch transforms.
  *
  * The Spark-side architecture is the real thing — binary columns
  * survive parquet round-trips, partitioning is by content hash so a
  * 100 TB corpus spreads evenly, and codecs initialize once per
  * partition (the Scala analog of `mapInPandas` batch amortization).
  *
  * Codecs: IMAGES and AUDIO are decoded for real with what the JDK
  * ships — `ImageCodec` on javax.imageio (PNG/JPEG/BMP/GIF) and
  * `AudioCodec` on javax.sound.sampled (WAV/PCM): ingest synthesizes
  * genuine PNG/WAV payloads, features decode them back (luminance
  * histograms / RMS energy), resize re-encodes pixels. VIDEO remains
  * behind `StubCodec` (no video codec exists in the JDK): a single
  * documented seam for JavaCV/ffmpeg in production.
  */
object Media {

  case class MediaMeta(media_type: String, width: Int, height: Int,
                       sample_rate: Int, duration_ms: Long)
  case class MediaRecord(media_id: Long, meta: MediaMeta, payload: Array[Byte])
  case class MediaFeatures(media_id: Long, media_type: String,
                           n_bytes: Int, histogram: Array[Double],
                           brightness: Double)
  case class Frame(media_id: Long, frame_no: Int, offset: Int,
                   frame_bytes: Array[Byte])

  /** STUB — stands in for a real image/audio decoder. Deterministic:
    * "decode" = byte histogram over 8 bins + mean byte as "brightness".
    * Replace `decode` with a real codec call; everything upstream and
    * downstream (schema, batching, partitioning) stays as-is.
    */
  object StubCodec {
    def init(): StubCodec.type = this // per-partition "codec handle"
    def decode(payload: Array[Byte]): (Array[Double], Double) = {
      val bins = new Array[Double](8)
      var sum = 0.0
      var i = 0
      while (i < payload.length) {
        val b = payload(i) & 0xff
        bins(b >> 5) += 1.0
        sum += b
        i += 1
      }
      val n = math.max(payload.length, 1)
      ((0 until 8).map(j => bins(j) / n).toArray, sum / n)
    }
  }

  /** REAL image codec on the JDK's ImageIO — no external libraries.
    * Thread-safe stateless calls; `init()` mirrors the per-partition
    * codec-handle shape of the stub.
    */
  object ImageCodec {
    import java.awt.image.BufferedImage
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.imageio.ImageIO

    def init(): ImageCodec.type = this

    /** Render raw bytes as RGB pixels into a side×side image — the
      * deterministic ingest used to fabricate real PNG payloads from
      * text corpora (3 bytes → one pixel, wrapping).
      */
    def imageFromBytes(bytes: Array[Byte], side: Int): BufferedImage = {
      val img = new BufferedImage(side, side, BufferedImage.TYPE_INT_RGB)
      if (bytes.isEmpty) return img // all-black, like AudioCodec's empty guard
      val n = bytes.length
      // write the packed-int raster directly — setRGB routes every
      // pixel through the ColorModel; for TYPE_INT_RGB the buffer IS
      // the 24-bit packed value, so the stored pixels (and thus the
      // encoded PNG bytes) are identical (r21)
      val buf = img.getRaster.getDataBuffer
        .asInstanceOf[java.awt.image.DataBufferInt].getData
      var p = 0
      while (p < side * side) {
        val r = bytes((p * 3) % n) & 0xff
        val g = bytes((p * 3 + 1) % n) & 0xff
        val b = bytes((p * 3 + 2) % n) & 0xff
        buf(p) = (r << 16) | (g << 8) | b
        p += 1
      }
      img
    }

    def encodePng(img: BufferedImage): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      ImageIO.write(img, "png", out)
      out.toByteArray
    }

    /** None if the payload isn't a decodable image. */
    def decode(payload: Array[Byte]): Option[BufferedImage] =
      Option(ImageIO.read(new ByteArrayInputStream(payload)))

    /** 8-bin luminance histogram (normalized) + mean luminance 0-255,
      * Rec.601 weights.
      */
    def luminance(img: BufferedImage): (Array[Double], Double) = {
      val bins = new Array[Double](8)
      var sum = 0.0
      val w = img.getWidth; val h = img.getHeight
      // one bulk getRGB instead of w·h ColorModel round-trips — the
      // returned ARGB ints are identical to per-pixel getRGB (r21)
      val px = img.getRGB(0, 0, w, h, null, 0, w)
      var i = 0
      while (i < px.length) {
        val rgb = px(i)
        val lum = 0.299 * ((rgb >> 16) & 0xff) +
                  0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
        bins(math.min((lum / 32.0).toInt, 7)) += 1.0
        sum += lum
        i += 1
      }
      val n = (w * h).toDouble
      (bins.map(_ / n), sum / n)
    }

    def resize(img: BufferedImage, w: Int, h: Int): BufferedImage = {
      val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try {
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(img, 0, 0, w, h, null)
      } finally g.dispose()
      out
    }
  }

  /** REAL audio codec on the JDK's javax.sound.sampled — WAV/PCM
    * parse+synthesis ships with the JVM, like ImageIO for images.
    */
  object AudioCodec {
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

    def init(): AudioCodec.type = this

    /** Deterministic ingest: successive byte pairs → signed 16-bit PCM
      * samples (little-endian), mono WAV at `sampleRate`.
      */
    def samplesFromBytes(bytes: Array[Byte]): Array[Short] = {
      val n = math.max(bytes.length / 2, 1)
      Array.tabulate(n) { i =>
        val lo = if (2 * i < bytes.length) bytes(2 * i) & 0xff else 0
        val hi = if (2 * i + 1 < bytes.length) bytes(2 * i + 1) & 0xff else 0
        ((hi << 8) | lo).toShort
      }
    }

    def encodeWav(samples: Array[Short], sampleRate: Int): Array[Byte] = {
      val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        sampleRate.toFloat, 16, 1, 2, sampleRate.toFloat, false)
      val raw = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        raw(2 * i) = (samples(i) & 0xff).toByte
        raw(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
        i += 1
      }
      val ais = new AudioInputStream(
        new ByteArrayInputStream(raw), fmt, samples.length.toLong)
      val out = new ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }

    /** None if the payload isn't parseable audio. */
    def decode(payload: Array[Byte]): Option[(Array[Short], Int)] =
      try {
        val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
        val fmt = ais.getFormat
        val raw = ais.readAllBytes()
        val big = fmt.isBigEndian
        val samples = Array.tabulate(raw.length / 2) { i =>
          val (lo, hi) = if (big) (raw(2 * i + 1), raw(2 * i)) else (raw(2 * i), raw(2 * i + 1))
          (((hi & 0xff) << 8) | (lo & 0xff)).toShort
        }
        Some((samples, fmt.getSampleRate.toInt))
      } catch { case _: Exception => None }

    /** 8-bin |amplitude| histogram (normalized) + RMS scaled to 0-255
      * so the feature column stays comparable across modalities.
      */
    def energy(samples: Array[Short]): (Array[Double], Double) = {
      val bins = new Array[Double](8)
      var sumSq = 0.0
      var i = 0
      while (i < samples.length) {
        val a = math.abs(samples(i).toInt)
        bins(math.min(a >> 12, 7)) += 1.0
        sumSq += a.toDouble * a
        i += 1
      }
      val n = math.max(samples.length, 1)
      val rms = math.sqrt(sumSq / n) / 32768.0 * 255.0
      (bins.map(_ / n), rms)
    }
  }

  /** Fabricate a deterministic media corpus from the documents table
    * (text bytes as payload) — the ingest path a real pipeline would
    * replace with binary file reads. Partitioned by media_id hash.
    */
  def ingestFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("source"))
      .map { r =>
        val bytes = r.getString(1).getBytes("UTF-8")
        val tpe = if (r.getLong(0) % 3 == 0) "image"
                  else if (r.getLong(0) % 3 == 1) "audio" else "video"
        // images carry a REAL PNG payload, audio a REAL WAV payload
        // (both synthesized from the text bytes); video keeps raw
        // bytes for the stub codec (no video codec in the JDK)
        // Image side varies per document (8..24) so dimension-sensitive
        // consumers (m63's header cross-check) see real variety.
        val side = (8 + r.getLong(0) % 17).toInt
        val payload = tpe match {
          case "image" => ImageCodec.encodePng(ImageCodec.imageFromBytes(bytes, side))
          case "audio" => AudioCodec.encodeWav(AudioCodec.samplesFromBytes(bytes), 16000)
          case _ => bytes
        }
        val (w, h) = if (tpe == "image") (side, side) else (64, 64)
        MediaRecord(r.getLong(0),
          MediaMeta(tpe, width = w, height = h, sample_rate = 16000,
            duration_ms = bytes.length.toLong),
          payload)
      }
  }

  /** Feature extraction: one codec init per partition, then a tight
    * per-record loop — the batch shape that matters at scale. Images
    * go through the real ImageIO decode (luminance histogram +
    * brightness); other modalities through the stub.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val img = ImageCodec.init()
      val aud = AudioCodec.init()
      val stub = StubCodec.init()
      it.map { m =>
        val (hist, brightness) = m.meta.media_type match {
          case "image" =>
            img.decode(m.payload).map(img.luminance)
              .getOrElse(stub.decode(m.payload)) // undecodable image bytes
          case "audio" =>
            aud.decode(m.payload).map(d => aud.energy(d._1))
              .getOrElse(stub.decode(m.payload))
          case _ => stub.decode(m.payload)
        }
        MediaFeatures(m.media_id, m.meta.media_type, m.payload.length,
          hist, brightness)
      }
    }
  }

  /** Frame sampling for "video" payloads: every `stride` bytes yields a
    * `frameSize`-byte pseudo-frame (a real impl samples keyframes).
    * Explodes rows — output partitioning follows the input, so no
    * shuffle is introduced by sampling itself.
    */
  def sampleFrames(media: Dataset[MediaRecord], frameSize: Int, stride: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.meta.media_type == "video").flatMap { m =>
      Iterator.range(0, math.max(m.payload.length - frameSize, 0), stride)
        .zipWithIndex.map { case (off, no) =>
          Frame(m.media_id, no, off, m.payload.slice(off, off + frameSize))
        }
    }
  }

  /** Resize: REAL for images (ImageIO decode → bilinear scale → PNG
    * re-encode, payload replaced); metadata-only for audio/video
    * (their codec seam is still stubbed).
    */
  def resize(media: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val img = ImageCodec.init()
      it.map { m =>
        if (m.meta.media_type == "image")
          img.decode(m.payload) match {
            case Some(decoded) =>
              m.copy(meta = m.meta.copy(width = w, height = h),
                payload = img.encodePng(img.resize(decoded, w, h)))
            case None => m.copy(meta = m.meta.copy(width = w, height = h))
          }
        else m.copy(meta = m.meta.copy(width = w, height = h))
      }
    }
  }
}
