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
  * The actual byte decoding is STUBBED (no image/audio libraries in
  * this container): `StubCodec` derives deterministic pseudo-features
  * from the payload bytes, and is the single seam to replace with a
  * real codec (JavaCV, TwelveMonkeys, javax.sound) in production.
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

  /** Fabricate a deterministic media corpus from the documents table
    * (text bytes as payload) — the ingest path a real pipeline would
    * replace with binary file reads. Partitioned by media_id hash.
    */
  def ingestFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("source"))
      .map { r =>
        val payload = r.getString(1).getBytes("UTF-8")
        val tpe = if (r.getLong(0) % 3 == 0) "image"
                  else if (r.getLong(0) % 3 == 1) "audio" else "video"
        MediaRecord(r.getLong(0),
          MediaMeta(tpe, width = 64, height = 64, sample_rate = 16000,
            duration_ms = payload.length.toLong),
          payload)
      }
  }

  /** Feature extraction: one codec init per partition, then a tight
    * per-record loop — the batch shape that matters at scale.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val codec = StubCodec.init()
      it.map { m =>
        val (hist, brightness) = codec.decode(m.payload)
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

  /** "Resize" stub: metadata-only transform (a real impl re-encodes the
    * payload); keeps the payload column untouched.
    */
  def resize(media: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.map(m => m.copy(meta = m.meta.copy(width = w, height = h)))
  }
}
