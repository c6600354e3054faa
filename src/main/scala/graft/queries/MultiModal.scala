package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.multimodal.Media

/** Multimodal pipeline queries (binary payload → stub decode →
  * features / frames). Rows-only driver checks (the decode stub isn't
  * SQL-expressible); MediaSpec covers the semantics.
  */
object MultiModal {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // per-modality feature aggregate over decoded payloads
    "m60_media_features" -> ((s, dir) => {
      val feats = Media.extractFeatures(Media.ingestFromDocuments(s, dir))
      feats.toDF()
        .groupBy(col("media_type"))
        .agg(count(lit(1)).as("n_media"),
             sum(col("n_bytes")).as("total_bytes"),
             max(col("brightness")).as("max_brightness"),
             min(col("brightness")).as("min_brightness"))
    }),

    // pseudo-frame sampling from "video" payloads
    "m61_frame_sampling" -> ((s, dir) => {
      val frames = Media.sampleFrames(Media.ingestFromDocuments(s, dir),
        frameSize = 64, stride = 32)
      frames.toDF()
        .groupBy(col("media_id"))
        .agg(count(lit(1)).as("n_frames"), max(col("offset")).as("last_offset"))
    })
  )

  def oracles: Map[String, String] = Map.empty
}
