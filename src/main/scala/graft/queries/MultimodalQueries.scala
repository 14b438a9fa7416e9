package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Multimodal pipeline surfaced as queries (rows-only driver check —
  * all three decode paths are REAL and JDK-native: image via
  * javax.imageio pixel decode, audio via javax.sound.sampled WAV/PCM
  * decode, video via multi-frame GIF decode with actual frame
  * extraction. None is SQL-expressible, so MultimodalSpec pins the
  * semantics against known payloads).
  */
object MultimodalQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // decode/feature-extract pass: per-kind feature statistics. For
    // every kind n_decoded == n_assets (real pixel / sample / frame
    // decode); luma and rms stats are -1 sentinels for the kinds the
    // respective decoder doesn't apply to.
    "mm_decode_stats" -> ((s, d) => {
      Multimodal.decodeFeatures(Multimodal.syntheticAssets(s, d))
        .toDF()
        .groupBy(col("kind"))
        .agg(count(lit(1)).as("n_assets"),
          sum(col("byte_len")).as("total_bytes"),
          round(avg(col("mean_byte")), 6).as("avg_mean_byte"),
          round(avg(col("mean_luma")), 6).as("avg_mean_luma"),
          round(avg(col("rms")), 6).as("avg_rms"),
          sum(when(col("real_decode"), 1L).otherwise(0L)).as("n_decoded"))
    }),
    // frame-sampling pass: kept-frame counts per kind
    "mm_frame_sample" -> ((s, d) =>
      Multimodal.frameSample(Multimodal.syntheticAssets(s, d), 2)
        .groupBy(col("kind"))
        .agg(count(lit(1)).as("n_frames"),
          sum(length(col("frame"))).as("frame_bytes")))
  )

  def oracle: Map[String, String] = Map.empty
}
