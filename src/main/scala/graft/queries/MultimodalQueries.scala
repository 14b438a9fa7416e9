package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Multimodal pipeline surfaced as queries (rows-only driver check — the
  * decode kernels are stubs, not SQL-expressible; MultimodalSpec pins the
  * semantics).
  */
object MultimodalQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // decode/feature-extract pass: per-kind feature statistics
    "mm_decode_stats" -> ((s, d) => {
      Multimodal.decodeFeatures(Multimodal.syntheticAssets(s, d))
        .toDF()
        .groupBy(col("kind"))
        .agg(count(lit(1)).as("n_assets"),
          sum(col("byte_len")).as("total_bytes"),
          round(avg(col("mean_byte")), 6).as("avg_mean_byte"))
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
