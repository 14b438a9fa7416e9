package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Continuous embedding-space drift monitoring — the streaming twin of
  * q256's batch audit (per-dimension Welch between a reference corpus
  * arm and the live feed): an ingestion pipeline that embeds documents
  * continuously wants "has the embedding distribution moved?" per
  * arriving window, per dimension — a retrained upstream encoder or a
  * shifted source mix moves the mean embedding long before scalar
  * metadata notices.
  *
  * Split the [[DriftMonitor]] way:
  *
  *  - [[refModel]] runs ONCE, batch-side: per-dimension reference
  *    moments (n, Σx, Σx²) on q256's integer 1e-8 micro-long
  *    discipline — |dims| rows of broadcast metadata.
  *  - [[welch]] is ONE streaming aggregation: each arriving vector
  *    explodes to its |dims| micro-long cells, the per-(window, dim)
  *    state is two long sums + a count (fixed width), and the Welch
  *    fold runs in the post-agg projection against the broadcast
  *    moments. Plain DataFrame code — the same function on a batch
  *    frame is the identical result (streamed == batch, pinned by
  *    StreamingDriftSpec and the entry's REQUIRE gate).
  *
  * Scale: state is (windows in flight) × |dims| × 3 numbers; the model
  * is KB broadcast; the explode is narrow. Nothing grows with stream
  * volume. Long bound: the q256 argument (Σ|xm| ≤ ~1e9·n — safe
  * through ~10⁹ vectors per window; lift to Sum128 beyond).
  */
object EmbeddingDriftMonitor {

  /** Micro-long scale (q256's): element sums in integer 1e-8 units. */
  private val M = 1e8

  /** |t| gate for the per-dimension shifted flag (q256's). */
  private val TGate = 3.0

  private def cells(e: org.apache.spark.sql.Column) = Seq(
    round(e * lit(M), 0).cast("long"),
    round(e * e * lit(M), 0).cast("long"))

  /** Per-dimension reference moments from a batch frame with an
    * `embedding` column: (dim, nr, srm, ssrm) — |dims| rows, pinned.
    */
  def refModel(ref: DataFrame): DataFrame = {
    val e = col("col").cast("double")
    val Seq(xm, xxm) = cells(e)
    ref.select(posexplode(col("embedding")))
      .select(col("pos").as("dim"), xm.as("xm"), xxm.as("xxm"))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("nr"), sum(col("xm")).as("srm"),
        sum(col("xxm")).as("ssrm"))
      .localCheckpoint(true) // |dims| rows — the broadcast model
  }

  /** Windowed per-dimension Welch t of the feed against [[refModel]].
    *
    * @param cur stream OR batch with (ts, embedding)
    * @return (ws, dim, n_cur, t_stat, shifted) — t NULL when either
    *         side cannot form a variance (n < 2 or se² = 0), mirroring
    *         q256's constant-dimension contract
    */
  def welch(cur: DataFrame, model: DataFrame, windowDur: String,
      watermark: String = "0 seconds"): DataFrame = {
    val e = col("col").cast("double")
    val Seq(xm, xxm) = cells(e)
    val g = cur
      .withWatermark("ts", watermark)
      .select(col("ts"), posexplode(col("embedding")))
      .select(col("ts"), col("pos").as("dim"), xm.as("xm"), xxm.as("xxm"))
      .groupBy(window(col("ts"), windowDur), col("dim"))
      .agg(count(lit(1)).as("nc"), sum(col("xm")).as("scm"),
        sum(col("xxm")).as("sscm"))
      .join(broadcast(model), "dim")
    val (sc, ssc) = (col("scm").cast("double"), col("sscm").cast("double"))
    val (sr, ssr) = (col("srm").cast("double"), col("ssrm").cast("double"))
    val mc = sc / M / col("nc")
    val mr = sr / M / col("nr")
    val vc = (ssc / M - sc / M * (sc / M) / col("nc")) / (col("nc") - 1)
    val vr = (ssr / M - sr / M * (sr / M) / col("nr")) / (col("nr") - 1)
    val se2 = vc / col("nc") + vr / col("nr")
    val t = (mc - mr) / sqrt(se2)
    val formed = col("nc") > 1 && col("nr") > 1 && se2 > 0
    g.select(col("window.start").as("ws"), col("dim"),
      col("nc").as("n_cur"),
      when(formed, round(t, 6)).as("t_stat"),
      when(formed, abs(round(t, 6)) > TGate).as("shifted"))
  }
}
