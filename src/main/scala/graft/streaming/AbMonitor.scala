package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Continuous experiment-health monitoring — the streaming twin of
  * q268's batch audit: a live A/B dashboard wants, per arriving window
  * and metric, the arm mean difference AND the sample-ratio-mismatch
  * alarm [Fabijan et al., KDD'19] — a broken assignment (one arm
  * under-delivered by a config push) invalidates the experiment from
  * that window on, and catching it a window late burns the traffic.
  *
  * ONE windowed aggregation: per (window, event_type) the state is two
  * counts + two DECIMAL sums (exact, order-free across micro-batches —
  * the dsum discipline); mean diff and the 50/50 chi² assemble in the
  * post-agg projection. Plain DataFrame code — the same call on a
  * batch frame is the identical result (streamed == batch, pinned by
  * the spec and the entry's REQUIRE gate). Nothing grows with stream
  * volume.
  */
object AbMonitor {

  /** χ²(1) at α = 0.05 — the q268 SRM gate, shared 6-dp literal. */
  val SrmGate = 3.841459

  /** Windowed per-metric A/B health of the feed.
    *
    * @param cur stream OR batch with (ts, user_id, event_type, value)
    * @return (ws, event_type, n_a, n_b, mean_diff, srm_chi2, srm_alarm)
    *         — mean_diff NULL while either arm is empty
    */
  def health(cur: DataFrame, windowDur: String,
      watermark: String = "0 seconds"): DataFrame = {
    val a = col("user_id") % 2 === 0
    val x = col("value").cast(DecimalType(18, 4))
    val g = cur.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(count(when(a, 1)).as("n_a"), count(when(!a, 1)).as("n_b"),
        sum(when(a, x)).as("sa"), sum(when(!a, x)).as("sb"))
    val nT = (col("n_a") + col("n_b")).cast("double")
    val srm = (col("n_a") - nT / 2) * (col("n_a") - nT / 2) / (nT / 2) +
      (col("n_b") - nT / 2) * (col("n_b") - nT / 2) / (nT / 2)
    g.select(col("window.start").as("ws"), col("event_type"),
      col("n_a"), col("n_b"),
      round(col("sa").cast("double") / col("n_a")
        - col("sb").cast("double") / col("n_b"), 6).as("mean_diff"),
      round(srm, 6).as("srm_chi2"),
      (srm > lit(SrmGate)).as("srm_alarm"))
  }
}
