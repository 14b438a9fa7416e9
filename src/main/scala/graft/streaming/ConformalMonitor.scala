package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Continuous conformal-coverage monitoring — the MODEL-centric drift
  * alarm beside [[DriftMonitor]]'s data-centric PSI/EMD: a serving
  * pipeline wraps a point model in q254's split-conformal interval
  * (half-width q̂, a distribution-free ≥ 1−α guarantee under
  * exchangeability) and watches the EMPIRICAL coverage per arriving
  * window. Coverage collapsing below 1−α−slack means the
  * feature/label relationship moved — exactly the regime change that
  * invalidates the served model, caught without labels' distribution
  * assumptions.
  *
  * Split the DriftMonitor way: the model (per-flag slope/intercept/q̂,
  * ≤ |flags| rows — driver metadata from `InferenceOps.conformalFit`)
  * broadcasts into ONE streaming aggregation with two conditional sums
  * of fixed-width state per (window, flag). Plain DataFrame code, so
  * the same function on a batch frame is the identical result — the
  * streamed == batch pin (StreamingDriftSpec) and the stream_conformal
  * entry's REQUIRE gate.
  *
  * Scale: state is (windows in flight) × |flags| × 2 counters; the
  * model is KB broadcast; the residual is a narrow codegen'd
  * projection. Nothing grows with stream volume.
  */
object ConformalMonitor {

  /** degraded gate: 1 − α − 0.05 with q254's α = 0.1. */
  val CoverageFloor = 0.85

  /** Windowed empirical coverage of a fixed conformal interval.
    *
    * @param events stream OR batch with (ts, f, x, y)
    * @param model  (f, slope, intercept, q_hat) — broadcast
    * @return (ws, f, n, coverage, degraded) per closed window per flag;
    *         inner model join (an unmodeled flag has no interval — the
    *         DriftMonitor.psi contract)
    */
  def coverage(events: DataFrame, model: DataFrame, windowDur: String,
      watermark: String = "0 seconds"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .join(broadcast(model), "f")
      .withColumn("r",
        abs(col("y") - (col("intercept") + col("slope") * col("x"))))
      .groupBy(window(col("ts"), windowDur), col("f"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("r") <= col("q_hat"), 1L).otherwise(0L))
          .as("covered"))
      .select(col("window.start").as("ws"), col("f"), col("n"),
        round(col("covered").cast("double") / col("n"), 6).as("coverage"))
      .withColumn("degraded", col("coverage") < lit(CoverageFloor))
}
