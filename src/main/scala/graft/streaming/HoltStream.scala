package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

import graft.queries.TrendOps

/** Streaming twin of q247's Holt linear-trend smoothing.
  *
  * The batch side folds the coupled (level, trend) recurrence over the
  * whole daily series per key; the stream carries exactly TWO DOUBLES
  * (plus a seen counter) of `ValueState` per key and folds only each
  * micro-batch's arrivals — incremental O(delta) where the batch twin
  * re-walks the series. Same pairing rationale as ClampedBalance:
  * recurrences windows can't express are the ones per-key state holds
  * as scalars.
  *
  * Ordering contract (the ClampedBalance/CDC ledger-replay contract):
  * within a micro-batch rows sort by day before folding; across batches
  * the feed must replay in day order — a genuinely late day needs the
  * batch twin's recompute.
  *
  * α and β are exact binary fractions and x is an exact 2-dp double, so
  * the streamed fold is the SAME IEEE sequence as q247's flatMapGroups
  * fold — HoltStreamSpec pins streamed == batch BITWISE across a
  * 2-batch split, and the driver entry requires it on the full series.
  */
class HoltStream extends StatefulProcessor[
    String, HoltStream.Point, HoltStream.Out] {

  @transient private var st: ValueState[(Double, Double, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[(Double, Double, Long)]("holt",
      Encoders.product[(Double, Double, Long)], TTLConfig.NONE)

  override def handleInputRows(key: String,
      rows: Iterator[HoltStream.Point],
      timers: TimerValues): Iterator[HoltStream.Out] = {
    var (level, trend, seen) =
      Option(st.get()).getOrElse((0.0, 0.0, 0L))
    val out = rows.toArray.sortBy(_._2).map { p =>
      val x = p._3
      if (seen == 0L) { level = x; trend = 0.0 }
      else {
        val nl = TrendOps.HoltAlpha * x +
          (1 - TrendOps.HoltAlpha) * (level + trend)
        trend = TrendOps.HoltBeta * (nl - level) +
          (1 - TrendOps.HoltBeta) * trend
        level = nl
      }
      seen += 1L
      (key, p._2, x, level, trend, level + trend)
    }
    st.update((level, trend, seen))
    out.iterator
  }
}

object HoltStream {
  /** (event_type, epochDay, x) — the daily point the fold consumes. */
  type Point = (String, Int, Double)
  /** (event_type, epochDay, x, level, trend, forecast_next). */
  type Out = (String, Int, Double, Double, Double, Double)

  def smoothed(points: Dataset[Point]): Dataset[Out] = {
    import points.sparkSession.implicits._
    points.groupByKey(_._1)
      .transformWithState(new HoltStream, TimeMode.None(),
        OutputMode.Update())
  }
}
