package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

import graft.queries.TrendOps

/** Streaming twin of q248's additive Holt-Winters smoothing.
  *
  * Extends [[HoltStream]]'s two-double state with the SEASONAL ring:
  * per key the state carries (level, trend, the m = 7 season factors,
  * the ≤ m-element warm-up buffer, seen counter) — O(m) scalars, still
  * KB-bounded metadata per key. Warm-up days accumulate silently until
  * m values arrive (level = their left-associative mean, s_i = x_i −
  * mean, matching the batch fold exactly); every later day folds
  * through [[TrendOps.hwStep]] — the SAME function object the batch
  * twin calls, so streamed == batch is bitwise by construction, not by
  * tolerance.
  *
  * Ordering contract (the HoltStream/ClampedBalance ledger-replay
  * contract): within a micro-batch rows sort by day before folding;
  * across batches the feed must replay in day order — a genuinely late
  * day needs the batch twin's recompute.
  */
class HoltWintersStream extends StatefulProcessor[
    String, HoltWintersStream.Point, HoltWintersStream.Out] {

  @transient private var st: ValueState[HoltWintersStream.State] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[HoltWintersStream.State]("hw",
      Encoders.product[HoltWintersStream.State], TTLConfig.NONE)

  override def handleInputRows(key: String,
      rows: Iterator[HoltWintersStream.Point],
      timers: TimerValues): Iterator[HoltWintersStream.Out] = {
    val m = TrendOps.HwPeriod
    var (level, trend, seas, buf) = Option(st.get())
      .map(s => (s._1, s._2, s._3, s._4))
      .getOrElse((0.0, 0.0, Seq.empty[Double], Seq.empty[Double]))
    val out = Seq.newBuilder[HoltWintersStream.Out]
    rows.toArray.sortBy(_._2).foreach { p =>
      val x = p._3
      if (seas.isEmpty) {
        // warm-up: buffer until m days, then seed exactly as the batch
        // fold does (left-associative mean, s_i = x_i − mean)
        buf = buf :+ x
        if (buf.length == m) {
          var bar = 0.0
          buf.foreach(bar += _)
          bar /= m
          level = bar; trend = 0.0
          seas = buf.map(_ - bar)
          buf = Seq.empty
        }
      } else {
        val sOld = seas.head
        val (nl, nt, ns) = TrendOps.hwStep(x, level, trend, sOld)
        level = nl; trend = nt
        seas = seas.tail :+ ns
        out += ((key, p._2, x, level, trend, ns, level + trend + seas.head))
      }
    }
    st.update((level, trend, seas, buf))
    out.result().iterator
  }
}

object HoltWintersStream {
  /** (event_type, epochDay, x) — the daily point the fold consumes. */
  type Point = (String, Int, Double)
  /** (event_type, epochDay, x, level, trend, season, forecast_next). */
  type Out = (String, Int, Double, Double, Double, Double, Double)
  /** (level, trend, season ring, warm-up buffer). */
  type State = (Double, Double, Seq[Double], Seq[Double])

  def smoothed(points: Dataset[Point]): Dataset[Out] = {
    import points.sparkSession.implicits._
    points.groupByKey(_._1)
      .transformWithState(new HoltWintersStream, TimeMode.None(),
        OutputMode.Update())
  }
}
