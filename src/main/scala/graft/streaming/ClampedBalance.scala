package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

/** Streaming twin of q243's clamp-at-zero inventory balance.
  *
  * The batch side needs Lindley's closed form because no WINDOW can
  * express B_i = max(0, B_{i−1} + δ_i); a stateful stream expresses the
  * recurrence DIRECTLY — the balance is one number per key carried in
  * `ValueState`, and each micro-batch folds only its arrivals:
  * incremental O(delta) per batch where the batch twin re-walks the
  * ledger. The pairing is deliberate: recurrences that windows cannot
  * express incrementally are exactly the ones per-key state holds as a
  * single scalar.
  *
  * Ordering contract: rows WITHIN a micro-batch arrive unordered, so
  * the handler sorts each batch's moves by the q243 event key
  * (time, orderkey, linenumber, delta) before folding. ACROSS batches
  * the operator relies on the feed replaying in event order — the same
  * ledger-replay contract as CDC apply; a genuinely late move needs the
  * batch twin's full recompute, which is what it is for.
  *
  * All quantities ride as exact 1e4 fixed-point longs (the decimal
  * (18,4) discipline without decimal state), so the streamed fold lands
  * bit-identically on the batch result — ClampedBalanceSpec pins
  * streamed == q243-shaped batch fold across a 2-batch split, and the
  * driver entry requires it on the full table before returning.
  *
  * Scale: state is 4 longs × distinct suppliers, hash-partitioned by
  * the stateful shuffle; RocksDB holds it off-heap.
  */
class ClampedBalance extends StatefulProcessor[
    Long, ClampedBalance.Move, ClampedBalance.Out] {

  @transient private var st: ValueState[(Long, Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[(Long, Long, Long, Long)]("bal",
      Encoders.product[(Long, Long, Long, Long)], TTLConfig.NONE)

  override def handleInputRows(key: Long,
      rows: Iterator[ClampedBalance.Move],
      timers: TimerValues): Iterator[ClampedBalance.Out] = {
    var (bal, lost, stockouts, moves) =
      Option(st.get()).getOrElse((0L, 0L, 0L, 0L))
    rows.toArray.sortBy(m => (m._2, m._3, m._4, m._5)).foreach { m =>
      val next = bal + m._5
      if (next < 0L) { stockouts += 1L; lost += -next; bal = 0L }
      else bal = next
      moves += 1L
    }
    st.update((bal, lost, stockouts, moves))
    Iterator.single((key, bal / 1e4, lost / 1e4, stockouts, moves))
  }
}

object ClampedBalance {
  /** (suppkey, sortTime, orderkey, linenumber, delta1e4) */
  type Move = (Long, Long, Long, Int, Long)
  /** (suppkey, balance, lost, stockouts, moves) */
  type Out = (Long, Double, Double, Long, Long)

  def runningBalances(moves: Dataset[Move]): Dataset[Out] = {
    import moves.sparkSession.implicits._
    moves.groupByKey(_._1)
      .transformWithState(new ClampedBalance, TimeMode.None(),
        OutputMode.Update())
  }
}
