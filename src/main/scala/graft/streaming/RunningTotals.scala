package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

/** Arbitrary stateful streaming via `transformWithState` (Spark 4's
  * successor to `mapGroupsWithState` — typed state variables managed by
  * the state-store handle, RocksDB-backed, with per-variable TTL):
  * a per-user running (event count, revenue) ledger that survives across
  * micro-batches and emits the refreshed totals on every update.
  *
  * Where q93's topKStream folds ONE opaque state blob per key through
  * `flatMapGroupsWithState`, this operator demonstrates the modern API:
  * named `ValueState` registered in `init`, state encoded with a product
  * encoder, and the processor decoupled from the query graph (the same
  * instance serves any keyed stream of (key, value) pairs).
  *
  * Money is held in integer cents so state updates are exact — the
  * running sum never drifts from the batch `groupBy` twin, which the
  * spec pins (EventStreamSpec: final emission per user == batch
  * count/sum over the union of all fed batches).
  *
  * Scale: state is (one 16-byte tuple) × (distinct users), hash-
  * partitioned on the key by the shuffle preceding the stateful
  * operator; RocksDB spills it off-heap, so the 100× risk metric is the
  * Observability.stateBytes feed, not executor heap.
  */
class RunningTotals
    extends StatefulProcessor[Long, (Long, Double), (Long, Long, Double)] {

  @transient private var totals: ValueState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    totals = getHandle.getValueState[(Long, Long)]("totals",
      Encoders.product[(Long, Long)], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, Double)],
      timers: TimerValues): Iterator[(Long, Long, Double)] = {
    val (n0, c0) = Option(totals.get()).getOrElse((0L, 0L))
    val (n, c) = rows.foldLeft((n0, c0)) { case ((an, ac), (_, v)) =>
      (an + 1L, ac + math.round(v * 100))
    }
    totals.update((n, c))
    Iterator.single((key, n, c / 100.0))
  }
}

object RunningTotals {

  /** Wire a keyed (user_id, value) stream through the processor.
    * Requires the RocksDB state-store provider
    * (`spark.sql.streaming.stateStore.providerClass`) — transformWithState
    * rejects the default HDFS-backed store.
    */
  def runningUserTotals(events: Dataset[(Long, Double)])
      : Dataset[(Long, Long, Double)] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .transformWithState(new RunningTotals, TimeMode.None(),
        OutputMode.Update())
  }
}
