package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig, ValueState}

/** CONTINUOUS inverted-index maintenance — the streaming twin of q72's
  * dictionary build: a search pipeline doesn't index once, it folds
  * every arriving document into the served dictionary.
  *
  * The index row (term → document frequency, collection frequency) is
  * an ADDITIVE aggregate, so incremental maintenance is exact: each
  * micro-batch contributes its own postings partials and the per-term
  * `ValueState` (TWO LONGS) carries the running totals — O(delta
  * postings) per batch where a batch rebuild re-reads the corpus.
  *
  * Contract: a document arrives EXACTLY ONCE across the stream (the
  * ledger-replay contract every incremental op here shares — dedup
  * upstream if the feed can repeat docs). Within a batch, df counts
  * each document once per term regardless of its term frequency —
  * distinct-by-doc inside the handler, which is batch-bounded per term.
  *
  * Scale: state is 2 longs × |vocabulary| — vocabulary-bounded, not
  * corpus-bounded (Heaps' law keeps it sublinear); hash-partitioned by
  * the stateful shuffle, RocksDB off-heap. IndexStreamSpec pins the
  * 2-batch fold == hand counts and == the batch q72 aggregation; the
  * driver entry requires final == q72 on the full corpus.
  */
class IndexStream extends StatefulProcessor[
    String, (String, Long), (String, Long, Long)] {

  @transient private var st: ValueState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[(Long, Long)]("idx",
      Encoders.product[(Long, Long)], TTLConfig.NONE)

  override def handleInputRows(term: String,
      rows: Iterator[(String, Long)],
      timers: TimerValues): Iterator[(String, Long, Long)] = {
    var (df, cf) = Option(st.get()).getOrElse((0L, 0L))
    val docs = rows.map(_._2).toArray
    cf += docs.length
    df += docs.distinct.length
    st.update((df, cf))
    Iterator.single((term, df, cf))
  }
}

object IndexStream {

  /** postings stream (term, doc_id) → running (term, df, cf). */
  def maintained(postings: Dataset[(String, Long)])
      : Dataset[(String, Long, Long)] = {
    import postings.sparkSession.implicits._
    postings.groupByKey(_._1)
      .transformWithState(new IndexStream, TimeMode.None(),
        OutputMode.Update())
  }
}
