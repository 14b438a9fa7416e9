package graft.streaming

import org.apache.spark.sql.Dataset

/** Driver-side cap for the harness-scale MemoryStream feeds (round-10
  * verdict item 4).
  *
  * Several `SparkEntry.queries` entries replay a slice of a table
  * through a REAL two-batch `MemoryStream` to prove streamed == batch
  * for a monitor. `MemoryStream.addData` takes driver-local values, so
  * those entries `collect()` the slice — fine at harness SF, a silent
  * driver OOM if someone points the ENTRY (not the monitor, which is a
  * genuine `readStream` consumer) at a production-sized dataset. This
  * guard makes that mistake fail LOUDLY and cheaply: it collects at
  * most `MaxFeedRows + 1` rows via `limit`, so the failing path never
  * pulls more than the cap either.
  *
  * The cap is sized ~30× above the largest sf0.1 harness slice (~60 k
  * docs) — far below driver-heap danger, far above anything the
  * harness feeds.
  */
object FeedGuard {

  val MaxFeedRows: Int = 2000000

  /** Collect `ds` for a MemoryStream feed, failing with a message
    * naming `entry` if it exceeds `cap` (default [[MaxFeedRows]]; the
    * parameter exists so FeedGuardSpec can exercise the failure mode
    * without materializing two million rows).
    */
  def collectFeed[T](ds: Dataset[T], entry: String,
      cap: Int = MaxFeedRows): Seq[T] = {
    val rows = ds.limit(cap + 1).collect()
    require(rows.length <= cap,
      s"'$entry' is a harness-scale entry: it collects the arriving " +
        s"slice to the driver to feed a MemoryStream replay, and the " +
        s"slice exceeds $cap rows. For production-sized data " +
        "attach the underlying monitor to a file/Kafka readStream " +
        "instead of running this entry.")
    rows.toSeq
  }
}
