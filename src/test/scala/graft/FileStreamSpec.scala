package graft

import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.EventStream

/** §2.10 end-to-end with the real file source: readStream over the
  * driver's events parquet → watermarked windowed aggregation → memory
  * sink, equal to the batch twin.
  */
class FileStreamSpec extends SparkSpec {

  test("parquet file stream → windowed counts == batch result") {
    val streamed = EventStream.windowedCounts(
      EventStream.readEventsStream(spark, sf))
    EventStream.runToMemory(streamed, "file_wc", OutputMode.Complete())
    val got = spark.table("file_wc").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    val want = EventStream.windowedCounts(Tables(spark, sf, "events"))
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(got == want && got.nonEmpty)
  }
}
