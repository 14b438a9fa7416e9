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

  test("windowed counts recover from checkpoint across a restart") {
    import java.nio.file.Files
    import java.sql.Timestamp
    import org.apache.spark.sql.functions.col
    import spark.implicits._

    val src = Files.createTempDirectory("graft-stream-src")
    val ckpt = Files.createTempDirectory("graft-stream-ckpt")
    def ev(minute: Int, t: String): (Timestamp, String, Double) =
      (new Timestamp(minute * 60000L), t, 1.0)
    val part1 = Seq(ev(0, "a"), ev(1, "a"), ev(12, "b"))
    val part2 = Seq(ev(2, "a"), ev(25, "c"))
    val all = (part1 ++ part2).toDF("ts", "event_type", "value")
    val schema = all.schema

    part1.toDF("ts", "event_type", "value")
      .write.parquet(s"$src/p1")
    def run(): Unit = {
      val q = EventStream.windowedCounts(
        spark.readStream.schema(schema)
          .option("recursiveFileLookup", "true").parquet(src.toString))
        .writeStream.format("memory").queryName("ckpt_wc")
        .outputMode(OutputMode.Complete())
        .option("checkpointLocation", ckpt.toString)
        .start()
      q.processAllAvailable(); q.stop()
    }
    run()
    // restart: the first delivery is DELETED from the source dir, so the
    // final result can only be complete if (a) the file-source log knows
    // p1 was processed and (b) the aggregation state was recovered from
    // the checkpoint — the two halves of exactly-once restart semantics
    def rmTree(p: java.nio.file.Path): Unit = {
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.delete(f))
    }
    rmTree(src.resolve("p1"))
    part2.toDF("ts", "event_type", "value")
      .write.parquet(s"$src/p2")
    run()

    val got = spark.table("ckpt_wc").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    val want = EventStream.windowedCounts(all).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(got == want && got.nonEmpty,
      s"restart must resume from checkpoint state: got $got want $want")
  }
}
