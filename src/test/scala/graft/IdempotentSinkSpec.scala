package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.IdempotentSink

class IdempotentSinkSpec extends SparkSpec {
  import spark.implicits._

  test("replayed batchId is suppressed; distinct batches all land") {
    val root = Files.createTempDirectory("graft_sink").toString
    val b0 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val b1 = Seq((3L, "c")).toDF("id", "v")

    assert(IdempotentSink.write(b0, root, 0))
    assert(IdempotentSink.write(b1, root, 1))
    // failure replay: same batchId arrives again — must be a no-op even
    // if the replayed frame differs (the first commit won)
    assert(!IdempotentSink.write(b1.union(b1), root, 1))

    val got = IdempotentSink.readCommitted(spark, root)
      .select("id", "v").collect().map(r => (r.getLong(0), r.getString(1)))
      .toSet
    assert(got == Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("crashed attempt (data, no marker) is invisible until its replay commits") {
    val root = Files.createTempDirectory("graft_sink_crash").toString
    IdempotentSink.write(Seq((1L, "a")).toDF("id", "v"), root, 0)
    // simulate a crash mid-batch-1: data written, marker never created
    Seq((9L, "partial")).toDF("id", "v")
      .write.parquet(s"$root/data/batch_id=1")
    val before = IdempotentSink.readCommitted(spark, root)
      .select("id").as[Long].collect().toSet
    assert(before == Set(1L), "uncommitted batch must not be readable")
    // the replay overwrites the partial output and commits
    assert(IdempotentSink.write(Seq((2L, "b"), (3L, "c")).toDF("id", "v"),
      root, 1))
    val after = IdempotentSink.readCommitted(spark, root)
      .select("id").as[Long].collect().toSet
    assert(after == Set(1L, 2L, 3L), "partial rows must not survive replay")
  }

  test("foreachBatch pipeline through the sink writes each row exactly once") {
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft_sink_stream").toString
    val stream = MemoryStream[(Long, Timestamp, Double)]
    val q = stream.toDF().toDF("event_id", "ts", "value")
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        IdempotentSink.write(df, root, id); ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("graft_sink_ckpt").toString)
      .start()
    try {
      stream.addData((1L, new Timestamp(1000), 1.0),
        (2L, new Timestamp(2000), 2.0))
      q.processAllAvailable()
      stream.addData((3L, new Timestamp(3000), 3.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = IdempotentSink.readCommitted(spark, root)
      .select("event_id").as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 2L, 3L))
  }
}
