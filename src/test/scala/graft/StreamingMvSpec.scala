package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{IdempotentSink, StreamingMv}

/** Streaming incremental MV maintenance: per-batch deltas through the
  * exactly-once ledger must land on exactly the from-scratch aggregate,
  * and a replayed batch must not double-count.
  */
class StreamingMvSpec extends SparkSpec {
  import spark.implicits._

  private def fullRecompute(orders: org.apache.spark.sql.DataFrame)
    : Map[Long, (Double, Long)] =
    StreamingMv.delta(orders,
        Tables(spark, sf, "lineitem"), Tables(spark, sf, "customer"))
      .select(col("c_nationkey"),
        round(col("rev"), 4).cast("double").as("rev"), col("n_lines"))
      .collect()
      .map(r => r.getAs[Number](0).longValue -> ((r.getDouble(1),
        r.getLong(2)))).toMap

  test("streamed deltas merge to the full recompute across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("graft_mv").toString
    val orders = Tables(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
      .as[(Long, Long)].collect().toSeq
    val stream = MemoryStream[(Long, Long)]
    val q = StreamingMv.maintain(
      stream.toDF().toDF("o_orderkey", "o_custkey"),
      Tables(spark, sf, "lineitem"), Tables(spark, sf, "customer"), root)
    try {
      val batches = orders.grouped(math.max(1, orders.size / 3)).toSeq
      batches.foreach { b => stream.addData(b); q.processAllAvailable() }
    } finally q.stop()
    val got = StreamingMv.view(spark, root).collect()
      .map(r => (r.getAs[Number](0).longValue, r.getDouble(1), r.getLong(2)))
      .toSet
    val want = fullRecompute(Tables(spark, sf, "orders"))
      .map { case (k, (rev, n)) => (k, rev, n) }.toSet
    assert(got == want, "sum-merged deltas must equal the batch recompute")
  }

  test("checkpoint compaction: ledger untouched, tail read equals full view") {
    val ledger = Files.createTempDirectory("graft_mv_ck").toString
    val table = Files.createTempDirectory("graft_mv_ck_t").toString
    val l = Tables(spark, sf, "lineitem")
    val c = Tables(spark, sf, "customer")
    val o = Tables(spark, sf, "orders").select(col("o_orderkey"),
      col("o_custkey"))
    // three delta batches land, then compact
    Seq(0L, 1L, 2L).foreach { i =>
      IdempotentSink.write(
        StreamingMv.delta(o.filter(col("o_orderkey") % 3 === i), l, c),
        ledger, i)
    }
    val v1 = StreamingMv.compact(spark, ledger, table)
    assert(v1 == 1L)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Number](0).longValue, r.getDouble(1),
        r.getLong(2))).toSet
    assert(rows(StreamingMv.viewCompacted(spark, ledger, table))
      == rows(StreamingMv.view(spark, ledger)))
    // a post-compaction batch must surface through the tail read
    IdempotentSink.write(
      StreamingMv.delta(o.limit(50), l, c), ledger, 3L)
    assert(rows(StreamingMv.viewCompacted(spark, ledger, table))
      == rows(StreamingMv.view(spark, ledger)))
    // second compaction folds the tail; ledger batches all still there
    assert(StreamingMv.compact(spark, ledger, table) == 2L)
    assert(rows(StreamingMv.viewCompacted(spark, ledger, table))
      == rows(StreamingMv.view(spark, ledger)))
    val fs = new org.apache.hadoop.fs.Path(ledger).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(fs.listStatus(new org.apache.hadoop.fs.Path(s"$ledger/data"))
      .length == 4, "compaction must never mutate the ledger")
  }

  test("a replayed delta batch cannot double-count the view") {
    val root = Files.createTempDirectory("graft_mv_replay").toString
    val o = Tables(spark, sf, "orders").limit(100)
    val d = StreamingMv.delta(o,
      Tables(spark, sf, "lineitem"), Tables(spark, sf, "customer"))
    assert(IdempotentSink.write(d, root, 0))
    val once = StreamingMv.view(spark, root).collect()
      .map(r => (r.getAs[Number](0).longValue, r.getDouble(1))).toSet
    assert(!IdempotentSink.write(d, root, 0), "replay must be suppressed")
    val twice = StreamingMv.view(spark, root).collect()
      .map(r => (r.getAs[Number](0).longValue, r.getDouble(1))).toSet
    assert(once == twice)
  }
}
