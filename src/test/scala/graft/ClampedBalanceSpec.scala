package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.ClampedBalance

class ClampedBalanceSpec extends SparkSpec {
  import spark.implicits._

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def withRocks[T](body: => T): T = {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None => spark.conf.unset(ProviderKey)
    }
  }

  test("state carries the clamped fold across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    withRocks {
      val stream = MemoryStream[ClampedBalance.Move]
      val q = ClampedBalance.runningBalances(stream.toDS())
        .toDF("k", "bal", "lost", "stockouts", "moves")
        .writeStream.format("memory").queryName("cb_test")
        .outputMode(OutputMode.Update()).start()
      try {
        // batch 1, supplier 1 (fed OUT of event order — the handler
        // must sort): issue 5 (clamps, 5 lost), return 3, issue 2
        // → walked order t=1,2,3 gives B = [0, 3, 1]
        stream.addData(Seq(
          (1L, 3L, 12L, 1, -20000L),
          (1L, 1L, 10L, 1, -50000L),
          (1L, 2L, 11L, 1, 30000L)))
        q.processAllAvailable()
        val b1 = spark.table("cb_test").collect()
          .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
            r.getLong(3), r.getLong(4))).toSet
        assert(b1 === Set((1L, 1.0, 5.0, 1L, 3L)))
        // batch 2 continues supplier 1 (issue 4 clamps again: 3 more
        // lost; return 6) and opens supplier 2
        stream.addData(Seq(
          (1L, 5L, 14L, 1, 60000L),
          (1L, 4L, 13L, 1, -40000L),
          (2L, 1L, 20L, 1, 15000L)))
        q.processAllAvailable()
        val latest = spark.table("cb_test").collect()
          .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
            r.getLong(3), r.getLong(4)))
          .groupBy(_._1).map { case (_, v) => v.maxBy(_._5) }.toSet
        assert(latest === Set(
          (1L, 6.0, 8.0, 2L, 5L), (2L, 1.5, 0.0, 0L, 1L)))
      } finally q.stop()
    }
  }

  test("the shipped entry equals batch q243 on the real table") {
    // the entry REQUIRES streamed == batch internally; a non-empty
    // return proves the equality held at this SF
    val got = SparkEntry.queries("stream_clamped_balance")(spark, sf)
    assert(got.count() > 0)
  }
}
