package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.RunningTotals

class TransformWithStateSpec extends SparkSpec {
  import spark.implicits._

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  test("transformWithState running totals accumulate across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    try {
      val stream = MemoryStream[(Long, Double)]
      val out = RunningTotals.runningUserTotals(stream.toDS())
      val q = out.toDF("user_id", "n_events", "revenue")
        .writeStream.format("memory").queryName("tws_totals")
        .outputMode(OutputMode.Update()).start()
      try {
        stream.addData(Seq((1L, 1.0), (1L, 2.5), (2L, 5.0)))
        q.processAllAvailable()
        val afterB1 = spark.table("tws_totals").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
        assert(afterB1 == Set((1L, 2L, 3.5), (2L, 1L, 5.0)))

        // batch 2 touches user 1 again (state must carry) + a new user
        stream.addData(Seq((1L, 4.0), (3L, 1.25)))
        q.processAllAvailable()
        val latest = spark.table("tws_totals").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
          .groupBy(_._1).map { case (_, v) => v.maxBy(_._2) }.toSet
        assert(latest == Set((1L, 3L, 7.5), (2L, 1L, 5.0), (3L, 1L, 1.25)))
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(ProviderKey, v)
        case None => spark.conf.unset(ProviderKey)
      }
    }
  }

  test("event-time timers close sessions exactly once at the watermark") {
    import java.sql.Timestamp
    implicit val sqlCtx = spark.sqlContext
    def ts(sec: Int): Timestamp =
      Timestamp.valueOf(f"2024-01-01 00:${sec / 60}%02d:${sec % 60}%02d")
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    try {
      val stream = MemoryStream[(Long, Timestamp)]
      val withWm = stream.toDF().toDF("user_id", "ts")
        .withWatermark("ts", "0 seconds")
        .as[(Long, Timestamp)]
      val out = graft.streaming.SessionTimers
        .closedSessions(withWm, gapMs = 60000L)
      val q = out.toDF("user_id", "n_events", "session_end")
        .writeStream.format("memory").queryName("tws_sessions")
        .outputMode(OutputMode.Append()).start()
      try {
        // user 1: two events 10s apart; user 2: one event
        stream.addData(Seq((1L, ts(0)), (2L, ts(5)), (1L, ts(10))))
        q.processAllAvailable()
        assert(spark.table("tws_sessions").count() == 0) // nothing closed
        // an unrelated late-window event pushes the watermark past both
        // deadlines (10s + 60s and 5s + 60s)
        stream.addData(Seq((9L, ts(300))))
        q.processAllAvailable()
        // one more batch so the timer firing is fully drained
        stream.addData(Seq((9L, ts(301))))
        q.processAllAvailable()
        val got = spark.table("tws_sessions").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2))).toSet
        assert(got == Set((1L, 2L, ts(10)), (2L, 1L, ts(5))))
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(ProviderKey, v)
        case None => spark.conf.unset(ProviderKey)
      }
    }
  }

  test("final emissions equal the batch groupBy twin on driver data") {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    try {
      val rows = Tables(spark, sf, "events")
        .select("user_id", "value").as[(Long, Double)].collect().toSeq
      val stream = MemoryStream[(Long, Double)]
      val (a, b) = rows.splitAt(rows.size / 2)
      stream.addData(a)
      stream.addData(b)
      val out = RunningTotals.runningUserTotals(stream.toDS())
      val q = out.toDF("user_id", "n_events", "revenue")
        .writeStream.format("memory").queryName("tws_drv")
        .outputMode(OutputMode.Update()).start()
      try q.processAllAvailable() finally q.stop()
      val latest = spark.table("tws_drv").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .groupBy(_._1).map { case (_, v) => v.maxBy(_._2) }.toSet
      val want = rows.groupBy(_._1).map { case (u, v) =>
        (u, v.size.toLong,
          v.map(x => math.round(x._2 * 100)).sum / 100.0)
      }.toSet
      assert(latest == want)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(ProviderKey, v)
        case None => spark.conf.unset(ProviderKey)
      }
    }
  }
}
