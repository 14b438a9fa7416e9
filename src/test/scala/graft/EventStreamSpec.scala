package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.EventStream
import graft.streaming.EventStream.Event

class EventStreamSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp = new Timestamp(minute * 60000L)

  test("streaming windowed counts equal the batch twin (q16 shape)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batch = Tables(spark, sf, "events")
      .select(col("ts"), col("event_type"), col("value"))
    val rows = batch.as[(Timestamp, String, Double)].collect().toSeq

    val stream = MemoryStream[(Timestamp, String, Double)]
    // two micro-batches to exercise incremental state
    val (first, second) = rows.splitAt(rows.size / 2)
    stream.addData(first)
    stream.addData(second)
    val streamed = EventStream.windowedCounts(
      stream.toDF().toDF("ts", "event_type", "value"))
    EventStream.runToMemory(streamed, "wc_stream", OutputMode.Complete())

    val got = spark.table("wc_stream").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    val want = EventStream.windowedCounts(batch).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(got == want)
  }

  test("flatMapGroupsWithState sessionize == session_window batch twin") {
    import spark.implicits._
    val events = Tables(spark, sf, "events")
      .select(col("user_id"), col("ts"), col("event_type"), col("value"))
      .as[Event]
    val custom = EventStream.sessionize(events, 30, batchMode = true).collect()
      .map(s => (s.user_id, s.session_start, s.session_end, s.n_events))
      .toSet
    val builtin = EventStream.sessionized(Tables(spark, sf, "events"), 30)
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3))).toSet
    assert(custom == builtin)
  }

  test("streaming sessionize emits closed sessions on event-time timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val sessions = EventStream.sessionize(
      stream.toDS().withWatermark("ts", "10 minutes").as[Event], 30)
    val q = sessions.writeStream.format("memory").queryName("sess_stream")
      .outputMode("append").start()
    try {
      // user 1: two events 5 min apart (one session), then a 40-min gap
      // (second session); watermark advances past start+30min via user 2.
      // Offsets start at minute 10: epoch-0 sits exactly on the initial
      // watermark and stateful ops drop rows at/behind it.
      stream.addData(Event(1L, ts(10), "a", 1.0), Event(1L, ts(15), "a", 2.0))
      q.processAllAvailable()
      stream.addData(Event(1L, ts(55), "b", 3.0), Event(2L, ts(130), "c", 4.0))
      q.processAllAvailable()
      // one more batch so the timeout fires under the advanced watermark
      stream.addData(Event(2L, ts(131), "c", 5.0))
      q.processAllAvailable()
      val got = spark.table("sess_stream")
        .select("user_id", "session_start", "n_events").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2))).toSet
      assert(got.contains((1L, ts(10), 2L)),
        s"first session of user 1 not emitted: $got")
      assert(got.contains((1L, ts(55), 1L)),
        s"gap session of user 1 not emitted: $got")
    } finally q.stop()
  }

  test("streaming dedup drops repeated event_ids across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, Timestamp, Double)]
    val deduped = EventStream.dedupStream(
      stream.toDF().toDF("event_id", "ts", "value"))
    val q = deduped.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      stream.addData((1L, ts(10), 1.0), (2L, ts(11), 2.0), (1L, ts(10), 1.0))
      q.processAllAvailable()
      stream.addData((2L, ts(12), 2.5), (3L, ts(13), 3.0))
      q.processAllAvailable()
      val ids = spark.table("dedup_stream").select("event_id").collect()
        .map(_.getLong(0)).toSeq
      assert(ids.sorted == Seq(1L, 2L, 3L),
        s"expected each id once, got $ids")
    } finally q.stop()
  }

  test("streaming dedup equals the batch twin on doubled events (q55)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = Tables(spark, sf, "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("value"))
    val rows = events.as[(Long, Timestamp, Long, Double)].collect().toSeq
    val stream = MemoryStream[(Long, Timestamp, Long, Double)]
    // the duplicate copy arrives in a second micro-batch, so dedup state
    // must carry across batches to drop it
    stream.addData(rows)
    stream.addData(rows)
    val streamed = EventStream.dedupStream(
      stream.toDF().toDF("event_id", "ts", "user_id", "value"))
    EventStream.runToMemory(streamed, "dedup_q55", OutputMode.Append())
    val got = spark.table("dedup_q55").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getDouble(3))).toSet
    val want = EventStream.dedupBatch(events.union(events)).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(spark.table("dedup_q55").count() == want.size,
      "streaming dedup must emit each event_id exactly once")
    assert(got == want && want.nonEmpty)
  }

  test("stream-stream click->purchase join equals the batch twin (q45)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batch = Tables(spark, sf, "events")
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    val rows = batch.as[(Long, Long, Timestamp, String)].collect().toSeq
    val stream = MemoryStream[(Long, Long, Timestamp, String)]
    val (first, second) = rows.splitAt(rows.size / 2)
    stream.addData(first)
    stream.addData(second)
    val streamed = EventStream.clickPurchaseJoin(
      stream.toDF().toDF("event_id", "user_id", "ts", "event_type"))
    EventStream.runToMemory(streamed, "ss_join", OutputMode.Append())
    val got = spark.table("ss_join").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = EventStream.clickPurchaseJoin(batch).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want && want.nonEmpty)
  }

  test("stream-stream LEFT SEMI join emits each converted click once (q199)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batch = Tables(spark, sf, "events")
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    val rows = batch.as[(Long, Long, Timestamp, String)].collect().toSeq
    val stream = MemoryStream[(Long, Long, Timestamp, String)]
    val (first, second) = rows.splitAt(rows.size / 2)
    stream.addData(first)
    stream.addData(second)
    val streamed = EventStream.clickPurchaseSemiJoin(
      stream.toDF().toDF("event_id", "user_id", "ts", "event_type"))
    EventStream.runToMemory(streamed, "ss_semi", OutputMode.Append())
    val got = spark.table("ss_semi").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toList
    val want = EventStream.clickPurchaseSemiJoin(batch).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toList
    assert(got.sorted == want.sorted && want.nonEmpty,
      "same converted clicks, each exactly once (no per-purchase fanout)")
    assert(got.distinct.size == got.size, "semi join must not duplicate")
  }

  test("stream-stream LEFT OUTER join emits null rows once the watermark proves no match (q104)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batch = Tables(spark, sf, "events")
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    val rows = batch.as[(Long, Long, Timestamp, String)].collect().toSeq
    val maxTs = rows.map(_._3.getTime).max
    // sentinel click+purchase pair far past the data: pushes BOTH sides'
    // watermarks beyond every real click's match horizon, so all real
    // unmatched clicks must emit their null-padded row
    val sentinels = Seq(
      (900001L, 999999L, new Timestamp(maxTs + 10L * 3600 * 1000), "click"),
      (900002L, 999999L,
        new Timestamp(maxTs + 10L * 3600 * 1000 + 60000), "purchase"))
    val stream = MemoryStream[(Long, Long, Timestamp, String)]
    val (first, second) = rows.splitAt(rows.size / 2)
    stream.addData(first)
    stream.addData(second)
    stream.addData(sentinels)
    val streamed = EventStream.clickPurchaseLeftJoin(
      stream.toDF().toDF("event_id", "user_id", "ts", "event_type"))
    EventStream.runToMemory(streamed, "ss_left_join", OutputMode.Append())
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Long]))
    val got = spark.table("ss_left_join").collect().map(key).toSet
    val want = EventStream.clickPurchaseLeftJoin(
      batch.unionByName(sentinels.toDF("event_id", "user_id", "ts", "event_type")
        .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))))
      .collect().map(key).toSet
    assert(want.exists(_._2.isEmpty), "twin must contain unmatched clicks")
    assert(got == want)
  }

  test("stream-stream FULL OUTER join emits both null orientations (q122)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batch = Tables(spark, sf, "events")
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    val rows = batch.as[(Long, Long, Timestamp, String)].collect().toSeq
    val maxTs = rows.map(_._3.getTime).max
    // the same sentinel discipline as the left-outer spec: push both
    // watermarks past every real row's match horizon so every unmatched
    // click AND purchase must have emitted its null-padded row
    val sentinels = Seq(
      (910001L, 999999L, new Timestamp(maxTs + 10L * 3600 * 1000), "click"),
      (910002L, 999999L,
        new Timestamp(maxTs + 10L * 3600 * 1000 + 60000), "purchase"))
    val stream = MemoryStream[(Long, Long, Timestamp, String)]
    val (first, second) = rows.splitAt(rows.size / 2)
    stream.addData(first)
    stream.addData(second)
    stream.addData(sentinels)
    val streamed = EventStream.clickPurchaseFullJoin(
      stream.toDF().toDF("event_id", "user_id", "ts", "event_type"))
    EventStream.runToMemory(streamed, "ss_full_join", OutputMode.Append())
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Long]))
    val got = spark.table("ss_full_join").collect().map(key).toSet
    val want = EventStream.clickPurchaseFullJoin(
      batch.unionByName(sentinels.toDF("event_id", "user_id", "ts", "event_type")
        .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))))
      .collect().map(key).toSet
    assert(want.exists(_._2.isEmpty), "twin must contain click-less purchases")
    assert(want.exists(_._3.isEmpty), "twin must contain unmatched clicks")
    assert(got == want)
  }

  test("stream-static enrich joins a broadcast dimension per micro-batch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val stream = MemoryStream[(Long, Timestamp, Double)]
    val enriched = EventStream.enrich(
      stream.toDF().toDF("user_id", "ts", "value"), dim, "user_id")
    val q = enriched.writeStream.format("memory").queryName("enrich_stream")
      .outputMode("append").start()
    try {
      stream.addData((1L, ts(10), 5.0), (3L, ts(11), 6.0))
      q.processAllAvailable()
      stream.addData((2L, ts(12), 7.0))
      q.processAllAvailable()
      val got = spark.table("enrich_stream").select("user_id", "tier")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      // inner join: user 3 has no dim row and is dropped
      assert(got == Set((1L, "gold"), (2L, "basic")))
    } finally q.stop()
  }

  test("composed streaming pipeline: dedup -> enrich -> windowed counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = Tables(spark, sf, "events")
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
    val dim = events.select(col("user_id")).distinct()
      .withColumn("tier",
        when(pmod(col("user_id"), lit(2)) === 0, "gold").otherwise("basic"))
    val rows = events
      .as[(Long, Timestamp, Long, String, Double)].collect().toSeq

    def pipeline(in: org.apache.spark.sql.DataFrame) = {
      // dropDuplicatesWithinWatermark rejects batch inputs — the batch
      // twin uses the q55 dedupBatch form
      val deduped = if (in.isStreaming) EventStream.dedupStream(in)
        else EventStream.dedupBatch(in)
      val enriched = EventStream.enrich(deduped, dim, "user_id")
      enriched
        .groupBy(window(col("ts"), "10 minutes"), col("tier"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").as("ws"), col("tier"), col("n"))
    }

    val stream = MemoryStream[(Long, Timestamp, Long, String, Double)]
    // duplicates split across micro-batches: state must carry
    stream.addData(rows)
    stream.addData(rows)
    val streamed = pipeline(stream.toDF()
      .toDF("event_id", "ts", "user_id", "event_type", "value"))
    // Complete mode: append would hold back windows the watermark has
    // not passed when the source drains (dedup state is still
    // watermark-evicted upstream)
    EventStream.runToMemory(streamed, "composed", OutputMode.Complete())
    val got = spark.table("composed").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val want = pipeline(events.union(events)).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(got == want && want.nonEmpty)
  }

  test("sliding windows produce overlapping buckets") {
    val n = EventStream.slidingCounts(Tables(spark, sf, "events")).count()
    val t = SparkEntry.queries("q16_window_events")(spark, sf)
      .select("ws").distinct().count()
    assert(n > t, "sliding 10m/5m must emit more buckets than tumbling 10m")
  }

  test("streaming top-k final snapshots equal the batch twin (q93 shape)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val batch = Tables(spark, sf, "events")
      .select(col("ts"), col("event_type"))
    val rows = batch.as[(Timestamp, String)].collect().toSeq

    val stream = MemoryStream[(Timestamp, String)]
    // two micro-batches: the count-map state must carry between them
    val (first, second) = rows.splitAt(rows.size / 2)
    stream.addData(first)
    stream.addData(second)
    val streamed = EventStream.topKStream(
      stream.toDF().toDF("ts", "event_type"))
    EventStream.runToMemory(streamed.toDF(), "topk_stream",
      OutputMode.Update())

    // Update mode emits a refreshed snapshot per micro-batch; `seen`
    // (events folded so far) identifies the freshest one per window
    val emitted = spark.table("topk_stream").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getInt(3), r.getLong(4)))
    val lastSeen = emitted.groupBy(_._1).view.mapValues(_.map(_._5).max)
    val got = emitted
      .filter { case (ws, _, _, _, seen) => seen == lastSeen(ws) }
      .map { case (ws, t, n, rk, _) => (ws, t, n, rk) }.toSet
    val want = EventStream.topKPerWindow(batch).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
        r.getInt(3))).toSet
    assert(got == want && want.nonEmpty)
  }

  test("dynamic-gap sessions: engagement holds a session open, txn does not") {
    import spark.implicits._
    def t(m: Int) = Timestamp.valueOf(f"2024-03-01 10:$m%02d:00")
    // user 1: view@10:00 holds 30 min; purchase@10:20 holds 10 min ->
    // session end stays 10:30 (the view's hold wins); view@10:31 starts
    // a NEW session. user 2: error@10:00 holds only 10 min, so
    // error@10:15 is a separate session.
    val events = Seq(
      (1L, t(0), "view"), (1L, t(20), "purchase"), (1L, t(31), "view"),
      (2L, t(0), "error"), (2L, t(15), "error"))
      .toDF("user_id", "ts", "event_type")
    val got = EventStream.sessionizedDynamic(events).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3))).toSet
    assert(got === Set(
      (1L, t(0), Timestamp.valueOf("2024-03-01 10:30:00"), 2L),
      (1L, t(31), Timestamp.valueOf("2024-03-01 11:01:00"), 1L),
      (2L, t(0), Timestamp.valueOf("2024-03-01 10:10:00"), 1L),
      (2L, t(15), Timestamp.valueOf("2024-03-01 10:25:00"), 1L)))
  }

  test("dynamic-gap sessions: streaming emits the batch result") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def t(m: Int) = Timestamp.valueOf(f"2024-03-01 10:$m%02d:00")
    val rows = Seq(
      (1L, t(0), "view"), (1L, t(20), "purchase"), (1L, t(31), "view"),
      (2L, t(0), "error"), (2L, t(15), "error"))
    val batch = EventStream.sessionizedDynamic(
      rows.toDF("user_id", "ts", "event_type")).collect()
      .map(_.toString).toSet
    val stream = MemoryStream[(Long, Timestamp, String)]
    val q = EventStream.sessionizedDynamic(
      stream.toDF().toDF("user_id", "ts", "event_type")
        .withWatermark("ts", "0 seconds"))
      .writeStream.format("memory").queryName("dyn_sess")
      .outputMode("append").start()
    try {
      stream.addData(rows)
      q.processAllAvailable()
      // advance the watermark far past every session end (12:00 cannot
      // merge with any original interval) so all four sessions close
      stream.addData(Seq(
        (1L, Timestamp.valueOf("2024-03-01 12:00:00"), "view"),
        (2L, Timestamp.valueOf("2024-03-01 12:00:00"), "view")))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("dyn_sess").collect().map(_.toString).toSet
    // the 12:00 closer sessions are still open -> exactly the batch set
    assert(streamed === batch)
  }

  test("scd2 temporal enrich picks the version valid at event time") {
    import spark.implicits._
    def t(m: Int) = Timestamp.valueOf(f"2024-03-01 10:$m%02d:00")
    val dim = Seq(
      (1L, "bronze", t(0), Some(t(10))),
      (1L, "gold", t(10), None))
      .toDF("d_key", "attr", "valid_from", "valid_to")
    val facts = Seq(
      (100L, t(5), 1L, "view"),   // inside the bronze interval
      (101L, t(10), 1L, "view"),  // exactly at the flip -> gold
      (102L, t(20), 1L, "click"), // current version
      (103L, t(5), 2L, "view"))   // unknown user -> NULL state
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = EventStream.scd2Enrich(facts, dim).collect()
      .map(r => r.getLong(0) -> Option(r.getString(4))).toMap
    assert(got === Map(100L -> Some("bronze"), 101L -> Some("gold"),
      102L -> Some("gold"), 103L -> None))
  }

  test("scd2 enrich: streaming facts equal the batch twin") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def t(m: Int) = Timestamp.valueOf(f"2024-03-01 10:$m%02d:00")
    val dim = Seq(
      (1L, "bronze", t(0), Some(t(10))), (1L, "gold", t(10), None),
      (2L, "silver", t(3), None))
      .toDF("d_key", "attr", "valid_from", "valid_to")
    val rows = Seq(
      (100L, t(5), 1L, "view"), (101L, t(12), 1L, "view"),
      (102L, t(1), 2L, "click"), (103L, t(7), 2L, "click"))
    val batch = EventStream.scd2Enrich(
      rows.toDF("event_id", "ts", "user_id", "event_type"), dim)
      .collect().map(_.toString).toSet
    val stream = MemoryStream[(Long, Timestamp, Long, String)]
    val q = EventStream.scd2Enrich(
      stream.toDF().toDF("event_id", "ts", "user_id", "event_type"), dim)
      .writeStream.format("memory").queryName("scd2_stream")
      .outputMode("append").start()
    try {
      stream.addData(rows.take(2)); q.processAllAvailable()
      stream.addData(rows.drop(2)); q.processAllAvailable()
    } finally q.stop()
    assert(spark.table("scd2_stream").collect().map(_.toString).toSet
      === batch)
  }

  test("streaming heavy hitters equal the batch sketch in the exact regime") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val batchEvents = Tables(spark, sf, "events")
      .select(col("ts"), col("user_id"))
    val batch = EventStream.windowHeavyHitters(batchEvents).collect()
      .map(_.toString).toSet
    assert(batch.nonEmpty)
    val rows = batchEvents.as[(java.sql.Timestamp, Long)].collect().toSeq
    val stream = MemoryStream[(java.sql.Timestamp, Long)]
    val q = EventStream.windowHeavyHitters(
      stream.toDF().toDF("ts", "user_id"))
      .writeStream.format("memory").queryName("shh")
      .outputMode("complete").start()
    try {
      // two deliveries so sketches MERGE across micro-batches
      val (d1, d2) = rows.partition(_._2 % 2 == 0)
      stream.addData(d1); q.processAllAvailable()
      stream.addData(d2); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("shh").collect().map(_.toString).toSet
    assert(streamed === batch)
  }

  test("streaming heavy hitters hold the n/capacity bound in the " +
      "approximate regime (cardinality >> capacity, cross-batch merges)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // one 5-day window; 400 background users x4 + 3 heavy users x400:
    // n = 2800, capacity 16 -> n/capacity = 175 < 400, so the heavy
    // users are GUARANTEED to survive eviction and batch merges
    val ts = java.sql.Timestamp.valueOf("2024-03-02 12:00:00")
    val heavy = Seq(900001L, 900002L, 900003L)
    val rows = new scala.util.Random(7).shuffle(
      (1 to 400).flatMap(u => Seq.fill(4)((ts, u.toLong))) ++
        heavy.flatMap(h => Seq.fill(400)((ts, h))))
    val n = rows.size
    val capacity = 16
    val stream = MemoryStream[(java.sql.Timestamp, Long)]
    val q = EventStream.windowHeavyHitters(
      stream.toDF().toDF("ts", "user_id"), capacity = capacity,
      k = capacity)
      .writeStream.format("memory").queryName("shh_approx")
      .outputMode("complete").start()
    try {
      // three deliveries: state merges sketch buffers across batches
      rows.grouped((n + 2) / 3).foreach { b =>
        stream.addData(b); q.processAllAvailable()
      }
    } finally q.stop()
    val got = spark.table("shh_approx").collect()
      .map(r => r.getString(2) -> r.getLong(3)).toMap
    assert(got.size <= capacity)
    heavy.foreach { h =>
      val est = got.getOrElse(h.toString,
        fail(s"heavy hitter $h evicted from $got"))
      // underestimate only, by at most n/capacity — the Misra-Gries
      // bound, surviving the cross-buffer merge
      assert(est <= 400L, s"$h overcounted: $est")
      assert(400L - est <= n / capacity, s"$h undercut past bound: $est")
    }
  }
}
