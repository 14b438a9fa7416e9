package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.{DriftMonitor, EventStream}

class StreamingDriftSpec extends SparkSpec {
  import spark.implicits._

  test("streamed windowed PSI equals the batch computation on the same split") {
    val batch = Tables(spark, sf, "events")
    val model = DriftMonitor.refModel(
      batch.filter(dayofmonth(col("ts")) <= 15)
        .select(col("event_type"), col("value")))
    val curBatch = batch.filter(dayofmonth(col("ts")) > 15)
      .select(col("ts"), col("event_type"), col("value"))
    val expected = DriftMonitor.psi(curBatch, model, "5 days")
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(expected.nonEmpty)

    val cur = EventStream.readEventsStream(spark, sf)
      .filter(dayofmonth(col("ts")) > 15)
      .select(col("ts"), col("event_type"), col("value"))
    EventStream.runToMemory(
      DriftMonitor.psi(cur, model, "5 days"), "sds_twin",
      OutputMode.Complete())
    val got = spark.table("sds_twin").collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got === expected)
  }

  test("streamed windowed EMD equals batch; distance separates " +
      "PSI-equal shifts") {
    val batch = Tables(spark, sf, "events")
    val model = DriftMonitor.refModel(
      batch.filter(dayofmonth(col("ts")) <= 15)
        .select(col("event_type"), col("value")))
    val curBatch = batch.filter(dayofmonth(col("ts")) > 15)
      .select(col("ts"), col("event_type"), col("value"))
    val expected = DriftMonitor.emd(curBatch, model, "5 days")
      .collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(expected.nonEmpty)
    val cur = EventStream.readEventsStream(spark, sf)
      .filter(dayofmonth(col("ts")) > 15)
      .select(col("ts"), col("event_type"), col("value"))
    EventStream.runToMemory(
      DriftMonitor.emd(cur, model, "5 days"), "sds_emd_twin",
      OutputMode.Complete())
    val got = spark.table("sds_emd_twin").collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got === expected)

    // the DriftSpec PSI-blind pair, streamed: one decile over vs nine —
    // windowed EMD ranks them 9:1 while PSI scores them identically
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ref = (1 to 200).map(v => ("m", v.toDouble))
      .toDF("event_type", "value")
    val m2 = DriftMonitor.refModel(ref)
    val stream = MemoryStream[(Timestamp, String, Double)]
    val outE = DriftMonitor.emd(
      stream.toDF().toDF("ts", "event_type", "value"), m2, "1 hour")
    val q = outE.writeStream.format("memory").queryName("sds_emd_pair")
      .outputMode(OutputMode.Complete()).start()
    val near = (21 to 200).map(_.toDouble) ++ (21 to 40).map(_.toDouble)
    val far = (21 to 200).map(_.toDouble) ++ (181 to 200).map(_.toDouble)
    stream.addData(near.map(v =>
      (Timestamp.valueOf("2024-02-01 10:30:00"), "m", v)))
    stream.addData(far.map(v =>
      (Timestamp.valueOf("2024-02-01 11:30:00"), "m", v)))
    q.processAllAvailable()
    q.stop()
    val emds = spark.table("sds_emd_pair").collect()
      .map(r => r.getTimestamp(0).toString -> r.getDouble(3)).toMap
    val eNear = emds("2024-02-01 10:00:00.0")
    val eFar = emds("2024-02-01 11:00:00.0")
    assert(eFar === 0.1 && math.abs(eNear - 0.011111) < 1e-6)
  }

  test("a planted shift fires the alarm in its window only") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // reference: values 1..200 for one type
    val ref = (1 to 200)
      .map(v => ("m", v.toDouble)).toDF("event_type", "value")
    val model = DriftMonitor.refModel(ref)
    val stream = MemoryStream[(Timestamp, String, Double)]
    val out = DriftMonitor.psi(
      stream.toDF().toDF("ts", "event_type", "value"), model,
      "1 hour")
    val q = out.writeStream.format("memory").queryName("sds_alarm")
      .outputMode(OutputMode.Complete()).start()
    // window 1: same distribution; window 2: shifted far right
    stream.addData((1 to 200).map(v =>
      (Timestamp.valueOf("2024-02-01 10:30:00"), "m", v.toDouble)))
    stream.addData((1 to 200).map(v =>
      (Timestamp.valueOf("2024-02-01 11:30:00"), "m", v + 500.0)))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("sds_alarm").collect()
      .map(r => r.getTimestamp(0).toString -> r.getDouble(3)).toMap
    assert(rows.size === 2)
    assert(math.abs(rows("2024-02-01 10:00:00.0")) < 1e-6)
    assert(rows("2024-02-01 11:00:00.0") > 0.2)
  }

  test("append mode emits each window once it passes the watermark") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ref = (1 to 100).map(v => ("m", v.toDouble))
      .toDF("event_type", "value")
    val model = DriftMonitor.refModel(ref)
    val stream = MemoryStream[(Timestamp, String, Double)]
    val out = DriftMonitor.psi(
      stream.toDF().toDF("ts", "event_type", "value"), model,
      "1 hour", watermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("sds_append")
      .outputMode(OutputMode.Append()).start()
    stream.addData((1 to 100).map(v =>
      (Timestamp.valueOf("2024-02-01 10:30:00"), "m", v.toDouble)))
    q.processAllAvailable()
    // first window still open (watermark at 10:20) -> nothing emitted
    assert(spark.table("sds_append").count() === 0)
    // an event 2 hours later closes it
    stream.addData(Seq(
      (Timestamp.valueOf("2024-02-01 12:30:00"), "m", 50.0)))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("sds_append").collect()
    assert(rows.length === 1)
    assert(rows.head.getTimestamp(0) ===
      Timestamp.valueOf("2024-02-01 10:00:00"))
    assert(math.abs(rows.head.getDouble(3)) < 1e-6)
  }

  test("tie-heavy reference (duplicate decile boundaries) builds, not throws") {
    // a constant-valued type collapses every decile boundary to one
    // value, leaving most buckets empty — under ANSI mode a plain
    // element_at on the missing bucket keys would throw; the model must
    // scaffold them as 0 instead (try_element_at)
    val ref = (1 to 40).map(i => ("const", 7.5)) ++
      (1 to 40).map(i => ("spread", i.toDouble))
    val model = DriftMonitor.refModel(ref.toDF("event_type", "value"))
    val rows = model.collect()
    assert(rows.length === 2)
    rows.foreach { r =>
      val counts = r.getAs[scala.collection.Seq[Long]]("ref_counts")
      assert(counts.length === 10)
      assert(counts.sum === 40L, s"${r.getString(0)}: $counts")
    }
    // the constant type really is tie-heavy: all mass in one bucket
    val constCounts = rows.find(_.getString(0) == "const").get
      .getAs[scala.collection.Seq[Long]]("ref_counts")
    assert(constCounts.count(_ > 0) === 1)
  }

  test("streamed embedding drift equals batch; planted dim-shift flags " +
      "its window only") {
    import graft.streaming.EmbeddingDriftMonitor
    implicit val enc
        : org.apache.spark.sql.Encoder[(Timestamp, Seq[Float])] =
      org.apache.spark.sql.Encoders.product[(Timestamp, Seq[Float])]
    def t(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 00:00:00")
    // reference: dim0 constant (never forms a t), dim1 alternating 0/1
    val ref = (0 until 40)
      .map(i => Tuple1(Seq(7.5f, if (i % 2 == 0) 0.0f else 1.0f)))
      .toDF("embedding")
    val model = EmbeddingDriftMonitor.refModel(ref)
    // window A (days 1-5): same distribution as the reference;
    // window B (days 16-20): dim1 shifted +100 — bands 11 days apart so
    // no epoch-aligned 5-day window mixes them
    val rows =
      (1 to 4).map(d => (t(d), Seq(7.5f, if (d % 2 == 0) 0.0f else 1.0f))) ++
      (16 to 19).map(d => (t(d), Seq(7.5f, 100.0f + (d % 2))))
    val batch = EmbeddingDriftMonitor.welch(
      rows.toDF("ts", "embedding"), model, "5 days").collect()
    // dim 0: constant both sides → NULL t everywhere
    assert(batch.filter(_.getInt(1) == 0).forall(_.isNullAt(3)))
    // dim 1: quiet windows never flag; the shifted band always does
    val d1 = batch.filter(_.getInt(1) == 1)
      .map(r => r.getTimestamp(0).getTime -> r.getBoolean(4))
    val (flagged, quiet) = d1.partition(_._2)
    assert(flagged.nonEmpty && quiet.nonEmpty)
    assert(quiet.map(_._1).max < flagged.map(_._1).min)
    // streamed == batch on a real 2-batch split
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Timestamp, Seq[Float])]
    val q = EmbeddingDriftMonitor.welch(
        stream.toDF().toDF("ts", "embedding"), model, "5 days")
      .writeStream.format("memory").queryName("sds_emb")
      .outputMode("complete").start()
    val (b1, b2) = rows.partition(_._1.getTime < t(10).getTime)
    stream.addData(b1); q.processAllAvailable()
    stream.addData(b2); q.processAllAvailable()
    q.stop()
    assert(spark.table("sds_emb").collect().toSet === batch.toSet)
  }

  test("streamed LM quality equals batch; gibberish window degrades") {
    import graft.streaming.LmQualityMonitor
    def t(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 00:00:00")
    // train: a tight two-phrase language; reference ll from the same
    // distribution, so a clean window sits at the gate's zero point
    val train = (1L to 20L)
      .map(i => (i, if (i % 2 == 0) "aa bb cc aa bb" else "bb aa cc"))
      .toDF("doc_id", "text")
    val m = LmQualityMonitor.knModel(train, pin = false)
    val refLl = LmQualityMonitor.bigrams(train)
      .join(m.types, Seq("w1", "w2"), "left")
      .join(m.ctx, Seq("w1"), "left")
      .join(m.cont, Seq("w2"), "left")
      .withColumn("lpm", LmQualityMonitor.knLpMicros(m.tTypes, m.vocab))
      .agg((sum(col("lpm")) / (count(lit(1)) * lit(1e6))).as("ll"))
      .head().getDouble(0)
    // window A (days 1-4): in-distribution; window B (days 16-19):
    // gibberish tokens the model never saw -> continuation-floor lls
    val rows = (1 to 4).map(d => (t(d), "aa bb cc aa")) ++
      (16 to 19).map(d => (t(d), "zz qq ww zz qq"))
    val batch = LmQualityMonitor.score(
      rows.toDF("ts", "text"), m, refLl, "5 days").collect()
    val byWin = batch.map(r => r.getTimestamp(0).getTime ->
      ((r.getLong(1), r.getDouble(2), r.getBoolean(3)))).toMap
    // bands are 11 days apart, so no epoch-aligned 5-day window mixes
    // them: every early window is clean, every late one degraded
    val (flagged, quiet) = byWin.partition(_._2._3)
    assert(flagged.nonEmpty && quiet.nonEmpty)
    assert(quiet.keys.max < flagged.keys.min)
    assert(flagged.values.map(_._2).max <
      quiet.values.map(_._2).min - 1.0)
    // streamed == batch on a real 2-batch split
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String)]
    val q = LmQualityMonitor.score(
        stream.toDF().toDF("ts", "text"), m, refLl, "5 days")
      .writeStream.format("memory").queryName("sds_lm")
      .outputMode("complete").start()
    val (b1, b2) = rows.partition(_._1.getTime < t(10).getTime)
    stream.addData(b1); q.processAllAvailable()
    stream.addData(b2); q.processAllAvailable()
    q.stop()
    assert(spark.table("sds_lm").collect().toSet === batch.toSet)
  }

  test("streamed A/B health equals batch; broken split alarms its window") {
    import graft.streaming.AbMonitor
    def t(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 00:00:00")
    // window A (days 1-4): balanced 10v10 with a +1 treatment lift;
    // window B (days 16-19): assignment bug — 20 events ALL on arm A
    val rows =
      (1 to 20).map(i => (t(1 + i % 4), i.toLong, "m",
        if (i % 2 == 0) 11.0 else 10.0)) ++
      (1 to 20).map(i => (t(16 + i % 4), 2L * i, "m", 10.0))
    val df = rows.toDF("ts", "user_id", "event_type", "value")
    val batch = AbMonitor.health(df, "5 days").collect()
    val byWin = batch.map(r => r.getTimestamp(0).getTime ->
      ((r.getLong(2), r.getLong(3), r.getBoolean(6)))).toMap
    val (alarm, ok) = byWin.partition(_._2._3)
    assert(alarm.nonEmpty && ok.nonEmpty)
    assert(ok.keys.max < alarm.keys.min)
    // the broken windows have an empty B arm
    alarm.values.foreach { case (na, nb, _) => assert(nb === 0L && na > 0L) }
    ok.values.foreach { case (na, nb, _) => assert(na === nb) }
    // streamed == batch on a real 2-batch split
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Timestamp, Long, String, Double)]
    val q = AbMonitor.health(
        stream.toDF().toDF("ts", "user_id", "event_type", "value"),
        "5 days")
      .writeStream.format("memory").queryName("sds_ab")
      .outputMode("complete").start()
    val (b1, b2) = rows.partition(_._1.getTime < t(10).getTime)
    stream.addData(b1); q.processAllAvailable()
    stream.addData(b2); q.processAllAvailable()
    q.stop()
    assert(spark.table("sds_ab").collect().toSet === batch.toSet)
  }

  test("streamed conformal coverage equals batch on the same split") {
    // model: y ≈ 10x with interval half-width 2
    val model = Seq(("A", 10.0, 0.0, 2.0))
      .toDF("f", "slope", "intercept", "q_hat")
    def t(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 00:00:00")
    // two 5-day windows: days 1-5 all within the interval, days 6-10
    // half outside
    val rows = (1 to 5).map(d => (t(d), "A", d.toDouble, 10.0 * d + 1)) ++
      (6 to 10).map(d => (t(d), "A", d.toDouble,
        if (d % 2 == 0) 10.0 * d + 1 else 10.0 * d + 5))
    val expected = graft.streaming.ConformalMonitor
      .coverage(rows.toDF("ts", "f", "x", "y"), model, "5 days")
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getBoolean(4))).toMap
    assert(expected.nonEmpty)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String, Double, Double)]
    val q = graft.streaming.ConformalMonitor.coverage(
        stream.toDF().toDF("ts", "f", "x", "y"), model, "5 days")
      .writeStream.format("memory").queryName("sds_conf")
      .outputMode("complete").start()
    val (b1, b2) = rows.partition(_._1.getTime < t(6).getTime)
    stream.addData(b1); q.processAllAvailable()
    stream.addData(b2); q.processAllAvailable()
    q.stop()
    val got = spark.table("sds_conf").collect()
      .map(r => (r.getTimestamp(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getBoolean(4))).toMap
    assert(got === expected)
  }

  test("a planted coverage collapse flags degraded in its window only") {
    val model = Seq(("A", 10.0, 0.0, 2.0))
      .toDF("f", "slope", "intercept", "q_hat")
    def t(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 00:00:00")
    // days 1-5: residual 1 ≤ q̂; days 16-20: residual 50 ≫ q̂ — the two
    // bands sit 11 days apart, so no epoch-aligned 5-day window mixes
    // them: every window is either fully covered (1.0, quiet) or fully
    // collapsed (0.0, degraded) — the feature/label relationship moved,
    // caught label-free
    val rows = (1 to 5).map(d => (t(d), "A", d.toDouble, 10.0 * d + 1)) ++
      (16 to 20).map(d => (t(d), "A", d.toDouble, 10.0 * d + 50))
    val out = graft.streaming.ConformalMonitor
      .coverage(rows.toDF("ts", "f", "x", "y"), model, "5 days")
      .collect().map(r => r.getTimestamp(0).getTime ->
        (r.getDouble(3), r.getBoolean(4)))
    val (quiet, degraded) = out.partition(_._2 == ((1.0, false)))
    assert(degraded.forall(_._2 == ((0.0, true))),
      s"windows must be all-or-nothing here: ${out.toSeq}")
    assert(quiet.nonEmpty && degraded.nonEmpty)
    // the collapse is LATER than every quiet window
    assert(quiet.map(_._1).max < degraded.map(_._1).min)
  }
}
