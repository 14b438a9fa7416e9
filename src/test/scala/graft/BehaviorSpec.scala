package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.queries.BehaviorOps

/** Behavioral-analytics semantics on crafted event logs — the parts the
  * driver oracle (real tables) can't see: out-of-order funnel events,
  * cohort-week boundary handling, and the EWMA closed form against the
  * textbook recursive definition.
  */
class BehaviorSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("q272 entropy rate: hand-computed chain; scripted user lowers H") {
    import spark.implicits._
    // user 1 alternates A,B,A,B,A (transitions AB,BA,AB,BA);
    // user 2 repeats A,A,A (AA,AA): c(A,.)=4 {AB:2, AA:2}, c(B,A)=2
    // hm = 2(ln4-ln2) + 2(ln2-ln2) + 2(ln4-ln2) micros = 4*693147
    val e = (Seq("A", "B", "A", "B", "A").zipWithIndex.map { case (t, i) =>
      (i.toLong, ts(f"2024-01-01 10:0$i%01d:00"), 1L, t, 0.0, "{}")
    } ++ Seq("A", "A", "A").zipWithIndex.map { case (t, i) =>
      (10L + i, ts(f"2024-01-01 11:0$i%01d:00"), 2L, t, 0.0, "{}")
    }).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = BehaviorOps.transitionEntropy(e).head()
    val hExp = 4.0 * 693147 / (6 * 1e6)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getLong(0) === 6L && r.getLong(1) === 2L)
    assert(r.getDouble(2) === r6(hExp))
    assert(r.getDouble(3) === r6(1.0 - hExp / math.log(2.0)))
    // a fully scripted corpus (one user, one loop) has H = 0,
    // predictability 1
    val scripted = Seq("A", "B", "A", "B", "A").zipWithIndex.map {
      case (t, i) =>
        (i.toLong, ts(f"2024-01-01 10:0$i%01d:00"), 1L, t, 0.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r2 = BehaviorOps.transitionEntropy(scripted).head()
    assert(r2.getDouble(2) === 0.0 && r2.getDouble(3) === 1.0)
  }

  test("q131 funnel counts stages strictly in order") {
    import spark.implicits._
    // A completes the funnel in order; B's purchase precedes the click
    // (must NOT count); C clicks without ever viewing (no stage at all)
    val e = Seq(
      (1L, "view", ts("2024-01-01 10:00:00")),
      (1L, "click", ts("2024-01-01 10:01:00")),
      (1L, "purchase", ts("2024-01-01 10:02:00")),
      (2L, "purchase", ts("2024-01-02 09:00:00")),
      (2L, "view", ts("2024-01-02 10:00:00")),
      (2L, "click", ts("2024-01-02 11:00:00")),
      (3L, "click", ts("2024-01-03 08:00:00")))
      .toDF("user_id", "event_type", "ts")
    val out = BehaviorOps.funnelStages(e)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(out == Map("view" -> 2L, "click" -> 2L, "purchase" -> 1L))
  }

  test("q132 retention cohorts truncate to Monday and offset by whole weeks") {
    import spark.implicits._
    // both users land in the 2024-01-01 (Monday) cohort; u1 returns in
    // week 1, u2 doesn't — retention 1.0 then 0.5
    val e = Seq(
      (1L, ts("2024-01-01 00:00:01")),
      (1L, ts("2024-01-09 12:00:00")),
      (2L, ts("2024-01-03 08:00:00")))
      .toDF("user_id", "ts")
    val rows = BehaviorOps.retentionOf(e)
      .select("cohort", "week_offset", "n_active", "cohort_size",
        "retention")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1),
        r.getLong(2), r.getLong(3), r.getDouble(4))).toSet
    assert(rows == Set(
      ("2024-01-01", 0L, 2L, 2L, 1.0),
      ("2024-01-01", 1L, 1L, 2L, 0.5)))
  }

  test("q133 transition probabilities row-normalize per prev state") {
    import spark.implicits._
    val e = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L, "a"),
      (1L, ts("2024-01-01 10:01:00"), 2L, "b"),
      (1L, ts("2024-01-01 10:02:00"), 3L, "b"),
      (2L, ts("2024-01-01 11:00:00"), 4L, "a"),
      (2L, ts("2024-01-01 11:01:00"), 5L, "c"))
      .toDF("user_id", "ts", "event_id", "curr")
    val rows = BehaviorOps.transitionsOf(e)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    assert(rows == Map(
      ("a", "b") -> (1L, 0.5), ("a", "c") -> (1L, 0.5),
      ("b", "b") -> (1L, 1.0)))
  }

  test("q135 EWMA closed form equals the recursive definition") {
    val out = SparkEntry.queries("q135_ewma")(spark, sf)
      .orderBy("event_type", "day").collect()
    // pin the SEMANTICS against the textbook adjusted-EWMA float
    // recursion: num_t = x_t + beta*num_{t-1}, den_t = 1 + beta*den_{t-1},
    // ewma = num/den with beta = 1/2 — the query's integer closed form
    // must agree to within its own 4-decimal rounding
    val byType = out.groupBy(_.getString(0))
    byType.foreach { case (_, rows) =>
      var num = 0.0
      var den = 0.0
      rows.foreach { r =>
        num = r.getLong(2).toDouble + 0.5 * num
        den = 1.0 + 0.5 * den
        val expected = num / den
        assert(math.abs(r.getDouble(3) - expected) < 2e-4,
          s"ewma mismatch: got ${r.getDouble(3)}, want ~$expected")
      }
    }
    assert(out.nonEmpty)
  }

  test("q144 streaks: crafted gaps yield the hand-counted islands") {
    import spark.implicits._
    import java.sql.Timestamp
    val day0 = 1704067200000L // 2024-01-01 UTC
    def t(d: Int) = new Timestamp(day0 + d * 86400000L)
    // user 1 active days 0,1,2,4,5 -> runs {3, 2}; user 2 days 0,2,4 ->
    // three singleton runs, tie on length broken to the EARLIEST start
    val ev = Seq((1L, t(0)), (1L, t(0)), (1L, t(1)), (1L, t(2)), (1L, t(4)),
      (1L, t(5)), (2L, t(0)), (2L, t(2)), (2L, t(4)))
      .toDF("user_id", "ts")
    val dir = java.nio.file.Files.createTempDirectory("graft-beh").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.queries.BehaviorOps.streaks(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDate(4).toString))).toMap
    assert(got(1L) == ((5L, 2L, 3L, "2024-01-01")))
    assert(got(2L) == ((3L, 3L, 1L, "2024-01-01")))
  }

  test("q152 event paths: trigram counts match the hand-traced journey") {
    import spark.implicits._
    import java.sql.Timestamp
    val t0 = 1704067200000L
    // one user walks A B C A B C: trigrams ABC, BCA, CAB, ABC
    val ev = Seq("A", "B", "C", "A", "B", "C").zipWithIndex.map {
      case (t, i) => (1L, (i + 1).toLong, new Timestamp(t0 + i * 1000L), t)
    }.toDF("user_id", "event_id", "ts", "event_type")
    val dir = java.nio.file.Files.createTempDirectory("graft-paths").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.queries.BehaviorOps.eventPaths(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.head == (("A", "B", "C", 2L)))
    assert(got.toSet == Set(("A", "B", "C", 2L), ("B", "C", "A", 1L),
      ("C", "A", "B", 1L)))
  }

  test("q206 combos on driver data partition the user base") {
    val rows = graft.queries.BehaviorOps.comboProfile(spark, sf).collect()
    val users = Tables(spark, sf, "events")
      .select("user_id").distinct().count()
    assert(rows.map(_.getLong(1)).sum == users,
      "every user lands in exactly one combo")
  }

  test("q206 combo profile groups users by their sorted event-type set") {
    import spark.implicits._
    import java.sql.Timestamp
    val t0 = new Timestamp(1704067200000L)
    // u1 and u2 share the {click, view} SET (different order/counts);
    // u3 is view-only
    val ev = Seq((1L, "view"), (1L, "click"), (1L, "view"),
      (2L, "click"), (2L, "view"), (3L, "view"))
      .zipWithIndex.map { case ((u, e), i) =>
        (u, (i + 1).toLong, t0, e) }
      .toDF("user_id", "event_id", "ts", "event_type")
    val dir = java.nio.file.Files.createTempDirectory("graft-combo").toString
    ev.write.parquet(s"$dir/events.parquet")
    val got = graft.queries.BehaviorOps.comboProfile(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("click,view" -> 2L, "view" -> 1L))
  }

  test("q194 pattern match counts non-overlapping v[ce]*p journeys") {
    import spark.implicits._
    import java.sql.Timestamp
    val t0 = 1704067200000L
    // user 1: view click click purchase view purchase -> "vccpvp"
    //   -> matches "vccp" then "vp": 2 conversions
    // user 2: purchase view click -> "pvc": no completed journey
    val ev = (Seq("view", "click", "click", "purchase", "view", "purchase")
      .zipWithIndex.map { case (e, i) =>
        (1L, (i + 1).toLong, new Timestamp(t0 + i * 1000L), e) } ++
      Seq("purchase", "view", "click").zipWithIndex.map { case (e, i) =>
        (2L, (i + 10).toLong, new Timestamp(t0 + i * 1000L), e) })
      .toDF("user_id", "event_id", "ts", "event_type")
    val dir = java.nio.file.Files.createTempDirectory("graft-pat").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.queries.BehaviorOps.patternMatch(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(got.toSeq == Seq((1L, 6, 2)))
  }

  test("q194 ordering is shuffle-safe: scrambled input, same sequences") {
    import spark.implicits._
    import java.sql.Timestamp
    val t0 = 1704067200000L
    // events arrive in reverse and land in many partitions; the sorted
    // struct list must still rebuild v..p in event-time order
    val ev = Seq("view", "error", "purchase").zipWithIndex.map {
      case (e, i) => (7L, (i + 1).toLong, new Timestamp(t0 + i * 1000L), e)
    }.reverse.toDF("user_id", "event_id", "ts", "event_type")
      .repartition(4)
    val dir = java.nio.file.Files.createTempDirectory("graft-pat2").toString
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = graft.queries.BehaviorOps.patternMatch(spark, dir).collect()
    assert(got.length == 1 && got.head.getInt(2) == 1)
  }

  test("q131/q133 shuffle only on user-bounded keys (no cartesian)") {
    Seq("q131_funnel", "q133_transitions").foreach { name =>
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct")
        && !p.contains("BroadcastNestedLoop"),
        s"$name must stay on equi-joins:\n$p")
    }
  }
}
