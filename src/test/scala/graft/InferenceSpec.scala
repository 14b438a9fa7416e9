package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.queries.InferenceOps

class InferenceSpec extends SparkSpec {
  import spark.implicits._

  /** Write a crafted events table to a temp dir so the (spark, sfDir)
    * query entries run against known data.
    */
  private def eventsDir(df: org.apache.spark.sql.DataFrame): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-inf").toString
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("q268 A/B power: hand-computed MDE; SRM alarm on a broken split") {
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // type m: A (even users) = [10, 12], B (odd) = [11, 15, 16]
    //   var_a = 2, var_b = 7 -> se = sqrt(1 + 7/3); srm tiny (2 vs 3)
    // type bad: 20 events ALL on even users -> srm = 2*(10^2/10) = 20
    val ev = (Seq((2L, "m", 10.0), (4L, "m", 12.0),
      (1L, "m", 11.0), (3L, "m", 15.0), (5L, "m", 16.0)) ++
      (1 to 20).map(i => (2L * i, "bad", 1.0)))
      .toDF("user_id", "event_type", "value")
    val got = InferenceOps.queries("q268_ab_power")(spark, eventsDir(ev))
      .collect().map(r => r.getString(0) -> r).toMap
    val m = got("m")
    val se = math.sqrt(2.0 / 2 + 7.0 / 3)
    assert((m.getLong(1), m.getLong(2)) === ((2L, 3L)))
    assert(m.getDouble(3) === 11.0)
    assert(m.getDouble(4) === r6(se))
    assert(m.getDouble(5) === r6(2.801585 * se))
    assert(m.getDouble(6) === r6(2.801585 * se / 11.0))
    // 2 vs 3 split: chi2 = 0.2, no alarm
    assert(m.getDouble(7) === 0.2 && !m.getBoolean(8))
    val bad = got("bad")
    assert(bad.getLong(1) === 20L && bad.getLong(2) === 0L)
    assert(bad.isNullAt(4) && bad.isNullAt(5)) // one-arm: no se/MDE
    assert(bad.getDouble(7) === 20.0 && bad.getBoolean(8))
  }

  test("welch t-test matches the hand-computed statistic") {
    // arm A (even users): 1,2,3 -> n=3, mean=2, var=1
    // arm B (odd users): 2,4,6,8 -> n=4, mean=5, var=20/3
    // se2 = 1/3 + 5/3 = 2; t = -3/sqrt(2); df = 4/(1/18 + 25/27)
    val ev = Seq((2L, "a", 1.0), (4L, "a", 2.0), (6L, "a", 3.0),
      (1L, "a", 2.0), (3L, "a", 4.0), (5L, "a", 6.0), (7L, "a", 8.0))
      .toDF("user_id", "event_type", "value")
    val d = eventsDir(ev)
    val r = InferenceOps.queries("q136_welch_ttest")(spark, d).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(1) == 3 && row.getLong(2) == 4)
    assert(row.getDouble(3) == -3.0)
    assert(row.getDouble(4) == BigDecimal(-3.0 / math.sqrt(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(row.getDouble(5) == BigDecimal(4.0 / (1.0 / 18 + 25.0 / 27))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("q205 ANOVA matches the closed-form F on two crafted groups") {
    // a={1,2,3}, b={4,5,6}: SSB = 13.5, SSW = 4, F = 13.5/(4/4) = 13.5
    val ev = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 4.0), ("b", 5.0), ("b", 6.0))
      .map { case (t, v) => (1L, t, v) }
      .toDF("user_id", "event_type", "value")
    val r = InferenceOps.queries("q205_anova")(spark, eventsDir(ev)).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(0) == 2 && row.getLong(1) == 6)
    assert(row.getDouble(2) == 13.5 && row.getDouble(3) == 4.0)
    assert(row.getDouble(4) == 13.5)
  }

  test("q188 KS: D matches the hand-computed supremum") {
    // arm A (even users) {1,2,3}; arm B (odd users) {2,4}
    // CDF gaps at v=1,2,3,4: 1/3, 1/6, 1/2, 0 -> D = 0.5
    val ev = Seq((2L, "a", 1.0), (4L, "a", 2.0), (6L, "a", 3.0),
      (1L, "a", 2.0), (3L, "a", 4.0))
      .toDF("user_id", "event_type", "value")
    val d = eventsDir(ev)
    val r = InferenceOps.queries("q188_ks_test")(spark, d).collect()
    assert(r.length == 1)
    assert(r.head.getLong(1) == 3 && r.head.getLong(2) == 2)
    assert(r.head.getDouble(3) == 0.5)
  }

  test("q188 KS on driver data: D bounded in [0, 1], arms partition rows") {
    val rows = InferenceOps.queries("q188_ks_test")(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = Tables(spark, sf, "events").count()
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum == total)
    rows.foreach { r =>
      val d = r.getDouble(3)
      assert(d >= 0.0 && d <= 1.0, s"D out of range: $r")
    }
  }

  test("q188 KS: identical samples give D = 0") {
    // mirror the arms exactly: every value appears once per arm
    val ev = Seq(1.0, 2.0, 3.0).flatMap(v =>
      Seq((2L, "a", v), (1L, "a", v)))
      .toDF("user_id", "event_type", "value")
    val d = eventsDir(ev)
    val r = InferenceOps.queries("q188_ks_test")(spark, d).collect()
    assert(r.length == 1 && r.head.getDouble(3) == 0.0)
  }

  test("chi-square cells vanish under exact independence") {
    // type a: 2 users per bucket; type b: 1 user per bucket — the
    // contingency table is exactly independent, so every cell's
    // (o-e)^2/e must be 0
    val ev = ((0 to 5).map(u => (u.toLong, "a", 1.0)) ++
      (0 to 2).map(u => (u.toLong, "b", 1.0)))
      .toDF("user_id", "event_type", "value")
    val d = eventsDir(ev)
    val rows = InferenceOps.queries("q137_chi_square")(spark, d).collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      assert(r.getDouble(4) == 0.0, s"cell $r not independent")
      assert(r.getLong(2) == math.round(r.getDouble(3)), "e == o here")
    }
  }

  test("chi-square marginals are consistent on real data") {
    val rows = InferenceOps.queries("q137_chi_square")(spark, sf).collect()
    val total = Tables(spark, sf, "events").count()
    assert(rows.map(_.getLong(2)).sum == total, "cells partition the corpus")
    assert(rows.forall(_.getDouble(3) > 0))
    assert(rows.forall(_.getDouble(4) >= 0))
    // expected counts preserve row totals (within rounding)
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val o = rs.map(_.getLong(2)).sum.toDouble
      val e = rs.map(_.getDouble(3)).sum
      assert(math.abs(o - e) < 1e-3, s"row marginal drift: $o vs $e")
    }
  }

  test("autocorrelation of an alternating series is exactly -1, +1, -1") {
    val day0 = 1704067200000L // 2024-01-01 UTC
    val ev = (0 until 12).map { i =>
      (new Timestamp(day0 + i * 86400000L), "a", if (i % 2 == 0) 10.0 else -10.0)
    }.toDF("ts", "event_type", "value")
    val d = eventsDir(ev)
    val rows = InferenceOps.queries("q142_autocorr")(spark, d).collect()
      .map(r => (r.getInt(1), r.getLong(2), r.getDouble(3))).sortBy(_._1)
    // lag 1: pairs lie on y = -x -> acf -1; lag 2: y = x -> +1; lag 3: -1
    assert(rows.map(_._1).toSeq == Seq(1, 2, 3))
    assert(rows.map(_._2).toSeq == Seq(11L, 10L, 9L), "pair counts shrink by lag")
    assert(rows.map(_._3).toSeq == Seq(-1.0, 1.0, -1.0))
  }

  test("seasonal anomaly flags exactly the planted week-over-week spike") {
    val day0 = 1704067200000L // 2024-01-01 UTC
    // flat daily total of 10 for two weeks, except day 10 spikes to 100:
    // residuals vs lag-7 are 0 everywhere but day 10 (r=90), whose
    // z ≈ 2.268 is the only one past the 2.0 gate
    val ev = (0 until 14).map { i =>
      (new Timestamp(day0 + i * 86400000L), "a",
        if (i == 10) 100.0 else 10.0)
    }.toDF("ts", "event_type", "value")
    val d = eventsDir(ev)
    val rows = InferenceOps.queries("q148_seasonal_anomaly")(spark, d).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getTimestamp(1).getTime == day0 + 10 * 86400000L)
    assert(r.getDouble(2) == 100.0 && r.getDouble(3) == 10.0)
    assert(r.getDouble(4) > 2.2 && r.getDouble(4) < 2.3)
  }

  test("seasonal anomaly moments broadcast; constant series yields no flags") {
    val df = InferenceOps.queries("q148_seasonal_anomaly")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(p.contains("BroadcastHashJoin"),
      s"per-type moments must broadcast back over the series:\n$p")
    // an exactly-periodic series has all-zero residuals -> std 0 -> excluded
    val day0 = 1704067200000L
    val flat = (0 until 21).map { i =>
      (new Timestamp(day0 + i * 86400000L), "b", 5.0)
    }.toDF("ts", "event_type", "value")
    val d = eventsDir(flat)
    assert(InferenceOps.queries("q148_seasonal_anomaly")(spark, d).count() == 0)
  }

  test("time-weighted average weighs each reading by its holding interval") {
    val t0 = 1704067200000L
    // readings: 10 held for 1s, 20 held for 2s, 30 closes the series ->
    // twa = (10*1 + 20*2) / 3 = 50/3; plain mean of the held rows = 15
    val ev = Seq((new Timestamp(t0), 1L, "a", 10.0),
      (new Timestamp(t0 + 1000L), 2L, "a", 20.0),
      (new Timestamp(t0 + 3000L), 3L, "a", 30.0))
      .toDF("ts", "event_id", "event_type", "value")
    val d = eventsDir(ev)
    val r = graft.queries.EventQueries
      .queries("q150_time_weighted_avg")(spark, d).collect()
    assert(r.length == 1)
    assert(r.head.getLong(1) == 2)
    assert(r.head.getDouble(2) == BigDecimal(50.0 / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.head.getDouble(3) == 15.0)
  }

  test("mann-whitney U matches the hand computation with tied ranks") {
    // arm A (even users): values 1, 3; arm B (odd): 2, 3
    // ranks by value: 1→1, 2→2, 3 and 3 tie at ranks 3,4 → mean 3.5
    // ra = 1 + 3.5 = 4.5; U = 4.5 - 2·3/2 = 1.5
    val ev = Seq((2L, "a", 1.0, 1L), (4L, "a", 3.0, 2L),
      (1L, "a", 2.0, 3L), (3L, "a", 3.0, 4L))
      .toDF("user_id", "event_type", "value", "event_id")
    val d = eventsDir(ev)
    val r = InferenceOps.queries("q186_mann_whitney")(spark, d).collect()
    assert(r.length == 1)
    assert(r.head.getLong(1) == 2 && r.head.getLong(2) == 2)
    assert(r.head.getDouble(3) == 1.5)
    val z = (4.5 - 3.0 - 2.0) / math.sqrt(2.0 * 2 * 5 / 12)
    assert(r.head.getDouble(4) == BigDecimal(z)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("spearman is exactly 1 on a perfectly monotone relation") {
    val li = Seq((1L, 1, 1.0, 10.0), (1L, 2, 2.0, 20.0),
      (1L, 3, 3.0, 30.0), (1L, 4, 4.0, 40.0))
      .map { case (ok, ln, q, p) => (ok, 1L, 1L, ln, q, p, 0.0, 0.0,
        "A", "F", java.sql.Timestamp.valueOf("2024-01-01 00:00:00")) }
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
    val dir = java.nio.file.Files.createTempDirectory("graft-sp").toString
    li.write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = InferenceOps.queries("q187_spearman")(spark, dir).collect()
    assert(r.length == 1 && r.head.getLong(1) == 4)
    assert(r.head.getDouble(2) == 1.0)
  }

  test("autocorrelation on real data stays in [-1, 1] with per-lag pair counts") {
    val daily = Tables(spark, sf, "events")
      .groupBy(col("event_type"), date_trunc("day", col("ts"))).count()
      .groupBy(col("event_type")).count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val rows = InferenceOps.queries("q142_autocorr")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (et, lag, n, acf) =
        (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3))
      assert(n == daily(et) - lag, s"pair count off for $et lag $lag")
      assert(acf >= -1.0 && acf <= 1.0, s"acf out of range: $acf")
    }
  }
  test("q225 bootstrap CI: degenerate identical days collapse the interval") {
    import java.sql.Timestamp
    import spark.implicits._
    // every day has the same single value -> every replica mean == mean
    val rows = (1 to 20).map(dd =>
      (dd.toLong, Timestamp.valueOf(f"2024-01-$dd%02d 09:00:00"), 1L,
        "flat", 7.25, "{}"))
    val df = rows.toDF("event_id", "ts", "user_id", "event_type",
      "value", "props")
    val out = InferenceOps.queries("q225_bootstrap_ci")(spark, sf)
    // driver-data shape assertions ride below; the crafted frame runs
    // through the same code path via a direct call on the daily shape
    val r = bootstrapOn(df).collect().head
    assert(r.getAs[Double]("mean") === 7.25)
    assert(r.getAs[Double]("ci_lo") === 7.25)
    assert(r.getAs[Double]("ci_hi") === 7.25)
    assert(out.columns.toSeq ===
      Seq("event_type", "n_reps", "mean", "ci_lo", "ci_hi"))
  }

  test("q225 bootstrap CI brackets the full-sample mean on driver data") {
    val rows = InferenceOps.queries("q225_bootstrap_ci")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (lo, m, hi) = (r.getAs[Double]("ci_lo"), r.getAs[Double]("mean"),
        r.getAs[Double]("ci_hi"))
      assert(lo <= hi)
      assert(lo <= m && m <= hi,
        s"CI [$lo, $hi] misses mean $m for ${r.getString(0)}")
      // half-sampling keeps most of the 200 replicas non-empty
      assert(r.getAs[Long]("n_reps") > 150L)
    }
  }

  test("q225 bootstrap is deterministic across invocations") {
    val a = InferenceOps.queries("q225_bootstrap_ci")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    val b = InferenceOps.queries("q225_bootstrap_ci")(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    assert(a === b)
  }

  /** The q225 pipeline applied to an arbitrary events frame (the driver
    * entry binds it to the sf dir; specs need crafted frames).
    */
  private def bootstrapOn(events: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val d = java.nio.file.Files.createTempDirectory("graft-q225").toString
    events.write.mode("overwrite").parquet(s"$d/events.parquet")
    InferenceOps.queries("q225_bootstrap_ci")(spark, d)
  }

  test("grouped-rank Spearman is bit-identical to the window form") {
    def run(name: String) = SparkEntry.queries(name)(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val window = run("q187_spearman")
    val rank = run("stats_spearman_rank")
    assert(window.nonEmpty && rank == window,
      s"grouped-rank form diverged: $rank vs $window")
  }

  test("grouped-rank Mann-Whitney is bit-identical to the window form") {
    def run(name: String) = SparkEntry.queries(name)(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSet
    val window = run("q186_mann_whitney")
    val rank = run("stats_mwu_rank")
    assert(window.nonEmpty && rank == window,
      s"grouped-rank MWU diverged: $rank vs $window")
  }

  test("conformal: hand-computed q_hat and coverage on a crafted table") {
    import spark.implicits._
    // slice = (l_orderkey + l_linenumber) % 3 with l_linenumber = 1:
    // ok ≡ 2 (mod 3) → train, ok ≡ 0 → calibration, ok ≡ 1 → test.
    // train: y = 10x exactly → slope 10, intercept 0.
    val train = Seq((2L, 1.0, 10.0), (5L, 2.0, 20.0), (8L, 3.0, 30.0),
      (11L, 4.0, 40.0))
    // calibration: residuals 0..9 (n_cal = 10 → k = min(⌈11·0.9⌉,10) =
    // 10 → q_hat = 9.0, the largest)
    val cal = (0 until 10).map(i => (3L * i, 1.0 + i, 10.0 * (1 + i) + i))
    // test: residuals 5 (covered) and 9.5 (not) → coverage 0.5
    val test = Seq((1L, 2.0, 25.0), (4L, 3.0, 39.5))
    val li = (train ++ cal ++ test).map { case (ok, x, y) =>
      (ok, 1L, "A", x, y, Timestamp.valueOf("2024-01-15 00:00:00")) }
      .toDF("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity",
        "l_extendedprice", "l_shipdate")
    val dir = java.nio.file.Files.createTempDirectory("graft-conf").toString
    li.write.parquet(s"$dir/lineitem.parquet")
    val r = InferenceOps.queries("q254_conformal")(spark, dir).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getString(0) === "A")
    assert(row.getLong(1) === 10L) // n_cal
    assert(row.getLong(2) === 2L) // n_test
    assert(row.getDouble(3) === 9.0) // q_hat
    assert(row.getDouble(4) === 0.5) // coverage
  }

  test("conformal coverage lands near the 0.9 target on real data") {
    val rows = InferenceOps.queries("q254_conformal")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val cov = r.getDouble(4)
      // finite-sample guarantee is ≥ 0.9 in expectation over splits;
      // a fixed split on real data should still land in a sane band
      assert(cov > 0.8 && cov <= 1.0,
        s"coverage out of band for ${r.getString(0)}: $cov")
    }
  }

  test("packed-prefix KS twin is bit-identical to the window form") {
    // the packed ca·2^32 + cb running sum must unpack to the exact
    // inclusive cumulatives the per-type window computed
    def run(name: String) = SparkEntry.queries(name)(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    val window = run("q188_ks_test")
    val rank = run("stats_ks_rank")
    assert(window.nonEmpty && rank == window,
      s"packed-prefix KS diverged: $rank vs $window")
  }
}
