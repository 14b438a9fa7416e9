package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.GlobalRank
import graft.queries.{BehaviorOps, StringSimOps, TemporalOps}

class TemporalOpsSpec extends SparkSpec {
  import spark.implicits._

  private def dirWith(name: String, df: DataFrame): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-tmp").toString
    df.write.mode("overwrite").parquet(s"$dir/$name.parquet")
    dir
  }

  private def ts(day: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-${day}%02d 00:00:${sec}%02d")

  test("q155 survival matches the hand-computed Kaplan-Meier curve") {
    // custA orders day1+day11 (gap 10), custB day1+day6 (gap 5),
    // custC day1 only. Horizon = day11. Censored tails: A 0, B 5, C 10.
    // KM: S(5) = 1 - 1/4 = 0.75; S(10) = 0.75 * (1 - 1/2) = 0.375.
    val o = Seq((1L, ts(1)), (1L, ts(11)), (2L, ts(1)), (2L, ts(6)),
      (3L, ts(1)))
      .toDF("o_custkey", "o_orderdate")
    val d = dirWith("orders", o)
    val r = TemporalOps.queries("q155_survival")(spark, d)
      .orderBy("dur_days").collect()
    assert(r.map(x => (x.getInt(0), x.getLong(1), x.getLong(2),
      x.getDouble(3))).toSeq ==
      Seq((5, 4L, 1L, 0.75), (10, 2L, 1L, 0.375)))
  }

  test("q155 survival hits exact zero when the max duration is an event") {
    // both customers' gaps are the max duration and both are events:
    // the (n_risk - d) = 0 guard must yield survival 0, not NULL
    val o = Seq((1L, ts(1)), (1L, ts(11)), (2L, ts(1)), (2L, ts(11)))
      .toDF("o_custkey", "o_orderdate")
    val d = dirWith("orders", o)
    val r = TemporalOps.queries("q155_survival")(spark, d).collect()
    assert(r.length == 1)
    assert(r.head.getInt(0) == 10 && r.head.getLong(1) == 2 &&
      r.head.getLong(2) == 2 && r.head.getDouble(3) == 0.0)
  }

  test("q155 survival is monotonically non-increasing on driver data") {
    val r = TemporalOps.queries("q155_survival")(spark, sf)
      .orderBy("dur_days").select("survival").as[Double].collect()
    assert(r.nonEmpty)
    r.sliding(2).foreach {
      case Array(a, b) => assert(b <= a + 1e-12)
      case _ =>
    }
  }

  test("q156 interpolation fills interior holes linearly, leaves edges null") {
    // one type; known points day1=200, day4=300; day2 has a sub-threshold
    // event (hole), day3 no event (hole), day5 sub-threshold trailing hole
    val ev = Seq((1L, ts(1), 1L, "t", 200.0, "{}"),
      (2L, ts(2), 1L, "t", 100.0, "{}"),
      (3L, ts(4), 1L, "t", 300.0, "{}"),
      (4L, ts(5), 1L, "t", 50.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val d = dirWith("events", ev)
    val r = TemporalOps.queries("q156_interpolate")(spark, d)
      .orderBy("day").collect()
    assert(r.length == 5)
    def y(i: Int): Any = if (r(i).isNullAt(2)) null else r(i).getDouble(2)
    assert(y(0) == 200.0 && !r(0).getBoolean(3))
    assert(y(1) == BigDecimal(200.0 + 100.0 / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r(1).getBoolean(3))
    assert(y(2) == BigDecimal(200.0 + 200.0 / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(y(3) == 300.0 && !r(3).getBoolean(3))
    assert(y(4) == null && !r(4).getBoolean(3))
  }

  test("q179 decomposition: constant series has zero seasonal/residual") {
    // one event of value 10 every day for 21 days: interior days get
    // trend 10, seasonal 0, residual 0; the 3-day edges have no trend
    val ev = (1 to 21).map(day => (day.toLong, ts(day), 1L, "t", 10.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val d = dirWith("events", ev)
    val r = TemporalOps.queries("q179_seasonal_decompose")(spark, d)
      .orderBy("day").collect()
    assert(r.length == 21)
    (0 until 21).foreach { i =>
      if (i < 3 || i >= 18) assert(r(i).isNullAt(3))
      else {
        assert(r(i).getDouble(3) == 10.0)
        assert(r(i).getDouble(4) == 0.0)
        assert(r(i).getDouble(5) == 0.0)
      }
    }
  }

  test("q159 cusum finds a planted mean shift at its boundary day") {
    // value 10/day for days 1-5, 20/day for days 6-10: |S| peaks at day5
    val ev = (1 to 10).map(day => (day.toLong, ts(day), 1L, "t",
      if (day <= 5) 10.0 else 20.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val d = dirWith("events", ev)
    val r = TemporalOps.queries("q159_cusum")(spark, d).collect()
    assert(r.length == 1)
    assert(r.head.getTimestamp(1) == ts(5))
    val std = math.sqrt((2500.0 - 150.0 * 150.0 / 10) / 9)
    val expect = BigDecimal(25.0 / (std * math.sqrt(10.0)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.head.getDouble(2) == expect)
  }

  test("q157 attribution credits last and first touch per purchase") {
    // user1: view, purchase(10), click, purchase(5); user2: purchase(7)
    val ev = Seq(
      (1L, ts(1, 1), 1L, "view", 1.0, "{}"),
      (2L, ts(1, 2), 1L, "purchase", 10.0, "{}"),
      (3L, ts(1, 3), 1L, "click", 1.0, "{}"),
      (4L, ts(1, 4), 1L, "purchase", 5.0, "{}"),
      (5L, ts(1, 1), 2L, "purchase", 7.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val d = dirWith("events", ev)
    val r = BehaviorOps.queries("q157_attribution")(spark, d)
      .collect().map(x => (x.getString(0), x.getString(1),
        x.getLong(2), x.getDouble(3))).toSet
    assert(r == Set(
      ("last_touch", "view", 1L, 10.0),
      ("last_touch", "click", 1L, 5.0),
      ("last_touch", "direct", 1L, 7.0),
      ("first_touch", "view", 2L, 15.0),
      ("first_touch", "direct", 1L, 7.0)))
  }

  test("withRankInGroups equals the PARTITION BY row_number") {
    val df = spark.range(0, 2000).repartition(7)
      .select((col("id") % 3).cast("string").as("g"),
        (col("id") * 2654435761L % 1000003L).as("k"), col("id"))
    val got = GlobalRank.withRankInGroups(df, "rn", col("g"),
      col("k"), col("id"))
    val want = df.withColumn("rn",
      row_number().over(Window.partitionBy(col("g"))
        .orderBy(col("k"), col("id"))).cast("long"))
    assert(got.select("g", "k", "id", "rn").except(want).isEmpty)
    assert(want.except(got.select("g", "k", "id", "rn")).isEmpty)
  }

  test("withRankInGroups: NULL groups rank, direction-wrapped group refused") {
    // null-safe offsets join — rows whose group is NULL are a real
    // group, not silently dropped (regression: === dropped them)
    val df = spark.range(0, 300).repartition(5)
      .select(when(col("id") % 3 === 0, lit(null).cast("string"))
        .otherwise((col("id") % 3).cast("string")).as("g"),
        (col("id") * 2654435761L % 1000003L).as("k"), col("id"))
    val got = GlobalRank.withRankInGroups(df, "rn", col("g"),
      col("k"), col("id"))
    assert(got.count() === 300L, "NULL-group rows must survive the join")
    val want = df.withColumn("rn",
      row_number().over(Window.partitionBy(col("g"))
        .orderBy(col("k"), col("id"))).cast("long"))
    assert(got.select("g", "k", "id", "rn").except(want).isEmpty)
    assert(want.except(got.select("g", "k", "id", "rn")).isEmpty)
    // a .desc-wrapped group would break the ascending offsets window —
    // rejected loudly instead of mis-ranking
    val e = intercept[IllegalArgumentException] {
      GlobalRank.withRankInGroups(df, "rn", col("g").desc, col("k"))
    }
    assert(e.getMessage.contains("bare"))
  }

  test("withRankInGroups offsets join stays a plain equi-join " +
      "(no EqualNullSafe key rewrite)") {
    // round 7 pinned NULL-group correctness with `<=>`, which rewrote
    // both offsets-join keys to coalesce+isnull pairs and slowed every
    // caller 59-84%; the left-join + NULLS FIRST form keeps plain keys.
    // Pin the shape: every broadcast-hash-join key in the plan is free
    // of the EqualNullSafe artifacts (Coalesce / IsNull wrappers).
    val df = spark.range(0, 500).repartition(5)
      .select((col("id") % 3).cast("string").as("g"),
        (col("id") * 2654435761L % 1000003L).as("k"), col("id"))
    val out = GlobalRank.withRankInGroups(df, "rn", col("g"), col("k"),
      col("id"))
    out.collect() // resolve the AQE final plan (the PlanAudit recipe)
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val bhj = plan.linesIterator
      .filter(_.contains("BroadcastHashJoin")).toSeq
    assert(bhj.nonEmpty, s"expected broadcast hash joins in:\n$plan")
    assert(bhj.forall(l => !l.contains("coalesce(") &&
        !l.contains("isnull(")),
      s"EqualNullSafe key rewrite crept back into the offsets join:\n" +
        bhj.mkString("\n"))
  }

  test("withPrefixSum equals the global windowed running sum") {
    val df = spark.range(0, 700).repartition(6)
      .select((col("id") * 2654435761L % 1000003L).as("k"),
        (col("id") % 5 + 1).as("w"))
    val got = GlobalRank.withPrefixSum(df, "ps", col("w"), col("k"))
    val want = df.withColumn("ps",
      coalesce(sum(col("w")).over(Window.orderBy(col("k"))
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    assert(got.select("k", "w", "ps").except(want).isEmpty)
    assert(want.except(got.select("k", "w", "ps")).isEmpty)
  }

  test("withPrefixSumInGroups equals the windowed running sum, " +
      "NULL group included; direction-wrapped group refused") {
    val df = spark.range(0, 900).repartition(7)
      .select(when(col("id") % 4 === 0, lit(null).cast("string"))
        .otherwise((col("id") % 4).cast("string")).as("g"),
        (col("id") * 2654435761L % 1000003L).as("k"),
        (col("id") % 7 + 1).as("w"))
    val got = GlobalRank.withPrefixSumInGroups(df, "ps", col("w"),
      col("g"), col("k"))
    val want = df.withColumn("ps",
      coalesce(sum(col("w")).over(Window.partitionBy(col("g"))
        .orderBy(col("k"))
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    assert(got.count() === 900L, "NULL-group rows must survive")
    assert(got.select("g", "k", "w", "ps").except(want).isEmpty)
    assert(want.except(got.select("g", "k", "w", "ps")).isEmpty)
    val e = intercept[IllegalArgumentException] {
      GlobalRank.withPrefixSumInGroups(df, "ps", col("w"),
        col("g").desc, col("k"))
    }
    assert(e.getMessage.contains("bare"))
  }

  test("GlobalRank equals the single-partition row_number") {
    val df = spark.range(0, 1000).repartition(7)
      .select((col("id") * 2654435761L % 1000003L).as("k"), col("id"))
    val got = GlobalRank.withRank(df, "rn", col("k"), col("id"))
    val want = df.withColumn("rn",
      row_number().over(Window.orderBy(col("k"), col("id"))))
    assert(got.select("k", "id", "rn").except(want).isEmpty)
    assert(want.except(got.select("k", "id", "rn")).isEmpty)
  }

  test("GlobalRank preserves every input row (pinned ranged layout)") {
    // regression for the 10x smoke bug: without the eager checkpoint,
    // the rank branch and the offsets branch re-sample range boundaries
    // independently (fresh RDD id seeds the partitioner) and the pid
    // join dropped ~half the rows nondeterministically
    val n = 200000L
    val df = spark.range(0, n).repartition(13)
      .select((col("id") * 2654435761L % 999983L).as("k"), col("id"))
    val ranked = GlobalRank.withRank(df, "rn", col("k"), col("id"))
    assert(ranked.count() == n, "no row may be lost to boundary drift")
    // gap-free: rank values are exactly 1..n (distinct count suffices
    // with min/max given count == n)
    val mm = ranked.agg(min("rn"), max("rn"),
      countDistinct("rn")).head()
    assert(mm.getLong(0) == 1L && mm.getLong(1) == n
      && mm.getLong(2) == n)
  }

  test("GlobalRank does not globally window the input relation") {
    // the only Window in the plan runs over the partition-size table
    // (bounded metadata); the input-sized relation is never coalesced
    // into one task for ranking — its window partitions by partition id
    val df = spark.range(0, 1000).repartition(7)
      .select(col("id").as("k"), col("id"))
    val plan = GlobalRank.withRank(df, "rn", col("k"), col("id"))
      .queryExecution.optimizedPlan.toString
    val windowSpecs = "windowspecdefinition\\(([^)]*)\\)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(windowSpecs.nonEmpty)
    // every window over the ranged relation is keyed by __gr_pid; the
    // offsets window runs over counts only (count appears in its frame)
    assert(windowSpecs.forall(s =>
      s.contains("__gr_pid") || s.contains("count")))
  }

  test("q160 sorted-neighborhood pairs sort-adjacent near-dups only") {
    val c = Seq((10L, "alpha one"), (20L, "alpha onf"), (30L, "zeta far"))
      .toDF("c_custkey", "c_name")
    val d = dirWith("customer", c)
    val r = StringSimOps.queries("q160_sorted_neighborhood")(spark, d)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).toSet
    assert(r == Set((10L, 20L, 1)))
  }

  test("q158 profile reports nulls, distincts and typed min/max") {
    val li = Seq(
      (1L, 1L, 1L, 1, 5.0, 100.0, 0.1, 0.02, "A", "F", ts(1)),
      (2L, 1L, 2L, 2, 7.0, 200.0, 0.0, 0.04, "R", "O", ts(2)))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .withColumn("l_tax",
        when(col("l_orderkey") === 2, lit(null)).otherwise(col("l_tax")))
    val d = dirWith("lineitem", li)
    val r = graft.queries.WarehouseOps.queries("q158_profile")(spark, d)
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r.size == 11)
    assert(r("l_tax").getLong(1) == 1 && r("l_tax").getLong(2) == 1)
    assert(r("l_partkey").getLong(2) == 1)
    assert(r("l_quantity").getDouble(3) == 5.0 &&
      r("l_quantity").getDouble(4) == 7.0)
    assert(r("l_returnflag").getString(5) == "A" &&
      r("l_returnflag").getString(6) == "R")
    assert(r("l_shipdate").getString(5) == "2024-01-01 00:00:00")
  }

  private def clampedLineitem(rows: Seq[(Long, Int, Long, Int, Double,
      String)]): String =
    dirWith("lineitem", rows.map { case (sk, day, ok, ln, qty, rf) =>
      (sk, ts(day), ok, ln, qty, rf)
    }.toDF("l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber",
      "l_quantity", "l_returnflag"))

  test("q243 clamped balance matches the hand-walked fold") {
    // supplier 1: issue 5 (clamps, 5 lost), return 3, issue 2, issue 4
    // (clamps, 3 lost), return 6 → B = [0, 3, 1, 0, 6]
    // supplier 2: returns only → never clamps
    val d = clampedLineitem(Seq(
      (1L, 1, 10L, 1, 5.0, "N"), (1L, 2, 11L, 1, 3.0, "R"),
      (1L, 3, 12L, 1, 2.0, "A"), (1L, 4, 13L, 1, 4.0, "N"),
      (1L, 5, 14L, 1, 6.0, "R"),
      (2L, 1, 20L, 1, 1.0, "R"), (2L, 2, 21L, 1, 2.0, "R")))
    val r = TemporalOps.queries("q243_clamped_balance")(spark, d)
      .collect().map(x => x.getLong(0) ->
        ((x.getDouble(1), x.getDouble(2), x.getLong(3), x.getLong(4))))
      .toMap
    assert(r(1L) === ((6.0, 8.0, 2L, 5L)))
    assert(r(2L) === ((3.0, 0.0, 0L, 2L)))
  }

  test("q243 Lindley rewrite equals the direct per-row fold (seeded)") {
    val rng = new scala.util.Random(42)
    val rows = (0 until 120).map { i =>
      val sk = (i % 3 + 1).toLong
      val qty = (rng.nextInt(9) + 1).toDouble
      val rf = if (rng.nextBoolean()) "R" else "N"
      (sk, i % 28 + 1, 100L + i, 1, qty, rf)
    }
    val d = clampedLineitem(rows)
    val got = TemporalOps.queries("q243_clamped_balance")(spark, d)
      .collect().map(x => x.getLong(0) ->
        ((x.getDouble(1), x.getDouble(2), x.getLong(3), x.getLong(4))))
      .toMap
    val want = rows.groupBy(_._1).map { case (sk, rs) =>
      val ordered = rs.sortBy(r => (r._2, r._3, r._4))
      var bal = 0.0; var lost = 0.0; var stockouts = 0L
      ordered.foreach { r =>
        val delta = if (r._6 == "R") r._5 else -r._5
        if (bal + delta < 0) { stockouts += 1; lost += -(bal + delta) }
        bal = math.max(0.0, bal + delta)
      }
      sk -> ((bal, lost, stockouts, ordered.size.toLong))
    }
    assert(got === want)
  }
}
