package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Trend detection over daily event series (SURVEY.md §2.11 [EXT]) —
  * the monotonic-trend complement to q142's ACF and q159's CUSUM
  * change-point:
  *
  *  - q222 Mann-Kendall trend test + Sen's slope per event_type: S =
  *    Σ_{i<j} sign(x_j − x_i) with the tie-corrected variance
  *    Var(S) = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)] / 18, the standard
  *    continuity-corrected z, and the Theil–Sen slope estimate
  *    (median of all pairwise slopes — the robust trend magnitude).
  *    The corpus collapses to ONE decimal-exact daily aggregation
  *    (calendar-bounded: ≤31 rows per type); the pairwise stage is a
  *    self-join of that bounded table (C(31,2) pairs per type —
  *    metadata, not data). S and the tie terms are INTEGER-exact; the
  *    median slope is an order-statistic pick (row_number against the
  *    pair count — avg of the two middles when even), not a float
  *    interpolation, so the oracle hash-compares.
  *  - q224 isotonic regression (PAVA) of the daily mean onto the day
  *    axis per event_type, weighted by daily counts: pool-adjacent-
  *    violators over the ≤31-element series, carrying DECIMAL
  *    numerators and LONG weights through every pool so the final
  *    fitted value is one double division per block. The per-type
  *    series is collect_list'ed AFTER the daily reduction (bounded
  *    array), and PAVA runs as a typed flatMap per group — the
  *    imperative step touches calendar-bounded metadata only. PAVA has
  *    no SQL form, so this is a rows-only entry pinned by TrendSpec
  *    (hand-computed pools, monotonicity, weighted-mean preservation,
  *    and idempotence on already-monotone input).
  *
  * Scale: both ops reduce the corpus in one map-side-combined shuffle
  * keyed by (type, day); everything after is calendar-bounded. At
  * 100 TB the daily table is still ≤ types×366 rows/year — the
  * pairwise join and the PAVA fold never see data volume.
  */
object TrendOps {

  private val dec = DecimalType(18, 2)

  /** q265 change-point LOCALIZATION — binary segmentation's first (and
    * often only) split [Scott & Knott, Biometrics 1974; the AMOC case
    * of Killick's PELT]: per event type, the day boundary that
    * maximizes the between-segment sum-of-squares reduction of the
    * value series — "WHERE did the level shift?" beside q159 CUSUM's
    * sequential "DID it shift?" and q222 Mann-Kendall's "is there a
    * monotone trend?".
    *
    * gain(k) = cs²/cn + (s−cs)²/(n−cn) − s²/n over the per-type daily
    * prefix sums — maximizing it is exactly minimizing the two-segment
    * SSE (the variance decomposition; event-weighted, so days pool by
    * their event counts). Cost shape: the corpus reduces to the DAILY
    * grain in one map-side-combined aggregation; every window here
    * runs over that calendar-bounded table (days × types), never the
    * corpus. Day sums ride DECIMAL (exact, order-independent); the
    * gain assembles in double on identical values cross-engine and
    * rounds once. Argmax tie-breaks earliest day.
    */
  def changepoint(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast(DecimalType(18, 4))).as("vs"))
    val wOrd = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val wAll = Window.partitionBy(col("event_type"))
    val pre = daily
      .withColumn("cn", sum(col("cnt")).over(wOrd))
      .withColumn("cs", sum(col("vs")).over(wOrd))
      .withColumn("n", sum(col("cnt")).over(wAll))
      .withColumn("s", sum(col("vs")).over(wAll))
      .filter(col("cn") < col("n"))
    val cs = col("cs").cast("double"); val sAll = col("s").cast("double")
    val cn = col("cn").cast("double"); val nAll = col("n").cast("double")
    val gain = cs * cs / cn + (sAll - cs) * (sAll - cs) / (nAll - cn) -
      sAll * sAll / nAll
    val wBest = Window.partitionBy(col("event_type"))
      .orderBy(col("gain").desc, col("day"))
    pre.withColumn("gain", gain)
      .withColumn("rn", row_number().over(wBest)).filter(col("rn") === 1)
      .select(col("event_type"), col("day").cast("string").as("split_day"),
        col("cn").as("n_before"), (col("n") - col("cn")).as("n_after"),
        round(cs / cn, 6).as("mean_before"),
        round((sAll - cs) / (nAll - cn), 6).as("mean_after"),
        round(col("gain"), 6).as("gain"))
  }

  /** q267 forecast backtest with MASE [Hyndman & Koehler, IJF 2006] —
    * the eval that decides whether q247's Holt smoothing earns its
    * keep: per event type, the one-step-ahead MAE of the Holt forecast
    * against the naive-1 (yesterday) and seasonal-naive-7 (last week)
    * baselines on the SAME days, as Mean Absolute SCALED Error — the
    * scale-free "is the model beating the trivial forecaster?" number
    * (MASE < 1 = yes). A pipeline alarms on q265/q159 change-points;
    * it only trusts the forecast channel when this audit clears.
    *
    * Everything runs over [[holt]]'s CALENDAR-bounded daily output:
    * the lag windows and error sums touch ≤366 rows per type. Errors
    * are |x − forecast| in integer MICROS (x is the exact decimal
    * daily sum, the forecast is q247's once-rounded value both
    * engines already hash-agree on), so the per-type error sums are
    * order-independent longs and every ratio rounds once.
    */
  def maseBacktest(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    def errM(c: org.apache.spark.sql.Column) =
      round(abs(c) * lit(1e6), 0).cast("long")
    val t = holt(ev)
      .withColumn("fc", lag(col("forecast_next"), 1).over(w))
      .withColumn("xp", lag(col("x"), 1).over(w))
      .withColumn("x7", lag(col("x"), 7).over(w))
    t.groupBy(col("event_type")).agg(
        sum(when(col("fc").isNotNull, errM(col("x") - col("fc"))))
          .as("eh"),
        sum(when(col("xp").isNotNull, errM(col("x") - col("xp"))))
          .as("en"),
        count(when(col("fc").isNotNull, 1L)).as("n1"),
        sum(when(col("x7").isNotNull, errM(col("x") - col("fc"))))
          .as("eh7"),
        sum(when(col("x7").isNotNull, errM(col("x") - col("x7"))))
          .as("e7"))
      .select(col("event_type"), col("n1").as("n_backtest"),
        round(col("eh") / col("n1") / lit(1e6), 6).as("mae_holt"),
        round(col("en") / col("n1") / lit(1e6), 6).as("mae_naive"),
        when(col("en") > 0,
          round(col("eh").cast("double") / col("en"), 6)).as("mase"),
        when(col("e7") > 0,
          round(col("eh7").cast("double") / col("e7"), 6))
          .as("mase_seasonal"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q265_changepoint" -> ((s, d) => changepoint(Tables(s, d, "events"))),
    "q267_mase_backtest" -> ((s, d) =>
      maseBacktest(Tables(s, d, "events"))),
    "q222_mann_kendall" -> ((s, d) => mannKendall(Tables(s, d, "events"))),
    "q224_isotonic" -> ((s, d) => isotonic(Tables(s, d, "events"))),
    "q247_holt" -> ((s, d) => holt(Tables(s, d, "events"))),
    "q248_holt_winters" -> ((s, d) => holtWinters(Tables(s, d, "events"))))

  /** Holt smoothing constants — EXACT binary fractions (0.5, 0.25), so
    * every fold step is the same IEEE operation sequence in both
    * engines and the recurrence is bit-reproducible cross-engine.
    */
  val HoltAlpha = 0.5
  val HoltBeta = 0.25

  /** q247 Holt linear-trend (double exponential) smoothing [Holt 1957;
    * Hyndman & Athanasopoulos, fpp3 §8.2] of the daily value series per
    * event_type — the trend-aware counterpart of q135's EWMA:
    *   level_t = α·x_t + (1−α)(level_{t−1} + trend_{t−1})
    *   trend_t = β(level_t − level_{t−1}) + (1−β)·trend_{t−1}
    * init level₁ = x₁, trend₁ = 0; one-step forecast = level + trend.
    *
    * The recurrence is a per-key SEQUENTIAL fold (coupled linear state —
    * no window/prefix-sum closed form like q243's Lindley reflection),
    * so it runs as a typed flatMapGroups over the daily series — which
    * is CALENDAR-bounded (≤366 rows/key/year) regardless of corpus
    * size, the same boundedness argument as q224's PAVA. The corpus
    * itself reduces in ONE map-side-combined (type, day) aggregation
    * through the Sum128 exact path. Oracle: a DuckDB recursive CTE
    * walking the identical IEEE op sequence (x is an exact 2-dp double
    * both sides; α, β exact binary) — rounded to 6 dp, hash-compared.
    */
  def holt(ev: DataFrame): DataFrame = {
    val spark = ev.sparkSession
    import spark.implicits._
    val daily = ev
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(graft.functions.Sum128.sumExact(col("value"), 4).as("x"))
    val out = daily
      .select(col("event_type").as[String], col("day").as[java.sql.Date],
        col("x").as[Double])
      .groupByKey(_._1)
      .flatMapGroups { (k, it) =>
        val rows = it.toArray.sortBy(_._2.getTime) // calendar-bounded
        var level = 0.0
        var trend = 0.0
        rows.iterator.zipWithIndex.map { case ((_, day, x), i) =>
          if (i == 0) { level = x; trend = 0.0 }
          else {
            val nl = HoltAlpha * x + (1 - HoltAlpha) * (level + trend)
            trend = HoltBeta * (nl - level) + (1 - HoltBeta) * trend
            level = nl
          }
          (k, day, x, level, trend, level + trend)
        }
      }
      .toDF("event_type", "day", "x", "level", "trend", "forecast_next")
    out.select(col("event_type"), col("day"), col("x"),
      round(col("level"), 6).as("level"),
      round(col("trend"), 6).as("trend"),
      round(col("forecast_next"), 6).as("forecast_next"))
  }

  /** Holt-Winters constants — exact binary fractions (see HoltAlpha)
    * and a weekly season, the natural period of the daily event series.
    */
  val HwAlpha = 0.5
  val HwBeta = 0.25
  val HwGamma = 0.25
  val HwPeriod = 7

  /** One additive Holt-Winters step: given the day's value `x`, the
    * carried (level, trend) and the season factor from one period ago
    * `sOld`, returns (newLevel, newTrend, newSeason). Shared verbatim
    * by the batch fold and [[graft.streaming.HoltWintersStream]] so
    * streamed == batch holds BITWISE (same IEEE op sequence).
    */
  def hwStep(x: Double, level: Double, trend: Double, sOld: Double)
      : (Double, Double, Double) = {
    val nl = HwAlpha * (x - sOld) + (1 - HwAlpha) * (level + trend)
    val nt = HwBeta * (nl - level) + (1 - HwBeta) * trend
    val ns = HwGamma * (x - nl) + (1 - HwGamma) * sOld
    (nl, nt, ns)
  }

  /** q248 additive Holt-Winters (triple exponential) smoothing
    * [Winters 1960; Hyndman & Athanasopoulos, fpp3 §8.3] of the daily
    * value series per event_type — the SEASONAL extension of q247:
    *   level_t = α(x_t − s_{t−m}) + (1−α)(level_{t−1} + trend_{t−1})
    *   trend_t = β(level_t − level_{t−1}) + (1−β)·trend_{t−1}
    *   s_t     = γ(x_t − level_t) + (1−γ)·s_{t−m}
    *   one-step forecast = level_t + trend_t + s_{t+1−m}
    * Warm-up over the first m = 7 days: level = their LEFT-ASSOCIATIVE
    * mean (explicit fold order, so both engines add in the same IEEE
    * sequence), trend = 0, s_i = x_i − mean; smoothed rows emit from
    * day m+1 on. A purely week-periodic series is reproduced exactly
    * (forecast_next == next x) — the TrendSpec invariant.
    *
    * Scale shape: identical to q247 — ONE map-side-combined (type, day)
    * corpus aggregation through the Sum128 exact path; the fold walks a
    * CALENDAR-bounded series per key inside flatMapGroups. Oracle: a
    * DuckDB recursive CTE carrying the 7-slot season ring as a LIST
    * column — same IEEE sequence, rounded to 6 dp, hash-compared.
    */
  def holtWinters(ev: DataFrame): DataFrame = {
    val spark = ev.sparkSession
    import spark.implicits._
    val m = HwPeriod
    val daily = ev
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(graft.functions.Sum128.sumExact(col("value"), 4).as("x"))
    val out = daily
      .select(col("event_type").as[String], col("day").as[java.sql.Date],
        col("x").as[Double])
      .groupByKey(_._1)
      .flatMapGroups { (k, it) =>
        val rows = it.toArray.sortBy(_._2.getTime) // calendar-bounded
        if (rows.length <= m) Iterator.empty
        else {
          var bar = 0.0
          rows.take(m).foreach(r => bar += r._3) // explicit left fold
          bar /= m
          val ring = scala.collection.mutable.Queue(
            rows.take(m).map(_._3 - bar).toSeq: _*)
          var level = bar
          var trend = 0.0
          rows.iterator.drop(m).map { case (_, day, x) =>
            val sOld = ring.dequeue()
            val (nl, nt, ns) = hwStep(x, level, trend, sOld)
            level = nl; trend = nt; ring.enqueue(ns)
            (k, day, x, level, trend, ns, level + trend + ring.head)
          }
        }
      }
      .toDF("event_type", "day", "x", "level", "trend", "season",
        "forecast_next")
    out.select(col("event_type"), col("day"), col("x"),
      round(col("level"), 6).as("level"),
      round(col("trend"), 6).as("trend"),
      round(col("season"), 6).as("season"),
      round(col("forecast_next"), 6).as("forecast_next"))
  }

  /** Daily decimal-exact sums per (event_type, day-of-month). */
  private def daily(events: DataFrame): DataFrame =
    events.groupBy(col("event_type"),
        dayofmonth(col("ts")).as("day"))
      .agg(sum(col("value").cast(dec)).as("x"))

  /** Mann-Kendall + Sen's slope. Returns
    * (event_type, n_days, s_stat, var_s, z, sen_slope).
    */
  def mannKendall(events: DataFrame): DataFrame = {
    val dly = daily(events)
    val a = dly.select(col("event_type"), col("day").as("d1"),
      col("x").as("x1"))
    val b = dly.select(col("event_type").as("et2"), col("day").as("d2"),
      col("x").as("x2"))
    // Bounded self-join: C(days, 2) pairs per type of DAILY rows.
    val pairs = a.join(b,
        col("event_type") === col("et2") && col("d2") > col("d1"))
      .select(col("event_type"), col("d1"), col("d2"),
        signum((col("x2") - col("x1")).cast("double")).cast("long")
          .as("sgn"),
        ((col("x2") - col("x1")).cast("double") /
          (col("d2") - col("d1"))).as("slope"))
    val s = pairs.groupBy(col("event_type"))
      .agg(sum(col("sgn")).as("s_stat"), count(lit(1)).as("np"))
    // Tie correction over the daily VALUES (decimal-exact grouping).
    val ties = dly.groupBy(col("event_type"), col("x"))
      .agg(count(lit(1)).as("t"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("ng"), sum(col("t")).as("n"),
        sum(col("t") * (col("t") - 1) * (lit(2) * col("t") + 5))
          .as("tie_term"))
    // Sen's slope: exact middle order statistic(s) of the pair slopes.
    val rn = pairs.withColumn("rk", row_number().over(
      org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type"))
        .orderBy(col("slope"), col("d1"), col("d2"))))
    val sen = rn.join(s.select(col("event_type").as("et3"), col("np")),
        col("event_type") === col("et3"))
      .filter(
        when(col("np") % 2 === 1, col("rk") * 2 === col("np") + 1)
          .otherwise(col("rk") * 2 === col("np") ||
            col("rk") * 2 === col("np") + 2))
      .groupBy(col("event_type"))
      .agg(round(avg(col("slope")), 6).as("sen_slope"))
    s.join(ties, "event_type").join(sen, "event_type")
      .select(col("event_type"), col("n").as("n_days"), col("s_stat"),
        round((col("n") * (col("n") - 1) * (lit(2) * col("n") + 5)
          - col("tie_term")).cast("double") / 18.0, 6).as("var_s"),
        round(
          when(col("n") * (col("n") - 1) * (lit(2) * col("n") + 5)
              - col("tie_term") > 0,
            (when(col("s_stat") > 0, (col("s_stat") - 1).cast("double"))
              .when(col("s_stat") < 0, (col("s_stat") + 1).cast("double"))
              .otherwise(0.0)) /
            sqrt((col("n") * (col("n") - 1) * (lit(2) * col("n") + 5)
              - col("tie_term")).cast("double") / 18.0))
            .otherwise(0.0), 6).as("z"),
        col("sen_slope"))
  }

  /** Weighted PAVA over (day, mean) per event_type. Returns
    * (event_type, day, n, iso_value) — iso_value non-decreasing in day
    * within each type. Rows-only (no SQL form); pinned by TrendSpec.
    */
  def isotonic(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val dly = events.groupBy(col("event_type"),
        dayofmonth(col("ts")).as("day"))
      .agg(sum(col("value").cast(dec)).as("num"),
        count(lit(1)).as("n"))
    dly.groupBy(col("event_type"))
      .agg(sort_array(collect_list(struct(col("day"),
        col("num").cast("double").as("num"), col("n")))).as("series"))
      .as[(String, Seq[(Int, Double, Long)])]
      .flatMap { case (et, series) =>
        pava(series).map { case (day, n, v) =>
          (et, day, n, BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
            .toDouble)
        }
      }
      .toDF("event_type", "day", "n", "iso_value")
  }

  /** Pool-adjacent-violators on a (day, numerator, weight) series
    * sorted by day: merge adjacent blocks while a block's weighted mean
    * exceeds its successor's; each day reports its block's mean.
    * Numerators stay exact sums until the one final division.
    */
  def pava(series: Seq[(Int, Double, Long)])
      : Seq[(Int, Long, Double)] = {
    // blocks: (numSum, wSum, days in block)
    val stack = scala.collection.mutable.ArrayBuffer
      .empty[(Double, Long, List[(Int, Long)])]
    series.foreach { case (day, num, w) =>
      stack += ((num, w, List((day, w))))
      // merge while the last block's mean < the previous block's mean
      while (stack.length >= 2 && {
        val (n2, w2, _) = stack(stack.length - 1)
        val (n1, w1, _) = stack(stack.length - 2)
        n1 * w2 > n2 * w1 // n1/w1 > n2/w2 without division
      }) {
        val (n2, w2, d2) = stack.remove(stack.length - 1)
        val (n1, w1, d1) = stack.remove(stack.length - 1)
        stack += ((n1 + n2, w1 + w2, d1 ++ d2))
      }
    }
    stack.toSeq.flatMap { case (num, w, days) =>
      val v = num / w
      days.map { case (day, dw) => (day, dw, v) }
    }.sortBy(_._1)
  }

  def oracle: Map[String, String] = Map(
    // q267: the q247 recursive Holt chain + lag windows + micros sums
    "q267_mase_backtest" ->
      """WITH RECURSIVE daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS x
        |  FROM events GROUP BY 1, 2),
        |seq AS (SELECT event_type, day, x,
        |    row_number() OVER (PARTITION BY event_type ORDER BY day)
        |      AS rn
        |  FROM daily),
        |holt AS (
        |  SELECT event_type, day, x, rn,
        |    x AS level, CAST(0 AS DOUBLE) AS trend
        |  FROM seq WHERE rn = 1
        |  UNION ALL
        |  SELECT s.event_type, s.day, s.x, s.rn,
        |    0.5 * s.x + 0.5 * (h.level + h.trend) AS level,
        |    0.25 * ((0.5 * s.x + 0.5 * (h.level + h.trend)) - h.level)
        |      + 0.75 * h.trend AS trend
        |  FROM holt h JOIN seq s
        |    ON s.event_type = h.event_type AND s.rn = h.rn + 1),
        |f AS (SELECT event_type, day, x,
        |    lag(round(level + trend, 6)) OVER
        |      (PARTITION BY event_type ORDER BY day) AS fc,
        |    lag(x) OVER (PARTITION BY event_type ORDER BY day) AS xp,
        |    lag(x, 7) OVER (PARTITION BY event_type ORDER BY day) AS x7
        |  FROM holt),
        |a AS (SELECT event_type,
        |    SUM(CASE WHEN fc IS NOT NULL THEN
        |      CAST(round(abs(x - fc) * 1000000, 0) AS BIGINT) END) AS eh,
        |    SUM(CASE WHEN xp IS NOT NULL THEN
        |      CAST(round(abs(x - xp) * 1000000, 0) AS BIGINT) END) AS en,
        |    COUNT(CASE WHEN fc IS NOT NULL THEN 1 END) AS n1,
        |    SUM(CASE WHEN x7 IS NOT NULL THEN
        |      CAST(round(abs(x - fc) * 1000000, 0) AS BIGINT) END)
        |      AS eh7,
        |    SUM(CASE WHEN x7 IS NOT NULL THEN
        |      CAST(round(abs(x - x7) * 1000000, 0) AS BIGINT) END) AS e7
        |  FROM f GROUP BY event_type)
        |SELECT event_type, CAST(n1 AS BIGINT) AS n_backtest,
        |  round(eh / n1 / 1000000.0, 6) AS mae_holt,
        |  round(en / n1 / 1000000.0, 6) AS mae_naive,
        |  CASE WHEN en > 0 THEN round(CAST(eh AS DOUBLE) / en, 6) END
        |    AS mase,
        |  CASE WHEN e7 > 0 THEN round(CAST(eh7 AS DOUBLE) / e7, 6) END
        |    AS mase_seasonal
        |FROM a""".stripMargin,
    "q265_changepoint" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS cnt,
        |    SUM(CAST(value AS DECIMAL(18, 4))) AS vs
        |  FROM events GROUP BY 1, 2),
        |pre AS (SELECT event_type, day,
        |    sum(cnt) OVER (PARTITION BY event_type ORDER BY day) AS cn,
        |    sum(vs) OVER (PARTITION BY event_type ORDER BY day) AS cs,
        |    sum(cnt) OVER (PARTITION BY event_type) AS n,
        |    sum(vs) OVER (PARTITION BY event_type) AS s
        |  FROM daily),
        |sc AS (SELECT event_type, day, cn, n,
        |    CAST(cs AS DOUBLE) AS csd, CAST(s AS DOUBLE) AS sd,
        |    CAST(cn AS DOUBLE) AS cnd, CAST(n AS DOUBLE) AS nd
        |  FROM pre WHERE cn < n),
        |g AS (SELECT event_type, day, cn, n,
        |    csd * csd / cnd + (sd - csd) * (sd - csd) / (nd - cnd)
        |      - sd * sd / nd AS gain,
        |    csd / cnd AS mb, (sd - csd) / (nd - cnd) AS ma FROM sc),
        |r AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |    ORDER BY gain DESC, day) AS rn FROM g)
        |SELECT event_type, CAST(day AS VARCHAR) AS split_day,
        |  CAST(cn AS BIGINT) AS n_before,
        |  CAST(n - cn AS BIGINT) AS n_after,
        |  round(mb, 6) AS mean_before, round(ma, 6) AS mean_after,
        |  round(gain, 6) AS gain
        |FROM r WHERE rn = 1""".stripMargin,
    "q247_holt" ->
      """WITH RECURSIVE daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS x
        |  FROM events GROUP BY 1, 2),
        |seq AS (SELECT event_type, day, x,
        |    row_number() OVER (PARTITION BY event_type ORDER BY day)
        |      AS rn
        |  FROM daily),
        |holt AS (
        |  SELECT event_type, day, x, rn,
        |    x AS level, CAST(0 AS DOUBLE) AS trend
        |  FROM seq WHERE rn = 1
        |  UNION ALL
        |  SELECT s.event_type, s.day, s.x, s.rn,
        |    0.5 * s.x + 0.5 * (h.level + h.trend) AS level,
        |    0.25 * ((0.5 * s.x + 0.5 * (h.level + h.trend)) - h.level)
        |      + 0.75 * h.trend AS trend
        |  FROM holt h JOIN seq s
        |    ON s.event_type = h.event_type AND s.rn = h.rn + 1)
        |SELECT event_type, day, x, round(level, 6) AS level,
        |  round(trend, 6) AS trend,
        |  round(level + trend, 6) AS forecast_next
        |FROM holt""".stripMargin,
    "q248_holt_winters" ->
      """WITH RECURSIVE daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS x
        |  FROM events GROUP BY 1, 2),
        |seq AS (SELECT event_type, day, x,
        |    row_number() OVER (PARTITION BY event_type ORDER BY day)
        |      AS rn
        |  FROM daily),
        |init AS (
        |  SELECT event_type, list(x ORDER BY rn) AS xs
        |  FROM seq WHERE rn <= 7 GROUP BY event_type
        |  HAVING COUNT(*) = 7),
        |base AS (
        |  SELECT event_type, 7 AS rn,
        |    CAST(NULL AS DATE) AS day, CAST(NULL AS DOUBLE) AS x,
        |    bar AS level, CAST(0 AS DOUBLE) AS trend,
        |    CAST(NULL AS DOUBLE) AS season,
        |    [xs[1]-bar, xs[2]-bar, xs[3]-bar, xs[4]-bar,
        |     xs[5]-bar, xs[6]-bar, xs[7]-bar] AS seas
        |  FROM (SELECT event_type, xs,
        |          ((((((xs[1]+xs[2])+xs[3])+xs[4])+xs[5])+xs[6])+xs[7])/7
        |            AS bar
        |        FROM init)),
        |hw AS (
        |  SELECT * FROM base
        |  UNION ALL
        |  SELECT s.event_type, s.rn, s.day, s.x,
        |    0.5*(s.x - h.seas[1]) + 0.5*(h.level + h.trend) AS level,
        |    0.25*((0.5*(s.x - h.seas[1]) + 0.5*(h.level + h.trend))
        |      - h.level) + 0.75*h.trend AS trend,
        |    0.25*(s.x - (0.5*(s.x - h.seas[1])
        |      + 0.5*(h.level + h.trend))) + 0.75*h.seas[1] AS season,
        |    list_append(h.seas[2:7],
        |      0.25*(s.x - (0.5*(s.x - h.seas[1])
        |        + 0.5*(h.level + h.trend))) + 0.75*h.seas[1]) AS seas
        |  FROM hw h JOIN seq s
        |    ON s.event_type = h.event_type AND s.rn = h.rn + 1)
        |SELECT event_type, day, x, round(level, 6) AS level,
        |  round(trend, 6) AS trend, round(season, 6) AS season,
        |  round(level + trend + seas[1], 6) AS forecast_next
        |FROM hw WHERE rn > 7""".stripMargin,
    "q222_mann_kendall" ->
      """WITH dly AS (
        |  SELECT event_type, EXTRACT(day FROM ts) AS day,
        |    SUM(CAST(value AS DECIMAL(18, 2))) AS x
        |  FROM events GROUP BY 1, 2),
        |pairs AS (
        |  SELECT a.event_type, a.day AS d1, b.day AS d2,
        |    CAST(sign(CAST(b.x - a.x AS DOUBLE)) AS BIGINT) AS sgn,
        |    CAST(b.x - a.x AS DOUBLE) / (b.day - a.day) AS slope
        |  FROM dly a JOIN dly b
        |    ON a.event_type = b.event_type AND b.day > a.day),
        |s AS (
        |  SELECT event_type, SUM(sgn) AS s_stat, COUNT(*) AS np
        |  FROM pairs GROUP BY 1),
        |ties AS (
        |  SELECT event_type, COUNT(*) AS ng, SUM(t) AS n,
        |    SUM(t * (t - 1) * (2 * t + 5)) AS tie_term
        |  FROM (SELECT event_type, x, COUNT(*) AS t
        |        FROM dly GROUP BY 1, 2)
        |  GROUP BY 1),
        |rn AS (
        |  SELECT p.event_type, p.slope, s.np,
        |    row_number() OVER (PARTITION BY p.event_type
        |      ORDER BY p.slope, p.d1, p.d2) AS rk
        |  FROM pairs p JOIN s ON p.event_type = s.event_type),
        |sen AS (
        |  SELECT event_type, round(AVG(slope), 6) AS sen_slope
        |  FROM rn
        |  WHERE CASE WHEN np % 2 = 1 THEN rk * 2 = np + 1
        |        ELSE rk * 2 = np OR rk * 2 = np + 2 END
        |  GROUP BY 1)
        |SELECT s.event_type, CAST(t.n AS BIGINT) AS n_days,
        |  CAST(s.s_stat AS BIGINT) AS s_stat,
        |  round(CAST(t.n * (t.n - 1) * (2 * t.n + 5) - t.tie_term
        |    AS DOUBLE) / 18.0, 6) AS var_s,
        |  round(
        |    CASE WHEN t.n * (t.n - 1) * (2 * t.n + 5) - t.tie_term > 0
        |    THEN
        |      (CASE WHEN s.s_stat > 0 THEN CAST(s.s_stat - 1 AS DOUBLE)
        |            WHEN s.s_stat < 0 THEN CAST(s.s_stat + 1 AS DOUBLE)
        |            ELSE 0.0 END) /
        |      sqrt(CAST(t.n * (t.n - 1) * (2 * t.n + 5) - t.tie_term
        |        AS DOUBLE) / 18.0)
        |    ELSE 0.0 END, 6) AS z,
        |  sen.sen_slope
        |FROM s
        |JOIN ties t ON s.event_type = t.event_type
        |JOIN sen ON s.event_type = sen.event_type""".stripMargin)
}
