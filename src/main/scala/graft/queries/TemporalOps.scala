package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Time-to-event and time-series repair operators (SURVEY.md §2.11
  * [EXT]) — the lifecycle-analytics layer over the same decimal-exact
  * moment discipline as q61/q126/q136:
  *
  *  - q155 Kaplan-Meier survival estimator over customer inter-order
  *    gaps: each consecutive-order gap is an observed event, the tail
  *    from a customer's last order to the dataset horizon is censored.
  *    Per-customer gaps are one window shuffle (the q83 SCD2 shape);
  *    the KM risk-set/product windows then run over DISTINCT DURATIONS
  *    — rows bounded by the calendar span in days, metadata-scale like
  *    q110's share-of-total, regardless of corpus size. The survival
  *    product is exp∘Σln with an explicit zero-risk guard (Spark's
  *    log(0) is NULL while DuckDB errors — both sides route through
  *    CASE so the curve hits exact 0 when the largest duration is an
  *    event).
  *  - q156 linear-interpolation gap fill: the sparse daily series
  *    (days whose filtered sum exists) is left-joined onto the dense
  *    type×calendar grid (bounded rows), then each hole takes
  *    prev + (next−prev)·Δt/Δspan from IGNORE-NULLS window probes —
  *    the time-series repair a feature pipeline runs before modeling.
  *    Unlike q99's gap fill (densify with nulls), this one emits the
  *    interpolated VALUE; boundary holes (no prev or no next) stay
  *    null and are flagged.
  *  - q159 CUSUM change-point detection: per event_type, the cumulative
  *    sum of daily residuals S_t = Σ(x_i − x̄) peaks at the most likely
  *    mean-shift point (Page's statistic, Pettitt-style argmax).
  *    Series moments are decimal window sums (order-independent), the
  *    ordered cumsum is deterministic under the day ordering, and the
  *    argmax row is picked by (|S| desc, day) — ties resolve to the
  *    earliest day identically in both engines. One corpus shuffle
  *    (the daily aggregation); everything after runs on bounded
  *    type×day rows.
  */
object TemporalOps {

  private val dec = DecimalType(18, 4)

  /** Sparsity threshold for q156's raw series — days whose per-type sum
    * of values over this threshold exists form the known points.
    */
  private val InterpMinValue = 190

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q155_survival" -> ((s, d) => {
      val o = Tables(s, d, "orders")
        .select(col("o_custkey"), date_trunc("day", col("o_orderdate")).as("od"))
        .distinct()
      val mx = o.agg(max(col("od")).as("m"))
      val gaps = o
        .withColumn("pod",
          lag(col("od"), 1).over(
            Window.partitionBy(col("o_custkey")).orderBy(col("od"))))
        .filter(col("pod").isNotNull)
        .select(datediff(col("od"), col("pod")).as("dur"), lit(1L).as("ev"))
      val cens = o.groupBy(col("o_custkey")).agg(max(col("od")).as("lod"))
        .crossJoin(broadcast(mx))
        .select(datediff(col("m"), col("lod")).as("dur"), lit(0L).as("ev"))
      val byDur = gaps.unionByName(cens)
        .groupBy(col("dur"))
        .agg(sum(col("ev")).as("d"), count(lit(1)).as("tot"))
      // risk-set / product windows over distinct durations only —
      // bounded by the calendar span, not the order count
      val wDesc = Window.orderBy(col("dur").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAsc = Window.orderBy(col("dur"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      byDur
        .withColumn("n_risk", sum(col("tot")).over(wDesc))
        .withColumn("lnsum",
          sum(when(col("n_risk") === col("d"), lit(0.0))
            .otherwise(log((col("n_risk") - col("d")).cast("double")
              / col("n_risk")))).over(wAsc))
        .withColumn("mins", min(col("n_risk") - col("d")).over(wAsc))
        .filter(col("d") > 0)
        .select(col("dur").as("dur_days"), col("n_risk"),
          col("d").as("n_events"),
          round(when(col("mins") === 0, lit(0.0)).otherwise(exp(col("lnsum"))),
            6).as("survival"))
    }),

    "q156_interpolate" -> ((s, d) => {
      val ev = Tables(s, d, "events")
      val daily = ev.filter(col("value") > InterpMinValue)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .agg(round(sum(col("value").cast(dec)).cast("double"), 4).as("x"))
      val span = ev.agg(min(date_trunc("day", col("ts"))).as("lo"),
        max(date_trunc("day", col("ts"))).as("hi"))
      val cal = ev.select(col("event_type")).distinct()
        .crossJoin(broadcast(span))
        .select(col("event_type"),
          explode(sequence(col("lo"), col("hi"), expr("interval 1 day")))
            .as("day"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
      val wNext = w.rowsBetween(1, Window.unboundedFollowing)
      cal.join(broadcast(daily), Seq("event_type", "day"), "left")
        .withColumn("px", last(col("x"), ignoreNulls = true).over(wPrev))
        .withColumn("pd", last(when(col("x").isNotNull, col("day")),
          ignoreNulls = true).over(wPrev))
        .withColumn("nx", first(col("x"), ignoreNulls = true).over(wNext))
        .withColumn("nd", first(when(col("x").isNotNull, col("day")),
          ignoreNulls = true).over(wNext))
        .select(col("event_type"), col("day"),
          when(col("x").isNotNull, col("x"))
            .when(col("px").isNotNull && col("nx").isNotNull,
              round(col("px") + (col("nx") - col("px"))
                * datediff(col("day"), col("pd"))
                / datediff(col("nd"), col("pd")), 6))
            .as("y"),
          (col("x").isNull && col("px").isNotNull && col("nx").isNotNull)
            .as("filled"))
    }),

    // q179 seasonal decomposition (STL-lite): daily series = trend
    // (centered 7-day moving average, complete windows only) + weekday
    // seasonal (mean detrended value per weekday class) + residual.
    // Every mean that crosses rows reduces DECIMALLY (the sliding sum
    // is an ordered frame, the seasonal sum an unordered decimal sum —
    // both order-independent), so the decomposition hash-compares.
    // Weekday classing stays internal: Spark numbers Sunday=1, DuckDB
    // Sunday=0, but group MEMBERSHIP is identical. One corpus shuffle
    // (the daily aggregation); all windows run on type×day rows.
    "q179_seasonal_decompose" -> ((s, d) => {
      val daily = Tables(s, d, "events")
        .groupBy(col("event_type"),
          to_date(date_trunc("day", col("ts"))).as("day"))
        .agg(sum(col("value").cast(dec)).as("xd"))
        .withColumn("x", col("xd").cast("double"))
      val w7 = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(-3, 3)
      val tr = daily
        .withColumn("trend",
          when(count(lit(1)).over(w7) === 7,
            round(sum(col("xd")).over(w7).cast("double") / 7, 6)))
      val wSe = Window.partitionBy(col("event_type"), dayofweek(col("day")))
      tr.withColumn("seasonal",
          round(sum((col("x") - col("trend")).cast(DecimalType(18, 6)))
            .over(wSe).cast("double") / count(col("trend")).over(wSe), 6))
        .select(col("event_type"), col("day"), col("x"), col("trend"),
          col("seasonal"),
          round(col("x") - col("trend") - col("seasonal"), 6).as("residual"))
    }),

    "q159_cusum" -> ((s, d) => {
      val daily = Tables(s, d, "events")
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .agg(sum(col("value").cast(dec)).as("xd"))
      val wp = Window.partitionBy(col("event_type"))
      val wCum = wp.orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val m = daily.select(col("event_type"), col("day"),
        col("xd").cast("double").as("x"),
        sum(col("xd")).over(wp).cast("double").as("sx"),
        sum(col("xd") * col("xd")).over(wp).cast("double").as("sxx"),
        count(lit(1)).over(wp).as("n"))
      val c = m
        .withColumn("s", sum(col("x") - col("sx") / col("n")).over(wCum))
        .withColumn("std",
          sqrt((col("sxx") - col("sx") * col("sx") / col("n"))
            / (col("n") - 1)))
      c.withColumn("rn", row_number().over(
          wp.orderBy(abs(col("s")).desc, col("day"))))
        .filter(col("rn") === 1)
        .select(col("event_type"), col("day").as("change_day"),
          round(abs(col("s")) / (col("std") * sqrt(col("n"))), 6)
            .as("cusum_stat"))
    }),

    // q243 clamp-at-zero running inventory balance per supplier —
    // returns ('R') restock, everything else issues, and stock can
    // never go negative: B_i = max(0, B_{i-1} + δ_i). The recurrence
    // looks like a per-row fold no window can express, but Lindley's
    // equation (the M/G/1 waiting-time identity) gives the closed form
    // B_n = S_n − min(0, min_{k≤n} S_k) over the UNCLAMPED prefix sums
    // — so the whole operator is one shuffle on the supplier key plus
    // three frames over the same window order (sum, running min,
    // preceding min), no recursion, no mapGroups, no driver loop. A
    // row clamps (stockout with lost demand) iff its prefix sum dips
    // below every earlier one AND below zero: S_i < min(0, pmin_{i-1});
    // the total lost quantity falls out of the same reflection as
    // B_n − S_n. All deltas are integral TPC-H quantities routed
    // through DECIMAL(18,4), so every sum is exact and the final
    // doubles hash-match cross-engine.
    "q243_clamped_balance" -> ((s, d) => {
      val z = lit(0).cast(dec)
      val li = Tables(s, d, "lineitem")
        .select(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"),
          col("l_linenumber"),
          when(col("l_returnflag") === "R", col("l_quantity"))
            .otherwise(-col("l_quantity")).cast(dec).as("delta"))
      // delta is the FOURTH sort key: the synthetic data holds rows
      // sharing (shipdate, orderkey, linenumber) under one supplier,
      // and a non-total order lets the two engines walk different
      // prefix-sum paths (observed: one ±1 stockout at sf0.1). Rows
      // tying on all four keys are interchangeable for every output.
      val ord = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"),
          col("l_linenumber"), col("delta"))
      val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val prev = ord.rowsBetween(Window.unboundedPreceding, -1)
      li.withColumn("rn", row_number().over(ord))
        .withColumn("srun", sum(col("delta")).over(run))
        .withColumn("rmin", min(col("srun")).over(run))
        .withColumn("pmin", min(col("srun")).over(prev))
        .withColumn("bal", col("srun") - least(z, col("rmin")))
        .withColumn("clamped",
          (col("srun") < least(z, coalesce(col("pmin"), z)))
            .cast("long"))
        .groupBy(col("l_suppkey"))
        .agg(expr("max_by(bal, rn)").cast("double").as("final_balance"),
          expr("max_by(bal - srun, rn)").cast("double").as("lost_qty"),
          sum(col("clamped")).as("n_stockouts"),
          count(lit(1)).as("n_moves"))
    })
  )

  def oracle: Map[String, String] = Map(
    "q155_survival" ->
      """WITH o AS (SELECT DISTINCT o_custkey,
        |    date_trunc('day', o_orderdate) AS od FROM orders),
        |mx AS (SELECT max(od) AS m FROM o),
        |gaps AS (SELECT date_diff('day',
        |    lag(od) OVER (PARTITION BY o_custkey ORDER BY od), od) AS dur,
        |    1 AS ev FROM o),
        |cens AS (SELECT date_diff('day', max(od), max(m)) AS dur, 0 AS ev
        |  FROM o, mx GROUP BY o_custkey),
        |du AS (SELECT dur, ev FROM gaps WHERE dur IS NOT NULL
        |  UNION ALL SELECT dur, ev FROM cens),
        |g AS (SELECT dur, SUM(ev) AS d, COUNT(*) AS tot FROM du GROUP BY dur),
        |o2 AS (SELECT dur, d, tot, SUM(tot) OVER (ORDER BY dur DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_risk
        |  FROM g),
        |s AS (SELECT dur, d, n_risk,
        |  SUM(ln(CASE WHEN n_risk = d THEN 1.0
        |    ELSE CAST(n_risk - d AS DOUBLE) / n_risk END))
        |    OVER (ORDER BY dur
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lnsum,
        |  MIN(n_risk - d) OVER (ORDER BY dur
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mins
        | FROM o2)
        |SELECT CAST(dur AS INTEGER) AS dur_days,
        |  CAST(n_risk AS BIGINT) AS n_risk,
        |  CAST(d AS BIGINT) AS n_events,
        |  round(CASE WHEN mins = 0 THEN 0.0 ELSE exp(lnsum) END, 6)
        |    AS survival
        |FROM s WHERE d > 0""".stripMargin,
    "q156_interpolate" ->
      s"""WITH daily AS (SELECT event_type, date_trunc('day', ts) AS day,
         |    round(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 4)
         |      AS x
         |  FROM events WHERE value > $InterpMinValue GROUP BY 1, 2),
         |span AS (SELECT min(date_trunc('day', ts)) AS lo,
         |    max(date_trunc('day', ts)) AS hi FROM events),
         |cal AS (SELECT t.event_type, u.day
         |  FROM (SELECT DISTINCT event_type FROM events) t
         |  CROSS JOIN (SELECT unnest(generate_series(lo, hi,
         |    INTERVAL 1 DAY)) AS day FROM span) u),
         |j AS (SELECT cal.event_type, cal.day, daily.x FROM cal
         |  LEFT JOIN daily ON cal.event_type = daily.event_type
         |    AND cal.day = daily.day),
         |w AS (SELECT event_type, day, x,
         |  last_value(x IGNORE NULLS) OVER (PARTITION BY event_type
         |    ORDER BY day
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS px,
         |  last_value(CASE WHEN x IS NOT NULL THEN day END IGNORE NULLS)
         |    OVER (PARTITION BY event_type ORDER BY day
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pd,
         |  first_value(x IGNORE NULLS) OVER (PARTITION BY event_type
         |    ORDER BY day
         |    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nx,
         |  first_value(CASE WHEN x IS NOT NULL THEN day END IGNORE NULLS)
         |    OVER (PARTITION BY event_type ORDER BY day
         |    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nd
         | FROM j)
         |SELECT event_type, day,
         |  CASE WHEN x IS NOT NULL THEN x
         |    WHEN px IS NOT NULL AND nx IS NOT NULL THEN
         |      round(px + (nx - px) * date_diff('day', pd, day)
         |        / date_diff('day', pd, nd), 6)
         |    ELSE NULL END AS y,
         |  (x IS NULL AND px IS NOT NULL AND nx IS NOT NULL) AS filled
         |FROM w""".stripMargin,
    "q179_seasonal_decompose" ->
      """WITH daily AS (SELECT event_type,
        |    CAST(date_trunc('day', ts) AS DATE) AS day,
        |    SUM(CAST(value AS DECIMAL(18,4))) AS xd
        |  FROM events GROUP BY 1, 2),
        |d2 AS (SELECT event_type, day, xd, CAST(xd AS DOUBLE) AS x
        |  FROM daily),
        |tr AS (SELECT event_type, day, x,
        |  CASE WHEN COUNT(*) OVER w7 = 7 THEN
        |    round(CAST(SUM(xd) OVER w7 AS DOUBLE) / 7, 6) END AS trend
        | FROM d2
        | WINDOW w7 AS (PARTITION BY event_type ORDER BY day
        |   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |se AS (SELECT event_type, day, x, trend,
        |  round(CAST(SUM(CAST(x - trend AS DECIMAL(18,6))) OVER wd
        |      AS DOUBLE) / COUNT(trend) OVER wd, 6) AS seasonal
        | FROM tr
        | WINDOW wd AS (PARTITION BY event_type, dayofweek(day)))
        |SELECT event_type, day, x, trend, seasonal,
        |  round(x - trend - seasonal, 6) AS residual
        |FROM se""".stripMargin,
    "q159_cusum" ->
      """WITH daily AS (SELECT event_type, date_trunc('day', ts) AS day,
        |    SUM(CAST(value AS DECIMAL(18,4))) AS xd
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT event_type, day, CAST(xd AS DOUBLE) AS x,
        |  CAST(SUM(xd) OVER (PARTITION BY event_type) AS DOUBLE) AS sx,
        |  CAST(SUM(xd * xd) OVER (PARTITION BY event_type) AS DOUBLE)
        |    AS sxx,
        |  COUNT(*) OVER (PARTITION BY event_type) AS n
        | FROM daily),
        |c AS (SELECT event_type, day, n,
        |  SUM(x - sx / n) OVER (PARTITION BY event_type ORDER BY day
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s,
        |  sqrt((sxx - sx * sx / n) / (n - 1)) AS std
        | FROM m),
        |r AS (SELECT event_type, day, abs(s) AS abss, std, n,
        |  row_number() OVER (PARTITION BY event_type
        |    ORDER BY abs(s) DESC, day) AS rn
        | FROM c)
        |SELECT event_type, day AS change_day,
        |  round(abss / (std * sqrt(n)), 6) AS cusum_stat
        |FROM r WHERE rn = 1""".stripMargin,
    // the same Lindley rewrite on both engines: clamped balance from
    // unclamped prefix sums, stockouts from new below-zero prefix mins
    "q243_clamped_balance" ->
      """WITH t AS (SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber,
        |    CAST(CASE WHEN l_returnflag = 'R' THEN l_quantity
        |         ELSE -l_quantity END AS DECIMAL(18,4)) AS delta
        |  FROM lineitem),
        |w0 AS (SELECT l_suppkey, delta,
        |    ROW_NUMBER() OVER o AS rn,
        |    SUM(delta) OVER (o ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS srun
        |  FROM t
        |  WINDOW o AS (PARTITION BY l_suppkey
        |      ORDER BY l_shipdate, l_orderkey, l_linenumber, delta)),
        |w AS (SELECT l_suppkey, delta, rn, srun,
        |    MIN(srun) OVER (o2 ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS rmin,
        |    MIN(srun) OVER (o2 ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND 1 PRECEDING) AS pmin
        |  FROM w0
        |  WINDOW o2 AS (PARTITION BY l_suppkey ORDER BY rn)),
        |b AS (SELECT *,
        |    srun - LEAST(CAST(0 AS DECIMAL(18,4)), rmin) AS bal,
        |    CASE WHEN srun < LEAST(CAST(0 AS DECIMAL(18,4)),
        |        COALESCE(pmin, CAST(0 AS DECIMAL(18,4))))
        |      THEN 1 ELSE 0 END AS clamped
        |  FROM w)
        |SELECT l_suppkey, CAST(arg_max(bal, rn) AS DOUBLE) AS final_balance,
        |  CAST(arg_max(bal - srun, rn) AS DOUBLE) AS lost_qty,
        |  CAST(SUM(clamped) AS BIGINT) AS n_stockouts,
        |  COUNT(*) AS n_moves
        |FROM b GROUP BY l_suppkey""".stripMargin
  )
}
