package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.TrendOps

class TrendSpec extends SparkSpec {
  import spark.implicits._

  private def eventsOf(rows: Seq[(String, Int, Double)]): DataFrame =
    rows.map { case (et, day, v) =>
      (1L, Timestamp.valueOf(f"2024-01-$day%02d 12:00:00"), 7L, et, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("q265 changepoint: planted shift localized; flat ties to day 1") {
    import graft.queries.TrendOps
    val ev = eventsOf((1 to 10).map(d => ("shift", d, 10.0)) ++
      (11 to 20).map(d => ("shift", d, 20.0)) ++
      (1 to 20).map(d => ("flat", d, 5.0)))
    val got = TrendOps.changepoint(ev).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))))
      .toMap
    // split AFTER day 10: between-SS = 100^2/10 + 200^2/10 - 300^2/20
    assert(got("shift") === (("2024-01-10", 10L, 10L, 10.0, 20.0, 500.0)))
    // flat series: every split's gain is exactly 0 -> earliest day wins
    assert(got("flat")._1 === "2024-01-01" && got("flat")._6 === 0.0)
  }

  test("q267 MASE: matches a local recompute of the same definition") {
    import graft.queries.TrendOps
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val xs = Seq(10.0, 12.0, 11.0, 15.0, 14.0, 18.0, 17.0, 21.0, 20.0, 24.0)
    val ev = eventsOf(xs.zipWithIndex.map { case (v, i) => ("m", i + 1, v) })
    val r = TrendOps.maseBacktest(ev).collect().head
    // local reference: the identical recurrence, rounding, and micros
    var level = xs.head; var trend = 0.0
    val fcs = xs.indices.map { i =>
      if (i > 0) {
        val nl = 0.5 * xs(i) + 0.5 * (level + trend)
        trend = 0.25 * (nl - level) + 0.75 * trend
        level = nl
      }
      r6(level + trend)
    }
    def m(x: Double) = math.round(math.abs(x) * 1e6)
    val eh = (1 until xs.size).map(i => m(xs(i) - fcs(i - 1))).sum
    val en = (1 until xs.size).map(i => m(xs(i) - xs(i - 1))).sum
    val eh7 = (7 until xs.size).map(i => m(xs(i) - fcs(i - 1))).sum
    val e7 = (7 until xs.size).map(i => m(xs(i) - xs(i - 7))).sum
    val n1 = xs.size - 1
    assert(r.getLong(1) === n1.toLong)
    assert(r.getDouble(2) === r6(eh.toDouble / n1 / 1e6))
    assert(r.getDouble(3) === r6(en.toDouble / n1 / 1e6))
    assert(r.getDouble(4) === r6(eh.toDouble / en))
    assert(r.getDouble(5) === r6(eh7.toDouble / e7))
    // the zig-zag trend series: Holt's trend tracking beats naive-1
    assert(r.getDouble(4) < 1.0)
  }

  // ---- Mann-Kendall -------------------------------------------------

  test("strictly increasing series: S = C(n,2), positive z, exact Sen slope") {
    // daily sums 1, 2, 3, 4, 5 over days 1..5 -> every pair concordant
    val df = eventsOf((1 to 5).map(d => ("up", d, d.toDouble)))
    val r = TrendOps.mannKendall(df).collect().head
    assert(r.getAs[Long]("n_days") === 5L)
    assert(r.getAs[Long]("s_stat") === 10L) // C(5,2)
    // no ties: var = n(n-1)(2n+5)/18 = 5*4*15/18 (column rounded to 6dp)
    assert(math.abs(r.getAs[Double]("var_s") - 5.0 * 4 * 15 / 18) < 1e-6)
    assert(r.getAs[Double]("z") > 0)
    // all pairwise slopes are exactly 1
    assert(r.getAs[Double]("sen_slope") === 1.0)
  }

  test("strictly decreasing series mirrors the increasing one") {
    val up = TrendOps.mannKendall(
      eventsOf((1 to 5).map(d => ("u", d, d.toDouble)))).collect().head
    val dn = TrendOps.mannKendall(
      eventsOf((1 to 5).map(d => ("d", d, (6 - d).toDouble)))).collect().head
    assert(dn.getAs[Long]("s_stat") === -up.getAs[Long]("s_stat"))
    assert(dn.getAs[Double]("z") === -up.getAs[Double]("z"))
    assert(dn.getAs[Double]("sen_slope") ===
      -up.getAs[Double]("sen_slope"))
  }

  test("constant series: S = 0, z = 0, tie correction zeroes the variance") {
    val r = TrendOps.mannKendall(
      eventsOf((1 to 4).map(d => ("c", d, 2.5)))).collect().head
    assert(r.getAs[Long]("s_stat") === 0L)
    assert(r.getAs[Double]("z") === 0.0)
    // one tie group of size 4: var = [4*3*13 - 4*3*13]/18 = 0
    assert(r.getAs[Double]("var_s") === 0.0)
  }

  test("even pair count averages the two middle slopes") {
    // values 1,5,2,8 on days 1..4 -> 6 pairwise slopes:
    // 4, 0.5, 7/3, -3, 1.5, 6 -> sorted: -3, 0.5, 1.5, 7/3, 4, 6
    // -> median = (1.5 + 7/3)/2
    val r = TrendOps.mannKendall(
      eventsOf(Seq(("m", 1, 1.0), ("m", 2, 5.0), ("m", 3, 2.0),
        ("m", 4, 8.0)))).collect().head
    val expected = BigDecimal((1.5 + 7.0 / 3) / 2)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("sen_slope") === expected)
  }

  // ---- isotonic (PAVA) ----------------------------------------------

  test("pava pools a single violator into the weighted mean") {
    // unit weights: 1, 3, 2, 4 -> pool (3,2) -> 1, 2.5, 2.5, 4
    val got = TrendOps.pava(Seq((1, 1.0, 1L), (2, 3.0, 1L),
      (3, 2.0, 1L), (4, 4.0, 1L)))
    assert(got === Seq((1, 1L, 1.0), (2, 1L, 2.5), (3, 1L, 2.5),
      (4, 1L, 4.0)))
  }

  test("pava respects weights when pooling") {
    // (v=3, w=3) then (v=1, w=1): pooled mean = (9+1)/4 = 2.5
    val got = TrendOps.pava(Seq((1, 9.0, 3L), (2, 1.0, 1L)))
    assert(got === Seq((1, 3L, 2.5), (2, 1L, 2.5)))
  }

  test("pava cascades pools backwards") {
    // 4, 3, 2 (unit weights) -> single block of mean 3
    val got = TrendOps.pava(Seq((1, 4.0, 1L), (2, 3.0, 1L), (3, 2.0, 1L)))
    assert(got.map(_._3) === Seq(3.0, 3.0, 3.0))
  }

  test("pava is the identity on already-monotone input") {
    val in = Seq((1, 1.0, 2L), (2, 4.0, 2L), (3, 9.0, 3L))
    assert(TrendOps.pava(in) ===
      in.map { case (d, n, w) => (d, w, n / w) })
  }

  test("isotonic output is non-decreasing per type and mean-preserving") {
    val df = Tables(spark, sf, "events")
    val out = TrendOps.isotonic(df).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.nonEmpty)
    out.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._4 <= b._4 + 1e-9)
        case _ =>
      }
    }
    // weighted mean of the fit == weighted mean of the daily means
    val fitMean = out.map(r => r._4 * r._3).sum / out.map(_._3).sum
    val rawMean = df.agg(sum("value"), count(lit(1))).collect().head match {
      case r => r.getDouble(0) / r.getLong(1)
    }
    assert(math.abs(fitMean - rawMean) < 1e-4)
  }

  test("Holt smoothing: hand-computed fold, constant-series identity") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def day(i: Int) = java.sql.Date.valueOf(f"2024-01-$i%02d")
    // crafted rising series x = 10, 20, 30 (one event per day, value
    // carries the whole daily sum)
    val ev = Seq((1, 10.0), (2, 20.0), (3, 30.0))
      .map { case (i, v) => ("a", java.sql.Timestamp.valueOf(
        f"2024-01-$i%02d 12:00:00"), v) }
      .toDF("event_type", "ts", "value")
    val got = graft.queries.TrendOps.holt(ev)
      .orderBy("day").collect()
      .map(r => (r.getDouble(3), r.getDouble(4), r.getDouble(5)))
    // fold by hand: l1=10 b1=0; l2=.5*20+.5*10=15, b2=.25*5=1.25;
    // l3=.5*30+.5*16.25=23.125, b3=.25*8.125+.75*1.25=2.96875
    assert(got.toSeq == Seq(
      (10.0, 0.0, 10.0),
      (15.0, 1.25, 16.25),
      (23.125, 2.96875, 26.09375)), got.mkString(","))
    // constant series: level tracks x exactly, trend stays 0
    val const = (1 to 5).map(i => ("b", java.sql.Timestamp.valueOf(
        f"2024-01-$i%02d 12:00:00"), 7.0))
      .toDF("event_type", "ts", "value")
    val g2 = graft.queries.TrendOps.holt(const).collect()
    assert(g2.forall(r => r.getDouble(3) == 7.0 && r.getDouble(4) == 0.0))
  }

  test("Holt-Winters: hand fold after warm-up; short series emits nothing") {
    import spark.implicits._
    def mk(et: String, xs: Seq[Double]) = xs.zipWithIndex.map {
      case (v, i) => (et, java.sql.Timestamp.valueOf(
        f"2024-01-${i + 1}%02d 12:00:00"), v)
    }
    // 9 days: warm-up over days 1-7 (bar = 28/7 = 4), then two steps
    val xs = Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 9.0, 4.0)
    val ev = mk("a", xs).toDF("event_type", "ts", "value")
    val got = graft.queries.TrendOps.holtWinters(ev)
      .orderBy("day").collect()
      .map(r => (r.getDouble(3), r.getDouble(4), r.getDouble(5),
        r.getDouble(6)))
    // bar = 4, seas = [-3,-2,-1,0,1,2,3]; day 8: sOld = -3
    // l = .5*(9+3)+.5*4 = 8; t = .25*4 = 1; s = .25*(9-8)+.75*(-3) = -2
    // fc = 8+1+(-2 ring head = s for day 2 = -2) = 7
    // day 9: sOld = -2; l = .5*(4+2)+.5*9 = 7.5;
    // t = .25*(-.5)+.75*1 = .625; s = .25*(4-7.5)+.75*(-2) = -2.375;
    // fc = 7.5+.625+(-1) = 7.125
    assert(got.toSeq == Seq(
      (8.0, 1.0, -2.0, 7.0),
      (7.5, 0.625, -2.375, 7.125)), got.mkString(","))
    // ≤ 7 days: warm-up never completes, nothing emits
    val short = mk("s", Seq(1.0, 2.0, 3.0)).toDF("event_type", "ts", "value")
    assert(graft.queries.TrendOps.holtWinters(short).count() === 0L)
  }

  test("Holt-Winters reproduces a week-periodic series exactly") {
    import spark.implicits._
    val week = Seq(10.0, 20.0, 15.0, 30.0, 25.0, 5.0, 35.0)
    val xs = week ++ week ++ week
    val ev = xs.zipWithIndex.map { case (v, i) =>
      ("p", java.sql.Timestamp.valueOf(f"2024-01-${i + 1}%02d 12:00:00"), v)
    }.toDF("event_type", "ts", "value")
    val bar = week.sum / 7
    val got = graft.queries.TrendOps.holtWinters(ev)
      .orderBy("day").collect()
    got.zipWithIndex.foreach { case (r, j) =>
      val i = j + 7 // first emitted day index
      assert(r.getDouble(3) == bar, s"level drifted at $i")
      assert(r.getDouble(4) == 0.0, s"trend nonzero at $i")
      if (i + 1 < xs.length)
        assert(r.getDouble(6) == xs(i + 1),
          s"forecast at day $i: ${r.getDouble(6)} != ${xs(i + 1)}")
    }
  }
}
