package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.queries.TrendOps

/** Streaming Holt-Winters: bitwise equality with the q248 batch fold
  * across a 2-batch split (including a split INSIDE the warm-up
  * window), in-batch disorder, and the driver entry's full-series
  * equality gate.
  */
class HoltWintersStreamSpec extends SparkSpec {

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

  /** Independent re-statement of the batch fold (not a call into the
    * production code): warm-up mean + the three coupled recurrences.
    */
  private def reference(xs: Seq[Double])
      : Seq[(Int, Double, Double, Double, Double)] = {
    val m = TrendOps.HwPeriod
    var bar = 0.0
    xs.take(m).foreach(bar += _)
    bar /= m
    var level = bar; var trend = 0.0
    var seas = xs.take(m).map(_ - bar).toVector
    xs.zipWithIndex.drop(m).map { case (x, i) =>
      val sOld = seas.head
      val nl = 0.5 * (x - sOld) + 0.5 * (level + trend)
      val nt = 0.25 * (nl - level) + 0.75 * trend
      val ns = 0.25 * (x - nl) + 0.75 * sOld
      level = nl; trend = nt; seas = seas.tail :+ ns
      (i, level, trend, ns, level + trend + seas.head)
    }
  }

  private def runStream(batches: Seq[Seq[(String, Int, Double)]],
      name: String): Array[(String, Int, Double, Double, Double, Double,
      Double)] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    implicit val enc: org.apache.spark.sql.Encoder[(String, Int, Double)] =
      Encoders.product[(String, Int, Double)]
    withRocks {
      val stream = MemoryStream[(String, Int, Double)]
      val out = streaming.HoltWintersStream.smoothed(stream.toDS())
        .toDF("k", "ed", "x", "level", "trend", "season", "fc")
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      batches.foreach { b => stream.addData(b); q.processAllAvailable() }
      q.stop()
    }
    spark.table(name).collect().map(r => (r.getString(0), r.getInt(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
      r.getDouble(6)))
  }

  test("2-batch streamed fold == independent recurrence bitwise") {
    val xs = Seq(10.0, 23.7, 5.02, 41.11, 19.9, 33.33, 7.77,
      12.5, 25.25, 4.04, 44.75, 18.18, 31.5, 9.9, 11.11)
    val expected = reference(xs)
    // split at day 10 (after warm-up); batch 1 delivered out of order
    val got = runStream(Seq(
      Seq(2, 0, 3, 1, 7, 5, 9, 4, 8, 6).map(i => ("a", i, xs(i))),
      (10 until xs.length).map(i => ("a", i, xs(i)))), "hw_spec")
      .sortBy(_._2)
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (g, e) =>
      assert(g._2 == e._1 && g._4 == e._2 && g._5 == e._3
        && g._6 == e._4 && g._7 == e._5, s"day ${g._2}: $g vs $e")
    }
  }

  test("batch split INSIDE the warm-up window still seeds identically") {
    val xs = Seq(3.25, 7.5, 1.125, 9.75, 2.5, 6.25, 4.0, 5.5, 8.125, 2.75)
    val expected = reference(xs)
    val got = runStream(Seq(
      (0 until 4).map(i => ("a", i, xs(i))),   // mid-warm-up boundary
      (4 until xs.length).map(i => ("a", i, xs(i)))), "hw_spec_warm")
      .sortBy(_._2)
    assert(got.length == expected.length)
    got.zip(expected).foreach { case (g, e) =>
      assert(g._4 == e._2 && g._5 == e._3 && g._7 == e._5,
        s"day ${g._2}: $g vs $e")
    }
  }

  test("week-periodic series is reproduced exactly (perfect forecast)") {
    // x_t = x_{t-7} for all t: seasonals capture the pattern, level
    // stays at the warm-up mean, trend stays 0, and every one-step
    // forecast equals the next observation EXACTLY
    val week = Seq(10.0, 20.0, 15.0, 30.0, 25.0, 5.0, 35.0)
    val xs = week ++ week ++ week
    val got = runStream(Seq(
      xs.zipWithIndex.map { case (x, i) => ("p", i, x) }), "hw_spec_per")
      .sortBy(_._2)
    val bar = week.sum / 7
    got.foreach { case (_, i, x, level, trend, season, fc) =>
      assert(level == bar, s"day $i level $level != $bar")
      assert(trend == 0.0)
      assert(season == x - bar)
      if (i + 1 < xs.length)
        assert(fc == xs(i + 1), s"day $i forecast $fc != ${xs(i + 1)}")
    }
  }

  test("driver entry: streamed == q248 on the full series (gated inside)") {
    val rows = SparkEntry.queries("stream_holt_winters")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    assert(rows.map(r => (r.getString(0), r.getString(1))).distinct
      .length == rows.length)
  }
}
