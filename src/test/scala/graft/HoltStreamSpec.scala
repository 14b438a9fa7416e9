package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.queries.TrendOps

/** Streaming Holt fold: bitwise equality with the q247 batch fold
  * across a 2-batch split, in-batch out-of-order delivery, and the
  * driver entry's full-series equality gate.
  */
class HoltStreamSpec extends SparkSpec {

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

  private def batchFold(xs: Seq[Double]): Seq[(Double, Double)] = {
    var level = 0.0; var trend = 0.0
    xs.zipWithIndex.map { case (x, i) =>
      if (i == 0) { level = x; trend = 0.0 }
      else {
        val nl = TrendOps.HoltAlpha * x +
          (1 - TrendOps.HoltAlpha) * (level + trend)
        trend = TrendOps.HoltBeta * (nl - level) +
          (1 - TrendOps.HoltBeta) * trend
        level = nl
      }
      (level, trend)
    }
  }

  test("2-batch streamed fold == batch fold bitwise; in-batch disorder ok") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    implicit val enc: org.apache.spark.sql.Encoder[(String, Int, Double)] =
      Encoders.product[(String, Int, Double)]
    val xs = Seq(10.0, 23.7, 5.02, 41.11, 19.9, 33.33, 7.77)
    val expected = batchFold(xs)
    withRocks {
      val stream = MemoryStream[(String, Int, Double)]
      val out = streaming.HoltStream.smoothed(stream.toDS())
        .toDF("k", "ed", "x", "level", "trend", "fc")
      val q = out.writeStream.format("memory").queryName("holt_spec")
        .outputMode("update").start()
      // batch 1: days 0..3 delivered OUT OF ORDER (the in-batch sort);
      // batch 2: the remaining days, state carried across the boundary
      stream.addData(Seq(2, 0, 3, 1).map(i => ("a", i, xs(i))))
      q.processAllAvailable()
      stream.addData(Seq(5, 4, 6).map(i => ("a", i, xs(i))))
      q.processAllAvailable()
      q.stop()
    }
    val got = spark.table("holt_spec").collect()
      .map(r => (r.getInt(1), r.getDouble(3), r.getDouble(4)))
      .sortBy(_._1)
    assert(got.length == xs.length)
    got.foreach { case (i, level, trend) =>
      assert(level == expected(i)._1 && trend == expected(i)._2,
        s"day $i: ($level, $trend) vs ${expected(i)}")
    }
  }

  test("driver entry: streamed == q247 on the full series (gated inside)") {
    val rows = SparkEntry.queries("stream_holt")(spark, sf).collect()
    assert(rows.nonEmpty)
    // the require() inside the entry IS the equality gate; sanity-check
    // shape here: one row per (type, day), forecast = level + trend at
    // 6 dp tolerance of the independent rounding
    assert(rows.map(r => (r.getString(0), r.getString(1))).distinct
      .length == rows.length)
  }
}
