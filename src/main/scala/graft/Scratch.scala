package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway experiment (round 8): A/B the per-row grouped-rank
  * percentile form vs the value-class prefix-sum form on sf0.1.
  */
object Scratch {

  // the pre-round-8 per-row form
  private def perRow(df: DataFrame, groupCol: String, valueCol: String,
      ps: Seq[Double]): Map[String, (Long, Seq[Double])] = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(groupCol).cast("string").as("g"),
      col(valueCol).cast("double").as("v"))
    val counts = base.groupBy(col("g")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ranked = graft.operators.GlobalRank
      .withRankInGroups(base, "rk", col("g"), col("v"))
    def posOf(n: Long) = ps.map(p => p * (n - 1))
    val wantedDf = counts.toSeq.flatMap { case (g, n) =>
      posOf(n).flatMap(pos => Seq(math.floor(pos).toLong + 1,
        math.ceil(pos).toLong + 1)).distinct.map(g -> _)
    }.toDF("g", "rk")
    val atRank = ranked.join(broadcast(wantedDf), Seq("g", "rk"))
      .groupBy(col("g"), col("rk")).agg(min(col("v")).as("v"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    counts.map { case (g, n) =>
      g -> (n, posOf(n).map { pos =>
        val lo = atRank((g, math.floor(pos).toLong + 1))
        val hi = atRank((g, math.ceil(pos).toLong + 1))
        BigDecimal(java.math.BigDecimal.valueOf(
            lo + (hi - lo) * (pos - math.floor(pos))))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      })
    }
  }

  // pre-round-8 ungrouped per-row form
  private def perRowU(df: DataFrame, valueCol: String,
      ps: Seq[Double]): Seq[Double] = {
    val vals = df.select(col(valueCol).cast("double").as("v"))
    val n = vals.count()
    val positions = ps.map(p => p * (n - 1))
    val wanted = positions
      .flatMap(pos => Seq(math.floor(pos).toLong + 1,
        math.ceil(pos).toLong + 1)).distinct
    val ranked = graft.operators.GlobalRank.withRank(vals, "rk", col("v"))
    val atRank = ranked.filter(col("rk").isin(wanted: _*))
      .groupBy(col("rk")).agg(min(col("v")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    positions.map { pos =>
      val lo = atRank(math.floor(pos).toLong + 1)
      val hi = atRank(math.ceil(pos).toLong + 1)
      BigDecimal(java.math.BigDecimal.valueOf(
          lo + (hi - lo) * (pos - math.floor(pos))))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
  }

  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = Tables(spark, d, "lineitem")
    li.count()
    def once(mode: String): Double = {
      val t0 = System.nanoTime()
      val r = mode match {
        case "perRowU" => perRowU(li, "l_extendedprice", Seq(0.05, 0.95))
        case "classU" => graft.queries.StatsOps
          .exactQuantilesByRank(li, "l_extendedprice", Seq(0.05, 0.95))
      }
      require(r.nonEmpty)
      (System.nanoTime() - t0) / 1e9
    }
    val modes = Seq("perRowU", "classU")
    modes.foreach(once)
    val acc = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    (1 to 5).foreach(_ => modes.foreach(m => acc(m) = once(m) :: acc(m)))
    val pa = perRowU(li, "l_extendedprice", Seq(0.05, 0.95))
    val pb = graft.queries.StatsOps.exactQuantilesByRank(
      li, "l_extendedprice", Seq(0.05, 0.95))
    println(s"PARITY ${pa == pb}")
    modes.foreach { m =>
      val ts = acc(m).sorted
      println(f"MODE $m%-8s min ${ts.head}%.2f med ${ts(ts.size / 2)}%.2f " +
        ts.map(t => f"$t%.2f").mkString("[", " ", "]"))
    }
    spark.stop()
  }
}
