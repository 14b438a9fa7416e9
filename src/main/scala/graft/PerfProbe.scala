package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time named entries at a given SF dir (noop sink, N reps,
  * same session shape as Bench) and optionally print the formatted
  * plan — the per-query drill-down the full Bench can't give.
  *
  * Usage: runMain graft.PerfProbe <sfDir> [--explain] q1_agg q2_...
  */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val explain = args.contains("--explain")
    val names = args.drop(1).filterNot(_.startsWith("--"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Seq("lineitem", "orders", "events", "documents", "embeddings",
      "customer", "part", "supplier", "nation", "region").foreach { t =>
      try Tables(spark, sfDir, t).count()
      catch { case _: Throwable => () }
    }
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $n%-28s ${times.map(t => f"$t%.2f").mkString(" ")}")
      if (explain) fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
