package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Dev tool: run one entry with a listener that prints per-job wall
  * times and stage/task counts — the Spark-UI jobs page for a headless
  * box. Usage: runMain graft.JobProbe <sfDir> <entry> [reps]
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val name = args(1)
    val reps = args.drop(2).headOption.map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]
    @volatile var t0 = System.nanoTime()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val desc = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobs.put(j.jobId, (System.nanoTime(),
          s"stages=${j.stageInfos.size} $desc"))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val (s, d) = jobs.getOrDefault(j.jobId, (System.nanoTime(), "?"))
        println(f"  JOB ${j.jobId}%3d  +${(s - t0) / 1e9}%6.2f  " +
          f"${(System.nanoTime() - s) / 1e9}%6.3f s  $d")
      }
    })
    Seq("lineitem", "orders", "events", "documents", "embeddings",
      "customer", "part", "supplier", "nation", "region").foreach { t =>
      try Tables(spark, sfDir, t).count()
      catch { case _: Throwable => () }
    }
    val fn = SparkEntry.queries(name)
    (1 to reps).foreach { r =>
      println(s"== $name rep $r ==")
      t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      Thread.sleep(300) // let job-end events drain before the banner
      println(f"== total ${(System.nanoTime() - t0) / 1e9}%.2f s ==")
    }
    spark.stop()
  }
}
