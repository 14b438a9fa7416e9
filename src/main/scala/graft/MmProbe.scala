package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: split the multimodal entries' cost into synthetic-asset
  * ENCODE (PNG/WAV/GIF synthesis UDFs) vs DECODE (decodeFeatures /
  * frame kernels) at a given SF dir — the measurement behind the
  * AssetCache pinning decision (see graft-build-discipline: pinning
  * pays at ~8+ passes; the mm family has 7 consumers x2 bench runs).
  *
  * Usage: runMain graft.MmProbe [sfDir]
  */
object MmProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
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
    Tables(spark, sfDir, "documents").count()
    def time(label: String)(body: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"MMPROBE $label%-24s ${ts.map(t => f"$t%.2f").mkString(" ")}")
    }
    val assets = graft.multimodal.Multimodal.syntheticAssets(spark, sfDir)
    time("encode_only") {
      assets.write.format("noop").mode("overwrite").save()
    }
    time("encode+decode") {
      graft.multimodal.Multimodal.decodeFeatures(assets)
        .write.format("noop").mode("overwrite").save()
    }
    val pinned = assets.persist()
    pinned.count()
    time("decode_from_pin") {
      graft.multimodal.Multimodal.decodeFeatures(pinned)
        .write.format("noop").mode("overwrite").save()
    }
    val feats = graft.multimodal.Multimodal.decodeFeatures(pinned).persist()
    feats.count()
    time("agg_from_featpin") {
      import org.apache.spark.sql.functions._
      feats.groupBy("kind").agg(count(lit(1))).write.format("noop")
        .mode("overwrite").save()
    }
    println("MMPROBE pinned asset bytes: " +
      spark.sparkContext.getRDDStorageInfo.map(_.memSize).sum)
    spark.stop()
  }
}
