package graft

import org.apache.spark.sql.SparkSession

/** Dev profiler: time the PairCache connectivity-graph build against
  * the full q23 exact pair join at a given dataset dir (the round-10
  * pair-budget work's measurement harness).
  * Usage: runMain graft.DebugPairs [dir]
  */
object DebugPairs {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sfbig")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    t("shingle.arrays")(graft.queries.ShingleCache.arrays(spark, d).count())
    t("shingle.hashed")(graft.queries.ShingleCache.hashed(spark, d).count())
    t("shingle.sorted")(
      graft.queries.ShingleCache.sortedHashes(spark, d).count())
    t("pairs.connectivity")(println("edges=" + graft.queries.DedupQueries
      .connectivityPairGraph(spark, d).count()))
    t("pairs.q23full")(println("pairs=" + graft.queries.DedupQueries
      .queries("q23_ngram_jaccard")(spark, d).count()))
    spark.stop()
  }
}
