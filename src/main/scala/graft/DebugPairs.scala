package graft

import org.apache.spark.sql.SparkSession

/** Dev profiler for the PairCache connectivity-graph build. Arg 2
  * selects the variant measured in a FRESH JVM (order-unbiased A/B):
  * "prefix" (the shipped exact design), "budget" (the superseded
  * pair-budget + LSH spill design, kept here for measurement), or
  * "q23" (the full common-count join reference).
  * Usage: runMain graft.DebugPairs [dir] [prefix|budget|q23]
  */
object DebugPairs {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sfbig")
    val variant = args.lift(1).getOrElse("prefix")
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
    t("shingle.warm") {
      graft.queries.ShingleCache.arrays(spark, d).count()
      graft.queries.ShingleCache.hashed(spark, d).count()
      graft.queries.ShingleCache.sortedHashes(spark, d).count()
    }
    import org.apache.spark.sql.functions._
    def collapsed() = {
      val eligible = graft.Tables(spark, d, "documents")
        .filter(size(split(col("text"), " ")) >= 3)
        .select(col("doc_id"), sha2(col("text"), 256).as("k"))
      val mapping = eligible
        .join(eligible.groupBy(col("k")).agg(min(col("doc_id")).as("rep"))
          .hint("shuffle_hash"), "k")
        .select(col("doc_id"), col("rep"))
      val repIds = mapping.filter(col("doc_id") === col("rep"))
        .select(col("doc_id"))
      graft.queries.ShingleCache.hashed(spark, d)
        .join(repIds.hint("shuffle_hash"), "doc_id")
    }
    variant match {
      case "prefix" =>
        t("graph.prefix")(println("edges=" + graft.queries.DedupQueries
          .connectivityPairGraph(spark, d).count()))
      case "budget" =>
        val exR = collapsed()
        val dfreq = exR.groupBy(col("h")).agg(count(lit(1)).as("df"))
        val rare = exR.join(dfreq.filter(col("df") <= 32)
          .select(col("h")).hint("shuffle_hash"), "h")
        val candRare = graft.queries.DedupQueries
          .bucketPairs(rare, Seq("h"), "doc_id")
        val candLsh = graft.queries.DedupQueries.lshBandCandidates(exR)
        t("graph.budget")(println("repPairs=" + graft.queries.DedupQueries
          .verifyExact(
            candRare.unionByName(candLsh).distinct(), spark, d).count()))
      case _ =>
        t("graph.q23full")(println("pairs=" + graft.queries.DedupQueries
          .queries("q23_ngram_jaccard")(spark, d).count()))
    }
    spark.stop()
  }
}
