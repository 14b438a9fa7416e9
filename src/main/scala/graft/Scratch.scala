package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Throwaway experiment harness (round 8): stage-by-stage timing of
  * jaccardPrefixJoin on the dup-saturated corpus.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sfbig")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $name%-16s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val tcap = 0.5
    val ex = graft.queries.ShingleCache.hashed(spark, d)
    t("warm-cache") { ex.count() }
    val dfreq = ex.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("h"))
    val prefix = ex.join(dfreq, "h")
      .withColumn("pos", row_number().over(wDoc))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
      .filter(col("pos") <= col("n") - ceil(col("n") * lit(tcap)) + 1)
      .select(col("h"), col("doc_id"), col("pos"), col("n"))
    t("prefix-index") { println("  prefix rows=" + prefix.count()) }
    val pairs = prefix
      .groupBy(col("h"))
      .agg(sort_array(collect_list(
        struct(col("doc_id"), col("pos"), col("n")))).as("ds"))
      .filter(size(col("ds")) >= 2)
      .select(explode(expr(
        """flatten(transform(ds, (a, i) ->
          |  transform(slice(ds, i + 2, size(ds)),
          |    b -> struct(a.doc_id AS doc_a, b.doc_id AS doc_b,
          |                a.pos AS pos_a, b.pos AS pos_b,
          |                a.n AS na, b.n AS nb))))""".stripMargin))
        .as("p"))
      .select(col("p.*"))
    t("pair-gen") { println("  pair rows=" + pairs.count()) }
    val alpha = ceil(lit(tcap / (1 + tcap)) * (col("na") + col("nb")) - lit(1e-9))
    val cand = pairs.groupBy(col("doc_a"), col("doc_b"))
      .agg(min(col("pos_a")).as("pa"), min(col("pos_b")).as("pb"),
        min(col("na")).as("na"), min(col("nb")).as("nb"))
      .filter(least(col("na"), col("nb")) >= alpha &&
        lit(1) + least(col("na") - col("pa"), col("nb") - col("pb")) >= alpha)
      .select(col("doc_a"), col("doc_b"))
    t("candidates") { println("  cand rows=" + cand.count()) }
    val sh = graft.queries.ShingleCache.arrays(spark, d)
    val a = sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    val out = cand.join(a, "doc_a").join(b, "doc_b")
      .withColumn("common", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", col("common").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("common")))
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
    t("verify") { println("  out rows=" + out.count()) }
    spark.stop()
  }
}
