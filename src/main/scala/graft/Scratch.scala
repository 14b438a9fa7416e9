package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.GlobalRank

/** Throwaway experiment harness (round 8): bisect the withRankInGroups
  * null-safe-join regression — `<=>` vs `===` vs struct-key equi-join on
  * the offsets broadcast.
  */
object Scratch {

  // withRankInGroups with a pluggable offsets-join condition
  private def rankInGroupsWith(mode: String)(df: DataFrame, rankCol: String,
      group: Column, keys: Column*): DataFrame = {
    val g = GlobalRank.withRank(df, "__gr_grank", (group +: keys): _*)
    val counts = df.groupBy(group.as("__gr_g"))
      .agg(count(lit(1)).as("__gr_n"))
    val offs = counts
      .withColumn("__gr_goff",
        coalesce(
          sum(col("__gr_n")).over(
            Window.orderBy(col("__gr_g"))
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__gr_g"), col("__gr_goff"))
    val cond = mode match {
      case "nullsafe" => group <=> col("__gr_g")
      case "plain"    => group === col("__gr_g")
      case "struct"   => struct(group) === struct(col("__gr_g"))
    }
    g.join(broadcast(offs), cond)
      .withColumn(rankCol, col("__gr_grank") - col("__gr_goff"))
      .drop("__gr_g", "__gr_goff", "__gr_grank")
  }

  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // struct null-equality sanity
    val nullEq = spark.range(1).select(
      (struct(lit(null).cast("string")) === struct(lit(null).cast("string")))
        .as("eq")).head.getBoolean(0)
    println(s"STRUCT_NULL_EQ $nullEq")

    val base = Tables(spark, d, "lineitem")
      .select(col("l_returnflag").as("f"), col("l_quantity").as("q"),
        col("l_extendedprice").as("p"), col("l_orderkey"),
        col("l_linenumber"))
    base.count() // warm file index

    def once(mode: String): Double = {
      val t0 = System.nanoTime()
      rankInGroupsWith(mode)(base, "rn", col("f"),
        col("q"), col("l_orderkey"), col("l_linenumber"))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val modes = Seq("plain", "nullsafe", "struct")
    modes.foreach(once) // warm all three code paths
    val acc = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    (1 to 5).foreach { _ =>
      modes.foreach(m => acc(m) = once(m) :: acc(m))
    }
    modes.foreach { m =>
      val ts = acc(m).sorted
      println(f"MODE $m%-9s min ${ts.head}%.2f med ${ts(ts.size / 2)}%.2f " +
        ts.map(t => f"$t%.2f").mkString("[", " ", "]"))
    }

    // plans
    Seq("plain", "nullsafe", "struct").foreach { m =>
      println(s"==== PLAN $m ====")
      println(rankInGroupsWith(m)(base, "rn", col("f"),
        col("q"), col("l_orderkey"), col("l_linenumber"))
        .queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Join") || l.contains("Exchange") ||
          l.contains("Window") || l.contains("Filter"))
        .mkString("\n"))
    }
    spark.stop()
  }
}
