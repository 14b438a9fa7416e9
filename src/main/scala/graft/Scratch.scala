package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.Sum128

object Scratch {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = Tables(spark, d, "lineitem")
    li.count()
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val pairs = for { i <- cols.indices; j <- cols.indices if i < j } yield (cols(i), cols(j))
    def t[A](name: String)(f: => A): Unit =
      (1 to 3).foreach { _ =>
        val t0 = System.nanoTime(); f
        println(f"STEP $name%-14s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    val dec = DecimalType(38, 8)
    t("decimal38") {
      val aggs = cols.map(c => sum(col(c).cast(dec))) ++
        cols.map(c => sum((col(c) * col(c)).cast(dec))) ++
        pairs.map { case (a, b) => sum((col(a) * col(b)).cast(dec)) }
      li.agg(count(lit(1)), aggs: _*).collect()
    }
    t("sum128") {
      val aggs = cols.map(c => Sum128.sumExact(col(c), 2)) ++
        cols.map(c => Sum128.sumExactProduct(col(c), col(c), 2)) ++
        pairs.map { case (a, b) => Sum128.sumExactProduct(col(a), col(b), 2) }
      li.agg(count(lit(1)), aggs: _*).collect()
    }
    // value parity across the full moment set
    val both = li.agg(count(lit(1)).as("n"),
      (cols.map(c => sum(col(c).cast(dec)).cast("double")) ++
        cols.map(c => Sum128.sumExact(col(c), 2)) ++
        pairs.map { case (a, b) => sum((col(a) * col(b)).cast(dec)).cast("double") } ++
        pairs.map { case (a, b) => Sum128.sumExactProduct(col(a), col(b), 2) }): _*).head()
    val k = cols.size
    val ok1 = (0 until k).forall(i => both.getDouble(1 + i) == both.getDouble(1 + k + i))
    val ok2 = (0 until pairs.size).forall(i => both.getDouble(1 + 2 * k + i) == both.getDouble(1 + 2 * k + pairs.size + i))
    println(s"PARITY sums=$ok1 products=$ok2")
    spark.stop()
  }
}
