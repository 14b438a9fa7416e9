package graft

import org.apache.spark.sql.functions._

/** Sketch aggregates (SURVEY.md §2.5 extensions): HLL distinct counts and
  * approximate percentiles — no DuckDB oracle (sketch internals differ
  * between engines), so accuracy bounds are pinned here instead.
  */
class SketchSpec extends SparkSpec {

  test("approx_count_distinct within 5% of exact on order keys") {
    val df = Tables(spark, sf, "lineitem")
    val r = df.agg(
      countDistinct(col("l_orderkey")).as("exact"),
      approx_count_distinct(col("l_orderkey"), rsd = 0.02).as("approx")).head()
    val exact = r.getLong(0).toDouble
    val approx = r.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.05,
      s"HLL error too large: approx=$approx exact=$exact")
  }

  test("approx_percentile brackets the exact median") {
    val df = Tables(spark, sf, "orders")
    val approx = df.agg(
      percentile_approx(col("o_totalprice"), lit(0.5), lit(1000)))
      .head().getDouble(0)
    val exact = df.stat.approxQuantile("o_totalprice", Array(0.5), 0.0)(0)
    assert(math.abs(approx - exact) / exact < 0.02,
      s"approx median $approx vs exact $exact")
  }
}
