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

  test("Misra-Gries heavy hitters: guaranteed above n/capacity, exact " +
      "when capacity exceeds distinct count") {
    import spark.implicits._
    import graft.functions.sketches._
    // skewed stream: "hot" 1000×, 200 singletons; capacity 8 counters
    val data = (Seq.fill(1000)("hot") ++ (1 to 200).map(i => s"rare$i"))
    val df = spark.sparkContext.parallelize(data, 8).toDF("w")
    val top = df.agg(approx_top_k(col("w"), 8, 3).as("t"))
      .select(explode(col("t")).as("e"))
      .select(col("e.item"), col("e.cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // MG guarantee: freq 1000 > n/capacity = 150 → must be present,
    // count underestimated by at most n/capacity
    assert(top.contains("hot"), s"heavy hitter evicted: $top")
    assert(top("hot") >= 1000 - 1200 / 8, s"undercount too deep: $top")
    // exact mode: capacity > distinct count reproduces true counts
    val exact = df.agg(approx_top_k(col("w"), 256, 1).as("t"))
      .select(explode(col("t")).as("e"))
      .select(col("e.item"), col("e.cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    assert(exact.toSeq == Seq("hot" -> 1000L))
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

  test("count-min estimates are upward-biased within the eps*N bound " +
    "for EVERY key, and the SQL estimator mirrors the agg") {
    import graft.functions.sketches._
    import graft.queries.StatsOps
    val words = Tables(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0).cache()
    val sketch = words
      .agg(count_min(xxhash64(col("w")), StatsOps.CmDepth, StatsOps.CmWidth))
      .head().getSeq[Long](0)
    val n = words.count()
    val rows = words.groupBy("w").agg(count(lit(1)).as("n"))
      .withColumn("est", StatsOps.cmEstimate(sketch, xxhash64(col("w"))))
      .collect()
    words.unpersist()
    val epsN = math.ceil(math.E / StatsOps.CmWidth * n).toLong
    rows.foreach { r =>
      val (exact, est) = (r.getLong(1), r.getLong(2))
      assert(est >= exact,
        s"count-min must never undercount: ${r.getString(0)} $est < $exact")
      assert(est - exact <= epsN,
        s"overcount ${est - exact} above eps*N=$epsN for ${r.getString(0)}")
    }
    assert(rows.nonEmpty)
  }

  test("count-min sketch is partition-merge invariant") {
    import graft.functions.sketches._
    import graft.queries.StatsOps
    val words = Tables(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0)
    def sk(parts: Int): Seq[Long] = words.repartition(parts)
      .agg(count_min(xxhash64(col("w")), StatsOps.CmDepth, StatsOps.CmWidth))
      .head().getSeq[Long](0)
    assert(sk(1) == sk(7), "merge must equal single-partition fold")
  }
}
