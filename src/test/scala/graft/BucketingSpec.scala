package graft


import org.apache.spark.sql.functions._

/** Bucketing: pre-partitioning fact tables on the join key so repeated
  * joins are exchange-free — the "minimize shuffles" story for a 100 TB
  * warehouse where orders⋈lineitem runs daily. The spec pins that a join
  * of two tables bucketed on the key plans WITHOUT a shuffle Exchange.
  */
class BucketingSpec extends SparkSpec {

  test("join of co-bucketed tables plans without a shuffle exchange") {
    // default warehouse dir (spark-warehouse/ under cwd); tables dropped after
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // force the sort-merge path: at sf0.001 AQE would broadcast instead,
    // which hides the property under test (shuffle-free co-located join)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables(spark, sf, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("b_orders")
      Tables(spark, sf, "lineitem")
        .select("l_orderkey", "l_quantity", "l_extendedprice")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("b_lineitem")

      val joined = spark.table("b_orders")
        .join(spark.table("b_lineitem"),
          col("o_orderkey") === col("l_orderkey"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"co-bucketed join must not shuffle:\n$plan")

      // and it computes the same result as the unbucketed join
      val n = joined.count()
      val want = Tables(spark, sf, "orders")
        .join(Tables(spark, sf, "lineitem"),
          col("o_orderkey") === col("l_orderkey")).count()
      assert(n == want)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
