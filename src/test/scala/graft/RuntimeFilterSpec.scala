package graft

import org.apache.spark.sql.functions._

import graft.operators.RuntimeFilter

class RuntimeFilterSpec extends SparkSpec {

  test("bloom-pruned join equals the plain join (false positives die)") {
    import spark.implicits._
    // 997 distinct keys on the large side; 3 present + 1 absent probe
    val large = (1L to 10000L).map(i => (i % 997, i)).toDF("k", "v")
    val small = Seq((5L, "a"), (13L, "b"), (996L, "c"), (2000L, "d"))
      .toDF("sk", "name")
    val pruned = RuntimeFilter.bloomPrunedJoin(large, "k", small, "sk")
      .select(col("k"), col("v"), col("name"))
    val plain = large.join(small, col("k") === col("sk"))
      .select(col("k"), col("v"), col("name"))
    assert(pruned.collect().toSet == plain.collect().toSet)
    assert(pruned.count() == plain.count() && pruned.count() > 0)
  }

  test("the bloom prune sits in the plan as a large-side filter") {
    import spark.implicits._
    // spark.range (not a LocalRelation): ConvertToLocalRelation would
    // otherwise evaluate the bloom filter at optimization time and
    // leave no Filter node to assert on
    val large = spark.range(1000).withColumnRenamed("id", "k")
      .withColumn("v", col("k") * 2)
    val small = Seq((1L, "x"), (2L, "y")).toDF("sk", "name")
    val pruned = RuntimeFilter.bloomPrunedJoin(large, "k", small, "sk")
    val plan = pruned.queryExecution.optimizedPlan.toString.toLowerCase
    assert(plan.contains("bloom"), s"no bloom filter in plan:\n$plan")
  }

  test("empty small side yields an empty (not failing) result") {
    import spark.implicits._
    val large = (1L to 100L).toDF("k").withColumn("v", col("k"))
    val small = Seq.empty[(Long, String)].toDF("sk", "name")
    assert(RuntimeFilter.bloomPrunedJoin(large, "k", small, "sk")
      .count() == 0)
  }
}
