package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Pins the third leg of the layout family after pushdown
  * (LayoutPruningSpec) and Z-order (q79): DYNAMIC partition pruning.
  * A date-partitioned fact table joined to a filtered dimension must
  * not scan every partition — Catalyst injects the dim-side filter as
  * a runtime subquery into the fact scan's partition filters. At
  * 100 TB this is the difference between reading 3 days and reading
  * 3 years; the spec proves the mechanism fires in OUR layout (the
  * partitionBy("day") ingest shape Compaction and the warehouse ops
  * write), not just that Spark supports it.
  */
class DppSpec extends SparkSpec {

  test("date-partitioned fact scan is pruned by the dim-side filter") {
    val base = Files.createTempDirectory("graft_dpp").toString
    Tables(spark, sf, "events")
      .withColumn("day", to_date(col("ts")))
      .write.partitionBy("day").mode("overwrite").parquet(s"$base/fact")
    val fact = spark.read.parquet(s"$base/fact")
    val n = fact.count()
    val days = fact.select(col("day")).distinct().collect()
      .map(_.getDate(0)).sortBy(_.getTime)
    assert(days.length >= 10, "events must span enough days")
    val keep = days.take(3)
    // dim carries a non-join attribute so the filter is ON THE DIM
    // (DPP requires a selective dim-side predicate, not a fact filter).
    // Integer equality, not a bare boolean: PartitionPruning's
    // isLikelySelective accepts comparisons but not a lone attribute
    // (and BooleanSimplification would reduce `flag = true` to one).
    fact.select(col("day")).distinct()
      .withColumn("flag",
        when(col("day") <= lit(keep.last), 1).otherwise(0))
      .write.mode("overwrite").parquet(s"$base/dim")
    val dim = spark.read.parquet(s"$base/dim").filter(col("flag") === 1)

    val joined = fact.join(dim.select(col("day")), "day")
    val want = fact.filter(col("day") <= lit(keep.last)).count()
    // execute JOINED itself (count() would be a separate QueryExecution
    // whose metrics we could not inspect afterwards)
    assert(joined.collect().length == want && want > 0 && want < n)

    // unwrap AQE to the final executed plan — the pre-execution
    // wrapper's leaves carry no populated metrics
    val plan = joined.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    assert(plan.toString.toLowerCase.contains("dynamicpruning"),
      s"no dynamic pruning in plan:\n$plan")
    // the fact scan must EMIT only the kept partitions' rows.
    // QueryStageExec nodes are leaves to collect(), so descend into
    // their stage plans explicitly.
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[FileSourceScanExec] = p.collect {
      case s: FileSourceScanExec => Seq(s)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scans(q.plan)
    }.flatten
    val factScanRows = scans(plan)
      .filter(_.output.exists(_.name == "event_id"))
      .map(_.metrics("numOutputRows").value).sum
    assert(factScanRows == want,
      s"fact scan read $factScanRows rows, want only $want of $n")
  }
}
