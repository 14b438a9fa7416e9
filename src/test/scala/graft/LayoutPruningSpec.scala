package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Proves the layout ops EARN their cost at scan time: the same point
  * filter over the same rows reads far less data from a key-clustered
  * layout than from a shuffled one, because parquet row-group min/max
  * stats let the pushed filter skip whole row groups. This is the
  * mechanism that makes q79's Z-ordering and Compaction's `clusterBy`
  * matter at 100 TB — clustering turns predicate pushdown from a
  * per-row filter into data skipping.
  */
class LayoutPruningSpec extends SparkSpec {

  private def scanOutputRows(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect()
    val scans = df.queryExecution.executedPlan.collectLeaves()
    scans.flatMap(_.metrics.get("numOutputRows").map(_.value)).sum
  }

  test("clustered layout + pushed filter skips row groups; shuffled layout cannot") {
    val base = Files.createTempDirectory("graft_skip").toString
    val docs = Tables(spark, sf, "documents")
    val n = docs.count()
    // small row groups so one file holds many skippable groups
    val clustered = s"$base/clustered"
    val shuffled = s"$base/shuffled"
    docs.repartitionByRange(1, col("doc_id"))
      .sortWithinPartitions(col("doc_id"))
      .write.option("parquet.block.size", 64 * 1024)
      .mode("overwrite").parquet(clustered)
    // md5 order ≈ random: every row group spans the whole doc_id domain
    docs.repartition(1).sortWithinPartitions(md5(col("doc_id").cast("string")))
      .write.option("parquet.block.size", 64 * 1024)
      .mode("overwrite").parquet(shuffled)

    val pred = col("doc_id") < 20
    val want = docs.filter(pred).count()

    val cl = spark.read.parquet(clustered).filter(pred)
    val sh = spark.read.parquet(shuffled).filter(pred)
    assert(cl.count() == want && sh.count() == want,
      "layout must never change results")

    // the filter reaches both scans...
    assert(cl.queryExecution.executedPlan.toString.contains("PushedFilters: [IsNotNull(doc_id), LessThan(doc_id"))
    // ...but only the clustered layout lets row-group stats skip data:
    // its scan emits a fraction of the table, the shuffled one all of it
    val clRows = scanOutputRows(cl)
    val shRows = scanOutputRows(sh)
    assert(shRows == n,
      s"shuffled layout should read every row ($shRows != $n)")
    assert(clRows < n / 2,
      s"clustered layout should skip most row groups (read $clRows of $n)")
  }
}
