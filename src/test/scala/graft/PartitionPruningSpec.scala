package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Hive-style partitioned writes + partition pruning: a `lang=`-partitioned
  * corpus read with a lang filter must scan only that partition's
  * directory — the layout that turns a 100 TB corpus scan into a
  * per-language one.
  */
class PartitionPruningSpec extends SparkSpec {

  test("write partitionBy(lang); filtered read prunes to one partition") {
    val dir = Files.createTempDirectory("graft_part").toString
    Tables(spark, sf, "documents")
      .write.mode("overwrite").partitionBy("lang").parquet(dir)

    val en = spark.read.parquet(dir).filter(col("lang") === "en")
    val plan = en.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"),
      s"no partition filter in scan:\n$plan")

    val want = Tables(spark, sf, "documents")
      .filter(col("lang") === "en").count()
    assert(en.count() == want)

    // physical layout: one subdirectory per language
    val subdirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("lang=")).sorted
    assert(subdirs.length >= 3 && subdirs.contains("lang=en"), subdirs.mkString(","))
  }
}
