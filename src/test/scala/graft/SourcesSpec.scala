package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** S6 (SURVEY.md §2.1): beyond parquet, the engine reads/writes CSV,
  * JSON-lines, and text with schema round-tripping — the formats a YaMR
  * user's `key,value` files and props blobs map onto.
  */
class SourcesSpec extends SparkSpec {

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("CSV roundtrip with header + explicit schema preserves rows") {
    val dir = tmp("graft_csv")
    val src = Tables(spark, sf, "nation")
    src.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true")
      .schema(src.schema).csv(dir)
    assert(back.collect().toSet == src.collect().toSet)
  }

  test("JSON-lines roundtrip preserves rows and types survive") {
    val dir = tmp("graft_json")
    val src = Tables(spark, sf, "region")
    src.write.mode("overwrite").json(dir)
    val back = spark.read.schema(src.schema).json(dir)
    assert(back.collect().toSet == src.collect().toSet)
  }

  test("text sink/source: key,value lines roundtrip through the DFS verbs") {
    import spark.implicits._
    val dir = tmp("graft_text")
    val lines = Tables(spark, sf, "nation")
      .select(concat_ws(",", col("n_nationkey"), col("n_name")))
      .as[String]
    lines.write.mode("overwrite").text(dir)
    val back = graft.mr.MapReduce.read(spark, dir)
    assert(back.collect().sorted.toSeq == lines.collect().sorted.toSeq)
  }

  test("ORC roundtrip preserves rows (columnar alternative to parquet)") {
    val dir = tmp("graft_orc")
    val src = Tables(spark, sf, "customer")
    src.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema == src.schema)
    assert(back.collect().toSet == src.collect().toSet)
  }

  test("csv without schema infers and still aggregates correctly") {
    val dir = tmp("graft_csv2")
    Tables(spark, sf, "supplier")
      .select(col("s_suppkey"), col("s_nationkey"))
      .write.mode("overwrite").option("header", "true").csv(dir)
    val n = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(dir).groupBy(col("s_nationkey")).count().count()
    val want = Tables(spark, sf, "supplier")
      .select(col("s_nationkey")).distinct().count()
    assert(n == want)
  }
}
