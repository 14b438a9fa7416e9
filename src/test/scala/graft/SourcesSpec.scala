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

  test("schema evolution: mergeSchema unifies old and new files, nulls backfill") {
    // the long-lived-table reality: files written before a column existed
    // sit next to files written after. mergeSchema reconciles the footers
    // (metadata-only) and old rows surface the new column as NULL.
    val dir = tmp("graft_evolve")
    import spark.implicits._
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.mode("overwrite").parquet(dir)
    Seq((3L, "c", 0.5)).toDF("id", "v", "score")
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.schema.fieldNames.toSet == Set("id", "v", "score"))
    val rows = merged.collect()
      .map(r => (r.getAs[Long]("id"), Option(r.getAs[Any]("score")))).toMap
    assert(rows(1L).isEmpty && rows(2L).isEmpty,
      "pre-evolution rows must backfill NULL")
    assert(rows(3L).contains(0.5))
    // quality audit composes: completeness of the new column reflects
    // exactly the backfilled nulls
    val nulls = merged.filter(col("score").isNull).count()
    assert(nulls == 2)
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
