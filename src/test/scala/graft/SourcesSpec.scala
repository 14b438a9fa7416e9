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

  test("malformed rows: PERMISSIVE captures, DROPMALFORMED drops, FAILFAST throws") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft-bad").toString
    // the bad row has the wrong TOKEN COUNT — the CSV notion of
    // malformed (a type-conversion failure only nulls the field)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/rows.csv"),
      "id,qty\n1,10\noops\n3,30\n".getBytes)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("qty", LongType),
      StructField("_corrupt_record", StringType)))
    // PERMISSIVE (default): bad row arrives as nulls + the raw line in
    // the corrupt-record column, good rows parse — the quarantine
    // pattern a 100 TB ingest needs (count the bad, never lose a file)
    val perm = spark.read.schema(schema).option("header", "true")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(dir).cache()
    assert(perm.count() == 3)
    assert(perm.filter(col("_corrupt_record").isNotNull).count() == 1)
    assert(perm.filter(col("id").isNotNull).count() == 2)
    perm.unpersist()
    // DROPMALFORMED: only the two parseable rows survive. collect(),
    // not count() — count() lets CSV column pruning skip parsing
    // entirely, so malformed rows would never be detected
    val dropped = spark.read
      .schema(StructType(schema.fields.take(2))).option("header", "true")
      .option("mode", "DROPMALFORMED").csv(dir)
    assert(dropped.collect().length == 2)
    // FAILFAST: the job refuses the file loudly
    intercept[org.apache.spark.SparkException] {
      spark.read.schema(StructType(schema.fields.take(2)))
        .option("header", "true").option("mode", "FAILFAST").csv(dir)
        .collect()
    }
    // same three modes hold for JSON lines
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/rows.json"),
      "{\"id\":1,\"qty\":10}\n{broken\n{\"id\":3,\"qty\":30}\n".getBytes)
    val jperm = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(s"$dir/rows.json").cache()
    assert(jperm.filter(col("_corrupt_record").isNotNull).count() == 1)
    jperm.unpersist()
    assert(spark.read.schema(StructType(schema.fields.take(2)))
      .option("mode", "DROPMALFORMED").json(s"$dir/rows.json").count() == 2)
  }

  test("XML roundtrip via the Spark-4 built-in source (rowTag records)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-xml").toString
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    docs.write.option("rowTag", "doc").mode("overwrite")
      .xml(s"$dir/docs.xml")
    val back = spark.read.option("rowTag", "doc").xml(s"$dir/docs.xml")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    assert(back.count() === docs.count())
    val a = docs.collect().map(_.toString).sorted.toSeq
    val b = back.collect().map(_.toString).sorted.toSeq
    assert(a === b)
  }

  test("XML malformed rows: PERMISSIVE captures the corrupt record") {
    import org.apache.spark.sql.types._
    val dir = java.nio.file.Files.createTempDirectory("graft-xmlm").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/rows.xml"),
      """<rows>
        |<r><id>1</id><v>10</v></r>
        |<r><id>oops</id><v>20</v></r>
        |<r><id>3</id><v>30</v></r>
        |</rows>""".stripMargin)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("v", LongType),
      StructField("_corrupt_record", StringType)))
    val perm = spark.read.option("rowTag", "r").schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .xml(s"$dir/rows.xml").cache()
    assert(perm.count() === 3)
    assert(perm.filter(col("_corrupt_record").isNotNull).count() === 1)
    // the unparsable field itself arrives NULL on the captured row
    assert(perm.filter(col("_corrupt_record").isNotNull)
      .filter(col("id").isNull).count() === 1)
    perm.unpersist()
  }
}
