package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Incremental inverted index: hand-counted 2-batch fold (df counts a
  * doc once per term, cf every occurrence; state carries across the
  * batch boundary) and the driver entry's full-corpus q72 equality.
  */
class IndexStreamSpec extends SparkSpec {

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def withRocks[T](body: => T): T = {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None => spark.conf.unset(ProviderKey)
    }
  }

  test("2-batch fold: df per doc-term once, cf every occurrence") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    implicit val enc: org.apache.spark.sql.Encoder[(String, Long)] =
      Encoders.product[(String, Long)]
    withRocks {
      val stream = MemoryStream[(String, Long)]
      val out = streaming.IndexStream.maintained(stream.toDS())
        .toDF("term", "df", "cf")
      val q = out.writeStream.format("memory").queryName("idx_spec")
        .outputMode("update").start()
      // batch 1: doc 1 = "a a b", doc 2 = "a"
      stream.addData(Seq(("a", 1L), ("a", 1L), ("b", 1L), ("a", 2L)))
      q.processAllAvailable()
      // batch 2: doc 3 = "a b b c" — df/cf must ADD to batch-1 state
      stream.addData(Seq(("a", 3L), ("b", 3L), ("b", 3L), ("c", 3L)))
      q.processAllAvailable()
      q.stop()
    }
    val finalIdx = spark.table("idx_spec")
      .groupBy(col("term")).agg(max(col("df")).as("df"),
        max(col("cf")).as("cf"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(finalIdx == Set(("a", 3L, 4L), ("b", 2L, 3L), ("c", 1L, 1L)),
      finalIdx.toString)
  }

  test("driver entry: final streamed index == batch q72 (gated inside)") {
    val rows = SparkEntry.queries("stream_index_inc")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getString(0)).distinct.length == rows.length,
      "one row per term")
  }
}
