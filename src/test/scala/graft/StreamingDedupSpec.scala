package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{IdempotentSink, StreamingDedup}

/** Continuous incremental near-dedup: the q92 pass composed with the
  * exactly-once ledger. Pins (1) streamed == batch q92 on the same
  * delta split, (2) cross-batch dedup against earlier keepers, and
  * (3) replay suppression.
  */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  test("stream_cdc_inc: exact dup 0 novel, insert <= 3, fresh all novel") {
    import java.sql.Timestamp
    import graft.streaming.CdcIngest
    def t(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 00:00:00")
    val base = (1 to 60).map("t" + _).mkString(" ")
    val edited = ((1 to 30).map("t" + _) ++ Seq("INS") ++
      (31 to 60).map("t" + _)).mkString(" ")
    val fresh = (1 to 40).map("f" + _).mkString(" ")
    val ref = CdcIngest.refChunks(
      Seq((1L, base)).toDF("doc_id", "text"))
    try {
      // three windows, one arriving doc each: an exact re-crawl, a
      // one-token edit, and genuinely new content
      val rows = Seq((t(1), base), (t(12), edited), (t(23), fresh))
      val batch = CdcIngest.novelty(rows.toDF("ts", "text"), ref, "5 days")
        .collect().sortBy(_.getTimestamp(0).getTime)
        .map(r => (r.getLong(1), r.getLong(2)))
      assert(batch.length === 3)
      assert(batch(0)._2 === 0L, s"exact dup had novel chunks: ${batch(0)}")
      assert(batch(1)._2 <= 3L && batch(1)._2 < batch(1)._1,
        s"one-token edit lost insert-robustness: ${batch(1)}")
      assert(batch(2)._2 === batch(2)._1,
        s"fresh doc not fully novel: ${batch(2)}")
      // streamed == batch on a real 2-batch split
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val stream = MemoryStream[(Timestamp, String)]
      val q = CdcIngest.novelty(
          stream.toDF().toDF("ts", "text"), ref, "5 days")
        .writeStream.format("memory").queryName("sdd_cdc")
        .outputMode("complete").start()
      val (b1, b2) = rows.partition(_._1.getTime < t(10).getTime)
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
      q.stop()
      val streamed = spark.table("sdd_cdc").collect()
        .sortBy(_.getTimestamp(0).getTime)
        .map(r => (r.getLong(1), r.getLong(2)))
      assert(streamed.toSeq === batch.toSeq)
    } finally org.apache.spark.sql.graft.ColumnBridge
      .unpersistCheckpoint(ref)
  }

  test("single-batch stream == batch q92 on the same split") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = Tables(spark, sf, "documents")
    val a = docs.filter(pmod(col("doc_id"), lit(7)) =!= 2)
      .select(col("doc_id"), col("text"), col("lang"), col("source"))
    val b = docs.filter(pmod(col("doc_id"), lit(11)) =!= 3)
      .select(col("doc_id"),
        when(pmod(col("doc_id"), lit(13)) === 5,
          concat(col("text"), lit(" v2"))).otherwise(col("text")).as("text"),
        col("lang"), col("source"))
      .as[(Long, String, String, String)].collect().toSeq
    val base = java.nio.file.Files
      .createTempDirectory("graft-sdd-spec").toString
    val root = s"$base/ledger"
    StreamingDedup.seed(a, root)
    val stream = MemoryStream[(Long, String, String, String)]
    val q = StreamingDedup.attach(
      stream.toDF().toDF("doc_id", "text", "lang", "source"),
      root, s"$base/ck")
    stream.addData(b)
    q.processAllAvailable()
    q.stop()
    val streamed = StreamingDedup.ingested(spark, root)
      .select("doc_id", "lang", "source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val batch = SparkEntry.queries("q92_incremental_dedup")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(streamed == batch,
      "one delivery through the stream must equal the batch q92 pass")
    assert(streamed.nonEmpty)
  }

  test("later batches dedup against earlier batches' keepers") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.nio.file.Files
      .createTempDirectory("graft-sdd-multi").toString
    val root = s"$base/ledger"
    val seedText = "the quick brown fox jumps over the lazy dog"
    StreamingDedup.seed(
      Seq((1L, seedText, "en", "seed"))
        .toDF("doc_id", "text", "lang", "source"), root)
    val stream = MemoryStream[(Long, String, String, String)]
    val q = StreamingDedup.attach(
      stream.toDF().toDF("doc_id", "text", "lang", "source"),
      root, s"$base/ck")
    val novel = "completely different content about spark engines at scale"
    // batch 0: one exact dup of the seed (dropped), one novel doc (kept)
    stream.addData(Seq((10L, seedText, "en", "b0"), (11L, novel, "en", "b0")))
    q.processAllAvailable()
    // batch 1: a near-dup of batch 0's KEEPER (last token changed —
    // 3-gram Jaccard 6/8 = 0.75 ≥ 0.5) must drop; a new doc must keep
    val near = "completely different content about spark engines at speed"
    val fresh = "unrelated prose concerning entirely other subject matter"
    stream.addData(Seq((20L, near, "en", "b1"), (21L, fresh, "en", "b1")))
    q.processAllAvailable()
    q.stop()
    val kept = StreamingDedup.ingested(spark, root)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(11L, 21L),
      s"batch-1 near-dup of a batch-0 keeper must be dropped; got $kept")
  }

  test("ledger compaction: checkpoint + tail == full ledger, dedup unchanged") {
    import graft.streaming.StreamingDedup._
    val base = java.nio.file.Files
      .createTempDirectory("graft-sdd-compact").toString
    val root = s"$base/ledger"
    seed(Seq((1L, "alpha beta gamma delta epsilon zeta", "en", "s"))
      .toDF("doc_id", "text", "lang", "source"), root)
    val b0 = Seq((10L, "first new document about streaming ledgers",
      "en", "b")).toDF("doc_id", "text", "lang", "source")
    val b1 = Seq((20L, "second new document about snapshot folding",
      "en", "b")).toDF("doc_id", "text", "lang", "source")
    assert(processBatch(b0, root, 0L) && processBatch(b1, root, 1L))
    def corpusSet = corpusView(spark, root)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val before = corpusSet
    assert(compact(spark, root) == 1L)
    assert(corpusSet == before, "compacted view must equal the ledger")
    // a batch AFTER compaction dedups against checkpoint + tail: the
    // near-dup of b1's keeper must still drop, the novel doc keeps
    val b2 = Seq(
      (30L, "second new document about snapshot compaction", "en", "b"),
      (31L, "wholly unrelated prose on another topic entirely", "en", "b"))
      .toDF("doc_id", "text", "lang", "source")
    assert(processBatch(b2, root, 2L))
    val kept = ingested(spark, root).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(10L, 20L, 31L),
      s"post-compaction dedup must match the uncompacted semantics: $kept")
    // the tail batch (2) sits ABOVE the checkpoint's high-water mark
    // and still reaches the corpus view
    assert(corpusSet.exists(_._1 == 31L))
  }

  test("replay cannot double-ingest (marker suppression before any work)") {
    val base = java.nio.file.Files
      .createTempDirectory("graft-sdd-replay").toString
    val root = s"$base/ledger"
    StreamingDedup.seed(
      Seq((1L, "alpha beta gamma delta epsilon", "en", "s"))
        .toDF("doc_id", "text", "lang", "source"), root)
    val batch = Seq((2L, "wholly new textual material for the ledger",
      "en", "b")).toDF("doc_id", "text", "lang", "source")
    assert(StreamingDedup.processBatch(batch, root, 0L),
      "first attempt performs the write")
    val afterFirst = IdempotentSink.readCommitted(spark, root).count()
    assert(!StreamingDedup.processBatch(batch, root, 0L),
      "replayed batchId must be suppressed")
    assert(IdempotentSink.readCommitted(spark, root).count() == afterFirst)
    // seeding again is also suppressed
    assert(!StreamingDedup.seed(
      Seq((1L, "alpha beta gamma delta epsilon", "en", "s"))
        .toDF("doc_id", "text", "lang", "source"), root))
  }
}
