package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.queries.SimilarityQueries
import graft.streaming.AnnIngest

/** Continuous embedding ingest into the served ANN index: arrivals
  * become servable, replays converge (upsert + marker), snapshots stay
  * version-aligned.
  */
class AnnIngestSpec extends SparkSpec {
  import spark.implicits._

  test("streamed arrivals become servable; replay converges") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val e = Tables(spark, sf, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val root = java.nio.file.Files
      .createTempDirectory("graft-anning").toString
    SimilarityQueries.persistAnnIndex(e, root)
    val n1 = SimilarityQueries.loadAnnIndex(spark, root)._1.count()
    // batch 0 arrives via the stream: an exact clone of query vector 0
    val clone = e.filter(col("vec_id") === 0L)
      .select(lit(910000L).as("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toSeq
    val stream = MemoryStream[(Long, Array[Float])]
    val q = AnnIngest.attach(
      stream.toDF().toDF("vec_id", "embedding"), root, s"$root/ck")
    stream.addData(clone)
    q.processAllAvailable()
    q.stop()
    val (idx2, _) = SimilarityQueries.loadAnnIndex(spark, root)
    assert(idx2.count() == n1 + 1)
    val top = AnnIngest.serveTopK(spark, root)
      .filter(col("q_id") === 0L && col("rk") === 1).head()
    assert(top.getLong(1) == 910000L && top.getDouble(3) == 1.0,
      s"the streamed clone must serve as q0's exact top neighbor: $top")
    // marker replay: same batchId is suppressed outright
    val batchDf = clone.toDF("vec_id", "embedding")
    assert(!AnnIngest.processBatch(batchDf, root, 0L))
    // even WITHOUT the marker (crash-between-commit-and-marker), the
    // upsert shape converges: re-appending the same ids adds no rows
    SimilarityQueries.appendToAnnIndex(batchDf, root)
    assert(SimilarityQueries.loadAnnIndex(spark, root)._1.count() == n1 + 1)
    // snapshots stay aligned across every append
    val vs = graft.operators.VersionedTable.versions(spark, s"$root/index")
    Seq("coarse", "cb").foreach { t =>
      assert(graft.operators.VersionedTable
        .versions(spark, s"$root/$t") == vs, s"misaligned $t")
    }
  }
}
