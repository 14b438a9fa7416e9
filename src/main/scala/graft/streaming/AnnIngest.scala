package graft.streaming

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.SimilarityQueries

/** CONTINUOUS embedding ingest into the served ANN index — the
  * composition of [[SimilarityQueries.appendToAnnIndex]] (encode with
  * the index's existing quantizers, commit ONLY the encoded delta as a
  * fragment version — O(batch) rows written per micro-batch, never a
  * corpus rewrite) with the exactly-once micro-batch discipline:
  *
  *  - a commit marker per batchId suppresses replays BEFORE any work
  *    (the IdempotentSink contract applied to index maintenance);
  *  - reads shade on vec_id with newest-fragment-wins
  *    ([[SimilarityQueries.loadAnnIndex]]), so even a crash BETWEEN
  *    the fragment commit and the marker write converges on replay
  *    instead of duplicating vectors — the marker is an optimization,
  *    the shading is the correctness;
  *  - [[SimilarityQueries.compactAnnIndex]] folds a grown fragment
  *    chain back into one full snapshot (the LSM flush/compact split);
  *  - queries keep serving throughout: a reader holds whatever snapshot
  *    version it loaded (snapshot isolation), and the next load sees
  *    the newest committed index.
  *
  * Retrain (a fresh `persistAnnIndex` when codebook drift accumulates)
  * is an offline decision outside this path — exactly FAISS's add()
  * vs train() split, run continuously.
  */
object AnnIngest {

  private def marker(root: String, batchId: Long) =
    new Path(s"$root/_ingest_commits/batch-$batchId")

  /** `foreachBatch` body: append `batch` (vec_id, embedding) to the
    * index at `root` under this batchId. Returns false when the batch
    * was already committed.
    */
  def processBatch(batch: DataFrame, root: String, batchId: Long): Boolean = {
    val spark = batch.sparkSession
    val fs = marker(root, batchId).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val m = marker(root, batchId)
    if (fs.exists(m)) return false
    SimilarityQueries.appendToAnnIndex(
      batch.select("vec_id", "embedding"), root)
    fs.mkdirs(m.getParent)
    fs.create(m, true).close()
    true
  }

  /** Wire an embedding stream (vec_id, embedding) into the index at
    * `root`; returns the started query.
    */
  def attach(vecs: DataFrame, root: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    vecs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        processBatch(batch, root, id); ()
      }
      .start()

  /** Serve the newest committed index (convenience for entries/specs). */
  def serveTopK(spark: SparkSession, root: String): DataFrame = {
    val (indexed, arts) = SimilarityQueries.loadAnnIndex(spark, root)
    SimilarityQueries.annIvfPqFrom(indexed, arts)
  }
}
