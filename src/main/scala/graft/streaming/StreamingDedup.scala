package graft.streaming

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.DedupQueries

/** CONTINUOUS incremental near-dedup — the composition of q92's batch
  * delta-vs-corpus dedup with the exactly-once streaming machinery: a
  * training-data pipeline doesn't dedup once, it dedups every arriving
  * snapshot against everything already ingested.
  *
  * Per micro-batch (`foreachBatch` body):
  *
  *   1. read the COMMITTED corpus ledger (IdempotentSink layout —
  *      crashed attempts invisible, each batch's keepers in their own
  *      `batch_id=N` directory);
  *   2. route the batch through [[DedupQueries.dedupAgainstCorpus]] —
  *      exact md5 anti-join, then the bipartite inverted shingle-index
  *      join (delta-bounded on one side: the corpus never self-joins);
  *   3. land the surviving keepers (WITH text, so they become corpus
  *      for the next batch) via [[IdempotentSink.write]].
  *
  * Exactly-once: a replayed batchId hits the commit marker and is
  * suppressed BEFORE any work — replay cannot double-ingest, and a
  * crashed attempt's partial directory is overwritten on retry. The
  * corpus a batch deduped against is always a PREFIX of committed
  * batches (batches are processed serially per stream), so the keeper
  * set is deterministic for a given batch order.
  *
  * Scale shape: per batch the join volume is |delta| × df-bounded
  * postings — the q92 argument unchanged; the ledger read prunes to
  * (doc_id, text) columns; at production scale the ledger is compacted
  * periodically (StreamingMv's checkpoint-compaction recipe applies
  * verbatim, the batch_id partitioning making old batches cheap to
  * fold). Reference analogue: the reference's MR pipeline re-runs
  * over the whole corpus per delivery (`Master/masterhandler.py`
  * schedules full jobs); here each delivery costs only its delta.
  */
object StreamingDedup {

  /** Ledger batch id used for the initial corpus snapshot. */
  val SeedBatchId: Long = -1L

  /** Seed the committed-corpus ledger with an initial snapshot
    * (doc_id, text, lang, source). Idempotent per the sink contract.
    */
  def seed(corpus: DataFrame, root: String): Boolean =
    IdempotentSink.write(corpus, root, SeedBatchId)

  /** `foreachBatch` body: dedup `batch` against the committed corpus at
    * `root` and land keepers under this batchId. Returns false when the
    * batch was already committed (replay suppressed — no reads, no
    * writes).
    */
  def processBatch(batch: DataFrame, root: String, batchId: Long): Boolean = {
    val spark = batch.sparkSession
    val fs = new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new Path(s"$root/_commits/batch-$batchId"))) return false
    val corpus = IdempotentSink.readCommitted(spark, root)
      .select(col("doc_id"), col("text"))
    val keepers = DedupQueries.dedupAgainstCorpus(
      batch.select(col("doc_id"), col("text"), col("lang"), col("source")),
      corpus)
    IdempotentSink.write(keepers, root, batchId)
  }

  /** Wire a document stream (doc_id, text, lang, source) into the
    * dedup-gated ledger at `root`; returns the started query. The
    * checkpoint carries source offsets; the ledger carries the
    * exactly-once output half.
    */
  def attach(docs: DataFrame, root: String, checkpoint: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        processBatch(batch, root, id); ()
      }
      .start()

  /** All committed keepers EXCLUDING the seed snapshot: what the stream
    * itself ingested (the q92 analogue over the ledger).
    */
  def ingested(spark: SparkSession, root: String): DataFrame =
    IdempotentSink.readCommitted(spark, root)
      .filter(col("batch_id") =!= SeedBatchId)
      .select(col("doc_id"), col("lang"), col("source"), col("batch_id"))
}
