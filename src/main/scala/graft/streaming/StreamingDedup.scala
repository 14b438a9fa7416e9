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
    * writes). The corpus read goes through [[corpusView]], so a
    * compacted ledger serves the checkpoint + tail instead of every
    * historical batch directory.
    */
  def processBatch(batch: DataFrame, root: String, batchId: Long): Boolean = {
    val spark = batch.sparkSession
    val fs = new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new Path(s"$root/_commits/batch-$batchId"))) return false
    val keepers = DedupQueries.dedupAgainstCorpus(
      batch.select(col("doc_id"), col("text"), col("lang"), col("source")),
      corpusView(spark, root))
    IdempotentSink.write(keepers, root, batchId)
  }

  /** Checkpoint table root: the StreamingMv compaction recipe applied
    * to the dedup corpus — the ledger is NEVER mutated; compaction
    * versions a full-corpus snapshot beside it.
    */
  private def compactTable(root: String): String = s"$root/_compacted"

  /** Fold the committed ledger into the next VersionedTable snapshot
    * (full corpus + high-water batch id). Subsequent [[corpusView]]
    * reads serve the snapshot plus only ledger batches ABOVE the mark —
    * at a production batch cadence this bounds the per-batch corpus
    * read to one compacted table + the recent tail instead of thousands
    * of batch directories. Returns the committed version (-1 when the
    * ledger is empty).
    */
  def compact(spark: SparkSession, root: String): Long = {
    val all = IdempotentSink.readCommitted(spark, root)
    if (all.isEmpty) return -1L
    val hwm = all.agg(max(col("batch_id"))).head().getAs[Number](0)
      .longValue
    graft.operators.VersionedTable.write(
      all.select(col("doc_id"), col("text"), col("lang"), col("source"))
        .withColumn("hwm", lit(hwm)),
      compactTable(root))
  }

  /** The committed corpus (doc_id, text): newest compacted snapshot +
    * ledger tail above its high-water mark, or the pure ledger when
    * nothing is compacted yet. Equals the full-ledger read exactly.
    */
  def corpusView(spark: SparkSession, root: String): DataFrame = {
    val table = compactTable(root)
    if (graft.operators.VersionedTable.versions(spark, table).isEmpty)
      return IdempotentSink.readCommitted(spark, root)
        .select(col("doc_id"), col("text"))
    val base = graft.operators.VersionedTable.read(spark, table)
    val hwm = base.agg(max(col("hwm"))).head().getAs[Number](0).longValue
    base.select(col("doc_id"), col("text"))
      .unionByName(IdempotentSink.readCommitted(spark, root)
        .filter(col("batch_id") > hwm)
        .select(col("doc_id"), col("text")))
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
