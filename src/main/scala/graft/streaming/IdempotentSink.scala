package graft.streaming

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.DataFrame

/** Exactly-once file sink for `foreachBatch` — the missing half of
  * end-to-end exactly-once streaming. The source side is handled by the
  * checkpoint (offsets + state, pinned by FileStreamSpec's recovery
  * test); the SINK side is this contract: after a failure Spark re-runs
  * the last micro-batch with the SAME batchId, so a sink that blindly
  * appends writes those rows twice. Here each batch lands in its own
  * `data/batch_id=<id>` directory and gains a commit marker only after
  * the write completes:
  *
  *  - replayed batchId with a marker → no-op (the exactly-once case);
  *  - crashed attempt (files, no marker) → the replay OVERWRITES the
  *    batch directory, so partial output never survives;
  *  - readers either see a batch's full output or none of it (check the
  *    marker for transactional reads; the data dir alone is already
  *    duplicate-free because overwrite replaces partials).
  *
  * Scale shape: one directory + one marker per micro-batch, both O(1)
  * metadata; the data write is Spark's normal distributed parquet write.
  * The batch_id=N layout doubles as hive-style partitioning, so readers
  * prune to recent batches for free. This is the same ledger design
  * table formats implement as transaction logs; built here directly on
  * the Hadoop FS contract (rename/create visibility), no format library.
  */
object IdempotentSink {

  /** foreachBatch body: `(df, batchId) => IdempotentSink.write(df, root,
    * batchId)`. Returns true if this call performed the write, false if
    * the batch was already committed (replay suppressed).
    */
  def write(df: DataFrame, root: String, batchId: Long): Boolean = {
    val fs = new Path(root).getFileSystem(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val marker = new Path(s"$root/_commits/batch-$batchId")
    if (fs.exists(marker)) return false
    df.write.mode("overwrite").parquet(s"$root/data/batch_id=$batchId")
    fs.mkdirs(marker.getParent)
    fs.create(marker, true).close()
    true
  }

  /** All committed output. Batches with data but no marker (crashed
    * attempts not yet replayed) are excluded — the transactional read.
    */
  def readCommitted(spark: org.apache.spark.sql.SparkSession,
      root: String): DataFrame = {
    val fs = new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val commits = new Path(s"$root/_commits")
    val ids =
      if (!fs.exists(commits)) Array.empty[Long]
      else fs.listStatus(commits)
        .map(_.getPath.getName.stripPrefix("batch-").toLong)
    val paths = ids.sorted.map(id => s"$root/data/batch_id=$id")
    if (paths.isEmpty) spark.emptyDataFrame
    else spark.read.option("basePath", s"$root/data").parquet(paths: _*)
  }
}
