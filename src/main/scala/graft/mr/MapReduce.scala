package graft.mr

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** MR-core parity facade (SURVEY.md §2.1–2.2, Phase 1): the reference
  * engine's three verbs — WRITE, READ, MAPREDUCE — re-expressed on Spark
  * primitives, honoring the Hadoop-Streaming contract the reference
  * implements:
  *
  *  - a record is a text line; during MR it is a comma-separated
  *    `key,value` line, keyed on the first comma field (reference
  *    `Worker/worker_v1.py:133`; no comma → whole line is the key);
  *  - MAP = arbitrary line → 0..n lines (`Worker/worker_v1.py:113-116`);
  *  - SHUFFLE = hash-partition on key (`Worker/shuffler.py:6-10`,
  *    `Worker/worker_v1.py:124-153`) — here Spark's Exchange; any
  *    consistent hash preserves the co-location semantics;
  *  - pre-reduce SORT = lexicographic whole-line order within partition
  *    (`Worker/worker_v1.py:184-191`);
  *  - REDUCE = user fold over the sorted partition, keys contiguous
  *    (`Worker/worker_v1.py:196-199`).
  *
  * The typed relational surface (graft.queries) is the engine's real API;
  * this facade exists so every job the reference runs today has a literal
  * home, including external executable scripts via `rdd.pipe` (Spark's
  * own Hadoop-Streaming analogue). The pipe path leaves whole-stage
  * codegen — keep it for compatibility, not hot paths.
  */
object MapReduce {

  /** First-comma-field key, `Worker/worker_v1.py:133` semantics:
    * `line.split(',')[0]`, so a line with no comma keys on itself.
    */
  def keyOf(line: String): String = {
    val i = line.indexOf(',')
    if (i < 0) line else line.substring(0, i)
  }

  /** S1 WRITE: ingest a local text file into the DFS dir, split into
    * `partitions` chunks of CONTIGUOUS line ranges, chunk order = line
    * order — the reference splits by line count (`Client/client_v1.py:
    * 96-115`), so chunk k holds lines before chunk k+1's. Range-partition
    * on the global line index reproduces that: part-file name order IS
    * manifest order, and READ can reassemble the original file
    * byte-for-byte. (Empty chunks the reference pads are native here.)
    */
  /** Marker file recording that the source had NO trailing newline, so
    * `Cli -r` can reassemble byte-for-byte (text lines lose the final
    * newline's presence/absence at split time). Underscore-prefixed →
    * invisible to Spark file scans, like _SUCCESS.
    */
  private[graft] val NoTrailingNewline = "_no_trailing_newline"

  def write(spark: SparkSession, src: String, dfsDir: String,
      partitions: Int): Unit = {
    import spark.implicits._
    import org.apache.hadoop.fs.{FileUtil, Path}
    val conf = spark.sparkContext.hadoopConfiguration
    // Spark file listings treat dot/underscore-prefixed names as hidden
    // even when the path is given explicitly — a ".env" source would
    // silently scan as empty. Stage a visible copy beside the target.
    val srcPath = new Path(src)
    val hidden = { val n = srcPath.getName
      n.startsWith(".") || n.startsWith("_") }
    val staged = if (!hidden) None else {
      val stage = new Path(s"$dfsDir.staging-src")
      FileUtil.copy(srcPath.getFileSystem(conf), srcPath,
        stage.getFileSystem(conf), stage, false, true, conf)
      Some(stage)
    }
    val scanPath = staged.map(_.toString).getOrElse(src)
    try {
      spark.createDataset(spark.read.textFile(scanPath).rdd.zipWithIndex())
        .toDF("value", "idx")
        .repartitionByRange(partitions, col("idx"))
        .sortWithinPartitions("idx")
        .select("value")
        .write.mode("overwrite").text(dfsDir)
      if (!endsWithNewline(spark, scanPath)) {
        val marker = new Path(dfsDir, NoTrailingNewline)
        marker.getFileSystem(conf).create(marker, true).close()
      }
    } finally staged.foreach(p => p.getFileSystem(conf).delete(p, false))
  }

  /** True iff the source file's last byte is \n (empty files count as
    * newline-terminated: they roundtrip to empty). Hadoop FS API, so the
    * check works for any source the scan itself can read.
    */
  private def endsWithNewline(spark: SparkSession, src: String): Boolean = {
    val path = new org.apache.hadoop.fs.Path(src)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val len = fs.getFileStatus(path).getLen
    if (len == 0) true
    else {
      val in = fs.open(path)
      try { in.seek(len - 1); in.read() == '\n' }
      finally in.close()
    }
  }

  /** True iff `write` recorded that the dataset's source lacked a final
    * newline (datasets produced by MR output default to newline-
    * terminated, matching the text sink's own framing).
    */
  private[graft] def lacksTrailingNewline(spark: SparkSession,
      dfsDir: String): Boolean = {
    val marker = new org.apache.hadoop.fs.Path(dfsDir, NoTrailingNewline)
    marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .exists(marker)
  }

  /** S2 READ: gather a DFS dir back into one dataset of lines in
    * MANIFEST ORDER — part files in name order, lines within each file in
    * file order — matching the reference's chunk reassembly
    * (`Client/client_v1.py:172-175`), so a WRITE→READ roundtrip returns
    * the original line sequence. Ordering key: (file name, file block
    * offset, monotonically_increasing_id). The block offset matters when
    * a part file exceeds `files.maxPartitionBytes` and is split across
    * scan partitions: partition ids (the id's high bits) don't follow
    * file offset order, but `_metadata.file_block_start` does; within one
    * block the id is row-ordered, so the triple is total file order.
    */
  def read(spark: SparkSession, dfsDir: String): Dataset[String] = {
    import spark.implicits._
    spark.read.textFile(dfsDir)
      .select(col("value"), input_file_name().as("_f"),
        col("_metadata.file_block_start").as("_blk"),
        monotonically_increasing_id().as("_pos"))
      .orderBy(col("_f"), col("_blk"), col("_pos"))
      .select(col("value")).as[String]
  }

  /** D1 MAP: per-line transform with flatMap power (0..n output lines). */
  def mapLines(ds: Dataset[String])(
      mapper: String => IterableOnce[String]): Dataset[String] = {
    import ds.sparkSession.implicits._
    ds.flatMap(mapper)
  }

  /** D2+D3+D4: shuffle on the first-comma key, sort each partition
    * lexicographically, then stream each contiguous key group through the
    * reducer — the exact Hadoop contract, including whole-line value
    * order within a group. Implemented on the RDD layer because "reducer
    * sees the whole sorted partition as a stream" is genuinely
    * per-partition imperative logic.
    */
  /** Partitions on the key component only, so the composite (key, line)
    * sort key gives a secondary sort: keys contiguous, lines within a key
    * in whole-line lexicographic order — the order YaMR's pre-reduce
    * whole-line `sort()` produces for well-formed `key,value` lines.
    */
  private class KeyPartitioner(n: Int) extends org.apache.spark.Partitioner {
    def numPartitions: Int = n
    def getPartition(key: Any): Int = {
      val h = key.asInstanceOf[(String, String)]._1.hashCode
      ((h % n) + n) % n
    }
  }

  def reduceByLineKey(ds: Dataset[String], numPartitions: Int)(
      reducer: (String, Iterator[String]) => IterableOnce[String])
      : Dataset[String] = {
    val spark = ds.sparkSession
    import spark.implicits._
    val reduced = ds.rdd
      .map(line => ((keyOf(line), line), null))
      .repartitionAndSortWithinPartitions(new KeyPartitioner(numPartitions))
      .mapPartitions { it =>
        new Iterator[Iterator[String]] {
          private val buf = it.buffered
          def hasNext: Boolean = buf.hasNext
          def next(): Iterator[String] = {
            val key = buf.head._1._1
            val group = new Iterator[String] {
              def hasNext: Boolean = buf.hasNext && buf.head._1._1 == key
              def next(): String = buf.next()._1._2
            }
            val out = reducer(key, group).iterator
            // reducers that don't drain the group must not break framing
            new Iterator[String] {
              def hasNext: Boolean =
                if (out.hasNext) true else { while (group.hasNext) group.next(); false }
              def next(): String = out.next()
            }
          }
        }.flatten
      }
    spark.createDataset(reduced)
  }

  /** One whole MR round, closure form: MAP → SHUFFLE → SORT → REDUCE
    * (reference orchestration `Master/masterhandler.py:59-191`). Catalyst/
    * DAG scheduler provides the stage barriers the master hand-codes.
    */
  def mapReduce(input: Dataset[String],
      mapper: String => IterableOnce[String],
      reducer: (String, Iterator[String]) => IterableOnce[String],
      numPartitions: Int): Dataset[String] =
    reduceByLineKey(mapLines(input)(mapper), numPartitions)(reducer)

  /** One whole MR round, external-executable form — literal parity with
    * the reference's user contract (arbitrary stdin→stdout programs,
    * `Worker/worker_v1.py:113-116,196-199`), via `RDD.pipe`. The reducer
    * command receives its whole partition sorted, keys contiguous, exactly
    * like a Hadoop Streaming / YaMR reducer.
    */
  def mapReducePipe(input: Dataset[String], mapperCmd: String,
      reducerCmd: String, numPartitions: Int): Dataset[String] = {
    val spark = input.sparkSession
    import spark.implicits._
    val mapped = input.rdd.pipe(mapperCmd)
    val sorted = mapped.map(line => ((keyOf(line), line), null))
      .repartitionAndSortWithinPartitions(new KeyPartitioner(numPartitions))
      .map(_._1._2)
    spark.createDataset(sorted.pipe(reducerCmd))
  }
}
