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
  def write(spark: SparkSession, src: String, dfsDir: String,
      partitions: Int): Unit = {
    import spark.implicits._
    spark.createDataset(spark.read.textFile(src).rdd.zipWithIndex())
      .toDF("value", "idx")
      .repartitionByRange(partitions, col("idx"))
      .sortWithinPartitions("idx")
      .select("value")
      .write.mode("overwrite").text(dfsDir)
  }

  /** S2 READ: gather a DFS dir back into one dataset of lines in
    * MANIFEST ORDER — part files in name order, lines within each file in
    * file order — matching the reference's chunk reassembly
    * (`Client/client_v1.py:172-175`), so a WRITE→READ roundtrip returns
    * the original line sequence. Ordering key: (input file name,
    * monotonically_increasing_id); the id is correct within-file as long
    * as no part file is split across scan partitions (part files are
    * line-count chunks, far under `files.maxPartitionBytes`).
    */
  def read(spark: SparkSession, dfsDir: String): Dataset[String] = {
    import spark.implicits._
    spark.read.textFile(dfsDir)
      .select(col("value"), input_file_name().as("_f"),
        monotonically_increasing_id().as("_pos"))
      .orderBy(col("_f"), col("_pos"))
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
