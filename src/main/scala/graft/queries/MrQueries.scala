package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.mr.MapReduce

/** The canonical reference workload (word count) run through the MR-parity
  * facade — proves the WRITE/MAP/SHUFFLE/SORT/REDUCE verbs reproduce the
  * reference's semantics and hash-match the same SQL oracle as the
  * declarative plan (q0_wordcount).
  */
object MrQueries {

  /** The line protocol keys on the text before the first comma (faithful
    * to the reference), so a token CONTAINING a comma would be truncated
    * and conflated with other tokens. The mapper percent-escapes the
    * token ("%" → "%25", "," → "%2C") and the output parse reverses it,
    * keeping mr_wordcount equal to q0_wordcount on any corpus.
    */
  private[graft] def escKey(w: String): String =
    w.replace("%", "%25").replace(",", "%2C")

  private[graft] def unescKey(c: Column): Column =
    regexp_replace(regexp_replace(c, "%2C", ","), "%25", "%")

  /** Word count via mapLines + reduceByLineKey over `key,value` text lines,
    * exactly as a YaMR user would write it (mapper emits `word,1`; reducer
    * folds each contiguous sorted group).
    */
  def mrWordcount(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val lines = Tables(s, d, "documents").select(col("text"))
      .as[String]
    val out = MapReduce.mapReduce(
      lines,
      mapper = line => line.split(" ").iterator
        .filter(_.nonEmpty).map(w => s"${escKey(w)},1"),
      reducer = (key, values) => Iterator(s"$key,${values.size}"),
      numPartitions = s.sparkContext.defaultParallelism.max(4))
    // parse `word,count` lines back to typed columns for the oracle compare
    out.select(
      unescKey(split(col("value"), ",", 2).getItem(0)).as("word"),
      split(col("value"), ",", 2).getItem(1).cast("long").as("n"))
  }

  /** The graft-dfs DataSourceV2 connector driven end-to-end: documents'
    * text written through the DSv2 sink in doc order (orderBy produces
    * the range partitioning, each partition = one chunk), read back
    * through the connector, summarized per chunk. FS side effects →
    * rows-only for the driver; DfsSourceSpec pins byte-order,
    * append/truncate, pruning, and MR-READ interop.
    */
  def dfsRoundtrip(s: SparkSession, d: String): DataFrame = {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-dfs-q").toString + "/store"
    Tables(s, d, "documents")
      .orderBy(col("doc_id"))
      .select(col("text").as("value"))
      .write.format("graft-dfs").mode("overwrite").save(tmp)
    s.read.format("graft-dfs").load(tmp)
      .groupBy(col("chunk_id"))
      .agg(count(lit(1)).as("n_lines"),
        sum(length(col("value"))).as("n_chars"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mr_wordcount" -> (mrWordcount _),
    "dfs_roundtrip" -> (dfsRoundtrip _)
  )

  def oracle: Map[String, String] = Map(
    "mr_wordcount" ->
      """SELECT word, COUNT(*) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |WHERE word <> '' GROUP BY word""".stripMargin
  )
}
