package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Text workloads over the `documents` table. Word count is the canonical
  * job of the reference framework (its MAP/SHUFFLE/REDUCE pipeline exists
  * to express exactly this — SURVEY.md §2.2, reference
  * `Worker/worker_v1.py:100-218`), here as one declarative plan:
  * scan → split → explode (flatMap ≙ MAP) → hash-partition on word
  * (≙ SHUFFLE) → partial+final count (≙ REDUCE, with the map-side combine
  * the reference lacks).
  */
object TextQueries {

  def wordcount(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "documents")
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q0_wordcount" -> (wordcount _)
  )

  def oracle: Map[String, String] = Map(
    "q0_wordcount" ->
      """SELECT word, COUNT(*) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |WHERE word <> '' GROUP BY word""".stripMargin
  )
}
