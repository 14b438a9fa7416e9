package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated parquet tables (see TESTDATA.md).
  *
  * The reference engine's "catalog" is a JSON map of logical file name →
  * chunk locations (reference `Master/masterhandler.py:209-213`); here the
  * catalog is simply the directory-of-parquet convention that Spark's
  * datasource API already understands — names resolve to
  * `<sfDir>/<name>.parquet`.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    normalize(spark.read.parquet(s"$sfDir/$name.parquet"))

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects; sessions set spark.sql.legacy.parquet.nanosAsLong
    * so it arrives as epoch-nanos LongType — normalize to a timestamp.
    * Integer `div` (not /): ns epoch values exceed double's 2^53 exact
    * range, and floor-to-microsecond matches DuckDB's ns→us truncation.
    * Exposed so the readStream twin applies the identical rewrite.
    */
  def normalize(df: DataFrame): DataFrame =
    df.schema.find(f => f.name == "ts" && f.dataType == LongType) match {
      case Some(_) => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case None => df
    }

  /** Session config required to read all TESTDATA tables (nanos-timestamp
    * handling for `events`). Apply on every SparkSession this engine uses.
    */
  val requiredConf: Map[String, String] =
    Map("spark.sql.legacy.parquet.nanosAsLong" -> "true")
}
