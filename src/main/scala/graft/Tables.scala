package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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
    spark.read.parquet(s"$sfDir/$name.parquet")
}
