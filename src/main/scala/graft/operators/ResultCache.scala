package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Content-addressed QUERY RESULT CACHE — the warehouse result-reuse
  * verb (Snowflake's persisted query results, BigQuery's cached
  * results): a repeated query is served from its stored result instead
  * of recomputing the plan, and any change to the inputs invalidates
  * the entry automatically because it changes the key.
  *
  * The key is a digest of
  *  - the CANONICALIZED optimized logical plan (exprIds normalized, so
  *    two syntactically different but plan-identical queries share an
  *    entry), and
  *  - an input fingerprint: every input file's (path, length, mtime).
  *    A rewritten/appended input changes the fingerprint → new key →
  *    recompute; the stale entry is simply never addressed again (GC
  *    by prefix age is a directory sweep, not implemented here).
  *    At production scale key on table SNAPSHOT VERSIONS (one number
  *    per table — the VersionedTable lineage) instead of file listings;
  *    the file form is the general fallback for plain directories.
  *
  * Storage reuses the commit-marker recipe ([[VersionedTable]]): the
  * result parquet is staged under `data/<key>/` first and the marker
  * `_commits/<key>` is created last with `overwrite = false`, so a
  * crashed writer leaves an invisible orphan and two racing writers of
  * the same key cannot both win — the loser serves the winner's
  * (identical) result.
  *
  * Non-deterministic plans (rand(), current_timestamp()) are REFUSED:
  * caching one would freeze a value the query contract says varies.
  * ResultCacheSpec pins: second call serves without re-executing the
  * plan (side-effect counter), input mutation invalidates, equivalent
  * plans share an entry, non-deterministic plans are rejected, parquet
  * round-trip preserves the result.
  */
object ResultCache {

  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The cache key for `df` under its current inputs. */
  def keyOf(df: DataFrame): String = {
    val plan = df.queryExecution.optimizedPlan
    require(plan.find(p => p.expressions.exists(
        e => e.find(!_.deterministic).isDefined)).isEmpty,
      "refusing to cache a non-deterministic plan")
    val spark = df.sparkSession
    val f = fs(spark, "/")
    val inputs = df.inputFiles.sorted.map { p =>
      val st = f.getFileStatus(new Path(p))
      s"$p:${st.getLen}:${st.getModificationTime}"
    }
    java.security.MessageDigest.getInstance("MD5")
      .digest((plan.canonicalized.toString + inputs.mkString("\n"))
        .getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  /** Serve `df`'s result from the cache under `root`, computing and
    * committing it on the first miss. Returns (result, hit?).
    */
  def cached(df: DataFrame, root: String): (DataFrame, Boolean) = {
    val spark = df.sparkSession
    val key = keyOf(df)
    val f = fs(spark, root)
    val marker = new Path(root, s"_commits/$key")
    val dataDir = new Path(root, s"data/$key")
    if (f.exists(marker)) (spark.read.parquet(dataDir.toString), true)
    else {
      df.write.mode("overwrite").parquet(dataDir.toString)
      f.mkdirs(marker.getParent)
      try { f.create(marker, false).close() }
      catch { case _: java.io.IOException => () } // racer won; same bytes
      (spark.read.parquet(dataDir.toString), false)
    }
  }
}
