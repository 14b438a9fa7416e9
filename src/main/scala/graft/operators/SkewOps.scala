package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual skew-mitigation operators (SURVEY.md §4 scale notes). Spark's
  * AQE handles sort-merge skew splitting at runtime; these are the
  * explicit forms for when the skew is known up front (a hot user_id, a
  * stop-shingle) or the join is hash-based:
  *
  *  - saltedJoin: scatter the skewed left side across `salts` synthetic
  *    sub-keys and replicate the right side once per salt — turns one
  *    hot partition into `salts` even ones at the cost of an
  *    `salts`-times-replicated (small) right side.
  *  - saltedSum: two-phase aggregation — partial sum on (key, salt),
  *    final sum on key. The hot key's rows spread over `salts` reducers
  *    in phase 1; phase 2 folds `salts` rows per key.
  *
  * Salt values are derived from xxhash64 of the whole left row — any
  * spread works; determinism keeps reruns identical.
  */
object SkewOps {

  /** Supported joinType: inner / left / left_outer / left_semi /
    * left_anti only. Right/full outer are rejected: the right side is
    * replicated once per salt, so every UNMATCHED right row would be
    * emitted `salts` times as duplicate null-extended output.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0)
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti")(joinType.toLowerCase),
      s"saltedJoin does not support joinType '$joinType': replicated " +
        "right rows would duplicate unmatched-right output")
    val saltedLeft = left.withColumn("_salt",
      pmod(xxhash64(left.columns.map(col).toIndexedSeq: _*), lit(salts)))
    val saltedRight = right
      .withColumn("_salt", explode(array((0 until salts).map(lit): _*)))
    saltedLeft.join(saltedRight,
        saltedLeft(key) === saltedRight(key) &&
          saltedLeft("_salt") === saltedRight("_salt"), joinType)
      .drop(saltedRight(key)).drop("_salt")
  }

  def saltedSum(df: DataFrame, key: String, valueCol: Column,
      salts: Int, resultName: String): DataFrame = {
    require(salts > 0)
    df.withColumn("_salt",
        pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(salts)))
      .groupBy(col(key), col("_salt"))
      .agg(sum(valueCol).as("_partial"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).as(resultName))
  }
}
