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

  /** The q87 skew-profile diagnostic as a reusable primitive: the ≤
    * `topK` key values whose row count reaches `minCount`, most frequent
    * first. One map-side-combined aggregation; the result is driver-side
    * KB metadata (the IVF-centroid class), embedded downstream as a
    * literal so no extra join rides the mitigated plan.
    */
  def hotKeys(df: DataFrame, key: String, topK: Int = 20,
      minCount: Long = 1000L): Seq[Any] =
    df.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .orderBy(col("cnt").desc, col(key))
      .limit(topK)
      .collect().map(_.get(0)).toSeq

  /** [[saltedJoin]] with the diagnostic wired in: profile the left
    * side's hot keys first and salt ONLY those — cold keys join on salt
    * 0, so the right side is replicated `salts`× solely for the hot-key
    * rows instead of wholesale. This is the form to reach for when the
    * skew is data-dependent rather than known up front; with no key
    * above `minCount` it degenerates to the plain join (everything on
    * salt 0, zero replication). Same joinType restriction as
    * [[saltedJoin]] and for the same reason.
    */
  def saltedJoinAuto(left: DataFrame, right: DataFrame, key: String,
      salts: Int, joinType: String = "inner", topK: Int = 20,
      minCount: Long = 1000L): DataFrame = {
    require(salts > 0)
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti")(joinType.toLowerCase),
      s"saltedJoinAuto does not support joinType '$joinType': replicated " +
        "right rows would duplicate unmatched-right output")
    val hot = hotKeys(left, key, topK, minCount)
    val allSalts = array((0 until salts).map(i => lit(i.toLong)): _*)
    val (leftSalt, rightSalts) =
      if (hot.isEmpty) (lit(0L), array(lit(0L)))
      else (
        when(col(key).isin(hot: _*),
          pmod(xxhash64(left.columns.map(col).toIndexedSeq: _*), lit(salts)))
          .otherwise(lit(0L)),
        when(col(key).isin(hot: _*), allSalts).otherwise(array(lit(0L))))
    val saltedLeft = left.withColumn("_salt", leftSalt)
    val saltedRight = right.withColumn("_salt", explode(rightSalts))
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
