package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-free global rank without the single-partition window.
  *
  * `row_number() OVER (ORDER BY ...)` with no PARTITION BY moves the whole
  * relation into one task — the canonical scale-killer (WindowExec warns
  * about it). The distributed equivalent is the classic two-phase rank:
  *
  *   1. range-repartition on the sort keys (Spark's RangePartitioner
  *      samples boundaries per input partition with a fixed per-index
  *      seed, so the layout is deterministic for a given input),
  *   2. rank locally inside each range partition,
  *   3. add each partition's exclusive prefix count, computed from the
  *      partition-count-sized size table (bounded metadata — the ONLY
  *      single-partition window runs over ≤ numShufflePartitions rows)
  *      and broadcast back.
  *
  * The result equals the single-partition `row_number` whenever the key
  * tuple is globally unique (callers append a tiebreaker id — same
  * contract as any deterministic sort). Used by q160's sorted-neighborhood
  * linkage; reference analogue: the reference's WRITE path assigns global
  * chunk order on the master (`Master/masterhandler.py:209-213`) — here
  * the order is computed distributively instead of on the coordinator.
  */
object GlobalRank {

  /** Append a 1-based dense global row number named `rankCol`, ordered by
    * `keys` (which must be unique as a tuple for a deterministic result).
    */
  def withRank(df: DataFrame, rankCol: String, keys: Column*): DataFrame = {
    // EAGERLY checkpoint the ranged layout: the rank branch and the
    // offsets branch below both consume it, and without pinning ONE
    // materialization each branch re-runs the range exchange with a
    // fresh RDD id — RangePartitioner seeds its boundary sampling from
    // that id, so the two branches can disagree on partition boundaries
    // and the __gr_pid equi-join silently drops/duplicates rows
    // (observed at the 10× smoke: 77k of 150k rows survived, count
    // varying run to run; the driver gates passed only because AQE's
    // ReusedExchange happened to collapse the branches there).
    val ranged = df.repartitionByRange(keys: _*)
      .withColumn("__gr_pid", spark_partition_id())
      .localCheckpoint(true)
    val local = ranged.withColumn("__gr_lrn",
      row_number().over(
        Window.partitionBy(col("__gr_pid")).orderBy(keys: _*)))
    // partition sizes: one row per shuffle partition — bounded metadata
    val offsets = ranged.groupBy(col("__gr_pid")).count()
      .withColumn("__gr_off",
        coalesce(
          sum(col("count")).over(
            Window.orderBy(col("__gr_pid"))
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__gr_pid").as("__gr_opid"), col("__gr_off"))
    local.join(broadcast(offsets), col("__gr_pid") === col("__gr_opid"))
      .withColumn(rankCol, col("__gr_lrn") + col("__gr_off"))
      .drop("__gr_pid", "__gr_lrn", "__gr_opid", "__gr_off")
  }
}
