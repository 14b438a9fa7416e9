package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.DecimalType

/** Streaming incremental materialized-view maintenance — the q193 delta
  * rule (ΔMV = ΔOrders ⋈ Lineitem ⋈ Customer [Gupta & Mumick, IEEE DE
  * Bull. 1995]) run CONTINUOUSLY over an orders stream, composed with
  * [[IdempotentSink]] for end-to-end exactly-once:
  *
  *  - each micro-batch computes only its DELTA aggregate: the batch's
  *    orders join the (static/broadcastable) dimension sides and reduce
  *    to nation-cardinality rows — work proportional to the batch,
  *    never the accumulated history;
  *  - the delta lands in the sink ledger keyed by batchId, so a
  *    replayed batch after failure is suppressed by its commit marker
  *    (no double counting — THE incremental-MV correctness hazard);
  *  - the VIEW is the sum-merge of committed deltas (q101's
  *    aggregate-state merge), nation-cardinality × batches rows — KB
  *    metadata; a compaction pass can fold the ledger back to one row
  *    per nation at any time without changing the view.
  *
  * At 100 TB the same design holds because only aggregate STATE is ever
  * persisted per batch; a lakehouse deployment would swap the ledger
  * for a table-format MERGE, keeping the delta rule identical.
  */
object StreamingMv {

  private val dec = DecimalType(18, 4)

  /** One batch's view delta: ΔOrders ⋈ L ⋈ C → per-nation partial sums. */
  private[graft] def delta(orders: DataFrame, lineitem: DataFrame,
      customer: DataFrame): DataFrame =
    orders.select(col("o_orderkey"), col("o_custkey"))
      .join(lineitem.select(col("l_orderkey"), col("l_extendedprice")),
        col("o_orderkey") === col("l_orderkey"))
      .join(customer.select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"))
      .agg(sum(col("l_extendedprice").cast(dec)).as("rev"),
        count(lit(1)).as("n_lines"))

  /** Start maintaining the view from a streaming orders frame. */
  def maintain(orders: DataFrame, lineitem: DataFrame, customer: DataFrame,
      root: String): StreamingQuery =
    orders.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        IdempotentSink.write(delta(batch, lineitem, customer), root, id)
        ()
      }
      .start()

  /** The current view: sum-merge over committed deltas only (crashed
    * uncommitted attempts are invisible — the transactional read).
    */
  def view(spark: SparkSession, root: String): DataFrame =
    IdempotentSink.readCommitted(spark, root)
      .groupBy(col("c_nationkey"))
      .agg(round(sum(col("rev")), 4).cast("double").as("rev"),
        sum(col("n_lines")).as("n_lines"))

  /** Fold the ledger into a CHECKPOINT: the merged aggregate state as
    * of the ledger's current high-water batch becomes the next version
    * of a [[graft.operators.VersionedTable]] (atomic marker commit),
    * with the high-water mark stored alongside the state. The ledger is
    * NEVER mutated — compaction that deletes ledger batches has an
    * unsafe window between delete and rewrite; versioning the
    * checkpoint instead gives the Delta/Iceberg checkpoint-plus-log
    * structure from the engine's two existing commit-marker primitives.
    * State stays DECIMAL so checkpoint + tail re-merge is exact.
    * Returns the committed version (-1 for an empty ledger).
    */
  def compact(spark: SparkSession, ledger: String, table: String): Long = {
    val deltas = IdempotentSink.readCommitted(spark, ledger)
    if (deltas.isEmpty) return -1L
    // partition discovery types batch_id as INT for small ids
    val hwm = deltas.agg(max(col("batch_id"))).head()
      .getAs[Number](0).longValue
    val state = deltas.groupBy(col("c_nationkey"))
      .agg(sum(col("rev")).as("rev"), sum(col("n_lines")).as("n_lines"))
      .withColumn("hwm", lit(hwm))
    graft.operators.VersionedTable.write(state, table)
  }

  /** The view through the newest checkpoint plus only the ledger TAIL
    * above its high-water mark — reads KB of checkpoint state plus
    * batches-since-compaction instead of the whole ledger. Falls back
    * to the pure ledger view when nothing is compacted yet. Equals
    * [[view]] exactly (decimal state merges associatively).
    */
  def viewCompacted(spark: SparkSession, ledger: String, table: String)
    : DataFrame = {
    if (graft.operators.VersionedTable.versions(spark, table).isEmpty)
      return view(spark, ledger)
    val base = graft.operators.VersionedTable.read(spark, table)
    val hwm = base.agg(max(col("hwm"))).head().getAs[Number](0).longValue
    val tail = IdempotentSink.readCommitted(spark, ledger)
      .filter(col("batch_id") > hwm)
      .select(col("c_nationkey"), col("rev"), col("n_lines"))
    base.select(col("c_nationkey"), col("rev"), col("n_lines"))
      .unionByName(tail)
      .groupBy(col("c_nationkey"))
      .agg(round(sum(col("rev")), 4).cast("double").as("rev"),
        sum(col("n_lines")).as("n_lines"))
  }
}
