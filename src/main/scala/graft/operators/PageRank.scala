package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** Fixed-iteration PageRank [Brin & Page, WWW'98] over a directed edge
  * list — the canonical iterative MapReduce workload (each round IS one
  * map-shuffle-reduce: scatter rank/deg along edges, gather by target).
  *
  * Per round: one equi-join of the edge list against the current rank
  * vector (both hash-partitioned on the source key — co-partitioned after
  * round 1, so AQE reuses the exchange side) + one aggregation keyed on
  * the target. Nothing is ever collected to the driver except the node
  * count (one scalar).
  *
  * Iteration discipline matches [[Components]] — the 100 TB concerns for
  * any driver loop:
  *  - each round's rank vector is eagerly localCheckpoint'ed → the plan
  *    stays O(1) in the iteration count;
  *  - the superseded round's blocks are unpersisted as soon as the next
  *    is materialized → at most two rank snapshots live at any instant
  *    (cluster runs: swap for a reliable `checkpoint` dir);
  *  - the edge list and out-degree table are cached once and released on
  *    exit — they are the loop's working set.
  *
  * Dangling nodes (no out-edges) contribute no mass — their share is
  * dropped rather than redistributed, the common simplification when
  * ranks are used ordinally. Nodes with no in-edges receive exactly the
  * teleport mass (1-d)/N each round.
  */
object PageRank {

  /** edges: first two columns = (src, dst). Returns (node, rank) for
    * every node incident to an edge, after `iters` full rounds from the
    * uniform start 1/N.
    */
  def pageRank(edges: DataFrame, iters: Int,
      damping: Double = 0.85): DataFrame = {
    val Seq(cs, cd) = edges.columns.toSeq.take(2).map(col)
    val e = edges.select(cs.as("u"), cd.as("v"))
    val deg = e.groupBy(col("u"))
      .agg(count(lit(1)).cast("double").as("deg"))
    // the loop's working set, built ONCE: out-degree pre-joined into the
    // link table (saves a join per round) — cached post-shuffle, so each
    // round's join against the rank vector reuses its partitioning
    val links = e.join(deg, "u").cache()
    val nodes = e.select(col("u"))
      .union(e.select(col("v").as("u"))).distinct().cache()
    val n = nodes.count().toDouble // one scalar to the driver
    val teleport = (1 - damping) / n
    // nodes with NO in-edges never receive gathered mass — a constant
    // set, computed once; each round unions it back at teleport mass
    // instead of left-joining the full node table per round
    val noIn = nodes
      .join(e.select(col("v").as("u")).distinct(), Seq("u"), "left_anti")
      .withColumn("r", lit(teleport)).cache()
    var ranks = nodes.withColumn("r", lit(1.0 / n)).localCheckpoint(true)
    var prev: DataFrame = null
    (1 to iters).foreach { _ =>
      if (prev != null) { ColumnBridge.unpersistCheckpoint(prev); prev = null }
      val next = links.join(ranks, "u")
        .groupBy(col("v"))
        .agg(sum(col("r") / col("deg")).as("m"))
        .select(col("v").as("u"),
          (lit(teleport) + lit(damping) * col("m")).as("r"))
        .unionByName(noIn)
        .localCheckpoint(true)
      prev = ranks
      ranks = next
    }
    if (prev != null) ColumnBridge.unpersistCheckpoint(prev)
    links.unpersist(); nodes.unpersist(); noIn.unpersist()
    ranks.select(col("u").as("node"), col("r").as("rank"))
  }
}
