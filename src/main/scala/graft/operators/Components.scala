package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** Connected components over a near-dup pair list — the exact closure of
  * the pair graph into clusters (vs dedup_keep_min's one-pass single-link
  * approximation). Two strategies behind one signature:
  *
  *  1. Min-label propagation: one equi-join + aggregation per round
  *     (label = min over self and neighbors), converging in O(diameter)
  *     rounds. Near-dup clusters are shallow quasi-cliques, so this is
  *     the default path and almost always converges in a few rounds.
  *  2. Alternating large-star/small-star [Kiveris et al., "Connected
  *     Components in MapReduce and Beyond", SoCC'14]: O(log d) rounds on
  *     deep chain-shaped graphs. Chosen automatically when propagation
  *     has not converged after `PropagationThreshold` rounds — the
  *     escalation path for pathological deep clusters at 100 TB.
  *
  * Iteration discipline (the 100 TB concerns for any driver loop):
  *  - each round's state is eagerly localCheckpoint'ed, so lineage is
  *    truncated every round — the physical plan stays O(1) in the
  *    iteration count instead of nesting joins;
  *  - the PREVIOUS round's checkpoint blocks are unpersisted as soon as
  *    the next round is materialized, so at most two state snapshots are
  *    ever live (round 2 retained every round's blocks until session
  *    end). Cluster runs should swap localCheckpoint for a reliable
  *    `checkpoint` dir — local checkpoints don't survive executor loss;
  *  - the convergence check is a filter over the just-materialized
  *    blocks, not a separate recomputation — one real job per round;
  *  - non-convergence at maxIter is loudly logged instead of silently
  *    returning partially-propagated labels.
  */
object Components {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Propagation rounds before escalating to large-star/small-star. */
  private[graft] val PropagationThreshold = 8

  /** edges: two long columns (a, b). Returns (node, component) for every
    * node appearing in an edge, component = min node id of its connected
    * component. `maxIter` bounds the TOTAL rounds across both phases.
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val Seq(ca, cb) = edges.columns.toSeq.take(2).map(col)
    // bidirectional neighbor list — cached: every propagation round joins
    // against it; released before returning.
    val nbrs = edges.select(ca.as("node"), cb.as("nbr"))
      .union(edges.select(cb.as("node"), ca.as("nbr")))
      .distinct()
      .cache()
    var labels = nbrs.select(col("node")).distinct()
      .withColumn("comp", col("node"))
      .localCheckpoint(true)
    var prev: DataFrame = null
    var iter = 0
    var converged = false
    val propRounds = math.min(PropagationThreshold, maxIter)
    while (iter < propRounds && !converged) {
      // the snapshot superseded LAST round is freed before this round
      // materializes a new one → at most two live at any instant
      if (prev != null) { ColumnBridge.unpersistCheckpoint(prev); prev = null }
      val nbrComp = nbrs
        .join(labels.select(col("node").as("nbr"), col("comp").as("nbr_comp")),
          "nbr")
        .groupBy(col("node")).agg(min(col("nbr_comp")).as("min_nbr_comp"))
      val next = labels.select(col("node"), col("comp").as("old"))
        .join(nbrComp, Seq("node"), "left")
        .select(col("node"), col("old"),
          least(col("old"), coalesce(col("min_nbr_comp"), col("old")))
            .as("comp"))
        .localCheckpoint(true)
      converged =
        next.filter(col("comp") =!= col("old")).limit(1).count() == 0L
      prev = labels
      labels = next.select(col("node"), col("comp"))
      iter += 1
    }
    if (prev != null) ColumnBridge.unpersistCheckpoint(prev)
    if (converged) { nbrs.unpersist(); return labels }
    if (iter >= maxIter) {
      nbrs.unpersist()
      log.warn(s"connectedComponents: no convergence after $maxIter " +
        "iterations — labels may be partially propagated; raise maxIter")
      return labels
    }
    // Deep graph: propagation is crawling at O(diameter). Escalate to
    // the O(log d) star algorithm on the original edge list (the partial
    // labels are discarded — star rounds contract chains exponentially,
    // so restarting costs less than crawling on).
    log.info(s"connectedComponents: not converged after $iter propagation " +
      "rounds — escalating to large-star/small-star")
    ColumnBridge.unpersistCheckpoint(labels)
    nbrs.unpersist()
    starComponents(edges, maxIter - iter)
  }

  /** Alternating large-star/small-star [Kiveris et al. SoCC'14]. Each
    * round is two grouped-min + join passes over the (shrinking) edge
    * set; no per-node neighbor lists are ever collected, so a high-degree
    * hub costs a wide join fan-out but never a giant aggregation buffer.
    * Converges in O(log d) rounds to a forest of stars whose centers are
    * the component minima.
    */
  private[graft] def starComponents(edges: DataFrame,
      maxRounds: Int): DataFrame = {
    val Seq(ca, cb) = edges.columns.toSeq.take(2).map(col)
    val allNodes = edges.select(ca.as("node"))
      .union(edges.select(cb.as("node"))).distinct()
      .localCheckpoint(true)
    // parent-pointer edge set, oriented high→low, self-loops dropped
    var e = edges.select(greatest(ca, cb).as("a"), least(ca, cb).as("b"))
      .filter(col("a") =!= col("b")).distinct()
      .localCheckpoint(true)
    var prev: DataFrame = null
    var round = 0
    var converged = false
    while (round < maxRounds && !converged) {
      if (prev != null) { ColumnBridge.unpersistCheckpoint(prev); prev = null }
      // large-star: for each node u, m = min(N(u) ∪ {u}); every STRICTLY
      // LARGER neighbor v > u re-points to m. Computed as a grouped min
      // + join-back on the bidirectional view (no neighbor lists).
      val bi = e.select(col("a").as("u"), col("b").as("v"))
        .union(e.select(col("b").as("u"), col("a").as("v")))
      val mins = bi.groupBy(col("u"))
        .agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("mv"), col("u")).as("m"))
      val ls = bi.filter(col("v") > col("u"))
        .join(mins, "u")
        .select(col("v").as("a"), col("m").as("b"))
        .filter(col("a") =!= col("b")).distinct()
      // small-star: for each node a (edges already high→low), m = min of
      // its smaller neighbors; all of them plus a itself link to m.
      val sMins = ls.groupBy(col("a")).agg(min(col("b")).as("m"))
      val ss = ls.join(sMins, "a")
        .select(col("b").as("a"), col("m").as("b"))
        .union(sMins.select(col("a"), col("m").as("b")))
        .filter(col("a") =!= col("b")).distinct()
        .localCheckpoint(true)
      // converged when a round is a no-op (same parent-pointer set).
      // Both sides are distinct sets: equal counts + empty one-sided
      // difference ⇔ equality.
      val nNext = ss.count()
      converged = nNext == e.count() &&
        ss.exceptAll(e).limit(1).count() == 0L
      prev = e
      e = ss
      round += 1
    }
    if (prev != null) ColumnBridge.unpersistCheckpoint(prev)
    if (!converged)
      log.warn(s"starComponents: no convergence after $maxRounds rounds — " +
        "labels may be partially contracted; raise maxIter")
    else
      log.info(s"starComponents: converged in $round rounds")
    // converged edge set = (child, component-min) star pointers; roots
    // carry their own id.
    val out = allNodes
      .join(e.select(col("a").as("node"), col("b").as("parent")), Seq("node"),
        "left")
      .select(col("node"), coalesce(col("parent"), col("node")).as("comp"))
    out
  }
}
