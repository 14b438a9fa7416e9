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
  *  - the link table (edge list with out-degree folded in by a
  *    map-side-combined groupBy + join on the source key) is cached
  *    once and released on exit — it is the loop's working set. Callers
  *    that iterate over the SAME graph repeatedly (q74/q153/q231's warm
  *    phase share the undirected trade graph) [[prepare]] the working
  *    set once and run [[pageRankOn]] against it, so the per-invocation
  *    cache fill + node count are paid once per session, not per entry
  *    (round 12; guide §2.4 — operations keyed the same way share the
  *    materialized working set).
  *
  * Dangling nodes (no out-edges) contribute no mass — their share is
  * dropped rather than redistributed, the common simplification when
  * ranks are used ordinally. Nodes with no in-edges receive exactly the
  * teleport mass (1-d)/N each round.
  */
object PageRank {

  /** Prepared power-iteration working set: the deg-joined link table,
    * the node table with its has-in-edge flag (ONE aggregation replaces
    * the previous separate nodes-distinct plus no-in anti-join — round
    * 12, two cache fills instead of three), and the node count scalar.
    * Both frames are persisted; the creator owns their lifecycle
    * ([[release]], or a session cache's evict).
    */
  final case class LinkGraph(links: DataFrame, nodeHasIn: DataFrame, n: Long)

  /** Build and pin the working set for `edges` (first two columns =
    * (src, dst)). One job: the nodeHasIn count materializes both caches.
    */
  def prepare(edges: DataFrame): LinkGraph = {
    val Seq(cs, cd) = edges.columns.toSeq.take(2).map(col)
    val raw = edges.select(cs.as("u"), cd.as("v"))
    // out-degree via map-side-combined groupBy + join, NOT a window
    // count: the unbounded window frame buffered one node's ENTIRE
    // out-edge list in a single task's sort — a power-law hub made that
    // a giant one-group sort+spill — where the groupBy pre-aggregates
    // each map partition to one row per node before its
    // (node-cardinality) shuffle, and the join back streams one deg row
    // per key. ONE cache (the joined links), not two: the deg branch
    // and the join branch read the same edge subtree, and any exchange
    // in its derivation (a join, a distinct) is a ReusedExchange
    // between them — measured 1.3 s faster per run at sf0.1 than
    // caching the raw edges separately.
    val deg = raw.groupBy(col("u"))
      .agg(count(lit(1)).cast("double").as("deg"))
    val links = raw.join(deg, "u").cache()
    // node table with the no-in-edge flag folded in: nodes with
    // has_in = 0 never receive gathered mass — a constant set, unioned
    // back at teleport mass each round instead of left-joining the full
    // node table per round
    val nodeHasIn = links.select(col("u"), lit(0).as("__in"))
      .unionByName(links.select(col("v").as("u"), lit(1).as("__in")))
      .groupBy(col("u")).agg(max(col("__in")).as("has_in")).cache()
    LinkGraph(links, nodeHasIn, nodeHasIn.count())
  }

  /** Unpersist a [[prepare]]d working set. */
  def release(g: LinkGraph): Unit = {
    g.links.unpersist()
    g.nodeHasIn.unpersist()
  }

  /** edges: first two columns = (src, dst). Returns (node, rank) for
    * every node incident to an edge, after `iters` full rounds from the
    * uniform start 1/N.
    *
    * `checkpointEvery`: rounds between localCheckpoint barriers. Each
    * round adds ONE join+agg layer against the static link table, so the
    * plan grows linearly (not exponentially like a self-join loop) and a
    * handful of un-checkpointed rounds fuse into a single Spark job —
    * short runs (the 3-round oracle query) execute as one plan, while
    * deep runs still truncate lineage every few rounds.
    */
  def pageRank(edges: DataFrame, iters: Int,
      damping: Double = 0.85, checkpointEvery: Int = 4,
      tol: Double = 0.0): DataFrame = {
    val g = prepare(edges)
    try pageRankOn(g, None, iters, damping, checkpointEvery, tol)
    finally release(g) // returned frame is checkpointed — lineage-free
  }

  /** Warm-started power iteration — the INCREMENTAL PageRank form: when
    * the graph gains a delta of edges, restart the iteration from the
    * previous snapshot's ranks instead of uniform 1/N. Power iteration
    * converges to the stationary vector from ANY start, and a
    * near-stationary start needs far fewer rounds to re-converge than
    * uniform (GraphSpec pins both: bit-exact continuation on an
    * unchanged graph — k rounds then m warm rounds IS k+m rounds — and
    * a post-delta warm start strictly closer to the converged ranks
    * than the same budget from cold). `initial` is (node, rank); nodes
    * new to the graph start at uniform 1/N, departed nodes' mass simply
    * stops circulating (the next rounds renormalize through teleport).
    * Per-round cost is identical to [[pageRank]] — one co-partitioned
    * join+agg against the cached link table.
    *
    * `tol` > 0 adds CONVERGENCE-based early stop — the point of a warm
    * start is fewer rounds, so a fixed round count leaves the payoff on
    * the table: after each round, stop once max |Δrank| < tol. `iters`
    * becomes the round BUDGET; tol = 0 (default) keeps the exact
    * fixed-round semantics every oracle pins.
    */
  def pageRankFrom(edges: DataFrame, initial: DataFrame, iters: Int,
      damping: Double = 0.85, checkpointEvery: Int = 4,
      tol: Double = 0.0): DataFrame = {
    val g = prepare(edges)
    try pageRankOn(g, Some(initial), iters, damping, checkpointEvery, tol)
    finally release(g)
  }

  /** The iteration itself, over a caller-owned [[LinkGraph]] (session-
    * cached callers pass the shared working set; [[pageRank]] /
    * [[pageRankFrom]] wrap it with a private prepare/release pair).
    * Never unpersists `g`.
    */
  def pageRankOn(g: LinkGraph, initial: Option[DataFrame], iters: Int,
      damping: Double = 0.85, checkpointEvery: Int = 4,
      tol: Double = 0.0): DataFrame = {
    val teleport = (1 - damping) / g.n
    val nodes = g.nodeHasIn.select(col("u"))
    val noIn = g.nodeHasIn.filter(col("has_in") === 0)
      .select(col("u")).withColumn("r", lit(teleport))
    var ranks = initial match {
      case None => nodes.withColumn("r", lit(1.0 / g.n))
      case Some(init) =>
        val Seq(inode, irank) = init.columns.toSeq.take(2).map(col)
        nodes.join(init.select(inode.as("u"), irank.as("__r0")),
            Seq("u"), "left")
          .select(col("u"), coalesce(col("__r0"), lit(1.0 / g.n)).as("r"))
    }
    var prev: DataFrame = null
    var i = 1
    var converged = false
    while (i <= iters && !converged) {
      var next = g.links.join(ranks, "u")
        .groupBy(col("v"))
        .agg(sum(col("r") / col("deg")).as("m"))
        .select(col("v").as("u"),
          (lit(teleport) + lit(damping) * col("m")).as("r"))
        .unionByName(noIn)
      // the final round ALWAYS checkpoints (the returned frame owns its
      // blocks, lineage-free — same contract as before); superseded
      // checkpoints are freed only after the newer one materializes.
      // With tol > 0 every round is a barrier: the convergence check
      // needs the round materialized anyway, and early stop exists to
      // run FEW rounds
      if (tol > 0.0 || i % checkpointEvery == 0 || i == iters) {
        // the check only matters strictly BEFORE the budget's last
        // round (the loop exits either way), and it rides the round's
        // own materialization: the previous ranks join into the
        // checkpointed frame itself, so "did this round move?" is one
        // shuffle-free agg over the checkpoint instead of a separate
        // two-sided join job per round (round 12 — q231 ran 2 such
        // jobs per warm round)
        if (tol > 0.0 && i < iters) {
          val withPrev = next
            .join(ranks.select(col("u"), col("r").as("__rp")), Seq("u"))
            .localCheckpoint(true)
          converged = withPrev
            .agg(max(abs(col("r") - col("__rp"))).as("d"))
            .head().getDouble(0) < tol
          next = withPrev.select(col("u"), col("r"))
          if (prev != null) ColumnBridge.unpersistCheckpoint(prev)
          prev = withPrev
        } else {
          next = next.localCheckpoint(true)
          if (prev != null) ColumnBridge.unpersistCheckpoint(prev)
          prev = next
        }
      }
      ranks = next
      i += 1
    }
    ranks.select(col("u").as("node"), col("r").as("rank"))
  }

  /** Personalized PageRank (random walk with restart): teleport mass
    * returns ONLY to the seed set, so ranks measure proximity to the
    * seeds — the recommender / similarity-search variant [Page et al.,
    * WWW'98 §6; Jeh & Widom, WWW'03]. Same per-round join+agg shape as
    * [[pageRank]] with two differences that keep it sparse: the rank
    * vector holds only REACHED nodes (it grows with the walk frontier,
    * not the graph), and each round ends with a two-term sum per node
    * (gathered mass + restart) instead of a dangling-node union —
    * adding two doubles is order-exact, so cross-engine parity needs no
    * extra discipline beyond the q74 round-to-9.
    */
  def personalizedPageRank(edges: DataFrame, seedNodes: DataFrame,
      iters: Int, damping: Double = 0.85): DataFrame = {
    val Seq(cs, cd) = edges.columns.toSeq.take(2).map(col)
    val raw = edges.select(cs.as("u"), cd.as("v"))
    val deg = raw.groupBy(col("u"))
      .agg(count(lit(1)).cast("double").as("deg"))
    val links = raw.join(deg, "u").cache()
    try personalizedPageRankOn(links, seedNodes, iters, damping)
    finally links.unpersist()
  }

  /** The walk itself, over a caller-owned (u, v, deg) link table —
    * session-cached callers (q153) pass [[LinkGraph.links]] so the
    * per-invocation link cache fill is paid once per session.
    */
  def personalizedPageRankOn(links: DataFrame, seedNodes: DataFrame,
      iters: Int, damping: Double = 0.85): DataFrame = {
    val seeds = seedNodes.select(col(seedNodes.columns.head).as("u"))
      .distinct().cache()
    val s = seeds.count().toDouble // one scalar to the driver
    val restart = (1 - damping) / s
    val tele = seeds.withColumn("r", lit(restart))
    var ranks = seeds.withColumn("r", lit(1.0 / s))
    var prev: DataFrame = null
    (1 to iters).foreach { i =>
      var next = links.join(ranks, "u")
        .groupBy(col("v"))
        .agg((lit(damping) * sum(col("r") / col("deg"))).as("r"))
        .select(col("v").as("u"), col("r"))
        .unionByName(tele)
        .groupBy(col("u")).agg(sum(col("r")).as("r"))
      if (i == iters) {
        next = next.localCheckpoint(true)
        if (prev != null) ColumnBridge.unpersistCheckpoint(prev)
        prev = next
      }
      ranks = next
    }
    seeds.unpersist()
    ranks.select(col("u").as("node"), col("r").as("rank"))
  }
}
