package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation — the exact
  * closure of a near-dup pair list into clusters (vs dedup_keep_min's
  * one-pass single-link approximation). Each iteration is one equi-join
  * + aggregation (label = min over self and neighbors); convergence in
  * O(cluster diameter) rounds, and near-dup clusters are shallow (a dup
  * family is a quasi-clique), so `maxIter` = 20 is generous.
  *
  * Iteration discipline (the 100 TB concerns for any driver loop):
  *  - each round's labels are eagerly localCheckpoint'ed, so lineage is
  *    truncated every round — the physical plan stays O(1) in the
  *    iteration count instead of nesting joins;
  *  - the previous label rides along in the same result, so the
  *    convergence check is a filter over the just-materialized
  *    checkpoint blocks, not a separate join recomputation — one real
  *    job per round;
  *  - non-convergence at maxIter is loudly logged instead of silently
  *    returning partially-propagated labels.
  */
object Components {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** edges: two long columns (a, b). Returns (node, component) for every
    * node appearing in an edge, component = min node id of its
    * connected component.
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val Seq(ca, cb) = edges.columns.toSeq.take(2).map(col)
    // bidirectional neighbor list — cached: every iteration joins against
    // it, and without the cache each round would recompute the (possibly
    // expensive) edge derivation upstream. Materialized once here,
    // released before returning.
    val nbrs = edges.select(ca.as("node"), cb.as("nbr"))
      .union(edges.select(cb.as("node"), ca.as("nbr")))
      .distinct()
      .cache()
    var labels = nbrs.select(col("node")).distinct()
      .withColumn("comp", col("node"))
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val nbrComp = nbrs
        .join(labels.withColumnRenamed("node", "nbr")
          .withColumnRenamed("comp", "nbr_comp"), "nbr")
        .groupBy(col("node")).agg(min(col("nbr_comp")).as("min_nbr_comp"))
      val next = labels.withColumnRenamed("comp", "old")
        .join(nbrComp, Seq("node"), "left")
        .select(col("node"), col("old"),
          least(col("old"), coalesce(col("min_nbr_comp"), col("old")))
            .as("comp"))
        .localCheckpoint(true)
      converged =
        next.filter(col("comp") =!= col("old")).limit(1).count() == 0L
      labels = next.select(col("node"), col("comp"))
      iter += 1
    }
    nbrs.unpersist()
    if (!converged)
      log.warn(s"connectedComponents: no convergence after $maxIter " +
        "iterations — labels may be partially propagated; raise maxIter")
    labels
  }
}
