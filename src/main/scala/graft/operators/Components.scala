package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation — the exact
  * closure of a near-dup pair list into clusters (vs dedup_keep_min's
  * one-pass single-link approximation). Each iteration is one equi-join
  * + aggregation (label = min over self and neighbors); convergence in
  * O(cluster diameter) rounds, and near-dup clusters are shallow (a dup
  * family is a quasi-clique), so `maxIter` = 10 is generous. The driver
  * loop's only action is the convergence check — labels stay
  * distributed.
  */
object Components {

  /** edges: two long columns (a, b). Returns (node, component) for every
    * node appearing in an edge, component = min node id of its
    * connected component.
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 10): DataFrame = {
    val spark = edges.sparkSession
    val Seq(ca, cb) = edges.columns.toSeq.take(2).map(col)
    // bidirectional neighbor list — cached: every iteration joins against
    // it, and without the cache each round would recompute the (possibly
    // expensive) edge derivation upstream. Materialized once here.
    val nbrs = edges.select(ca.as("node"), cb.as("nbr"))
      .union(edges.select(cb.as("node"), ca.as("nbr")))
      .distinct()
      .cache()
    nbrs.count()
    var labels = nbrs.select(col("node")).distinct()
      .withColumn("comp", col("node"))
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val nbrComp = nbrs
        .join(labels.withColumnRenamed("node", "nbr")
          .withColumnRenamed("comp", "nbr_comp"), "nbr")
        .groupBy(col("node")).agg(min(col("nbr_comp")).as("min_nbr_comp"))
      val next = labels.join(nbrComp, Seq("node"), "left")
        .select(col("node"),
          least(col("comp"), coalesce(col("min_nbr_comp"), col("comp")))
            .as("comp"))
        .cache()
      val changed = next.join(labels.withColumnRenamed("comp", "old"), "node")
        .filter(col("comp") =!= col("old")).limit(1).count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      iter += 1
    }
    labels
  }
}
