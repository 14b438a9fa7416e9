package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf

/** Optimizer rule: trade exact COUNT(DISTINCT x) for HyperLogLog++.
  *
  * An exact distinct count is the classic 100 TB scale trap: Spark
  * plans it as a two-phase Expand/re-shuffle (or, with several distinct
  * aggregates, an N-way Expand multiplying the scan — the q158 profiler
  * lesson), and the shuffle carries every DISTINCT VALUE of the
  * column. `approx_count_distinct` replaces that with a fixed-size
  * mergeable HLL sketch per group — one map-side-combined pass, error
  * bounded by the configured relative standard deviation — but
  * rewriting every call site by hand is invasive and query authors
  * forget.
  *
  * This rule performs the swap AUTOMATICALLY on the logical plan when
  * `spark.graft.approxCountDistinct.rsd` is set to a positive relative
  * standard deviation (e.g. 0.05): every single-column
  * `Count(... , isDistinct = true)` inside an Aggregate becomes
  * `HyperLogLogPlusPlus(child, rsd)`. FILTER clauses are preserved
  * (the AggregateExpression's filter rides along); multi-column
  * `COUNT(DISTINCT a, b)` is left exact (HLL++ is single-child —
  * hash the tuple yourself if you want it sketched). Unset (the
  * default) the rule is inert, so the exact semantics remain the
  * correctness gate everywhere — the same conf-gated-twin discipline
  * as [[RangeJoinRewrite]] and the q47/q112 percentile pair.
  *
  * Registered through [[graft.GraftExtensions]] (injectOptimizerRule)
  * or `spark.experimental.extraOptimizations`. ApproxRewriteSpec pins:
  * plan flips to approx_count_distinct, estimate within rsd bounds of
  * exact, plain COUNT and COUNT(DISTINCT a, b) untouched, rule inert
  * without the conf.
  */
object ApproxDistinctRewrite extends Rule[LogicalPlan] {

  val RsdKey = "spark.graft.approxCountDistinct.rsd"

  private def rsd: Option[Double] = {
    val s = SQLConf.get.getConfString(RsdKey, "")
    if (s.isEmpty) None
    else
      try { val v = s.toDouble; if (v > 0) Some(v) else None }
      catch { case _: NumberFormatException => None }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = rsd match {
    case None => plan
    case Some(r) =>
      plan.transformUp {
        case agg: Aggregate =>
          agg.transformExpressions {
            case ae @ AggregateExpression(Count(Seq(child)), _, true, _, _) =>
              ae.copy(
                aggregateFunction = HyperLogLogPlusPlus(child, r),
                isDistinct = false)
          }
      }
  }
}
