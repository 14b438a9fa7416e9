package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Remaining ANSI-surface completions a reference user migrating real
  * workloads would reach for — each a thin, oracle-checked pin over a
  * Catalyst feature the earlier families didn't touch:
  *
  *  - q115 EXCEPT ALL / INTERSECT ALL: multiset set ops (q17 covered
  *    the distinct forms) — duplicate counts preserved, the semantics
  *    bag-algebra pipelines rely on. Planned as aggregate+generate
  *    (count-difference replication), one shuffle per side.
  *  - q116 NOT EXISTS: the anti-join half of q96's decorrelation
  *    surface (TPC-H Q22 shape) — Catalyst rewrites to LEFT ANTI join.
  *  - q117 percentile_disc: DISCRETE percentiles (WITHIN GROUP ORDER BY
  *    syntax) — returns an actual data value, so cross-engine equality
  *    is EXACT, no interpolation rounding needed (contrast q47).
  *  - q118 regexp_extract_all: the bulk-extraction regex surface (q58's
  *    scrub covers replace; this covers extract) — narrow, codegen'd.
  *  - q119 filtered/boolean aggregates: count_if + bool_and/bool_or
  *    (DuckDB: FILTER clause + same-named aggs).
  *  - q120 value window functions: first/last/nth_value under EXPLICIT
  *    ROWS frames (q32/q62 covered rank/offset fns; value fns with
  *    asymmetric frames are the remaining third of the window surface).
  *  - q121 grouping flags: GROUPING()/GROUPING_ID() over rollup — how
  *    consumers distinguish "NULL because subtotal" from "NULL in the
  *    data"; without it q18's rollup output is ambiguous.
  *  - q128 distribution window functions: cume_dist / percent_rank /
  *    ntile — the rank-normalizing third of the window surface (q62
  *    covered ordinal ranks). Ratios of per-partition integer ranks:
  *    identical ints → identical doubles, so cross-engine exact.
  *
  * All seven are oracle-checked (hash-compared against DuckDB). Scale
  * shapes are inherited from the families they complete: bounded-key
  * aggregations, per-group windows, narrow scans.
  */
object SurfaceCompletions {

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map[String, (SparkSession, String) => DataFrame](
      "q115_setops_all" -> ((s, d) => {
        val cn = Tables(s, d, "customer").select(col("c_nationkey").as("nk"))
        val sn = Tables(s, d, "supplier").select(col("s_nationkey").as("nk"))
        cn.exceptAll(sn).withColumn("op", lit("except_all"))
          .union(cn.intersectAll(sn).withColumn("op", lit("intersect_all")))
      }),

      "q116_not_exists" -> ((s, d) => {
        Tables(s, d, "customer")
          .createOrReplaceTempView("graft_q116_customer")
        Tables(s, d, "orders").createOrReplaceTempView("graft_q116_orders")
        val df = s.sql(notExistsSqlOn("graft_q116_customer",
          "graft_q116_orders"))
        s.catalog.dropTempView("graft_q116_customer")
        s.catalog.dropTempView("graft_q116_orders")
        df
      }),

      "q117_percentile_disc" -> ((s, d) =>
        Tables(s, d, "orders")
          .groupBy(col("o_orderpriority"))
          .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)")
            .as("p50_disc"),
            expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY o_totalprice)")
              .as("p90_disc"),
            count(lit(1)).as("n"))),

      "q118_regexp_extract" -> ((s, d) =>
        Tables(s, d, "documents")
          .select(col("doc_id"),
            expr("regexp_extract_all(text, '([a-z]{5,})', 1)").as("m"))
          .select(col("doc_id"),
            size(col("m")).as("n_long_words"),
            size(array_distinct(col("m"))).as("n_distinct"),
            coalesce(get(col("m"), lit(0)), lit("")).as("first_match"))),

      "q119_filtered_aggs" -> ((s, d) =>
        Tables(s, d, "events")
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            expr("count_if(value > 100)").as("n_big"),
            bool_and(col("value") >= 0).as("all_nonneg"),
            bool_or(col("value") > 500).as("any_huge"))),

      "q120_value_window_fns" -> ((s, d) => {
        val base = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val running = base.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)
        val ahead = base.rowsBetween(Window.currentRow,
          Window.unboundedFollowing)
        val full = base.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)
        Tables(s, d, "events")
          .select(col("event_id"), col("user_id"), col("ts"), col("value"))
          .withColumn("first_v", first_value(col("value")).over(running))
          .withColumn("last_v", last_value(col("value")).over(ahead))
          .withColumn("second_v", nth_value(col("value"), 2).over(full))
          .drop("ts")
      }),

      "q121_grouping_id" -> ((s, d) =>
        Tables(s, d, "lineitem")
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"),
            grouping(col("l_returnflag")).cast("long").as("g_rf"),
            grouping(col("l_linestatus")).cast("long").as("g_ls"),
            grouping_id().cast("long").as("gid"))),

      "q128_distribution_fns" -> ((s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        Tables(s, d, "events")
          .select(col("event_id"), col("user_id"), col("ts"), col("value"))
          .withColumn("cd", cume_dist().over(w))
          .withColumn("pr", percent_rank().over(w))
          .withColumn("quartile", ntile(4).over(w).cast("long"))
          .drop("ts")
      }))

  /** q116: TPC-H Q22 shape — positive-balance customers with NO
    * high-value order (every customer in the test data has SOME order,
    * so the correlated subquery carries its own predicate — the
    * decorrelation still rewrites to a LEFT ANTI join, now with the
    * pushed-down price filter on the build side). One text, two
    * engines (the q96/q97 discipline).
    */
  def notExistsSqlOn(customer: String, orders: String): String =
    s"""SELECT c_mktsegment, COUNT(*) AS n_cust,
      |  CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,4))), 4) AS DOUBLE)
      |    AS total_bal
      |FROM $customer
      |WHERE c_acctbal > 0
      |  AND NOT EXISTS (SELECT 1 FROM $orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_totalprice > 300000)
      |GROUP BY c_mktsegment""".stripMargin

  def oracle: Map[String, String] = Map(
    "q115_setops_all" ->
      """SELECT nk, 'except_all' AS op FROM
        |  (SELECT c_nationkey AS nk FROM customer
        |   EXCEPT ALL
        |   SELECT s_nationkey FROM supplier)
        |UNION ALL
        |SELECT nk, 'intersect_all' AS op FROM
        |  (SELECT c_nationkey AS nk FROM customer
        |   INTERSECT ALL
        |   SELECT s_nationkey FROM supplier)""".stripMargin,
    "q116_not_exists" -> notExistsSqlOn("customer", "orders"),
    "q117_percentile_disc" ->
      """SELECT o_orderpriority,
        |  quantile_disc(o_totalprice, 0.5) AS p50_disc,
        |  quantile_disc(o_totalprice, 0.9) AS p90_disc,
        |  COUNT(*) AS n
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q118_regexp_extract" ->
      """SELECT doc_id,
        |  CAST(len(m) AS INTEGER) AS n_long_words,
        |  CAST(len(list_distinct(m)) AS INTEGER) AS n_distinct,
        |  COALESCE(m[1], '') AS first_match
        |FROM (SELECT doc_id, regexp_extract_all(text, '[a-z]{5,}') AS m
        |      FROM documents)""".stripMargin,
    "q119_filtered_aggs" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(COUNT(*) FILTER (WHERE value > 100) AS BIGINT) AS n_big,
        |  bool_and(value >= 0) AS all_nonneg,
        |  bool_or(value > 500) AS any_huge
        |FROM events GROUP BY event_type""".stripMargin,
    "q120_value_window_fns" ->
      """SELECT event_id, user_id, value,
        |  first_value(value) OVER wr AS first_v,
        |  last_value(value) OVER wa AS last_v,
        |  nth_value(value, 2) OVER wf AS second_v
        |FROM events
        |WINDOW
        |  wr AS (PARTITION BY user_id ORDER BY ts, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  wa AS (PARTITION BY user_id ORDER BY ts, event_id
        |         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING),
        |  wf AS (PARTITION BY user_id ORDER BY ts, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"""
        .stripMargin,
    "q121_grouping_id" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
        |  CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "q128_distribution_fns" ->
      """SELECT event_id, user_id, value,
        |  cume_dist() OVER w AS cd,
        |  percent_rank() OVER w AS pr,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)"""
        .stripMargin)
}
