package graft

import java.sql.Date

import org.apache.spark.sql.functions.col

import graft.queries.SqlSurface

/** The ANSI-completion operators: subquery decorrelation plan pins and
  * gap-fill semantics on crafted gappy inputs (the driver oracle covers
  * value correctness on the real tables; these pin the parts the oracle
  * can't see — plan shape and behavior on data the tables don't contain).
  */
class SqlSurfaceSpec extends SparkSpec {

  private def executedPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("q96 EXISTS decorrelates to a semi join, never a nested loop") {
    val p = executedPlan("q96_exists_subquery")
    assert(p.contains("LeftSemi"), s"EXISTS must become a semi join:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"decorrelation must not fall back to cartesian:\n$p")
    // the correlated date predicate (l_shipdate > o_orderdate + 60d) can
    // only live in a non-equi join condition, not a post-filter: a
    // BroadcastNestedLoop would mean decorrelation failed
    assert(!p.contains("BroadcastNestedLoop"),
      s"correlated predicate must ride the equi semi join:\n$p")
  }

  test("q116 NOT EXISTS decorrelates to an anti join, never a nested loop") {
    val p = executedPlan("q116_not_exists")
    assert(p.contains("LeftAnti"), s"NOT EXISTS must become an anti join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"decorrelation must not fall back to cartesian/BNLJ:\n$p")
  }

  test("q115 multiset set ops preserve duplicate counts") {
    import spark.implicits._
    // multiset semantics on crafted bags: {1,1,2,3} except_all {1,2} =
    // {1,3}; intersect_all = {1,2} — the distinct forms would lose the
    // second 1
    val a = Seq(1, 1, 2, 3).toDF("nk")
    val b = Seq(1, 2).toDF("nk")
    val ex = a.exceptAll(b).collect().map(_.getInt(0)).sorted.toSeq
    val in = a.intersectAll(b).collect().map(_.getInt(0)).sorted.toSeq
    assert(ex == Seq(1, 3) && in == Seq(1, 2))
  }

  test("q97 scalar subquery decorrelates to one aggregate + join") {
    val p = executedPlan("q97_scalar_subquery")
    assert(!p.contains("CartesianProduct")
      && !p.contains("BroadcastNestedLoop"),
      s"per-part average must be a decorrelated aggregate:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      s"expected the decorrelated per-part aggregate in the plan:\n$p")
  }

  test("q98 unpivot lowers to Expand — a narrow 4x expansion, no shuffle") {
    val p = executedPlan("q98_unpivot").split("== Initial Plan ==").head
    assert(p.contains("Expand"), s"unpivot should lower to Expand:\n$p")
    // one exchange total: the 4-group aggregation; the expansion itself
    // must not repartition
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1,
      s"unpivot must stay narrow before the aggregation:\n$p")
  }

  test("share-of-total: shares sum to 1 per region and globally") {
    val rows = SparkEntry.queries("q110_share_of_total")(spark, sf)
      .collect().map(r => (r.getString(0), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (region, rs) =>
      val s = rs.map(_._2).sum
      assert(math.abs(s - 1.0) < 1e-4, s"$region region shares sum to $s")
    }
    val g = rows.map(_._3).sum
    assert(math.abs(g - 1.0) < 1e-4, s"world shares sum to $g")
  }

  test("gap fill restores silent days with zeros inside each type's range") {
    import spark.implicits._
    val ev = Seq(
      // type a: days 1, 4 observed -> 2, 3 are gaps
      ("a", Date.valueOf("2024-03-01"), 10.0),
      ("a", Date.valueOf("2024-03-01"), 5.0),
      ("a", Date.valueOf("2024-03-04"), 2.0),
      // type b: single day -> no gaps, range of one
      ("b", Date.valueOf("2024-03-02"), 7.0))
      .toDF("event_type", "day", "value")
    val got = SqlSurface.gapFill(ev)
      .orderBy(col("event_type"), col("day"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2),
        r.getDouble(3), r.getLong(4)))
      .toList
    assert(got == List(
      ("a", "2024-03-01", 2L, 15.0, 2L),
      ("a", "2024-03-02", 0L, 0.0, 2L),
      ("a", "2024-03-03", 0L, 0.0, 2L),
      ("a", "2024-03-04", 1L, 2.0, 3L),
      ("b", "2024-03-02", 1L, 7.0, 1L)), got.toString)
  }

  test("gap-fill grid join broadcasts the day grid, no cartesian") {
    val df = SparkEntry.queries("q99_gap_fill")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"),
      s"the day grid must come from per-group sequence(), not a cross join:\n$p")
  }

  test("q147 lateral top-2 equals the window-ranked twin") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("q147_lateral_topk")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    val want = Tables(spark, sf, "customer")
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
      .join(Tables(spark, sf, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("c_custkey"), col("c_acctbal")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == want, s"lateral vs window: only-lateral=" +
      s"${(got -- want).take(3)} only-window=${(want -- got).take(3)}")
    // every nation contributes at most 2 rows
    got.groupBy(_._1).foreach { case (n, rs) =>
      assert(rs.size <= 2, s"nation $n has ${rs.size} rows") }
  }
  test("q227 GROUP BY ALL equals the explicit grouped aggregation") {
    import org.apache.spark.sql.functions._
    val got = SqlSurface.queries("q227_group_by_all")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    val want = Tables(spark, sf, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
          .as("qty"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }
}
