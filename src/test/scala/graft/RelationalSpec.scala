package graft

import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {

  test("every query runs at sf0.001 and has stable schema") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, s"$name has no columns")
      assert(df.count() >= 0, s"$name failed to execute")
    }
  }

  test("q44 top-k aggregation equals the q6 window form exactly") {
    val cols = Seq("l_returnflag", "l_orderkey", "l_linenumber",
      "l_extendedprice", "rk")
    val viaWindow = SparkEntry.queries("q6_topk_per_key")(spark, sf)
      .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSet
    val viaAgg = SparkEntry.queries("q44_topk_agg")(spark, sf)
      .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSet
    assert(viaAgg == viaWindow && viaAgg.nonEmpty)
  }

  test("entry (flagship wordcount) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query has an oracle or declared rows-only provenance") {
    // SparkEntry.rowsOnlyProvenance is the single source of truth for
    // "no oracle by design": every oracle-less entry must name its
    // pinning spec there (Verify dumps the same map + row counts to
    // rows_only.json), and no oracle-CHECKED entry may claim rows-only
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing == SparkEntry.rowsOnlyProvenance.keySet,
      s"undeclared rows-only: ${missing -- SparkEntry.rowsOnlyProvenance.keySet}; " +
        s"stale provenance: ${SparkEntry.rowsOnlyProvenance.keySet -- missing}")
    // mr_wordcount is oracle-checked; keep the provenance suite names
    // honest — each must be a real spec class on the test classpath
    SparkEntry.rowsOnlyProvenance.values.toSet.foreach { (s: String) =>
      assert(Class.forName(s"graft.$s") != null, s"unknown spec $s")
    }
  }

  test("q1_agg matches a hand-computed fold") {
    val li = Tables(spark, sf, "lineitem")
      .select("l_returnflag", "l_linestatus", "l_quantity").collect()
    val expected = li.groupBy(r => (r.getString(0), r.getString(1)))
      .view.mapValues(rs => (rs.map(_.getDouble(2)).sum, rs.length)).toMap
    val got = SparkEntry.queries("q1_agg")(spark, sf)
      .select("l_returnflag", "l_linestatus", "sum_qty", "count_order")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getLong(3).toInt)).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (k, (sq, n)) =>
      assert(math.abs(sq - expected(k)._1) < 1e-6, s"sum_qty for $k")
      assert(n == expected(k)._2, s"count for $k")
    }
  }

  test("q6_topk_per_key keeps exactly k per key with correct ordering") {
    val rows = SparkEntry.queries("q6_topk_per_key")(spark, sf).collect()
    val byKey = rows.groupBy(_.getString(0))
    byKey.foreach { case (_, rs) =>
      assert(rs.length <= 3)
      val prices = rs.sortBy(_.getInt(rs.head.fieldIndex("rk")))
        .map(_.getDouble(rs.head.fieldIndex("l_extendedprice")))
      assert(prices.sameElements(prices.sortBy(-(_: Double))))
    }
    // every kept price must be >= the max price excluded for that key
    val li = Tables(spark, sf, "lineitem")
      .groupBy("l_returnflag").agg(max("l_extendedprice").as("mx"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    byKey.foreach { case (k, rs) =>
      assert(rs.map(_.getDouble(rs.head.fieldIndex("l_extendedprice"))).max
        == li(k))
    }
  }

  test("partition-count invariance: q1_agg result independent of partitions") {
    val base = SparkEntry.queries("q1_agg")(spark, sf)
    val repartitioned = Tables(spark, sf, "lineitem").repartition(13)
    repartitioned.createOrReplaceTempView("li13")
    val alt = spark.table("li13")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("count_order"))
    val a = base.select("l_returnflag", "l_linestatus", "count_order")
      .collect().map(_.toSeq).toSet
    val b = alt.collect().map(_.toSeq).toSet
    assert(a == b)
  }
}
