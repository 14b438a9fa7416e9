package graft

import org.apache.spark.sql.functions._

class RecommenderSpec extends SparkSpec {
  import spark.implicits._

  test("q154 also-bought: hand-computed cosine, support threshold, top-k") {
    // customers 1..4 all buy parts 10+20 (support 4); part 30 rides with
    // 10+20 for three of them (support 3); part 40 appears once (pruned)
    val baskets = Seq(
      (1L, Seq(10L, 20L, 30L)), (2L, Seq(10L, 20L, 30L)),
      (3L, Seq(10L, 20L, 30L)), (4L, Seq(10L, 20L, 40L)))
    val dir = java.nio.file.Files.createTempDirectory("graft-cf").toString
    // one order per customer, one line per part
    baskets.map { case (c, _) => (c, c) }.toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    baskets.flatMap { case (c, ps) => ps.map(p => (c, p)) }
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = graft.queries.RecommenderOps
      .queries("q154_also_bought")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getLong(4)))).toMap
    // n(10)=n(20)=4, n(30)=3; sim(10,20)=4/4=1, sim(10,30)=3/sqrt(12)
    val s13 = BigDecimal(3.0 / math.sqrt(12.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got((10L, 20L)) == ((4L, 1.0, 1L)))
    assert(got((10L, 30L)) == ((3L, s13, 2L)))
    assert(got((30L, 10L)) == ((3L, s13, 1L)))
    // part 40 never reaches support 3: absent on both orientations
    assert(!got.keySet.exists { case (a, b) => a == 40L || b == 40L })
    // every item lists at most TopK neighbors, ranks contiguous from 1
    got.keys.groupBy(_._1).foreach { case (item, ks) =>
      val rks = ks.map(k => got(k)._3).toSeq.sorted
      assert(rks == (1L to rks.length), s"ranks broken for $item: $rks")
      assert(rks.length <= 5)
    }
  }

  test("q154 pair explode stays basket-bounded (co-partitioned equi-join)") {
    val df = graft.queries.RecommenderOps
      .queries("q154_also_bought")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct")
      && !p.contains("BroadcastNestedLoopJoin"),
      s"pair generation must join on the customer key:\n$p")
  }
}
