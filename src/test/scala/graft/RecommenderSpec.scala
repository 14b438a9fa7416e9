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
    baskets.map { case (c, _) =>
        (c, c, java.sql.Date.valueOf("2024-01-01")) }
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
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

  test("q154 basket cap: capped == uncapped when no basket exceeds it") {
    // sf0.001 baskets are all far below BasketCap (max 105 at sf0.1),
    // so the shipped cap must be a no-op on the oracle-checked data
    val bought = graft.Tables(spark, sf, "lineitem")
      .join(graft.Tables(spark, sf, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("cust"), col("l_partkey").as("part"))
      .agg(max(col("o_orderdate")).as("last"))
    val capped = graft.queries.RecommenderOps.alsoBoughtFrom(bought)
    val uncapped = graft.queries.RecommenderOps
      .alsoBoughtFrom(bought, basketCap = Int.MaxValue)
    assert(capped.except(uncapped).isEmpty
      && uncapped.except(capped).isEmpty,
      "BasketCap must not bind at test SF")
  }

  test("q154 whale basket contributes exactly C(cap,2) pairs") {
    // one whale customer with 40 parts, cap 10: the whale's pair volume
    // is bounded at C(10,2) = 45 — the quadratic worst case is capped.
    // A support-group of 3 normal customers shares the whale's 3 most
    // recent parts so the surviving pairs are known exactly.
    val whale = (1 to 40).map(p => (999L, p.toLong, java.sql.Date.valueOf(
      java.time.LocalDate.of(2024, 1, 1).plusDays(p))))
    // parts 38,39,40 are the whale's most recent → inside its cap
    val normals = for (c <- 1L to 3L; p <- Seq(38L, 39L, 40L))
      yield (c, p, java.sql.Date.valueOf("2024-01-01"))
    val bought = (whale ++ normals).toDF("cust", "part", "last")
    val out = graft.queries.RecommenderOps
      .alsoBoughtFrom(bought, basketCap = 10)
    // surviving pairs need support >= 3: only (38,39),(38,40),(39,40)
    // reach 4 buyers (3 normals + whale, whose cap keeps 31..40)
    val pairs = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((38L, 39L), (38L, 40L), (39L, 40L),
      (39L, 38L), (40L, 38L), (40L, 39L)))
    // and the capped whale basket itself: pair volume C(10,2), pinned
    // through the same plan with support 1 via a 3x-replicated whale
    val whales3 = (0L to 2L).flatMap(i => whale.map {
      case (_, p, dt) => (900L + i, p, dt) })
    val whaleOut = graft.queries.RecommenderOps
      .alsoBoughtFrom(whales3.toDF("cust", "part", "last"), basketCap = 10)
    // every pair among the 10 capped parts survives support 3; each
    // appears in both orientations but top-5 bounds neighbors per item
    val items = whaleOut.select("item").distinct().count()
    assert(items == 10, s"cap must keep exactly 10 parts, got $items")
    val perItem = whaleOut.groupBy("item").count().collect()
    assert(perItem.forall(_.getLong(1) == 5L),
      "each capped part ranks TopK=5 neighbors of the other 9")
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
