package graft

import org.apache.spark.sql.functions._

import graft.operators.PageRank

class GraphSpec extends SparkSpec {

  test("pageRank matches hand-computed ranks on a 3-node chain") {
    import spark.implicits._
    // 1 <-> 2 <-> 3 (undirected): deg(1) = deg(3) = 1, deg(2) = 2
    val ce = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val edges = ce.select(col("a").as("u"), col("b").as("v"))
      .union(ce.select(col("b").as("u"), col("a").as("v")))
    val got = PageRank.pageRank(edges, 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    // manual 2 rounds, d = 0.85, n = 3, r0 = 1/3 each
    val n = 3.0; val d = 0.85; val t = (1 - d) / n
    val r0 = Map(1L -> 1 / n, 2L -> 1 / n, 3L -> 1 / n)
    def round(r: Map[Long, Double]): Map[Long, Double] = Map(
      1L -> (t + d * r(2L) / 2),
      2L -> (t + d * (r(1L) + r(3L))),
      3L -> (t + d * r(2L) / 2))
    val want = round(round(r0))
    want.foreach { case (k, v) =>
      assert(math.abs(got(k) - v) < 1e-12, s"node $k: ${got(k)} vs $v")
    }
    // masses: total = 1 minus nothing (no dangling nodes here)
    assert(math.abs(got.values.sum - 1.0) < 1e-12)
  }

  test("pageRank gives in-edge-less nodes exactly the teleport mass") {
    import spark.implicits._
    // directed: 1 -> 2, no edge into 1
    val edges = Seq((1L, 2L)).toDF("u", "v")
    val got = PageRank.pageRank(edges, 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(got(1L) - 0.15 / 2) < 1e-12)
  }

  test("pageRank leaves at most two checkpoint snapshots live") {
    import spark.implicits._
    val ce = (1L to 50L).map(i => (i, i % 10 + 100L)).toDF("a", "b")
    val edges = ce.select(col("a").as("u"), col("b").as("v"))
      .union(ce.select(col("b").as("u"), col("a").as("v")))
    val before = spark.sparkContext.getPersistentRDDs.size
    PageRank.pageRank(edges, 5).collect()
    val after = spark.sparkContext.getPersistentRDDs.size
    // the final checkpoint stays (the result refers to it); the loop's
    // intermediates and the cached working set must be gone
    assert(after <= before + 1,
      s"leaked persisted RDDs: before=$before after=$after")
  }

  test("triangle enumeration counts each triangle once on a known graph") {
    import spark.implicits._
    // K4 minus edge (c,d): triangles abc, abd — a,b in 2; c,d in 1
    val ef = Seq(("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"))
      .toDF("w1", "w2")
    val tri = ef.as("e1")
      .join(ef.as("e2"), col("e1.w2") === col("e2.w1"))
      .join(ef.as("e3"), col("e3.w1") === col("e1.w1")
        && col("e3.w2") === col("e2.w2"))
      .select(col("e1.w1").as("a"), col("e1.w2").as("b"),
        col("e2.w2").as("c"))
    assert(tri.count() == 2)
    val counts = tri
      .select(explode(array(col("a"), col("b"), col("c"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("a" -> 2L, "b" -> 2L, "c" -> 1L, "d" -> 1L))
  }

  test("q77 narrow pair expansion equals the self-join pair set") {
    import spark.implicits._
    val docs = Seq((1L, "c a b a"), (2L, "b d")).toDF("doc_id", "text")
    val narrow = docs
      .withColumn("ws", array_sort(array_distinct(split(col("text"), " "))))
      .select(explode(expr(
        "flatten(transform(ws, (x, i) ->" +
          " transform(slice(ws, i + 2, size(ws))," +
          " y -> struct(x AS w1, y AS w2))))")).as("p"))
      .select(col("p.w1"), col("p.w2"))
      .collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    assert(narrow == Seq(("a", "b"), ("a", "c"), ("b", "c"), ("b", "d")))
  }

  test("bellman-ford finds the cheap 3-hop path over the expensive shortcut") {
    import spark.implicits._
    // 1→2→3→4 costs 1 each; shortcuts 1→3 (5.0) and 2→4 (10.0) lose
    val edges = Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (1L, 3L, 5.0),
      (3L, 4L, 1.0), (2L, 4L, 10.0), (5L, 1L, 1.0)).toDF("u", "v", "w")
    val seeds = Seq((1L, 0.0)).toDF("node", "dist")
    val got = graft.queries.GraphQueries.bellmanFord(edges, seeds, 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // node 5 has no in-path from the seed and must stay unreached
    assert(got == Map(1L -> 0.0, 2L -> 1.0, 3L -> 2.0, 4L -> 3.0))
    // converged: a 4th round changes nothing
    val again = graft.queries.GraphQueries.bellmanFord(edges, seeds, 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(again == got)
  }

  test("personalized pagerank matches hand-computed restart walk on a 2-cycle") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("u", "v")
    val seeds = Seq(Tuple1(1L)).toDF("node")
    val got = graft.operators.PageRank
      .personalizedPageRank(edges, seeds, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // r1 = {1: .15, 2: .85}; r2 = {1: .8725, 2: .1275};
    // r3 = {1: .85*.1275+.15, 2: .85*.8725}
    assert(math.abs(got(1L) - 0.258375) < 1e-12)
    assert(math.abs(got(2L) - 0.741625) < 1e-12)
    // restart keeps total mass at 1 on a strongly connected component
    assert(math.abs(got.values.sum - 1.0) < 1e-12)
  }

  test("q146 majority label: modal nation wins, ties break to smallest key") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-lpa").toString
    Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L), (5L, 5L))
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // supplier 10 hears nations {5, 5, 7}; supplier 11 ties {9, 3}
    Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 11L), (5L, 11L))
      .toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((1L, 5L), (2L, 5L), (3L, 7L), (4L, 9L), (5L, 3L))
      .toDF("c_custkey", "c_nationkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val got = graft.queries.GraphQueries
      .queries("q146_majority_label")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == Map(10L -> ((5L, 2L)), 11L -> ((3L, 1L))))
  }

  test("q141 shortest paths on driver data: seeds at zero, monotone frontier") {
    val rows = graft.queries.GraphQueries
      .queries("q141_shortest_path")(spark, sf).collect()
    assert(rows.nonEmpty)
    val byKind = rows.groupBy(_.getString(1))
    // bipartite: even nodes are customers, odd are suppliers
    rows.foreach { r =>
      val even = r.getLong(0) % 2 == 0
      assert(if (even) r.getString(1) == "customer"
             else r.getString(1) == "supplier")
    }
    // seeds (dist 0) are customers; every supplier needed an odd hop count
    val zero = rows.filter(_.getDouble(2) == 0.0)
    assert(zero.nonEmpty && zero.forall(_.getString(1) == "customer"))
    assert(byKind("supplier").forall(_.getDouble(2) > 0.0))
  }

  test("q161 HITS matches hand-computed hubs/authorities on a tiny graph") {
    import spark.implicits._
    // c1 → {s1, s2}, c2 → {s1}: auth1 = (2,1); hub1 = (3,2);
    // auth2 = (5,3); hub2 = (8,5) → authority (0.625, 0.375),
    // hub (8/13, 5/13)
    val dir = java.nio.file.Files.createTempDirectory("graft-hits").toString
    Seq((10L, 1L), (20L, 1L), (30L, 2L))
      .toDF("o_orderkey", "o_custkey")
      .write.parquet(s"$dir/orders.parquet")
    Seq((10L, 101L), (20L, 102L), (30L, 101L))
      .toDF("l_orderkey", "l_suppkey")
      .write.parquet(s"$dir/lineitem.parquet")
    val got = graft.queries.GraphQueries.queries("q161_hits")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSet
    def r9(x: Double): Double =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Set(
      ("authority", 101L, 0.625), ("authority", 102L, 0.375),
      ("hub", 1L, r9(8.0 / 13)), ("hub", 2L, r9(5.0 / 13))))
  }

  test("q191 clustering coefficient: a crafted triangle is a clique") {
    import spark.implicits._
    // tokens a,b,c co-occur in both docs (co=2 >= 0.62*2 keeps the
    // edge); d co-occurs once with each -> below threshold, no edges.
    // The graph is exactly the triangle a-b-c: deg 2, one triangle,
    // coefficient 2*1/(2*1) = 1 at every node.
    val dir = java.nio.file.Files.createTempDirectory("graft-cc").toString
    Seq((1L, "a b c d"), (2L, "a b c")).toDF("doc_id", "text")
      .write.parquet(s"$dir/documents.parquet")
    val got = graft.queries.GraphQueries
      .queries("q191_clustering_coeff")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(got == Set(("a", 2L, 1L, 1.0), ("b", 2L, 1L, 1.0),
      ("c", 2L, 1L, 1.0)))
  }

  test("q192 k-core: the pendant customer peels, K3,3 survives at deg 3") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-kcore").toString
    // complete bipartite customers {1,2,3} x suppliers {10,11,12}, plus
    // pendant customer 4 on supplier 10: round 1 peels customer 4
    // (deg 1 < 3) which drops supplier 10 from deg 4 to 3; rounds 2-3
    // are stable — all six core nodes survive at exactly degree 3
    val orders = (for {c <- 1 to 3; p <- 10 to 12}
      yield ((c * 10 + p).toLong, c.toLong)) :+ ((99L, 4L))
    orders.toDF("o_orderkey", "o_custkey")
      .write.parquet(s"$dir/orders.parquet")
    val lines = (for {c <- 1 to 3; p <- 10 to 12}
      yield ((c * 10 + p).toLong, p.toLong)) :+ ((99L, 10L))
    lines.toDF("l_orderkey", "l_suppkey")
      .write.parquet(s"$dir/lineitem.parquet")
    val got = graft.queries.GraphQueries.queries("q192_kcore")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(
      (2L, "customer", 3L), (4L, "customer", 3L), (6L, "customer", 3L),
      (21L, "supplier", 3L), (23L, "supplier", 3L), (25L, "supplier", 3L)))
  }

  test("k-core fixpoint: a path peels to nothing where the unroll stalls") {
    import spark.implicits._
    // path 1-2-3-4-5-6 under k=2: each round peels both endpoints, so
    // convergence takes 3 rounds to empty — a fixed 2-round unroll
    // would still report survivors
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    val edges = (und ++ und.map(_.swap)).toDF("u", "v")
    val n0 = edges.select(org.apache.spark.sql.functions.col("u")
      .as("node")).distinct()
    val twoRounds = graft.queries.GraphQueries.peel(edges,
      graft.queries.GraphQueries.peel(edges, n0, 2), 2)
    assert(twoRounds.count() > 0, "the bounded unroll has not converged")
    assert(graft.queries.GraphQueries.kCoreFixpoint(edges, 2).count() == 0)
  }

  test("k-core fixpoint keeps exactly the cycle, pendant gone") {
    import spark.implicits._
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 5L))
    val edges = (und ++ und.map(_.swap)).toDF("u", "v")
    val got = graft.queries.GraphQueries.kCoreFixpoint(edges, 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 2L), (2L, 2L), (3L, 2L), (4L, 2L)))
  }

  test("warm-started pageRank continues the iteration (k then m == k+m)") {
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L))
      .toDF("u", "v")
    val full = PageRank.pageRank(e, 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val half = PageRank.pageRank(e, 2)
    val cont = PageRank.pageRankFrom(e, half, 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(cont.keySet === full.keySet)
    cont.foreach { case (n, r) =>
      assert(math.abs(r - full(n)) < 1e-12, s"node $n: $r vs ${full(n)}")
    }
  }

  test("after an edge delta, warm start converges faster than cold") {
    import spark.implicits._
    val base = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 2L), (5L, 4L),
      (2L, 5L)).toDF("u", "v")
    val delta = Seq((5L, 1L), (1L, 4L)).toDF("u", "v")
    val grown = base.union(delta)
    val ref = PageRank.pageRank(grown, 30)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val warmStartRanks = PageRank.pageRank(base, 15)
    def maxDiff(df: org.apache.spark.sql.DataFrame): Double =
      df.collect().map(r => math.abs(r.getDouble(1) - ref(r.getLong(0))))
        .max
    val warm = maxDiff(PageRank.pageRankFrom(grown, warmStartRanks, 4))
    val cold = maxDiff(PageRank.pageRank(grown, 4))
    assert(warm < cold,
      s"warm $warm should beat cold $cold at the same round budget")
    // two new edges on a 5-node graph move the fixed point materially,
    // so the bound is coarse; the STRICT claim is warm < cold above
    assert(warm < 1e-2)
  }

  test("tol early stop: a converged start ends the loop at round one") {
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (4L, 1L))
      .toDF("u", "v")
    // a well-converged start: per-round movement has contracted to
    // ~0.85^30 of the initial mismatch (≈2e-3 here), safely under tol
    val init = PageRank.pageRank(e, 30)
    val budget = 20
    val tol = 1e-2
    val one = PageRank.pageRankFrom(e, init, 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val full = PageRank.pageRankFrom(e, init, budget)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val early = PageRank.pageRankFrom(e, init, budget, tol = tol)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(early.keySet == full.keySet && early.keySet == one.keySet)
    // the early-stop claim, timing-free: under a 20-round budget the run
    // ended after ROUND ONE — it reproduces the explicit 1-round run
    // (float-sum order tolerance, as the k-then-m pin uses) ...
    early.foreach { case (n, r) =>
      assert(math.abs(r - one(n)) < 1e-12, s"node $n: $r vs 1-round ${one(n)}")
    }
    // ... and measurably did NOT run the remaining 19 rounds: from this
    // start they still move the ranks ~1e-8 (measured), orders beyond
    // float-sum noise (~1e-15), so a full-budget run would sit at noise
    // distance from `full` — the early one does not
    assert(early.map { case (n, r) => math.abs(r - full(n)) }.max > 1e-10)
    // the semantics tol trades: stopping when a round moves < tol leaves
    // at most tol·d/(1-d) to the fixed point (d = 0.85 → ×5.67)
    early.foreach { case (n, r) =>
      assert(math.abs(r - full(n)) < tol * 0.85 / 0.15,
        s"node $n: $r vs budget ${full(n)}")
    }
    // tol = 0 stays the exact fixed-round semantics (oracle contract)
    val fixed = PageRank.pageRankFrom(e, init, 2, tol = 0.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val fixed2 = PageRank.pageRankFrom(e, init, 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    fixed.foreach { case (n, r) => assert(math.abs(r - fixed2(n)) < 1e-15) }
  }

  test("warm start seeds unseen nodes at uniform mass") {
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 1L)).toDF("u", "v")
    // initial ranks know only node 1; node 2 must fall back to 1/N
    val init = Seq((1L, 0.7)).toDF("node", "rank")
    val got = PageRank.pageRankFrom(e, init, 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // teleport = (1-d)/N = 0.075; round 1: node 2 gathers
    // 0.075 + 0.85 * r1(=0.7), node 1 gathers 0.075 + 0.85 * r2(=1/N)
    assert(math.abs(got(2L) - (0.075 + 0.85 * 0.7)) < 1e-12)
    assert(math.abs(got(1L) - (0.075 + 0.85 * 0.5)) < 1e-12)
  }

  test("q244 modularity matches the hand-computed nation partition") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-mod").toString
    def w(name: String, df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").parquet(s"$dir/$name.parquet")
    // trade edges (cust, supp): (c1,s1) i0, (c2,s2) x, (c3,s2) i1,
    // (c1,s2) x, (c2,s1) i0 — plus a DUPLICATE (o1,s1) line that the
    // distinct must fold. m = 5.
    // n0: e=2, vol=6 → 2/5 − (6/10)² = 0.04
    // n1: e=1, vol=4 → 1/5 − (4/10)² = 0.04
    w("orders", Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 1L))
      .toDF("o_orderkey", "o_custkey"))
    w("lineitem", Seq((1L, 1L), (1L, 1L), (2L, 2L), (3L, 2L), (4L, 2L),
      (2L, 1L)).toDF("l_orderkey", "l_suppkey"))
    w("customer", Seq((1L, 0), (2L, 0), (3L, 1))
      .toDF("c_custkey", "c_nationkey"))
    w("supplier", Seq((1L, 0), (2L, 1)).toDF("s_suppkey", "s_nationkey"))
    val r = graft.queries.GraphQueries.queries("q244_modularity")(spark, dir)
      .collect().map(x => x.getInt(0) ->
        ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    assert(r(0) === ((2L, 6L, 0.04)))
    assert(r(1) === ((1L, 4L, 0.04)))
  }
}
