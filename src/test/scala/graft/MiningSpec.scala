package graft

import org.apache.spark.sql.functions._

import graft.queries.MiningOps

/** Pattern-mining semantics the driver oracle can't see: skyline tie
  * handling on crafted points, prune-pass soundness, and the Apriori
  * cut's result-equivalence to the unpruned pair join.
  */
class MiningSpec extends SparkSpec {

  test("q275 JSD: hand-computed pair, identical sources at exactly 0") {
    import spark.implicits._
    import graft.queries.MiningOps
    // A: {x:2/3, y:1/3}; B: {x:1/4, z:3/4}; C == A
    val docs = Seq((1L, "x x y", "A"), (2L, "x z z z", "B"),
      (3L, "x x y", "C")).toDF("doc_id", "text", "source")
    val got = MiningOps.sourceJsd(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def mic(x: Double) = math.round(x * 1e6)
    // shared word x: p=2/3, q=1/4, m=11/24; exclusive mass y + z
    val p = 2.0 / 3; val q = 1.0 / 4; val m = (p + q) / 2
    val jm = mic(0.5 * p * math.log(p / m) + 0.5 * q * math.log(q / m))
    val excl = math.round(0.5 * math.log(2.0)
      * (2000000L - mic(p) - mic(q)))
    val exp = r6((jm + excl) / 1e6)
    assert(got(("A", "B")) === ((1L, exp)))
    assert(got(("B", "C"))._2 === exp) // symmetric by construction
    // identical unigram mixes: every term is exactly zero
    assert(got(("A", "C")) === ((2L, 0.0)))
    // JSD is bounded by ln 2
    got.values.foreach(v => assert(v._2 >= 0.0 && v._2 <= 0.693148))
  }

  test("skyline keeps mutually non-dominating ties and drops dominated points") {
    import spark.implicits._
    // (10,5) twice: equal points never dominate each other — both stay.
    // (10,3) loses to (10,5) within the level; (4,1) loses to (5,7).
    val per = Seq(
      ("k1", 10L, 5L), ("k2", 10L, 5L), ("k3", 10L, 3L),
      ("k4", 5L, 7L), ("k5", 4L, 1L))
      .toDF("key", "rev", "n")
    val expect = Set("k1", "k2", "k4")
    val direct = MiningOps.skyline2D(per)
      .collect().map(_.getString(0)).toSet
    val pruned = MiningOps.skyline2D(MiningOps.skylinePrune(per, 4))
      .collect().map(_.getString(0)).toSet
    assert(direct == expect && pruned == expect)
  }

  test("skylinePrune never drops a skyline point (random check)") {
    import spark.implicits._
    // deterministic pseudo-random cloud: anything the pruned pipeline
    // returns must equal the unpruned exact skyline
    val pts = (1 to 500).map { i =>
      val r = (i * 2654435761L) % 1000
      val n = (i * 40503L) % 1000
      (s"p$i", r, n)
    }.toDF("key", "rev", "n")
    val exact = MiningOps.skyline2D(pts).collect().map(_.getString(0)).toSet
    val fast = MiningOps.skyline2D(MiningOps.skylinePrune(pts, 16))
      .collect().map(_.getString(0)).toSet
    assert(fast == exact, s"prune lost ${exact -- fast}, added ${fast -- exact}")
  }

  test("q138 two-phase skyline equals brute-force dominance on sf0.001") {
    val per = SparkEntry.queries("q138_skyline")(spark, sf)
    val got = per.collect().map(_.getLong(0)).toSet
    // brute force: a supplier is dominated if any other has >= both
    // metrics with one strict
    val base = graft.Tables(spark, sf, "lineitem")
      .groupBy(col("l_suppkey").as("key"))
      .agg(max(col("l_extendedprice").cast("decimal(18,2)")).as("rev"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getDecimal(1), r.getLong(2)))
    val want = base.filter { case (_, rev, n) =>
      !base.exists { case (_, r2, n2) =>
        r2.compareTo(rev) >= 0 && n2 >= n &&
          (r2.compareTo(rev) > 0 || n2 > n)
      }
    }.map(_._1).toSet
    assert(got == want)
  }

  test("q134 Apriori item cut returns exactly the unpruned frequent pairs") {
    val b = MiningOps.baskets(spark, sf).cache()
    val nDocs = graft.Tables(spark, sf, "documents").count()
    // unpruned: pair ALL tokens per doc, threshold only at the end
    val unpruned = b.as("a")
      .join(b.as("c"), col("a.doc_id") === col("c.doc_id") &&
        col("a.w") < col("c.w"))
      .groupBy(col("a.w").as("w1"), col("c.w").as("w2"))
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") * 20 >= lit(nDocs))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    val got = SparkEntry.queries("q134_assoc_rules")(spark, sf)
      .select("w1", "w2", "n_pair")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    b.unpersist()
    assert(got == unpruned)
  }

  test("q190 PMI: hand-computed ln 8 on a balanced crafted corpus") {
    import spark.implicits._
    // 5 docs "a b" + 5 docs "c d": Nu=20, Nb=10, every unigram 5, both
    // pairs 5 -> PMI = ln(5·20²/(10·5·5)) = ln 8 for both collocations
    val dir = java.nio.file.Files.createTempDirectory("graft-pmi").toString
    ((1 to 5).map(i => (i.toLong, "a b")) ++
      (6 to 10).map(i => (i.toLong, "c d")))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q190_pmi_collocations")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    val ln8 = BigDecimal(math.log(8.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Set(("a", "b", 5L, ln8), ("c", "d", 5L, ln8)))
  }

  test("q190 PMI: independent pair scores ~0, sticky pair scores high") {
    import spark.implicits._
    // "x y" always adjacent (sticky); "p q" and "p r" split contexts
    val dir = java.nio.file.Files.createTempDirectory("graft-pmi2").toString
    ((1 to 5).map(i => (i.toLong, "x y")) ++
      (6 to 10).map(i => (i.toLong, "p q p r")))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q190_pmi_collocations")(spark, dir)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(3)))
      .toMap
    assert(got(("x", "y")) > got(("p", "q")),
      "always-adjacent pair must out-score the split-context pair")
  }

  test("q190 PMI survives 1-token and empty docs (bigram guard)") {
    import spark.implicits._
    // a 1-token doc (and an empty text, which splits to ['']) has NO
    // bigrams: unguarded, sequence(1, 0) descends to [1, 0] and
    // element_at(tk, 0) throws — the q209 fuzzyPairs hazard. The guard
    // must skip those docs while their unigrams still count.
    val dir = java.nio.file.Files.createTempDirectory("graft-pmi3").toString
    ((1 to 5).map(i => (i.toLong, "a b")) ++
      Seq((6L, "solo"), (7L, "")))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q190_pmi_collocations")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // only (a, b) reaches the min count; the crash is the real assertion
    assert(got.toSeq == Seq(("a", "b", 5L)))
  }

  test("q198 identical source profiles score cosine 1, disjoint ones vanish") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-srcsim").toString
    Seq((1L, "a b", "s1"), (2L, "a b", "s2"), (3L, "z", "s3"))
      .toDF("doc_id", "text", "source")
      .write.parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q198_source_similarity")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    // s3 shares no vocabulary -> zero-overlap pairs carry no row
    assert(got == Set(("s1", "s2", 2L, 1.0)))
  }

  test("q207 Apriori triples: only the support-clearing triple survives") {
    import spark.implicits._
    // 40 docs, support floor = 2: {x,y,z} co-occurs in 3 docs (passes);
    // "q" appears once (item-pruned before any pair/triple forms);
    // 36 distinct filler singles generate no candidates at all
    val docs = (Seq.fill(3)("x y z") ++ Seq("x q z")
      ++ (1 to 36).map(i => s"f$i"))
      .zipWithIndex.map { case (t, i) => ((i + 1).toLong, t) }
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-tri").toString
    docs.write.parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q207_freq_triples")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3))).toSet
    assert(got == Set(("x", "y", "z", 3L)))
  }

  test("q134/q138 plans stay on equi-joins (no cartesian/BNLJ)") {
    Seq("q134_assoc_rules", "q138_skyline").foreach { name =>
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct")
        && !p.contains("BroadcastNestedLoop"),
        s"$name must stay on equi-joins:\n$p")
    }
  }
}
