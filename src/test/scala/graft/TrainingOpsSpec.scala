package graft

import org.apache.spark.sql.functions._

import graft.queries.TrainingOps

/** Specs for the training-run preparation family (q85–q91 additions). */
class TrainingOpsSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q85 kmeans: partitions the corpus, deterministic across runs") {
    val total = Tables(spark, sf, "embeddings").count()
    val rows = run("q85_kmeans").collect()
    assert(rows.length <= 5 && rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("n")).sum == total,
      "every vector is assigned to exactly one cluster")
    rows.foreach(r => assert(r.getAs[Double]("c_norm") > 0))
    // determinism: the decimal discipline means a re-run (different
    // partition order) reproduces the exact same bytes
    val again = run("q85_kmeans").collect()
    assert(rows.map(_.toString).sorted.sameElements(
      again.map(_.toString).sorted))
  }

  test("q86 bfs: hop sets are sound (every dist-1/2 node has a witness)") {
    val rows = run("q86_bfs").collect()
    val byDist = rows.groupBy(_.getAs[Int]("dist"))
      .view.mapValues(_.map(_.getAs[Long]("id")).toSet).toMap
    assert(byDist.keySet.subsetOf(Set(0, 1, 2)))
    assert(byDist(0).forall(_ % 100 == 0))
    // dist-2 excludes seeds
    byDist.getOrElse(2, Set.empty[Long]).foreach(id => assert(id % 100 != 0))
    // witness check: each dist-1 supplier shares an order line with a seed
    val o = Tables(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val l = Tables(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
    val ce = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("cust"), col("l_suppkey").as("supp"))
      .distinct().collect()
      .map(r => (r.getAs[Long]("cust"), r.getAs[Long]("supp"))).toSet
    byDist.getOrElse(1, Set.empty[Long]).foreach { sup =>
      assert(ce.exists { case (c, sv) => sv == sup && c % 100 == 0 },
        s"supplier $sup has no seed-adjacent order line")
    }
  }

  test("q87 skew profile: ranked, shares consistent, cum share monotone") {
    val rows = run("q87_skew_profile").collect()
      .sortBy(_.getAs[Int]("rank"))
    assert(rows.map(_.getAs[Int]("rank")).sameElements(1 to rows.length))
    val counts = rows.map(_.getAs[Long]("cnt"))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      "hot keys are ordered by count desc")
    val cums = rows.map(_.getAs[Double]("cum_share"))
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b + 1e-9 })
    assert(cums.last <= 1.0 + 1e-9)
  }

  test("q88 epoch shuffle: a permutation prefix; a new seed reorders it") {
    val rows = run("q88_epoch_shuffle").collect()
    assert(rows.length == 100)
    assert(rows.map(_.getAs[Int]("position")).sorted.sameElements(1 to 100))
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == 100)
    // different seed ⇒ different permutation (same mechanics, seed 43)
    val docs = Tables(spark, sf, "documents")
    def perm(seed: Int) = docs
      .select(col("doc_id"),
        md5(concat(col("doc_id").cast("string"), lit(s":$seed"))).as("h"))
      .orderBy(col("h")).limit(100)
      .collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(perm(42) != perm(43), "distinct seeds give distinct orders")
    assert(perm(42).toSet != perm(43).toSet || perm(42) != perm(43))
  }

  test("q89 temperature mix: flattens the language distribution") {
    val rows = run("q89_temperature_mix").collect()
    val p = rows.map(r => r.getAs[String]("lang") -> r.getAs[Double]("p")).toMap
    assert(math.abs(p.values.sum - 1.0) < 1e-4, "probabilities sum to 1")
    val n = rows.map(r => r.getAs[String]("lang") -> r.getAs[Long]("n_docs")).toMap
    val total = n.values.sum.toDouble
    val top = n.maxBy(_._2)._1
    val low = n.minBy(_._2)._1
    // α < 1 shrinks the head and boosts the tail vs proportional
    assert(p(top) < n(top) / total + 1e-9, "head language is downweighted")
    assert(p(low) > n(low) / total - 1e-9, "tail language is upweighted")
  }

  test("q91 fuzzy join: complete and exact vs brute force on sf0.001") {
    val names = Tables(spark, sf, "customer")
      .select(col("c_custkey").as("id"), col("c_name").as("name"))
    val got = TrainingOps.fuzzyPairs(names).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // brute force: all pairs, exact levenshtein (test corpus is small)
    val a = names.select(col("id").as("ia"), col("name").as("na"))
    val b = names.select(col("id").as("ib"), col("name").as("nb"))
    val want = a.crossJoin(b)
      .filter(col("ia") < col("ib") &&
        levenshtein(col("na"), col("nb")) <= 1)
      .collect().map(r => (r.getAs[String]("na"), r.getAs[String]("nb"))).toSet
    assert(got == want,
      s"deletion-neighborhood join must equal brute force: " +
        s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    assert(want.nonEmpty, "test corpus must exercise the join")
  }

  test("q145 split leakage equals a brute-force cross-split duplicate count") {
    import org.apache.spark.sql.functions._
    val got = graft.queries.TrainingOps
      .queries("q145_split_leakage")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"),
        when(substring(md5(col("doc_id").cast("string")), 1, 1) < "8", "train")
          .when(substring(md5(col("doc_id").cast("string")), 1, 1) < "c", "val")
          .otherwise("test").as("split"),
        col("text"))
      .collect().map(r => (r.getString(1), r.getString(2)))
    val bySplit = docs.groupBy(_._1)
    val textSplits = docs.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    bySplit.foreach { case (split, rows) =>
      val leaked = rows.count { case (_, text) =>
        (textSplits(text) - split).nonEmpty }
      assert(got(split) == ((rows.size.toLong, leaked.toLong)),
        s"split $split: got ${got(split)}, want (${rows.size}, $leaked)")
    }
    assert(got.values.map(_._1).sum == docs.length.toLong)
    assert(got.keySet == Set("train", "val", "test"))
  }
}
