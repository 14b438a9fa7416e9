package graft

import org.apache.spark.sql.functions._

class SearchSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q71 grep is a narrow map pass — no exchange in the plan") {
    val df = run("q71_grep")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"grep must not shuffle:\n$p")
    // every surviving row actually matches and carries a real first match
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("n_matches") >= 1)
      assert(r.getAs[String]("first_match").matches("key [a-z]+ scan"))
    }
  }

  test("q90 phrase search counts token adjacency, not string containment") {
    import spark.implicits._
    // same-token runs: "scan scan scan" holds TWO "scan scan" adjacencies
    // (a LIKE/replace-based count sees one); "scans can" holds none.
    val docs = Seq(
      (1L, "scan scan scan"),
      (2L, "a scan scan b"),
      (3L, "scans can"),
      (4L, "scan alone")).toDF("doc_id", "text")
    val tok = docs.select(col("doc_id"),
      posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
    val t1 = tok.filter(col("w") === "scan")
      .select(col("doc_id"), col("pos"))
    val t2 = tok.filter(col("w") === "scan")
      .select(col("doc_id").as("d2"), col("pos").as("p2"))
    val got = t1
      .join(t2, col("doc_id") === col("d2") && col("p2") === col("pos") + 1)
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_occ"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 2L, 2L -> 1L))
    // the driver-facing query finds real phrase hits on the test corpus
    val rows = run("q90_phrase_search").collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_occ") >= 1)
    }
  }

  test("q197 proximity search: directional slop window, tightest gap") {
    import spark.implicits._
    val docs = Seq(
      (1L, "table a b scan"),               // gap 3 -> one pair
      (2L, "table scan x table y z scan"),  // gaps 1 and 3 -> two pairs
      (3L, "scan table"),                   // wrong direction: no hit
      (4L, "table x y z scan"))             // gap 4 > slop: no hit
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-near").toString
    docs.write.parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q197_near_search")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(got == Map(1L -> ((1L, 3)), 2L -> ((2L, 1))))
  }

  test("q72 inverted-index dictionary: df/cf on a crafted corpus") {
    import spark.implicits._
    val docs = Seq((1L, "a b a"), (2L, "a c"), (3L, "c c c"))
      .toDF("doc_id", "text")
    val dict = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("term"))
      .agg(countDistinct(col("doc_id")).as("df"), count(lit(1)).as("cf"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(dict == Map("a" -> ((2L, 3L)), "b" -> ((1L, 1L)),
      "c" -> ((2L, 4L))))
  }

  test("q76 entropy: shuffle-free plan, exact values on known docs") {
    val df = run("q76_word_entropy")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"entropy must not shuffle:\n$p")

    import spark.implicits._
    val known = Seq((1L, "a a b b"), (2L, "x x x x"), (3L, "a b c d"))
      .toDF("doc_id", "text")
    // same column pipeline as the production query, on known docs
    val ent = known
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .withColumn("n", size(col("t")))
      .withColumn("st", array_sort(col("t")))
      .withColumn("bounds", expr(
        "filter(sequence(0, n - 1), i -> i = 0 OR st[i] != st[i - 1])"))
      .withColumn("runs", expr(
        "transform(sequence(1, size(bounds))," +
          " j -> coalesce(try_element_at(bounds, j + 1), n)" +
          " - element_at(bounds, j))"))
      .select(col("doc_id"), expr(
        "-aggregate(runs, 0D, (acc, c) ->" +
          " acc + (c / CAST(n AS DOUBLE)) * ln(c / CAST(n AS DOUBLE)))")
        .as("entropy"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(ent(1L) - math.log(2)) < 1e-12) // two 50/50 symbols
    assert(math.abs(ent(2L)) < 1e-12)               // single symbol: H = 0
    assert(math.abs(ent(3L) - math.log(4)) < 1e-12) // uniform over 4
  }

  test("bm25 ranks higher-tf docs above lower-tf docs of equal length") {
    import spark.implicits._
    // same length 4, tf(key) = 2 vs 1; 'pad' never matches the query
    val docs = Seq(
      (1L, "key key pad pad"),
      (2L, "key pad pad pad"),
      (3L, "pad pad pad pad"))
      .toDF("doc_id", "text")
    val tk = docs.select(col("doc_id"), split(col("text"), " ").as("t"))
    val stats = tk.agg(count(lit(1)).cast("double").as("n"),
      avg(size(col("t"))).as("avgdl"))
    val tf = tk
      .select(col("doc_id"), size(col("t")).cast("double").as("dl"),
        explode(col("t")).as("term"))
      .filter(col("term") === "key")
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val dfreq = tf.groupBy(col("term"))
      .agg(count(lit(1)).cast("double").as("df"))
    val scored = tf.join(broadcast(dfreq), "term").crossJoin(broadcast(stats))
      .withColumn("score",
        log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1.0)
          * col("tf") * 2.2
          / (col("tf") + lit(1.2) * (lit(0.25)
            + lit(0.75) * col("dl") / col("avgdl"))))
      .select(col("doc_id"), col("score"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scored(1L) > scored(2L), s"tf=2 must outrank tf=1: $scored")
    assert(!scored.contains(3L), "docs without query terms are never scored")
    // BM25 tf saturation: doubling tf less than doubles the score
    assert(scored(1L) < 2 * scored(2L), s"tf term must saturate: $scored")
  }

  test("tf-idf top terms: ranks complete, scores monotone, ubiquitous terms excluded") {
    val rows = SparkEntry.queries("q109_tfidf_topterms")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getDouble(3)))
    val byDoc = rows.groupBy(_._1)
    assert(byDoc.nonEmpty)
    byDoc.foreach { case (doc, ts) =>
      val sorted = ts.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to sorted.length),
        s"doc $doc ranks not 1..k")
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a._4 >= b._4; case _ => true
      }, s"doc $doc scores not monotone")
    }
    // a term in EVERY document has idf = ln(1) = 0 and can never beat a
    // distinctive term; verify none of the top terms is corpus-ubiquitous
    val n = Tables(spark, sf, "documents").count()
    val docsPerTerm = Tables(spark, sf, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.explode(
          org.apache.spark.sql.functions.split(
            org.apache.spark.sql.functions.col("text"), " ")).as("term"))
      .distinct().groupBy("term").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ubiquitousTop = rows.filter(r => docsPerTerm(r._3) == n)
    assert(ubiquitousTop.forall(_._4 == 0.0),
      s"zero-idf terms can only surface with score 0: ${ubiquitousTop.take(3).toSeq}")
  }

  test("RRF fusion: hand-computed scores, single-list candidates, ties") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // q1: doc 10 is rank 1 in BOTH arms → 2/61; doc 11 lex-only rank 2
    // → 1/62; doc 12 sem-only rank 2 → 1/62 (tie with 11, broken by
    // cand asc); doc 13 sem-only rank 3 → 1/63
    val lex = Seq((1L, 10L, 1), (1L, 11L, 2)).toDF("q_id", "cand", "lex_rk")
    val sem = Seq((1L, 10L, 1), (1L, 12L, 2), (1L, 13L, 3))
      .toDF("q_id", "cand", "sem_rk")
    val fused = graft.queries.SearchQueries.rrfFuse(lex, sem, 60, 10)
      .orderBy(col("rk")).collect()
      .map(r => (r.getLong(1), r.getDouble(4), r.getLong(5)))
    def r6(x: Double) = BigDecimal(java.math.BigDecimal.valueOf(x))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(fused.toSeq == Seq(
      (10L, r6(1.0 / 61 + 1.0 / 61), 1L),
      (11L, r6(1.0 / 62), 2L),
      (12L, r6(1.0 / 62), 3L),
      (13L, r6(1.0 / 63), 4L)), fused.mkString(","))
  }

  test("q246 entry: every query fused, ranks dense, both arms surface") {
    val rows = SparkEntry.queries("q246_rrf_fusion")(spark, sf).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.nonEmpty)
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_.getLong(5)).sorted.toSeq == (1L to rs.length),
        s"query $q ranks not dense")
    }
    // at corpus scale both arms contribute somewhere: some fused row
    // carries a lexical rank and some carries a semantic rank
    assert(rows.exists(!_.isNullAt(2)) && rows.exists(!_.isNullAt(3)),
      "both retrieval arms must surface in the fused lists")
  }
}
