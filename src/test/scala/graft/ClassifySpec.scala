package graft

import org.apache.spark.sql.functions._

import graft.queries.ClassifyOps

class ClassifySpec extends SparkSpec {
  import spark.implicits._

  private def docsDir(df: org.apache.spark.sql.DataFrame): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-nb").toString
    df.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q189 naive bayes separates a crafted two-language corpus") {
    // train = doc_id % 5 != 0 (6 docs), test = % 5 == 0 (2 docs); the
    // vocabularies are disjoint, so each held-out doc must score its
    // own class (the seen-word sum dominates the smoothing penalty)
    val docs = Seq(
      (1L, "aa aa bb", "en"), (2L, "aa bb aa", "en"), (3L, "bb aa", "en"),
      (4L, "zz yy zz", "de"), (6L, "yy zz zz", "de"), (7L, "zz yy", "de"),
      (5L, "aa bb bb", "en"),
      (10L, "zz zz yy", "de"))
      .toDF("doc_id", "text", "lang")
    val got = ClassifyOps.naiveBayes(spark, docsDir(docs)).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(("en", "en") -> 1L, ("de", "de") -> 1L))
  }

  test("q189 smoothing: a test doc of unseen words falls back to the prior") {
    // 3 'en' train docs vs 1 'de'; held-out text shares no vocabulary
    // with training, so every class scores only prior + len·penalty and
    // the majority class (larger docs_c, larger tok_c) must win via the
    // prior term with equal-length penalties... penalties differ by
    // tok_c, so craft equal per-class token totals: 3 en docs of 2
    // tokens vs 1 de doc of 6 tokens (tok_c = 6 both) — only the
    // docs_c prior differs and 'en' wins
    val docs = Seq(
      (1L, "aa bb", "en"), (2L, "bb aa", "en"), (3L, "aa aa", "en"),
      (4L, "zz yy zz yy zz yy", "de"),
      (5L, "qq rr ss", "en"))
      .toDF("doc_id", "text", "lang")
    val got = ClassifyOps.naiveBayes(spark, docsDir(docs)).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(("en", "en") -> 1L))
  }

  test("logreg first-round gradient matches the local reference") {
    // w = 0 -> sigma(0) = 1/2 exactly, so after one round
    // w_j = lr/n * sum((y - 0.5) * x_j)
    val rows = Seq((1, Array(1.0f, 0.5f)), (0, Array(-0.5f, 0.25f)),
      (1, Array(0.25f, -1.0f)))
    val data = rows.toDF("y", "x")
    val w = graft.queries.ClassifyOps.trainLogReg(data, rounds = 1, lr = 4.0)
    val expect = (0 to 1).map { j =>
      4.0 / rows.length * rows.map { case (y, x) =>
        (y - 0.5) * x(j).toDouble }.sum
    }
    w.zip(expect).foreach { case (got, e) =>
      assert(math.abs(got - e) < 1e-6, s"gradient mismatch: $got vs $e")
    }
  }

  test("logreg fully separates a crafted linearly separable set") {
    val rows = Seq(
      (1, Array(1.0f, 0.2f)), (1, Array(0.8f, -0.1f)), (1, Array(1.2f, 0.1f)),
      (0, Array(-1.0f, 0.1f)), (0, Array(-0.9f, -0.2f)),
      (0, Array(-1.1f, 0.0f)))
    val data = rows.toDF("y", "x")
    val w = graft.queries.ClassifyOps.trainLogReg(data, rounds = 10, lr = 4.0)
    assert(w(0) > 0, "weight must point along the separating axis")
    rows.foreach { case (y, x) =>
      val z = w(0) * x(0) + w(1) * x(1)
      assert((z > 0) == (y == 1), s"row ($y, ${x.toSeq}) misclassified")
    }
  }

  test("logreg tolerance stop halts once steps shrink, same separation") {
    val rows = Seq(
      (1, Array(1.0f, 0.2f)), (1, Array(0.8f, -0.1f)),
      (0, Array(-1.0f, 0.1f)), (0, Array(-0.9f, -0.2f)))
    val data = rows.toDF("y", "x")
    // generous round budget + tolerance: must converge BEFORE the
    // budget and still separate the blobs
    val w = graft.queries.ClassifyOps
      .trainLogReg(data, rounds = 500, lr = 4.0, tol = 1e-3)
    rows.foreach { case (y, x) =>
      val z = w(0) * x(0) + w(1) * x(1)
      assert((z > 0) == (y == 1))
    }
    // and with tol = 0 the old fixed-round semantics hold unchanged
    val w3 = graft.queries.ClassifyOps.trainLogReg(data, rounds = 3, lr = 4.0)
    assert(w3.length == w.length)
  }

  test("ml_logreg confusion matrix covers the whole embeddings corpus") {
    val got = SparkEntry.queries("ml_logreg")(spark, sf).collect()
    val n = Tables(spark, sf, "embeddings").count()
    assert(got.map(_.getLong(2)).sum == n)
    got.foreach { r =>
      assert(Set(0, 1).contains(r.getInt(0))
        && Set(0, 1).contains(r.getInt(1)))
    }
  }

  test("q189 confusion matrix covers every held-out doc on driver data") {
    val got = ClassifyOps.naiveBayes(spark, sf).collect()
    val nTest = Tables(spark, sf, "documents")
      .filter(col("doc_id") % 5 === 0).count()
    assert(got.map(_.getLong(2)).sum == nTest,
      "every held-out doc receives exactly one prediction")
    val langs = Tables(spark, sf, "documents")
      .select("lang").distinct().as[String].collect().toSet
    got.foreach { r =>
      assert(langs.contains(r.getString(0)) && langs.contains(r.getString(1)))
    }
  }
}
