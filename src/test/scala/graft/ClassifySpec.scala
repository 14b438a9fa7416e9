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

  test("q264 agreement: hand-computed kappa and McNemar cells") {
    // train: disjoint class vocab (xx/yy) + markers, equal priors and
    // token totals, so NB argmax = matched-token count with the c-asc
    // tie-break. Test fold crafted to populate every cell:
    //  id0/5/20/30 both correct; id10/15/35 NB-only correct (cc = 3);
    //  id25 heuristic-only correct (b = 1); agree = 4 of n = 8.
    //  marginals h(en 5, de 3) nb(en 3, de 5) -> sab = 30,
    //  kappa = (8*4 - 30)/(64 - 30) = 2/34; chi2 = (|1-3|-1)^2/4
    val train = Seq(1L, 2L, 3L).map(i => (i, "the of is xx", "en")) ++
      Seq(4L, 6L, 7L).map(i => (i, "der die das yy", "de"))
    val testDocs = Seq((0L, "the of is", "en"), (5L, "der die das", "de"),
      (10L, "yy yy the", "de"), (15L, "xx xx der", "en"),
      (20L, "the qq", "en"), (25L, "the yy yy", "en"),
      (30L, "der der yy", "de"), (35L, "yy yy the the", "de"))
    val docs = (train ++ testDocs).toDF("doc_id", "text", "lang")
    val r = ClassifyOps.classifierAgreement(spark, docsDir(docs)).head()
    assert((r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
      r.getLong(4), r.getDouble(5)) ===
      ((8L, 4L, 0.058824, 1L, 3L, 0.25)))
  }

  test("q260 LOO ablation: poisoned source flagged, dropped class path") {
    import org.apache.spark.sql.expressions.Window
    // train = %5!=0, test = %5==0 (4 docs). Source 'bad' mislabels de
    // vocabulary as en -> with it in, the pure-"xx" test doc flips to
    // en; without it, everything separates. g3 is the ONLY de source,
    // so its LOO model drops the de class entirely.
    val docs = (Seq(
      (1L, "g1"), (2L, "g1"), (3L, "g1"), (6L, "g2"), (7L, "g2"))
      .map { case (i, s) => (i, "aa bb cc aa bb", "en", s) } ++
      Seq(4L, 8L, 9L, 11L, 12L)
        .map(i => (i, "xx yy zz xx yy", "de", "g3")) ++
      Seq(13L, 14L, 16L, 17L)
        .map(i => (i, "xx xx xx xx", "en", "bad")) ++
      Seq((0L, "aa bb", "en", "g1"), (5L, "xx xx", "de", "g3"),
        (10L, "xx yy zz", "de", "g3"), (15L, "aa cc", "en", "g2")))
      .toDF("doc_id", "text", "lang", "source")
    val got = ClassifyOps.looSourceAblationOn(docs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(got.keySet === Set("g1", "g2", "g3", "bad"))
    // full model: the poisoned en model steals the "xx xx" de doc -> 3/4
    got.values.foreach { case (nTest, nFull, _, _) =>
      assert(nTest === 4L && nFull === 3L)
    }
    // dropping the poison source recovers 4/4
    assert(got("bad")._3 === 4L && got("bad")._4 === 0.25)
    // dropping the only de source kills the de class: both de test docs
    // fall to en -> 2/4
    assert(got("g3")._3 === 2L && got("g3")._4 === -0.25)
    // the clean en sources were never load-bearing for the errors
    assert(got("g1")._4 === 0.0 && got("g2")._4 === 0.0)
  }

  test("q260 LOO == physical retrain (additive-count trick is exact)") {
    import org.apache.spark.sql.expressions.Window
    val out = ClassifyOps.looSourceAblation(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(out.nonEmpty)
    val target = out.keySet.min
    // retrain WITHOUT the source's training docs (test fold untouched)
    val reduced = Tables(spark, sf, "documents")
      .filter(!(col("source") === target && col("doc_id") % 5 =!= 0))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("c"))
    val retrained = ClassifyOps.nbScoresOn(reduced)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .agg(sum(when(col("lang") === col("c"), 1L).otherwise(0L)))
      .head().getLong(0)
    assert(retrained === out(target),
      s"LOO($target) ${out(target)} != physical retrain $retrained")
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
  test("q226 calibration bins partition the held-out set, values in range") {
    val conf = ClassifyOps.queries("q189_naive_bayes")(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("n")).collect().head.getLong(0)
    val bins = ClassifyOps.queries("q226_calibration")(spark, sf).collect()
    assert(bins.map(_.getAs[Long]("n")).sum === conf)
    bins.foreach { r =>
      val (bin, acc, c) = (r.getAs[Long]("bin"), r.getAs[Double]("acc"),
        r.getAs[Double]("conf"))
      // top-of-5 posterior is always > 1/5 -> bins 1..9 only
      assert(bin >= 1L && bin <= 9L)
      assert(acc >= 0.0 && acc <= 1.0)
      assert(c >= 0.0 && c <= 1.0 + 1e-9)
      // claimed confidence lies inside its own decile bin
      assert(c >= bin / 10.0 - 1e-6 && (bin == 9L || c < (bin + 1) / 10.0 + 1e-6))
    }
  }

  test("q226 a perfectly separable corpus calibrates to the top bin") {
    import spark.implicits._
    // two languages with disjoint vocabularies, many docs each
    val docs = (0L until 40L).map { i =>
      if (i % 2 == 0) (i, "aa bb cc aa bb cc aa bb", "en", "s", 8L)
      else (i, "xx yy zz xx yy zz xx yy", "fr", "s", 8L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val d = java.nio.file.Files.createTempDirectory("graft-q226").toString
    docs.write.mode("overwrite").parquet(s"$d/documents.parquet")
    val bins = ClassifyOps.queries("q226_calibration")(spark, d).collect()
    assert(bins.length === 1)
    assert(bins.head.getAs[Long]("bin") === 9L)
    assert(bins.head.getAs[Double]("acc") === 1.0)
    assert(bins.head.getAs[Double]("conf") > 0.9)
  }

  test("q237 cross-validation: folds partition the corpus; fold 0 == q189") {
    import org.apache.spark.sql.functions._
    val cv = ClassifyOps.queries("q237_nb_crossval")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(cv.keySet === Set(0L, 1L, 2L, 3L, 4L))
    // every doc is tested exactly once across folds
    val totalTested = cv.values.map(_._1).sum
    assert(totalTested === Tables(spark, sf, "documents").count())
    // fold 0's accuracy equals the q189 confusion-matrix accuracy
    val conf = ClassifyOps.queries("q189_naive_bayes")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val q189acc = conf.filter(c => c._1 == c._2).map(_._3).sum.toDouble /
      conf.map(_._3).sum
    assert(math.abs(cv(0L)._3 - q189acc) < 1e-6)
    cv.values.foreach { case (n, correct, acc) =>
      assert(correct <= n)
      assert(acc >= 0.0 && acc <= 1.0)
    }
  }

  test("q237 single-fold-class edge: a class confined to its held-out " +
      "fold is no candidate there (no ln(0) null-score rows)") {
    // class zz exists ONLY in fold 0 (doc_ids 0/5/10): fold 0's train
    // set has zero zz docs, so — like the unrolled per-fold form, whose
    // class grid comes from the train slice — zz must not be a
    // candidate for fold 0. Before the docs_c filter this emitted
    // ln(docs_c=0) null-score rows and correctness rested on the
    // unpinned nulls-sort-last invariant of the desc ordering.
    val docs = (Seq(0L, 5L, 10L).map(i => (i, "qq rr", "zz")) ++
      Seq(15L, 20L).map(i => (i, "aa bb", "en")) ++
      (1L to 14L).filter(_ % 5 != 0).map(i => (i, "aa bb", "en")))
      .toDF("doc_id", "text", "lang")
    val toks = graft.queries.TokenCache.tokenize(docs)
      .withColumn("fd", pmod(col("doc_id"), lit(5)))
    val cv = ClassifyOps.nbCrossvalFromTokens(toks).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(cv.keySet === Set(0L, 1L, 2L, 3L, 4L))
    // fold 0: 5 test docs; the 3 zz docs CANNOT be predicted zz (no
    // train presence) and the 2 en docs classify correctly -> 2/5
    assert(cv(0L) === ((5L, 2L, 0.4)))
    // folds 1-4: zz IS a candidate (fold 0 trains it), but the en docs
    // still win on their own vocabulary -> 3/3 each, and no fold's
    // accuracy is null/NaN
    (1L to 4L).foreach(f => assert(cv(f) === ((3L, 3L, 1.0))))
    cv.values.foreach { case (_, _, acc) => assert(!acc.isNaN) }
  }

  test("q242 feature AUC: hand-computed with ties; noise anchors at 0.5") {
    import spark.implicits._
    // feature f: pos values {3, 2}, neg values {1, 2}
    // pairs (pos vs neg): 3>1 ✓, 3>2 ✓, 2>1 ✓, 2=2 half → U = 3.5,
    // AUC = 3.5 / 4 = 0.875
    val crafted = Seq(
      ("f", 3.0, 1L), ("f", 2.0, 1L), ("f", 1.0, 0L), ("f", 2.0, 0L),
      // g: perfectly separating → AUC 1; h: inverted → AUC 0
      ("g", 9.0, 1L), ("g", 1.0, 0L),
      ("h", 1.0, 1L), ("h", 9.0, 0L))
      .toDF("feature", "value", "label")
    val got = ClassifyOps.featureAuc(crafted).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    assert(got("f") === ((2L, 2L, 0.875)))
    assert(got("g") === ((1L, 1L, 1.0)))
    assert(got("h") === ((1L, 1L, 0.0)))
    // the shipped entry: the planted modular-noise feature has no
    // relation to priority → AUC within noise of 0.5; totalprice is a
    // real feature ordering, so its AUC moves off the noise band's edge
    val entry = SparkEntry.queries("q242_feature_auc")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(entry.keySet ===
      Set("totalprice", "order_month", "cust_mod7"))
    assert(math.abs(entry("cust_mod7") - 0.5) < 0.05,
      s"noise control off 0.5: ${entry("cust_mod7")}")
    entry.values.foreach(a => assert(a >= 0.0 && a <= 1.0))
  }
}
