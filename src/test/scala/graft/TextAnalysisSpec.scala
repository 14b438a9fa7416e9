package graft

import graft.queries.TextAnalysis

class TextAnalysisSpec extends SparkSpec {

  test("q263 vocab coverage: hand-computed OOV curve, tie rank by token") {
    import spark.implicits._
    // freqs: a=5 b=3 c=2 d=1 e=1 -> total 12; d/e tie broken by token
    val docs = Seq((1L, "a a a b b c"), (2L, "a a b c d e"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.vocabCoverage(docs, Seq(1L, 2L, 4L, 8L))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    assert(got === Map(
      1L -> ((5L, 5L, 0.583333)), 2L -> ((5L, 8L, 0.333333)),
      4L -> ((5L, 11L, 0.083333)), 8L -> ((5L, 12L, 0.0))))
    // curve is monotone non-increasing in K
    val curve = got.toSeq.sortBy(_._1).map(_._2._3)
    assert(curve === curve.sorted.reverse)
  }

  test("q266 unseen mass: hand-computed hapax share and TTR") {
    import spark.implicits._
    val docs = Seq((1L, "a a b", "A"), (2L, "c", "A"), (3L, "x x x x", "B"))
      .toDF("doc_id", "text", "source")
    val got = TextAnalysis.unseenMass(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    // A: tokens {a:2, b:1, c:1} -> N=4 V=3 N1=2; B: {x:4} -> N1=0
    assert(got === Map(
      "A" -> ((4L, 3L, 2L, 0.5, 0.75)),
      "B" -> ((4L, 1L, 0L, 0.0, 0.25))))
  }

  test("fingerprint: NULL below 8 chars, min 8-gram md5 at/above") {
    import spark.implicits._
    val got = Seq("short", "exactly8", "a longer text with many grams")
      .toDF("text")
      .select(TextAnalysis.fingerprint($"text").as("fp"))
      .collect().map(r => Option(r.getString(0)))
    assert(got(0).isEmpty, "sub-8-char text must fingerprint to NULL")
    // a single 8-gram: fp == md5 of the whole string
    assert(got(1).contains(
      java.security.MessageDigest.getInstance("MD5")
        .digest("exactly8".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString))
    assert(got(2).nonEmpty)
  }

  test("fingerprint kernel == the array_min/transform/md5 expression " +
      "form on real corpus text (incl. non-ASCII)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val texts = Tables(spark, sf, "documents").select("text").as[String]
      .take(50).toSeq ++ Seq("exactly8", "üñïçødé text with 8-grams",
      "aaaaaaaaaaaaaaaa")
    val df = texts.toDF("text")
    val got = df.select(TextAnalysis.fingerprint($"text").as("fp"))
      .collect().map(r => Option(r.getString(0)))
    val ref = df.select(when(length($"text") >= 8, array_min(transform(
        sequence(lit(1), length($"text") - 7),
        i => md5($"text".substr(i, lit(8)).cast("binary"))))).as("fp"))
      .collect().map(r => Option(r.getString(0)))
    assert(got.toSeq === ref.toSeq)
  }

  test("xx fingerprint kernel == the array_min/transform/xxhash64 " +
      "expression form on real corpus text (incl. non-ASCII)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val texts = Tables(spark, sf, "documents").select("text").as[String]
      .take(50).toSeq ++ Seq("exactly8", "üñïçødé text with 8-grams")
    val df = texts.toDF("text")
    val got = df.select(TextAnalysis.fingerprintXx($"text").as("fp"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    val ref = df.select(when(length($"text") >= 8, array_min(transform(
        sequence(lit(1), length($"text") - 7),
        i => xxhash64($"text".substr(i, lit(8)))))).as("fp"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(got.toSeq === ref.toSeq)
  }

  test("xxhash64 fingerprint: stable per text, null under 8 chars") {
    import spark.implicits._
    // identical texts MUST collide (the dedup contract); the chosen
    // minimum gram differs from md5's (different hash order), so only
    // text-level agreement is guaranteed — not md5-group equality
    val dir = java.nio.file.Files.createTempDirectory("graft-fpx").toString
    Seq((1L, "the same long document body"),
      (2L, "the same long document body"),
      (3L, "a different document body entirely"),
      (4L, "short"))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.queries("text_fingerprint_xx")(spark, dir)
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got(1L).isDefined && got(1L) == got(2L))
    assert(got(3L).isDefined && got(3L) != got(1L))
    assert(got(4L).isEmpty, "sub-8-char docs have no 8-gram")
  }

  test("q201 c-TF-IDF: exclusive terms outrank shared ones") {
    import spark.implicits._
    // K is DERIVED from the data (2 langs here, not the corpus's 5);
    // smoothed idf ln(1 + K/cdf): "only" (en-exclusive, cdf 1) gets
    // ln 3, "both" (every class, cdf 2) gets ln 2 — still ranked, but
    // below the exclusive term at equal tf
    val dir = java.nio.file.Files.createTempDirectory("graft-ctfidf").toString
    Seq((1L, "only both", "en"), (2L, "only both", "en"),
      (3L, "both anders", "de"))
      .toDF("doc_id", "text", "lang")
      .write.parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.queries("q201_ctfidf")(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getString(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    def m(x: Double) = math.round(x * 1e6)
    assert(got(("en", 1)) == (("only", 2L, 1L, 2 * m(math.log(3.0)))))
    assert(got(("en", 2)) == (("both", 2L, 2L, 2 * m(math.log(2.0)))))
    assert(got(("de", 1)) == (("anders", 1L, 1L, m(math.log(3.0)))))
    assert(got(("de", 2)) == (("both", 1L, 2L, m(math.log(2.0)))))
  }

  test("quantile token budget == full-sort budget (q56 == q40 semantics)") {
    val got = SparkEntry.queries("q56_quantile_budget")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    val want = SparkEntry.queries("q40_token_budget")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == want && want.nonEmpty)
  }

  test("quantile token budget on a skewed language mix") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // 10,000 docs in one dominant language + 10 in another; token counts
    // collide heavily so the boundary group holds many docs
    val docs = ((1 to 10000).map(i => (i.toLong, "big", (i % 50 + 1).toLong))
      ++ (1 to 10).map(i => (100000L + i, "tiny", 100L)))
      .toDF("doc_id", "lang", "n_tokens")
    val budget = 2000L
    val got = TextAnalysis.quantileTokenBudget(docs, budget)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("n_tokens").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = docs.withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budget)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got == want && want.nonEmpty)
    // the tiny language must fit entirely (1000 tokens < budget)
    assert(got.count(_._2 == "tiny") == 10)
  }

  test("mr_wordcount key escaping round-trips comma/percent tokens") {
    import org.apache.spark.sql.functions.lit
    import graft.queries.MrQueries
    val tokens = Seq("foo,bar", "a%2Cb", "50%", "plain", ",", "%")
    tokens.foreach { t =>
      val esc = MrQueries.escKey(t)
      assert(!esc.contains(","), s"escaped key '$esc' still has a comma")
      val back = spark.range(1)
        .select(MrQueries.unescKey(lit(esc)).as("w"))
        .head().getString(0)
      assert(back == t, s"round-trip broke: '$t' -> '$esc' -> '$back'")
    }
  }
}
