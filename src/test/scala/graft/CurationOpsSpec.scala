package graft

import org.apache.spark.sql.functions._

import graft.queries.CurationOps

class CurationOpsSpec extends SparkSpec {

  test("q269 DP release: deterministic Laplace noise, k-suppression") {
    import spark.implicits._
    val docs = ((1 to 7).map(i => (i.toLong, s"t$i", "en", "s1")) ++
      (8 to 10).map(i => (i.toLong, s"t$i", "de", "s2")))
      .toDF("doc_id", "text", "lang", "source")
    val dir = java.nio.file.Files.createTempDirectory("graft-dp").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val run = () => SparkEntry.queries("q269_dp_release")(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), Option(r.get(3)).map(_.toString.toDouble),
          r.getBoolean(4)))).toMap
    val got = run()
    // local reference of the identical inverse-CDF on the md5 seed
    def noise(cell: String): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(cell.getBytes("UTF-8")).map("%02x".format(_)).mkString
        .substring(0, 6)
      val v = (java.lang.Long.parseLong(hex, 16) + 0.5) / 16777216.0 - 0.5
      -math.signum(v) * math.log(1.0 - 2.0 * math.abs(v))
    }
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(("en", "s1")) ===
      ((7L, Some(r4(7.0 + noise("en|s1"))), false)))
    // a 3-doc cell is under k = 5: suppressed, nothing released
    assert(got(("de", "s2")) === ((3L, None, true)))
    // the mechanism is deterministic by construction (hash-seeded)
    assert(run() === got)
  }

  test("decontamination drops exactly the probe-overlapping docs") {
    val docs = Tables(spark, sf, "documents")
    val total = docs.filter(pmod(col("doc_id"), lit(97)) =!= 0).count()
    val clean = SparkEntry.queries("q57_decontaminate")(spark, sf)
    val cleanIds = clean.select("doc_id").collect().map(_.getLong(0)).toSet
    // probe docs are never in the output
    assert(cleanIds.forall(_ % 97 != 0))
    assert(clean.count() < total,
      "a dup-bearing corpus must have at least one contaminated doc")
    // a doc whose exact text also appears under a probe id must be gone
    // (exact duplicates share every shingle)
    val probeTexts = docs.filter(pmod(col("doc_id"), lit(97)) === 0)
      .select("text").collect().map(_.getString(0)).toSet
    val contaminatedByCopy = docs
      .filter(pmod(col("doc_id"), lit(97)) =!= 0)
      .filter(size(split(col("text"), " ")) >= 3)
      .collect().filter(r => probeTexts.contains(r.getAs[String]("text")))
      .map(_.getAs[Long]("doc_id"))
    contaminatedByCopy.foreach(id =>
      assert(!cleanIds.contains(id), s"doc $id copies a probe text"))
  }

  test("q212 chunking: window/stride arithmetic and overlap, hand-checked") {
    import spark.implicits._
    // 60 tokens, W=32 S=24 -> starts 1/25/49 with 32/32/12 tokens;
    // 10 tokens -> one chunk of 10; empty text -> no rows
    val dir = java.nio.file.Files.createTempDirectory("graft-chunk").toString
    val toks60 = (1 to 60).map(i => s"t$i")
    Seq((1L, toks60.mkString(" ")),
      (2L, (1 to 10).map(i => s"u$i").mkString(" ")),
      (3L, ""))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val got = CurationOps.queries("q212_chunk_sliding")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(got.keySet == Set((1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L)))
    assert(got((1L, 1L))._1 == 1L && got((1L, 1L))._2 == 32L)
    assert(got((1L, 2L))._1 == 25L && got((1L, 2L))._2 == 32L)
    assert(got((1L, 3L))._1 == 49L && got((1L, 3L))._2 == 12L)
    assert(got((2L, 1L))._2 == 10L)
    // chunk identity: the middle chunk's hash is the md5 of exactly
    // tokens 25..56 — adjacent chunks overlap by 8 tokens
    val md = java.security.MessageDigest.getInstance("MD5")
    val expect = md.digest(toks60.slice(24, 56).mkString(" ")
        .getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got((1L, 2L))._3 == expect)
  }

  test("q215 boilerplate chunks: cross-document repeats only") {
    import spark.implicits._
    // docs 1+2 share an identical 40-token body -> their stride-aligned
    // chunks collide (n_docs 2); doc 3 repeats ITS OWN chunk-aligned
    // text? no — a within-doc repeat at different strides hashes apart,
    // and n_docs >= 2 excludes single-doc occurrences anyway
    val dir = java.nio.file.Files.createTempDirectory("graft-boiler").toString
    val shared = (1 to 40).map(i => s"w$i").mkString(" ")
    Seq((1L, shared), (2L, shared),
      (3L, (1 to 40).map(i => s"z$i").mkString(" ")))
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val got = CurationOps.queries("q215_boilerplate_chunks")(spark, dir)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // 40 tokens, stride 24 -> chunks at 1 (32 toks) and 25 (16 toks):
    // both shared across docs 1+2, none from doc 3
    assert(got.length == 2)
    got.foreach { case (nDocs, nOcc, first) =>
      assert(nDocs == 2L && nOcc == 2L && first == 1L)
    }
  }

  test("q213 repetition ratio: dup-3gram and top-token fractions") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-rep").toString
    Seq((1L, "a a a a"),            // 2 identical 3-grams, all-a tokens
      (2L, "a b c d e"),            // all distinct
      (3L, "x y"))                  // no 3-grams, top frac 0.5
      .toDF("doc_id", "text").write.parquet(s"$dir/documents.parquet")
    val got = CurationOps.queries("q213_rep_ratio")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
          r.getBoolean(5)))).toMap
    assert(got(1L) == ((4L, 2L, 0.5, 1.0, false)))
    assert(got(2L) == ((5L, 3L, 0.0, 0.2, true)))
    assert(got(3L) == ((2L, 0L, 0.0, 0.5, false)))
  }

  test("q209 DSIR: target-like bigrams outweigh off-target ones") {
    import spark.implicits._
    // en target speaks "a b"; de doc 10 reuses that bigram, de doc 11
    // shares nothing — importance weighting must rank 10 above 11
    val dir = java.nio.file.Files.createTempDirectory("graft-dsir").toString
    Seq((1L, "a b a b", "en"), (2L, "a b a b", "en"), (3L, "b a b", "en"),
      (10L, "a b x", "de"), (11L, "z w q", "de"))
      .toDF("doc_id", "text", "lang")
      .write.parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q209_dsir_weights")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
        r.getLong(3)))).toMap
    assert(got.keySet == Set(10L, 11L), "every non-target doc is scored")
    assert(got(10L)._2 == 2L && got(11L)._2 == 2L, "bigram counts")
    assert(got(10L)._3 > got(11L)._3,
      "the target-bigram doc must carry the higher importance weight")
  }

  test("q203 imputes the missing seventh with the present-value mean") {
    import spark.implicits._
    // ids 1..6 present (values 1..6, mean 3.5); id 7 missing (raw 100
    // must be ignored): sum_filled = 21 + 3.5
    val dir = java.nio.file.Files.createTempDirectory("graft-imp").toString
    ((1 to 6).map(i => (i.toLong, "a", i.toDouble)) :+ ((7L, "a", 100.0)))
      .toDF("event_id", "event_type", "value")
      .write.parquet(s"$dir/events.parquet")
    val r = graft.queries.CurationOps.queries("q203_impute")(spark, dir)
      .collect()
    assert(r.length == 1)
    assert((r.head.getLong(1), r.head.getLong(2), r.head.getDouble(3),
      r.head.getDouble(4)) == ((7L, 1L, 3.5, 24.5)))
  }

  test("PII scrub redacts planted emails and long digit runs") {
    import spark.implicits._
    val planted = Seq(
      (1L, "contact me at alice@example.com or 1234567 now"),
      (2L, "no pii here at all"),
      (3L, "two mails a@b.c x@y.z and 999999999"))
      .toDF("doc_id", "text").withColumn("source", lit("test"))
    val email = "[a-z0-9.]+@[a-z0-9.]+"
    val num = "[0-9]{6,}"
    val got = planted.select(col("doc_id"),
        regexp_count(col("text"), lit(email)).as("n_emails"),
        regexp_count(col("text"), lit(num)).as("n_nums"),
        regexp_replace(regexp_replace(col("text"), email, "<email>"),
          num, "<num>").as("redacted"))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getString(3))).toMap
    assert(got(1L) == ((1, 1, "contact me at <email> or <num> now")))
    assert(got(2L) == ((0, 0, "no pii here at all")))
    assert(got(3L) == ((2, 1, "two mails <email> <email> and <num>")))
    // corpus query runs clean (synthetic corpus has no PII: hash-only)
    val rows = SparkEntry.queries("q58_pii_scrub")(spark, sf)
    assert(rows.agg(sum(col("n_emails") + col("n_nums"))).head().getLong(0)
      == 0L)
  }

  test("normalization is idempotent and strips to [a-z0-9 ]") {
    import spark.implicits._
    val df = Seq("  Hello, WORLD!!  multi   space\tand-dash 42  ")
      .toDF("text")
    val norm1 = df.select(
      trim(regexp_replace(regexp_replace(lower(col("text")),
        "[^a-z0-9 ]", ""), "  +", " ")).as("n1"))
    val r = norm1.withColumn("n2",
        trim(regexp_replace(regexp_replace(lower(col("n1")),
          "[^a-z0-9 ]", ""), "  +", " ")))
      .head()
    assert(r.getString(0) == "hello world multi spaceanddash 42")
    assert(r.getString(0) == r.getString(1), "normalize must be idempotent")
    val out = SparkEntry.queries("q59_normalize")(spark, sf)
    assert(out.count() == Tables(spark, sf, "documents").count())
  }

  test("stratified sample rates track the per-language thresholds") {
    val docs = Tables(spark, sf, "documents")
    val byLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = SparkEntry.queries("q60_stratified_sample")(spark, sf)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    def rate(lang: String): Double =
      kept.getOrElse(lang, 0L).toDouble / byLang(lang)
    // md5 first-byte thresholds: 0x80/256 = 50%, 0x40 = 25%, 0x20 = 12.5%
    assert(math.abs(rate("en") - 0.50) < 0.15, s"en rate ${rate("en")}")
    assert(math.abs(rate("de") - 0.25) < 0.15, s"de rate ${rate("de")}")
    assert(math.abs(rate("zh") - 0.125) < 0.12, s"zh rate ${rate("zh")}")
    // deterministic: same sample twice
    val again = SparkEntry.queries("q60_stratified_sample")(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val first = SparkEntry.queries("q60_stratified_sample")(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == first)
  }

  test("q230 homoglyph dedup clusters Cyrillic/zero-width evasions") {
    import spark.implicits._
    val docs = Seq(
      (1L, "paypal account verify now", "en", "s", 25L),
      // Cyrillic а/е/о/р/с lookalikes of doc 1
      (2L, "p\u0430yp\u0430l \u0430ccount v\u0435rify n\u043ew", "en", "s", 25L),
      // zero-width space injected into doc 1's text
      (3L, "pay\u200Bpal account verify now", "en", "s", 26L),
      (4L, "a completely different document", "en", "s", 31L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft-q230").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.queries.CurationOps
      .queries("q230_homoglyph_dedup")(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // one cluster of the three evasion variants (3 docs, 3 distinct raw
    // texts) + one singleton
    assert(got.toSet === Set((3L, 3L, 1L), (1L, 1L, 4L)))
  }

  test("q230 skeleton is the identity on clean ASCII text") {
    import spark.implicits._
    import graft.queries.CurationOps
    val skel = org.apache.spark.sql.functions.translate(
      org.apache.spark.sql.functions.col("t"),
      CurationOps.ConfusablesFrom, CurationOps.ConfusablesTo)
    val r = Seq(("The quick brown fox 123 !@#"))
      .toDF("t").select(skel).head().getString(0)
    assert(r === "The quick brown fox 123 !@#")
  }

  test("q240 k-anonymity: small groups flagged, uniform sensitive = l_div 1") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-kanon").toString
    // group (1, A): 12 members, all positive balance -> safe but l_div 1
    // group (2, B): 3 members, mixed sign -> at-risk, l_div 2
    val rows = (1 to 12).map(i => (i.toLong, 1L, "A", 100.0)) ++
      Seq((13L, 2L, "B", 50.0), (14L, 2L, "B", -5.0), (15L, 2L, "B", -9.0))
    rows.toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val got = CurationOps.queries("q240_k_anonymity")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got((1L, "A")) === ((12L, 0L, 1L)))
    assert(got((2L, "B")) === ((3L, 1L, 2L)))
  }

  test("q249 t-closeness: hand-computed EMD on a uniform global") {
    import spark.implicits._
    // four groups of 4, each concentrated in ONE balance bucket
    // (-5 -> b0, 100 -> b1, 4000 -> b2, 7000 -> b3); the global
    // distribution is uniform (.25 each). Ordered EMD:
    //  bucket 0 group: |1-.25|+|1-.5|+|1-.75| / 3 = 1.5/3 = 0.5
    //  bucket 1 group: |0-.25|+|1-.5|+|1-.75| / 3 = 1.0/3 = 0.333333
    //  bucket 2 group: 1.0/3 ; bucket 3 group: 1.5/3
    val bal = Map(0 -> -5.0, 1 -> 100.0, 2 -> 4000.0, 3 -> 7000.0)
    val rows = for {
      g <- 0 to 3; i <- 1 to 4
    } yield ((g * 4 + i).toLong, g.toLong, s"S$g", bal(g))
    val df = rows.toDF("c_custkey", "c_nationkey", "c_mktsegment",
      "c_acctbal")
    val got = CurationOps.tCloseness(df).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(got(0L) === ((4L, 0.5, true)))
    assert(got(1L) === ((4L, 0.333333, true)))
    assert(got(2L) === ((4L, 0.333333, true)))
    assert(got(3L) === ((4L, 0.5, true)))
    // a group matching the global distribution exactly scores 0
    val balanced = rows ++ (0 to 3).map(b =>
      ((100 + b).toLong, 9L, "BAL", bal(b)))
    val g2 = CurationOps.tCloseness(balanced.toDF("c_custkey",
      "c_nationkey", "c_mktsegment", "c_acctbal")).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // global is still uniform (each bucket gains one), so BAL = uniform
    assert(g2(9L) === 0.0)
    assert(!CurationOps.tCloseness(balanced.toDF("c_custkey",
      "c_nationkey", "c_mktsegment", "c_acctbal")).collect()
      .find(_.getLong(0) == 9L).get.getBoolean(4))
  }
}
