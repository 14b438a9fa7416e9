package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.queries.PipelineOps

class PipelineOpsSpec extends SparkSpec {

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("packing matches the sequential concat-and-chunk reference") {
    import spark.implicits._
    val docs = (1L to 300L).map(i => (i, Seq.fill((i % 17 + 1).toInt)("w").mkString(" ")))
      .toDF("doc_id", "text")
    val got = PipelineOps.packSequences(docs, ctx = 64L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // sequential reference: global (md5, doc_id) order, running offset
    var off = 0L
    val expected = (1L to 300L).map(i => (md5hex(i.toString), i))
      .sorted.map { case (_, i) =>
        val n = i % 17 + 1
        val pack = off / 64L
        off += n
        i -> ((n, pack))
      }.toMap
    assert(got == expected)
    // conservation: every doc present exactly once
    assert(got.keySet == (1L to 300L).toSet)
  }

  test("packing is invariant to input partitioning") {
    import spark.implicits._
    val docs = (1L to 200L).map(i => (i, Seq.fill((i % 11 + 1).toInt)("t").mkString(" ")))
      .toDF("doc_id", "text")
    val a = PipelineOps.packSequences(docs, 32L)
      .collect().map(r => (r.getLong(0), r.getLong(2))).sorted
    val b = PipelineOps.packSequences(docs.repartition(7), 32L)
      .collect().map(r => (r.getLong(0), r.getLong(2))).sorted
    assert(a.sameElements(b))
  }

  test("repetition stats flag repetitive docs and pass diverse ones") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spam ham spam ham spam ham spam ham"), // one bigram dominates
      (2L, "the quick brown fox jumps over lazy dogs"), // all distinct
      (3L, "x y z x y z x y z x y z")) // duplicated trigrams
      .toDF("doc_id", "text")
    val got = PipelineOps.repetitionStats(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(!got(1L)._3, "alternating bigram doc must be dropped")
    assert(got(1L)._1 > 0.5)
    assert(got(2L)._3, "distinct doc must be kept")
    assert(got(2L)._2 == 0.0)
    assert(!got(3L)._3)
    assert(got(3L)._2 > 0.5, "repeated trigrams must be flagged")
  }

  test("repetition stats are a narrow map-only plan (no shuffle)") {
    val plan = PipelineOps
      .repetitionStats(Tables(spark, sf, "documents"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }

  test("domain mix keeps rate-proportional samples deterministically") {
    import spark.implicits._
    // src0 over-represented (w=1, tiny target share -> low rate);
    // src19 under-represented (w=20 -> rate capped at 1, keep all)
    val docs = ((1L to 800L).map(i => (i, "src0", "en")) ++
      (1001L to 1040L).map(i => (i, "src19", "de")))
      .toDF("doc_id", "source", "lang")
    val kept = PipelineOps.domainMix(docs).collect()
    val bySrc = kept.groupBy(_.getString(1)).view.mapValues(_.length).toMap
    // src19: rate = min(1, 20/210 * 840/40) = 1 -> all 40 kept
    assert(bySrc("src19") == 40)
    // src0: thrn = (1 * 840 * 65536) div (210 * 800) = 327 -> ~0.5% kept
    val expectedSrc0 = (1L to 800L).count(i =>
      ("0" + md5hex(i.toString).take(4)).compareTo("0" + "%04x".format(327)) < 0)
    assert(bySrc.getOrElse("src0", 0) == expectedSrc0)
    // deterministic: a second run returns the identical id set
    val again = PipelineOps.domainMix(docs).collect()
    assert(kept.map(_.getLong(0)).sorted.sameElements(again.map(_.getLong(0)).sorted))
  }

  test("dup spans count exactly the windows shared across docs") {
    import spark.implicits._
    // doc 1: tokens a1..a12; doc 2 copies a3..a12 (10 tokens) then diverges;
    // doc 3 fully distinct
    val a = (1 to 12).map(i => s"a$i")
    val docs = Seq(
      (1L, a.mkString(" ")),
      (2L, (a.drop(2) ++ Seq("zz1", "zz2")).mkString(" ")),
      (3L, (1 to 12).map(i => s"c$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = PipelineOps.dupSpans(docs)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // doc1 has 5 spans (12-8+1); spans starting at a3..a5 (3 of them)
    // also exist in doc2's copied run of 10 tokens
    assert(got(1L) == ((5L, 3L)))
    // doc2: 12 tokens -> 5 spans, the first 3 (pure a3..a12 windows) shared
    assert(got(2L) == ((5L, 3L)))
    assert(got(3L) == ((5L, 0L)))
  }

  test("span removal splices exactly the covered tokens") {
    import spark.implicits._
    // doc 1: x1..x4 a1..a8 y1..y4 — the a-run is an 8-token span shared
    // with doc 2; tokens covered by ANY shared span are dropped. Spans
    // overlapping the a-run but containing x/y tokens are unique to
    // doc 1, so exactly a1..a8 goes; doc 3 is untouched.
    val a = (1 to 8).map(i => s"a$i")
    val docs = Seq(
      (1L, ((1 to 4).map(i => s"x$i") ++ a ++ (1 to 4).map(i => s"y$i"))
        .mkString(" ")),
      (2L, (a ++ (1 to 8).map(i => s"z$i")).mkString(" ")),
      (3L, (1 to 10).map(i => s"c$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = PipelineOps.removeDupSpans(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got(1L) == ((16L, 8L,
      ((1 to 4).map(i => s"x$i") ++ (1 to 4).map(i => s"y$i")).mkString(" "))))
    assert(got(2L) == ((16L, 8L, (1 to 8).map(i => s"z$i").mkString(" "))))
    assert(got(3L) == ((10L, 0L, (1 to 10).map(i => s"c$i").mkString(" "))))
    // the cleaned corpus carries no shared 8-token span: measuring the
    // output with q70's machinery reports zero duplicated spans
    val again = PipelineOps.dupSpans(
      PipelineOps.removeDupSpans(docs)
        .select(col("doc_id"), col("clean_text").as("text")))
      .agg(org.apache.spark.sql.functions.sum("n_dup_spans")).head()
    assert(again.isNullAt(0) || again.getLong(0) == 0L)
  }

  test("span removal on the corpus leaves no shared spans and is idempotent") {
    val docs = Tables(spark, sf, "documents")
    val cleaned = PipelineOps.removeDupSpans(docs)
      .select(col("doc_id"), col("clean_text").as("text"))
    // no 8-token window of the cleaned corpus appears in 2+ docs
    val residual = PipelineOps.dupSpans(cleaned)
      .agg(org.apache.spark.sql.functions.sum("n_dup_spans")).head()
    assert(residual.isNullAt(0) || residual.getLong(0) == 0L,
      s"cleaned corpus still shares spans: $residual")
    // a second pass removes nothing
    val second = PipelineOps.removeDupSpans(cleaned)
      .agg(org.apache.spark.sql.functions.sum("n_removed")).head()
    assert(second.getLong(0) == 0L)
  }

  test("map facets compute the expected scalars") {
    import spark.implicits._
    val ev = Seq((7L, "click", 42L, """{"k": 9}"""))
      .toDF("event_id", "event_type", "user_id", "props")
    val r = PipelineOps.mapFacets(ev).collect()(0)
    assert(r.getInt(1) == 3)
    assert(r.getString(2) == "k,type,uid")
    assert(r.getString(3) == "9")
    assert(!r.getBoolean(4))
    assert(r.getString(5) == "CLICK")
    assert(r.getInt(6) == 1)
    assert(r.getInt(7) == 4)
    assert(r.getString(8) == "42")
  }

  test("q232 FFD packs whole docs under capacity with overflow flagged") {
    import spark.implicits._
    import graft.queries.PipelineOps
    // single shard (shards = 1) so placements are hand-checkable:
    // sorted desc: 120(overflow), 60, 50, 40, 30 with ctx = 100
    // -> bin0 singleton(120, overflow), then 60 opens bin1(rem 40),
    // 50 opens bin2(rem 50), 40 fits bin1(rem 0), 30 fits bin2(rem 20)
    val docs = Seq((1L, 60L), (2L, 40L), (3L, 120L), (4L, 50L), (5L, 30L))
      .map { case (id, n) => (id, Seq.fill(n.toInt)("w").mkString(" ")) }
      .toDF("doc_id", "text")
    val got = PipelineOps.packBins(docs, ctx = 100L, shards = 1)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getBoolean(4))).toMap
    assert(got === Map(3L -> (0L, true), 1L -> (1L, false),
      4L -> (2L, false), 2L -> (1L, false), 5L -> (2L, false)))
  }

  test("q232 on driver data: capacity respected, docs intact, waste bounded") {
    import graft.queries.PipelineOps
    val docs = Tables(spark, sf, "documents")
    val packed = PipelineOps.packBins(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3),
        r.getBoolean(4)))
    // every doc appears exactly once (no splitting, no loss)
    assert(packed.map(_._1).distinct.length.toLong === docs.count())
    // non-overflow bins respect capacity
    packed.filterNot(_._5).groupBy(p => (p._3, p._4)).foreach {
      case (_, ds) => assert(ds.map(_._2).sum <= 2048L)
    }
    // waste vs the concat-split lower bound: FFD uses at most
    // 2x the minimal bin count on any instance (loose static check)
    val total = packed.map(_._2).sum
    val nBins = packed.map(p => (p._3, p._4)).distinct.length
    val lower = (total + 2047) / 2048
    assert(nBins <= 2 * lower + 16, s"bins $nBins vs lower $lower")
  }

  test("held-out perplexity: hand-computed smoothing, unseen floor at 1/V") {
    import spark.implicits._
    // train (even ids): "a b a b" -> c2(a,b)=2,(b,a)=1; "c c" -> (c,c)=1
    // contexts c1: a=2, b=1, c=1; vocab V = {a,b,c} = 3
    val docs = Seq(
      (0L, "a b a b"), (2L, "c c"),
      (1L, "a b c"), (3L, "z z z"), (5L, "w"))
      .toDF("doc_id", "text")
    val got = PipelineOps.heldoutPerplexity(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    // doc 5 has one token -> no bigrams -> absent
    assert(got.keySet === Set(1L, 3L))
    // doc 1: p(a,b)=(2+1)/(2+3)=0.6; p(b,c)=(0+1)/(1+3)=0.25
    val ll1 = BigDecimal((math.log(0.6) + math.log(0.25)) / 2)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L)._1 === 2L)
    assert(got(1L)._2 === ll1)
    assert(got(1L)._3 === BigDecimal(math.exp(-ll1))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // doc 3: fully novel transitions hit the 1/V floor: p = 1/3 twice
    val ll3 = BigDecimal(math.log(1.0 / 3))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(3L)._1 === 2L)
    assert(got(3L)._2 === ll3)
  }

  test("q271 ctx sweep: hand-computed truncation/bins/padding at 4 ctxs") {
    import spark.implicits._
    def doc(id: Long, n: Int) = (id, Seq.fill(n)("x").mkString(" "))
    val docs = Seq(doc(1, 10), doc(2, 40), doc(3, 100))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-ctx").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q271_ctx_sweep")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    // lengths 10/40/100, total 150:
    //  ctx 32: lose 8+68, keep 74 -> bins ceil(74/32)=3, pad 22/96
    //  ctx 64: lose 36, keep 114 -> bins 2, pad 78/192 = .40625
    //  ctx 128: keep all -> bins 2, pad 234/384 = .609375
    //  ctx 256: keep all -> bins 1, pad 618/768 = .8046875 (midpoint!)
    assert(got === Map(
      32L -> ((2L, 76L, 506667L, 3L, 229167L)),
      64L -> ((1L, 36L, 240000L, 2L, 406250L)),
      128L -> ((0L, 0L, 0L, 2L, 609375L)),
      256L -> ((0L, 0L, 0L, 1L, 804688L))))
  }

  test("q276 Hamilton quotas: largest remainders, exact budget") {
    import spark.implicits._
    def doc(id: Long, src: String, n: Int) =
      (id, Seq.fill(n)("x").mkString(" "), src)
    val docs = Seq(doc(1, "a", 10), doc(2, "b", 20), doc(3, "c", 30),
      doc(4, "d", 45)).toDF("doc_id", "text", "source")
    val dir = java.nio.file.Files.createTempDirectory("graft-ham").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q276_hamilton_quota")(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getBoolean(3), r.getLong(4)))).toMap
    // T=105, S=1000: bases 95/190/285/428 (sum 998), remainders
    // 25/50/75/60 -> the two leftover slots go to c (75) and d (60)
    assert(got === Map(
      "a" -> ((95L, false, 95L)), "b" -> ((190L, false, 190L)),
      "c" -> ((285L, true, 286L)), "d" -> ((428L, true, 429L))))
    assert(got.values.map(_._3).sum === 1000L) // exact by construction
  }

  test("q262 water-fill: hand-computed level, exact budget, no-cap path") {
    import spark.implicits._
    def doc(id: Long, src: String, n: Int) =
      (id, Seq.fill(n)("x").mkString(" "), src)
    val docs = Seq(doc(1, "a", 10), doc(2, "b", 20), doc(3, "c", 40),
      doc(4, "d", 100)).toDF("doc_id", "text", "source")
    // total 170, B = floor(0.6*170) = 102; sorted [10,20,40,100]:
    // i=3 binds ((102-30)/2 = 36 < 40) -> L=36, alloc 10+20+36+36 = 102
    val got = PipelineOps.waterFillBudget(docs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3), r.getLong(4))))
      .toMap
    assert(got === Map(
      "a" -> ((10L, 10L, false, 36L)), "b" -> ((20L, 20L, false, 36L)),
      "c" -> ((40L, 36L, true, 36L)), "d" -> ((100L, 36L, true, 36L))))
    assert(got.values.map(_._2).sum === 102L) // budget exactly exhausted
    // frac = 1.0: budget covers everything -> level = max source, no caps
    val all = PipelineOps.waterFillBudget(docs, frac = 1.0).collect()
      .map(r => (r.getLong(2), r.getBoolean(3), r.getLong(4)))
    assert(all.forall(x => !x._2 && x._3 === 100L))
    assert(all.map(_._1).sum === 170L)
  }

  test("q258 Kneser-Ney: hand-computed discounts, continuation backoff") {
    import spark.implicits._
    // train (even ids): "a b a b" -> types (a,b):2, (b,a):1; "c c" ->
    // (c,c):1. T = 3 types, V = {a,b,c} = 3, Pcont(w) = (n1bw+1)/7.
    // ctx: a -> c1=2 n1fw=1; b -> 1,1; c -> 1,1. cont: a,b,c -> 1 each.
    val docs = Seq(
      (0L, "a b a b"), (2L, "c c"),
      (1L, "a b c"), (3L, "z z z"), (5L, "w"))
      .toDF("doc_id", "text")
    val got = PipelineOps.kneserNeyPerplexity(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3)))).toMap
    assert(got.keySet === Set(1L, 3L))
    def lnM(p: Double): Long = math.round(math.log(p) * 1e6)
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 1 "a b c":
    //  (a,b) seen ctx: max(2-.75,0)/2 + (.75*1/2)*(2/7) = .625+.75/7
    //  (b,c) unseen bigram, seen ctx: 0 + (.75*1/1)*(2/7)
    val p1 = 0.625 + 0.375 * (2.0 / 7); val p2 = 0.75 * (2.0 / 7)
    val ll1 = r6((lnM(p1) + lnM(p2)) / 2e6)
    assert(got(1L)._1 === 2L)
    assert(got(1L)._2 === ll1)
    assert(got(1L)._3 === BigDecimal(math.exp(-ll1))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // doc 3 "z z z": unseen context AND word -> Pcont floor 1/7 twice;
    // the continuation floor (1/(T+V+1)) replaces q239's 1/V
    val ll3 = r6(lnM(1.0 / 7) / 1e6)
    assert(got(3L)._1 === 2L)
    assert(got(3L)._2 === ll3)
    // the KN point: a frequent continuation (b after a) scores ABOVE
    // the raw discounted MLE alone, and the unseen-transition floor is
    // continuation-mass, not a uniform 1/V
    assert(p1 > (2 - 0.75) / 2.0 && p2 > 1.0 / 7)
  }
}
