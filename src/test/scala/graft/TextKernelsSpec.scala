package graft

import org.apache.spark.sql.functions._

import graft.functions.textkernels._
import graft.functions.{Compress, InterleaveBits}

class TextKernelsSpec extends SparkSpec {

  test("interleave_bits matches a bit-by-bit reference") {
    def reference(x: Long, y: Long): Long = {
      var z = 0L
      (0 until 32).foreach { i =>
        z |= ((x >> i) & 1L) << (2 * i)
        z |= ((y >> i) & 1L) << (2 * i + 1)
      }
      z
    }
    // hand-checked: x=3 (bits 0,1 -> even 0,2), y=5 (bits 0,2 -> odd 1,5)
    assert((InterleaveBits.spread(3) | (InterleaveBits.spread(5) << 1)) == 39)
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val x = rnd.nextLong() & 0xFFFFFFFFL
      val y = rnd.nextLong() & 0xFFFFFFFFL
      val got = InterleaveBits.spread(x) | (InterleaveBits.spread(y) << 1)
      assert(got == reference(x, y), s"mismatch at ($x, $y)")
    }
  }

  test("interleave_bits agrees across codegen and interpreted paths") {
    import spark.implicits._
    val df = Seq((3L, 5L), (1023L, 0L), (123456L, 654321L)).toDF("x", "y")
    val cg = df.select(interleave_bits(col("x"), col("y")))
      .collect().map(_.getLong(0)).toSeq
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interp = df.select(interleave_bits(col("x"), col("y")))
        .collect().map(_.getLong(0)).toSeq
      assert(cg == interp && cg.head == 39L)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("z-order key bounds both dimensions within a bucket") {
    // any two points in the same z>>12 bucket differ by < 64 in each dim
    import spark.implicits._
    val pts = for (x <- 0L until 256L by 7; y <- 0L until 256L by 5)
      yield (x, y)
    val rows = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        shiftright(interleave_bits(col("x"), col("y")), 12).as("bkt"))
      .groupBy("bkt")
      .agg((max(col("x")) - min(col("x"))).as("dx"),
        (max(col("y")) - min(col("y"))).as("dy"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(1) < 64 && r.getLong(2) < 64,
        s"bucket ${r.getLong(0)} extent ${r.getLong(1)}x${r.getLong(2)}")
    }
  }

  test("nfc_normalize folds decomposed sequences onto composed ones") {
    import spark.implicits._
    val composed = "café"            // é as U+00E9
    val decomposed = "café"         // e + combining acute
    val df = Seq((1L, composed), (2L, decomposed), (3L, "plain ascii"))
      .toDF("id", "s")
      .select(col("id"), col("s"), nfc_normalize(col("s")).as("n"))
    val got = df.collect().map(r => r.getLong(0) ->
      ((r.getString(1), r.getString(2)))).toMap
    assert(got(1L)._2 == composed, "already-NFC input must be unchanged")
    assert(got(2L)._1 != composed && got(2L)._2 == composed,
      "decomposed input must canonicalize to the composed form")
    assert(got(3L)._2 == "plain ascii")
    // the dedup payoff: both spellings now share one exact hash
    val hashes = df.select(md5(col("n"))).collect().map(_.getString(0))
    assert(hashes(0) == hashes(1))
  }

  test("nfc_normalize agrees across codegen and interpreted paths, idempotent") {
    import spark.implicits._
    val df = Seq("café", "café", "Å", "Å", "x")
      .toDF("s")
    val cg = df.select(nfc_normalize(col("s"))).collect()
      .map(_.getString(0)).toSeq
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interp = df.select(nfc_normalize(col("s"))).collect()
        .map(_.getString(0)).toSeq
      assert(cg == interp)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    val twice = df.select(nfc_normalize(nfc_normalize(col("s"))))
      .collect().map(_.getString(0)).toSeq
    assert(twice == cg, "NFC is idempotent")
    // Å: the angstrom SIGN (U+212B) canonically maps to A-with-ring
    assert(cg(2) == cg(3))
  }

  test("deflate_len: repetitive text compresses far better than varied") {
    val boiler = "spam " * 400
    val varied = (1 to 400).map(i => (i * 2654435761L).toHexString).mkString(" ")
    val lb = Compress.deflateLen(boiler.getBytes("UTF-8"))
    val lv = Compress.deflateLen(varied.getBytes("UTF-8"))
    assert(lb < boiler.length / 10, s"boilerplate barely compressed: $lb")
    assert(lv > varied.length / 3, s"high-entropy text over-compressed: $lv")
    // deterministic across calls
    assert(lb == Compress.deflateLen(boiler.getBytes("UTF-8")))
  }

  test("deflate_len agrees across codegen and interpreted paths") {
    import spark.implicits._
    val df = Seq("the quick brown fox", "aaaaaaaaaaaaaaaaaaaa", "")
      .toDF("text")
    val cg = df.select(deflate_len(col("text")))
      .collect().map(_.getInt(0)).toSeq
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interp = df.select(deflate_len(col("text")))
        .collect().map(_.getInt(0)).toSeq
      assert(cg == interp)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    // scala-side helper agrees with the SQL expression path
    assert(cg.head ==
      Compress.deflateLen("the quick brown fox".getBytes("UTF-8")))
  }

  test("q78 ratios are sane: positive, bounded, compressing on average") {
    val rows = SparkEntry.queries("q78_compress_ratio")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ratio = r.getAs[Double]("ratio")
      // tiny documents can round to 1.0 (deflate framing overhead)
      assert(ratio > 0.0 && ratio <= 1.2, s"doc ${r.get(0)} ratio $ratio")
    }
    val mean = rows.map(_.getAs[Double]("ratio")).sum / rows.length
    assert(mean < 0.95, s"word corpus should compress on average: $mean")
  }

  test("sorted_intersect_count equals array_intersect on sorted arrays") {
    import spark.implicits._
    import graft.functions.SortedIntersectCount
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { _ =>
      val a = Seq.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong)
        .distinct.sorted
      val b = Seq.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong)
        .distinct.sorted
      (a, b, a.toSet.intersect(b.toSet).size)
    }
    val df = rows.toDF("a", "b", "want")
    val got = df.select(
      SortedIntersectCount(col("a"), col("b")).as("got"), col("want"))
    assert(got.filter(col("got") =!= col("want")).isEmpty)
    // empty and disjoint edges
    val edge = Seq(
      (Seq.empty[Long], Seq(1L, 2L), 0),
      (Seq(1L, 3L), Seq.empty[Long], 0),
      (Seq(1L, 2L), Seq(3L, 4L), 0),
      (Seq(Long.MinValue, 0L, Long.MaxValue),
        Seq(Long.MinValue, Long.MaxValue), 2)).toDF("a", "b", "want")
    assert(edge.select(SortedIntersectCount(col("a"), col("b"))
      .as("got"), col("want"))
      .filter(col("got") =!= col("want")).isEmpty)
  }

  test("sorted_intersect_count agrees across codegen and interpreted") {
    import spark.implicits._
    import graft.functions.SortedIntersectCount
    val df = Seq(
      (Seq(1L, 5L, 9L, 12L), Seq(2L, 5L, 9L, 20L)),
      (Seq(-4L, 0L, 7L), Seq(-4L, 0L, 7L))).toDF("a", "b")
    val cg = df.select(SortedIntersectCount(col("a"), col("b")))
      .collect().map(_.getInt(0)).toSeq
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interp = df.select(SortedIntersectCount(col("a"), col("b")))
        .collect().map(_.getInt(0)).toSeq
      assert(cg == interp && cg == Seq(2, 3))
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }
}
