package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.DecimalType

import graft.functions.Sum128

/** The 128-bit exact-sum aggregate: bit parity with the decimal-sum
  * discipline it accelerates, null/empty semantics, and the carry path
  * past 2^63 that the two-long accumulator exists for.
  */
class Sum128Spec extends SparkSpec {

  private def raw(c: org.apache.spark.sql.Column) =
    ColumnBridge.column(
      Sum128(ColumnBridge.expression(c)).toAggregateExpression())

  test("sumExact == decimal-sum cast double on lineitem measures") {
    val li = Tables(spark, sf, "lineitem")
    val dec = DecimalType(38, 8)
    val r = li.agg(
      Sum128.sumExact(col("l_extendedprice"), 2).as("fast"),
      sum(col("l_extendedprice").cast(dec)).cast("double").as("slow"),
      Sum128.sumExactProduct(col("l_extendedprice"), col("l_discount"), 2)
        .as("fastp"),
      sum((col("l_extendedprice") * col("l_discount")).cast(dec))
        .cast("double").as("slowp")).head()
    assert(r.getDouble(0) == r.getDouble(1),
      s"plain sum diverged: ${r.getDouble(0)} vs ${r.getDouble(1)}")
    assert(r.getDouble(2) == r.getDouble(3),
      s"product sum diverged: ${r.getDouble(2)} vs ${r.getDouble(3)}")
  }

  test("grouped sumExact == decimal sums, including negatives") {
    import spark.implicits._
    val df = Seq(
      ("a", 1.25), ("a", -2.50), ("a", 0.01),
      ("b", -0.99), ("b", -0.01),
      ("c", 1e9 + 0.13), ("c", 2e9 + 0.87)).toDF("k", "x")
    val got = df.groupBy("k")
      .agg(Sum128.sumExact(col("x"), 2).as("s"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(got.toSeq == Seq(("a", -1.24), ("b", -1.0), ("c", 3e9 + 1.0)),
      got.mkString(","))
  }

  test("null inputs skipped; all-null and empty groups evaluate to NULL") {
    import spark.implicits._
    val df = Seq(("a", Some(1.5)), ("a", None), ("b", None))
      .toDF("k", "x")
    val got = df.groupBy("k")
      .agg(Sum128.sumExact(col("x"), 2).as("s"))
      .orderBy("k").collect()
    assert(got(0).getDouble(1) == 1.5)
    assert(got(1).isNullAt(1), "all-null group must be NULL")
    val empty = spark.emptyDataFrame
      .select(lit(1.0).as("x")).filter(lit(false))
    assert(empty.agg(Sum128.sumExact(col("x"), 2)).head().isNullAt(0),
      "empty input must be NULL")
  }

  test("carry path: totals past 2^63 reassemble exactly (vs BigInt)") {
    import spark.implicits._
    // 40 addends near Long.MaxValue/2 across 8 partitions: lo wraps
    // repeatedly in both update and merge, hi ends non-zero
    val vals = (1 to 40).map(i => Long.MaxValue / 2 - i.toLong)
    val expected = vals.map(BigInt(_)).sum
    val df = spark.sparkContext.parallelize(vals, 8).toDF("x")
    val got = df.agg(raw(col("x")).as("s")).head().getDecimal(0)
    assert(BigInt(got.toBigInteger) == expected,
      s"got $got expected $expected")
    // and symmetrically for large-negative totals
    val negExpected = vals.map(v => BigInt(-v)).sum
    val gotNeg = df.agg(raw(-col("x")).as("s")).head().getDecimal(0)
    assert(BigInt(gotNeg.toBigInteger) == negExpected,
      s"got $gotNeg expected $negExpected")
  }

  test("sumExactProduct: factors past the 64-bit product bound raise") {
    import spark.implicits._
    // |x·10^dp| > floor(sqrt(2^63-1)) would silently wrap the per-row
    // 64-bit multiply — regression: the guard must raise, not corrupt
    val big = 4e9 // scaled by 10^0 still exceeds the ~3.04e9 bound
    val df = Seq((big, big)).toDF("x", "y")
    val e = intercept[Exception] {
      df.agg(Sum128.sumExactProduct(col("x"), col("y"), 0)).head()
    }
    assert(e.getMessage.contains("product bound")
      || Option(e.getCause).exists(_.getMessage.contains("product bound")),
      s"wanted the product-bound diagnostic, got: ${e.getMessage}")
    // in-bounds magnitudes keep the exact contract
    val ok = Seq((3.0e9, 2.0), (-2.9e9, 3.0)).toDF("x", "y")
    val r = ok.agg(Sum128.sumExactProduct(col("x"), col("y"), 0).as("p"),
      sum((col("x") * col("y")).cast(DecimalType(38, 8)))
        .cast("double").as("q")).head()
    assert(r.getDouble(0) == r.getDouble(1))
  }

  test("mixed-sign stream crossing zero keeps exactness") {
    import spark.implicits._
    val vals = Seq(Long.MaxValue / 3, -(Long.MaxValue / 3) - 7L,
      123456789L, -123456782L, 0L, -1L, 1L)
    val expected = vals.map(BigInt(_)).sum
    val df = spark.sparkContext.parallelize(vals, 4).toDF("x")
    val got = df.agg(raw(col("x")).as("s")).head().getDecimal(0)
    assert(BigInt(got.toBigInteger) == expected)
  }
}
