package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.functions.{col, round => sround}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Exact 128-bit integer SUM as a native DeclarativeAggregate — the
  * fast path for the engine's decimal-exact aggregation discipline.
  *
  * The q1/dsum contract (sums routed through DECIMAL so results are
  * bit-identical cross-engine) pays a steep runtime tax in Spark:
  * a `sum(cast(x AS DECIMAL(38,8)))` buffer is a non-compact decimal,
  * so every row allocates a BigDecimal and re-serializes the buffer
  * field (measured 3.9 s vs 0.2 s for the same 14-moment pass in
  * double at sf0.1 — a 20× penalty). This aggregate keeps the exact
  * contract at long-sum speed: the input is the value scaled to an
  * integer (`x · 10^dp` — exact when x carries ≤ dp decimal digits),
  * and the accumulator is a signed 128-bit integer held in TWO LONG
  * buffer slots (hi, lo) — fixed-width, mutable, codegen-friendly.
  * All per-row work is long adds plus the classic carry-out formula
  * `((a & b) | ((a | b) & ~s)) >>> 63` [Warren, Hacker's Delight §2-13];
  * the only decimal arithmetic is the per-GROUP reassembly
  * `hi · 2^64 + unsigned(lo)` in evaluate.
  *
  * Overflow bound: |true sum| < 2^127 / 10^dp — astronomically beyond
  * any 100 TB aggregate (at dp=4 that is ~1.7 × 10^34). Adds wrap in
  * LEGACY eval mode by construction (the 128-bit carry chain is the
  * point), so ANSI mode never throws on the hot path.
  *
  * Null semantics mirror [[aggregate.Sum]]: null inputs are skipped,
  * an all-null (or empty) group evaluates to NULL.
  */
case class Sum128(child: Expression)
    extends DeclarativeAggregate with UnaryLike[Expression] {

  override def dataType: DataType = DecimalType(38, 0)
  override def nullable: Boolean = true
  override def prettyName: String = "sum128"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"sum128 needs a LONG input (the pre-scaled integer value), " +
          s"got ${child.dataType.catalogString}")

  private lazy val hi = AttributeReference("hi", LongType, nullable = false)()
  private lazy val lo = AttributeReference("lo", LongType, nullable = false)()
  private lazy val seen =
    AttributeReference("seen", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(hi, lo, seen)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(false))

  /** Wrapping long add — LEGACY mode so ANSI never throws; the 128-bit
    * carry chain relies on two's-complement wraparound.
    */
  private def wadd(a: Expression, b: Expression): Expression =
    Add(a, b, EvalMode.LEGACY)

  /** Carry-out of the unsigned add a + b = s (0 or 1). */
  private def carry(a: Expression, b: Expression, s: Expression): Expression =
    ShiftRightUnsigned(
      BitwiseOr(BitwiseAnd(a, b), BitwiseAnd(BitwiseOr(a, b), BitwiseNot(s))),
      Literal(63))

  /** Sign extension of a signed 64-bit addend into the high word. */
  private def signExt(x: Expression): Expression = ShiftRight(x, Literal(63))

  override lazy val updateExpressions: Seq[Expression] = {
    val x = If(IsNull(child), Literal(0L), child)
    val newLo = wadd(lo, x)
    Seq(
      wadd(wadd(hi, signExt(x)), carry(lo, x, newLo)),
      newLo,
      Or(seen, IsNotNull(child)))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val newLo = wadd(lo.left, lo.right)
    Seq(
      wadd(wadd(hi.left, hi.right), carry(lo.left, lo.right, newLo)),
      newLo,
      Or(seen.left, seen.right))
  }

  override lazy val evaluateExpression: Expression = {
    // exact reassembly, decimal arithmetic once per group:
    //   sum = hi · 2^64 + (lo < 0 ? lo + 2^64 : lo)
    val two64 = Literal(Decimal(BigDecimal(2).pow(64), 38, 0),
      DecimalType(38, 0))
    val hiD = Cast(hi, DecimalType(38, 0))
    val loD = If(LessThan(lo, Literal(0L)),
      Add(Cast(lo, DecimalType(38, 0)), two64, EvalMode.LEGACY),
      Cast(lo, DecimalType(38, 0)))
    val total = Add(
      Multiply(hiD, two64, EvalMode.LEGACY), loD, EvalMode.LEGACY)
    If(seen, Cast(total, DecimalType(38, 0)), Literal(null, DecimalType(38, 0)))
  }

  override protected def withNewChildInternal(newChild: Expression): Sum128 =
    copy(child = newChild)
}

object Sum128 {

  /** Exact sum of a double column carrying at most `dp` decimal digits,
    * returned as DOUBLE — bit-identical to
    * `CAST(SUM(CAST(x AS DECIMAL(38,dp))) AS DOUBLE)` while every
    * per-row operation stays a codegen'd long add. The input is scaled
    * to integer units (exact for ≤ dp-digit values), summed in 128 bits,
    * and divided back once per group in decimal (exact: the unscaled
    * total is an integer, the quotient has ≤ dp fractional digits).
    */
  def sumExact(x: Column, dp: Int): Column = {
    require(dp >= 0 && dp <= 9, s"dp must be in [0, 9], got $dp")
    val factor = math.pow(10, dp).toLong
    val scaled = sround(x * factor, 0).cast("long")
    val total = ColumnBridge.column(
      Sum128(ColumnBridge.expression(scaled)).toAggregateExpression())
    (total / BigDecimal(factor)).cast("double")
  }

  /** Largest scaled-factor magnitude whose pairwise product provably
    * fits a signed 64-bit long: floor(sqrt(2^63 − 1)). The 128-bit
    * accumulator protects the SUM; the per-row product is still a
    * 64-bit multiply, so each factor is bounds-checked against this.
    */
  private val ProductFactorBound = 3037000499L

  /** [[sumExact]] over the product of two columns each carrying at most
    * `dp` decimal digits (the moment-matrix workhorse: Σxy with x, y
    * exact at dp digits is exact at 2·dp digits). The per-row product
    * is a 64-bit multiply, which would WRAP silently in legacy eval for
    * large-magnitude inputs — so each scaled factor is guarded against
    * [[ProductFactorBound]] (|x·10^dp| ≤ ~3.04e9, i.e. |x| ≤ ~3e5 at
    * dp=4) and the row RAISES with a diagnostic instead of corrupting
    * the exact sum. The guard is one codegen'd compare per row; callers
    * with larger magnitudes should lower dp or pre-scale.
    */
  def sumExactProduct(x: Column, y: Column, dp: Int): Column = {
    require(dp >= 0 && dp <= 4, s"dp must be in [0, 4], got $dp")
    val factor = math.pow(10, dp).toLong
    def scaled(c: Column, n: String): Column = {
      // guard the PRE-CAST double: the legacy double→long cast CLAMPS
      // out-of-range values, and abs(Long.MinValue) is Long.MinValue
      // (negative) — a post-cast abs() check would wave the extreme
      // negative end straight through the bound
      val r = sround(c * factor, 0)
      org.apache.spark.sql.functions.when(
        org.apache.spark.sql.functions.abs(r)
          > ProductFactorBound.toDouble,
        org.apache.spark.sql.functions.raise_error(
          org.apache.spark.sql.functions.concat(
            org.apache.spark.sql.functions.lit(
              s"sumExactProduct: |$n|*10^$dp exceeds the exact 64-bit " +
                s"product bound $ProductFactorBound, got "),
            r.cast("string"))).cast("long")
      ).otherwise(r.cast("long"))
    }
    val sx = scaled(x, "x")
    val sy = scaled(y, "y")
    val total = ColumnBridge.column(
      Sum128(ColumnBridge.expression(sx * sy)).toAggregateExpression())
    (total / BigDecimal(factor * factor)).cast("double")
  }
}
