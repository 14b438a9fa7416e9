package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Deflate helper behind [[DeflateLen]] — static so generated code can
  * call it directly. A fresh Deflater per row keeps it thread-safe across
  * codegen'd task threads; level is pinned so the byte count is
  * deterministic for a given JDK zlib.
  */
object Compress {
  val Level = 6 // zlib default, pinned explicitly for determinism

  def deflateLen(bytes: Array[Byte]): Int = {
    val d = new java.util.zip.Deflater(Level, true)
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](8192)
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    d.end()
    total
  }
}

/** Deflate-compressed byte length of a string — the compression-ratio
  * quality signal of the large-corpus curation literature (Gopher /
  * RefinedWeb use it to drop both boilerplate, which compresses too
  * well, and gibberish, which doesn't compress at all). No Spark
  * built-in exposes a compressor, so this is a custom kernel; it stays
  * inside WholeStageCodegen (the generated code calls the static helper
  * — the JNI zlib call dominates, not the dispatch). Ratio semantics
  * are left to the caller: this returns the raw compressed length.
  */
case class DeflateLen(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "deflate_len"

  override def nullSafeEval(a: Any): Any =
    Compress.deflateLen(a.asInstanceOf[UTF8String].getBytes)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Compress.deflateLen($a.getBytes());")

  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)
}

/** Morton (Z-order) interleave of two 32-bit keys into one 64-bit key —
  * the space-filling-curve clustering primitive: sorting/range-
  * partitioning a 100 TB table by `interleave_bits(a, b)` co-locates
  * rows that are close in BOTH dimensions, so min/max parquet footer
  * stats prune scans filtered on either column (the standard multi-
  * dimensional layout technique). Bit-exact integer arithmetic — the
  * DuckDB oracle reproduces the same shift/mask cascade.
  */
case class InterleaveBits(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "interleave_bits"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = InterleaveBits.spread(a.asInstanceOf[Long])
    val y = InterleaveBits.spread(b.asInstanceOf[Long])
    x | (y << 1)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.InterleaveBits.spread($a) | " +
        s"(graft.functions.InterleaveBits.spread($b) << 1);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): InterleaveBits =
    copy(left = newLeft, right = newRight)
}

object InterleaveBits {
  /** Spread the low 32 bits of x to the even bit positions of a long. */
  def spread(v: Long): Long = {
    var x = v & 0xFFFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }
}

/** NFC Unicode normalization — THE canonicalization pass ahead of
  * exact-hash dedup on real web text: visually identical strings with
  * composed vs decomposed code points ("é" as U+00E9 vs U+0065 U+0301)
  * hash apart and defeat q20-style dedup unless normalized first. No
  * Spark built-in exposes java.text.Normalizer; the kernel stays inside
  * WholeStageCodegen (the normalize call dominates, not dispatch). NFC
  * (not NFKC) so the transform is canonical-only and round-trip-safe;
  * DuckDB's nfc_normalize implements the same UAX#15 form, which makes
  * the operator oracle-checkable.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.StringType
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(a: Any): Any =
    NfcNormalize.nfc(a.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.NfcNormalize.nfc($a);")

  override protected def withNewChildInternal(newChild: Expression)
    : NfcNormalize = copy(child = newChild)
}

object NfcNormalize {
  /** Static so generated code calls it directly; skips the copy when
    * the input is already normalized ASCII-fast-path (Normalizer
    * checks internally, but the isNormalized probe avoids the rebuild).
    */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str,
        java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** Column-API surface for the text/layout kernels. */
object textkernels {
  def deflate_len(a: Column): Column =
    ColumnBridge.column(DeflateLen(ColumnBridge.expression(a)))
  def interleave_bits(a: Column, b: Column): Column =
    ColumnBridge.column(
      InterleaveBits(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def nfc_normalize(a: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(a)))
}
