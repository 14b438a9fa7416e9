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

/** Static kernel behind [[MinGramMd5]] — the q30 winnowing fingerprint
  * (minimum lowercase-hex md5 over all character 8-grams) as ONE tight
  * Java loop per row. The Column-API form
  * `array_min(transform(sequence(...), i -> md5(substr(...))))` runs
  * the lambda INTERPRETED per gram (higher-order functions have no
  * codegen): ~500 boxed Catalyst invocations AND ~500 substring/digest
  * allocations per document. This kernel hashes the parent buffer in
  * place (ASCII fast path) into two reusable digest buffers — zero
  * per-gram allocation — measured 2.1 s → 0.30 s at sf0.1 (the
  * allocation/boxing tax, not MD5 arithmetic, was the cost; the
  * xxhash64 twin fell 1.6 s → 0.09 s by the same fix). Exactness: the
  * digest-byte unsigned compare IS the lexicographic order of the
  * lowercase hex strings, substring indexing is character-based
  * (UTF8String.substring) exactly like `substr`, so the result equals
  * the expression form byte-for-byte — q30's DuckDB oracle is the
  * gate, TextAnalysisSpec pins the equivalence directly.
  */
object MinGramMd5Kernel {

  private val HexChars = "0123456789abcdef".toCharArray

  def eval(s: UTF8String): UTF8String = {
    val n = s.numChars()
    if (n < 8) return null
    val md = java.security.MessageDigest.getInstance("MD5")
    // two reusable digest buffers (digest(out) instead of digest() —
    // zero per-gram allocation); ASCII array-backed strings also skip
    // the per-gram substring copy and feed the parent buffer directly
    var best = new Array[Byte](16)
    var cur = new Array[Byte](16)
    var has = false
    val ascii = s.numBytes() == n &&
      s.getBaseObject.isInstanceOf[Array[Byte]]
    val arr =
      if (ascii) s.getBaseObject.asInstanceOf[Array[Byte]] else null
    val start =
      if (ascii) (s.getBaseOffset
        - org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET).toInt
      else 0
    var i = 0
    while (i <= n - 8) {
      md.reset()
      if (ascii) md.update(arr, start + i, 8)
      else md.update(s.substring(i, i + 8).getBytes)
      md.digest(cur, 0, 16)
      if (!has || unsignedLess(cur, best)) {
        val t = best; best = cur; cur = t; has = true
      }
      i += 1
    }
    val out = new Array[Char](32)
    var j = 0
    while (j < 16) {
      out(2 * j) = HexChars((best(j) >> 4) & 0xf)
      out(2 * j + 1) = HexChars(best(j) & 0xf)
      j += 1
    }
    UTF8String.fromString(new String(out))
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }
}

/** [[MinGramMd5Kernel]]'s xxhash64 twin (text_fingerprint_xx): min
  * xxhash64 over all character 8-grams, one tight loop per row. Uses
  * Spark's own XxHash64Function (seed 42) on the substring exactly as
  * the `xxhash64()` builtin does, so the longs are bit-identical to
  * `array_min(transform(..., xxhash64(substr(...))))` — pinned by
  * TextAnalysisSpec's equivalence test. The hash is ~free here, so
  * removing the per-gram boxed lambda pays proportionally more than
  * on the md5 form.
  */
object MinGramXxKernel {

  def eval(s: UTF8String): Any = {
    val n = s.numChars()
    if (n < 8) return null
    var best = Long.MaxValue
    if (s.numBytes() == n) {
      // pure-ASCII fast path: every 8-char gram is an 8-byte slice of
      // the parent buffer — hash IN PLACE (XXH64 over (base, off, 8) is
      // exactly what xxhash64() computes on the allocated substring),
      // zero allocations per gram
      val base = s.getBaseObject
      val off = s.getBaseOffset
      var i = 0
      while (i <= n - 8) {
        val h = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(base, off + i, 8, 42L)
        if (h < best) best = h
        i += 1
      }
    } else {
      var i = 0
      while (i <= n - 8) {
        val sub = s.substring(i, i + 8)
        val h = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(sub.getBaseObject, sub.getBaseOffset,
            sub.numBytes(), 42L)
        if (h < best) best = h
        i += 1
      }
    }
    best
  }
}

/** text_fingerprint_xx's kernel form — see [[MinGramXxKernel]]. */
case class MinGramXx(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "min_gram_xx"

  override def nullSafeEval(a: Any): Any =
    MinGramXxKernel.eval(a.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      Object g_${ev.value} = graft.functions.MinGramXxKernel.eval($a);
      ${ev.isNull} = g_${ev.value} == null;
      ${ev.value} = ${ev.isNull} ? -1L : ((Long) g_${ev.value}).longValue();
    """)

  override protected def withNewChildInternal(newChild: Expression)
      : MinGramXx = copy(child = newChild)
}

/** q30's fingerprint as a custom kernel — see [[MinGramMd5Kernel]]. */
case class MinGramMd5(child: Expression) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def nullable: Boolean = true
  override def prettyName: String = "min_gram_md5"

  override def nullSafeEval(a: Any): Any =
    MinGramMd5Kernel.eval(a.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"""
      ${ev.value} = graft.functions.MinGramMd5Kernel.eval($a);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression)
      : MinGramMd5 = copy(child = newChild)
}

/** Static kernel behind [[SpanXxHashes]]: all rolling `span`-token
  * window hashes of a token array in one pass — for window i the hash
  * is xxhash64 (seed 42) over the UTF-8 bytes of the space-joined
  * tokens tk[i..i+span), BIT-IDENTICAL to
  * `transform(sequence(0, size(tk) − span), i →
  *   xxhash64(concat_ws(' ', slice(tk, i + 1, span))))`
  * (DedupSpec pins the equivalence on corpus text, empty tokens from
  * doubled spaces, and non-ASCII). The expression form pays an
  * interpreted lambda + a slice array + a concat string + a hash
  * dispatch PER WINDOW; the kernel writes each window into one
  * reusable byte buffer and hashes in place — zero per-window
  * allocation (the q30/text_fingerprint_xx finding: the allocation
  * tax, not the hash, is the cost).
  */
object SpanXxHashesKernel {

  import org.apache.spark.unsafe.Platform

  def eval(arr: org.apache.spark.sql.catalyst.util.ArrayData,
      span: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = arr.numElements()
    if (n < span)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Long])
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) { toks(i) = arr.getUTF8String(i); i += 1 }
    val out = new Array[Long](n - span + 1)
    var buf = new Array[Byte](256)
    i = 0
    while (i <= n - span) {
      var len = 0
      var j = i
      while (j < i + span) {
        val t = toks(j)
        val tb = t.numBytes()
        val need = len + tb + 1
        if (need > buf.length) {
          val nb = new Array[Byte](math.max(need, buf.length * 2))
          System.arraycopy(buf, 0, nb, 0, len)
          buf = nb
        }
        if (j > i) { buf(len) = ' '; len += 1 }
        t.writeToMemory(buf, Platform.BYTE_ARRAY_OFFSET + len)
        len += tb
        j += 1
      }
      out(i) = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, len, 42L)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Rolling span-window xxhash64 array — see [[SpanXxHashesKernel]].
  * Callers guarantee `size(child) >= span` by filter (matching the
  * expression form's sequence() domain); smaller inputs yield an
  * empty array.
  */
case class SpanXxHashes(child: Expression, span: Int)
    extends UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "span_xx_hashes"

  override def nullSafeEval(a: Any): Any =
    SpanXxHashesKernel.eval(
      a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], span)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.SpanXxHashesKernel.eval($a, $span);")

  override protected def withNewChildInternal(newChild: Expression)
      : SpanXxHashes = copy(child = newChild)
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
  def min_gram_md5(a: Column): Column =
    ColumnBridge.column(MinGramMd5(ColumnBridge.expression(a)))
  def min_gram_xx(a: Column): Column =
    ColumnBridge.column(MinGramXx(ColumnBridge.expression(a)))
  def span_xx_hashes(a: Column, span: Int): Column =
    ColumnBridge.column(SpanXxHashes(ColumnBridge.expression(a), span))
}
