package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType}

/** Bloom-filter bit math shared by the aggregate, the expression, and
  * generated code (Scala object ⇒ static forwarders, so Janino-compiled
  * code calls `graft.functions.BloomUtil.contains(...)` directly).
  * Double hashing [Kirsch & Mitzenmacher ESA'06]: k probe positions from
  * two splitmix64-style mixes, h_i = h1 + i·h2 mod m — same guarantees
  * as k independent hashes.
  */
object BloomUtil {

  def mix1(v: Long): Long = {
    var z = v + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Second hash, forced odd so probe strides cycle the whole table. */
  def mix2(v: Long): Long = mix1(v ^ 0xc2b2ae3d27d4eb4fL) | 1L

  def set(bits: Array[Long], numHashes: Int, v: Long): Unit = {
    val m = bits.length.toLong * 64L
    val h1 = mix1(v); val h2 = mix2(v)
    var i = 0
    while (i < numHashes) {
      val idx = java.lang.Long.remainderUnsigned(h1 + i * h2, m)
      bits((idx >>> 6).toInt) |= (1L << (idx & 63L))
      i += 1
    }
  }

  def contains(bits: Array[Long], numHashes: Int, v: Long): Boolean = {
    val m = bits.length.toLong * 64L
    val h1 = mix1(v); val h2 = mix2(v)
    var i = 0
    while (i < numHashes) {
      val idx = java.lang.Long.remainderUnsigned(h1 + i * h2, m)
      if ((bits((idx >>> 6).toInt) & (1L << (idx & 63L))) == 0L) return false
      i += 1
    }
    true
  }

  def toLongs(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  def toBytes(bits: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(bits.length * 8)
    bits.foreach(bb.putLong)
    bb.array()
  }

  /** Slow path for a non-literal filter column: parse then probe. */
  def containsBytes(bytes: Array[Byte], numHashes: Int, v: Long): Boolean =
    contains(toLongs(bytes), numHashes, v)
}

/** bloom_agg(h, numBits, numHashes): build a Bloom filter over a group's
  * 64-bit hash values — O(numBits/8) bytes of state per partial buffer,
  * merge = bitwise OR (commutative/associative, so the result is
  * bit-identical under any partitioning). Output is the raw bitset as
  * BINARY: KB–MB of metadata summarizing an arbitrarily large set, built
  * for the "summarize the probe set, prune the corpus" decontamination
  * shape where broadcasting the set itself would not scale.
  */
case class BloomAgg(
    child: Expression, numBits: Int, numHashes: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(numBits > 0 && numBits % 64 == 0, "numBits must be a multiple of 64")
  require(numHashes > 0)

  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "bloom_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](numBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomUtil.set(buf, numHashes, v.asInstanceOf[Long])
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = BloomUtil.toBytes(buf)

  override def serialize(buf: Array[Long]): Array[Byte] =
    BloomUtil.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] =
    BloomUtil.toLongs(bytes)

  override def withNewMutableAggBufferOffset(o: Int): BloomAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): BloomAgg =
    copy(child = c(0))
}

/** bloom_contains(bloom, h): membership probe. When the filter side is a
  * literal (the built bloom embedded in the plan — the intended use) the
  * bitset is parsed ONCE and shared via a codegen reference object, so
  * the per-row cost is numHashes word probes inside WholeStageCodegen;
  * a non-literal filter column falls back to parse-per-row.
  */
case class BloomContains(left: Expression, right: Expression, numHashes: Int)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_contains"

  @transient private lazy val cachedBits: Array[Long] =
    if (left.foldable) {
      val v = left.eval(null)
      if (v == null) null else BloomUtil.toLongs(v.asInstanceOf[Array[Byte]])
    } else null

  override def nullSafeEval(a: Any, b: Any): Any = {
    val bits =
      if (cachedBits != null) cachedBits
      else BloomUtil.toLongs(a.asInstanceOf[Array[Byte]])
    BloomUtil.contains(bits, numHashes, b.asInstanceOf[Long])
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (cachedBits != null) {
      val bitsRef = ctx.addReferenceObj("bloomBits", cachedBits, "long[]")
      nullSafeCodeGen(ctx, ev, (_, b) =>
        s"${ev.value} = graft.functions.BloomUtil.contains($bitsRef, $numHashes, $b);")
    } else {
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.BloomUtil.containsBytes($a, $numHashes, $b);")
    }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContains =
    copy(left = newLeft, right = newRight)
}

object bloom {
  /** Bloom filter over a group's long hashes (binary column). */
  def bloom_agg(h: Column, numBits: Int, numHashes: Int): Column =
    ColumnBridge.column(
      BloomAgg(ColumnBridge.expression(h), numBits, numHashes)
        .toAggregateExpression())

  /** Probe a built bloom (as literal bytes) for a long hash column. */
  def bloom_contains(bloomBytes: Array[Byte], h: Column,
      numHashes: Int): Column =
    ColumnBridge.column(
      BloomContains(Literal(bloomBytes, BinaryType),
        ColumnBridge.expression(h), numHashes))
}
