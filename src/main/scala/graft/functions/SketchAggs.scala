package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom TypedImperativeAggregate sketches (SURVEY.md §4.2): the minhash
  * signature and simhash bit-sum folds computed in ONE tight JVM buffer
  * per group instead of 64 separate agg columns. The 64-column form
  * generates enormous Janino code (compile time dominated the dedup
  * queries at small scale) and churns 520-byte UnsafeRows through the
  * partial/final agg; these keep the plan tiny and the update loop
  * branch-free. Hash math is identical to the column form:
  * h_i = h1 XOR rotl(h2, i).
  */
abstract class LongBufferAgg
    extends TypedImperativeAggregate[Array[Long]] {

  /** Buffer length. Abstract member (NOT a constructor parameter: the
    * first non-serializable superclass in the Expression chain must have
    * a no-arg constructor for Java serialization, so this class cannot
    * take constructor arguments).
    */
  def n: Int

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(n * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(n)(bb.getLong)
  }
}

/** minhash_sig(h1, h2): n-element minhash signature over a group, with
  * per-element hashes derived by double hashing h_i = h1 ^ rotl(h2, i).
  */
case class MinHashSigAgg(
    left: Expression, right: Expression, n: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends LongBufferAgg {

  override def children: Seq[Expression] = Seq(left, right)
  override def prettyName: String = "minhash_sig"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(n)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val h1v = left.eval(input)
    val h2v = right.eval(input)
    if (h1v != null && h2v != null) {
      val h1 = h1v.asInstanceOf[Long]
      val h2 = h2v.asInstanceOf[Long]
      var i = 0
      while (i < n) {
        val v = h1 ^ java.lang.Long.rotateLeft(h2, i)
        if (v < buf(i)) buf(i) = v
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < n) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def withNewMutableAggBufferOffset(o: Int): MinHashSigAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashSigAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): MinHashSigAgg =
    copy(left = c(0), right = c(1))
}

/** oph_sig(h, n): one-permutation-hashing minhash signature [Li, Owen,
  * Zhang NIPS'12; densification: Shrivastava & Li ICML'14]. Instead of n
  * independent min-folds (n min-updates per member, as MinHashSigAgg),
  * each member hash lands in ONE slot (low bits mod n) and updates only
  * that slot's min — O(1) per member, an n× cheaper update loop. Empty
  * slots are densified at eval by borrowing the next non-empty slot
  * clockwise, offset by a hop-dependent constant so different empty
  * patterns don't fake agreement. Collision probability per slot stays
  * ≈ Jaccard, so the LSH banding math is unchanged.
  */
case class OphSigAgg(
    child: Expression, n: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends LongBufferAgg {

  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "oph_sig"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(n)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val hv = child.eval(input)
    if (hv != null) {
      val h = hv.asInstanceOf[Long]
      val slot = (((h ^ (h >>> 32)) % n) + n).toInt % n
      if (h < buf(slot)) buf(slot) = h
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < n) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (buf(i) != Long.MaxValue) out(i) = buf(i)
      else {
        var t = 1
        while (t < n && buf((i + t) % n) == Long.MaxValue) t += 1
        out(i) =
          if (buf((i + t) % n) == Long.MaxValue) Long.MaxValue // no members
          else buf((i + t) % n) + t * 0x9E3779B97F4A7C15L      // JVM wrap ok
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def withNewMutableAggBufferOffset(o: Int): OphSigAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): OphSigAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): OphSigAgg =
    copy(child = c(0))
}

/** simhash_sig(h): 64-bit simhash of a group — per-bit sign of
  * Σ (bit set ? +1 : -1) over the members' 64-bit hashes, packed into
  * one long (element 0 of the returned array).
  */
case class SimHashSigAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends LongBufferAgg {

  override def n: Int = 64

  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "simhash_sig"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val hv = child.eval(input)
    if (hv != null) {
      val h = hv.asInstanceOf[Long]
      var k = 0
      while (k < 64) {
        buf(k) += (((h >>> k) & 1L) * 2L) - 1L // +1 if bit set else -1
        k += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  /** Pack sign bits into one long (two's-complement OR of disjoint bits). */
  override def eval(buf: Array[Long]): Any = {
    var sig = 0L
    var k = 0
    while (k < 64) { if (buf(k) > 0) sig |= (1L << k); k += 1 }
    new GenericArrayData(Array(sig))
  }

  override def withNewMutableAggBufferOffset(o: Int): SimHashSigAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SimHashSigAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): SimHashSigAgg =
    copy(child = c(0))
}

/** simhash_sig_w(h, w): weighted 64-bit simhash [Charikar STOC'02, the
  * weighted-feature form] — per-bit sign of Σ w·(bit set ? +1 : -1),
  * packed like SimHashSigAgg. With idf-style weights, ubiquitous
  * shingles contribute almost nothing to the bit sums, so the signature
  * tracks the discriminative content — the sign-noise plain simhash
  * suffers on ~100-feature documents drops accordingly.
  */
case class WeightedSimHashSigAgg(
    left: Expression, right: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]] {

  override def children: Seq[Expression] = Seq(left, right)
  override def prettyName: String = "simhash_sig_w"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Double] = new Array[Double](64)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val hv = left.eval(input)
    val wv = right.eval(input)
    if (hv != null && wv != null) {
      val h = hv.asInstanceOf[Long]
      val w = wv.asInstanceOf[Double]
      var k = 0
      while (k < 64) {
        buf(k) += (((h >>> k) & 1L) * 2L - 1L) * w
        k += 1
      }
    }
    buf
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  /** Pack sign bits into one long, as SimHashSigAgg does. */
  override def eval(buf: Array[Double]): Any = {
    var sig = 0L
    var k = 0
    while (k < 64) { if (buf(k) > 0) sig |= (1L << k); k += 1 }
    new GenericArrayData(Array(sig))
  }

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(64 * 8)
    buf.foreach(bb.putDouble)
    bb.array()
  }
  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getDouble)
  }

  override def withNewMutableAggBufferOffset(o: Int): WeightedSimHashSigAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): WeightedSimHashSigAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): WeightedSimHashSigAgg =
    copy(left = c(0), right = c(1))
}

/** approx_top_k(item, capacity, k): Misra-Gries heavy hitters — at most
  * `capacity` counters per partial buffer; an item with true frequency
  * > n/capacity is guaranteed present, counts are underestimates by at
  * most n/capacity, and when capacity exceeds the distinct count the
  * summary is EXACT (how the q46 oracle checks it). The counter map is
  * the entire shuffle payload — the aggregation is map-side combined, so
  * a 10⁹-row scan ships `capacity` entries per mapper, the canonical
  * "hot n-grams over the corpus" pass at 100 TB.
  */
case class FreqItemsAgg(
    child: Expression, capacity: Int, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[
      scala.collection.mutable.HashMap[UTF8String, Long]] {

  require(capacity > 0 && k > 0 && k <= capacity)

  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "approx_top_k"
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("item", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer()
      : scala.collection.mutable.HashMap[UTF8String, Long] =
    scala.collection.mutable.HashMap.empty

  private def add(buf: scala.collection.mutable.HashMap[UTF8String, Long],
      item: UTF8String, n: Long): Unit =
    buf.get(item) match {
      case Some(c) => buf.update(item, c + n)
      case None if buf.size < capacity => buf.update(item.copy(), n)
      case None =>
        // Misra-Gries decrement: subtract the smallest count that empties
        // at least one slot (generalized for weighted merge inserts)
        val dec = math.min(n, buf.values.min)
        val dead = buf.iterator.filter(_._2 <= dec).map(_._1).toSeq
        buf.mapValuesInPlace((_, c) => c - dec)
        dead.foreach(buf.remove)
        if (n > dec) add(buf, item, n - dec)
    }

  override def update(
      buf: scala.collection.mutable.HashMap[UTF8String, Long],
      input: InternalRow): scala.collection.mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[UTF8String], 1L)
    buf
  }

  override def merge(
      a: scala.collection.mutable.HashMap[UTF8String, Long],
      b: scala.collection.mutable.HashMap[UTF8String, Long])
      : scala.collection.mutable.HashMap[UTF8String, Long] = {
    b.foreach { case (item, n) => add(a, item, n) }
    a
  }

  /** top k entries by (count desc, item asc) — deterministic ties. */
  override def eval(
      buf: scala.collection.mutable.HashMap[UTF8String, Long]): Any = {
    val top = buf.toSeq
      .sortBy { case (item, c) => (-c, item) }(
        Ordering.Tuple2(Ordering.Long, Ordering.ordered[UTF8String]))
      .take(k)
      .map { case (item, c) =>
        InternalRow(item, c): Any
      }
    new GenericArrayData(top.toArray)
  }

  override def serialize(
      buf: scala.collection.mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val entries = buf.toSeq
    val size = 4 + entries.map(e => 4 + e._1.numBytes() + 8).sum
    val bb = ByteBuffer.allocate(size)
    bb.putInt(entries.length)
    entries.foreach { case (item, c) =>
      val bytes = item.getBytes
      bb.putInt(bytes.length); bb.put(bytes); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(
      bytes: Array[Byte]): scala.collection.mutable.HashMap[UTF8String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = scala.collection.mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len); bb.get(b)
      buf.update(UTF8String.fromBytes(b), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): FreqItemsAgg =
    copy(child = c(0))
}

/** count_min(h, d, w): Count-Min sketch [Cormode & Muthukrishnan,
  * J. Algorithms '05] — a d×w counter grid; each member's 64-bit hash
  * increments ONE counter per row, at an index derived by xor-rotate
  * (no multiply, so the SQL-side estimator can mirror it without
  * ANSI overflow). Estimates (min over the d rows) are upward-biased
  * only: true ≤ est ≤ true + (e/w)·N with probability 1 − e^{−d}.
  * O(d·w) fixed state, mergeable by elementwise add — the shuffle-safe
  * frequency counter for corpus-scale streams where a value→count map
  * (the exact-percentile hazard) would grow with cardinality. `w` must
  * be a power of two (mask indexing, mirrored by StatsOps' estimator).
  */
case class CountMinAgg(
    child: Expression, d: Int, w: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends LongBufferAgg {
  require((w & (w - 1)) == 0, "count_min width must be a power of two")

  override def n: Int = d * w
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "count_min"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](n)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val hv = child.eval(input)
    if (hv != null) {
      val h = hv.asInstanceOf[Long]
      var i = 0
      while (i < d) {
        val idx = ((h ^ java.lang.Long.rotateLeft(h, 11 * i + 5))
          & (w - 1)).toInt
        buf(i * w + idx) += 1
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < n) { a(i) += b(i); i += 1 }
    a
  }

  override def withNewMutableAggBufferOffset(o: Int): CountMinAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): CountMinAgg =
    copy(child = c(0))
}

object sketches {
  /** n-element minhash signature column (array<long>). */
  def minhash_sig(h1: Column, h2: Column, n: Int): Column =
    ColumnBridge.column(
      MinHashSigAgg(ColumnBridge.expression(h1), ColumnBridge.expression(h2),
        n).toAggregateExpression())
  /** n-element one-permutation-hashing signature column (array<long>). */
  def oph_sig(h: Column, n: Int): Column =
    ColumnBridge.column(
      OphSigAgg(ColumnBridge.expression(h), n).toAggregateExpression())
  /** Misra-Gries top-k heavy hitters (array<struct<item,cnt>>). */
  def approx_top_k(item: Column, capacity: Int, k: Int): Column =
    ColumnBridge.column(
      FreqItemsAgg(ColumnBridge.expression(item), capacity, k)
        .toAggregateExpression())
  /** d×w Count-Min sketch column (array<long>, row-major). */
  def count_min(h: Column, d: Int, w: Int): Column =
    ColumnBridge.column(
      CountMinAgg(ColumnBridge.expression(h), d, w).toAggregateExpression())
  /** 64-bit simhash signature column (array<long> of length 1). */
  def simhash_sig(h: Column): Column =
    ColumnBridge.column(
      SimHashSigAgg(ColumnBridge.expression(h)).toAggregateExpression())
  /** Weighted 64-bit simhash signature column (array<long> of length 1). */
  def simhash_sig_w(h: Column, w: Column): Column =
    ColumnBridge.column(
      WeightedSimHashSigAgg(ColumnBridge.expression(h),
        ColumnBridge.expression(w)).toAggregateExpression())
}
