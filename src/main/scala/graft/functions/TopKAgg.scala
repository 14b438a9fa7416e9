package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, RowOrdering, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** top_k(struct, k): the k smallest struct values per group under the
  * struct's natural field-order ascending ordering (encode "largest
  * first" by negating the lead key), returned as a sorted array.
  *
  * This is EXACT top-k-per-key as a real aggregation: each task keeps a
  * k-bounded sorted buffer per key (partial aggregation = map-side
  * combine), the shuffle carries at most k rows per (key, mapper), and
  * merge is a k-way bounded insert. Compare the window form (q6): no
  * per-partition sort of the full input, no second shuffle, and no hot
  * reducer when the key count is small — the shape that survives a
  * 3-key × 10⁹-row table.
  */
case class TopKAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArrayBuffer[UnsafeRow]] {

  require(k > 0, "top_k requires k > 0")

  private def structType: StructType = child.dataType.asInstanceOf[StructType]

  @transient private lazy val ordering =
    RowOrdering.createNaturalAscendingOrdering(
      structType.fields.map(_.dataType).toIndexedSeq)
  @transient private lazy val proj = UnsafeProjection.create(structType)

  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "top_k"
  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): ArrayBuffer[UnsafeRow] =
    new ArrayBuffer[UnsafeRow](k + 1)

  /** Keep `buf` sorted ascending with ≤ k elements (k is small — the
    * linear insertion scan beats heap constant factors).
    */
  private def insert(buf: ArrayBuffer[UnsafeRow], row: UnsafeRow): Unit =
    if (buf.length < k || ordering.lt(row, buf.last)) {
      var i = 0
      while (i < buf.length && ordering.lteq(buf(i), row)) i += 1
      buf.insert(i, row)
      if (buf.length > k) buf.remove(buf.length - 1)
    }

  override def update(buf: ArrayBuffer[UnsafeRow],
      input: InternalRow): ArrayBuffer[UnsafeRow] = {
    val v = child.eval(input)
    if (v != null) insert(buf, proj(v.asInstanceOf[InternalRow]).copy())
    buf
  }

  override def merge(a: ArrayBuffer[UnsafeRow],
      b: ArrayBuffer[UnsafeRow]): ArrayBuffer[UnsafeRow] = {
    b.foreach(insert(a, _))
    a
  }

  override def eval(buf: ArrayBuffer[UnsafeRow]): Any =
    new GenericArrayData(buf.toArray[Any])

  override def serialize(buf: ArrayBuffer[UnsafeRow]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach { r =>
      val bytes = r.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[UnsafeRow] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new ArrayBuffer[UnsafeRow](k + 1)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val rowBytes = new Array[Byte](len)
      bb.get(rowBytes)
      val row = new UnsafeRow(structType.size)
      row.pointTo(rowBytes, len)
      buf += row
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): TopKAgg =
    copy(child = c(0))
}

object topk {
  /** k smallest struct values per group, sorted ascending
    * (array<struct>). Negate the lead field for "largest first".
    */
  def top_k(packed: Column, k: Int): Column =
    ColumnBridge.column(
      TopKAgg(ColumnBridge.expression(packed), k).toAggregateExpression())
}
