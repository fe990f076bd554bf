package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** Bounded per-group top-k aggregate: keeps the k smallest rows by
  * the struct's natural (field-order) ordering in a size-k heap.
  *
  * The idiomatic alternatives both break at 100 TB: a window
  * `row_number()` sorts every group in full (state ∝ group size), and
  * `slice(sort_array(collect_list(...)))` materializes the whole
  * group in the aggregation buffer. This TypedImperativeAggregate
  * caps state at k rows per group AND participates in partial
  * aggregation — per-partition heaps combine map-side, so the shuffle
  * carries ≤ k rows per (partition, group), exactly like a partial
  * sum. Extension tier (b) of the ladder: a custom aggregate, no
  * planner changes needed.
  *
  * Determinism: include a unique tie-break field in the struct; equal
  * structs are interchangeable so the result is stable as a multiset.
  *
  * Result: array<struct> sorted ascending. For "largest k", negate or
  * invert the leading field(s).
  */
case class TopKStructs(child: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.PriorityQueue[UnsafeRow]] {

  require(k > 0, "k must be positive")

  private def structType: StructType = child.dataType.asInstanceOf[StructType]

  @transient private lazy val ordering: Ordering[InternalRow] =
    TypeUtils.getInterpretedOrdering(structType).asInstanceOf[Ordering[InternalRow]]
  // max-heap: root is the LARGEST of the kept k, evicted first
  @transient private lazy val heapOrdering: java.util.Comparator[UnsafeRow] =
    (a: UnsafeRow, b: UnsafeRow) => ordering.compare(b, a)
  @transient private lazy val toUnsafe: UnsafeProjection = UnsafeProjection.create(structType)

  override def createAggregationBuffer(): java.util.PriorityQueue[UnsafeRow] =
    new java.util.PriorityQueue[UnsafeRow](k + 1, heapOrdering)

  private def insert(buf: java.util.PriorityQueue[UnsafeRow], row: UnsafeRow): Unit = {
    if (buf.size < k) {
      buf.add(row.copy())
    } else if (ordering.compare(row, buf.peek()) < 0) {
      buf.poll()
      buf.add(row.copy())
    }
  }

  override def update(buf: java.util.PriorityQueue[UnsafeRow],
                      input: InternalRow): java.util.PriorityQueue[UnsafeRow] = {
    val v = child.eval(input)
    if (v != null) insert(buf, toUnsafe(v.asInstanceOf[InternalRow]))
    buf
  }

  override def merge(buf: java.util.PriorityQueue[UnsafeRow],
                     other: java.util.PriorityQueue[UnsafeRow]): java.util.PriorityQueue[UnsafeRow] = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next())
    buf
  }

  override def eval(buf: java.util.PriorityQueue[UnsafeRow]): Any = {
    val arr = buf.toArray(new Array[UnsafeRow](buf.size))
    java.util.Arrays.sort(arr, (a: UnsafeRow, b: UnsafeRow) => ordering.compare(a, b))
    new GenericArrayData(arr.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: java.util.PriorityQueue[UnsafeRow]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val r = it.next()
      val bytes = r.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[UnsafeRow] = {
    val in = ByteBuffer.wrap(bytes)
    val n = in.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = in.getInt
      val rowBytes = new Array[Byte](len)
      in.get(rowBytes)
      val row = new UnsafeRow(structType.size)
      row.pointTo(rowBytes, len)
      buf.add(row)
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def withNewMutableAggBufferOffset(o: Int): TopKStructs =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKStructs =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(child = c.head)
}

object TopKStructs {
  import GraftColumnBridge.{column, expression}
  /** Aggregate Column: k smallest structs (natural order), sorted. */
  def topKStructs(structCol: Column, k: Int): Column =
    column(TopKStructs(expression(structCol), k).toAggregateExpression())
}
