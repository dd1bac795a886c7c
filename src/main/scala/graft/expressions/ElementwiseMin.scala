package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Element-wise minimum of `array<bigint>` values across rows — the merge
  * operation that makes MinHash signatures COMPOSABLE: min is associative
  * and commutative per position, so signatures computed per block/segment/
  * partition combine into the exact signature of the union of their shingle
  * sets. That is the property that lets a 100 TB corpus be minhashed
  * block-by-block (map-side partial aggregation — this aggregate supports
  * partial merge like any Spark agg) and merged without ever materializing
  * a document's full shingle set in one place.
  *
  * Rows with null input are ignored; an empty group yields null. Arrays are
  * truncated to the shortest length seen (same-k signatures always match).
  */
case class ElementwiseMin(child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def prettyName: String = "graft_elementwise_min"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure(s"$prettyName requires array<bigint>, got " +
            other.simpleString)
    }

  override def createAggregationBuffer(): Array[Long] = null

  // null ELEMENTS act as the identity of min (Long.MaxValue) — they never
  // beat a real value, and an all-null position surfaces as MaxValue
  // rather than a silent 0 from the raw unsafe read
  private def read(arr: ArrayData, i: Int): Long =
    if (arr.isNullAt(i)) Long.MaxValue else arr.getLong(i)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val arr = v.asInstanceOf[ArrayData]
      if (buffer == null)
        Array.tabulate(arr.numElements())(read(arr, _))
      else {
        val n = math.min(buffer.length, arr.numElements())
        val out = if (buffer.length == n) buffer
          else java.util.Arrays.copyOf(buffer, n)
        var i = 0
        while (i < n) {
          val x = read(arr, i)
          if (x < out(i)) out(i) = x
          i += 1
        }
        out
      }
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    if (a == null) b
    else if (b == null) a
    else {
      val n = math.min(a.length, b.length)
      val out = if (a.length == n) a else java.util.Arrays.copyOf(a, n)
      var i = 0
      while (i < n) {
        if (b(i) < out(i)) out(i) = b(i)
        i += 1
      }
      out
    }

  override def eval(buffer: Array[Long]): Any =
    if (buffer == null) null else new GenericArrayData(buffer)

  // A leading marker byte distinguishes "no input seen" (null buffer) from
  // a legitimate zero-length array buffer — without it the two collapse on
  // the partial-aggregation shuffle and the result becomes plan-dependent.
  override def serialize(buffer: Array[Long]): Array[Byte] =
    if (buffer == null) Array.empty[Byte]
    else {
      val bb = ByteBuffer.allocate(1 + buffer.length * 8)
      bb.put(1.toByte)
      buffer.foreach(bb.putLong)
      bb.array()
    }

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    if (bytes.isEmpty) null
    else {
      val bb = ByteBuffer.wrap(bytes)
      bb.get()
      Array.fill((bytes.length - 1) / 8)(bb.getLong())
    }

  override def withNewMutableAggBufferOffset(newOffset: Int)
      : ElementwiseMin = copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int)
      : ElementwiseMin = copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression)
      : ElementwiseMin = copy(child = newChild)
}
