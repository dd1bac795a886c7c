package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Shared machinery for element-wise associative-commutative reductions of
  * `array<bigint>` across rows ([[ElementwiseMin]], [[ElementwiseMax]]).
  * Per-position associativity + commutativity is what makes the reduced
  * arrays COMPOSABLE sketches: signatures computed per block/segment/
  * partition combine into the exact signature of the union of their
  * inputs, with Spark's partial aggregation doing the block merges
  * map-side.
  *
  * Rows with null input are ignored; an empty group yields null. Arrays
  * are truncated to the shortest length seen (same-k sketches always
  * match).
  */
abstract class ElementwiseReduce
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  def child: Expression

  /** Identity of [[combine]] — the value a null element reads as, so
    * nulls never affect a position and an all-null position surfaces as
    * the identity rather than a silent 0 from the raw unsafe read.
    */
  protected def neutral: Long

  /** Associative-commutative per-position reduction of a new value `x`
    * into the current value `cur` (min / max / sum).
    */
  protected def combine(x: Long, cur: Long): Long

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

  private def read(arr: ArrayData, i: Int): Long =
    if (arr.isNullAt(i)) neutral else arr.getLong(i)

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
          out(i) = combine(read(arr, i), out(i))
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
        out(i) = combine(b(i), out(i))
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
}

/** Element-wise maximum of `array<bigint>` across rows — the union
  * operation of HyperLogLog-style register arrays: max per register is
  * associative and commutative, so sketches built per block/partition
  * merge into the exact sketch of the union of their inputs (see
  * [[graft.queries.DedupQueries]]'s cardinality query).
  */
case class ElementwiseMax(child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends ElementwiseReduce {

  override def prettyName: String = "graft_elementwise_max"
  override protected def neutral: Long = Long.MinValue
  override protected def combine(x: Long, cur: Long): Long =
    if (x > cur) x else cur

  override def withNewMutableAggBufferOffset(newOffset: Int)
      : ElementwiseMax = copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int)
      : ElementwiseMax = copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression)
      : ElementwiseMax = copy(child = newChild)
}
