package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, ByteType, DataType,
  IntegerType, LongType, ShortType, StringType}
import org.apache.spark.util.sketch.BloomFilter

/** Grouped bloom-filter aggregate — serialized
  * [[org.apache.spark.util.sketch.BloomFilter]] bytes per GROUP, which
  * is what lets a partitioned write build EVERY leaf directory's bloom
  * sidecar in ONE Spark job (`groupBy(dir).agg(SidecarBloomAgg(col))`)
  * instead
  * of one `df.stat.bloomFilter` job per partition value — the same
  * driver-sequential-jobs elimination the grouped min/max aggregation
  * did for skip-stats
  * ([[graft.io.dsv2.GraftPartitionedWrite.installLeafStats]]).
  *
  * Element encoding matches `df.stat.bloomFilter` (and therefore the
  * consult side, [[graft.io.BloomSidecar.mightContain]]): integral
  * values enter as `putLong`, strings as their UTF-8 bytes. Nulls are
  * skipped (a null is never a point-probe value). Merging partial
  * filters is the sketch's own `mergeInPlace` — capacity and fpp are
  * per-QUERY literals, so every group's buffers are bit-compatible by
  * construction (the shared capacity is the price of one-job grouping:
  * small leaves get a lower fpp than asked, never higher).
  */
case class SidecarBloomAgg(child: Expression, expectedItems: Long, fpp: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] with UnaryLike[Expression] {

  override def prettyName: String = "graft_sidecar_bloom_agg"
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType | ShortType | ByteType | StringType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an integral or string column, got " +
          other.simpleString)
    }

  // null buffer = "no input seen yet": a group that only ever saw null
  // values evals to null (no sidecar entry) rather than an empty filter
  override def createAggregationBuffer(): BloomFilter = null

  private def put(bf: BloomFilter, v: Any): Unit = v match {
    case u: org.apache.spark.unsafe.types.UTF8String =>
      bf.putBinary(u.getBytes)
    case l: Long => bf.putLong(l)
    case i: Int => bf.putLong(i.toLong)
    case sh: Short => bf.putLong(sh.toLong)
    case b: Byte => bf.putLong(b.toLong)
    case other => throw new IllegalStateException(
      s"unreachable input ${other.getClass} after type check")
  }

  override def update(buffer: BloomFilter, input: InternalRow)
      : BloomFilter = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val bf =
        if (buffer != null) buffer
        else BloomFilter.create(expectedItems, fpp)
      put(bf, v)
      bf
    }
  }

  override def merge(a: BloomFilter, b: BloomFilter): BloomFilter =
    if (a == null) b
    else if (b == null) a
    else a.mergeInPlace(b)

  override def eval(buffer: BloomFilter): Any =
    if (buffer == null) null
    else {
      val out = new java.io.ByteArrayOutputStream()
      buffer.writeTo(out)
      out.toByteArray
    }

  override def serialize(buffer: BloomFilter): Array[Byte] =
    if (buffer == null) Array.empty[Byte]
    else {
      val out = new java.io.ByteArrayOutputStream()
      buffer.writeTo(out)
      out.toByteArray
    }

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    if (bytes.isEmpty) null
    else BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): SidecarBloomAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): SidecarBloomAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression)
      : SidecarBloomAgg = copy(child = newChild)
}
