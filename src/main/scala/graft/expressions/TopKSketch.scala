package graft.expressions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType,
  StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitters summary as a mergeable aggregate — the
  * 100 TB answer to "what are the top domains / tokens / sources in this
  * corpus": a full `groupBy(key).count.orderBy` shuffles EVERY distinct
  * key (at web scale, billions of rows of shuffle for an answer of size
  * k), while this sketch keeps at most `k` counters per partial, merges
  * map-side under Spark's ordinary partial aggregation, and ships
  * `partitions × k` entries total.
  *
  * Guarantees (the classic MG bounds, preserved under the mergeable-
  * summaries merge rule — pointwise sum, then subtract the (k+1)-largest
  * count from every counter and drop the non-positive):
  *
  *  - every estimate UNDERCOUNTS: `est ≤ true`
  *  - by at most a 1/(k+1) fraction of the total weight:
  *    `est ≥ true − N/(k+1)`
  *  - hence every key with `true > N/(k+1)` is present in the output.
  *
  * When the number of distinct keys never exceeds `k` (bounded
  * categoricals — languages, sources, event types), no counter is ever
  * evicted and the summary is EXACT: identical to the full group-count,
  * which is what the oracle gate replays. The sketch's output order
  * (estimate desc, key asc) is deterministic in the exact regime; in the
  * eviction regime estimates are merge-order-dependent within the bounds
  * above, as with any MG implementation.
  *
  * Null keys are ignored; an empty group yields an empty array.
  */
abstract class MisraGriesAgg
  extends TypedImperativeAggregate[java.util.HashMap[String, Long]]
  with UnaryLike[Expression] {

  def k: Int

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false

  /** The concrete input type check (key column vs sketch column). */
  protected def inputOk(dt: DataType): Boolean

  protected def inputWant: String

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (k < 1)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"$prettyName requires k >= 1, got $k")
    else if (inputOk(child.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"$prettyName requires $inputWant, got " +
          child.dataType.simpleString)

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  /** Mergeable-summaries shrink: subtract the (k+1)-largest count from
    * everything, drop the non-positive — at most k survive and each
    * counter lost no more than under sequential MG.
    */
  protected final def shrinkToK(a: java.util.HashMap[String, Long])
      : Unit = if (a.size > k) {
    val counts = new Array[Long](a.size)
    var i = 0
    val cIt = a.values().iterator()
    while (cIt.hasNext) { counts(i) = cIt.next(); i += 1 }
    java.util.Arrays.sort(counts)
    val cut = counts(a.size - k - 1) // (k+1)-th largest
    val it = a.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue <= cut) it.remove() else e.setValue(e.getValue - cut)
    }
  }

  override def merge(a: java.util.HashMap[String, Long],
      b: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    val bIt = b.entrySet().iterator()
    while (bIt.hasNext) {
      val e = bIt.next()
      a.put(e.getKey, a.getOrDefault(e.getKey, 0L) + e.getValue)
    }
    shrinkToK(a)
    a
  }

  override def eval(buffer: java.util.HashMap[String, Long]): Any = {
    val entries = new Array[(String, Long)](buffer.size)
    var i = 0
    val it = buffer.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      entries(i) = (e.getKey, e.getValue)
      i += 1
    }
    val sorted = entries.sortBy { case (key, est) => (-est, key) }
    new GenericArrayData(sorted.map { case (key, est) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(key), est))
    })
  }

  override def serialize(buffer: java.util.HashMap[String, Long])
      : Array[Byte] = {
    var bytes = 4
    val sIt = buffer.entrySet().iterator()
    val entries = new Array[(Array[Byte], Long)](buffer.size)
    var i = 0
    while (sIt.hasNext) {
      val e = sIt.next()
      val kb = e.getKey.getBytes(StandardCharsets.UTF_8)
      entries(i) = (kb, e.getValue)
      bytes += 4 + kb.length + 8
      i += 1
    }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(entries.length)
    entries.foreach { case (kb, c) =>
      bb.putInt(kb.length); bb.put(kb); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte])
      : java.util.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val out = new java.util.HashMap[String, Long](n * 2)
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](bb.getInt())
      bb.get(kb)
      out.put(new String(kb, StandardCharsets.UTF_8), bb.getLong())
      i += 1
    }
    out
  }

}

/** Build an MG summary from a STRING KEY column — one unit of weight
  * per row (see [[MisraGriesAgg]] for the bounds).
  */
case class MisraGriesTopK(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends MisraGriesAgg {

  override def prettyName: String = "graft_topk_mg"

  override protected def inputOk(dt: DataType): Boolean =
    dt == StringType

  override protected def inputWant: String = "a string key"

  override def update(buffer: java.util.HashMap[String, Long],
      input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String].toString
      val cur = buffer.get(key)
      if (cur != 0L || buffer.containsKey(key)) buffer.put(key, cur + 1L)
      else if (buffer.size < k) buffer.put(key, 1L)
      else {
        // MG eviction: the new key and every counter give up one unit —
        // k+1 units of weight leave the summary, which is what makes the
        // undercount at most N/(k+1)
        val it = buffer.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int)
      : MisraGriesTopK = copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int)
      : MisraGriesTopK = copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression)
      : MisraGriesTopK = copy(child = newChild)
}

/** Re-merge STORED MG summaries (`array<struct<key, est>>` rows, the
  * output shape of [[MisraGriesTopK]]) into one — what makes the
  * sketch a table-maintainable object: per-batch/per-shard summaries
  * written by a stream or a partitioned job fold into the corpus
  * summary with the same mergeable-summaries rule and therefore the
  * same bounds. Null rows are ignored.
  */
case class MisraGriesMergeSketches(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends MisraGriesAgg {

  override def prettyName: String = "graft_topk_merge"

  override protected def inputOk(dt: DataType): Boolean = dt match {
    case ArrayType(StructType(fields), _) if fields.length == 2 =>
      fields(0).dataType == StringType && fields(1).dataType == LongType
    case _ => false
  }

  override protected def inputWant: String =
    "array<struct<key: string, est: bigint>>"

  override def update(buffer: java.util.HashMap[String, Long],
      input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      var i = 0
      while (i < arr.numElements()) {
        val row = arr.getStruct(i, 2)
        val key = row.getUTF8String(0).toString
        buffer.put(key, buffer.getOrDefault(key, 0L) + row.getLong(1))
        i += 1
      }
      shrinkToK(buffer)
    }
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int)
      : MisraGriesMergeSketches = copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int)
      : MisraGriesMergeSketches = copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression)
      : MisraGriesMergeSketches = copy(child = newChild)
}
