package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType,
  StructField, StructType}

/** Bounded per-group top-k as a MERGEABLE aggregate — the scale-safe
  * replacement for `row_number().over(Window.partitionBy(qid))` candidate
  * cuts in the similarity/search paths.
  *
  * The window formulation funnels each group's ENTIRE candidate fan into
  * one reducer and sorts it there: for a probe-fan scan (probes × corpus
  * candidate rows) that is ≤ #probes reducers each sorting ~corpus rows —
  * the one funnel shape that survives at 100 TB only because the fan is
  * deliberately skinny. This aggregate keeps a k-entry binary heap per
  * group per partition, merges heaps map-side under Spark's ordinary
  * partial aggregation (planned as ObjectHashAggregate), and ships exactly
  * `groups × k` fixed-width entries through the exchange — the candidate
  * cut costs one streaming pass, no per-group sort of the fan, no reducer
  * ever sees more than the partial heaps.
  *
  * Ordering contract (bit-identical to the windows it replaces): entries
  * are ranked by (score `asc`-or-`desc`, id asc); the result array is
  * emitted in rank order, so `posexplode` yields `rk = pos + 1` equal to
  * the `row_number()` it replaces. Scores may be LONG (fixed-point
  * distances/scores) or DOUBLE (cosines): doubles are carried through the
  * heap in Lucene-style sortable-bits encoding (order-isomorphic to
  * `java.lang.Double.compare`, bijective, so the output decodes to the
  * exact input double; -0.0 is normalized to 0.0 to match SQL comparison
  * semantics). Descending order negates bitwise (`~enc`), which is
  * bijective and order-reversing — no overflow at Long.MinValue the way
  * arithmetic negation has. Rows with a null score or id are ignored,
  * matching a window over non-null candidates.
  */
final class TopKHeap(val k: Int) {
  var size: Int = 0
  // max-heap on (key, id) lexicographic: root = worst retained entry
  val keys: Array[Long] = new Array[Long](k)
  val ids: Array[Long] = new Array[Long](k)

  @inline private def gt(k1: Long, i1: Long, k2: Long, i2: Long): Boolean =
    k1 > k2 || (k1 == k2 && i1 > i2)

  private def siftDown(start: Int): Unit = {
    var i = start
    val key = keys(i); val id = ids(i)
    var done = false
    while (!done) {
      val l = 2 * i + 1
      val r = l + 1
      var m = i
      var mk = key; var mi = id
      if (l < size && gt(keys(l), ids(l), mk, mi)) { m = l; mk = keys(l); mi = ids(l) }
      if (r < size && gt(keys(r), ids(r), mk, mi)) { m = r; mk = keys(r); mi = ids(r) }
      if (m == i) done = true
      else {
        keys(i) = keys(m); ids(i) = ids(m)
        keys(m) = key; ids(m) = id
        i = m
      }
    }
  }

  def insert(key: Long, id: Long): Unit = {
    if (size < k) {
      var i = size
      keys(i) = key; ids(i) = id
      size += 1
      // sift up
      var going = true
      while (going && i > 0) {
        val p = (i - 1) >> 1
        if (gt(keys(i), ids(i), keys(p), ids(p))) {
          val tk = keys(p); val ti = ids(p)
          keys(p) = keys(i); ids(p) = ids(i)
          keys(i) = tk; ids(i) = ti
          i = p
        } else going = false
      }
    } else if (gt(keys(0), ids(0), key, id)) {
      keys(0) = key; ids(0) = id
      siftDown(0)
    }
  }

  /** Entries in rank order (ascending encoded key, then id). */
  def sortedEntries(): Array[(Long, Long)] = {
    val out = new Array[(Long, Long)](size)
    var i = 0
    while (i < size) { out(i) = (keys(i), ids(i)); i += 1 }
    java.util.Arrays.sort(out, new java.util.Comparator[(Long, Long)] {
      override def compare(a: (Long, Long), b: (Long, Long)): Int = {
        val c = java.lang.Long.compare(a._1, b._1)
        if (c != 0) c else java.lang.Long.compare(a._2, b._2)
      }
    })
    out
  }
}

object TopKBy {
  /** Lucene-style order-isomorphic double→long encoding; bijective. */
  @inline def encodeDouble(d0: Double): Long = {
    val d = if (d0 == 0.0) 0.0 else d0 // normalize -0.0 to SQL equality
    val bits = java.lang.Double.doubleToLongBits(d)
    bits ^ ((bits >> 63) & 0x7fffffffffffffffL)
  }

  @inline def decodeDouble(enc: Long): Double =
    java.lang.Double.longBitsToDouble(
      enc ^ ((enc >> 63) & 0x7fffffffffffffffL))
}

case class TopKBy(left: Expression, right: Expression, k: Int, asc: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] with BinaryLike[Expression] {

  override def prettyName: String = "graft_topk_by"

  private def scoreIsDouble: Boolean = left.dataType == DoubleType

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", left.dataType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 1)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires k >= 1, got $k")
    else if (left.dataType != LongType && left.dataType != DoubleType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName score must be bigint or double, got " +
          left.dataType.simpleString)
    else if (right.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName id must be bigint, got " + right.dataType.simpleString)
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  @inline private def encode(scoreRaw: Long): Long =
    if (asc) scoreRaw else ~scoreRaw

  // after binding, plain column inputs are BoundReferences: read them
  // primitively — the generic eval path boxes two values per fan row,
  // and the fan is the hot loop this aggregate exists for
  @transient private lazy val bound: Option[(Int, Int)] =
    (left, right) match {
      case (a: org.apache.spark.sql.catalyst.expressions.BoundReference,
            b: org.apache.spark.sql.catalyst.expressions.BoundReference) =>
        Some((a.ordinal, b.ordinal))
      case _ => None
    }

  override def update(buffer: TopKHeap, input: InternalRow): TopKHeap = {
    bound match {
      case Some((si, ii)) =>
        if (!input.isNullAt(si) && !input.isNullAt(ii)) {
          val raw =
            if (scoreIsDouble) TopKBy.encodeDouble(input.getDouble(si))
            else input.getLong(si)
          buffer.insert(encode(raw), input.getLong(ii))
        }
      case None =>
        val sv = left.eval(input)
        val iv = right.eval(input)
        if (sv != null && iv != null) {
          val raw =
            if (scoreIsDouble) TopKBy.encodeDouble(sv.asInstanceOf[Double])
            else sv.asInstanceOf[Long]
          buffer.insert(encode(raw), iv.asInstanceOf[Long])
        }
    }
    buffer
  }

  override def merge(a: TopKHeap, b: TopKHeap): TopKHeap = {
    var i = 0
    while (i < b.size) { a.insert(b.keys(i), b.ids(i)); i += 1 }
    a
  }

  override def eval(buffer: TopKHeap): Any = {
    val entries = buffer.sortedEntries()
    new GenericArrayData(entries.map { case (key, id) =>
      val raw = if (asc) key else ~key
      val score: Any =
        if (scoreIsDouble) TopKBy.decodeDouble(raw) else raw
      new GenericInternalRow(Array[Any](score, id))
    })
  }

  override def serialize(buffer: TopKHeap): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buffer.size * 16)
    bb.putInt(buffer.size)
    var i = 0
    while (i < buffer.size) {
      bb.putLong(buffer.keys(i)); bb.putLong(buffer.ids(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val h = new TopKHeap(k)
    var i = 0
    while (i < n) { h.insert(bb.getLong(), bb.getLong()); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKBy =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKBy =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKBy =
    copy(left = newLeft, right = newRight)
}
