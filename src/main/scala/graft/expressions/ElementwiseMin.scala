package graft.expressions

import org.apache.spark.sql.catalyst.expressions.Expression

/** Element-wise minimum of `array<bigint>` values across rows — the merge
  * operation that makes MinHash signatures COMPOSABLE: min is associative
  * and commutative per position, so signatures computed per block/segment/
  * partition combine into the exact signature of the union of their shingle
  * sets. That is the property that lets a 100 TB corpus be minhashed
  * block-by-block (map-side partial aggregation — this aggregate supports
  * partial merge like any Spark agg) and merged without ever materializing
  * a document's full shingle set in one place. Shared machinery in
  * [[ElementwiseReduce]].
  */
case class ElementwiseMin(child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends ElementwiseReduce {

  override def prettyName: String = "graft_elementwise_min"
  override protected def neutral: Long = Long.MaxValue
  override protected def better(x: Long, cur: Long): Boolean = x < cur

  override def withNewMutableAggBufferOffset(newOffset: Int)
      : ElementwiseMin = copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int)
      : ElementwiseMin = copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression)
      : ElementwiseMin = copy(child = newChild)
}
