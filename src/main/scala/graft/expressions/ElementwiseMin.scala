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
  override protected def combine(x: Long, cur: Long): Long =
    if (x < cur) x else cur

  override def withNewMutableAggBufferOffset(newOffset: Int)
      : ElementwiseMin = copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int)
      : ElementwiseMin = copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression)
      : ElementwiseMin = copy(child = newChild)
}

/** Element-wise SUM of `array<bigint>` values across rows — the
  * component-sum pass every centroid/codebook build runs: per-position
  * addition is associative and commutative, so per-partition partial
  * sums merge map-side into the exact corpus sums with a fixed-width
  * long-array buffer — one corpus pass, where the posexplode
  * formulation inflates the scan dim× and re-packs with a collect_list.
  * Values are exact integers (quantized embeddings), so the sums —
  * and every mean derived as one double division per component — are
  * order-independent and engine-exact. Overflow headroom: |x| ≤ 2^27
  * (quantized floats) leaves room for ~2^36 rows per group; the gate
  * corpora are orders of magnitude below it.
  */
case class ElementwiseSum(child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends ElementwiseReduce {

  override def prettyName: String = "graft_elementwise_sum"
  override protected def neutral: Long = 0L
  override protected def combine(x: Long, cur: Long): Long = x + cur

  override def withNewMutableAggBufferOffset(newOffset: Int)
      : ElementwiseSum = copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int)
      : ElementwiseSum = copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression)
      : ElementwiseSum = copy(child = newChild)
}
