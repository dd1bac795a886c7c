package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (point-in-interval) join: pair every point `p` with every interval
  * `[start, end]` containing it. With no equi key, Spark plans a theta join
  * as BroadcastNestedLoopJoin — O(|points| × |intervals|) comparisons and an
  * un-partitionable broadcast, fatal at 100 TB.
  *
  * This is the scalable bucketed formulation (the same trick engines with a
  * native range join — DuckDB's IEJoin, Postgres ranges — hide behind the
  * operator): quantize the range dimension into width-`w` buckets, replicate
  * each interval to the buckets it overlaps, map each point to its one
  * bucket, equi-join on the bucket id, and refine with the exact predicate.
  * Shuffle volume is |points| + |intervals| × (avg_span/w + 1), partitioned
  * by bucket — both sides spread across the cluster, no broadcast, no
  * nested loop. Pick `w` near the typical interval span: ≥1 bucket per
  * interval keeps replication ≈ 2×; a too-small `w` inflates the interval
  * side, a too-large one inflates candidates into the refine filter.
  *
  * Interval containment uses the inclusive closed interval [start, end].
  * Null points, starts, or ends never match (bucket arithmetic yields null
  * → equi-join drops them), matching SQL `BETWEEN` null semantics.
  *
  * An optional equi-key prefix rides along: when the data HAS a natural
  * co-partitioning key (user, shard), pass it and the bucket join becomes
  * (keys..., bucket) — skew in the time dimension then spreads inside each
  * key without touching the result.
  */
object RangeJoin {

  /** `points` must carry `pointCol`; `intervals` carry `startCol`/`endCol`.
    * Column name collisions between the two sides (other than `equiKeys`)
    * are the caller's to resolve, as with any Spark join.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String, bucketWidth: Long,
      equiKeys: Seq[String] = Seq.empty): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val reserved = "_range_bucket"
    Seq(points, intervals).foreach(df =>
      require(!df.columns.contains(reserved),
        s"column $reserved is reserved by RangeJoin"))
    def bucketOf(c: Column): Column = floor(c / lit(bucketWidth))
    val p = points.withColumn(reserved, bucketOf(col(pointCol)))
    val i = intervals
      // end < start ⇒ empty interval ⇒ sequence() would throw; drop first
      .filter(col(startCol) <= col(endCol))
      .withColumn(reserved,
        explode(sequence(bucketOf(col(startCol)), bucketOf(col(endCol)))))
    p.join(i, equiKeys :+ reserved)
      .filter(col(pointCol) >= col(startCol) &&
        col(pointCol) <= col(endCol))
      .drop(reserved)
  }

  /** INTERVAL-OVERLAP join: pair every left interval [ls, le] with every
    * right interval [rs, re] that overlaps it (closed intervals:
    * ls ≤ re ∧ rs ≤ le). Same bucketed formulation as
    * [[pointInInterval]] — both sides replicate to the width-`w` buckets
    * they span and meet through the bucket equi-key — with the standard
    * duplicate-elimination refinement instead of a `distinct()`: a pair
    * sharing several buckets is emitted ONLY in the first bucket both
    * intervals occupy, `bucket = max(⌊ls/w⌋, ⌊rs/w⌋)`, which every
    * matching pair satisfies in exactly one bucket. No shuffle beyond
    * the bucket join, no post-join dedup pass — the property a
    * time-span/genomics overlap join needs at 100 TB. Degenerate
    * (end < start) intervals drop on either side, like SQL `OVERLAPS`
    * on an empty range.
    */
  def intervalOverlap(left: DataFrame, right: DataFrame,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      bucketWidth: Long, equiKeys: Seq[String] = Seq.empty): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val reserved = "_range_bucket"
    Seq(left, right).foreach(df =>
      require(!df.columns.contains(reserved),
        s"column $reserved is reserved by RangeJoin"))
    def bucketOf(c: Column): Column = floor(c / lit(bucketWidth))
    def spread(df: DataFrame, s: String, e: String) = df
      .filter(col(s) <= col(e))
      .withColumn(reserved,
        explode(sequence(bucketOf(col(s)), bucketOf(col(e)))))
    spread(left, lStart, lEnd)
      .join(spread(right, rStart, rEnd), equiKeys :+ reserved)
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd) &&
        col(reserved) ===
          greatest(bucketOf(col(lStart)), bucketOf(col(rStart))))
      .drop(reserved)
  }
}
