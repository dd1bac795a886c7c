package graft.io.dsv2

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** TWO-PHASE directory pruning for dim joins the broadcast-bound
  * runtime path can't serve.
  *
  * Spark's V2 dynamic pruning only reaches a `SupportsRuntimeV2Filtering`
  * scan when the dim side is BROADCAST (`translateRuntimeFilterV2`
  * accepts only the `InSubqueryExec` a broadcast exchange feeds) — a dim
  * that is selective but above `autoBroadcastJoinThreshold` silently
  * loses runtime pruning and the fact side reverts to full-snapshot
  * scan cost: at 100 TB that is the whole bill. This is the guarded
  * fallback — the IO-pruning half of DPP without the broadcast
  * requirement:
  *
  *  - **Phase 1** runs the dim side's DISTINCT join keys and collects
  *    them under a hard cap (`spark.graft.twoPhasePrune.maxKeys`,
  *    default 65536 — same ceiling as the runtime path's value sweep).
  *    Cost: one aggregation ∝ dim, exactly what DPP's subquery pays.
  *  - **Phase 2** plans the fact scan with a static `IN` over those
  *    keys, which the graft scan's planning-time sidecar disjunction
  *    (`toInSets`) turns into whole-directory skips BEFORE the file
  *    index is built — and parquet row-group pruning inside kept dirs
  *    rides the same filter.
  *
  * Past the cap it FAILS OPEN to the unfiltered scan — never wrong,
  * only less pruned (and the broadcast runtime path may still fire if
  * the dim turns out broadcastable). The `IN` is result-preserving by
  * construction: `factKey IN (dim keys)` is implied by the equi-join
  * the caller is about to perform.
  *
  * {{{
  *   val fact = TwoPhasePruning.prunedScan(s, factRoot, "k",
  *     dim.filter($"sel" === 1).select($"k"))
  *   fact.join(dim.filter($"sel" === 1), "k")   // dirs already skipped
  * }}}
  */
object TwoPhasePruning {

  /** The fact table's scan, pre-pruned by the dim's distinct keys when
    * they fit the cap; the plain scan otherwise (fail-open). `dimKeys`
    * must be a single-column frame of the join key values.
    */
  def prunedScan(s: SparkSession, factRoot: String, factKey: String,
      dimKeys: DataFrame): DataFrame = {
    val cap = s.conf.get("spark.graft.twoPhasePrune.maxKeys", "65536")
      .toInt
    val fact = s.read.format("graft").load(factRoot)
    prunedBy(s, fact, factKey, dimKeys, cap)
  }

  /** Same contract over an already-loaded fact frame (a catalog table,
    * a time-traveled read) — the `IN` lands in its pushed filters and
    * prunes through whatever its source supports.
    */
  def prunedBy(s: SparkSession, fact: DataFrame, factKey: String,
      dimKeys: DataFrame, cap: Int): DataFrame = {
    require(dimKeys.schema.length == 1,
      s"dimKeys must be a single key column, got ${dimKeys.schema}")
    // phase 1: bounded distinct-key collect; limit(cap + 1) keeps the
    // driver transfer ∝ cap even when the dim has billions of keys
    val keys = dimKeys.distinct().limit(cap + 1).collect()
      .map(_.get(0)).filter(_ != null)
    if (keys.length > cap) fact // fail-open: never wrong, only unpruned
    else if (keys.isEmpty)
      fact.filter(org.apache.spark.sql.functions.lit(false))
    else fact.filter(col(factKey).isin(keys.toIndexedSeq: _*))
  }
}
