package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Rank-shaped helpers built on [[graft.expressions.TopKBy]]. */
object RankFunctions {

  /** Per-group top-k over a candidate fan WITHOUT a rank window.
    *
    * `row_number().over(Window.partitionBy(group).orderBy(score, id))`
    * funnels each group's whole fan into one reducer and sorts it there;
    * this instead runs `graft_topk_by` — a bounded-heap
    * TypedImperativeAggregate with map-side partial merge — so each
    * partition contributes at most k entries per group and the exchange
    * carries `groups × k` fixed-width rows. Output is
    * `(group, rk, id, score)` with `rk = 1..k` ordered by
    * (score asc-or-desc, id asc) — bit-identical to the window it
    * replaces (posexplode of the rank-ordered array; `rk` is INT like
    * `row_number`). Requires [[graft.expressions.LongArrayOps.register]].
    */
  def topKPerGroup(df: DataFrame, group: String, score: String, id: String,
      k: Int, asc: Boolean): DataFrame =
    df.groupBy(col(group))
      .agg(call_function("graft_topk_by",
        col(score), col(id), lit(k), lit(asc)).as("_tk"))
      .select(col(group), posexplode(col("_tk")).as(Seq("_pos", "_e")))
      .select(col(group), (col("_pos") + 1).as("rk"),
        col("_e.id").as(id), col("_e.score").as(score))
}
