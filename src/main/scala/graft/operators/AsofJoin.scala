package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: attach to each left row the latest right row with the same
  * key and timestamp ≤ the left row's — the lookup every event pipeline
  * needs against slowly-changing state (rates, configs, model versions).
  *
  * Spark has no native as-of join; the naive range join
  * (`l.k = r.k && l.ts >= r.ts` + keep-latest) explodes to the full
  * cross-product per key before pruning. This implementation is the
  * scalable formulation: tag both sides, union, then one window pass per
  * key ordered by (ts, side) carrying `last(value, ignoreNulls)` forward —
  * a SINGLE shuffle on the key, O(n log n) in partition size, no
  * intermediate blow-up at any skew. Right rows sort before left rows at
  * equal timestamps, so a same-instant update is visible (inclusive ≤,
  * matching DuckDB/pandas ASOF semantics).
  *
  * Right must be unique per (key, ts) — pre-aggregate if not, or the
  * carried value at a tied timestamp is unspecified.
  */
object AsofJoin {

  def apply(left: DataFrame, right: DataFrame, key: String, ts: String,
      payloadCols: Seq[String]): DataFrame = {
    val l = left.withColumn("_asof_src", lit(1))
    val r = right.select((col(key) +: col(ts) +: payloadCols.map(col))
        .map(identity): _*)
      .withColumn("_asof_src", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("_asof_src"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payloadCols.foldLeft(unioned) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("_asof_src") === 1).drop("_asof_src")
  }

  /** Convenience for a single carried column with a default. */
  def withDefault(left: DataFrame, right: DataFrame, key: String,
      ts: String, payload: String, default: Column): DataFrame =
    apply(left, right, key, ts, Seq(payload))
      .withColumn(payload, coalesce(col(payload), default))
}
