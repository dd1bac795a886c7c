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
  *
  * Null timestamps: right rows with a null `ts` are dropped (they match
  * nothing); LEFT rows with a null `ts` sort nulls-first inside their key
  * and therefore also match nothing — their payload columns come back
  * null, the same answer DuckDB/pandas ASOF gives.
  */
object AsofJoin {

  def apply(left: DataFrame, right: DataFrame, key: String, ts: String,
      payloadCols: Seq[String]): DataFrame = {
    Seq("_asof_src", "_asof_row").foreach { reserved =>
      require(!left.columns.contains(reserved),
        s"left side already has a column named $reserved (reserved)")
    }
    // a carried column that shadows an existing left column would be
    // silently overwritten by the matched right value — refuse instead
    val colliding = payloadCols.filter(left.columns.contains)
    require(colliding.isEmpty, s"payload column(s) ${colliding.mkString(", ")} " +
      "collide with left columns — rename one side before the as-of join")
    val l = left.withColumn("_asof_src", lit(1))
    // Carry the whole matched right row as one struct — non-null for every
    // right row even when its payload VALUES are null, so a NULL in a
    // matched update row propagates (DuckDB/pandas ASOF semantics) instead
    // of resurrecting an older non-null value. unionByName fills the
    // left side's missing struct column with typed nulls. Right rows with
    // a null timestamp match nothing (they would sort nulls-first and leak
    // into every left row) — same as DuckDB/pandas.
    val r = right.filter(col(ts).isNotNull)
      .select(col(key), col(ts),
        struct(payloadCols.map(col): _*).as("_asof_row"))
      .withColumn("_asof_src", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("_asof_src"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("_asof_row",
      last(col("_asof_row"), ignoreNulls = true).over(w))
    payloadCols.foldLeft(carried.filter(col("_asof_src") === 1)) {
      (df, c) => df.withColumn(c, col(s"_asof_row.$c"))
    }.drop("_asof_src", "_asof_row")
  }

  /** Convenience for a single carried column with a default. */
  def withDefault(left: DataFrame, right: DataFrame, key: String,
      ts: String, payload: String, default: Column): DataFrame =
    apply(left, right, key, ts, Seq(payload))
      .withColumn(payload, coalesce(col(payload), default))
}
