package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT distributed quantiles of a long column without a global sort —
  * the data-profiling primitive a 100 TB corpus census needs (length /
  * token / score percentiles) where the two standard answers both fail:
  * `approx_percentile` is approximate (and its GK summary makes no
  * exactness promise an oracle could replay), and the textbook exact
  * form `ORDER BY v` + `ROW_NUMBER` ranks the ENTIRE corpus through one
  * partition.
  *
  * Two-pass binned rank instead:
  *
  *  1. one aggregate for (min, max, n) — a single row;
  *  2. a histogram over `bins` fixed-width buckets — shuffle ∝ bins,
  *     collected bounded (≤ bins rows) and cumulative-summed on the
  *     driver to locate each target rank's bucket and local rank;
  *  3. one filtered pass over ONLY the target buckets' rows, ranked by
  *     a window partitioned per bucket — the sole per-row sort touches
  *     n/bins expected rows per bucket, never the corpus.
  *
  * Quantile definition (the oracle-replayable one): value at 1-indexed
  * rank ⌈p·n/1000⌉ in sorted order, p in per-mille. All arithmetic is
  * integer (bucket width w = (max−min) div bins + 1, bucket = (v−min)
  * div w), so results are bit-exact whatever the partitioning.
  */
object ExactQuantiles {

  /** Exact per-mille quantiles of `valueCol` (long) as a DataFrame
    * (p_mille, value), one row per requested p, ordered by p.
    */
  def apply(df: DataFrame, valueCol: String, pMilles: Seq[Int],
      bins: Int = 4096): DataFrame = {
    require(pMilles.nonEmpty && pMilles.forall(p => p >= 1 && p <= 1000),
      s"per-mille quantiles must be in [1, 1000], got $pMilles")
    require(bins >= 2, s"need >= 2 bins, got $bins")
    val spark = df.sparkSession
    import spark.implicits._
    val v = col(valueCol)
    // pass 1: bounds + count (one row)
    val head = df.agg(min(v).as("lo"), max(v).as("hi"),
      count(v).as("n")).collect()(0)
    val n = head.getLong(2)
    require(n > 0, "exact quantiles of an empty input")
    val lo = head.getLong(0)
    val hi = head.getLong(1)
    val ranks = pMilles.map(p => p -> ((p.toLong * n + 999) / 1000))
    if (lo == hi)
      return ranks.map { case (p, _) => (p, lo) }
        .toDF("p_mille", "value").orderBy(col("p_mille"))
    val w = (hi - lo) / bins + 1
    // integer DIV, not Column./ (double division loses exactness >2^53)
    val bucket = expr(s"($valueCol - ${lo}L) DIV ${w}L")
    // pass 2: histogram, bounded collect, driver-side cumulative rank
    val hist = df.groupBy(bucket.as("b")).agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .sortBy(_._1)
    val targets: Seq[(Int, Long, Long)] = ranks.map { case (p, r) =>
      var cum = 0L
      var i = 0
      while (cum + hist(i)._2 < r) { cum += hist(i)._2; i += 1 }
      (p, hist(i)._1, r - cum) // local 1-indexed rank inside bucket i
    }
    // pass 3: rank only the target buckets' rows
    val wanted = targets.map(_._2).distinct
    val ranked = df.select(bucket.as("b"), v.as("value"))
      .filter(col("b").isin(wanted: _*))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("b")).orderBy(col("value"))))
    val need = targets.map { case (p, b, k) => (p, b, k) }
      .toDF("p_mille", "b", "rn")
    need.join(ranked, Seq("b", "rn"))
      .select(col("p_mille"), col("value"))
      .orderBy(col("p_mille"))
  }

  /** GROUPED exact quantiles — one (p, value) set per group, with NO
    * driver-side step at all: the per-group histogram is a (group, bin)
    * aggregate, the cumulative ranks are a window over each group's
    * ≤ bins rows (thousands of groups × thousands of bins is still a
    * tiny table next to the corpus), target buckets and local ranks
    * come out of that same window, and only the target buckets' rows
    * are ever ranked row-wise. Global fixed-width bins over the whole
    * column's [min, max] keep the bucket arithmetic identical across
    * groups (a per-group range would need a per-group width join —
    * same cost, less replayable).
    */
  def grouped(df: DataFrame, groupCol: String, valueCol: String,
      pMilles: Seq[Int], bins: Int = 4096): DataFrame = {
    require(pMilles.nonEmpty && pMilles.forall(p => p >= 1 && p <= 1000),
      s"per-mille quantiles must be in [1, 1000], got $pMilles")
    require(bins >= 2, s"need >= 2 bins, got $bins")
    val spark = df.sparkSession
    import spark.implicits._
    val v = col(valueCol)
    val head = df.agg(min(v).as("lo"), max(v).as("hi"),
      count(v).as("n")).collect()(0)
    require(head.getLong(2) > 0, "exact quantiles of an empty input")
    val lo = head.getLong(0)
    val w = (head.getLong(1) - lo) / bins + 1
    val bucket = expr(s"($valueCol - ${lo}L) DIV ${w}L")
    val g = col(groupCol)
    val hist = df.groupBy(g.as("g"), bucket.as("b"))
      .agg(count(lit(1)).as("c"))
    val byBin = Window.partitionBy(col("g")).orderBy(col("b"))
    val cum = hist
      .withColumn("cum", sum(col("c")).over(byBin))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(col("g"))))
    val ps = pMilles.toDF("p_mille")
    // target bucket per (group, p): the first bucket whose cumulative
    // count reaches rank ⌈p·n/1000⌉; its local rank is r − cum_before
    val targets = cum.crossJoin(broadcast(ps))
      .withColumn("r", expr("(p_mille * n + 999) DIV 1000"))
      .filter(col("cum") >= col("r") &&
        col("cum") - col("c") < col("r"))
      .select(col("g"), col("p_mille"), col("b"),
        (col("r") - (col("cum") - col("c"))).as("rn"))
    val ranked = df.select(g.as("g"), bucket.as("b"), v.as("value"))
      .join(targets.select(col("g"), col("b")).distinct(), Seq("g", "b"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("g"), col("b")).orderBy(col("value"))))
    targets.join(ranked, Seq("g", "b", "rn"))
      .select(col("g").as(groupCol), col("p_mille"), col("value"))
      .orderBy(col(groupCol), col("p_mille"))
  }
}
