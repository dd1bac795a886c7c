package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{coalesce, lit, sum, when}

/** Write-time constraint enforcement for [[Manifest]] tables — the
  * Delta-invariants / SQL `CHECK` discipline: a batch that violates any
  * declared constraint is rejected WHOLE before it becomes visible, so
  * downstream readers never see a partially-bad commit and the bad batch
  * is debuggable at its source instead of three jobs later.
  *
  * Semantics are SQL CHECK: a row VIOLATES a constraint iff the
  * predicate evaluates to FALSE — UNKNOWN (NULL) passes, exactly like
  * `CHECK` in ANSI SQL and Delta invariants (`NOT NULL` is just the
  * predicate `col IS NOT NULL`, which is never UNKNOWN).
  *
  * Scale shape: the incoming DataFrame is written to the staging
  * directory FIRST (one pass over the source — it may be an expensive
  * upstream computation), then validated by re-reading the staged
  * parquet, where column pruning means the check scans ONLY the
  * constraint columns, and a violation deletes the staged directory and
  * raises before any manifest write. All declared constraints are
  * evaluated in ONE aggregate pass (a per-constraint conditional sum),
  * so the validation cost doesn't grow a scan per constraint; the
  * single collect is one row wide.
  */
object Constraints {

  /** One violated constraint: its name and how many rows failed it. */
  final case class Violation(name: String, rows: Long)

  final class ConstraintViolationException(val violations: Seq[Violation])
    extends IllegalArgumentException(
      "batch rejected: " + violations
        .map(v => s"${v.name} (${v.rows} rows)").mkString(", "))

  /** Count violating rows per constraint in one aggregate pass.
    * Empty input (or an empty constraint list) violates nothing.
    */
  def check(df: DataFrame, constraints: Seq[(String, Column)])
      : Seq[Violation] = {
    if (constraints.isEmpty) return Seq.empty
    val aggs = constraints.map { case (name, pred) =>
      sum(when(coalesce(pred, lit(true)) === false, 1L).otherwise(0L))
        .as(name)
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    constraints.zipWithIndex.collect {
      case ((name, _), i) if !row.isNullAt(i) && row.getLong(i) > 0 =>
        Violation(name, row.getLong(i))
    }
  }

  /** Stage `df` at `batchDir`, validate the staged parquet against the
    * constraints, and only then commit it into the table (with
    * [[SkipStats]] sidecars when `statsCols` is non-empty). On
    * violation the staged directory is deleted and a
    * [[ConstraintViolationException]] raises — the table's manifest is
    * untouched, so the failed ingest is invisible to every reader.
    * Returns the committed version.
    */
  def commitChecked(s: SparkSession, root: String, df: DataFrame,
      batchDir: String, constraints: Seq[(String, Column)],
      statsCols: Seq[String] = Nil,
      committer: Committer = FsCreateCommitter): Int = {
    df.write.mode("overwrite").parquet(batchDir)
    val staged = s.read.parquet(batchDir)
    val violations = check(staged, constraints)
    if (violations.nonEmpty) {
      val p = new org.apache.hadoop.fs.Path(batchDir)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      throw new ConstraintViolationException(violations)
    }
    if (statsCols.nonEmpty)
      Manifest.commitWithStats(s, root, batchDir, statsCols, committer)
    else Manifest.commit(s, root, batchDir, committer)
  }
}
