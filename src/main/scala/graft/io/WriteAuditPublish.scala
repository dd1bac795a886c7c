package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Write-audit-publish — the lake-ops contract that keeps bad batches out
  * of a consumed table: data lands in an UNREFERENCED staging directory,
  * audits run against the staged files (the exact bytes readers would
  * see, not the DataFrame that produced them), and only a clean audit
  * publishes — one directory rename, so readers observe either the whole
  * batch or none of it. A failed audit leaves staging in place for
  * inspection and the published table untouched.
  *
  * The rename is atomic on HDFS/POSIX filesystems. Object stores don't
  * rename atomically — there a production table commits through a
  * metadata pointer instead (Iceberg/Delta snapshot commit); the
  * stage→audit→swap lifecycle is identical, only the publish primitive
  * changes.
  */
object WriteAuditPublish {
  /** An audit check: name + a query counting VIOLATIONS in the staged
    * data (0 = pass). Counting rows rather than returning booleans keeps
    * every check one small aggregate over the staged files.
    */
  type Check = (String, DataFrame => Long)

  def stage(df: DataFrame, stagingDir: String): Unit =
    df.write.mode("overwrite").parquet(stagingDir)

  /** Run every check against the staged files; returns failures. */
  def audit(s: SparkSession, stagingDir: String,
      checks: Seq[Check]): Seq[String] = {
    val staged = SchemaMemo.read(s, Seq(stagingDir))
    checks.flatMap { case (name, violations) =>
      val n = violations(staged)
      if (n == 0) None else Some(s"$name: $n violating rows")
    }
  }

  /** Atomic publish: rename staging into the published table. Refuses to
    * clobber an existing target — republish is an explicit delete-first
    * decision, not a silent overwrite.
    */
  def publish(s: SparkSession, stagingDir: String, targetDir: String): Unit = {
    val conf = s.sparkContext.hadoopConfiguration
    val target = new Path(targetDir)
    val fs = target.getFileSystem(conf)
    require(!fs.exists(target), s"publish target already exists: $targetDir")
    fs.mkdirs(target.getParent)
    require(fs.rename(new Path(stagingDir), target),
      s"rename $stagingDir -> $targetDir failed")
  }

  /** The full lifecycle; returns audit failures (empty = published). */
  def run(df: DataFrame, stagingDir: String, targetDir: String,
      checks: Seq[Check]): Seq[String] = {
    val s = df.sparkSession
    stage(df, stagingDir)
    val failures = audit(s, stagingDir, checks)
    if (failures.isEmpty) publish(s, stagingDir, targetDir)
    failures
  }
}
