package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The shared copy-on-write machinery under [[RowDelete]],
  * [[MergeOnRead.fold]] and [[Merge.upsert]]: find the directories whose
  * rows a marker touches (one scan, parent derived from the scan's
  * `_metadata.file_path` — `input_file_name` cannot cross a join),
  * partition hit/carried, and rewrite each hit through a transform while
  * [[SkipStats.carry]]ing its sidecar. One implementation so a fix to
  * the path mapping or the stats discipline lands in every mutation at
  * once.
  */
private[io] object Cow {

  /** Partition `dirs` into (hit, carried) by whether `matches` keeps any
    * of their rows. The scan exposes the file path as `_graft_fp`; the
    * distinct parent set is bounded by the commit count, so the collect
    * is manifest-sized.
    */
  def split(s: SparkSession, dirs: Seq[String],
      matches: DataFrame => DataFrame): (Seq[String], Seq[String]) = {
    if (dirs.isEmpty) return (Nil, Nil)
    val touched = matches(SchemaMemo.read(s, dirs)
        .withColumn("_graft_fp", col("_metadata.file_path")))
      .select(regexp_replace(col("_graft_fp"), "/[^/]*$", "").as("d"))
      .distinct().collect()
      .map(r => new Path(r.getString(0)).toUri.getPath)
    def owns(dir: String): Boolean = {
      val p = new Path(dir).toUri.getPath
      touched.exists(tp => tp == p || tp.startsWith(p + "/"))
    }
    dirs.partition(owns)
  }

  /** Rewrite every hit directory through `xform` into
    * `stagingDir/prefix-vV-N`, carrying skip-stats sidecars so
    * maintenance never costs a table its scan planning. Returns the
    * replacements in hit order.
    *
    * Staging names are keyed by `baseVersion` (the version the rewrite
    * was planned against): a LATER maintenance run on the same staging
    * dir gets fresh names and can never clobber a directory an earlier
    * run committed into the live manifest, while a RETRY of a crashed
    * run (same base version) overwrites its own orphan instead of
    * tripping on it. Two concurrent runs at the same version are the
    * manifest's documented single-committer scope.
    */
  def rewrite(s: SparkSession, hit: Seq[String], stagingDir: String,
      prefix: String, baseVersion: Int,
      xform: DataFrame => DataFrame): Seq[String] = {
    // The per-directory rewrites are INDEPENDENT jobs over disjoint
    // inputs and outputs, so submit them concurrently (bounded pool)
    // instead of serially — a takedown touching 20 directories was 20
    // back-to-back one-task jobs with the cluster idle in every tail
    // (guide §2.6). SchemaMemo.read replaces the bare read's
    // per-directory schema-inference job. Result order and names are
    // unchanged; the first failure rethrows after all settle, so no
    // branch is abandoned mid-write.
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(hit.size, 8)))
    implicit val ec: ExecutionContext =
      ExecutionContext.fromExecutorService(pool)
    try {
      val futs = hit.zipWithIndex.map { case (d, i) =>
        Future {
          val outd = s"$stagingDir/$prefix-v$baseVersion-$i"
          xform(SchemaMemo.read(s, Seq(d)))
            .write.mode("overwrite").parquet(outd)
          SkipStats.carry(s, d, outd)
          BloomSidecar.carry(s, d, outd)
          outd
        }
      }
      val done = futs.map(f => scala.util.Try(Await.result(f, Duration.Inf)))
      done.map(_.get)
    } finally pool.shutdown()
  }
}
