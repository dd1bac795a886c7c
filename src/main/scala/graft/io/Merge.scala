package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Copy-on-write MERGE (upsert) on a [[Manifest]] table — the third leg
  * of the row-level mutation family beside [[RowDelete]] (copy-on-write
  * delete) and [[MergeOnRead]] (deferred delete): `MERGE INTO table
  * USING source ON table.key = source.key WHEN MATCHED THEN UPDATE *
  * WHEN NOT MATCHED THEN INSERT *`, the shape a slowly-corrected corpus
  * needs (re-crawled documents, fixed labels, late-arriving upstream
  * rows) committed as ONE replacing version.
  *
  * Scale contract: the source batch is assumed small relative to the
  * table (the usual upsert regime) — its key set broadcasts into a
  * semi-join against the scan's `_metadata.file_path`, so finding the
  * affected directories is one table pass with no shuffle. Directories
  * holding no matched key carry into the next version VERBATIM; affected
  * ones rewrite minus their matched rows; the whole source lands as one
  * appended directory. Write IO ∝ data sharing a directory with a
  * matched key + the source itself, never the table. Upsert semantics
  * are key-replacing: every existing row of a matched key is superseded
  * by that key's source rows.
  */
object Merge {

  /** Upsert `source` into the table's latest snapshot by `keyCol`.
    * Matched keys have their rows replaced by the source's; unmatched
    * source rows are inserts. One REPLACING commit; an empty source
    * commits nothing. Rewrites land under `stagingDir`.
    */
  def upsert(s: SparkSession, root: String, keyCol: String,
      source: DataFrame, stagingDir: String,
      committer: Committer = FsCreateCommitter): Option[RowDelete.Result] = {
    if (source.isEmpty) return None
    val dirs = Manifest.committed(s, root)
    val keys = source.select(col(keyCol)).distinct()
    val touchedParents = s.read.parquet(dirs: _*)
      .select(col(keyCol), col("_metadata.file_path").as("fp"))
      .join(broadcast(keys), Seq(keyCol), "left_semi")
      .select(regexp_replace(col("fp"), "/[^/]*$", "").as("d"))
      .distinct().collect()
      .map(r => new Path(r.getString(0)).toUri.getPath)
    def owns(dir: String): Boolean = {
      val p = new Path(dir).toUri.getPath
      touchedParents.exists(tp => tp == p || tp.startsWith(p + "/"))
    }
    val (hit, carried) = dirs.partition(owns)
    val rewritten = hit.zipWithIndex.map { case (d, i) =>
      val outd = s"$stagingDir/merge$i"
      s.read.parquet(d)
        .join(broadcast(keys), Seq(keyCol), "left_anti")
        .write.parquet(outd)
      SkipStats.carry(s, d, outd)
      outd
    }
    val upsertDir = s"$stagingDir/merge-upsert"
    source.write.parquet(upsertDir)
    // the appended source inherits the table's stats discipline: if any
    // directory tracks skip-stats, the new one tracks the same columns
    val f = new Path(root)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    dirs.find(d => SkipStats.read(f, d).nonEmpty)
      .foreach(d => SkipStats.carry(s, d, upsertDir))
    val v = Manifest.rewrite(s, root,
      carried ++ rewritten :+ upsertDir, committer)
    Some(RowDelete.Result(v, carried, rewritten :+ upsertDir))
  }
}
