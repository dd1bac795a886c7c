package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MERGE-ON-READ row-level DELETE on a [[Manifest]] table — the
  * write-cheap half of the delete trade-off, the Iceberg-v2 /
  * Delta-deletion-vector shape. Where [[RowDelete]] (copy-on-write) pays
  * write IO proportional to every directory containing a match,
  * merge-on-read commits only a TOMBSTONE directory holding the matched
  * keys — an APPENDING commit of keys-only size — and defers the cost to
  * readers, who anti-join the (broadcast-sized) tombstone set on every
  * snapshot. [[fold]] is the maintenance step that ends the deferral:
  * it applies the accumulated tombstones copy-on-write and commits a
  * REPLACING version with no tombstone entries, returning the read path
  * to zero overhead. The cycle — cheap deletes accumulate, maintenance
  * folds them in — is how a 100 TB table absorbs a steady takedown
  * stream without rewriting data on every request.
  *
  * Tombstone entries live in the ordinary manifest list, marked by a
  * basename convention, so commit/race/expire semantics are inherited
  * unchanged: vacuum reclaims superseded tombstone dirs exactly like
  * data dirs, and time travel to a pre-delete version reads everything.
  * Plain [[Manifest.snapshot]] is NOT meaning-preserving on a table with
  * live tombstones (inherent to merge-on-read — readers must merge);
  * use [[snapshot]] here, which is a drop-in replacement on tables
  * without tombstones.
  */
object MergeOnRead {

  val TombstonePrefix = "tombstones-"

  def isTombstone(entry: String): Boolean =
    new Path(entry).getName.startsWith(TombstonePrefix)

  /** Logically delete every row of the latest snapshot matching `pred`:
    * write the matched `keyCol` values as a tombstone directory under
    * `stagingDir` and commit it APPENDING. Write IO is the key list,
    * never data. Returns the committed version, or None when nothing
    * matched (no version burned, reader caches stay valid).
    */
  def deleteWhere(s: SparkSession, root: String, keyCol: String,
      pred: Column, stagingDir: String,
      committer: Committer = FsCreateCommitter): Option[Int] = {
    val v = Manifest.versions(s, root).last
    deleteKeys(s, root, keyCol,
      snapshot(s, root, keyCol, Some(v)).filter(pred), stagingDir,
      committer)
  }

  /** [[deleteWhere]] for the takedown shape requests actually arrive in
    * — an EXPLICIT key list (a right-to-be-forgotten ticket, an
    * upstream-retraction feed), no predicate scan of the table needed:
    * the tombstone commit costs only the key list's write. Keys absent
    * from the table are harmless (the read-side anti-join ignores
    * them), matching DELETE semantics on a missing row. Callers
    * deleting the same logical victims from SEVERAL derived tables
    * (postings + doclen, lists + codes) pass the one key frame to each
    * root and pay the derivation once.
    */
  def deleteKeys(s: SparkSession, root: String, keyCol: String,
      keys: DataFrame, stagingDir: String,
      committer: Committer = FsCreateCommitter): Option[Int] = {
    val v = Manifest.versions(s, root).last
    // overwrite: a delete that crashed between write and commit left an
    // invisible orphan at this same path — the retry must not trip on it
    val tombDir = s"$stagingDir/${TombstonePrefix}v$v"
    keys.select(col(keyCol)).distinct()
      .write.mode("overwrite").parquet(tombDir)
    if (s.read.parquet(tombDir).isEmpty) {
      new Path(tombDir).getFileSystem(s.sparkContext.hadoopConfiguration)
        .delete(new Path(tombDir), true)
      None
    } else Some(Manifest.commit(s, root, tombDir, committer))
  }

  /** Accumulated-tombstone-key cap for the broadcast form of the
    * read-path anti-join. Below it the key set broadcasts (one scan of
    * the data, zero shuffle); above it — a heavy takedown stream between
    * [[fold]]s — the same anti-join runs SHUFFLED instead, trading a
    * shuffle for not pushing an unbounded key set through driver memory
    * and the broadcast limit. Results are identical either way; the cap
    * only picks the physical strategy. Gated on the RAW tombstone row
    * count (a parquet metadata-only read, free) which upper-bounds the
    * distinct key count.
    */
  private def maxBroadcastKeys(s: SparkSession): Long =
    s.conf.get("spark.graft.mor.maxBroadcastKeys", "4194304").toLong

  /** The tombstone key set, broadcast-hinted only while the accumulated
    * raw key rows stay under [[maxBroadcastKeys]].
    */
  private def keySet(s: SparkSession, tombs: Seq[String],
      keyCol: String): DataFrame = {
    val raw = s.read.parquet(tombs: _*)
    val keys = raw.select(col(keyCol)).distinct()
    if (raw.count() <= maxBroadcastKeys(s)) broadcast(keys) else keys
  }

  /** The merged snapshot a version pins: data entries minus any row
    * whose `keyCol` appears in a tombstone entry. The tombstone side is
    * key-only and broadcast into the anti-join — the per-read price of
    * deferring the rewrite, bounded by accumulated deletes, not data —
    * falling back to a shuffled anti-join past [[maxBroadcastKeys]]
    * (identical results; see there).
    */
  def snapshot(s: SparkSession, root: String, keyCol: String,
      version: Option[Int] = None): DataFrame = {
    val (tombs, data) = Manifest.entries(s, root, version)
      .partition(isTombstone)
    val df = s.read.parquet(data: _*)
    if (tombs.isEmpty) df
    else df.join(keySet(s, tombs, keyCol), Seq(keyCol), "left_anti")
  }

  /** Maintenance: apply the accumulated tombstones copy-on-write — only
    * directories containing a tombstoned key are rewritten, the rest
    * carry verbatim — and commit a REPLACING version with no tombstone
    * entries. A no-tombstone table is left untouched. Old versions keep
    * their tombstones for time travel; retention reclaims them.
    */
  def fold(s: SparkSession, root: String, keyCol: String,
      stagingDir: String,
      committer: Committer = FsCreateCommitter): Option[RowDelete.Result] = {
    val baseV = Manifest.versions(s, root).last
    val (tombs, data) = Manifest.entries(s, root).partition(isTombstone)
    if (tombs.isEmpty) return None
    // same cap discipline as the read path: a fold running precisely
    // BECAUSE tombstones piled up must not be the thing that trips the
    // broadcast limit
    val keys = keySet(s, tombs, keyCol)
    val (hit, carried) = Cow.split(s, data,
      _.join(keys, Seq(keyCol), "left_semi"))
    val rewritten = Cow.rewrite(s, hit, stagingDir, "fold", baseV,
      _.join(keys, Seq(keyCol), "left_anti"))
    val v = Manifest.rewrite(s, root, carried ++ rewritten, committer)
    Some(RowDelete.Result(v, carried, rewritten))
  }
}
