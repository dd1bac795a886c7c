package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CHANGE DATA CAPTURE over a [[Manifest]] table — Delta's
  * `table_changes(t, from, to)` surface, computed from the commit
  * ledger the engine already keeps instead of from write-time change
  * files: every committed version IS a precise delta of directory
  * sets, so the changes between two versions are derivable after the
  * fact, including on tables that never opted in (Delta without
  * `enableChangeDataFeed` refuses outright).
  *
  * Change rows carry the table schema plus three metadata columns:
  *
  *  - `_change_type`    — `insert` | `delete` | `update_preimage` |
  *    `update_postimage` (Delta's vocabulary exactly)
  *  - `_commit_version` — the version that introduced the change
  *  - `_commit_timestamp` — that version's commit instant (manifest
  *    mtime, the same clock `TIMESTAMP AS OF` resolves by)
  *
  * COST MODEL (what makes this usable at 100 TB): per version step,
  *  - an APPEND costs one scan of the appended directories — IO ∝ the
  *    change, the overwhelmingly common case;
  *  - a MERGE-ON-READ delete/update costs one scan of the key list
  *    plus one semi-join of the PREVIOUS snapshot against it (the
  *    preimage — broadcast-sized keys, one pass, no shuffle of data);
  *  - a replacing commit MARKED layout-preserving (`#op:` compact /
  *    cluster / fold — pure re-layouts whose logical content is
  *    pinned identical by their own gates) costs NOTHING — skipped;
  *  - an UNMARKED replacing commit (copy-on-write DELETE/UPDATE/MERGE,
  *    rollback, overwrite, pre-marker history) falls back to a full
  *    snapshot diff (`EXCEPT ALL` both ways) — correct for any commit
  *    whatsoever, priced at two snapshot scans + a shuffle, and the
  *    reason rewriting commits should carry markers. Its changes
  *    surface as delete+insert pairs (no pre/postimage pairing: a
  *    rewrite does not record which old row became which new row).
  *
  * Semantics note shared with Delta CDF: a row appended and deleted
  * WITHIN the range appears twice (insert at v_i, delete at v_j) —
  * consumers fold by (key, version) order. Expired versions inside
  * the range refuse loudly (their deltas are unrecoverable), the
  * standard retention trade.
  *
  * Relationship to [[ChangeFeed]]: that module answers "what is the
  * NET difference between my cursor and head" (one windowed frame,
  * `_op` I/D — the replication-sync shape, intra-window churn
  * collapsed); this one answers "what happened, commit by commit"
  * (per-version attribution, update pre/post pairing, the SQL
  * `table_changes` TVF, and the streaming feed). A consumer that only
  * mirrors state wants [[ChangeFeed.sync]]'s exactly-once cursor; an
  * auditor, debugger, or event-driven consumer wants this ledger.
  */
object Cdc {

  val ChangeType = "_change_type"
  val CommitVersion = "_commit_version"
  val CommitTimestamp = "_commit_timestamp"

  /** Replacing-commit `#op:` markers whose logical content is pinned
    * identical to their predecessor's (at the MERGED-view level — a
    * fold applies tombstones readers were already applying).
    */
  val LayoutPreservingOps: Set[String] = Set("compact", "cluster", "fold")

  /** The change rows of versions `[fromVersion, toVersion]` (both
    * inclusive, Delta's convention; `toVersion` defaults to the table
    * head). `keyCol` overrides the table's recorded merge key
    * ([[graft.io.dsv2.GraftMorKey]]) and is only consulted when a step
    * in the range actually carries tombstone entries.
    */
  def changes(s: SparkSession, root: String, fromVersion: Int,
      toVersion: Option[Int] = None, keyCol: Option[String] = None)
      : DataFrame = {
    val vs = Manifest.versions(s, root)
    require(vs.nonEmpty, s"no committed manifest under $root")
    val to = toVersion.getOrElse(vs.last)
    require(fromVersion >= 1 && fromVersion <= to,
      s"bad CDC range [$fromVersion, $to]")
    require(to <= vs.last, s"version $to does not exist yet (head " +
      s"is ${vs.last})")
    // contiguity: every version in the range, plus the predecessor the
    // first step diffs against, must still be live — an expired
    // version's delta is unrecoverable and silence would mean silently
    // MISSING changes. Version 1 diffs against the empty table and
    // needs no predecessor.
    val needed =
      (if (fromVersion == 1) 1 else fromVersion - 1) to to
    needed.find(!vs.contains(_)).foreach(v =>
      throw new IllegalArgumentException(
        s"version $v inside the CDC range of $root has been expired — " +
          "changes across it are unrecoverable (narrow the range or " +
          "re-seed the consumer from a snapshot)"))
    require(ColumnMapping.mapping(s, root, Some(to)).isEmpty,
      s"CDC over a column-mapped table is not supported — compact " +
        s"($root) to re-physicalize the renamed columns first")
    def key(): String = keyCol
      .orElse(graft.io.dsv2.GraftMorKey.get(s, root))
      .getOrElse(throw new IllegalArgumentException(
        s"a step in the CDC range of $root carries tombstone entries " +
          "but the table has no recorded merge key — " +
          "CALL set_mor_key first or pass keyCol"))
    val steps = (fromVersion to to).flatMap(v => step(s, root, v, vs,
      () => key()))
    require(steps.nonEmpty,
      s"CDC range [$fromVersion, $to] of $root produced no change " +
        "frames")
    steps.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** One version's change frame(s); empty for no-op and
    * layout-preserving commits.
    */
  private def step(s: SparkSession, root: String, v: Int, vs: Seq[Int],
      key: () => String): Seq[DataFrame] = {
    val prevEntries: Seq[String] =
      if (v == 1) Seq.empty else Manifest.entries(s, root, Some(v - 1))
    val curEntries = Manifest.entries(s, root, Some(v))
    // mapping dirs are schema metadata, never rows
    val added = curEntries.filterNot(prevEntries.toSet)
      .filterNot(ColumnMapping.isMapping)
    val removed = prevEntries.filterNot(curEntries.toSet)
      .filterNot(ColumnMapping.isMapping)
    val ts = Manifest.commitTimeOf(s, root, v)
    def tag(df: DataFrame, tpe: String): DataFrame =
      df.withColumn(ChangeType, lit(tpe))
        .withColumn(CommitVersion, lit(v))
        .withColumn(CommitTimestamp,
          timestamp_millis(lit(ts)))
    if (added.isEmpty && removed.isEmpty) return Seq.empty

    if (removed.isEmpty) {
      // ── appending commit: classified exactly by entry names ──
      val (tombs, data) = added.partition(MergeOnRead.isTombstone)
      val (morins, plain) = data.partition(d =>
        new org.apache.hadoop.fs.Path(d).getName
          .startsWith(MergeOnRead.InsertPrefix))
      val inserts =
        if (plain.isEmpty) Seq.empty
        else Seq(tag(SchemaMemo.readMerged(s, plain), "insert"))
      if (tombs.isEmpty) return inserts
      // MoR delete/update: preimage = the rows the new tombstones hide
      // — previous MERGED snapshot semi-joined against the key list
      // (already-hidden keys are absent from it, so nothing
      // double-deletes)
      val k = key()
      val keys = SchemaMemo.read(s, tombs).select(col(k)).distinct()
      val prevSnap = mergedSnapshot(s, root, v - 1, k)
      val pre = prevSnap.join(broadcastIfSmall(s, keys, tombs),
        Seq(k), "left_semi")
      if (morins.isEmpty) return inserts :+ tag(pre, "delete")
      // update: rewritten rows whose key had a visible previous row
      // pair as pre/postimage; a rewritten key with NO previous row
      // (an upsert through the raw API) is an insert
      val post = SchemaMemo.readMerged(s, morins)
      val preKeys = pre.select(col(k)).distinct()
      inserts ++ Seq(
        tag(pre, "update_preimage"),
        tag(post.join(preKeys, Seq(k), "left_semi"), "update_postimage"),
        tag(post.join(preKeys, Seq(k), "left_anti"), "insert"))
    } else Manifest.opOf(s, root, v) match {
      // ── replacing commit ──
      case Some(op) if LayoutPreservingOps.contains(op) => Seq.empty
      case _ =>
        // generic fallback, correct for ANY commit: diff the merged
        // snapshots. EXCEPT ALL keeps multiplicity honest (a rewrite
        // that drops one of two identical rows emits one delete).
        val k = if ((prevEntries ++ curEntries)
            .exists(MergeOnRead.isTombstone)) Some(key()) else None
        val prevSnap = k.fold(Manifest.snapshot(s, root, Some(v - 1)))(
          mergedSnapshot(s, root, v - 1, _))
        val curSnap = k.fold(Manifest.snapshot(s, root, Some(v)))(
          mergedSnapshot(s, root, v, _))
        Seq(tag(prevSnap.exceptAll(curSnap), "delete"),
          tag(curSnap.exceptAll(prevSnap), "insert"))
    }
  }

  /** The CONSUMER side of the ledger — apply a change frame to a
    * replica table, one write-cheap commit per source version: each
    * version's slice becomes an epoch-scoped tombstone of every
    * affected key plus a morins re-insert of the surviving rows
    * ([[MergeOnRead.updateRows]] — deletes are "hidden and not
    * re-inserted", upserts "hidden and re-inserted"), so replica
    * write IO ∝ the change, never the replica. Preimage rows are
    * ignored (the postimage is the key's new truth). The replica's
    * merged snapshot after applying versions `[1, v]` equals the
    * source's snapshot at `v` — the gate's pin. Returns the replica
    * versions committed.
    *
    * The per-version loop collects only the VERSION NUMBERS (bounded
    * by the range, never data). Consumers tracking a cursor pair this
    * with [[ChangeFeed.cursorOf]]'s discipline or simply re-apply —
    * a replayed slice re-tombstones and re-inserts the same keys at a
    * higher epoch, converging to the same merged snapshot
    * (idempotent at the content level, not the version level).
    */
  def applyChanges(s: SparkSession, changes: DataFrame,
      targetRoot: String, keyCol: String, stagingDir: String): Seq[Int] = {
    // materialize the change frame ONCE: it is consumed 1 + 2·versions
    // times below (the version collect, then each slice's keys and
    // rows), and a table_changes frame is a UNION of per-version join
    // plans — without staging, every consumption re-runs every
    // version's joins (O(versions²) join evaluations per apply).
    // Checkpoints.stage spills to the reliable checkpoint dir when
    // configured, executor memory+disk otherwise; size ∝ the change
    // stream, never the replica.
    val matd = graft.Checkpoints.stage(changes)
    val versions = matd.select(col(CommitVersion)).distinct()
      .orderBy(col(CommitVersion)).collect().map(_.getInt(0)).toSeq
    versions.flatMap { v =>
      val slice = matd.filter(col(CommitVersion) === v)
        .drop(CommitVersion, CommitTimestamp)
      val rows = slice.filter(col(ChangeType) === "insert" ||
        col(ChangeType) === "update_postimage").drop(ChangeType)
      val keys = slice.filter(col(ChangeType) =!= "update_preimage")
        .select(col(keyCol)).distinct()
      if (Manifest.versions(s, targetRoot).isEmpty) {
        // bootstrap: the first slice of a fresh replica commits as a
        // plain append (nothing to hide yet)
        val d = s"$stagingDir/cdcapply-boot-" +
          java.util.UUID.randomUUID().toString
        rows.write.parquet(d)
        Some(Manifest.commit(s, targetRoot, d))
      } else MergeOnRead.updateRows(s, targetRoot, keyCol, keys, rows,
        stagingDir)
    }
  }

  private def mergedSnapshot(s: SparkSession, root: String, v: Int,
      k: String): DataFrame =
    if (Manifest.entries(s, root, Some(v))
        .exists(MergeOnRead.isTombstone))
      MergeOnRead.snapshot(s, root, k, Some(v))
    else Manifest.snapshot(s, root, Some(v))

  /** Broadcast the key frame when the raw tombstone row count (parquet
    * footer metadata, free) stays under the MoR read path's cap — the
    * same economics as the snapshot anti-join.
    */
  private def broadcastIfSmall(s: SparkSession, keys: DataFrame,
      tombs: Seq[String]): DataFrame =
    if (Manifest.dirRowCount(s, tombs) <=
        MergeOnRead.maxBroadcastKeys(s)) broadcast(keys)
    else keys
}
