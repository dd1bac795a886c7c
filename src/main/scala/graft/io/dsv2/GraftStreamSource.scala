package graft.io.dsv2

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.{InputPartition,
  PartitionReaderFactory}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream,
  Offset}
import org.apache.spark.sql.execution.datasources.InMemoryFileIndex
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.io.{Manifest, MergeOnRead}

/** Offset for the manifest stream: the highest manifest VERSION whose
  * directories have been emitted. Versions are the table's own commit
  * ledger — no separate log to reconcile, no file-mtime heuristics.
  */
case class GraftStreamOffset(version: Int) extends Offset {
  override def json(): String = version.toString
}

/** `spark.readStream.format("graft")` — a manifest table as a
  * structured-streaming SOURCE (Delta's streaming source, on the commit
  * ledger this engine already has): each microbatch is exactly the data
  * directories APPENDED between two manifest versions, so a producer
  * committing through the protocol (`Manifest.commit`, the DSv2 write
  * path, a compactor) feeds consumers incrementally with exactly-once
  * accounting — the offset IS the version number, checkpointed by the
  * engine like any other stream.
  *
  * Contract: the streamed table must be APPEND-ONLY over the consumed
  * range. A replacing commit (compaction, fold, overwrite) REMOVES
  * directories; silently re-reading rewritten data would double-count,
  * so the stream fails loudly unless `ignoreChanges=true` is passed, in
  * which case only the ADDED directories of each version are emitted —
  * and a replacing commit's rewritten OUTPUT is itself an added
  * directory, so already-streamed rows ARE delivered again (Delta's
  * `ignoreChanges` semantics exactly: downstream must tolerate
  * duplicates, typically by keying on a unique id). Tombstone entries
  * ([[MergeOnRead]]) are never data and always skipped;
  * `startingVersion` replays from an older version (default: the
  * version current at stream start — only NEW commits stream, the
  * Delta default).
  */
class GraftMicroBatchStream(s: SparkSession, root: String,
    tableSchema: StructType, required: StructType,
    options: CaseInsensitiveStringMap)
  extends MicroBatchStream
  with org.apache.spark.sql.connector.read.streaming
    .SupportsTriggerAvailableNow {

  private val ignoreChanges =
    Option(options.get("ignoreChanges")).exists(_.toBoolean)

  // resolved once per stream START (not per batch): the boundary
  // between "history the stream skips" and "commits it consumes".
  // `startingVersion` names the first version to consume;
  // `startingTimestamp` (epoch ms) consumes every commit AFTER that
  // instant — the version current AT the timestamp is the skipped
  // prefix (Delta's startingTimestamp, on the manifest mtime rule);
  // a timestamp predating the first commit replays everything.
  private lazy val startVersion: Int =
    Option(options.get("startingVersion")).map(_.toInt - 1)
      .orElse(Option(options.get("startingTimestamp")).map(ts =>
        Manifest.versionAt(s, root, ts.toLong).getOrElse(0)))
      .getOrElse(Manifest.versions(s, root).lastOption.getOrElse(0))

  override def initialOffset(): Offset = GraftStreamOffset(startVersion)

  override def latestOffset(): Offset = {
    val vs = Manifest.versions(s, root)
    GraftStreamOffset(vs.lastOption.getOrElse(startVersion))
  }

  // ── admission control + Trigger.AvailableNow ──
  // A backfill from startingVersion 1 of a long-history table would
  // otherwise consume EVERY commit in one giant microbatch (the offset
  // jumps straight to head) — `maxVersionsPerBatch` caps each batch's
  // commit span so checkpoint granularity and executor memory stay
  // bounded during catch-up (Delta's maxFilesPerTrigger discipline at
  // this source's natural unit, the committed version).
  // Trigger.AvailableNow pins the drain TARGET once at stream start:
  // batches (still capped) run until the pinned head, then the query
  // STOPS — the production backfill/drain pattern — and commits that
  // land mid-drain wait for the next run instead of extending this one.
  private val maxVersionsPerBatch: Option[Int] =
    Option(options.get("maxVersionsPerBatch")).map { v =>
      val n = v.toInt
      require(n > 0, s"maxVersionsPerBatch must be positive, got $n")
      n
    }
  @volatile private var availableNowCap: Option[Int] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap =
      Some(Manifest.versions(s, root).lastOption.getOrElse(startVersion))

  override def getDefaultReadLimit
      : org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()

  override def latestOffset(start: Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : Offset = {
    val head = Manifest.versions(s, root).lastOption.getOrElse(startVersion)
    val target = availableNowCap.fold(head)(math.min(head, _))
    val from = start.asInstanceOf[GraftStreamOffset].version
    val to = maxVersionsPerBatch.fold(target)(n =>
      math.min(target, from + n))
    GraftStreamOffset(math.max(to, from))
  }

  override def reportLatestOffset(): Offset = latestOffset()

  override def deserializeOffset(json: String): Offset =
    GraftStreamOffset(json.trim.toInt)

  /** Data directories appended in (`from`, `to`] — the batch. */
  private def addedDirs(from: Int, to: Int): Seq[String] = {
    if (to <= from) return Seq.empty
    val before =
      if (from <= 0) Set.empty[String]
      else Manifest.entries(s, root, Some(from)).toSet
    val after = Manifest.entries(s, root, Some(to))
    val removed = before -- after.toSet
    require(removed.isEmpty || ignoreChanges,
      s"stream over $root: versions $from -> $to REMOVED " +
        s"${removed.size} director(ies) (a replacing commit — " +
        "compaction/fold/overwrite). Re-reading rewritten data would " +
        "double-count; pass ignoreChanges=true to consume the " +
        "replacing commit's output as a fresh append, accepting that " +
        "already-streamed rows are DELIVERED AGAIN (downstream must " +
        "tolerate duplicates).")
    val added = after.filterNot(before)
    // a MERGE-ON-READ UPDATE is an APPENDING commit (epoch-scoped
    // tombstone + morins re-insert pair) whose morins directory carries
    // REWRITTEN COPIES of already-streamed keys — streaming it as a
    // plain append silently re-delivers those keys with updated values,
    // violating the append-only contract just as a replacing commit
    // would. Fail as loudly as Delta does on an update commit; with
    // ignoreChanges the morins rows stream as fresh appends (the
    // documented duplicate-tolerating opt-in). Plain MoR DELETEs
    // (tombstone-only appends) keep the established skip semantics.
    val morUpdate = added.filter(e =>
      MergeOnRead.tombEpoch(e).isDefined ||
        new Path(e).getName.startsWith(MergeOnRead.InsertPrefix))
    require(morUpdate.isEmpty || ignoreChanges,
      s"stream over $root: versions $from -> $to include a " +
        s"merge-on-read UPDATE commit (${morUpdate.size} epoch-scoped " +
        "entr(ies)) whose rewritten rows would re-deliver " +
        "already-streamed keys with changed values. Pass " +
        "ignoreChanges=true to consume them as fresh appends " +
        "(downstream must tolerate re-delivered keys).")
    added.filterNot(MergeOnRead.isTombstone)
  }

  private def parquetScanOver(dirs: Seq[String]) = {
    val index = new InMemoryFileIndex(s, dirs.map(new Path(_)),
      Map.empty[String, String], Some(tableSchema),
      org.apache.spark.sql.execution.datasources.NoopCache, None, None)
    val b = ParquetScanBuilder(s, index, tableSchema, tableSchema,
      new CaseInsensitiveStringMap(java.util.Collections.emptyMap()))
    b.pruneColumns(required) // emitted rows must match scan.readSchema
    b.build()
  }

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val dirs = addedDirs(
      start.asInstanceOf[GraftStreamOffset].version,
      end.asInstanceOf[GraftStreamOffset].version)
    if (dirs.isEmpty) Array.empty
    else parquetScanOver(dirs).toBatch.planInputPartitions()
  }

  override def createReaderFactory(): PartitionReaderFactory =
    // schema-bound, file-agnostic: one factory serves every batch's
    // partitions (each PartitionedFile carries its own path), so build
    // it over an EMPTY index — no whole-table listing per factory, and
    // no failure if every version expired between batches
    parquetScanOver(Seq.empty).toBatch.createReaderFactory()

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}
