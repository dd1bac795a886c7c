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

  protected def parquetScanOver(dirs: Seq[String]) = {
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

// ─────────────────────── STREAMING CHANGE DATA FEED ──────────────────

/** The three CDC metadata columns a change feed appends to the table
  * schema — Delta's `readChangeFeed` vocabulary ([[graft.io.Cdc]]).
  */
object GraftCdcMeta {
  import org.apache.spark.sql.types.{IntegerType, StringType,
    StructField, TimestampType}
  val fields: Seq[StructField] = Seq(
    StructField(graft.io.Cdc.ChangeType, StringType, nullable = false),
    StructField(graft.io.Cdc.CommitVersion, IntegerType,
      nullable = false),
    StructField(graft.io.Cdc.CommitTimestamp, TimestampType,
      nullable = false))

  def schemaOf(base: StructType): StructType =
    StructType(base.fields.map(_.copy(nullable = true)) ++ fields)
}

/** `spark.readStream.format("graft").option("readChangeFeed", "true")`
  * — the table as a streaming CHANGE feed (Delta's streaming CDF):
  * each microbatch delivers the change rows of the commits it spans,
  * with IO ∝ the change — appended directories stream as `insert`,
  * a merge-on-read update's rewritten rows as `update_postimage`, and
  * its tombstone keys as `delete` rows (key column set, remaining
  * columns null). That key-only delete shape is the one honest
  * difference from batch [[graft.io.Cdc]]: a preimage would cost a
  * snapshot read per microbatch, which a stream cannot amortize —
  * and keyed deletes are exactly what the standard consumer (a
  * downstream replica applying upserts/deletes by key) needs.
  *
  * Replacing commits: layout-preserving maintenance (`#op:` compact /
  * cluster / fold) is SKIPPED — the feed keeps flowing through
  * compaction, where the plain stream must refuse or re-deliver —
  * and a rewriting commit without a marker fails loudly (its changes
  * are a snapshot diff only batch `table_changes` can compute).
  */
class GraftCdcMicroBatchStream(cs: SparkSession, croot: String,
    base: StructType, coptions: CaseInsensitiveStringMap)
  extends GraftMicroBatchStream(cs, croot, base, base, coptions) {

  private case class Slice(dirs: Seq[String], changeType: String,
      version: Int, tsMicros: Long)

  /** The change slices of versions (`from`, `to`] — each a scan of
    * directory entries plus the constant metadata its rows carry.
    */
  private def slices(from: Int, to: Int): Seq[Slice] = {
    if (to <= from) return Seq.empty
    val vs = Manifest.versions(cs, croot)
    (from + 1 to to).filter(vs.contains).flatMap { v =>
      // an expired predecessor makes the step's delta unrecoverable —
      // fail loudly rather than re-deliver the whole version as fresh
      if (v > 1 && !vs.contains(v - 1))
        throw new IllegalStateException(
          s"change feed over $croot: version ${v - 1} has been " +
            s"expired, so version $v's delta is unrecoverable — " +
            "restart the feed from a fresh snapshot")
      val before =
        if (v == 1) Set.empty[String]
        else Manifest.entries(cs, croot, Some(v - 1)).toSet
      val after = Manifest.entries(cs, croot, Some(v))
      val added = after.filterNot(before)
        .filterNot(graft.io.ColumnMapping.isMapping)
      val removed = (before -- after.toSet)
        .filterNot(graft.io.ColumnMapping.isMapping)
      if (removed.nonEmpty) {
        val op = Manifest.opOf(cs, croot, v)
        if (op.exists(graft.io.Cdc.LayoutPreservingOps.contains))
          Seq.empty // maintenance re-layout: no logical change
        else throw new IllegalStateException(
          s"change feed over $croot: version $v is a rewriting " +
            s"commit (op=${op.getOrElse("unmarked")}) whose changes " +
            "are a snapshot diff — consume it with batch " +
            "table_changes and restart the feed past it")
      } else {
        val ts = Manifest.commitTimeOf(cs, croot, v) * 1000L
        val (tombs, data) = added.partition(MergeOnRead.isTombstone)
        val (morins, plain) = data.partition(d =>
          new Path(d).getName.startsWith(MergeOnRead.InsertPrefix))
        Seq(
          Slice(plain, "insert", v, ts),
          Slice(morins, "update_postimage", v, ts),
          Slice(tombs, "delete", v, ts)).filter(_.dirs.nonEmpty)
      }
    }
  }

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] =
    slices(start.asInstanceOf[GraftStreamOffset].version,
      end.asInstanceOf[GraftStreamOffset].version).flatMap { sl =>
      // tombstone directories carry only the key column; the scan is
      // schema-bound to the TABLE schema, so the parquet reader fills
      // the absent columns with null (evolved-read semantics) — the
      // keyed-delete row shape by construction
      parquetScanOver(sl.dirs).toBatch.planInputPartitions()
        .map(p => GraftCdcInputPartition(p, sl.changeType, sl.version,
          sl.tsMicros): InputPartition)
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftCdcReaderFactory(super.createReaderFactory())
}

/** A data partition plus the constant CDC metadata its rows carry. */
case class GraftCdcInputPartition(delegate: InputPartition,
    changeType: String, version: Int, tsMicros: Long)
  extends InputPartition

/** Appends the three constant metadata fields to every row of the
  * wrapped reader — a [[org.apache.spark.sql.catalyst.expressions
  * .JoinedRow]] against a per-partition constant, zero copies.
  */
class GraftCdcReaderFactory(delegate: PartitionReaderFactory)
  extends PartitionReaderFactory {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow,
    JoinedRow}
  import org.apache.spark.sql.connector.read.PartitionReader
  import org.apache.spark.unsafe.types.UTF8String

  override def createReader(p: InputPartition)
      : PartitionReader[InternalRow] = {
    val cp = p.asInstanceOf[GraftCdcInputPartition]
    val inner = delegate.createReader(cp.delegate)
    val meta = new GenericInternalRow(Array[Any](
      UTF8String.fromString(cp.changeType), cp.version, cp.tsMicros))
    new PartitionReader[InternalRow] {
      private val joined = new JoinedRow
      override def next(): Boolean = inner.next()
      override def get(): InternalRow = joined(inner.get(), meta)
      override def close(): Unit = inner.close()
    }
  }
}

/** The table in change-feed mode ([[GraftCdcMicroBatchStream]]):
  * schema = table schema + CDC metadata, capability = micro-batch
  * read ONLY — batch CDC is `table_changes(...)`'s job, and the
  * missing BATCH_READ capability turns a batch read into a loud
  * planner refusal instead of a silent non-change scan.
  */
class GraftCdcTable(s: SparkSession, root: String, base: StructType,
    tableOptions: CaseInsensitiveStringMap)
  extends org.apache.spark.sql.connector.catalog.Table
  with org.apache.spark.sql.connector.catalog.SupportsRead {
  import org.apache.spark.sql.connector.catalog.TableCapability
  import org.apache.spark.sql.connector.read.{Scan, ScanBuilder}

  private val cdcSchema = GraftCdcMeta.schemaOf(base)

  override def name(): String = s"graft.`$root`@changes"

  override def schema(): StructType = cdcSchema

  override def capabilities()
      : java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = { () =>
    new Scan {
      override def readSchema(): StructType = cdcSchema
      override def description(): String = s"GraftCdcScan($root)"
      override def toMicroBatchStream(checkpointLocation: String)
          : MicroBatchStream = {
        // scan-time options (readStream.option(...)) carry the stream
        // knobs (startingVersion, maxVersionsPerBatch); fall back to
        // the table-load options for catalogs that resolved them there
        val merged = new java.util.HashMap[String, String]()
        tableOptions.forEach((k, v) => merged.put(k, v))
        options.forEach((k, v) => merged.put(k, v))
        new GraftCdcMicroBatchStream(s, root, base,
          new CaseInsensitiveStringMap(merged))
      }
    }
  }
}
