package graft.io.dsv2

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SQLContext, SaveMode, SparkSession}
import org.apache.spark.sql.connector.distributions.{Distribution,
  Distributions}
import org.apache.spark.sql.connector.expressions.{Expressions, SortOrder}
import org.apache.spark.sql.connector.write.{BatchWrite, LogicalWriteInfo,
  PhysicalWriteInfo, RequiresDistributionAndOrdering, SupportsTruncate,
  Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetWrite
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider}
import org.apache.spark.sql.types.{ArrayType, DataType, MapType,
  StructType, UserDefinedType}

import graft.io.{Manifest, MergeOnRead, SkipStats}

/** WRITE paths for `format("graft")`.
  *
  * EXISTING tables write through DataSourceV2 ([[GraftTable]] implements
  * `SupportsWrite`; see [[GraftWriteBuilder]]): `df.write.mode("append")`
  * plans as `AppendData`, `mode("overwrite")` as truncate-and-write —
  * both landing in ONE manifest commit, with optional
  * distribution/ordering hints. NEW tables (no committed version yet)
  * resolve to [[GraftMissingTable]], which lacks `SupportsWrite`, so
  * `DataFrameWriter.save` falls back to the V1
  * [[CreatableRelationProvider]] below — which runs the identical
  * commit protocol and also serves `errorifexists`/`ignore` modes.
  * Every mode maps to a manifest-protocol commit, so a plain `df.write`
  * producer gets the same snapshot isolation, atomicity, and
  * time-travelability as the Scala API — and the battle-tested
  * vectorized parquet writer does the data IO in both paths.
  *
  *  - `append`    → write a fresh data directory, then ONE appending
  *                  [[Manifest.commit]]; readers never see a partial
  *                  batch (an uncommitted directory is an orphan).
  *  - `overwrite` → fresh directory + ONE replacing [[Manifest.rewrite]]
  *                  — old versions still time-travel (this is Delta's
  *                  `overwrite`, not an rm -rf).
  *  - `errorifexists` (default) → commit version 0 of a NEW table;
  *                  refuses an existing one.
  *  - `ignore`    → no-op when the table exists.
  *
  * Option `statsCols` (comma-separated) writes the [[SkipStats]] sidecar
  * over the fresh directory before the commit, so skip-pruning works
  * from the first version — the t25 ingest discipline, available to SQL
  * users. The data directory is named `data/w{version-attempt}-{uuid}`:
  * unique per write, so concurrent appenders race only on the manifest
  * commit (which is the protocol's job to arbitrate), never on files.
  */
trait GraftWriteSupport extends CreatableRelationProvider {

  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val s = sqlContext.sparkSession
    val root = parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graft write requires a path (the manifest table root)"))
    val exists = scala.util.Try(Manifest.versions(s, root))
      .toOption.exists(_.nonEmpty)
    def csvParam(k: String): Seq[String] = parameters.get(k.toLowerCase)
      .orElse(parameters.get(k))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    val statsCols = csvParam("statsCols")
    val bloomCols = csvParam("bloomCols")
    def writeAndCommit(replacing: Boolean): Unit = {
      val dir = s"$root/data/w-" + java.util.UUID.randomUUID().toString
      data.write.parquet(dir)
      if (statsCols.nonEmpty) SkipStats.write(s, dir, statsCols)
      if (bloomCols.nonEmpty)
        graft.io.BloomSidecar.write(s, dir, bloomCols)
      // declared CHECK constraints gate the V1 path too — a plain
      // `df.write.format("graft")` producer gets the same enforcement
      // as the catalog INSERT (violation deletes the stage and raises)
      graft.io.Constraints.enforceStaged(s, root, dir)
      if (replacing) Manifest.rewrite(s, root, Seq(dir))
      else Manifest.commit(s, root, dir)
    }
    mode match {
      case SaveMode.Append => writeAndCommit(replacing = false)
      case SaveMode.Overwrite => writeAndCommit(replacing = exists)
      case SaveMode.ErrorIfExists =>
        if (exists) throw new IllegalArgumentException(
          s"manifest table already exists at $root (use append/overwrite)")
        writeAndCommit(replacing = false)
      case SaveMode.Ignore => if (!exists) writeAndCommit(replacing = false)
    }
    new BaseRelation {
      override def sqlContext: SQLContext = s.sqlContext
      override def schema: StructType = data.schema
    }
  }
}

/** DSv2 write builder for an EXISTING manifest table: the physical file
  * IO delegates to Spark's own [[ParquetWrite]] (vectorized writer, task
  * commit protocol) pointed at a FRESH `data/w-{uuid}` directory, and the
  * driver-side `BatchWrite.commit` — which Spark calls exactly once,
  * after every task committed — appends or replaces that directory as
  * ONE manifest commit. Readers never see a partial write (an
  * uncommitted directory is an orphan; `abort` leaves only orphans for
  * the sweep), concurrent appenders race only on the manifest commit.
  *
  * Write options:
  *  - `statsCols` — comma-separated; writes the [[SkipStats]] sidecar
  *    over the fresh directory BEFORE the commit, so the new files are
  *    prunable from the moment they are visible.
  *  - `sortBy` — comma-separated; advertised to Spark as the write's
  *    required distribution (range-partitioned) AND in-partition
  *    ordering via [[RequiresDistributionAndOrdering]], so rows land
  *    range-clustered — tight per-file min/max for the skip-stats the
  *    sidecar records (pair with `statsCols` on the same columns).
  *
  * `SaveMode.Overwrite` arrives as [[SupportsTruncate.truncate]] and
  * becomes a REPLACING commit ([[Manifest.rewrite]]) — old versions
  * still time-travel; it is never an rm -rf.
  */
class GraftWriteBuilder(s: SparkSession, root: String,
    info: LogicalWriteInfo, colMap: Map[String, String] = Map.empty)
  extends WriteBuilder with SupportsTruncate {

  private var replacing = false

  override def truncate(): WriteBuilder = { replacing = true; this }

  override def build(): Write = {
    val props = GraftTableProps.read(s, root)
    val pcols = props.get("partitioncols")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    if (pcols.isEmpty) new GraftV2Write(s, root, info, replacing,
      colMap = colMap)
    else {
      // partitioned table: one dynamic partitioned write job straight
      // from the DataFrame via the DSv2→V1 write bridge
      def csv(key: String): Seq[String] = Option(info.options.get(key))
        .orElse(props.get(key.toLowerCase))
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
        .getOrElse(Seq.empty)
      val (statsCols, bloomCols) = (csv("statsCols"), csv("bloomCols"))
      val wasReplacing = replacing
      val l2p = colMap.map(_.swap)
      def phys(c: String) = l2p.getOrElse(c, c)
      new org.apache.spark.sql.connector.write.V1Write {
        override def toInsertableRelation
            : org.apache.spark.sql.sources.InsertableRelation =
          (data: DataFrame, overwrite: Boolean) => {
            val physData = colMap.foldLeft(data) {
              case (df, (p, l)) => df.withColumnRenamed(l, p)
            }
            GraftPartitionedWrite.insert(s, root, physData,
              pcols.map(phys), statsCols.map(phys), bloomCols.map(phys),
              replacing = wasReplacing || overwrite, colMap = colMap)
          }
        override def description(): String =
          s"GraftPartitionedWrite root=$root " +
            s"partitionCols=${pcols.mkString("+")}"
      }
    }
  }
}

class GraftV2Write(s: SparkSession, root: String,
    logicalInfo: LogicalWriteInfo, replacing: Boolean,
    fromRowOp: Boolean = false,
    opState: Option[GraftRowOpState] = None,
    colMap: Map[String, String] = Map.empty) extends Write
  with RequiresDistributionAndOrdering {

  // ── column mapping (ALTER TABLE RENAME COLUMN): physical parquet
  // names are FROZEN at first write — a write to a mapped table lands
  // files under the ORIGINAL physical names (rows are positional, only
  // the schema handed to the parquet delegate changes), so one global
  // physical→logical mapping stays valid across every directory ──
  private val l2p: Map[String, String] = colMap.map(_.swap)
  private def physName(c: String): String = l2p.getOrElse(c, c)
  private val info: LogicalWriteInfo =
    if (colMap.isEmpty) logicalInfo
    else new LogicalWriteInfo {
      override def queryId: String = logicalInfo.queryId
      override def schema: StructType = StructType(
        logicalInfo.schema.map(f => f.copy(name = physName(f.name))))
      override def options: org.apache.spark.sql.util
          .CaseInsensitiveStringMap = logicalInfo.options
    }

  // write options win; the table's persisted properties (CREATE TABLE
  // TBLPROPERTIES, GraftTableProps) are the defaults — statsCols/sortBy
  // declared once at creation govern every later INSERT
  private lazy val tableProps = GraftTableProps.read(s, root)

  private def csv(key: String): Seq[String] =
    Option(info.options.get(key))
      .orElse(tableProps.get(key.toLowerCase))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)

  private val statsCols = csv("statsCols")
  private val sortBy = csv("sortBy")

  private val dir =
    s"$root/data/w-" + java.util.UUID.randomUUID().toString

  // parquet's own type support, mirrored (scalars + nested, recursively;
  // interval/variant-style non-storable types refuse)
  private def parquetSupports(dt: DataType): Boolean = dt match {
    case st: StructType => st.fields.forall(f => parquetSupports(f.dataType))
    case ArrayType(et, _) => parquetSupports(et)
    case MapType(k, v, _) => parquetSupports(k) && parquetSupports(v)
    case udt: UserDefinedType[_] => parquetSupports(udt.sqlType)
    case _: org.apache.spark.sql.types.CalendarIntervalType => false
    case _: org.apache.spark.sql.types.NullType => false
    case _ => true
  }

  private val delegate =
    ParquetWrite(Seq(dir), "parquet", parquetSupports, info)

  override def requiredDistribution(): Distribution =
    if (sortBy.isEmpty) Distributions.unspecified()
    else Distributions.ordered(requiredOrdering())

  override def requiredOrdering(): Array[SortOrder] =
    sortBy.map(c => Expressions.sort(Expressions.column(c),
      org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING))
      .toArray

  override def description(): String =
    s"GraftWrite root=$root dir=$dir replacing=$replacing " +
      s"statsCols=${statsCols.mkString("+")} sortBy=${sortBy.mkString("+")}"

  override def toBatch: BatchWrite = new BatchWrite {
    private val db = delegate.toBatch

    override def createBatchWriterFactory(pinfo: PhysicalWriteInfo) = {
      val inner = db.createBatchWriterFactory(pinfo)
      // a group-based row-level rewrite (SQL DELETE/UPDATE/MERGE) hands
      // the writer rows prefixed with the __row_operation marker when
      // the operation declares no metadata attributes (Spark applies
      // its row projection only alongside a metadata projection) —
      // strip it so the parquet writer sees exactly the data schema
      if (fromRowOp) new MarkerStrippingFactory(inner, info.schema())
      else inner
    }

    // the file commit protocol coordinates its own task commits
    override def useCommitCoordinator(): Boolean = db.useCommitCoordinator()

    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      db.commit(messages) // finalize task files into the fresh dir
      // a DML rewrite CARRIES the table's pruning discipline: when the
      // directories being replaced had skip-stats sidecars, the
      // rewritten directory gets sidecars over the same columns — a
      // takedown must not leave an unprunable hole in the layout
      val cols =
        if (statsCols.nonEmpty) statsCols
        else if (!fromRowOp) Seq.empty
        else {
          // tombstone entries never carry sidecars — a MoR-table
          // UPDATE/MERGE rewrite must judge coverage over DATA dirs
          // only, or the carry silently drops for exactly that case
          val replaced = opState.flatMap(_.replacedDirs).getOrElse(
            scala.util.Try(Manifest.committed(s, root))
              .getOrElse(Seq.empty))
            .filterNot(MergeOnRead.isTombstone)
          val f = new Path(root)
            .getFileSystem(s.sparkContext.hadoopConfiguration)
          val sided = replaced.flatMap(d => SkipStats.read(f, d))
          if (sided.size == replaced.size && sided.nonEmpty)
            sided.map(_.keySet).reduce(_ intersect _).toSeq.sorted
          else Seq.empty
        }
      val fDir = new Path(dir)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      val hasFiles = fDir.exists(new Path(dir)) &&
        fDir.listStatus(new Path(dir))
          .exists(_.getPath.getName.endsWith(".parquet"))
      // a CoW DML whose runtime group filter matched NOTHING is a
      // no-op: the filtered scan returned zero rows by construction
      // (zero kept partitions), so committing would append an empty
      // directory and mutate the table version for a DELETE that
      // deleted nothing — match the MoR path, which commits nothing on
      // no match. A task may still have eagerly created a zero-row
      // parquet file; the uncommitted dir stays an orphan for the
      // sweep, like an abort.
      if (fromRowOp &&
          opState.flatMap(_.replacedDirs).exists(_.isEmpty)) return
      if (!hasFiles)
        // a rewrite whose every input row was deleted still needs a
        // schema-bearing file — the committed entry must stay readable
        s.createDataFrame(
          s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          info.schema()).coalesce(1).write.mode("append").parquet(dir)
      // sidecar keys live in PHYSICAL-name space like the files
      if (cols.nonEmpty && hasFiles)
        SkipStats.write(s, dir, cols.map(physName))
      // bloom sidecars ride the same option/property + DML-carry rules
      val bloomCols = {
        val opt = csv("bloomCols")
        if (opt.nonEmpty || !fromRowOp) opt
        else {
          val replaced = opState.flatMap(_.replacedDirs).getOrElse(
            scala.util.Try(Manifest.committed(s, root))
              .getOrElse(Seq.empty))
            .filterNot(MergeOnRead.isTombstone)
          val f = new Path(root)
            .getFileSystem(s.sparkContext.hadoopConfiguration)
          val sided = replaced.flatMap(d => graft.io.BloomSidecar.read(f, d))
          if (sided.size == replaced.size && sided.nonEmpty)
            sided.map(_.keySet).reduce(_ intersect _).toSeq.sorted
          else Seq.empty
        }
      }
      if (bloomCols.nonEmpty && hasFiles)
        graft.io.BloomSidecar.write(s, dir, bloomCols.map(physName))
      // declared CHECK constraints gate EVERY commit through this
      // write — INSERTs and DML rewrites alike (Delta enforces its
      // invariants on UPDATE/MERGE output too): one column-pruned
      // aggregate pass over the staged directory, violation deletes
      // the stage and raises before any manifest write
      graft.io.Constraints.enforceStaged(s, root, dir, colMap)
      opState.flatMap(_.replacedDirs) match {
        // runtime-group-filtered row op: replace exactly the matched
        // directories; everything else carries verbatim
        case Some(replaced) =>
          Manifest.replaceDirs(s, root, replaced.toSet, Seq(dir))
        case None =>
          if (replacing) Manifest.rewrite(s, root, Seq(dir))
          else Manifest.commit(s, root, dir)
      }
    }

    override def abort(messages: Array[WriterCommitMessage]): Unit =
      db.abort(messages) // the dir stays an orphan for the sweep

    override def toString: String = description()
  }
}

/** PARTITIONED-table write path (`CREATE TABLE … PARTITIONED BY`):
  * every INSERT/overwrite lands ONE DIRECTORY PER PARTITION VALUE and
  * commits them all as one manifest version, each leaf carrying
  * constant-bound skip-stats on the partition columns — so an equality
  * filter prunes whole directories at PLANNING (the manifest-native
  * form of hive listing-level pruning: pruned directories are never
  * even listed, and the stats ride the manifest annotations at zero
  * planning IO).
  *
  * The write partitions on a SHADOW COPY of each partition column
  * (`__gp_<col>`): `partitionBy` consumes its column (hive layout
  * drops it from the files), but a committed manifest entry must be a
  * stand-alone readable directory — the copy keeps the real column in
  * every file while the shadow names the directories. Reading a leaf
  * directly never resurfaces the shadow (partition discovery looks
  * below the root path, not at it).
  *
  * Executed through the DSv2 V1-write fallback
  * ([[org.apache.spark.sql.connector.write.V1Write]]): the dynamic
  * partitioned write is one Spark job straight from the query's
  * DataFrame — no flat landing + re-split double IO on the ingest hot
  * path. Row-level DML rewrites stay flat (their sidecar carry keeps
  * the pruning); `CALL lake.cluster` re-layouts freely (partition
  * evolution).
  */
object GraftPartitionedWrite {

  private def shadow(c: String) = "__gp_" + c

  /** The partition-value leaf directories under a staged partitioned
    * write (depth = partition column count; `=` in the name marks the
    * hive-style level).
    */
  private[dsv2] def leafDataDirs(f: org.apache.hadoop.fs.FileSystem,
      p: Path): Seq[String] = {
    val st = f.listStatus(p).toSeq
    val subs = st.filter(x => x.isDirectory &&
      x.getPath.getName.contains("="))
    if (subs.isEmpty) {
      if (st.exists(x => x.isFile &&
          x.getPath.getName.endsWith(".parquet")))
        Seq(p.toUri.getPath)
      else Seq.empty
    } else subs.flatMap(x => leafDataDirs(f, x.getPath))
  }

  /** Land `data` partition-split and commit every leaf as ONE version
    * (append, or replacing for overwrite). Column names arrive
    * PHYSICAL (the caller translates a mapped table's logical names).
    */
  def insert(s: SparkSession, root: String, data: DataFrame,
      partitionCols: Seq[String], statsCols: Seq[String],
      bloomCols: Seq[String], replacing: Boolean,
      colMap: Map[String, String] = Map.empty): Unit = {
    val stage = s"$root/data/w-" + java.util.UUID.randomUUID().toString
    val withShadow = partitionCols.foldLeft(data)((df, c) =>
      df.withColumn(shadow(c), org.apache.spark.sql.functions.col(c)))
    withShadow.write.partitionBy(partitionCols.map(shadow): _*)
      .parquet(stage)
    val f = new Path(stage)
      .getFileSystem(s.sparkContext.hadoopConfiguration)
    val leaves = leafDataDirs(f, new Path(stage)).sorted
    if (leaves.isEmpty) {
      // a zero-row append commits nothing (the DML no-op contract); a
      // zero-row overwrite still must empty the table at full schema
      if (replacing) Manifest.rewrite(s, root,
        Seq(GraftDdl.writeEmptyDir(s, root, data.schema)))
      return
    }
    // declared CHECK constraints: one column-pruned pass over the
    // staged tree BEFORE any sidecar work — a violating batch deletes
    // the stage and raises with the manifest untouched
    graft.io.Constraints.enforceStaged(s, root, stage, colMap)
    val sc = (statsCols ++ partitionCols).distinct
    val (statBodies, counts) = installLeafStats(s, leaves, sc)
    val bloomed: Map[String, Seq[String]] =
      if (bloomCols.isEmpty) Map.empty
      else installLeafBlooms(s, leaves, bloomCols,
        counts.values.foldLeft(1024L)(math.max))
    // SEED the commit's annotations from what this writer already
    // holds: each covered leaf's stats body, its bloom coverage, and
    // the insert's shared schema (ONE footer probe, every leaf carries
    // the same columns by construction) — so the commit itself does
    // zero per-leaf probes. A leaf that fell back keeps the probe path.
    val schemaJson = Manifest.inferDirSchema(s, leaves.head).map(_.json)
    val seed: Map[(String, String), String] = leaves.flatMap { d =>
      statBodies.get(d).map(b => Manifest.seedStats(d, b)).toSeq ++
        // seed coverage from the columns whose filter actually landed
        // in the leaf's sidecar, never the requested set (an all-null
        // column within a leaf produces no grouped-agg filter)
        bloomed.get(d).filter(_.nonEmpty)
          .map(cs => Manifest.seedBloom(d, cs)).toSeq ++
        schemaJson.map(j => Manifest.seedSchema(d, j)).toSeq
    }.toMap
    if (replacing) Manifest.rewrite(s, root, leaves, seedAnn = seed)
    else Manifest.commitAll(s, root, leaves, seedAnn = seed)
  }

  /** Run `task` over every element with a small driver-side thread
    * pool — the installer for per-leaf SIDECAR FILE writes, which are
    * tiny but latency-bound (one create round trip each): sequential
    * at 1024 partition values on an object store is minutes of commit
    * latency for kilobytes of data. Bounded parallelism, fail-fast.
    */
  private def inParallel[T](items: Seq[T])(task: T => Unit): Unit = {
    if (items.isEmpty) return
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(16, items.size))
    try {
      val futures = items.map(i => pool.submit(new Runnable {
        override def run(): Unit = task(i)
      }))
      futures.foreach(_.get()) // propagate the first failure
    } finally pool.shutdown()
  }

  /** Every leaf's skip-stats from ONE grouped aggregation (grouping on
    * each row's source directory) — a per-leaf [[SkipStats.write]]
    * would be one driver-sequential Spark job per partition value,
    * which at high partition cardinality is the planning-metadata
    * bottleneck all over again on the WRITE side. Rendering is
    * identical to `SkipStats.write`'s (`min/max cast to string`,
    * non-null counts); a leaf the path normalization failed to match
    * falls back to the per-directory job — never an unprunable hole.
    */
  private def installLeafStats(s: SparkSession, leaves: Seq[String],
      cols: Seq[String]): (Map[String, String], Map[String, Long]) = {
    import org.apache.spark.sql.functions._
    val df0 = graft.io.SchemaMemo.read(s, leaves)
    val tags = cols.map { c =>
      val dt = df0.schema(c).dataType
      c -> SkipStats.typeTagOf(dt).getOrElse(
        throw new IllegalArgumentException(
          s"no skip-stats support for column $c of type $dt"))
    }
    val df = df0.withColumn("__gdir",
      expr("regexp_extract(input_file_name(), '^(.*)/[^/]+$', 1)"))
    val aggs = count(lit(1)).as("_cnt") +: tags.flatMap { case (c, _) =>
      // statExpr: timestamps aggregate as epoch micros, matching
      // their stored "long" tag (same normalization as SkipStats.write)
      val e = SkipStats.statExpr(c, df0.schema(c).dataType)
      Seq(min(e).cast("string"), max(e).cast("string"),
        count(col(c)))
    }
    val rows = df.groupBy(col("__gdir")).agg(aggs.head, aggs.tail: _*)
      .collect() // one row per leaf — bounded by the leaf list itself
    val leafSet = leaves.toSet
    val rendered = rows.flatMap { r =>
      val d = new Path(r.getString(0)).toUri.getPath
      if (!leafSet.contains(d)) None
      else {
        val stats = tags.zipWithIndex.map { case ((c, t), i) =>
          val (mn, mx) =
            (r.getString(2 + 3 * i), r.getString(3 + 3 * i))
          val bounds =
            if (mn != null && mx != null) Some((mn, mx)) else None
          c -> SkipStats.ColStats(t, bounds)
        }
        val nonNull = tags.zipWithIndex.map { case ((c, _), i) =>
          c -> r.getLong(4 + 3 * i)
        }.toMap
        Some((d, SkipStats.render(r.getLong(1), stats, nonNull),
          r.getLong(1)))
      }
    }
    // parallel file installs: the sidecars were all computed by the ONE
    // grouped job above; landing them is latency-bound small IO
    inParallel(rendered.toSeq) { case (d, body, _) =>
      SkipStats.installRendered(s, d, body)
    }
    leaves.filterNot(rendered.map(_._1).toSet)
      .foreach(d => SkipStats.write(s, d, cols))
    (rendered.map(t => t._1 -> t._2).toMap,
      rendered.map(t => t._1 -> t._3).toMap)
  }

  /** Every leaf's BLOOM sidecar from ONE grouped aggregation
    * ([[graft.expressions.SidecarBloomAgg]] keyed on the same `__gdir`
    * expression as the stats job) — the per-leaf `df.stat.bloomFilter`
    * loop was one driver-sequential Spark job per partition value, the
    * exact pattern [[installLeafStats]] kills for min/max. The shared
    * filter capacity is the LARGEST leaf's row count (group buffers
    * must be bit-compatible; small leaves just get a lower fpp), so
    * driver memory for the collected filters is bounded up front —
    * when the estimate exceeds `spark.graft.bloomSidecar.maxCollectBytes`
    * (default 512 MB) the whole build falls back to the per-leaf jobs,
    * as does any leaf the path normalization failed to match. Returns
    * each leaf's INSTALLED coverage — the columns whose filter
    * actually landed in its sidecar — so the commit seeds annotations
    * that never advertise coverage the sidecar lacks.
    */
  private def installLeafBlooms(s: SparkSession, leaves: Seq[String],
      cols: Seq[String], expectedItems: Long)
      : Map[String, Seq[String]] = {
    import org.apache.spark.sql.functions._
    import graft.io.BloomSidecar
    val fpp = BloomSidecar.fpp(s)
    // optimal bit count computed ARITHMETICALLY (the same
    // m = -n·ln(p)/ln(2)² every bloom implementation optimizes to) —
    // materializing a filter just to measure it would allocate the
    // full bit array (gigabytes at 10⁹ rows) inside the very guard
    // meant to cap driver memory
    val bitsPer = math.ceil(-expectedItems.toDouble * math.log(fpp) /
      (math.log(2) * math.log(2))).toLong
    val maxBytes = s.conf
      .get("spark.graft.bloomSidecar.maxCollectBytes", "536870912").toLong
    if (bitsPer / 8 * leaves.size.toLong * cols.size > maxBytes) {
      leaves.foreach(d => BloomSidecar.write(s, d, cols))
      return leaves.map(_ -> cols).toMap
    }
    val df0 = graft.io.SchemaMemo.read(s, leaves)
    val typed = cols.map { c =>
      c -> BloomSidecar.tag(df0.schema(c).dataType).getOrElse(
        throw new IllegalArgumentException(
          s"no bloom-sidecar support for column $c of type " +
            df0.schema(c).dataType))
    }
    graft.expressions.LongArrayOps.register(s) // idempotent
    val df = df0.withColumn("__gdir",
      expr("regexp_extract(input_file_name(), '^(.*)/[^/]+$', 1)"))
    val aggs = typed.map { case (c, _) =>
      call_function("graft_sidecar_bloom_agg", col(c),
        lit(expectedItems), lit(fpp)).as(s"__bf_$c")
    }
    val rows = df.groupBy(col("__gdir")).agg(aggs.head, aggs.tail: _*)
      .collect()
    val leafSet = leaves.toSet
    val covered = rows.flatMap { r =>
      val d = new Path(r.getString(0)).toUri.getPath
      if (!leafSet.contains(d)) None
      else {
        val filters = typed.zipWithIndex.flatMap { case ((c, t), i) =>
          Option(r.get(1 + i))
            .map(b => (c, t, b.asInstanceOf[Array[Byte]]))
        }
        Some((d, filters))
      }
    }
    inParallel(covered.toSeq) { case (d, filters) =>
      BloomSidecar.install(s, d, filters)
    }
    // coverage per leaf = the columns whose filter actually LANDED:
    // the grouped agg emits no filter for a column all-null within a
    // leaf, and an annotation claiming the full requested set would
    // advertise coverage the sidecar lacks (consults fail open, so
    // correctness held, but the all-null leaf lost its point-probe
    // prune); fallback leaves go through the per-leaf build, which
    // installs every requested column (empty filters included)
    val done: Map[String, Seq[String]] =
      covered.map(t => t._1 -> t._2.map(_._1).toSeq).toMap
    val fallback = leaves.filterNot(done.contains)
    fallback.foreach(d => BloomSidecar.write(s, d, cols))
    done ++ fallback.map(_ -> cols)
  }
}

/** Strips the leading `__row_operation` marker a group-based row-level
  * rewrite carries into the writer (see [[GraftV2Write]]): rows arriving
  * with one extra leading field are projected down to the data schema;
  * rows already at the data arity pass through untouched.
  */
class MarkerStrippingFactory(
    inner: org.apache.spark.sql.connector.write.DataWriterFactory,
    dataSchema: StructType)
  extends org.apache.spark.sql.connector.write.DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DataWriter[
        org.apache.spark.sql.catalyst.InternalRow] = {
    val d = inner.createWriter(partitionId, taskId)
    new org.apache.spark.sql.connector.write.DataWriter[
        org.apache.spark.sql.catalyst.InternalRow] {
      private val proj = org.apache.spark.sql.catalyst.ProjectingInternalRow(
        dataSchema, (1 to dataSchema.length).toIndexedSeq)
      override def write(
          row: org.apache.spark.sql.catalyst.InternalRow): Unit =
        if (row.numFields == dataSchema.length) d.write(row)
        else { proj.project(row); d.write(proj) }
      override def commit(): WriterCommitMessage = d.commit()
      override def abort(): Unit = d.abort()
      override def close(): Unit = d.close()
    }
  }
}
