package graft.io.dsv2

import java.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{Identifier,
  ProcedureCatalog, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.catalog.procedures.UnboundProcedure
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.io.Manifest

/** Catalog plugin exposing manifest tables to PLAIN SQL — the second
  * half of the DSv2 story ([[GraftDataSource]] is `spark.read`; this is
  * `spark.sql`):
  *
  * {{{
  *   spark.conf: spark.sql.catalog.lake = graft.io.dsv2.GraftCatalog
  *               spark.sql.catalog.lake.root = /warehouse
  *   SELECT * FROM lake.events                       -- /warehouse/events
  *   SELECT * FROM lake.events VERSION AS OF 3       -- time travel
  *   SELECT * FROM lake.events VERSION AS OF 'v1.0'  -- named tag (io37)
  *   SELECT * FROM lake.events TIMESTAMP AS OF '...' -- commit instant
  * }}}
  *
  * Identifiers map to directories under the configured warehouse root
  * (namespace segments become path segments), so a table is exactly a
  * committed manifest root — no separate metastore to drift from the
  * storage truth. The full SQL lifecycle works: `CREATE TABLE` / CTAS
  * / `CREATE OR REPLACE` (staged — one atomic manifest version),
  * INSERT / row-level DML, time travel, maintenance `CALL`s, and a
  * clone-guarded `DROP TABLE`. Every mutation rides the manifest
  * commit protocol ([[Manifest.commit]] and friends) — never a bare
  * filesystem write.
  *
  * `VERSION AS OF` accepts a version number or a tag name (Spark hands
  * both through as the string form); `TIMESTAMP AS OF` arrives as
  * epoch MICROseconds and resolves through the manifest mtime rule
  * ([[Manifest.versionAt]]). Tables with live MoR tombstones fail
  * loudly at load ([[GraftTable.resolve]]) — fold first, or read with
  * the `morKey` option through the reader path.
  */
class GraftCatalog extends TableCatalog with ProcedureCatalog
  with org.apache.spark.sql.connector.catalog.StagingTableCatalog {

  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = options.get("root")
    require(warehouse != null && warehouse.nonEmpty,
      s"catalog '$name' requires spark.sql.catalog.$name.root " +
        "(the warehouse directory manifest tables live under)")
    // any session that mounts a graft catalog gets the over-cap MoR
    // re-plan (idempotent) — sessions built without
    // spark.sql.extensions would otherwise hit the scan's loud
    // refusal on heavily-tombstoned tables
    graft.plans.MorAntiJoinStrategy.install(SparkSession.active)
  }

  override def name(): String = catalogName

  private def rootOf(ident: Identifier): String =
    (warehouse +: (ident.namespace() :+ ident.name())).mkString("/")

  private def emptyOpts: CaseInsensitiveStringMap =
    new CaseInsensitiveStringMap(util.Collections.emptyMap())

  private def opts(kv: (String, String)*): CaseInsensitiveStringMap = {
    val m = new util.HashMap[String, String]()
    kv.foreach { case (k, v) => m.put(k, v) }
    new CaseInsensitiveStringMap(m)
  }

  override def loadTable(ident: Identifier): Table =
    GraftTable.resolve(SparkSession.active, rootOf(ident), emptyOpts)

  /** `VERSION AS OF x`: a version number, or a tag name (io37). An
    * all-digit literal resolves as a VERSION when that version exists;
    * otherwise it falls back to a tag of that name — so a tag like
    * '2024' stays reachable unless it collides with a live version
    * number (name tags with a non-digit to avoid the shadow).
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    val root = rootOf(ident)
    val s = SparkSession.active
    // toIntOption, not toInt: an all-digit tag past Int range (a
    // '20240101123059' timestamp-style tag) must fall to the tag branch
    // instead of throwing NumberFormatException
    val key = version.toIntOption match {
      case Some(v) if Manifest.versions(s, root).contains(v) ||
          !Manifest.tags(s, root).contains(version) => "versionAsOf"
      case _ => "tag"
    }
    GraftTable.resolve(s, root, opts(key -> version))
  }

  /** `TIMESTAMP AS OF t`: Spark hands epoch MICROseconds. */
  override def loadTable(ident: Identifier, timestamp: Long): Table =
    GraftTable.resolve(SparkSession.active, rootOf(ident),
      opts("timestampAsOf" -> (timestamp / 1000L).toString))

  override def tableExists(ident: Identifier): Boolean = {
    val s = SparkSession.active
    try Manifest.versions(s, rootOf(ident)).nonEmpty
    catch { case scala.util.control.NonFatal(_) => false }
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val s = SparkSession.active
    val dir = new Path((warehouse +: namespace).mkString("/"))
    val f = dir.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!f.exists(dir)) Array.empty
    else f.listStatus(dir).filter(_.isDirectory).map(_.getPath.getName)
      .filter(n => Manifest
        .versions(s, (warehouse +: namespace :+ n).mkString("/"))
        .nonEmpty)
      .map(n => Identifier.of(namespace, n))
  }

  // ── maintenance procedures: CALL lake.history/expire/compact/... ──
  private lazy val procedures: Map[String, UnboundProcedure] =
    GraftProcedures.all(name =>
      (warehouse +: name.split('.').toSeq).mkString("/"))

  override def loadProcedure(ident: Identifier): UnboundProcedure =
    procedures.getOrElse(ident.name.toLowerCase,
      throw new RuntimeException(
        s"no procedure '${ident.name}' (have ${procedures.keys.toSeq
          .sorted.mkString(", ")})"))

  override def listProcedures(namespace: Array[String])
      : Array[Identifier] =
    procedures.keys.toArray.sorted
      .map(n => Identifier.of(namespace, n))

  // ── DDL: CREATE TABLE / CTAS / CREATE OR REPLACE / DROP TABLE ──
  // Table creation rides the same manifest commit protocol as every
  // write; a StagingTableCatalog so CTAS/RTAS land ATOMICALLY as one
  // manifest version (a failed query leaves only an orphan directory
  // for the sweep, never a half-created table).

  /** `CREATE TABLE lake.t (...) [TBLPROPERTIES(...)]` — commits one
    * empty schema-bearing directory as version 1, so the table reads
    * as zero rows at full schema and INSERTs append from version 2.
    * Properties: `statsCols`/`sortBy` persist as write-time defaults,
    * `morKey` records the merge key (MoR DELETEs from day one).
    */
  /** `PARTITIONED BY` (identity transforms) merges into the persisted
    * `partitionCols` property every later INSERT/CTAS honors
    * ([[GraftPartitionedWrite]]); the DDL clause wins over a property
    * passed alongside it.
    */
  private def withPartitioning(schema: StructType,
      partitions: Array[Transform],
      props: Map[String, String]): Map[String, String] = {
    val pcols = GraftDdl.vetPartitioning(schema, partitions)
    if (pcols.isEmpty) props
    else props + ("partitioncols" -> pcols.mkString(","))
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    if (tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException(ident)
    val s = SparkSession.active
    val root = rootOf(ident)
    val props = withPartitioning(schema, partitions,
      GraftDdl.vetProperties(properties))
    GraftDdl.applyProperties(s, root, props)
    Manifest.commit(s, root, GraftDdl.writeEmptyDir(s, root, schema))
    loadTable(ident)
  }

  override def stageCreate(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String])
      : org.apache.spark.sql.connector.catalog.StagedTable = {
    if (tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException(ident)
    new GraftStagedTable(SparkSession.active, rootOf(ident), schema,
      withPartitioning(schema, partitions,
        GraftDdl.vetProperties(properties)), replaceExisting = false)
  }

  override def stageReplace(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String])
      : org.apache.spark.sql.connector.catalog.StagedTable = {
    if (!tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchTableException(ident.namespace().toSeq :+ ident.name())
    new GraftStagedTable(SparkSession.active, rootOf(ident), schema,
      withPartitioning(schema, partitions,
        GraftDdl.vetProperties(properties)), replaceExisting = true)
  }

  override def stageCreateOrReplace(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String])
      : org.apache.spark.sql.connector.catalog.StagedTable = {
    new GraftStagedTable(SparkSession.active, rootOf(ident), schema,
      withPartitioning(schema, partitions,
        GraftDdl.vetProperties(properties)),
      replaceExisting = tableExists(ident))
  }

  /** `ALTER TABLE` — schema evolution as ONE metadata commit each:
    *
    *  - `RENAME COLUMN` is a [[graft.io.ColumnMapping]] commit: parquet
    *    keeps its physical names forever, the new version carries a
    *    physical→logical mapping applied at scan time — zero bytes
    *    rewritten on a 100 TB table, old versions keep their era's
    *    names under time travel. Renaming the recorded merge key or a
    *    tombstoned table refuses (fold first).
    *  - `ADD COLUMN` appends one empty schema-bearing directory holding
    *    just the new column; the drift-union read (io47) null-fills
    *    every pre-evolution row. Nullable, top-level, appended last —
    *    anything else refuses.
    *  - `SET/UNSET TBLPROPERTIES` edits the persisted write defaults
    *    (`statsCols`/`sortBy`; `morKey` through the same
    *    record-once rule as `CALL set_mor_key`).
    */
  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = {
    val s = SparkSession.active
    val root = rootOf(ident)
    if (!tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchTableException(ident.namespace().toSeq :+ ident.name())
    changes.foreach {
      case r: TableChange.RenameColumn =>
        require(r.fieldNames.length == 1,
          "RENAME COLUMN supports top-level columns only")
        val from = r.fieldNames()(0)
        require(!GraftMorKey.get(s, root).contains(from),
          s"cannot rename '$from': it is the recorded merge key (drop " +
            "the mor key first — tombstones and row identity pin it)")
        require(!Manifest.entries(s, root)
            .exists(graft.io.MergeOnRead.isTombstone),
          "cannot rename columns while tombstones are live — fold first")
        graft.io.ColumnMapping.renameColumn(s, root, s"$root/data",
          from, r.newName)
      case a: TableChange.AddColumn =>
        require(a.fieldNames.length == 1,
          "ADD COLUMN supports top-level columns only")
        require(a.isNullable,
          "added columns must be nullable (pre-evolution rows read null)")
        require(a.position() == null,
          "ADD COLUMN ... FIRST/AFTER is not supported — new columns " +
            "append last (the drift-union order)")
        val name = a.fieldNames()(0)
        val existing = loadTable(ident).columns().map(_.name())
        require(!existing.contains(name),
          s"column '$name' already exists (${existing.mkString(", ")})")
        // the logical name is free, but its PHYSICAL name may be taken
        // by a DROPPED column's storage (or a renamed-away physical) —
        // re-using it would resurrect the old values through the drift
        // union. Mint a FRESH physical name and map it (the
        // Delta/Iceberg id-mapping rule).
        val entries = Manifest.entries(s, root)
        val (maps, rest) = entries
          .partition(graft.io.ColumnMapping.isMapping)
        val dataDirs = rest.filterNot(graft.io.MergeOnRead.isTombstone)
        val physNames = graft.io.SchemaMemo.readMerged(s, dataDirs)
          .schema.fieldNames.toSet
        if (!physNames.contains(name))
          Manifest.commit(s, root, GraftDdl.writeEmptyDir(s, root,
            StructType(Seq(org.apache.spark.sql.types.StructField(
              name, a.dataType(), nullable = true)))))
        else {
          val fresh = Iterator.from(1).map(i => s"${name}__r$i")
            .find(p => !physNames.contains(p)).get
          val cur = graft.io.ColumnMapping.mapping(s, root)
          val emptyDir = GraftDdl.writeEmptyDir(s, root,
            StructType(Seq(org.apache.spark.sql.types.StructField(
              fresh, a.dataType(), nullable = true))))
          graft.io.ColumnMapping.commitMapping(s, root, s"$root/data",
            rest :+ emptyDir, cur + (fresh -> name))
        }
      case d: TableChange.DeleteColumn =>
        require(d.fieldNames.length == 1,
          "DROP COLUMN supports top-level columns only")
        val name = d.fieldNames()(0)
        require(!GraftMorKey.get(s, root).contains(name),
          s"cannot drop '$name': it is the recorded merge key (drop " +
            "the mor key first — tombstones and row identity pin it)")
        val pinnedBy = GraftTableProps.read(s, root).collect {
          case (k, v) if Seq("sortby", "statscols", "bloomcols")
              .contains(k) && v.split(",").map(_.trim).contains(name) => k
        }
        require(pinnedBy.isEmpty,
          s"cannot drop '$name': pinned by table propert" +
            s"(ies) ${pinnedBy.mkString(", ")} — UNSET them first " +
            "(every future write would fail computing its sidecars)")
        val constrainedBy = GraftTableProps.read(s, root).collect {
          case (k, v) if k.startsWith(graft.io.Constraints.PropPrefix) &&
              s.sessionState.sqlParser.parseExpression(v).collect {
                case a: org.apache.spark.sql.catalyst.analysis
                  .UnresolvedAttribute => a.name
              }.contains(name) => k
        }
        require(constrainedBy.isEmpty,
          s"cannot drop '$name': referenced by declared " +
            s"constraint(s) ${constrainedBy.mkString(", ")} — " +
            "CALL drop_constraint first (every future write would " +
            "fail evaluating them)")
        require(!Manifest.entries(s, root)
            .exists(graft.io.MergeOnRead.isTombstone),
          "cannot drop columns while tombstones are live — fold first")
        graft.io.ColumnMapping.dropColumn(s, root, s"$root/data", name)
      case p: TableChange.SetProperty =>
        val vetted = GraftDdl.vetProperties(
          java.util.Collections.singletonMap(p.property(), p.value()))
        require(vetted.nonEmpty,
          s"unknown table property '${p.property()}' (supported: " +
            s"${GraftDdl.knownProps.toSeq.sorted.mkString(", ")})")
        if (vetted.contains("morkey"))
          GraftDdl.applyProperties(s, root, vetted)
        else if (vetted.keys.exists(_.startsWith(
            graft.io.Constraints.PropPrefix)))
          // ADD CONSTRAINT semantics: validate the EXISTING data (one
          // aggregate pass over what readers see) before persisting —
          // a constraint the current table already violates refuses
          vetted.foreach { case (k, v) =>
            graft.io.Constraints.declare(s, root,
              k.stripPrefix(graft.io.Constraints.PropPrefix), v)
          }
        else GraftTableProps.write(s, root,
          GraftTableProps.read(s, root) ++ vetted)
      case p: TableChange.RemoveProperty =>
        require(p.property().toLowerCase != "morkey",
          "UNSET 'morKey' refuses — use CALL drop_mor_key (changing " +
            "the merge key under readers is never silent)")
        GraftTableProps.write(s, root,
          GraftTableProps.read(s, root) - p.property().toLowerCase)
      case other =>
        throw new UnsupportedOperationException(
          s"ALTER TABLE change ${other.getClass.getSimpleName} is not " +
            "supported (have: RENAME COLUMN, ADD COLUMN, DROP COLUMN, " +
            "SET/UNSET TBLPROPERTIES)")
    }
    loadTable(ident)
  }

  /** `DROP TABLE lake.t` — removes the manifest root (manifests, data
    * directories, sidecars, tags). Guarded by the clone registry
    * (io33's refusal semantics): a source with live registered shallow
    * clones refuses loudly — its data directories are the clones' read
    * path. Dropping a table that IS a clone deregisters it from every
    * source in its chain first, releasing their retention holds;
    * shallow-clone manifests list SOURCE-owned directories which live
    * outside this root and are untouched by the delete.
    */
  override def dropTable(ident: Identifier): Boolean = {
    val s = SparkSession.active
    val root = rootOf(ident)
    if (!tableExists(ident)) return false
    val clones = Manifest.registeredClones(s, root)
    if (clones.nonEmpty) throw new IllegalStateException(
      s"cannot DROP $root: registered shallow clones still read its " +
        s"data directories (${clones.mkString(", ")}) — drop the " +
        "clones (or deep-copy them) first")
    Manifest.dropCloneEverywhere(s, root)
    val p = new Path(root)
    p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
  }

  /** `ALTER TABLE old RENAME TO new` — one filesystem rename plus an
    * in-place path rewrite of the manifests' own-root entries
    * ([[Manifest.renameRoot]]): the full version history, tags,
    * sidecars, and commit instants survive under the new name.
    * Refuses while REGISTERED shallow clones read this table (their
    * manifests hold its absolute paths); a table that IS a clone
    * re-registers itself on its source chain under the new name.
    * External references this catalog cannot see (another catalog's
    * pin vectors naming the old root) are the caller's to migrate —
    * the Delta/Iceberg path-based-reference caveat.
    */
  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit = {
    val s = SparkSession.active
    if (!tableExists(oldIdent))
      throw new org.apache.spark.sql.catalyst.analysis
        .NoSuchTableException(oldIdent.namespace().toSeq :+
          oldIdent.name())
    // Spark hands the RENAME-TO target verbatim: a user writing the
    // catalog-qualified `lake.t2` would otherwise land at
    // warehouse/lake/t2 — strip the redundant catalog segment
    val target =
      if (newIdent.namespace().headOption.contains(catalogName))
        Identifier.of(newIdent.namespace().drop(1), newIdent.name())
      else newIdent
    if (tableExists(target))
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException(target)
    val oldRoot = rootOf(oldIdent)
    val clones = Manifest.registeredClones(s, oldRoot)
    if (clones.nonEmpty) throw new IllegalStateException(
      s"cannot RENAME $oldRoot: registered shallow clones reference " +
        s"its data paths (${clones.mkString(", ")}) — drop or " +
        "deep-copy the clones first")
    Manifest.renameRoot(s, oldRoot, rootOf(target))
  }
}
