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
  * storage truth. Read-only by design: writes go through the commit
  * protocol ([[Manifest.commit]] and friends), whose optimistic
  * concurrency a blind SQL INSERT could not honor; the DDL surface
  * refuses loudly instead of corrupting a table.
  *
  * `VERSION AS OF` accepts a version number or a tag name (Spark hands
  * both through as the string form); `TIMESTAMP AS OF` arrives as
  * epoch MICROseconds and resolves through the manifest mtime rule
  * ([[Manifest.versionAt]]). Tables with live MoR tombstones fail
  * loudly at load ([[GraftTable.resolve]]) — fold first, or read with
  * the `morKey` option through the reader path.
  */
class GraftCatalog extends TableCatalog with ProcedureCatalog {

  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = options.get("root")
    require(warehouse != null && warehouse.nonEmpty,
      s"catalog '$name' requires spark.sql.catalog.$name.root " +
        "(the warehouse directory manifest tables live under)")
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

  private def readOnly(op: String): Nothing =
    throw new UnsupportedOperationException(
      s"graft catalog is read-only: $op must go through the manifest " +
        "commit protocol (graft.io.Manifest and friends)")

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table =
    readOnly("CREATE TABLE")

  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = readOnly("ALTER TABLE")

  override def dropTable(ident: Identifier): Boolean =
    readOnly("DROP TABLE")

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit = readOnly("RENAME TABLE")
}
