package graft.io

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Rename-safe schema evolution via COLUMN MAPPING — rename a column
  * without rewriting a byte of data, the Iceberg/Delta field-mapping
  * idea on the manifest table: parquet files keep their PHYSICAL column
  * names forever, and each manifest version carries a physical→logical
  * mapping applied at read time. A rename is therefore one metadata
  * commit on a 100 TB table; old versions keep their old names (time
  * travel reads the schema of its era), mid-query readers keep the
  * version they resolved, and a rename chain composes through logical
  * names while the physical name never changes.
  *
  * Representation follows the [[MergeOnRead]] tombstone convention:
  * manifest entries are always real directories, so the mapping lives
  * in a `colmap-` directory holding one text file of
  * `physical=logical` lines — expire/vacuum/clone machinery treat it
  * like any other superseded directory. The mapping file is written
  * BEFORE the manifest commit (the [[SkipStats]] sidecar discipline):
  * a committed version always has its mapping; a crash in between
  * leaves an orphan that dies like any other.
  */
object ColumnMapping {

  val MappingPrefix = "colmap-"

  def isMapping(entry: String): Boolean =
    MergeOnRead.nameOf(entry).startsWith(MappingPrefix)

  private val FileName = "mapping.txt"

  private def fs(s: SparkSession, p: String) =
    new Path(p).getFileSystem(s.sparkContext.hadoopConfiguration)

  /** The physical→logical map a version pins (empty = identity). An
    * EMPTY logical name marks a DROPPED column (`ALTER TABLE DROP
    * COLUMN`): the physical parquet column persists untouched but no
    * logical schema advertises it — use [[renames]]/[[dropped]] to
    * split the two meanings.
    */
  def mapping(s: SparkSession, root: String,
      version: Option[Int] = None): Map[String, String] = {
    val dirs = Manifest.entries(s, root, version).filter(isMapping)
    require(dirs.size <= 1,
      s"manifest version pins ${dirs.size} mapping dirs, expected <= 1")
    dirs.headOption.map(readMapping(s, _)).getOrElse(Map.empty)
  }

  /** The RENAME entries only (non-empty logical names) — what callers
    * that translate logical→physical via `.map(_.swap)` must use:
    * swapping dropped entries would collide every drop onto the ""
    * key and silently lose translations.
    */
  def renames(m: Map[String, String]): Map[String, String] =
    m.filter(_._2.nonEmpty)

  /** The DROPPED physical column names a mapping records. */
  def dropped(m: Map[String, String]): Set[String] =
    m.filter(_._2.isEmpty).keySet

  private def readMapping(s: SparkSession, dir: String)
      : Map[String, String] = {
    val f = fs(s, dir)
    val in = f.open(new Path(dir, FileName))
    val text =
      try new String(org.apache.commons.io.IOUtils.toByteArray(in),
        StandardCharsets.UTF_8)
      finally in.close()
    text.split("\n").filter(_.nonEmpty).map { line =>
      val i = line.indexOf('=')
      require(i > 0, s"bad mapping line '$line' in $dir")
      line.substring(0, i) -> line.substring(i + 1)
    }.toMap
  }

  /** Rename logical column `from` to `to` as ONE metadata commit: the
    * new version lists the same data directories plus a fresh mapping
    * directory; nothing is rewritten. `from` is resolved against the
    * CURRENT logical schema, so rename chains compose (a→b then b→c
    * leaves the physical column mapped to c). Refuses unknown columns
    * and collisions with existing logical names. Returns the committed
    * version.
    */
  def renameColumn(s: SparkSession, root: String, dataRoot: String,
      from: String, to: String,
      committer: Committer = FsCreateCommitter): Int = {
    val entries = Manifest.entries(s, root)
    val (maps, data) = entries.partition(isMapping)
    val cur = maps.headOption.map(readMapping(s, _)).getOrElse(Map.empty)
    // mergeSchema: an ADD COLUMN-evolved table's late columns live only
    // in newer directories — the rename must see the UNION schema
    val physicalSchema = SchemaMemo.readMerged(s, data)
      .schema.fieldNames.toSeq
    val logical = physicalSchema.map(p => cur.getOrElse(p, p))
    require(logical.contains(from),
      s"cannot rename: no logical column '$from' (have " +
        s"${logical.mkString(", ")})")
    require(!logical.contains(to) || from == to,
      s"cannot rename '$from' to '$to': logical column '$to' exists")
    val physical = physicalSchema(logical.indexOf(from))
    val next = (cur - physical) ++
      (if (physical == to) Map.empty[String, String]
       else Map(physical -> to))
    commitMapping(s, root, dataRoot, data, next, committer)
  }

  /** DROP logical column `name` as ONE metadata commit — the third
    * side of zero-rewrite schema evolution (rename/add landed
    * earlier): the mapping marks the column's PHYSICAL name with an
    * empty logical (`phys=`), reads project it away, time travel
    * reads its era's schema, and a later re-ADD of the same logical
    * name maps to a FRESH physical name — the Delta/Iceberg
    * id-mapping rule: dropped values are never resurrected. Refuses
    * unknown columns and dropping the last visible column.
    */
  def dropColumn(s: SparkSession, root: String, dataRoot: String,
      name: String, committer: Committer = FsCreateCommitter): Int = {
    val entries = Manifest.entries(s, root)
    val (maps, data) = entries.partition(isMapping)
    val cur = maps.headOption.map(readMapping(s, _)).getOrElse(Map.empty)
    val physicalSchema = SchemaMemo
      .readMerged(s, data.filterNot(MergeOnRead.isTombstone))
      .schema.fieldNames.toSeq
    val logical = physicalSchema.map(p => cur.getOrElse(p, p))
    require(logical.contains(name),
      s"cannot drop: no logical column '$name' (have " +
        s"${logical.filter(_.nonEmpty).mkString(", ")})")
    val visible = logical.count(_.nonEmpty)
    require(visible > 1,
      s"cannot drop '$name': it is the table's last visible column")
    val physical = physicalSchema(logical.indexOf(name))
    commitMapping(s, root, dataRoot, data, (cur - physical) +
      (physical -> ""), committer)
  }

  /** Write a fresh mapping directory for `next` and commit it with
    * `data` as one REPLACING version. Mapping dir first, manifest
    * second — never a committed version without its mapping; an empty
    * `next` commits no mapping dir at all (back to identity).
    */
  private[graft] def commitMapping(s: SparkSession, root: String,
      dataRoot: String, data: Seq[String], next: Map[String, String],
      committer: Committer = FsCreateCommitter): Int = {
    if (next.isEmpty) return Manifest.rewrite(s, root, data, committer)
    val dir = writeMappingDir(s, dataRoot, next)
    Manifest.rewrite(s, root, data ++ Seq(dir), committer)
  }

  /** Land a mapping directory holding `next` (no commit — the caller
    * lists it in its own manifest version).
    */
  private[graft] def writeMappingDir(s: SparkSession, dataRoot: String,
      next: Map[String, String]): String = {
    val dir = s"$dataRoot/$MappingPrefix${java.util.UUID.randomUUID()}"
    val f = fs(s, dir)
    val out = f.create(new Path(dir, FileName), false)
    try out.write(next.toSeq.sorted.map { case (p, l) => s"$p=$l" }
      .mkString("\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
    dir
  }

  /** The snapshot a version pins, with that VERSION'S logical names
    * applied and its dropped columns projected away — the read path
    * every mapped table uses. Physical parquet is untouched; the
    * rename is a zero-cost projection, the drop a zero-cost pruning.
    */
  def snapshot(s: SparkSession, root: String,
      version: Option[Int] = None): DataFrame = {
    val (maps, data) = Manifest.entries(s, root, version)
      .partition(isMapping)
    val m = maps.headOption.map(readMapping(s, _)).getOrElse(Map.empty)
    val base = renames(m)
      .foldLeft(SchemaMemo.read(s, data)) { case (df, (p, l)) =>
        df.withColumnRenamed(p, l)
      }
    dropped(m).foldLeft(base)((df, p) => df.drop(p))
  }
}
