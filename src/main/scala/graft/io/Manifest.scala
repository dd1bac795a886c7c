package graft.io

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.nio.charset.StandardCharsets

/** Manifest-pointer table commits — the object-store-safe sibling of
  * [[WriteAuditPublish]]'s rename publish, and the core of how modern
  * table formats (Iceberg/Delta) commit: data files are immutable and
  * UNREFERENCED until a new, versioned manifest lists them. A reader
  * resolves the highest manifest version once and scans exactly the
  * files that version lists, so it sees a consistent snapshot no matter
  * what producers are writing concurrently; an orphan directory that
  * never made a manifest simply does not exist to readers.
  *
  * Commit = create `manifest-v%06d` with overwrite=false — a single
  * immutable PUT, which object stores do atomically (no rename needed).
  * The create-fails-if-exists semantics double as optimistic
  * concurrency: two producers racing to commit version N+1 cannot both
  * win; the loser re-reads and retries on N+2. Old manifests are never
  * modified, so every historical version stays readable — time travel
  * is just "resolve version v instead of latest".
  */
object Manifest {
  private val Name = "manifest-v(\\d{6})".r

  private def fs(s: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(s.sparkContext.hadoopConfiguration)

  /** All committed versions, ascending. */
  def versions(s: SparkSession, root: String): Seq[Int] = {
    val f = fs(s, root)
    val p = new Path(root)
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).toSeq.map(_.getPath.getName).collect {
      case Name(v) => v.toInt
    }.sorted
  }

  private def manifestPath(root: String, v: Int): Path =
    new Path(root, f"manifest-v$v%06d")

  private def readList(f: FileSystem, p: Path): Seq[String] = {
    val in = f.open(p)
    try new String(org.apache.commons.io.IOUtils.toByteArray(in),
      StandardCharsets.UTF_8).split("\n").toSeq.filter(_.nonEmpty)
    finally in.close()
  }

  /** The latest version's directory list (empty before any commit) —
    * what an exactly-once producer consults to skip a replayed batch.
    */
  def committed(s: SparkSession, root: String): Seq[String] =
    versions(s, root).lastOption
      .map(v => readList(fs(s, root), manifestPath(root, v)))
      .getOrElse(Seq.empty)

  /** Commit `batchDir` into the table: next manifest = previous list +
    * the new directory, written create-if-absent (atomic PUT; the
    * optimistic-concurrency point). Returns the committed version.
    */
  def commit(s: SparkSession, root: String, batchDir: String): Int = {
    val f = fs(s, root)
    val prev = versions(s, root)
    val prevList = prev.lastOption
      .map(v => readList(f, manifestPath(root, v))).getOrElse(Seq.empty)
    val next = prev.lastOption.getOrElse(0) + 1
    val out = f.create(manifestPath(root, next), false)
    try out.write((prevList :+ batchDir).mkString("\n")
      .getBytes(StandardCharsets.UTF_8))
    finally out.close()
    next
  }

  /** REPLACING commit — the maintenance primitive (compaction, clustering
    * rewrite): the next manifest lists exactly `dirs`, not the previous
    * list plus them. Old versions keep reading the old files, so a
    * rewrite never disturbs a reader mid-query and stays time-travelable.
    */
  def rewrite(s: SparkSession, root: String, dirs: Seq[String]): Int = {
    val f = fs(s, root)
    val next = versions(s, root).lastOption.getOrElse(0) + 1
    val out = f.create(manifestPath(root, next), false)
    try out.write(dirs.mkString("\n").getBytes(StandardCharsets.UTF_8))
    finally out.close()
    next
  }

  /** The snapshot a manifest version pins (latest when unspecified):
    * one DataFrame over exactly the committed directories.
    */
  def snapshot(s: SparkSession, root: String,
      version: Option[Int] = None): DataFrame = {
    val vs = versions(s, root)
    require(vs.nonEmpty, s"no committed manifest under $root")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v), s"unknown manifest version $v (have $vs)")
    val dirs = readList(fs(s, root), manifestPath(root, v))
    s.read.parquet(dirs: _*)
  }
}
