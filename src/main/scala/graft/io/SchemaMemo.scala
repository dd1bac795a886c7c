package graft.io

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

import scala.collection.concurrent.TrieMap

/** Schema-memoizing parquet reader for the engine's internal tables.
  *
  * Every bare `spark.read.parquet(dirs)` runs parquet schema inference
  * as a SPARK JOB (`mergeSchemasInParallel` over the sampled footer)
  * before the first action — ~30-80 ms of job scheduling plus a task,
  * per DataFrame CONSTRUCTION. The composite lifecycle gates construct
  * hundreds of frames over the same committed directories, so the
  * suite pays thousands of these jobs for schemas that never change:
  * committed directories are immutable (the manifest contract), and
  * the driver testdata is immutable for a run.
  *
  * This reader resolves the schema ONCE per (path, mtime, length) from
  * one footer read on the DRIVER (no job), memoizes it, and hands it
  * to `DataFrameReader.schema(...)`, which skips inference entirely.
  * Semantics are identical to the bare read: with
  * `spark.sql.parquet.mergeSchema=false` (the default, and what every
  * call site here relied on) inference takes a single sampled footer
  * anyway, and the memoized schema is `.asNullable`d exactly like an
  * inferred one. Paths with subdirectories (hive layout — partition
  * columns one footer cannot see) and non-parquet paths fall back to
  * the bare read unchanged.
  */
object SchemaMemo {
  // key carries (mtime, len) of the probed FILE so an overwritten path
  // can never serve a stale schema, plus the nanos flavor conf — the
  // one session conf that changes what a given footer converts to
  // (TIMESTAMP(NANOS) → LongType vs refusal)
  private val memo = TrieMap.empty[(String, Long, Long, String), StructType]

  private def nanosConf(s: SparkSession): String =
    s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false")

  /** First data file under `path` (a flat directory or a bare file);
    * None when the path has data subdirectories (hive layout) or no
    * parquet file.
    */
  private def probeFile(s: SparkSession, path: String)
      : Option[FileStatus] = try {
    val p = new Path(path)
    val f = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val st = f.getFileStatus(p)
    if (st.isFile) {
      if (st.getPath.getName.endsWith(".parquet")) Some(st) else None
    } else {
      val children = f.listStatus(p)
      val hasSubdirs = children.exists(x => x.isDirectory &&
        !x.getPath.getName.startsWith("_") &&
        !x.getPath.getName.startsWith("."))
      if (hasSubdirs) None
      else children.find(x =>
        x.isFile && x.getPath.getName.endsWith(".parquet"))
    }
  } catch { case scala.util.control.NonFatal(_) => None }

  /** The parquet schema at `path`, from one driver-side footer read,
    * memoized for as long as the file is unchanged. None when the
    * layout needs full inference (subdirectories, no parquet file) —
    * callers fall back to the bare read.
    */
  def schemaOf(s: SparkSession, path: String): Option[StructType] =
    probeFile(s, path).flatMap { st =>
      val key = (st.getPath.toString, st.getModificationTime, st.getLen,
        nanosConf(s))
      // bounded: evict an arbitrary half past the cap instead of
      // clearing everything — a full clear re-probes EVERY hot schema
      // at once (a thundering herd of driver footer reads) on a
      // long-lived driver with many distinct dirs
      if (memo.size > 4096)
        memo.keysIterator.take(memo.size / 2).foreach(memo.remove)
      memo.get(key).orElse {
        val inferred = footerSchema(s, st).orElse {
          // fallback: Spark's own inference (one tiny job) — correct
          // for any footer the direct converter cannot handle
          new org.apache.spark.sql.execution.datasources.parquet
            .ParquetFileFormat().inferSchema(s, Map.empty, Seq(st))
        }.map(st => deepNullable(st).asInstanceOf[StructType])
        inferred.foreach(memo.put(key, _))
        inferred
      }
    }

  /** Everything nullable, recursively — what Spark's inference reports
    * for file sources (`StructType.asNullable` is private[sql]).
    */
  private def deepNullable(dt: org.apache.spark.sql.types.DataType)
      : org.apache.spark.sql.types.DataType = dt match {
    case st: StructType => StructType(st.fields.map(f =>
      f.copy(dataType = deepNullable(f.dataType), nullable = true)))
    case a: org.apache.spark.sql.types.ArrayType =>
      a.copy(elementType = deepNullable(a.elementType),
        containsNull = true)
    case m: org.apache.spark.sql.types.MapType =>
      m.copy(keyType = deepNullable(m.keyType),
        valueType = deepNullable(m.valueType), valueContainsNull = true)
    case other => other
  }

  /** Footer → StructType on the driver with the session's conversion
    * flags — the no-job path.
    */
  private def footerSchema(s: SparkSession, st: FileStatus)
      : Option[StructType] = try {
    val conf = s.sparkContext.hadoopConfiguration
    val r = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(st, conf))
    val msg = try r.getFooter.getFileMetaData.getSchema finally r.close()
    val conv = new org.apache.spark.sql.execution.datasources.parquet
      .ParquetToSparkSchemaConverter(s.sessionState.conf)
    Some(conv.convert(msg))
  } catch { case scala.util.control.NonFatal(_) => None }

  /** `spark.read.parquet(paths)` with the memoized schema of the first
    * path supplied up front — no inference job. Falls back to the bare
    * read when the first path needs full inference.
    */
  def read(s: SparkSession, paths: Seq[String]): DataFrame = {
    require(paths.nonEmpty, "SchemaMemo.read: no paths")
    schemaOf(s, paths.head) match {
      case Some(sch) => s.read.schema(sch).parquet(paths: _*)
      case None => s.read.parquet(paths: _*)
    }
  }

  /** The `mergeSchema=true` form: when every path's memoized schema is
    * identical the merge is a no-op and the explicit-schema read
    * applies; any divergence (or any path needing full inference)
    * falls back to the real merging read.
    *
    * INVARIANT: [[schemaOf]] probes ONE footer per directory, so the
    * uniformity test (and the fast path it guards) is only sound for
    * directories that are internally schema-homogeneous — true for
    * every manifest-committed directory (each is written by one job
    * with one schema) and for the immutable testdata dirs. A dir whose
    * FILES disagree would be judged by its first footer; keep callers
    * on committed dirs.
    */
  def readMerged(s: SparkSession, paths: Seq[String]): DataFrame = {
    require(paths.nonEmpty, "SchemaMemo.readMerged: no paths")
    val schemas = paths.map(schemaOf(s, _))
    if (schemas.forall(_.isDefined) && schemas.flatten.distinct.size == 1)
      s.read.schema(schemas.head.get).parquet(paths: _*)
    else s.read.option("mergeSchema", "true").parquet(paths: _*)
  }
}
