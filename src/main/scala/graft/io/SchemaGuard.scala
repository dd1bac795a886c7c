package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Append-time SCHEMA compatibility enforcement for [[Manifest]] tables
  * — the Delta `mergeSchema=false` discipline: an appending batch must
  * carry every table column at its exact type, and may introduce new
  * columns only when the writer explicitly opts into evolution. The
  * failure this closes is silent: parquet directories with divergent
  * schemas don't fail at write time, they fail (or silently null-fill /
  * drop columns) at READ time, table-wide, long after the bad batch's
  * author is gone. Checking at commit turns that into an immediate,
  * batch-local, actionable error.
  *
  * Column ADDITION under `allowAdd=true` is io13's schema-evolution
  * path: the commit is legal, and readers resolve the union schema via
  * `mergeSchema` (older directories null-fill the new column). Column
  * REMOVAL or a TYPE change is never an append — that's a rewrite
  * ([[Manifest.rewrite]] after a [[Cow]] transform) because it changes
  * what existing directories mean.
  *
  * The check is metadata-only — schemas, not data — so its cost is
  * independent of batch size.
  */
object SchemaGuard {

  final class SchemaMismatchException(val problems: Seq[String])
    extends IllegalArgumentException(
      "batch schema incompatible with table: " + problems.mkString("; "))

  /** Problems that make `batch` an illegal append to `table`. Empty
    * means compatible. Nullability is not compared: parquet's own
    * reader treats everything as nullable, so a tighter batch is fine.
    */
  def check(table: StructType, batch: StructType,
      allowAdd: Boolean): Seq[String] = {
    val batchByName = batch.fields.map(f => f.name -> f.dataType).toMap
    val missingOrRetyped = table.fields.toSeq.flatMap { tf =>
      batchByName.get(tf.name) match {
        case None => Some(s"missing column ${tf.name} (${tf.dataType.sql})")
        case Some(bt) if bt != tf.dataType =>
          Some(s"column ${tf.name}: table ${tf.dataType.sql}, " +
            s"batch ${bt.sql} (a type change is a rewrite, not an append)")
        case _ => None
      }
    }
    val tableNames = table.fieldNames.toSet
    val added = batch.fields.toSeq.filterNot(f => tableNames(f.name))
    val addProblems =
      if (allowAdd || added.isEmpty) Seq.empty
      else added.map(f => s"new column ${f.name} (${f.dataType.sql}) — " +
        "pass allowAdd=true to evolve the schema")
    missingOrRetyped ++ addProblems
  }

  /** Stage `df` and commit it as an append IF its schema is a legal
    * append to the table's current schema (the first commit defines the
    * schema). On mismatch nothing is written and a
    * [[SchemaMismatchException]] raises with every problem named.
    * Returns the committed version.
    */
  def commitAppend(s: SparkSession, root: String, df: DataFrame,
      batchDir: String, allowAdd: Boolean = false,
      committer: Committer = FsCreateCommitter): Int = {
    if (Manifest.versions(s, root).nonEmpty) {
      // the table schema is the UNION across committed batches — after
      // an allowAdd=true evolution a plain read infers from an
      // arbitrary file footer, making the guard nondeterministic;
      // mergeSchema reads every footer (metadata-only, commit-time
      // cost) and is deterministic
      val tableSchema = SchemaMemo
        .readMerged(s, Manifest.entries(s, root)).schema
      val problems = check(tableSchema, df.schema, allowAdd)
      if (problems.nonEmpty) throw new SchemaMismatchException(problems)
    }
    df.write.mode("overwrite").parquet(batchDir)
    // idempotent per directory: an at-least-once retry re-overwrites
    // the same batchDir and the re-commit is a no-op
    Manifest.commitIfAbsent(s, root, batchDir, committer)
  }
}
