package graft.io.dsv2

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SQLContext, SaveMode}
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider}
import org.apache.spark.sql.types.StructType

import graft.io.{Manifest, SkipStats}

/** WRITE path for `format("graft")` — the V1 write fallback
  * ([[CreatableRelationProvider]], which `DataFrameWriter.save` prefers
  * over V2 when a TableProvider also implements it): every mode maps to
  * a manifest-protocol commit, so a plain `df.write` producer gets the
  * same snapshot isolation, atomicity, and time-travelability as the
  * Scala API — and the battle-tested vectorized parquet writer does the
  * data IO.
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
    val statsCols = parameters.get("statscols")
      .orElse(parameters.get("statsCols"))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    def writeAndCommit(replacing: Boolean): Unit = {
      val dir = s"$root/data/w-" + java.util.UUID.randomUUID().toString
      data.write.parquet(dir)
      if (statsCols.nonEmpty) SkipStats.write(s, dir, statsCols)
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
