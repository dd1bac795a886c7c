package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.KlioJobRef

/** The standard klio pipeline prelude, re-expressed as declarative DataFrame
  * splits (reference `exec/src/klio_exec/commands/run.py:320-454` assembles
  * the same chain out of tagged-output DoFns).
  *
  * Semantics preserved:
  *  - recipients check (helpers.py:354-430): drop unless `anyone` or this
  *    job is a limited recipient; bottom-up → top-down resume via
  *    `triggerChildrenOf`.
  *  - audit log append (helpers.py:433-474).
  *  - ping filter (helpers.py:107-154): ping messages bypass work and flow
  *    straight to the event output.
  *  - output-exists + force (helpers.py:91-104,157-211): work whose output
  *    already exists is skipped unless forced — klio's incremental-compute
  *    memoization.
  *  - input-exists (helpers.py:91-96): messages whose input data is missing
  *    are dropped (or routed to trigger-upstream).
  *
  * Scale note: existence checks are left-semi/anti joins of the message
  * stream against a listing DataFrame — vectorized and shuffle-free when the
  * listing is broadcast — never a per-element RPC like the reference's GCS
  * `exists()` call per message (`_helpers.py:267-279`).
  */
object Prelude {

  /** A three-way routed stream, klio's TaggedStates (process / pass_thru /
    * drop, `_helpers.py:50-54`). All three DataFrames share one lineage; a
    * `.cache()` upstream makes the splits single-pass when materialized
    * together.
    */
  case class Routed(process: DataFrame, passThru: DataFrame, drop: DataFrame)

  /** KlioFilterPing: ping messages trace the DAG without doing work. The
    * per-message flag ORs with the data-input config's global ping, exactly
    * like the reference (helpers.py:107-154: msg_ping if msg_ping else
    * global_ping) — a config-level `ping: true` job does no work at all.
    */
  def splitPing(df: DataFrame, pingDefault: Boolean = false)
      : (DataFrame, DataFrame) = {
    // coalesce: a null flag (message from a source that bypassed decode)
    // must land in exactly one branch — a bare null predicate excludes the
    // row from BOTH filters, silently losing it
    val isPing = coalesce(col("metadata.ping"), lit(false)) ||
      lit(pingDefault)
    (df.filter(!isPing), df.filter(isPing))
  }

  /** KlioGcsCheckOutputExists + KlioFilterForce, fused: messages whose
    * output already exists pass through unless forced (message flag or
    * config default). `existingOutputs` must expose an `element` column.
    */
  def splitOutputExists(df: DataFrame, existingOutputs: DataFrame,
      forceDefault: Boolean = false): (DataFrame, DataFrame) = {
    val existing = broadcast(existingOutputs.select(col("element")))
    val exists = df.join(existing, Seq("element"), "left_semi")
    val missing = df.join(existing, Seq("element"), "left_anti")
    val isForced = coalesce(col("metadata.force"), lit(false)) ||
      lit(forceDefault)
    (missing.unionByName(exists.filter(isForced)),
      exists.filter(!isForced))
  }

  /** KlioGcsCheckInputExists + drop-not-found: keep messages whose input
    * data exists; the rest are dropped (reference logs and swallows,
    * helpers.py:264-284 — we return them for counting / trigger-upstream).
    */
  def splitInputExists(df: DataFrame, existingInputs: DataFrame)
      : (DataFrame, DataFrame) = {
    val existing = broadcast(existingInputs.select(col("element")))
    (df.join(existing, Seq("element"), "left_semi"),
      df.join(existing, Seq("element"), "left_anti"))
  }

  /** KlioCheckRecipients (v2): `anyone` → process; `limited` → process only
    * if `job` is a recipient, flipping to `anyone` when this job is the
    * `triggerChildrenOf` job (bottom-up backfill reaching its origin resumes
    * top-down flow, helpers.py:399-411). Everything else drops.
    */
  def checkRecipients(df: DataFrame, job: KlioJobRef)
      : (DataFrame, DataFrame) = {
    val mode = col("metadata.intendedRecipients.mode")
    val isRecipient = exists(col("metadata.intendedRecipients.recipients"),
      r => r.getField("jobName") === job.jobName &&
        r.getField("gcpProject") === job.gcpProject)
    val trig = col("metadata.intendedRecipients.triggerChildrenOf")
    val isTriggerOrigin = trig.isNotNull &&
      trig.getField("jobName") === job.jobName &&
      trig.getField("gcpProject") === job.gcpProject
    // null metadata/mode (a source that bypassed decode) must go to the
    // drop branch, not vanish from both filters
    val keep = coalesce(
      mode === "anyone" || (mode === "limited" && isRecipient), lit(false))
    val flipped = df.filter(keep && isTriggerOrigin)
      .withColumn("metadata", col("metadata")
        .withField("intendedRecipients.mode", lit("anyone"))
        .withField("intendedRecipients.triggerChildrenOf",
          lit(null).cast("struct<jobName:string,gcpProject:string>")))
    (df.filter(keep && !isTriggerOrigin).unionByName(flipped),
      df.filter(!keep))
  }

  /** KlioUpdateAuditLog: append (now, this job) to the provenance trail.
    * `now` defaults to current_timestamp; pass a literal for deterministic
    * tests.
    */
  def updateAuditLog(df: DataFrame, job: KlioJobRef,
      now: Column = current_timestamp()): DataFrame =
    df.withColumn("metadata", col("metadata").withField("jobAuditLog",
      concat(col("metadata.jobAuditLog"),
        array(struct(now.as("timestamp"), lit(job.jobName).as("jobName"),
          lit(job.gcpProject).as("gcpProject"))))))

  /** KlioTriggerUpstream's metadata rewrite (helpers.py:702-734): address
    * the message to {upstream, this job} in limited mode with
    * `triggerChildrenOf` = this job, so the backfill resumes top-down once
    * it flows back through here.
    */
  def triggerUpstream(df: DataFrame, upstream: KlioJobRef, self: KlioJobRef)
      : DataFrame =
    df.withColumn("metadata", col("metadata")
      .withField("intendedRecipients.mode", lit("limited"))
      .withField("intendedRecipients.recipients",
        array(
          struct(lit(upstream.jobName).as("jobName"),
            lit(upstream.gcpProject).as("gcpProject")),
          struct(lit(self.jobName).as("jobName"),
            lit(self.gcpProject).as("gcpProject"))))
      .withField("intendedRecipients.triggerChildrenOf",
        struct(lit(self.jobName).as("jobName"),
          lit(self.gcpProject).as("gcpProject"))))

  /** The full default prelude in the reference's order
    * (run.py:511-558): recipients → audit → ping → output-exists(+force) →
    * input-exists → drop. Returns process / pass_thru (ping ∪ skipped) /
    * drop (wrong recipient ∪ input missing).
    */
  def standard(df: DataFrame, job: KlioJobRef,
      existingInputs: Option[DataFrame],
      existingOutputs: Option[DataFrame],
      forceDefault: Boolean = false,
      pingDefault: Boolean = false,
      now: Column = current_timestamp()): Routed = {
    val (addressed, wrongRecipient) = checkRecipients(df, job)
    val audited = updateAuditLog(addressed, job, now)
    val (work0, pinged) = splitPing(audited, pingDefault)
    val (work1, skipped) = existingOutputs match {
      case Some(outs) => splitOutputExists(work0, outs, forceDefault)
      case None => (work0, work0.filter(lit(false)))
    }
    val (found, notFound) = existingInputs match {
      case Some(ins) => splitInputExists(work1, ins)
      case None => (work1, work1.filter(lit(false)))
    }
    Routed(found, pinged.unionByName(skipped),
      wrongRecipient.unionByName(notFound))
  }

  /** KlioDebugMessage (helpers.py:477-520): log each element with a prefix
    * as it flows past, pass-through. Logging per row is the reference's
    * semantics (debug tooling, not a hot-path op); executor-side log4j.
    */
  def debugMessage(df: DataFrame, prefix: String = "DEBUG"): DataFrame = {
    val logger = udf((e: String) => {
      org.apache.log4j.Logger.getLogger("graft.klio.debug")
        .info(s"$prefix $e")
      e
    })
    df.withColumn("element", logger(col("element")))
  }

  /** KlioDrop (helpers.py:264-284): terminal branch — count via observe,
    * propagate nothing.
    */
  def dropAll(df: DataFrame): DataFrame =
    df.observe("klio_drop", count(lit(1)).as("kmsg-drop")).filter(lit(false))

  /** Directory listing as an `element` DataFrame: basenames under `dir`
    * matching `suffix`, suffix stripped — the vectorized stand-in for
    * klio's per-element existence RPC. Listing happens once per batch on
    * the driver (a metadata op) — the fast path for directories that fit
    * one RPC; [[distributedListingFor]] is the same contract for object
    * stores with millions of keys.
    */
  def listingFor(spark: SparkSession, dir: String, suffix: String)
      : DataFrame = {
    import org.apache.hadoop.fs.Path
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val names: Seq[String] =
      if (!fs.exists(path)) Seq.empty
      else fs.listStatus(path).toSeq.map(_.getPath.getName)
        // hidden-file convention (matches Spark's file-source index, so
        // this listing and distributedListingFor stay interchangeable):
        // '_'/'.' prefixes are metadata (_SUCCESS, .crc), never data
        .filterNot(n => n.startsWith("_") || n.startsWith("."))
        .filter(_.endsWith(suffix))
        .map(_.dropRight(suffix.length))
    import spark.implicits._
    names.toDF("element")
  }

  /** [[listingFor]] through Spark's file-source index instead of a
    * driver `listStatus`: the `binaryFile` source discovers files with a
    * distributed listing job once the path count crosses
    * `spark.sql.sources.parallelPartitionDiscovery.threshold`, and the
    * projection keeps only `path`, so file CONTENT is pruned at the scan
    * — no byte of data is read, only metadata. Same (element) contract,
    * so the existence-check joins are interchangeable between the two;
    * use this for object-store prefixes with millions of keys where a
    * single driver listing RPC stalls the batch.
    */
  def distributedListingFor(spark: SparkSession, dir: String,
      suffix: String): DataFrame = {
    import org.apache.hadoop.fs.Path
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    import spark.implicits._
    if (!fs.exists(path)) Seq.empty[String].toDF("element")
    else {
      val glob = if (suffix.nonEmpty) s"*$suffix" else "*"
      val name = substring_index(col("path"), "/", -1)
      val element =
        if (suffix.isEmpty) name
        else name.substr(lit(1), length(name) - suffix.length)
      spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(dir)
        .select(element.as("element"))
    }
  }
}
