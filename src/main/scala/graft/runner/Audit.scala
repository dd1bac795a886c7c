package graft.runner

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.config.KlioConfig

/** `klioexec audit` parity (reference
  * `exec/src/klio_exec/commands/audit.py:59-130` + `audit_steps/base.py`):
  * a pluggable job linter — each registered step inspects the job and
  * emits errors/warnings, then the command summarizes and passes only
  * when nothing errored.
  *
  * The reference's built-in steps police Python-runtime hazards (numpy
  * BLAS thread pools, tempfile usage, multithreaded TensorFlow) that have
  * no JVM counterpart; the Spark-native hazards worth the same treatment
  * are config and plan shaped, so those are the built-ins here. The
  * plugin mechanism (`PLUGIN_NAMESPACE = "klio.plugins.audit"`,
  * audit.py:26,43-45) maps to [[Audit.addAuditStep]].
  */
object Audit {

  /** One audit finding (base.py's emit_warning/emit_error). */
  case class Finding(step: String, message: String, isError: Boolean)

  /** A step inspects the config (and optionally a session) and returns
    * findings. `name`/`description` mirror `AUDIT_STEP_NAME` +
    * `get_description` (base.py:52,60-68, shown by `audit --list`).
    */
  trait AuditStep extends Serializable {
    def name: String
    def description: String
    def run(cfg: KlioConfig, spark: Option[SparkSession]): Seq[Finding]

    protected def warn(msg: String): Finding = Finding(name, msg, false)
    protected def error(msg: String): Finding = Finding(name, msg, true)
  }

  /** Event IO sanity: a job with no event inputs or outputs cannot move
    * messages (the reference validates this at config-attrs level;
    * surfacing it as an audit keeps partial configs debuggable).
    */
  object EventIoStep extends AuditStep {
    val name = "event-io"
    val description = "jobs need at least one event input and output"
    def run(cfg: KlioConfig, spark: Option[SparkSession]): Seq[Finding] = {
      val e = cfg.jobConfig.events
      Seq(
        Option.when(e.inputs.isEmpty)(error("no event inputs configured")),
        Option.when(e.outputs.isEmpty)(error("no event outputs configured"))
      ).flatten
    }
  }

  /** Idempotence memoization: existence checks skipped on data IO means
    * every backfill reprocesses everything (helpers.py:91-104 is the
    * feature being turned off) — legal, but worth a warning.
    */
  object ExistenceCheckStep extends AuditStep {
    val name = "existence-checks"
    val description =
      "warn when skip_klio_existence_check disables incremental compute"
    def run(cfg: KlioConfig, spark: Option[SparkSession]): Seq[Finding] =
      (cfg.jobConfig.data.inputs ++ cfg.jobConfig.data.outputs)
        .filter(_.skipExistenceCheck)
        .map(io => warn(s"existence check disabled for ${io.ioType} at " +
          s"'${io.location}' — outputs will recompute on every run"))
  }

  /** Streaming-mode consistency: a streaming job reading a batch-only
    * source type stalls at start; catching it at audit time beats a
    * runtime AnalysisException on the cluster.
    */
  object StreamingModeStep extends AuditStep {
    val name = "streaming-mode"
    val description = "streaming jobs need stream-capable event sources"
    def run(cfg: KlioConfig, spark: Option[SparkSession]): Seq[Finding] =
      if (!cfg.pipelineOptions.streaming) Seq.empty
      else cfg.jobConfig.events.inputs.filter(_.ioType == "bq")
        .map(io => error(s"streaming mode cannot read the bq event input " +
          s"at '${io.location}' — batch-only source"))
  }

  /** Shuffle sizing: the 200-partition default is wrong at both ends —
    * local mode wants ~cores, a 1000-executor cluster wants thousands.
    * An unset value means nobody thought about the job's shuffle shape.
    */
  object ShufflePartitionsStep extends AuditStep {
    val name = "shuffle-partitions"
    val description =
      "warn when spark.sql.shuffle.partitions is left at the 200 default"
    def run(cfg: KlioConfig, spark: Option[SparkSession]): Seq[Finding] =
      spark.toSeq.flatMap { s =>
        val conf = s.conf.get("spark.sql.shuffle.partitions", "200")
        val fromJob = cfg.pipelineOptions.conf.get("spark.sql.shuffle.partitions")
        Option.when(conf == "200" && fromJob.isEmpty)(
          warn("spark.sql.shuffle.partitions is the 200 default — size it " +
            "to the job's shuffle volume (≈ cores locally, more at scale)"))
      }
  }

  /** Plan hazards for a representative job DataFrame: a cartesian
    * product is almost always an unkeyed join that will not survive
    * scale (the plan-shaped sibling of the reference's runtime-hazard
    * steps).
    */
  case class PlanHazardStep(df: DataFrame) extends AuditStep {
    val name = "plan-hazards"
    val description = "flag cartesian products in the job's query plan"
    def run(cfg: KlioConfig, spark: Option[SparkSession]): Seq[Finding] = {
      val plan = df.queryExecution.executedPlan.toString
      Seq(
        Option.when(plan.contains("CartesianProduct"))(
          error("query plan contains a CartesianProduct — add a join key " +
            "or an explicit broadcast of a bounded side")),
        Option.when(plan.contains("BroadcastNestedLoopJoin"))(
          warn("query plan contains a BroadcastNestedLoopJoin — fine for " +
            "a bounded broadcast side, fatal if that side grows with data"))
      ).flatten
    }
  }

  /** Small-file audit for a data directory: when the average data file
    * falls far below the target size, scans pay per-file open/footer
    * overhead and the driver pays split enumeration — the fix is one
    * [[graft.io.Compaction.compact]] run. A metadata-only listing, same
    * cost as any scan's planning.
    */
  case class SmallFilesStep(dir: String,
      targetBytes: Long = 128L * 1024 * 1024) extends AuditStep {
    val name = "small-files"
    val description =
      "warn when a data directory averages files far below target size"
    def run(cfg: KlioConfig, spark: Option[SparkSession]): Seq[Finding] =
      spark.toSeq.flatMap { s =>
        val p = new org.apache.hadoop.fs.Path(dir)
        val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (!fs.exists(p)) Seq(error(s"data directory $dir does not exist"))
        else {
          val files = fs.listStatus(p).filter(f => f.isFile &&
            !f.getPath.getName.startsWith("_") &&
            !f.getPath.getName.startsWith("."))
          val (planned, bytes) =
            graft.io.Compaction.plan(s, dir, targetBytes)
          Option.when(files.length >= 8 && files.length >= 4 * planned)(
            warn(s"$dir holds ${files.length} files for $bytes bytes " +
              s"(~${bytes / math.max(files.length, 1)} B/file); compaction " +
              s"to ~$targetBytes B files would write $planned — run " +
              "graft.io.Compaction.compact")).toSeq
        }
      }
  }

  val builtinSteps: Seq[AuditStep] =
    Seq(EventIoStep, ExistenceCheckStep, StreamingModeStep,
      ShufflePartitionsStep)

  @volatile private var plugins: Vector[AuditStep] = Vector.empty

  /** Register an extra step (`klio.plugins.audit` namespace parity). */
  def addAuditStep(step: AuditStep): Unit = synchronized {
    plugins = plugins :+ step
  }

  def clearAuditSteps(): Unit = synchronized { plugins = Vector.empty }

  /** Step names + descriptions (`klio job audit --list`,
    * audit.py:49-57).
    */
  def listAuditSteps(extra: Seq[AuditStep] = Seq.empty): Seq[(String, String)] =
    (builtinSteps ++ plugins ++ extra).map(s => (s.name, s.description))

  /** The audit session (audit.py:59-130): run every step, collect
    * findings, pass ⟺ zero errors. Warnings alone keep `passed` true,
    * matching the reference's "Cool! Your job has warnings, but no
    * errors" exit path.
    */
  case class Report(findings: Seq[Finding]) {
    def errors: Seq[Finding] = findings.filter(_.isError)
    def warnings: Seq[Finding] = findings.filterNot(_.isError)
    def passed: Boolean = errors.isEmpty
    def summary: String =
      s"${errors.size} errors, ${warnings.size} warnings"
  }

  def audit(cfg: KlioConfig, spark: Option[SparkSession] = None,
      extraSteps: Seq[AuditStep] = Seq.empty): Report =
    Report((builtinSteps ++ plugins ++ extraSteps)
      .flatMap(_.run(cfg, spark)))
}
