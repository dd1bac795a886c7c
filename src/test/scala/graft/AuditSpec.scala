package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.config.KlioConfig
import graft.runner.Audit

/** `klioexec audit` parity: step registry, error/warning split, and the
  * pass-iff-no-errors verdict (reference audit.py:59-130).
  */
class AuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def cfg(extra: String = "", streaming: Boolean = false) =
    KlioConfig.fromYaml(
      s"""version: 2
         |job_name: audit-job
         |pipeline_options:
         |  streaming: ${if (streaming) "True" else "False"}
         |  project: p
         |job_config:
         |  events:
         |    inputs:
         |      - type: file
         |        location: /tmp/in
         |    outputs:
         |      - type: file
         |        location: /tmp/out
         |$extra""".stripMargin)

  test("a sane job passes with zero findings") {
    val r = Audit.audit(cfg())
    assert(r.passed && r.findings.isEmpty, r.findings)
  }

  test("missing event outputs is an error") {
    val c = KlioConfig.fromYaml(
      """version: 2
        |job_name: broken
        |job_config:
        |  events:
        |    inputs:
        |      - type: file
        |        location: /tmp/in
        |""".stripMargin)
    val r = Audit.audit(c)
    assert(!r.passed)
    assert(r.errors.exists(_.message.contains("no event outputs")))
  }

  test("skipped existence checks warn but do not fail the audit") {
    val r = Audit.audit(cfg(
      """  data:
        |    inputs:
        |      - type: gcs
        |        location: /tmp/audio
        |        skip_klio_existence_check: True
        |""".stripMargin))
    assert(r.passed, "warnings alone must not fail the audit")
    assert(r.warnings.exists(_.message.contains("existence check disabled")))
  }

  test("streaming over a batch-only source errors") {
    val c = cfg(streaming = true).copy(jobConfig =
      cfg(streaming = true).jobConfig.copy(events =
        cfg(streaming = true).jobConfig.events.copy(inputs = Seq(
          graft.config.KlioIoConfig(ioType = "bq", location = "ds.t")))))
    val r = Audit.audit(c)
    assert(r.errors.exists(_.message.contains("batch-only source")))
  }

  test("plan hazard step flags a cartesian product") {
    import spark.implicits._
    val a = Seq(1, 2).toDF("x")
    val b = Seq(3, 4).toDF("y")
    val r = Audit.audit(cfg(), Some(spark),
      extraSteps = Seq(Audit.PlanHazardStep(a.crossJoin(b))))
    assert(r.findings.exists(f =>
      f.step == "plan-hazards" && f.message.contains("CartesianProduct") ||
        f.message.contains("BroadcastNestedLoopJoin")))
  }

  test("small-files step warns on a shredded directory, passes a compact one") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-audit").toString
    val df = (0 until 2000).toDF("x")
    df.repartition(64).write.parquet(s"$base/shredded")
    df.coalesce(1).write.parquet(s"$base/compact")
    val shredded = Audit.audit(cfg(), Some(spark),
      extraSteps = Seq(Audit.SmallFilesStep(s"$base/shredded")))
    assert(shredded.warnings.exists(f => f.step == "small-files" &&
      f.message.contains("Compaction.compact")))
    val compact = Audit.audit(cfg(), Some(spark),
      extraSteps = Seq(Audit.SmallFilesStep(s"$base/compact")))
    assert(!compact.findings.exists(_.step == "small-files"))
    val missing = Audit.audit(cfg(), Some(spark),
      extraSteps = Seq(Audit.SmallFilesStep(s"$base/nope")))
    assert(missing.errors.exists(_.step == "small-files"))
  }

  test("plugin steps register and list like the plugin namespace") {
    val step = new Audit.AuditStep {
      val name = "custom-check"
      val description = "always warns"
      def run(c: KlioConfig, s: Option[org.apache.spark.sql.SparkSession]) =
        Seq(warn("custom finding"))
    }
    Audit.addAuditStep(step)
    try {
      assert(Audit.listAuditSteps().exists(_._1 == "custom-check"))
      val r = Audit.audit(cfg())
      assert(r.warnings.exists(_.message == "custom finding"))
      assert(r.summary == "0 errors, 1 warnings")
    } finally Audit.clearAuditSteps()
  }
}
