package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.config.{KlioConfig, YamlLite}

class ConfigSpec extends AnyFunSuite {

  val yaml =
    """# comment
      |version: 2
      |job_name: batch-modular-default
      |pipeline_options:
      |  streaming: False
      |  runner: DirectRunner
      |  project: test-project
      |job_config:
      |  allow_non_klio_messages: False
      |  events:
      |    inputs:
      |      - type: file
      |        location: ${base}/batch_track_ids.txt
      |        skip_klio_read: False
      |    outputs:
      |      - type: file
      |        location: ${base}/out
      |  data:
      |    inputs:
      |      - type: gcs
      |        location: ${base}/audio_in
      |        file_suffix: .ogg
      |        ping: False
      |    outputs:
      |      - type: gcs
      |        location: ${base}/audio_out
      |        file_suffix: .wav
      |        force: False
      |""".stripMargin

  test("parses the batch-modular klio-job.yaml shape with templating") {
    val cfg = KlioConfig.fromYaml(yaml, Map("base" -> "/tmp/x"))
    assert(cfg.jobName === "batch-modular-default")
    assert(cfg.gcpProject === "test-project")
    assert(!cfg.pipelineOptions.streaming)
    assert(cfg.jobConfig.events.inputs.head.location
      === "/tmp/x/batch_track_ids.txt")
    assert(cfg.jobConfig.data.inputs.head.fileSuffix === ".ogg")
    assert(cfg.jobConfig.data.outputs.head.fileSuffix === ".wav")
    assert(!cfg.jobConfig.allowNonKlioMessages)
  }

  test("YamlLite handles scalars, lists, nesting") {
    val v = YamlLite.parse(
      """a: 1
        |b: [x, y]
        |c:
        |  - 7
        |  - eight
        |d:
        |  e: true
        |""".stripMargin).asInstanceOf[Map[String, Any]]
    assert(v("a") === 1L)
    assert(v("b") === Seq("x", "y"))
    assert(v("c") === Seq(7L, "eight"))
    assert(v("d").asInstanceOf[Map[String, Any]]("e") === true)
  }

  test("missing job_name fails") {
    intercept[RuntimeException] {
      KlioConfig.fromYaml("version: 2\njob_config:\n  a: b\n")
    }
  }

  test("YamlLite: block list at the key's own indent (standard YAML)") {
    val v = YamlLite.parse(
      """inputs:
        |- type: custom
        |- type: custom
        |next_key: 5
        |""".stripMargin).asInstanceOf[Map[String, Any]]
    val items = v("inputs").asInstanceOf[Seq[Map[String, Any]]]
    assert(items.length === 2)
    assert(items.head("type") === "custom")
    assert(v("next_key") === 5L)
  }

  test("YamlLite: scalar list items with embedded colons stay scalars") {
    val v = YamlLite.parse(
      """paths:
        |  - gs://bucket/path
        |  - hdfs://nn:8020/data
        |""".stripMargin).asInstanceOf[Map[String, Any]]
    assert(v("paths") === Seq("gs://bucket/path", "hdfs://nn:8020/data"))
  }

  test("bq output schema fields parse into a StructType") {
    val cfg = KlioConfig.fromYaml(
      """version: 2
        |job_name: bq-out
        |job_config:
        |  events:
        |    inputs:
        |      - type: file
        |        location: /tmp/in.txt
        |    outputs:
        |      - type: bq
        |        location: /tmp/out_table
        |        schema:
        |          fields:
        |            - name: okey
        |              type: INTEGER
        |            - name: label
        |              type: STRING
        |""".stripMargin)
    val out = cfg.jobConfig.events.outputs.head
    assert(out.schemaFields === Seq("okey" -> "INTEGER", "label" -> "STRING"))
    val st = out.bqSchema
    assert(st.fieldNames.toSeq === Seq("okey", "label"))
    assert(st("okey").dataType.typeName === "long")
    assert(st("label").dataType.typeName === "string")
  }
}
