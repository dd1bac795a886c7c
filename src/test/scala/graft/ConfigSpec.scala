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

  test("overrides update existing keys and create new io entries by path") {
    // reference _apply_overrides (_preprocessing.py:162-214): dotted paths
    // against the name-transformed io sections, missing levels created
    val cfg = KlioConfig.fromYaml(yaml, Map("base" -> "/tmp/x"), Seq(
      "job_name=overridden-job",
      "job_config.events.inputs.file0.location=/elsewhere/in.txt",
      "job_config.events.outputs.file1.type=file",
      "job_config.events.outputs.file1.location=/second/out"))
    assert(cfg.jobName === "overridden-job")
    assert(cfg.jobConfig.events.inputs.head.location === "/elsewhere/in.txt")
    // override-created second output appends after the original
    assert(cfg.jobConfig.events.outputs.map(_.location)
      === Seq("/tmp/x/out", "/second/out"))
  }

  test("override values scalar-parse so flags land as booleans") {
    val cfg = KlioConfig.fromYaml(yaml, Map("base" -> "/t"),
      Seq("job_config.allow_non_klio_messages=true",
        "job_config.data.inputs.gcs0.ping=true"))
    assert(cfg.jobConfig.allowNonKlioMessages)
    assert(cfg.jobConfig.data.inputs.head.ping)
  }

  test("io entries with an explicit name are addressable by it") {
    val named = yaml.replace("      - type: gcs\n        location: " +
      "${base}/audio_in", "      - type: gcs\n        name: main_audio\n" +
      "        location: ${base}/audio_in")
    val cfg = KlioConfig.fromYaml(named, Map("base" -> "/t"),
      Seq("job_config.data.inputs.main_audio.file_suffix=.wav"))
    assert(cfg.jobConfig.data.inputs.head.fileSuffix === ".wav")
  }

  test("malformed overrides and missing template vars fail fast") {
    intercept[IllegalArgumentException] {
      KlioConfig.fromYaml(yaml, Map("base" -> "/t"), Seq("job_name"))
    }
    intercept[RuntimeException] {
      KlioConfig.fromYaml(yaml) // ${base} never provided
    }
  }

  test("plugin preprocessors rewrite the parsed dict before validation") {
    import graft.config.KlioConfigPreprocessor
    KlioConfigPreprocessor.addPluginPreprocessor { d =>
      d.updated("job_name", d("job_name").toString + "-plugged")
    }
    try {
      val cfg = KlioConfig.fromYaml(yaml, Map("base" -> "/t"))
      assert(cfg.jobName === "batch-modular-default-plugged")
    } finally KlioConfigPreprocessor.clearPluginPreprocessors()
  }

  test("template values containing $ or backslash substitute literally") {
    val cfg = KlioConfig.fromYaml(yaml,
      Map("base" -> """/pa$th/wi\th"""))
    assert(cfg.jobConfig.events.inputs.head.location
      === """/pa$th/wi\th/batch_track_ids.txt""")
  }

  test("bare $var templating substitutes like ${var}") {
    val cfg = KlioConfig.fromYaml(
      yaml.replace("${base}/batch_track_ids.txt", "$base/tracks.txt"),
      Map("base" -> "/bare"))
    assert(cfg.jobConfig.events.inputs.head.location === "/bare/tracks.txt")
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
