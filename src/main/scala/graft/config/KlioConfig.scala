package graft.config

/** klio-job.yaml-shaped configuration (reference
  * `core/src/klio_core/config/core.py:36-489`, IO types `_io.py:42-530`),
  * parsed by a dependency-free YAML subset parser ([[YamlLite]]) with
  * `${var}` templating parity (`config/_preprocessing.py:25-120`).
  */
case class KlioIoConfig(
    ioType: String,
    location: String = "",
    fileSuffix: String = "",
    ping: Boolean = false,
    force: Boolean = false,
    columns: Seq[String] = Seq.empty,
    skipExistenceCheck: Boolean = false,
    skipRead: Boolean = false,
    skipWrite: Boolean = false,
    /** BQ-output column declarations (name → BQ type), the reference's
      * `schema: {fields: [{name, type}]}` shape (`_io.py:462-491`).
      */
    schemaFields: Seq[(String, String)] = Seq.empty) {

  /** The declared BQ schema as a Spark StructType (BQ type names mapped
    * to Catalyst types).
    */
  def bqSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(schemaFields.map { case (name, t) =>
      val dt = t.toUpperCase match {
        case "STRING" => StringType
        case "INTEGER" | "INT64" => LongType
        case "FLOAT" | "FLOAT64" | "NUMERIC" => DoubleType
        case "BOOLEAN" | "BOOL" => BooleanType
        case "TIMESTAMP" => TimestampType
        case "BYTES" => BinaryType
        case other => sys.error(s"unsupported BQ field type: $other")
      }
      StructField(name, dt)
    })
  }
}

case class KlioEventsConfig(inputs: Seq[KlioIoConfig],
    outputs: Seq[KlioIoConfig])

case class KlioDataConfig(inputs: Seq[KlioIoConfig],
    outputs: Seq[KlioIoConfig])

case class KlioJobSettings(
    allowNonKlioMessages: Boolean,
    events: KlioEventsConfig,
    data: KlioDataConfig)

case class KlioPipelineOptions(streaming: Boolean,
    conf: Map[String, String])

case class KlioConfig(
    version: Int,
    jobName: String,
    gcpProject: String,
    pipelineOptions: KlioPipelineOptions,
    jobConfig: KlioJobSettings) {
  def jobRef: graft.model.KlioJobRef =
    graft.model.KlioJobRef(jobName, gcpProject)
}

object KlioConfig {

  /** Parse config text through the full preprocessing chain
    * ([[KlioConfigPreprocessor]]): `$var`/`${var}` templating, plugin
    * preprocessors, then dotted-path `key=value` `overrides` (e.g.
    * `job_config.events.inputs.file0.location=/new/path` — entries
    * addressable by their `name` key or `<type><index>`). Unknown keys
    * are ignored (the reference keeps them as free-form user attributes,
    * `config/core.py:186-209` — retrievable here via YamlLite.parse).
    */
  def fromYaml(text: String, vars: Map[String, String] = Map.empty,
      overrides: Seq[String] = Seq.empty): KlioConfig = {
    val root = KlioConfigPreprocessor.process(text, vars, overrides)
    val jc = mapAt(root, "job_config")
    val events = mapAt(jc, "events")
    val data = mapAt(jc, "data")
    val po = mapAt(root, "pipeline_options")
    KlioConfig(
      version = root.get("version").map(asLong(_).toInt).getOrElse(2),
      jobName = str(root, "job_name")
        .getOrElse(sys.error("job_name is required")),
      gcpProject = str(po, "project").orElse(str(root, "gcp_project"))
        .getOrElse(""),
      pipelineOptions = KlioPipelineOptions(
        streaming = bool(po, "streaming").getOrElse(false),
        // YamlLite parses ints/bools into Long/Boolean — stringify every
        // scalar, or numeric options (spark.sql.shuffle.partitions: 64)
        // silently vanish from the conf map
        conf = po.collect {
          case (k, v) if v != null && !v.isInstanceOf[Map[_, _]] &&
            !v.isInstanceOf[Seq[_]] => k -> v.toString
        }),
      jobConfig = KlioJobSettings(
        allowNonKlioMessages =
          bool(jc, "allow_non_klio_messages").getOrElse(false),
        events = KlioEventsConfig(ioList(events, "inputs"),
          ioList(events, "outputs")),
        data = KlioDataConfig(ioList(data, "inputs"),
          ioList(data, "outputs"))))
  }

  private def mapAt(m: Map[String, Any], k: String): Map[String, Any] =
    m.get(k) match {
      case Some(mm: Map[String @unchecked, Any @unchecked]) => mm
      case _ => Map.empty
    }

  private def str(m: Map[String, Any], k: String): Option[String] =
    m.get(k).collect { case s: String => s }

  private def bool(m: Map[String, Any], k: String): Option[Boolean] =
    m.get(k).collect { case b: Boolean => b }

  private def asLong(v: Any): Long = v match {
    case l: Long => l
    case s: String => s.toLong
    case other => sys.error(s"expected number, got $other")
  }

  private def ioList(m: Map[String, Any], k: String): Seq[KlioIoConfig] =
    m.get(k) match {
      case Some(xs: Seq[Any @unchecked]) => xs.map {
        case im: Map[String @unchecked, Any @unchecked] =>
          val io = KlioIoConfig(
            ioType = str(im, "type").getOrElse(sys.error(s"$k entry needs type")),
            location = str(im, "location").getOrElse(""),
            fileSuffix = str(im, "file_suffix").getOrElse(""),
            ping = bool(im, "ping").getOrElse(false),
            force = bool(im, "force").getOrElse(false),
            columns = im.get("columns") match {
              case Some(cs: Seq[Any @unchecked]) => cs.map(_.toString)
              case _ => Seq.empty
            },
            skipExistenceCheck =
              bool(im, "skip_klio_existence_check").getOrElse(false),
            skipRead = bool(im, "skip_klio_read").getOrElse(false),
            skipWrite = bool(im, "skip_klio_write").getOrElse(false),
            schemaFields = mapAt(im, "schema").get("fields") match {
              case Some(fs: Seq[Any @unchecked]) => fs.map {
                case fm: Map[String @unchecked, Any @unchecked] =>
                  (str(fm, "name").getOrElse(
                    sys.error("schema field needs name")),
                    str(fm, "type").getOrElse("STRING"))
                case other => sys.error(s"schema fields must be mappings, " +
                  s"got $other")
              }
              case _ => Seq.empty
            })
          validate(io)
          io
        case other => sys.error(s"$k entries must be mappings, got $other")
      }
      case _ => Seq.empty
    }

  /** Validation parity subset (reference `_io.py` validators): every IO
    * needs a location except pure-streaming stubs.
    */
  private def validate(io: KlioIoConfig): Unit =
    if (io.location.isEmpty && io.ioType != "custom")
      sys.error(s"${io.ioType} IO requires a location")
}

/** Dependency-free parser for the YAML subset klio-job.yaml uses:
  * indentation-scoped mappings, `- ` block lists (scalar or mapping items),
  * inline `[a, b]` scalar lists, bool/int/string scalars, and `#` comment
  * lines. No anchors, no multiline scalars — configs needing those are out
  * of the reference's shape too.
  */
object YamlLite {

  private case class Line(indent: Int, text: String)

  def parse(text: String): Any = {
    val lines = text.split('\n').toIndexedSeq
      .map { raw =>
        val noTab = raw.replace("\t", "  ")
        Line(noTab.takeWhile(_ == ' ').length, noTab.trim)
      }
      .filter(l => l.text.nonEmpty && !l.text.startsWith("#"))
    val (value, rest) = parseBlock(lines, 0)
    require(rest.isEmpty, s"trailing unparsed config lines: $rest")
    value
  }

  private def parseBlock(lines: IndexedSeq[Line], minIndent: Int)
      : (Any, IndexedSeq[Line]) = {
    if (lines.isEmpty) return (Map.empty[String, Any], lines)
    val indent = lines.head.indent
    if (indent < minIndent) return (Map.empty[String, Any], lines)
    if (lines.head.text.startsWith("- ") || lines.head.text == "-")
      parseList(lines, indent)
    else parseMap(lines, indent)
  }

  private def parseMap(lines: IndexedSeq[Line], indent: Int)
      : (Map[String, Any], IndexedSeq[Line]) = {
    var rest = lines
    var out = Map.empty[String, Any]
    while (rest.nonEmpty && rest.head.indent == indent &&
        !rest.head.text.startsWith("- ")) {
      val l = rest.head.text
      val ci = l.indexOf(':')
      require(ci > 0, s"expected 'key: value', got '$l'")
      val key = l.take(ci).trim
      val inline = l.drop(ci + 1).trim
      rest = rest.tail
      if (inline.nonEmpty) out += key -> scalar(inline)
      else {
        // a block list may sit at the SAME indent as its key (standard
        // YAML: "inputs:\n- type: x"), so dash lines at this indent are
        // part of the child block, while a key line at this indent ends it
        val child = rest.takeWhile(c => c.indent > indent ||
          (c.indent == indent && c.text.startsWith("-")))
        val childMin = child.headOption.map(_.indent).getOrElse(indent + 1)
        val (v, left) = parseBlock(child, childMin)
        require(left.isEmpty, s"unparsed under $key: $left")
        out += key -> v
        rest = rest.drop(child.length)
      }
    }
    (out, rest)
  }

  private def parseList(lines: IndexedSeq[Line], indent: Int)
      : (Seq[Any], IndexedSeq[Line]) = {
    var rest = lines
    var out = Vector.empty[Any]
    while (rest.nonEmpty && rest.head.indent == indent &&
        rest.head.text.startsWith("-")) {
      val body = rest.head.text.drop(1).trim
      rest = rest.tail
      val child = rest.takeWhile(_.indent > indent)
      rest = rest.drop(child.length)
      if (body.isEmpty) {
        val (v, left) = parseBlock(child, indent + 1)
        require(left.isEmpty, s"unparsed list item: $left")
        out :+= v
      } else if ((body.contains(": ") || body.endsWith(":")) &&
          !isQuoted(body)) {
        // mapping items need ": " (or a trailing colon) — a bare colon
        // inside a scalar like gs://bucket/path stays a scalar
        // "- key: value" plus any deeper keys form one mapping item;
        // re-parse with the inline pair prepended at the child indent.
        val childIndent =
          if (child.nonEmpty) child.head.indent else indent + 2
        val merged = Line(childIndent, body) +: child
        val (v, left) = parseMap(merged, childIndent)
        require(left.isEmpty, s"unparsed list item: $left")
        out :+= v
      } else out :+= scalar(body)
    }
    (out, rest)
  }

  private def isQuoted(s: String): Boolean =
    (s.startsWith("\"") && s.endsWith("\"")) ||
      (s.startsWith("'") && s.endsWith("'"))

  private def scalar(s: String): Any = s match {
    case _ if isQuoted(s) => s.substring(1, s.length - 1)
    case "[]" => Seq.empty[Any]
    case "{}" => Map.empty[String, Any]
    case _ if s.startsWith("[") && s.endsWith("]") =>
      s.substring(1, s.length - 1).split(',').toSeq
        .map(_.trim).filter(_.nonEmpty).map(scalar)
    case "true" | "True" => true
    case "false" | "False" => false
    case "null" | "~" => null
    case _ if s.matches("-?\\d+") => s.toLong
    case _ => s
  }
}
