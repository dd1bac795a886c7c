package graft.config

import scala.collection.immutable.VectorMap

/** Config preprocessing parity (reference
  * `core/src/klio_core/config/_preprocessing.py:25-253`,
  * KlioConfigPreprocessor): everything between raw YAML text and the
  * parsed dict handed to [[KlioConfig]], in the reference's order —
  * `$var` templating → YAML parse → plugin preprocessors → io-section
  * naming → dotted-path `key=value` overrides.
  */
object KlioConfigPreprocessor {

  type ConfigMap = Map[String, Any]

  /** Registered plugin preprocessors (dict → dict), applied in
    * registration order right after parse (`_preprocessing.py:30-45`).
    */
  @volatile private var plugins: Vector[ConfigMap => ConfigMap] =
    Vector.empty

  def addPluginPreprocessor(proc: ConfigMap => ConfigMap): Unit =
    synchronized { plugins = plugins :+ proc }

  /** Test/lifecycle hook; the reference's class-level list is similarly
    * process-global.
    */
  def clearPluginPreprocessors(): Unit = synchronized {
    plugins = Vector.empty
  }

  /** Parse `key=value` strings into a map — keys lowercased, ALL
    * whitespace stripped from both pieces, and a value containing '='
    * rejected. Both quirks are deliberate reference parity
    * (`_parse_option_key_val_list`, `_preprocessing.py:216-233`:
    * `"".join(p.split())` strips interior whitespace and the unbounded
    * `split("=")` makes extra '='s malformed) — diverging here would make
    * CLI overrides behave differently from klio's.
    */
  def parseKeyValList(kvs: Seq[String]): Map[String, String] =
    kvs.map { s =>
      val pieces = s.split("=").map(_.filterNot(_.isWhitespace))
      require(pieces.length == 2,
        s"Malformed config override '$s', should be '<key>=<value>'")
      pieces(0).toLowerCase -> pieces(1)
    }.toMap

  private val placeholder =
    "\\$\\{([A-Za-z_][A-Za-z0-9_]*)\\}|\\$([A-Za-z_][A-Za-z0-9_]*)".r

  /** `${var}` (mid-string) and bare `$var` substitution over the raw
    * text; an unresolved placeholder fails like the reference's
    * KlioConfigTemplatingException (`_apply_templates`,
    * `_preprocessing.py:119-160`).
    */
  def applyTemplates(text: String, templates: Map[String, String]): String =
    placeholder.replaceAllIn(text, m => {
      val name = Option(m.group(1)).getOrElse(m.group(2))
      templates.getOrElse(name,
        sys.error(s"config templating: no value provided for '$$$name'"))
        .replace("\\", "\\\\").replace("$", "\\$") // literal replacement
    })

  /** Name each io-list entry (its `name` key, else `<type><index>` with a
    * per-type counter) so overrides can address entries by stable dotted
    * paths (`_transform_io_list`, `_preprocessing.py:47-98`). VectorMap
    * keeps entry order through the override pass.
    */
  private def nameIoList(entries: Seq[Any]): VectorMap[String, Any] = {
    val counters = scala.collection.mutable.Map.empty[String, Int]
    entries.foldLeft(VectorMap.empty[String, Any]) {
      case (acc, conf: Map[String @unchecked, Any @unchecked]) =>
        val name = conf.get("name") match {
          case Some(n) => n.toString
          case None =>
            val t = conf.getOrElse("type", "unknown").toString
            val i = counters.getOrElse(t, 0)
            counters(t) = i + 1
            s"$t$i"
        }
        acc.updated(name, conf - "name")
      case (acc, other) => sys.error(s"io entries must be mappings: $other")
    }
  }

  private val ioPaths = for {
    section <- Seq("events", "data")
    direction <- Seq("inputs", "outputs")
  } yield List("job_config", section, direction)

  private def mapAt(root: ConfigMap, path: List[String]): Option[Any] =
    path.foldLeft(Option[Any](root)) {
      case (Some(m: Map[String @unchecked, Any @unchecked]), k) => m.get(k)
      case _ => None
    }

  /** Assign `value` at a dotted path, creating missing intermediate maps
    * (glom.assign with missing=dict, `_apply_overrides`,
    * `_preprocessing.py:162-214`).
    */
  private def assign(m: ConfigMap, path: List[String], value: Any)
      : ConfigMap = path match {
    case last :: Nil => m.updated(last, value)
    case head :: rest =>
      val child = m.get(head) match {
        case Some(cm: Map[String @unchecked, Any @unchecked]) => cm
        case _ => VectorMap.empty[String, Any]
      }
      m.updated(head, assign(child, rest, value))
    case Nil => m
  }

  private def transform(root: ConfigMap,
      f: Seq[Any] => Any): ConfigMap =
    ioPaths.foldLeft(root) { (acc, path) =>
      mapAt(acc, path) match {
        case Some(xs: Seq[Any @unchecked]) => assign(acc, path, f(xs))
        case _ => acc
      }
    }

  /** Override values arrive as CLI strings; scalar-parse them
    * (true/false/int like the YAML parser) so `ping=true` lands as a
    * boolean the config model accepts.
    */
  private def scalarize(v: String): Any = v match {
    case "true" | "True" => true
    case "false" | "False" => false
    case _ if v.matches("-?\\d+") => v.toLong
    case _ => v
  }

  /** The full preprocessing chain (`process`,
    * `_preprocessing.py:230-253`): template → parse → plugins → io
    * naming → overrides — then io sections turn back into ordered lists
    * for [[KlioConfig]]'s model (override-created entries append in path
    * order).
    */
  def process(text: String, templates: Map[String, String],
      overrides: Seq[String]): ConfigMap = {
    val parsed = YamlLite.parse(applyTemplates(text, templates)) match {
      case m: Map[String @unchecked, Any @unchecked] => m
      case other => sys.error(s"config root must be a mapping, got $other")
    }
    val afterPlugins = plugins.foldLeft(parsed)((d, p) => p(d))
    val named = transform(afterPlugins, nameIoList)
    val overridden = parseKeyValList(overrides).foldLeft(named) {
      case (acc, (path, value)) =>
        assign(acc, path.split('.').toList, scalarize(value))
    }
    // back to ordered lists of entry mappings for the io model
    ioPaths.foldLeft(overridden) { (acc, path) =>
      mapAt(acc, path) match {
        case Some(m: Map[String @unchecked, Any @unchecked]) =>
          assign(acc, path, m.values.toVector)
        case _ => acc
      }
    }
  }
}
