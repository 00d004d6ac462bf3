package graft.config

import java.{util => ju}
import scala.jdk.CollectionConverters._
import org.yaml.snakeyaml.Yaml

/** Case-class model of the three YAML config shapes the engine
  * interprets (reference: src/config/{bronze,silver,gold}_config.yaml;
  * field inventory in SURVEY.md §1.4). Parsed with the snakeyaml bundled
  * in /opt/spark/jars — no extra dependencies.
  */
final case class SourceConfig(
    sourceId: String,
    sourceType: String, // file | jdbc | api
    sourcePath: String,
    fileFormat: String, // parquet | csv | json
    options: Map[String, String],
    targetTable: String,
    extractStrategy: String, // full | incremental
    incrementalColumn: Option[String],
    enabled: Boolean)

final case class DqRuleConfig(
    ruleName: String,
    ruleType: String, // not_null | regex | expression | referential_integrity | uniqueness
    columns: Seq[String],
    pattern: Option[String],
    expression: Option[String],
    refTable: Option[String],
    refColumn: Option[String],
    actionOnFailure: String) // filter | tag | reject

final case class TransformConfig(
    transformId: String,
    sourceTable: String,
    targetTable: String,
    sqlQuery: String,
    partitionBy: Seq[String],
    dataQuality: Seq[DqRuleConfig],
    enabled: Boolean)

final case class ModelConfig(
    modelId: String,
    sqlQuery: String,
    targetTable: String,
    partitionBy: Seq[String],
    refreshType: String, // full | incremental
    primaryKeys: Seq[String],
    enabled: Boolean)

final case class EtlConfig(
    sparkConf: Map[String, String],
    sources: Seq[SourceConfig],
    transformations: Seq[TransformConfig],
    models: Seq[ModelConfig])

/** Minimal JSON rendering of config items for the control table's
  * `config_snapshot` column (reference metadata_manager.py:115-117
  * stores `json.dumps(config)` per run) — hand-rolled so the engine
  * stays dependency-free.
  */
object ConfigJson {
  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }
  private def js(s: String): String = "\"" + esc(s) + "\""
  private def jarr(xs: Seq[String]): String = xs.map(js).mkString("[", ",", "]")
  private def jobj(fields: (String, String)*): String =
    fields.map { case (k, v) => js(k) + ":" + v }.mkString("{", ",", "}")

  def apply(s: SourceConfig): String = jobj(
    "source_id" -> js(s.sourceId), "source_type" -> js(s.sourceType),
    "source_path" -> js(s.sourcePath), "file_format" -> js(s.fileFormat),
    "options" -> s.options.toSeq.sortBy(_._1)
      .map { case (k, v) => js(k) + ":" + js(v) }.mkString("{", ",", "}"),
    "target_table" -> js(s.targetTable),
    "extract_strategy" -> js(s.extractStrategy),
    "incremental_column" -> s.incrementalColumn.map(js).getOrElse("null"),
    "enabled" -> s.enabled.toString)

  def apply(t: TransformConfig): String = jobj(
    "transform_id" -> js(t.transformId), "source_table" -> js(t.sourceTable),
    "target_table" -> js(t.targetTable), "sql_query" -> js(t.sqlQuery),
    "partition_by" -> jarr(t.partitionBy),
    "data_quality" -> t.dataQuality.map(r => jobj(
      "rule_name" -> js(r.ruleName), "rule_type" -> js(r.ruleType),
      "columns" -> jarr(r.columns),
      "action_on_failure" -> js(r.actionOnFailure))).mkString("[", ",", "]"),
    "enabled" -> t.enabled.toString)

  def apply(m: ModelConfig): String = jobj(
    "model_id" -> js(m.modelId), "sql_query" -> js(m.sqlQuery),
    "target_table" -> js(m.targetTable), "partition_by" -> jarr(m.partitionBy),
    "refresh_type" -> js(m.refreshType), "primary_keys" -> jarr(m.primaryKeys),
    "enabled" -> m.enabled.toString)
}

object EtlConfig {

  /** `${PROCESSING_DATE}` / `${EXTRACT_DATE}` / `${ENV:NAME}` template
    * substitution (reference: silver_layer.py:118, bronze_layer.py:168-171)
    * as a pure function. `${ENV:NAME}` resolves from the process
    * environment, falling back to JVM system properties (JVMs cannot set
    * their own env, so in-process callers/tests inject via `-D`).
    */
  def substitute(s: String, vars: Map[String, String],
      env: String => Option[String] = n => sys.env.get(n).orElse(sys.props.get(n))): String = {
    val withVars = vars.foldLeft(s) { case (acc, (k, v)) =>
      acc.replace("${" + k + "}", v)
    }
    "\\$\\{ENV:([A-Za-z0-9_]+)\\}".r.replaceAllIn(withVars,
      m => java.util.regex.Matcher.quoteReplacement(env(m.group(1)).getOrElse("")))
  }

  def fromYaml(yaml: String): EtlConfig = {
    val root = Option(new Yaml().load[ju.Map[String, Object]](yaml))
      .map(asMap).getOrElse(Map.empty)
    val default = root.get("default").map(asMap).getOrElse(Map.empty)
    EtlConfig(
      sparkConf = default.get("spark_conf").map(asMap).getOrElse(Map.empty)
        .map { case (k, v) => k -> v.toString },
      sources = seqOfMaps(root, "sources").map(parseSource),
      transformations = seqOfMaps(root, "transformations").map(parseTransform),
      models = seqOfMaps(root, "models").map(parseModel))
  }

  def load(path: String): EtlConfig =
    fromYaml(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8"))

  // ---- helpers over snakeyaml's untyped output ----

  private def asMap(o: Object): Map[String, Object] = o match {
    case m: ju.Map[_, _] =>
      m.asScala.map { case (k, v) => k.toString -> v.asInstanceOf[Object] }.toMap
    case _ => Map.empty
  }
  private def asMap(o: Option[Object]): Map[String, Object] =
    o.map(asMap).getOrElse(Map.empty)
  private def seqOfMaps(root: Map[String, Object], key: String): Seq[Map[String, Object]] =
    root.get(key) match {
      case Some(l: ju.List[_]) =>
        l.asScala.toSeq.map(e => asMap(e.asInstanceOf[Object]))
      case _ => Seq.empty
    }
  private def str(m: Map[String, Object], k: String, dflt: String = ""): String =
    m.get(k).map(_.toString).getOrElse(dflt)
  private def opt(m: Map[String, Object], k: String): Option[String] =
    m.get(k).map(_.toString).filter(_.nonEmpty)
  private def bool(m: Map[String, Object], k: String, dflt: Boolean = true): Boolean =
    m.get(k).map(_.toString.toBoolean).getOrElse(dflt)
  private def strSeq(m: Map[String, Object], k: String): Seq[String] = m.get(k) match {
    case Some(l: ju.List[_]) => l.asScala.toSeq.map(_.toString)
    case Some(s: String) if s.nonEmpty => s.split(",").toSeq.map(_.trim)
    case _ => Seq.empty
  }

  private def parseSource(m: Map[String, Object]): SourceConfig = SourceConfig(
    sourceId = str(m, "source_id"),
    sourceType = str(m, "source_type", "file"),
    sourcePath = str(m, "source_path"),
    fileFormat = str(m, "file_format", "parquet"),
    options = asMap(m.get("options")).map { case (k, v) => k -> v.toString },
    targetTable = str(m, "target_table"),
    extractStrategy = str(m, "extract_strategy", "full"),
    incrementalColumn = opt(m, "incremental_column"),
    enabled = bool(m, "enabled"))

  private def parseDqRule(m: Map[String, Object]): DqRuleConfig = DqRuleConfig(
    ruleName = str(m, "rule_name"),
    ruleType = str(m, "rule_type"),
    columns = strSeq(m, "columns") ++ opt(m, "column").toSeq,
    pattern = opt(m, "pattern"),
    expression = opt(m, "expression"),
    refTable = opt(m, "ref_table"),
    refColumn = opt(m, "ref_column"),
    actionOnFailure = str(m, "action_on_failure", "tag"))

  private def parseTransform(m: Map[String, Object]): TransformConfig = TransformConfig(
    transformId = str(m, "transform_id"),
    sourceTable = str(m, "source_table"),
    targetTable = str(m, "target_table"),
    sqlQuery = str(m, "sql_query"),
    partitionBy = strSeq(m, "partition_by"),
    dataQuality = seqOfMaps(m, "data_quality").map(parseDqRule),
    enabled = bool(m, "enabled"))

  private def parseModel(m: Map[String, Object]): ModelConfig = ModelConfig(
    modelId = str(m, "model_id"),
    sqlQuery = str(m, "sql_query"),
    targetTable = str(m, "target_table"),
    partitionBy = strSeq(m, "partition_by"),
    refreshType = str(m, "refresh_type", "full"),
    primaryKeys = strSeq(m, "primary_keys"),
    enabled = bool(m, "enabled"))
}
