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

/** Declarative dedup step (silver `transform_type: dedup`) — the YAML
  * surface over [[graft.operators.Dedup]]: `method: exact` keeps one
  * row per content fingerprint; `minhash` / `simhash` additionally
  * cluster near-duplicates (LSH candidates → connected components) and
  * keep each cluster's canonical member. The keeper is always the
  * smallest id (deterministic; d8's contract).
  */
final case class DedupStepConfig(
    method: String, // exact | minhash | simhash
    idColumn: String,
    textColumn: String,
    shingleSize: Int,
    numHashes: Int,
    bands: Int)

/** Declarative curation step (silver `transform_type: curation`) — the
  * YAML surface over [[graft.operators.Curation]] and the text scorers:
  * optional language allowlist, quality floor, PII redaction, and
  * deterministic per-stratum sampling, applied in that order.
  */
final case class CurationStepConfig(
    idColumn: String,
    textColumn: String,
    languages: Seq[String], // empty = no language gate
    minQuality: Option[Double],
    redactPii: Boolean,
    piiReplacement: String,
    stratumColumn: Option[String],
    sampleRates: Map[String, Double],
    defaultSampleRate: Double)

final case class TransformConfig(
    transformId: String,
    sourceTable: String,
    targetTable: String,
    sqlQuery: String,
    partitionBy: Seq[String],
    dataQuality: Seq[DqRuleConfig],
    enabled: Boolean,
    transformType: String = "sql", // sql | dedup | curation
    dedup: Option[DedupStepConfig] = None,
    curation: Option[CurationStepConfig] = None)

final case class ModelConfig(
    modelId: String,
    sqlQuery: String,
    targetTable: String,
    partitionBy: Seq[String],
    refreshType: String, // full | incremental | additive
    primaryKeys: Seq[String],
    enabled: Boolean,
    // additive only: the SUM columns the model's batch frame carries;
    // each run folds them into the standing table per primaryKeys
    // (Maintenance.maintainAdditiveAggregate) instead of rescanning
    // history or whole-row-replacing
    sumColumns: Seq[String] = Nil)

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
    (Seq(
      "transform_id" -> js(t.transformId), "source_table" -> js(t.sourceTable),
      "target_table" -> js(t.targetTable),
      "transform_type" -> js(t.transformType),
      "sql_query" -> js(t.sqlQuery),
      "partition_by" -> jarr(t.partitionBy),
      "data_quality" -> t.dataQuality.map(r => jobj(
        "rule_name" -> js(r.ruleName), "rule_type" -> js(r.ruleType),
        "columns" -> jarr(r.columns),
        "action_on_failure" -> js(r.actionOnFailure))).mkString("[", ",", "]")) ++
      t.dedup.toSeq.map(d => "dedup" -> jobj(
        "method" -> js(d.method), "id_column" -> js(d.idColumn),
        "text_column" -> js(d.textColumn),
        "shingle_size" -> d.shingleSize.toString,
        "num_hashes" -> d.numHashes.toString, "bands" -> d.bands.toString)) ++
      t.curation.toSeq.map(c => "curation" -> jobj(
        "id_column" -> js(c.idColumn), "text_column" -> js(c.textColumn),
        "languages" -> jarr(c.languages),
        "min_quality" -> c.minQuality.map(_.toString).getOrElse("null"),
        "redact_pii" -> c.redactPii.toString,
        "stratum_column" -> c.stratumColumn.map(js).getOrElse("null"),
        "sample_rates" -> c.sampleRates.toSeq.sortBy(_._1)
          .map { case (k, v) => js(k) + ":" + v }.mkString("{", ",", "}"),
        "default_sample_rate" -> c.defaultSampleRate.toString)) ++
      Seq("enabled" -> t.enabled.toString)): _*)

  def apply(m: ModelConfig): String = jobj(
    "model_id" -> js(m.modelId), "sql_query" -> js(m.sqlQuery),
    "target_table" -> js(m.targetTable), "partition_by" -> jarr(m.partitionBy),
    "refresh_type" -> js(m.refreshType), "primary_keys" -> jarr(m.primaryKeys),
    "sum_columns" -> jarr(m.sumColumns),
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

  private def parseTransform(m: Map[String, Object]): TransformConfig = {
    val t = TransformConfig(
      transformId = str(m, "transform_id"),
      sourceTable = str(m, "source_table"),
      targetTable = str(m, "target_table"),
      sqlQuery = str(m, "sql_query"),
      partitionBy = strSeq(m, "partition_by"),
      dataQuality = seqOfMaps(m, "data_quality").map(parseDqRule),
      enabled = bool(m, "enabled"),
      // the reference spells it transformation_type
      // (silver_layer.py:114); the short form is accepted too
      transformType = opt(m, "transformation_type")
        .orElse(opt(m, "transform_type")).getOrElse("sql"),
      dedup = m.get("dedup").map(d => parseDedup(asMap(d))),
      curation = m.get("curation").map(c => parseCuration(asMap(c))))
    // config shape errors fail at PARSE time, not at run time inside a
    // per-item catch: a dedup step without its params block (or vice
    // versa) is an authoring bug, never a data error
    require(t.transformType != "dedup" || t.dedup.nonEmpty,
      s"transform '${t.transformId}': transform_type dedup needs a dedup: block")
    require(t.transformType != "curation" || t.curation.nonEmpty,
      s"transform '${t.transformId}': transform_type curation needs a curation: block")
    require(t.transformType != "sql" || t.sqlQuery.nonEmpty,
      s"transform '${t.transformId}': transform_type sql needs sql_query")
    // the inverse too: a sql_query on a dedup/curation step would be
    // silently ignored (the dispatch reads source_table directly) —
    // a config the user wrote must act or fail, never vanish
    require(t.transformType == "sql" || t.sqlQuery.isEmpty,
      s"transform '${t.transformId}': sql_query is not used by " +
        s"transform_type ${t.transformType} — pre-filter via a preceding " +
        "sql transform instead")
    require(Set("sql", "dedup", "curation")(t.transformType),
      s"transform '${t.transformId}': unknown transform_type '${t.transformType}'")
    t
  }

  private def num(m: Map[String, Object], k: String, dflt: Int): Int =
    m.get(k).map(_.toString.toInt).getOrElse(dflt)

  private def parseDedup(m: Map[String, Object]): DedupStepConfig = {
    val d = DedupStepConfig(
      method = str(m, "method", "exact"),
      idColumn = str(m, "id_column"),
      textColumn = str(m, "text_column"),
      shingleSize = num(m, "shingle_size", 3),
      numHashes = num(m, "num_hashes", 16),
      bands = num(m, "bands", 4))
    require(Set("exact", "minhash", "simhash")(d.method),
      s"dedup method must be exact|minhash|simhash, got '${d.method}'")
    require(d.idColumn.nonEmpty && d.textColumn.nonEmpty,
      "dedup needs id_column and text_column")
    require(d.numHashes % d.bands == 0,
      s"bands (${d.bands}) must divide num_hashes (${d.numHashes}) evenly")
    d
  }

  private def parseCuration(m: Map[String, Object]): CurationStepConfig = {
    val c = CurationStepConfig(
      idColumn = str(m, "id_column"),
      textColumn = str(m, "text_column"),
      languages = strSeq(m, "languages"),
      minQuality = opt(m, "min_quality").map(_.toDouble),
      redactPii = bool(m, "redact_pii", dflt = false),
      piiReplacement = str(m, "pii_replacement", "[REDACTED]"),
      stratumColumn = opt(m, "stratum_column"),
      sampleRates = asMap(m.get("sample_rates"))
        .map { case (k, v) => k -> v.toString.toDouble },
      defaultSampleRate = opt(m, "default_sample_rate")
        .map(_.toDouble).getOrElse(1.0))
    require(c.idColumn.nonEmpty && c.textColumn.nonEmpty,
      "curation needs id_column and text_column")
    require(c.sampleRates.isEmpty || c.stratumColumn.nonEmpty,
      "sample_rates needs stratum_column")
    c
  }

  private def parseModel(m: Map[String, Object]): ModelConfig = {
    val mc = ModelConfig(
      modelId = str(m, "model_id"),
      sqlQuery = str(m, "sql_query"),
      targetTable = str(m, "target_table"),
      partitionBy = strSeq(m, "partition_by"),
      refreshType = str(m, "refresh_type", "full"),
      primaryKeys = strSeq(m, "primary_keys"),
      enabled = bool(m, "enabled"),
      sumColumns = strSeq(m, "sum_columns"))
    require(Set("full", "incremental", "additive")(mc.refreshType),
      s"model '${mc.modelId}': unknown refresh_type '${mc.refreshType}'")
    require(mc.refreshType != "additive" ||
      (mc.primaryKeys.nonEmpty && mc.sumColumns.nonEmpty),
      s"model '${mc.modelId}': refresh_type additive needs primary_keys " +
        "and sum_columns")
    mc
  }
}
