package graft.config

import org.scalatest.funsuite.AnyFunSuite

class ConfigSpec extends AnyFunSuite {

  val yaml =
    """default:
      |  spark_conf:
      |    spark.sql.shuffle.partitions: "200"
      |sources:
      |  - source_id: sales_tx
      |    source_type: file
      |    source_path: /data/${EXTRACT_DATE}/tx
      |    file_format: parquet
      |    target_table: bronze.sales_transactions
      |    extract_strategy: incremental
      |    incremental_column: transaction_date
      |    enabled: true
      |  - source_id: disabled_src
      |    source_type: api
      |    source_path: http://x/api
      |    enabled: false
      |transformations:
      |  - transform_id: sales_clean
      |    source_table: bronze.sales_transactions
      |    target_table: silver.sales_clean
      |    sql_query: SELECT * FROM bronze.sales_transactions WHERE d >= '${PROCESSING_DATE}'
      |    partition_by: [state]
      |    data_quality:
      |      - rule_name: amount_not_null
      |        rule_type: not_null
      |        column: amount
      |        action_on_failure: filter
      |      - rule_name: email_format
      |        rule_type: regex
      |        column: email
      |        pattern: "^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+$"
      |        action_on_failure: tag
      |models:
      |  - model_id: daily_sales
      |    sql_query: SELECT 1
      |    target_table: gold.daily_sales
      |    refresh_type: incremental
      |    primary_keys: [sale_date, category]
      |""".stripMargin

  test("parses all three config shapes") {
    val cfg = EtlConfig.fromYaml(yaml)
    assert(cfg.sparkConf == Map("spark.sql.shuffle.partitions" -> "200"))
    assert(cfg.sources.map(_.sourceId) == Seq("sales_tx", "disabled_src"))
    assert(cfg.sources.head.incrementalColumn.contains("transaction_date"))
    assert(!cfg.sources(1).enabled)
    val t = cfg.transformations.head
    assert(t.partitionBy == Seq("state"))
    assert(t.dataQuality.map(_.ruleType) == Seq("not_null", "regex"))
    assert(t.dataQuality.head.columns == Seq("amount"))
    assert(cfg.models.head.primaryKeys == Seq("sale_date", "category"))
  }

  private def transformYaml(body: String): String =
    s"""transformations:
       |  - transform_id: t1
       |    source_table: b.docs
       |    target_table: s.out
       |$body""".stripMargin

  test("declarative verb configs validate at parse time, not inside the run loop") {
    // a verb step without its params block (or a params block on the
    // wrong step type) is an authoring bug — it must fail at parse
    // time, never run as a silent no-op
    for (verb <- Seq("chunk", "quota", "mix", "split", "decontaminate",
        "weighted_sample")) {
      val e = intercept[IllegalArgumentException] {
        EtlConfig.fromYaml(transformYaml(s"    transform_type: $verb\n"))
      }
      assert(e.getMessage.contains(s"needs a $verb: block"), e.getMessage)
    }
    // mismatched block: quota params on a chunk step
    val mism = intercept[IllegalArgumentException] {
      EtlConfig.fromYaml(transformYaml(
        """    transform_type: chunk
          |    chunk: {id_column: doc_id, text_column: text}
          |    quota: {id_column: doc_id, stratum_column: src, max_per_stratum: 5}
          |""".stripMargin))
    }
    assert(mism.getMessage.contains("quota: block is not used"), mism.getMessage)
    // value-range shapes: stride > chunk_tokens, zero quota, a no-op
    // mix, a missing probe table — each named at parse time
    intercept[IllegalArgumentException] { EtlConfig.fromYaml(transformYaml(
      """    transform_type: chunk
        |    chunk: {id_column: doc_id, text_column: text, chunk_tokens: 8, stride: 9}
        |""".stripMargin)) }
    intercept[IllegalArgumentException] { EtlConfig.fromYaml(transformYaml(
      """    transform_type: quota
        |    quota: {id_column: doc_id, stratum_column: src, max_per_stratum: 0}
        |""".stripMargin)) }
    intercept[IllegalArgumentException] { EtlConfig.fromYaml(transformYaml(
      """    transform_type: mix
        |    mix: {id_column: doc_id, source_column: src}
        |""".stripMargin)) }
    intercept[IllegalArgumentException] { EtlConfig.fromYaml(transformYaml(
      """    transform_type: decontaminate
        |    decontaminate: {id_column: doc_id, text_column: text}
        |""".stripMargin)) }
    intercept[IllegalArgumentException] { EtlConfig.fromYaml(transformYaml(
      """    transform_type: weighted_sample
        |    weighted_sample: {id_column: doc_id, stratum_column: lang, weight_column: n_chars, samples_per_stratum: 0}
        |""".stripMargin)) }
    // the happy path parses with defaults filled
    val ok = EtlConfig.fromYaml(transformYaml(
      """    transform_type: split
        |    split: {id_column: doc_id, text_column: text}
        |""".stripMargin)).transformations.head
    assert(ok.split.contains(graft.config.SplitStepConfig(
      "doc_id", "text", 64, 48, 90, 5)))
  }

  test("template substitution: vars, env, and unknown left empty") {
    assert(EtlConfig.substitute("d >= '${PROCESSING_DATE}'",
      Map("PROCESSING_DATE" -> "2024-01-01")) == "d >= '2024-01-01'")
    assert(EtlConfig.substitute("${ENV:GRAFT_PW}/x", Map.empty,
      env = Map("GRAFT_PW" -> "s3cret").get) == "s3cret/x")
    assert(EtlConfig.substitute("${ENV:MISSING}", Map.empty,
      env = _ => None) == "")
    assert(EtlConfig.substitute("${UNKNOWN}", Map.empty) == "${UNKNOWN}")
  }
}
