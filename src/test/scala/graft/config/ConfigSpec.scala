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
