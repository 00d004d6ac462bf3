package graft.meta

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.Upsert

/** Metadata plane: control table (per-target watermark + run state) and
  * audit log (event per unit of work) — the reference's
  * metadata_manager.py / audit_logger.py re-expressed as typed Datasets
  * on parquet catalog tables.
  *
  * Deliberate fixes vs the reference (SURVEY.md §2.12 latent bugs):
  * create-if-absent instead of drop-and-recreate (which wiped history
  * mid-pipeline and made incremental watermarks unreachable), and
  * DataFrame upserts instead of f-string SQL interpolation.
  */
final case class ControlRow(
    table_name: String, layer: String, last_run_date: String,
    records_processed: Long, status: String, config_snapshot: String,
    updated_timestamp: Timestamp)

/** Per-rule DQ outcome row (reference declares this schema in
  * silver_schemas.py:72-85 but never populates it — we do).
  */
final case class DqMetricRow(
    target_table: String, transform_id: String, rule_name: String,
    rule_type: String, action: String, valid_count: Long,
    invalid_count: Long, run_date: String, recorded_at: Timestamp)

/** One column's documentation row (reference gold_schemas.py:63-72;
  * created by init_metadata_tables.py:95-114, population intended by
  * gold_layer.py:215-245 but disabled there — we do both).
  */
final case class DataDictRow(
    table_name: String, column_name: String, data_type: String,
    description: String, model_id: String, updated_timestamp: Timestamp)

final case class AuditEvent(
    log_id: String, event_timestamp: Timestamp, layer: String,
    operation: String, component: String, source_id: String,
    target_table: String, status: String, rows_processed: Long,
    error_message: String, execution_time_seconds: Double,
    run_id: String, spark_user: String)

/** Injectable clock/id source so tests are deterministic. */
trait IdClock {
  def now(): Timestamp
  def uuid(): String
}
object SystemIdClock extends IdClock {
  def now(): Timestamp = new Timestamp(System.currentTimeMillis())
  def uuid(): String = java.util.UUID.randomUUID().toString
}

class MetadataManager(spark: SparkSession, db: String = "metadata",
    clock: IdClock = SystemIdClock) {
  import spark.implicits._

  val controlTable = s"$db.etl_control_table"
  val auditTable = s"$db.etl_audit_log"
  val dqMetricsTable = s"$db.data_quality_metrics"
  val dictionaryTable = s"$db.data_dictionary"

  def init(): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    if (!spark.catalog.tableExists(controlTable))
      spark.emptyDataset[ControlRow].write.saveAsTable(controlTable)
    if (!spark.catalog.tableExists(auditTable))
      spark.emptyDataset[AuditEvent].write.saveAsTable(auditTable)
    if (!spark.catalog.tableExists(dqMetricsTable))
      spark.emptyDataset[DqMetricRow].write.saveAsTable(dqMetricsTable)
    if (!spark.catalog.tableExists(dictionaryTable))
      spark.emptyDataset[DataDictRow].write.saveAsTable(dictionaryTable)
  }

  /** Refresh the data dictionary for one table from its live catalog
    * schema, keyed upsert on (table_name, column_name) so re-runs
    * update rather than duplicate.
    */
  def updateDictionary(tableName: String, modelId: String,
      description: String = ""): Unit = {
    val now = clock.now()
    val rows = spark.catalog.listColumns(tableName).collect().toSeq
      .map(c => DataDictRow(tableName, c.name, c.dataType, description,
        modelId, now))
    if (rows.nonEmpty)
      Upsert.upsertTable(spark, dictionaryTable, rows.toDS().toDF(),
        Seq("table_name", "column_name"))
  }

  /** Stamps `recorded_at` here with the manager's (injectable) clock so
    * callers don't reach for wall-clock time.
    */
  def recordDqMetrics(rows: Seq[DqMetricRow]): Unit =
    if (rows.nonEmpty)
      rows.map(_.copy(recorded_at = clock.now())).toDS()
        .write.mode(SaveMode.Append).saveAsTable(dqMetricsTable)

  /** Upsert one control row keyed on (table_name, layer). The layer
    * plane passes ITEM-QUALIFIED keys (`bronze.<source_id>`,
    * `silver.<transform_id>`, `gold.<model_id>`,
    * `maintenance.<task_id>`) so two config items targeting one table
    * never clobber each other's watermark; `controlReport` prefix-
    * matches, so layer-level reads see every item.
    */
  def updateControl(tableName: String, layer: String, runDate: String,
      records: Long, status: String, configSnapshot: String = "{}"): Unit = {
    val row = Seq(ControlRow(tableName, layer, runDate, records, status,
      configSnapshot, clock.now())).toDS().toDF()
    Upsert.upsertTable(spark, controlTable, row, Seq("table_name", "layer"))
  }

  /** Incremental watermark: last successful run date for a target. */
  def lastRunDate(tableName: String, layer: String): Option[String] =
    spark.table(controlTable)
      .filter(col("table_name") === tableName && col("layer") === layer
        && col("status") === "SUCCESS")
      .select("last_run_date")
      .collect().headOption.map(_.getString(0))

  /** Every control row for a layer — exact key plus the item-qualified
    * `<layer>.<item_id>` rows the layer plane writes.
    */
  def controlReport(layer: String): DataFrame =
    spark.table(controlTable)
      .filter(col("layer") === layer || col("layer").startsWith(layer + "."))
      .orderBy("table_name", "layer")
}

class AuditLogger(spark: SparkSession, meta: MetadataManager,
    clock: IdClock = SystemIdClock) {
  import spark.implicits._

  val runId: String = clock.uuid()

  private def emit(e: AuditEvent): Unit =
    Seq(e).toDS().write.mode(SaveMode.Append).saveAsTable(meta.auditTable)

  def event(layer: String, operation: String, component: String,
      sourceId: String, targetTable: String, status: String,
      rows: Long = 0L, error: String = "", seconds: Double = 0.0): Unit =
    emit(AuditEvent(clock.uuid(), clock.now(), layer, operation, component,
      sourceId, targetTable, status, rows, error, seconds, runId,
      spark.sparkContext.sparkUser))

  /** STARTED/SUCCESS/ERROR bracketing around a unit of work (reference
    * F4), returning the body's result.
    */
  def bracket[T](layer: String, operation: String, component: String,
      sourceId: String, targetTable: String)(body: => (T, Long)): T = {
    val t0 = System.nanoTime()
    event(layer, operation, component, sourceId, targetTable, "STARTED")
    try {
      val (result, rows) = body
      event(layer, operation, component, sourceId, targetTable, "SUCCESS",
        rows, seconds = (System.nanoTime() - t0) / 1e9)
      result
    } catch {
      case e: Throwable =>
        event(layer, operation, component, sourceId, targetTable, "ERROR",
          error = String.valueOf(e.getMessage),
          seconds = (System.nanoTime() - t0) / 1e9)
        throw e
    }
  }

  def recentEvents(n: Int = 100): DataFrame =
    spark.table(meta.auditTable)
      .filter(col("run_id") === runId)
      .orderBy(col("event_timestamp").desc, col("log_id"))
      .limit(n)

  /** Failures-only view of this run's audit trail (reference
    * `audit_logger.py:259-285`'s log views, which have no error filter —
    * operators there grep the full dump). Column-expression filter, not
    * interpolated SQL, per SURVEY §2.12's injection fix.
    */
  def failedEvents(n: Int = 100): DataFrame =
    spark.table(meta.auditTable)
      .filter(col("run_id") === runId && col("status") === "ERROR")
      .orderBy(col("event_timestamp").desc, col("log_id"))
      .limit(n)

  /** Slowest-N completed units of work in this run — the "where did the
    * wall time go" triage view. Only terminal events carry a duration
    * (STARTED rows are zero), so those are excluded.
    */
  def slowestEvents(n: Int = 10): DataFrame =
    spark.table(meta.auditTable)
      .filter(col("run_id") === runId && col("status") =!= "STARTED")
      .orderBy(col("execution_time_seconds").desc, col("log_id"))
      .limit(n)

  /** All audit events ever recorded against one target table, newest
    * first (reference `audit_logger.py:266-285` `get_logs_for_table`,
    * minus its f-string SQL injection).
    */
  def eventsForTable(table: String, n: Int = 100): DataFrame =
    spark.table(meta.auditTable)
      .filter(col("target_table") === table)
      .orderBy(col("event_timestamp").desc, col("log_id"))
      .limit(n)
}
