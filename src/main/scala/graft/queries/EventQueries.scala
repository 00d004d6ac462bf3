package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Batch analogs of the streaming operators over the `events` table:
  * hourly rollup, tumbling windows, sessionization, JSON payload
  * extraction. The same logic runs as a Structured Streaming job in
  * `graft.streaming` (readStream + watermark); the reference itself is
  * batch-only (SURVEY.md §2.9), so the oracle-checked form is batch.
  *
  * All session/window arithmetic is integer micros (`unix_micros`) —
  * no floating time math, so both engines agree bit-for-bit.
  */
object EventQueries extends QuerySet {

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  def e1HourlyRollup(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum("value"), 2).as("total_value"),
        round(avg("value"), 2).as("avg_value"))
      .orderBy("hour", "event_type")

  /** Tumbling 15-minute windows via the streaming-native `window()`
    * function (same expression Structured Streaming uses).
    */
  def e3TumblingWindow(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(window(col("ts"), "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"))
      .select(col("window.start").as("bucket_start"), col("event_type"),
        col("n_events"), col("total_value"))
      .orderBy("bucket_start", "event_type")

  /** Sessionization: a new session starts after a >30 min gap per user.
    * lag + cumulative-sum over an integer-micros total order.
    */
  def e2Sessionize(s: SparkSession, dir: String): DataFrame = {
    val gapUs = 30L * 60 * 1000000
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, dir)
      .withColumn("us", expr("unix_micros(ts)"))
      .withColumn("new_sess",
        when(col("us") - lag("us", 1).over(w) > gapUs, 1).otherwise(0))
      .withColumn("session_id", sum("new_sess").over(cum) + 1)
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        timestamp_micros(min("us")).as("session_start"),
        ((max("us") - min("us")) / lit(1000000L)).cast("long").as("duration_sec"))
      .orderBy("user_id", "session_id")
  }

  /** JSON payload extraction from the `props` column (regex-based so it
    * stays codegen'd; at scale prefer from_json with an explicit schema).
    */
  def e4JsonExtract(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .select(col("event_id"),
        regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("int").as("k"))
      .orderBy("event_id")

  val entries: Map[String, Q] = Map(
    "e1_hourly_rollup" -> e1HourlyRollup _,
    "e2_sessionize" -> e2Sessionize _,
    "e3_tumbling_window" -> e3TumblingWindow _,
    "e4_json_extract" -> e4JsonExtract _,
  )

  val oracles: Map[String, String] = Map(
    "e1_hourly_rollup" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
        | COUNT(*) AS n_events,
        | ROUND(SUM(value), 2) AS total_value,
        | ROUND(AVG(value), 2) AS avg_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,
    "e2_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us,
        |    CASE WHEN epoch_us(ts) - LAG(epoch_us(ts), 1) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        |), sessions AS (
        |  SELECT user_id, us,
        |    CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) + 1 AS BIGINT) AS session_id
        |  FROM flagged
        |)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        |  make_timestamp(MIN(us)) AS session_start,
        |  (MAX(us) - MIN(us)) // 1000000 AS duration_sec
        |FROM sessions GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
    "e3_tumbling_window" ->
      """SELECT make_timestamp(epoch_us(ts) // 900000000 * 900000000) AS bucket_start,
        | event_type, COUNT(*) AS n_events, ROUND(SUM(value), 2) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY bucket_start, event_type""".stripMargin,
    "e4_json_extract" ->
      """SELECT event_id,
        | CAST(regexp_extract(props, '"k": (\d+)', 1) AS INT) AS k
        |FROM events ORDER BY event_id""".stripMargin,
  )
}
