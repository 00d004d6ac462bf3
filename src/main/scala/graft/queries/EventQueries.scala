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

  /** SLIDING (hopping) window — e3's tumbling twin with overlap: 1-hour
    * windows hopping every 30 minutes, so each event lands in exactly
    * TWO buckets (duration/slide = 2 — Spark's `window(ts, dur, slide)`
    * plans a 2-row generator per event, never a range join). The
    * overlap factor is the denormalization cost a streaming rollup
    * accepts for query-time simplicity; the oracle UNNESTs the same
    * two window starts per event. Scale shape: generator + one
    * map-side-combined aggregate — tumbling's cost ×(dur/slide).
    */
  def e14SlidingWindow(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n_events"), col("total_value"))
      .orderBy("win_start", "event_type")

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

  /** Exact interpolating percentiles of `value` per event type — the
    * latency/size-distribution report every event pipeline runs. Exact
    * `percentile` (sort-based) is the ORACLE-CHECKED form; at 100 TB the
    * same report runs `percentile_approx` (mergeable sketch, no global
    * sort) — the approx twin's error bound is pinned in a ScalaTest
    * next to this query rather than an oracle row.
    */
  def e5Percentiles(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy("event_type")
      .agg(expr("percentile(value, array(0.5, 0.95, 0.99))").as("ps"))
      .select(col("event_type"),
        round(col("ps").getItem(0), 6).as("p50"),
        round(col("ps").getItem(1), 6).as("p95"),
        round(col("ps").getItem(2), 6).as("p99"))
      .orderBy("event_type")

  /** Fixed-width histogram of `value` (bin width 10) per event type —
    * pure integer binning, one map-side-combined aggregation, no
    * min/max pre-pass (fixed bounds are the streaming-friendly shape).
    */
  def e6Histogram(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(col("event_type"), floor(col("value") / 10).as("bin"))
      .agg(count(lit(1)).as("n"))
      .orderBy("event_type", "bin")

  /** Day-over-day event-count deltas per type: daily rollup, then a
    * lag window PER TYPE (30 rows each — never a global sort). First
    * day's delta is 0 by the coalesce-to-self convention.
    */
  def e7DailyDeltas(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type").orderBy("day")
    events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))
      .withColumn("delta",
        col("n_events") - coalesce(lag("n_events", 1).over(w), col("n_events")))
      .orderBy("event_type", "day")
  }

  /** Daily event-mix pivot: one row per day, one count column per event
    * type — the `.pivot` API surface with an EXPLICIT value list (never
    * the distinct-scan form, which adds a blocking extra job at scale).
    * Missing (day, type) combos coalesce to 0 like the SQL FILTER form.
    */
  def e8PivotDaily(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .groupBy(to_date(col("ts")).as("day"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(count(lit(1)))
      .select(col("day"),
        coalesce(col("click"), lit(0L)).as("n_click"),
        coalesce(col("error"), lit(0L)).as("n_error"),
        coalesce(col("purchase"), lit(0L)).as("n_purchase"),
        coalesce(col("signup"), lit(0L)).as("n_signup"),
        coalesce(col("view"), lit(0L)).as("n_view"))
      .orderBy("day")

  /** UNPIVOT (melt) — the inverse reshape of e8: the wide daily matrix
    * back to long (day, event_type, n_events) via the native
    * `Dataset.unpivot` operator (SQL-standard UNPIVOT in the DuckDB
    * oracle). Deliberately composed ON e8's pivot so the pair
    * round-trips: the melted output keeps the ZERO rows the pivot
    * materialized for absent (day, type) combos — the semantic
    * difference from a plain groupBy, which never emits empty groups,
    * and the reason unpivot∘pivot is densification, not identity.
    * Scale shape: unpivot is a generator-style map (each row fans out
    * to exactly |value columns| rows, no shuffle) on top of e8's one
    * aggregate exchange.
    */
  def e12Unpivot(s: SparkSession, dir: String): DataFrame =
    e8PivotDaily(s, dir)
      .unpivot(Array(col("day")),
        Array(col("n_click"), col("n_error"), col("n_purchase"),
          col("n_signup"), col("n_view")),
        "etype", "n_events")
      .select(col("day"), substring(col("etype"), 3, 100).as("event_type"),
        col("n_events"))
      .orderBy("day", "event_type")

  /** VARIANT semi-structured path — Spark 4's open-ended JSON type
    * (`parse_json` → binary variant → typed `variant_get`) instead of
    * e4's schema-on-read `get_json_object` string plucking: the shape
    * for payloads whose schema you DON'T pin up front. Extraction is
    * scan-fused map work; the aggregate is the usual map-side-combined
    * per-type rollup. The oracle extracts the same path with DuckDB's
    * JSON reader — identical ints, so the variant decode is
    * value-checked end to end.
    */
  def e13VariantJson(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .select(col("event_type"),
        expr("variant_get(parse_json(props), '$.k', 'int')").as("k"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"), sum("k").as("sum_k"),
        min("k").as("min_k"), max("k").as("max_k"))
      .orderBy("event_type")

  /** Ordered conversion funnel view → click → purchase: a user reaches
    * a stage only via a STRICTLY LATER event than the previous stage
    * (first view, then first click after that view, then first purchase
    * after that click — the standard ordered-funnel semantics, not mere
    * set membership). One shuffle on user_id: the three stage
    * timestamps are chained conditional-min windows over the same
    * partitioning, then a tiny global count. Integer micros end to end.
    */
  def e9Funnel(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
    events(s, dir)
      .withColumn("us", expr("unix_micros(ts)"))
      .withColumn("v_us", min(when(col("event_type") === "view", col("us"))).over(w))
      .withColumn("c_us", min(when(col("event_type") === "click" &&
        col("us") > col("v_us"), col("us"))).over(w))
      .withColumn("p_us", min(when(col("event_type") === "purchase" &&
        col("us") > col("c_us"), col("us"))).over(w))
      .groupBy()
      .agg(
        count_distinct(when(col("v_us").isNotNull, col("user_id"))).as("n_view"),
        count_distinct(when(col("c_us").isNotNull, col("user_id"))).as("n_view_click"),
        count_distinct(when(col("p_us").isNotNull, col("user_id"))).as("n_view_click_purchase"))
  }

  /** Cohort retention matrix: users grouped by FIRST-EVENT day, then
    * distinct active users per (cohort_day, day_offset). The classic
    * "day-N retention" report. Two aggregations on user-keyed shuffles
    * plus one small rollup — never a self-join of events against
    * events. All-integer output.
    */
  def e10Retention(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
    events(s, dir)
      .withColumn("day", to_date(col("ts")))
      .withColumn("cohort_day", min("day").over(w))
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("long").as("day_offset"))
      .agg(count_distinct(col("user_id")).as("n_active"))
      .orderBy("cohort_day", "day_offset")
  }

  /** View→click attribution pairs: every (view, click) of the same
    * user where the click lands within one day of the view — the batch
    * twin of the stream-stream interval join
    * ([[graft.streaming.EventsStreaming.attributionJoin]], pinned
    * stream==batch in StreamingSpec). Shape: both sides shuffle once on
    * the user key (equi-join) and the interval predicate filters inside
    * the join — never a cartesian; at 100 TB this is the standard
    * co-partitioned self-join, and the streaming form bounds its state
    * by watermark + time constraint instead of materializing history.
    * Lag is integer seconds (micros DIV 1e6) — no float time math.
    */
  def e11Attribution(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("c_ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"),
        col("ts").as("v_ts"))
    clicks.join(views, Seq("user_id"))
      .filter(col("v_ts") <= col("c_ts") &&
        col("v_ts") >= col("c_ts") - expr("INTERVAL 1 DAY"))
      .select(col("click_id"), col("view_id"), col("user_id"),
        expr("(unix_micros(c_ts) - unix_micros(v_ts)) DIV 1000000")
          .as("lag_sec"))
      .orderBy("click_id", "view_id")
  }

  val entries: Map[String, Q] = Map(
    "e11_attribution" -> e11Attribution _,
    "e9_funnel" -> e9Funnel _,
    "e10_retention" -> e10Retention _,
    "e1_hourly_rollup" -> e1HourlyRollup _,
    "e2_sessionize" -> e2Sessionize _,
    "e3_tumbling_window" -> e3TumblingWindow _,
    "e4_json_extract" -> e4JsonExtract _,
    "e5_percentiles" -> e5Percentiles _,
    "e6_histogram" -> e6Histogram _,
    "e7_daily_deltas" -> e7DailyDeltas _,
    "e8_pivot_daily" -> e8PivotDaily _,
    "e12_unpivot" -> e12Unpivot _,
    "e13_variant_json" -> e13VariantJson _,
    "e14_sliding_window" -> e14SlidingWindow _,
  )

  val oracles: Map[String, String] = Map(
    "e11_attribution" ->
      """SELECT c.event_id AS click_id, v.event_id AS view_id, c.user_id,
        |  (epoch_us(c.ts) - epoch_us(v.ts)) // 1000000 AS lag_sec
        |FROM events c JOIN events v ON c.user_id = v.user_id
        | AND c.event_type = 'click' AND v.event_type = 'view'
        | AND v.ts <= c.ts AND v.ts >= c.ts - INTERVAL 1 DAY
        |ORDER BY click_id, view_id""".stripMargin,
    "e9_funnel" ->
      """WITH staged AS (
        |  SELECT user_id,
        |    MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END)
        |      OVER (PARTITION BY user_id) AS v_us,
        |    epoch_us(ts) AS us, event_type
        |  FROM events
        |), staged2 AS (
        |  SELECT user_id, v_us,
        |    MIN(CASE WHEN event_type = 'click' AND us > v_us THEN us END)
        |      OVER (PARTITION BY user_id) AS c_us, us, event_type
        |  FROM staged
        |), staged3 AS (
        |  SELECT user_id, v_us, c_us,
        |    MIN(CASE WHEN event_type = 'purchase' AND us > c_us THEN us END)
        |      OVER (PARTITION BY user_id) AS p_us
        |  FROM staged2
        |)
        |SELECT
        |  COUNT(DISTINCT CASE WHEN v_us IS NOT NULL THEN user_id END) AS n_view,
        |  COUNT(DISTINCT CASE WHEN c_us IS NOT NULL THEN user_id END) AS n_view_click,
        |  COUNT(DISTINCT CASE WHEN p_us IS NOT NULL THEN user_id END) AS n_view_click_purchase
        |FROM staged3""".stripMargin,
    "e10_retention" ->
      """WITH marked AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |    MIN(CAST(ts AS DATE)) OVER (PARTITION BY user_id) AS cohort_day
        |  FROM events)
        |SELECT cohort_day, datediff('day', cohort_day, day) AS day_offset,
        |  COUNT(DISTINCT user_id) AS n_active
        |FROM marked GROUP BY 1, 2 ORDER BY cohort_day, day_offset""".stripMargin,
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
    "e14_sliding_window" ->
      """WITH ev AS (
        |  SELECT event_type, value,
        |    UNNEST([epoch_us(ts) // 1800000000 * 1800000000,
        |            epoch_us(ts) // 1800000000 * 1800000000 - 1800000000])
        |      AS ws
        |  FROM events)
        |SELECT make_timestamp(ws) AS win_start, event_type,
        |  COUNT(*) AS n_events, ROUND(SUM(value), 2) AS total_value
        |FROM ev GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin,
    "e4_json_extract" ->
      """SELECT event_id,
        | CAST(regexp_extract(props, '"k": (\d+)', 1) AS INT) AS k
        |FROM events ORDER BY event_id""".stripMargin,
    // quantile_cont is the same p*(n-1) linear interpolation as Spark's
    // exact percentile; FLOOR-rounding to 6dp absorbs the last-ULP
    // difference in the two engines' interpolation arithmetic
    "e5_percentiles" ->
      """SELECT event_type,
        | FLOOR(quantile_cont(value, 0.5)  * 1e6 + 0.5) / 1e6 AS p50,
        | FLOOR(quantile_cont(value, 0.95) * 1e6 + 0.5) / 1e6 AS p95,
        | FLOOR(quantile_cont(value, 0.99) * 1e6 + 0.5) / 1e6 AS p99
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "e6_histogram" ->
      """SELECT event_type, CAST(FLOOR(value / 10) AS BIGINT) AS bin,
        | COUNT(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY event_type, bin""".stripMargin,
    "e7_daily_deltas" ->
      """WITH daily AS (
        |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n_events
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, day, n_events,
        |  n_events - COALESCE(LAG(n_events, 1) OVER w, n_events) AS delta
        |FROM daily
        |WINDOW w AS (PARTITION BY event_type ORDER BY day)
        |ORDER BY event_type, day""".stripMargin,
    "e8_pivot_daily" ->
      """SELECT CAST(ts AS DATE) AS day,
        | COUNT(*) FILTER (WHERE event_type = 'click')    AS n_click,
        | COUNT(*) FILTER (WHERE event_type = 'error')    AS n_error,
        | COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
        | COUNT(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
        | COUNT(*) FILTER (WHERE event_type = 'view')     AS n_view
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,
    "e13_variant_json" ->
      """SELECT event_type, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT)
        |    AS sum_k,
        |  MIN(CAST(json_extract(props, '$.k') AS INTEGER)) AS min_k,
        |  MAX(CAST(json_extract(props, '$.k') AS INTEGER)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "e12_unpivot" ->
      """WITH piv AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |   COUNT(*) FILTER (WHERE event_type = 'click')    AS n_click,
        |   COUNT(*) FILTER (WHERE event_type = 'error')    AS n_error,
        |   COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
        |   COUNT(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
        |   COUNT(*) FILTER (WHERE event_type = 'view')     AS n_view
        |  FROM events GROUP BY 1)
        |SELECT day, substr(etype, 3) AS event_type, n_events
        |FROM piv UNPIVOT (n_events FOR etype IN
        |  (n_click, n_error, n_purchase, n_signup, n_view))
        |ORDER BY day, event_type""".stripMargin,
  )
}
