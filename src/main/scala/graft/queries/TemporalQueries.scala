package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.TemporalJoins

/** As-of and range join queries over the events stream, oracle-checked:
  * the oracle states the SEMANTICS declaratively (correlated MAX
  * subqueries / inequality join — fine at oracle scale), while the
  * Spark side runs the scalable formulations (carry-forward window /
  * bucketized equi-join) and must produce identical rows.
  */
object TemporalQueries extends QuerySet {

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  /** The purchase plane every as-of variant probes: persisted because it
    * feeds both the match engine and the value read-back join.
    */
  private def purchasePlane(ev: DataFrame): DataFrame =
    graft.operators.FrameCaches.track(
      ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("us"), col("value")).persist())

  /** Shared resolve stage for the as-of family: join the matched
    * timestamps back to the purchase plane, break same-ts ties by
    * MAX(value), and surface the (event, user, purchase_ts, value)
    * output row. aj1/aj2/aj3 differ ONLY in the match engine call.
    */
  private def resolveMatches(matched: DataFrame,
      purchases: DataFrame): DataFrame =
    matched
      .join(purchases.withColumnRenamed("us", "_matched_us"),
        Seq("user_id", "_matched_us"))
      .groupBy("event_id", "user_id", "_matched_us")
      .agg(max("value").as("purchase_value"))
      .select(col("event_id"), col("user_id"),
        timestamp_micros(col("_matched_us")).as("purchase_ts"),
        col("purchase_value"))
      .orderBy("event_id")

  /** Each error event matched to the user's most recent purchase at or
    * before it (same-ts purchase ties resolved by MAX(value)).
    */
  def aj1AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir).withColumn("us", expr("unix_micros(ts)"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("us"))
    val purchases = purchasePlane(ev)
    resolveMatches(
      TemporalJoins.asofMatchTs(errors, purchases, "user_id",
        "event_id", col("us"), col("us")),
      purchases)
  }

  /** Signup→purchase conversion pairs: purchases by the same user
    * within 30 minutes after a signup (bucketized range join).
    */
  def rj1RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir).withColumn("us", expr("unix_micros(ts)"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("signup_id"), col("user_id"), col("us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("us").as("pus"), col("value"))
    TemporalJoins.rangeJoinPairs(
      signups, purchases.withColumnRenamed("p_user", "user_id"),
      "user_id", col("us"), col("pus"), 30L * 60 * 1000000)
      .select(col("signup_id"), col("purchase_id"),
        expr("(_rus - _lus) DIV 1000000").as("delay_sec"), col("value"))
      .orderBy("signup_id", "purchase_id")
  }

  /** Forward as-of: each signup matched to the user's NEXT purchase at
    * or after it — the conversion-attribution direction, via the
    * time-reversal reuse of the backward engine
    * ([[TemporalJoins.asofMatchTsForward]]); same-ts ties resolve by
    * MAX(value) like aj1. The oracle states the semantics as a
    * correlated MIN.
    */
  def aj2AsofForward(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir).withColumn("us", expr("unix_micros(ts)"))
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("event_id"), col("user_id"), col("us"))
    val purchases = purchasePlane(ev)
    resolveMatches(
      TemporalJoins.asofMatchTsForward(signups, purchases,
        "user_id", "event_id", col("us"), col("us")),
      purchases)
  }

  /** Bounded-staleness as-of ([[TemporalJoins.asofMatchTsWithin]]):
    * aj1's state lookup with a 24-hour freshness contract — the most
    * recent purchase, UNLESS it has gone stale ("most recent, if
    * fresh": an older in-window purchase is never un-hidden by the
    * bound; the operator spec pins that distinction). Discriminates at
    * every SF (~37% of aj1's matches survive the bound). Same
    * single-shuffle carry-forward shape; the lag filter fuses into the
    * window's output projection.
    */
  def aj3AsofTolerance(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir).withColumn("us", expr("unix_micros(ts)"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id"), col("user_id"), col("us"))
    val purchases = purchasePlane(ev)
    resolveMatches(
      TemporalJoins.asofMatchTsWithin(errors, purchases,
        "user_id", "event_id", col("us"), col("us"), 86400000000L),
      purchases)
  }

  val entries: Map[String, Q] = Map(
    "aj1_asof_join" -> aj1AsofJoin _,
    "aj2_asof_forward" -> aj2AsofForward _,
    "aj3_asof_tolerance" -> aj3AsofTolerance _,
    "rj1_range_join" -> rj1RangeJoin _,
  )

  val oracles: Map[String, String] = Map(
    // aj1's correlated MAX with the staleness bound applied AFTER the
    // match resolves — the "most recent, if fresh" spelling
    "aj3_asof_tolerance" ->
      """WITH err AS (SELECT event_id, user_id, epoch_us(ts) AS us
        |             FROM events WHERE event_type = 'error'),
        |pur AS (SELECT user_id, epoch_us(ts) AS us, value
        |        FROM events WHERE event_type = 'purchase'),
        |m AS (SELECT e.event_id, e.user_id, e.us,
        |        (SELECT MAX(p.us) FROM pur p
        |         WHERE p.user_id = e.user_id AND p.us <= e.us) AS m_us
        |      FROM err e)
        |SELECT m.event_id, m.user_id, make_timestamp(m.m_us) AS purchase_ts,
        |  (SELECT MAX(p.value) FROM pur p
        |   WHERE p.user_id = m.user_id AND p.us = m.m_us) AS purchase_value
        |FROM m
        |WHERE m.m_us IS NOT NULL AND m.us - m.m_us <= 86400000000
        |ORDER BY event_id""".stripMargin,
    "aj1_asof_join" ->
      """WITH err AS (SELECT event_id, user_id, epoch_us(ts) AS us
        |             FROM events WHERE event_type = 'error'),
        |pur AS (SELECT user_id, epoch_us(ts) AS us, value
        |        FROM events WHERE event_type = 'purchase'),
        |m AS (SELECT e.event_id, e.user_id,
        |        (SELECT MAX(p.us) FROM pur p
        |         WHERE p.user_id = e.user_id AND p.us <= e.us) AS m_us
        |      FROM err e)
        |SELECT m.event_id, m.user_id, make_timestamp(m.m_us) AS purchase_ts,
        |  (SELECT MAX(p.value) FROM pur p
        |   WHERE p.user_id = m.user_id AND p.us = m.m_us) AS purchase_value
        |FROM m WHERE m.m_us IS NOT NULL ORDER BY event_id""".stripMargin,
    "aj2_asof_forward" ->
      """WITH sg AS (SELECT event_id, user_id, epoch_us(ts) AS us
        |            FROM events WHERE event_type = 'signup'),
        |pur AS (SELECT user_id, epoch_us(ts) AS us, value
        |        FROM events WHERE event_type = 'purchase'),
        |m AS (SELECT s.event_id, s.user_id,
        |        (SELECT MIN(p.us) FROM pur p
        |         WHERE p.user_id = s.user_id AND p.us >= s.us) AS m_us
        |      FROM sg s)
        |SELECT m.event_id, m.user_id, make_timestamp(m.m_us) AS purchase_ts,
        |  (SELECT MAX(p.value) FROM pur p
        |   WHERE p.user_id = m.user_id AND p.us = m.m_us) AS purchase_value
        |FROM m WHERE m.m_us IS NOT NULL ORDER BY event_id""".stripMargin,
    "rj1_range_join" ->
      """SELECT s.event_id AS signup_id, p.event_id AS purchase_id,
        |  (epoch_us(p.ts) - epoch_us(s.ts)) // 1000000 AS delay_sec,
        |  p.value
        |FROM (SELECT * FROM events WHERE event_type = 'signup') s
        |JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON s.user_id = p.user_id
        | AND p.ts >= s.ts
        | AND epoch_us(p.ts) - epoch_us(s.ts) <= 1800000000
        |ORDER BY signup_id, purchase_id""".stripMargin,
  )
}
