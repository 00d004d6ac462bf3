package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming counterparts of the batch event queries
  * (EventQueries): the reference is batch-only (SURVEY.md §2.9 — its
  * "incremental" loads are a metadata watermark), so these are the
  * honest Spark-native generalization: the SAME aggregation expressions
  * run over `readStream` with event-time watermarks, plus a stateful
  * sessionizer via flatMapGroupsWithState.
  *
  * At scale: windowed aggs shuffle on (window, key) with partial
  * aggregation; session state is per-user in the state store — both are
  * the standard unbounded-input shapes. Watermark bounds state size.
  */
/** Session-state record. Top-level (not nested/private) because the
  * state-store encoder generates Java that must see the accessors;
  * timestamps kept as objects — reconstructing from epoch-ms would drop
  * the microsecond component and diverge from the batch sessionizer.
  */
final case class SessionState(start: java.sql.Timestamp,
    last: java.sql.Timestamp, n: Long, total: Double)

/** Per-user transition state: only the previous event TYPE — the
  * ordering key is consumed at emission time, so the store carries the
  * minimum a Markov derivation needs.
  */
final case class TransState(lastType: String)

object EventsStreaming {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class Session(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, total_value: Double)

  final case class Transition(user_id: Long, from_type: String,
      to_type: String)


  /** Streaming reader for an events parquet directory. The files carry
    * TIMESTAMP(NANOS); read nanos as long and truncate to micros (same
    * normalization as graft.Tables.loadEvents).
    *
    * The `nanosAsLong` conf is session-level BY NECESSITY: a streaming
    * source re-plans file reads every micro-batch for the stream's whole
    * lifetime, so a save/restore scope would break the second batch. It
    * only affects parquet columns that actually carry TIMESTAMP(NANOS)
    * (other reads are untouched); callers wanting isolation should pass
    * a dedicated session (`spark.newSession()` shares the catalog but
    * not the conf).
    *
    * @param stageDir scratch directory for staging the single events
    *   file (the file source needs a directory to watch); defaults to
    *   a deterministic path under `java.io.tmpdir`.
    */
  def readEvents(spark: SparkSession, dir: String,
      stageDir: Option[String] = None): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the file source needs a directory (basePath); testdata keeps all
    // tables in one dir, so stage events.parquet alone into scratch
    val src = java.nio.file.Paths.get(s"$dir/events.parquet")
    val stage = java.nio.file.Paths.get(stageDir.getOrElse(
      sys.props("java.io.tmpdir") +
        s"/graft_stream_src_${dir.replaceAll("[^A-Za-z0-9]", "_")}"))
    java.nio.file.Files.createDirectories(stage)
    val staged = stage.resolve("events.parquet")
    // size check: a silently-stale copy would make streaming diverge
    // from batch over the same path if the source file were regenerated
    if (!java.nio.file.Files.exists(staged)
      || java.nio.file.Files.size(staged) != java.nio.file.Files.size(src))
      java.nio.file.Files.copy(src, staged,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val schema = spark.read.parquet(staged.toString).schema
    // ts encoding varies by driver generation (nanos-as-long vs
    // TIMESTAMP_NTZ micros) — same normalization as the batch loader
    graft.Tables.normalizeTs(
      spark.readStream.schema(schema).parquet(stage.toString))
  }

  /** Streaming exact dedup on a key — the training-pipeline staple
    * (keep the first occurrence of each id as data arrives) expressed
    * with Spark's state-store `dropDuplicates`; the watermark bounds
    * state: duplicates arriving more than `horizon` after the original
    * may pass, which is the standard accuracy/state trade at unbounded
    * scale.
    */
  def dedupEvents(events: DataFrame, keyCol: String = "event_id",
      horizon: String = "1 hour"): DataFrame =
    events.withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark(keyCol)

  /** Tumbling hourly rollup with a 1-hour watermark — identical
    * aggregation expressions to the batch `e1_hourly_rollup`.
    */
  def hourlyRollup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("total_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Stream-stream interval join — view→click attribution as data
    * arrives: clicks join views of the same user within
    * `attributionWindow`, both sides watermarked so Spark can expire
    * join state (a view older than watermark + window can never match a
    * future click and is dropped from the state store). This is the
    * shape that replaces "re-join today's clicks against all history"
    * with bounded per-key state at unbounded input. Identical output
    * expressions to the batch `e11_attribution` (parity pinned in
    * StreamingSpec).
    */
  def attributionJoin(events: DataFrame, attributionWindow: String = "1 day",
      horizon: String = "1 hour"): DataFrame = {
    val views = events.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
        col("ts").as("v_ts"))
      .withWatermark("v_ts", horizon)
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", horizon)
    clicks.join(views, expr(s"v_user = user_id AND v_ts <= c_ts" +
        s" AND v_ts >= c_ts - INTERVAL $attributionWindow"))
      .select(col("click_id"), col("view_id"), col("user_id"),
        expr("(unix_micros(c_ts) - unix_micros(v_ts)) DIV 1000000")
          .as("lag_sec"))
  }

  /** Stateful Markov-transition derivation — the streaming analog of
    * the batch `sq1_markov_transitions` sequence profile: each user's
    * PREVIOUS event rides the state store, so consecutive-pair
    * emission works across micro-batch boundaries (the first event of
    * batch N pairs with the last event of batch N−1 — the carry a
    * per-batch window could never see). Within a micro-batch the
    * group iterator is state-store order, not arrival order, so the
    * batch sorts on the full (ts, event_id) total order — seconds +
    * nanos, matching the batch query's microsecond-exact ordering.
    *
    * Contract: per-user arrival must be in event-time order ACROSS
    * micro-batches (the replay / ordered-ingest case every parity row
    * assumes) — within a batch any disorder is absorbed by the sort,
    * but a batch-N event older than batch-N−1's last would chain in
    * arrival position. State is ONE tiny record per user — bounded by
    * the key cardinality, not the stream; callers with unbounded key
    * churn should wrap with an event-time timeout like
    * [[sessionize]]'s. Downstream, the transition rows fold into the
    * same (from, to) counts as batch (parity pinned in
    * StreamingSpec, including a forced two-batch split).
    */
  def transitions(events: DataFrame): Dataset[Transition] = {
    val spark = events.sparkSession
    import spark.implicits._

    def update(userId: Long, batch: Iterator[Event],
        state: GroupState[TransState]): Iterator[Transition] = {
      var out = List.empty[Transition]
      var prev = state.getOption
      for (e <- batch.toSeq.sortBy(e =>
          (e.ts.getTime / 1000, e.ts.getNanos, e.event_id))) {
        prev.foreach(p => out ::= Transition(userId, p.lastType, e.event_type))
        prev = Some(TransState(e.event_type))
      }
      prev.foreach(state.update)
      out.reverseIterator
    }

    events.select("event_id", "ts", "user_id", "event_type", "value")
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
  }

  /** Stateful sessionization: a session closes after `gapMinutes` of
    * user inactivity (processing continues across micro-batches through
    * the state store; event-time timeout flushes idle sessions).
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes * 60 * 1000L

    def update(userId: Long, batch: Iterator[Event],
        state: GroupState[SessionState]): Iterator[Session] = {
      var closed = List.empty[Session]
      var cur = state.getOption
      if (state.hasTimedOut && cur.isDefined) {
        val s = cur.get
        closed ::= Session(userId, s.start, s.last, s.n, s.total)
        state.remove()
        cur = None
      }
      // state-store order is not arrival order — sort the micro-batch
      for (e <- batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))) {
        cur match {
          case Some(s) if e.ts.getTime - s.last.getTime > gapMs =>
            closed ::= Session(userId, s.start, s.last, s.n, s.total)
            cur = Some(SessionState(e.ts, e.ts, 1, e.value))
          case Some(s) =>
            cur = Some(SessionState(s.start, e.ts, s.n + 1, s.total + e.value))
          case None =>
            cur = Some(SessionState(e.ts, e.ts, 1, e.value))
        }
      }
      cur.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.last.getTime + gapMs)
      }
      closed.reverseIterator
    }

    events.select("event_id", "ts", "user_id", "event_type", "value")
      .withWatermark("ts", s"$gapMinutes minutes")
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }
}
