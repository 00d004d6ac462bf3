package graft.layers

import org.apache.spark.sql.{DataFrame, Observation, SparkSession}
import org.apache.spark.sql.functions._
import graft.config._
import graft.dq.DqEngine
import graft.io.{Sinks, Sources, Upsert}
import graft.meta.{AuditLogger, MetadataManager}

/** The three medallion layer processors (reference F1–F6 loop
  * semantics: `enabled` gating, per-item error isolation, audit
  * bracketing, control-table watermarking) — re-expressed so each unit
  * of work reads its input ONCE: row counts come from `Observation`
  * metrics attached to the very write that materializes the table,
  * never from a second count() pass (the reference recomputed every
  * plan 2+2·rules times, SURVEY.md §3.2).
  */
final case class LayerReport(layer: String, succeeded: Seq[String],
    failed: Seq[(String, String)])

abstract class Layer(spark: SparkSession, meta: MetadataManager,
    audit: AuditLogger) {

  def layerName: String
  def run(): LayerReport

  /** Run every enabled item, isolating failures per item (F1). */
  protected def runAll[C](items: Seq[C], id: C => String,
      enabled: C => Boolean)(work: C => Unit): LayerReport = {
    val results = items.filter(enabled).map { item =>
      try { work(item); Right(id(item)) }
      catch { case e: Throwable => Left(id(item) -> String.valueOf(e.getMessage)) }
    }
    LayerReport(layerName,
      results.collect { case Right(i) => i },
      results.collect { case Left(f) => f })
  }

  /** Write with an observed row count (single pass). */
  protected def writeCounted(df: DataFrame, write: DataFrame => Unit): Long = {
    val obs = new Observation()
    write(df.observe(obs, count(lit(1)).as("rows")))
    obs.get("rows").asInstanceOf[Long]
  }
}

/** Bronze: config-driven ingest (S1–S5) + audit columns + append. */
class BronzeLayer(spark: SparkSession, config: EtlConfig,
    meta: MetadataManager, audit: AuditLogger, runDate: String)
  extends Layer(spark, meta, audit) {

  val layerName = "bronze"

  def run(): LayerReport =
    runAll[SourceConfig](config.sources, _.sourceId, _.enabled)(ingest)

  def ingest(src0: SourceConfig): Unit = {
    // incremental watermark: substitute ${EXTRACT_DATE} with the last
    // successful run date (F5); full loads use the pipeline run date
    // control rows key on (table_name, layer) — qualify the layer with
    // the source id (the maintenance plane's task-qualified precedent)
    // so two sources feeding ONE bronze table keep independent rows and
    // watermarks: a disabled source's incremental fence must not be
    // advanced by its table-mates
    val controlKey = s"$layerName.${src0.sourceId}"
    val extractDate =
      if (src0.extractStrategy == "incremental")
        meta.lastRunDate(src0.targetTable, controlKey)
          // pre-round-16 control rows keyed (table, "bronze"): read the
          // legacy key as a fallback, or an upgrade silently resets
          // every incremental watermark to 1970 and re-APPENDS all of
          // history (review-caught). The first success under the new
          // key takes over; the stale legacy row then never matches
          .orElse(meta.lastRunDate(src0.targetTable, layerName))
          .getOrElse("1970-01-01")
      else runDate
    val vars = Map("EXTRACT_DATE" -> extractDate, "PROCESSING_DATE" -> runDate)
    val src = src0.copy(
      sourcePath = EtlConfig.substitute(src0.sourcePath, vars),
      options = src0.options.map { case (k, v) => k -> EtlConfig.substitute(v, vars) })
    audit.bracket(layerName, "ingest", "BronzeLayer", src.sourceId, src.targetTable) {
      var df = Sources.read(spark, src)
        .withColumn("ingestion_timestamp", current_timestamp())
        .withColumn("source_id", lit(src.sourceId))
      for (c <- src.incrementalColumn if src.extractStrategy == "incremental")
        df = df.filter(col(c) > lit(extractDate))
      spark.sql(s"CREATE DATABASE IF NOT EXISTS ${db(src.targetTable)}")
      val rows = writeCounted(df, Sinks.append(_, src.targetTable))
      meta.updateControl(src.targetTable, controlKey, runDate, rows, "SUCCESS",
        ConfigJson(src0))
      ((), rows)
    }
  }

  private def db(table: String): String = table.split('.').head
}

/** Silver: SQL transform + DQ rules + partitioned overwrite. */
class SilverLayer(spark: SparkSession, config: EtlConfig,
    meta: MetadataManager, audit: AuditLogger, runDate: String)
  extends Layer(spark, meta, audit) {

  val layerName = "silver"

  def run(): LayerReport =
    runAll[TransformConfig](config.transformations, _.transformId, _.enabled)(transform)

  def transform(t: TransformConfig): Unit =
    audit.bracket(layerName, "transform", "SilverLayer", t.transformId, t.targetTable) {
      // snapshot BEFORE this step tracks anything: the drain below must
      // free only frames THIS transform created — a blanket release
      // would free localCheckpoint blocks owned by other in-flight
      // callers of the shared session, which cannot recompute
      val cacheMark = graft.operators.FrameCaches.mark(spark)
      // transform_type dispatch (reference silver_layer.py:98-125 runs
      // only SQL; the dedup/curation verbs expose the operator families
      // through the same plane — same DQ, audit, and control rows)
      val base = t.transformType match {
        case "dedup" =>
          DeclarativeSteps.dedupFrame(spark.table(t.sourceTable), t.dedup.get)
        case "curation" =>
          DeclarativeSteps.curationFrame(spark.table(t.sourceTable), t.curation.get)
        case "chunk" =>
          DeclarativeSteps.chunkFrame(spark.table(t.sourceTable), t.chunk.get)
        case "quota" =>
          DeclarativeSteps.quotaFrame(spark.table(t.sourceTable), t.quota.get)
        case "mix" =>
          DeclarativeSteps.mixFrame(spark.table(t.sourceTable), t.mix.get)
        case "split" =>
          DeclarativeSteps.splitFrame(spark.table(t.sourceTable), t.split.get)
        case "decontaminate" =>
          DeclarativeSteps.decontaminateFrame(spark.table(t.sourceTable),
            spark.table(t.decontaminate.get.probeTable), t.decontaminate.get)
        case "weighted_sample" =>
          DeclarativeSteps.weightedSampleFrame(spark.table(t.sourceTable),
            t.weightedSample.get)
        case "relevance_filter" =>
          DeclarativeSteps.relevanceFilterFrame(spark.table(t.sourceTable),
            t.relevanceFilter.get)
        case "asof" =>
          // READ verb: snapshot the scd2 source as of the declared
          // date (${PROCESSING_DATE} = this run's date)
          val a = t.asof.get
          DeclarativeSteps.asOfFrame(spark, t.sourceTable, a.copy(
            asOf = EtlConfig.substitute(a.asOf,
              Map("PROCESSING_DATE" -> runDate))))
        case "store_probe" =>
          // READ verb: flag rows against the accumulated standing
          // store without folding (the store never advances)
          DeclarativeSteps.storeProbeFrame(spark,
            spark.table(t.sourceTable), t.storeProbe.get)
        case "view_estimate" =>
          // READ verb: materialize the estimates the gold plane's
          // HLL/HDR sketch views maintain (the view never changes)
          DeclarativeSteps.viewEstimateFrame(spark, t.sourceTable,
            t.viewEstimate.get)
        case _ =>
          val sql = EtlConfig.substitute(t.sqlQuery, Map("PROCESSING_DATE" -> runDate))
          spark.sql(sql)
      }
      val dq = DqEngine(spark, base, t.dataQuality)
      spark.sql(s"CREATE DATABASE IF NOT EXISTS ${t.targetTable.split('.').head}")
      val rows =
        try writeCounted(dq.data, Sinks.overwrite(_, t.targetTable, t.partitionBy))
        finally {
          dq.cleanup()
          // the near-dup funnel persists its survivor frame (it feeds
          // two consumers); the write above is the last of them
          graft.operators.FrameCaches.releaseSince(spark, cacheMark)
        }
      meta.recordDqMetrics(dq.metrics.map(m =>
        graft.meta.DqMetricRow(t.targetTable, t.transformId, m.rule,
          m.ruleType, m.action, m.validCount, m.invalidCount, runDate,
          new java.sql.Timestamp(0)))) // stamped by the manager's clock
      // item-qualified control key: two transforms writing the same
      // target keep separate rows instead of clobbering each other
      meta.updateControl(t.targetTable, s"$layerName.${t.transformId}",
        runDate, rows, "SUCCESS", ConfigJson(t))
      ((), rows)
    }
}

/** Gold: aggregate model + full overwrite or keyed incremental upsert. */
class GoldLayer(spark: SparkSession, config: EtlConfig,
    meta: MetadataManager, audit: AuditLogger, runDate: String)
  extends Layer(spark, meta, audit) {

  val layerName = "gold"

  def run(): LayerReport =
    runAll[ModelConfig](config.models, _.modelId, _.enabled)(build)

  def build(m: ModelConfig): Unit =
    if (m.mode == "streaming") buildStreaming(m) else buildBatch(m)

  /** Declarative streaming model: wire the declared file-stream source
    * to the refresh type's foreachBatch sink twin ([[Sinks]].stream*),
    * run it with the AvailableNow trigger (process everything that has
    * landed, then stop — the pipeline keeps its run-to-completion
    * contract), and give it the SAME audit/control treatment as a
    * batch step. The checkpoint persists source offsets ACROSS
    * pipeline runs, so each run folds only the files that arrived
    * since the last one — the streaming analog of the batch epoch
    * fence; a re-run with nothing new is a zero-batch no-op.
    * records_processed = this run's stream input rows (the sink
    * progress counters, summed over the run's micro-batches).
    */
  def buildStreaming(m: ModelConfig): Unit =
    audit.bracket(layerName, "stream", "GoldLayer", m.modelId, m.targetTable) {
      // same template substitution as bronze source paths (${ENV:…},
      // ${PROCESSING_DATE}) — corpus configs resolve their data root
      // this way
      val vars = Map("PROCESSING_DATE" -> runDate)
      val ss0 = m.streamSource.get
      val ss = ss0.copy(
        path = EtlConfig.substitute(ss0.path, vars),
        options = ss0.options.map { case (k, v) =>
          k -> EtlConfig.substitute(v, vars) })
      // schema donor: a catalog table if declared, else a one-off batch
      // read of the landing path (file streams cannot infer schemas)
      val schema = ss.schemaTable.map(t => spark.table(t).schema).getOrElse {
        require(ss.format != "csv" || ss.options.contains("inferSchema"),
          s"streaming model '${m.modelId}': csv without schema_table " +
            "needs options.inferSchema=true for the attach-time probe")
        spark.read.format(ss.format).options(ss.options).load(ss.path).schema
      }
      val stream0 = spark.readStream.format(ss.format).schema(schema)
        .options(ss.options).load(ss.path)
      // declared projection: source-side column pruning, and required
      // by exact-contract sinks (scd2 refuses undeclared columns)
      val stream =
        if (ss.select.isEmpty) stream0
        else stream0.select(ss.select.map(col): _*)
      val checkpoint = m.checkpoint.map(EtlConfig.substitute(_, vars))
        .getOrElse(
          spark.conf.get("spark.sql.warehouse.dir").stripSuffix("/") +
            s"/_graft_checkpoints/${m.modelId}")
      spark.sql(s"CREATE DATABASE IF NOT EXISTS ${m.targetTable.split('.').head}")
      // input rows are accumulated via a listener, NOT q.recentProgress:
      // recentProgress is capped (spark.sql.streaming.
      // numRecentProgressUpdates, default 100), so a catch-up run with
      // >100 micro-batches would undercount records_processed and feed
      // VolumeGuard a corrupted median (review-caught). Keyed by query
      // id so a shared session's other streams never pollute the count.
      val rowsByQuery = new java.util.concurrent.ConcurrentHashMap[
        java.util.UUID, java.lang.Long]()
      val done = new java.util.concurrent.CountDownLatch(1)
      @volatile var queryId: java.util.UUID = null
      val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
        import org.apache.spark.sql.streaming.StreamingQueryListener._
        override def onQueryStarted(e: QueryStartedEvent): Unit = ()
        override def onQueryProgress(e: QueryProgressEvent): Unit = {
          rowsByQuery.merge(e.progress.id,
            java.lang.Long.valueOf(e.progress.numInputRows),
            (a, b) => java.lang.Long.valueOf(a.longValue() + b.longValue()))
          ()
        }
        override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
          if (e.id == queryId) done.countDown()
      }
      spark.streams.addListener(listener)
      val q = m.refreshType match {
        case "incremental" =>
          Sinks.streamUpsert(stream, m.targetTable, m.primaryKeys, checkpoint)
        case "changelog" =>
          Sinks.streamChangeLog(stream, m.targetTable, m.primaryKeys,
            checkpoint, m.opColumn, m.seqColumn)
        case "additive" =>
          Sinks.streamAdditiveAggregate(stream, m.targetTable,
            m.primaryKeys, m.sumColumns, checkpoint)
        case "extremes" =>
          Sinks.streamInsertOnlyExtremes(stream, m.targetTable,
            m.primaryKeys, m.minColumns, m.maxColumns, checkpoint)
        case "distinct_view" =>
          Sinks.streamDistinctView(stream, m.targetTable, m.primaryKeys,
            m.distinctColumn.get, checkpoint, m.hllM)
        case "quantile_view" =>
          Sinks.streamQuantileView(stream, m.targetTable, m.primaryKeys,
            m.quantileColumn.get, checkpoint)
        case "dedup_store" =>
          val d = m.dedupStore.get
          Sinks.streamDedupStore(stream, m.targetTable, d.idColumn,
            d.textColumn, checkpoint, d.shingleSize, d.numHashes, d.bands,
            d.jaccardPct / 100.0, d.maxBucketSize, d.storeBuckets,
            keeper = d.keeper, qualityCol = d.qualityColumn)
        case "vector_dedup_store" =>
          val v = m.vectorDedupStore.get
          Sinks.streamVectorDedupStore(stream, m.targetTable, v.idColumn,
            v.vectorColumn, v.minScore, checkpoint, v.numCentroids,
            v.nprobe, v.trainIters, v.maxCellSize, keeper = v.keeper)
        case "media_dedup_store" =>
          val d = m.mediaDedupStore.get
          Sinks.streamMediaDedupStore(stream, m.targetTable, d.idColumn,
            d.hashColumn, checkpoint, d.bands, d.maxHamming,
            d.maxBucketSize, d.storeBuckets,
            keeper = d.keeper, qualityCol = d.qualityColumn)
        case "scd2" =>
          Sinks.streamScd2(stream, m.targetTable, m.primaryKeys,
            m.trackedColumns, m.effectiveColumn.get, checkpoint)
      }
      queryId = q.id
      val rows =
        try {
          try q.awaitTermination() finally if (q.isActive) q.stop()
          // the listener bus is ordered: the terminated event arrives
          // after every progress event, so once it lands the count is
          // complete (a zero-batch run posts termination only — 0 rows)
          done.await(60, java.util.concurrent.TimeUnit.SECONDS): Unit
          Option(rowsByQuery.get(q.id)).fold(0L)(_.longValue())
        } finally spark.streams.removeListener(listener)
      if (m.volumeGuardPct > 0)
        graft.dq.VolumeGuard.enforce(spark, meta.auditTable, m.targetTable,
          rows, m.volumeGuardPct)
      meta.updateControl(m.targetTable, s"$layerName.${m.modelId}",
        runDate, rows, "SUCCESS", ConfigJson(m))
      // a zero-batch first run may not have created the table yet
      if (spark.catalog.tableExists(m.targetTable))
        meta.updateDictionary(m.targetTable, m.modelId)
      ((), rows)
    }

  def buildBatch(m: ModelConfig): Unit =
    audit.bracket(layerName, "model", "GoldLayer", m.modelId, m.targetTable) {
      // lazy: a join_view model has no sql_query — its view derives
      // from the base tables, never from a model query
      lazy val sql = EtlConfig.substitute(m.sqlQuery, Map("PROCESSING_DATE" -> runDate))
      lazy val df0 = spark.sql(sql)
      // additive/extremes models skip the audit timestamp: the standing
      // table's schema is (keys, folds, n_rows) and the fold would try
      // to fold timestamps; the control table carries the run bookkeeping
      // (scd2 likewise: its table shape is keys ++ tracked ++ interval
      // columns — an audit timestamp would version itself)
      lazy val df =
        if (m.refreshType == "additive" || m.refreshType == "extremes" ||
          m.refreshType == "scd2" || m.refreshType == "distinct_view" ||
          m.refreshType == "quantile_view" || m.refreshType == "dedup_store" ||
          m.refreshType == "vector_dedup_store" ||
          m.refreshType == "media_dedup_store") df0
        else df0.withColumn("gold_insert_timestamp", current_timestamp())
      spark.sql(s"CREATE DATABASE IF NOT EXISTS ${m.targetTable.split('.').head}")
      // incremental-view-maintenance refreshes: fold THIS RUN's batch
      // frame into the standing table per key — cost rides the batch,
      // never history (the 100 TB gold path). The run DATE is the
      // fold's epoch id, so re-running a date (a retry after a failure,
      // an operator re-trigger) is a NO-OP instead of a double-count —
      // neither fold is idempotent by itself (additive sums; extremes'
      // n_rows). Across DATES the config owes the fold DELTA batches; a
      // full-recompute sql_query fed here double-counts by declaration
      // (documented at the model in configs/). records_processed = the
      // batch frame's rows via an Observation riding the fold's single
      // pass — 0 when the epoch guard skipped (the Observation never
      // ran then and must not be read: it would block forever). One
      // shared helper so the epoch/Observation contract can never
      // diverge between the two fold families (second-review finding).
      def foldCounted(fold: DataFrame => Boolean): Long = {
        val obs = new Observation()
        val folded = fold(df.observe(obs, count(lit(1)).as("rows")))
        if (folded) obs.get("rows").asInstanceOf[Long] else 0L
      }
      lazy val epoch = java.time.LocalDate.parse(runDate).toEpochDay
      val rows =
        if (m.refreshType == "join_view") {
          // incremental JOIN view: fold this run's base-table deltas
          // through the delta rule instead of re-joining full bases.
          // The gold layer runs AFTER silver appended today's rows, so
          // this is the POST-APPEND sequencing (basesIncludeBatches) —
          // the batch queries re-select exactly the rows this run added
          val obsL = new Observation()
          val obsR = new Observation()
          def batch(q: String, obs: Observation) =
            spark.sql(EtlConfig.substitute(q, Map("PROCESSING_DATE" -> runDate)))
              .observe(obs, count(lit(1)).as("rows"))
          val lb = m.leftBatchSql.map(batch(_, obsL))
          val rb = m.rightBatchSql.map(batch(_, obsR))
          val existed = spark.catalog.tableExists(m.targetTable)
          val folded = graft.io.Maintenance.maintainJoinView(spark,
            m.targetTable, m.leftTable.get, m.rightTable.get, m.joinKeys,
            lb, rb, epochId = Some(epoch), basesIncludeBatches = true)
          // creation joins the bases wholesale — the batch frames were
          // never consumed, so their Observations must not be read
          if (!folded || !existed) 0L
          else lb.map(_ => obsL.get("rows").asInstanceOf[Long]).getOrElse(0L) +
            rb.map(_ => obsR.get("rows").asInstanceOf[Long]).getOrElse(0L)
        } else if (m.refreshType == "additive") {
          foldCounted(batch => graft.io.Maintenance.maintainAdditiveAggregate(
            spark, m.targetTable, batch, m.primaryKeys, m.sumColumns,
            epochId = Some(epoch)))
        } else if (m.refreshType == "extremes") {
          // insert-only MIN/MAX fold (least/greatest per key). The
          // INSERT-ONLY feed contract is declared at the config
          // (parseModel) — a retraction can strand a stale extreme,
          // which is exactly the wholesale recompute this path avoids
          foldCounted(batch => graft.io.Maintenance.maintainInsertOnlyExtremes(
            spark, m.targetTable, batch, m.primaryKeys, m.minColumns,
            m.maxColumns, epochId = Some(epoch)))
        } else if (m.refreshType == "quantile_view") {
          // per-key HDR bucket counts; counts ADD, so the run date is
          // the epoch fence exactly as for additive/extremes
          foldCounted(batch => graft.io.Maintenance.maintainQuantileView(
            spark, m.targetTable, batch, m.primaryKeys,
            m.quantileColumn.get, epochId = Some(epoch)))
        } else if (m.refreshType == "distinct_view") {
          // per-key HLL registers max-merge the batch in; no epoch
          // fence — max is idempotent, so replays/out-of-order runs
          // converge by algebra (see Maintenance.maintainDistinctView,
          // which returns true always: the fence-free family never
          // skips — foldCounted keeps the Observation contract shared)
          foldCounted(batch => graft.io.Maintenance.maintainDistinctView(
            spark, m.targetTable, batch, m.primaryKeys,
            m.distinctColumn.get, m.hllM))
        } else if (m.refreshType == "dedup_store") {
          // standing cross-corpus dedup store: the batch's survivor
          // band rows APPEND (state grows with the deduped corpus, so
          // appends are not idempotent) — the run date is the epoch
          // fence exactly as for additive/extremes. NOT foldCounted:
          // maintain persists the batch subtree internally, and in
          // Spark 4.1 a query over that cache poisons any outside
          // Observation with Row.empty (see DedupStore.FoldResult),
          // so the fold reports its own batch count
          val d = m.dedupStore.get
          graft.io.DedupStore.maintain(
            spark, m.targetTable, df, d.idColumn, d.textColumn,
            d.shingleSize, d.numHashes, d.bands, d.jaccardPct / 100.0,
            maxBucketSize = d.maxBucketSize, storeBuckets = d.storeBuckets,
            epochId = Some(epoch), keeper = d.keeper,
            qualityCol = d.qualityColumn).batchRows
        } else if (m.refreshType == "vector_dedup_store") {
          // embedding twin of dedup_store: same epoch fence, same
          // self-reported batch count (maintain persists the batch's
          // code frame — the Observation caveat applies identically)
          val v = m.vectorDedupStore.get
          graft.io.VectorDedupStore.maintain(
            spark, m.targetTable, df, v.idColumn, v.vectorColumn,
            v.minScore, v.numCentroids, v.nprobe, v.trainIters,
            v.maxCellSize, epochId = Some(epoch),
            keeper = v.keeper).batchRows
        } else if (m.refreshType == "media_dedup_store") {
          // perceptual-hash twin of dedup_store: the batch frame is
          // (id, dHash) rows — hashes computed upstream, payloads
          // never enter the store path. Same epoch fence, same
          // self-reported count (maintain persists the banded frame)
          val d = m.mediaDedupStore.get
          graft.io.MediaDedupStore.maintain(
            spark, m.targetTable, df, d.idColumn, d.hashColumn,
            d.bands, d.maxHamming, maxBucketSize = d.maxBucketSize,
            storeBuckets = d.storeBuckets,
            epochId = Some(epoch), keeper = d.keeper,
            qualityCol = d.qualityColumn).batchRows
        } else if (m.refreshType == "scd2") {
          // type-2 dimension fold: close + open version rows per key
          // (graft.io.Scd2). No epoch fence needed — the merge is
          // naturally idempotent (replaying the latest batch is a
          // bit-identical no-op) and an out-of-order backfill fails
          // loudly inside the merge itself. records_processed = the
          // batch's raw rows, the upsert family's contract.
          graft.io.Scd2.merge(spark, m.targetTable, df, m.primaryKeys,
            m.trackedColumns, m.effectiveColumn.get).rawRows
        } else if (m.refreshType == "incremental" && m.primaryKeys.nonEmpty
          && spark.catalog.tableExists(m.targetTable)) {
          // records_processed = this batch's deduped source rows (counted
          // by an Observation riding the staging write inside the upsert),
          // NOT post-merge target cardinality — no target re-scan
          Upsert.upsertTable(spark, m.targetTable, df, m.primaryKeys)
        } else {
          writeCounted(df, Sinks.overwrite(_, m.targetTable, m.partitionBy))
        }
      // trend gate BEFORE this run's SUCCESS lands anywhere: a breach
      // throws here, so per-item isolation records an ERROR audit row
      // and neither the control watermark nor the history advances.
      // DETECTION, not rollback — the model's write has already
      // happened (rows is its Observation); the failed run stops the
      // watermark and downstream trust, and a same-date retry re-runs
      // the model (every refresh type is same-date idempotent)
      if (m.volumeGuardPct > 0)
        graft.dq.VolumeGuard.enforce(spark, meta.auditTable, m.targetTable,
          rows, m.volumeGuardPct)
      // control key is model-qualified: two gold models writing the
      // SAME table (a full view + a fold over it, say) each keep their
      // own watermark row — (table_name, "gold") alone clobbers
      meta.updateControl(m.targetTable, s"$layerName.${m.modelId}",
        runDate, rows, "SUCCESS", ConfigJson(m))
      meta.updateDictionary(m.targetTable, m.modelId)
      ((), rows)
    }
}

/** Maintenance: the declarative ops plane (the reference runs its
  * maintenance inside `run_etl_pipeline.py` next to the layers; here
  * each task is YAML-declared and gets the SAME treatment as a data
  * step — `enabled` gating, per-item error isolation, audit
  * bracketing, and a control row whose `records_processed` carries the
  * task's natural cardinality: files after a compact, manifest rows
  * after a zone-map rebuild, staging roots removed by a vacuum).
  * Runs AFTER gold by default, so the day's fold output (e.g. the
  * dedup stores' per-fold file growth) is what gets compacted.
  */
class MaintenanceLayer(spark: SparkSession, config: EtlConfig,
    meta: MetadataManager, audit: AuditLogger, runDate: String)
  extends Layer(spark, meta, audit) {

  val layerName = "maintenance"

  /** Set when any earlier task in THIS run failed. vacuum_staging is
    * gated on it: the `__*_stage` roots it sweeps are the crash copies
    * of the staged rewrites (prune_store/retrain_store/compact), and
    * per-item isolation CATCHES a failed rewrite — so without the gate
    * a vacuum declared after a failed prune would delete the only
    * complete copy of a store whose destructive rewrite died half-way.
    * The run-order contract ("sweep only after this run's rewrites
    * succeeded") must therefore hold against caught failures, not just
    * whole-process crashes (advice-caught).
    */
  private var priorFailure = false

  private lazy val statsLog =
    org.slf4j.LoggerFactory.getLogger(classOf[MaintenanceLayer])

  def run(): LayerReport = {
    priorFailure = false
    runAll[MaintenanceTaskConfig](config.maintenance, _.taskId, _.enabled) { t =>
      try exec(t)
      catch { case e: Throwable => priorFailure = true; throw e }
    }
  }

  def exec(t: MaintenanceTaskConfig): Unit = {
    val target = t.table.getOrElse("(warehouse staging)")
    audit.bracket(layerName, t.taskType, "MaintenanceLayer", t.taskId, target) {
      val n: Long = t.taskType match {
        case "compact" =>
          val (_, after) = graft.io.Maintenance.compact(spark, t.table.get,
            t.targetRowsPerFile, t.clusterBy)
          after.toLong
        case "zone_maps" =>
          // incremental: only files not yet in the manifest re-scan,
          // so the nightly task's cost rides the day's appends;
          // records_processed stays the manifest's row count
          val (_, _, rows) = graft.io.ZoneMaps.refreshManifest(spark,
            t.table.get, t.columns)
          rows
        case "vacuum_staging" =>
          // refuse (recorded as this task FAILING, never silently
          // skipped) when an earlier task in this run failed: the
          // staging roots may be the only complete copy of that task's
          // half-applied rewrite
          if (priorFailure) throw new IllegalStateException(
            "vacuum_staging refused: an earlier maintenance task in this " +
              "run failed, and the __*_stage roots may hold the only " +
              "complete copy of its staged rewrite — resolve the failure " +
              "and re-run before sweeping staging")
          graft.io.Maintenance.vacuumStaging(spark).toLong
        case "prune_store" =>
          // records_processed = rows deleted (the task's natural
          // cardinality; kept mass is readable off the table itself)
          graft.io.Maintenance.pruneStore(spark, t.table.get,
            t.keepEpochs)._1
        case "retrain_store" =>
          // records_processed = rows whose home cell MOVED (the
          // drift the retrain corrected; total mass is the table's).
          // spread_threshold_permille > 0 gates the store-linear
          // k-means on the occupancy spread (store_stats' number)
          graft.io.VectorDedupStore.retrain(spark, t.table.get,
            t.trainIters,
            if (t.numCentroids > 0) Some(t.numCentroids) else None,
            t.spreadThresholdPermille).moved
        case "store_stats" =>
          // records_processed = the occupancy SPREAD in permille
          // (1000 = balanced) — the retrain/prune-cadence signal,
          // trended in the control table run over run. Dispatches on
          // the store family's own schema: vector stores profile
          // per-cell (the retrain signal), banded text/media stores
          // per (band_idx, band_key) bucket (the maxBucketSize-tuning
          // signal); max_cell_size is the hot-count cap for both.
          // The FULL profile (review-caught: the hot counts are the
          // actionable half and were silently dropped) is logged —
          // WARN when hot exclusions exist (each one is probe mass
          // being silenced TODAY), INFO otherwise
          require(spark.catalog.tableExists(t.table.get),
            s"store_stats: no such table '${t.table.get}'")
          val cols = spark.table(t.table.get).columns.toSet
          val spread = if (cols.contains("cell")) {
            val s = graft.io.VectorDedupStore.occupancyStats(spark,
              t.table.get, t.maxCellSize)
            val msg = s"store_stats '${t.taskId}' (${t.table.get}): $s"
            if (s.hotCells > 0L) statsLog.warn(msg) else statsLog.info(msg)
            s.spreadPermille
          } else {
            val s = graft.io.DedupStore.bandOccupancyStats(spark,
              t.table.get, t.maxCellSize)
            val msg = s"store_stats '${t.taskId}' (${t.table.get}): $s"
            if (s.hotBuckets > 0L) statsLog.warn(msg) else statsLog.info(msg)
            s.spreadPermille
          }
          // spread_trend_pct > 0 closes the signal-to-action loop
          // (round-19 verdict item 7): judge today's spread against
          // THIS task's own trailing audit medians — a jump means the
          // occupancy profile moved (hot band forming, skewed crawl)
          // and fails the task loudly, the way the vector store's
          // spread_threshold_permille already gates retrain. Checked
          // BEFORE this run's row lands, so today's anomaly can never
          // vote in its own baseline.
          if (t.spreadTrendPct > 0)
            graft.dq.VolumeGuard.enforceMetric(spark, meta.auditTable,
              t.table.get, "store_stats", t.taskId, spread,
              t.spreadTrendPct)
          spread
      }
      // control rows upsert on (table_name, layer): task-qualify the
      // layer so two tasks on the SAME table (compact + zone_maps is
      // the normal pairing) keep their own rows instead of clobbering
      meta.updateControl(target, s"$layerName.${t.taskId}", runDate, n,
        "SUCCESS", ConfigJson(t))
      ((), n)
    }
  }
}
