package graft.dq

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VolumeGuardSpec extends SparkSpec {
  import spark.implicits._

  private val audit = "vg_test.audit"

  /** Seed an audit table with SUCCESS rows (ts ascending in `rows`
    * order) plus noise rows the guard must ignore.
    */
  private def seed(rowCounts: Seq[Long], target: String = "g.t"): Unit = {
    spark.sql("CREATE DATABASE IF NOT EXISTS vg_test")
    spark.sql(s"DROP TABLE IF EXISTS $audit")
    val ok = rowCounts.zipWithIndex.map { case (n, i) =>
      (target, "gold", "SUCCESS", n,
        s"2024-01-${"%02d".format(i + 1)} 00:00:00", s"log-${"%03d".format(i)}")
    }
    val noise = Seq(
      (target, "gold", "ERROR", 0L, "2024-01-20 00:00:00", "log-e"),
      (target, "gold", "STARTED", 0L, "2024-01-21 00:00:00", "log-s"),
      ("other.t", "gold", "SUCCESS", 999999L, "2024-01-22 00:00:00", "log-o"),
      // the maintenance plane writes SUCCESS rows for the SAME target
      // whose rows_processed is a FILE count — one per recent day here,
      // enough to capture the window and halve the median if counted
      (target, "maintenance", "SUCCESS", 2L, "2024-01-23 00:00:00", "log-m1"),
      (target, "maintenance", "SUCCESS", 2L, "2024-01-24 00:00:00", "log-m2"),
      (target, "maintenance", "SUCCESS", 2L, "2024-01-25 00:00:00", "log-m3"))
    (ok ++ noise)
      .toDF("target_table", "layer", "status", "rows_processed", "ts_s", "log_id")
      .withColumn("event_timestamp", to_timestamp(col("ts_s"))).drop("ts_s")
      .write.mode("overwrite").saveAsTable(audit)
  }

  test("insufficient history passes — a new model must not fail its first runs") {
    seed(Seq(100L, 110L))
    val v = VolumeGuard.check(spark, audit, "g.t", 5L, tolerancePct = 50)
    assert(!v.breach && v.median.isEmpty && v.historyRuns == 2, v)
  }

  test("a volume collapse breaches; a similar volume passes; the baseline is the median") {
    // one historic outlier (9000) must not poison the expectation
    seed(Seq(100L, 9000L, 110L, 95L, 105L))
    assert(!VolumeGuard.check(spark, audit, "g.t", 120L, 50).breach)
    val v = VolumeGuard.check(spark, audit, "g.t", 3L, 50)
    assert(v.breach && v.median.contains(105L), v)
    val up = VolumeGuard.check(spark, audit, "g.t", 9000L, 50)
    assert(up.breach, "a 85x surge is as anomalous as a collapse")
    val e = intercept[IllegalStateException] {
      VolumeGuard.enforce(spark, audit, "g.t", 3L, 50)
    }
    assert(e.getMessage.contains("volume anomaly"), e.getMessage)
  }

  test("zero observed rows pass — the epoch fence's legitimate no-op signature") {
    seed(Seq(100L, 110L, 95L))
    assert(!VolumeGuard.check(spark, audit, "g.t", 0L, 50).breach)
  }

  test("the trailing window forgets ancient scale changes") {
    // 3 ancient huge runs, then 7 recent small ones: the window keeps
    // only the recent regime, so a small observation passes
    seed(Seq(100000L, 110000L, 90000L) ++ Seq.fill(7)(100L))
    val v = VolumeGuard.check(spark, audit, "g.t", 95L, 50, window = 7)
    assert(!v.breach && v.median.contains(100L), v)
  }

  test("noise rows never count: ERROR/STARTED, other targets, and maintenance are invisible") {
    // the seed plants three NEWER maintenance SUCCESS rows (file counts
    // of 2) for this exact target: if the layer filter were missing,
    // they would enter the 7-row window, drag the median to 2, and the
    // honest 100-row run below would BREACH — the review-found
    // cross-plane poisoning this pins against
    seed(Seq(100L, 100L, 100L))
    val v = VolumeGuard.check(spark, audit, "g.t", 100L, 50)
    assert(v.historyRuns == 3, s"only this target's data-layer rows: $v")
    assert(!v.breach && v.median.contains(100L), v)
  }

  /** Seed for the METRIC trend series (checkMetric): maintenance-plane
    * store_stats rows qualified by operation + source_id, plus rows a
    * metric window must NOT see — another task profiling the same
    * table, the data plane's volume rows, and non-SUCCESS noise.
    */
  private def seedMetric(spreads: Seq[Long], target: String = "g.store",
      sid: String = "stats1"): Unit = {
    spark.sql("CREATE DATABASE IF NOT EXISTS vg_test")
    spark.sql(s"DROP TABLE IF EXISTS $audit")
    val ok = spreads.zipWithIndex.map { case (n, i) =>
      (target, "maintenance", "store_stats", sid, "SUCCESS", n,
        s"2024-01-${"%02d".format(i + 1)} 00:00:00", s"log-${"%03d".format(i)}")
    }
    val noise = Seq(
      // another store_stats task on the SAME table (different series)
      (target, "maintenance", "store_stats", "other_task", "SUCCESS",
        99999L, "2024-01-20 00:00:00", "log-x1"),
      // a compact on the same table (file counts, not spreads)
      (target, "maintenance", "compact", sid, "SUCCESS", 2L,
        "2024-01-21 00:00:00", "log-x2"),
      // the data plane's own volume rows for this table
      (target, "gold", "refresh", sid, "SUCCESS", 500000L,
        "2024-01-22 00:00:00", "log-x3"),
      (target, "maintenance", "store_stats", sid, "ERROR", 0L,
        "2024-01-23 00:00:00", "log-x4"))
    (ok ++ noise)
      .toDF("target_table", "layer", "operation", "source_id", "status",
        "rows_processed", "ts_s", "log_id")
      .withColumn("event_timestamp", to_timestamp(col("ts_s"))).drop("ts_s")
      .write.mode("overwrite").saveAsTable(audit)
  }

  test("checkMetric: a spread jump breaches vs the task's OWN series; siblings invisible") {
    // series 3000/3100/2900 (median 3000) with a 99999-spread sibling
    // task, a file-count compact, and a 500k-row data-plane row all
    // planted NEWER — any filter miss would poison the median wildly
    seedMetric(Seq(3000L, 3100L, 2900L))
    val ok = VolumeGuard.checkMetric(spark, audit, "g.store",
      "store_stats", "stats1", observed = 3200L, tolerancePct = 50)
    assert(ok.historyRuns == 3 && ok.median.contains(3000L) && !ok.breach, ok)
    val jump = VolumeGuard.checkMetric(spark, audit, "g.store",
      "store_stats", "stats1", observed = 9000L, tolerancePct = 50)
    assert(jump.breach, jump)
    val e = intercept[IllegalStateException] {
      VolumeGuard.enforceMetric(spark, audit, "g.store", "store_stats",
        "stats1", 9000L, 50)
    }
    assert(e.getMessage.contains("trend anomaly") &&
      e.getMessage.contains("spread_trend_pct"), e.getMessage)
  }

  test("checkMetric: insufficient history and zero observations pass like check's") {
    seedMetric(Seq(3000L, 3100L))
    assert(!VolumeGuard.checkMetric(spark, audit, "g.store", "store_stats",
      "stats1", 9000L, 50).breach, "2 runs < minHistory must pass")
    seedMetric(Seq(3000L, 3100L, 2900L))
    assert(!VolumeGuard.checkMetric(spark, audit, "g.store", "store_stats",
      "stats1", 0L, 50).breach, "an empty store's 0 spread is not a trend")
  }
}
