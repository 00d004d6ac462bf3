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
}
