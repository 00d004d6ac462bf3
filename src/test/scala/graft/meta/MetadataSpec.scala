package graft.meta

import java.sql.Timestamp
import graft.SparkSpec

/** Deterministic clock for reproducible metadata rows. The uuid embeds
  * `start` so two FixedClock instances with different epochs never
  * collide on run_id (the audit table persists across tests).
  */
class FixedClock(start: Long = 1700000000000L) extends IdClock {
  private var t = start
  private var n = 0
  def now(): Timestamp = { t += 1000; new Timestamp(t) }
  def uuid(): String =
    { n += 1; f"00000000-0000-0000-${(start / 100000000L) % 10000}%04d-${n}%012d" }
}

class MetadataSpec extends SparkSpec {

  lazy val meta = new MetadataManager(spark, db = "metadata_test",
    clock = new FixedClock())

  test("init is create-if-absent, not drop-recreate") {
    meta.init()
    meta.updateControl("bronze.t1", "bronze", "2024-01-01", 10, "SUCCESS")
    meta.init() // reference wiped history here; we must not
    assert(spark.table(meta.controlTable).count() == 1)
  }

  test("control upsert replaces by (table_name, layer) key") {
    meta.init()
    meta.updateControl("bronze.t2", "bronze", "2024-01-01", 10, "SUCCESS")
    meta.updateControl("bronze.t2", "bronze", "2024-01-02", 20, "SUCCESS")
    val rows = spark.table(meta.controlTable)
      .filter("table_name = 'bronze.t2'").collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[String]("last_run_date") == "2024-01-02")
    assert(rows.head.getAs[Long]("records_processed") == 20L)
  }

  test("watermark reads last successful run date") {
    meta.init()
    meta.updateControl("silver.t3", "silver", "2024-02-03", 5, "SUCCESS")
    assert(meta.lastRunDate("silver.t3", "silver").contains("2024-02-03"))
    assert(meta.lastRunDate("silver.absent", "silver").isEmpty)
  }

  test("audit bracket records STARTED then SUCCESS with rows") {
    meta.init()
    val audit = new AuditLogger(spark, meta, new FixedClock(1800000000000L))
    val out = audit.bracket("silver", "transform", "Test", "tx1", "silver.t") {
      ("result", 42L)
    }
    assert(out == "result")
    val events = audit.recentEvents().collect()
    assert(events.map(_.getAs[String]("status")).toSet == Set("STARTED", "SUCCESS"))
    assert(events.exists(_.getAs[Long]("rows_processed") == 42L))
  }

  test("audit bracket records ERROR and rethrows") {
    meta.init()
    val audit = new AuditLogger(spark, meta, new FixedClock(1900000000000L))
    intercept[RuntimeException] {
      audit.bracket("gold", "model", "Test", "m1", "gold.t") {
        throw new RuntimeException("boom"); (("x", 0L))
      }
    }
    val statuses = audit.recentEvents().collect().map(_.getAs[String]("status"))
    assert(statuses.contains("ERROR"))
  }

  test("failedEvents returns only this run's ERROR rows") {
    meta.init()
    val audit = new AuditLogger(spark, meta, new FixedClock(2000000000000L))
    audit.bracket("silver", "transform", "Test", "ok1", "silver.ok") {
      ("fine", 1L)
    }
    intercept[RuntimeException] {
      audit.bracket("silver", "transform", "Test", "bad1", "silver.bad") {
        throw new RuntimeException("boom"); (("x", 0L))
      }
    }
    val failed = audit.failedEvents().collect()
    assert(failed.nonEmpty)
    assert(failed.forall(_.getAs[String]("status") == "ERROR"))
    assert(failed.forall(_.getAs[String]("run_id") == audit.runId))
    assert(failed.map(_.getAs[String]("source_id")).toSet == Set("bad1"))
  }

  test("slowestEvents ranks terminal events by duration, excludes STARTED") {
    meta.init()
    val audit = new AuditLogger(spark, meta, new FixedClock(2100000000000L))
    audit.event("silver", "transform", "Test", "fast", "silver.a",
      "SUCCESS", rows = 1, seconds = 0.5)
    audit.event("silver", "transform", "Test", "slow", "silver.b",
      "SUCCESS", rows = 1, seconds = 9.5)
    audit.event("silver", "transform", "Test", "mid", "silver.c",
      "ERROR", error = "x", seconds = 3.0)
    audit.event("silver", "transform", "Test", "pending", "silver.d",
      "STARTED")
    val slow = audit.slowestEvents(2).collect()
    assert(slow.map(_.getAs[String]("source_id")).toSeq == Seq("slow", "mid"))
    assert(slow.forall(_.getAs[String]("status") != "STARTED"))
  }

  test("eventsForTable scopes across runs to one target table") {
    meta.init()
    val a1 = new AuditLogger(spark, meta, new FixedClock(2200000000000L))
    val a2 = new AuditLogger(spark, meta, new FixedClock(2300000000000L))
    a1.event("bronze", "ingest", "Test", "s1", "bronze.shared", "SUCCESS")
    a2.event("bronze", "ingest", "Test", "s2", "bronze.shared", "SUCCESS")
    a2.event("bronze", "ingest", "Test", "s3", "bronze.other", "SUCCESS")
    val rows = a2.eventsForTable("bronze.shared").collect()
    assert(rows.map(_.getAs[String]("run_id")).toSet ==
      Set(a1.runId, a2.runId))
    assert(rows.forall(_.getAs[String]("target_table") == "bronze.shared"))
  }
}
