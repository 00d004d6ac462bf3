package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The event-analytics additions that need more than the oracle row:
  * e5's scale story is `percentile_approx` (mergeable sketch, no global
  * sort) standing in for the exact sort-based `percentile` — that twin
  * has no oracle, so its error bound against the exact form is pinned
  * here instead.
  */
class EventAnalyticsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("percentile_approx tracks the exact percentile within 5% of range") {
    val ev = graft.Tables.load(spark, dir, "events")
    val rows = ev.groupBy("event_type")
      .agg(expr("percentile(value, array(0.5, 0.95))").as("exact"),
        expr("percentile_approx(value, array(0.5, 0.95), 1000)").as("approx"),
        (max("value") - min("value")).as("range"))
      .select(col("event_type"),
        col("exact").getItem(0).as("e50"), col("approx").getItem(0).as("a50"),
        col("exact").getItem(1).as("e95"), col("approx").getItem(1).as("a95"),
        col("range"))
      .collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val range = r.getAs[Double]("range")
      assert(math.abs(r.getAs[Double]("e50") - r.getAs[Double]("a50")) <= 0.05 * range,
        s"p50 drifted for ${r.getAs[String]("event_type")}")
      assert(math.abs(r.getAs[Double]("e95") - r.getAs[Double]("a95")) <= 0.05 * range,
        s"p95 drifted for ${r.getAs[String]("event_type")}")
    }
  }

  test("pivot with an explicit value list stays a single aggregation job") {
    // the distinct-scan pivot form runs a blocking extra job just to
    // learn the column set; the explicit-list form must plan straight to
    // aggregates with no extra collect
    val p = graft.SparkEntry.queries("e8_pivot_daily")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p.contains("HashAggregate"), p)
    val out = graft.SparkEntry.queries("e8_pivot_daily")(spark, dir).collect()
    assert(out.length == 30) // one row per January day
    // pivoted counts cover every event: column sums equal the row count
    val total = out.map(r => (1 to 5).map(r.getLong).sum).sum
    assert(total == graft.Tables.load(spark, dir, "events").count())
  }
}
