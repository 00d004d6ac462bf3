package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Temporal joins Spark lacks as built-ins — as-of and bounded-range —
  * composed from built-in operators (SURVEY.md §7.5 preference (a):
  * compose before custom plans).
  *
  * As-of: the union + carry-forward-window formulation — both sides
  * shuffle ONCE on the key and sort within partitions, which is exactly
  * the sort-merge-as-of physical shape a custom SparkPlan would
  * implement, with no new operator surface to maintain.
  *
  * Range: bucketized equi-join — time is quantized to the window width
  * so candidates co-locate in (key, bucket) hash partitions, then the
  * exact predicate filters. Never degrades to BroadcastNestedLoop /
  * cartesian like a naive inequality join would at scale.
  */
object TemporalJoins {

  /** For each left row (identified by unique `leftId`), find the
    * greatest `rightTsUs` (epoch micros) ≤ `leftTsUs` within the same
    * `key` — the matching timestamp of an as-of join. Rows with no
    * match are dropped (inner as-of). Payload columns come from joining
    * back on (key, matched ts) — resolve same-ts ties with an aggregate.
    */
  def asofMatchTs(left: DataFrame, right: DataFrame, key: String,
      leftId: String, leftTsUs: Column, rightTsUs: Column): DataFrame = {
    val l = left.select(col(key), leftTsUs.as("_us"),
      col(leftId).as("_lid"), lit(1).as("_isLeft"))
    val r = right.select(col(key), rightTsUs.as("_us"),
      lit(null).cast(l.schema("_lid").dataType).as("_lid"),
      lit(0).as("_isLeft"))
    // right rows sort before left rows at equal ts ⇒ "≤" semantics
    val w = Window.partitionBy(key)
      .orderBy(col("_us"), col("_isLeft"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("_matched_us",
        last(when(col("_isLeft") === 0, col("_us")), ignoreNulls = true).over(w))
      .filter(col("_isLeft") === 1 && col("_matched_us").isNotNull)
      .select(col(key), col("_lid").as(leftId), col("_us"), col("_matched_us"))
  }

  /** Forward as-of: for each left row, the SMALLEST `rightTsUs` ≥
    * `leftTsUs` within the key — "the next event at or after" (the
    * conversion-attribution direction, where [[asofMatchTs]] is the
    * state-lookup direction). Implemented by time reversal: negate both
    * timestamp columns and the backward match's "greatest ≤" becomes
    * exactly "smallest ≥" — one sign flip instead of a second
    * window formulation to keep correct (equal-ts matching carries
    * over: ties still match). Same single-shuffle shape.
    */
  def asofMatchTsForward(left: DataFrame, right: DataFrame, key: String,
      leftId: String, leftTsUs: Column, rightTsUs: Column): DataFrame =
    asofMatchTs(left, right, key, leftId, -leftTsUs, -rightTsUs)
      .select(col(key), col(leftId),
        (-col("_us")).as("_us"), (-col("_matched_us")).as("_matched_us"))

  /** Bounded-staleness as-of: [[asofMatchTs]] restricted to matches at
    * most `maxLagUs` old — "the most recent state, unless it has gone
    * stale" (the sensor-readout / feature-freshness contract; an
    * unbounded as-of happily joins a year-old purchase to today's
    * error). Left rows whose best match is older than the bound drop
    * like unmatched rows (inner semantics). Composition, not a new
    * window: the lag filter runs AFTER the carry-forward resolves, so
    * it cannot un-hide an older in-window match — "most recent, if
    * fresh", not "most recent fresh" (that distinction is the
    * semantics every feature store documents; the spec pins it).
    */
  def asofMatchTsWithin(left: DataFrame, right: DataFrame, key: String,
      leftId: String, leftTsUs: Column, rightTsUs: Column,
      maxLagUs: Long): DataFrame = {
    require(maxLagUs >= 0, s"maxLagUs must be >= 0, got $maxLagUs")
    asofMatchTs(left, right, key, leftId, leftTsUs, rightTsUs)
      .filter(col("_us") - col("_matched_us") <= maxLagUs)
  }

  /** Pairs (l, r) with the same `key` and `rightTsUs - leftTsUs` in
    * [0, windowUs]: bucket both sides by `windowUs`, join each left
    * bucket to right buckets {b, b+1}, then apply the exact bound.
    */
  def rangeJoinPairs(left: DataFrame, right: DataFrame, key: String,
      leftTsUs: Column, rightTsUs: Column, windowUs: Long): DataFrame = {
    // integer division — epoch micros would lose precision through
    // double division at the edge of 2^53
    val l = left.withColumn("_lus", leftTsUs)
      .withColumn("_lb", expr(s"_lus DIV $windowUs"))
      .withColumn("_jb", explode(array(col("_lb"), col("_lb") + 1)))
    val r = right.withColumn("_rus", rightTsUs)
      .withColumn("_rb", expr(s"_rus DIV $windowUs"))
    l.join(r, l(key) === r(key) && col("_jb") === col("_rb"))
      .filter(col("_rus") >= col("_lus")
        && col("_rus") - col("_lus") <= windowUs)
      .drop("_lb", "_jb", "_rb")
  }
}
