package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Calendar-spine resampling for keyed daily series (reference scope:
  * none — beyond-reference, SURVEY §2.13). The gap between "events
  * recorded on the days they happened" and "a dense series a forecast,
  * SLA report, or training-feature join can consume" is the single most
  * common time-series prep step: generate the missing days and carry
  * the last observation forward.
  */
object TimeSeries {

  /** Densify each key's daily series over its own [min, max] date range
    * and forward-fill the given value columns across the generated
    * gaps. Emitted per (key, day): the observed columns (NULL on gap
    * days), a `<c>_filled` twin per value column carrying the most
    * recent non-null observation at or before that day, and `is_gap`
    * (1 on generated days, 0 on observed ones).
    *
    * Each key's spine starts at ITS OWN first observation, so a filled
    * column is never NULL-leading (there is always an observation at or
    * before every spine day) — the operator does not invent values
    * before a series begins, and series of one day emit one row.
    *
    * Scale shape: the spine is generated MAP-SIDE from each key's
    * 1-row (min, max) bounds (`sequence` + `explode` — never a
    * driver-side calendar, never a cross join against a date dimension),
    * sized by the true output mass Σ span_days(key). The observations
    * join back on (key, day) — an equi hash join — and the fill is one
    * running `last(ignoreNulls)` window per key, partitioned on the
    * SAME key the join just shuffled on. Skew rides the longest single
    * span, not the corpus; `maxSpanDays` bounds that too: a key whose
    * range exceeds it fails loudly (executor-side `raise_error`, never
    * a driver collect) rather than silently materializing a mega-spine
    * — the [[Dedup]] `maxBucketSize` discipline applied to row
    * GENERATION instead of join fan-out.
    */
  def gapFillForward(daily: DataFrame, keys: Seq[String], dateCol: String,
      valueCols: Seq[String], maxSpanDays: Int = 36500): DataFrame = {
    require(keys.nonEmpty, "need at least one key column")
    require(valueCols.nonEmpty, "need at least one value column to fill")
    val missing = (keys :+ dateCol).filterNot(daily.columns.contains) ++
      valueCols.filterNot(daily.columns.contains)
    require(missing.isEmpty, s"columns not in frame: ${missing.mkString(",")}")
    val k = keys.map(col)
    // the input feeds two plan instances (the bounds aggregate and the
    // spine join-back) — persist so the caller's upstream pipeline
    // materializes once, not per branch
    val obs = FrameCaches.track(daily.persist())
    val span = datediff(col("_mx"), col("_mn"))
    val bounds = obs.groupBy(k: _*)
      .agg(min(col(dateCol)).as("_mn"), max(col(dateCol)).as("_mx"))
      .withColumn("_mx",
        when(span > maxSpanDays, raise_error(concat(
          lit(s"[gapFill] key span exceeds maxSpanDays=$maxSpanDays: "),
          concat_ws(",", k: _*), lit(" spans "), span, lit(" days"))))
          .otherwise(col("_mx")))
    val spine = bounds.select(k :+
      explode(sequence(col("_mn"), col("_mx"), expr("interval 1 day")))
        .as(dateCol): _*)
    val w = Window.partitionBy(k: _*).orderBy(col(dateCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // presence marker, not value-nullness: an OBSERVED row whose value
    // column happens to be NULL is still an observation, not a gap
    val joined = spine
      .join(obs.withColumn("_present", lit(1)), keys :+ dateCol, "left")
    valueCols.foldLeft(
      joined.withColumn("is_gap",
        when(col("_present").isNull, lit(1)).otherwise(lit(0)))) {
      case (df, c) =>
        df.withColumn(s"${c}_filled", last(col(c), ignoreNulls = true).over(w))
    }.drop("_present")
  }
}
