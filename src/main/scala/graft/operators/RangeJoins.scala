package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range joins as bin-bucketed EQUI joins (reference
  * scope: none — beyond-reference, SURVEY §2.13). The naive spelling
  * (`p.d >= iv.start AND p.d < iv.end`, no equality) plans as a
  * broadcast-nested-loop — probe × interval comparisons, the classic
  * silent scale-killer. Binning restores a hash-joinable key: each
  * interval registers in every fixed-width bin it overlaps, each probe
  * point hashes to exactly one bin, and the true range predicate
  * becomes a post-join FILTER on a candidate set that is
  * coverage-exact by construction.
  */
object RangeJoins {

  /** Join `probe` rows (a date column) to the `intervals` rows
    * (half-open `[startCol, endCol)` date ranges) they fall inside,
    * optionally under extra equality keys shared by both frames
    * (`eqKeys` — a tenant/region/entity scope). Returns the matched
    * pairs with all columns of both frames (probe's scope columns
    * deduplicated), exactly one output row per true (probe, interval)
    * containment — a probe point lies in ONE bin, so the bin join can
    * never duplicate a match.
    *
    * `binDays` trades replication for candidate precision: an interval
    * lands in ceil(len/bin)+1 bins (longer bins = fewer interval
    * copies, more false candidates for the filter to drop). Intervals
    * longer than `maxBins` bins fail LOUDLY executor-side
    * (`raise_error` in the generator, never a driver collect) — one
    * unbounded interval would otherwise replicate across the whole
    * calendar, the generation-side analog of [[Dedup]]'s
    * `maxBucketSize` fan-out bombs.
    *
    * Scale shape: intervals explode map-side into (scope, bin) keyed
    * copies; the join is a plain hash equi-join on `eqKeys :+ bin`
    * (AQE free to broadcast a dimension-sized interval set), and the
    * residual containment filter fuses into the join's output
    * projection. Cost rides Σ bins(interval) + candidate pairs — never
    * probe × intervals.
    */
  def pointInInterval(probe: DataFrame, intervals: DataFrame,
      eqKeys: Seq[String], pointCol: String, startCol: String,
      endCol: String, binDays: Int = 32, maxBins: Int = 4096): DataFrame = {
    require(binDays >= 1, s"binDays must be >= 1, got $binDays")
    val missP = (eqKeys :+ pointCol).filterNot(probe.columns.contains)
    val missI = (eqKeys :+ startCol :+ endCol)
      .filterNot(intervals.columns.contains)
    require(missP.isEmpty, s"probe lacks columns: ${missP.mkString(",")}")
    require(missI.isEmpty, s"intervals lack columns: ${missI.mkString(",")}")
    def binOf(d: Column): Column =
      floor(datediff(d, lit("1970-01-01")) / binDays)
    // half-open end: the last covered day is end − 1; an empty interval
    // (end <= start) generates no bins and therefore never matches
    val lo = binOf(col(startCol))
    val hi = binOf(date_sub(col(endCol), 1))
    val nb = hi - lo + 1
    val binned = intervals
      // drop empties BEFORE the generator: sequence(lo, hi) with
      // hi < lo would count DOWN, not emit nothing
      .filter(col(endCol) > col(startCol))
      .withColumn("_bin", explode(sequence(lo,
        when(nb > maxBins, raise_error(concat(
          lit(s"[rangeJoin] interval spans more than maxBins=$maxBins " +
            s"bins of $binDays days: "),
          col(startCol), lit(" .. "), col(endCol))))
          .otherwise(hi))))
    probe.withColumn("_bin", binOf(col(pointCol)))
      .join(binned, eqKeys :+ "_bin")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("_bin")
  }
}
