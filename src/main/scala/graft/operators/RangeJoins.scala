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

  /** Interval×interval OVERLAP join: pairs of a `left` and a `right`
    * interval (half-open `[start, end)` dates, both frames) that share
    * at least one day, under optional equality scope keys. Column name
    * collisions between the two frames are the caller's to avoid
    * (standard join hygiene — rename before calling).
    *
    * The bin trick needs one extra idea here: an overlapping pair
    * shares EVERY bin their intersection touches, so a naive bin join
    * would emit duplicates. The dedup rule is ownership, not DISTINCT
    * (a distinct would shuffle the matched mass a second time): a pair
    * is claimed exactly by the bin containing the intersection's first
    * day, `greatest(left.start, right.start)` — a match surviving the
    * overlap filter always has both sides registered in that bin, and
    * in exactly one bin the equality holds.
    *
    * Same cap (`maxBins`, loud) and scale shape as
    * [[pointInInterval]]: map-side bin replication on both sides, one
    * hash equi-join on `eqKeys :+ bin`, residual predicates fused into
    * the join projection. Cost rides Σ bins + true-overlap candidate
    * mass, never |left|×|right|.
    */
  def intervalOverlap(left: DataFrame, right: DataFrame,
      eqKeys: Seq[String], leftStart: String, leftEnd: String,
      rightStart: String, rightEnd: String, binDays: Int = 32,
      maxBins: Int = 4096): DataFrame = {
    require(binDays >= 1, s"binDays must be >= 1, got $binDays")
    val missL = (eqKeys :+ leftStart :+ leftEnd)
      .filterNot(left.columns.contains)
    val missR = (eqKeys :+ rightStart :+ rightEnd)
      .filterNot(right.columns.contains)
    require(missL.isEmpty, s"left lacks columns: ${missL.mkString(",")}")
    require(missR.isEmpty, s"right lacks columns: ${missR.mkString(",")}")
    def binOf(d: Column): Column =
      floor(datediff(d, lit("1970-01-01")) / binDays)
    def binned(df: DataFrame, st: String, en: String): DataFrame = {
      val lo = binOf(col(st))
      val hi = binOf(date_sub(col(en), 1))
      val nb = hi - lo + 1
      df.filter(col(en) > col(st))
        .withColumn("_bin", explode(sequence(lo,
          when(nb > maxBins, raise_error(concat(
            lit(s"[overlapJoin] interval spans more than maxBins=$maxBins " +
              s"bins of $binDays days: "),
            col(st), lit(" .. "), col(en))))
            .otherwise(hi))))
    }
    binned(left, leftStart, leftEnd)
      .join(binned(right, rightStart, rightEnd), eqKeys :+ "_bin")
      .filter(col(leftStart) < col(rightEnd) &&
        col(rightStart) < col(leftEnd) &&
        binOf(greatest(col(leftStart), col(rightStart))) === col("_bin"))
      .drop("_bin")
  }
}
