package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named bundle of driver-checkable queries.
  *
  * Each entry is exposed through [[graft.SparkEntry.queries]]; when an
  * equivalent ANSI-SQL formulation exists it is mirrored in `oracles`
  * (run by the driver on DuckDB over the same parquet — SURVEY.md §5.2).
  * Determinism rules used throughout:
  *   - every query ends in a total-order `ORDER BY` (unique key suffix);
  *   - per-row double arithmetic is left unrounded (same IEEE ops on the
  *     same inputs ⇒ bit-identical in both engines);
  *   - aggregated doubles are `round(_, 2)` (summation order differs
  *     between engines, rounding absorbs the ~1e-9 noise);
  *   - integer-valued sums (counts, quantities) need no rounding;
  *   - timestamps are projected via `to_date`/`date_trunc`, never raw
  *     when precision units could differ.
  */
trait QuerySet {
  type Q = (SparkSession, String) => DataFrame
  def entries: Map[String, Q]
  def oracles: Map[String, String]

  /** Deterministic cross-engine rounding — shadows `functions.round`.
    *
    * Spark's `round` converts the double to its shortest decimal string
    * and applies BigDecimal HALF_UP, while DuckDB multiplies in IEEE
    * doubles (`std::round(x*100)/100`); at decimal midpoints (e.g. an
    * AVG of two 2dp prices = x.xx5) the two systematically disagree.
    * `floor(x*10^s + 0.5)/10^s` in pure double math is bit-identical to
    * DuckDB's ROUND for non-negative values; for possibly-negative
    * columns the oracle SQL spells the same FLOOR formula.
    */
  protected def round(c: org.apache.spark.sql.Column, scale: Int): org.apache.spark.sql.Column = {
    val f = math.pow(10, scale)
    org.apache.spark.sql.functions.floor(c * f + 0.5) / f
  }
}
