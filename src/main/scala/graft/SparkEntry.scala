package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every [[graft.queries.QuerySet]]: the operator-parity
  * relational library, the DQ-rule queries, the text/dedup/vector
  * pipeline operators, and the events (streaming-analog) queries.
  */
object SparkEntry {

  private val sets: Seq[QuerySet] =
    Seq(Relational, TextQueries, EventQueries, DedupQueries, VectorQueries,
      ExtendedQueries, TemporalQueries, SketchQueries, SeriesQueries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    sets.flatMap(_.entries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    sets.flatMap(_.oracles).toMap
}
