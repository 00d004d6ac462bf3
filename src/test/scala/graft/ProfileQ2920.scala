package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off decomposition of the round-10 q2/q9/q20 cost (not part of
  * the library API): times the partsupp synthesis alone, each query as
  * shipped, and candidate rewrites, so the optimization is measured
  * rather than guessed. Results recorded in BASELINE.md §round-10.
  */
object ProfileQ2920 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")

    def time(name: String)(f: => Long): Double = {
      // median of 3
      val ts = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val n = f
        val s = (System.nanoTime() - t0) / 1e9
        (s, n)
      }
      val med = ts.map(_._1).sorted.apply(1)
      println(f"[q2920] $name%-40s $med%8.2f s  (${ts.head._2} rows)")
      med
    }

    // warm
    spark.range(1000).selectExpr("sum(id)").collect()
    SparkEntry.entry(spark).count()

    val qs = SparkEntry.queries
    time("partsupp_distinct_only") {
      Tables.load(spark, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey")).distinct().count()
    }
    time("q2_as_shipped") { qs("q2_min_cost_supplier")(spark, dir).count() }
    time("q9_as_shipped") { qs("q9_nation_profit")(spark, dir).count() }
    time("q20_as_shipped") { qs("q20_excess_stock")(spark, dir).count() }
    spark.stop()
  }
}
