package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-15 rehearsal #2 (round-13 verdict item 8): the INVARIANT-STATE
  * folds' long-horizon claim. The additive/extremes/distinct/quantile
  * views hold keys-bounded state (unlike the append-only dedup stores),
  * so per-fold cost must stay FLAT as folds accumulate — if the 60th
  * fold is slower than the 5th, state is leaking somewhere (table
  * growth, small-file accretion, lineage, caches).
  *
  * Measures 60 same-shape dated folds of a fixed 200k-row batch into an
  * additive view and a quantile view (the two additive-algebra members;
  * extremes/distinct share their plumbing), reporting first-5 vs last-5
  * medians, the drift ratio, and the standing tables' row/file counts.
  *
  * Usage: Test/runMain graft.ProfileR15bScale [folds].
  * Measured numbers recorded in BASELINE.md §round-15.
  */
object ProfileR15bScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        s"${sys.props("user.dir")}/target/r15b-warehouse-${System.nanoTime()}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val folds = args.lift(0).map(_.toInt).getOrElse(60)
    spark.sql("CREATE DATABASE IF NOT EXISTS r15b")

    val batch = spark.range(200000)
      .select((col("id") % 64).as("k"), (col("id") % 1000 + 1).as("v"))

    def series(name: String)(fold: Long => Unit): Unit = {
      val ts = (1 to folds).map { i =>
        val t0 = System.nanoTime()
        fold(i.toLong)
        (System.nanoTime() - t0) / 1e9
      }
      def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
      val first = med(ts.take(5))
      val last = med(ts.takeRight(5))
      println(f"[r15b] $name%-14s first5 $first%6.2f s  last5 $last%6.2f s  " +
        f"drift ${last / first}%5.2f  (claim: ~1.0 — keys-bounded state)")
    }

    spark.sql("DROP TABLE IF EXISTS r15b.add_view")
    series("additive") { i =>
      graft.io.Maintenance.maintainAdditiveAggregate(spark, "r15b.add_view",
        batch, Seq("k"), Seq("v"), epochId = Some(i)): Unit
    }
    val addRows = spark.table("r15b.add_view").count()
    val addFiles = spark.table("r15b.add_view").inputFiles.length
    println(s"[r15b] additive standing table after $folds folds: " +
      s"$addRows rows, $addFiles files (claim: 64 rows, bounded files)")

    spark.sql("DROP TABLE IF EXISTS r15b.q_view")
    series("quantile") { i =>
      graft.io.Maintenance.maintainQuantileView(spark, "r15b.q_view",
        batch.select(col("k"), col("v").as("cents")), Seq("k"), "cents",
        epochId = Some(i)): Unit
    }
    val qRows = spark.table("r15b.q_view").count()
    println(s"[r15b] quantile standing table after $folds folds: " +
      s"$qRows register rows (claim: keys x buckets, fold-count invariant)")
    spark.stop()
  }
}
