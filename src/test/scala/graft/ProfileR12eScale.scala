package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-12 scale rehearsal, sixth batch (not part of the library
  * API): the dp9/w10/v15 driver rows measured at N× mass.
  *
  * Growth models (each states WHAT the cost should ride):
  * - dp9 correlation: lineitem rows replicate N× verbatim — the five
  *   normal-equation sums ride scan mass through one map-side-combined
  *   aggregate. Expected ≈ 1 with the scan floor amortizing.
  * - w10 running distinct: events replicate N× with FRESH user_ids —
  *   the first-occurrence aggregate (the heavy stage) grows N×, the
  *   daily frame and the window stay calendar-bounded. Expected ≈ 1.
  * - v15 recall eval: embeddings replicate N× with fresh vec_ids,
  *   queries and centroids fixed — brute force rides corpus × queries,
  *   the IVF side rides cell-candidate mass, both N×. Expected ≈ 1.
  *
  * Usage: Test/runMain graft.ProfileR12eScale [mult] [sfDir].
  * Measured numbers recorded in BASELINE.md §round-12.
  */
object ProfileR12eScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val mult = args.lift(0).map(_.toInt).getOrElse(10)
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")

    def time(name: String)(f: => Long): Double = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        graft.operators.FrameCaches.release(spark)
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val med = ts.map(_._1).sorted.apply(1)
      println(f"[r12e-scale] $name%-28s $med%8.2f s  (${ts.head._2} rows)")
      med
    }
    def exp(name: String, t1: Double, tN: Double): Unit =
      println(f"[r12e-scale] $name exponent: " +
        f"${math.log(tN / t1) / math.log(mult)}%.2f")

    val lineitem = Tables.load(spark, dir, "lineitem")
    val events = Tables.load(spark, dir, "events")
    val embeddings = Tables.load(spark, dir, "embeddings")
    val shift = 100000000L
    def repl(df: DataFrame, idCols: Seq[String]): DataFrame =
      idCols.foldLeft(
        spark.range(mult).toDF("rep").crossJoin(df)) {
        case (d, c) => d.withColumn(c, col(c) + col("rep") * shift)
      }.drop("rep")
    val liN = repl(lineitem, Nil) // verbatim: sums ride row mass
    val evN = repl(events, Seq("user_id"))
    val embN = repl(embeddings, Seq("vec_id"))

    def dp9(li: DataFrame): Long =
      li.select(floor(col("l_quantity")).cast("long").as("q"),
          expr("CAST(FLOOR(l_extendedprice) AS BIGINT) DIV 1000").as("p"),
          floor(col("l_discount") * 100 + lit(0.5)).cast("long").as("d"))
        .agg(count(lit(1)).as("n"), sum("q").as("sq"), sum("p").as("sp"),
          sum("d").as("sd"), sum(expr("q * q")).as("sqq"),
          sum(expr("p * p")).as("spp"), sum(expr("d * d")).as("sdd"),
          sum(expr("q * p")).as("sqp"), sum(expr("q * d")).as("sqd"),
          sum(expr("p * d")).as("spd"))
        .count()

    def w10(ev: DataFrame): Long = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("day")
        .rowsBetween(Long.MinValue, 0)
      ev.select(col("event_type"), col("user_id"), to_date(col("ts")).as("day"))
        .groupBy("event_type", "user_id").agg(min("day").as("day"))
        .groupBy("event_type", "day").agg(count(lit(1)).as("new_users"))
        .withColumn("cum_users", sum("new_users").over(w))
        .count()
    }

    def v15(e: DataFrame): Long = {
      import graft.operators.Similarity
      val centroids = e.filter(col("vec_id") < 8)
      val assigned = graft.operators.FrameCaches.track(
        Similarity.assignCells(e, centroids).persist())
      val queries = e.filter(col("vec_id") >= 100 && col("vec_id") < 105)
      val exact = graft.operators.FrameCaches.track(
        Similarity.bruteForceTopK(e, queries, 10)
          .select(col("query_id"), col("neighbor_id")).persist())
      def hitsAt(np: Int) =
        Similarity.ivfTopKBatch(assigned, centroids, queries, 10, nprobe = np)
          .select(col("query_id"), col("neighbor_id"))
          .join(exact, Seq("query_id", "neighbor_id"), "left_semi")
          .groupBy("query_id").agg(count(lit(1)).as("hits"))
      hitsAt(1).unionByName(hitsAt(2)).count()
    }

    // quantile-view fold: N× batch mass onto the SAME key set — the
    // sketch build is map-side combined, the merge keys·buckets-bounded.
    // Expected ≈ flat (the dv shape).
    def qv(d: DataFrame, tag: String): Long = {
      val t = s"r12e.qv_$tag"
      spark.sql("CREATE DATABASE IF NOT EXISTS r12e")
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val b = d.select(col("source"),
        (col("n_chars").cast("long") + 1).as("cents"))
      graft.io.Maintenance.maintainQuantileView(spark, t, b, Seq("source"), "cents")
      graft.io.Maintenance.maintainQuantileView(spark, t, b, Seq("source"), "cents")
      spark.table(t).count()
    }

    println(s"[r12e-scale] mult=$mult dir=$dir")
    val c1 = time("dp9 correlation 1x")(dp9(lineitem))
    val cN = time(s"dp9 correlation ${mult}x")(dp9(liN))
    exp("dp9", c1, cN)
    val u1 = time("w10 running distinct 1x")(w10(events))
    val uN = time(s"w10 running distinct ${mult}x")(w10(evN))
    exp("w10", u1, uN)
    val r1 = time("v15 recall eval 1x")(v15(embeddings))
    val rN = time(s"v15 recall eval ${mult}x")(v15(embN))
    exp("v15", r1, rN)
    val documents = Tables.load(spark, dir, "documents")
    val docN = repl(documents, Nil)
    val q1 = time("qv fold 1x")(qv(documents, "1x"))
    val qN = time(s"qv fold ${mult}x")(qv(docN, "nx"))
    exp("qv", q1, qN)
    spark.stop()
  }
}
