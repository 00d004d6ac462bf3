package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-12 scale rehearsal, second batch (not part of the library
  * API): the new series/graph operators measured at N× mass, so their
  * BASELINE.md scale claims are measured, not argued.
  *
  * Growth models (each states WHAT the cost should ride):
  * - ts1 gap fill: orders replicate N× into the SAME buckets/days —
  *   the daily aggregate sees N× rows but the spine, join, and fill
  *   window ride the (bucket, day) cell count, which is invariant.
  *   Expected exponent ≈ the bare-scan floor.
  * - rj2 interval join: orders replicate N× with fresh keys — probe
  *   mass and matched pairs grow N×, intervals stay fixed. Expected
  *   ≈ 1 (output-proportional), the claim being NO probe×interval
  *   term (a nested-loop would show the same exponent but a 500×
  *   constant; the bin join's constant is the candidate density).
  * - gr3 triangles: the co-purchase graph replicates as N DISJOINT
  *   copies (orders AND parts shifted) — edges, wedges, and triangles
  *   all grow N×. Expected ≈ 1: cost rides Σ out_deg², which is
  *   per-copy local; a cross-copy quadratic term would push it
  *   toward 2.
  *
  * Usage: Test/runMain graft.ProfileR12bScale [mult] [sfDir].
  * Measured numbers recorded in BASELINE.md §round-12.
  */
object ProfileR12bScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val mult = args.lift(0).map(_.toInt).getOrElse(10)
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")

    def time(name: String)(f: => Long): Double = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val med = ts.map(_._1).sorted.apply(1)
      println(f"[r12b-scale] $name%-28s $med%8.2f s  (${ts.head._2} rows)")
      med
    }
    def exp(name: String, t1: Double, tN: Double): Unit =
      println(f"[r12b-scale] $name exponent: " +
        f"${math.log(tN / t1) / math.log(mult)}%.2f")

    val orders = Tables.load(spark, dir, "orders")
    val nation = Tables.load(spark, dir, "nation")
    val lineitem = Tables.load(spark, dir, "lineitem")
    val shift = 100000000L

    val ordN = spark.range(mult).toDF("rep").crossJoin(orders)
      .withColumn("o_orderkey",
        when(col("rep") === 0, col("o_orderkey"))
          .otherwise(col("o_orderkey") + col("rep") * shift))
      .drop("rep")
    // disjoint graph copies: shift BOTH the basket and the item space
    val liN = spark.range(mult).toDF("rep").crossJoin(
        lineitem.select("l_orderkey", "l_partkey"))
      .select(
        (col("l_orderkey") + col("rep") * shift).as("l_orderkey"),
        (col("l_partkey") + col("rep") * shift).as("l_partkey"))

    def ts1(o: org.apache.spark.sql.DataFrame): Long = {
      val daily = o.select((col("o_custkey") % 16).as("bucket"),
          col("o_orderdate").cast("date").as("day"),
          floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("c"))
        .groupBy("bucket", "day")
        .agg(count(lit(1)).as("n"), sum("c").as("cents"))
      operators.TimeSeries.gapFillForward(
        daily, Seq("bucket"), "day", Seq("cents")).count()
    }
    def rj2(o: org.apache.spark.sql.DataFrame): Long = {
      val iv = nation
        .select(col("n_nationkey").cast("long").as("nk"),
          explode(sequence(lit(0L), lit(19L))).as("i"))
        .select(col("nk"), (col("nk") * 100 + col("i")).as("interval_id"),
          date_add(lit("1995-01-01").cast("date"),
            (col("nk") * 13 + col("i") * 97).cast("int")).as("st"))
        .withColumn("en", date_add(col("st"), 45))
      // scope on a custkey-derived nation stand-in: keeps the probe
      // self-contained (no customer join in the timed path)
      val probe = o.select((col("o_custkey") % 25).as("nk"),
        col("o_orderdate").cast("date").as("d"))
      operators.RangeJoins.pointInInterval(probe, iv, Seq("nk"), "d",
          "st", "en", binDays = 32)
        .groupBy("interval_id").agg(count(lit(1)).as("n")).count()
    }
    def gr3(li: org.apache.spark.sql.DataFrame): Long = {
      val edges = operators.Itemsets.itemPairs(li,
        "l_orderkey", "l_partkey", minSupport = 1L, maxBasketSize = Some(64))
      operators.Triangles.triangleStats(edges, "p1", "p2")
        .select("n_triangles").as[Long].head()
    }

    println(s"[r12b-scale] orders ${orders.count()} -> ${ordN.count()}; " +
      s"lineitem ${lineitem.count()} -> ${liN.count()}")
    val t1a = time("ts1 gap fill 1x")(ts1(orders))
    val tNa = time(s"ts1 gap fill ${mult}x")(ts1(ordN))
    exp("ts1", t1a, tNa)
    val t1b = time("rj2 interval join 1x")(rj2(orders))
    val tNb = time(s"rj2 interval join ${mult}x")(rj2(ordN))
    exp("rj2", t1b, tNb)
    val t1c = time("gr3 triangles 1x")(gr3(lineitem.select("l_orderkey", "l_partkey")))
    val tNc = time(s"gr3 triangles ${mult}x")(gr3(liN))
    exp("gr3", t1c, tNc)
    spark.stop()
  }
}
