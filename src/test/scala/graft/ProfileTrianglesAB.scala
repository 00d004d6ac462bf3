package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-16 A/B (verdict item 4): the wedge self-join close vs the
  * edge-iterator (sorted-adjacency `array_intersect`) close for the
  * gr3/gr4 triangle suite — the bench's top line for three rounds.
  * Times the basket-pair edge build alone (the shared cost both
  * formulations pay), then each close at 1x and `mult`x disjoint
  * graph copies. `runMain graft.ProfileTrianglesAB [mult] [sfDir]`.
  */
object ProfileTrianglesAB {
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
      println(f"[tri-ab] $name%-32s $med%8.2f s  (${ts.head._2} rows)")
      med
    }

    val shift = 100000000L
    val li1 = Tables.load(spark, dir, "lineitem")
      .select("l_orderkey", "l_partkey")
    val liN = spark.range(mult).toDF("rep").crossJoin(li1)
      .select((col("l_orderkey") + col("rep") * shift).as("l_orderkey"),
        (col("l_partkey") + col("rep") * shift).as("l_partkey"))

    def edges(li: DataFrame): DataFrame =
      graft.operators.Itemsets.itemPairs(li,
        "l_orderkey", "l_partkey", minSupport = 1L, maxBasketSize = Some(64))

    def gr3Wedge(li: DataFrame): Long =
      graft.operators.Triangles.triangleStatsWedge(edges(li), "p1", "p2").count()
    def gr3Adj(li: DataFrame): Long =
      graft.operators.Triangles.triangleStats(edges(li), "p1", "p2").count()

    def gr4Shape(vt: DataFrame): Long = vt
      .filter(col("deg") >= 2)
      .selectExpr("(2000 * tri) DIV (deg * (deg - 1)) DIV 100 AS bucket",
        "tri", "deg")
      .groupBy("bucket").agg(count(lit(1)), sum("tri"), sum("deg"))
      .count()
    def gr4Wedge(li: DataFrame): Long = gr4Shape(
      graft.operators.Triangles.vertexTrianglesWedge(edges(li), "p1", "p2"))
    def gr4Adj(li: DataFrame): Long = gr4Shape(
      graft.operators.Triangles.vertexTriangles(edges(li), "p1", "p2"))

    // sanity: both closes agree on the real graph before timing
    val w3 = graft.operators.Triangles.triangleStatsWedge(edges(li1), "p1", "p2")
      .collect().head
    graft.operators.FrameCaches.release(spark)
    val a3 = graft.operators.Triangles.triangleStats(edges(li1), "p1", "p2")
      .collect().head
    graft.operators.FrameCaches.release(spark)
    require(w3 == a3, s"censuses differ: $w3 vs $a3")
    println(s"[tri-ab] census agrees: $w3")

    time("edges only 1x")(edges(li1).count())
    val w1 = time("gr3 wedge 1x")(gr3Wedge(li1))
    val a1 = time("gr3 adjacency 1x")(gr3Adj(li1))
    val vw1 = time("gr4 wedge 1x")(gr4Wedge(li1))
    val va1 = time("gr4 adjacency 1x")(gr4Adj(li1))
    val wN = time(s"gr3 wedge ${mult}x")(gr3Wedge(liN))
    val aN = time(s"gr3 adjacency ${mult}x")(gr3Adj(liN))
    val vwN = time(s"gr4 wedge ${mult}x")(gr4Wedge(liN))
    val vaN = time(s"gr4 adjacency ${mult}x")(gr4Adj(liN))
    def exp(name: String, t1: Double, tN: Double): Unit =
      println(f"[tri-ab] $name exponent: " +
        f"${math.log(tN / t1) / math.log(mult)}%.2f")
    exp("gr3 wedge", w1, wN); exp("gr3 adjacency", a1, aN)
    exp("gr4 wedge", vw1, vwN); exp("gr4 adjacency", va1, vaN)
    spark.stop()
  }
}
