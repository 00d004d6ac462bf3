package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-JVM A/B of the triangle closing join: broadcast vs shuffle
  * (not part of the library API) — the measurement behind
  * [[graft.operators.Triangles.defaultBroadcastCloseMax]], recorded
  * in BASELINE.md §round-12. The wedge mass (41M rows over sf0.1's
  * 1.2M-edge co-purchase graph) is ~30× the edge side; broadcasting
  * the edges probes wedges where they are generated instead of
  * shuffling them. Measured interleaved (same session, alternating
  * paths, min-of-3 per cell): the INNER close (vertexTriangles)
  * gains ~25% (6.2–6.6 s vs 8.2–9.2 s end-to-end) and the SEMI close
  * (triangleStats) is a wash locally — shuffles are in-memory on
  * local[32]; on a real cluster the 41M-row network shuffle the
  * broadcast avoids is ~1 GB.
  *
  * Stage decomposition (cumulative mins, sf0.1): edge build 1.4 s,
  * + orientation 2.9 s, + wedge generation 3.2 s, + broadcast close
  * 5.3 s — the close probe and the edge build dominate; the wedge
  * join itself is row-generation-bound and cheap.
  *
  * Usage: Test/runMain graft.ProfileTriClose [sfDir].
  */
object ProfileTriClose {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val li = Tables.load(spark, dir, "lineitem").select("l_orderkey", "l_partkey")

    def edges() = graft.operators.Itemsets.itemPairs(li,
      "l_orderkey", "l_partkey", minSupport = 1L, maxBasketSize = Some(64))

    def time(name: String)(f: => Long): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        graft.operators.FrameCaches.release(spark)
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[tri-ab] $name%-22s min ${ts.map(_._1).min}%6.2f  " +
        f"med ${ts.map(_._1).sorted.apply(1)}%6.2f  (${ts.head._2} rows)")
    }
    // interleave to cancel drift
    for (_ <- 1 to 2) {
      time("stats broadcast") {
        graft.operators.Triangles.triangleStatsWedge(edges(), "p1", "p2")
          .head().getLong(2) }
      time("stats shuffle") {
        graft.operators.Triangles.triangleStatsWedge(edges(), "p1", "p2",
          broadcastCloseMax = 0L).head().getLong(2) }
      time("vertex broadcast") {
        graft.operators.Triangles.vertexTrianglesWedge(edges(), "p1", "p2")
          .agg(sum("tri")).head().getLong(0) }
      time("vertex shuffle") {
        graft.operators.Triangles.vertexTrianglesWedge(edges(), "p1", "p2",
          broadcastCloseMax = 0L).agg(sum("tri")).head().getLong(0) }
    }
    spark.stop()
  }
}
