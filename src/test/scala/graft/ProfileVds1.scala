package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Where do vds1's seconds go? Times the lifecycle's stages separately
  * at the bench scale (sf0.1): founding fold (with its Lloyd's
  * training), second fold, and the training call alone.
  * Usage: Test/runMain graft.ProfileVds1 [sfDir].
  */
object ProfileVds1 {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        s"${sys.props("user.dir")}/target/vds1-warehouse-${System.nanoTime()}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      println(f"[vds1] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      a
    }
    val e = graft.Tables.load(spark, dir, "embeddings")
      .select("vec_id", "embedding")
    e.persist().count()
    spark.sql("CREATE DATABASE IF NOT EXISTS p")
    val t = "p.vds1_store"

    for (round <- 1 to 3) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      spark.sql(s"DROP TABLE IF EXISTS ${t}_model")
      println(s"--- round $round ---")
      time("fold1 (founding + training)") {
        graft.io.VectorDedupStore.maintain(spark, t,
          e.filter(col("vec_id") % 2 === 0), "vec_id", "embedding",
          12000L, 8, nprobe = 2, trainIters = 2,
          maxCellSize = Some(40L), epochId = Some(1L))
      }
      time("fold2 (probe + append)") {
        graft.io.VectorDedupStore.maintain(spark, t,
          e.filter(col("vec_id") % 2 === 1), "vec_id", "embedding",
          12000L, 8, nprobe = 2, trainIters = 2,
          maxCellSize = Some(40L), epochId = Some(2L))
      }
      time("training alone (k=8 x2 iters)") {
        val bu = graft.operators.Similarity.withUnitVector(
          e.filter(col("vec_id") % 2 === 0), "embedding")
        val stats = graft.operators.Similarity.quantStats(bu, "uv")
        val codes = graft.operators.Similarity.withQuantized(bu, stats, "uv")
          .select(col("vec_id"), col("qv"))
        graft.operators.Similarity.kmeansCentroidsQuantized(codes, 8, 2)
          .collect()
      }
    }
    spark.stop()
  }
}
