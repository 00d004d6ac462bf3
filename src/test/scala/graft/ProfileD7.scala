package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Scratch profiler for the d7 base projection cost (test scope). */
object ProfileD7 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, "/root/testdata/sf0.1", "documents")
      .select("doc_id", "text")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[d7] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n)")
    }
    spark.range(1000).selectExpr("sum(id)").collect()
    time("bands only")(
      Dedup.withMinhashBands(docs, "text", 3, 16, 4, Dedup.Md5Hash)
        .agg(count(col("band_0"))).head().getLong(0))
    time("sig only")(
      Dedup.withMinhashSignature(docs, "text", 3, 16, Dedup.Md5Hash)
        .agg(count(col("sig"))).head().getLong(0))
    time("sig+bands combined")(
      Dedup.withMinhashSignatureAndBands(docs, "text", 3, 16, 4, Dedup.Md5Hash)
        .agg(count(col("band_0")), count(col("sig"))).head().getLong(0))
    (1 to 2).foreach { i =>
      time(s"full d6 run $i")(
        graft.queries.DedupQueries.d6DedupClusters(spark, "/root/testdata/sf0.1").count())
      spark.catalog.clearCache()
      Dedup.releaseCaches(spark)
    }
    // collect() (not count()) so ColumnPruning cannot drop the
    // aggregate expressions — this times the real cluster-merge work
    (1 to 3).foreach { i =>
      time(s"full d7 run $i")(
        graft.queries.DedupQueries.d7ClusterSignatures(spark, "/root/testdata/sf0.1")
          .collect().length.toLong)
      spark.catalog.clearCache()
      Dedup.releaseCaches(spark)
    }
    // same pipeline but merging through the typed Aggregator (UDAF):
    // ObjectHashAggregate + ExpressionEncoder ser/de per input row —
    // the formulation d7 used before round 6
    (1 to 3).foreach { i =>
      time(s"d7 UDAF variant run $i") {
        val docs = Tables.load(spark, "/root/testdata/sf0.1", "documents")
        val (pairs, sigs) = Dedup.minhashCandidatesWithSignatures(
          docs, "doc_id", "text", 3, 16, 4, Dedup.Md5Hash)
        val clusters = Dedup.connectedComponents(pairs)
        val mhUnion = org.apache.spark.sql.functions.udaf(
          new Dedup.MinhashUnionAggregator(16),
          org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]())
        clusters.join(sigs, "doc_id")
          .groupBy("cluster_id")
          .agg(mhUnion(col("sig")).as("csig"))
          .select(col("cluster_id") +:
            (0 until 16).map(j => col("csig").getItem(j).as(s"sig_$j")): _*)
          .orderBy("cluster_id").collect().length.toLong
      }
      spark.catalog.clearCache()
      Dedup.releaseCaches(spark)
    }
    spark.stop()
  }
}
