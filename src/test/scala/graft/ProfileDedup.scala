package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Scratch profiler for the dedup path (not part of the library API). */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    val docs = Tables.load(spark, dir, "documents").select("doc_id", "text")
    time("scan only")(docs.count())
    val sh = Dedup.shingles(col("text"), 3)
    time("shingles")(docs.select(col("doc_id"), sh.as("sh")).agg(sum(size(col("sh")))).head().getLong(0))
    val base = Dedup.withMinhashBands(docs, "text", 3, 16, 4, Dedup.Md5Hash)
    time("bands (full signature)")(base.count())
    val based = base.drop("text").persist()
    time("persist materialize")(based.count())
    val pairs = Dedup.candidatePairs(based, "doc_id", (0 until 4).map(b => col(s"band_$b")))
    time("candidate pairs")(pairs.count())
    time("full minhashNearDups")(
      Dedup.minhashNearDups(docs, "doc_id", "text", 3, 16, 4, 0.0, Dedup.Md5Hash).count())
    time("full again (warm)")(
      Dedup.minhashNearDups(docs, "doc_id", "text", 3, 16, 4, 0.0, Dedup.Md5Hash).count())
    val sim = Dedup.withSimhashChunks(docs, "text", Dedup.Md5Hash)
    time("simhash chunks")(sim.count())
    time("simhash candidates")(
      Dedup.simhashCandidates(docs, "doc_id", "text", Dedup.Md5Hash).count())
    spark.stop()
  }
}
