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
    // the ≥-threshold filter consumes the exact jaccard, so count()
    // cannot prune the verify stage; both hash families timed so the
    // production (xx) path stays measured alongside the oracle (md5) one
    time("ngram jaccard t=0.5 exact")(
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5).count())
    Dedup.releaseCaches(spark)
    time("ngram jaccard t=0.5 (md5 family)")(
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5,
        Dedup.Md5Hash).count())
    Dedup.releaseCaches(spark)
    // staged breakdown of the prefix-filtered join
    locally {
      val t = 0.5
      val shf = docs.select(col("doc_id"),
          Dedup.hashedShingles(col("text"), 3, Dedup.Md5Hash).as("sh"))
        .withColumn("sz", size(col("sh"))).persist()
      time("  d9 stage: sh persist")(shf.count())
      val posting = shf.select(col("doc_id"), col("sz"), explode(col("sh")).as("s"))
      val dfreq = posting.groupBy("s").agg(count(lit(1)).as("_df"))
      time("  d9 stage: df")(dfreq.count())
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy(col("_df"), col("s"))
      val prefix = posting.join(dfreq, "s")
        .withColumn("_p", org.apache.spark.sql.functions.row_number().over(w))
        .filter(col("_p") <= col("sz") - ceil(col("sz") * t - 1e-9) + lit(1))
        .select(col("doc_id"), col("sz"), col("s"), col("_p")).persist()
      time("  d9 stage: prefix index")(prefix.count())
      val ub = least(col("a._p"), col("b._p")) - lit(1) +
        least(col("a.sz") - col("a._p"), col("b.sz") - col("b._p")) + lit(1)
      val cands = prefix.as("a").join(prefix.as("b"),
          col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id")
            && col("a.sz") >= col("b.sz") * t - 1e-9
            && col("b.sz") >= col("a.sz") * t - 1e-9)
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          col("a.sz").as("sz_a"), col("b.sz").as("sz_b"))
        .agg(max(ub).as("_ub"))
        .filter(col("_ub") >=
          ceil((col("sz_a") + col("sz_b")) * lit(t / (1 + t)) - 1e-9))
        .persist()
      time("  d9 stage: candidates")(cands.count())
      val left = shf.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
      val right = shf.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
      time("  d9 stage: verify joins only")(
        cands.join(left, "doc_a").join(right, "doc_b").count())
      time("  d9 stage: verify")(cands.join(left, "doc_a").join(right, "doc_b")
        .withColumn("_i", graft.functions.TextExpressions
          .sortedIntersectSize(col("sh_a"), col("sh_b")))
        .filter(col("_i") / (col("sz_a") + col("sz_b") - col("_i")) >= t).count())
      time("  d9 stage: verify (array_intersect)")(
        cands.join(left, "doc_a").join(right, "doc_b")
          .withColumn("_i", size(array_intersect(col("sh_a"), col("sh_b"))))
          .filter(col("_i") / (col("sz_a") + col("sz_b") - col("_i")) >= t).count())
      shf.unpersist(); prefix.unpersist(); cands.unpersist()
    }
    spark.stop()
  }
}
