package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Adversarial-scale stress profiler for the two hot-key guards (not
  * part of the library API): runs the LSH bucket cap
  * (`candidatePairs(maxBucketSize)`) and the d9 prefix-posting cap
  * (`ngramJaccardPairs(maxPostingSize)`) against synthetic corpora
  * built to break the uncapped paths —
  *
  *  - LSH: thousands of identical near-empty stub docs ("license file"
  *    boilerplate) collapse into ONE (band_idx, band_key) bucket per
  *    band, so the uncapped self-join materializes C(n,2) pairs from a
  *    single reducer;
  *  - d9: docs that are 80% shared license header + a short group tail
  *    force header shingles into the rarest-first prefix (the tail is
  *    shorter than the prefix budget), so every header shingle's
  *    posting list is the whole corpus and the uncapped join is
  *    quadratic — AND the true answer itself is quadratic (all pairs
  *    share enough header to pass t=0.5), which is exactly why real
  *    cleanups cap boilerplate: the capped run keeps the within-group
  *    (genuine tail-signal) pairs and drops the boilerplate-only ones.
  *
  * Usage: runMain graft.ProfileHotKeys [nLshStubs] [nHeaderDocs]
  * (defaults 5000 / 3000). Measured numbers are recorded in
  * BASELINE.md §hot-key guards.
  */
object ProfileHotKeys {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val nLsh = args.lift(0).map(_.toInt).getOrElse(5000)
    val nD9 = args.lift(1).map(_.toInt).getOrElse(3000)

    def time(name: String)(f: => Long): Double = {
      val t0 = System.nanoTime()
      val n = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[hotkeys] $name%-40s $s%8.2f s  ($n rows)")
      s
    }

    // ---- LSH bucket cap: real corpus + one degenerate stub bucket ----
    val stub = "this file intentionally left blank see the license file for details"
    val real = Tables.load(spark, "/root/testdata/sf0.1", "documents")
      .select("doc_id", "text")
    val corpusA = real.unionByName(
      spark.range(nLsh).select((col("id") + 1000000L).as("doc_id"),
        lit(stub).as("text")))
    println(s"[hotkeys] LSH corpus: 5000 real docs + $nLsh identical stubs")
    val tCap = time(s"d3 capped  (maxBucketSize=64)")(
      Dedup.minhashCandidates(corpusA, "doc_id", "text",
        maxBucketSize = Some(64L)).count())
    Dedup.releaseCaches(spark)
    val tUncap = time(s"d3 UNCAPPED (C($nLsh,2) hot pairs)")(
      Dedup.minhashCandidates(corpusA, "doc_id", "text").count())
    Dedup.releaseCaches(spark)
    println(f"[hotkeys] d3 guard speedup: ${tUncap / tCap}%.1fx")

    // ---- d9 posting cap: header-dominated docs with short group tails ----
    // 40-word header (~38 shared trigrams) + 8-word tail unique to each
    // group of 20 docs: prefix budget at t=0.5 exceeds the tail, so
    // header shingles (df = corpus size) enter the uncapped prefix index
    val header = (1 to 40).map(k => s"hdr$k").mkString(" ")
    val corpusB = spark.range(nD9).map { i =>
      val g = i % (nD9 / 20)
      (i, header + " " + (0 until 8).map(k => s"t${g}w$k").mkString(" "))
    }.toDF("doc_id", "text")
    println(s"[hotkeys] d9 corpus: $nD9 docs, 80% shared header, " +
      s"${nD9 / 20} tail groups of 20")
    val tCap9 = time("d9 capped  (maxPostingSize=1000)")(
      Dedup.ngramJaccardPairs(corpusB, "doc_id", "text", 3, 0.5,
        maxPostingSize = Some(1000L)).count())
    Dedup.releaseCaches(spark)
    val tUncap9 = time(s"d9 UNCAPPED (quadratic true answer)")(
      Dedup.ngramJaccardPairs(corpusB, "doc_id", "text", 3, 0.5).count())
    Dedup.releaseCaches(spark)
    println(f"[hotkeys] d9 guard speedup: ${tUncap9 / tCap9}%.1fx")
    spark.stop()
  }
}
