package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Dedup-family scale rehearsal (not part of the library API): no sf1
  * testdata ships, so the next scale step is synthesized as the
  * "N crawls of the same web" shape — the sf0.1 corpus replicated N×
  * with unique ids and a per-replica marker word appended, making every
  * replica a genuine near-dup (J ≈ 0.9) of its original. That is the
  * worst realistic load for a dedup engine: every LSH bucket fattens
  * N×, every cluster is an N-clique, and the CC funnel sees N·E edges.
  * Times the production (XxHash) candidate→cluster pipeline and the
  * exact d9 join at 1× and N×, printing the observed scaling exponent
  * log(tN/t1)/log(N) — 1.0 = linear, 2.0 = quadratic.
  *
  * Usage: runMain graft.ProfileScale [mult] (default 10 ⇒ 50k docs).
  * Measured numbers are recorded in BASELINE.md §round-7.
  */
object ProfileScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val mult = args.lift(0).map(_.toInt).getOrElse(10)

    def time(name: String)(f: => Long): Double = {
      val t0 = System.nanoTime()
      val n = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[scale] $name%-36s $s%8.2f s  ($n rows)")
      s
    }

    val docs0 = Tables.load(spark, "/root/testdata/sf0.1", "documents")
      .select("doc_id", "text")
    val big = spark.range(mult).toDF("rep").crossJoin(docs0) // broadcast ×N
      .select((col("doc_id") + col("rep") * 10000000L).as("doc_id"),
        concat(col("text"), lit(" replica"), col("rep")).as("text"))
    println(s"[scale] corpus: 5000 docs at 1x, ${5000 * mult} at ${mult}x " +
      s"(each replica a J≈0.9 near-dup of its original)")

    def clusterPipeline(df: org.apache.spark.sql.DataFrame): Long = {
      val n = Dedup.connectedComponents(
        Dedup.minhashCandidates(df, "doc_id", "text")).count()
      Dedup.releaseCaches(spark)
      n
    }
    val t1c = time("1x  candidates -> clusters")(clusterPipeline(docs0))
    val tNc = time(s"${mult}x candidates -> clusters")(clusterPipeline(big))
    println(f"[scale] cluster pipeline exponent: ${math.log(tNc / t1c) / math.log(mult)}%.2f")

    def d9(df: org.apache.spark.sql.DataFrame): Long = {
      val n = Dedup.ngramJaccardPairs(df, "doc_id", "text", 3, 0.5).count()
      Dedup.releaseCaches(spark)
      n
    }
    val t19 = time("1x  exact d9 t=0.5")(d9(docs0))
    val tN9 = time(s"${mult}x exact d9 t=0.5")(d9(big))
    println(f"[scale] d9 exponent: ${math.log(tN9 / t19) / math.log(mult)}%.2f")

    // t13's inverted-index shape: shingle df groupBy + co-partitioned
    // carry-back join + per-doc score. The replicated corpus fattens
    // every posting list N× (each shingle now appears in N replicas) —
    // the worst case for a df join — yet both shuffles stay key-hashed,
    // so the expected exponent is ~1.0.
    def novelty(df: org.apache.spark.sql.DataFrame): Long = {
      val sh = df.select(col("doc_id"), explode(
        Dedup.hashedShingles(col("text"), 3, Dedup.XxHash)).as("s"))
      val dfreq = sh.groupBy("s").agg(count(lit(1)).as("df"))
      sh.join(dfreq, Seq("s")).groupBy("doc_id")
        .agg(count(lit(1)).as("n_shingles"),
          sum(when(col("df") >= 5, 1L).otherwise(0L)).as("n_common"))
        .count()
    }
    val t1n = time("1x  t13 ngram-novelty")(novelty(docs0))
    val tNn = time(s"${mult}x t13 ngram-novelty")(novelty(big))
    println(f"[scale] novelty exponent: ${math.log(tNn / t1n) / math.log(mult)}%.2f")
    spark.stop()
  }
}
