package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** d13 (exact n-gram containment join) at N× corpus mass — the
  * ship-round rehearsal discipline, with d12's two growth models
  * reused because containment shares the cost anatomy (per-token
  * shingle pass + candidate join + per-pair verify):
  * - "new content": replica-tagged vocabularies — nothing shared
  *   across replicas, containment mass grows exactly N×. Expected ≈ 1
  *   (an exact grain scans every token); the claim under test is no
  *   hidden corpus² term in the probe⋈index join.
  * - "re-crawl": verbatim copies — every doc is FULLY contained in
  *   its N−1 replicas (containment 1000‰ both ways), so output pairs
  *   grow ~N² per original pair. Cost must ride OUTPUT mass; seconds
  *   per emitted pair should fall sharply.
  *
  * Usage: Test/runMain graft.ProfileD13Scale [mult] [sfDir].
  * Numbers recorded in BASELINE.md §round-12.
  */
object ProfileD13Scale {
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
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val med = ts.map(_._1).sorted.apply(1)
      println(f"[d13-scale] $name%-30s $med%8.2f s  (${ts.head._2} rows)")
      med
    }
    def exp(name: String, t1: Double, tN: Double): Unit =
      println(f"[d13-scale] $name exponent: " +
        f"${math.log(tN / t1) / math.log(mult)}%.2f")

    val docs = Tables.load(spark, dir, "documents").select("doc_id", "text")
    val shift = 100000000L
    val freshN = spark.range(mult).toDF("rep").crossJoin(docs)
      .select((col("doc_id") + col("rep") * shift).as("doc_id"),
        when(col("rep") === 0, col("text")).otherwise(
          concat_ws(" ", transform(split(trim(col("text")), "\\s+"),
            t => concat(t, lit("_"), col("rep"))))).as("text"))
    val crawlN = spark.range(mult).toDF("rep").crossJoin(docs)
      .select((col("doc_id") + col("rep") * shift).as("doc_id"), col("text"))

    def run(d: org.apache.spark.sql.DataFrame): Long = {
      val n = operators.Dedup.containmentPairs(d, "doc_id", "text",
        shingleN = 3, thresholdPermille = 700).count()
      operators.Dedup.releaseCaches(spark)
      n
    }

    println(s"[d13-scale] docs ${docs.count()} -> ${mult}x")
    val t1 = time("containment 1x")(run(docs))
    val tNf = time(s"containment ${mult}x fresh")(run(freshN))
    exp("d13 new-content", t1, tNf)
    val tNc = time(s"containment ${mult}x re-crawl")(run(crawlN))
    exp("d13 re-crawl", t1, tNc)
    spark.stop()
  }
}
