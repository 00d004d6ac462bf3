package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** d12 (exact shared-span dedup) at N× corpus mass — recording the new
  * operator's scale posture the round it ships (the gr2/fi2/rc3
  * rehearsal discipline).
  *
  * Two growth models, because the operator's cost has two components:
  * - "new content": each replica's vocabulary is tagged per replica, so
  *   replicas share NOTHING across replicas and the duplicate mass
  *   grows exactly N× (each replica contains the original's duplicate
  *   pairs under its own vocabulary). Expected exponent ≈ 1.0 — the
  *   window explode + hash is per-token work and an EXACT grain cannot
  *   be sub-linear in tokens scanned; the claim under test is that
  *   nothing is super-linear (no corpus² term hiding in the join).
  * - "re-crawl": replicas are verbatim copies, so every doc shares its
  *   full span with its N−1 replicas — output pairs grow ~N²/2 per doc
  *   on top of N× scan mass. Cost must ride OUTPUT mass here (fi2's
  *   334×-output story): wall-clock per emitted pair should FALL.
  *
  * Usage: Test/runMain graft.ProfileD12Scale [mult] [sfDir].
  * Numbers recorded in BASELINE.md §round-12.
  */
object ProfileD12Scale {
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
      println(f"[d12-scale] $name%-34s $med%8.2f s  (${ts.head._2} rows)")
      med
    }
    def exp(name: String, t1: Double, tN: Double): Unit =
      println(f"[d12-scale] $name exponent: ${math.log(tN / t1) / math.log(mult)}%.2f")

    val docs = Tables.load(spark, dir, "documents").select("doc_id", "text")
    val shift = 100000000L

    // new-content growth: every token carries its replica tag, so the
    // vocabularies are disjoint across replicas
    val freshN = spark.range(mult).toDF("rep").crossJoin(docs)
      .select((col("doc_id") + col("rep") * shift).as("doc_id"),
        when(col("rep") === 0, col("text")).otherwise(
          concat_ws(" ", transform(split(trim(col("text")), "\\s+"),
            t => concat(t, lit("_"), col("rep"))))).as("text"))
    // re-crawl growth: verbatim copies under new ids
    val crawlN = spark.range(mult).toDF("rep").crossJoin(docs)
      .select((col("doc_id") + col("rep") * shift).as("doc_id"), col("text"))

    def run(d: DataFrame): Long =
      graft.operators.Spans.sharedSpans(d, "doc_id", "text", 50, 32).count()

    run(docs) // warm
    val t1 = time("1x  shared spans")(run(docs))
    val tF = time(s"${mult}x shared spans (new content)")(run(freshN))
    exp("new-content", t1, tF)
    val tC = time(s"${mult}x shared spans (re-crawl)")(run(crawlN))
    exp("re-crawl", t1, tC)
    spark.stop()
  }
}
