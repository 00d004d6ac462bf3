package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-12 scale rehearsal, fifth batch (not part of the library
  * API): the session's new components measured at N× mass so their
  * BASELINE.md scale claims are measured, not argued.
  *
  * Growth models (each states WHAT the cost should ride):
  * - tw5 BM25: documents replicate N× with fresh doc_ids — token
  *   mass, query-term hits and scored candidates all grow N×; the
  *   top-20 and the broadcast stats stay tiny. Expected ≈ 1 (the
  *   tokenize/explode scan dominates).
  * - scd2 merge: the standing dimension AND the change batch both
  *   replicate N× with fresh keys — the chain window rides touched
  *   keys, the rewrite rides |table| + |batch|, both N×.
  *   Expected ≈ 1.
  * - distinct-view fold: the batch replicates N× onto the SAME key
  *   set — the register build rides batch mass (map-side combined),
  *   the standing merge rides keys·m which is invariant.
  *   Expected ≈ 1 with a flat tail.
  *
  * Usage: Test/runMain graft.ProfileR12dScale [mult] [sfDir].
  * Measured numbers recorded in BASELINE.md §round-12.
  */
object ProfileR12dScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "/tmp/graft_r12d_wh")
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
      println(f"[r12d-scale] $name%-28s $med%8.2f s  (${ts.head._2} rows)")
      med
    }
    def exp(name: String, t1: Double, tN: Double): Unit =
      println(f"[r12d-scale] $name exponent: " +
        f"${math.log(tN / t1) / math.log(mult)}%.2f")

    val documents = Tables.load(spark, dir, "documents")
    val shift = 100000000L
    def repl(df: DataFrame, idCols: Seq[String]): DataFrame =
      idCols.foldLeft(
        spark.range(mult).toDF("rep").crossJoin(df)) {
        case (d, c) => d.withColumn(c, col(c) + col("rep") * shift)
      }.drop("rep")
    val docN = repl(documents, Seq("doc_id"))

    // tw5: the registered query's exact shape, parameterized on the frame
    def tw5(d: DataFrame): Long = {
      val terms = Seq("spark", "join", "stream")
      val docs = graft.operators.FrameCaches.track(
        d.filter(col("text").isNotNull)
          .select(col("doc_id"),
            graft.functions.TextFunctions.tokens(lower(col("text"))).as("toks"))
          .select(col("doc_id"), col("toks"), size(col("toks")).as("dl"))
          .persist())
      val stats = docs.agg(count(lit(1)).as("n_docs"), sum("dl").as("total_len"))
      val tf = docs
        .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
        .filter(col("term").isin(terms: _*))
        .groupBy(col("doc_id"), col("dl"), col("term"))
        .agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      tf.join(broadcast(dfreq), "term").crossJoin(broadcast(stats))
        .withColumn("sc", col("tf").cast("double") * col("df") / col("total_len"))
        .groupBy("doc_id").agg(sum("tf").as("n_hits"), max("sc").as("s"))
        .orderBy(col("s").desc, col("doc_id")).limit(20)
        .count()
    }

    // scd2: dimension of |documents| keys, every key changes once
    def scd2(n: Int, tag: String): Long = {
      val t = s"r12d.scd2_$tag"
      spark.sql("CREATE DATABASE IF NOT EXISTS r12d")
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val base = (if (n == 1) documents else docN)
        .select(col("doc_id").as("k"), col("lang").as("v"),
          lit("2024-01-01").cast("date").as("eff"))
      graft.io.Scd2.merge(spark, t, base, Seq("k"), Seq("v"), "eff")
      val changed = base.withColumn("v", concat(col("v"), lit("*")))
        .withColumn("eff", lit("2024-02-01").cast("date"))
      graft.io.Scd2.merge(spark, t, changed, Seq("k"), Seq("v"), "eff")
        .newVersions
    }

    // distinct view: N× batch mass onto the invariant (source, lang) keys
    def dv(d: DataFrame, tag: String): Long = {
      val t = s"r12d.dv_$tag"
      spark.sql("CREATE DATABASE IF NOT EXISTS r12d")
      spark.sql(s"DROP TABLE IF EXISTS $t")
      graft.io.Maintenance.maintainDistinctView(spark, t,
        d.select(col("source"), col("doc_id")), Seq("source"), "doc_id")
      graft.io.Maintenance.maintainDistinctView(spark, t,
        d.select(col("source"), (col("doc_id") + lit(7L)).as("doc_id")),
        Seq("source"), "doc_id")
      spark.table(t).count()
    }

    println(s"[r12d-scale] mult=$mult dir=$dir")
    val b1 = time("tw5 bm25 1x")(tw5(documents))
    val bN = time(s"tw5 bm25 ${mult}x")(tw5(docN))
    exp("tw5", b1, bN)
    val s1 = time("scd2 merge 1x")(scd2(1, "1x"))
    val sN = time(s"scd2 merge ${mult}x")(scd2(mult, "nx"))
    exp("scd2", s1, sN)
    val d1 = time("distinct view 1x")(dv(documents, "1x"))
    val dN = time(s"distinct view ${mult}x")(dv(docN, "nx"))
    exp("dv", d1, dN)
    spark.stop()
  }
}
