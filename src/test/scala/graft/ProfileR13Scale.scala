package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-13 scale rehearsal (not part of the library API): the tw6
  * sparse-cosine row measured at N× mass — the rehearsal the round-12
  * snapshot shipped without.
  *
  * Growth model: documents replicate N× with FRESH doc_ids, so every
  * term's df multiplies by N and posting mass Σdf rides N×. The pair
  * mass the posting self-join admits is capped at maxDf·Σdf
  * (SparseSim's vector-truncation cap, maxDf FIXED as in the gated
  * row), so expected cost is NEAR-LINEAR in posting mass — the cap is
  * precisely what keeps the df² term from going quadratic at 100 TB.
  * Terms whose replicated df crosses maxDf drop out of every vector
  * (fewer pairs per doc than 1×) — that is the cap SEMANTICS, not an
  * artifact: a pruned vector IS the vector.
  *
  * Usage: Test/runMain graft.ProfileR13Scale [mult] [sfDir].
  * Measured numbers recorded in BASELINE.md §round-13.
  */
object ProfileR13Scale {
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
        graft.operators.FrameCaches.release(spark)
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val med = ts.map(_._1).sorted.apply(1)
      println(f"[r13-scale] $name%-28s $med%8.2f s  (${ts.head._2} rows)")
      med
    }
    def exp(name: String, t1: Double, tN: Double): Unit =
      println(f"[r13-scale] $name exponent: " +
        f"${math.log(tN / t1) / math.log(mult)}%.2f")

    val documents = Tables.load(spark, dir, "documents")
    val shift = 100000000L
    val docN = spark.range(mult).toDF("rep").crossJoin(documents)
      .withColumn("doc_id", col("doc_id") + col("rep") * shift)
      .drop("rep")

    def tw6(docs: DataFrame): Long =
      graft.operators.SparseSim.cosinePairs(docs,
        "doc_id", "text", n = 3, maxDf = 1000L, minCosMicro = 200000L)
        .count()

    // st2 growth model: orders replicate N× VERBATIM — the quarterly
    // reduction (the only full-data pass) rides scan mass; the
    // observation frame stays (priorities × quarters)-bounded, so the
    // per-group Cramer arithmetic is invariant. Expected ≈ 1 with the
    // scan floor amortizing (the dp9 shape). The quarterly counts x2
    // grow N× and stay inside the checked |v| ≤ 1e6 range at 10×.
    val ordN = spark.range(mult).toDF("rep")
      .crossJoin(Tables.load(spark, dir, "orders")).drop("rep")
    def st2(orders: DataFrame): Long = {
      val q = orders
        .select(col("o_orderpriority").as("pri"),
          ((year(col("o_orderdate").cast("date")) - 1995) * 4 +
            quarter(col("o_orderdate").cast("date")) - 1)
            .cast("long").as("x1"),
          expr("CAST(FLOOR(o_totalprice + 0.5) AS BIGINT)").as("dollars"))
        .groupBy("pri", "x1")
        .agg(expr("CAST(SUM(dollars) DIV COUNT(*) AS BIGINT)").as("y"),
          count(lit(1)).as("x2"))
      graft.operators.SeriesStats.ols2Permille(q, Seq("pri"), "y", "x1", "x2")
        .count()
    }

    println(s"[r13-scale] mult=$mult dir=$dir")
    val t1 = time("tw6 sparse cosine 1x")(tw6(documents))
    val tN = time(s"tw6 sparse cosine ${mult}x")(tw6(docN))
    exp("tw6", t1, tN)
    val orders = Tables.load(spark, dir, "orders")
    val s1 = time("st2 ols multi 1x")(st2(orders))
    val sN = time(s"st2 ols multi ${mult}x")(st2(ordN))
    exp("st2", s1, sN)
    spark.stop()
  }
}
