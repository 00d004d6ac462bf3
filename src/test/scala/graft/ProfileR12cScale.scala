package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-12 scale rehearsal, fourth batch (not part of the library
  * API): the sequence/profile operators measured at N× mass so their
  * BASELINE.md scale claims are measured, not argued.
  *
  * Growth models (each states WHAT the cost should ride):
  * - sq1 transitions: events replicate N× with fresh event_ids onto
  *   the SAME users — per-user sequences get N× longer, the window
  *   and transition counts ride total event mass. Expected ≈ 1.
  * - ts3 CUSUM / w9 islands: orders replicate N× into the SAME
  *   (bucket, day) cells — the daily aggregate sees N× rows but the
  *   window rides the invariant cell count. Expected ≈ scan floor.
  * - rfm1 RFM: orders replicate N× with FRESH custkeys — customers,
  *   boundary aggregates, and scoring all grow N×. Expected ≈ 1.
  * - t21 weighted sample: documents replicate N× with fresh doc_ids —
  *   N× race rows, same k winners per stratum. Expected ≈ 1 (the
  *   per-stratum window sort).
  * - dp6 MI / tw4 Zipf: documents replicate N× with the SAME
  *   source/lang/text — cells and vocabulary are invariant, cost
  *   rides the count shuffle over N× scan/token mass. Expected ≈ 1
  *   on input mass with a flat tail.
  * - gr4 clustering: the co-purchase graph replicates as N DISJOINT
  *   copies (gr3's model) — vertices, wedges, and listed triangles
  *   all grow N×; the inner-join close's output rides triangle mass.
  *   Expected ≈ 1 (a cross-copy term would push toward 2).
  *
  * Usage: Test/runMain graft.ProfileR12cScale [mult] [sfDir].
  * Measured numbers recorded in BASELINE.md §round-12.
  */
object ProfileR12cScale {
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
      println(f"[r12c-scale] $name%-28s $med%8.2f s  (${ts.head._2} rows)")
      med
    }
    def exp(name: String, t1: Double, tN: Double): Unit =
      println(f"[r12c-scale] $name exponent: " +
        f"${math.log(tN / t1) / math.log(mult)}%.2f")

    val events = Tables.load(spark, dir, "events")
    val orders = Tables.load(spark, dir, "orders")
    val documents = Tables.load(spark, dir, "documents")
    val shift = 100000000L

    def repl(df: DataFrame, idCols: Seq[String]): DataFrame =
      idCols.foldLeft(
        spark.range(mult).toDF("rep").crossJoin(df)) {
        case (d, c) => d.withColumn(c, col(c) + col("rep") * shift)
      }.drop("rep")

    val evN = repl(events, Seq("event_id"))
    val ordCells = repl(orders, Seq("o_orderkey"))
    val ordCust = repl(orders, Seq("o_orderkey", "o_custkey"))
    val docN = repl(documents, Seq("doc_id"))

    val cents = floor(col("o_totalprice") * 100 + lit(0.5)).cast("long")

    def sq1(ev: DataFrame): Long = {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val tr = ev
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"),
          col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
      val f = tr.groupBy("from_type").agg(sum("n").as("tot"))
      tr.join(broadcast(f), "from_type").count()
    }

    def ts3(o: DataFrame): Long = {
      val d = o.select((col("o_custkey") % 16).as("bucket"),
          col("o_orderdate").cast("date").as("dy"), cents.as("c"))
        .groupBy("bucket", "dy").agg(sum("c").as("c"))
      val st = d.groupBy("bucket")
        .agg(count(lit(1)).as("n"), sum("c").as("tt"))
      val w = Window.partitionBy("bucket").orderBy("dy")
      d.join(broadcast(st), "bucket")
        .withColumn("cusum",
          sum(col("c") * col("n") - col("tt")).over(w))
        .groupBy("bucket")
        .agg(max("n").as("n_days"),
          sum(when(abs(col("cusum")) * 20 > col("n") * col("tt"), 1L)
            .otherwise(0L)).as("n_shift_days"),
          max(abs(col("cusum"))).as("max_abs"))
        .count()
    }

    def w9(o: DataFrame): Long = {
      val d = o.select((col("o_custkey") % 16).as("bucket"),
        col("o_orderdate").cast("date").as("dy")).distinct()
      val w = Window.partitionBy("bucket").orderBy("dy")
      d.withColumn("island",
          datediff(col("dy"), lit("1970-01-01").cast("date")).cast("long")
            - row_number().over(w))
        .groupBy("bucket", "island").agg(count(lit(1)).as("run_len"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_islands"), max("run_len").as("mx"),
          sum("run_len").as("n_days"))
        .count()
    }

    def rfm1(o: DataFrame): Long = {
      val m = graft.operators.FrameCaches.track(
        o.groupBy(col("o_custkey").as("ck"))
          .agg(max(col("o_orderdate").cast("date")).as("last_day"),
            count(lit(1)).as("freq"), sum(cents).as("money")).persist())
      val anchor = m.agg(max("last_day").as("anchor"))
      val r = m.crossJoin(broadcast(anchor))
        .select(col("ck"),
          datediff(col("anchor"), col("last_day")).cast("long").as("rec"),
          col("freq"), col("money"))
      def qd(p: String, c: String, as: String) =
        expr(s"CAST(PERCENTILE_DISC($p) WITHIN GROUP (ORDER BY $c) AS BIGINT)")
          .as(as)
      val q = r.agg(
        qd("0.25", "rec", "r1"), qd("0.50", "rec", "r2"), qd("0.75", "rec", "r3"),
        qd("0.25", "freq", "f1"), qd("0.50", "freq", "f2"), qd("0.75", "freq", "f3"),
        qd("0.25", "money", "m1"), qd("0.50", "money", "m2"), qd("0.75", "money", "m3"))
      r.crossJoin(broadcast(q))
        .select(
          when(col("rec") <= col("r1"), 4L).when(col("rec") <= col("r2"), 3L)
            .when(col("rec") <= col("r3"), 2L).otherwise(1L).as("r_score"),
          when(col("freq") <= col("f1"), 1L).when(col("freq") <= col("f2"), 2L)
            .when(col("freq") <= col("f3"), 3L).otherwise(4L).as("f_score"),
          when(col("money") <= col("m1"), 1L).when(col("money") <= col("m2"), 2L)
            .when(col("money") <= col("m3"), 3L).otherwise(4L).as("m_score"))
        .groupBy("r_score", "f_score", "m_score").count().count()
    }

    def t21(d: DataFrame): Long =
      graft.operators.Curation.weightedSample(
        d.select(col("doc_id"), col("lang"), col("n_chars")),
        col("lang"), col("doc_id"), col("n_chars"), 5).count()

    def tw4(d: DataFrame): Long = {
      val top = d
        .select(explode(graft.functions.TextFunctions
          .tokens(lower(col("text")))).as("word"))
        .groupBy("word").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word")).limit(100)
      val w = Window.orderBy(col("n").desc, col("word"))
      top.coalesce(1).withColumn("rnk", row_number().over(w))
        .selectExpr("CAST(FLOOR(LN(rnk) * 1000 + 0.5) AS BIGINT) AS x",
          "CAST(FLOOR(LN(n) * 1000 + 0.5) AS BIGINT) AS y")
        .agg(count(lit(1)).as("k"), sum("x").as("sx"), sum("y").as("sy"),
          sum(expr("x * y")).as("sxy"), sum(expr("x * x")).as("sxx"))
        .count()
    }

    def dp6(d: DataFrame): Long = {
      val c = graft.operators.FrameCaches.track(
        d.select("source", "lang").groupBy("source", "lang")
          .agg(count(lit(1)).as("n")).persist())
      val sTot = c.groupBy("source").agg(sum("n").as("ns"))
      val lTot = c.groupBy("lang").agg(sum("n").as("nl"))
      val tot = c.agg(sum("n").as("nt"))
      c.join(broadcast(sTot), "source").join(broadcast(lTot), "lang")
        .crossJoin(broadcast(tot))
        .agg(sum((col("n") / col("nt")) *
          log((col("n") / col("nt")) /
            ((col("ns") / col("nt")) * (col("nl") / col("nt"))))).as("mi"))
        .count()
    }

    println(s"[r12c-scale] mult=$mult dir=$dir")
    val s1 = time("sq1 transitions 1x")(sq1(events))
    val sN = time(s"sq1 transitions ${mult}x")(sq1(evN))
    exp("sq1", s1, sN)
    val t1 = time("ts3 cusum 1x")(ts3(orders))
    val tN = time(s"ts3 cusum ${mult}x")(ts3(ordCells))
    exp("ts3", t1, tN)
    val w1 = time("w9 islands 1x")(w9(orders))
    val wN = time(s"w9 islands ${mult}x")(w9(ordCells))
    exp("w9", w1, wN)
    val r1 = time("rfm1 segments 1x")(rfm1(orders))
    val rN = time(s"rfm1 segments ${mult}x")(rfm1(ordCust))
    exp("rfm1", r1, rN)
    val u1 = time("t21 weighted sample 1x")(t21(documents))
    val uN = time(s"t21 weighted sample ${mult}x")(t21(docN))
    exp("t21", u1, uN)
    val z1 = time("tw4 zipf 1x")(tw4(documents))
    val zN = time(s"tw4 zipf ${mult}x")(tw4(docN))
    exp("tw4", z1, zN)
    val m1 = time("dp6 mi 1x")(dp6(documents))
    val mN = time(s"dp6 mi ${mult}x")(dp6(docN))
    exp("dp6", m1, mN)

    // gr4 over disjoint graph copies (gr3's growth model: shift both
    // the basket and the item space so copies never share a vertex)
    val lineitem = Tables.load(spark, dir, "lineitem")
    def gr4(li: DataFrame): Long = {
      val edges = graft.operators.Itemsets.itemPairs(li,
        "l_orderkey", "l_partkey", minSupport = 1L, maxBasketSize = Some(64))
      graft.operators.Triangles.vertexTriangles(edges, "p1", "p2")
        .filter(col("deg") >= 2)
        .selectExpr("(2000 * tri) DIV (deg * (deg - 1)) DIV 100 AS bucket",
          "tri", "deg")
        .groupBy("bucket").agg(count(lit(1)), sum("tri"), sum("deg"))
        .count()
    }
    val li1 = lineitem.select("l_orderkey", "l_partkey")
    val liN = spark.range(mult).toDF("rep").crossJoin(li1)
      .select((col("l_orderkey") + col("rep") * shift).as("l_orderkey"),
        (col("l_partkey") + col("rep") * shift).as("l_partkey"))
    val g1 = time("gr4 clustering 1x")(gr4(li1))
    val gN = time(s"gr4 clustering ${mult}x")(gr4(liN))
    exp("gr4", g1, gN)
    spark.stop()
  }
}
