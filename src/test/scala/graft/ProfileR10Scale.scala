package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 scale rehearsal (not part of the library API): the three
  * new data-shaped operators re-measured at N× their driving mass,
  * growth model chosen per operator so the axis that carries the cost
  * is the one that grows:
  *   - w8 SCD2: orders ×N per CUSTOMER (shifted order keys, custkey
  *     fixed) — windows and islands per customer fatten N×;
  *   - t20 bigram LM: documents ×N (shifted doc ids, texts fixed) —
  *     the model's distinct-bigram mass stays FIXED while scoring
  *     occurrences grow N× (exactly the 100 TB claim: model sublinear,
  *     scoring linear);
  *   - gr1 PageRank: customers ×N (shifted node ids, suppliers fixed)
  *     — edges grow N×, supplier hubs fatten N× (the skew direction).
  * Prints log(tN/t1)/log(N) per shape — 1.0 linear, 2.0 quadratic.
  * Usage: Test/runMain graft.ProfileR10Scale [mult] [sfDir].
  */
object ProfileR10Scale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val mult = args.lift(0).map(_.toInt).getOrElse(10)
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")

    def time(name: String)(f: => Long): Double = {
      val t0 = System.nanoTime()
      val n = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[r10-scale] $name%-28s $s%8.2f s  ($n rows)")
      s
    }
    def exp(name: String, t1: Double, tN: Double): Unit =
      println(f"[r10-scale] $name exponent: ${math.log(tN / t1) / math.log(mult)}%.2f")

    val W = org.apache.spark.sql.expressions.Window
    val shift = 100000000L

    def rep(df: DataFrame, keys: String*): DataFrame =
      spark.range(mult).toDF("rep").crossJoin(df)
        .select(df.columns.map(c =>
          if (keys.contains(c)) (col(c) + col("rep") * shift).as(c)
          else col(c)).toSeq: _*)

    // ---- w8: SCD2 islands, orders xN per customer ----
    val or0 = Tables.load(spark, dir, "orders")
    def scd2(orders: DataFrame): Long = {
      val wOrd = W.partitionBy("o_custkey").orderBy("odate", "o_orderkey")
      orders
        .select(col("o_custkey"), col("o_orderdate").cast("date").as("odate"),
          col("o_orderkey"), col("o_orderpriority").as("priority"))
        .withColumn("chg", when(lag("priority", 1).over(wOrd).isNull ||
          lag("priority", 1).over(wOrd) =!= col("priority"), 1L).otherwise(0L))
        .withColumn("grp", sum("chg").over(
          wOrd.rowsBetween(W.unboundedPreceding, W.currentRow)))
        .groupBy("o_custkey", "grp")
        .agg(min("priority").as("priority"), min("odate").as("valid_from"),
          count(lit(1)).as("n_orders"))
        .count()
    }
    scd2(or0) // warm codegen/scheduler so 1x isn't the cold run
    val a1 = time("1x  w8 scd2 islands")(scd2(or0))
    val aN = time(s"${mult}x w8 scd2 islands")(scd2(rep(or0, "o_orderkey")))
    exp("w8", a1, aN)

    // ---- t20: bigram LM, documents xN (model fixed, scoring xN) ----
    val docs0 = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
    def lm(docs: DataFrame): Long = {
      val base = docs.select(col("doc_id"),
        graft.functions.TextFunctions.tokens(col("text")).as("toks"))
      val bi = base.select(col("doc_id"), explode(expr(
          """transform(sequence(1, size(toks) - 1),
            |  i -> struct(element_at(toks, i) AS w1,
            |              element_at(toks, i + 1) AS w2))""".stripMargin)).as("bg"))
        .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      val uni = base.select(explode(col("toks")).as("w1"))
        .groupBy("w1").agg(count(lit(1)).as("c1"))
      val model = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
        .join(uni, "w1")
        .select(col("w1"), col("w2"),
          log(col("c2").cast("double") / col("c1")).as("lp"))
      bi.join(model, Seq("w1", "w2"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n"), sum("lp").as("s"))
        .count()
    }
    lm(docs0) // warm
    val b1 = time("1x  t20 bigram LM")(lm(docs0))
    val bN = time(s"${mult}x t20 bigram LM")(lm(rep(docs0, "doc_id")))
    exp("t20", b1, bN)

    // ---- gr1: PageRank, customers xN (edges xN, supplier hubs fatten) ----
    val pairs0 = Tables.load(spark, dir, "lineitem")
      .join(Tables.load(spark, dir, "orders").select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("sk"))
      .distinct()
    def pagerank(pairs: DataFrame): Long = {
      val Scale = 1000000000000L
      val edges = pairs
        .select((col("c") * 2).as("src"), (col("sk") * 2 + 1).as("dst"))
        .unionByName(pairs.select((col("sk") * 2 + 1).as("src"),
          (col("c") * 2).as("dst")))
        .repartition(col("src")) // the shipped gr1 shape: cache co-located
        .persist()
      val deg = edges.groupBy("src").agg(count(lit(1)).as("d"))
      val p1 = edges.join(deg, "src")
        .groupBy(col("dst").as("node_id"))
        .agg(sum(expr(s"$Scale div d")).as("in1"))
        .select(col("node_id"),
          expr(s"${15 * (Scale / 100)} + (85 * in1) div 100").as("pr"))
      val n = p1.join(edges, col("node_id") === col("src"))
        .join(deg, "src")
        .select(col("dst"), expr("pr div d").as("contrib"))
        .groupBy(col("dst")).agg(sum("contrib")).count()
      edges.unpersist(blocking = true)
      n
    }
    pagerank(pairs0) // warm
    val c1 = time("1x  gr1 pagerank")(pagerank(pairs0))
    val cN = time(s"${mult}x gr1 pagerank")(pagerank(rep(pairs0, "c")))
    exp("gr1", c1, cN)

    spark.stop()
  }
}
