package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational-family scale rehearsal (not part of the library API):
  * the round-9 TPC-H batch's heavy shapes re-measured at N× fact mass.
  * Growth model: "more transactions, same catalog" — lineitem and
  * orders replicate N× with order keys shifted per replica (so the
  * join keys stay consistent and every order stays intact), while
  * part/supplier universes stay FIXED. That fattens every per-part and
  * per-(order, supplier) group N× — the load that breaks a plan whose
  * cost rides group fan-out rather than row count.
  *
  * Shapes measured (inline twins of the library queries, parameterized
  * on the replicated frames):
  *   - q17: per-part aggregate + equi join back + filtered fold —
  *     part count fixed, rows N× ⇒ expected exponent ~1.0;
  *   - q21: per-(order, supplier) aggregate (cached once) + semi +
  *     anti probes — order count N× ⇒ expected ~1.0;
  *   - fi1: per-order sorted basket + pair generator + support count —
  *     basket SIZE fixed (≤7 lines/order), baskets N× ⇒ pair mass N×,
  *     expected ~1.0 (the Σ basket² bound scales with basket count).
  *
  * Prints log(tN/t1)/log(N) per shape — 1.0 linear, 2.0 quadratic.
  * Usage: runMain graft.ProfileTpch [mult] (default 10 ⇒ 6M lines).
  * Measured numbers are recorded in BASELINE.md §round-9.
  */
object ProfileTpch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val mult = args.lift(0).map(_.toInt).getOrElse(10)
    val dir = "/root/testdata/sf0.1"

    def time(name: String)(f: => Long): Double = {
      val t0 = System.nanoTime()
      val n = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[tpch-scale] $name%-32s $s%8.2f s  ($n rows)")
      s
    }
    def exp(name: String, t1: Double, tN: Double): Unit =
      println(f"[tpch-scale] $name exponent: ${math.log(tN / t1) / math.log(mult)}%.2f")

    val li0 = Tables.load(spark, dir, "lineitem")
    val or0 = Tables.load(spark, dir, "orders")
    val shift = 100000000L
    def rep(df: DataFrame, key: String): DataFrame =
      spark.range(mult).toDF("rep").crossJoin(df)
        .withColumn(key, col(key) + col("rep") * shift).drop("rep")
    val liN = rep(li0, "l_orderkey")
    val orN = rep(or0, "o_orderkey")
    println(s"[tpch-scale] lineitem ${li0.count()} at 1x -> ${mult}x; " +
      "part/supplier catalogs fixed")

    def q17(li: DataFrame): Long = {
      val qty = floor(col("l_quantity")).cast("long")
      val perPart = li.groupBy(col("l_partkey").as("pk"))
        .agg(sum(qty).as("sum_qty"), count(lit(1)).as("cnt"))
      li.join(perPart, col("l_partkey") === col("pk"))
        .filter(lit(2L) * qty * col("cnt") < col("sum_qty"))
        .agg(count(lit(1)).as("n_lines")).count()
    }
    val a1 = time("1x  q17 per-part avg")(q17(li0))
    val aN = time(s"${mult}x q17 per-part avg")(q17(liN))
    exp("q17", a1, aN)

    def q21(li: DataFrame, or: DataFrame): Long = {
      val ol = li
        .join(or.select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(max(when(
          col("l_shipdate") > expr("o_orderdate + INTERVAL 90 DAY"), 1)
          .otherwise(0)).as("late"))
        .persist()
      val others = ol.select(col("l_orderkey").as("p_ok"),
        col("l_suppkey").as("p_sk"), col("late").as("p_late"))
      val n = ol.filter(col("late") === 1)
        .join(others.select("p_ok", "p_sk"),
          col("p_ok") === col("l_orderkey") &&
            col("p_sk") =!= col("l_suppkey"), "left_semi")
        .join(others.filter(col("p_late") === 1).select("p_ok", "p_sk"),
          col("p_ok") === col("l_orderkey") &&
            col("p_sk") =!= col("l_suppkey"), "left_anti")
        .groupBy("l_suppkey").agg(count(lit(1))).count()
      ol.unpersist(blocking = true)
      n
    }
    val b1 = time("1x  q21 sole-late")(q21(li0, or0))
    val bN = time(s"${mult}x q21 sole-late")(q21(liN, orN))
    exp("q21", b1, bN)

    def fi1(li: DataFrame): Long =
      li.groupBy("l_orderkey")
        .agg(sort_array(collect_set(col("l_partkey"))).as("items"))
        .select(explode(expr(
          """flatten(transform(items, (x, i) ->
            |  transform(slice(items, i + 2, size(items)),
            |    y -> struct(x AS p1, y AS p2))))""".stripMargin)).as("pr"))
        .select(col("pr.p1").as("p1"), col("pr.p2").as("p2"))
        .groupBy("p1", "p2").agg(count(lit(1)).as("support"))
        .filter(col("support") >= 2).count()
    val c1 = time("1x  fi1 pair mining")(fi1(li0))
    val cN = time(s"${mult}x fi1 pair mining")(fi1(liN))
    exp("fi1", c1, cN)

    // q9 (round 10): the 6-way profit DAG including the partsupp
    // synthesis itself. Replication shifts order keys only, so the
    // distinct (partkey, suppkey) PAIR SET is fixed while the distinct's
    // input mass (and every fact-side join) grows N× — the synthesis
    // cost must ride fact mass linearly, the dims stay broadcast.
    def q9(li: DataFrame, or: DataFrame): Long = {
      import graft.functions.VectorExpressions.hexSliceToLong
      val part = Tables.load(spark, dir, "part")
      val widget = part.filter(col("p_name").like("%widget%")).select("p_partkey")
      val supp = Tables.load(spark, dir, "supplier")
      val nat = Tables.load(spark, dir, "nation")
      val h = md5(concat(lit("ps:"), col("ps_partkey").cast("string"),
        lit(":"), col("ps_suppkey").cast("string")))
      val ps = li.select(col("l_partkey").as("ps_partkey"),
          col("l_suppkey").as("ps_suppkey"))
        .join(broadcast(widget.withColumnRenamed("p_partkey", "ps_partkey")),
          Seq("ps_partkey"), "left_semi")
        .distinct()
        .withColumn("ps_supplycost_cents", hexSliceToLong(h, 1, 14) % 99901L + 100L)
      val revCents = floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        * 100 + lit(0.5)).cast("long")
      val qty = floor(col("l_quantity")).cast("long")
      li.join(broadcast(widget), col("l_partkey") === col("p_partkey"))
        .join(or.select("o_orderkey", "o_orderdate"),
          col("l_orderkey") === col("o_orderkey"))
        .join(ps, col("l_partkey") === col("ps_partkey") &&
          col("l_suppkey") === col("ps_suppkey"))
        .join(broadcast(supp.select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .select(col("n_name").as("nation"),
          year(col("o_orderdate")).as("o_year"),
          (revCents - col("ps_supplycost_cents") * qty).as("amount"))
        .groupBy("nation", "o_year").agg(sum("amount")).count()
    }
    val d1 = time("1x  q9 profit DAG")(q9(li0, or0))
    val dN = time(s"${mult}x q9 profit DAG")(q9(liN, orN))
    exp("q9", d1, dN)

    spark.stop()
  }
}
