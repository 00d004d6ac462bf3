package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-11 scale rehearsal (not part of the library API): q2 and q20
  * re-measured at N× corpus mass — the two partsupp consumers the
  * round-10 record left at gate-scale numbers only (q9's 10× exponent
  * is in BASELINE.md §round-10).
  *
  * Growth model: "more transactions, NEW long-tail parts" — lineitem
  * replicates N× with part keys shifted per replica, while the `part`
  * catalog (and with it each query's part restriction: q2's
  * p_size/p_type cut, q20's absolute `p_partkey < 100` family) stays
  * FIXED. This grows the UNRESTRICTED pair universe N× while the
  * restricted set is constant — exactly the axis the semi-join-
  * restricted partsupp synthesis claims to be insensitive to: the
  * md5/distinct mass rides the RESTRICTION, and only the broadcast
  * semi probe (scan-fused, no shuffle) sees the corpus. Expected
  * exponents well below 1; ~1.0 would mean the synthesis secretly
  * rides the corpus.
  *
  * Shapes are inline decorrelated twins of the library queries
  * (parameterized on the replicated frame — the shipped queries read
  * parquet via Tables.load and cannot be fed a frame): q2's per-part
  * MIN + equality join, q20's pair-window aggregate + excess-stock
  * semi chain. Prints log(tN/t1)/log(N) — 1.0 linear, 2.0 quadratic.
  * Usage: Test/runMain graft.ProfileR11Scale [mult] [sfDir].
  * Measured numbers are recorded in BASELINE.md §round-11.
  */
object ProfileR11Scale {
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
      println(f"[r11-scale] $name%-30s $med%8.2f s  (${ts.head._2} rows)")
      med
    }
    def exp(name: String, t1: Double, tN: Double): Unit =
      println(f"[r11-scale] $name exponent: ${math.log(tN / t1) / math.log(mult)}%.2f")

    val li0 = Tables.load(spark, dir, "lineitem")
    val part = Tables.load(spark, dir, "part")
    val supplier = Tables.load(spark, dir, "supplier")
    val nation = Tables.load(spark, dir, "nation")
    val region = Tables.load(spark, dir, "region")
    val shift = 100000000L
    // new-parts growth: replicas carry part keys OUTSIDE the fixed
    // catalog, so every part restriction keeps exactly the 1x set
    val liN = spark.range(mult).toDF("rep").crossJoin(li0)
      .withColumn("l_partkey",
        when(col("rep") === 0, col("l_partkey"))
          .otherwise(col("l_partkey") + col("rep") * shift))
      .drop("rep")
    println(s"[r11-scale] lineitem ${li0.count()} at 1x -> ${mult}x with " +
      "shifted part keys; part catalog + restrictions fixed")

    // the mandatory linear floor: ANY consumer must at least produce/
    // scan the N× corpus once — exponents should be read against this,
    // not against zero (a query at the scan exponent is scan-bound,
    // not synthesis-bound)
    def scanOnly(li: DataFrame): Long =
      li.agg(sum(col("l_partkey") + col("l_suppkey"))).count()
    scanOnly(li0) // warm
    val s1 = time("1x  bare corpus scan")(scanOnly(li0))
    val sN = time(s"${mult}x bare corpus scan")(scanOnly(liN))
    exp("scan", s1, sN)

    import graft.functions.VectorExpressions.hexSliceToLong
    def psRestricted(li: DataFrame, partKeys: DataFrame): DataFrame = {
      val h = md5(concat(lit("ps:"), col("ps_partkey").cast("string"),
        lit(":"), col("ps_suppkey").cast("string")))
      li.select(col("l_partkey").as("ps_partkey"),
          col("l_suppkey").as("ps_suppkey"))
        .join(broadcast(partKeys.select(col("p_partkey").as("ps_partkey"))),
          Seq("ps_partkey"), "left_semi")
        .distinct()
        .withColumn("ps_supplycost_cents", hexSliceToLong(h, 1, 14) % 99901L + 100L)
        .withColumn("ps_availqty", hexSliceToLong(h, 15, 14) % 9999L + 1L)
    }

    val euroSupp = supplier
      .join(broadcast(nation.join(broadcast(region.filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))),
        col("s_nationkey") === col("n_nationkey"))

    // ---- q2: min-cost supplier (correlated MIN, decorrelated) ----
    def q2(li: DataFrame): Long = {
      val pk = part.filter(col("p_size").between(1, 15) && col("p_type") === "PROMO")
        .select("p_partkey")
      // persisted: the twin references ps twice (outer + MIN aggregate)
      // as two plan instances; the shipped single SQL plan gets the
      // same single-compute via ReusedExchange, so an unpersisted twin
      // would double-charge the synthesis and overstate the exponent
      val ps = psRestricted(li, pk)
        .join(broadcast(euroSupp.select("s_suppkey", "s_name", "s_acctbal", "n_name")),
          col("ps_suppkey") === col("s_suppkey"))
        .persist()
      val minCost = ps.groupBy(col("ps_partkey").as("mk"))
        .agg(min("ps_supplycost_cents").as("min_cost"))
      val n = ps.join(minCost, col("ps_partkey") === col("mk") &&
          col("ps_supplycost_cents") === col("min_cost"))
        .join(broadcast(pk), col("ps_partkey") === col("p_partkey"))
        .count()
      ps.unpersist(blocking = true)
      n
    }
    q2(li0) // warm codegen/scheduler so 1x isn't the cold run
    val a1 = time("1x  q2 min-cost supplier")(q2(li0))
    val aN = time(s"${mult}x q2 min-cost supplier")(q2(liN))
    exp("q2", a1, aN)

    // ---- q20: excess stock (pair-window SUM + semi chain) ----
    def q20(li: DataFrame): Long = {
      val pk = part.filter(col("p_partkey") < 100 && col("p_name").like("%widget%"))
        .select("p_partkey")
      val windowSums = li
        .filter(col("l_shipdate") >= lit("1996-01-01") &&
          col("l_shipdate") < lit("1997-01-01"))
        .join(broadcast(pk), col("l_partkey") === col("p_partkey"), "left_semi")
        .groupBy(col("l_partkey").as("wk"), col("l_suppkey").as("ws"))
        .agg((lit(100L) * sum(floor(col("l_quantity")).cast("long"))).as("threshold"))
      val excess = psRestricted(li, pk)
        .join(windowSums, col("ps_partkey") === col("wk") &&
          col("ps_suppkey") === col("ws"))
        .filter(col("ps_availqty") > col("threshold"))
        .select("ps_suppkey").distinct()
      euroSupp.join(excess, col("s_suppkey") === col("ps_suppkey"), "left_semi")
        .count()
    }
    q20(li0) // warm
    val b1 = time("1x  q20 excess stock")(q20(li0))
    val bN = time(s"${mult}x q20 excess stock")(q20(liN))
    exp("q20", b1, bN)

    // ---- gr2: 3-hop BFS, customers xN (edges xN, supplier hubs fatten —
    //      gr1's growth model; frontier bounded by |V|, never paths) ----
    val orders = Tables.load(spark, dir, "orders").select("o_orderkey", "o_custkey")
    def gr2(li: DataFrame, or: DataFrame): Long = {
      val pairs = li.join(or, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("c"), col("l_suppkey").as("sk"))
        .distinct()
      val edges = pairs.select((col("c") * 2).as("src"), (col("sk") * 2 + 1).as("dst"))
        .unionByName(pairs.select((col("sk") * 2 + 1).as("src"), (col("c") * 2).as("dst")))
        .repartition(col("src")).persist()
      edges.count()
      val n = graft.operators.Traversal.reachable(edges, Seq(3L), maxDepth = 3).count()
      graft.operators.FrameCaches.release(spark)
      edges.unpersist(blocking = true)
      n
    }
    // grow CUSTOMERS (and with them orders/edges) xN: shifted custkeys
    // keep the graph consistent; supplier nodes fatten into hubs
    val orN = spark.range(mult).toDF("rep").crossJoin(orders)
      .select((col("o_orderkey") + col("rep") * shift).as("o_orderkey"),
        (col("o_custkey") + col("rep") * shift).as("o_custkey"))
    val liNOrders = spark.range(mult).toDF("rep").crossJoin(li0)
      .withColumn("l_orderkey", col("l_orderkey") + col("rep") * shift)
      .drop("rep")
    gr2(li0, orders) // warm
    val c1 = time("1x  gr2 3-hop BFS")(gr2(li0, orders))
    val cN = time(s"${mult}x gr2 3-hop BFS")(gr2(liNOrders, orN))
    exp("gr2", c1, cN)

    // ---- fi2: association rules, baskets xN (pair mass xN, rides fi1's
    //      exponent; the rules stages add item-table joins ~fixed) ----
    def fi2(li: DataFrame): Long =
      graft.operators.Itemsets.associationRules(li, "l_orderkey", "l_partkey",
        minSupport = 2L, maxBasketSize = Some(64)).count()
    fi2(li0) // warm
    val d1 = time("1x  fi2 assoc rules")(fi2(li0))
    val dN = time(s"${mult}x fi2 assoc rules")(fi2(
      spark.range(mult).toDF("rep").crossJoin(li0)
        .withColumn("l_orderkey", col("l_orderkey") + col("rep") * shift)
        .drop("rep")))
    exp("fi2", d1, dN)

    spark.stop()
  }
}
