package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-12 scale rehearsal (not part of the library API): rc1 and rc3
  * re-measured at N× corpus mass — the round-11 verdict asked for the
  * "recursion pacing is flat in corpus mass" claim to be MEASURED, not
  * argued (gr2/fi2 got the same treatment in round 11).
  *
  * Growth model: the FACT side replicates N× (suppliers with shifted
  * keys for rc1, orders with shifted keys for rc3) while the loop
  * relation's cardinality is invariant by construction — rc1's frontier
  * is |regions| (5), rc3's series is |priorities|×|quarters| (135):
  * both queries AGGREGATE BEFORE RECURSING, so the N× mass is paid once
  * in a map-side-combined aggregate and the serial UnionLoop iterations
  * ride a constant-size relation. Expected exponents ≈ the bare-scan
  * floor or below; ~1.0 would mean the loop secretly re-scans the
  * corpus per iteration.
  *
  * Shapes are inline twins of the shipped queries, parameterized on the
  * replicated frame (the shipped queries read parquet via Tables.load
  * and cannot be fed a frame). Prints log(tN/t1)/log(N).
  * Usage: Test/runMain graft.ProfileR12Scale [mult] [sfDir].
  * Measured numbers are recorded in BASELINE.md §round-12.
  */
object ProfileR12Scale {
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
      println(f"[r12-scale] $name%-30s $med%8.2f s  (${ts.head._2} rows)")
      med
    }
    def exp(name: String, t1: Double, tN: Double): Unit =
      println(f"[r12-scale] $name exponent: ${math.log(tN / t1) / math.log(mult)}%.2f")

    val supplier = Tables.load(spark, dir, "supplier")
    val nation = Tables.load(spark, dir, "nation")
    val region = Tables.load(spark, dir, "region")
    val orders = Tables.load(spark, dir, "orders")
    val shift = 100000000L

    // N× suppliers (new keys, same balances/nations): rc1's anchor
    // aggregate sees N× rows; the 24-iteration loop still sees 5
    val supN = spark.range(mult).toDF("rep").crossJoin(supplier)
      .withColumn("s_suppkey",
        when(col("rep") === 0, col("s_suppkey"))
          .otherwise(col("s_suppkey") + col("rep") * shift))
      .drop("rep")
    // N× orders (new keys, same dates/priorities/prices): rc3's series
    // aggregate sees N× rows; the 27-step loop still sees 135
    val ordN = spark.range(mult).toDF("rep").crossJoin(orders)
      .withColumn("o_orderkey",
        when(col("rep") === 0, col("o_orderkey"))
          .otherwise(col("o_orderkey") + col("rep") * shift))
      .drop("rep")
    println(s"[r12-scale] supplier ${supplier.count()} / orders " +
      s"${orders.count()} at 1x -> ${mult}x with shifted keys")

    // the mandatory linear floor (generation + one scan of the N× mass)
    def scanOnly(o: DataFrame): Long =
      o.agg(sum(col("o_orderkey") % 97)).count()
    scanOnly(orders) // warm
    val s1 = time("1x  bare orders scan")(scanOnly(orders))
    val sN = time(s"${mult}x bare orders scan")(scanOnly(ordN))
    exp("scan", s1, sN)

    def rc1Twin(sup: DataFrame): Long = {
      sup.createOrReplaceTempView("p_supplier")
      nation.createOrReplaceTempView("p_nation")
      region.createOrReplaceTempView("p_region")
      spark.sql(
        """WITH RECURSIVE am(region, month, balance_cents, pay) AS (
          |  SELECT r_name, 0,
          |    CAST(SUM(CAST(FLOOR(ABS(s_acctbal) * 100 + 0.5) AS BIGINT))
          |      AS BIGINT),
          |    CAST(SUM(CAST(FLOOR(ABS(s_acctbal) * 100 + 0.5) AS BIGINT))
          |      DIV 48 AS BIGINT)
          |  FROM p_supplier JOIN p_nation ON s_nationkey = n_nationkey
          |    JOIN p_region ON n_regionkey = r_regionkey
          |  GROUP BY r_name
          |  UNION ALL
          |  SELECT region, month + 1,
          |    balance_cents + balance_cents DIV 100 - pay, pay
          |  FROM am WHERE month < 24)
          |SELECT region, month, balance_cents FROM am""".stripMargin).count()
    }
    rc1Twin(supplier) // warm
    val a1 = time("1x  rc1 amortization twin")(rc1Twin(supplier))
    val aN = time(s"${mult}x rc1 amortization twin")(rc1Twin(supN))
    exp("rc1", a1, aN)

    def rc3Twin(o: DataFrame): Long = {
      val series = o
        .groupBy(col("o_orderpriority").as("pri"),
          ((year(col("o_orderdate").cast("date")) - 1995) * 4 +
            quarter(col("o_orderdate").cast("date")) - 1).as("qidx"))
        .agg(sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
          .cast("long").as("cents"))
      series.persist().count()
      series.createOrReplaceTempView("p_ema_series")
      val n = spark.sql(
        """WITH RECURSIVE ema(pri, qidx, cents, ema_cents) AS (
          |  SELECT pri, qidx, cents, cents FROM (
          |    SELECT pri, qidx, cents,
          |      MIN(qidx) OVER (PARTITION BY pri) AS _mn
          |    FROM p_ema_series) WHERE qidx = _mn
          |  UNION ALL
          |  SELECT s.pri, s.qidx, s.cents,
          |    (200 * s.cents + 800 * e.ema_cents) DIV 1000
          |  FROM ema e JOIN p_ema_series s
          |    ON s.pri = e.pri AND s.qidx = e.qidx + 1)
          |SELECT pri, qidx, cents, ema_cents FROM ema""".stripMargin).count()
      series.unpersist()
      n
    }
    rc3Twin(orders) // warm
    val e1 = time("1x  rc3 ema twin")(rc3Twin(orders))
    val eN = time(s"${mult}x rc3 ema twin")(rc3Twin(ordN))
    exp("rc3", e1, eN)

    spark.stop()
  }
}
