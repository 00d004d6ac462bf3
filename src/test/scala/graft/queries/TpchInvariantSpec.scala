package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Structural invariants for the round-9 TPC-H batch — relationships
  * the DuckDB hash-compare cannot see because they tie a query's output
  * to OTHER relations (conservation laws, discriminativeness of the
  * designed subjects, in-engine equivalence of the decorrelated
  * spelling). All run at sf0.001.
  */
class TpchInvariantSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def q(name: String) = graft.SparkEntry.queries(name)(spark, dir)

  test("q13: the count distribution conserves the customer universe") {
    val dist = q("q13_order_dist").agg(sum("custdist")).head.getLong(0)
    val customers = graft.Tables.load(spark, dir, "customer").count()
    assert(dist == customers,
      s"distribution covers $dist customers, table has $customers")
  }

  test("q16: the NOT IN exclusion is discriminative, not vacuous") {
    graft.Tables.register(spark, dir, Seq("lineitem", "part", "supplier"))
    val without = spark.sql(
      """SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |GROUP BY p_brand, p_size""".stripMargin)
      .agg(sum("supplier_cnt")).head.getLong(0)
    val withEx = q("q16_supplier_diversity")
      .agg(sum("supplier_cnt")).head.getLong(0)
    assert(withEx < without,
      s"exclusion removed nothing ($withEx vs $without) — vacuous subject")
  }

  test("q17: decorrelated result equals the correlated spelling in-engine") {
    graft.Tables.register(spark, dir, Seq("lineitem"))
    val correlated = spark.sql(
      """SELECT COUNT(*) AS n_lines,
        |  CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
        |    AS BIGINT) AS rev_cents
        |FROM lineitem l1
        |WHERE 2 * CAST(FLOOR(l_quantity) AS BIGINT) *
        |    (SELECT COUNT(*) FROM lineitem l2
        |     WHERE l2.l_partkey = l1.l_partkey) <
        |  (SELECT CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT)
        |   FROM lineitem l3 WHERE l3.l_partkey = l1.l_partkey)""".stripMargin)
      .head
    val decorr = q("q17_small_qty").head
    assert(decorr.getLong(0) == correlated.getLong(0) &&
      decorr.getLong(1) == correlated.getLong(1),
      s"decorrelated $decorr != correlated $correlated")
  }

  test("q21: sole-late attributions never exceed the late (order, supplier) mass") {
    // finally: drain the q21 persist even when the assert fails (advice r9)
    try {
      val numwait = q("q21_late_solo").agg(sum("numwait")).head.getLong(0)
      graft.Tables.register(spark, dir, Seq("lineitem", "orders"))
      val lateMass = spark.sql(
        """SELECT COUNT(*) FROM (
          |  SELECT l_orderkey, l_suppkey
          |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          |  GROUP BY l_orderkey, l_suppkey
          |  HAVING MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
          |    THEN 1 ELSE 0 END) = 1)""".stripMargin).head.getLong(0)
      assert(numwait > 0 && numwait <= lateMass,
        s"numwait $numwait outside (0, late mass $lateMass]")
    } finally spark.catalog.clearCache()
  }

  test("partsupp synthesis: one row per observed pair, attributes in their designed ranges") {
    graft.Tables.register(spark, dir, Seq("lineitem"))
    val pairs = spark.sql(
      "SELECT COUNT(*) FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)")
      .head.getLong(0)
    val ps = Relational.partsuppFrame(spark, dir)
    assert(ps.count() == pairs, "partsupp must be exactly the observed pairs")
    val bad = ps.filter(
      col("ps_supplycost_cents") < 100 || col("ps_supplycost_cents") > 100000 ||
      col("ps_availqty") < 1 || col("ps_availqty") > 9999).count()
    assert(bad == 0, s"$bad rows outside the md5-derived attribute ranges")
  }

  test("partsupp restriction is value-neutral: restricted view == full view filtered") {
    // q2/q9/q20 hand the synthesis a part-key restriction (the manual
    // pushdown Catalyst cannot do through a correlated subquery); the
    // md5 derivation is per-pair, so the restricted frame must be
    // BIT-IDENTICAL to the full frame filtered to the same keys — if
    // the restriction ever changed a derived attribute, the oracle CTE
    // (which always derives from the full distinct) would diverge.
    graft.Tables.register(spark, dir, Seq("part", "lineitem"))
    val keys = spark.table("part")
      .filter(col("p_partkey") < 100 && col("p_name").like("%widget%"))
      .select("p_partkey")
    val restricted = Relational.partsuppFrame(spark, dir, Some(keys))
    val fullFiltered = Relational.partsuppFrame(spark, dir)
      .join(keys.withColumnRenamed("p_partkey", "ps_partkey"),
        Seq("ps_partkey"), "left_semi")
    assert(restricted.count() > 0, "restriction subject must be non-empty")
    assert(restricted.exceptAll(fullFiltered).count() == 0 &&
      fullFiltered.exceptAll(restricted).count() == 0,
      "restricted synthesis must equal the full synthesis on the kept keys")
  }

  test("q2: every output row's cost IS the regional minimum for its part") {
    val rows = q("q2_min_cost_supplier")
    graft.Tables.register(spark, dir, Seq("supplier", "nation", "region"))
    // recompute the per-part EUROPE minimum independently and join back
    val mins = spark.sql(
      """SELECT ps_partkey AS mk, MIN(ps_supplycost_cents) AS min_cents
        |FROM partsupp JOIN supplier ON s_suppkey = ps_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'EUROPE' GROUP BY ps_partkey""".stripMargin)
    val off = rows.join(mins, col("p_partkey") === col("mk"))
      .filter(col("ps_supplycost_cents") =!= col("min_cents")).count()
    assert(off == 0, s"$off rows claim a non-minimal cost")
  }

  test("q20: the availqty threshold bites — window-shipped pairs are excluded by it") {
    // the semi chain's excess-stock predicate must discriminate beyond
    // mere window presence (the j3 vacuity lesson at pair grain):
    // at sf0.001, 18 of 53 window-shipped widget pairs fail it
    graft.SparkEntry.queries("q20_excess_stock")(spark, dir) // registers views
    val Array(shipped, qualifying) = spark.sql(
      """SELECT COUNT(*) AS shipped,
        |  COUNT(CASE WHEN ps_availqty > thresh THEN 1 END) AS qual
        |FROM (
        |  SELECT ps_availqty,
        |    (SELECT 100 * SUM(CAST(FLOOR(l_quantity) AS BIGINT)) FROM lineitem
        |     WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
        |       AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |       AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00') AS thresh
        |  FROM partsupp
        |  WHERE ps_partkey IN (SELECT p_partkey FROM part
        |                       WHERE p_partkey < 100 AND p_name LIKE '%widget%'))
        |WHERE thresh IS NOT NULL""".stripMargin)
      .head.toSeq.map(_.asInstanceOf[Long]).toArray
    assert(shipped > 0, "no window-shipped widget pairs — window vacuous")
    assert(qualifying < shipped,
      s"availqty excluded nothing ($qualifying of $shipped) — threshold vacuous")
    assert(qualifying > 0,
      s"availqty excluded everything (0 of $shipped) — chain returns only via NULLs")
  }

  test("q8: the share is a true fraction — bounded, and the parts sum to the whole") {
    val rows = q("q8_market_share").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nation = r.getAs[Long]("nation_cents")
      val total = r.getAs[Long]("total_cents")
      val bp = r.getAs[Long]("share_bp")
      assert(nation >= 0 && nation <= total, r.toString)
      assert(bp == 10000L * nation / total, r.toString)
    }
  }
}
