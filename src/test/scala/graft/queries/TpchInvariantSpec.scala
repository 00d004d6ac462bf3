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
        |WHERE 2 * CAST(l_quantity AS BIGINT) *
        |    (SELECT COUNT(*) FROM lineitem l2
        |     WHERE l2.l_partkey = l1.l_partkey) <
        |  (SELECT CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
        |   FROM lineitem l3 WHERE l3.l_partkey = l1.l_partkey)""".stripMargin)
      .head
    val decorr = q("q17_small_qty").head
    assert(decorr.getLong(0) == correlated.getLong(0) &&
      decorr.getLong(1) == correlated.getLong(1),
      s"decorrelated $decorr != correlated $correlated")
  }

  test("q21: sole-late attributions never exceed the late (order, supplier) mass") {
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
    spark.catalog.clearCache()
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
