package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Operator-parity query library for SURVEY.md §2 (scans S1–S3/S6,
  * projections/filters P1–P12, joins J1–J4, aggregates A1–A9, window W1+,
  * sort/limit O1–O3) plus the three gold-model analogs (reference
  * `src/config/gold_config.yaml:8-65`), re-expressed Spark-first on the
  * driver's star schema.
  *
  * Scale notes (100 TB posture): all filters/projections sit directly on
  * the parquet scan so Catalyst pushes them down; the fact⋈dim joins
  * broadcast the dimension side explicitly; aggregations are plain
  * hash-aggregates with map-side partial aggregation; no collect()
  * anywhere; the only ORDER BYs are for oracle determinism and are
  * top-level (Spark plans a final range-partitioned sort — at scale these
  * would be dropped or replaced by `sortWithinPartitions`).
  */
object Relational extends QuerySet {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** TPC-H Q3-style shipping priority: segment customers × pending
    * orders × late-shipped lines → top-10 orders by discounted revenue.
    * The classic fact-to-fact profile: customer (dim) broadcasts into
    * orders, the orders→lineitem join shuffles once on the order key,
    * and the top-10 plans as TakeOrderedAndProject (per-partition heaps,
    * never a global sort). Sort key (revenue DESC, date, orderkey) is a
    * TOTAL order — the LIMIT boundary cannot tie-break differently
    * cross-engine.
    */
  def q3ShippingPriority(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") < lit("1997-01-01"))
      .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") > lit("1997-01-01"))
      .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .as("revenue"))
      .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
      .orderBy(desc("revenue"), col("o_orderdate"), col("l_orderkey"))
      .limit(10)

  /** TPC-H Q5-style local-supplier revenue: six-table join (customer ×
    * orders × lineitem × supplier × nation × region) with the
    * same-nation constraint, revenue per nation in one region-year
    * slice. The join-order showcase: supplier/nation/region are
    * broadcast dims, the only real shuffle is orders⋈lineitem, and the
    * region filter prunes before anything widens.
    */
  def q5RegionRevenue(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1998-01-01"))
      .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(t(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
      .join(t(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .groupBy("n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(desc("revenue"), col("n_name"))

  /** TPC-H Q18-style large-volume customers: orders whose TOTAL lineitem
    * quantity exceeds 250, via an IN subquery with HAVING over an
    * aggregate — deliberately written as SQL so Catalyst's subquery
    * DECORRELATION does the work (SURVEY §4.2): the optimizer rewrites
    * the IN into a left-semi join against the aggregated subquery (no
    * correlated per-row re-execution, no cartesian — pinned in
    * PlanSpec). Quantities are integral doubles, so the sums are cast
    * to BIGINT and carry zero FP noise; threshold 250 keeps the result
    * non-empty at every SF (25 / 204 / 2285 qualifying orders at
    * sf0.001 / 0.01 / 0.1). Scale shape: one map-side-combined
    * aggregate over lineitem, a semi join on the order key, the
    * customer dim broadcast, and the top-100 plans as
    * TakeOrderedAndProject.
    */
  def q18BigOrders(s: SparkSession, dir: String): DataFrame = {
    Tables.register(s, dir, Seq("customer", "orders", "lineitem"))
    s.sql(q18Sql)
  }

  private val q18Sql =
    """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
      | CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE o_orderkey IN (
      |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      |  HAVING SUM(CAST(FLOOR(l_quantity) AS BIGINT)) > 250)
      |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
      |ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
      |LIMIT 100""".stripMargin

  /** TPC-H Q10-style returned-item report: which customers returned the
    * most revenue in one quarter — customer × orders (date slice) ×
    * lineitem (`l_returnflag = 'R'`) × nation, revenue per customer,
    * top 20. The churn-analysis join profile: BOTH fact filters reach
    * the scans (date range on orders, returnflag on lineitem — pushed,
    * so the join sees only the quarter's returned lines), nation
    * broadcasts, customer broadcasts into the filtered orders slice,
    * and the top-20 on (revenue DESC, c_custkey) plans as
    * TakeOrderedAndProject over a total order. 40 / 364 / 3672
    * qualifying customers at sf0.001 / 0.01 / 0.1 — never vacuous.
    */
  def q10ReturnedItems(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1996-04-01"))
      .join(t(s, dir, "lineitem").filter(col("l_returnflag") === "R"),
        col("o_orderkey") === col("l_orderkey"))
      .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .as("revenue"))
      .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
      .orderBy(desc("revenue"), col("c_custkey"))
      .limit(20)

  /** TPC-H Q12-style shipment priority classes, adapted to the trimmed
    * testdata schema (no `l_shipmode` column, so the class axis is
    * `l_returnflag`): one shipping year, per class, how many lines
    * belonged to high-priority orders (`1-URGENT`/`2-HIGH`) vs not.
    * The conditional-aggregate shape: the CASE collapses inside the
    * map-side partial aggregation, so the 3-row answer costs one
    * shuffle of 3 keys — and every output is an INTEGER count, zero FP
    * noise anywhere. Date filter pushed to the lineitem scan; orders
    * joins on the order key.
    */
  def q12PriorityClass(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1997-01-01"))
      .groupBy("l_returnflag")
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), lit(1L))
          .otherwise(lit(0L))).as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), lit(0L))
          .otherwise(lit(1L))).as("low_line_count"))
      .orderBy("l_returnflag")

  /** TPC-H Q4-style late-shipment report, adapted to the trimmed schema
    * (no `l_commitdate`/`l_receiptdate`, so "late" = a line shipped more
    * than 60 days after the order date): per order priority, how many
    * 1996 orders had at least one late line. Written as SQL so Catalyst
    * DECORRELATES the correlated EXISTS (SURVEY §4.2) — note the
    * correlated predicate is NON-equi (`l_shipdate > o_orderdate + 60
    * days`), so the rewrite is a left-semi join with an equi key AND an
    * extra join condition, not a plain semi — no per-row re-execution,
    * no cartesian (pinned in PlanSpec). All-integer output. 218 / 2140 /
    * 21694 qualifying orders at sf0.001 / 0.01 / 0.1 — never vacuous.
    * Scale shape: date filter pushed to the orders scan, one shuffle
    * pair on the order key, map-side-combined 5-key aggregate.
    */
  def q4LateOrders(s: SparkSession, dir: String): DataFrame = {
    Tables.register(s, dir, Seq("orders", "lineitem"))
    s.sql(q4Sql)
  }

  private val q4Sql =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem
      |    WHERE l_orderkey = o_orderkey
      |      AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** TPC-H Q11-style important-stock report, made SCALE-FREE: parts
    * whose lifetime revenue exceeds 1.5× the mean part revenue (the
    * classic q11 pitfall is a fixed fraction-of-total threshold, which
    * empties as the part universe grows — 0 rows at sf0.01 in
    * rehearsal; comparing against the MEAN keeps the selectivity stable
    * at every SF: 2 / 29 / 252 parts at sf0.001 / 0.01 / 0.1). Two
    * scalar subqueries over one shared CTE exercise Catalyst's scalar-
    * subquery planning (each becomes a 1-row broadcast, the CTE is
    * evaluated once per consumer); the threshold comparison is EXACT
    * integer cents arithmetic — `val·n·10 > total·15` — so the boundary
    * cannot flip cross-engine.
    */
  def q11ImportantParts(s: SparkSession, dir: String): DataFrame = {
    Tables.register(s, dir, Seq("lineitem"))
    s.sql(q11Sql)
  }

  private val q11Sql =
    """WITH pv AS (
      |  SELECT l_partkey,
      |    CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
      |      AS BIGINT) AS val_cents
      |  FROM lineitem GROUP BY l_partkey)
      |SELECT l_partkey, val_cents FROM pv
      |WHERE val_cents * (SELECT COUNT(*) FROM pv) * 10 >
      |      (SELECT CAST(SUM(val_cents) AS BIGINT) FROM pv) * 15
      |ORDER BY val_cents DESC, l_partkey""".stripMargin

  /** TPC-H Q14-style promo-revenue share over one shipping quarter:
    * what fraction of revenue came from PROMO-type parts. The
    * conditional-aggregate-ratio shape — but where the classic query
    * divides two double sums (FP-noise roulette cross-engine), this
    * computes an integer PERMILLE over exact cents: both sums are
    * `floor(price·(1−disc)·100 + 0.5)` BIGINTs and the share is
    * `1000·promo DIV total`. Part is a broadcast dim; the date filter
    * is pushed to the lineitem scan; the whole answer is one map-side-
    * combined ungrouped aggregate. 209‰ / 163‰ / 163‰ promo share over
    * 164 / 2116 / 20e3 lines at sf0.001 / 0.01 / 0.1.
    */
  def q14PromoShare(s: SparkSession, dir: String): DataFrame = {
    val cents = floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      * 100 + lit(0.5)).cast("long")
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1997-04-01"))
      .join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", cents).otherwise(lit(0L)))
          .as("promo_cents"),
        sum(cents).as("total_cents"),
        count(lit(1)).as("n_lines"))
      .selectExpr("(promo_cents * 1000) DIV total_cents AS promo_permille",
        "promo_cents", "total_cents", "n_lines")
  }

  /** TPC-H Q19-style disjunctive-predicate revenue: three (brand, size
    * range, quantity range) arms OR-ed together over lineitem × part.
    * The shape exists to exercise predicate handling that declarative
    * plans get right and hand-written loops get wrong: Catalyst extracts
    * the common `p_partkey = l_partkey` equi key from under the OR (the
    * join stays a broadcast-hash join, never a cartesian with a residual
    * OR — pinned in PlanSpec) and pushes the disjunction's part-only
    * arms to the part scan. Revenue in exact integer cents per brand
    * arm. 26 / 342 / 3178 matching lines at sf0.001 / 0.01 / 0.1.
    */
  def q19DisjunctiveRevenue(s: SparkSession, dir: String): DataFrame = {
    val cents = floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      * 100 + lit(0.5)).cast("long")
    t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(16, 30) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#34" && col("p_size").between(31, 50) &&
          col("l_quantity").between(20, 30)))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_lines"), sum(cents).as("revenue_cents"))
      .orderBy("p_brand")
  }

  /** TPC-H Q22-style idle-wealthy-customer report: customers whose
    * balance beats the positive-balance average but who placed no order
    * since 1999. Composes the two remaining subquery forms in one
    * query: an UNCORRELATED SCALAR subquery (the average — one 1-row
    * broadcast) and a correlated NOT EXISTS with an extra date
    * predicate (decorrelated to a left-ANTI join on the customer key —
    * the j3 lesson applies: the date window makes the anti side
    * provably non-empty, 2 / 14 / 148 rows at sf0.001 / 0.01 / 0.1,
    * where "no orders ever" would be vacuously zero). Balances surface
    * as exact integer cents.
    */
  def q22IdleRich(s: SparkSession, dir: String): DataFrame = {
    Tables.register(s, dir, Seq("customer", "orders"))
    s.sql(q22Sql)
  }

  private val q22Sql =
    """SELECT c_custkey, c_name,
      |  CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents
      |FROM customer
      |WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer
      |                   WHERE c_acctbal > 0)
      |  AND NOT EXISTS (
      |    SELECT 1 FROM orders
      |    WHERE o_custkey = c_custkey
      |      AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
      |ORDER BY c_custkey""".stripMargin

  /** TPC-H Q13-style customer order-count distribution: how many
    * customers placed exactly N non-urgent orders, INCLUDING the
    * zero-order customers the left join preserves (the shape's whole
    * point — an inner join silently drops them; the non-urgent filter
    * rides the JOIN CONDITION, not a WHERE, so filtered-out customers
    * still surface with count 0). Two-level aggregation: the per-
    * customer COUNT(o_orderkey) counts non-null matches only, then the
    * distribution groupBy collapses ~1 row per distinct count. Scale
    * shape: one shuffle pair on the customer key (the outer join and
    * the per-customer count share it), then a tiny ≤ dozens-of-keys
    * map-side-combined histogram — the second shuffle moves almost
    * nothing. 16 / 20 / 21 distinct counts at sf0.001 / 0.01 / 0.1.
    */
  def q13OrderDist(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select("c_custkey")
      .join(
        t(s, dir, "orders").filter(col("o_orderpriority") =!= "1-URGENT")
          .select("o_custkey", "o_orderkey"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(desc("custdist"), desc("c_count"))

  /** TPC-H Q15-style top supplier: the supplier(s) whose Q1-1996
    * shipped revenue equals the maximum over all suppliers — the
    * aggregate-then-argmax shape the classic query spells with a view.
    * Written as SQL so the MAX runs as an uncorrelated scalar subquery
    * over the same CTE the outer query consumes (two consumers, one
    * definition — Catalyst plans the 1-row max as a broadcast
    * subquery, never a join). Revenue is exact integer cents, so the
    * `= MAX` boundary cannot flip cross-engine — the float spelling of
    * this query is a notorious tie-roulette. Scale shape: one map-side-
    * combined aggregate over the date-pruned lineitem slice, a
    * broadcast supplier dim, a 1-row scalar. 1 row at every SF
    * (supplier 9 / 64 / 818 at sf0.001 / 0.01 / 0.1).
    */
  def q15TopSupplier(s: SparkSession, dir: String): DataFrame = {
    Tables.register(s, dir, Seq("supplier", "lineitem"))
    s.sql(q15Sql)
  }

  private val q15Sql =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |    CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100
      |      + 0.5) AS BIGINT)) AS BIGINT) AS total_cents
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_cents
      |FROM supplier JOIN rev ON s_suppkey = l_suppkey
      |WHERE total_cents = (SELECT MAX(total_cents) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  /** TPC-H Q17-style small-quantity revenue: lineitems whose quantity
    * is below HALF the average quantity for their part. The classic
    * correlated-scalar-average shape — the oracle SQL keeps the
    * correlated spelling (`WHERE 2·qty·cnt < (SELECT …)`-equivalent)
    * while this side is hand-decorrelated to the aggregate-plus-join
    * Catalyst would produce, proving the rewrite's equivalence on real
    * data. The threshold is EXACT integer arithmetic — quantities are
    * integral doubles, so `2·qty·cnt < sum_qty` (cross-multiplied to
    * avoid the avg division) is boundary-stable cross-engine. Scale
    * shape: one map-side-combined per-part aggregate, one shuffle join
    * on the part key (both sides already hash-partitioned by the
    * aggregate's exchange), and a single-row final fold. 1463 / 14602 /
    * 144602 qualifying lines at sf0.001 / 0.01 / 0.1.
    */
  def q17SmallQty(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    // floor, not cast: Spark's double→long cast truncates toward zero
    // while DuckDB's CAST rounds half-even — identical only while
    // quantities stay integral. floor() matches FLOOR() by construction
    // whatever the data (advice r9); oracle side spells the same FLOOR.
    val qty = floor(col("l_quantity")).cast("long")
    val perPart = li.groupBy(col("l_partkey").as("pk"))
      .agg(sum(qty).as("sum_qty"), count(lit(1)).as("cnt"))
    li.join(perPart, col("l_partkey") === col("pk"))
      .filter(lit(2L) * qty * col("cnt") < col("sum_qty"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long"))
          .as("rev_cents"))
  }

  /** TPC-H Q21-style waiting-supplier report, adapted to this schema
    * (no commit/receipt dates): in orders served by MULTIPLE suppliers,
    * count per supplier the orders where that supplier shipped late
    * (> 90 days after the order date) and NO other supplier did — the
    * sole-blame attribution query. Composes BOTH residual subquery
    * forms against the same derived relation: EXISTS (another supplier
    * participated → left-semi) and NOT EXISTS (another supplier was
    * late → left-anti), stacked on one per-(order, supplier) aggregate.
    * All keys and flags are integers; counts are exact. Scale shape
    * (round-20 rewrite, guide §2.4/§3): ol is one map-side-combined
    * aggregate over the lineitem⋈orders join, and BOTH residual
    * predicates read off one order-keyed window over it — EXISTS
    * (another supplier participated) ⟺ the order's supplier count ≥ 2,
    * NOT EXISTS (another supplier late) ⟺ the order's late-supplier
    * count is exactly own late = 1 — so lineitem is scanned ONCE and ol
    * flows through ONE re-shuffle (the window's order key) instead of
    * being persisted and probed by two more order-keyed joins (the r19
    * spelling: semi + anti over the cached frame, 3 consumers, 3
    * exchanges; the SQL-CTE spelling before that recomputed ol per
    * consumer and benched 2.5 s at sf0.1). Supplier stays a broadcast
    * dim. 10 / 100 / 1000 suppliers at sf0.001 / 0.01 / 0.1 (every
    * supplier ends up sole-late somewhere — the counts, not the row
    * set, are the discriminative part: 40 / 41 / 51 max waits).
    */
  def q21LateSolo(s: SparkSession, dir: String): DataFrame = {
    val ol = t(s, dir, "lineitem")
      .join(t(s, dir, "orders").select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey", "l_suppkey")
      .agg(max(when(
        col("l_shipdate") > expr("o_orderdate + INTERVAL 90 DAY"), 1)
        .otherwise(0)).as("late"))
    // one window, two order-level counts: ol has exactly one row per
    // (order, supplier), so rows-per-order = distinct suppliers and
    // sum(late) = late suppliers — the EXISTS/NOT EXISTS pair becomes
    // n_supp >= 2 && n_late == 1 on the late = 1 rows (own late is the
    // 1 in n_late), row-for-row identical to the semi/anti spelling
    val w = org.apache.spark.sql.expressions.Window.partitionBy("l_orderkey")
    ol.withColumn("n_supp", count(lit(1)).over(w))
      .withColumn("n_late", sum("late").over(w))
      .filter(col("late") === 1 && col("n_supp") >= 2 && col("n_late") === 1)
      .join(broadcast(t(s, dir, "supplier")),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(desc("numwait"), col("s_name"))
  }

  /** TPC-H Q7-style cross-nation volume: shipped revenue between every
    * DISTINCT (supplier nation, customer nation) pair by ship year over
    * a two-year window. The six-way join DAG with nation playing TWO
    * roles (supplier side and customer side — same table, different
    * aliases, both broadcast) is the shape; the classic fixed nation
    * pair is dropped because it is vacuous at small SF (0 rows at
    * sf0.001 in rehearsal) — grouping over all pairs keeps every SF
    * discriminative while exercising the identical plan. Revenue in
    * exact integer cents; the year via `year()` on the pushed-down
    * date window. Scale shape: lineitem⋈orders is the one big shuffle
    * pair; customer, supplier, and both nation roles broadcast; the
    * (pair, year) aggregate map-side combines into ≤ |N|²·years rows.
    * 454 / 1196 / 1200 rows at sf0.001 / 0.01 / 0.1.
    */
  def q7NationVolume(s: SparkSession, dir: String): DataFrame = {
    val n1 = t(s, dir, "nation")
      .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
    val n2 = t(s, dir, "nation")
      .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
    val cents = floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      * 100 + lit(0.5)).cast("long")
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1998-01-01"))
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
      .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .withColumn("l_year", year(col("l_shipdate")).cast("long"))
      .groupBy("supp_nation", "cust_nation", "l_year")
      .agg(sum(cents).as("revenue_cents"), count(lit(1)).as("n_lines"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** TPC-H Q6-style forecast-revenue check: discount revenue the
    * company would keep by dropping small-quantity discounted lines in
    * one ship year. The simplest classic — a pure scan-side query:
    * every predicate (date window, discount band, quantity cap) pushes
    * to the parquet scan, and the answer is one map-side-combined
    * ungrouped fold; zero shuffles beyond the 1-row final exchange. The
    * discount band compares STORED doubles against literals — the same
    * comparison on the same bits in both engines, no arithmetic before
    * the predicate — and revenue is exact integer cents. 124 / 1175 /
    * 12054 qualifying lines at sf0.001 / 0.01 / 0.1.
    */
  def q6DiscountRevenue(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1998-01-01") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(
        count(lit(1)).as("n_lines"),
        sum(floor(col("l_extendedprice") * col("l_discount") * 100
          + lit(0.5)).cast("long")).as("disc_rev_cents"))

  /** TPC-H Q8-style market share: one supplier nation's share of the
    * revenue ASIA-region customers generated, by ship year — the
    * share-of-total-within-group shape (conditional sum over the same
    * rows as the unconditional total, one aggregate, no second pass).
    * Seven relations; nation again in two roles (supplier side, and
    * customer side chained through region). Share surfaces as integer
    * BASIS POINTS over exact cents — `10000·nation DIV total` — so the
    * classic double-division noise is gone. NATION_19 picked because
    * its share is nonzero at every SF (978 / 692 / 420 bp in 1996 —
    * the value, not just the row, is discriminative). Scale shape:
    * lineitem⋈orders is the one big shuffle; supplier and both nation
    * roles plus region broadcast explicitly; customer is left to AQE
    * (broadcast at test SF, honest shuffle at 100 TB); the (year)
    * aggregate map-side combines to 2 rows. 2 rows at every SF.
    */
  def q8MarketShare(s: SparkSession, dir: String): DataFrame = {
    val n1 = t(s, dir, "nation")
      .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
    val n2 = t(s, dir, "nation")
      .select(col("n_nationkey").as("n2_key"), col("n_regionkey"))
    val cents = floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      * 100 + lit(0.5)).cast("long")
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1998-01-01"))
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
      .join(broadcast(t(s, dir, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .join(broadcast(t(s, dir, "supplier")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
      .withColumn("l_year", year(col("l_shipdate")).cast("long"))
      .groupBy("l_year")
      .agg(
        sum(when(col("supp_nation") === "NATION_19", cents).otherwise(lit(0L)))
          .as("nation_cents"),
        sum(cents).as("total_cents"),
        count(lit(1)).as("n_lines"))
      .selectExpr("l_year", "nation_cents", "total_cents",
        "(10000 * nation_cents) DIV total_cents AS share_bp", "n_lines")
      .orderBy("l_year")
  }

  /** TPC-H Q16-style supplier diversity report, adapted to the trimmed
    * schema (no partsupp — the DISTINCT (l_partkey, l_suppkey) pairs
    * observed in lineitem are the who-supplies-what bridge): how many
    * distinct qualifying suppliers serve each (brand, size) slice,
    * excluding low-balance suppliers via NOT IN. The one classic
    * subquery form the q-series didn't cover: NOT IN is NOT the same
    * as NOT EXISTS (a NULL in the subquery empties the result), so
    * Catalyst plans it as a NULL-AWARE anti join — a broadcast-only
    * strategy, pinned — where q22's NOT EXISTS planned a plain anti.
    * COUNT(DISTINCT) per group is the other new aggregate shape
    * (Catalyst expands it to a two-level aggregate). The exclusion is
    * provably non-vacuous: threshold 1000 excludes 1 / 15 / 169
    * suppliers at sf0.001 / 0.01 / 0.1 (a negative-balance spelling
    * excludes ZERO suppliers at sf0.001 — the j3 vacuity lesson).
    * 190 / 988 / 1250 (brand, size) rows at the three SFs. Scale
    * shape: part broadcasts into lineitem, the excluded-supplier list
    * is a tiny broadcast, and the distinct-pair reduction map-side
    * combines before the (brand, size) rollup.
    */
  def q16SupplierDiversity(s: SparkSession, dir: String): DataFrame = {
    Tables.register(s, dir, Seq("lineitem", "part", "supplier"))
    s.sql(q16Sql)
  }

  private val q16Sql =
    """SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE l_suppkey NOT IN (
      |  SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000)
      |GROUP BY p_brand, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin

  // ---- flagship: TPC-H Q1-style pricing summary (A1–A4, P4, P8) ----
  def pricingSummary(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum("l_quantity").as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * (lit(1.0) + col("l_tax"))), 2).as("sum_charge"),
        avg("l_quantity").as("avg_qty"),
        round(avg("l_extendedprice"), 2).as("avg_price"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** DecimalType twin of the q1 pricing summary — the EXACT-MONEY story
    * end-to-end (round-9 verdict stretch #7). The reference models money
    * as Double (SURVEY §1.2) and the q-series sidesteps FP via integer
    * cents; this row instead runs the whole aggregate in DECIMAL, the
    * type a finance-grade deployment would store: prices cast to
    * DECIMAL(12,2), the (1−disc)/(1+tax) factors to DECIMAL(4,2), so
    * every product/sum is EXACT decimal arithmetic with scales that
    * grow identically in both engines (2 → 4 → 6; sums widen precision
    * only). AVG is deliberately absent: Spark keeps decimal averages
    * decimal while DuckDB returns DOUBLE — division re-introduces the
    * cross-engine rounding the type exists to remove (spell it
    * SUM/COUNT at the call site if needed). The double→decimal casts
    * cannot round: stored prices/rates are 2dp values, never 3dp
    * midpoints, so HALF_UP (Spark) and HALF_EVEN (DuckDB) agree.
    * Identical SQL text runs on both engines. Scale shape: q1's —
    * pushed date filter, one map-side-combined 6-key aggregate.
    * Measured end-to-end cost vs the double q1 at sf0.1: 0.21 s vs
    * 0.19 s (1.09×, BASELINE.md §round-10) — the scan dominates, so
    * Decimal's per-op premium barely shows at this shape; the cents
    * spelling stays the perf-first choice on arithmetic-dense plans,
    * this one is the exactness-first choice.
    */
  def q1DecimalMoney(s: SparkSession, dir: String): DataFrame = {
    Tables.register(s, dir, Seq("lineitem"))
    s.sql(q1DecimalSql)
  }

  // The compared surface CASTs each decimal sum to STRING: the decimal
  // VALUES are exact and equal in both engines (TpchInvariantSpec pins
  // the native-DECIMAL spelling against this one in-engine), but the
  // driver's pandas comparator reads Spark DECIMAL and DuckDB DECIMAL
  // through different object representations and hash-splits on type
  // alone (round-10 red). A decimal→string cast is exact by definition
  // — both engines print the full declared scale ("123.4500") — so the
  // gate compares canonical text of exact values. Same SQL text runs
  // on both engines.
  private val q1DecimalSql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS STRING)
      |    AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |      CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)))
      |    AS STRING) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
      |      CAST(1 - CAST(l_discount AS DECIMAL(4,2)) AS DECIMAL(4,2)) *
      |      CAST(1 + CAST(l_tax AS DECIMAL(4,2)) AS DECIMAL(4,2)))
      |    AS STRING) AS sum_charge,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---- S1: parquet scan with pushed filter + pruned columns ----
  def s1Scan(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .filter(col("l_orderkey") < 1000)
      .orderBy("l_orderkey", "l_linenumber")

  // ---- S2: CSV scan (round-trip through csv so the oracle sees the
  //      same rows from parquet; reader uses explicit schema + header,
  //      mirroring reference bronze_config.yaml:21-24 options loop) ----
  def s2Csv(s: SparkSession, dir: String): DataFrame = {
    val tmp = scratchDir(dir, "csv_region")
    t(s, dir, "region").select("r_regionkey", "r_name")
      .coalesce(1).write.mode("overwrite").option("header", "true").csv(tmp)
    s.read.option("header", "true")
      .schema("r_regionkey INT, r_name STRING").csv(tmp)
      .orderBy("r_regionkey")
  }

  // ---- S3: JSON-lines scan (schema-inferred, reference bronze S3) ----
  def s3Json(s: SparkSession, dir: String): DataFrame = {
    val tmp = scratchDir(dir, "json_nation")
    t(s, dir, "nation").coalesce(1).write.mode("overwrite").json(tmp)
    s.read.json(tmp)
      .select("n_nationkey", "n_name", "n_regionkey") // inferred order varies
      .orderBy("n_nationkey")
  }

  /** S8: ORC scan — the second columnar format a metadata-driven
    * ingest layer is asked for after parquet (reference
    * bronze_config.yaml's format field is free-text; ORC is the one
    * other format Spark reads natively with pushdown + pruning, no
    * extra jars). Round-trips supplier through ORC so the oracle (which
    * reads the original parquet) hash-verifies write AND read fidelity
    * for every value, and applies a post-read predicate so the scan
    * exercises ORC predicate pushdown (searchable-argument path) rather
    * than a bare full scan. Threshold 2000 excludes 3/30/265 suppliers
    * at sf0.001/0.01/0.1 — discriminative at EVERY gate SF (the j3
    * lesson; acctbal>0 would exclude zero rows at sf0.001). Scale: same
    * columnar economics as S1 — pruned ReadSchema, pushed filter,
    * splittable stripes.
    */
  def s8Orc(s: SparkSession, dir: String): DataFrame = {
    val tmp = scratchDir(dir, "orc_supplier")
    t(s, dir, "supplier").write.mode("overwrite").orc(tmp)
    s.read.orc(tmp)
      .filter(col("s_acctbal") > 2000.0)
      .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .orderBy("s_suppkey")
  }

  // ---- S6: catalog/view scan via spark.sql (same text as the oracle) ----
  private val s6Sql =
    """SELECT n.n_name, r.r_name FROM nation n
      | JOIN region r ON n.n_regionkey = r.r_regionkey
      | ORDER BY n.n_name""".stripMargin
  def s6SqlCatalog(s: SparkSession, dir: String): DataFrame = {
    Tables.register(s, dir, Seq("nation", "region"))
    s.sql(s6Sql)
  }

  // ---- P1/P2-analog: literal ingest columns (audit cols minus the
  //      non-deterministic current_timestamp, which is bench-only) ----
  def p1Lit(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderkey"), lit("erp_orders").as("source_id"))
      .orderBy("o_orderkey")

  // ---- P3: projection with aliases + scalar function ----
  def p3Project(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(
      col("c_custkey").as("customer_id"),
      upper(col("c_name")).as("customer_name"),
      col("c_mktsegment").as("segment"))
      .orderBy("customer_id")

  // ---- P4: per-row arithmetic (unrounded; bit-exact both engines) ----
  def p4Arith(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_orderkey") < 5000)
      .select(col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * (lit(1.0) + col("l_tax"))).as("charge"),
        (col("l_extendedprice") / col("l_quantity")).as("unit_price"))
      .orderBy("l_orderkey", "l_linenumber")

  // ---- P5 + P9: null-producing CASE then IS NOT NULL filter ----
  def p5NullFilter(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderkey"),
        when(col("o_orderstatus") =!= "O", col("o_orderstatus"))
          .otherwise(lit(null)).as("status_nn"))
      .filter(col("status_nn").isNotNull)
      .orderBy("o_orderkey")

  // ---- P6: regex predicate (reference dq_engine.py:81-92 shape) ----
  def p6Regex(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .filter(col("p_name").rlike("^(small|large) (widget|bolt)$"))
      .select("p_partkey", "p_name", "p_brand")
      .orderBy("p_partkey")

  // ---- P7: arbitrary boolean SQL expression filter (dq expression) ----
  def p7ExprFilter(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(expr("l_quantity > 45 AND l_discount BETWEEN 0.02 AND 0.06"))
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
      .orderBy("l_orderkey", "l_linenumber")

  // ---- P8: date-literal range predicate (${PROCESSING_DATE} analog) ----
  def p8DateRange(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1995-01-01")
        && col("l_shipdate") < lit("1995-04-01"))
      .select(col("l_orderkey"), col("l_linenumber"),
        to_date(col("l_shipdate")).as("ship_date"))
      .orderBy("l_orderkey", "l_linenumber")

  // ---- P9: CASE / when-otherwise tagging ----
  def p9Case(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").select(col("o_orderkey"),
      when(col("o_totalprice") > 200000, "large")
        .when(col("o_totalprice") > 50000, "medium")
        .otherwise("small").as("order_size"))
      .orderBy("o_orderkey")

  // ---- P10/P11: drop + rename reshape ----
  def p10Reshape(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "supplier")
      .withColumnRenamed("s_name", "supplier_name")
      .drop("s_acctbal")
      .orderBy("s_suppkey")

  // ---- P12: conjunctive equality predicates on string cols ----
  def p12Equality(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .filter(col("o_orderstatus") === "F"
        && col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey", "o_custkey")
      .orderBy("o_orderkey")

  // ---- J1: fact⋈dim inner equi-join, dimension broadcast ----
  def j1Inner(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val part = t(s, dir, "part")
    li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_items"),
        sum("l_quantity").as("total_qty"),
        round(sum("l_extendedprice"), 2).as("revenue"))
      .orderBy("p_brand")
  }

  // ---- J2: left outer join, null-extended then coalesced ----
  def j2Left(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .select(col("c_custkey"),
        coalesce(col("o_orderkey"), lit(-1L)).as("order_key"),
        coalesce(col("o_totalprice"), lit(0.0)).as("total_price"))
      .orderBy("c_custkey", "order_key")
  }

  /** J3: anti join — parts that never ship at quantity ≥ 45, the exact
    * complement of j4's semi join (together they partition `part`).
    * Re-subjected in round 9: the original customers-without-orders form
    * returned 0 rows at every test SF (every customer has orders), a
    * hash-green-on-empty check that verified nothing. This subject is
    * provably non-empty AND scales with the data: 6 / 53 / 537 rows at
    * sf0.001 / 0.01 / 0.1 (counts recorded in BASELINE.md).
    */
  def j3Anti(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "part")
    val li = t(s, dir, "lineitem").filter(col("l_quantity") >= 45)
    p.join(li, p("p_partkey") === li("l_partkey"), "left_anti")
      .select("p_partkey", "p_name")
      .orderBy("p_partkey")
  }

  // ---- J4: semi join (referential-integrity passers) ----
  def j4Semi(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "part")
    val li = t(s, dir, "lineitem").filter(col("l_quantity") >= 45)
    p.join(li, p("p_partkey") === li("l_partkey"), "left_semi")
      .select("p_partkey", "p_name")
      .orderBy("p_partkey")
  }

  // ---- A1–A5: multi-key hash agg with count/sum/avg/max ----
  def a1MultiAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("total_sales"),
        round(avg("o_totalprice"), 2).as("avg_sale"),
        max(to_date(col("o_orderdate"))).as("last_order_date"))
      .orderBy("o_orderstatus", "o_orderpriority")

  // ---- A6: ungrouped count (single-pass; reference ran it eagerly) ----
  def a6Count(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").agg(count(lit(1)).as("n_rows"))

  // ---- A7: per-key cardinality (duplicate detection support) ----
  def a7KeyCounts(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_lines"))
      .filter(col("n_lines") > 3)
      .orderBy("l_orderkey")

  // ---- A8: DISTINCT projection ----
  def a8Distinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select("l_returnflag", "l_linestatus").distinct()
      .orderBy("l_returnflag", "l_linestatus")

  // ---- A9: existence probe as a 1-row boolean (no eager collect) ----
  def a9Exists(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").filter(col("o_orderstatus") === "P")
      .agg((count(lit(1)) > 0).as("has_rows"))

  /** A11: ordered ARRAY_AGG — the collection aggregate the A-family
    * lacked: per customer, the SORTED array of its order keys (sorting
    * makes `collect_list`'s arbitrary arrival order deterministic —
    * the only way a collected array can sit behind a hash gate).
    * Capped to the `o_custkey < 500` slice so the per-group array stays
    * a bounded payload; the unbounded spelling is the classic
    * group-explosion hazard at scale (one hot customer = one giant
    * row), which is exactly why fi1/d9/LSH wire caps.
    *
    * The GATED surface serializes the array to a comma-joined STRING
    * (numeric sort first, then element-wise cast — "10" < "9" as text,
    * so sort-then-stringify, never the reverse): the driver's pandas
    * row-sort cannot order raw numpy arrays (round-10 `err`), and a12
    * proved the string path hashes cleanly. The native `array<long>`
    * spelling ([[a11ArrayAggNative]]) stays the library API, pinned
    * element-wise against this surface in `RowsOnlySpec`.
    */
  def a11ArrayAggNative(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").filter(col("o_custkey") < 500)
      .groupBy("o_custkey")
      .agg(sort_array(collect_list(col("o_orderkey"))).as("order_keys"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_custkey")

  def a11ArrayAgg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").filter(col("o_custkey") < 500)
      .groupBy("o_custkey")
      .agg(array_join(transform(sort_array(collect_list(col("o_orderkey"))),
          _.cast("string")), ",").as("order_keys"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_custkey")

  // ---- W1: uniqueness/dedup by rank (fixed version of the reference's
  //      broken validate_uniqueness, dq_engine.py:231-241) ----
  def w1DedupRank(s: SparkSession, dir: String): DataFrame = {
    // (l_orderkey, l_linenumber) is not unique in the testdata — the
    // extra keys make the rank (and thus the kept row) a total order
    val w = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))
    t(s, dir, "lineitem")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("l_orderkey", "l_linenumber", "l_quantity")
      .orderBy("l_orderkey")
  }

  // ---- W2: running total (frame spec; beyond-reference window) ----
  def w2RunningSum(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        round(sum("o_totalprice").over(w), 2).as("running_spend"))
      .orderBy("o_custkey", "o_orderkey")
  }

  // ---- W3: lag (prior-row comparison) ----
  def w3Lag(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        coalesce(lag("o_totalprice", 1).over(w), lit(-1.0)).as("prev_price"))
      .orderBy("o_custkey", "o_orderkey")
  }

  // ---- W4: top-N per group ----
  def w4TopNPerGroup(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
      .orderBy("o_custkey", "rk")
  }

  // ---- O1: global top-k (TakeOrderedAndProject) ----
  def o1TopK(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
      .select("o_orderkey", "o_totalprice")

  // ---- O2: plain sort on a unique string key ----
  def o2Sort(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "nation").select("n_nationkey", "n_name").orderBy("n_name")

  // ---- O3: deterministic limit sample ----
  def o3Limit(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .orderBy("l_orderkey", "l_linenumber")
      .limit(100)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")

  /** A12: ordered LISTAGG + the FILTER aggregate clause — two Spark-4
    * SQL surfaces in one row: `LISTAGG(…) WITHIN GROUP (ORDER BY …)`
    * (the string twin of a11's sorted array — deterministic only
    * because the WITHIN GROUP order is total) and `COUNT(*) FILTER
    * (WHERE …)` (the per-aggregate predicate e8's oracle always used
    * on the DuckDB side, now exercised ON SPARK). Bounded to a key
    * slice like a11 — LISTAGG concatenates a whole group into ONE
    * value, the same group-explosion hazard.
    */
  def a12Listagg(s: SparkSession, dir: String): DataFrame = {
    Tables.register(s, dir, Seq("orders"))
    s.sql(
      """SELECT o_orderstatus,
        |  listagg(CAST(o_orderkey AS STRING), ',')
        |    WITHIN GROUP (ORDER BY o_orderkey) AS keys_csv,
        |  COUNT(*) FILTER (WHERE o_totalprice > 150000) AS n_big,
        |  COUNT(*) AS n
        |FROM orders WHERE o_custkey < 50
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
  }

  /** J9: null-safe equi join (`<=>` / IS NOT DISTINCT FROM) — the join
    * variant where NULL keys MATCH each other instead of silently
    * dropping (the classic "where did my unclassified rows go" bug in
    * dimension joins on optional attributes). Both sides aggregate
    * orders to per-status rows with the non-'O' statuses nulled (p5's
    * CASE shape) over DISJOINT even/odd key slices, then join
    * null-safely: the null-status row from each side pairs up — a
    * plain equi join returns 2 of the 3 rows (the null row vanishes),
    * so the variant is discriminative at every SF. Scale shape:
    * null-safe equality still hashes
    * (NULL becomes an ordinary key value), so the join stays a hash
    * join — but every null-keyed row lands in ONE partition, which is
    * exactly the skew the L15/AQE levers exist for when nulls are
    * plentiful.
    */
  def j9NullsafeJoin(s: SparkSession, dir: String): DataFrame = {
    // even/odd key slices: disjoint AND non-empty at every SF (an
    // absolute key split is empty on one side at sf0.001 — the j3
    // vacuity lesson)
    def side(parity: Long, n: String) =
      t(s, dir, "orders")
        .filter(col("o_orderkey") % 2 === parity)
        .groupBy(when(col("o_orderstatus") =!= "O", col("o_orderstatus"))
          .otherwise(lit(null)).as("status_nn"))
        .agg(count(lit(1)).as(n))
    val l = side(0L, "n_left")
    val r = side(1L, "n_right")
      .withColumnRenamed("status_nn", "status_r")
    l.join(r, col("status_nn") <=> col("status_r"))
      .select(col("status_nn"), col("n_left"), col("n_right"))
      .orderBy(col("status_nn").asc_nulls_first)
  }

  /** O5: OFFSET pagination — page 3 of a keyset-ordered listing
    * (LIMIT 20 OFFSET 40). The API-pagination spelling; the scaladoc
    * caveat IS the scale note: OFFSET must still sort/skip the first
    * page·N rows on one node, so deep pagination wants the keyset form
    * (`WHERE key > last_seen ORDER BY key LIMIT n`) — o1/o3 show that
    * shape; this row pins that the OFFSET operator itself is exact.
    */
  def o5OffsetPage(s: SparkSession, dir: String): DataFrame = {
    Tables.register(s, dir, Seq("orders"))
    s.sql(
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders ORDER BY o_orderkey LIMIT 20 OFFSET 40""".stripMargin)
  }

  /** O6: explicit null ordering — on an ASCENDING sort Spark defaults
    * NULLS FIRST while DuckDB defaults NULLS LAST, so any nullable
    * ascending sort key left implicit is a silent cross-engine
    * divergence; the suite's other queries dodge it with non-null
    * keys, and this row pins the EXPLICIT discipline on a genuinely
    * null-bearing column (the CASE-null status from p5's shape). The
    * LIMIT makes the null placement decide WHICH rows return (the
    * driver hashes the row SET, so bare ordering would be invisible):
    * with NULLS FIRST the page is null-status rows (514/987 nulls at
    * sf0.001/0.01 ≫ 50, tiebroken by the unique key) — an oracle left
    * to DuckDB's NULLS LAST default would return non-null rows and
    * hash-mismatch.
    */
  def o6NullOrdering(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .filter(col("o_orderkey") < 3000)
      .select(col("o_orderkey"),
        when(col("o_orderstatus") =!= "O", col("o_orderstatus"))
          .otherwise(lit(null)).as("status_nn"))
      .orderBy(col("status_nn").asc_nulls_first, col("o_orderkey").asc)
      .limit(50)

  // ---- gold model analogs (gold_config.yaml:8-65) ----
  def g1DailySales(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val p = t(s, dir, "part")
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .filter(col("l_shipdate") >= lit("1995-01-01")
        && col("l_shipdate") < lit("1995-07-01"))
      .groupBy(to_date(col("l_shipdate")).as("sale_date"), col("p_type"))
      .agg(count(lit(1)).as("transaction_count"),
        sum("l_quantity").as("total_quantity"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("total_sales"),
        round(avg("l_extendedprice"), 2).as("avg_sale_amount"))
      .orderBy("sale_date", "p_type")
  }

  def g2CustomerSummary(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy("c_custkey", "c_name", "c_mktsegment")
      .agg(count(lit(1)).as("total_transactions"),
        round(sum("o_totalprice"), 2).as("total_spend"),
        round(avg("o_totalprice"), 2).as("avg_transaction_value"),
        max(to_date(col("o_orderdate"))).as("last_purchase_date"))
      .orderBy("c_custkey")
  }

  def g3ProductPerformance(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val p = t(s, dir, "part")
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .groupBy("p_partkey", "p_name", "p_brand")
      .agg(sum("l_quantity").as("units_sold"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
          .as("total_revenue"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          - col("p_retailprice") * col("l_quantity") * lit(0.6)), 2)
          .as("gross_profit"),
        round(avg(col("l_extendedprice") / col("l_quantity")), 4)
          .as("avg_unit_price"))
      .orderBy("p_partkey")
  }

  // =====================================================================
  //  Synthesized partsupp + the last three classic shapes (q2/q9/q20)
  // =====================================================================

  /** Deterministic `partsupp` synthesized in-engine — the driver's
    * testdata has no partsupp table, which blocked TPC-H q2/q9/q20
    * (round-9 verdict #1). The who-supplies-what bridge is the DISTINCT
    * (l_partkey, l_suppkey) pairs observed in lineitem (the q16
    * adaptation, made a full table here), and the two attributes the
    * three queries need are md5-derived from the pair key (the t16
    * planted-PII playbook): `ps_supplycost_cents` ∈ [100, 100000] and
    * `ps_availqty` ∈ [1, 9999], both BIGINT so every downstream
    * comparison is exact integer arithmetic. The identical derivation is
    * spelled in DuckDB inside [[psOracleCte]] — same md5, same hex
    * slices, same moduli — so the synthesized table is itself
    * oracle-identical and the three queries get full hash-checked rows.
    *
    * Scale shape: one map-side-combined DISTINCT over the two join
    * columns (column-pruned at the scan), then pure scan-fused hash
    * arithmetic — no extra shuffle beyond the distinct's. At 100 TB
    * partsupp IS a real table (TPC-H spec) and this synthesis disappears;
    * the queries below read the view either way.
    *
    * `partKeys`: optional broadcast part-key restriction applied via a
    * LEFT SEMI join BEFORE the distinct. Each consumer only ever looks
    * at partsupp rows for the parts its own predicates keep (q2's
    * p_size/p_type cut, q9's widget family, q20's absolute key range),
    * but that pruning is invisible to Catalyst when the view feeds a
    * correlated subquery — the optimizer cannot push an outer LIKE
    * through the decorrelated aggregate into the view's DISTINCT. Doing
    * it by hand turns a 591k-pair shuffle + md5 into a ~12%-of-that one
    * at sf0.1 (measured in BASELINE.md §round-10) and is
    * results-neutral by construction: rows for parts no consumer joins
    * carry no observable effect. The md5 derivation is per-pair, so the
    * restricted view's values are bit-identical to the full view's.
    */
  private[queries] def partsuppFrame(s: SparkSession, dir: String,
      partKeys: Option[DataFrame] = None): DataFrame = {
    import graft.functions.VectorExpressions.hexSliceToLong
    val h = md5(concat(lit("ps:"), col("ps_partkey").cast("string"),
      lit(":"), col("ps_suppkey").cast("string")))
    val pairs = t(s, dir, "lineitem")
      .select(col("l_partkey").as("ps_partkey"),
        col("l_suppkey").as("ps_suppkey"))
    partKeys.fold(pairs) { pk =>
        pairs.join(broadcast(pk.select(col(pk.columns.head).as("ps_partkey"))),
          Seq("ps_partkey"), "left_semi")
      }
      .distinct()
      .withColumn("ps_supplycost_cents", hexSliceToLong(h, 1, 14) % 99901L + 100L)
      .withColumn("ps_availqty", hexSliceToLong(h, 15, 14) % 9999L + 1L)
  }

  /** DuckDB spelling of [[partsuppFrame]] — prefixed to the q2/q9/q20
    * oracles so both engines derive the identical table from the same
    * parquet bits.
    */
  private val psOracleCte =
    """WITH partsupp AS (
      |  SELECT ps_partkey, ps_suppkey,
      |    ('0x' || substr(md5('ps:' || CAST(ps_partkey AS VARCHAR) || ':'
      |      || CAST(ps_suppkey AS VARCHAR)), 1, 14))::BIGINT % 99901 + 100
      |      AS ps_supplycost_cents,
      |    ('0x' || substr(md5('ps:' || CAST(ps_partkey AS VARCHAR) || ':'
      |      || CAST(ps_suppkey AS VARCHAR)), 15, 14))::BIGINT % 9999 + 1
      |      AS ps_availqty
      |  FROM (SELECT DISTINCT l_partkey AS ps_partkey,
      |          l_suppkey AS ps_suppkey FROM lineitem))
      |""".stripMargin

  private def registerPartsupp(s: SparkSession, dir: String,
      partKeys: Option[DataFrame] = None): Unit =
    partsuppFrame(s, dir, partKeys).createOrReplaceTempView("partsupp")

  /** TPC-H Q2-style minimum-cost supplier: for each qualifying part,
    * the EUROPE supplier(s) whose supply cost equals the regional
    * minimum for that part. The one decorrelation form the q-series
    * still lacked (round-9 verdict): a CORRELATED SCALAR MIN inside the
    * WHERE — Catalyst rewrites it to a per-part aggregate left-joined
    * back on the correlation key (no per-row re-execution, no nested
    * loop — pinned in PlanSpec). Costs are the synthesized exact-cents
    * BIGINTs, so the `= MIN` boundary cannot flip cross-engine (the
    * float spelling of q2 is a tie roulette, same lesson as q15).
    * 15 / 100 / 100 rows at sf0.001 / 0.01 / 0.1 (pre-limit matches
    * are 15 / 107 / 982 — the LIMIT 100 bites at both driver-gate SFs
    * above the smallest), and the order key (acctbal DESC, n_name,
    * s_name, p_partkey) is total: s_name is unique per supplier and
    * p_partkey disambiguates within one. Scale shape: part's filters
    * push to its scan, partsupp⋈part shuffles on the part key the MIN
    * aggregate already partitioned by, supplier/nation/region broadcast.
    */
  def q2MinCostSupplier(s: SparkSession, dir: String): DataFrame = {
    Tables.register(s, dir, Seq("part", "supplier", "nation", "region"))
    // the view is restricted to the partkeys the outer query keeps —
    // both the outer join and the correlated MIN only ever touch those
    // parts, but Catalyst cannot push the p_size/p_type cut through the
    // decorrelated per-part aggregate into the view's DISTINCT (see
    // partsuppFrame). Results-neutral; halves the synthesis and prunes
    // both references.
    registerPartsupp(s, dir, Some(t(s, dir, "part")
      .filter(col("p_size").between(1, 15) && col("p_type") === "PROMO")
      .select("p_partkey")))
    s.sql(q2Sql)
  }

  private val q2Sql =
    """SELECT s_acctbal, s_name, n_name, p_partkey, ps_supplycost_cents
      |FROM part JOIN partsupp ON p_partkey = ps_partkey
      |  JOIN supplier ON s_suppkey = ps_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |WHERE p_size BETWEEN 1 AND 15 AND p_type = 'PROMO'
      |  AND r_name = 'EUROPE'
      |  AND ps_supplycost_cents = (
      |    SELECT MIN(ps2.ps_supplycost_cents)
      |    FROM partsupp ps2
      |      JOIN supplier s2 ON s2.s_suppkey = ps2.ps_suppkey
      |      JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
      |      JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
      |    WHERE ps2.ps_partkey = p_partkey AND r2.r_name = 'EUROPE')
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
      |LIMIT 100""".stripMargin

  /** TPC-H Q9-style product-type profit: per (supplier nation, order
    * year), revenue minus supply cost over one part family. The 6-way
    * join DAG with ARITHMETIC ACROSS TABLES (lineitem price × partsupp
    * cost — the shape q2/q20 probe via subqueries, here in the select
    * list). Profit is exact integer cents: revenue cents (the q-series
    * standard floor) minus `ps_supplycost_cents · qty`, so the sums
    * carry zero FP noise. `floor(l_quantity)` on BOTH sides (not
    * `cast`): Spark's cast truncates toward zero while DuckDB's rounds
    * half-even — floor is identical by construction (the q17 advice
    * item, applied from the start here). Scale shape: part filtered and
    * broadcast, lineitem⋈orders is the one big shuffle, partsupp joins
    * on the (part, supp) pair key, supplier/nation broadcast, and the
    * (nation, year) aggregate map-side combines to ≤ |N|·years rows.
    * 70 / 175 / 175 rows at sf0.001 / 0.01 / 0.1.
    */
  def q9NationProfit(s: SparkSession, dir: String): DataFrame = {
    val revCents = floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
      * 100 + lit(0.5)).cast("long")
    val qty = floor(col("l_quantity")).cast("long")
    t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part")
          .filter(col("p_name").like("%widget%")).select("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .join(t(s, dir, "orders").select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(partsuppFrame(s, dir, Some(t(s, dir, "part")
          .filter(col("p_name").like("%widget%")).select("p_partkey"))),
        col("l_partkey") === col("ps_partkey") &&
          col("l_suppkey") === col("ps_suppkey"))
      .join(broadcast(t(s, dir, "supplier").select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t(s, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("long").as("o_year"),
        (revCents - col("ps_supplycost_cents") * qty).as("amount"))
      .groupBy("nation", "o_year")
      .agg(sum(col("amount")).as("profit_cents"), count(lit(1)).as("n_lines"))
      .orderBy(col("nation"), desc("o_year"))
  }

  /** TPC-H Q20-style excess-stock suppliers: EUROPE suppliers holding
    * more stock of a part family than they shipped in one year — the
    * NESTED SEMI-JOIN CHAIN (IN inside IN inside a correlated scalar
    * SUM) that composes three subquery forms in one query. The scalar
    * subquery's NULL semantics are the classic q20 point: a pair with
    * NO shipments in the window compares `ps_availqty > NULL` → dropped
    * (no COALESCE — both engines must agree on the empty-group NULL
    * through decorrelation, the COUNT-bug shape). The ×100 multiplier
    * re-centers the classic 0.5 factor onto the synthesized availqty
    * scale (availqty ~U[1, 9999] vs window quantity sums of tens — at
    * ×100 the threshold lands mid-distribution, so the EXCESS-STOCK
    * predicate, not just window presence, decides: at sf0.01 it cuts
    * window-active suppliers 6 → 4). `p_partkey < 100` keeps the part
    * family a fixed absolute set across SFs, so per-supplier candidate
    * pairs thin as the supplier pool grows — 4 of 4 / 4 of 15 / 6 of
    * 201 EUROPE suppliers at sf0.001 / 0.01 / 0.1 (saturated only at
    * the smallest SF, strict subsets at both driver-gate SFs). Scale
    * shape: both IN chains decorrelate to left-semi joins, the scalar
    * SUM to a per-pair aggregate on the key partsupp already shuffles
    * on, part/supplier/nation/region broadcast.
    */
  def q20ExcessStock(s: SparkSession, dir: String): DataFrame = {
    Tables.register(s, dir, Seq("part", "supplier", "nation", "region", "lineitem"))
    // restricted to the absolute part family the IN chain keeps — the
    // same manual pushdown as q2's (see partsuppFrame); the correlated
    // scalar SUM only ever correlates on partkeys from this view.
    registerPartsupp(s, dir, Some(t(s, dir, "part")
      .filter(col("p_partkey") < 100 && col("p_name").like("%widget%"))
      .select("p_partkey")))
    s.sql(q20Sql)
  }

  private val q20Sql =
    """SELECT s_suppkey, s_name, n_name
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'EUROPE' AND s_suppkey IN (
      |  SELECT ps_suppkey FROM partsupp
      |  WHERE ps_partkey IN (SELECT p_partkey FROM part
      |                       WHERE p_partkey < 100 AND p_name LIKE '%widget%')
      |    AND ps_availqty > (
      |      SELECT 100 * SUM(CAST(FLOOR(l_quantity) AS BIGINT)) FROM lineitem
      |      WHERE l_partkey = ps_partkey AND l_suppkey = ps_suppkey
      |        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |        AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'))
      |ORDER BY s_suppkey""".stripMargin

  /** Scratch dir for source-format round-trips (inside the repo target
    * dir; queries must not write outside /root/repo).
    */
  private def scratchDir(dir: String, name: String): String =
    s"${sys.props("user.dir")}/target/scratch/${name}_${dir.replaceAll("[^A-Za-z0-9]", "_")}"

  val entries: Map[String, Q] = Map(
    "q1_pricing_summary" -> pricingSummary _,
    "q3_shipping_priority" -> q3ShippingPriority _,
    "q5_region_revenue" -> q5RegionRevenue _,
    "q10_returned_items" -> q10ReturnedItems _,
    "q12_priority_class" -> q12PriorityClass _,
    "q18_big_orders" -> q18BigOrders _,
    "q6_discount_rev" -> q6DiscountRevenue _,
    "q16_supplier_diversity" -> q16SupplierDiversity _,
    "q8_market_share" -> q8MarketShare _,
    "q13_order_dist" -> q13OrderDist _,
    "q15_top_supplier" -> q15TopSupplier _,
    "q17_small_qty" -> q17SmallQty _,
    "q21_late_solo" -> q21LateSolo _,
    "q7_nation_volume" -> q7NationVolume _,
    "q4_late_orders" -> q4LateOrders _,
    "q11_important_parts" -> q11ImportantParts _,
    "q14_promo_share" -> q14PromoShare _,
    "q19_disjunctive" -> q19DisjunctiveRevenue _,
    "q22_idle_rich" -> q22IdleRich _,
    "q2_min_cost_supplier" -> q2MinCostSupplier _,
    "q9_nation_profit" -> q9NationProfit _,
    "q20_excess_stock" -> q20ExcessStock _,
    "q1d_decimal_money" -> q1DecimalMoney _,
    "s1_parquet_scan" -> s1Scan _,
    "s2_csv_scan" -> s2Csv _,
    "s3_json_scan" -> s3Json _,
    "s8_orc_scan" -> s8Orc _,
    "s6_sql_catalog" -> s6SqlCatalog _,
    "p1_literal_cols" -> p1Lit _,
    "p3_projection" -> p3Project _,
    "p4_arithmetic" -> p4Arith _,
    "p5_null_filter" -> p5NullFilter _,
    "p6_regex_filter" -> p6Regex _,
    "p7_expr_filter" -> p7ExprFilter _,
    "p8_date_range" -> p8DateRange _,
    "p9_case_when" -> p9Case _,
    "p10_drop_rename" -> p10Reshape _,
    "p12_equality_filter" -> p12Equality _,
    "j1_inner_join" -> j1Inner _,
    "j2_left_join" -> j2Left _,
    "j3_anti_join" -> j3Anti _,
    "j4_semi_join" -> j4Semi _,
    "j9_nullsafe_join" -> j9NullsafeJoin _,
    "a12_listagg" -> a12Listagg _,
    "a1_multi_agg" -> a1MultiAgg _,
    "a6_count_rows" -> a6Count _,
    "a7_key_counts" -> a7KeyCounts _,
    "a8_distinct" -> a8Distinct _,
    "a9_exists_probe" -> a9Exists _,
    "a11_array_agg" -> a11ArrayAgg _,
    "w1_dedup_rank" -> w1DedupRank _,
    "w2_running_sum" -> w2RunningSum _,
    "w3_lag" -> w3Lag _,
    "w4_topn_per_group" -> w4TopNPerGroup _,
    "o1_topk" -> o1TopK _,
    "o2_sort" -> o2Sort _,
    "o3_limit" -> o3Limit _,
    "o5_offset_page" -> o5OffsetPage _,
    "o6_null_ordering" -> o6NullOrdering _,
    "g1_daily_sales_by_type" -> g1DailySales _,
    "g2_customer_summary" -> g2CustomerSummary _,
    "g3_product_performance" -> g3ProductPerformance _,
  )

  val oracles: Map[String, String] = Map(
    "q3_shipping_priority" ->
      """SELECT l_orderkey,
        | ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        | o_orderdate, o_orderpriority
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        | AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        | AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""".stripMargin,
    "q10_returned_items" ->
      """SELECT c_custkey, c_name,
        | ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
        | c_acctbal, n_name
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        | AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        | AND l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q12_priority_class" ->
      """SELECT l_returnflag,
        | CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |   THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        | CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |   THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        | AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q5_region_revenue" ->
      """SELECT n_name,
        | ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        | AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        | AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,
    "q18_big_orders" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        | CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE o_orderkey IN (
        |  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
        |  HAVING CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) > 250)
        |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
        |LIMIT 100""".stripMargin,
    "q16_supplier_diversity" ->
      """SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE l_suppkey NOT IN (
        |  SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000)
        |GROUP BY p_brand, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin,
    "q6_discount_rev" ->
      """SELECT COUNT(*) AS n_lines,
        |  CAST(SUM(CAST(FLOOR(l_extendedprice * l_discount * 100 + 0.5)
        |    AS BIGINT)) AS BIGINT) AS disc_rev_cents
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q8_market_share" ->
      """WITH vol AS (
        |  SELECT CAST(YEAR(l_shipdate) AS BIGINT) AS l_year,
        |    CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100 + 0.5)
        |      AS BIGINT) AS cents,
        |    n1.n_name AS supp_nation
        |  FROM lineitem
        |    JOIN orders ON l_orderkey = o_orderkey
        |    JOIN customer ON o_custkey = c_custkey
        |    JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |    JOIN region ON n2.n_regionkey = r_regionkey
        |    JOIN supplier ON l_suppkey = s_suppkey
        |    JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  WHERE r_name = 'ASIA'
        |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00')
        |SELECT l_year,
        |  CAST(SUM(CASE WHEN supp_nation = 'NATION_19' THEN cents ELSE 0 END)
        |    AS BIGINT) AS nation_cents,
        |  CAST(SUM(cents) AS BIGINT) AS total_cents,
        |  CAST((10000 * SUM(CASE WHEN supp_nation = 'NATION_19' THEN cents
        |    ELSE 0 END)) // SUM(cents) AS BIGINT) AS share_bp,
        |  COUNT(*) AS n_lines
        |FROM vol GROUP BY l_year
        |ORDER BY l_year""".stripMargin,
    "q13_order_dist" ->
      """SELECT c_count, COUNT(*) AS custdist FROM (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |    AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey) d
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100
        |      + 0.5) AS BIGINT)) AS BIGINT) AS total_cents
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_cents
        |FROM supplier JOIN rev ON s_suppkey = l_suppkey
        |WHERE total_cents = (SELECT MAX(total_cents) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    // the CORRELATED spelling — the Spark side is hand-decorrelated to
    // aggregate+join; value equality across the two proves the rewrite
    "q17_small_qty" ->
      """SELECT COUNT(*) AS n_lines,
        |  CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
        |    AS BIGINT) AS rev_cents
        |FROM lineitem l1
        |WHERE 2 * CAST(FLOOR(l_quantity) AS BIGINT) *
        |    (SELECT COUNT(*) FROM lineitem l2
        |     WHERE l2.l_partkey = l1.l_partkey) <
        |  (SELECT CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT)
        |   FROM lineitem l3 WHERE l3.l_partkey = l1.l_partkey)""".stripMargin,
    "q21_late_solo" ->
      """WITH ol AS (
        |  SELECT l_orderkey, l_suppkey,
        |    MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
        |        THEN 1 ELSE 0 END) AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  GROUP BY l_orderkey, l_suppkey)
        |SELECT s_name, COUNT(*) AS numwait
        |FROM ol t JOIN supplier ON s_suppkey = t.l_suppkey
        |WHERE t.late = 1
        |  AND EXISTS (
        |    SELECT 1 FROM ol o2
        |    WHERE o2.l_orderkey = t.l_orderkey
        |      AND o2.l_suppkey <> t.l_suppkey)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM ol o3
        |    WHERE o3.l_orderkey = t.l_orderkey
        |      AND o3.l_suppkey <> t.l_suppkey AND o3.late = 1)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name""".stripMargin,
    "q7_nation_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(YEAR(l_shipdate) AS BIGINT) AS l_year,
        |  CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100
        |    + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents,
        |  COUNT(*) AS n_lines
        |FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE n1.n_name <> n2.n_name
        |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY 1, 2, 3
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    "q4_late_orders" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q11_important_parts" ->
      """WITH pv AS (
        |  SELECT l_partkey,
        |    CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS val_cents
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT l_partkey, val_cents FROM pv
        |WHERE val_cents * (SELECT COUNT(*) FROM pv) * 10 >
        |      (SELECT CAST(SUM(val_cents) AS BIGINT) FROM pv) * 15
        |ORDER BY val_cents DESC, l_partkey""".stripMargin,
    "q14_promo_share" ->
      """WITH j AS (
        |  SELECT p_type,
        |    CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100 + 0.5)
        |      AS BIGINT) AS cents
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00')
        |SELECT CAST((1000 * SUM(CASE WHEN p_type = 'PROMO' THEN cents ELSE 0 END))
        |    // SUM(cents) AS BIGINT) AS promo_permille,
        |  CAST(SUM(CASE WHEN p_type = 'PROMO' THEN cents ELSE 0 END) AS BIGINT)
        |    AS promo_cents,
        |  CAST(SUM(cents) AS BIGINT) AS total_cents,
        |  COUNT(*) AS n_lines
        |FROM j""".stripMargin,
    "q19_disjunctive" ->
      """SELECT p_brand, COUNT(*) AS n_lines,
        |  CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100 + 0.5)
        |    AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 16 AND 30
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 31 AND 50
        |       AND l_quantity BETWEEN 20 AND 30)
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q1d_decimal_money" -> q1DecimalSql,
    "q2_min_cost_supplier" -> (psOracleCte + q2Sql),
    "q9_nation_profit" -> (psOracleCte +
      """SELECT n_name AS nation, CAST(YEAR(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100
        |      + 0.5) AS BIGINT)
        |    - ps_supplycost_cents * CAST(FLOOR(l_quantity) AS BIGINT))
        |    AS BIGINT) AS profit_cents,
        |  COUNT(*) AS n_lines
        |FROM lineitem
        |  JOIN part ON p_partkey = l_partkey
        |  JOIN orders ON o_orderkey = l_orderkey
        |  JOIN partsupp ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
        |  JOIN supplier ON s_suppkey = l_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%widget%'
        |GROUP BY 1, 2
        |ORDER BY nation, o_year DESC""".stripMargin),
    "q20_excess_stock" -> (psOracleCte + q20Sql),
    "q22_idle_rich" ->
      """SELECT c_custkey, c_name,
        |  CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS bal_cents
        |FROM customer
        |WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer
        |                   WHERE c_acctbal > 0)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM orders
        |    WHERE o_custkey = c_custkey
        |      AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
        |ORDER BY c_custkey""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | SUM(l_quantity) AS sum_qty,
        | ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
        | ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        | ROUND(SUM(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)), 2) AS sum_charge,
        | AVG(l_quantity) AS avg_qty,
        | ROUND(AVG(l_extendedprice), 2) AS avg_price,
        | ROUND(AVG(l_discount), 4) AS avg_disc,
        | COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "s1_parquet_scan" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem WHERE l_orderkey < 1000
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "s2_csv_scan" ->
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",
    "s3_json_scan" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey",
    "s8_orc_scan" ->
      """SELECT s_suppkey, s_name, s_nationkey, s_acctbal
        |FROM supplier WHERE s_acctbal > 2000.0
        |ORDER BY s_suppkey""".stripMargin,
    "s6_sql_catalog" -> s6Sql,
    "p1_literal_cols" ->
      "SELECT o_orderkey, 'erp_orders' AS source_id FROM orders ORDER BY o_orderkey",
    "p3_projection" ->
      """SELECT c_custkey AS customer_id, UPPER(c_name) AS customer_name,
        | c_mktsegment AS segment
        |FROM customer ORDER BY customer_id""".stripMargin,
    "p4_arithmetic" ->
      """SELECT l_orderkey, l_linenumber,
        | l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS charge,
        | l_extendedprice / l_quantity AS unit_price
        |FROM lineitem WHERE l_orderkey < 5000
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "p5_null_filter" ->
      """SELECT o_orderkey,
        | CASE WHEN o_orderstatus <> 'O' THEN o_orderstatus ELSE NULL END AS status_nn
        |FROM orders
        |WHERE (CASE WHEN o_orderstatus <> 'O' THEN o_orderstatus ELSE NULL END) IS NOT NULL
        |ORDER BY o_orderkey""".stripMargin,
    "p6_regex_filter" ->
      """SELECT p_partkey, p_name, p_brand FROM part
        |WHERE regexp_matches(p_name, '^(small|large) (widget|bolt)$')
        |ORDER BY p_partkey""".stripMargin,
    "p7_expr_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount FROM lineitem
        |WHERE l_quantity > 45 AND l_discount BETWEEN 0.02 AND 0.06
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "p8_date_range" ->
      """SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship_date
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1995-04-01 00:00:00'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "p9_case_when" ->
      """SELECT o_orderkey,
        | CASE WHEN o_totalprice > 200000 THEN 'large'
        |      WHEN o_totalprice > 50000 THEN 'medium'
        |      ELSE 'small' END AS order_size
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "p10_drop_rename" ->
      """SELECT s_suppkey, s_name AS supplier_name, s_nationkey
        |FROM supplier ORDER BY s_suppkey""".stripMargin,
    "p12_equality_filter" ->
      """SELECT o_orderkey, o_custkey FROM orders
        |WHERE o_orderstatus = 'F' AND o_orderpriority = '1-URGENT'
        |ORDER BY o_orderkey""".stripMargin,
    "j1_inner_join" ->
      """SELECT p_brand, COUNT(*) AS n_items, SUM(l_quantity) AS total_qty,
        | ROUND(SUM(l_extendedprice), 2) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "j2_left_join" ->
      """SELECT c_custkey, COALESCE(o_orderkey, -1) AS order_key,
        | COALESCE(o_totalprice, 0.0) AS total_price
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |ORDER BY c_custkey, order_key""".stripMargin,
    "j3_anti_join" ->
      """SELECT p_partkey, p_name FROM part
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem
        |                  WHERE l_partkey = p_partkey AND l_quantity >= 45)
        |ORDER BY p_partkey""".stripMargin,
    "j4_semi_join" ->
      """SELECT p_partkey, p_name FROM part
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_partkey = p_partkey AND l_quantity >= 45)
        |ORDER BY p_partkey""".stripMargin,
    "a12_listagg" ->
      """SELECT o_orderstatus,
        |  string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey)
        |    AS keys_csv,
        |  COUNT(*) FILTER (WHERE o_totalprice > 150000) AS n_big,
        |  COUNT(*) AS n
        |FROM orders WHERE o_custkey < 50
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "j9_nullsafe_join" ->
      """WITH l AS (
        |  SELECT CASE WHEN o_orderstatus <> 'O' THEN o_orderstatus END
        |    AS status_nn, COUNT(*) AS n_left
        |  FROM orders WHERE o_orderkey % 2 = 0
        |  GROUP BY 1),
        |r AS (
        |  SELECT CASE WHEN o_orderstatus <> 'O' THEN o_orderstatus END
        |    AS status_r, COUNT(*) AS n_right
        |  FROM orders WHERE o_orderkey % 2 = 1
        |  GROUP BY 1)
        |SELECT l.status_nn, l.n_left, r.n_right
        |FROM l JOIN r ON l.status_nn IS NOT DISTINCT FROM r.status_r
        |ORDER BY l.status_nn ASC NULLS FIRST""".stripMargin,
    "a1_multi_agg" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
        | ROUND(SUM(o_totalprice), 2) AS total_sales,
        | ROUND(AVG(o_totalprice), 2) AS avg_sale,
        | MAX(CAST(o_orderdate AS DATE)) AS last_order_date
        |FROM orders GROUP BY o_orderstatus, o_orderpriority
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,
    "a6_count_rows" -> "SELECT COUNT(*) AS n_rows FROM lineitem",
    "a7_key_counts" ->
      """SELECT l_orderkey, COUNT(*) AS n_lines FROM lineitem
        |GROUP BY l_orderkey HAVING COUNT(*) > 3 ORDER BY l_orderkey""".stripMargin,
    "a8_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "a9_exists_probe" ->
      "SELECT COUNT(*) > 0 AS has_rows FROM orders WHERE o_orderstatus = 'P'",
    "a11_array_agg" ->
      """SELECT o_custkey,
        |  array_to_string(list_sort(list(o_orderkey)), ',') AS order_keys,
        |  COUNT(*) AS n_orders
        |FROM orders WHERE o_custkey < 500
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,
    "w1_dedup_rank" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM (
        |  SELECT l_orderkey, l_linenumber, l_quantity,
        |    ROW_NUMBER() OVER (PARTITION BY l_orderkey
        |      ORDER BY l_linenumber, l_quantity, l_extendedprice) AS rn
        |  FROM lineitem) WHERE rn = 1 ORDER BY l_orderkey""".stripMargin,
    "w2_running_sum" ->
      """SELECT o_custkey, o_orderkey,
        | ROUND(SUM(o_totalprice) OVER (
        |   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "w3_lag" ->
      """SELECT o_custkey, o_orderkey,
        | COALESCE(LAG(o_totalprice, 1) OVER (
        |   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), -1.0) AS prev_price
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,
    "w4_topn_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders) WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin,
    "o1_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "o2_sort" ->
      "SELECT n_nationkey, n_name FROM nation ORDER BY n_name",
    "o3_limit" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_orderkey, l_linenumber LIMIT 100""".stripMargin,
    "o5_offset_page" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders ORDER BY o_orderkey LIMIT 20 OFFSET 40""".stripMargin,
    "o6_null_ordering" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderstatus <> 'O' THEN o_orderstatus END AS status_nn
        |FROM orders WHERE o_orderkey < 3000
        |ORDER BY status_nn ASC NULLS FIRST, o_orderkey LIMIT 50""".stripMargin,
    "g1_daily_sales_by_type" ->
      """SELECT CAST(l_shipdate AS DATE) AS sale_date, p_type,
        | COUNT(*) AS transaction_count,
        | SUM(l_quantity) AS total_quantity,
        | ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS total_sales,
        | ROUND(AVG(l_extendedprice), 2) AS avg_sale_amount
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1995-07-01 00:00:00'
        |GROUP BY CAST(l_shipdate AS DATE), p_type
        |ORDER BY sale_date, p_type""".stripMargin,
    "g2_customer_summary" ->
      """SELECT c_custkey, c_name, c_mktsegment,
        | COUNT(*) AS total_transactions,
        | ROUND(SUM(o_totalprice), 2) AS total_spend,
        | ROUND(AVG(o_totalprice), 2) AS avg_transaction_value,
        | MAX(CAST(o_orderdate AS DATE)) AS last_purchase_date
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey, c_name, c_mktsegment
        |ORDER BY c_custkey""".stripMargin,
    "g3_product_performance" ->
      """SELECT p_partkey, p_name, p_brand,
        | SUM(l_quantity) AS units_sold,
        | ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS total_revenue,
        | FLOOR(SUM(l_extendedprice * (1.0 - l_discount)
        |   - p_retailprice * l_quantity * 0.6) * 100.0 + 0.5) / 100.0 AS gross_profit,
        | ROUND(AVG(l_extendedprice / l_quantity), 4) AS avg_unit_price
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_partkey, p_name, p_brand
        |ORDER BY p_partkey""".stripMargin,
  )
}
