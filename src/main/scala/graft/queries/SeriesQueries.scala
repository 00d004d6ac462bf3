package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{RangeJoins, Skyline, TimeSeries, Triangles}

/** Round-12 engine-completeness rows (beyond the reference surface):
  * calendar-spine gap fill, bin-bucketed interval joins, degree-ordered
  * triangle counting, the skyline operator, and robust (median/MAD)
  * outlier profiling. Each oracle states the SEMANTICS declaratively —
  * generate_series spines, inequality range joins, triple-join
  * triangles, NOT-EXISTS dominance — while the Spark side runs the
  * scalable formulation and must produce identical rows.
  */
object SeriesQueries extends QuerySet {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private def cents(c: String) =
    floor(col(c) * 100 + lit(0.5)).cast("long")

  /** Gap-filled daily order series per customer bucket
    * ([[TimeSeries.gapFillForward]]): 16 hash buckets keep the series
    * genuinely sparse at every SF (sparse at small SFs, ~2% generated
    * days even at sf0.1), so the generated days and the
    * forward-fill are non-vacuous everywhere, and every bucket's spine
    * runs its own [min, max] range. Scale shape: one keyed aggregate,
    * a map-side spine generator, one equi join, one co-partitioned
    * window — see the operator's scaladoc.
    */
  def ts1GapFill(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "orders")
      .select((col("o_custkey") % 16).as("bucket"),
        col("o_orderdate").cast("date").as("day"),
        cents("o_totalprice").as("c"))
      .groupBy("bucket", "day")
      .agg(count(lit(1)).as("n"), sum("c").as("cents"))
    TimeSeries.gapFillForward(daily, Seq("bucket"), "day", Seq("cents"))
      .select(col("bucket"), col("day"),
        coalesce(col("n"), lit(0L)).as("n_orders"),
        col("cents_filled"), col("is_gap").cast("long").as("is_gap"))
      .orderBy("bucket", "day")
  }

  /** Point-in-interval range join ([[RangeJoins.pointInInterval]]):
    * per-nation "campaign windows" — 20 deterministic 45-day intervals
    * per nation on a 97-day cadence (staggered 13 days per nation so
    * windows are calendar-unaligned and OVERLAP the quarterly cycle) —
    * joined against each nation's orders by date containment, rolled
    * up per interval. The oracle is the inequality join DuckDB's
    * IEJoin handles natively; the Spark side must match it through the
    * bin-bucketed equi-join reformulation (plan-pinned: hash join,
    * never BroadcastNestedLoop).
    */
  def rj1IntervalJoin(s: SparkSession, dir: String): DataFrame = {
    val iv = t(s, dir, "nation")
      .select(col("n_nationkey").cast("long").as("nk"),
        explode(sequence(lit(0L), lit(19L))).as("i"))
      .select(col("nk"), (col("nk") * 100 + col("i")).as("interval_id"),
        date_add(lit("1995-01-01").cast("date"),
          (col("nk") * 13 + col("i") * 97).cast("int")).as("start_day"))
      .withColumn("end_day", date_add(col("start_day"), 45))
    val probe = t(s, dir, "orders")
      .join(t(s, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey").cast("long").as("nk"),
        col("o_orderdate").cast("date").as("d"),
        cents("o_totalprice").as("c"))
    RangeJoins.pointInInterval(probe, iv, Seq("nk"), "d",
        "start_day", "end_day", binDays = 32)
      .groupBy("interval_id", "nk", "start_day")
      .agg(count(lit(1)).as("n_orders"), sum("c").as("sum_cents"))
      .orderBy("interval_id")
  }

  /** Triangle census of the co-purchase graph
    * ([[Triangles.triangleStats]] over [[graft.operators.Itemsets]]
    * pairs): parts are adjacent when some order contains both. The
    * basket cap keeps the pair stage bounded and is SPELLED in the
    * oracle (the fi2 keep-rule spelling); the count itself is
    * orientation-independent, so the oracle states it as the plain
    * canonical triple join while Spark runs the degree-oriented
    * wedge-close.
    */
  def gr3Triangles(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem").select("l_orderkey", "l_partkey")
    val edges = graft.operators.Itemsets.itemPairs(li,
      "l_orderkey", "l_partkey", minSupport = 1L, maxBasketSize = Some(64))
    Triangles.triangleStats(edges, "p1", "p2")
  }

  /** Price/size skyline of the parts catalog ([[Skyline.pareto2]]):
    * "no other part is both cheaper and at least as large" — minimize
    * price cents, maximize size. The oracle is the textbook quadratic
    * NOT-EXISTS dominance query; the Spark side must reach the same
    * frontier through the group → per-cost max → bucket-local sweep →
    * global sweep funnel.
    */
  def sl1ParetoFrontier(s: SparkSession, dir: String): DataFrame = {
    val pts = t(s, dir, "part")
      .select(cents("p_retailprice").as("cost"),
        col("p_size").cast("long").as("gain"))
    Skyline.pareto2(pts, "cost", "gain")
      .select(col("cost").as("price_cents"), col("gain").as("p_size"),
        col("n_rows").as("n_parts"))
      .orderBy("price_cents")
  }

  /** Robust per-group outlier profile — median + MAD (median absolute
    * deviation), the estimator family immune to the very outliers it
    * hunts (a mean/stddev gate moves when a whale order lands; the
    * median pair does not). All-integer: cents in, PERCENTILE_DISC
    * (actual-element, a13's ordered-set aggregate) for both the median
    * and the MAD, and a `dev > 2·mad` count (the multiple that
    * actually discriminates on this compact price distribution) — hash-exact with zero FP
    * caveats. Two map-side-combinable aggregate passes plus two
    * broadcast-sized joins of the 5-row statistics frame.
    */
  def dp3MadOutliers(s: SparkSession, dir: String): DataFrame = {
    Tables.register(s, dir, Seq("orders"))
    s.sql(
      """WITH c AS (
        |  SELECT o_orderpriority AS pri,
        |    CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders),
        |m AS (
        |  SELECT pri,
        |    CAST(PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY cents)
        |      AS BIGINT) AS med
        |  FROM c GROUP BY pri),
        |d AS (
        |  SELECT c.pri, ABS(c.cents - m.med) AS dev, m.med
        |  FROM c JOIN m ON c.pri = m.pri),
        |md AS (
        |  SELECT pri,
        |    CAST(PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY dev)
        |      AS BIGINT) AS mad
        |  FROM d GROUP BY pri)
        |SELECT d.pri AS o_orderpriority,
        |  MAX(d.med) AS med_cents, MAX(md.mad) AS mad_cents,
        |  CAST(SUM(CASE WHEN d.dev > 2 * md.mad THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_outliers,
        |  COUNT(*) AS n_orders
        |FROM d JOIN md ON d.pri = md.pri
        |GROUP BY d.pri ORDER BY d.pri""".stripMargin)
  }

  val entries: Map[String, Q] = Map(
    "ts1_gap_fill" -> ts1GapFill _,
    "rj1_interval_join" -> rj1IntervalJoin _,
    "gr3_triangles" -> gr3Triangles _,
    "sl1_pareto_frontier" -> sl1ParetoFrontier _,
    "dp3_mad_outliers" -> dp3MadOutliers _,
  )

  val oracles: Map[String, String] = Map(
    // the grp-of-non-nulls trick spells forward fill portably: within
    // a (bucket, run-since-last-observation) group only the FIRST row
    // carries a value, so MAX over the group IS last-non-null
    "ts1_gap_fill" ->
      """WITH daily AS (
        |  SELECT o_custkey % 16 AS bucket, CAST(o_orderdate AS DATE) AS day,
        |    COUNT(*) AS n,
        |    CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
        |      AS BIGINT) AS c
        |  FROM orders GROUP BY 1, 2),
        |bounds AS (SELECT bucket, MIN(day) AS mn, MAX(day) AS mx
        |           FROM daily GROUP BY bucket),
        |spine AS (
        |  SELECT bucket, CAST(UNNEST(generate_series(CAST(mn AS TIMESTAMP),
        |    CAST(mx AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM bounds),
        |j AS (
        |  SELECT s.bucket, s.day, d.n, d.c
        |  FROM spine s LEFT JOIN daily d
        |    ON s.bucket = d.bucket AND s.day = d.day),
        |g AS (
        |  SELECT bucket, day, n, c,
        |    COUNT(c) OVER (PARTITION BY bucket ORDER BY day) AS grp
        |  FROM j)
        |SELECT bucket, day, COALESCE(n, 0) AS n_orders,
        |  MAX(c) OVER (PARTITION BY bucket, grp) AS cents_filled,
        |  CASE WHEN n IS NULL THEN 1 ELSE 0 END AS is_gap
        |FROM g ORDER BY bucket, day""".stripMargin,
    "rj1_interval_join" ->
      """WITH iv AS (
        |  SELECT CAST(n_nationkey AS BIGINT) AS nk,
        |    CAST(n_nationkey AS BIGINT) * 100 + t.i AS interval_id,
        |    DATE '1995-01-01' + CAST(n_nationkey * 13 + t.i * 97 AS INTEGER)
        |      AS start_day
        |  FROM nation, (SELECT UNNEST(range(0, 20)) AS i) t),
        |iv2 AS (SELECT nk, interval_id, start_day,
        |        start_day + 45 AS end_day FROM iv),
        |probe AS (
        |  SELECT CAST(c_nationkey AS BIGINT) AS nk,
        |    CAST(o_orderdate AS DATE) AS d,
        |    CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS c
        |  FROM orders JOIN customer ON o_custkey = c_custkey)
        |SELECT iv2.interval_id, iv2.nk, iv2.start_day,
        |  COUNT(*) AS n_orders, CAST(SUM(c) AS BIGINT) AS sum_cents
        |FROM probe JOIN iv2
        |  ON probe.nk = iv2.nk
        |  AND probe.d >= iv2.start_day AND probe.d < iv2.end_day
        |GROUP BY 1, 2, 3 ORDER BY interval_id""".stripMargin,
    // basket cap spelled verbatim (the fi2 keep rule); the triple join
    // counts each triangle once through the canonical a<b ordering
    "gr3_triangles" ->
      """WITH ip AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |capped AS (
        |  SELECT l_orderkey, l_partkey FROM (
        |    SELECT l_orderkey, l_partkey,
        |      ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY l_partkey)
        |        AS rk
        |    FROM ip) WHERE rk <= 64),
        |e AS (
        |  SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
        |  FROM capped a JOIN capped b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
        |v AS (SELECT a AS v FROM e UNION SELECT b FROM e),
        |tri AS (
        |  SELECT COUNT(*) AS n FROM e e1
        |  JOIN e e2 ON e2.a = e1.b
        |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b)
        |SELECT (SELECT COUNT(*) FROM v) AS n_nodes,
        |  (SELECT COUNT(*) FROM e) AS n_edges,
        |  (SELECT n FROM tri) AS n_triangles""".stripMargin,
    "sl1_pareto_frontier" ->
      """WITH p AS (
        |  SELECT CAST(FLOOR(p_retailprice * 100 + 0.5) AS BIGINT) AS cost,
        |    CAST(p_size AS BIGINT) AS gain
        |  FROM part),
        |g AS (SELECT cost, gain, COUNT(*) AS n_parts FROM p GROUP BY 1, 2)
        |SELECT cost AS price_cents, gain AS p_size, n_parts
        |FROM g a
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM g b
        |  WHERE b.cost <= a.cost AND b.gain >= a.gain
        |    AND (b.cost < a.cost OR b.gain > a.gain))
        |ORDER BY price_cents""".stripMargin,
    // PERCENTILE_DISC spelled twice via the SQL-standard MIN-over-
    // cume_dist definition (the a13 spelling), once for the median,
    // once for the MAD over deviations from it
    "dp3_mad_outliers" ->
      """WITH c AS (
        |  SELECT o_orderpriority AS pri,
        |    CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
        |  FROM orders),
        |r AS (
        |  SELECT pri, cents,
        |    CUME_DIST() OVER (PARTITION BY pri ORDER BY cents) AS cd
        |  FROM c),
        |m AS (SELECT pri, MIN(cents) FILTER (WHERE cd >= 0.5) AS med
        |      FROM r GROUP BY pri),
        |d AS (SELECT c.pri, ABS(c.cents - m.med) AS dev, m.med
        |      FROM c JOIN m ON c.pri = m.pri),
        |r2 AS (
        |  SELECT pri, dev, med,
        |    CUME_DIST() OVER (PARTITION BY pri ORDER BY dev) AS cd
        |  FROM d),
        |md AS (SELECT pri, MIN(dev) FILTER (WHERE cd >= 0.5) AS mad
        |       FROM r2 GROUP BY pri)
        |SELECT d.pri AS o_orderpriority,
        |  MAX(d.med) AS med_cents, MAX(md.mad) AS mad_cents,
        |  CAST(SUM(CASE WHEN d.dev > 2 * md.mad THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_outliers,
        |  COUNT(*) AS n_orders
        |FROM d JOIN md ON d.pri = md.pri
        |GROUP BY d.pri ORDER BY d.pri""".stripMargin,
  )
}
