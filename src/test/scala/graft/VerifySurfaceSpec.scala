package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Negative + positive pins for the Verify output-surface lint (round-10
  * verdict item 2): the gate that turns a would-be driver red (DECIMAL
  * or nested output column) into a named build-time failure.
  */
class VerifySurfaceSpec extends AnyFunSuite {

  test("lint rejects DECIMAL and nested columns, naming them") {
    val schema = StructType(Seq(
      StructField("k", LongType),
      StructField("money", DecimalType(12, 2)),
      StructField("keys", ArrayType(LongType)),
      StructField("meta", StructType(Seq(StructField("a", StringType)))),
      StructField("m", MapType(StringType, LongType))))
    val bad = Verify.surfaceViolations(schema).map(_._1)
    assert(bad == Seq("money", "keys", "meta", "m"))
    val e = intercept[IllegalArgumentException](
      Verify.lintSurface("q_test", schema))
    assert(e.getMessage.contains("q_test") && e.getMessage.contains("money"))
  }

  test("lint passes every scalar driver-gate type") {
    val schema = StructType(Seq(
      StructField("s", StringType), StructField("b", BooleanType),
      StructField("i", IntegerType), StructField("l", LongType),
      StructField("f", FloatType), StructField("d", DoubleType),
      StructField("dt", DateType), StructField("ts", TimestampType)))
    assert(Verify.surfaceViolations(schema).isEmpty)
    Verify.lintSurface("q_ok", schema)
  }

  /** Reference-surface names covered by SURVEY §2.1–2.12 FAMILY rows
    * (P3–P12, J1–J4, the TPC-H table…) rather than per-name mentions.
    * FROZEN: new queries must NOT be added here — they get their own
    * SURVEY §2.13 row, which is what the checklist test enforces.
    */
  private val surveyFamilyRows: Set[String] = Set(
    "a1_multi_agg", "a6_count_rows", "a7_key_counts", "a8_distinct",
    "a9_exists_probe", "aj1_asof_join", "e1_hourly_rollup", "e2_sessionize",
    "e3_tumbling_window", "e4_json_extract", "g1_daily_sales_by_type",
    "g2_customer_summary", "g3_product_performance", "j1_inner_join",
    "j2_left_join", "j3_anti_join", "j4_semi_join", "o1_topk", "o2_sort",
    "o3_limit", "o5_offset_page", "o6_null_ordering", "p10_drop_rename",
    "p12_equality_filter", "p1_literal_cols", "p3_projection",
    "p4_arithmetic", "p5_null_filter", "p6_regex_filter", "p7_expr_filter",
    "p8_date_range", "p9_case_when", "q10_returned_items",
    "q11_important_parts", "q12_priority_class", "q13_order_dist",
    "q14_promo_share", "q15_top_supplier", "q16_supplier_diversity",
    "q17_small_qty", "q18_big_orders", "q19_disjunctive",
    "q1_pricing_summary", "q20_excess_stock", "q21_late_solo",
    "q22_idle_rich", "q2_min_cost_supplier", "q3_shipping_priority",
    "q4_late_orders", "q5_region_revenue", "q6_discount_rev",
    "q7_nation_volume", "q8_market_share", "q9_nation_profit", "r1_rollup",
    "rj1_range_join", "s1_parquet_scan", "s2_csv_scan", "s3_json_scan",
    "s6_sql_catalog", "t1_token_stats", "t2_quality_scores", "t3_lang_id",
    "u1_union_all", "u2_intersect", "u3_except", "w1_dedup_rank",
    "w2_running_sum", "w3_lag", "w4_topn_per_group")

  /** Repo root located from the test JVM's working directory (sbt runs
    * from the project root; walk up for safety) — not a hard-coded
    * checkout path, so the checklist survives a working-copy move.
    */
  private def repoFile(name: String): java.nio.file.Path = {
    var dir = java.nio.file.Paths.get(sys.props("user.dir")).toAbsolutePath
    while (dir != null && !java.nio.file.Files.exists(dir.resolve(name)))
      dir = dir.getParent
    require(dir != null, s"$name not found above ${sys.props("user.dir")}")
    dir.resolve(name)
  }

  test("close-out checklist: every query has a SURVEY mention; README count is fresh") {
    // the mechanical fix for the tw6 -> st2 -> ds1 pattern (three rounds
    // of a new query shipping without its SURVEY row / README bump):
    // this test FAILS the build until the docs exist
    val survey = new String(java.nio.file.Files.readAllBytes(
      repoFile("SURVEY.md")), "UTF-8")
    val undocumented = SparkEntry.queries.keySet
      .filterNot(surveyFamilyRows)
      .filterNot(n => survey.contains(s"`$n`"))
    assert(undocumented.isEmpty,
      s"queries with no SURVEY.md row (write one, do not grandfather): " +
        undocumented.toSeq.sorted.mkString(", "))
    val stale = surveyFamilyRows -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"grandfather list names dead queries: $stale")

    val readme = new String(java.nio.file.Files.readAllBytes(
      repoFile("README.md")), "UTF-8")
    val claimed = "(\\d+) named queries".r.findFirstMatchIn(readme)
      .map(_.group(1).toInt)
    assert(claimed.contains(SparkEntry.queries.size),
      s"README claims ${claimed.orNull} named queries but SparkEntry " +
        s"registers ${SparkEntry.queries.size} — update README.md")
  }

  test("close-out checklist: the closing bench went through --adjudicate") {
    // Round-19 verdict item 5: the closing artifact must be produced
    // BY the adjudication protocol (wait-for-idle + targeted re-price,
    // scripts/bench_compare.py --adjudicate), never by hand-picking a
    // window. Gated on GRAFT_CLOSEOUT=1 because mid-round iteration
    // must stay green; the close-out step is
    //   GRAFT_CLOSEOUT=1 sbt "testOnly graft.VerifySurfaceSpec"
    // run AFTER the final bench_compare --adjudicate pass. Since
    // round 20 a bare Bench run writes target/bench_full_latest.json
    // (r20 verdict item 2 — a driver run must not clobber the
    // committed record); close-out copies the adjudicated file to the
    // repo root explicitly, and THIS file is what the check reads.
    assume(sys.env.get("GRAFT_CLOSEOUT").contains("1"),
      "close-out-only check; set GRAFT_CLOSEOUT=1 to enforce")
    val bench = new String(java.nio.file.Files.readAllBytes(
      repoFile("bench_full_latest.json")), "UTF-8")
    assert(bench.contains("\"qload\":{\""),
      "closing bench carries no per-query qload stamps — re-run the " +
        "full graft.Bench suite")
    assert(bench.contains("\"adjudicated\":true"),
      "closing bench not adjudicated — run scripts/bench_compare.py " +
        "<prev round bench> bench_full_latest.json --adjudicate")
    assert(bench.contains("\"failed\":[]"),
      "closing bench has failed queries — fix or retire them first")
  }

  test("every registered driver query passes the lint at sf0.001") {
    val spark = TestSpark.spark
    val dir = "/root/testdata/sf0.001"
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val vs = try Verify.surfaceViolations(fn(spark, dir).schema)
        catch { case _: Throwable => Nil } // runtime errs are other specs' job
        if (vs.isEmpty) Nil else Seq(s"$name: ${vs.mkString(", ")}")
    }
    assert(bad.isEmpty, s"queries with gate-unhashable surfaces:\n  " +
      bad.mkString("\n  "))
  }
}
