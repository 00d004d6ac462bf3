package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions

/** Engine-completeness operators beyond the reference's surface
  * (SURVEY.md §2.8 notes it uses no set operations): UNION/INTERSECT/
  * EXCEPT, ROLLUP, corpus-level token frequency (explode → count →
  * top-k), and HLL approximate distinct (rows-only check — sketch
  * internals differ across engines by construction).
  */
object ExtendedQueries extends QuerySet {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  def u1UnionAll(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val big = o.filter(col("o_totalprice") > 300000)
      .select(col("o_orderkey"), lit("big").as("bucket"))
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), lit("urgent").as("bucket"))
    big.unionByName(urgent).orderBy("o_orderkey", "bucket")
  }

  def u2Intersect(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    o.filter(col("o_orderstatus") === "F").select("o_custkey")
      .intersect(o.filter(col("o_orderstatus") === "O").select("o_custkey"))
      .orderBy("o_custkey")
  }

  def u3Except(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    o.filter(col("o_orderstatus") === "F").select("o_custkey")
      .except(o.filter(col("o_orderstatus") === "P").select("o_custkey"))
      .orderBy("o_custkey")
  }

  def r1Rollup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .rollup("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("total_sales"))
      .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n_orders"), col("total_sales"))
      .orderBy("status", "priority")

  /** Corpus token frequency: the explode→count→top-k shape every text
    * pipeline needs (stopword mining, vocabulary builds).
    */
  def tw1TopWords(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(explode(TextFunctions.tokens(lower(col("text")))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))
      .limit(20)

  /** HLL approximate distinct — rows-only check (sketches differ across
    * engines); the spec asserts the estimate lands near the exact count.
    */
  def hll1ApproxDistinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").agg(
      approx_count_distinct(col("l_partkey")).as("approx_parts"),
      countDistinct(col("l_orderkey")).as("exact_orders"))

  /** Multimodal feature extraction over the deterministic synthetic
    * binary corpus (rows-only driver check — the stub codec's fake
    * pixels are JVM-seeded and not re-derivable in SQL; see
    * `graft.multimodal` and its spec for the full contract).
    */
  def m1ImageFeatures(s: SparkSession, dir: String): DataFrame = {
    val media = graft.multimodal.Multimodal.syntheticMedia(s, 200)
    graft.multimodal.Multimodal.imageFeatures(media).toDF()
      .select(col("media_id"), col("width"), col("height"),
        round(col("mean_luma"), 4).as("mean_luma"))
      .orderBy("media_id")
  }

  val entries: Map[String, Q] = Map(
    "m1_image_features" -> m1ImageFeatures _,
    "u1_union_all" -> u1UnionAll _,
    "u2_intersect" -> u2Intersect _,
    "u3_except" -> u3Except _,
    "r1_rollup" -> r1Rollup _,
    "tw1_top_words" -> tw1TopWords _,
    "hll1_approx_distinct" -> hll1ApproxDistinct _,
  )

  private val toksLowerSql =
    """list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), t -> len(t) > 0)"""

  val oracles: Map[String, String] = Map(
    "u1_union_all" ->
      """SELECT o_orderkey, 'big' AS bucket FROM orders WHERE o_totalprice > 300000
        |UNION ALL
        |SELECT o_orderkey, 'urgent' AS bucket FROM orders
        |WHERE o_orderpriority = '1-URGENT'
        |ORDER BY o_orderkey, bucket""".stripMargin,
    "u2_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |ORDER BY o_custkey""".stripMargin,
    "u3_except" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
        |EXCEPT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
        |ORDER BY o_custkey""".stripMargin,
    "r1_rollup" ->
      """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
        | COALESCE(o_orderpriority, 'ALL') AS priority,
        | COUNT(*) AS n_orders,
        | ROUND(SUM(o_totalprice), 2) AS total_sales
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY status, priority""".stripMargin,
    "tw1_top_words" ->
      s"""SELECT word, COUNT(*) AS n FROM (
         |  SELECT unnest($toksLowerSql) AS word FROM documents)
         |GROUP BY word ORDER BY n DESC, word LIMIT 20""".stripMargin,
  )
}
