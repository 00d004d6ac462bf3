package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The two explicit-partitioning techniques the 100 TB posture calls
  * for beyond what Catalyst does automatically: salting a skewed join
  * and bucketing for shuffle-free co-located joins.
  */
class ScaleTechniquesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("salted join returns exactly the plain join's rows") {
    val orders = Tables.load(spark, dir, "orders")
    val customer = Tables.load(spark, dir, "customer")
      .withColumnRenamed("c_custkey", "o_custkey")
    val plain = orders.join(customer, Seq("o_custkey"))
      .select("o_orderkey", "c_name")
    val salted = Skew.saltedJoin(orders, customer, "o_custkey", 8)
      .select("o_orderkey", "c_name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("bucketed tables join without any exchange") {
    spark.sql("CREATE DATABASE IF NOT EXISTS buck")
    Tables.load(spark, dir, "lineitem")
      .write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("buck.lineitem_b")
    Tables.load(spark, dir, "orders")
      .withColumnRenamed("o_orderkey", "l_orderkey")
      .write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("buck.orders_b")
    // at test scale the planner would (rightly) broadcast, which
    // bypasses bucketing — force the shuffle-join path the buckets are
    // for, as a 100TB-sized side would be
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("buck.lineitem_b")
        .join(spark.table("buck.orders_b"), Seq("l_orderkey"))
        .select("l_orderkey", "l_quantity", "o_totalprice")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must be shuffle-free:\n$plan")
      assert(plan.contains("SortMergeJoin") && plan.contains("Bucketed: true"), plan)
      assert(joined.count() ==
        Tables.load(spark, dir, "lineitem").join(
          Tables.load(spark, dir, "orders"),
          col("l_orderkey") === col("o_orderkey")).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
