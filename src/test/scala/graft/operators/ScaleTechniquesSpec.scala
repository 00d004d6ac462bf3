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
    FrameCaches.release(spark)
  }

  test("salted join checkpoints the salt assignment (retry determinism)") {
    val orders = Tables.load(spark, dir, "orders")
    val customer = Tables.load(spark, dir, "customer")
      .withColumnRenamed("c_custkey", "o_custkey")
    // default path: the salted fact side is an eagerly materialized
    // localCheckpoint — its lineage (and thus any chance of re-deriving
    // a DIFFERENT salt on task retry) is cut, so the join plan reads the
    // fact from checkpointed blocks, not from the parquet scan
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val salted = Skew.saltedJoin(orders, customer, "o_custkey", 8)
    val plan = salted.queryExecution.optimizedPlan.toString
    assert(plan.contains("LogicalRDD"),
      s"salted fact side must be a lineage-cut checkpoint:\n$plan")
    assert(spark.sparkContext.getPersistentRDDs.keySet.diff(before).nonEmpty,
      "checkpointed salt blocks must be registered")
    FrameCaches.release(spark)
    assert(spark.sparkContext.getPersistentRDDs.keySet.diff(before).isEmpty,
      "FrameCaches.release must drop the checkpointed salt blocks")
    // opt-out path (deterministic scan input): no checkpoint, identical rows
    val plain = orders.join(customer, Seq("o_custkey"))
      .select("o_orderkey", "c_name")
    val unchk = Skew.saltedJoin(orders, customer, "o_custkey", 8,
        checkpointSalt = false)
      .select("o_orderkey", "c_name")
    assert(!unchk.queryExecution.optimizedPlan.toString.contains("LogicalRDD"))
    assert(spark.sparkContext.getPersistentRDDs.keySet.diff(before).isEmpty)
    assert(unchk.exceptAll(plain).isEmpty && plain.exceptAll(unchk).isEmpty)
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
