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

  test("dynamic partition pruning: a dim-side filter prunes fact partitions") {
    // the 100 TB join shape: a fact laid out by partition key joined to
    // a filtered dimension must only READ the partitions the dim
    // survivors name — Catalyst's DPP injects the dim's broadcast result
    // into the fact scan's PartitionFilters at runtime
    import spark.implicits._
    val factDir = s"${graft.TestSpark.repoRoot}/target/dpp-fact-${System.nanoTime()}"
    Tables.load(spark, dir, "events")
      .write.mode("overwrite").partitionBy("event_type").parquet(factDir)
    val fact = spark.read.parquet(factDir)
    // the dim must be a REAL relation: an in-memory Seq gets its filter
    // constant-folded into a LocalTableScan, and with no surviving
    // selective-predicate node DPP never considers the join
    val dimDir = s"${graft.TestSpark.repoRoot}/target/dpp-dim-${System.nanoTime()}"
    Seq(("purchase", 1), ("error", 2), ("click", 3),
      ("signup", 4), ("view", 5)).toDF("event_type", "type_id")
      .write.mode("overwrite").parquet(dimDir)
    val dim = spark.read.parquet(dimDir)
    // at test scale the pruning-benefit estimate (pruned bytes vs dim
    // subquery cost) rounds to "not worth it" — force the benefit
    // heuristic open so the INSERTION path itself is what's pinned
    val prevStats = spark.conf
      .get("spark.sql.optimizer.dynamicPartitionPruning.useStats")
    val prevRatio = spark.conf
      .get("spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    spark.conf.set(
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio", "1000000")
    try {
      val joined = fact.join(dim.filter(col("type_id") === 1), Seq("event_type"))
        .select("event_id", "type_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruningexpression"),
        s"fact scan must carry a runtime partition filter:\n$plan")
      assert(joined.count() ==
        Tables.load(spark, dir, "events")
          .filter(col("event_type") === "purchase").count())
    } finally {
      spark.conf.set(
        "spark.sql.optimizer.dynamicPartitionPruning.useStats", prevStats)
      spark.conf.set(
        "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio", prevRatio)
    }
  }

  test("runtime bloom filter prunes the fact side of a selective shuffle join") {
    // when neither side broadcasts (the 100 TB case), Spark can still
    // semi-prune the fact scan with a bloom filter built from the
    // filtered dim — pin that the injection actually fires so a conf or
    // plan-shape regression can't silently drop it
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10GB")
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    try {
      val fact = Tables.load(spark, dir, "lineitem")
      val dimF = Tables.load(spark, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .withColumnRenamed("o_orderkey", "l_orderkey")
      val joined = fact.join(dimF, Seq("l_orderkey"))
        .select("l_orderkey", "l_quantity", "o_totalprice")
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") && plan.contains("bloom_filter_agg"),
        s"runtime bloom filter must be injected on the fact scan:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")
      spark.conf.unset(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    }
  }

  test("CBO statistics flip a shuffle join to a broadcast join") {
    // Statistics-driven planning is the remaining 100 TB lever nothing
    // pinned: a dimension physically ABOVE the broadcast threshold
    // joins as SortMergeJoin on file size alone, but ANALYZE TABLE
    // row + column stats let FilterEstimation see that an equality
    // predicate keeps ~rowCount/ndv rows, dropping the estimate below
    // the threshold — the join flips to BroadcastHashJoin with ZERO
    // query changes. (AQE off here to isolate the static CBO decision;
    // at runtime AQE can make the same flip from observed sizes.)
    val prev = Seq(
      "spark.sql.cbo.enabled",
      "spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold"
    ).map(k => k -> spark.conf.getOption(k)).toMap
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "65536")
    val table = "cbo_dim"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    try {
      // md5 payloads keep parquet from compressing the table under the
      // threshold — the FILE size must stay big so only STATS can shrink
      // the filtered estimate
      spark.range(20000L)
        .select(col("id").as("k"), (col("id") % 100).as("grp"),
          md5(col("id").cast("string")).as("pad1"),
          md5((col("id") + 7).cast("string")).as("pad2"))
        .write.saveAsTable(table)
      def planFor(): String = {
        val fact = spark.range(100000L)
          .select((col("id") % 20000).as("k"), col("id").as("v"))
        fact.join(spark.table(table).filter(col("grp") === 7), Seq("k"))
          .queryExecution.executedPlan.toString
      }
      val before = planFor()
      assert(before.contains("SortMergeJoin") && !before.contains("BroadcastHashJoin"),
        s"without stats the filtered dim must stay a shuffle join:\n${before.take(1500)}")
      spark.sql(s"ANALYZE TABLE $table COMPUTE STATISTICS FOR COLUMNS grp")
      val after = planFor()
      assert(after.contains("BroadcastHashJoin"),
        s"column stats (ndv=100 of 20k rows) must flip the filtered dim to broadcast:\n${after.take(1500)}")
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None)    => spark.conf.unset(k)
      }
    }
  }

  test("SQL join hints override the planner: BROADCAST forces the join strategy") {
    // hints are the practical lever when stats lie (a filtered side the
    // optimizer sizes wrong) — nothing pinned that they actually bind.
    // With broadcast disabled by threshold, the BROADCAST hint must
    // still plan a BroadcastHashJoin; and MERGE must force SMJ where
    // the planner would have broadcast.
    val prev = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      graft.Tables.register(spark, dir, Seq("nation", "region"))
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val hinted = spark.sql(
        """SELECT /*+ BROADCAST(r) */ n.n_name, r.r_name
          |FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey""".stripMargin)
      hinted.collect()
      assert(hinted.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
        "BROADCAST hint must override the disabled threshold")
      prev.foreach { case (k, Some(v)) => spark.conf.set(k, v)
                     case (k, None) => spark.conf.unset(k) }
      val merged = spark.sql(
        """SELECT /*+ MERGE(r) */ n.n_name, r.r_name
          |FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey""".stripMargin)
      merged.collect()
      assert(merged.queryExecution.executedPlan.toString.contains("SortMergeJoin"),
        "MERGE hint must force SMJ where the planner would broadcast")
    } finally prev.foreach { case (k, Some(v)) => spark.conf.set(k, v)
                             case (k, None) => spark.conf.unset(k) }
  }

  test("AQE coalesces undersized shuffle partitions") {
    // the default-on behavior that makes shuffle.partitions=32 safe to
    // oversize at 100 TB: tiny reduce work collapses to few tasks. A
    // conf regression (coalescePartitions off) would silently schedule
    // 32 near-empty reducers per stage, fleet-wide.
    val df = spark.range(10000L)
      .groupBy((col("id") % 5).as("g")).agg(count(lit(1)).as("n"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AQEShuffleRead") && plan.contains("coalesced"),
      s"AQE must coalesce the 5-group shuffle below partition count:\n${plan.take(1500)}")
  }

  test("AQE skew join: a skewed shuffle partition is split (skew=true in the final plan)") {
    // L15's saltedJoin proves MANUAL skew handling; the production-first
    // lever at 100 TB is Spark's own adaptive skew-join split, and
    // nothing pinned it on — a conf regression would silently serialize
    // the hot key into one straggler task (round-9 verdict #4). One key
    // owns ~90% of the fact side; with test-scale thresholds AQE must
    // mark the SortMergeJoin skew=true (OptimizeSkewedJoin fired and
    // split the hot partition into parallel sub-reads).
    val prev = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.forceOptimizeSkewedJoin"
    ).map(k => k -> spark.conf.getOption(k)).toMap
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    spark.conf.set(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    // splitting adds reducer reads — at test scale AQE's cost model may
    // decline without the force flag (the 100 TB sizes clear it naturally)
    spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    try {
      val fact = spark.range(200000L).select(
        when(col("id") % 10 < 9, lit(0L)).otherwise(col("id")).as("k"),
        col("id").as("v"))
      val dim = spark.range(1000L).select(col("id").as("k"),
        (col("id") * 2).as("w"))
      val joined = fact.join(dim, Seq("k"))
      joined.collect() // AQE finalizes the plan only on execution
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"OptimizeSkewedJoin did not fire on a 90%-one-key join:\n${plan.take(2500)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
