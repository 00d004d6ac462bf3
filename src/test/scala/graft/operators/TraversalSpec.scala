package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[Traversal.reachable]]'s cyclic-graph contract (round-10
  * verdict item 5): termination on cycles WITHOUT leaning on the depth
  * bound, min-distance labeling, and equivalence with rc2's bounded
  * recursive-CTE spelling where both apply.
  */
class TraversalSpec extends SparkSpec {
  import spark.implicits._

  test("terminates on a cyclic graph and labels min distances") {
    // 1 → 2 → 3 → 1 (cycle) plus 3 → 4, 4 → 4 (self-loop); a UNION ALL
    // recursion without a depth cap loops forever here
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 4L))
      .toDF("src", "dst")
    val out = Traversal.reachable(edges, Seq(1L), maxDepth = 1000)
      .as[(Long, Long)].collect().toMap
    FrameCaches.release(spark)
    assert(out == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L),
      s"got $out")
  }

  test("each node appears exactly once; unreachable nodes are absent") {
    // two components: 1→2, and 10→11; seed only the first
    val edges = Seq((1L, 2L), (2L, 1L), (10L, 11L)).toDF("src", "dst")
    val rows = Traversal.reachable(edges, Seq(1L)).as[(Long, Long)].collect()
    FrameCaches.release(spark)
    assert(rows.map(_._1).sorted.toSeq == Seq(1L, 2L), s"got ${rows.toSeq}")
  }

  test("multiple sources: nearest source wins the distance") {
    // chain 1→2→3→4→5 seeded at both ends
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val out = Traversal.reachable(edges, Seq(1L, 5L))
      .as[(Long, Long)].collect().toMap
    FrameCaches.release(spark)
    assert(out == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 0L),
      s"got $out")
  }

  test("maxDepth truncation matches rc2's recursive-CTE min-dist readback") {
    val dir = "/root/testdata/sf0.001"
    val cte = graft.SparkEntry.queries("rc2_reachability")(spark, dir)
      .as[(Long, Long)].collect().toSet
    // the same co-order bipartite edge frame rc2 builds
    val pairs = graft.Tables.load(spark, dir, "lineitem")
      .join(graft.Tables.load(spark, dir, "orders")
        .select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("sk"))
      .distinct()
    val edges = pairs.select((col("c") * 2).as("src"), (col("sk") * 2 + 1).as("dst"))
      .unionByName(pairs.select((col("sk") * 2 + 1).as("src"),
        (col("c") * 2).as("dst")))
    val bfs = Traversal.reachable(edges, Seq(3L), maxDepth = 2)
      .as[(Long, Long)].collect().toSet
    FrameCaches.release(spark)
    assert(bfs == cte, s"BFS ${bfs.size} nodes vs CTE ${cte.size}")
  }
}
