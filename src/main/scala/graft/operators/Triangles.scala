package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting (reference scope: none —
  * beyond-reference, SURVEY §2.13). Triangle mass is the standard
  * cohesion/clustering statistic over co-occurrence graphs — spam and
  * bot subgraphs, community density, transitivity of "items bought
  * together". The naive triple self-join explodes on hub vertices;
  * the classic fix (Suri & Vassilvitskii's MR-NodeIterator++ family)
  * is DEGREE ORIENTATION, which this operator implements with plain
  * equi-joins.
  */
object Triangles {

  /** Count triangles in the undirected simple graph given as canonical
    * edges (`aCol < bCol`, one row per edge — [[Itemsets.itemPairs]]
    * emits exactly this shape). Returns one row:
    * `(n_nodes, n_edges, n_triangles)`.
    *
    * Every edge is oriented from its LOWER-degree endpoint to the
    * higher (ties broken by vertex id — a total order, so each
    * triangle has exactly one vertex with two out-edges and is counted
    * exactly once). Out-degrees under this orientation are bounded by
    * O(√m) regardless of how skewed the raw degree distribution is —
    * the hub that would emit degree² wedges as a join key instead
    * receives edges and emits none. Wedges (pairs of out-neighbors)
    * are generated per source vertex and closed by one semi-join back
    * against the canonical edge set.
    *
    * Scale shape: two degree aggregates (map-side combined), the
    * orientation join, a wedge self-join keyed on the oriented source,
    * and the closing LEFT SEMI equi-join — every shuffle keyed, no
    * cartesian anywhere, cost riding Σ out_deg² ≤ O(m^1.5) (the
    * output-optimal bound for triangle listing), not Σ deg².
    *
    * The edge frame is consumed by five plan instances (both degree
    * branches, the orientation join, the closing semi-join, the edge
    * count) and `oriented` by the wedge self-join's two sides — each
    * is persisted (tracked in [[FrameCaches]]) so the caller's edge
    * pipeline (often itself a multi-shuffle aggregation, e.g.
    * [[Itemsets.itemPairs]]) materializes once, not per branch.
    */
  /** Per-vertex triangle participation: `(v, deg, tri)` for every
    * vertex of degree ≥ 1 — the row local clustering coefficients,
    * transitivity, and triangle-dense-subgraph mining read off. Same
    * degree-oriented engine as [[triangleStats]], but the closing
    * step is an INNER join (the triangle rows are needed, not just
    * their count) and each triangle is credited to all three corners
    * via one explode + a map-side-combined count. Vertices in no
    * triangle emit `tri = 0` (left join from the degree side — they
    * must appear: a coefficient denominator exists for every deg ≥ 2
    * vertex whether or not it closes anything).
    */
  def vertexTriangles(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val miss = Seq(aCol, bCol).filterNot(edges.columns.contains)
    require(miss.isEmpty, s"edge columns missing: ${miss.mkString(",")}")
    val e = FrameCaches.track(
      edges.select(col(aCol).as("a"), col(bCol).as("b")).persist())
    val deg = e.select(col("a").as("v"))
      .unionByName(e.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    val oriented = FrameCaches.track(e
      .join(deg.withColumnRenamed("v", "a").withColumnRenamed("deg", "da"), "a")
      .join(deg.withColumnRenamed("v", "b").withColumnRenamed("deg", "db"), "b")
      .select(
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("a"))
          .otherwise(col("b")).as("src"),
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("b"))
          .otherwise(col("a")).as("dst"))
      .persist())
    val o1 = oriented.withColumnRenamed("dst", "d1")
    val o2 = oriented.withColumnRenamed("dst", "d2")
    val triRows = o1.join(o2, "src").filter(col("d1") < col("d2"))
      .select(col("src"), col("d1").as("a"), col("d2").as("b"))
      .join(e, Seq("a", "b"), "inner")
    val perVertex = triRows
      .select(explode(array(col("src"), col("a"), col("b"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("tri"))
    deg.join(perVertex, Seq("v"), "left")
      .select(col("v"), col("deg"), coalesce(col("tri"), lit(0L)).as("tri"))
  }

  def triangleStats(edges: DataFrame, aCol: String, bCol: String): DataFrame = {
    val miss = Seq(aCol, bCol).filterNot(edges.columns.contains)
    require(miss.isEmpty, s"edge columns missing: ${miss.mkString(",")}")
    val e = FrameCaches.track(
      edges.select(col(aCol).as("a"), col(bCol).as("b")).persist())
    val deg = e.select(col("a").as("v"))
      .unionByName(e.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    // orient low → high under the (degree, id) total order
    val oriented = FrameCaches.track(e
      .join(deg.withColumnRenamed("v", "a").withColumnRenamed("d", "da"), "a")
      .join(deg.withColumnRenamed("v", "b").withColumnRenamed("d", "db"), "b")
      .select(
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("a"))
          .otherwise(col("b")).as("src"),
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("b"))
          .otherwise(col("a")).as("dst"))
      .persist())
    // wedges at src: unordered out-neighbor pairs, canonicalized so the
    // closing probe can hit the a<b edge table directly
    val o1 = oriented.withColumnRenamed("dst", "d1")
    val o2 = oriented.withColumnRenamed("dst", "d2")
    val wedges = o1.join(o2, "src").filter(col("d1") < col("d2"))
      .select(col("d1").as("a"), col("d2").as("b"))
    val tri = wedges.join(e, Seq("a", "b"), "left_semi")
    val nodes = deg.agg(count(lit(1)).as("n_nodes"))
    val em = e.agg(count(lit(1)).as("n_edges"))
    val tm = tri.agg(count(lit(1)).as("n_triangles"))
    nodes.crossJoin(broadcast(em)).crossJoin(broadcast(tm))
  }
}
