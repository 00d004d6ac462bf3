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
  *
  * Every edge is oriented from its LOWER-degree endpoint to the
  * higher (ties broken by vertex id — a total order, so each
  * triangle has exactly one vertex with two out-edges and is counted
  * exactly once). Out-degrees under this orientation are bounded by
  * O(√m) regardless of how skewed the raw degree distribution is —
  * the hub that would emit degree² wedges as a join key instead
  * receives edges and emits none.
  *
  * Two close formulations, A/B'd in round 16 over the sf0.1
  * co-purchase graph (1.2M edges, 1.9M triangles; BASELINE.md
  * §round-16):
  *  - DEFAULT ([[triangleStats]]/[[vertexTriangles]]): the
  *    EDGE-ITERATOR close — per oriented edge, intersect the two
  *    endpoints' sorted out-neighbor arrays ([[adjCommon]]). The
  *    Σ out_deg² work happens inside `array_intersect` over two
  *    m-row keyed joins; the 41M-row wedge frame is never
  *    materialized. Measured ~1.8–2× faster at 1× and 10× with
  *    growth exponents 0.79 (census) / 0.66 (per-vertex), and it
  *    needs no broadcast, so it is also the no-cap 100 TB path.
  *  - WEDGE ([[triangleStatsWedge]]/[[vertexTrianglesWedge]]): pairs
  *    of out-neighbors generated per source and closed by one
  *    equi-join against the canonical edge set (broadcast at or
  *    under [[defaultBroadcastCloseMax]] edges, keyed shuffle
  *    above). Retained as the independent cross-check
  *    implementation — the specs pin both closes census- and
  *    per-corner-identical, which guards each against the other's
  *    subtle miscount.
  *
  * Scale shape (both): two degree aggregates (map-side combined),
  * the orientation join (degree side auto-broadcast by AQE — ≤ one
  * row per vertex), then the close — every shuffle keyed, no
  * cartesian anywhere, cost riding Σ out_deg² ≤ O(m^1.5) (the
  * output-optimal bound for triangle listing), not Σ deg².
  */
object Triangles {

  /** Edge sets at or under this row count close wedges via a
    * BROADCAST hash join (≈ 100 MB hashed at the cap — safe under
    * every executor sizing this library targets); larger edge sets
    * fall back to the keyed shuffle close. Results are identical on
    * both paths (pinned in SeriesOpsSpec with the cap forced to 0).
    */
  val defaultBroadcastCloseMax: Long = 4L * 1000 * 1000

  /** Canonical edge frame (persisted), its degree frame, and the
    * wedge frame under the (degree, id) orientation — the shared
    * engine of [[triangleStats]] and [[vertexTriangles]]. The edge
    * frame is consumed by several plan instances (both degree
    * branches, the orientation join, the closing join, the caller's
    * counts) and `oriented` by the wedge self-join's two sides —
    * each is persisted (tracked in [[FrameCaches]]) so the caller's
    * edge pipeline (often itself a multi-shuffle aggregation, e.g.
    * [[Itemsets.itemPairs]]) materializes once, not per branch.
    * Wedges are canonicalized (`a < b`) so the closing probe hits
    * the `a < b` edge table directly.
    */
  private def wedgeEngine(edges: DataFrame, aCol: String, bCol: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val miss = Seq(aCol, bCol).filterNot(edges.columns.contains)
    require(miss.isEmpty, s"edge columns missing: ${miss.mkString(",")}")
    // canonical-form guard (map-side, rides the scan): every edge must
    // satisfy a < b, the precondition the whole census rests on — a
    // graph fed with BOTH orientations of each edge would silently
    // double degrees and mis-count triangles, and its reversed copies
    // all violate a < b, so this raise catches exactly that corruption
    // loudly (NULL endpoints fail the test too and raise). A literal
    // repeat of the same (a, b) row is the one bad shape no map-side
    // check can see; one-row-per-edge stays the documented contract —
    // detecting it would cost a full extra shuffle per call.
    val e = FrameCaches.track(
      edges.select(col(aCol).as("a"), col(bCol).as("b"))
        .select(
          when(col("a") < col("b"), col("a"))
            .otherwise(raise_error(concat(
              lit("[graft.triangles] non-canonical edge ("),
              col("a").cast("string"), lit(", "), col("b").cast("string"),
              lit(") — edges must satisfy a < b, one row per undirected edge"))))
            .as("a"),
          col("b"))
        .persist())
    // persisted (r19): deg has THREE plan consumers — BOTH sides of
    // the orientation join below and the caller's final nodes/left
    // join — and an unpersisted aggregate re-runs its 2m-row union +
    // exchange once per consumer (the before-plan showed the subtree
    // three times; guide §2.4 — one exchange, shared)
    val deg = FrameCaches.track(e.select(col("a").as("v"))
      .unionByName(e.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))
      .persist())
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
    val wedges = o1.join(o2, "src").filter(col("d1") < col("d2"))
      .select(col("src"), col("d1").as("a"), col("d2").as("b"))
    (e, deg, oriented, wedges)
  }

  /** The closing side: broadcast when the (already persisted) edge
    * set is small enough, keyed shuffle otherwise. The count is one
    * cheap action over the persisted frame — and both public entry
    * points need it anyway (n_edges / the caller's stats).
    */
  private def closer(e: DataFrame, nEdges: Long, cap: Long): DataFrame =
    if (nEdges <= cap) broadcast(e) else e

  /** EDGE-ITERATOR close (the round-16 A/B alternative to the wedge
    * self-join): per oriented source, the SORTED out-neighbor array;
    * per oriented edge (u, v), the triangles it detects are
    * `N+(u) ∩ N+(v)` (u is the pivot with two out-edges, v→w the
    * closing edge — each triangle is found at exactly one edge).
    * Emits one row per oriented edge that closes ≥ 1 triangle:
    * `(src, dst, common: array)` of the closing third corners.
    *
    * Why it can beat the wedge join: the wedge formulation
    * MATERIALIZES Σ out_deg² rows (41M on the sf0.1 co-purchase
    * graph) and probes each against the edge set; here the same
    * Σ out_deg² work happens INSIDE `array_intersect` over two
    * m-row keyed joins — no 41M-row intermediate, no giant probe.
    * Out-degrees are O(√m) under the orientation, so the arrays are
    * bounded (the hub that would explode a collect_list emits no
    * out-edges). Same asymptotics, different constant.
    */
  /** Join each oriented edge to both endpoints' sorted out-neighbor
    * arrays. `bcastAdj` (decided by the caller from the PERSISTED edge
    * count against [[defaultBroadcastCloseMax]] — the [[closer]] rule)
    * broadcasts the adjacency frame into BOTH probes: the whole close
    * then runs as map work over the persisted `oriented` frame — no
    * exchange of the edge set on src, none on dst, no SMJ sorts (the
    * r20 before-plan shuffled oriented + adj three times; AQE did not
    * convert, the array side sits just over the 10 MB estimate). The
    * adjacency mass is bounded by the edge count (Σ out_deg = m longs),
    * so the same cap that makes the wedge close's edge broadcast safe
    * makes this one safe; above the cap the keyed-shuffle joins remain
    * the no-cap 100 TB path.
    */
  private def adjJoined(oriented: DataFrame, bcastAdj: Boolean): DataFrame = {
    val adj = oriented.groupBy(col("src").as("v"))
      .agg(sort_array(collect_list(col("dst"))).as("nbrs"))
    val side = if (bcastAdj) broadcast(adj) else adj
    oriented
      .join(side.select(col("v").as("src"), col("nbrs").as("nu")), Seq("src"))
      // inner: a sink dst has N+ = ∅ and detects nothing
      .join(side.select(col("v").as("dst"), col("nbrs").as("nv")), Seq("dst"))
  }

  private def longIds(oriented: DataFrame): Boolean =
    oriented.schema("dst").dataType ==
      org.apache.spark.sql.types.LongType

  private def adjCommon(oriented: DataFrame, bcastAdj: Boolean): DataFrame =
    adjJoined(oriented, bcastAdj)
      // sorted-merge intersect, not array_intersect, on the long-id
      // path: the adjacency arrays are sorted duplicate-free sets by
      // construction (sort_array over each src's distinct dsts), so
      // the two-pointer merge returns the identical ascending element
      // list while skipping array_intersect's per-call hash-set build
      // — the r20 8-core profile put gr4's entire cost in this one
      // stage (§4). Non-long ids keep the generic built-in.
      .select(col("src"), col("dst"),
        (if (longIds(oriented))
          graft.functions.TextExpressions
            .sortedLongIntersect(col("nu"), col("nv"))
        else array_intersect(col("nu"), col("nv"))).as("common"))
      .filter(size(col("common")) > 0)

  /** Per-vertex triangle participation: `(v, deg, tri)` for every
    * vertex of degree ≥ 1 — the row local clustering coefficients,
    * transitivity, and triangle-dense-subgraph mining read off. The
    * closing step is an INNER join (the triangle rows are needed,
    * not just their count) and each triangle is credited to all
    * three corners via one explode + a map-side-combined count.
    * Vertices in no triangle emit `tri = 0` (left join from the
    * degree side — they must appear: a coefficient denominator
    * exists for every deg ≥ 2 vertex whether or not it closes
    * anything).
    */
  def vertexTrianglesWedge(edges: DataFrame, aCol: String, bCol: String,
      broadcastCloseMax: Long = defaultBroadcastCloseMax): DataFrame = {
    val (e, deg, _, wedges) = wedgeEngine(edges, aCol, bCol)
    val triRows = wedges.join(closer(e, e.count(), broadcastCloseMax),
      Seq("a", "b"), "inner")
    val perVertex = triRows
      .select(explode(array(col("src"), col("a"), col("b"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("tri"))
    deg.join(perVertex, Seq("v"), "left")
      .select(col("v"), col("deg"), coalesce(col("tri"), lit(0L)).as("tri"))
  }

  /** Count triangles in the undirected simple graph given as canonical
    * edges (`aCol < bCol`, one row per edge — [[Itemsets.itemPairs]]
    * emits exactly this shape). Returns one row:
    * `(n_nodes, n_edges, n_triangles)`.
    */
  def triangleStatsWedge(edges: DataFrame, aCol: String, bCol: String,
      broadcastCloseMax: Long = defaultBroadcastCloseMax): DataFrame = {
    val (e, deg, _, wedges) = wedgeEngine(edges, aCol, bCol)
    val nEdges = e.count()
    val tri = wedges.join(closer(e, nEdges, broadcastCloseMax),
      Seq("a", "b"), "left_semi")
    val nodes = deg.agg(count(lit(1)).as("n_nodes"))
    val tm = tri.agg(count(lit(1)).as("n_triangles"))
    nodes.select(col("n_nodes"), lit(nEdges).as("n_edges"))
      .crossJoin(broadcast(tm))
  }

  /** [[triangleStats]] through the edge-iterator close ([[adjCommon]])
    * — identical output, no wedge materialization. Two keyed m-row
    * joins + per-edge sorted-array intersections instead of the
    * Σ out_deg² wedge frame; works at any edge count (no broadcast
    * needed), so it is also the no-cap 100 TB path.
    */
  def triangleStats(edges: DataFrame, aCol: String, bCol: String,
      broadcastCloseMax: Long = defaultBroadcastCloseMax): DataFrame = {
    val (e, deg, oriented, _) = wedgeEngine(edges, aCol, bCol)
    val nEdges = e.count()
    val bcast = nEdges <= broadcastCloseMax
    // census only needs SIZES: the long-id path sums the two-pointer
    // merge count directly and never materializes an intersection
    // array (the filter(size > 0) is vacuous under a sum of zeros)
    val tm = (if (longIds(oriented))
      adjJoined(oriented, bcast).agg(coalesce(sum(
        graft.functions.TextExpressions
          .sortedIntersectSize(col("nu"), col("nv")).cast("long")),
        lit(0L)).as("n_triangles"))
    else adjCommon(oriented, bcast)
      .agg(coalesce(sum(size(col("common")).cast("long")), lit(0L))
        .as("n_triangles")))
    val nodes = deg.agg(count(lit(1)).as("n_nodes"))
    nodes.select(col("n_nodes"), lit(nEdges).as("n_edges"))
      .crossJoin(broadcast(tm))
  }

  /** [[vertexTriangles]] through the edge-iterator close — identical
    * output. Each detected triangle credits its three corners: the
    * detecting edge's endpoints take `|common|` each, every third
    * corner takes 1 via one explode (3·n_triangles rows — vs the
    * wedge path's Σ out_deg² intermediate).
    */
  def vertexTriangles(edges: DataFrame, aCol: String, bCol: String,
      broadcastCloseMax: Long = defaultBroadcastCloseMax): DataFrame = {
    val (e, deg, oriented, _) = wedgeEngine(edges, aCol, bCol)
    // SINGLE-PASS credits: each detecting edge emits |common| for both
    // endpoints and 1 per third corner in one explode — the common
    // frame is consumed once, so nothing needs to persist. The count
    // rides the persisted edge frame (one cheap action) and buys the
    // broadcast-vs-shuffle decision for both adjacency probes.
    val credits = adjCommon(oriented, e.count() <= broadcastCloseMax)
      .select(explode(concat(
        array(
          struct(col("src").as("v"), size(col("common")).cast("long").as("c")),
          struct(col("dst").as("v"), size(col("common")).cast("long").as("c"))),
        transform(col("common"),
          w => struct(w.as("v"), lit(1L).as("c"))))).as("x"))
      .select(col("x.v").as("v"), col("x.c").as("c"))
      .groupBy("v").agg(sum("c").as("tri"))
    deg.join(credits, Seq("v"), "left")
      .select(col("v"), col("deg"), coalesce(col("tri"), lit(0L)).as("tri"))
  }
}
