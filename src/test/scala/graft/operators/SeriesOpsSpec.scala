package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit + adversarial coverage for the round-12 series/graph operators:
  * gap fill (spine bounds, presence vs value-null, span cap), interval
  * join (boundary exactness, multi-bin no-dup, empty intervals, bin
  * cap), triangle counting (known censuses, hub safety), skyline
  * (brute-force dominance cross-check, bucket neutrality).
  */
class SeriesOpsSpec extends SparkSpec {
  import spark.implicits._

  // --- TimeSeries.gapFillForward ---

  test("gapFill: generated days carry the last observation forward") {
    val daily = Seq(
      ("a", "2024-01-01", 10L), ("a", "2024-01-02", 20L),
      ("a", "2024-01-05", 50L), ("b", "2024-03-01", 7L))
      .toDF("k", "day", "v").withColumn("day", col("day").cast("date"))
    val out = TimeSeries.gapFillForward(daily, Seq("k"), "day", Seq("v"))
      .orderBy("k", "day")
      .select(col("k"), col("day").cast("string"), col("v_filled"),
        col("is_gap"))
      .as[(String, String, Long, Int)].collect.toSeq
    assert(out == Seq(
      ("a", "2024-01-01", 10L, 0), ("a", "2024-01-02", 20L, 0),
      ("a", "2024-01-03", 20L, 1), ("a", "2024-01-04", 20L, 1),
      ("a", "2024-01-05", 50L, 0),
      ("b", "2024-03-01", 7L, 0)))
  }

  test("gapFill: an observed NULL value is an observation, not a gap") {
    val daily = Seq(("a", "2024-01-01", Some(3L)), ("a", "2024-01-02", None))
      .toDF("k", "day", "v").withColumn("day", col("day").cast("date"))
    val out = TimeSeries.gapFillForward(daily, Seq("k"), "day", Seq("v"))
      .orderBy("day").select("is_gap", "v_filled")
      .as[(Int, Option[Long])].collect.toSeq
    // day 2 is present (is_gap 0); its fill still carries day 1's value
    assert(out == Seq((0, Some(3L)), (0, Some(3L))))
  }

  test("gapFill: a key span beyond maxSpanDays fails loudly") {
    val daily = Seq(("a", "2000-01-01", 1L), ("a", "2024-01-01", 2L))
      .toDF("k", "day", "v").withColumn("day", col("day").cast("date"))
    val e = intercept[Exception] {
      TimeSeries.gapFillForward(daily, Seq("k"), "day", Seq("v"),
        maxSpanDays = 365).collect()
    }
    assert(e.getMessage != null)
  }

  // --- RangeJoins.pointInInterval ---

  private def ivFrame(rows: Seq[(String, String, String, Long)]) =
    rows.toDF("scope", "st", "en", "iv_id")
      .withColumn("st", col("st").cast("date"))
      .withColumn("en", col("en").cast("date"))

  test("rangeJoin: half-open boundaries, scope isolation") {
    val iv = ivFrame(Seq(
      ("x", "2024-01-10", "2024-01-20", 1L),
      ("y", "2024-01-10", "2024-01-20", 2L)))
    val probe = Seq(
      ("x", "2024-01-09"), ("x", "2024-01-10"), ("x", "2024-01-19"),
      ("x", "2024-01-20"), ("y", "2024-01-15"))
      .toDF("scope", "d").withColumn("d", col("d").cast("date"))
    val got = RangeJoins.pointInInterval(probe, iv, Seq("scope"), "d",
        "st", "en")
      .select(col("iv_id"), col("d").cast("string"))
      .as[(Long, String)].collect.toSet
    // start day in, end day out, scopes never cross
    assert(got == Set((1L, "2024-01-10"), (1L, "2024-01-19"),
      (2L, "2024-01-15")))
  }

  test("rangeJoin: an interval spanning many bins matches a point ONCE") {
    val iv = ivFrame(Seq(("x", "2024-01-01", "2024-12-01", 9L)))
    val probe = Seq(("x", "2024-06-15")).toDF("scope", "d")
      .withColumn("d", col("d").cast("date"))
    val got = RangeJoins.pointInInterval(probe, iv, Seq("scope"), "d",
      "st", "en", binDays = 7)
    assert(got.count() == 1L)
  }

  test("rangeJoin: empty and inverted intervals match nothing") {
    val iv = ivFrame(Seq(
      ("x", "2024-01-10", "2024-01-10", 1L),
      ("x", "2024-02-10", "2024-01-10", 2L)))
    val probe = Seq(("x", "2024-01-10"), ("x", "2024-01-20"))
      .toDF("scope", "d").withColumn("d", col("d").cast("date"))
    assert(RangeJoins.pointInInterval(probe, iv, Seq("scope"), "d",
      "st", "en").count() == 0L)
  }

  test("rangeJoin: an interval wider than maxBins bins fails loudly") {
    val iv = ivFrame(Seq(("x", "2000-01-01", "2024-01-01", 1L)))
    val probe = Seq(("x", "2010-01-01")).toDF("scope", "d")
      .withColumn("d", col("d").cast("date"))
    val e = intercept[Exception] {
      RangeJoins.pointInInterval(probe, iv, Seq("scope"), "d",
        "st", "en", binDays = 1, maxBins = 100).collect()
    }
    assert(e.getMessage != null)
  }

  // --- RangeJoins.intervalOverlap ---

  test("overlapJoin: overlap pairs exact, touching endpoints excluded") {
    val a = Seq(("x", "2024-01-01", "2024-01-10", 1L),
      ("x", "2024-02-01", "2024-02-10", 2L))
      .toDF("scope", "st_a", "en_a", "ida")
      .withColumn("st_a", col("st_a").cast("date"))
      .withColumn("en_a", col("en_a").cast("date"))
    val b = Seq(
      ("x", "2024-01-05", "2024-01-20", 10L), // overlaps 1
      ("x", "2024-01-10", "2024-01-15", 11L), // touches 1's end: no
      ("y", "2024-01-05", "2024-01-08", 12L)) // wrong scope
      .toDF("scope", "st_b", "en_b", "idb")
      .withColumn("st_b", col("st_b").cast("date"))
      .withColumn("en_b", col("en_b").cast("date"))
    val got = RangeJoins.intervalOverlap(a, b, Seq("scope"),
        "st_a", "en_a", "st_b", "en_b")
      .select("ida", "idb").as[(Long, Long)].collect.toSet
    assert(got == Set((1L, 10L)))
  }

  test("overlapJoin: a many-bin overlap emits the pair exactly once") {
    val a = Seq(("x", "2024-01-01", "2024-12-01", 1L))
      .toDF("scope", "st_a", "en_a", "ida")
      .withColumn("st_a", col("st_a").cast("date"))
      .withColumn("en_a", col("en_a").cast("date"))
    val b = Seq(("x", "2024-03-01", "2024-09-01", 2L))
      .toDF("scope", "st_b", "en_b", "idb")
      .withColumn("st_b", col("st_b").cast("date"))
      .withColumn("en_b", col("en_b").cast("date"))
    // intersection spans many 7-day bins — the ownership rule must
    // claim the pair in exactly one
    assert(RangeJoins.intervalOverlap(a, b, Seq("scope"),
      "st_a", "en_a", "st_b", "en_b", binDays = 7).count() == 1L)
  }

  // --- TemporalJoins.asofMatchTsWithin ---

  test("asofWithin: most recent IF fresh — stale matches drop, not hide") {
    val left = Seq((1L, "u", 1000L), (2L, "u", 5000L))
      .toDF("id", "k", "lts")
    val right = Seq(("u", 900L), ("u", 4000L)).toDF("k", "rts")
    // id=1 matches 900 (lag 100, fresh); id=2's most recent is 4000
    // (lag 1000 > 500): it DROPS — the bound must not fall back to the
    // older 900 (that would be "most recent fresh", a different join)
    val got = TemporalJoins.asofMatchTsWithin(left, right, "k", "id",
        col("lts"), col("rts"), maxLagUs = 500L)
      .select(col("id"), col("_matched_us")).as[(Long, Long)]
      .collect.toSet
    assert(got == Set((1L, 900L)))
  }

  // --- Triangles.triangleStats ---

  private def tri(edges: Seq[(Long, Long)]): (Long, Long, Long) = {
    val e = edges.toDF("a", "b")
    val r = Triangles.triangleStats(e, "a", "b")
      .as[(Long, Long, Long)].collect.head
    r
  }

  test("triangles: K4 has 4, a square has 0, a star has 0") {
    // K4 on {1,2,3,4}
    assert(tri(Seq((1L,2L),(1L,3L),(1L,4L),(2L,3L),(2L,4L),(3L,4L)))
      == ((4L, 6L, 4L)))
    // 4-cycle: no chord, no triangle
    assert(tri(Seq((1L,2L),(2L,3L),(3L,4L),(1L,4L))) == ((4L, 4L, 0L)))
    // star: hub 1 with 5 leaves — the adversarial hub degree case
    assert(tri(Seq((1L,2L),(1L,3L),(1L,4L),(1L,5L),(1L,6L))) == ((6L, 5L, 0L)))
  }

  test("triangles: two triangles sharing an edge count as 2") {
    assert(tri(Seq((1L,2L),(1L,3L),(2L,3L),(2L,4L),(3L,4L)))._3 == 2L)
  }

  test("vertexTriangles: per-corner credit on K4, bowtie, and star") {
    def vt(edges: Seq[(Long, Long)]): Map[Long, (Long, Long)] =
      Triangles.vertexTriangles(edges.toDF("a", "b"), "a", "b")
        .as[(Long, Long, Long)].collect
        .map { case (v, d, t) => v -> (d, t) }.toMap
    // K4: every vertex deg 3, in 3 of the 4 triangles (coeff = 1)
    val k4 = vt(Seq((1L,2L),(1L,3L),(1L,4L),(2L,3L),(2L,4L),(3L,4L)))
    assert(k4 == Map(1L->(3L,3L), 2L->(3L,3L), 3L->(3L,3L), 4L->(3L,3L)))
    // bowtie: center 3 sits in both triangles, wings in one each
    val bow = vt(Seq((1L,2L),(1L,3L),(2L,3L),(3L,4L),(3L,5L),(4L,5L)))
    assert(bow == Map(1L->(2L,1L), 2L->(2L,1L), 3L->(4L,2L),
      4L->(2L,1L), 5L->(2L,1L)))
    // star: triangle-free vertices still emit tri = 0 (the left join)
    val star = vt(Seq((1L,2L),(1L,3L),(1L,4L)))
    assert(star == Map(1L->(3L,0L), 2L->(1L,0L), 3L->(1L,0L), 4L->(1L,0L)))
    // consistency with the census: per-corner credits sum to 3x count
    val k4Total = Triangles.triangleStats(
      Seq((1L,2L),(1L,3L),(1L,4L),(2L,3L),(2L,4L),(3L,4L)).toDF("a", "b"),
      "a", "b").as[(Long, Long, Long)].collect.head._3
    assert(k4.values.map(_._2).sum == 3 * k4Total)
  }

  test("triangles: the shuffle-close path (cap 0) equals the broadcast close") {
    // the closing join broadcasts the edge set when it fits under the
    // wired cap and falls back to a keyed shuffle above it — both
    // paths must produce identical censuses (results-neutrality pin)
    val edges = Seq((1L,2L),(1L,3L),(1L,4L),(2L,3L),(2L,4L),(3L,4L),
      (4L,5L),(5L,6L),(4L,6L),(7L,8L))
    val e = edges.toDF("a", "b")
    val bStats = Triangles.triangleStatsWedge(e, "a", "b")
      .as[(Long, Long, Long)].collect.head
    val sStats = Triangles.triangleStatsWedge(e, "a", "b", broadcastCloseMax = 0L)
      .as[(Long, Long, Long)].collect.head
    assert(bStats == sStats && bStats == ((8L, 10L, 5L)), (bStats, sStats))
    val bVt = Triangles.vertexTrianglesWedge(e, "a", "b")
      .as[(Long, Long, Long)].collect.toSet
    val sVt = Triangles.vertexTrianglesWedge(e, "a", "b", broadcastCloseMax = 0L)
      .as[(Long, Long, Long)].collect.toSet
    assert(bVt == sVt, s"broadcast $bVt vs shuffle $sVt")
    // r20: the edge-iterator close gained the same guarded broadcast on
    // its adjacency probes — the shuffle fallback (the 100 TB path)
    // must stay census- and per-corner-identical
    val bAdj = Triangles.triangleStats(e, "a", "b")
      .as[(Long, Long, Long)].collect.head
    val sAdj = Triangles.triangleStats(e, "a", "b", broadcastCloseMax = 0L)
      .as[(Long, Long, Long)].collect.head
    assert(bAdj == sAdj && bAdj == ((8L, 10L, 5L)), (bAdj, sAdj))
    val bAVt = Triangles.vertexTriangles(e, "a", "b")
      .as[(Long, Long, Long)].collect.toSet
    val sAVt = Triangles.vertexTriangles(e, "a", "b", broadcastCloseMax = 0L)
      .as[(Long, Long, Long)].collect.toSet
    assert(bAVt == sAVt, s"broadcast $bAVt vs shuffle $sAVt")
  }

  test("triangles: the edge-iterator close equals the wedge close") {
    // round-16 A/B formulation: adjCommon intersects sorted
    // out-neighbor arrays per oriented edge instead of materializing
    // the wedge frame — must be census- and per-corner-identical
    val edges = Seq((1L,2L),(1L,3L),(1L,4L),(2L,3L),(2L,4L),(3L,4L),
      (4L,5L),(5L,6L),(4L,6L),(7L,8L))
    val e = edges.toDF("a", "b")
    val w = Triangles.triangleStatsWedge(e, "a", "b")
      .as[(Long, Long, Long)].collect.head
    val adj = Triangles.triangleStats(e, "a", "b")
      .as[(Long, Long, Long)].collect.head
    assert(w == adj && adj == ((8L, 10L, 5L)), (w, adj))
    val wVt = Triangles.vertexTrianglesWedge(e, "a", "b")
      .as[(Long, Long, Long)].collect.toSet
    val aVt = Triangles.vertexTriangles(e, "a", "b")
      .as[(Long, Long, Long)].collect.toSet
    assert(wVt == aVt, s"wedge $wVt vs adjacency $aVt")
    // triangle-free graph: the empty-intersection sum coalesces to 0
    val none = Triangles.triangleStats(
      Seq((1L,2L),(2L,3L),(3L,4L),(1L,4L)).toDF("a", "b"), "a", "b")
      .as[(Long, Long, Long)].collect.head
    assert(none == ((4L, 4L, 0L)), none)
  }

  test("triangles: non-canonical edges raise loudly instead of mis-counting") {
    // both orientations of an edge present: the reversed copy (3,1)
    // violates a < b — before the guard this silently doubled degrees
    val bad = Seq((1L, 3L), (3L, 1L), (1L, 2L), (2L, 3L)).toDF("a", "b")
    val ex = intercept[Exception] {
      Triangles.triangleStats(bad, "a", "b").collect()
    }
    def rootMsg(t: Throwable): String =
      (Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(m => Option(m.getMessage).getOrElse("")) ++ Iterator(""))
        .mkString("\n")
    assert(rootMsg(ex).contains("non-canonical edge"), ex.getMessage)
    // a self-loop (a == b) is equally non-canonical
    val loop = Seq((1L, 2L), (2L, 2L)).toDF("a", "b")
    val ex2 = intercept[Exception] {
      Triangles.vertexTriangles(loop, "a", "b").collect()
    }
    assert(rootMsg(ex2).contains("non-canonical edge"), ex2.getMessage)
  }

  // --- Skyline.pareto2 ---

  private def brute(pts: Seq[(Long, Long)]): Set[(Long, Long, Long)] = {
    val grouped = pts.groupBy(identity).map { case ((c, g), v) =>
      (c, g, v.size.toLong) }.toSeq
    grouped.filter { case (c, g, _) =>
      !grouped.exists { case (c2, g2, _) =>
        c2 <= c && g2 >= g && (c2 < c || g2 > g) }
    }.toSet
  }

  test("skyline: matches brute-force dominance on a mixed point set") {
    val pts = Seq((5L,3L), (5L,3L), (5L,7L), (4L,7L), (6L,9L), (6L,9L),
      (7L,9L), (3L,1L), (8L,2L), (4L,4L))
    val df = pts.toDF("cost", "gain")
    val got = Skyline.pareto2(df, "cost", "gain")
      .as[(Long, Long, Long)].collect.toSet
    assert(got == brute(pts))
  }

  test("skyline: result is bucket-count neutral") {
    val pts = (1L to 200L).map(i => (i % 37, (i * 7) % 23))
    val df = pts.toDF("cost", "gain")
    val one = Skyline.pareto2(df, "cost", "gain", buckets = 1)
      .as[(Long, Long, Long)].collect.toSet
    val many = Skyline.pareto2(df, "cost", "gain", buckets = 13)
      .as[(Long, Long, Long)].collect.toSet
    assert(one == many)
    assert(one == brute(pts))
  }

  test("skyline: duplicate frontier points survive together with counts") {
    val df = Seq((1L, 5L), (1L, 5L), (2L, 9L)).toDF("cost", "gain")
    val got = Skyline.pareto2(df, "cost", "gain")
      .as[(Long, Long, Long)].collect.toSet
    assert(got == Set((1L, 5L, 2L), (2L, 9L, 1L)))
  }
}
