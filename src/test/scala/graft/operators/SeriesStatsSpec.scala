package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit + adversarial coverage for [[SeriesStats]]: Gini against
  * hand-computed coefficients (even split → 0, single holder →
  * (n−1)/n, the textbook 10/20/30/40 → 250‰), group independence, the
  * negative-value guard, zero-total groups; ACF against an exact
  * alternating series (lag-1 −900‰, lag-2 +800‰), constant series,
  * and index gaps (a pair needs BOTH endpoints).
  */
class SeriesStatsSpec extends SparkSpec {
  import spark.implicits._

  // --- SeriesStats.giniPermille ---

  private def gini(rows: Seq[(String, Long, Long)]): Map[String, (Long, Long, Long)] = {
    val df = rows.toDF("g", "id", "x")
    SeriesStats.giniPermille(df, Seq("g"), "x", "id")
      .select("g", "n_rows", "total", "gini_permille")
      .as[(String, Long, Long, Long)].collect()
      .map { case (g, n, t, p) => g -> (n, t, p) }.toMap
  }

  test("gini: an even split is 0; a single holder is (n-1)/n") {
    val out = gini(Seq(
      ("even", 1L, 100L), ("even", 2L, 100L), ("even", 3L, 100L),
      ("even", 4L, 100L),
      ("one", 1L, 0L), ("one", 2L, 0L), ("one", 3L, 0L), ("one", 4L, 100L)))
    assert(out("even") == ((4L, 400L, 0L)))
    assert(out("one") == ((4L, 100L, 750L))) // 1000·(4−1)/4
  }

  test("gini: the textbook 10/20/30/40 ladder is exactly 250 permille") {
    val out = gini(Seq(("a", 1L, 10L), ("a", 2L, 20L),
      ("a", 3L, 30L), ("a", 4L, 40L)))
    assert(out("a") == ((4L, 100L, 250L)))
  }

  test("gini: groups are independent; an all-zero group emits 0") {
    val out = gini(Seq(
      ("z", 1L, 0L), ("z", 2L, 0L),
      ("mix", 1L, 1L), ("mix", 2L, 999L)))
    assert(out("z") == ((2L, 0L, 0L)))
    // shares floor to (1000, 999000): G = 1000·(2·(1·1000+2·999000)
    //   − 3·1000000) DIV (2·1000000) = 499
    assert(out("mix") == ((2L, 1000L, 499L)))
  }

  test("gini: a negative value fails loudly, never a silent coefficient") {
    val df = Seq(("a", 1L, 10L), ("a", 2L, -5L)).toDF("g", "id", "x")
    val e = intercept[Exception] {
      SeriesStats.giniPermille(df, Seq("g"), "x", "id").collect()
    }
    assert(e.getMessage.contains("[gini] negative value"))
  }

  // --- SeriesStats.acfPermille ---

  private def acf(cells: Seq[(Long, Long)], maxLag: Int): Map[Long, (Long, Long)] = {
    val df = cells.toDF("t", "c")
    SeriesStats.acfPermille(df, "t", "c", maxLag)
      .as[(Long, Long, Long)].collect()
      .map { case (k, n, p) => k -> (n, p) }.toMap
  }

  test("acf: an alternating series is -900 at lag 1, +800 at lag 2 (exact)") {
    val cells = (0L until 10L).map(t =>
      (t, if (t % 2 == 0) 500L else 1500L))
    val out = acf(cells, 2)
    // mu=1000, v=c, vbar=1000, d=∓500: r1 = −2.25e6/2.5e6 = −0.9,
    // r2 = +2e6/2.5e6 = +0.8 — the shifted DIV reproduces both signs
    assert(out(1L) == ((9L, -900L)))
    assert(out(2L) == ((8L, 800L)))
  }

  test("acf: a constant series (zero variance) emits 0, not a division error") {
    val out = acf((0L until 6L).map(t => (t, 42L)), 3)
    assert(out.values.forall(_._2 == 0L))
  }

  test("acf: index gaps drop pairs — a pair needs both endpoints") {
    // idx {0, 1, 3}: lag1 pairs only (0,1); lag2 only (1,3); lag3 (0,3)
    val out = acf(Seq((0L, 10L), (1L, 30L), (3L, 20L)), 3)
    assert(out(1L)._1 == 1L && out(2L)._1 == 1L && out(3L)._1 == 1L)
  }

  // --- SeriesStats.ols2Permille ---

  private def ols2(rows: Seq[(String, Long, Long, Long)],
      maxAbs: Long = 1000000L, maxObs: Long = 1000L)
      : Map[String, (Long, Long, Long, Long)] = {
    val df = rows.toDF("g", "y", "x1", "x2")
    SeriesStats.ols2Permille(df, Seq("g"), "y", "x1", "x2", maxAbs, maxObs)
      .as[(String, Long, Long, Long, Long)].collect()
      .map { case (g, n, b1, b2, b0) => g -> (n, b1, b2, b0) }.toMap
  }

  private def rootMsg(t: Throwable): String =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .flatMap(m => Option(m.getMessage)).mkString("\n")

  test("ols2: an exact plane y = 2 + 3*x1 + 5*x2 recovers all three coefficients") {
    // zero-residual fit: Cramer's numerators are exact integer
    // multiples of the determinant, so the permille round is exact
    val out = ols2(Seq(
      ("p", 2L, 0L, 0L), ("p", 5L, 1L, 0L), ("p", 7L, 0L, 1L),
      ("p", 10L, 1L, 1L), ("p", 13L, 2L, 1L)))
    assert(out("p") == ((5L, 3000L, 5000L, 2000L)), out.toString)
  }

  test("ols2: groups fit independently; negative slopes round half-toward-+inf") {
    val out = ols2(Seq(
      ("up", 2L, 0L, 0L), ("up", 5L, 1L, 0L), ("up", 7L, 0L, 1L),
      ("up", 10L, 1L, 1L), ("up", 13L, 2L, 1L),
      // y = 1 - 2*x1 + 0*x2 (exact; floor(-2000 + 0.5) = -2000)
      ("dn", 1L, 0L, 0L), ("dn", -1L, 1L, 0L), ("dn", 1L, 0L, 1L),
      ("dn", -3L, 2L, 1L), ("dn", -1L, 1L, 2L)))
    assert(out("up") == ((5L, 3000L, 5000L, 2000L)), out.toString)
    assert(out("dn") == ((5L, -2000L, 0L, 1000L)), out.toString)
  }

  test("ols2: guards raise loudly — range, group size, singular system") {
    val plane = Seq(("p", 2L, 0L, 0L), ("p", 5L, 1L, 0L), ("p", 7L, 0L, 1L),
      ("p", 10L, 1L, 1L), ("p", 13L, 2L, 1L))
    // |y| past maxAbs
    val e1 = intercept[Exception] {
      ols2(plane.map { case (g, y, a, b) => (g, y * 1000000L, a, b) })
    }
    assert(rootMsg(e1).contains("out of checked range"), rootMsg(e1))
    // group larger than maxObs
    val e2 = intercept[Exception] { ols2(plane, maxObs = 4L) }
    assert(rootMsg(e2).contains("exceeds maxObs"), rootMsg(e2))
    // collinear features (x2 = 2*x1): det = 0 must refuse, not emit junk
    val e3 = intercept[Exception] {
      ols2(Seq(("s", 1L, 0L, 0L), ("s", 2L, 1L, 2L),
        ("s", 3L, 2L, 4L), ("s", 4L, 3L, 6L)))
    }
    assert(rootMsg(e3).contains("singular"), rootMsg(e3))
    // the constructor bound that keeps centered terms inside BIGINT
    val e4 = intercept[IllegalArgumentException] {
      ols2(plane, maxAbs = 1000000L, maxObs = 1000000L)
    }
    assert(e4.getMessage.contains("2^63"), e4.getMessage)
  }
}
