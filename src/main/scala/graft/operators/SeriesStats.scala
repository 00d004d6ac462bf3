package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Integer-exact distribution statistics over keyed series (reference
  * scope: none — beyond-reference, SURVEY §2.13): the Gini
  * concentration coefficient and the autocorrelation function, both
  * following the house never-sum-floats discipline — every ratio is
  * quantized to an integer grid BEFORE any cross-row aggregation, so
  * the result is hash-exact against a declarative oracle on any
  * engine.
  */
object SeriesStats {

  /** Per-group Gini concentration coefficient in integer permille
    * (0 = perfectly even, →1000 = one row holds everything), via the
    * rank-sum identity `G = (2·Σ i·x_i − (n+1)·Σ x_i) / (n·Σ x_i)`
    * over ascending ranks. Values are first quantized to MICRO-SHARES
    * of their group total — `s_i = (1e6·x_i) DIV total` — which (a)
    * makes every product independent of the value magnitude, so the
    * arithmetic stays in BIGINT for any corpus whose groups hold
    * ≤ ~4.6e9 rows (numerator bound `2000·n·1e6`), and (b) keeps the
    * spelling reproducible verbatim in an external SQL oracle.
    * Quantization floors shares, so G is exact on the quantized grid
    * (±1 permille of the real-valued statistic).
    *
    * Contract: values must be non-negative — a negative value breaks
    * the rank-sum identity's ordering argument, so it fails loudly
    * (executor-side `raise_error`, never a silent wrong coefficient).
    * An all-zero group (total = 0) emits `gini_permille = 0`.
    *
    * Scale shape: one keyed aggregate for the group totals, one
    * rank window PARTITIONED on the same group key (never a global
    * sort), one join of the per-row frame against the group-grain
    * totals (broadcast when `hintBroadcastTotals`, the default — pass
    * false for high-cardinality group keys and let the join align
    * with the window's existing hash partitioning), and one final
    * keyed aggregate. Cost rides the corpus linearly; skew rides the
    * largest single group, same as the window itself.
    *
    * Output: the key columns + `n_rows`, `total`, `gini_permille`.
    *
    * @param tieCol breaks rank ties deterministically (any unique-ish
    *        column; equal values make `Σ i·x_i` permutation-invariant
    *        within the tie, so determinism here is for the oracle's
    *        benefit, not correctness).
    */
  def giniPermille(df: DataFrame, keys: Seq[String], valueCol: String,
      tieCol: String, hintBroadcastTotals: Boolean = true): DataFrame = {
    require(keys.nonEmpty, "need at least one group key")
    val missing = (keys ++ Seq(valueCol, tieCol)).filterNot(df.columns.contains)
    require(missing.isEmpty, s"columns not in frame: ${missing.mkString(",")}")
    val k = keys.map(col)
    val rows = FrameCaches.track(
      df.select((keys :+ valueCol :+ tieCol).map(col): _*).persist())
    val tot0 = rows.groupBy(k: _*)
      .agg(sum(col(valueCol)).as("_t"), count(lit(1)).as("_n"))
    val tot = if (hintBroadcastTotals) broadcast(tot0) else tot0
    val w = Window.partitionBy(k: _*).orderBy(col(valueCol), col(tieCol))
    val share = when(col(valueCol) < 0, raise_error(concat(
        lit("[gini] negative value in "), lit(valueCol), lit(": "),
        col(valueCol).cast("string"))))
      .when(col("_t") === 0, lit(0L))
      .otherwise(expr(s"(1000000 * $valueCol) DIV _t"))
    rows.withColumn("_i", row_number().over(w))
      .join(tot, keys)
      .withColumn("_s", share)
      .groupBy(k: _*)
      .agg(max(col("_n")).as("_n"), max(col("_t")).as("_t"),
        sum(expr("_i * _s")).as("_is"), sum(col("_s")).as("_ss"))
      .select(k ++ Seq(col("_n").as("n_rows"), col("_t").as("total"),
        when(col("_ss") === 0, lit(0L)).otherwise(
          expr("(1000 * (2 * _is - (_n + 1) * _ss)) DIV (_n * _ss)"))
          .as("gini_permille")): _*)
  }

  /** Grouped TWO-feature OLS — `y ~ b0 + b1·x1 + b2·x2` per key via
    * the closed-form normal equations (Cramer's rule on the centered
    * 2×2 system), completing the regression family: st1/tw4 fit one
    * feature, dp9 reports pairwise correlation but fits nothing.
    *
    * The st1 playbook applies: AGGREGATE BEFORE REGRESSING — the input
    * is the already-reduced observation frame (quarters, days, cells),
    * never raw rows, so per-group observation counts are naturally
    * small. All nine raw sums and the five centered terms
    * (`A11 = n·Σx1² − (Σx1)²` etc.) are EXACT BIGINT; only the final
    * few-term Cramer ratio runs in double (products of exact-BIGINT
    * casts, each IEEE-correctly-rounded — the dp9 precedent), floored
    * to integer permille, so the surface hash-matches any engine. The
    * intercept re-derives exactly from the already-rounded slopes
    * (`(1000·Σy − b1ₚ·Σx1 − b2ₚ·Σx2) DIV n`, truncation toward zero
    * matching DuckDB `//`).
    *
    * Checked-BIGINT discipline: with `|values| ≤ maxAbs` and group
    * size `≤ maxObs`, every centered term is bounded by
    * `(maxObs·maxAbs)²`, so the constructor requires
    * `maxObs·maxAbs ≤ 3·10⁹` (bound ≤ 9·10¹⁸ < 2⁶³) and BOTH limits
    * are enforced row-/group-side with executor `raise_error` — a
    * violating corpus fails loudly on every engine (the guards are
    * spelled in the gated row's oracle), never wraps silently.
    * A singular system (collinear features within a group, det = 0)
    * also raises rather than emitting a garbage coefficient.
    *
    * Scale shape: one map-side-combined keyed aggregate over the
    * observation frame; everything after is per-GROUP arithmetic on a
    * groups-sized frame. Nothing shuffles twice.
    *
    * Output: keys + `n_obs`, `b1_permille`, `b2_permille`,
    * `intercept_permille`.
    */
  def ols2Permille(obs: DataFrame, keys: Seq[String], yCol: String,
      x1Col: String, x2Col: String,
      maxAbs: Long = 1000000L, maxObs: Long = 1000L): DataFrame = {
    require(keys.nonEmpty, "need at least one group key")
    val missing = (keys ++ Seq(yCol, x1Col, x2Col))
      .filterNot(obs.columns.contains)
    require(missing.isEmpty, s"columns not in frame: ${missing.mkString(",")}")
    require(maxAbs >= 1 && maxObs >= 3,
      s"need maxAbs >= 1 and maxObs >= 3 (a 2-feature fit needs 3 points)")
    require(maxObs * maxAbs <= 3000000000L,
      s"maxObs*maxAbs = ${maxObs * maxAbs} breaks the (maxObs*maxAbs)^2 " +
        "< 2^63 BIGINT bound on the centered terms")
    val k = keys.map(col)
    def checked(c: String, tag: String) =
      when(col(c).isNull || abs(col(c)) > maxAbs, raise_error(concat(
        lit(s"[ols2] $tag value out of checked range (|v| <= $maxAbs): "),
        coalesce(col(c).cast("string"), lit("NULL")))))
        .otherwise(col(c).cast("long"))
    val s = obs.select(k ++ Seq(checked(yCol, "y").as("_y"),
        checked(x1Col, "x1").as("_x1"), checked(x2Col, "x2").as("_x2")): _*)
      .groupBy(k: _*)
      .agg(count(lit(1)).as("n"),
        sum("_x1").as("s1"), sum("_x2").as("s2"), sum("_y").as("sy"),
        sum(expr("_x1 * _x1")).as("s11"), sum(expr("_x2 * _x2")).as("s22"),
        sum(expr("_x1 * _x2")).as("s12"), sum(expr("_x1 * _y")).as("s1y"),
        sum(expr("_x2 * _y")).as("s2y"))
      .withColumn("n", when(col("n") > maxObs, raise_error(concat(
        lit(s"[ols2] group exceeds maxObs=$maxObs observations: "),
        col("n").cast("string")))).otherwise(col("n")))
      .withColumn("a11", expr("n * s11 - s1 * s1"))
      .withColumn("a12", expr("n * s12 - s1 * s2"))
      .withColumn("a22", expr("n * s22 - s2 * s2"))
      .withColumn("b1", expr("n * s1y - s1 * sy"))
      .withColumn("b2", expr("n * s2y - s2 * sy"))
      .withColumn("det", expr(
        "CAST(a11 AS DOUBLE) * CAST(a22 AS DOUBLE) - " +
          "CAST(a12 AS DOUBLE) * CAST(a12 AS DOUBLE)"))
      .withColumn("det", when(col("det") === 0.0, raise_error(
        lit("[ols2] singular system (collinear features) in a group")))
        .otherwise(col("det")))
      .withColumn("b1_permille", expr(
        "CAST(FLOOR((CAST(b1 AS DOUBLE) * CAST(a22 AS DOUBLE) - " +
          "CAST(b2 AS DOUBLE) * CAST(a12 AS DOUBLE)) / det * 1000.0 + 0.5) " +
          "AS BIGINT)"))
      .withColumn("b2_permille", expr(
        "CAST(FLOOR((CAST(b2 AS DOUBLE) * CAST(a11 AS DOUBLE) - " +
          "CAST(b1 AS DOUBLE) * CAST(a12 AS DOUBLE)) / det * 1000.0 + 0.5) " +
          "AS BIGINT)"))
      .withColumn("intercept_permille", expr(
        "(1000 * sy - b1_permille * s1 - b2_permille * s2) DIV n"))
    s.select(k ++ Seq(col("n").as("n_obs"), col("b1_permille"),
      col("b2_permille"), col("intercept_permille")): _*)
  }

  /** Autocorrelation function of an integer-indexed series in integer
    * permille: for each lag k in 1..maxLag, `r_k = Σ d_t·d_{t+k} /
    * Σ d_t²` where d is the deviation from the series mean. Gaps in
    * the index are honest: a pair only exists when BOTH endpoints do.
    *
    * Integer-exactness: cells are first normalized to permille of the
    * series' integer mean (`v = (1000·c) DIV (Σc DIV n)`), deviations
    * taken from the integer mean of v — so d is a small integer
    * (≈ ±1000·(max/mean)) and every product/sum stays in BIGINT
    * regardless of the raw value magnitude (raw monthly cents at
    * SF 100 would overflow d² otherwise). The reported ratio shifts
    * by +den before the DIV and −1000 after, which keeps the integer
    * division's operands non-negative (|Σ d_t·d_{t+k}| ≤ Σ d² by
    * Cauchy–Schwarz over the pair subset) — truncation direction is
    * then identical on every engine, no floor-vs-trunc divergence on
    * negative correlations. A constant series (den = 0) emits 0.
    *
    * Scale shape: meant for AGGREGATED series (cells, not raw rows) —
    * the input is typically tiny (dozens to thousands of cells). The
    * three scalar reductions broadcast 1-row frames; the lag
    * expansion is a broadcast of the maxLag-row frame followed by an
    * equi self-join on the shifted index. Nothing here shuffles more
    * than the cell frame itself.
    *
    * Output: `lag_k`, `n_pairs`, `acf_permille` — one row per lag
    * that has at least one pair.
    */
  def acfPermille(cells: DataFrame, idxCol: String, valueCol: String,
      maxLag: Int): DataFrame = {
    require(maxLag >= 1, "maxLag must be >= 1")
    val missing = Seq(idxCol, valueCol).filterNot(cells.columns.contains)
    require(missing.isEmpty, s"columns not in frame: ${missing.mkString(",")}")
    val spark = cells.sparkSession
    val c = FrameCaches.track(cells.select(
      col(idxCol).cast("long").as("_t"),
      col(valueCol).cast("long").as("_c")).persist())
    val g = c.agg(sum(col("_c")).as("_sc"), count(lit(1)).as("_nc"))
      .selectExpr("_sc DIV _nc AS _mu")
    val v = FrameCaches.track(c.crossJoin(broadcast(g))
      .selectExpr("_t",
        "CASE WHEN _mu = 0 THEN 0 ELSE (1000 * _c) DIV _mu END AS _v")
      .persist())
    val vb = v.agg(sum(col("_v")).as("_sv"), count(lit(1)).as("_nv"))
      .selectExpr("_sv DIV _nv AS _vbar")
    val d = FrameCaches.track(v.crossJoin(broadcast(vb))
      .selectExpr("_t", "_v - _vbar AS _d").persist())
    val den = d.agg(sum(expr("_d * _d")).as("_den"))
    val lags = broadcast(spark.range(1, maxLag + 1L).toDF("lag_k"))
    d.crossJoin(lags)
      .selectExpr("lag_k", "_t + lag_k AS _tb", "_d AS _da")
      .join(d.selectExpr("_t AS _tb", "_d AS _db"), "_tb")
      .groupBy("lag_k")
      .agg(count(lit(1)).as("n_pairs"), sum(expr("_da * _db")).as("_num"))
      .crossJoin(broadcast(den))
      .select(col("lag_k"), col("n_pairs"),
        when(col("_den") === 0, lit(0L)).otherwise(
          expr("(1000 * (_num + _den)) DIV _den - 1000")).as("acf_permille"))
      .orderBy("lag_k")
  }
}
