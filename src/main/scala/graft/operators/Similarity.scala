package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Vector similarity search over an `array<float>` embedding column:
  * brute-force cosine top-k as the exact baseline, and an IVF
  * (inverted-file) variant as the scale path — assign every vector to
  * its nearest centroid once, then probe only the query's cell.
  *
  * All math is higher-order functions (`zip_with`/`aggregate`) over
  * doubles — deterministic left folds, no UDFs. Vectors are normalized
  * to unit length ONCE (`withUnitVector`), so every pairwise cosine is
  * a single dot fold instead of dot + two norms — 3× fewer folds on the
  * quadratic stage, which dominates at scale.
  * 100 TB shape: the query/centroid side of every join is broadcast;
  * the corpus side never shuffles for brute force and shuffles once on
  * cell id for IVF / near-dup blocking.
  */
object Similarity {

  /** Dot product via the native codegen'd expression
    * ([[graft.functions.DotProduct]]) — same sequential fold (and thus
    * bit-identical to the HOF `aggregate(zip_with(...))` form and the
    * DuckDB oracle), minus the per-element closure/boxing cost that
    * dominates the quadratic stages.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.dotProduct(a, b)

  /** Dot of two already-double arrays (unit vectors). */
  def dotD(a: Column, b: Column): Column = dot(a, b)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Adds `uv`: the embedding scaled to unit length (double elements)
    * via the native [[graft.functions.UnitVector]] — the composable
    * withColumn-then-transform form gets its norm alias inlined by
    * CollapseProject (single reference) and degrades to O(d²) per row.
    */
  def withUnitVector(df: DataFrame, vecCol: String, out: String = "uv"): DataFrame =
    df.withColumn(out, graft.functions.VectorExpressions.unitVector(col(vecCol)))

  /** Exact top-k neighbors for each query vector (brute force).
    * `queries` must be small enough to broadcast.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = withUnitVector(queries, vecCol)
      .select(col(idCol).as("query_id"), col("uv").as("qv"))
    val c = withUnitVector(corpus, vecCol)
      .select(col(idCol).as("neighbor_id"), col("uv").as("cv"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("neighbor_id"))
    c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("score", dotD(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "score", "rank")
  }

  /** Assign each unit vector to its highest-cosine centroid (ties →
    * lowest centroid id). Returns (idCol, cell, uv).
    *
    * ZERO-shuffle formulation: the centroids collapse to a single
    * broadcast row holding an array of (centroid_id, centv), and each
    * corpus row picks its argmax with an order-independent `aggregate`
    * fold — no corpus×centroids row explosion, no window shuffle of the
    * whole corpus by vec_id. At 100 TB cell assignment is pure map work
    * fused into the scan; the previous join+row_number shape shuffled
    * every corpus row.
    */
  def assignCells(corpus: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val centArr = withUnitVector(centroids, vecCol)
      .select(col(idCol).as("centroid_id"), col("uv").as("centv"))
      .agg(collect_list(struct(col("centroid_id"), col("centv"))).as("cents"))
    withUnitVector(corpus, vecCol)
      .join(broadcast(centArr)) // 1-row broadcast — free
      .withColumn("cell", aggregate(
        col("cents"),
        struct(lit(Long.MaxValue).as("cid"),
          lit(Double.NegativeInfinity).as("best")),
        (acc, c) => {
          // null-score (zero-norm) → -inf, so the lowest-id tiebreak
          // matches the old NULLS LAST + centroid_id window ordering
          val s = coalesce(dotD(col("uv"), c.getField("centv")),
            lit(Double.NegativeInfinity))
          val better = (s > acc.getField("best")) ||
            (s === acc.getField("best")
              && c.getField("centroid_id") < acc.getField("cid"))
          when(better, struct(c.getField("centroid_id").as("cid"), s.as("best")))
            .otherwise(acc)
        },
        acc => acc.getField("cid")))
      .select(col(idCol), col("cell"), col("uv"))
  }

  /** IVF probe-1 top-k: search only the query's own cell. Recall is
    * approximate by construction; see [[ivfTopKBatch]] for multi-query
    * + nprobe>1. The ranking window is partitioned by query — never a
    * global single-task sort.
    */
  def ivfTopK(assigned: DataFrame, queryId: Long, k: Int,
      idCol: String = "vec_id"): DataFrame = {
    val q = assigned.filter(col(idCol) === queryId)
      .select(col(idCol).as("query_id"), col("cell").as("qcell"),
        col("uv").as("qv"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col(idCol))
    assigned.join(broadcast(q), col("cell") === col("qcell"))
      .filter(col(idCol) =!= col("query_id"))
      .withColumn("score", dotD(col("qv"), col("uv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol).as("neighbor_id"), col("score"), col("rank"))
  }

  /** Batched IVF top-k with configurable probe width: each query ranks
    * all centroids (broadcast), probes its `nprobe` best cells, and the
    * candidate scan is ONE equi-join of the corpus against the
    * broadcast (query × probe-cell) list — ranking windows are
    * per-query, so query batches scale out instead of funneling into a
    * single partition.
    */
  def ivfTopKBatch(assigned: DataFrame, centroids: DataFrame,
      queries: DataFrame, k: Int, nprobe: Int = 1,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cent = withUnitVector(centroids, vecCol)
      .select(col(idCol).as("centroid_id"), col("uv").as("centv"))
    val q = withUnitVector(queries, vecCol)
      .select(col(idCol).as("query_id"), col("uv").as("qv"))
    val wc = Window.partitionBy("query_id")
      .orderBy(col("cscore").desc, col("centroid_id"))
    val probes = q.join(broadcast(cent))
      .withColumn("cscore", dotD(col("qv"), col("centv")))
      .withColumn("crank", row_number().over(wc))
      .filter(col("crank") <= nprobe)
      .select(col("query_id"), col("qv"), col("centroid_id").as("cell"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col(idCol))
    assigned.join(broadcast(probes), Seq("cell"))
      .filter(col(idCol) =!= col("query_id"))
      .withColumn("score", dotD(col("qv"), col("uv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        col("score"), col("rank"))
  }

  /** Spherical k-means (Lloyd's) over unit vectors — trains the IVF
    * centroids instead of taking the first k corpus rows. Per round:
    * assignment is the zero-shuffle broadcast-fold argmax of
    * [[assignCells]]; the centroid update explodes members to
    * (cell, dim, value) and averages per dimension — one
    * map-side-combined aggregation, the idiomatic scalable form (no
    * collect, no driver-side vectors). The mean is re-normalized by the
    * NEXT round's assignment ([[withUnitVector]] inside assignCells),
    * which is exactly the spherical-k-means centroid. Each round
    * localCheckpoints the k-row centroid frame (registered with
    * [[FrameCaches]]) so plan lineage stays constant across rounds —
    * the d6 lesson: iterative DataFrame loops must cut lineage or the
    * driver, not the data, becomes the bottleneck.
    *
    * Returns (idCol, embedding) — drop-in wherever first-k-rows
    * centroids were used. Deterministic: seeds are the k lowest-id
    * vectors, assignment ties break to the lowest centroid id, and a
    * cell that loses all members carries its previous centroid
    * forward. Not oracle-expressible
    * (per-partition summation order makes the means differ in final
    * ULPs across engines), so correctness is pinned by
    * `SimilaritySpec`'s monotone-objective and determinism tests.
    *
    * PACING BOUND (the [[Bpe.learnMerges]] standard): each round's
    * eager localCheckpoint is one Spark job, so training is
    * DRIVER-PACED at O(iters) sequential jobs — inherent to Lloyd's
    * (round N+1's assignment needs round N's centroids), and the
    * checkpoint holds lineage at ONE generation regardless of iters
    * (without it the plan nests `iters` joins deep and the driver, not
    * the data, becomes the bottleneck — the d6 lesson). The per-round
    * job is corpus-linear with a k-row broadcast, so at 100 TB the
    * honest cost model is iters × (one corpus pass): keep iters in the
    * single digits (v8/v11 run 2–5) and train on a sample if more
    * rounds are needed — do NOT lift iters into the hundreds expecting
    * cluster parallelism to absorb it; the rounds are serial by
    * construction.
    */
  def kmeansCentroids(corpus: DataFrame, k: Int, iters: Int = 5,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(k >= 1 && iters >= 1)
    // centroid frames keep the corpus idCol name so they drop straight
    // into assignCells / ivfTopKBatch (both key centroids by idCol)
    val unit = withUnitVector(corpus.select(col(idCol), col(vecCol)), vecCol)
      .select(col(idCol), col("uv").as("embedding"))
    var cents = FrameCaches.track(
      unit.orderBy(idCol).limit(k).localCheckpoint())
    for (_ <- 1 to iters) {
      val assigned = assignCells(unit, cents, idCol, "embedding")
      val means = assigned
        .select(col("cell"), posexplode(col("uv")).as(Seq("pos", "v")))
        .groupBy("cell", "pos").agg(avg("v").as("m"))
        .groupBy("cell")
        // array_sort on structs orders by the first field (pos), so the
        // collected per-dimension means reassemble in dimension order
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("mean"))
      cents = FrameCaches.track(
        cents.join(means.withColumnRenamed("cell", idCol), Seq(idCol), "left")
          .select(col(idCol),
            coalesce(col("mean"), col("embedding")).as("embedding"))
          .localCheckpoint())
    }
    cents
  }

  /** Global |v|max of a vector column as ONE broadcastable row
    * (`amax`) — the calibration scale for SYMMETRIC int8 quantization.
    * Symmetric (scale-only, zero-centered) is the only scalar scheme
    * whose code dot is proportional to the true dot: an affine
    * per-dimension (min/max) quantizer introduces offsets whose cross
    * terms vary per vector and destroy inner-product rankings (recall
    * craters to near-random — measured before this was rewritten).
    * max(abs) is order-independent, so the stat is bit-deterministic.
    */
  def quantStats(df: DataFrame, vecCol: String = "embedding"): DataFrame =
    df.select(explode(col(vecCol)).as("v"))
      .agg(max(abs(col("v").cast("double"))).as("amax"))

  /** Adds `qv`: the vector symmetrically quantized to int8 codes
    * −127..127 against the broadcast [[quantStats]] scale — code =
    * ⌊v·127/amax + 0.5⌋ clamped. The memory-bandwidth play of
    * production vector search: 4-8× fewer bytes through cache/shuffle
    * on the quadratic scoring stage, scored by the EXACT integer
    * [[graft.functions.IntDotProduct]] — code dots ≈ (127/amax)²·v·w,
    * rank-preserving up to rounding, and carry zero FP noise so they
    * re-derive bit-identically in SQL. (Codes are `array<int>` here; a
    * production build would pack them to bytes — arithmetic and
    * results identical.) Quantization is one map pass per row; its HOF
    * lambda never runs on the quadratic stage.
    */
  def withQuantized(df: DataFrame, stats: DataFrame,
      vecCol: String = "embedding", out: String = "qv"): DataFrame =
    df.crossJoin(broadcast(stats))
      .withColumn(out, transform(col(vecCol), x =>
        when(col("amax") > 0,
          least(greatest(floor(x.cast("double") / col("amax") * 127 + 0.5),
            lit(-127L)), lit(127L)))
          .otherwise(lit(0L)).cast("int")))
      .drop("amax")

  /** Approximate top-k by quantized dot over UNIT vectors (so the
    * integer score tracks cosine): normalize once, calibrate stats on
    * the unit corpus, quantize both sides, score with the codegen'd
    * integer dot. Queries broadcast; the corpus never shuffles; ranking
    * windows are per-query. Recall vs the exact float path is pinned in
    * SimilaritySpec.
    */
  def quantizedTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cu = withUnitVector(corpus, vecCol).select(col(idCol), col("uv"))
    val stats = quantStats(cu, "uv")
    val c = withQuantized(cu, stats, "uv")
      .select(col(idCol).as("neighbor_id"), col("qv").as("cq"))
    val q = withQuantized(
        withUnitVector(queries, vecCol).select(col(idCol), col("uv")),
        stats, "uv")
      .select(col(idCol).as("query_id"), col("qv").as("qq"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("qscore").desc, col("neighbor_id"))
    c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("qscore",
        graft.functions.VectorExpressions.intDotProduct(col("qq"), col("cq")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "qscore", "rank")
  }

  /** IVF-SQ8: the production ANN composition — IVF cell blocking to
    * prune candidates, symmetric int8 codes to shrink the bytes each
    * candidate costs. Queries rank centroids in FLOAT (k centroids —
    * negligible) and probe their `nprobe` best cells; candidate scoring
    * inside the probed cells runs entirely on quantized codes via the
    * codegen'd integer dot. Scale shape: one corpus pass to assign +
    * quantize (map work against two broadcasts), candidates from the
    * broadcast (query × probe-cell) equi-join, per-query ranking
    * windows — the corpus shuffles once on cell id, ever.
    */
  def ivfQuantizedTopKBatch(assigned: DataFrame, centroids: DataFrame,
      queries: DataFrame, k: Int, nprobe: Int = 1,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val stats = quantStats(assigned, "uv")
    val c = withQuantized(assigned, stats, "uv")
      .select(col(idCol), col("cell"), col("qv"))
    val cent = withUnitVector(centroids, vecCol)
      .select(col(idCol).as("centroid_id"), col("uv").as("centv"))
    val q = withQuantized(
        withUnitVector(queries, vecCol)
          .select(col(idCol).as("query_id"), col("uv")),
        stats, "uv")
    val wc = Window.partitionBy("query_id")
      .orderBy(col("cscore").desc, col("centroid_id"))
    val probes = q.join(broadcast(cent))
      .withColumn("cscore", dotD(col("uv"), col("centv")))
      .withColumn("crank", row_number().over(wc))
      .filter(col("crank") <= nprobe)
      .select(col("query_id"), col("qv").as("qq"), col("centroid_id").as("cell"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("qscore").desc, col(idCol))
    c.join(broadcast(probes), Seq("cell"))
      .filter(col(idCol) =!= col("query_id"))
      .withColumn("qscore",
        graft.functions.VectorExpressions.intDotProduct(col("qq"), col("qv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        col("qscore"), col("rank"))
  }

  /** Integer dot of a code vector against a BIGINT sum vector as a
    * deterministic HOF fold — exact integer arithmetic (headroom:
    * |code|≤127, |sum|≤127·n, dim 64 ⇒ |dot| ≤ 10⁶·n, safe in a LONG
    * past 10⁹-row cells), so any partition/fold order gives the same
    * value and it re-derives bit-identically in SQL.
    */
  def qdotLong(code: Column, qsum: Column): Column =
    aggregate(zip_with(code, qsum, (x, y) => x.cast("long") * y),
      lit(0L), (s, v) => s + v)

  /** Rational-centroid score: code·qsum / n as ONE IEEE division of two
    * exact integers — bit-deterministic cross-engine, unlike a float
    * mean whose per-partition summation order leaks into final ULPs.
    * Public: [[graft.io.VectorDedupStore]] ranks its frozen TRAINED
    * model's cells with exactly this score.
    */
  def qcellScore(code: Column, qsum: Column, n: Column): Column =
    qdotLong(code, qsum).cast("double") / n

  /** Assign int8 code vectors to their best RATIONAL centroid
    * (qsum element-wise BIGINT member sum, n member count) — the
    * integer-space twin of [[assignCells]], same zero-shuffle broadcast
    * fold: k centroids collapse to one broadcast row, each corpus row
    * picks its argmax (ties → lowest centroid id) in pure map work
    * fused into the scan. Keeps the input's columns and adds `cell`.
    */
  def assignCellsQuantized(codes: DataFrame, cents: DataFrame,
      idCol: String = "vec_id", codeCol: String = "qv"): DataFrame = {
    val centArr = cents
      .agg(collect_list(struct(col("centroid_id"), col("qsum"), col("n")))
        .as("cents"))
    codes
      .join(broadcast(centArr))
      .withColumn("cell", aggregate(
        col("cents"),
        struct(lit(Long.MaxValue).as("cid"),
          lit(Double.NegativeInfinity).as("best")),
        (acc, c) => {
          val s = qcellScore(col(codeCol), c.getField("qsum"), c.getField("n"))
          val better = (s > acc.getField("best")) ||
            (s === acc.getField("best")
              && c.getField("centroid_id") < acc.getField("cid"))
          when(better, struct(c.getField("centroid_id").as("cid"), s.as("best")))
            .otherwise(acc)
        },
        acc => acc.getField("cid")))
      .drop("cents")
  }

  /** Integer-space spherical k-means (Lloyd's over int8 codes) — the
    * ORACLE-EXPRESSIBLE trained-centroid path next to the float
    * [[kmeansCentroids]]. Centroids are kept RATIONAL instead of being
    * divided into float means: (qsum = element-wise BIGINT sum of the
    * member codes, n = member count). Ranking by qsum·code / n is
    * order-invariant because the integer sums are exact and associative
    * — the per-partition float-summation nondeterminism that keeps
    * [[kmeansCentroids]] rows-only never enters. Per round: assignment
    * is the zero-shuffle broadcast fold of [[assignCellsQuantized]];
    * the update posexplodes members to (cell, dim, code) and sums per
    * dimension — one map-side-combined aggregation collapsing to
    * k·dim rows. Each round localCheckpoints the k-row centroid frame
    * (lineage cut — iterative DataFrame loops otherwise bottleneck the
    * driver, the d6 lesson). Deterministic: seeds are the k lowest-id
    * codes (n=1), ties break to the lowest centroid id, and an emptied
    * cell carries its previous (qsum, n) forward.
    *
    * PACING BOUND: same contract as [[kmeansCentroids]] (and
    * [[Bpe.learnMerges]]) — one eager checkpoint job per round, serial
    * by construction, lineage held at one generation; iters stays
    * single-digit and larger budgets train on a sample.
    *
    * Returns (centroid_id, qsum array<long>, n long).
    */
  def kmeansCentroidsQuantized(codes: DataFrame, k: Int, iters: Int,
      idCol: String = "vec_id", codeCol: String = "qv"): DataFrame = {
    require(k >= 1 && iters >= 1)
    var cents = FrameCaches.track(
      codes.orderBy(idCol).limit(k)
        .select(col(idCol).as("centroid_id"),
          transform(col(codeCol), _.cast("long")).as("qsum"),
          lit(1L).as("n"))
        .localCheckpoint())
    for (_ <- 1 to iters) {
      val assigned = assignCellsQuantized(codes, cents, idCol, codeCol)
      val upd = assigned
        .select(col("cell"), posexplode(col(codeCol)).as(Seq("pos", "v")))
        .groupBy("cell", "pos")
        .agg(sum(col("v").cast("long")).as("s"), count(lit(1)).as("cnt"))
        .groupBy("cell")
        // array_sort on structs orders by the first field (pos), so the
        // per-dimension sums reassemble in dimension order; cnt is the
        // member count, identical at every pos
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("s")))),
            f => f.getField("s")).as("qsum2"),
          max("cnt").as("n2"))
      cents = FrameCaches.track(
        cents.join(upd.withColumnRenamed("cell", "centroid_id"),
            Seq("centroid_id"), "left")
          .select(col("centroid_id"),
            coalesce(col("qsum2"), col("qsum")).as("qsum"),
            coalesce(col("n2"), col("n")).as("n"))
          .localCheckpoint())
    }
    cents
  }

  /** IVF-SQ8 over integer-TRAINED centroids — [[kmeansCentroidsQuantized]]
    * composed with the quantized probe/score shape of
    * [[ivfQuantizedTopKBatch]]: quantize once, train rational centroids,
    * assign the corpus, rank cells per query by the exact rational score,
    * probe `nprobe` cells, rank candidates on the codegen'd integer dot.
    * Every stage is integer-exact or a single IEEE division, so the
    * ENTIRE trained pipeline re-derives in SQL — the full-oracle answer
    * to the float k-means' rows-only check. Scale shape: corpus scanned
    * once to quantize (map vs broadcast stats), per-round assignment is
    * map work vs a broadcast k-row frame, updates collapse map-side to
    * k·dim rows, and the final candidate join is corpus-vs-broadcast
    * probes — the corpus never shuffles except once on cell id.
    */
  def kmeansQuantizedTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      numCentroids: Int, iters: Int, nprobe: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cu = withUnitVector(corpus, vecCol).select(col(idCol), col("uv"))
    val stats = quantStats(cu, "uv")
    val codes = FrameCaches.track(
      withQuantized(cu, stats, "uv").select(col(idCol), col("qv")).persist())
    val cents = kmeansCentroidsQuantized(codes, numCentroids, iters, idCol)
    val assigned = assignCellsQuantized(codes, cents, idCol)
    val q = withQuantized(
        withUnitVector(queries, vecCol)
          .select(col(idCol).as("query_id"), col("uv")),
        stats, "uv")
      .select(col("query_id"), col("qv").as("qq"))
    val wc = Window.partitionBy("query_id")
      .orderBy(col("cscore").desc, col("centroid_id"))
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("cscore", qcellScore(col("qq"), col("qsum"), col("n")))
      .withColumn("crank", row_number().over(wc))
      .filter(col("crank") <= nprobe)
      .select(col("query_id"), col("qq"), col("centroid_id").as("cell"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("qscore").desc, col(idCol))
    assigned.join(broadcast(probes), Seq("cell"))
      .filter(col(idCol) =!= col("query_id"))
      .withColumn("qscore",
        graft.functions.VectorExpressions.intDotProduct(col("qq"), col("qv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        col("qscore"), col("rank"))
  }

  /** Cross-corpus embedding near-dup detection — the INCREMENTAL
    * vector-dedup shape (the embedding twin of
    * [[Dedup.crossCorpusNearDups]], same (batch, ref) parameter order):
    * find batch vectors whose cosine against ANY reference vector
    * clears a threshold, WITHOUT ever self-joining the reference.
    *
    * Scale shape: the reference side is quantized and cell-assigned by
    * a ZERO-SHUFFLE broadcast fold (the [[assignCellsQuantized]] shape
    * on the integer dot — precomputable and storable across batches);
    * the batch side ranks the broadcast k centroids per vector in one
    * batch_id-partitioned window (cost tracks the BATCH × k, never the
    * accumulated corpus); the final cell join carries no broadcast hint
    * so a small batch broadcasts and a crawl-sized one shuffle-joins.
    * Calibration (`amax`) and the k LOWEST-ID seed centroids come from
    * the REFERENCE corpus (never `filter(id < k)` — ids need not span
    * [0, k)), so stored ref codes stay valid across batches; all
    * scoring is the exact integer dot, making the whole operator
    * oracle-expressible. Returns (batch_id, ref_id, qscore ≥ minScore);
    * consumers anti-join the batch against the distinct batch_ids.
    */
  def crossCorpusQuantizedMatches(batch: DataFrame, ref: DataFrame,
      minScore: Long, numCentroids: Int = 8, nprobe: Int = 2,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val intDot = graft.functions.VectorExpressions.intDotProduct _
    val ru = withUnitVector(ref, vecCol).select(col(idCol), col("uv"))
    val stats = quantStats(ru, "uv")
    val rcodes = withQuantized(ru, stats, "uv").select(col(idCol), col("qv"))
    val cents = rcodes.orderBy(col(idCol)).limit(numCentroids)
      .select(col(idCol).as("centroid_id"), col("qv").as("cv"))
    // ref side: argmax cell (ties → lowest id) as a broadcast fold —
    // pure map work fused into the reference scan, no shuffle
    val centArr = cents
      .agg(collect_list(struct(col("centroid_id"), col("cv"))).as("cents"))
    val refCells = rcodes
      .join(broadcast(centArr))
      .withColumn("cell", aggregate(
        col("cents"),
        struct(lit(Long.MaxValue).as("cid"), lit(Long.MinValue).as("best")),
        (acc, c) => {
          val s = intDot(col("qv"), c.getField("cv"))
          val better = (s > acc.getField("best")) ||
            (s === acc.getField("best") &&
              c.getField("centroid_id") < acc.getField("cid"))
          when(better, struct(c.getField("centroid_id").as("cid"), s.as("best")))
            .otherwise(acc)
        },
        acc => acc.getField("cid")))
      .select(col(idCol).as("ref_id"), col("qv").as("rq"), col("cell"))
    // batch side: quantize with the REFERENCE calibration, rank the k
    // broadcast centroids per vector, keep the nprobe best — as a
    // ZERO-shuffle top-nprobe broadcast fold (the refCells argmax
    // generalized, r19): the batch is the unbounded side of this
    // operator at crawl scale, and the previous crossJoin + row_number
    // window shuffled batch×k rows by batch_id per call
    val bu = withUnitVector(batch, vecCol)
      .select(col(idCol).as("batch_id"), col("uv"))
    val probes = withQuantized(bu, stats, "uv").select(col("batch_id"), col("qv"))
      .join(broadcast(centArr))
      .withColumn("_top", slice(array_sort(
        transform(col("cents"), c => struct(
          coalesce(intDot(col("qv"), c.getField("cv")), lit(Long.MinValue))
            .as("s"),
          c.getField("centroid_id").as("cid"))),
        (l, r) => when(l.getField("s") > r.getField("s"), -1)
          .when(l.getField("s") < r.getField("s"), 1)
          .when(l.getField("cid") < r.getField("cid"), -1)
          .when(l.getField("cid") > r.getField("cid"), 1)
          .otherwise(0)),
        1, nprobe))
      .select(col("batch_id"), col("qv").as("bq"),
        explode(col("_top")).as("_c"))
      .select(col("batch_id"), col("bq"), col("_c.cid").as("cell"))
    refCells.join(probes, Seq("cell"))
      .withColumn("qscore", intDot(col("bq"), col("rq")))
      .filter(col("qscore") >= minScore)
      .select("batch_id", "ref_id", "qscore")
  }

  // ---- Product quantization (Jégou et al. 2011, the Faiss IVF-PQ
  // compression stage) over int8 code vectors ----

  /** PQ codebook from the corpus itself: `k` deterministic pivot rows
    * (the k lowest `md5('pq:'||id)` — a hash-random sample, i.e. the
    * k-means++-free init production PQ starts Lloyd's from; SURVEY
    * documents that a trained build would run [[kmeansCentroidsQuantized]]
    * per subspace) each contribute their `m` subvectors, giving
    * `(s, c, cw)` — subspace, codeword id, `sub`-dim codeword. The
    * pivot pick is `ORDER BY hash LIMIT k` (TakeOrdered heaps — never a
    * global sort) and the result is m·k rows: broadcast it. Codeword
    * ids are dense 0..k-1 in (hash, id) order, so the whole codebook
    * re-derives bit-identically in SQL.
    */
  def pqCodebook(codes: DataFrame, m: Int, sub: Int, k: Int,
      idCol: String = "vec_id", codeCol: String = "qv"): DataFrame = {
    val h = graft.functions.VectorExpressions
      .hexSliceToLong(md5(concat(lit("pq:"), col(idCol).cast("string"))), 1, 14)
    val pivots = codes.select(col(idCol), col(codeCol), h.as("_h"))
      .orderBy(col("_h"), col(idCol)).limit(k)
      .withColumn("c", row_number().over(
        // constant partition key over the k-row pivot funnel — same
        // semantics as a global window, admissible under PlanGuards
        Window.partitionBy(lit(1)).orderBy(col("_h"), col(idCol))) - 1)
    pivots.select(col("c"),
        explode(sequence(lit(0), lit(m - 1))).as("s"), col(codeCol))
      .select(col("s"), col("c"),
        slice(col(codeCol), col("s") * sub + 1, lit(sub)).as("cw"))
  }

  /** Encode each int8 code vector as `m` codeword ids: per subspace,
    * the codeword minimizing exact integer squared L2 distance (ties →
    * lowest id, via `min(struct(dist, c))`). 64 dims become m 6-bit
    * codes — the ~20× compression that lets a 100 TB vector corpus'
    * candidate set live in memory. Cost: the corpus explodes to
    * `N·m·k` candidate rows against the BROADCAST codebook, then one
    * map-side-combined argmin groupBy — no shuffle of the vectors
    * themselves beyond the (id, s) grain.
    */
  def pqEncode(codes: DataFrame, codebook: DataFrame, m: Int, sub: Int,
      idCol: String = "vec_id", codeCol: String = "qv"): DataFrame =
    codes.select(col(idCol),
        explode(sequence(lit(0), lit(m - 1))).as("s"), col(codeCol))
      .withColumn("_sv", slice(col(codeCol), col("s") * sub + 1, lit(sub)))
      .join(broadcast(codebook), Seq("s"))
      .withColumn("_d", aggregate(
        zip_with(col("_sv"), col("cw"),
          (x, y) => ((x - y) * (x - y)).cast("long")),
        lit(0L), (acc, v) => acc + v))
      .groupBy(col(idCol), col("s"))
      .agg(min(struct(col("_d"), col("c"))).as("_k"))
      .select(col(idCol), col("s"), col("_k.c").as("code"))

  /** Asymmetric distance computation (ADC) top-k: each query
    * precomputes one `m·k`-entry lookup table of exact integer partial
    * dots `⟨q_sub, codeword⟩`; a candidate's score is the sum of its m
    * looked-up entries — the query never touches the original vectors.
    * The LUT join is broadcast (queries × m × k rows), the per-(query,
    * vector) sum map-side combines, and ranking windows are per-query.
    * Every score is an exact integer — the whole pipeline (pivots,
    * encode, LUT, ADC, ranks) is one hash-checkable oracle row.
    */
  def pqAdcTopK(encoded: DataFrame, codebook: DataFrame,
      queryCodes: DataFrame, k: Int, sub: Int,
      idCol: String = "vec_id", codeCol: String = "qv"): DataFrame = {
    val lut = queryCodes
      .select(col(idCol).as("query_id"), col(codeCol))
      .crossJoin(broadcast(codebook))
      .withColumn("pdot", aggregate(
        zip_with(slice(col(codeCol), col("s") * sub + 1, lit(sub)), col("cw"),
          (x, y) => (x * y).cast("long")),
        lit(0L), (acc, v) => acc + v))
      .select(col("query_id"), col("s"), col("c"), col("pdot"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("adc_score").desc, col(idCol))
    encoded.join(broadcast(lut),
        encoded("s") === lut("s") && encoded("code") === lut("c"))
      .filter(col(idCol) =!= col("query_id"))
      .groupBy(col("query_id"), col(idCol))
      .agg(sum(col("pdot")).as("adc_score"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        col("adc_score"), col("rnk"))
  }

  /** Deterministic ±1 hyperplane matrix for sign-random-projection LSH
    * (Charikar's SimHash for real vectors): signs(j)(k) derives from one
    * md5 of "rp:j:k", so the SAME matrix is reproducible anywhere —
    * including inside the DuckDB oracle SQL, which embeds these values
    * as literals.
    */
  def rpSigns(bits: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(bits, dim) { (j, k) =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"rp:$j:$k".getBytes("UTF-8"))
      if ((d(0) & 1) == 0) 1.0 else -1.0
    }

  /** Adds `rp_band_0..{bands-1}`: the vector's sign-random-projection
    * sketch packed into `bits/bands`-bit band keys. bit j = sign of
    * ⟨vec, hyperplane_j⟩, where the hyperplanes are ±1 rows of
    * [[rpSigns]] folded by the codegen'd [[dot]] against a broadcast
    * literal — pure map work fused into the scan, no shuffle, no
    * per-element lambda. Vectors with cosine ≈ 1 agree on almost all
    * sign bits, so near-dups collide in at least one band
    * (P[bit differs] = angle/π per hyperplane).
    */
  def withRpBands(df: DataFrame, vecCol: String,
      bits: Int = 32, bands: Int = 4, dim: Int = 64): DataFrame = {
    require(bits % bands == 0, "bits must split evenly into bands")
    val signs = rpSigns(bits, dim)
    val rows = bits / bands
    val bandCols = (0 until bands).map { b =>
      (0 until rows).map { r =>
        val j = b * rows + r
        when(dot(col(vecCol), typedLit(signs(j).toSeq)) > 0, 1 << r)
          .otherwise(0)
      }.reduce(_ + _).as(s"rp_band_$b")
    }
    df.select(df.columns.map(col) ++ bandCols: _*)
  }

  /** Embedding near-dup pairs via RP-LSH banding — the LSH-bucketed
    * alternative to the IVF-cell blocking of the `v4` path: band keys
    * are computed in one scan (map-only), candidates come from the
    * banded equi-join ([[Dedup.candidatePairs]] — never all-pairs), and
    * only candidates pay the exact unit-cosine verification. 100 TB
    * shape: one persist of (id, uv, band keys), one explode+equi-join
    * shuffle on (band_idx, band_key), quadratic work confined to hash
    * buckets.
    */
  def rpLshNearDups(corpus: DataFrame, idCol: String = "vec_id",
      vecCol: String = "embedding", bits: Int = 32, bands: Int = 4,
      dim: Int = 64): DataFrame = {
    val base = FrameCaches.track(
      withRpBands(withUnitVector(corpus.select(col(idCol), col(vecCol)), vecCol),
        vecCol, bits, bands, dim)
        .drop(vecCol).persist())
    val pairs = Dedup.candidatePairs(base, idCol,
        (0 until bands).map(b => col(s"rp_band_$b")))
      .select(col("doc_a").as("vec_a"), col("doc_b").as("vec_b"))
    val a = base.select(col(idCol).as("vec_a"), col("uv").as("va"))
    val b = base.select(col(idCol).as("vec_b"), col("uv").as("vb"))
    pairs.join(a, "vec_a").join(b, "vec_b")
      .select(col("vec_a"), col("vec_b"),
        dotD(col("va"), col("vb")).as("score"))
  }

  /** SemDeDup (Abbas et al. 2023, arXiv 2303.09540): k-means the
    * corpus in int8 space, find within-CLUSTER semantic duplicates by
    * pairwise integer cosine, and keep from each duplicate group the
    * member LEAST similar to its centroid — the paper's
    * centroid-farthest rule (prototypical copies are the redundant
    * ones; the farthest member carries the most marginal information).
    * Returns one row per keeper: (vec_id, cell, cluster_size).
    *
    * All-integer end to end: corpus-amax int8 codes, the exact
    * rational Lloyd's of [[kmeansCentroidsQuantized]], integer-dot
    * pair verify, and a keeper argmin that needs NO division (same
    * cell ⇒ same n, so the rational centroid score qsum·qv/n ranks by
    * its integer numerator) — the whole pipeline, training included,
    * re-derives in SQL.
    *
    * `maxCellSize` caps the within-cluster pair join exactly as
    * [[graft.io.VectorDedupStore]] caps its self-dedup: the pair join
    * is cell-equi with mass Σ cell², so ONE hot cluster is quadratic
    * in its occupancy — a cell whose membership exceeds the cap is
    * excluded from pairing (its members pass through un-deduped, the
    * standard recall trade; the hot-key set is bounded by
    * `numCentroids`, so it always broadcasts). The cap must be spelled
    * in any oracle (the d9/fi1 discipline).
    *
    * Scale shape: one quantize scan, the k-means pacing bound
    * (`iters` corpus-linear rounds), a cell-equi self-join bounded by
    * min(cap, occupancy)·occupancy per cell, CC over verified pairs
    * only, and a cluster-partitioned ranking window.
    */
  def semDedup(corpus: DataFrame, numCentroids: Int, iters: Int,
      minScore: Long, maxCellSize: Option[Long] = None,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(maxCellSize.forall(_ > 0),
      s"maxCellSize must be positive when set, got ${maxCellSize.get}")
    val intDot = graft.functions.VectorExpressions.intDotProduct _
    val bu = withUnitVector(
        corpus.select(col(idCol).as("vec_id"), col(vecCol).as("_v")), "_v")
      .select(col("vec_id"), col("uv"))
    val stats = quantStats(bu, "uv")
    val codes = FrameCaches.track(
      withQuantized(bu, stats, "uv")
        .select(col("vec_id"), col("qv")).persist())
    val cents = kmeansCentroidsQuantized(codes, numCentroids, iters)
    // assigned feeds the pair join twice plus the scoring join
    val assigned = FrameCaches.track(
      assignCellsQuantized(codes, cents).persist())
    // hot-cluster cap: excluded cells' members skip pairing entirely
    // (each becomes its own singleton group below)
    val pairBase = maxCellSize match {
      case Some(cap) =>
        val hot = assigned.groupBy("cell").agg(count(lit(1)).as("_cn"))
          .filter(col("_cn") > cap).select("cell")
        assigned.join(broadcast(hot), Seq("cell"), "left_anti")
      case None => assigned
    }
    val l = pairBase.select(col("cell"), col("vec_id").as("doc_a"),
      col("qv").as("_qa"))
    val r = pairBase.select(col("cell"), col("vec_id").as("doc_b"),
      col("qv").as("_qb"))
    val pairs = l.join(r, Seq("cell"))
      .filter(col("doc_a") < col("doc_b") &&
        intDot(col("_qa"), col("_qb")) >= minScore)
      .select("doc_a", "doc_b")
    val clusters = Dedup.connectedComponents(pairs)
      .withColumnRenamed("doc_id", "vec_id")
    val withCl = assigned
      .join(clusters, Seq("vec_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("vec_id")))
    val scored = withCl.join(
        broadcast(cents.select(col("centroid_id").as("cell"), col("qsum"))),
        Seq("cell"))
      .withColumn("_cdot", qdotLong(col("qv"), col("qsum")))
    val w = Window.partitionBy("cluster_id")
      .orderBy(col("_cdot").asc, col("vec_id"))
    scored
      .withColumn("_rn", row_number().over(w))
      .withColumn("cluster_size",
        count(lit(1)).over(Window.partitionBy("cluster_id")))
      .filter(col("_rn") === 1)
      .select(col("vec_id"), col("cell"), col("cluster_size"))
  }
}
