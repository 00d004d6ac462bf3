package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Similarity

/** Embedding similarity-search queries over `embeddings`
  * (vec_id, embedding array<float>, label): exact brute-force cosine
  * top-k, IVF probe-1 top-k, and cosine near-dup pairs — every score
  * oracle-checked to 6 decimals against DuckDB computing the identical
  * normalize-once-then-dot double-precision folds.
  */
object VectorQueries extends QuerySet {

  private val K = 10
  private val NumCentroids = 8
  private val QueryId = 100L

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  def v1Norms(s: SparkSession, dir: String): DataFrame =
    emb(s, dir)
      .select(col("vec_id"),
        round(Similarity.l2Norm(col("embedding")), 6).as("l2_norm"))
      .orderBy("vec_id")

  def v2CosineTopK(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 5), K)
      .select(col("query_id"), col("neighbor_id"),
        round(col("score"), 6).as("score"), col("rank").as("rnk"))
      .orderBy("query_id", "rnk")
  }

  def v3IvfTopK(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val assigned = Similarity.assignCells(e, e.filter(col("vec_id") < NumCentroids))
      .persist()
    Similarity.ivfTopK(assigned, QueryId, K)
      .select(col("neighbor_id"), round(col("score"), 6).as("score"),
        col("rank").as("rnk"))
      .orderBy("rnk")
  }

  /** Embedding-cosine near-dup pairs, blocked by IVF cell (same-cell
    * pairs only — the quadratic step never crosses cells).
    */
  def v4NearDupCosine(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val assigned = Similarity.assignCells(e, e.filter(col("vec_id") < NumCentroids))
      .persist()
    val a = assigned.select(col("vec_id").as("vec_a"), col("cell"),
      col("uv").as("va"))
    val b = assigned.select(col("vec_id").as("vec_b"), col("cell").as("cell_b"),
      col("uv").as("vb"))
    a.join(b, col("cell") === col("cell_b") && col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        round(Similarity.dotD(col("va"), col("vb")), 6).as("score"))
      .filter(col("score") >= 0.25)
      .orderBy("vec_a", "vec_b")
  }

  /** Batched IVF with probe width 2: five query vectors rank the
    * centroids, probe their two best cells, and rank candidates from
    * both — the multi-query scale path ([[Similarity.ivfTopKBatch]]).
    */
  def v5IvfBatch(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val centroids = e.filter(col("vec_id") < NumCentroids)
    val assigned = Similarity.assignCells(e, centroids).persist()
    Similarity.ivfTopKBatch(assigned, centroids,
      e.filter(col("vec_id") >= 100 && col("vec_id") < 105), K, nprobe = 2)
      .select(col("query_id"), col("neighbor_id"),
        round(col("score"), 6).as("score"), col("rank").as("rnk"))
      .orderBy("query_id", "rnk")
  }

  /** ANN quality EVALUATION — recall@k of the IVF index against the
    * exact brute-force neighbors, per query and probe width. Shipping
    * an approximate index without its measured recall is how silent
    * retrieval degradation ships with it; this row makes the
    * quality/cost dial (nprobe) a hash-checked number: both engines
    * compute both sides with the same IEEE dot folds, so the top-k
    * SETS agree and the intersection is exact integer arithmetic.
    * nprobe=2 recall dominates nprobe=1 by construction (a superset of
    * candidates). The exact side reuses v2's brute-force engine, the
    * approximate side v5's batched probe join; zero-hit queries keep
    * their row through the left fold (never silently vanish).
    */
  def v15IvfRecall(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val centroids = e.filter(col("vec_id") < NumCentroids)
    val assigned = graft.operators.FrameCaches.track(
      Similarity.assignCells(e, centroids).persist())
    val queries = e.filter(col("vec_id") >= 100 && col("vec_id") < 105)
    val exact = graft.operators.FrameCaches.track(
      Similarity.bruteForceTopK(e, queries, K)
        .select(col("query_id"), col("neighbor_id")).persist())
    def hitsAt(np: Int) =
      Similarity.ivfTopKBatch(assigned, centroids, queries, K, nprobe = np)
        .select(col("query_id"), col("neighbor_id"))
        .join(exact, Seq("query_id", "neighbor_id"), "left_semi")
        .groupBy("query_id").agg(count(lit(1)).as("hits"))
        .withColumn("nprobe", lit(np))
    val base = queries.select(col("vec_id").as("query_id"),
      explode(array(lit(1), lit(2))).as("nprobe"))
    base.join(hitsAt(1).unionByName(hitsAt(2)),
        Seq("query_id", "nprobe"), "left")
      .select(col("query_id"), col("nprobe"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        expr(s"coalesce(hits, 0) * 1000 DIV $K").as("recall_permille"))
      .orderBy("query_id", "nprobe")
  }

  /** Embedding near-dup pairs via sign-random-projection LSH banding —
    * the LSH-bucketed scale path next to v4's IVF-cell blocking. The
    * ±1 hyperplanes ([[Similarity.rpSigns]]) are deterministic from md5,
    * so the oracle rebuilds the identical sketch from literal sign
    * arrays and the whole pipeline (bits, band keys, candidate pairs,
    * verified cosine) hash-matches DuckDB.
    */
  def v6RpLshNearDup(s: SparkSession, dir: String): DataFrame =
    Similarity.rpLshNearDups(emb(s, dir), "vec_id", "embedding",
        RpBits, RpBands, Dim)
      .select(col("vec_a"), col("vec_b"), round(col("score"), 6).as("score"))
      .filter(col("score") >= 0.25)
      .orderBy("vec_a", "vec_b")

  private val RpBits = 32
  private val RpBands = 4
  private val Dim = 64

  /** Semantic dedup clusters: connected components over the v4
    * cell-blocked cosine near-dup pairs, labeling each clustered vector
    * with its component's smallest vec_id — the embedding-side analog of
    * the text pipeline's `d6_dedup_clusters` (same union-find funnel,
    * same recursive-CTE oracle shape). This is the "keep one per
    * semantic duplicate group" primitive of an embedding-based corpus
    * cleanup: pairs stay cell-local (never all-pairs), and the CC
    * engine adds only narrow-task label merging on top.
    */
  def v7EmbeddingClusters(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val assigned = Similarity.assignCells(e, e.filter(col("vec_id") < NumCentroids))
      .persist()
    val a = assigned.select(col("vec_id").as("vec_a"), col("cell"),
      col("uv").as("va"))
    val b = assigned.select(col("vec_id").as("vec_b"), col("cell").as("cell_b"),
      col("uv").as("vb"))
    val pairs = a.join(b, col("cell") === col("cell_b") && col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"),
        round(Similarity.dotD(col("va"), col("vb")), 6).as("score"))
      .filter(col("score") >= 0.25)
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
    graft.operators.Dedup.connectedComponents(pairs)
      .select(col("doc_id").as("vec_id"), col("cluster_id"))
      .orderBy("vec_id")
  }

  /** Batched IVF over k-means-TRAINED centroids (Lloyd's, 3 rounds) —
    * the production IVF build, vs v3/v5's first-k-rows centroids.
    * The per-partition summation order inside the float centroid means
    * is not re-derivable in SQL, so this is NOT a driver row (retired
    * from `entries` in round 11 per the round-10 verdict; the gate
    * ledger carries only oracle-checkable rows). The oracle-checked
    * twin is `v11_kmeans_quantized` (integer Lloyd's — every mean
    * exact); this float path stays verified end-to-end in
    * `RowsOnlySpec` plus the k-means invariants (monotone objective,
    * determinism, empty-cell carry-forward) in SimilaritySpec.
    */
  def v8IvfKmeans(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val cents = Similarity.kmeansCentroids(e, NumCentroids, iters = 3)
    val assigned = Similarity.assignCells(e, cents, vecCol = "embedding")
      .persist()
    Similarity.ivfTopKBatch(assigned, cents,
      e.filter(col("vec_id") >= 100 && col("vec_id") < 105), K, nprobe = 2)
      .select(col("query_id"), col("neighbor_id"),
        round(col("score"), 6).as("score"), col("rank").as("rnk"))
      .orderBy("query_id", "rnk")
  }

  /** Scalar-quantized (int8) approximate top-k — the memory-bandwidth
    * scale path: unit vectors quantize SYMMETRICALLY to −127..127 codes
    * against one global scale, `code = floor(v * 127 / amax + 0.5)`
    * clamped to [-127, 127] with `amax = max |component|` over the
    * corpus ([[Similarity.withQuantized]]). Scale-only quantization
    * preserves inner-product order; the affine per-dimension min/max
    * alternative was measured and rejected (recall 0.10 vs 1.00 — see
    * [[Similarity.quantStats]]). Ranking runs on the EXACT integer dot
    * ([[graft.functions.IntDotProduct]]) — no FP noise anywhere, so
    * scores, ties, and ranks re-derive bit-identically in DuckDB and
    * this is a FULL oracle row (unlike float ANN scores that need
    * rounding). Recall vs the exact float path is pinned in
    * SimilaritySpec.
    */
  def v9QuantizedTopK(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    Similarity.quantizedTopK(e,
        e.filter(col("vec_id") >= 100 && col("vec_id") < 105), K)
      .select(col("query_id"), col("neighbor_id"), col("qscore"),
        col("rank").as("rnk"))
      .orderBy("query_id", "rnk")
  }

  private val PqM = 16   // subspaces
  private val PqSub = 4  // dims per subspace (PqM * PqSub = Dim)
  private val PqK = 64   // codewords per subspace

  /** Product quantization with ADC scoring ([[Similarity.pqCodebook]] /
    * [[Similarity.pqEncode]] / [[Similarity.pqAdcTopK]]) — the Faiss
    * IVF-PQ compression stage: 64 int8 dims become 16 codeword ids
    * (~20× fewer candidate bytes than float, ~4× fewer than SQ8), and
    * queries score candidates through an m·k-entry integer lookup
    * table without ever touching the vectors. Codebooks here are the
    * hash-random pivot init (the point Lloyd's would start from —
    * production trains them with [[Similarity.kmeansCentroidsQuantized]]
    * per subspace, v11's loop); recall@10 vs the float exact path is
    * 0.56 at sf0.001 (pinned ≥ 0.5 in SimilaritySpec, vs 0.12 at the
    * coarse m=4 split — the sweep is recorded in BASELINE.md). Every
    * number — pivots, codes, LUT entries, ADC scores, ranks — is exact
    * integer arithmetic: the full PQ pipeline is ONE hash-checked
    * oracle row.
    */
  def v13PqAdc(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val cu = Similarity.withUnitVector(e, "embedding")
      .select(col("vec_id"), col("uv"))
    val stats = Similarity.quantStats(cu, "uv")
    val codes = Similarity.withQuantized(cu, stats, "uv")
      .select(col("vec_id"), col("qv")).persist()
    val cb = Similarity.pqCodebook(codes, PqM, PqSub, PqK)
    val enc = Similarity.pqEncode(codes, cb, PqM, PqSub)
    val q = codes.filter(col("vec_id") >= 100 && col("vec_id") < 105)
    Similarity.pqAdcTopK(enc, cb, q, K, PqSub)
      .orderBy("query_id", "rnk")
  }

  /** IVF-SQ8 batch top-k — [[Similarity.ivfQuantizedTopKBatch]]: v5's
    * cell blocking composed with v9's int8 scoring, the faiss-style
    * production ANN shape. Centroid ranking stays float (tiny, exact
    * per v5's proof); candidate scores are integers — full oracle row.
    */
  def v10IvfQuantized(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val centroids = e.filter(col("vec_id") < NumCentroids)
    val assigned = Similarity.assignCells(e, centroids).persist()
    Similarity.ivfQuantizedTopKBatch(assigned, centroids,
        e.filter(col("vec_id") >= 100 && col("vec_id") < 105), K, nprobe = 2)
      .select(col("query_id"), col("neighbor_id"), col("qscore"),
        col("rank").as("rnk"))
      .orderBy("query_id", "rnk")
  }

  /** IVF-SQ8 over integer-TRAINED centroids — v8's Lloyd's k-means
    * re-expressed in exact integer space
    * ([[Similarity.kmeansCentroidsQuantized]]): centroids stay RATIONAL
    * (element-wise BIGINT code sums + member counts, never divided into
    * float means), assignment ranks by the exact integer dot over one
    * IEEE division, and candidate scoring is v9's codegen'd integer
    * dot. Because every fold is associative integer arithmetic, the
    * whole TRAINING LOOP re-derives bit-identically in DuckDB — this is
    * the full-oracle answer to v8's rows-only check (per-partition
    * float summation order in its means is not SQL-re-derivable).
    */
  def v11KmeansQuantized(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    Similarity.kmeansQuantizedTopK(e,
        e.filter(col("vec_id") >= 100 && col("vec_id") < 105),
        K, NumCentroids, iters = KmIters, nprobe = 2)
      .select(col("query_id"), col("neighbor_id"), col("qscore"),
        col("rank").as("rnk"))
      .orderBy("query_id", "rnk")
  }

  private val KmIters = 2

  /** Incremental cross-corpus embedding dedup — the vector twin of
    * `d11_incremental_dedup` ([[Similarity.crossCorpusQuantizedMatches]]):
    * batch vectors (vec_id ≥ 400) matched against a reference corpus
    * (vec_id < 400) by int8 cosine, the reference NEVER self-joined.
    * Calibration and cell assignment come from the reference side only
    * (storable across batches — crawl N+1 probes crawls 1..N's stored
    * codes). Entirely integer scoring ⇒ full oracle row.
    */
  def v12CrossCorpusAnn(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    Similarity.crossCorpusQuantizedMatches(
        e.filter(col("vec_id") >= RefSplit), e.filter(col("vec_id") < RefSplit),
        minScore = MatchScore, numCentroids = NumCentroids, nprobe = 2)
      .orderBy("batch_id", "ref_id")
  }

  private val RefSplit = 400L
  private val MatchScore = 24000L

  /** SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv
    * 2303.09540): k-means the corpus, find within-CLUSTER semantic
    * duplicates by pairwise cosine, and keep from each duplicate group
    * the member LEAST similar to its centroid — the paper's insight
    * that the prototypical copies are the redundant ones and the
    * centroid-farthest member carries the most marginal information.
    * Composes the repo's integer machinery end-to-end: corpus-amax
    * int8 codes, v11's exact-integer Lloyd's (trained rational
    * centroids), cell-blocked pair join (never all-pairs — the same
    * within-cell discipline as the vector store's self-dedup), exact
    * integer-dot verify, CC duplicate groups, and the keeper argmin by
    * the INTEGER centroid dot (same cell ⇒ same n, so the rational
    * score ranks by its numerator — no division, no FP). Fully
    * hash-exact, training included. Scale shape: one scan to quantize,
    * the k-means pacing bound, one cell-equi self-join with pair mass
    * Σ min(cap, cell)·cell (`V16CellCap` excludes hot clusters from
    * pairing — the store's `max_cell_size` discipline, spelled in the
    * oracle), a CC funnel over verified pairs only, and a
    * cluster-partitioned ranking window. Engine: [[Similarity
    * .semDedup]], spec-pinned on a planted hot cluster.
    */
  def v16Semdedup(s: SparkSession, dir: String): DataFrame =
    Similarity.semDedup(emb(s, dir).select("vec_id", "embedding"),
        NumCentroids, KmIters, MatchScore,
        maxCellSize = Some(V16CellCap))
      .orderBy("vec_id")

  /** Hot-cluster cap for v16's within-cluster pair join — the store's
    * `max_cell_size` discipline on the standalone query (round-16
    * verdict item: the cell-equi self-join is quadratic in a hot
    * cluster's occupancy at corpus scale). Sized not to trip at the
    * gate SFs (≈ 62 mean occupancy at sf0.01's 500 vectors / 8 cells)
    * so the gated row keeps its full dedup semantics; the cap's
    * behavior under a planted hot cluster is spec-pinned
    * (SimilaritySpec), and the exclusion is SPELLED in the oracle.
    */
  private val V16CellCap = 150L

  /** Embedding-space outlier scoring — the curation signal "this doc
    * does not look like its label's cluster" ([[Similarity]] int8
    * machinery end-to-end): unit-normalize, quantize against the
    * global scale, INTEGER centroid per label (`SUM DIV n` per
    * dimension), squared L2 code distance to own centroid, top-5
    * farthest per label. All-integer after quantization, so the full
    * ranking is hash-exact. Scale shape: one explode + map-side
    * combined centroid aggregate (labels×dims rows — broadcast back),
    * one map-side combined distance aggregate, per-label ranking
    * window. The corpus shuffles once, on (label, vec) for the
    * distance fold.
    */
  def v14CentroidOutliers(s: SparkSession, dir: String): DataFrame = {
    val cu = Similarity.withUnitVector(emb(s, dir), "embedding")
      .select(col("vec_id"), col("label"), col("uv"))
    val stats = Similarity.quantStats(cu, "uv")
    val codes = Similarity.withQuantized(cu, stats, "uv")
      .select(col("vec_id"), col("label"), col("qv"))
    // persisted: ex feeds BOTH the centroid build and the distance
    // fold — without it Catalyst re-runs the scan+quantization for
    // each branch (and the 1-row scale broadcast twice with it)
    val ex = graft.operators.FrameCaches.track(
      codes.select(col("vec_id"), col("label"),
        posexplode(col("qv")).as(Seq("pos", "code"))).persist())
    val cent = ex.groupBy("label", "pos")
      .agg(expr("CAST(SUM(code) AS BIGINT) DIV COUNT(*)").as("c"))
    val dist = ex.join(broadcast(cent), Seq("label", "pos"))
      .groupBy("label", "vec_id")
      .agg(sum((col("code") - col("c")) * (col("code") - col("c")))
        .as("dist2"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("label").orderBy(col("dist2").desc, col("vec_id"))
    dist.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 5)
      .select("label", "vec_id", "dist2", "rnk")
      .orderBy("label", "rnk")
  }

  /** Standing vector dedup store as a LIFECYCLE, oracle-checked end to
    * end ([[graft.io.VectorDedupStore]]): crawl 1 = even vec_ids (the
    * founding batch freezes amax + `NumCentroids` centroids TRAINED by
    * the exact-integer Lloyd's of v11 — `KmIters` rounds, seeds = the
    * lowest-id even codes — in the model table), crawl 2 = odd vec_ids
    * quantized with the STORED calibration, probed against the stored
    * codes (nprobe = 2 cells, int8-dot >= MatchScore drops), survivors
    * self-deduped per home cell and appended. `VdsCellCap` is live on
    * BOTH capped paths — hot store cells are excluded from the probe
    * and hot home cells from the within-batch pair join — and both
    * exclusions are spelled in the oracle. v12 is the per-call
    * primitive; this is the maintained-table shape a crawl-N+1
    * pipeline declares in YAML (`refresh_type: vector_dedup_store`).
    * All-integer scoring (training included — rational centroids,
    * never float means) makes the whole two-fold lifecycle one
    * hash-exact oracle row.
    */
  def vds1VectorDedupStore(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir).select("vec_id", "embedding")
    s.sql("CREATE DATABASE IF NOT EXISTS graft_tmp")
    val table = "graft_tmp.vds1_vector_store"
    Seq(table, s"${table}_model").foreach { t =>
      s.sql(s"DROP TABLE IF EXISTS $t")
      // a fresh session's catalog has no memory of a previous run's
      // managed table, but the warehouse dir survives (ds1 precedent)
      val loc = new org.apache.hadoop.fs.Path(
        s"${s.conf.get("spark.sql.warehouse.dir")}/graft_tmp.db/" +
          t.split('.')(1))
      val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    graft.io.VectorDedupStore.maintain(s, table,
      e.filter(col("vec_id") % 2 === 0), "vec_id", "embedding",
      MatchScore, NumCentroids, nprobe = 2, trainIters = KmIters,
      maxCellSize = Some(VdsCellCap), epochId = Some(1L))
    graft.io.VectorDedupStore.maintain(s, table,
      e.filter(col("vec_id") % 2 === 1), "vec_id", "embedding",
      MatchScore, NumCentroids, nprobe = 2, trainIters = KmIters,
      maxCellSize = Some(VdsCellCap), epochId = Some(2L))
    graft.io.VectorDedupStore.storedVecIds(s, table)
      .select(col("vec_id"), col("_epoch").as("folded_epoch"))
      .orderBy("vec_id")
  }

  private val VdsCellCap = 40L

  /** vds1's keeper-policy twin — the SAME two-fold store lifecycle run
    * under `keeper = centroid_farthest` ([[graft.io.VectorDedupStore
    * .Keepers]]): each within-batch duplicate group keeps its
    * LEAST-prototypical member (SemDeDup's published rule, v16's
    * argmin) instead of the smallest id, so the maintained pipeline —
    * not just the standalone query — implements the paper. The argmin
    * is integer-exact within a cell (same n ⇒ the rational centroid
    * score ranks by its BIGINT numerator), so the policy costs the
    * lifecycle nothing in oracle precision: stored ids + epochs still
    * hash-match the full WITH RECURSIVE re-derivation, keeper rule
    * included. Discriminates from vds1 wherever a duplicate group's
    * farthest member is not its smallest id.
    */
  def vds2KeeperSemdedup(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir).select("vec_id", "embedding")
    s.sql("CREATE DATABASE IF NOT EXISTS graft_tmp")
    val table = "graft_tmp.vds2_vector_store"
    Seq(table, s"${table}_model").foreach { t =>
      s.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new org.apache.hadoop.fs.Path(
        s"${s.conf.get("spark.sql.warehouse.dir")}/graft_tmp.db/" +
          t.split('.')(1))
      val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    graft.io.VectorDedupStore.maintain(s, table,
      e.filter(col("vec_id") % 2 === 0), "vec_id", "embedding",
      MatchScore, NumCentroids, nprobe = 2, trainIters = KmIters,
      maxCellSize = Some(VdsCellCap), epochId = Some(1L),
      keeper = "centroid_farthest")
    graft.io.VectorDedupStore.maintain(s, table,
      e.filter(col("vec_id") % 2 === 1), "vec_id", "embedding",
      MatchScore, NumCentroids, nprobe = 2, trainIters = KmIters,
      maxCellSize = Some(VdsCellCap), epochId = Some(2L),
      keeper = "centroid_farthest")
    graft.io.VectorDedupStore.storedVecIds(s, table)
      .select(col("vec_id"), col("_epoch").as("folded_epoch"))
      .orderBy("vec_id")
  }

  /** VECTOR store-membership PROBE as a full oracle row — the vds1
    * lifecycle's read half on the driver gate ([[graft.io
    * .VectorDedupStore.probeHits]], the engine behind the declarative
    * `store_probe` verb for `store_type: vector_dedup_store`): found
    * the store on the even vec_ids (vds1's fold-1 exactly — frozen
    * amax, trained centroids, capped self-dedup), then probe the odd
    * vec_ids WITHOUT folding — quantized with the STORED calibration,
    * ranked against the frozen centroids, scored cell-equi against the
    * stored codes with `VdsCellCap` excluding hot store cells. Each
    * probe vector comes back flagged; the store provably never
    * advances. All-integer scoring keeps the whole read path one
    * hash-exact row.
    */
  def sp2StoreProbeVector(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir).select("vec_id", "embedding")
    s.sql("CREATE DATABASE IF NOT EXISTS graft_tmp")
    val table = "graft_tmp.sp2_probe_store"
    Seq(table, s"${table}_model").foreach { t =>
      s.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new org.apache.hadoop.fs.Path(
        s"${s.conf.get("spark.sql.warehouse.dir")}/graft_tmp.db/" +
          t.split('.')(1))
      val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    graft.io.VectorDedupStore.maintain(s, table,
      e.filter(col("vec_id") % 2 === 0), "vec_id", "embedding",
      MatchScore, NumCentroids, nprobe = 2, trainIters = KmIters,
      maxCellSize = Some(VdsCellCap), epochId = Some(1L))
    val batch = e.filter(col("vec_id") % 2 === 1)
    val hits = graft.io.VectorDedupStore.probeHits(s, table, batch,
      "vec_id", "embedding", MatchScore, nprobe = 2,
      maxCellSize = Some(VdsCellCap))
    batch.join(hits.withColumn("store_hit", lit(true)),
        Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("store_hit"), lit(false)).as("store_hit"))
      .orderBy("vec_id")
  }

  /** Measured RECALL of the capped store probe (round-19 verdict
    * item 3) — v15's recall discipline pointed at the STANDING store's
    * read path: found the store on the even vec_ids (sp2's fold-1
    * exactly), then probe the odd vec_ids under every (nprobe, capped)
    * configuration the YAML plane can declare, scoring each against
    * the UNCAPPED brute-force membership truth over the same store.
    * Truth reuses [[graft.io.VectorDedupStore.probeHits]] itself with
    * nprobe = NumCentroids and no cap — every cell probed, so the
    * cell-equi join degenerates to exact brute force THROUGH the same
    * quantization and integer dots, keeping the whole matrix
    * hash-exact (the v15 recipe). Config hits are provably subsets of
    * the truth (fewer cells, same score bar), so recall_permille is
    * exact integer arithmetic and nprobe=2 dominates nprobe=1 at equal
    * cap by construction — pinned here with a loud require and priced
    * in VectorDedupStoreSpec. Scale shape: the truth side is
    * store-mass x batch work BY DEFINITION (it is the eval bar, run at
    * evaluation scale, never in production paths); the config side is
    * the production capped cell-equi probe.
    */
  def v17StoreProbeRecall(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = emb(s, dir).select("vec_id", "embedding")
    s.sql("CREATE DATABASE IF NOT EXISTS graft_tmp")
    val table = "graft_tmp.v17_recall_store"
    Seq(table, s"${table}_model").foreach { t =>
      s.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new org.apache.hadoop.fs.Path(
        s"${s.conf.get("spark.sql.warehouse.dir")}/graft_tmp.db/" +
          t.split('.')(1))
      val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    graft.io.VectorDedupStore.maintain(s, table,
      e.filter(col("vec_id") % 2 === 0), "vec_id", "embedding",
      MatchScore, NumCentroids, nprobe = 2, trainIters = KmIters,
      maxCellSize = Some(VdsCellCap), epochId = Some(1L))
    val batch = graft.operators.FrameCaches.track(
      e.filter(col("vec_id") % 2 === 1).persist())
    def hitsUnder(np: Int, cap: Option[Long]): Long =
      graft.io.VectorDedupStore.probeHits(s, table, batch,
        "vec_id", "embedding", MatchScore, nprobe = np,
        maxCellSize = cap).count()
    // the truth probe and the four config probes are independent pure
    // reads of the folded store, so their five count jobs overlap
    // (guide §2.6 — each still runs the production probeHits path it
    // gates; values identical to the serial spelling)
    val cfgs = for {
      np <- Seq(1, 2); capped <- Seq(false, true)
    } yield (np, capped)
    val counts = graft.util.Concurrent.all(
      (() => hitsUnder(NumCentroids, None)) +: cfgs.map {
        case (np, capped) =>
          () => hitsUnder(np, if (capped) Some(VdsCellCap) else None)
      })
    val trueHits = counts.head
    val rows = cfgs.zip(counts.tail).map { case ((np, capped), hits) =>
      (np.toLong, capped, hits, trueHits,
        if (trueHits == 0L) 1000L else hits * 1000L / trueHits)
    }
    for (capped <- Seq(false, true)) {
      val Seq(r1, r2) = rows.filter(_._2 == capped).map(_._3)
      require(r2 >= r1, s"recall dominance violated (capped=$capped): " +
        s"nprobe=2 found $r2 < nprobe=1's $r1")
    }
    rows.toDF("nprobe", "capped", "hits", "true_hits", "recall_permille")
      .orderBy("nprobe", "capped")
  }

  val entries: Map[String, Q] = Map(
    "vds1_vector_dedup_store" -> vds1VectorDedupStore _,
    "vds2_semdedup_store" -> vds2KeeperSemdedup _,
    "sp2_store_probe_vector" -> sp2StoreProbeVector _,
    "v17_store_probe_recall" -> v17StoreProbeRecall _,
    "v14_centroid_outliers" -> v14CentroidOutliers _,
    "v13_pq_adc" -> v13PqAdc _,
    "v12_cross_corpus_ann" -> v12CrossCorpusAnn _,
    "v11_kmeans_quantized" -> v11KmeansQuantized _,
    "v10_ivf_quantized" -> v10IvfQuantized _,
    "v9_quantized_topk" -> v9QuantizedTopK _,
    "v1_vector_norms" -> v1Norms _,
    "v2_cosine_topk" -> v2CosineTopK _,
    "v3_ivf_topk" -> v3IvfTopK _,
    "v4_neardup_cosine" -> v4NearDupCosine _,
    "v5_ivf_batch" -> v5IvfBatch _,
    "v15_ivf_recall" -> v15IvfRecall _,
    "v6_rp_lsh_neardup" -> v6RpLshNearDup _,
    "v7_embedding_clusters" -> v7EmbeddingClusters _,
    "v16_semdedup" -> v16Semdedup _,
  )

  // ---- oracle builders (identical double-precision folds in DuckDB) ----

  private def dotSql(a: String, b: String): String =
    s"list_sum([CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE) for p in list_zip($a, $b)])"

  private def dotDSql(a: String, b: String): String =
    s"list_sum([p[1] * p[2] for p in list_zip($a, $b)])"

  private def normSql(a: String): String = s"sqrt(${dotSql(a, a)})"

  // normalize once, then every cosine is a plain dot — mirrors
  // Similarity.withUnitVector/dotD so the IEEE sequences line up
  private val unitCte =
    s"""SELECT vec_id, list_transform(embedding,
       |  x -> CAST(x AS DOUBLE) / ${normSql("embedding")}) AS uv
       |FROM embeddings""".stripMargin

  private val assignedCte =
    s"""SELECT vec_id, uv, centroid_id AS cell FROM (
       |  SELECT u.vec_id, u.uv, c.centroid_id,
       |    ROW_NUMBER() OVER (PARTITION BY u.vec_id
       |      ORDER BY ${dotDSql("u.uv", "c.centv")} DESC, c.centroid_id) AS crank
       |  FROM unit u, (SELECT vec_id AS centroid_id, uv AS centv
       |                FROM unit WHERE vec_id < $NumCentroids) c
       |) WHERE crank = 1""".stripMargin

  // RP-LSH sketch rebuilt from the SAME deterministic ±1 hyperplanes,
  // embedded as SQL literals; the float→double cast per element mirrors
  // DotProduct's widening, so the sign folds are bit-identical
  private def rpBandSql(b: Int): String = {
    val signs = Similarity.rpSigns(RpBits, Dim)
    val rows = RpBits / RpBands
    (0 until rows).map { r =>
      val j = b * rows + r
      val lit = signs(j).map(v => if (v > 0) "1.0" else "-1.0")
        .mkString("[", ", ", "]")
      s"""(CASE WHEN list_sum([CAST(p[1] AS DOUBLE) * p[2]
         | for p in list_zip(embedding, $lit)]) > 0
         | THEN ${1 << r} ELSE 0 END)""".stripMargin
    }.mkString(" + ")
  }

  private def rpBaseCte: String =
    s"""SELECT vec_id,
       | ${(0 until RpBands).map(b => s"${rpBandSql(b)} AS rp_band_$b").mkString(",\n ")}
       |FROM embeddings""".stripMargin

  // ---- integer k-means oracle plumbing (v11) ----

  /** Exact integer dot of two BIGINT lists; CAST collapses DuckDB's
    * HUGEINT list_sum back to the BIGINT Spark emits (the round-7
    * hash-regression class).
    */
  private def qdotSql(a: String, b: String): String =
    s"CAST(list_sum(list_transform(generate_series(1, len($a)), i -> $a[i] * $b[i])) AS BIGINT)"

  /** One Lloyd's assignment round: every code picks the centroid (from
    * CTE `cents`) maximizing the rational score qsum·code / n — exact
    * integers through one IEEE division, ties to the lowest id —
    * mirroring [[Similarity.assignCellsQuantized]]'s broadcast fold.
    */
  private def kmAssignSql(cents: String, base: String = "kcodes"): String =
    s"""SELECT vec_id, qv, cell FROM (
       |  SELECT d.vec_id, d.qv, c.centroid_id AS cell,
       |    ROW_NUMBER() OVER (PARTITION BY d.vec_id ORDER BY
       |      CAST(${qdotSql("d.qv", "c.qsum")} AS DOUBLE) / c.n DESC,
       |      c.centroid_id) AS r
       |  FROM $base d, $cents c) WHERE r = 1""".stripMargin

  /** One centroid update: element-wise BIGINT sums + counts per cell,
    * empty cells carrying the previous centroid forward.
    */
  private def kmUpdateSql(assigned: String, prev: String): String =
    s"""SELECT c.centroid_id, COALESCE(g.qsum2, c.qsum) AS qsum,
       |  COALESCE(g.n2, c.n) AS n
       |FROM $prev c LEFT JOIN (
       |  SELECT cell, list(s ORDER BY pos) AS qsum2,
       |    CAST(MAX(cnt) AS BIGINT) AS n2
       |  FROM (
       |    SELECT cell, pos, CAST(SUM(v) AS BIGINT) AS s, COUNT(*) AS cnt
       |    FROM (
       |      SELECT cell, unnest(generate_series(1, len(qv))) AS pos,
       |        unnest(qv) AS v
       |      FROM $assigned)
       |    GROUP BY cell, pos)
       |  GROUP BY cell) g ON c.centroid_id = g.cell""".stripMargin

  /** vds1 oracle plumbing: the keep-one-per-cluster CTE chain over a
    * (vec_id, qv, cell) frame — same-cell verified pairs -> symmetric
    * edges -> transitive closure -> min-label clusters -> keepers
    * (the ds1 keeperCtes shape with cell-equality blocking and the
    * exact integer dot as the verify). `cap` mirrors the store's
    * maxCellSize on the within-batch pair join: hot home cells (batch
    * occupancy > cap) produce NO pairs — their vectors pass through
    * un-deduped, the recall trade the Spark side takes.
    */
  private def vecKeeperCtes(base: String, tag: String, minScore: Long,
      cap: Option[Long] = None,
      farthestCents: Option[String] = None): String = {
    val capFilter = cap.map(c =>
      s"""
         |    AND x.cell NOT IN (
         |      SELECT cell FROM $base GROUP BY cell HAVING COUNT(*) > $c)"""
        .stripMargin).getOrElse("")
    // keeper CTE: min-label closure canonical id by default, or — when
    // `farthestCents` names the rational-centroid CTE — SemDeDup's
    // centroid-farthest argmin (integer qdot ASC, ties to lowest id;
    // all cluster members share the cell, so the rational score ranks
    // by its numerator)
    val keeperCte = farthestCents match {
      case Some(cents) =>
        s"""k$tag AS (
           |  SELECT vec_id FROM $base WHERE vec_id NOT IN (
           |    SELECT vec_id FROM (
           |      SELECT c.vec_id,
           |        ROW_NUMBER() OVER (PARTITION BY c.cluster_id
           |          ORDER BY ${qdotSql("b.qv", "ct.qsum")} ASC, c.vec_id)
           |          AS rn
           |      FROM c$tag c
           |      JOIN $base b ON b.vec_id = c.vec_id
           |      JOIN $cents ct ON b.cell = ct.centroid_id)
           |    WHERE rn <> 1))""".stripMargin
      case None =>
        s"""k$tag AS (
           |  SELECT vec_id FROM $base WHERE vec_id NOT IN
           |    (SELECT vec_id FROM c$tag WHERE cluster_id <> vec_id))"""
          .stripMargin
    }
    // MATERIALIZED: the lp rounds re-read e$tag every step; without
    // the hint DuckDB re-inlines the whole upstream chain (training
    // included) per step and the oracle runs for minutes instead of
    // sub-second
    s"""p$tag AS MATERIALIZED (
       |  SELECT x.vec_id AS da, y.vec_id AS db
       |  FROM $base x JOIN $base y
       |    ON x.cell = y.cell AND x.vec_id < y.vec_id
       |  WHERE ${qdotSql("x.qv", "y.qv")} >= $minScore$capFilter),
       |e$tag AS MATERIALIZED (
       |  SELECT da AS src, db AS dst FROM p$tag
       |  UNION SELECT db, da FROM p$tag),
       |${ClosureSql.lpCtes(s"e$tag", s"l$tag")},
       |c$tag AS (
       |  ${ClosureSql.componentsSql(s"l$tag", "vec_id", "cluster_id")}),
       |$keeperCte""".stripMargin
  }

  /** vds1 oracle plumbing: rank the trained rational centroids (CTE
    * `cents`: centroid_id, qsum, n) per vector of `base` by the exact
    * score qsum·qv / n (one IEEE division, ties to the lowest id) and
    * keep cranks <= `maxCrank` — the store's home/probe assignment.
    */
  private def vecRankSql(base: String, filter: String, cents: String,
      maxCrank: Int): String =
    s"""SELECT vec_id, qv, cell, crank FROM (
       |    SELECT q.vec_id, q.qv, c.centroid_id AS cell,
       |      ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
       |        CAST(${qdotSql("q.qv", "c.qsum")} AS DOUBLE) / c.n DESC,
       |        c.centroid_id) AS crank
       |    FROM $base q, $cents c WHERE $filter)
       |  WHERE crank <= $maxCrank""".stripMargin

  /** The vector-store lifecycle's shared oracle prefix, parametrized
    * by the keeper policy: calibration amax over the FOUNDING (even)
    * unit vectors, centroids TRAINED by the unrolled integer Lloyd's
    * (v11's kmAssign/kmUpdate plumbing verbatim), fold-1 home cells +
    * keepers (`k1`, min-id or centroid-farthest per `farthestCents`),
    * and fold-2's capped cell-equi probe (`hits`). vds1/vds2 continue
    * with the remnant's own keeper pass; sp2 reads the membership
    * flags straight off `hits`.
    */
  /** The lifecycle prefix through the STANDING STORE only (`s1` =
    * fold-1 survivors with home cells) — shared by the fold/probe
    * continuations and v17's recall matrix, which probes `s1` under
    * several (nprobe, cap) configurations at once.
    */
  private def vdsLifecycleToStore(farthestCents: Option[String]): String =
    s"""WITH unit AS ($unitCte),
       |eu AS (SELECT vec_id, uv FROM unit WHERE vec_id % 2 = 0),
       |st AS (SELECT MAX(ABS(x)) AS amax
       |       FROM (SELECT unnest(uv) AS x FROM eu)),
       |qc AS (
       |  SELECT vec_id, list_transform(uv, x ->
       |    CASE WHEN amax > 0
       |    THEN CAST(LEAST(GREATEST(FLOOR(x / amax * 127 + 0.5),
       |      -127), 127) AS BIGINT) ELSE 0 END) AS qv
       |  FROM unit CROSS JOIN st),
       |eqc AS MATERIALIZED (SELECT vec_id, qv FROM qc WHERE vec_id % 2 = 0),
       |vkc0 AS MATERIALIZED (SELECT vec_id AS centroid_id, qv AS qsum,
       |         CAST(1 AS BIGINT) AS n
       |         FROM eqc ORDER BY vec_id LIMIT $NumCentroids),
       |vka1 AS MATERIALIZED (${kmAssignSql("vkc0", "eqc")}),
       |vkc1 AS MATERIALIZED (${kmUpdateSql("vka1", "vkc0")}),
       |vka2 AS MATERIALIZED (${kmAssignSql("vkc1", "eqc")}),
       |cents AS MATERIALIZED (${kmUpdateSql("vka2", "vkc1")}),
       |h1 AS MATERIALIZED (
       |  SELECT vec_id, qv, cell FROM (
       |  ${vecRankSql("qc", "q.vec_id % 2 = 0", "cents", 1)})),
       |${vecKeeperCtes("h1", "1", MatchScore, Some(VdsCellCap),
           farthestCents)},
       |s1 AS MATERIALIZED (SELECT h1.* FROM h1 JOIN k1 USING (vec_id))"""
      .stripMargin

  private def vdsLifecycleToProbe(farthestCents: Option[String]): String =
    s"""${vdsLifecycleToStore(farthestCents)},
       |pr2 AS MATERIALIZED (
       |  ${vecRankSql("qc", "q.vec_id % 2 = 1", "cents", 2)}),
       |hits AS MATERIALIZED (
       |  SELECT DISTINCT p.vec_id FROM pr2 p JOIN s1 s ON p.cell = s.cell
       |  WHERE ${qdotSql("p.qv", "s.qv")} >= $MatchScore
       |    AND s.cell NOT IN (
       |      SELECT cell FROM s1 GROUP BY cell HAVING COUNT(*) > $VdsCellCap))"""
      .stripMargin

  /** The two-fold store's shared suffix: the store-fresh remnant's own
    * keeper pass and the epoch stamps.
    */
  private def vdsFoldTwoSuffix(farthestCents: Option[String]): String =
    s"""f2 AS MATERIALIZED (
       |  SELECT vec_id, qv, cell FROM pr2 WHERE crank = 1
       |    AND vec_id NOT IN (SELECT vec_id FROM hits)),
       |${vecKeeperCtes("f2", "2", MatchScore, Some(VdsCellCap),
           farthestCents)}
       |SELECT vec_id, CAST(1 AS BIGINT) AS folded_epoch FROM k1
       |UNION ALL
       |SELECT vec_id, CAST(2 AS BIGINT) AS folded_epoch FROM k2
       |ORDER BY vec_id""".stripMargin

  val oracles: Map[String, String] = Map(
    // the whole two-fold store lifecycle in SQL: calibration amax over
    // the FOUNDING (even) unit vectors only, centroids TRAINED by the
    // unrolled integer Lloyd's (KmIters rounds over the even codes,
    // seeds = the NumCentroids lowest-id even codes — v11's
    // kmAssign/kmUpdate plumbing verbatim), both folds quantized
    // against that frozen scale; home cells by the exact rational
    // argmax qsum·qv/n (ties to lowest centroid), within-fold keepers
    // via the recursive min-label closure with VdsCellCap silencing
    // hot home cells, fold-2 probes the nprobe=2 best cells against
    // fold-1 survivors with VdsCellCap excluding hot STORE cells —
    // exact integers (one IEEE division in the rank) end to end, so
    // the stored ids + epochs hash-match
    "vds1_vector_dedup_store" ->
      s"""${vdsLifecycleToProbe(None)},
         |${vdsFoldTwoSuffix(None)}""".stripMargin,
    // vds1's lifecycle verbatim with the keeper CTEs swapped for
    // SemDeDup's centroid-farthest argmin (integer qdot vs the trained
    // rational centroid — division-free within a cell); everything
    // upstream (training, calibration, capped probe) identical
    "vds2_semdedup_store" ->
      s"""${vdsLifecycleToProbe(Some("cents"))},
         |${vdsFoldTwoSuffix(Some("cents"))}""".stripMargin,
    // the lifecycle prefix verbatim through the capped cell-equi probe
    // (`hits`), then the flags: every odd vector marked by whether its
    // integer dot vs ANY fold-1 survivor in a probed cell reaches
    // MatchScore — the read path re-derived stage for stage
    "sp2_store_probe_vector" ->
      s"""${vdsLifecycleToProbe(None)}
         |SELECT vec_id,
         |  vec_id IN (SELECT vec_id FROM hits) AS store_hit
         |FROM qc WHERE vec_id % 2 = 1 ORDER BY vec_id""".stripMargin,
    // the lifecycle prefix through the standing store (`s1`), then the
    // recall matrix: rank EVERY centroid per odd vector (prall), score
    // each (nprobe, capped) configuration's cell subset against the
    // store, and divide by the uncapped all-cell truth — the same
    // integer dots on both sides, so the permille is exact
    "v17_store_probe_recall" ->
      s"""${vdsLifecycleToStore(None)},
         |prall AS MATERIALIZED (
         |  ${vecRankSql("qc", "q.vec_id % 2 = 1", "cents", NumCentroids)}),
         |hot AS (SELECT cell FROM s1 GROUP BY cell
         |        HAVING COUNT(*) > $VdsCellCap),
         |scored AS MATERIALIZED (
         |  SELECT p.vec_id, p.crank, s.cell
         |  FROM prall p JOIN s1 s ON p.cell = s.cell
         |  WHERE ${qdotSql("p.qv", "s.qv")} >= $MatchScore),
         |cfg(nprobe, capped) AS (
         |  VALUES (1, FALSE), (1, TRUE), (2, FALSE), (2, TRUE)),
         |counts AS (
         |  SELECT c.nprobe, c.capped, COUNT(DISTINCT m.vec_id) AS hits
         |  FROM cfg c JOIN scored m ON m.crank <= c.nprobe
         |    AND (NOT c.capped OR m.cell NOT IN (SELECT cell FROM hot))
         |  GROUP BY 1, 2),
         |t AS (SELECT COUNT(DISTINCT vec_id) AS true_hits FROM scored)
         |SELECT CAST(c.nprobe AS BIGINT) AS nprobe, c.capped,
         |  CAST(COALESCE(k.hits, 0) AS BIGINT) AS hits,
         |  CAST(t.true_hits AS BIGINT) AS true_hits,
         |  CAST(CASE WHEN t.true_hits = 0 THEN 1000
         |    ELSE COALESCE(k.hits, 0) * 1000 // t.true_hits END AS BIGINT)
         |    AS recall_permille
         |FROM cfg c LEFT JOIN counts k
         |  ON k.nprobe = c.nprobe AND k.capped = c.capped
         |CROSS JOIN t ORDER BY c.nprobe, c.capped""".stripMargin,
    // ref-only calibration (amax over the unit REFERENCE), first-k ref
    // centroids, integer centroid ranking, integer candidate scores —
    // the whole incremental matcher is exact arithmetic
    "v12_cross_corpus_ann" ->
      s"""WITH unit AS ($unitCte),
         |ru AS (SELECT vec_id, uv FROM unit WHERE vec_id < $RefSplit),
         |st AS (SELECT MAX(ABS(x)) AS amax
         |       FROM (SELECT unnest(uv) AS x FROM ru)),
         |xcodes AS (
         |  SELECT vec_id, list_transform(uv, x ->
         |    CASE WHEN amax > 0
         |    THEN CAST(LEAST(GREATEST(FLOOR(x / amax * 127 + 0.5),
         |      -127), 127) AS BIGINT) ELSE 0 END) AS qv
         |  FROM unit CROSS JOIN st),
         |cents AS (SELECT vec_id AS centroid_id, qv AS cv FROM xcodes
         |          WHERE vec_id < $NumCentroids),
         |refcells AS (
         |  SELECT ref_id, qv AS rq, cell FROM (
         |    SELECT r.vec_id AS ref_id, r.qv, c.centroid_id AS cell,
         |      ROW_NUMBER() OVER (PARTITION BY r.vec_id
         |        ORDER BY ${qdotSql("r.qv", "c.cv")} DESC, c.centroid_id) AS crank
         |    FROM xcodes r, cents c WHERE r.vec_id < $RefSplit)
         |  WHERE crank = 1),
         |probes AS (
         |  SELECT batch_id, qv AS bq, cell FROM (
         |    SELECT b.vec_id AS batch_id, b.qv, c.centroid_id AS cell,
         |      ROW_NUMBER() OVER (PARTITION BY b.vec_id
         |        ORDER BY ${qdotSql("b.qv", "c.cv")} DESC, c.centroid_id) AS crank
         |    FROM xcodes b, cents c WHERE b.vec_id >= $RefSplit)
         |  WHERE crank <= 2)
         |SELECT p.batch_id, r.ref_id, ${qdotSql("p.bq", "r.rq")} AS qscore
         |FROM refcells r JOIN probes p ON r.cell = p.cell
         |WHERE ${qdotSql("p.bq", "r.rq")} >= $MatchScore
         |ORDER BY batch_id, ref_id""".stripMargin,
    // integer-space Lloyd's, unrolled KmIters times: codes quantize as
    // in v9, seeds are the first NumCentroids codes with n=1, and each
    // round is assign (exact rational argmax) + update (exact BIGINT
    // sums). The final assignment, probe ranking, and candidate scores
    // reuse the same exact arithmetic — the whole trained pipeline
    // hash-matches, no rounding anywhere
    "v11_kmeans_quantized" ->
      s"""WITH unit AS ($unitCte),
         |st AS (SELECT MAX(ABS(x)) AS amax
         |       FROM (SELECT unnest(uv) AS x FROM unit)),
         |kcodes AS (
         |  SELECT vec_id, list_transform(uv, x ->
         |    CASE WHEN amax > 0
         |    THEN CAST(LEAST(GREATEST(FLOOR(x / amax * 127 + 0.5),
         |      -127), 127) AS BIGINT) ELSE 0 END) AS qv
         |  FROM unit CROSS JOIN st),
         |c0 AS (SELECT vec_id AS centroid_id, qv AS qsum,
         |       CAST(1 AS BIGINT) AS n
         |       FROM kcodes WHERE vec_id < $NumCentroids),
         |a1 AS (${kmAssignSql("c0")}),
         |c1 AS (${kmUpdateSql("a1", "c0")}),
         |a2 AS (${kmAssignSql("c1")}),
         |c2 AS (${kmUpdateSql("a2", "c1")}),
         |af AS (${kmAssignSql("c2")}),
         |q AS (SELECT vec_id AS query_id, qv AS qq FROM kcodes
         |      WHERE vec_id >= 100 AND vec_id < 105),
         |probes AS (
         |  SELECT query_id, qq, centroid_id AS cell FROM (
         |    SELECT q.query_id, q.qq, c.centroid_id,
         |      ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
         |        CAST(${qdotSql("q.qq", "c.qsum")} AS DOUBLE) / c.n DESC,
         |        c.centroid_id) AS crank
         |    FROM q, c2 c)
         |  WHERE crank <= 2),
         |scored AS (
         |  SELECT p.query_id, a.vec_id AS neighbor_id,
         |    ${qdotSql("p.qq", "a.qv")} AS qscore
         |  FROM af a JOIN probes p ON a.cell = p.cell
         |  WHERE a.vec_id <> p.query_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, qscore,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY qscore DESC, neighbor_id) AS rnk
         |  FROM scored)
         |SELECT query_id, neighbor_id, qscore, rnk
         |FROM ranked WHERE rnk <= $K ORDER BY query_id, rnk""".stripMargin,
    // SemDeDup re-derived end-to-end: v11's training CTE chain, final
    // assignment, the vds1 keeper plumbing's pair/closure CTEs for the
    // duplicate groups, then the keeper ARGMIN by the integer centroid
    // dot (same cell => same n, so the rational score ranks by its
    // numerator — no division anywhere), ties to the lowest vec_id
    "v16_semdedup" ->
      s"""WITH unit AS ($unitCte),
         |st AS (SELECT MAX(ABS(x)) AS amax
         |       FROM (SELECT unnest(uv) AS x FROM unit)),
         |kcodes AS (
         |  SELECT vec_id, list_transform(uv, x ->
         |    CASE WHEN amax > 0
         |    THEN CAST(LEAST(GREATEST(FLOOR(x / amax * 127 + 0.5),
         |      -127), 127) AS BIGINT) ELSE 0 END) AS qv
         |  FROM unit CROSS JOIN st),
         |c0 AS (SELECT vec_id AS centroid_id, qv AS qsum,
         |       CAST(1 AS BIGINT) AS n
         |       FROM kcodes WHERE vec_id < $NumCentroids),
         |a1 AS (${kmAssignSql("c0")}),
         |c1 AS (${kmUpdateSql("a1", "c0")}),
         |a2 AS (${kmAssignSql("c1")}),
         |c2 AS (${kmUpdateSql("a2", "c1")}),
         |af AS (${kmAssignSql("c2")}),
         |${vecKeeperCtes("af", "sd", MatchScore, Some(V16CellCap))},
         |cl AS (
         |  SELECT a.vec_id, a.qv, a.cell,
         |    COALESCE(c.cluster_id, a.vec_id) AS cluster_id
         |  FROM af a LEFT JOIN csd c ON a.vec_id = c.vec_id),
         |sc AS (
         |  SELECT cl.vec_id, cl.cell, cl.cluster_id,
         |    ${qdotSql("cl.qv", "ct.qsum")} AS cdot
         |  FROM cl JOIN c2 ct ON cl.cell = ct.centroid_id),
         |k AS (
         |  SELECT vec_id, cell, cluster_id,
         |    ROW_NUMBER() OVER (PARTITION BY cluster_id
         |      ORDER BY cdot ASC, vec_id) AS rn,
         |    COUNT(*) OVER (PARTITION BY cluster_id) AS csz
         |  FROM sc)
         |SELECT vec_id, CAST(cell AS BIGINT) AS cell,
         |  CAST(csz AS BIGINT) AS cluster_size
         |FROM k WHERE rn = 1 ORDER BY vec_id""".stripMargin,
    // the full PQ pipeline in SQL: v9's quantization CTE, pivot pick by
    // md5 rank, per-subspace argmin encode (struct-min, ties to lowest
    // codeword), integer LUT, ADC sum, rank — everything exact integers
    "v13_pq_adc" ->
      s"""WITH unit AS ($unitCte),
         |st AS (SELECT MAX(ABS(x)) AS amax
         |       FROM (SELECT unnest(uv) AS x FROM unit)),
         |codes AS (
         |  SELECT vec_id, list_transform(uv, x ->
         |    CASE WHEN amax > 0
         |    THEN CAST(LEAST(GREATEST(FLOOR(x / amax * 127 + 0.5),
         |      -127), 127) AS BIGINT) ELSE 0 END) AS qv
         |  FROM unit CROSS JOIN st),
         |pivots AS (
         |  SELECT qv, ROW_NUMBER() OVER (ORDER BY h, vec_id) - 1 AS c
         |  FROM (SELECT vec_id, qv,
         |          ('0x' || substr(md5('pq:' || CAST(vec_id AS VARCHAR)), 1, 14))::BIGINT AS h
         |        FROM codes ORDER BY h, vec_id LIMIT $PqK)),
         |cb AS (
         |  SELECT g.s, c, qv[(g.s*$PqSub+1):(g.s*$PqSub+$PqSub)] AS cw
         |  FROM pivots, LATERAL (SELECT unnest(generate_series(0, ${PqM - 1})) AS s) g),
         |enc AS (
         |  SELECT vec_id, s, (MIN(struct_pack(d := dist, c := c))).c AS code
         |  FROM (
         |    SELECT x.vec_id, g.s, cb.c,
         |      CAST(list_sum(list_transform(generate_series(1, $PqSub),
         |        i -> (x.qv[g.s*$PqSub+i] - cb.cw[i]) * (x.qv[g.s*$PqSub+i] - cb.cw[i])))
         |        AS BIGINT) AS dist
         |    FROM codes x,
         |      LATERAL (SELECT unnest(generate_series(0, ${PqM - 1})) AS s) g
         |    JOIN cb ON cb.s = g.s)
         |  GROUP BY vec_id, s),
         |qset AS (SELECT vec_id AS query_id, qv FROM codes
         |         WHERE vec_id >= 100 AND vec_id < 105),
         |lut AS (
         |  SELECT query_id, cb.s, cb.c,
         |    CAST(list_sum(list_transform(generate_series(1, $PqSub),
         |      i -> q.qv[cb.s*$PqSub+i] * cb.cw[i])) AS BIGINT) AS pdot
         |  FROM qset q CROSS JOIN cb),
         |adc AS (
         |  SELECT query_id, e.vec_id AS neighbor_id,
         |    CAST(SUM(l.pdot) AS BIGINT) AS adc_score
         |  FROM enc e JOIN lut l ON l.s = e.s AND l.c = e.code
         |  WHERE e.vec_id <> query_id
         |  GROUP BY query_id, e.vec_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, adc_score,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY adc_score DESC, neighbor_id) AS rnk
         |  FROM adc)
         |SELECT query_id, neighbor_id, adc_score, rnk
         |FROM ranked WHERE rnk <= $K ORDER BY query_id, rnk""".stripMargin,
    // v9's quantization CTE verbatim; centroid DIV and the code
    // distance are all-BIGINT (SUM cast back from HUGEINT), and the
    // two parallel UNNESTs zip positionally (documented DuckDB
    // behavior) to pair each code with its dimension
    "v14_centroid_outliers" ->
      s"""WITH unit AS ($unitCte),
         |st AS (SELECT MAX(ABS(x)) AS amax
         |       FROM (SELECT unnest(uv) AS x FROM unit)),
         |codes AS (
         |  SELECT vec_id, list_transform(uv, x ->
         |    CASE WHEN amax > 0
         |    THEN CAST(LEAST(GREATEST(FLOOR(x / amax * 127 + 0.5),
         |      -127), 127) AS BIGINT) ELSE 0 END) AS qv
         |  FROM unit CROSS JOIN st),
         |ex AS (
         |  SELECT c.vec_id, e.label,
         |    UNNEST(generate_series(1, len(qv))) AS pos,
         |    UNNEST(qv) AS code
         |  FROM codes c JOIN embeddings e USING (vec_id)),
         |cent AS (
         |  SELECT label, pos, CAST(SUM(code) AS BIGINT) // COUNT(*) AS c
         |  FROM ex GROUP BY 1, 2),
         |dist AS (
         |  SELECT ex.label, ex.vec_id,
         |    CAST(SUM((code - c) * (code - c)) AS BIGINT) AS dist2
         |  FROM ex JOIN cent ON ex.label = cent.label AND ex.pos = cent.pos
         |  GROUP BY 1, 2),
         |ranked AS (
         |  SELECT label, vec_id, dist2,
         |    ROW_NUMBER() OVER (PARTITION BY label
         |      ORDER BY dist2 DESC, vec_id) AS rnk
         |  FROM dist)
         |SELECT label, vec_id, dist2, rnk FROM ranked
         |WHERE rnk <= 5 ORDER BY label, rnk""".stripMargin,
    // quantization mirrors Similarity.withQuantized exactly: unit
    // vectors, one global |v|max scale, symmetric code =
    // floor(v*127/amax + 0.5) clamped to [-127, 127]; scoring is
    // integer arithmetic — exact
    "v9_quantized_topk" ->
      s"""WITH unit AS ($unitCte),
         |st AS (SELECT MAX(ABS(x)) AS amax
         |       FROM (SELECT unnest(uv) AS x FROM unit)),
         |codes AS (
         |  SELECT vec_id, list_transform(uv, x ->
         |    CASE WHEN amax > 0
         |    THEN CAST(LEAST(GREATEST(FLOOR(x / amax * 127 + 0.5),
         |      -127), 127) AS BIGINT) ELSE 0 END) AS qv
         |  FROM unit CROSS JOIN st),
         |q AS (SELECT vec_id AS query_id, qv AS qq FROM codes
         |      WHERE vec_id >= 100 AND vec_id < 105),
         |scored AS (
         |  SELECT query_id, c.vec_id AS neighbor_id,
         |    CAST(list_sum(list_transform(generate_series(1, len(qq)),
         |      i -> qq[i] * c.qv[i])) AS BIGINT) AS qscore
         |  FROM codes c JOIN q ON query_id <> c.vec_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, qscore,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY qscore DESC, neighbor_id) AS rnk
         |  FROM scored)
         |SELECT query_id, neighbor_id, qscore, rnk
         |FROM ranked WHERE rnk <= $K ORDER BY query_id, rnk""".stripMargin,
    "v1_vector_norms" ->
      s"""SELECT vec_id, ROUND(${normSql("embedding")}, 6) AS l2_norm
         |FROM embeddings ORDER BY vec_id""".stripMargin,
    // v5's float centroid ranking + v9's integer candidate scoring;
    // query codes equal their corpus-row codes (queries are corpus rows
    // quantized against the same global scale)
    "v10_ivf_quantized" ->
      s"""WITH unit AS ($unitCte),
         |assigned AS ($assignedCte),
         |st AS (SELECT MAX(ABS(x)) AS amax
         |       FROM (SELECT unnest(uv) AS x FROM assigned)),
         |codes AS (
         |  SELECT vec_id, cell, list_transform(uv, x ->
         |    CASE WHEN amax > 0
         |    THEN CAST(LEAST(GREATEST(FLOOR(x / amax * 127 + 0.5),
         |      -127), 127) AS BIGINT) ELSE 0 END) AS qv
         |  FROM assigned CROSS JOIN st),
         |cent AS (SELECT vec_id AS centroid_id, uv AS centv
         |         FROM unit WHERE vec_id < $NumCentroids),
         |q AS (SELECT u.vec_id AS query_id, u.uv AS quv, c.qv AS qq
         |      FROM unit u JOIN codes c ON u.vec_id = c.vec_id
         |      WHERE u.vec_id >= 100 AND u.vec_id < 105),
         |probes AS (
         |  SELECT query_id, qq, centroid_id AS cell FROM (
         |    SELECT q.query_id, q.qq, c.centroid_id,
         |      ROW_NUMBER() OVER (PARTITION BY q.query_id
         |        ORDER BY ${dotDSql("q.quv", "c.centv")} DESC, c.centroid_id) AS crank
         |    FROM q, cent c)
         |  WHERE crank <= 2),
         |scored AS (
         |  SELECT p.query_id, c.vec_id AS neighbor_id,
         |    CAST(list_sum(list_transform(generate_series(1, len(p.qq)),
         |      i -> p.qq[i] * c.qv[i])) AS BIGINT) AS qscore
         |  FROM codes c JOIN probes p ON c.cell = p.cell
         |  WHERE c.vec_id <> p.query_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, qscore,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY qscore DESC, neighbor_id) AS rnk
         |  FROM scored)
         |SELECT query_id, neighbor_id, qscore, rnk
         |FROM ranked WHERE rnk <= $K ORDER BY query_id, rnk""".stripMargin,
    "v2_cosine_topk" ->
      s"""WITH unit AS ($unitCte),
         |q AS (SELECT vec_id AS query_id, uv AS qv FROM unit WHERE vec_id < 5),
         |scored AS (
         |  SELECT query_id, u.vec_id AS neighbor_id,
         |    ${dotDSql("qv", "u.uv")} AS score
         |  FROM unit u JOIN q ON query_id <> u.vec_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, score,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, neighbor_id) AS rnk
         |  FROM scored)
         |SELECT query_id, neighbor_id, ROUND(score, 6) AS score, rnk
         |FROM ranked WHERE rnk <= $K ORDER BY query_id, rnk""".stripMargin,
    "v3_ivf_topk" ->
      s"""WITH unit AS ($unitCte),
         |assigned AS ($assignedCte),
         |q AS (SELECT cell AS qcell, uv AS qv FROM assigned
         |      WHERE vec_id = $QueryId),
         |scored AS (
         |  SELECT a.vec_id AS neighbor_id, ${dotDSql("qv", "a.uv")} AS score
         |  FROM assigned a JOIN q ON a.cell = q.qcell
         |  WHERE a.vec_id <> $QueryId),
         |ranked AS (
         |  SELECT neighbor_id, score,
         |    ROW_NUMBER() OVER (ORDER BY score DESC, neighbor_id) AS rnk
         |  FROM scored)
         |SELECT neighbor_id, ROUND(score, 6) AS score, rnk
         |FROM ranked WHERE rnk <= $K ORDER BY rnk""".stripMargin,
    "v4_neardup_cosine" ->
      s"""WITH unit AS ($unitCte),
         |assigned AS ($assignedCte)
         |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |  ROUND(${dotDSql("a.uv", "b.uv")}, 6) AS score
         |FROM assigned a JOIN assigned b
         |  ON a.cell = b.cell AND a.vec_id < b.vec_id
         |WHERE ROUND(${dotDSql("a.uv", "b.uv")}, 6) >= 0.25
         |ORDER BY vec_a, vec_b""".stripMargin,
    "v5_ivf_batch" ->
      s"""WITH unit AS ($unitCte),
         |assigned AS ($assignedCte),
         |cent AS (SELECT vec_id AS centroid_id, uv AS centv
         |         FROM unit WHERE vec_id < $NumCentroids),
         |q AS (SELECT vec_id AS query_id, uv AS qv FROM unit
         |      WHERE vec_id >= 100 AND vec_id < 105),
         |probes AS (
         |  SELECT query_id, qv, centroid_id AS cell FROM (
         |    SELECT q.query_id, q.qv, c.centroid_id,
         |      ROW_NUMBER() OVER (PARTITION BY q.query_id
         |        ORDER BY ${dotDSql("q.qv", "c.centv")} DESC, c.centroid_id) AS crank
         |    FROM q, cent c)
         |  WHERE crank <= 2),
         |scored AS (
         |  SELECT p.query_id, a.vec_id AS neighbor_id,
         |    ${dotDSql("p.qv", "a.uv")} AS score
         |  FROM assigned a JOIN probes p ON a.cell = p.cell
         |  WHERE a.vec_id <> p.query_id),
         |ranked AS (
         |  SELECT query_id, neighbor_id, score,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |      ORDER BY score DESC, neighbor_id) AS rnk
         |  FROM scored)
         |SELECT query_id, neighbor_id, ROUND(score, 6) AS score, rnk
         |FROM ranked WHERE rnk <= $K ORDER BY query_id, rnk""".stripMargin,
    // both sides recomputed with the SAME IEEE dot folds as the Spark
    // engine, so the top-k sets agree and recall is exact integers
    "v15_ivf_recall" ->
      s"""WITH unit AS ($unitCte),
         |assigned AS ($assignedCte),
         |cent AS (SELECT vec_id AS centroid_id, uv AS centv
         |         FROM unit WHERE vec_id < $NumCentroids),
         |q AS (SELECT vec_id AS query_id, uv AS qv FROM unit
         |      WHERE vec_id >= 100 AND vec_id < 105),
         |exact AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT q.query_id, u.vec_id AS neighbor_id,
         |      ROW_NUMBER() OVER (PARTITION BY q.query_id
         |        ORDER BY ${dotDSql("q.qv", "u.uv")} DESC, u.vec_id) AS rnk
         |    FROM unit u JOIN q ON q.query_id <> u.vec_id)
         |  WHERE rnk <= $K),
         |ranked_cent AS (
         |  SELECT q.query_id, q.qv, c.centroid_id,
         |    ROW_NUMBER() OVER (PARTITION BY q.query_id
         |      ORDER BY ${dotDSql("q.qv", "c.centv")} DESC, c.centroid_id)
         |      AS crank
         |  FROM q, cent c),
         |approx AS (
         |  SELECT nprobe, query_id, neighbor_id FROM (
         |    SELECT np.nprobe, p.query_id, a.vec_id AS neighbor_id,
         |      ROW_NUMBER() OVER (PARTITION BY np.nprobe, p.query_id
         |        ORDER BY ${dotDSql("p.qv", "a.uv")} DESC, a.vec_id) AS rnk
         |    FROM (VALUES (1), (2)) AS np(nprobe)
         |    JOIN ranked_cent p ON p.crank <= np.nprobe
         |    JOIN assigned a ON a.cell = p.centroid_id
         |    WHERE a.vec_id <> p.query_id)
         |  WHERE rnk <= $K),
         |hits AS (
         |  SELECT nprobe, query_id, COUNT(*) AS hits
         |  FROM approx JOIN exact USING (query_id, neighbor_id)
         |  GROUP BY 1, 2),
         |base AS (SELECT query_id, nprobe
         |         FROM q, (VALUES (1), (2)) AS v(nprobe))
         |SELECT query_id, nprobe,
         |  CAST(COALESCE(hits, 0) AS BIGINT) AS hits,
         |  CAST(COALESCE(hits, 0) * 1000 // $K AS BIGINT) AS recall_permille
         |FROM base LEFT JOIN hits USING (query_id, nprobe)
         |ORDER BY query_id, nprobe""".stripMargin,
    "v7_embedding_clusters" ->
      s"""WITH unit AS ($unitCte),
         |assigned AS ($assignedCte),
         |cpairs AS (
         |  SELECT a.vec_id AS va, b.vec_id AS vb
         |  FROM assigned a JOIN assigned b
         |    ON a.cell = b.cell AND a.vec_id < b.vec_id
         |  WHERE ROUND(${dotDSql("a.uv", "b.uv")}, 6) >= 0.25),
         |edges AS MATERIALIZED (
         |  SELECT va AS src, vb AS dst FROM cpairs
         |  UNION SELECT vb, va FROM cpairs),
         |${ClosureSql.lpCtes("edges", "lp")}
         |${ClosureSql.componentsSql("lp", "vec_id", "cluster_id")}
         |ORDER BY vec_id""".stripMargin,
    "v6_rp_lsh_neardup" ->
      s"""WITH unit AS ($unitCte),
         |rpbase AS ($rpBaseCte),
         |pairs AS (
         |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
         |  FROM rpbase a JOIN rpbase b ON a.vec_id < b.vec_id AND
         |   (${(0 until RpBands).map(b => s"a.rp_band_$b = b.rp_band_$b")
               .mkString(" OR ")}))
         |SELECT p.vec_a, p.vec_b,
         |  ROUND(${dotDSql("ua.uv", "ub.uv")}, 6) AS score
         |FROM pairs p
         |JOIN unit ua ON p.vec_a = ua.vec_id
         |JOIN unit ub ON p.vec_b = ub.vec_id
         |WHERE ROUND(${dotDSql("ua.uv", "ub.uv")}, 6) >= 0.25
         |ORDER BY vec_a, vec_b""".stripMargin,
  )
}
