package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Dedup
import graft.operators.Dedup.Md5Hash

/** Near-dup detection queries over `documents`, oracle-checked end to
  * end: the md5-derived 60-bit hash family is bit-identical in DuckDB
  * (`('0x'||substr(md5(x),1,15))::BIGINT`), so MinHash signatures, LSH
  * band keys, candidate pairs, exact Jaccard scores, and SimHash chunks
  * all hash-match the oracle — not just row counts. Production callers
  * use the `XxHash` family instead (same pipeline, codegen'd hashing;
  * covered by ScalaTest with planted near-dups).
  */
object DedupQueries extends QuerySet {

  private val N = 3 // shingle width
  private val H = 16 // minhash count
  private val B = 4 // LSH bands (4 rows per band)

  def d2MinhashBands(s: SparkSession, dir: String): DataFrame =
    Dedup.withMinhashBands(
      Tables.load(s, dir, "documents").select("doc_id", "text"),
      "text", N, H, B, Md5Hash)
      .select("doc_id", "band_0", "band_1", "band_2", "band_3")
      .orderBy("doc_id")

  def d3MinhashPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashNearDups(Tables.load(s, dir, "documents"),
      "doc_id", "text", N, H, B, threshold = 0.0, mode = Md5Hash)
      .orderBy("doc_a", "doc_b")

  def d4SimhashChunks(s: SparkSession, dir: String): DataFrame =
    Dedup.withSimhashChunks(
      Tables.load(s, dir, "documents").select("doc_id", "text"), "text", Md5Hash)
      .select("doc_id", "sim_chunk_0", "sim_chunk_1", "sim_chunk_2", "sim_chunk_3")
      .orderBy("doc_id")

  def d5SimhashCandidates(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashCandidates(Tables.load(s, dir, "documents"),
      "doc_id", "text", Md5Hash)
      .orderBy("doc_a", "doc_b")

  /** Dedup clusters: connected components over the MinHash candidate
    * pairs, labeling every clustered doc with its component's smallest
    * doc id (the canonical keeper). Uses the candidates-only pipeline
    * (no exact-Jaccard verify joins, no sort) — the oracle clusters the
    * raw banded pairs, so the verify stage never changed the answer,
    * only added two joins and a corpus-wide `sh` carry.
    */
  def d6DedupClusters(s: SparkSession, dir: String): DataFrame =
    Dedup.connectedComponents(
      Dedup.minhashCandidates(Tables.load(s, dir, "documents"),
        "doc_id", "text", N, H, B, Md5Hash))
      .orderBy("doc_id")

  /** Cluster-level MinHash signatures: merge every member's signature
    * element-wise-min (the signature of a union of shingle sets).
    * Expressed as 16 built-in `min(sig[j])` aggregates — whole-stage
    * codegen'd, map-side partial-aggregated, zero encoder round-trips.
    * The equivalent typed [[Dedup.MinhashUnionAggregator]] (SURVEY §7.6's
    * custom-aggregate showcase, ScalaTest-covered) computes the same
    * merge but pays ExpressionEncoder ser/de per input row via
    * ObjectHashAggregate — measurably slower and far more GC-sensitive
    * under load, so the hot query uses the built-in formulation.
    */
  def d7ClusterSignatures(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    // one shingle+hash pass yields both the LSH band keys (candidate
    // generation) and the raw signatures (cluster merge) — the corpus
    // text is scanned and hashed exactly once
    val (pairs, sigs) = Dedup.minhashCandidatesWithSignatures(
      docs, "doc_id", "text", N, H, B, Md5Hash)
    val clusters = Dedup.connectedComponents(pairs)
    val mins = (0 until H).map(j => min(col("sig").getItem(j)).as(s"sig_$j"))
    clusters.join(sigs, "doc_id")
      .groupBy("cluster_id")
      .agg(mins.head, mins.tail: _*)
      .orderBy("cluster_id")
  }

  /** End-to-end training-data dedup pipeline — the composition a real
    * corpus cleanup runs, oracle-checked as ONE query: quality gate
    * (composite score ≥ 0.6) → language gate (en) → exact dedup (keep
    * smallest doc_id per content fingerprint) → MinHash-LSH clustering →
    * keep each cluster's canonical (smallest) member. Scale shape: two
    * narrow filters fused into the scan, one window shuffle on the
    * content hash, the banded LSH join, the CC funnel, and a final
    * broadcast-able anti-join — nothing quadratic, nothing driver-side.
    */
  def d8DedupPipeline(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions
    val gated = Tables.load(s, dir, "documents")
      .filter(TextFunctions.qualityScore(col("text")) >= 0.6 &&
        TextFunctions.langId(col("text")) === "en")
    // keep-smallest-doc_id per content hash as a min_by hash aggregate:
    // same answer as the rank-1 window (doc_id is unique, so min_by is
    // deterministic) but map-side partial-combined and sort-free — at
    // corpus scale the window's per-partition sort is pure waste when
    // only the minimum survives
    // persisted: the exact-dedup survivors feed BOTH the LSH clustering
    // scan and the final anti-join — without the persist the quality/
    // lang gates and the fingerprint aggregate run twice per action
    val exact = graft.operators.FrameCaches.track(gated
      .groupBy(TextFunctions.fingerprint(col("text")).as("fp"))
      .agg(min_by(struct(col("doc_id"), col("text")), col("doc_id")).as("_keep"))
      .select(col("_keep.doc_id").as("doc_id"), col("_keep.text").as("text"))
      .persist())
    val clustered = Dedup.connectedComponents(
      Dedup.minhashCandidates(exact, "doc_id", "text", N, H, B, Md5Hash))
    exact.join(clustered.filter(col("doc_id") =!= col("cluster_id")),
        Seq("doc_id"), "left_anti")
      .select("doc_id")
      .orderBy("doc_id")
  }

  /** d8 with d10's curation policy composed in: the same gates → exact
    * dedup → LSH+CC pipeline, but each near-dup cluster keeps its
    * HIGHEST-quality member (ties → smallest doc_id) instead of the
    * smallest id — what a real corpus cleanup wants when duplicates
    * differ in quality (truncation, boilerplate). Exact dups have
    * identical text and therefore identical quality, so the exact stage
    * keeps its sort-free `min_by` shape; only the final keeper choice
    * changes: one window per cluster ranks members by quality and the
    * non-keepers are anti-joined away. Same scale shape as d8 plus one
    * cluster-local window — nothing corpus-wide.
    */
  def d8bDedupPipelineQuality(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions
    val gated = Tables.load(s, dir, "documents")
      .filter(TextFunctions.qualityScore(col("text")) >= 0.6 &&
        TextFunctions.langId(col("text")) === "en")
    // persisted: three consumers (LSH scan, quality lookup, anti-join)
    val exact = graft.operators.FrameCaches.track(gated
      .groupBy(TextFunctions.fingerprint(col("text")).as("fp"))
      .agg(min_by(struct(col("doc_id"), col("text")), col("doc_id")).as("_keep"))
      .select(col("_keep.doc_id").as("doc_id"), col("_keep.text").as("text"))
      .persist())
    val clustered = Dedup.connectedComponents(
      Dedup.minhashCandidates(exact, "doc_id", "text", N, H, B, Md5Hash))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster_id")
      .orderBy(col("quality").desc, col("doc_id"))
    // docs never seen in a candidate pair have no cluster row and are
    // kept implicitly by the anti-join against the losers
    val losers = clustered
      .join(exact.select(col("doc_id"),
        TextFunctions.qualityScore(col("text")).as("quality")), "doc_id")
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") > 1)
      .select("doc_id")
    exact.join(losers, Seq("doc_id"), "left_anti")
      .select("doc_id")
      .orderBy("doc_id")
  }

  /** EXACT n-gram Jaccard near-dup pairs at t=0.5 — the non-probabilistic
    * member of the dedup family (MinHash trades exactness for blocking;
    * this trades nothing and relies on AllPairs-style prefix filtering
    * for scale). The oracle is the definitionally-quadratic DuckDB join
    * over identically-hashed shingle sets, so the hash-match proves the
    * prefix index is lossless on real data.
    */
  def d9NgramJaccard(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairs(Tables.load(s, dir, "documents"),
      "doc_id", "text", N, threshold = 0.5, mode = Md5Hash)
      .orderBy("doc_a", "doc_b")

  /** Quality-aware keeper selection: for each MinHash dedup cluster,
    * keep the member with the HIGHEST quality score (ties → smallest
    * doc_id) — the curation policy a real corpus cleanup wants instead
    * of "smallest id wins". Safe to rank on the raw quality double:
    * it is pure per-row arithmetic proven bit-identical cross-engine
    * by t2's unrounded hash-match. One window over clusters (grouped
    * by cluster_id), nothing corpus-wide.
    */
  def d10ClusterKeepers(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions
    val docs = Tables.load(s, dir, "documents")
    val clusters = Dedup.connectedComponents(
      Dedup.minhashCandidates(docs, "doc_id", "text", N, H, B, Md5Hash))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster_id")
      .orderBy(col("quality").desc, col("doc_id"))
    clusters
      .join(docs.select(col("doc_id"),
        TextFunctions.qualityScore(col("text")).as("quality")), "doc_id")
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col("cluster_id"), col("doc_id").as("keep_id"), col("quality"))
      .orderBy("cluster_id")
  }

  /** Incremental cross-corpus dedup: the new "crawl" (odd doc ids)
    * dedupes against the accumulated reference corpus (even ids)
    * without the reference ever self-joining — the shape that keeps
    * recurring-crawl dedup linear in the BATCH at 100 TB (the
    * reference's band keys are compute-once/store-forever state). The
    * deterministic parity split keeps the query scale-proportional at
    * any sf.
    */
  def d11IncrementalDedup(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents")
    Dedup.crossCorpusNearDups(
      d.filter(col("doc_id") % 2 === 1), d.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", N, H, B, threshold = 0.5, Md5Hash)
      .orderBy("batch_id", "ref_id")
  }

  /** Exact-substring dedup at sub-chunk grain ([[graft.operators.Spans
    * .sharedSpans]]) — the Lee-et-al rolling exact-match the aligned
    * 64-token chunk dedup (t14) cannot see: every doc pair sharing ANY
    * exact ≥ 50-token span at ANY alignment, with the pair's maximal
    * span length and span count. 18 / 12 / 141 pairs at the three SFs.
    * The `maxPostingSize = 32` hot-window guard is results-neutral here
    * (max observed posting 4; SpansSpec pins identity + the adversarial
    * bound) and is SPELLED in the oracle so both engines share the same
    * semantics at any corpus shape. Plan-pinned: the corpus never
    * self-joins — only the bounded window-hash frame does.
    */
  def d12SharedSpans(s: SparkSession, dir: String): DataFrame =
    graft.operators.Spans.sharedSpans(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        minSpanTokens = 50, maxPostingSize = 32)
      .orderBy("doc_a", "doc_b")

  /** EXACT n-gram CONTAINMENT pairs at t=0.7 permille-exact — the
    * ASYMMETRIC member of the dedup family (d9's Jaccard misses a
    * short doc quoted inside a long one because the union dilutes;
    * containment |A∩B|/|A| is the quote/truncation/subset detector).
    * Ordered pairs, both directions judged independently. The oracle
    * is the definitionally-quadratic DuckDB join over identically
    * md5-hashed shingle sets with the same integer-permille predicate,
    * so the hash-match proves the asymmetric probe-prefix index is
    * lossless on real data.
    */
  def d13ContainmentPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.containmentPairs(Tables.load(s, dir, "documents"),
      "doc_id", "text", N, thresholdPermille = 700, mode = Md5Hash)
      .orderBy("doc_a", "doc_b")

  /** Standing dedup store as a LIFECYCLE, oracle-checked end to end
    * ([[graft.io.DedupStore]]): crawl 1 = odd doc_ids, crawl 2 = even
    * doc_ids, folded in sequence with the run epoch. Each fold drops
    * batch docs whose exact Jaccard vs the ACCUMULATED store reaches
    * 0.5 (candidates from the banded equi-join only), keeps one doc
    * per within-batch near-dup cluster, and appends the survivors'
    * band rows — d11 is the per-call primitive; this is the
    * maintained-table shape a crawl-N+1 pipeline declares in YAML
    * (`refresh_type: dedup_store`). Output = the accumulated deduped
    * corpus with the epoch each doc folded in.
    */
  def ds1DedupStore(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents").select("doc_id", "text")
    s.sql("CREATE DATABASE IF NOT EXISTS graft_tmp")
    val table = "graft_tmp.ds1_dedup_store"
    s.sql(s"DROP TABLE IF EXISTS $table")
    // a FRESH session's in-memory catalog has no memory of a previous
    // run's managed table, but the warehouse directory survives — and
    // saveAsTable(ErrorIfExists) refuses the leftover location
    val loc = new org.apache.hadoop.fs.Path(
      s"${s.conf.get("spark.sql.warehouse.dir")}/graft_tmp.db/ds1_dedup_store")
    val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    graft.io.DedupStore.maintain(s, table,
      docs.filter(col("doc_id") % 2 === 1), "doc_id", "text",
      N, H, B, jaccardThreshold = 0.5, mode = Md5Hash, epochId = Some(1L))
    graft.io.DedupStore.maintain(s, table,
      docs.filter(col("doc_id") % 2 === 0), "doc_id", "text",
      N, H, B, jaccardThreshold = 0.5, mode = Md5Hash, epochId = Some(2L))
    graft.io.DedupStore.storedDocIds(s, table)
      .select(col("doc_id"), col("_epoch").as("folded_epoch"))
      .orderBy("doc_id")
  }

  /** Store-membership PROBE as a full oracle row — the READ half of
    * the store family on the driver gate ([[graft.io.DedupStore
    * .probeHits]], the engine behind the declarative `store_probe`
    * verb): fold the odd docs into a standing store (ds1's fold-1
    * stage exactly), then probe the even docs WITHOUT folding — each
    * probe row comes back flagged by whether its exact Jaccard vs any
    * stored doc reaches 0.5, candidates from the banded equi-join
    * only. The store provably never advances (it is rebuilt per call,
    * but the probe itself appends nothing — the fold/probe split is
    * the point). The knobs-property handshake is exercised live: the
    * probe declares the store's own md5 fold settings or refuses.
    */
  def sp1StoreProbe(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents").select("doc_id", "text")
    s.sql("CREATE DATABASE IF NOT EXISTS graft_tmp")
    val table = "graft_tmp.sp1_probe_store"
    s.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new org.apache.hadoop.fs.Path(
      s"${s.conf.get("spark.sql.warehouse.dir")}/graft_tmp.db/sp1_probe_store")
    val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    graft.io.DedupStore.maintain(s, table,
      docs.filter(col("doc_id") % 2 === 1), "doc_id", "text",
      N, H, B, jaccardThreshold = 0.5, mode = Md5Hash, epochId = Some(1L))
    val batch = docs.filter(col("doc_id") % 2 === 0)
    val hits = graft.io.DedupStore.probeHits(s, table, batch,
      "doc_id", "text", N, H, B, jaccardThreshold = 0.5, mode = Md5Hash)
    batch.join(hits.withColumn("store_hit", lit(true)), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("store_hit"), lit(false)).as("store_hit"))
      .orderBy("doc_id")
  }

  /** ds1's keeper-policy twin on the TEXT store — the same two-fold
    * lifecycle run under `keeper = max_quality` ([[graft.io.DedupStore
    * .Keepers]], mirroring the vector store's vds2): each within-batch
    * near-dup cluster keeps its HIGHEST-quality member (the d8b/d10
    * curation policy — ties → smallest id) instead of the smallest id,
    * with quality = the t2-proven [[graft.functions.TextFunctions
    * .qualityScore]] computed on the batch before the fold. The policy
    * only changes WHICH duplicate survives — probe, banding, store
    * schema identical — so stored ids + epochs still hash-match the
    * full WITH RECURSIVE re-derivation with the keeper CTE swapped for
    * the quality-ranked window. Discriminates from ds1 wherever a
    * cluster's best member is not its smallest id.
    */
  def ds2KeeperStore(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions
    val docs = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("text"),
        TextFunctions.qualityScore(col("text")).as("quality"))
    s.sql("CREATE DATABASE IF NOT EXISTS graft_tmp")
    val table = "graft_tmp.ds2_keeper_store"
    s.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new org.apache.hadoop.fs.Path(
      s"${s.conf.get("spark.sql.warehouse.dir")}/graft_tmp.db/ds2_keeper_store")
    val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    graft.io.DedupStore.maintain(s, table,
      docs.filter(col("doc_id") % 2 === 1), "doc_id", "text",
      N, H, B, jaccardThreshold = 0.5, mode = Md5Hash, epochId = Some(1L),
      keeper = "max_quality", qualityCol = Some("quality"))
    graft.io.DedupStore.maintain(s, table,
      docs.filter(col("doc_id") % 2 === 0), "doc_id", "text",
      N, H, B, jaccardThreshold = 0.5, mode = Md5Hash, epochId = Some(2L),
      keeper = "max_quality", qualityCol = Some("quality"))
    graft.io.DedupStore.storedDocIds(s, table)
      .select(col("doc_id"), col("_epoch").as("folded_epoch"))
      .orderBy("doc_id")
  }

  /** The hot-bucket cap v17/sp4 measure the recall cost of — matches
    * the media family's spelled cap scale (MdsBucketCap).
    */
  private val TextBucketCap = 8L

  /** Measured RECALL of the banded TEXT store probe — v17's matrix on
    * the text family (round 19; completing the read-path recall
    * symmetry: vector `v17`, text here, media `sp5`). Two
    * approximations stand between a true near-dup and a probe hit:
    * LSH banding (a pair with jaccard >= 0.5 sharing NO band is
    * invisible — the classic MinHash false-negative rate, here
    * 1-(1-J^4)^4 per pair) and the `maxBucketSize` hot-bucket
    * exclusion. Both are now hash-checked numbers: store = sp1's
    * fold-1 (odd docs), probes = the even docs under capped/uncapped
    * banding, truth = exact jaccard >= 0.5 over d9's HASHED distinct
    * shingle sets against EVERY stored doc with banding removed
    * (computed term-at-a-time over the shared-shingle posting join —
    * exact: |A∩B| is Σ-additive over shared hashes, and the bar is
    * the pure-integer 3*isect >= |A|+|B|). Config hits are subsets of the truth (band
    * collision AND string-jaccard >= 0.5, and hash-J >= string-J
    * always — equal strings hash equal, the union can only shrink),
    * so recall_permille is exact integers. Scale
    * shape: the truth side is batch x store-doc BY DEFINITION (the
    * eval bar, run at evaluation scale); the config side is the
    * production banded probe.
    */
  def sp4StoreProbeRecallText(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.load(s, dir, "documents").select("doc_id", "text")
    s.sql("CREATE DATABASE IF NOT EXISTS graft_tmp")
    val table = "graft_tmp.sp4_recall_store"
    s.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new org.apache.hadoop.fs.Path(
      s"${s.conf.get("spark.sql.warehouse.dir")}/graft_tmp.db/sp4_recall_store")
    val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    graft.io.DedupStore.maintain(s, table,
      docs.filter(col("doc_id") % 2 === 1), "doc_id", "text",
      N, H, B, jaccardThreshold = 0.5, mode = Md5Hash, epochId = Some(1L))
    val batch = docs.filter(col("doc_id") % 2 === 0)
    def hitsUnder(cap: Option[Long]): Long =
      graft.io.DedupStore.probeHits(s, table, batch, "doc_id", "text",
        N, H, B, jaccardThreshold = 0.5, maxBucketSize = cap,
        mode = Md5Hash).count()
    // truth: exact jaccard over d9's HASHED distinct shingle sets vs
    // every stored doc — no bands, no cap. Hashed (60-bit md5), not
    // string, sets: hash-J >= string-J (equal strings hash equal; the
    // union can only shrink), so a probe hit (string-J >= 0.5) is
    // STILL always inside the truth — the subset/recall<=1000
    // invariant survives. The 0.5 bar is the pure-integer compare
    // 3*isect >= |A|+|B| (== 2*isect >= union). Computed TERM-AT-A-TIME
    // (guide §3: semi-join the pair space instead of scanning it): the
    // first sp4 spelling length-blocked batch×store and ran
    // array_intersect per surviving pair — ~4M intersects whose answer
    // is 0 for almost every pair (17.4 s engine-side at sf0.1). The
    // intersect count is Σ-additive over shared hashes, so the posting
    // self-join computes exactly |A∩B| for exactly the pairs with
    // |A∩B| >= 1 — and a pair with isect = 0 can only pass the bar
    // when BOTH sets are empty, the one case the index cannot see,
    // handled by the explicit empty-vs-empty branch below (same
    // degenerate pass the length block allowed: 0*2 >= 0).
    val bsh = batch.select(col("doc_id"),
      Dedup.hashedShingles(col("text"), N, Md5Hash).as("_shb"))
      .withColumn("_lb", size(col("_shb")))
    val storeSh = docs
      .join(graft.io.DedupStore.storedDocIds(s, table).select("doc_id"),
        "doc_id")
      .select(col("doc_id").as("_rid"),
        Dedup.hashedShingles(col("text"), N, Md5Hash).as("_shr"))
      .withColumn("_lr", size(col("_shr")))
    val bPost = bsh.select(col("doc_id"), col("_lb"),
      explode(col("_shb")).as("_h"))
    val rPost = storeSh.select(col("_rid"), col("_lr"),
      explode(col("_shr")).as("_h"))
    val nonEmptyHits = bPost.join(rPost, "_h")
      .groupBy("doc_id", "_rid", "_lb", "_lr")
      .agg(count(lit(1)).as("_isect"))
      .filter(col("_isect") * 3 >= col("_lb") + col("_lr"))
      .select("doc_id")
    val emptyHits = bsh.filter(col("_lb") === 0).select("doc_id")
      .crossJoin(broadcast(
        storeSh.filter(col("_lr") === 0).select(lit(1).as("_one")).limit(1)))
      .select("doc_id")
    // truth count and the two config probes are independent pure reads
    // of the folded store, so their three jobs overlap (guide §2.6 —
    // each config still runs the production probeHits path it gates)
    val Seq(trueHits, uncapped, capped) = graft.util.Concurrent.all(Seq(
      () => nonEmptyHits.union(emptyHits).distinct().count(),
      () => hitsUnder(None),
      () => hitsUnder(Some(TextBucketCap))))
    val rows = Seq((false, uncapped), (true, capped)).map { case (c, h) =>
      (c, h, trueHits,
        if (trueHits == 0L) 1000L else h * 1000L / trueHits)
    }
    rows.toDF("capped", "hits", "true_hits", "recall_permille")
      .orderBy("capped")
  }

  val entries: Map[String, Q] = Map(
    "ds1_dedup_store" -> ds1DedupStore _,
    "ds2_keeper_store" -> ds2KeeperStore _,
    "sp1_store_probe" -> sp1StoreProbe _,
    "sp4_store_probe_recall_text" -> sp4StoreProbeRecallText _,
    "d13_containment_pairs" -> d13ContainmentPairs _,
    "d12_shared_spans" -> d12SharedSpans _,
    "d11_incremental_dedup" -> d11IncrementalDedup _,
    "d2_minhash_bands" -> d2MinhashBands _,
    "d3_minhash_pairs" -> d3MinhashPairs _,
    "d4_simhash_chunks" -> d4SimhashChunks _,
    "d5_simhash_candidates" -> d5SimhashCandidates _,
    "d6_dedup_clusters" -> d6DedupClusters _,
    "d7_cluster_signatures" -> d7ClusterSignatures _,
    "d8_dedup_pipeline" -> d8DedupPipeline _,
    "d8b_dedup_quality" -> d8bDedupPipelineQuality _,
    "d9_ngram_jaccard" -> d9NgramJaccard _,
    "d10_cluster_keepers" -> d10ClusterKeepers _,
  )

  // ---- oracle SQL builders (mirror Dedup's expressions in DuckDB) ----

  private val toksSql =
    """list_filter(regexp_split_to_array(trim(text), '\s+'), t -> len(t) > 0)"""

  private val shSql =
    s"""CASE WHEN len($toksSql) >= $N
       | THEN list_distinct(list_transform(generate_series(1, len($toksSql) - ${N - 1}),
       |   i -> array_to_string(($toksSql)[i:i+${N - 1}], ' ')))
       | ELSE [array_to_string($toksSql, ' ')] END""".stripMargin

  // Kirsch-Mitzenmacher: minhash_j = min over shingles of h1 + j*h2,
  // h1/h2 = two 56-bit halves of one md5 (identical to the Spark side)
  private def minhashSql(j: Int, sh: String): String =
    s"""list_min(list_transform($sh, s ->
       | ('0x' || substr(md5(s), 1, 14))::BIGINT
       | + $j * ('0x' || substr(md5(s), 15, 14))::BIGINT))""".stripMargin

  private def bandSql(b: Int, sh: String): String = {
    val parts = (0 until H / B).map(r => minhashSql(b * (H / B) + r, sh))
    s"md5(array_to_string([${parts.mkString(", ")}], ','))"
  }

  private val jaccardSql =
    "len(list_intersect(a.sh, b.sh)) * 1.0 / len(list_distinct(list_concat(a.sh, b.sh)))"

  // minhash_j over precomputed md5 halves: h1[i] + j*h2[i] — the
  // Kirsch-Mitzenmacher family with each shingle hashed ONCE (the
  // inline spelling recomputed md5 32x per shingle: 16 j-values x two
  // halves; at sf0.1 that was ~150-190 s PER minhash oracle)
  private def minhashHalvesSql(j: Int): String =
    s"""list_min(list_transform(generate_series(1, len(h1)),
       | i -> h1[i] + $j * h2[i]))""".stripMargin

  private def bandHalvesSql(b: Int): String = {
    val parts = (0 until H / B).map(r => minhashHalvesSql(b * (H / B) + r))
    s"md5(array_to_string([${parts.mkString(", ")}], ','))"
  }

  private def minhashBaseFrom(src: String): String =
    s"""SELECT doc_id, sh, h1, h2,
       | ${(0 until B).map(b => s"${bandHalvesSql(b)} AS band_$b").mkString(",\n ")}
       |FROM (
       |  SELECT doc_id, sh,
       |    list_transform(sh, s -> ('0x' || substr(md5(s), 1, 14))::BIGINT) AS h1,
       |    list_transform(sh, s -> ('0x' || substr(md5(s), 15, 14))::BIGINT) AS h2
       |  FROM (SELECT doc_id, $shSql AS sh FROM $src))""".stripMargin

  private val minhashBaseCte = minhashBaseFrom("documents")

  // bit i = parity of bit i of the single 60-bit token hash
  private def bitSql(i: Int): String =
    s"""CASE WHEN list_sum(list_transform($toksSql, t ->
       | CASE WHEN ((('0x' || substr(md5(t), 1, 15))::BIGINT >> $i) & 1) = 1
       | THEN 1 ELSE -1 END)) > 0 THEN 1 ELSE 0 END""".stripMargin

  private def chunkSql(c: Int): String =
    (0 until 15).map(r => s"(${bitSql(c * 15 + r)}) * ${1 << r}").mkString(" + ")

  private val simhashBaseCte =
    s"""SELECT doc_id,
       | ${(0 until 4).map(c => s"${chunkSql(c)} AS sim_chunk_$c").mkString(",\n ")}
       |FROM documents""".stripMargin

  // ds1 oracle plumbing: jaccard between two aliased base rows, the
  // any-band collision condition, and the keep-one-per-cluster CTE
  // chain (verified pairs -> symmetric edges -> unrolled label
  // propagation [ClosureSql] -> min-label clusters -> keepers),
  // reused for both folds
  private def jacSql(x: String, y: String): String =
    s"len(list_intersect($x.sh, $y.sh)) * 1.0 / " +
      s"len(list_distinct(list_concat($x.sh, $y.sh)))"

  private def bandOrSql(x: String, y: String): String =
    (0 until B).map(i => s"$x.band_$i = $y.band_$i").mkString("(", " OR ", ")")

  /** The keep-one-per-cluster CTE chain. `qualityCte` names a
    * (doc_id, quality) CTE to swap the min-id keeper for ds2's
    * max_quality policy: rank each cluster's members by quality DESC
    * (ties → smallest id), keep rank 1 — mirroring the Spark window in
    * [[graft.io.DedupStore.maintain]].
    */
  private def keeperCtes(base: String, tag: String,
      qualityCte: Option[String] = None): String = {
    val keeperCte = qualityCte match {
      case Some(q) =>
        s"""k$tag AS (
           |  SELECT doc_id FROM $base WHERE doc_id NOT IN (
           |    SELECT doc_id FROM (
           |      SELECT c.doc_id,
           |        ROW_NUMBER() OVER (PARTITION BY c.cluster_id
           |          ORDER BY q.quality DESC, c.doc_id) AS rn
           |      FROM c$tag c JOIN $q q USING (doc_id))
           |    WHERE rn <> 1))""".stripMargin
      case None =>
        s"""k$tag AS (
           |  SELECT doc_id FROM $base WHERE doc_id NOT IN
           |    (SELECT doc_id FROM c$tag WHERE cluster_id <> doc_id))"""
          .stripMargin
    }
    s"""p$tag AS MATERIALIZED (
       |  SELECT x.doc_id AS da, y.doc_id AS db
       |  FROM $base x JOIN $base y ON x.doc_id < y.doc_id
       |    AND ${bandOrSql("x", "y")}
       |  WHERE ${jacSql("x", "y")} >= 0.5),
       |e$tag AS MATERIALIZED (
       |  SELECT da AS src, db AS dst FROM p$tag
       |  UNION SELECT db, da FROM p$tag),
       |${ClosureSql.lpCtes(s"e$tag", s"l$tag")},
       |c$tag AS (
       |  ${ClosureSql.componentsSql(s"l$tag", "doc_id", "cluster_id")}),
       |$keeperCte""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "ds1_dedup_store" ->
      s"""WITH
         |a AS (${minhashBaseFrom(
             "(SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1)")}),
         |${keeperCtes("a", "1")},
         |s1 AS (SELECT a.* FROM a JOIN k1 USING (doc_id)),
         |b AS (${minhashBaseFrom(
             "(SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0)")}),
         |hits AS (
         |  SELECT DISTINCT b.doc_id FROM b JOIN s1 ON ${bandOrSql("b", "s1")}
         |  WHERE ${jacSql("b", "s1")} >= 0.5),
         |f2 AS (SELECT * FROM b WHERE doc_id NOT IN (SELECT doc_id FROM hits)),
         |${keeperCtes("f2", "2")}
         |SELECT doc_id, CAST(1 AS BIGINT) AS folded_epoch FROM k1
         |UNION ALL
         |SELECT doc_id, CAST(2 AS BIGINT) AS folded_epoch FROM k2
         |ORDER BY doc_id""".stripMargin,
    // ds1's lifecycle verbatim with the keeper CTEs swapped for the
    // max_quality window (quality = t2's proven qualitySql, ranked
    // DESC with doc_id tiebreak) — the d8b/d10 curation policy on the
    // maintained store
    "ds2_keeper_store" ->
      s"""WITH
         |q AS (SELECT doc_id, ${TextQueries.qualitySql} AS quality
         |      FROM documents),
         |a AS (${minhashBaseFrom(
             "(SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1)")}),
         |${keeperCtes("a", "1", qualityCte = Some("q"))},
         |s1 AS (SELECT a.* FROM a JOIN k1 USING (doc_id)),
         |b AS (${minhashBaseFrom(
             "(SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0)")}),
         |hits AS (
         |  SELECT DISTINCT b.doc_id FROM b JOIN s1 ON ${bandOrSql("b", "s1")}
         |  WHERE ${jacSql("b", "s1")} >= 0.5),
         |f2 AS (SELECT * FROM b WHERE doc_id NOT IN (SELECT doc_id FROM hits)),
         |${keeperCtes("f2", "2", qualityCte = Some("q"))}
         |SELECT doc_id, CAST(1 AS BIGINT) AS folded_epoch FROM k1
         |UNION ALL
         |SELECT doc_id, CAST(2 AS BIGINT) AS folded_epoch FROM k2
         |ORDER BY doc_id""".stripMargin,
    // ds1's fold-1 CTE chain verbatim (odd docs -> keepers = the
    // standing store), then the probe: every EVEN doc flagged by the
    // banded-candidate + exact-Jaccard membership test — the read
    // path re-derived stage for stage
    "sp1_store_probe" ->
      s"""WITH
         |a AS (${minhashBaseFrom(
             "(SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1)")}),
         |${keeperCtes("a", "1")},
         |s1 AS (SELECT a.* FROM a JOIN k1 USING (doc_id)),
         |b AS (${minhashBaseFrom(
             "(SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0)")}),
         |hits AS (
         |  SELECT DISTINCT b.doc_id FROM b JOIN s1 ON ${bandOrSql("b", "s1")}
         |  WHERE ${jacSql("b", "s1")} >= 0.5)
         |SELECT doc_id,
         |  doc_id IN (SELECT doc_id FROM hits) AS store_hit
         |FROM b ORDER BY doc_id""".stripMargin,
    // sp1's fold-1 store, then the recall matrix. Banded hits: ONE
    // scan over band COLLISIONS only (string jaccard, intersect once,
    // union by size arithmetic — the sh lists are distinct so
    // |A|+|B|-isect equals len(list_distinct(list_concat)) with none
    // of its allocation), cold-band flag per pair. Truth: d9's HASHED
    // distinct shingle sets, length-blocked, pure-integer bar
    // 3*isect >= |A|+|B| — BIGINT intersects price ~10x under string
    // ones at the truth's quadratic mass (the string spelling cost
    // 527 s at sf0.1). Hot buckets = store-side (band_idx, band_key)
    // occupancy over the cap, exactly DedupStore.storeHits' exclusion
    "sp4_store_probe_recall_text" ->
      s"""WITH
         |a AS MATERIALIZED (${minhashBaseFrom(
             "(SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1)")}),
         |${keeperCtes("a", "1")},
         |s1 AS MATERIALIZED (SELECT a.* FROM a JOIN k1 USING (doc_id)),
         |b AS MATERIALIZED (${minhashBaseFrom(
             "(SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0)")}),
         |hotb AS MATERIALIZED (
         |  ${(0 until B).map(i =>
               s"SELECT $i AS bi, band_$i AS bk FROM s1 GROUP BY 2 " +
                 s"HAVING COUNT(*) > $TextBucketCap")
               .mkString("\n  UNION ALL ")}),
         |bpairs AS MATERIALIZED (
         |  SELECT doc_id, isect * 1.0 / (lb + ls - isect) AS jac, cold_any
         |  FROM (
         |    SELECT b.doc_id, len(list_intersect(b.sh, s1.sh)) AS isect,
         |      len(b.sh) AS lb, len(s1.sh) AS ls,
         |      (${(0 until B).map(i =>
               s"(b.band_$i = s1.band_$i AND NOT EXISTS (SELECT 1 " +
                 s"FROM hotb h WHERE h.bi = $i AND h.bk = s1.band_$i))")
               .mkString("\n       OR ")}) AS cold_any
         |    FROM b JOIN s1 ON ${bandOrSql("b", "s1")})),
         |hb AS MATERIALIZED (
         |  SELECT doc_id, list_distinct(list_transform($shSql,
         |    x -> ('0x' || substr(md5(x), 1, 15))::BIGINT)) AS hsh
         |  FROM documents WHERE doc_id % 2 = 0),
         |hs AS MATERIALIZED (
         |  SELECT list_distinct(list_transform($shSql,
         |    x -> ('0x' || substr(md5(x), 1, 15))::BIGINT)) AS hsh
         |  FROM documents d JOIN k1 USING (doc_id)),
         |truth AS (
         |  SELECT DISTINCT doc_id FROM (
         |    SELECT hb.doc_id, len(list_intersect(hb.hsh, hs.hsh)) AS isect,
         |      len(hb.hsh) AS lb, len(hs.hsh) AS ls
         |    FROM hb JOIN hs
         |      ON len(hb.hsh) * 2 >= len(hs.hsh)
         |      AND len(hs.hsh) * 2 >= len(hb.hsh))
         |  WHERE isect * 3 >= lb + ls),
         |t AS (SELECT COUNT(*) AS th FROM truth)
         |SELECT capped, hits, true_hits,
         |  CAST(CASE WHEN true_hits = 0 THEN 1000
         |    ELSE hits * 1000 // true_hits END AS BIGINT) AS recall_permille
         |FROM (
         |  SELECT FALSE AS capped,
         |    CAST((SELECT COUNT(DISTINCT doc_id) FROM bpairs
         |          WHERE jac >= 0.5) AS BIGINT) AS hits,
         |    CAST(t.th AS BIGINT) AS true_hits FROM t
         |  UNION ALL
         |  SELECT TRUE,
         |    CAST((SELECT COUNT(DISTINCT doc_id) FROM bpairs
         |          WHERE jac >= 0.5 AND COALESCE(cold_any, FALSE))
         |      AS BIGINT),
         |    CAST(t.th AS BIGINT) FROM t)
         |ORDER BY capped""".stripMargin,
    // the sorted hash-run derivation verbatim: 50-token rolling windows
    // (md5 of the space-joined slice), the posting cap, the equi join,
    // diagonal islands via pos - row_number, span = run + 49
    "d12_shared_spans" ->
      s"""WITH base AS (
         |  SELECT doc_id, $toksSql AS toks FROM documents
         |  WHERE text IS NOT NULL),
         |b2 AS (
         |  SELECT doc_id, toks, len(toks) AS n FROM base
         |  WHERE len(toks) >= 50),
         |win AS (
         |  SELECT doc_id, g.i AS pos,
         |    md5(array_to_string(toks[g.i:(g.i + 49)], ' ')) AS h
         |  FROM b2, LATERAL (SELECT unnest(generate_series(1, n - 49)) AS i) g),
         |hot AS (
         |  SELECT h FROM win GROUP BY h HAVING COUNT(*) > 32),
         |kept AS (
         |  SELECT * FROM win WHERE h NOT IN (SELECT h FROM hot)),
         |m AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    a.pos AS pos_a, b.pos AS pos_b
         |  FROM kept a JOIN kept b
         |    ON a.h = b.h AND a.doc_id < b.doc_id),
         |r AS (
         |  SELECT doc_a, doc_b, pos_a - pos_b AS diag, pos_a,
         |    pos_a - ROW_NUMBER() OVER (
         |      PARTITION BY doc_a, doc_b, pos_a - pos_b ORDER BY pos_a) AS isl
         |  FROM m),
         |sp AS (
         |  SELECT doc_a, doc_b, diag, isl, COUNT(*) + 49 AS span_tokens
         |  FROM r GROUP BY doc_a, doc_b, diag, isl)
         |SELECT doc_a, doc_b, COUNT(*) AS n_spans,
         |  CAST(MAX(span_tokens) AS BIGINT) AS max_span_tokens
         |FROM sp GROUP BY doc_a, doc_b ORDER BY doc_a, doc_b""".stripMargin,
    "d11_incremental_dedup" ->
      s"""WITH a AS (${minhashBaseFrom(
             "(SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1)")}),
         |b AS (${minhashBaseFrom(
             "(SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0)")})
         |SELECT batch_id, ref_id, jaccard FROM (
         |  SELECT a.doc_id AS batch_id, b.doc_id AS ref_id,
         |    $jaccardSql AS jaccard
         |  FROM a JOIN b ON
         |   (a.band_0 = b.band_0 OR a.band_1 = b.band_1
         |    OR a.band_2 = b.band_2 OR a.band_3 = b.band_3))
         |WHERE jaccard >= 0.5
         |ORDER BY batch_id, ref_id""".stripMargin,
    "d2_minhash_bands" ->
      s"""SELECT doc_id, band_0, band_1, band_2, band_3
         |FROM ($minhashBaseCte) ORDER BY doc_id""".stripMargin,
    "d3_minhash_pairs" ->
      s"""WITH base AS ($minhashBaseCte)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, $jaccardSql AS jaccard
         |FROM base a JOIN base b ON a.doc_id < b.doc_id AND
         | (a.band_0 = b.band_0 OR a.band_1 = b.band_1
         |  OR a.band_2 = b.band_2 OR a.band_3 = b.band_3)
         |ORDER BY doc_a, doc_b""".stripMargin,
    "d6_dedup_clusters" ->
      s"""WITH base AS ($minhashBaseCte),
         |cpairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM base a JOIN base b ON a.doc_id < b.doc_id AND
         |   (a.band_0 = b.band_0 OR a.band_1 = b.band_1
         |    OR a.band_2 = b.band_2 OR a.band_3 = b.band_3)),
         |edges AS MATERIALIZED (
         |  SELECT doc_a AS src, doc_b AS dst FROM cpairs
         |  UNION SELECT doc_b, doc_a FROM cpairs),
         |${ClosureSql.lpCtes("edges", "lp")}
         |${ClosureSql.componentsSql("lp", "doc_id", "cluster_id")}
         |ORDER BY doc_id""".stripMargin,
    "d7_cluster_signatures" ->
      s"""WITH base AS ($minhashBaseCte),
         |cpairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM base a JOIN base b ON a.doc_id < b.doc_id AND
         |   (a.band_0 = b.band_0 OR a.band_1 = b.band_1
         |    OR a.band_2 = b.band_2 OR a.band_3 = b.band_3)),
         |edges AS MATERIALIZED (
         |  SELECT doc_a AS src, doc_b AS dst FROM cpairs
         |  UNION SELECT doc_b, doc_a FROM cpairs),
         |${ClosureSql.lpCtes("edges", "lp")},
         |clusters AS (
         |  ${ClosureSql.componentsSql("lp", "doc_id", "cluster_id")}),
         |sigs AS (
         |  SELECT doc_id,
         |  ${(0 until H).map(j => s"${minhashHalvesSql(j)} AS mh_$j").mkString(",\n  ")}
         |  FROM base)
         |SELECT c.cluster_id,
         | ${(0 until H).map(j => s"MIN(s.mh_$j) AS sig_$j").mkString(",\n ")}
         |FROM clusters c JOIN sigs s USING (doc_id)
         |GROUP BY c.cluster_id ORDER BY cluster_id""".stripMargin,
    "d10_cluster_keepers" ->
      s"""WITH base AS ($minhashBaseCte),
         |cpairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM base a JOIN base b ON a.doc_id < b.doc_id AND
         |   (a.band_0 = b.band_0 OR a.band_1 = b.band_1
         |    OR a.band_2 = b.band_2 OR a.band_3 = b.band_3)),
         |edges AS MATERIALIZED (
         |  SELECT doc_a AS src, doc_b AS dst FROM cpairs
         |  UNION SELECT doc_b, doc_a FROM cpairs),
         |${ClosureSql.lpCtes("edges", "lp")},
         |clusters AS (
         |  ${ClosureSql.componentsSql("lp", "doc_id", "cluster_id")}),
         |q AS (SELECT doc_id, ${TextQueries.qualitySql} AS quality
         |      FROM documents),
         |ranked AS (
         |  SELECT c.cluster_id, c.doc_id, q.quality,
         |    ROW_NUMBER() OVER (PARTITION BY c.cluster_id
         |      ORDER BY q.quality DESC, c.doc_id) AS rn
         |  FROM clusters c JOIN q USING (doc_id))
         |SELECT cluster_id, doc_id AS keep_id, quality
         |FROM ranked WHERE rn = 1 ORDER BY cluster_id""".stripMargin,
    "d8_dedup_pipeline" ->
      s"""WITH gated AS (
         |  SELECT doc_id, text FROM documents
         |  WHERE (${TextQueries.qualitySql}) >= 0.6
         |    AND (${TextQueries.langCaseSql}) = 'en'),
         |ex AS (
         |  SELECT doc_id, text FROM (
         |    SELECT doc_id, text, ROW_NUMBER() OVER (
         |      PARTITION BY ${TextQueries.fpSql} ORDER BY doc_id) AS rn
         |    FROM gated) WHERE rn = 1),
         |base AS (${minhashBaseFrom("ex")}),
         |cpairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM base a JOIN base b ON a.doc_id < b.doc_id AND
         |   (a.band_0 = b.band_0 OR a.band_1 = b.band_1
         |    OR a.band_2 = b.band_2 OR a.band_3 = b.band_3)),
         |edges AS MATERIALIZED (
         |  SELECT doc_a AS src, doc_b AS dst FROM cpairs
         |  UNION SELECT doc_b, doc_a FROM cpairs),
         |${ClosureSql.lpCtes("edges", "lp")},
         |clusters AS (
         |  ${ClosureSql.componentsSql("lp", "doc_id", "cluster_id")})
         |SELECT e.doc_id FROM ex e
         |WHERE e.doc_id NOT IN
         |  (SELECT doc_id FROM clusters WHERE doc_id <> cluster_id)
         |ORDER BY doc_id""".stripMargin,
    "d8b_dedup_quality" ->
      s"""WITH gated AS (
         |  SELECT doc_id, text FROM documents
         |  WHERE (${TextQueries.qualitySql}) >= 0.6
         |    AND (${TextQueries.langCaseSql}) = 'en'),
         |ex AS (
         |  SELECT doc_id, text FROM (
         |    SELECT doc_id, text, ROW_NUMBER() OVER (
         |      PARTITION BY ${TextQueries.fpSql} ORDER BY doc_id) AS rn
         |    FROM gated) WHERE rn = 1),
         |base AS (${minhashBaseFrom("ex")}),
         |cpairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM base a JOIN base b ON a.doc_id < b.doc_id AND
         |   (a.band_0 = b.band_0 OR a.band_1 = b.band_1
         |    OR a.band_2 = b.band_2 OR a.band_3 = b.band_3)),
         |edges AS MATERIALIZED (
         |  SELECT doc_a AS src, doc_b AS dst FROM cpairs
         |  UNION SELECT doc_b, doc_a FROM cpairs),
         |${ClosureSql.lpCtes("edges", "lp")},
         |clusters AS (
         |  ${ClosureSql.componentsSql("lp", "doc_id", "cluster_id")}),
         |q AS (SELECT doc_id, ${TextQueries.qualitySql} AS quality FROM ex),
         |ranked AS (
         |  SELECT c.doc_id,
         |    ROW_NUMBER() OVER (PARTITION BY c.cluster_id
         |      ORDER BY q.quality DESC, c.doc_id) AS rn
         |  FROM clusters c JOIN q USING (doc_id))
         |SELECT e.doc_id FROM ex e
         |WHERE e.doc_id NOT IN (SELECT doc_id FROM ranked WHERE rn > 1)
         |ORDER BY doc_id""".stripMargin,
    // quadratic by definition like d9; the containment predicate and
    // score are INTEGER permille (i*1000 >= 700*|A|, (1000*i) // |A|)
    // so no epsilon is needed anywhere; len(b) >= ceil(0.7*|A|) is the
    // ASYMMETRIC length filter (containment divides by |A| only, so
    // only B's size is bounded below) spelled with the same +999 DIV
    // trick
    // the pair intersection computes ONCE in an inner projection (the
    // SELECT+WHERE twin spelling paid it twice over the pair mass)
    "d13_containment_pairs" ->
      s"""WITH s AS MATERIALIZED (
         |  SELECT doc_id, list_distinct(list_transform($shSql,
         |  x -> ('0x' || substr(md5(x), 1, 15))::BIGINT)) AS sh FROM documents)
         |SELECT doc_a, doc_b, (1000 * isect) // sz_a AS containment_permille,
         |  sz_a, sz_b FROM (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    len(list_intersect(a.sh, b.sh)) AS isect,
         |    len(a.sh) AS sz_a, len(b.sh) AS sz_b
         |  FROM s a JOIN s b ON a.doc_id <> b.doc_id
         |   AND len(b.sh) >= (700 * len(a.sh) + 999) // 1000)
         |WHERE isect * 1000 >= 700 * sz_a
         |ORDER BY doc_a, doc_b""".stripMargin,
    // definitionally quadratic (the point: the Spark side must NOT be);
    // shingle sets hashed exactly like the Spark side (60-bit md5
    // slice), and the length filter (J >= t forces t*|b| <= |a| when
    // |a| <= |b|) is exact and keeps the 500x500 oracle join cheap
    // the pair jaccard computes ONCE in an inner projection (the
    // SELECT+WHERE twin spelling paid the list_intersect twice over
    // the quadratic pair mass)
    "d9_ngram_jaccard" ->
      s"""WITH s AS MATERIALIZED (
         |  SELECT doc_id, list_distinct(list_transform($shSql,
         |  x -> ('0x' || substr(md5(x), 1, 15))::BIGINT)) AS sh FROM documents)
         |SELECT doc_a, doc_b, jaccard FROM (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, $jaccardSql AS jaccard
         |  FROM s a JOIN s b ON a.doc_id < b.doc_id
         |   AND len(a.sh) >= 0.5 * len(b.sh) AND len(b.sh) >= 0.5 * len(a.sh))
         |WHERE jaccard >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin,
    "d4_simhash_chunks" ->
      s"""SELECT doc_id, sim_chunk_0, sim_chunk_1, sim_chunk_2, sim_chunk_3
         |FROM ($simhashBaseCte) ORDER BY doc_id""".stripMargin,
    "d5_simhash_candidates" ->
      s"""WITH base AS ($simhashBaseCte)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |FROM base a JOIN base b ON a.doc_id < b.doc_id AND
         | (a.sim_chunk_0 = b.sim_chunk_0 OR a.sim_chunk_1 = b.sim_chunk_1
         |  OR a.sim_chunk_2 = b.sim_chunk_2 OR a.sim_chunk_3 = b.sim_chunk_3)
         |ORDER BY doc_a, doc_b""".stripMargin,
  )
}
