package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions._

/** Text-analysis + exact-dedup operators over the `documents` table —
  * the training-data-pipeline surface (token counting, quality scoring,
  * language ID, fingerprinting, exact dedup), all oracle-checked.
  *
  * Scale: every query is scan → narrow projection (no shuffle except
  * the dedup groupBy, which map-side combines on the md5 key).
  */
object TextQueries extends QuerySet {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  def t1TokenStats(s: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    docs(s, dir).select(
      col("doc_id"),
      tokenCount(col("text")).as("n_tokens"),
      bpeishTokenCount(col("text")).as("n_bpeish_tokens"),
      (aggregate(transform(toks, t => length(t)), lit(0), (a, x) => a + x)
        / size(toks)).as("avg_word_len"))
      .orderBy("doc_id")
  }

  def t2Quality(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      col("doc_id"),
      alphaRatio(col("text")).as("alpha_ratio"),
      digitRatio(col("text")).as("digit_ratio"),
      stopwordRatio(col("text")).as("stop_ratio"),
      qualityScore(col("text")).as("quality"))
      .orderBy("doc_id")

  def t3LangId(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"), langId(col("text")).as("lang_pred"))
      .orderBy("doc_id")

  def t4Fingerprint(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"), fingerprint(col("text")).as("fp"))
      .orderBy("doc_id")

  /** Exact dedup: hash-groupBy on the normalized-content fingerprint,
    * keep the smallest doc_id per group. At 100 TB this is the standard
    * one-shuffle dedup (map-side partial agg on md5 keys).
    */
  def d1DedupExact(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .groupBy(fingerprint(col("text")).as("fp"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy("fp")

  /** Winnowing (rolling k-gram hash) fingerprints, one row per selected
    * hash — the structural near-dup fingerprint alongside t4's exact
    * content hash.
    */
  def t5Winnow(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .filter(col("text").isNotNull) // null-text handling differs from SQL
      .select(col("doc_id"),
        explode(graft.functions.TextExpressions
          .winnowFingerprints(col("text"), 8, 4)).as("fp"))
      .orderBy("doc_id", "fp")

  /** Benchmark decontamination check: flag corpus docs sharing any word
    * 5-gram with a probe set (here the fifty lowest-id docs stand in
    * for an eval benchmark). 100 TB shape: the probe n-gram set is tiny
    * and BROADCAST; the corpus side is one scan with a map-side shingle
    * explode and a broadcast join — contamination scoring never
    * shuffles the corpus. n-gram identity uses the same 60-bit md5
    * hash family as the dedup operators, so the oracle re-derives it.
    */
  def t6Contamination(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Curation, Dedup}
    val d = docs(s, dir).select(col("doc_id"), col("text"))
    Curation.contaminationScores(
        d.filter(col("doc_id") >= 50), d.filter(col("doc_id") < 50),
        "doc_id", "text", 5, Dedup.Md5Hash)
      .orderBy("doc_id")
  }

  /** End-to-end decontamination — t6's score turned into the ACTION a
    * pipeline takes: drop every corpus doc sharing ANY word 5-gram
    * with the probe set (zero-tolerance, the common eval-hygiene
    * policy) and emit the surviving doc ids. Scale shape: the flagged
    * set is at most the corpus row count and typically tiny, so the
    * final anti-join broadcasts it against the corpus scan — the
    * corpus itself still never shuffles.
    */
  def t15Decontaminated(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Curation, Dedup}
    val d = docs(s, dir).select(col("doc_id"), col("text"))
    val flagged = Curation.contaminationScores(
        d.filter(col("doc_id") >= 50), d.filter(col("doc_id") < 50),
        "doc_id", "text", 5, Dedup.Md5Hash)
      .select("doc_id")
    d.filter(col("doc_id") >= 50)
      .join(flagged, Seq("doc_id"), "left_anti")
      .select(col("doc_id"))
      .orderBy("doc_id")
  }

  /** Deterministic stratified sampling — the training-mix primitive:
    * downsample each language stratum at its own rate with a
    * HASH-derived keep decision (md5(doc_id) mod 1000 < rate·1000), so
    * the sample is reproducible run-to-run and engine-to-engine — no
    * RNG, no seed plumbing, fully oracle-checkable. Pure map work fused
    * into the scan: at 100 TB sampling is free (no shuffle, no state);
    * rates here downweight English 2× and keep other strata whole.
    */
  def t7SampleMix(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Curation, Dedup}
    Curation.stratifiedSample(
        docs(s, dir).select(col("doc_id"), langId(col("text")).as("lang")),
        col("lang"), col("doc_id"), Map("en" -> 0.5), 1.0, Dedup.Md5Hash)
      .select("doc_id", "lang")
      .orderBy("doc_id")
  }

  /** Within-doc repetition ratio — the Gopher-family quality signal:
    * 1 − distinct-trigrams / trigram-positions. Repetitive docs
    * (boilerplate, template spam, generation loops) score high and get
    * filtered before training. Map-only work (the same native shingle
    * expression the dedup family uses), scan-fused, no shuffle.
    */
  def t8Repetition(s: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    val sh = graft.operators.Dedup.shingles(col("text"), 3)
    docs(s, dir).select(col("doc_id"),
        when(size(toks) >= 3,
          round(lit(1.0) - size(sh).cast("double") / (size(toks) - 2), 6))
          .otherwise(0.0).as("rep_ratio"))
      .orderBy("doc_id")
  }

  /** Offset-based sequence packing — the concat-and-chunk shape that
    * turns documents into fixed-token-budget training sequences: within
    * each source shard, docs concatenate in doc_id order and each doc
    * is assigned the sequence where its first token lands (budget 2048
    * tokens). One window per SHARD (partitioned, never a global
    * single-task sort), cumulative token sum, pure arithmetic after —
    * at 100 TB packing parallelizes across shards.
    */
  def t9SeqPacking(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
    docs(s, dir)
      .select(col("doc_id"), col("source"),
        tokenCount(col("text")).as("n_tok"))
      .withColumn("_start", sum("n_tok").over(w) - col("n_tok"))
      .select(col("doc_id"), col("source"),
        floor(col("_start") / 2048).as("seq_id"),
        (col("_start") % 2048).as("seq_offset"))
      .orderBy("doc_id")
  }

  /** Text normalization + stopword removal — the canonical pre-tokenizer
    * cleanup pass: lowercase, strip non-alphanumerics, collapse runs of
    * whitespace, then drop English stopwords from the token stream.
    * Emits the normalized text, its token count, and the content-token
    * count (stopwords removed) — pure scan-fused map work, no shuffle.
    */
  def t10Normalize(s: SparkSession, dir: String): DataFrame = {
    val norm = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " "))
    val toks = tokens(norm)
    val stop = langStopwords.head._2
    val content = filter(toks, t => !t.isin(stop: _*))
    // NULL-text guard on BOTH sides (tw2 precedent): Spark's size(NULL)
    // is -1 where DuckDB len(NULL) is NULL — exclude rather than diverge
    docs(s, dir).filter(col("text").isNotNull)
      .select(col("doc_id"), norm.as("norm_text"),
        size(toks).as("n_tokens"), size(content).as("n_content_tokens"))
      .orderBy("doc_id")
  }

  /** Gopher-style document quality GATE (Rae et al. 2021 §A1.1) — the
    * filtering counterpart to t2's scoring: per-doc word count, mean
    * word length, alphabetic-word ratio, and stopword hits, each
    * compared against the published bounds, plus the conjunction
    * `keep`. Emitted as flags rather than a filter so the report shows
    * WHY a document failed — the shape a curation dashboard wants. All
    * per-row arithmetic (one IEEE division per ratio), scan-fused, no
    * shuffle.
    */
  def t11GopherGate(s: SparkSession, dir: String): DataFrame = {
    val toks = tokens(col("text"))
    val nWords = size(toks).cast("long")
    val meanLen = aggregate(toks, lit(0L), (acc, t) => acc + length(t))
      .cast("double") / nWords
    val alphaRatio = size(filter(toks, t => t.rlike("[A-Za-z]")))
      .cast("double") / nWords
    val stopHits = graft.functions.TextFunctions
      .stopwordHits(tokens(lower(col("text"))), langStopwords.head._2)
      .cast("long")
    // same NULL-text guard as t10 — size/len semantics diverge on NULL
    docs(s, dir).filter(col("text").isNotNull)
      .select(col("doc_id"), nWords.as("n_words"),
        meanLen.as("mean_word_len"), alphaRatio.as("alpha_ratio"),
        stopHits.as("n_stop_hits"),
        (nWords.between(50, 100000) && meanLen.between(3.0, 10.0) &&
          alphaRatio >= 0.8 && stopHits >= 2).as("keep"))
      .orderBy("doc_id")
  }

  private val ChunkLen = 64   // tokens per training chunk
  private val ChunkStride = 48 // overlap = ChunkLen - ChunkStride = 16

  /** Sliding-window document chunking — the context-window splitter
    * that turns long documents into fixed-size training chunks with a
    * 16-token overlap (chunk i covers tokens [i·48+1, i·48+64]; a doc
    * of ≤64 tokens is one chunk; the last chunk may run short). Emits
    * one row per chunk with its token count and an md5 content hash, so
    * downstream chunk-level dedup can run on the hash alone. Pure
    * scan-fused map work — the explode multiplies rows ~len/48× but
    * never shuffles; at 100 TB chunking rides the scan for free.
    * Chunk-count arithmetic stays in positive integers (`(n-17) DIV
    * 48`) so Spark's truncating DIV and DuckDB's flooring `//` agree.
    */
  def t12Chunking(s: SparkSession, dir: String): DataFrame =
    chunkHashFrame(s, dir)
      .select("doc_id", "chunk_id", "n_chunk_tokens", "chunk_hash")
      .orderBy("doc_id", "chunk_id")

  /** Shared sliding-window chunk frame — ONE row per (doc, chunk) with
    * the md5 content hash, the grain t12 / t14 / g6 all operate on:
    * 64-token windows at stride 48, scan-fused explode, no shuffle.
    * Carries `source` so the cross-source overlap report (g6) can
    * group by it; single-column consumers prune it at the scan.
    */
  private[queries] def chunkHashFrame(s: SparkSession, dir: String): DataFrame =
    graft.operators.Chunking.slidingChunks(docs(s, dir), "doc_id", "text",
      ChunkLen, ChunkStride, carryCols = Seq("source"))

  /** Chunk-level exact dedup — d1's shape at t12's granularity (the
    * dedup unit modern pipelines actually train on): group the sliding
    * 64-token chunks by content hash, keep the lowest (doc_id,
    * chunk_id) as the canonical copy, and report the copy count per
    * distinct chunk. The keeper argmin is `min(struct(doc_id,
    * chunk_id))` — lexicographic struct ordering, identical in Spark
    * and DuckDB — so it is overflow-free at ANY doc_id/chunk_id range
    * (the previous `doc_id·100000 + chunk_id` integer encoding silently
    * corrupted the keeper once a doc exceeded ~4.8M tokens). One
    * map-side-combined shuffle on the hash — the same 100 TB cost as
    * d1, paid at chunk grain.
    */
  def t14ChunkDedup(s: SparkSession, dir: String): DataFrame =
    chunkHashFrame(s, dir)
      .groupBy("chunk_hash")
      .agg(min(struct(col("doc_id"), col("chunk_id"))).as("_k"),
        count(lit(1)).as("n_copies"))
      .select(col("chunk_hash"),
        col("_k.doc_id").as("keep_doc"),
        col("_k.chunk_id").as("keep_chunk"),
        col("n_copies"))
      .orderBy("chunk_hash")

  /** PII redaction as a full oracle row ([[graft.operators.Curation
    * .redactPii]]): the raw corpus contains no PII, so a vacuous scrub
    * over it would verify nothing — instead each doc gets a
    * deterministic md5(doc_id)-derived email / SSN / IPv4 / phone
    * APPENDED (the repo's standard plant-then-verify determinism
    * playbook, cf. v12's planted duplicates), guaranteeing ≥4
    * redactions per doc. The result pins the redacted TEXT (via its
    * md5) and the per-pattern replacement counts — the ordered-fold
    * once-only counting (an SSN burned by its own pattern must not be
    * recounted by the looser phone pattern behind it) is exactly what
    * the staged DuckDB CTE chain re-derives. Pure scan-fused map work;
    * no shuffle anywhere.
    */
  def t16PiiRedaction(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Curation
    val h = md5(col("doc_id").cast("string"))
    def hx(pos: Int, len: Int) =
      graft.functions.VectorExpressions.hexSliceToLong(h, pos, len)
    val email = concat(lit("user"), substring(h, 1, 6), lit("@example.com"))
    val ssn = concat((hx(7, 2) % 900 + 100).cast("string"), lit("-"),
      (hx(9, 2) % 90 + 10).cast("string"), lit("-"),
      (hx(11, 3) % 9000 + 1000).cast("string"))
    val ip = concat_ws(".", (hx(14, 2) % 256).cast("string"),
      (hx(16, 2) % 256).cast("string"), (hx(18, 2) % 256).cast("string"),
      (hx(20, 2) % 256).cast("string"))
    val phone = concat(lit("+1-"), (hx(22, 2) % 800 + 200).cast("string"),
      lit("-"), (hx(24, 2) % 800 + 200).cast("string"), lit("-"),
      (hx(26, 3) % 9000 + 1000).cast("string"))
    val planted = docs(s, dir).filter(col("text").isNotNull)
      .select(col("doc_id"),
        concat(col("text"), lit(" Contact "), email, lit(" or "), phone,
          lit(" (ssn "), ssn, lit(", last login from "), ip, lit(")"))
          .as("text"))
    Curation.redactPii(planted, "text",
        countCols = Seq("n_email", "n_ssn", "n_ip", "n_phone"))
      .select(col("doc_id"), col("n_email"), col("n_ssn"), col("n_ip"),
        col("n_phone"), col("_pii_redactions").as("n_redactions"),
        md5(col("text").cast("binary")).as("redacted_hash"))
      .orderBy("doc_id")
  }

  /** Leakage-free train/val/test split ([[graft.operators.Curation
    * .assignSplit]]): documents sharing ANY 64-token chunk form a
    * duplicate-content component (chunk-hash equi-join →
    * [[graft.operators.Dedup.connectedComponents]]), and the component
    * — not the document — is the split key, so near-identical content
    * can never straddle train and test (the eval-contamination bug a
    * doc-id-keyed split commits; CurationSpec plants that corpus and
    * shows the difference). Reports per-split doc / group counts and
    * how many docs sit in multi-doc groups — non-vacuous at every SF
    * (24 / 13 multi-group docs at sf0.001 / sf0.01, recorded in
    * BASELINE.md). Scale shape: chunking is scan-fused, the edge join
    * shuffles on the content hash (t14's cost class), the CC funnel
    * runs over the collision pairs only (16 / 9 edges — duplicate mass,
    * not corpus mass), and the split itself is free map work.
    */
  def t17LeakageSplit(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Curation, Dedup}
    val ch = chunkHashFrame(s, dir).select(col("doc_id"), col("chunk_hash"))
    val pairs = ch.as("a").join(ch.as("b"),
        col("a.chunk_hash") === col("b.chunk_hash")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val labels = Dedup.connectedComponents(pairs)
    val grp = docs(s, dir).select(col("doc_id"))
      .join(labels, Seq("doc_id"), "left")
      .withColumn("group_id", coalesce(col("cluster_id"), col("doc_id")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("group_id")
    Curation.assignSplit(grp, col("group_id"))
      .withColumn("gsz", count(lit(1)).over(w))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct("group_id").as("n_groups"),
        sum(when(col("gsz") > 1, lit(1L)).otherwise(lit(0L)))
          .as("n_docs_in_multi"))
      .orderBy("split")
  }

  private val QuotaCap = 20 // max docs kept per source

  /** Deterministic per-source quota — the data-mixing primitive t7's
    * rate-based sampler cannot express: keep AT MOST `QuotaCap` docs
    * from each source (caps are how real training mixes bound a
    * dominant crawl), chosen by md5 rank so the kept set is identical
    * on every run/engine/retry and STABLE under corpus growth (a new
    * doc displaces at most one ranked doc, never reshuffles the
    * selection). Emits the kept docs with their rank — the actual
    * sampled corpus, so the oracle checks WHICH docs survive, not just
    * how many. One window shuffle on the source key; at 100 TB a
    * per-source top-k (TakeOrdered-shaped, heap per partition) replaces
    * the full sort the window implies — the selection is identical.
    */
  def t18SourceQuota(s: SparkSession, dir: String): DataFrame =
    graft.operators.Curation.stratumQuota(
        docs(s, dir).select(col("doc_id"), col("source")),
        col("source"), col("doc_id"), QuotaCap,
        graft.operators.Dedup.Md5Hash)
      .orderBy("source", "rk")

  /** Fractional-epoch training mixture ([[graft.operators.Curation
    * .epochMix]]): src0 at 2.3 epochs (every doc twice, a
    * deterministic ~30% a third time), src1 at 0.4 (a ~40% subsample —
    * the operator subsumes sub-1 rates too), everything else at 1.0.
    * Emits (doc_id, source, epoch) — the oracle re-derives the exact
    * copy counts from the same md5 threshold and UNNESTs
    * generate_series, so WHICH docs got the extra epoch (not just how
    * many) is hash-pinned. Weights chosen discriminative at every SF:
    * both the 300‰ and 400‰ thresholds split every 25-doc-or-larger
    * source non-trivially.
    */
  def t19EpochMix(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Curation, Dedup}
    Curation.epochMix(docs(s, dir).select(col("doc_id"), col("source")),
        col("source"), col("doc_id"),
        Map("src0" -> 2.3, "src1" -> 0.4), 1.0, Dedup.Md5Hash)
      .orderBy("doc_id", "epoch")
  }

  /** Statistical LM quality scoring — the CCNet-family signal the
    * heuristic scorers (t2, t11) can't give: a bigram language model
    * TRAINED ON THE CORPUS ITSELF scores each document by per-bigram
    * negative log-likelihood, `nll = −(1/n) Σ ln(C(w1,w2)/C(w1))` (MLE
    * conditionals; every bigram was observed, so no smoothing term —
    * C2 ≤ C1 by construction and the score is a clean ≥ 0). Documents
    * full of common transitions score low (predictable text); rare-
    * transition documents score high — the outlier signal used both
    * ways in curation (drop gibberish, or keep the tail for diversity).
    *
    * Scale shape: the MODEL is table-sized — distinct-bigram
    * conditionals computed once (two map-side-combined aggregates, one
    * equi-join bigram⋈unigram on w1) — and SCORING is one shuffle join
    * of bigram occurrences against the scored table plus a per-doc
    * aggregate; nothing is quadratic and nothing collects. At 100 TB
    * the model table is the vocabulary-bigram mass (sublinear in
    * corpus), the scoring join the dominant, embarrassingly
    * partitionable cost — the KenLM-scoring shape with the model kept
    * distributed. The summed doubles round at 6dp (ln ULPs and
    * summation order differ cross-engine; the noise is ≤ 1e-12).
    */
  def t20LmPerplexity(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir).select(col("doc_id"), tokens(col("text")).as("toks"))
    // native one-pass pair generator ([[graft.functions.TextExpressions
    // .adjacentPairs]]) — the HOF spelling kept as an executable spec in
    // GraftExtensionsSpec; per-row virtual call vs per-element lambda
    val bi = docs(s, dir).select(col("doc_id"),
        explode(graft.functions.TextExpressions.adjacentPairs(col("text")))
          .as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val uni = base.select(explode(col("toks")).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("c1"))
    val model = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
      .join(uni, "w1")
      .select(col("w1"), col("w2"),
        log(col("c2").cast("double") / col("c1")).as("lp"))
    bi.join(model, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        round(-sum(col("lp")) / count(lit(1)), 6).as("nll_per_bigram"))
      .orderBy("doc_id")
  }

  private val NoveltyDf = 5 // shingle is "boilerplate" at ≥ this many docs

  /** Cross-document n-gram novelty — the boilerplate detector: for each
    * doc, the fraction of its distinct word trigrams that occur in
    * `NoveltyDf`-or-more documents corpus-wide (headers, licence
    * blocks, and template text score high; novel prose scores low).
    * The complement of t8's WITHIN-doc repetition. Shape is the
    * inverted-index classic: one map-side-combined groupBy computes
    * per-shingle document frequency (shingles are distinct per doc, so
    * `count(1)` IS the df), a co-partitioned join carries it back, and
    * a per-doc aggregate scores. The ratio is emitted as an integer
    * permille — no floating point in the result.
    */
  def t13NgramNovelty(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Dedup, FrameCaches}
    val sh = FrameCaches.track(docs(s, dir).filter(col("text").isNotNull)
      .select(col("doc_id"),
        explode(Dedup.hashedShingles(col("text"), 3, Dedup.Md5Hash)).as("s"))
      .persist())
    val df3 = sh.groupBy("s").agg(count(lit(1)).as("df"))
    sh.join(df3, Seq("s"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") >= NoveltyDf, 1L).otherwise(0L)).as("n_common"))
      .select(col("doc_id"), col("n_shingles"), col("n_common"),
        expr("n_common * 1000 DIV n_shingles").as("common_permille"))
      .orderBy("doc_id")
  }

  /** On-engine BPE tokenizer training ([[graft.operators.Bpe]]): the
    * first 3 learned merges over the corpus vocabulary, with exact pair
    * counts. The oracle unrolls the same 3 rounds in SQL (pair argmax +
    * `list_reduce` fuse), so the whole training loop is hash-checked.
    */
  def bpe1Merges(s: SparkSession, dir: String): DataFrame =
    graft.operators.Bpe.learnMerges(docs(s, dir), col("text"), BpeRounds)
      .orderBy("merge_round")

  /** BPE tokenizer APPLICATION ([[graft.operators.Bpe.encodeVocab]]):
    * train the 3 merges, replay them over the distinct vocabulary, and
    * report each doc's word count and post-merge BPE token count — the
    * deploy-time "tokenize the corpus with the learned vocab" pass. The
    * 3-row merge list rides the driver (metadata-plane, like shipping a
    * tokenizer file); the corpus cost is one token-to-vocab equi-join,
    * never corpus × merges. The oracle re-trains AND re-encodes in SQL,
    * so training and application hash-check together.
    */
  def bpe2Encode(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Bpe
    val d = docs(s, dir)
    val merges = Bpe.learnMerges(d, col("text"), BpeRounds)
      .orderBy("merge_round").select("pair_left", "pair_right")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val vocab = d.select(explode(tokens(col("text"))).as("w")).distinct()
    val enc = Bpe.encodeVocab(vocab, col("w"), merges)
    d.select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .join(enc, Seq("w"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_words"), sum("n_sym").as("n_bpe_tokens"))
      .orderBy("doc_id")
  }

  private val BpeRounds = 3

  /** Token-budget-aware weighted sampling
    * ([[graft.operators.Curation.weightedSample]], Efraimidis–Spirakis
    * A-ES): top-5 docs per language selected with probability
    * proportional to n_chars — long documents kept in proportion to
    * the training mass they contribute, the sampler a mixture recipe
    * uses when the budget is tokens, not documents. Md5 mode so the
    * oracle re-derives the exponential-race key bit-identically; the
    * FP key is a per-row pure function of (id, weight), so the
    * ordering (ties broken by doc_id) hash-checks.
    */
  def t21WeightedSample(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Curation, Dedup}
    Curation.weightedSample(
        docs(s, dir).select(col("doc_id"), col("lang"), col("n_chars")),
        col("lang"), col("doc_id"), col("n_chars"), 5, Dedup.Md5Hash)
      .select("lang", "doc_id", "n_chars", "ws_rank")
      .orderBy("lang", "ws_rank")
  }

  val entries: Map[String, Q] = Map(
    "t21_weighted_sample" -> t21WeightedSample _,
    "bpe2_encode" -> bpe2Encode _,
    "t12_chunking" -> t12Chunking _,
    "t13_ngram_novelty" -> t13NgramNovelty _,
    "t14_chunk_dedup" -> t14ChunkDedup _,
    "t15_decontaminated" -> t15Decontaminated _,
    "t16_pii_redaction" -> t16PiiRedaction _,
    "t17_leakage_split" -> t17LeakageSplit _,
    "t18_source_quota" -> t18SourceQuota _,
    "t19_epoch_mix" -> t19EpochMix _,
    "t20_lm_perplexity" -> t20LmPerplexity _,
    "bpe1_merges" -> bpe1Merges _,
    "t11_gopher_gate" -> t11GopherGate _,
    "t10_normalize" -> t10Normalize _,
    "t8_repetition" -> t8Repetition _,
    "t9_seq_packing" -> t9SeqPacking _,
    "t1_token_stats" -> t1TokenStats _,
    "t2_quality_scores" -> t2Quality _,
    "t3_lang_id" -> t3LangId _,
    "t4_fingerprint" -> t4Fingerprint _,
    "t5_winnow_fingerprints" -> t5Winnow _,
    "t6_contamination" -> t6Contamination _,
    "t7_sample_mix" -> t7SampleMix _,
    "d1_dedup_exact" -> d1DedupExact _,
  )

  private[queries] val toksSql =
    """list_filter(regexp_split_to_array(trim(text), '\s+'), t -> len(t) > 0)"""
  private[queries] val toksLowerSql =
    """list_filter(regexp_split_to_array(trim(lower(text)), '\s+'), t -> len(t) > 0)"""
  private def hitsSql(words: Seq[String]): String =
    s"""len(list_filter($toksLowerSql, t -> list_contains([${words.map("'" + _ + "'").mkString(",")}], t)))"""
  private[queries] val fpSql =
    """md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g')))"""

  /** Shared chunk CTE chain (`base` → `b2` → `ch`) — the SQL twin of
    * [[chunkHashFrame]]; t12 / t14 here and g6 in ExtendedQueries all
    * SELECT from `ch`.
    */
  private[queries] val chunkCteSql: String =
    s"""base AS (
       |  SELECT doc_id, source, $toksSql AS toks, len($toksSql) AS n_tok
       |  FROM documents WHERE text IS NOT NULL),
       |b2 AS (
       |  SELECT doc_id, source, toks,
       |    CASE WHEN n_tok <= $ChunkLen THEN 1
       |         ELSE 1 + (n_tok - ${ChunkLen - ChunkStride + 1}) // $ChunkStride END AS n_chunks
       |  FROM base WHERE n_tok > 0),
       |ch AS (
       |  SELECT doc_id, source, g.i AS chunk_id,
       |    CAST(len(toks[(g.i * $ChunkStride + 1):(g.i * $ChunkStride + $ChunkLen)]) AS BIGINT)
       |      AS n_chunk_tokens,
       |    md5(array_to_string(toks[(g.i * $ChunkStride + 1):(g.i * $ChunkStride + $ChunkLen)], ' '))
       |      AS chunk_hash
       |  FROM b2, LATERAL (SELECT unnest(generate_series(0, n_chunks - 1)) AS i) g)""".stripMargin
  private[queries] val stopRatioSql =
    s"${hitsSql(langStopwords.head._2)} * 1.0 / len($toksLowerSql)"
  private[queries] val alphaSql = "len(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0 / len(text)"
  private[queries] val digitSql = "len(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0 / len(text)"

  private[queries] val qualitySql =
    s"($alphaSql) * 0.5 + least(($stopRatioSql) * 5.0, 1.0) * 0.3" +
      s" + (1.0 - ($digitSql)) * 0.2"

  // ordered CASE chain == Spark's greatest(struct(score, lang)) tie-break
  // (highest score wins; ties go to the lexicographically-greatest lang)
  private[queries] val langCaseSql: String = {
    val scores = langStopwords.map { case (l, ws) => l -> hitsSql(ws) }.toMap
    val order = langStopwords.map(_._1).sortBy(identity).reverse // zh,fr,es,en,de
    val arms = order.init.zipWithIndex.map { case (l, i) =>
      val rest = order.drop(i + 1)
      val conds = rest.map(r => s"${scores(l)} >= ${scores(r)}").mkString(" AND ")
      s"WHEN $conds THEN '$l'"
    }
    s"CASE ${arms.mkString(" ")} ELSE '${order.last}' END"
  }

  // word 5-grams, distinct, whole-text fallback — then the same 60-bit
  // md5 slice the Spark-side hashedShingles uses
  private val sh5HashedSql =
    s"""list_distinct(list_transform(
       | CASE WHEN len($toksSql) >= 5
       |  THEN list_distinct(list_transform(generate_series(1, len($toksSql) - 4),
       |    i -> array_to_string(($toksSql)[i:i+4], ' ')))
       |  ELSE [array_to_string($toksSql, ' ')] END,
       | x -> ('0x' || substr(md5(x), 1, 15))::BIGINT))""".stripMargin

  // distinct word trigrams (len>=3 path only — callers guard the else)
  private val sh3Sql =
    s"""list_distinct(list_transform(generate_series(1, len($toksSql) - 2),
       | i -> array_to_string(($toksSql)[i:i+2], ' ')))""".stripMargin

  // distinct word trigrams hashed with the dedup family's 60-bit md5
  // slice, whole-text fallback below 3 tokens — sh5HashedSql's n=3 twin
  private val sh3HashedSql =
    s"""list_distinct(list_transform(
       | CASE WHEN len($toksSql) >= 3
       |  THEN list_distinct(list_transform(generate_series(1, len($toksSql) - 2),
       |    i -> array_to_string(($toksSql)[i:i+2], ' ')))
       |  ELSE [array_to_string($toksSql, ' ')] END,
       | x -> ('0x' || substr(md5(x), 1, 15))::BIGINT))""".stripMargin

  val oracles: Map[String, String] = Map(
    // the exponential race re-derived: u from the same 52-bit md5
    // slice (+1 over 2^52, never 0), key = -ln(u)/weight, k smallest
    // per stratum with the doc_id tie-break; the operator's
    // bad-weight guard is spelled here too (DuckDB error())
    "t21_weighted_sample" ->
      """WITH keyed AS (
        |  SELECT lang, doc_id, n_chars,
        |    -ln((('0x' || substr(md5('ws:' || CAST(doc_id AS VARCHAR)),
        |          1, 13))::BIGINT + 1) / 4503599627370496.0)
        |      / CASE WHEN n_chars IS NULL OR n_chars <= 0
        |        THEN CAST(error('[t21] non-positive or NULL weight') AS DOUBLE)
        |        ELSE CAST(n_chars AS DOUBLE) END AS k
        |  FROM documents),
        |r AS (
        |  SELECT lang, doc_id, n_chars,
        |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY k, doc_id)
        |      AS ws_rank
        |  FROM keyed)
        |SELECT lang, doc_id, n_chars, ws_rank
        |FROM r WHERE ws_rank <= 5
        |ORDER BY lang, ws_rank""".stripMargin,
    "bpe2_encode" -> {
      // bpe1's unrolled training rounds, with the WORD carried through
      // each fuse so the final sequences encode the vocabulary; the
      // corpus then joins tokens to per-word symbol counts
      def pairsCte(s: String): String =
        s"""SELECT t.seq[g.i] AS a, t.seq[g.i + 1] AS b, t.n
           |FROM $s t, LATERAL (SELECT unnest(generate_series(1,
           |  len(t.seq) - 1)) AS i) g""".stripMargin
      def bestCte(p: String): String =
        s"""SELECT a, b, CAST(SUM(n) AS BIGINT) AS cnt FROM $p
           |GROUP BY a, b ORDER BY cnt DESC, a, b LIMIT 1""".stripMargin
      def fuseCte(s: String, best: String): String =
        s"""SELECT t.w, t.n, list_reduce(list_transform(t.seq, x -> [x]),
           |  (acc, x) -> CASE WHEN acc[-1] = m.a AND x[1] = m.b
           |    THEN acc[1:len(acc) - 1] || [m.a || m.b]
           |    ELSE acc || x END) AS seq
           |FROM $s t CROSS JOIN $best m""".stripMargin
      s"""WITH wc AS (
         |  SELECT w, COUNT(*) AS n
         |  FROM (SELECT unnest($toksSql) AS w FROM documents) GROUP BY w),
         |s0 AS (SELECT w, n, list_transform(generate_series(1, len(w)),
         |         i -> w[i:i]) AS seq FROM wc),
         |p1 AS (${pairsCte("s0")}),
         |b1 AS (${bestCte("p1")}),
         |s1 AS (${fuseCte("s0", "b1")}),
         |p2 AS (${pairsCte("s1")}),
         |b2 AS (${bestCte("p2")}),
         |s2 AS (${fuseCte("s1", "b2")}),
         |p3 AS (${pairsCte("s2")}),
         |b3 AS (${bestCte("p3")}),
         |s3 AS (${fuseCte("s2", "b3")}),
         |enc AS (SELECT w, len(seq) AS n_sym FROM s3),
         |tk AS (SELECT doc_id, unnest($toksSql) AS w FROM documents)
         |SELECT doc_id, COUNT(*) AS n_words,
         |  CAST(SUM(n_sym) AS BIGINT) AS n_bpe_tokens
         |FROM tk JOIN enc USING (w)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },
    "t12_chunking" ->
      s"""WITH $chunkCteSql
         |SELECT doc_id, chunk_id, n_chunk_tokens, chunk_hash
         |FROM ch ORDER BY doc_id, chunk_id""".stripMargin,
    "t16_pii_redaction" -> {
      def hxSql(pos: Int, len: Int) =
        s"('0x' || substr(md5(CAST(doc_id AS VARCHAR)), $pos, $len))::BIGINT"
      val emailSql =
        "'user' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) || '@example.com'"
      val ssnSql = s"(${hxSql(7, 2)} % 900 + 100)::VARCHAR || '-' || " +
        s"(${hxSql(9, 2)} % 90 + 10)::VARCHAR || '-' || " +
        s"(${hxSql(11, 3)} % 9000 + 1000)::VARCHAR"
      val ipSql = Seq(14, 16, 18, 20)
        .map(p => s"(${hxSql(p, 2)} % 256)::VARCHAR").mkString(" || '.' || ")
      val phoneSql = s"'+1-' || (${hxSql(22, 2)} % 800 + 200)::VARCHAR || " +
        s"'-' || (${hxSql(24, 2)} % 800 + 200)::VARCHAR || '-' || " +
        s"(${hxSql(26, 3)} % 9000 + 1000)::VARCHAR"
      val pats = graft.operators.Curation.DefaultPiiPatterns
      val names = Seq("n_email", "n_ssn", "n_ip", "n_phone")
      val stages = pats.indices.map { i =>
        s"""s${i + 1} AS (SELECT *,
           |  len(regexp_extract_all(t$i, '${pats(i)}')) AS ${names(i)},
           |  regexp_replace(t$i, '${pats(i)}', '[REDACTED]', 'g') AS t${i + 1}
           |  FROM s$i)""".stripMargin
      }
      s"""WITH s0 AS (
         |  SELECT doc_id,
         |    text || ' Contact ' || $emailSql || ' or ' || $phoneSql ||
         |      ' (ssn ' || $ssnSql || ', last login from ' || $ipSql || ')'
         |      AS t0
         |  FROM documents WHERE text IS NOT NULL),
         |${stages.mkString(",\n")}
         |SELECT doc_id, n_email, n_ssn, n_ip, n_phone,
         |  CAST(n_email + n_ssn + n_ip + n_phone AS BIGINT) AS n_redactions,
         |  md5(t4) AS redacted_hash
         |FROM s4 ORDER BY doc_id""".stripMargin
    },
    "t17_leakage_split" ->
      // chunk-grain duplicate components via the d6-style unrolled
      // label propagation (ClosureSql; collision pairs only), then the
      // md5 group-keyed split — the whole chain re-derives from the
      // shared chunk CTE
      s"""WITH $chunkCteSql,
         |cpairs AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM ch a JOIN ch b
         |    ON a.chunk_hash = b.chunk_hash AND a.doc_id < b.doc_id),
         |edges AS MATERIALIZED (
         |  SELECT doc_a AS src, doc_b AS dst FROM cpairs
         |  UNION SELECT doc_b, doc_a FROM cpairs),
         |${ClosureSql.lpCtes("edges", "lp")},
         |labels AS (
         |  ${ClosureSql.componentsSql("lp", "doc_id", "cluster_id")}),
         |grp AS (
         |  SELECT d.doc_id, COALESCE(l.cluster_id, d.doc_id) AS group_id
         |  FROM documents d LEFT JOIN labels l USING (doc_id)),
         |assigned AS (
         |  SELECT doc_id, group_id,
         |    CASE WHEN ('0x' || substr(md5('split:' || CAST(group_id AS VARCHAR)), 1, 14))::BIGINT % 100 < 90 THEN 'train'
         |         WHEN ('0x' || substr(md5('split:' || CAST(group_id AS VARCHAR)), 1, 14))::BIGINT % 100 < 95 THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM grp)
         |SELECT split, COUNT(*) AS n_docs, COUNT(DISTINCT group_id) AS n_groups,
         |  CAST(SUM(CASE WHEN gsz > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_docs_in_multi
         |FROM (SELECT a.*, COUNT(*) OVER (PARTITION BY group_id) AS gsz
         |      FROM assigned a)
         |GROUP BY split ORDER BY split""".stripMargin,
    "t18_source_quota" ->
      s"""SELECT doc_id, source, rk FROM (
         |  SELECT doc_id, source, ROW_NUMBER() OVER (
         |    PARTITION BY source
         |    ORDER BY ('0x' || substr(md5('q:' || CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT,
         |      doc_id) AS rk
         |  FROM documents)
         |WHERE rk <= $QuotaCap ORDER BY source, rk""".stripMargin,
    "t20_lm_perplexity" ->
      s"""WITH tk AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |bi AS (
         |  SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2
         |  FROM tk, UNNEST(generate_series(1, len(toks) - 1)) AS g(i)),
         |uni AS (
         |  SELECT w1, COUNT(*) AS c1
         |  FROM (SELECT UNNEST(toks) AS w1 FROM tk) GROUP BY 1),
         |model AS (SELECT w1, w2, COUNT(*) AS c2 FROM bi GROUP BY 1, 2),
         |scored AS (
         |  SELECT m.w1, m.w2, ln(CAST(m.c2 AS DOUBLE) / u.c1) AS lp
         |  FROM model m JOIN uni u USING (w1))
         |SELECT b.doc_id, COUNT(*) AS n_bigrams,
         |  ROUND(-SUM(s.lp) / COUNT(*), 6) AS nll_per_bigram
         |FROM bi b JOIN scored s ON b.w1 = s.w1 AND b.w2 = s.w2
         |GROUP BY b.doc_id ORDER BY doc_id""".stripMargin,
    "t19_epoch_mix" ->
      // thresholds are the same DRIVER-QUANTIZED integers the operator
      // compares against (2.3 → full 2 + 300‰, 0.4 → 0 + 400‰): both
      // engines decide the extra copy on integer-vs-integer, never on
      // a binary-double rendering of the weight (round-10 advice)
      """WITH e AS (
        |  SELECT doc_id, source,
        |    CASE source WHEN 'src0' THEN 2 WHEN 'src1' THEN 0
        |      ELSE 1 END AS fullc,
        |    CASE source WHEN 'src0' THEN 300 WHEN 'src1' THEN 400
        |      ELSE 0 END AS fracm,
        |    ('0x' || substr(md5('epoch:' || CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT
        |      % 1000 AS b
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, source,
        |    CAST(fullc AS BIGINT) +
        |      CASE WHEN b < fracm THEN 1 ELSE 0 END AS n
        |  FROM e)
        |SELECT c.doc_id, c.source, u.epoch
        |FROM c, UNNEST(generate_series(0, CAST(n AS INT) - 1)) AS u(epoch)
        |WHERE n > 0 ORDER BY doc_id, epoch""".stripMargin,
    "t14_chunk_dedup" ->
      s"""WITH $chunkCteSql
         |SELECT chunk_hash,
         |  (MIN(struct_pack(doc_id := doc_id, chunk_id := chunk_id))).doc_id
         |    AS keep_doc,
         |  (MIN(struct_pack(doc_id := doc_id, chunk_id := chunk_id))).chunk_id
         |    AS keep_chunk,
         |  COUNT(*) AS n_copies
         |FROM ch GROUP BY chunk_hash ORDER BY chunk_hash""".stripMargin,
    "t13_ngram_novelty" ->
      s"""WITH sh AS (
         |  SELECT doc_id, unnest($sh3HashedSql) AS s
         |  FROM documents WHERE text IS NOT NULL),
         |dfreq AS (SELECT s, COUNT(*) AS df FROM sh GROUP BY s)
         |SELECT doc_id, COUNT(*) AS n_shingles,
         |  CAST(SUM(CASE WHEN df >= $NoveltyDf THEN 1 ELSE 0 END) AS BIGINT) AS n_common,
         |  (CAST(SUM(CASE WHEN df >= $NoveltyDf THEN 1 ELSE 0 END) AS BIGINT) * 1000)
         |    // COUNT(*) AS common_permille
         |FROM sh JOIN dfreq USING (s)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "bpe1_merges" -> {
      // one round = pair counts over the vocab seqs → 1-row argmax →
      // greedy left-to-right fuse via list_reduce (acc type must equal
      // element type in DuckDB, hence the [x] wrapping)
      def pairsCte(s: String): String =
        s"""SELECT t.seq[g.i] AS a, t.seq[g.i + 1] AS b, t.n
           |FROM $s t, LATERAL (SELECT unnest(generate_series(1,
           |  len(t.seq) - 1)) AS i) g""".stripMargin
      def bestCte(p: String): String =
        s"""SELECT a, b, CAST(SUM(n) AS BIGINT) AS cnt FROM $p
           |GROUP BY a, b ORDER BY cnt DESC, a, b LIMIT 1""".stripMargin
      def fuseCte(s: String, best: String): String =
        s"""SELECT t.n, list_reduce(list_transform(t.seq, x -> [x]),
           |  (acc, x) -> CASE WHEN acc[-1] = m.a AND x[1] = m.b
           |    THEN acc[1:len(acc) - 1] || [m.a || m.b]
           |    ELSE acc || x END) AS seq
           |FROM $s t CROSS JOIN $best m""".stripMargin
      s"""WITH wc AS (
         |  SELECT w, COUNT(*) AS n
         |  FROM (SELECT unnest($toksSql) AS w FROM documents) GROUP BY w),
         |s0 AS (SELECT n, list_transform(generate_series(1, len(w)),
         |         i -> w[i:i]) AS seq FROM wc),
         |p1 AS (${pairsCte("s0")}),
         |b1 AS (${bestCte("p1")}),
         |s1 AS (${fuseCte("s0", "b1")}),
         |p2 AS (${pairsCte("s1")}),
         |b2 AS (${bestCte("p2")}),
         |s2 AS (${fuseCte("s1", "b2")}),
         |p3 AS (${pairsCte("s2")}),
         |b3 AS (${bestCte("p3")})
         |SELECT * FROM (
         |  SELECT CAST(1 AS BIGINT) AS merge_round, a AS pair_left,
         |         b AS pair_right, cnt AS n_pairs FROM b1
         |  UNION ALL SELECT CAST(2 AS BIGINT), a, b, cnt FROM b2
         |  UNION ALL SELECT CAST(3 AS BIGINT), a, b, cnt FROM b3)
         |ORDER BY merge_round""".stripMargin
    },
    "t11_gopher_gate" -> {
      val nWords = s"len($toksSql)"
      val meanLen = s"(CAST(CAST(list_sum(list_transform($toksSql, t -> len(t))) AS BIGINT) AS DOUBLE) / $nWords)"
      val alphaRatio = s"(CAST(len(list_filter($toksSql, t -> regexp_matches(t, '[A-Za-z]'))) AS DOUBLE) / $nWords)"
      val stopHits = hitsSql(graft.functions.TextFunctions.langStopwords.head._2)
      s"""SELECT doc_id,
         | CAST($nWords AS BIGINT) AS n_words,
         | $meanLen AS mean_word_len,
         | $alphaRatio AS alpha_ratio,
         | CAST($stopHits AS BIGINT) AS n_stop_hits,
         | ($nWords BETWEEN 50 AND 100000 AND $meanLen BETWEEN 3.0 AND 10.0
         |  AND $alphaRatio >= 0.8 AND $stopHits >= 2) AS keep
         |FROM documents WHERE text IS NOT NULL ORDER BY doc_id""".stripMargin
    },
    "t10_normalize" -> {
      val normSql = "trim(regexp_replace(regexp_replace(lower(text), " +
        "'[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"
      val normToks = s"list_filter(regexp_split_to_array($normSql, ' '), t -> len(t) > 0)"
      val stopLit = graft.functions.TextFunctions.langStopwords.head._2
        .map("'" + _ + "'").mkString("[", ",", "]")
      s"""SELECT doc_id, $normSql AS norm_text,
         | len($normToks) AS n_tokens,
         | len(list_filter($normToks, t -> NOT list_contains($stopLit, t)))
         |   AS n_content_tokens
         |FROM documents WHERE text IS NOT NULL ORDER BY doc_id""".stripMargin
    },
    "t8_repetition" ->
      s"""SELECT doc_id,
         | CASE WHEN len($toksSql) >= 3
         |  THEN ROUND(1.0 - len($sh3Sql) * 1.0 / (len($toksSql) - 2), 6)
         |  ELSE 0.0 END AS rep_ratio
         |FROM documents ORDER BY doc_id""".stripMargin,
    "t9_seq_packing" ->
      s"""SELECT doc_id, source,
         |  CAST(FLOOR((SUM(n_tok) OVER w - n_tok) / 2048) AS BIGINT) AS seq_id,
         |  CAST((SUM(n_tok) OVER w - n_tok) % 2048 AS BIGINT) AS seq_offset
         |FROM (SELECT doc_id, source, len($toksSql) AS n_tok FROM documents)
         |WINDOW w AS (PARTITION BY source ORDER BY doc_id)
         |ORDER BY doc_id""".stripMargin,
    "t15_decontaminated" ->
      s"""WITH probes AS (
         |  SELECT DISTINCT unnest($sh5HashedSql) AS s
         |  FROM documents WHERE doc_id < 50),
         |corpus AS (
         |  SELECT doc_id, unnest($sh5HashedSql) AS s
         |  FROM documents WHERE doc_id >= 50),
         |flagged AS (SELECT DISTINCT doc_id FROM corpus JOIN probes USING (s))
         |SELECT doc_id FROM documents
         |WHERE doc_id >= 50 AND doc_id NOT IN (SELECT doc_id FROM flagged)
         |ORDER BY doc_id""".stripMargin,
    "t6_contamination" ->
      s"""WITH probes AS (
         |  SELECT DISTINCT unnest($sh5HashedSql) AS s
         |  FROM documents WHERE doc_id < 50),
         |corpus AS (
         |  SELECT doc_id, unnest($sh5HashedSql) AS s
         |  FROM documents WHERE doc_id >= 50)
         |SELECT doc_id, COUNT(*) AS n_overlap
         |FROM corpus JOIN probes USING (s)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "t7_sample_mix" ->
      s"""SELECT doc_id, $langCaseSql AS lang
         |FROM documents
         |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14))::BIGINT % 1000
         |  < (CASE WHEN ($langCaseSql) = 'en' THEN 500 ELSE 1000 END)
         |ORDER BY doc_id""".stripMargin,
    "t1_token_stats" ->
      s"""SELECT doc_id,
         | len($toksSql) AS n_tokens,
         | len(regexp_extract_all(text, '(\\p{L}+|\\p{N}+|[^\\p{L}\\p{N}\\s])', 1)) AS n_bpeish_tokens,
         | list_sum(list_transform($toksSql, t -> len(t))) * 1.0 / len($toksSql) AS avg_word_len
         |FROM documents ORDER BY doc_id""".stripMargin,
    "t2_quality_scores" ->
      s"""SELECT doc_id,
         | $alphaSql AS alpha_ratio,
         | $digitSql AS digit_ratio,
         | $stopRatioSql AS stop_ratio,
         | $qualitySql AS quality
         |FROM documents ORDER BY doc_id""".stripMargin,
    "t3_lang_id" ->
      s"SELECT doc_id, $langCaseSql AS lang_pred FROM documents ORDER BY doc_id",
    "t4_fingerprint" ->
      s"SELECT doc_id, $fpSql AS fp FROM documents ORDER BY doc_id",
    "t5_winnow_fingerprints" -> {
      // k=8, w=4; same (h*31+c) % 1e9+7 over codepoints
      val kh =
        """CASE WHEN len(text) - 7 >= 1 THEN
          |  list_transform(generate_series(1, len(text) - 7), i ->
          |    list_reduce(list_prepend(CAST(0 AS BIGINT),
          |      list_transform(generate_series(0, 7), j ->
          |        CAST(ord(substr(text, i + j, 1)) AS BIGINT))),
          |      (a, b) -> (a * 31 + b) % 1000000007))
          | ELSE [list_reduce(list_prepend(CAST(0 AS BIGINT),
          |   list_transform(generate_series(1, len(text)), j ->
          |     CAST(ord(substr(text, j, 1)) AS BIGINT))),
          |   (a, b) -> (a * 31 + b) % 1000000007)] END""".stripMargin
      s"""SELECT doc_id, unnest(list_sort(list_distinct(
         |  CASE WHEN len(kh) >= 4 THEN
         |    list_transform(generate_series(1, len(kh) - 3), i -> list_min(kh[i:i+3]))
         |  ELSE [list_min(kh)] END))) AS fp
         |FROM (SELECT doc_id, $kh AS kh FROM documents WHERE text IS NOT NULL)
         |ORDER BY doc_id, fp""".stripMargin
    },
    "d1_dedup_exact" ->
      s"""SELECT $fpSql AS fp, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
         |FROM documents GROUP BY fp ORDER BY fp""".stripMargin,
  )
}
