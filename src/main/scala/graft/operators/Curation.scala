package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data pipelines: benchmark
  * decontamination and deterministic stratified sampling. Both are
  * deliberately shuffle-light — at 100 TB, curation passes run over
  * every document, so anything beyond scan-fused map work plus a
  * broadcast or a final aggregation is cost you pay per pass.
  */
object Curation {

  /** Per-doc contamination score against a probe set (an eval
    * benchmark): the number of distinct word n-grams the doc shares
    * with ANY probe document. Docs with `n_overlap > 0` are candidates
    * for exclusion before training.
    *
    * Scale shape: the probe side collapses to a distinct n-gram-hash
    * set and is BROADCAST (benchmarks are tiny next to a corpus); the
    * corpus side is one scan with a map-side shingle explode, the
    * broadcast join, and one map-side-combined count — the corpus
    * rows never shuffle. N-gram identity is the same 60-bit hash
    * family as the dedup operators ([[Dedup.hashedShingles]]), so the
    * md5 mode re-derives bit-identically in SQL oracles.
    */
  def contaminationScores(corpus: DataFrame, probes: DataFrame,
      idCol: String, textCol: String, n: Int = 5,
      mode: Dedup.HashMode = Dedup.XxHash): DataFrame = {
    val p = probes
      .select(explode(Dedup.hashedShingles(col(textCol), n, mode)).as("s"))
      .distinct()
    corpus
      .select(col(idCol),
        explode(Dedup.hashedShingles(col(textCol), n, mode)).as("s"))
      .join(broadcast(p), "s")
      .groupBy(idCol).agg(count(lit(1)).as("n_overlap"))
  }

  /** Deterministic stratified sampling — the training-mix primitive:
    * keep a row iff `hash(id) mod 1000 < rate(stratum) * 1000`, with a
    * per-stratum rate map and a default. No RNG and no seed plumbing:
    * the same row makes the same keep decision on every run, every
    * engine, and every retry (a resampled task CANNOT silently change
    * the training set — the property `sample()` does not give you).
    * Pure map work fused into the scan; sampling at 100 TB costs one
    * hash per row.
    *
    * `Md5Hash` mode uses the md5-slice bucket (re-derivable in SQL
    * oracles); `XxHash` is the cheaper production family.
    */
  def stratifiedSample(df: DataFrame, stratumCol: Column, idCol: Column,
      rates: Map[String, Double], defaultRate: Double = 1.0,
      mode: Dedup.HashMode = Dedup.XxHash): DataFrame = {
    require((defaultRate +: rates.values.toSeq).forall(r => r >= 0 && r <= 1),
      "sampling rates must be in [0, 1]")
    val bucket = mode match {
      case Dedup.Md5Hash =>
        graft.functions.VectorExpressions
          .hexSliceToLong(md5(idCol.cast("string")), 1, 14) % 1000
      case Dedup.XxHash => pmod(xxhash64(idCol.cast("string")), lit(1000L))
    }
    // threshold quantized ONCE on the driver (round-10 advice): the
    // bucket is an integer, so the keep rule is really `bucket <
    // per-mille(rate)` — computing `rate * 1000` in binary double in
    // the column expression would disagree with an exact-DECIMAL
    // engine exactly when the product straddles an integer (0.4 * 1000
    // = 400.00000000000006 in double admits bucket 400; exact
    // arithmetic doesn't). Both engines now compare against the same
    // integer; oracles spell the same constants.
    val thresh = rates.foldLeft(lit(perMille(defaultRate))) {
      case (acc, (k, v)) => when(stratumCol === k, lit(perMille(v))).otherwise(acc)
    }
    df.filter(bucket < thresh)
  }

  /** Weighted stratified sampling without replacement — the
    * Efraimidis–Spirakis exponential race (A-ES): each row draws a
    * deterministic uniform u from its id hash and competes on
    * `key = -ln(u) / w`; the k SMALLEST keys per stratum win, which
    * selects each row with probability proportional to its weight
    * (the "token-budget-aware" sampler: weight by n_chars/tokens and
    * long documents are kept in proportion to the mass they
    * contribute). No RNG: u re-derives bit-identically on every
    * run/engine/retry (`Md5Hash` mode re-derives in SQL oracles;
    * `XxHash` is the cheaper production family), and `-ln(u)/w` is a
    * per-row pure function of (id, w), so the FP ordering is
    * reproducible cross-engine too.
    *
    * Non-positive AND NULL weights (and NULL ids) fail LOUDLY
    * (executor-side raise_error, the family's degenerate-knob
    * discipline) — a zero weight would win every race backwards, a
    * NULL key would sort NULLS-FIRST into guaranteed selection, and a
    * silent filter would under-sample.
    *
    * Precondition: `idCol` must be unique within each stratum — the
    * uniform u derives from the id, so duplicate ids draw identical
    * keys and the (key, id) tiebreak cannot order them; which
    * duplicate takes a rank at the k boundary would then be
    * partition-order dependent. Sample at the grain the id names
    * (distinct first if the input carries duplicates).
    *
    * Scale shape: one window shuffle on the stratum key (at 100 TB a
    * per-stratum top-k heap replaces the full sort — same selection);
    * everything else is scan-fused map work. Emits the kept rows with
    * their `ws_rank` (1-based).
    */
  def weightedSample(df: DataFrame, stratumCol: Column, idCol: Column,
      weightCol: Column, k: Int,
      mode: Dedup.HashMode = Dedup.XxHash): DataFrame = {
    require(k > 0, s"sample size k must be positive, got $k")
    require(!df.columns.exists(_.equalsIgnoreCase("ws_rank")),
      "input already has a 'ws_rank' column — the sampler emits its " +
        "rank under that name; rename or drop the existing column first")
    val twoTo52 = 4503599627370496L
    val id = when(idCol.isNull,
        raise_error(lit("[weightedSample] NULL id — the uniform " +
          "derives from the id, so a NULL row cannot race")))
      .otherwise(idCol.cast("string"))
    val slice = mode match {
      case Dedup.Md5Hash =>
        graft.functions.VectorExpressions
          .hexSliceToLong(md5(concat(lit("ws:"), id)), 1, 13)
      case Dedup.XxHash =>
        pmod(xxhash64(concat(lit("ws:"), id)), lit(twoTo52))
    }
    // u ∈ (0, 1]: 52 hash bits + 1, over 2^52 — never 0, so ln(u) is
    // finite (u = 1 draws key -0.0, which orders with 0 — the best
    // possible draw either way)
    val u = (slice + lit(1L)) / lit(twoTo52.toDouble)
    // isNull is checked EXPLICITLY: `NULL <= 0` is NULL, so a bare
    // when() would fall through to otherwise and the NULL key would
    // sort NULLS-FIRST into guaranteed selection
    val w = when(weightCol.isNull || weightCol <= 0, raise_error(concat(
        lit("[weightedSample] non-positive or NULL weight for id "),
        idCol.cast("string"))))
      .otherwise(weightCol.cast("double"))
    val key = -log(u) / w
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(stratumCol).orderBy(key.asc, idCol)
    df.withColumn("ws_rank", row_number().over(win))
      .filter(col("ws_rank") <= k)
  }

  /** `rate * 1000` computed in exact DECIMAL on the driver, rounded
    * half-up to the integer per-mille threshold the bucket compares
    * against. `BigDecimal(d)` goes through the shortest decimal
    * rendering (so 0.4 is exactly 0.4, not its binary neighborhood).
    * Rate 1.0 → 1000 (keep everything: every bucket < 1000).
    */
  private def perMille(rate: Double): Long =
    math.round((BigDecimal(rate) * 1000).toDouble)

  /** The FRACTIONAL part of an epoch weight as the same integer
    * per-mille (2.3 → 300, 0.4 → 400, 1.0 → 0). */
  private def fracPerMille(e: Double): Long =
    math.round(((BigDecimal(e) - BigDecimal(math.floor(e))) * 1000).toDouble)

  /** Fractional-epoch source mixing — the UPSAMPLING half of a
    * training mixture (stratifiedSample is the downsampling half): a
    * source weighted `epochs = 2.3` contributes every document twice
    * plus a deterministic 30% of them a third time, the way published
    * LLM data recipes state mixtures ("N epochs of source X"). Emits
    * one row per (doc, epoch) with the epoch INDEX as a column — the
    * replica id downstream shuffles can salt by, so upsampled copies
    * of a hot document don't re-concentrate on one task.
    *
    * Deterministic like the rest of the family: the fractional copy is
    * `hash('epoch:'||id) mod 1000 < frac·1000` — no RNG, stable across
    * runs/engines/retries, and INDEPENDENT of stratifiedSample's
    * bucket (different hash domain prefix), so composing "0.5× of en"
    * with "2.3× of wiki" never correlates the two decisions.
    *
    * Scale shape: pure map work — a when-chain for the weight (the
    * mixture table is constant-folded into codegen), one hash, one
    * `explode(sequence(...))` whose fan-out is exactly the configured
    * epoch count (bounded ≤ 16 by the guard below — an epoch weight is
    * a recipe constant, never data); no shuffle, no driver state. At
    * 100 TB the mix rides the scan like the sampler does.
    */
  def epochMix(df: DataFrame, sourceCol: Column, idCol: Column,
      epochs: Map[String, Double], defaultEpochs: Double = 1.0,
      mode: Dedup.HashMode = Dedup.XxHash): DataFrame = {
    require((defaultEpochs +: epochs.values.toSeq).forall(e => e >= 0 && e <= 16),
      "epoch weights must be in [0, 16] — a mixture constant, not data")
    // full-copy count and fractional threshold both quantized ONCE on
    // the driver (round-10 advice): `(e - floor(e)) * 1000` computed in
    // binary double inside the column expression disagrees with an
    // exact-DECIMAL engine whenever the product straddles an integer
    // (1.0005 → 1000.4999… vs 1000.5 exact); comparing the integer
    // bucket against a driver-computed integer per-mille makes both
    // engines decide identically for EVERY weight, not just safe ones.
    val full = epochs.foldLeft(lit(math.floor(defaultEpochs).toLong)) {
      case (acc, (k, v)) =>
        when(sourceCol === k, lit(math.floor(v).toLong)).otherwise(acc)
    }
    val thresh = epochs.foldLeft(lit(fracPerMille(defaultEpochs))) {
      case (acc, (k, v)) =>
        when(sourceCol === k, lit(fracPerMille(v))).otherwise(acc)
    }
    val bucket = mode match {
      case Dedup.Md5Hash =>
        graft.functions.VectorExpressions.hexSliceToLong(
          md5(concat(lit("epoch:"), idCol.cast("string"))), 1, 14) % 1000
      case Dedup.XxHash =>
        pmod(xxhash64(concat(lit("epoch:"), idCol.cast("string"))), lit(1000L))
    }
    val copies = full + when(bucket < thresh, 1L).otherwise(0L)
    df.withColumn("n_copies", copies)
      .filter(col("n_copies") > 0)
      .withColumn("epoch", explode(sequence(lit(0L), col("n_copies") - 1)))
      .drop("n_copies")
  }

  /** Deterministic per-stratum quota — the mixing primitive the
    * rate-based [[stratifiedSample]] cannot express: keep AT MOST `cap`
    * rows from each stratum (caps are how real training mixes bound a
    * dominant crawl), chosen by hash rank so the kept set is identical
    * on every run/engine/retry and STABLE under corpus growth — a new
    * row displaces at most one ranked row, never reshuffles the
    * selection. Emits the kept rows with their `rk` rank (1-based).
    *
    * Scale shape: one window shuffle on the stratum key; at 100 TB a
    * per-stratum top-k (TakeOrdered-shaped, heap per partition)
    * replaces the full sort the window implies — the selection is
    * identical. `Md5Hash` mode re-derives in SQL oracles; `XxHash` is
    * the cheaper production family.
    */
  def stratumQuota(df: DataFrame, stratumCol: Column, idCol: Column,
      cap: Int, mode: Dedup.HashMode = Dedup.XxHash): DataFrame = {
    require(cap > 0, s"quota cap must be positive, got $cap")
    // the emitted rank column must not silently clobber a caller's
    // column of the same name (review finding — act or fail);
    // case-INSENSITIVE like Spark's own default column resolution,
    // which would otherwise replace a caller's "RK" anyway
    require(!df.columns.exists(_.equalsIgnoreCase("rk")),
      "input already has an 'rk' column — the quota emits its rank " +
        "under that name; rename or drop the existing column first")
    val rk = mode match {
      case Dedup.Md5Hash =>
        graft.functions.VectorExpressions
          .hexSliceToLong(md5(concat(lit("q:"), idCol.cast("string"))), 1, 14)
      case Dedup.XxHash => xxhash64(concat(lit("q:"), idCol.cast("string")))
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratumCol).orderBy(rk, idCol)
    df.withColumn("rk", row_number().over(w)).filter(col("rk") <= cap)
  }

  /** Group-atomic train/val/test split — the leakage-safe way to cut a
    * corpus for training: the split key is a GROUP id (a dedup cluster,
    * a duplicate-content component, a domain), not the row id, so every
    * member of a group lands in the same split by construction. Keying
    * on the row id instead is the classic eval-contamination bug: two
    * near-identical documents land one in train and one in test, and
    * the benchmark silently measures memorization (CurationSpec plants
    * exactly that corpus and shows the naive split leaks where this one
    * cannot).
    *
    * Deterministic md5 bucketing, same family as [[stratifiedSample]]:
    * `bucket = md5('split:'||group) mod 100`, `< trainPct` → train,
    * `< trainPct+valPct` → val, else test. No RNG: every engine, run,
    * and retry makes the same assignment, and the split is stable under
    * corpus growth (a new doc joining an existing group inherits the
    * group's split rather than reshuffling anything). Pure map work —
    * the group id is already on the row; at 100 TB the split rides any
    * scan for free.
    */
  def assignSplit(df: DataFrame, groupCol: Column,
      trainPct: Int = 90, valPct: Int = 5): DataFrame = {
    require(trainPct > 0 && valPct > 0 && trainPct + valPct < 100,
      s"need 0 < trainPct, 0 < valPct, trainPct+valPct < 100; got $trainPct/$valPct")
    val bucket = graft.functions.VectorExpressions
      .hexSliceToLong(md5(concat(lit("split:"), groupCol.cast("string"))), 1, 14) % 100
    df.withColumn("split",
      when(bucket < trainPct, lit("train"))
        .when(bucket < trainPct + valPct, lit("val"))
        .otherwise(lit("test")))
  }

  /** Default PII patterns, most-specific first (an SSN would otherwise
    * be eaten by the looser phone pattern): email, SSN-shaped, IPv4,
    * phone-shaped. The usual public-pipeline scrub list
    * (C4/Dolma-style); callers append domain-specific patterns.
    *
    * The phone pattern is ANCHORED to the 3-3-4 grouped shape with an
    * optional +country prefix — an earlier `\+?\d[\d\s().-]{7,}\d` form
    * matched ANY 9+-char digit run, destructively redacting ISO dates
    * (2026-08-13), version strings, and numeric IDs. The anchored form
    * requires explicit group separators, so bare 10-digit runs are NOT
    * redacted (documented trade-off: fewer false positives on the
    * overwhelmingly-more-common id/date runs; add a bare-run pattern
    * per-corpus if needed).
    */
  val DefaultPiiPatterns: Seq[String] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", // email
    "\\b\\d{3}-\\d{2}-\\d{4}\\b",                      // SSN-shaped
    "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b",                // IPv4
    "(?:\\+\\d{1,3}[-. ])?(?:\\(\\d{3}\\)[-. ]?|\\d{3}[-. ])\\d{3}[-. ]\\d{4}\\b") // phone

  /** PII redaction — the scrub pass every published training-data
    * pipeline runs before anything else sees the text: replace every
    * match of each pattern with `replacement` and report the per-doc
    * count of replacements ACTUALLY performed (each pattern is counted
    * on the text as the previous patterns left it, so an SSN redacted
    * by its own pattern is not double-counted by the looser phone
    * pattern behind it). Pure scan-fused map work — a fold of
    * `regexp_replace`s with a running `regexp_count`; no shuffle, no
    * state — at 100 TB redaction rides the ingest scan for free.
    * Patterns apply in order; keep specific before general (see
    * [[DefaultPiiPatterns]]). The replacement token must not itself
    * match any pattern (the default cannot).
    *
    * When `countCols` is non-empty (one name per pattern) the per-
    * pattern replacement counts are emitted as columns too — the audit
    * grain a scrub report needs ("how many emails vs SSNs did we
    * burn"), at zero extra passes: each count rides the same staged
    * expression the replacement fold already builds.
    */
  def redactPii(df: DataFrame, textCol: String,
      replacement: String = "[REDACTED]",
      patterns: Seq[String] = DefaultPiiPatterns,
      countCols: Seq[String] = Nil): DataFrame = {
    require(countCols.isEmpty || countCols.length == patterns.length,
      "countCols must be empty or align 1:1 with patterns")
    val (redacted, counts) =
      patterns.foldLeft((col(textCol), Seq.empty[Column])) { case ((c, ns), p) =>
        (regexp_replace(c, p, replacement),
          ns :+ regexp_count(c, lit(p)).cast("long"))
      }
    // counts/redacted reference the ORIGINAL textCol attribute — add all
    // derived columns before overwriting it
    val withCounts = countCols.zip(counts).foldLeft(
      df.withColumn("_pii_redactions", counts.reduce(_ + _))) {
      case (d, (name, cnt)) => d.withColumn(name, cnt)
    }
    withCounts.withColumn(textCol, redacted)
  }
}
