package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Exact-substring dedup at SUB-CHUNK grain — the rolling exact-match
  * family of "Deduplicating Training Data Makes Language Models Better"
  * (Lee et al. 2021): find every document pair sharing ANY exact
  * ≥ k-token span, at any alignment (reference scope: none —
  * beyond-reference; the one modern dedup grain the aligned-chunk
  * machinery (t14) cannot see — two docs sharing a 60-token span that
  * straddles a 64-token chunk boundary share no chunk hash).
  *
  * Method: sorted hash-run join, not a distributed suffix array. A
  * shared span of length L ≥ k contains L−k+1 aligned k-token windows
  * on each side — so "docs share a ≥ k-token span" ⇔ "docs share at
  * least one k-token rolling window", and the span structure is read
  * back from RUNS of consecutive matching window positions on a
  * diagonal (pos_a − pos_b constant).
  */
object Spans {

  /** One row per document pair sharing at least one exact ≥ k-token
    * span: `(doc_a, doc_b, n_spans, max_span_tokens)` where a "span" is
    * a maximal run of consecutive matched windows on one diagonal
    * (`span_tokens = run_length + k − 1`). Content repeated WITHIN a
    * document matches on several diagonals and counts per diagonal —
    * the standard over-report of diagonal matching, identical in the
    * SQL oracle.
    *
    * `maxPostingSize` (the d9/LSH cap discipline): a window hash
    * occurring in > cap positions corpus-wide — boilerplate, a license
    * header, a template — is DROPPED before the join, because the join
    * emits up to occ² pairs per hash (one 10k-occurrence window = 100M
    * matched rows from one key). Dropping a hot window can split or
    * hide a span that crosses it; the trade is spelled in the oracle so
    * both engines see identical semantics (provably neutral on the
    * tested corpus: max posting 4 vs cap 32 — SpansSpec pins the
    * identity and the adversarial bound).
    *
    * Scale shape, all linear in corpus token mass T: one scan-fused
    * window explode (T rows of (id, pos, hash)), one map-side-combined
    * count per hash + anti-join for the cap, one equi join on the hash
    * (output bounded by cap²·|hot-free hashes| — rides the true
    * duplicate mass), one window over (pair, diagonal) whose partitions
    * are the matched runs, two aggregates. Nothing quadratic in corpus
    * size, nothing collected. The md5 window hash re-derives in SQL
    * oracles byte-for-byte.
    */
  def sharedSpans(docs: DataFrame, idCol: String, textCol: String,
      minSpanTokens: Int = 50, maxPostingSize: Int = 32,
      mode: Dedup.HashMode = Dedup.Md5Hash): DataFrame = {
    require(docs.columns.contains(idCol), s"id column '$idCol' not in input")
    require(docs.columns.contains(textCol),
      s"text column '$textCol' not in input")
    require(minSpanTokens >= 2, s"minSpanTokens must be >= 2, got $minSpanTokens")
    require(maxPostingSize >= 2, s"maxPostingSize must be >= 2, got $maxPostingSize")
    val k = minSpanTokens
    val base = docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("_id"), TextFunctions.tokens(col(textCol)).as("toks"))
      .withColumn("n", size(col("toks")))
      .filter(col("n") >= k)
    // the window frame is PERSISTED (FrameCaches contract — Verify/
    // Bench drain per query): it feeds the hot-count, the anti-join,
    // and BOTH self-join sides, and Catalyst plans each as a separate
    // instance (the a/b sides differ in output names, defeating
    // ReuseExchange) — unpersisted, the dominant per-token hash explode
    // would run up to 4× (review finding)
    val win = FrameCaches.track(base
      .select(col("_id"), col("toks"),
        explode(sequence(lit(1), col("n") - (k - 1))).as("pos"))
      .select(col("_id"), col("pos"), {
        // Md5Hash re-derives in SQL oracles byte-for-byte (the gated
        // d12 row); XxHash is the cheaper codegen'd production family —
        // same 64-bit-collision-negligible identity, ~3× less hash cost
        // on the dominant window explode (same trade as Dedup's modes)
        val w = concat_ws(" ", slice(col("toks"), col("pos"), lit(k)))
        (mode match {
          case Dedup.Md5Hash => md5(w.cast("binary"))
          case Dedup.XxHash => xxhash64(w)
        }).as("h")
      }).persist())
    // the hot-window guard: count occurrences per hash (map-side
    // combined), drop hashes past the cap BEFORE the join
    val hot = win.groupBy("h").agg(count(lit(1)).as("_occ"))
      .filter(col("_occ") > maxPostingSize)
      .select("h")
    val kept = win.join(hot, Seq("h"), "left_anti")
    val a = kept.select(col("h"), col("_id").as("doc_a"), col("pos").as("pos_a"))
    val b = kept.select(col("h").as("_hb"), col("_id").as("doc_b"),
      col("pos").as("pos_b"))
    val matches = a.join(b, col("h") === col("_hb")
      && col("doc_a") < col("doc_b"))
    // runs of consecutive positions on one diagonal = maximal spans
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_a", "doc_b", "diag").orderBy("pos_a")
    matches
      .withColumn("diag", col("pos_a") - col("pos_b"))
      .withColumn("isl", col("pos_a") - row_number().over(w))
      .groupBy("doc_a", "doc_b", "diag", "isl")
      .agg((count(lit(1)) + (k - 1)).as("span_tokens"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_spans"),
        max(col("span_tokens")).cast("long").as("max_span_tokens"))
  }
}
