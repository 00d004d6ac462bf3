package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sparse-vector similarity join: TF-IDF cosine over word n-gram
  * terms via an inverted index (reference scope: none —
  * beyond-reference, SURVEY §2.13). The COSINE member of the sparse
  * near-dup family: [[Dedup]]'s MinHash/Jaccard treats documents as
  * term SETS; this operator keeps term frequencies and IDF weights,
  * the classic IR similarity (Salton's vector model) that separates
  * "share boilerplate n-grams" from "share the same *distinctive*
  * n-grams".
  *
  * Scale shape — term-at-a-time, never all-pairs:
  *   - one tokenize/explode scan → `(doc, term, tf)` (map-side
  *     combined), persisted once for its three consumers;
  *   - document frequencies from a second map-side-combined
  *     aggregate; corpus size broadcast as a 1-row scalar frame;
  *   - the inverted index (postings) self-joins ON TERM — pair mass
  *     rides Σ df² over KEPT terms, and [[cosinePairs]]'s `maxDf`
  *     caps it at maxDf · Σ df: a stopword-like term that appears
  *     everywhere would alone contribute |corpus|²/2 candidate pairs,
  *     so vectors are TRUNCATED to discriminative terms (df ≤ maxDf)
  *     — standard IR practice, and the same quadratic-avoidance
  *     discipline as the LSH `maxBucketSize` / d9 `maxPostingSize`
  *     caps. The cap changes the statistic (a pruned vector IS the
  *     vector) and is therefore SPELLED in the gated row's oracle.
  *
  * Determinism (the dp9/tw2 playbook): IDF is quantized to integer
  * MILLIS at birth — `FLOOR(ln(N/df)·1000 + 0.5)` is the only FP
  * step that feeds an aggregate, and it is a per-row pure function
  * of two integers (`ln` agrees cross-engine on this domain; the
  * round-6 tw2 precedent). Weights, norms and dot products then run
  * in exact BIGINT (`w = tf·idf_milli`; bound: with idf_milli ≤
  * ln(N)·1000 ≈ 15.5k at N = 5M docs and tf ≤ 2000, Σw² per doc
  * stays under 2·10¹⁸ — inside checked 64-bit, overflow raises
  * rather than drifts). The cosine itself is a per-PAIR pure
  * function of three BIGINTs (cast → sqrt → multiply → divide, all
  * IEEE-correctly-rounded, bit-identical in any engine), floor-
  * rounded to integer micros so the compared surface is exact.
  */
object SparseSim {

  /** All document pairs with TF-IDF cosine ≥ `minCosMicro`/10⁶ over
    * word `n`-gram terms: `(d1, d2, n_shared, cos_micro)`, `d1 < d2`.
    * Documents shorter than `n` tokens carry no terms (spelled the
    * same way in the oracle: an empty generate_series). `n_shared`
    * counts the distinct terms the pair shares.
    *
    * @param maxDf vector-truncation cap: terms with df > maxDf are
    *              dropped from every vector (weights AND norms) —
    *              the posting-join cap, results-affecting by design.
    */
  def cosinePairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, maxDf: Long = 1000L, minCosMicro: Long = 0L): DataFrame = {
    require(n >= 1, s"n-gram order must be >= 1, got $n")
    require(maxDf >= 2L,
      s"maxDf=$maxDf prunes every pairable term (df >= 2 is needed to pair)")
    val base = docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        graft.functions.TextFunctions.tokens(lower(col(textCol))).as("toks"))
    // non-distinct n-grams (term FREQUENCIES, unlike Dedup.shingles'
    // set semantics); Spark's sequence(1, 0) would count DOWN, so the
    // short-doc guard is explicit
    val grams = base.select(col("doc_id"),
      explode(when(size(col("toks")) >= n,
        transform(sequence(lit(1), size(col("toks")) - (n - 1)),
          i => concat_ws(" ", slice(col("toks"), i, lit(n)))))
        .otherwise(array().cast("array<string>"))).as("term"))
    val tf = FrameCaches.track(
      grams.groupBy("doc_id", "term").agg(count(lit(1)).as("tf")).persist())
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = base.agg(count(lit(1)).as("n_docs"))
    val w = FrameCaches.track(tf
      .join(dfreq.filter(col("df") <= maxDf), "term")
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("term"),
        (col("tf") * floor(log(col("n_docs").cast("double") /
          col("df").cast("double")) * lit(1000.0) + lit(0.5)).cast("long"))
          .as("w"))
      .persist())
    val norms = w.groupBy("doc_id").agg(sum(expr("w * w")).as("n2"))
    val a = w.select(col("term"), col("doc_id").as("d1"), col("w").as("w1"))
    val b = w.select(col("term"), col("doc_id").as("d2"), col("w").as("w2"))
    val dots = a.join(b, "term").filter(col("d1") < col("d2"))
      .groupBy("d1", "d2")
      .agg(sum(expr("w1 * w2")).as("dot"), count(lit(1)).as("n_shared"))
    dots
      .join(norms.select(col("doc_id").as("d1"), col("n2").as("n2a")), "d1")
      .join(norms.select(col("doc_id").as("d2"), col("n2").as("n2b")), "d2")
      .select(col("d1"), col("d2"), col("n_shared"),
        floor(col("dot").cast("double") /
          (sqrt(col("n2a").cast("double")) * sqrt(col("n2b").cast("double"))) *
          lit(1000000.0) + lit(0.5)).cast("long").as("cos_micro"))
      .filter(col("cos_micro") >= minCosMicro)
  }
}
