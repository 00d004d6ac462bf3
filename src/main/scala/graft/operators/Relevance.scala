package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** BM25 relevance scoring (Robertson–Spärck Jones; the Lucene
  * `k1 = 1.2, b = 0.75` parameterization — FIXED constants, spelled as
  * the literals `2.2`/`1.2`/`0.25`/`0.75` so a SQL oracle can re-spell
  * the identical doubles; a parameterized `k1 + 1` computed in Scala
  * is a DIFFERENT double than the literal and would silently break
  * cross-engine reproducibility). The driver row `tw5_bm25` gates this
  * operator; the `relevance_filter` silver verb reuses it.
  *
  * Determinism contract (the tw2/dp5 convention): nothing FP crosses a
  * row boundary — idf and the length norm are per-row pure functions
  * of integer counts, and the document score is a FIXED-ORDER sum with
  * one addend per query term (in the caller's term order), never a SUM
  * over rows. Callers round once (6dp) before comparing or ranking.
  *
  * Scale shape: one tokenize→explode pass filtered to the query terms
  * BEFORE the groupBy (the shuffle carries only query-term hits, never
  * the vocabulary); document frequencies and the (N, total_len) corpus
  * stats broadcast as scalar frames. The tokenized two-consumer base
  * frame is persisted and registered in [[FrameCaches]] — callers
  * drain it per batch.
  */
object Relevance {

  /** Per-document BM25 score for `terms` over `textCol`: one row per
    * document containing at least one query term, with the raw
    * fixed-order `score` (round before use) and `n_hits` (total query
    * term occurrences). Documents with NULL text or no hits emit no
    * row — a filter caller treats absence as score 0.
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      rawTerms: Seq[String]): DataFrame = {
    // the token stream is lowercased, so a capitalized query term would
    // silently match NOTHING (a relevance filter dropping every doc as
    // a SUCCESS run — review finding): normalize here, and dedup AFTER
    // normalizing so 'Spark'/'spark' cannot double-count either
    val terms = rawTerms.map(_.toLowerCase)
    require(terms.nonEmpty, "bm25 needs at least one query term")
    require(terms.distinct.size == terms.size,
      s"duplicate query terms (case-insensitive) would double-count: " +
        s"${rawTerms.mkString(", ")}")
    val base = FrameCaches.track(
      docs.filter(col(textCol).isNotNull)
        .select(col(idCol),
          TextFunctions.tokens(lower(col(textCol))).as("toks"))
        .select(col(idCol), col("toks"), size(col("toks")).as("dl"))
        .persist())
    val stats = base.agg(count(lit(1)).as("n_docs"),
      sum("dl").as("total_len"))
    val tf = base
      .select(col(idCol), col("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col(idCol), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf", log(lit(1.0) +
        (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("norm", lit(1.2) * (lit(0.25) +
        lit(0.75) * (col("dl").cast("double") * col("n_docs") / col("total_len"))))
      .withColumn("sc",
        col("idf") * (col("tf").cast("double") * lit(2.2) / (col("tf") + col("norm"))))
    def termScore(tm: String): Column =
      coalesce(max(when(col("term") === tm, col("sc"))), lit(0.0))
    scored.groupBy(col(idCol))
      .agg(terms.map(termScore).reduce(_ + _).as("score"),
        sum("tf").as("n_hits"))
  }
}
