package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

/** Sliding-window document chunking as a first-class operator — the
  * context-window splitter that turns long documents into fixed-size
  * training chunks (reference scope: none — beyond-reference; the t12
  * query family's engine, promoted so the metadata plane's
  * `transformation_type: chunk` and library callers share one
  * implementation).
  */
object Chunking {

  /** One row per (doc, chunk): chunk i covers tokens
    * [i·stride + 1, i·stride + chunkLen]; a doc of ≤ chunkLen tokens is
    * one chunk; the last chunk may run short; NULL-text rows are
    * excluded (Spark's `size(NULL)` = −1 would otherwise fabricate a
    * chunk count). Emits `idCol`, every `carryCols` column, `chunk_id`,
    * `n_chunk_tokens`, and an md5 `chunk_hash` of the space-joined
    * chunk tokens — the grain chunk-level dedup (t14), cross-source
    * overlap (g6), and leakage-free splitting key on.
    *
    * Scale shape: pure scan-fused map work — the explode multiplies
    * rows ~len/stride× but never shuffles; at 100 TB chunking rides
    * the scan for free. Chunk-count arithmetic stays in positive
    * integers (`(n − (chunkLen − stride + 1)) DIV stride`) so Spark's
    * truncating DIV and an oracle's flooring division agree.
    */
  def slidingChunks(df: DataFrame, idCol: String, textCol: String,
      chunkLen: Int = 64, stride: Int = 48,
      carryCols: Seq[String] = Nil): DataFrame = {
    require(df.columns.contains(idCol), s"id column '$idCol' not in input")
    require(df.columns.contains(textCol), s"text column '$textCol' not in input")
    require(chunkLen > 0, s"chunkLen must be positive, got $chunkLen")
    require(stride > 0 && stride <= chunkLen,
      s"stride must be in (0, chunkLen]; got stride=$stride chunkLen=$chunkLen")
    val keep = col(idCol) +: carryCols.map(col)
    val base = df.filter(col(textCol).isNotNull)
      .select(keep :+ TextFunctions.tokens(col(textCol)).as("toks"): _*)
      .withColumn("n_tok", size(col("toks")))
      // a whitespace-only doc tokenizes to zero tokens — without this
      // guard it would emit one PHANTOM chunk (hash of the empty
      // string) that every such doc shares, polluting chunk-level
      // dedup/overlap stats and welding the docs into one component
      // downstream (review finding); the oracle spells the same guard
      .filter(col("n_tok") > 0)
      .withColumn("n_chunks", when(col("n_tok") <= chunkLen, lit(1L))
        .otherwise(expr(s"CAST(1 + (n_tok - ${chunkLen - stride + 1}) " +
          s"DIV $stride AS BIGINT)")))
    base
      .select(keep :+ col("toks") :+
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_id"): _*)
      .withColumn("chunk",
        slice(col("toks"), (col("chunk_id") * stride + 1).cast("int"),
          lit(chunkLen)))
      .select(keep :+ col("chunk_id") :+
        size(col("chunk")).cast("long").as("n_chunk_tokens") :+
        md5(concat_ws(" ", col("chunk")).cast("binary")).as("chunk_hash"): _*)
  }
}
