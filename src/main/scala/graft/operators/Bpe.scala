package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training on-engine (Sennrich et al. 2016 —
  * the standard subword-tokenizer induction): repeatedly count adjacent
  * symbol pairs over the corpus' WORD-FREQUENCY table, pick the most
  * frequent pair, and fuse it everywhere.
  *
  * Scale shape: the corpus is touched ONCE (the word-count aggregation,
  * map-side combined); every training round then runs over the distinct
  * VOCABULARY only — pair extraction is an explode over symbol
  * sequences, the merge rewrite is a scan-fused `aggregate` fold, and
  * the only driver-side step is the 1-row argmax per round (the same
  * metadata-plane class as the k-means centroid pull). All counts are
  * exact integers and ties break lexicographically, so the whole
  * training loop re-derives bit-identically in a SQL oracle (the same
  * design that made v11's integer k-means a full oracle row).
  */
object Bpe {

  /** One greedy left-to-right fuse pass of the pair (a, b) over a
    * symbol-sequence column: fold the tail onto [head], replacing a
    * trailing `a` by `ab` whenever `b` arrives next. Shared by training
    * (one pass per learned round) and encoding (replay all passes).
    */
  private def fuseOnce(seq: Column, a: String, b: String): Column = {
    val fused = a + b
    aggregate(
      slice(seq, lit(2), size(seq) - 1),
      slice(seq, lit(1), lit(1)),
      (acc, x) => when(element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(fused))))
        .otherwise(concat(acc, array(x))))
  }

  /** Character-split a word column into its initial symbol sequence. */
  private def charSeq(w: Column): Column =
    transform(sequence(lit(1), length(w)), i => w.substr(i, lit(1)))

  /** Hard cap on [[learnMerges]] rounds — see the pacing note there. */
  val MaxLearnRounds = 64

  /** Learn `rounds` merges; returns (merge_round, pair_left, pair_right,
    * n_pairs) — one row per learned merge, in training order. Stops
    * early if no pair remains (every word fused to one symbol).
    *
    * PACING BOUND: each round is one Spark job ending in a 1-row
    * argmax `collect()` — training is inherently DRIVER-PACED at
    * O(rounds) sequential jobs (greedy BPE's argmax is a global
    * decision; the next round's counts depend on it). That is the
    * right shape for the few-round oracle-checked demo, but a
    * production ~30k-merge vocabulary would mean ~30k sequential jobs —
    * train large vocabularies offline (or batch non-overlapping top-N
    * pairs per round, which changes greedy semantics) rather than
    * lifting the cap. `rounds` is require-guarded at [[MaxLearnRounds]]
    * so nobody drifts into that pathology by accident.
    */
  def learnMerges(docs: DataFrame, textCol: Column, rounds: Int): DataFrame = {
    require(rounds <= MaxLearnRounds,
      s"learnMerges is driver-paced at one job per round (see scaladoc); " +
        s"rounds=$rounds exceeds MaxLearnRounds=$MaxLearnRounds — train " +
        "large vocabularies offline")
    val spark = docs.sparkSession
    val words = docs
      .select(explode(graft.functions.TextFunctions.tokens(textCol)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
    // initial symbol sequence = the word's characters
    var seqs = words.select(col("n"), charSeq(col("w")).as("seq"))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val best = seqs
        .select(col("n"), explode(zip_with(
          slice(col("seq"), lit(1), size(col("seq")) - 1),
          slice(col("seq"), lit(2), size(col("seq")) - 1),
          (a, b) => struct(a.as("a"), b.as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("n").as("cnt"))
        .orderBy(desc("cnt"), col("a"), col("b"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b, cnt) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((r.toLong, a, b, cnt))
        val prev = seqs
        seqs = seqs.withColumn("seq", fuseOnce(col("seq"), a, b))
          // keep the per-round plan flat (lineage would nest folds)
          .localCheckpoint()
        // the eager checkpoint above materialized the new generation —
        // the previous round's blocks are dead; free them now so the
        // loop holds ONE generation, not `rounds`
        if (r > 1) org.apache.spark.sql.GraftColumnBridge.freeStorage(prev)
        r += 1
      }
    }
    // the last generation's checkpoint blocks are no longer needed
    // either — the learned merges are already on the driver
    if (merges.nonEmpty)
      org.apache.spark.sql.GraftColumnBridge.freeStorage(seqs)
    import spark.implicits._
    merges.toSeq.toDF("merge_round", "pair_left", "pair_right", "n_pairs")
  }

  /** Merges folded into one expression per [[encodeVocab]] plan segment
    * before the replay checkpoints — bounds expression-tree depth so a
    * realistic merge list cannot break analysis/codegen.
    */
  val EncodeFuseChunk = 16

  /** Tokenizer APPLICATION: encode a vocabulary with already-learned
    * merges — replay each merge's greedy fuse pass in training order
    * over the character-split word, returning `(w, n_sym)` (the word's
    * BPE token count). This is the deploy-time half of BPE: merges are
    * a tiny driver-side list (metadata-plane, like broadcast-ing a
    * tokenizer file), the vocabulary is the only frame touched, and the
    * corpus then joins to `(w, n_sym)` instead of re-running any fuse —
    * at 100 TB the encode cost is one vocabulary pass plus a token
    * join, never corpus × merges.
    *
    * Each merge is applied as its OWN lazy projection over the `seq`
    * attribute — never folded into one nested expression. [[fuseOnce]]
    * references its input three times, so an expression-level fold
    * (the previous design) expanded to ~3^merges nodes at analysis and
    * broke past a dozen merges; per-merge projections stay linear, and
    * Catalyst's CollapseProject keeps them separate because the
    * producer is a non-cheap HOF referenced more than once. Every
    * [[EncodeFuseChunk]] projections the vocabulary frame is
    * `localCheckpoint`ed to bound PLAN depth too (analyzer/optimizer
    * cost on thousands-deep Project chains); short lists (≤ one chunk)
    * never checkpoint, so the oracle-checked 3-merge path keeps its
    * original lazy single-plan shape. Each checkpointed generation's
    * blocks are freed as the next lands, mirroring [[learnMerges]].
    */
  def encodeVocab(vocab: DataFrame, wordCol: Column,
      merges: Seq[(String, String)]): DataFrame = {
    var cur = vocab.select(wordCol.as("w"), charSeq(wordCol).as("seq"))
    var prevCp: Option[DataFrame] = None
    val chunks = merges.grouped(EncodeFuseChunk).toSeq
    chunks.zipWithIndex.foreach { case (chunk, i) =>
      chunk.foreach { case (a, b) =>
        cur = cur.select(col("w"), fuseOnce(col("seq"), a, b).as("seq"))
      }
      if (i < chunks.size - 1) {
        cur = cur.localCheckpoint() // eager: materializes this generation
        prevCp.foreach(org.apache.spark.sql.GraftColumnBridge.freeStorage)
        prevCp = Some(cur)
      }
    }
    cur.select(col("w"), size(col("seq")).cast("long").as("n_sym"))
  }
}
