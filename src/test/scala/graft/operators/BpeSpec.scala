package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** encodeVocab semantics the oracle row can't isolate: the no-merge
  * identity, known-merge fusions, and the greedy left-to-right overlap
  * rule (the case where "symbol reduction == pair count" intuition
  * breaks). bpe2's oracle hash-checks training+encode end-to-end; these
  * pin the encode contract on hand-checkable inputs.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def enc(words: Seq[String],
      merges: Seq[(String, String)]): Map[String, Long] =
    Bpe.encodeVocab(words.toDF("w"), col("w"), merges)
      .as[(String, Long)].collect().toMap

  test("no merges: symbol count is the character count") {
    val words = Seq("spark", "a", "graft")
    assert(enc(words, Nil) == words.map(w => w -> w.length.toLong).toMap)
  }

  test("known merges fuse in training order") {
    // (a,b) first: abab -> [ab, ab], aab -> [a, ab]
    assert(enc(Seq("abab", "aab"), Seq(("a", "b"))) ==
      Map("abab" -> 2L, "aab" -> 2L))
    // then (ab,ab): abab -> [abab]
    assert(enc(Seq("abab", "aab"), Seq(("a", "b"), ("ab", "ab"))) ==
      Map("abab" -> 1L, "aab" -> 2L))
  }

  test("greedy left-to-right: overlapping pairs fuse non-overlapping") {
    // aaa has TWO (a,a) pairs but greedy fuses one: [aa, a]
    assert(enc(Seq("aaa", "aaaa"), Seq(("a", "a"))) ==
      Map("aaa" -> 2L, "aaaa" -> 2L))
  }

  /** Reference implementation of the greedy fuse, driver-side. */
  private def refEncode(w: String, merges: Seq[(String, String)]): Long =
    merges.foldLeft(w.map(_.toString).toList) { case (seq, (a, b)) =>
      seq.tail.foldLeft(List(seq.head)) { (acc, x) =>
        if (acc.last == a && x == b) acc.init :+ (a + b) else acc :+ x
      }
    }.size.toLong

  test("checkpointed chunked replay == unbounded fold past EncodeFuseChunk") {
    // a merge list LONGER than one fuse chunk (so the localCheckpoint
    // path actually runs), with late merges consuming earlier fusions
    val merges = Seq(("a", "b"), ("ab", "c"), ("abc", "d")) ++
      ('e' to 'z').sliding(2).map(p => (p(0).toString, p(1).toString)).toSeq
    assert(merges.length > Bpe.EncodeFuseChunk)
    val words = Seq("abcdabcd", "efghij", "abcdefghijklmnopqrstuvwxyz", "zyx")
    assert(enc(words, merges) ==
      words.map(w => w -> refEncode(w, merges)).toMap)
  }

  test("learnMerges refuses driver-pathological round counts") {
    intercept[IllegalArgumentException] {
      Bpe.learnMerges(Seq("a b").toDF("text"), col("text"),
        Bpe.MaxLearnRounds + 1)
    }
  }
}
