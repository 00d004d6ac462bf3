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
}
