package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SpansSpec extends SparkSpec {
  import spark.implicits._

  private def words(prefix: String, n: Int): Seq[String] =
    (1 to n).map(i => s"$prefix$i")
  private val span60 = words("s", 60)

  private def result(df: org.apache.spark.sql.DataFrame,
      minSpan: Int = 50, cap: Int = 32) =
    Spans.sharedSpans(df, "doc_id", "text", minSpan, cap)
      .select("doc_a", "doc_b", "n_spans", "max_span_tokens")
      .as[(Long, Long, Long, Long)].collect().toSet

  test("a shared 60-token span is found at any alignment; 49 tokens is below grain") {
    val docs = Seq(
      (1L, (words("a", 10) ++ span60).mkString(" ")),
      (2L, (words("b", 5) ++ span60 ++ words("c", 5)).mkString(" ")),
      // doc 3 shares only the first 49 tokens of the span — sub-grain
      (3L, (words("d", 20) ++ span60.take(49) ++ words("e", 10)).mkString(" ")))
      .toDF("doc_id", "text")
    assert(result(docs) == Set((1L, 2L, 1L, 60L)),
      "exactly the over-grain pair, with the exact span length")
  }

  test("content repeated in one doc counts per diagonal (documented over-report)") {
    val docs = Seq(
      (1L, (words("a", 10) ++ span60).mkString(" ")),
      (2L, (span60 ++ words("x", 20) ++ span60).mkString(" ")))
      .toDF("doc_id", "text")
    assert(result(docs) == Set((1L, 2L, 2L, 60L)))
  }

  test("a hot boilerplate window is dropped by the posting cap; raising the cap restores it") {
    // 100 docs all carrying the same 50-token license header: 100
    // postings for each header window — past cap 32, so no pairs; the
    // quadratic 100*99/2 pair mass never materializes
    val header = words("h", 50).mkString(" ")
    val docs = spark.range(100)
      .select(col("id").as("doc_id"),
        concat(lit(header), lit(" filler"), col("id").cast("string"))
          .as("text"))
    assert(result(docs.toDF()) == Set.empty,
      "hot window must be capped out")
    val uncapped = result(docs.toDF(), cap = 10000)
    assert(uncapped.size == 100L * 99 / 2 &&
      uncapped.forall { case (_, _, ns, ms) => ns == 1L && ms == 50L },
      "with the cap lifted every pair shares the header span")
  }

  test("the cap is results-neutral on the real corpus (max posting 4 << 32)") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val capped = result(docs)
    val uncapped = result(docs, cap = 1000000)
    assert(capped.nonEmpty && capped == uncapped,
      s"cap must be bit-neutral here (${capped.size} pairs)")
  }

  test("the XxHash production mode finds the same pairs as the oracle-checkable md5 mode") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val md5Pairs = result(docs)
    val xxPairs = Spans.sharedSpans(docs, "doc_id", "text", 50, 32, Dedup.XxHash)
      .select("doc_a", "doc_b", "n_spans", "max_span_tokens")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(md5Pairs == xxPairs,
      "hash family must not change which spans are found")
  }

  test("winnowed fingerprints are a COMPLETE candidate filter for exact spans (the scale path)") {
    // the documented sub-linear path for 100 TB: winnow (t5's k=8, w=4
    // character fingerprints) as the candidate stage, exact shared-span
    // verification on the candidates only. Schleimer/Wilkerson/Aiken's
    // guarantee: any shared substring of >= k + w - 1 chars shares a
    // selected fingerprint — and a shared 50-TOKEN span is hundreds of
    // chars, so recall over the exact pairs must be 1.0, not just high
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val exact = Spans.sharedSpans(docs, "doc_id", "text")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val fps = docs.filter(col("text").isNotNull)
      .select(col("doc_id"),
        explode(graft.functions.TextExpressions
          .winnowFingerprints(col("text"), 8, 4)).as("fp"))
      .distinct()
    val cands = fps.as("a").join(fps.as("b"),
        $"a.fp" === $"b.fp" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("da"), $"b.doc_id".as("db")).distinct()
      .as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty && exact.subsetOf(cands),
      s"winnowing missed exact-span pairs: ${(exact -- cands).take(5)}")
    info(s"funnel: ${cands.size} winnowed candidates -> " +
      s"${exact.size} confirmed >=50-token pairs")
  }

  test("degenerate knobs fail loudly") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Spans.sharedSpans(docs, "doc_id", "text", minSpanTokens = 1)
    }
    intercept[IllegalArgumentException] {
      Spans.sharedSpans(docs, "doc_id", "text", maxPostingSize = 1)
    }
    intercept[IllegalArgumentException] {
      Spans.sharedSpans(docs, "nope", "text")
    }
  }
}
