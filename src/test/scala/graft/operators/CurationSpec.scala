package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("contaminationScores counts shared n-grams; clean docs are absent") {
    val probes = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river")
    ).toDF("doc_id", "text")
    val corpus = Seq(
      // contains a probe 5-gram verbatim (plagiarized fragment)
      (10L, "intro words then the quick brown fox jumps and more filler here"),
      // clean — no 5-gram overlap
      (11L, "completely different content about spark query engines and shuffles"),
      // full copy — every probe 5-gram overlaps
      (12L, "the quick brown fox jumps over the lazy dog near the river")
    ).toDF("doc_id", "text")
    for (mode <- Seq(Dedup.XxHash, Dedup.Md5Hash)) {
      val scores = Curation.contaminationScores(corpus, probes,
          "doc_id", "text", 5, mode)
        .as[(Long, Long)].collect().toMap
      assert(scores(10L) == 1L, s"one shared 5-gram expected: $scores")
      assert(scores(12L) == 8L, s"full copy shares all 8 probe 5-grams: $scores")
      assert(!scores.contains(11L), "clean doc must not appear")
    }
  }

  test("stratifiedSample is deterministic, rate-respecting, and exact per bucket") {
    val rows = spark.range(2000)
      .select(col("id").as("doc_id"),
        when(col("id") % 4 === 0, "rare").otherwise("common").as("stratum"))
    val rates = Map("common" -> 0.25)
    val once = Curation.stratifiedSample(rows, col("stratum"), col("doc_id"), rates)
      .as[(Long, String)].collect().toSet
    val again = Curation.stratifiedSample(rows, col("stratum"), col("doc_id"), rates)
      .as[(Long, String)].collect().toSet
    assert(once == again, "same input must make identical keep decisions")
    // default rate 1.0: every rare row survives
    assert(once.count(_._2 == "rare") == 500)
    // hash buckets are uniform-ish: 25% ± a generous margin of 1500 commons
    val kept = once.count(_._2 == "common")
    assert(kept > 1500 * 0.15 && kept < 1500 * 0.35, s"kept $kept of 1500")
    // the keep decision is exactly the documented bucket predicate
    val buckets = rows.select(col("doc_id"),
        pmod(xxhash64(col("doc_id").cast("string")), lit(1000L)).as("b"),
        col("stratum"))
      .as[(Long, Long, String)].collect()
    buckets.foreach { case (id, b, st) =>
      val expected = if (st == "rare") true else b < 250
      assert(once.contains((id, st)) == expected,
        s"doc $id bucket $b stratum $st: keep decision diverged")
    }
  }

  test("epochMix: integer weights copy exactly, fractions land between floor and ceil, epoch ids are dense") {
    val rows = spark.range(1000)
      .select(col("id").as("doc_id"),
        when(col("id") % 2 === 0, "up").otherwise("flat").as("source"))
    val mixed = Curation.epochMix(rows, col("source"), col("doc_id"),
      Map("up" -> 2.5), defaultEpochs = 1.0)
    val perDoc = mixed.groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n"), max("epoch").as("maxe"), min("epoch").as("mine"))
      .as[(Long, String, Long, Long, Long)].collect()
    assert(perDoc.length == 1000, "no doc may disappear at weight >= 1")
    perDoc.foreach { case (id, src, n, maxe, mine) =>
      if (src == "flat") assert(n == 1, s"doc $id: flat source must copy once")
      else assert(n == 2 || n == 3, s"doc $id: 2.5 epochs must give 2 or 3 copies")
      assert(mine == 0 && maxe == n - 1, s"doc $id: epoch ids must be 0..n-1")
    }
    // the fractional half is ~50% and deterministic across invocations
    val ups = perDoc.filter(_._2 == "up")
    val three = ups.count(_._3 == 3)
    assert(three > 500 * 0.35 && three < 500 * 0.65, s"$three of 500 got the extra epoch")
    val again = Curation.epochMix(rows, col("source"), col("doc_id"),
      Map("up" -> 2.5), defaultEpochs = 1.0)
      .groupBy("doc_id").agg(count(lit(1))).as[(Long, Long)].collect().toSet
    assert(perDoc.map(d => (d._1, d._3)).toSet == again,
      "same input must make identical copy decisions")
    // weight 0 removes the source entirely; out-of-range weight rejected
    val gone = Curation.epochMix(rows, col("source"), col("doc_id"),
      Map("up" -> 0.0), defaultEpochs = 1.0)
    assert(gone.filter(col("source") === "up").count() == 0)
    intercept[IllegalArgumentException] {
      Curation.epochMix(rows, col("source"), col("doc_id"), Map("up" -> 17.0))
    }
  }

  test("epochMix threshold is the exact per-mille integer, not its double neighborhood") {
    // round-10 advice: 0.4 * 1000 in binary double is 400.00000000000006,
    // which ADMITS bucket 400; the exact-decimal threshold is 400, which
    // excludes it. The fix quantizes on the driver, so a doc whose
    // bucket is exactly 400 must get ZERO copies at weight 0.4 (and a
    // bucket-399 doc one copy) — the decision an exact-DECIMAL oracle
    // makes, pinned here so Scala can never drift back to double.
    val buckets = spark.range(20000)
      .select(col("id"),
        pmod(xxhash64(concat(lit("epoch:"), col("id").cast("string"))),
          lit(1000L)).as("b"))
      .as[(Long, Long)].collect().toMap
    val at400 = buckets.collectFirst { case (id, 400L) => id }.get
    val at399 = buckets.collectFirst { case (id, 399L) => id }.get
    val rows = Seq((at400, "s"), (at399, "s")).toDF("doc_id", "source")
    val mixed = Curation.epochMix(rows, col("source"), col("doc_id"),
        Map("s" -> 0.4))
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(!mixed.contains(at400),
      s"bucket-400 doc must get 0 copies at weight 0.4 (double drift)")
    assert(mixed.get(at399).contains(1L),
      s"bucket-399 doc must get exactly 1 copy at weight 0.4: $mixed")
    // stratifiedSample shares the quantizer: same pair, same rule
    val sampled = Curation.stratifiedSample(
        spark.range(20000).select(col("id").as("doc_id"), lit("s").as("st")),
        col("st"), col("doc_id"), Map("s" -> 0.4))
      .as[(Long, String)].collect().map(_._1).toSet
    val sBuckets = spark.range(20000)
      .select(col("id"),
        pmod(xxhash64(col("id").cast("string")), lit(1000L)).as("b"))
      .as[(Long, Long)].collect()
    sBuckets.foreach { case (id, b) =>
      assert(sampled.contains(id) == (b < 400),
        s"doc $id bucket $b: sample keep decision diverged from b < 400")
    }
  }

  test("redactPii scrubs emails/SSNs/IPs/phones, counts each once, leaves clean text alone") {
    val docs = Seq(
      (1L, "contact alice.smith+work@example.co.uk for details"),
      (2L, "ssn 123-45-6789 on file"), // SSN must count ONCE, not again as a phone
      (3L, "server at 192.168.0.1 responded"),
      (4L, "call +1 (555) 867-5309 today"),
      (5L, "no sensitive content in this row at all"),
      (6L, "two hits: bob@corp.io and 10.0.0.7 together"),
      // the anchored phone pattern must NOT eat dates, versions, or ids
      (7L, "released 2026-08-13 as version 1.2.3.4000 build 123456789"),
      (8L, "dial 555-867-5309 or (212) 555-0100 now")
    ).toDF("doc_id", "text")
    val out = Curation.redactPii(docs, "text")
      .select("doc_id", "text", "_pii_redactions")
      .as[(Long, String, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L) == ("contact [REDACTED] for details", 1L))
    assert(out(2L) == ("ssn [REDACTED] on file", 1L))
    assert(out(3L) == ("server at [REDACTED] responded", 1L))
    assert(out(4L) == ("call [REDACTED] today", 1L))
    assert(out(5L) == ("no sensitive content in this row at all", 0L))
    assert(out(6L) == ("two hits: [REDACTED] and [REDACTED] together", 2L))
    // the date, the version (4-digit tail fails \d{1,3}\b), and the
    // bare digit run all survive the anchored patterns untouched
    assert(out(7L) == ("released 2026-08-13 as version 1.2.3.4000 build 123456789", 0L))
    assert(out(8L) == ("dial [REDACTED] or [REDACTED] now", 2L))
    // scan-fused: pure per-row regex work adds no exchange to the plan
    val sp = Curation.redactPii(docs, "text").queryExecution.sparkPlan
    assert(sp.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.isEmpty, s"redaction must not shuffle:\n$sp")
  }

  test("redactPii countCols emits once-only per-pattern counts") {
    val docs = Seq(
      // the SSN is burned by its own pattern; the phone pattern behind
      // it must see [REDACTED], not recount the digits
      (1L, "a@b.io then 123-45-6789 then 10.0.0.1 then 555-867-5309"),
      (2L, "only an ip 172.16.254.3 here")
    ).toDF("doc_id", "text")
    val out = Curation.redactPii(docs, "text",
        countCols = Seq("n_email", "n_ssn", "n_ip", "n_phone"))
      .select("doc_id", "n_email", "n_ssn", "n_ip", "n_phone", "_pii_redactions")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(out(1L) == ((1L, 1L, 1L, 1L, 4L)))
    assert(out(2L) == ((0L, 0L, 1L, 0L, 1L)))
    intercept[IllegalArgumentException] {
      Curation.redactPii(docs, "text", countCols = Seq("just_one"))
    }
  }

  test("stratifiedSample rejects out-of-range rates") {
    val df = Seq((1L, "en")).toDF("doc_id", "lang")
    intercept[IllegalArgumentException] {
      Curation.stratifiedSample(df, col("lang"), col("doc_id"), Map("en" -> 1.5))
    }
  }

  test("assignSplit is group-atomic where a doc-id split provably leaks") {
    // 1000 docs: 900 singletons + 50 duplicate PAIRS (doc i and doc
    // i+1000 share content group i) — the near-dup corpus shape that
    // makes id-keyed splitting an eval-contamination bug
    val singles = spark.range(100, 1000)
      .select(col("id").as("doc_id"), col("id").as("group_id"))
    val pairs = spark.range(0, 50).select(col("id").as("g"))
      .select(explode(array(col("g"), col("g") + 1000)).as("doc_id"), col("g").as("group_id"))
    val docs = singles.unionByName(pairs)
    val byGroup = Curation.assignSplit(docs, col("group_id"))
    // group-atomic: no group maps to more than one split
    val leakedContent = byGroup.groupBy("group_id")
      .agg(countDistinct("split").as("n")).filter(col("n") > 1).count()
    assert(leakedContent == 0, "group-keyed split must never divide a group")
    // deterministic: a rerun over a different partitioning is identical
    val again = Curation.assignSplit(docs.repartition(13), col("group_id"))
    assert(byGroup.select("doc_id", "split").as[(Long, String)].collect().toSet ==
      again.select("doc_id", "split").as[(Long, String)].collect().toSet)
    // all three splits populated at a 90/5/5 cut of 950 groups
    val dist = byGroup.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(dist.keySet == Set("train", "val", "test"), dist.toString)
    assert(dist("train") > 700 && dist("val") > 10 && dist("test") > 10, dist.toString)
    // the SAME corpus split by doc_id instead: at least one duplicate
    // pair straddles splits (md5 is fixed, so this is deterministic,
    // not flaky — with 50 pairs the naive split essentially always
    // leaks; that delta is the operator's whole point)
    val naive = Curation.assignSplit(docs, col("doc_id"))
    val leakedNaive = naive.groupBy("group_id")
      .agg(countDistinct("split").as("n")).filter(col("n") > 1).count()
    assert(leakedNaive > 0,
      "expected the id-keyed split to divide at least one duplicate pair")
  }

  test("weightedSample: selection tracks weight, is deterministic, and rejects bad weights") {
    // 2000 rows in one stratum: 100 heavy (weight 1000) + 1900 light
    // (weight 1) — heavy mass is 1000*100 / (1000*100 + 1900) ≈ 98%,
    // so a weight-proportional top-200 must be dominated by heavy rows
    // while a uniform sampler would pick ~10 of them
    val df = spark.range(0, 2000)
      .select(col("id").as("doc_id"), lit("s").as("st"),
        when(col("id") < 100, lit(1000L)).otherwise(lit(1L)).as("w"))
    val kept = Curation.weightedSample(df, col("st"), col("doc_id"),
      col("w"), 200)
    assert(kept.count() == 200)
    val heavy = kept.filter(col("doc_id") < 100).count()
    assert(heavy >= 80, s"weight-proportional sample kept only $heavy/100 heavy rows")
    // deterministic under repartitioning, and md5/xx modes each
    // self-consistent
    val again = Curation.weightedSample(df.repartition(13), col("st"),
      col("doc_id"), col("w"), 200)
    assert(kept.select("doc_id").as[Long].collect().toSet ==
      again.select("doc_id").as[Long].collect().toSet)
    val md5Once = Curation.weightedSample(df, col("st"), col("doc_id"),
      col("w"), 200, Dedup.Md5Hash).select("doc_id").as[Long].collect().toSet
    val md5Again = Curation.weightedSample(df.repartition(7), col("st"),
      col("doc_id"), col("w"), 200, Dedup.Md5Hash)
      .select("doc_id").as[Long].collect().toSet
    assert(md5Once == md5Again)
    // per-stratum k: two strata each yield their own k rows
    val two = df.withColumn("st",
      when(col("doc_id") % 2 === 0, lit("a")).otherwise(lit("b")))
    val perStratum = Curation.weightedSample(two, col("st"), col("doc_id"),
      col("w"), 7).groupBy("st").count().as[(String, Long)].collect().toMap
    assert(perStratum == Map("a" -> 7L, "b" -> 7L), perStratum.toString)
    // degenerate knobs fail loudly
    intercept[IllegalArgumentException] {
      Curation.weightedSample(df, col("st"), col("doc_id"), col("w"), 0)
    }
    val bad = df.withColumn("w", when(col("doc_id") === 42, lit(0L)).otherwise(col("w")))
    val e = intercept[Exception] {
      Curation.weightedSample(bad, col("st"), col("doc_id"), col("w"), 5).count()
    }
    // raise_error surfaces as SparkRuntimeException locally, wrapped in
    // SparkException on a cluster — assert on the message, not the type
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).toSeq
    assert(msgs.exists(_.contains("non-positive or NULL weight")), msgs.mkString(" | "))
    // a NULL weight must ALSO raise — `NULL <= 0` is NULL, and an
    // unguarded NULL key would sort NULLS-FIRST into guaranteed
    // selection instead of failing
    val nullW = df.withColumn("w",
      when(col("doc_id") === 7, lit(null).cast("long")).otherwise(col("w")))
    val e2 = intercept[Exception] {
      Curation.weightedSample(nullW, col("st"), col("doc_id"), col("w"), 5).count()
    }
    val msgs2 = Iterator.iterate(e2: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).toSeq
    assert(msgs2.exists(_.contains("non-positive or NULL weight")), msgs2.mkString(" | "))
  }
}
