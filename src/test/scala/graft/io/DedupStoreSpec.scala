package graft.io

import graft.SparkSpec
import graft.operators.Dedup
import org.apache.spark.sql.functions._

class DedupStoreSpec extends SparkSpec {
  import spark.implicits._

  private def table(name: String): String = {
    spark.sql("CREATE DATABASE IF NOT EXISTS dstore_test")
    s"dstore_test.$name"
  }

  private val textA = "alpha beta gamma delta epsilon zeta eta theta"
  private val textB = "one two three four five six seven"
  private val textC = "eight nine ten eleven twelve thirteen fourteen"

  private def df(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("crawl-N+1 lifecycle: within-batch keepers, store hits dropped, epochs stamped") {
    val t = table("t_lifecycle")
    spark.sql(s"DROP TABLE IF EXISTS $t")
    // batch 1: 101/103 exact dups (keeper = min id), 105 unique
    val f1 = DedupStore.maintain(spark, t,
      df(101L -> textA, 103L -> textA, 105L -> textB),
      "doc_id", "text", epochId = Some(1L))
    assert(f1.applied && f1.batchRows == 3L, f1.toString)
    assert(DedupStore.storedDocIds(spark, t).as[(Long, Long)].collect().toSet ==
      Set(101L -> 1L, 105L -> 1L))
    // one row per (doc, band)
    assert(spark.table(t).groupBy("doc_id").count()
      .as[(Long, Long)].collect().toMap.values.toSet == Set(4L))

    // batch 2: 202 dups stored content (dropped), 204/206/208 a fresh
    // within-batch cluster (204 keeps)
    val f2 = DedupStore.maintain(spark, t,
      df(202L -> textA, 204L -> textC, 206L -> textC, 208L -> textC),
      "doc_id", "text", epochId = Some(2L))
    assert(f2.applied && f2.batchRows == 4L,
      "batchRows rides the incoming batch, not the survivors: " + f2)
    assert(DedupStore.storedDocIds(spark, t).as[(Long, Long)].collect().toSet ==
      Set(101L -> 1L, 105L -> 1L, 204L -> 2L))
  }

  test("epoch fence: same-epoch replay no-ops, older epoch throws") {
    val t = table("t_fence")
    spark.sql(s"DROP TABLE IF EXISTS $t")
    assert(DedupStore.maintain(spark, t, df(1L -> textA), "doc_id", "text",
      epochId = Some(10L)).applied)
    val skip = DedupStore.maintain(spark, t, df(2L -> textB), "doc_id", "text",
      epochId = Some(10L))
    assert(!skip.applied && skip.batchRows == 0L, "same-epoch replay must skip")
    assert(DedupStore.storedDocIds(spark, t).as[(Long, Long)].collect().toSet ==
      Set(1L -> 10L), "skipped fold must leave the store untouched")
    val e = intercept[IllegalStateException] {
      DedupStore.maintain(spark, t, df(3L -> textC), "doc_id", "text",
        epochId = Some(9L))
    }
    assert(e.getMessage.contains("OLDER"))
  }

  test("unfenced exact replay converges: every doc matches its own stored self") {
    val t = table("t_replay")
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val batch = df(1L -> textA, 2L -> textB)
    assert(DedupStore.maintain(spark, t, batch, "doc_id", "text").applied)
    val first = spark.table(t).orderBy("doc_id", "band_idx").collect().toSeq
    assert(DedupStore.maintain(spark, t, batch, "doc_id", "text").applied,
      "unfenced fold applies ...")
    assert(spark.table(t).orderBy("doc_id", "band_idx").collect().toSeq == first,
      "... but appends nothing — the batch deduped against itself in the store")
  }

  /** A long doc and a one-word-off variant chosen so they share SOME
    * but not ALL LSH bands (deterministic under XxHash — searched once
    * per run over 50 fixed candidates, so a hash-family change
    * self-heals instead of silently testing nothing).
    */
  private lazy val (long1, long2) = {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val stem = (1 to 39).map(i => s"tok$i").mkString(" ")
    val cands = (1 to 50).map(k => stem + s" changed$k")
    val rows = Dedup.withMinhashBands(
      df((1L -> base) +: cands.zipWithIndex.map {
        case (c, i) => (i + 2L) -> c }: _*), "text", 3, 16, 4)
      .select("doc_id", "band_0", "band_1", "band_2", "band_3")
      .collect().map(r => r.getLong(0) -> (1 to 4).map(r.getString)).toMap
    val pick = cands.zipWithIndex.find { case (_, i) =>
      val (a, b) = (rows(1L), rows(i + 2L))
      a != b && a.zip(b).exists { case (x, y) => x == y }
    }
    assert(pick.nonEmpty, "no candidate shares some-but-not-all bands")
    (base, pick.get._1)
  }

  test("jaccard threshold separates near-dups from shared-band false friends") {
    long1 // force the fixture search (and its some-but-not-all assert)

    val strict = table("t_thresh_strict")
    spark.sql(s"DROP TABLE IF EXISTS $strict")
    DedupStore.maintain(spark, strict, df(1L -> long1, 2L -> long2),
      "doc_id", "text", jaccardThreshold = 0.99)
    assert(DedupStore.storedDocIds(spark, strict).as[(Long, Long)]
      .collect().map(_._1).toSet == Set(1L, 2L),
      "threshold 0.99: the banded collision fails the verify — both kept")

    val loose = table("t_thresh_loose")
    spark.sql(s"DROP TABLE IF EXISTS $loose")
    DedupStore.maintain(spark, loose, df(1L -> long1, 2L -> long2),
      "doc_id", "text", jaccardThreshold = 0.5)
    assert(DedupStore.storedDocIds(spark, loose).as[(Long, Long)]
      .collect().map(_._1).toSet == Set(1L),
      "threshold 0.5: the variant verifies as a near-dup — keeper only")
  }

  test("cross-batch near-dup (not exact) is dropped by the store probe's verify") {
    val t = table("t_probe_verify")
    spark.sql(s"DROP TABLE IF EXISTS $t")
    DedupStore.maintain(spark, t, df(1L -> long1), "doc_id", "text",
      jaccardThreshold = 0.5, epochId = Some(1L))
    DedupStore.maintain(spark, t, df(2L -> long2, 3L -> textB), "doc_id", "text",
      jaccardThreshold = 0.5, epochId = Some(2L))
    assert(DedupStore.storedDocIds(spark, t).as[(Long, Long)].collect().toSet ==
      Set(1L -> 1L, 3L -> 2L))
  }

  test("epoch fence reads the table property, not a store scan; legacy stores fall back") {
    val t = table("t_epoch_prop")
    spark.sql(s"DROP TABLE IF EXISTS $t")
    assert(DedupStore.maintain(spark, t, df(1L -> textA), "doc_id", "text",
      epochId = Some(5L)).applied)
    assert(DedupStore.committedEpoch(spark, t).contains(5L))
    // the property — not the data — is the fence's source of truth:
    // bump it past the stored rows' max(_epoch) and the fence follows
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES " +
      s"('${DedupStore.EpochProperty}' = '7')")
    assert(DedupStore.committedEpoch(spark, t).contains(7L),
      "a 5-row store scan would have said 5")
    assert(!DedupStore.maintain(spark, t, df(2L -> textB), "doc_id", "text",
      epochId = Some(7L)).applied, "fence must honor the property epoch")
    // legacy store (pre-property): unset → one-time max(_epoch) scan
    spark.sql(s"ALTER TABLE $t UNSET TBLPROPERTIES " +
      s"('${DedupStore.EpochProperty}')")
    assert(DedupStore.committedEpoch(spark, t).contains(5L),
      "property absent must fall back to the data scan")
    // and the next applied fold re-stamps the property
    assert(DedupStore.maintain(spark, t, df(3L -> textC), "doc_id", "text",
      epochId = Some(8L)).applied)
    assert(DedupStore.committedEpoch(spark, t).contains(8L))
  }

  test("bucket-spec drift refuses up front with the store's own diagnostic") {
    val t = table("t_bucket_drift")
    spark.sql(s"DROP TABLE IF EXISTS $t")
    DedupStore.maintain(spark, t, df(1L -> textA), "doc_id", "text",
      storeBuckets = 4, epochId = Some(1L))
    val e = intercept[IllegalArgumentException] {
      DedupStore.maintain(spark, t, df(2L -> textB), "doc_id", "text",
        storeBuckets = 0, epochId = Some(2L))
    }
    assert(e.getMessage.contains("storeBuckets=0") &&
      e.getMessage.contains("4 buckets"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      DedupStore.maintain(spark, t, df(2L -> textB), "doc_id", "text",
        storeBuckets = 8, epochId = Some(2L))
    }
    assert(e2.getMessage.contains("storeBuckets=8"), e2.getMessage)
    // the store's own setting still folds
    assert(DedupStore.maintain(spark, t, df(2L -> textB), "doc_id", "text",
      storeBuckets = 4, epochId = Some(2L)).applied)
  }

  test("compaction preserves the epoch property (graft.* TBLPROPERTIES survive the rewrite)") {
    val t = table("t_compact_epoch")
    spark.sql(s"DROP TABLE IF EXISTS $t")
    DedupStore.maintain(spark, t, df(1L -> textA, 2L -> textB),
      "doc_id", "text", storeBuckets = 4, epochId = Some(3L))
    assert(DedupStore.committedEpoch(spark, t).contains(3L))
    Maintenance.compact(spark, t)
    // saveAsTable(Overwrite) recreates the table; without the re-stamp
    // the O(1) fence silently degrades to the legacy data scan — and
    // the shipped corpus config compacts the store EVERY run
    assert(spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier(t))
      .properties.get(DedupStore.EpochProperty).contains("3"),
      "compact must carry graft.* table properties through the rewrite")
    assert(DedupStore.committedEpoch(spark, t).contains(3L))
    // and the fence still works post-compaction
    assert(!DedupStore.maintain(spark, t, df(9L -> textC), "doc_id", "text",
      storeBuckets = 4, epochId = Some(3L)).applied)
  }

  test("identity guard: a stored doc_id never appends twice, even with changed content") {
    val t = table("t_identity")
    spark.sql(s"DROP TABLE IF EXISTS $t")
    DedupStore.maintain(spark, t, df(1L -> textA, 2L -> textB),
      "doc_id", "text", epochId = Some(1L))
    // id 1 re-delivered with COMPLETELY different content: without the
    // guard it would append a second set of band rows under the same id
    DedupStore.maintain(spark, t, df(1L -> textC), "doc_id", "text",
      epochId = Some(2L))
    assert(spark.table(t).filter(col("doc_id") === 1L).count() == 4L,
      "one band-row set per doc id, ever")
    assert(DedupStore.storedDocIds(spark, t).as[(Long, Long)]
      .collect().toSet == Set(1L -> 1L, 2L -> 1L))
  }

  test("crash-retry converges: a stale epoch property re-runs the fold without duplicating") {
    val t = table("t_crash_retry")
    spark.sql(s"DROP TABLE IF EXISTS $t")
    DedupStore.maintain(spark, t, df(1L -> textA, 2L -> textB),
      "doc_id", "text", epochId = Some(5L))
    val committed = spark.table(t).orderBy("doc_id", "band_idx").collect().toSeq
    // simulate a crash BETWEEN the append and the property stamp: the
    // data carries epoch 5 but the property says 4
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES " +
      s"('${DedupStore.EpochProperty}' = '4')")
    // the operator's same-date retry re-runs (the fence can't know) —
    // and must converge: every doc matches its stored self
    val r = DedupStore.maintain(spark, t, df(1L -> textA, 2L -> textB),
      "doc_id", "text", epochId = Some(5L))
    assert(r.applied, "a stale property re-runs the fold (documented window)")
    assert(spark.table(t).orderBy("doc_id", "band_idx").collect().toSeq ==
      committed, "the retry must append nothing")
    assert(DedupStore.committedEpoch(spark, t).contains(5L),
      "the retry re-stamps the property")
  }

  test("no staging scratch survives a fold (founding or append)") {
    // r20: append folds sever the read-own-table cycle with an eager
    // localCheckpoint instead of the __maint_stage parquet round-trip —
    // no fold may leave survivor band rows duplicated next to the store
    val t = table("t_scratch")
    spark.sql(s"DROP TABLE IF EXISTS $t")
    DedupStore.maintain(spark, t, df(1L -> textA), "doc_id", "text",
      epochId = Some(1L))
    DedupStore.maintain(spark, t, df(2L -> textB), "doc_id", "text",
      epochId = Some(2L))
    val scratch = new org.apache.hadoop.fs.Path(
      s"${spark.conf.get("spark.sql.warehouse.dir")}/__maint_stage/" +
        t.replace('.', '_'))
    val fs = scratch.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(scratch),
      "survivor band rows must not stay duplicated next to the store")
  }

  test("store shape guard refuses a foreign table") {
    val t = table("t_wrong_shape")
    spark.sql(s"DROP TABLE IF EXISTS $t")
    Seq((1L, "x")).toDF("k", "v").write.saveAsTable(t)
    val e = intercept[IllegalArgumentException] {
      DedupStore.maintain(spark, t, df(1L -> textA), "doc_id", "text")
    }
    assert(e.getMessage.contains("not a dedup store"))
  }

  test("bucketed store: folds agree with unbucketed, store-side reads need no shuffle") {
    val plain = table("t_plain")
    val bucketed = table("t_bucketed")
    Seq(plain, bucketed).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    val b1 = df(101L -> textA, 103L -> textA, 105L -> textB)
    val b2 = df(202L -> textA, 204L -> textC)
    Seq(b1, b2).zipWithIndex.foreach { case (b, i) =>
      DedupStore.maintain(spark, plain, b, "doc_id", "text",
        epochId = Some(i + 1L))
      DedupStore.maintain(spark, bucketed, b, "doc_id", "text",
        storeBuckets = 4, epochId = Some(i + 1L))
    }
    assert(DedupStore.storedDocIds(spark, bucketed).as[(Long, Long)]
      .collect().toSet ==
      DedupStore.storedDocIds(spark, plain).as[(Long, Long)].collect().toSet)
    // HashPartitioning(band_key) from the bucket spec satisfies a
    // band_key-clustered distribution without an Exchange — the pin
    // that the store side of every future probe join stays shuffle-free
    val agg = spark.table(bucketed).groupBy("band_key").count()
    val physical = agg.queryExecution.executedPlan.toString
    assert(!physical.contains("Exchange"),
      s"bucketed store scan must not shuffle:\n$physical")
    val unbucketedAgg = spark.table(plain).groupBy("band_key").count()
    assert(unbucketedAgg.queryExecution.executedPlan.toString.contains("Exchange"),
      "control: the unbucketed twin DOES shuffle")
  }

  test("knob drift refuses: frozen shingle/hash/band settings gate folds AND probes") {
    val t = table("t_knob_drift")
    spark.sql(s"DROP TABLE IF EXISTS $t")
    DedupStore.maintain(spark, t, df(1L -> textA), "doc_id", "text",
      epochId = Some(1L))
    assert(intercept[IllegalArgumentException] {
      DedupStore.maintain(spark, t, df(2L -> textB), "doc_id", "text",
        shingleN = 5, epochId = Some(2L))
    }.getMessage.contains("frozen fold settings"))
    assert(intercept[IllegalArgumentException] {
      DedupStore.probeHits(spark, t, df(10L -> textA), "doc_id", "text",
        numHashes = 8, bands = 4)
    }.getMessage.contains("frozen fold settings"))
    // matching settings: the probe is a pure read that finds the dup
    assert(DedupStore.probeHits(spark, t, df(10L -> textA),
      "doc_id", "text").as[Long].collect().toSet == Set(10L))
    assert(DedupStore.storedDocIds(spark, t).count() == 1L,
      "a probe must never append")
  }

  test("fold order changes keepers but never the dedup invariant (exact-dup corpus)") {
    val fwd = table("t_order_fwd")
    val rev = table("t_order_rev")
    Seq(fwd, rev).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    val b1 = df(1L -> textA, 3L -> textB)
    val b2 = df(2L -> textA, 4L -> textC)
    DedupStore.maintain(spark, fwd, b1, "doc_id", "text", epochId = Some(1L))
    DedupStore.maintain(spark, fwd, b2, "doc_id", "text", epochId = Some(2L))
    DedupStore.maintain(spark, rev, b2, "doc_id", "text", epochId = Some(1L))
    DedupStore.maintain(spark, rev, b1, "doc_id", "text", epochId = Some(2L))
    val all = b1.unionByName(b2)
    for (t <- Seq(fwd, rev)) {
      val kept = DedupStore.storedDocIds(spark, t).select("doc_id")
      val texts = all.join(kept, "doc_id")
        .select("text").as[String].collect().toSeq
      assert(texts.distinct.size == texts.size,
        s"$t: stored docs must never contain dups of each other")
      assert(texts.toSet == Set(textA, textB, textC),
        s"$t: every distinct content must have exactly one representative")
    }
    // first-folded batch wins the representative for shared content
    assert(DedupStore.storedDocIds(spark, fwd).as[(Long, Long)]
      .collect().map(_._1).toSet == Set(1L, 3L, 4L))
    assert(DedupStore.storedDocIds(spark, rev).as[(Long, Long)]
      .collect().map(_._1).toSet == Set(2L, 3L, 4L))
  }

  test("keeper policies: max_quality keeps the best member, min_id the smallest id") {
    def qdf(rows: (Long, String, Double)*) =
      rows.toDF("doc_id", "text", "quality")
    // a planted high-quality-duplicate cluster: 103 carries the best
    // quality but NOT the smallest id — the two policies must diverge
    val batch = qdf((101L, textA, 0.2), (103L, textA, 0.9),
      (105L, textB, 0.5))
    val tMin = table("t_keeper_min")
    val tQ = table("t_keeper_q")
    Seq(tMin, tQ).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    DedupStore.maintain(spark, tMin, batch, "doc_id", "text",
      epochId = Some(1L))
    DedupStore.maintain(spark, tQ, batch, "doc_id", "text",
      epochId = Some(1L), keeper = "max_quality",
      qualityCol = Some("quality"))
    assert(DedupStore.storedDocIds(spark, tMin).as[(Long, Long)]
      .collect().map(_._1).toSet == Set(101L, 105L))
    assert(DedupStore.storedDocIds(spark, tQ).as[(Long, Long)]
      .collect().map(_._1).toSet == Set(103L, 105L),
      "max_quality must keep the planted cluster's best member")
    // the quality column never enters the store schema
    assert(spark.table(tQ).columns.sorted.toSeq ==
      Seq("_epoch", "band_idx", "band_key", "doc_id", "sh"))
    // guards: unknown keeper; max_quality without the column; a
    // column with min_id; a column missing from the batch
    assert(intercept[IllegalArgumentException] {
      DedupStore.maintain(spark, tQ, batch, "doc_id", "text",
        keeper = "best_effort")
    }.getMessage.contains("keeper"))
    assert(intercept[IllegalArgumentException] {
      DedupStore.maintain(spark, tQ, batch, "doc_id", "text",
        keeper = "max_quality")
    }.getMessage.contains("needs qualityCol"))
    assert(intercept[IllegalArgumentException] {
      DedupStore.maintain(spark, tQ, batch, "doc_id", "text",
        qualityCol = Some("quality"))
    }.getMessage.contains("only used by keeper max_quality"))
    assert(intercept[IllegalArgumentException] {
      DedupStore.maintain(spark, tQ, batch.drop("quality"), "doc_id",
        "text", keeper = "max_quality", qualityCol = Some("quality"))
    }.getMessage.contains("not in the batch"))
  }

  test("read-path knob check is never vacuous: a property-less store refuses the probe") {
    val t = table("t_probe_noprop")
    spark.sql(s"DROP TABLE IF EXISTS $t")
    DedupStore.maintain(spark, t, df(1L -> textA), "doc_id", "text",
      epochId = Some(1L))
    // simulate a pre-property store: the fold stamped the knobs, strip
    // them — the probe must refuse (the fold would pass once and
    // re-stamp; the probe has no stamping step, so a vacuous pass
    // would silently match nothing on mismatched knobs)
    spark.sql(s"ALTER TABLE $t UNSET TBLPROPERTIES " +
      s"('${DedupStore.KnobsProperty}')")
    val e = intercept[IllegalArgumentException] {
      DedupStore.probeHits(spark, t, df(10L -> textA), "doc_id", "text")
    }
    assert(e.getMessage.contains(DedupStore.KnobsProperty) &&
      e.getMessage.contains("run one fold"), e.getMessage)
    // one fold re-stamps; the probe works again
    DedupStore.maintain(spark, t, df(2L -> textB), "doc_id", "text",
      epochId = Some(2L))
    assert(DedupStore.probeHits(spark, t, df(10L -> textA),
      "doc_id", "text").as[Long].collect().toSet == Set(10L))
  }

  test("probe refuses a foreign table with a named error, not a missing-column crash") {
    val t = table("t_probe_foreign")
    spark.sql(s"DROP TABLE IF EXISTS $t")
    Seq((1L, "x")).toDF("k", "v").write.mode("overwrite").saveAsTable(t)
    assert(intercept[IllegalArgumentException] {
      DedupStore.probeHits(spark, t, df(10L -> textA), "doc_id", "text")
    }.getMessage.contains("not a dedup store"))
    assert(intercept[IllegalArgumentException] {
      DedupStore.probeHits(spark, table("t_probe_nonexistent"),
        df(10L -> textA), "doc_id", "text")
    }.getMessage.contains("no such table"))
  }

  test("verify threshold is stamped informationally: divergent probes warn but run") {
    val t = table("t_probe_verify")
    spark.sql(s"DROP TABLE IF EXISTS $t")
    DedupStore.maintain(spark, t, df(1L -> textA), "doc_id", "text",
      jaccardThreshold = 0.5, epochId = Some(1L))
    val meta = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier(t))
    assert(meta.properties.get(DedupStore.VerifyProperty)
      .contains("jaccardThreshold=0.5"))
    // a matching probe produces no divergence message
    assert(DedupStore.warnVerifyDivergence(spark, t,
      DedupStore.VerifyProperty, "jaccardThreshold=0.5", "store probe")
      .isEmpty)
    // a divergent threshold WARNS (returned + logged) and the probe
    // still answers its looser membership question
    assert(DedupStore.warnVerifyDivergence(spark, t,
      DedupStore.VerifyProperty, "jaccardThreshold=0.0", "store probe")
      .exists(_.contains("diverge")))
    assert(DedupStore.probeHits(spark, t, df(10L -> textA), "doc_id",
      "text", jaccardThreshold = 0.0).as[Long].collect().toSet == Set(10L))
  }
}
