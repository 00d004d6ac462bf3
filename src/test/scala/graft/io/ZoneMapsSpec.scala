package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZoneMapsSpec extends SparkSpec {
  import spark.implicits._

  private def table(name: String): String = {
    spark.sql("CREATE DATABASE IF NOT EXISTS zm_test")
    val t = s"zm_test.$name"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    t
  }

  test("range-clustered layout: pruned scan reads few files, returns exactly the filtered rows") {
    val t = table("t_clustered")
    spark.range(1, 10001).toDF("k")
      .withColumn("v", col("k") * 7 % 101)
      .repartitionByRange(8, col("k"))
      .write.saveAsTable(t)
    assert(spark.table(t).inputFiles.length == 8, "setup: 8 range files")
    val (mt, nFiles) = ZoneMaps.writeManifest(spark, t, Seq("k"))
    assert(nFiles == 8L)
    val (df, read, total) = ZoneMaps.prunedScan(spark, t, mt, "k", 2000L, 2400L)
    assert(total == 8 && read <= 2,
      s"a 4% range over 8 range-clustered files must prune most: read $read")
    val want = spark.table(t).filter($"k" >= 2000 && $"k" <= 2400)
      .as[(Long, Long)].collect().toSet
    assert(df.as[(Long, Long)].collect().toSet == want,
      "pruned scan must return exactly the full scan's filtered rows")
  }

  test("unclustered layout: zones prune nothing but results stay identical (zones are safe, not magic)") {
    val t = table("t_shuffled")
    spark.range(1, 2001).toDF("k")
      .repartition(6) // round-robin: every file spans ~the full range
      .write.saveAsTable(t)
    val (mt, _) = ZoneMaps.writeManifest(spark, t, Seq("k"))
    val (df, read, total) = ZoneMaps.prunedScan(spark, t, mt, "k", 500L, 600L)
    assert(read == total, "round-robin zones overlap everything")
    assert(df.as[Long].collect().toSet ==
      (500L to 600L).toSet, "results identical regardless of layout")
  }

  test("a disjoint probe range reads zero files and returns an empty, correctly-typed frame") {
    val t = table("t_empty")
    spark.range(1, 101).toDF("k").write.saveAsTable(t)
    val (mt, _) = ZoneMaps.writeManifest(spark, t, Seq("k"))
    val (df, read, _) = ZoneMaps.prunedScan(spark, t, mt, "k", 5000L, 6000L)
    assert(read == 0 && df.count() == 0)
    assert(df.schema == spark.table(t).schema)
  }

  test("compact(clusterBy) produces the layout pruning rewards: shuffled table -> pruned scans") {
    val t = table("t_recluster")
    // round-robin layout first: zones overlap everything
    spark.range(1, 10001).toDF("k").withColumn("v", col("k") % 13)
      .repartition(8).write.saveAsTable(t)
    val (mt0, _) = ZoneMaps.writeManifest(spark, t, Seq("k"))
    val (_, read0, total0) = ZoneMaps.prunedScan(spark, t, mt0, "k", 2000L, 2400L)
    assert(read0 == total0, "setup: shuffled zones must not prune")
    // range-clustering compaction + a fresh manifest turn the same
    // probe into a few-file read, rows intact
    val rowsBefore = spark.table(t).as[(Long, Long)].collect().toSet
    Maintenance.compact(spark, t, targetRowsPerFile = 1250, clusterBy = Seq("k"))
    assert(spark.table(t).as[(Long, Long)].collect().toSet == rowsBefore)
    val (mt1, nf) = ZoneMaps.writeManifest(spark, t, Seq("k"))
    val (df, read1, _) = ZoneMaps.prunedScan(spark, t, mt1, "k", 2000L, 2400L)
    assert(read1 <= 2 && nf >= 6,
      s"a 4% range over the re-clustered files must prune: $read1 of $nf")
    assert(df.as[(Long, Long)].collect().toSet ==
      rowsBefore.filter(r => r._1 >= 2000 && r._1 <= 2400))
    // clusterBy fights a partition/bucket spec: refused, never reordered
    val tp = table("t_recluster_part")
    spark.range(1, 101).toDF("k").withColumn("p", col("k") % 2)
      .write.partitionBy("p").saveAsTable(tp)
    val e = intercept[IllegalArgumentException] {
      Maintenance.compact(spark, tp, 50, clusterBy = Seq("k"))
    }
    assert(e.getMessage.contains("unpartitioned"), e.getMessage)
  }

  test("a stale manifest is refused, never silently wrong") {
    val t = table("t_stale")
    spark.range(1, 101).toDF("k").write.saveAsTable(t)
    val (mt, _) = ZoneMaps.writeManifest(spark, t, Seq("k"))
    Seq(999L).toDF("k").write.mode("append").saveAsTable(t)
    val e = intercept[IllegalArgumentException] {
      ZoneMaps.prunedScan(spark, t, mt, "k", 1L, 50L)
    }
    assert(e.getMessage.contains("STALE"), e.getMessage)
    // rebuild heals it — and the appended file is visible again
    val (mt2, _) = ZoneMaps.writeManifest(spark, t, Seq("k"))
    val (df, _, _) = ZoneMaps.prunedScan(spark, t, mt2, "k", 900L, 1000L)
    assert(df.as[Long].collect().toSeq == Seq(999L))
  }

  test("refreshManifest scans only the appended files; result identical to a rebuild") {
    val t = table("t_refresh")
    spark.range(1, 1001).toDF("k")
      .repartitionByRange(4, col("k")).write.saveAsTable(t)
    val (mt, scanned0, rows0) = ZoneMaps.refreshManifest(spark, t, Seq("k"))
    assert(scanned0 == 4L && rows0 == 4L, "no manifest yet: full build")
    // append two new range files; the refresh must scan ONLY those
    spark.range(1001, 1501).toDF("k")
      .repartitionByRange(2, col("k")).write.mode("append").saveAsTable(t)
    val (_, scanned1, rows1) = ZoneMaps.refreshManifest(spark, t, Seq("k"))
    assert(scanned1 == 2L, s"refresh must scan only the 2 appends, got $scanned1")
    assert(rows1 == 6L)
    // identical to a from-scratch rebuild (zones are a pure function of
    // the immutable file bytes)
    val rebuilt = ZoneMaps.buildManifest(spark, t, Seq("k"))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(spark.table(mt).as[(String, Long, Long, Long)].collect().toSet
      == rebuilt)
    // and the refreshed manifest serves pruned scans (stale check passes)
    val (df, read, total) = ZoneMaps.prunedScan(spark, t, mt, "k", 1100L, 1200L)
    assert(total == 6 && read <= 1, s"the probe hits one appended file: $read")
    assert(df.as[Long].collect().toSet == (1100L to 1200L).toSet)
  }

  test("refreshManifest drops rows of files a compaction removed; zone-column change rebuilds") {
    val t = table("t_refresh_compact")
    spark.range(1, 2001).toDF("k").withColumn("v", col("k") % 13)
      .repartition(6).write.saveAsTable(t)
    ZoneMaps.refreshManifest(spark, t, Seq("k"))
    // a range-clustering compaction replaces the entire file set: every
    // old manifest row must drop, every new file must scan — ghost rows
    // for vanished files would poison the stale check forever
    Maintenance.compact(spark, t, targetRowsPerFile = 500, clusterBy = Seq("k"))
    val (mt, scanned, rows) = ZoneMaps.refreshManifest(spark, t, Seq("k"))
    val nowFiles = spark.table(t).inputFiles.toSet
    assert(scanned == nowFiles.size.toLong && rows == nowFiles.size.toLong,
      s"all $scanned new, $rows manifest rows vs ${nowFiles.size} files")
    assert(spark.table(mt).select("file").as[String].collect().toSet
      == nowFiles, "no ghost rows for compacted-away files")
    val (df, read, _) = ZoneMaps.prunedScan(spark, t, mt, "k", 100L, 200L)
    assert(read <= 2 && df.count() == 101)
    // changing the zone-column set invalidates every row: full rebuild
    val (_, scanned2, _) = ZoneMaps.refreshManifest(spark, t, Seq("k", "v"))
    assert(scanned2 == nowFiles.size.toLong,
      "a different column set must rebuild from scratch")
    assert(spark.table(mt).columns.toSeq ==
      Seq("file", "n_rows", "min_k", "max_k", "min_v", "max_v"))
  }

  test("a zero-row data file is covered: manifest matches inputFiles, never perpetually stale") {
    // an empty-DataFrame write leaves a schema-only part file that the
    // row aggregation can never see — without explicit coverage the
    // manifest's file set never equals inputFiles, every prunedScan
    // refuses STALE forever, and refresh re-scans the file every run
    val t = table("t_zero_row")
    Seq.empty[Long].toDF("k").write.saveAsTable(t)
    Seq(1L, 2L).toDF("k").write.mode("append").saveAsTable(t)
    val files = spark.table(t).inputFiles.toSet
    val (mt, _, rows) = ZoneMaps.refreshManifest(spark, t, Seq("k"))
    assert(spark.table(mt).select("file").as[String].collect().toSet == files,
      "every input file needs a manifest row or the stale check jams")
    assert(rows == files.size.toLong)
    val (df, read, total) = ZoneMaps.prunedScan(spark, t, mt, "k", 1L, 2L)
    assert(df.as[Long].collect().toSet == Set(1L, 2L))
    if (files.size > 1)
      assert(read < total, "the zero-row file's null zones must prune away")
    // nothing new: the covered empty file is NOT re-scanned every run
    val (_, scanned2, _) = ZoneMaps.refreshManifest(spark, t, Seq("k"))
    assert(scanned2 == 0L)
  }

  test("a partitioned table is refused: partition values live in directory names") {
    // a direct leaf-file read fills partition columns with NULL — the
    // manifest build and the pruned scan must both refuse, never
    // silently return wrong rows (partitioned tables already have
    // directory pruning)
    val t = table("t_partitioned")
    Seq((1L, "a"), (2L, "b")).toDF("k", "p")
      .write.partitionBy("p").saveAsTable(t)
    val eBuild = intercept[IllegalArgumentException] {
      ZoneMaps.buildManifest(spark, t, Seq("k"))
    }
    assert(eBuild.getMessage.contains("partitioned by [p]"), eBuild.getMessage)
    val eScan = intercept[IllegalArgumentException] {
      ZoneMaps.prunedScan(spark, t, "zm_test.no_such_manifest", "k", 1L, 2L)
    }
    assert(eScan.getMessage.contains("partitioned by [p]"), eScan.getMessage)
  }

  test("an all-null zone prunes away under a range predicate — correctly") {
    val t = table("t_nulls")
    Seq[Option[Long]](None, None).toDF("k")
      .write.saveAsTable(t)
    Seq[Option[Long]](Some(5L), Some(7L)).toDF("k")
      .write.mode("append").saveAsTable(t)
    val (mt, _) = ZoneMaps.writeManifest(spark, t, Seq("k"))
    val (df, read, total) = ZoneMaps.prunedScan(spark, t, mt, "k", 1L, 10L)
    assert(read < total, "the all-null file must prune")
    assert(df.as[Option[Long]].collect().flatten.toSet == Set(5L, 7L),
      "no range predicate matches NULL, so dropping the null file is exact")
  }
}
