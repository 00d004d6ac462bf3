package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-18 rehearsal: measured numbers for BASELINE §Round 18.
  *
  *  1. tw6 maxDf SENSITIVITY (round-17 verdict item 7): the growth
  *     bracket is 0.38 (organic jitter) to 1.08 (verbatim copies); the
  *     open question is whether the CAP (maxDf · Σ df pair mass) or
  *     the organic posting mass dominates the upper bound. Sweep maxDf
  *     1000 → 2000 → 4000 over the SAME 10× jittered corpus: if time
  *     scales ~linearly with maxDf the cap is the binding term (re-tune
  *     rule: maxDf is a PAIR-MASS budget — hold maxDf · Σ df roughly
  *     constant as the corpus grows); if it barely moves, the posting
  *     mass below the cap dominates and the cap only clips outliers.
  *  2. store read paths vs store mass (with round-17 item 3): probeHits
  *     of a FIXED 5k batch against 50k- vs 500k-row vector and media
  *     stores — claim: the READ path inherits the fold's cost model
  *     (store-side columnar scan + equi join; store-mass exponent well
  *     under 1), so a pre-ingest novelty gate stays batch-bound.
  *  3. bandOccupancyStats at 10× store mass (round-17 item 4): the
  *     banded drift signal must cost a small fraction of the fold it
  *     tunes — the number that makes a nightly banded `store_stats`
  *     honest.
  *  4. TEXT keeper A/B at equal batch (round-17 item 2): max_quality
  *     adds one cluster-partitioned window over DUPLICATE mass only —
  *     claim: within noise of min_id at equal survivor cardinality.
  *
  * Usage: Test/runMain graft.ProfileR18Scale [section ...]
  * (sections: tw6 probes stats keeper; default all — name one to
  * re-measure it in isolation, e.g. after its first pass absorbed the
  * setup churn of an earlier section)
  */
object ProfileR18Scale {
  def main(args: Array[String]): Unit = {
    val sect: String => Boolean =
      s => args.isEmpty || args.contains(s)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        s"${sys.props("user.dir")}/target/r18-warehouse-${System.nanoTime()}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sql("CREATE DATABASE IF NOT EXISTS r18")

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def med3(f: => Double): Double = Seq(f, f, f).sorted.apply(1)
    def expo(t1: Double, t10: Double): Double =
      math.log(t10 / t1) / math.log(10.0)

    // --- 1. tw6 maxDf sweep over the 10x jittered corpus ------------
    // same jitter scheme as ProfileR17Scale: per-replica vowel
    // rotation keeps replica vocabularies (mostly) disjoint
    if (sect("tw6")) {
    val rots = Seq("aeiou", "bfjpv", "cgkqw", "dhlrx", "fmnsy",
      "gjptz", "hkqwb", "lmrxc", "npsyd", "qrtzf")
    val docs = Tables.load(spark, "/root/testdata/sf0.1", "documents")
    val dir10 = s"${sys.props("user.dir")}/target/r18-tw6-10x"
    (0 until 10).map { r =>
      docs.select((col("doc_id") + lit(r * 100000000L)).as("doc_id"),
        translate(col("text"), "aeiou", rots(r)).as("text"),
        col("source"), col("lang"), col("n_chars"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$dir10/documents.parquet")
    val docs10 = Tables.load(spark, dir10, "documents")
    for (maxDf <- Seq(1000L, 2000L, 4000L)) {
      val secs = med3(time(
        graft.operators.SparseSim.cosinePairs(docs10, "doc_id", "text",
            n = 3, maxDf = maxDf, minCosMicro = 200000L)
          .agg(sum("cos_micro"), sum("n_shared")).collect())._2)
      println(f"[r18] tw6 10x corpus, maxDf=$maxDf: $secs%.2f s")
    }
    }

    def hashBatch(n: Long, off: Long) =
      spark.range(n).select((col("id") + off).as("media_id"),
        xxhash64(col("id") + off).as("dhash"))

    // --- 2. read paths vs store mass --------------------------------
    if (sect("probes")) {
    // vector: found at n rows (orthogonal-ish hash codes, matches rare
    // so the probe prices the scan+join, not survivor churn)
    def massVecs(n: Long, off: Long) =
      spark.range(n).select((col("id") + off).as("vec_id"),
        transform(sequence(lit(0), lit(63)), j =>
          (pmod(xxhash64(col("id") + off, j), lit(2000)) - 1000)
            .cast("float")).as("embedding"))
    var vecTimes = List.empty[Double]
    for ((n, tag) <- Seq(50000L -> "1x", 500000L -> "10x")) {
      val t = s"r18.vecstore_$tag"
      spark.sql(s"DROP TABLE IF EXISTS $t")
      spark.sql(s"DROP TABLE IF EXISTS ${t}_model")
      graft.io.VectorDedupStore.maintain(spark, t, massVecs(n, 0L),
        "vec_id", "embedding", minScore = Long.MaxValue,
        numCentroids = 64, epochId = Some(1L)): Unit
      // warm-up probe (JIT + file listing), then timed med3
      graft.io.VectorDedupStore.probeHits(spark, t,
        massVecs(5000L, 900000000L), "vec_id", "embedding",
        minScore = 150000L).count(): Unit
      val secs = med3(time(graft.io.VectorDedupStore.probeHits(spark, t,
        massVecs(5000L, 900000000L), "vec_id", "embedding",
        minScore = 150000L).count())._2)
      vecTimes ::= secs
      println(f"[r18] vector probeHits (5k batch, $tag store): $secs%.2f s")
    }
    println(f"[r18] vector probe store-mass exponent: " +
      f"${expo(vecTimes(1), vecTimes(0))}%.2f")

    // media: same shape on 64-bit hashes
    var mediaTimes = List.empty[Double]
    for ((n, tag) <- Seq(50000L -> "1x", 500000L -> "10x")) {
      val t = s"r18.mediastore_$tag"
      spark.sql(s"DROP TABLE IF EXISTS $t")
      graft.io.MediaDedupStore.maintain(spark, t, hashBatch(n, 0L),
        "media_id", "dhash", epochId = Some(1L)): Unit
      graft.io.MediaDedupStore.probeHits(spark, t,
        hashBatch(5000L, 900000000L), "media_id", "dhash").count(): Unit
      val secs = med3(time(graft.io.MediaDedupStore.probeHits(spark, t,
        hashBatch(5000L, 900000000L), "media_id", "dhash").count())._2)
      mediaTimes ::= secs
      println(f"[r18] media probeHits (5k batch, $tag store): $secs%.2f s")
    }
    println(f"[r18] media probe store-mass exponent: " +
      f"${expo(mediaTimes(1), mediaTimes(0))}%.2f")
    }

    // --- 3. banded store_stats at 10x store mass ---------------------
    if (sect("stats")) {
    // self-provision when run in isolation (review-caught: the
    // warehouse dir is nanoTime-fresh per JVM, so the probes section's
    // store does not survive into a `stats`-only run)
    val t10 = "r18.mediastore_10x"
    if (!spark.catalog.tableExists(t10))
      graft.io.MediaDedupStore.maintain(spark, t10, hashBatch(500000L, 0L),
        "media_id", "dhash", epochId = Some(1L)): Unit
    val statsSecs = med3(time(
      graft.io.DedupStore.bandOccupancyStats(spark, t10, Some(64L)))._2)
    val (_, foldSecs) = time(graft.io.MediaDedupStore.maintain(spark, t10,
      hashBatch(5000L, 950000000L), "media_id", "dhash",
      epochId = Some(2L)))
    println(f"[r18] bandOccupancyStats (500k-row store): $statsSecs%.2f s; " +
      f"one 5k fold: $foldSecs%.2f s")
    }

    // --- 4. TEXT keeper A/B at equal batch ---------------------------
    if (sect("keeper")) {
    // 20k docs: 200 planted near-dup clusters of 100 members each
    // (cluster members share a 40-word body, differ in a 1-word tail
    // so ids/qualities diverge); quality = the member index, so
    // max_quality must keep the HIGHEST index where min_id keeps the
    // lowest — policies provably diverge at equal survivor cardinality
    val protoDocs = spark.range(20000L).select(
      col("id").as("doc_id"),
      concat_ws(" ",
        (0 until 40).map(j =>
          concat(lit(s"w$j"), pmod(col("id"), lit(200)))): _*)
        .as("body"),
      pmod(col("id"), lit(200)).as("cluster"),
      (col("id") / 200L).cast("long").as("member"))
      .select(col("doc_id"),
        concat(col("body"), lit(" tail"), col("member")).as("text"),
        col("member").cast("double").as("quality"))
    for (k <- Seq("min_id", "max_quality")) {
      val t = s"r18.textkeeper_${k}"
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val (_, secs) = time(graft.io.DedupStore.maintain(spark, t,
        protoDocs, "doc_id", "text", jaccardThreshold = 0.5,
        epochId = Some(1L), keeper = k,
        qualityCol = if (k == "max_quality") Some("quality") else None))
      val survivors = graft.io.DedupStore.storedDocIds(spark, t).count()
      println(f"[r18] text keeper=$k fold (20k batch, 200 clusters): " +
        f"$secs%.2f s, $survivors survivors")
    }
    }
    spark.stop()
  }
}
