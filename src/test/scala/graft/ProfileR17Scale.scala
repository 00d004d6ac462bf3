package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-17 rehearsal: measured numbers for BASELINE §Round 17.
  *
  *  1. tw6 DE-CONFOUNDED (round-16 verdict item 6): the sf1-equivalent
  *     disk sweep's one ≥1.0 exponent (1.08) replicated VALUE columns
  *     verbatim, which maximizes duplicate trigram mass (every replica
  *     shares every posting). Here each replica's text is JITTERED by a
  *     per-replica vowel substitution (deterministic `translate`), so
  *     replica vocabularies are (mostly) disjoint — the organic-growth
  *     LOWER bound where posting lists stay replica-local. The true
  *     growth curve sits between the two; a superlinear exponent HERE
  *     would be a real posting-growth trend, not a copy artifact.
  *  2. media store fold vs store mass: fold a FIXED 5k-image batch into
  *     a 50k- vs 500k-image store — claim: fold cost rides the batch
  *     (band-equi probe over a columnar (band, hash) scan; store-mass
  *     exponent well under 1).
  *  3. keeper policy A/B at equal batch: `centroid_farthest` adds one
  *     broadcast k-row join + a cluster-partitioned window over
  *     DUPLICATE mass only — claim: within noise of `min_id`.
  *  4. store_stats vs retrain at 10× store mass: the occupancy spread
  *     (one cell-column aggregate) must cost a small fraction of the
  *     k-means it gates — the number that makes the nightly
  *     `store_stats` + drift-gated `retrain_store` cadence honest.
  *
  * Usage: Test/runMain graft.ProfileR17Scale
  */
object ProfileR17Scale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        s"${sys.props("user.dir")}/target/r17-warehouse-${System.nanoTime()}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sql("CREATE DATABASE IF NOT EXISTS r17")

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def med3(f: => Double): Double = Seq(f, f, f).sorted.apply(1)
    def expo(t1: Double, t10: Double): Double =
      math.log(t10 / t1) / math.log(10.0)

    // --- 1. tw6 with per-replica text jitter -----------------------
    // vowel rotations: replica 0 is the identity; every other replica
    // maps vowels to a distinct consonant set, so almost every word
    // (hence trigram) is replica-local
    val rots = Seq("aeiou", "bfjpv", "cgkqw", "dhlrx", "fmnsy",
      "gjptz", "hkqwb", "lmrxc", "npsyd", "qrtzf")
    val docs = Tables.load(spark, "/root/testdata/sf0.1", "documents")
    def jittered(mult: Int, out: String): Unit = {
      val reps = (0 until mult).map { r =>
        docs.select((col("doc_id") + lit(r * 100000000L)).as("doc_id"),
          translate(col("text"), "aeiou", rots(r)).as("text"),
          col("source"), col("lang"), col("n_chars"))
      }.reduce(_ unionByName _)
      reps.write.mode("overwrite").parquet(s"$out/documents.parquet")
    }
    val base = s"${sys.props("user.dir")}/target/r17-tw6"
    val times = Seq(1, 10).map { mult =>
      val dir = s"$base-${mult}x"
      jittered(mult, dir)
      val q = SparkEntry.queries("tw6_sparse_cosine")
      // force through an aggregate over the computed columns (count()
      // would prune the cosine work)
      val secs = med3(time(
        q(spark, dir).agg(sum("cos_micro"), sum("n_shared")).collect())._2)
      println(f"[r17] tw6 jittered ${mult}x: $secs%.2f s")
      secs
    }
    println(f"[r17] tw6 jittered exponent: ${expo(times(0), times(1))}%.2f " +
      "(vs 1.08 verbatim-copy upper bound, BASELINE round 16)")

    // --- 2. media store: fixed batch vs store mass ------------------
    def hashBatch(n: Long, off: Long) =
      spark.range(n).select((col("id") + off).as("media_id"),
        xxhash64(col("id") + off).as("dhash"))
    for ((n, tag) <- Seq(50000L -> "1x", 500000L -> "10x")) {
      val t = s"r17.media_$tag"
      spark.sql(s"DROP TABLE IF EXISTS $t")
      graft.io.MediaDedupStore.maintain(spark, t, hashBatch(n, 0L),
        "media_id", "dhash", epochId = Some(1L)): Unit
      // warm-up fold (JIT + file listing), then ONE timed fold of a
      // fresh 5k batch — repeated folds would grow the 1x store's mass
      // materially and bias the exponent down
      graft.io.MediaDedupStore.maintain(spark, t,
        hashBatch(5000L, 900000000L), "media_id", "dhash",
        epochId = Some(2L)): Unit
      val (_, secs) = time(graft.io.MediaDedupStore.maintain(spark, t,
        hashBatch(5000L, 950000000L), "media_id", "dhash",
        epochId = Some(3L)))
      println(f"[r17] media store fold (5k batch, $tag store): $secs%.2f s")
    }

    // --- 3. keeper A/B at equal batch ------------------------------
    // 200 prototypes x 100 identical copies; signed codes separate
    // prototypes (cross-dot ~0) from copies (self-dot ~345k)
    def protoVecs(n: Long) = spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)), j =>
        (pmod(xxhash64(pmod(col("id"), lit(200)), j), lit(2000)) - 1000)
          .cast("float")).as("embedding"))
    for (k <- Seq("min_id", "centroid_farthest")) {
      val t = s"r17.keeper_${k}"
      spark.sql(s"DROP TABLE IF EXISTS $t")
      spark.sql(s"DROP TABLE IF EXISTS ${t}_model")
      val (_, secs) = time(graft.io.VectorDedupStore.maintain(spark, t,
        protoVecs(20000L), "vec_id", "embedding", minScore = 150000L,
        numCentroids = 64, epochId = Some(1L), keeper = k))
      val survivors = spark.table(t).count()
      println(f"[r17] keeper=$k fold (20k batch, 200 clusters): " +
        f"$secs%.2f s, $survivors survivors")
    }

    // --- 4. store_stats vs retrain at 10x --------------------------
    def massVecs(n: Long) = spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)), j =>
        (pmod(xxhash64(col("id"), j), lit(2000)) - 1000).cast("float"))
        .as("embedding"))
    val t10 = "r17.stats_10x"
    spark.sql(s"DROP TABLE IF EXISTS $t10")
    spark.sql(s"DROP TABLE IF EXISTS ${t10}_model")
    graft.io.VectorDedupStore.maintain(spark, t10, massVecs(200000L),
      "vec_id", "embedding", minScore = Long.MaxValue,
      numCentroids = 64, epochId = Some(1L)): Unit
    val statsSecs = med3(time(
      graft.io.VectorDedupStore.occupancyStats(spark, t10, Some(5000L)))._2)
    val (_, retrainSecs) = time(graft.io.VectorDedupStore.retrain(spark, t10))
    println(f"[r17] store_stats (200k store): $statsSecs%.2f s; " +
      f"retrain: $retrainSecs%.2f s; " +
      f"gate saves ${retrainSecs / statsSecs}%.0fx when quiet")
    spark.stop()
  }
}
