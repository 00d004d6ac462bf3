package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-16 rehearsal: scale exponents for the round's three new
  * pieces, measured at 1× and 10× so BASELINE records data instead of
  * claims.
  *
  *  - retrain_store: `trainIters` store-linear k-means jobs + one
  *    broadcast-fold reassignment + one staged rewrite — claim:
  *    wall time ~linear in store mass (exponent ≲ 1).
  *  - zone-map refresh: appending a couple of files to a many-file
  *    table must cost the APPEND, not the table — claim: refresh ≪
  *    full rebuild, files scanned = files appended.
  *  - m6-shaped pHash dedup (hash → band join → Hamming verify) over
  *    n images — claim: ~linear in image count (band-equi join, never
  *    all-pairs).
  *
  * Usage: Test/runMain graft.ProfileR16Scale.
  * Measured numbers recorded in BASELINE.md §Round 16.
  */
object ProfileR16Scale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        s"${sys.props("user.dir")}/target/r16-warehouse-${System.nanoTime()}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sql("CREATE DATABASE IF NOT EXISTS r16")

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def med3(f: => Double): Double =
      Seq(f, f, f).sorted.apply(1)

    // --- retrain over 1x / 10x store mass -------------------------
    // deterministic 64-dim unit-ish vectors; minScore above the
    // identical-code dot so every row stores (pure mass, no dedup)
    def vecs(n: Long) = spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)), j =>
        (pmod(xxhash64(col("id"), j), lit(1000)) + 1).cast("float"))
        .as("embedding"))
    def buildStore(t: String, n: Long): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      spark.sql(s"DROP TABLE IF EXISTS ${t}_model")
      graft.io.VectorDedupStore.maintain(spark, t, vecs(n),
        "vec_id", "embedding", minScore = Long.MaxValue,
        numCentroids = 64, epochId = Some(1L)): Unit
    }
    for ((n, tag) <- Seq(20000L -> "1x", 200000L -> "10x")) {
      val t = s"r16.retrain_$tag"
      buildStore(t, n)
      val secs = med3 {
        time(graft.io.VectorDedupStore.retrain(spark, t))._2
      }
      println(f"[r16] retrain $tag%-3s n=$n%7d  $secs%7.2f s")
    }

    // --- zone-map refresh: append-cost vs table-cost ----------------
    // scan-bound sizing (arg0 rows, default 100M over 100 files): at
    // toy sizes both paths are overhead-bound and the A/B says nothing
    val zmRows = args.lift(0).map(_.toLong).getOrElse(100000000L)
    val zt = "r16.zm_table"
    spark.sql(s"DROP TABLE IF EXISTS $zt")
    spark.range(1, zmRows + 1).toDF("k")
      .repartitionByRange(100, col("k")).write.saveAsTable(zt)
    val (_, fullBuild) = time(graft.io.ZoneMaps.writeManifest(
      spark, zt, Seq("k")))
    spark.range(zmRows + 1, zmRows + zmRows / 50 + 1).toDF("k")
      .repartitionByRange(2, col("k")).write.mode("append").saveAsTable(zt)
    val ((_, scanned, rows), refresh) = time(
      graft.io.ZoneMaps.refreshManifest(spark, zt, Seq("k")))
    println(f"[r16] zonemap ($zmRows rows): full build (100 files) " +
      f"$fullBuild%6.2f s; refresh after 2-file append $refresh%6.2f s " +
      f"(scanned $scanned of $rows files, claim scanned=2)")

    // --- pHash dedup over 1x / 10x images --------------------------
    val M = graft.multimodal.Multimodal
    for ((n, tag) <- Seq(2000 -> "1x", 20000 -> "10x")) {
      val secs = med3 {
        time {
          val media = M.syntheticMedia(spark, n)
          val variants = M.noisyVariants(
            media.filter(m => m.media_id % 6 == 0 && m.kind == "image"),
            everyN = 50, delta = 64, idOffset = n.toLong)
          val hashes = M.dHash(media.unionByName(variants))
          val bandCols = (0 until 4).map(b =>
            shiftrightunsigned(col("dhash"), b * 16)
              .bitwiseAND(lit(0xFFFFL)))
          val pairs = graft.operators.Dedup.candidatePairs(
            hashes.persist(), "media_id", bandCols)
          val ha = hashes.select(col("media_id").as("doc_a"),
            col("dhash").as("_ha"))
          val hb = hashes.select(col("media_id").as("doc_b"),
            col("dhash").as("_hb"))
          pairs.join(ha, Seq("doc_a")).join(hb, Seq("doc_b"))
            .filter(bit_count(col("_ha").bitwiseXOR(col("_hb"))) <= 16)
            .count()
        }._2
      }
      println(f"[r16] phash dedup $tag%-3s n=$n%6d images  $secs%7.2f s")
    }
    spark.stop()
  }
}
