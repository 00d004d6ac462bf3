package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Round-15 scale rehearsal (not part of the library API): the
  * dedup-store growth model the round-14 snapshot shipped without.
  *
  * The store's headline claim is that crawl-N+1 fold cost rides the
  * BATCH while the store grows: the store side of the probe join is a
  * columnar scan of precomputed (band_idx, band_key[, sh]) rows —
  * never text, never re-hashed, and with `storeBuckets` never
  * shuffled. So the only store-mass term left in a fold is that
  * column scan; everything else (shingle+hash, CC funnel, append) is
  * batch-sized. This harness measures exactly that marginal cost: a
  * FIXED batch folded into a store pre-grown 1× vs N×.
  *
  * Growth model: the store is built DIRECTLY from band rows (the
  * rehearsal needs N× distinct-content mass; folding replicated text
  * through maintain would collapse the replicas into one keeper per
  * cluster). Rep 0 keeps raw band keys; reps 1..N-1 get rep-suffixed
  * keys — N crawls' worth of mass, no degenerate hot bands, and the
  * fixed batch (same text, fresh ids) collides with exactly the rep-0
  * slice in BOTH stores, so hit mass is held constant while scanned
  * store mass grows N×. Every batch doc verifies at Jaccard 1.0
  * against its rep-0 self and drops, so repeated folds append nothing
  * and the store stays bit-stable across the median-of-3.
  *
  * Usage: Test/runMain graft.ProfileR15Scale [multLo] [multHi] [sfDir].
  * Measured numbers recorded in BASELINE.md §round-15.
  */
object ProfileR15Scale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        s"${sys.props("user.dir")}/target/r15-warehouse-${System.nanoTime()}")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val multLo = args.lift(0).map(_.toInt).getOrElse(10)
    val multHi = args.lift(1).map(_.toInt).getOrElse(100)
    val dir = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val bandNames = (0 until 4).map(b => s"band_$b")
    val shift = 100000000L

    val docs = Tables.load(spark, dir, "documents").select("doc_id", "text")
    val banded = graft.operators.Dedup.withMinhashBands(
        docs.withColumnRenamed("text", "_text"), "_text", 3, 16, 4)
      .drop("_text")

    def buildStore(table: String, m: Int): Long = {
      spark.sql("CREATE DATABASE IF NOT EXISTS r15")
      spark.sql(s"DROP TABLE IF EXISTS $table")
      val rows = spark.range(m).toDF("rep").crossJoin(banded)
        .select((col("doc_id") + col("rep") * shift).as("doc_id"),
          col("rep"),
          posexplode(array(bandNames.map(col): _*))
            .as(Seq("band_idx", "band_key")),
          col("sh"))
        .withColumn("band_key", when(col("rep") > 0,
          concat(col("band_key"), lit("#"), col("rep"))).otherwise(col("band_key")))
        .withColumn("_epoch", lit(1L))
        .select("doc_id", "band_idx", "band_key", "sh", "_epoch")
      rows.write.mode(SaveMode.Overwrite).format("parquet")
        .bucketBy(8, "band_key").saveAsTable(table)
      // stamp the O(1) fence property so the timed folds never pay the
      // legacy max(_epoch) fallback scan
      spark.sql(s"ALTER TABLE $table SET TBLPROPERTIES " +
        s"('${graft.io.DedupStore.EpochProperty}' = '1')")
      spark.table(table).count()
    }

    // the FIXED batch: every doc's text already lives in the store's
    // rep-0 slice under another id, so the probe drops all of it
    val batch = docs.withColumn("doc_id", col("doc_id") + 7L * shift)

    def timeFold(table: String, epochBase: Long = 2L): Double = {
      val ts = (0 until 3).map { i =>
        val t0 = System.nanoTime()
        val r = graft.io.DedupStore.maintain(spark, table, batch,
          "doc_id", "text", jaccardThreshold = 0.5,
          storeBuckets = 8, epochId = Some(epochBase + i))
        require(r.applied && r.batchRows > 0)
        (System.nanoTime() - t0) / 1e9
      }
      ts.sorted.apply(1)
    }

    // warmup: throwaway folds so JIT/codegen/FS costs never land on
    // the first timed series (one fold is not enough — the first timed
    // series still converges without three)
    buildStore("r15.store_warm", 1)
    timeFold("r15.store_warm"); timeFold("r15.store_warm", 5L)

    // both stores sit ABOVE the broadcast threshold (a 1x store at
    // this sf broadcasts its wide shingle arrays and measures a plan
    // no real store would ever use — at crawl N+1 the store is never
    // broadcastable, which is the regime the claim is about)
    val nLo = buildStore("r15.store_lo", multLo)
    val tLo = timeFold("r15.store_lo")
    println(f"[r15-scale] fold into ${multLo}x store ($nLo%d band rows): $tLo%8.2f s")
    val nHi = buildStore("r15.store_hi", multHi)
    val tHi = timeFold("r15.store_hi")
    println(f"[r15-scale] fold into ${multHi}x store ($nHi%d band rows): $tHi%8.2f s")
    println(f"[r15-scale] store-mass exponent: " +
      f"${math.log(tHi / tLo) / math.log(multHi.toDouble / multLo)}%.2f " +
      "(claim: fold cost rides the batch; the only store term is the " +
      "bucketed columnar band scan)")

    // ---- VECTOR store growth (L143) ----
    // The vector probe scores every stored row in each probed cell, so
    // its store term is batch x nprobe x CELL OCCUPANCY — the sizing
    // contract is numCentroids ∝ corpus at creation (frozen in the
    // model). The rehearsal holds occupancy FIXED (10x mass with 80
    // cells vs 100x mass with 800) and measures the residual exponent.
    val emb = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val vbatch = emb.withColumn("vec_id", col("vec_id") + 7L * shift)
    def buildVecStore(table: String, m: Int, cents: Int): Long = {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      spark.sql(s"DROP TABLE IF EXISTS ${table}_model")
      graft.io.VectorDedupStore.maintain(spark, table, emb,
        "vec_id", "embedding", minScore = 24000L, numCentroids = cents,
        epochId = Some(1L))
      // replicate the founding rows m-1 times under fresh ids (same
      // codes, same cells — m crawls' worth of mass at constant
      // occupancy ratio), staged because the plan reads its own target
      val scr = s"${spark.conf.get("spark.sql.warehouse.dir")}/__r15_vec_stage"
      spark.range(1, m).toDF("rep").crossJoin(spark.table(table))
        .select((col("vec_id") + col("rep") * shift).as("vec_id"),
          col("qv"), col("cell"), col("_epoch"))
        .write.mode(SaveMode.Overwrite).parquet(scr)
      spark.read.parquet(scr).write.mode(SaveMode.Append)
        .format("parquet").saveAsTable(table)
      spark.catalog.refreshTable(table)
      spark.table(table).count()
    }
    def timeVecFold(table: String, epochBase: Long): Double = {
      val ts = (0 until 3).map { i =>
        val t0 = System.nanoTime()
        val r = graft.io.VectorDedupStore.maintain(spark, table, vbatch,
          "vec_id", "embedding", minScore = 24000L,
          epochId = Some(epochBase + i))
        require(r.applied && r.batchRows > 0)
        (System.nanoTime() - t0) / 1e9
      }
      ts.sorted.apply(1)
    }
    buildVecStore("r15.vstore_warm", 2, 16)
    timeVecFold("r15.vstore_warm", 2L); timeVecFold("r15.vstore_warm", 5L)
    val vnLo = buildVecStore("r15.vstore_lo", multLo, 8 * multLo)
    val vtLo = timeVecFold("r15.vstore_lo", 2L)
    println(f"[r15-scale] vec fold, ${multLo}x store ($vnLo%d rows, " +
      f"${8 * multLo} cells): $vtLo%8.2f s")
    val vnHi = buildVecStore("r15.vstore_hi", multHi, 8 * multHi)
    val vtHi = timeVecFold("r15.vstore_hi", 2L)
    println(f"[r15-scale] vec fold, ${multHi}x store ($vnHi%d rows, " +
      f"${8 * multHi} cells): $vtHi%8.2f s")
    println(f"[r15-scale] vec store-mass exponent at fixed occupancy: " +
      f"${math.log(vtHi / vtLo) / math.log(multHi.toDouble / multLo)}%.2f " +
      "(claim: probe term = batch x nprobe x cell occupancy; size " +
      "numCentroids with the corpus at creation and fold cost rides " +
      "the batch)")
    spark.stop()
  }
}
