package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Table-maintenance operators for parquet catalog tables — the
  * no-Delta counterparts of OPTIMIZE (compaction) and the incremental
  * gold-refresh path a metadata-driven pipeline needs at scale
  * (reference scope: the gold layer recomputes models wholesale and
  * upserts; VACUUM/OPTIMIZE are Delta-only per SURVEY §7.4 — these are
  * the parquet-native equivalents of the parts that ARE expressible).
  */
object Maintenance {

  /** OPTIMIZE-style compaction: rewrite a table into
    * `ceil(rows / targetRowsPerFile)` files. The small-file problem is
    * the classic streaming/incremental-append pathology — thousands of
    * kilobyte files turn every scan into a file-listing and task-
    * scheduling storm; nightly compaction restores scan-sized files.
    * Staged rewrite (a table cannot feed its own overwrite), atomic at
    * the catalog-pointer level like [[Upsert.upsertTable]]; a real
    * table format makes the swap transactional. `repartition` (not
    * `coalesce`) so the rewrite redistributes evenly — coalesce would
    * glue existing small files into uneven unions and keep skew.
    *
    * @return (files before, files after).
    */
  def compact(spark: SparkSession, table: String,
      targetRowsPerFile: Long = 1000000L): (Int, Int) = {
    require(targetRowsPerFile > 0, "targetRowsPerFile must be positive")
    val before = spark.table(table).inputFiles.length
    val n = spark.table(table).count()
    val parts = math.max(1, math.ceil(n.toDouble / targetRowsPerFile).toInt)
    // a compaction must preserve the table's partition spec — a plain
    // saveAsTable would silently drop it and with it partition pruning
    // for every later scan (round-10 advice); read it from the catalog
    // and re-apply on the rewrite
    val partCols = spark.catalog.listColumns(table).collect()
      .filter(_.isPartition).map(_.name).toSeq
    val scratch = s"${spark.conf.get("spark.sql.warehouse.dir")}/__compact_stage/" +
      table.replace('.', '_')
    // partitioned tables cluster the rewrite BY the partition columns so
    // each partition value lands in few tasks (→ few files per value);
    // a round-robin repartition would make every task write a sliver of
    // every partition value — parts × values files, the opposite of
    // compaction
    val clustered =
      if (partCols.nonEmpty)
        spark.table(table).repartition(parts, partCols.map(col): _*)
      else spark.table(table).repartition(parts)
    clustered.write.mode(SaveMode.Overwrite).parquet(scratch)
    val w = spark.read.parquet(scratch).write.mode(SaveMode.Overwrite)
    (if (partCols.nonEmpty) w.partitionBy(partCols: _*) else w)
      .saveAsTable(table)
    spark.catalog.refreshTable(table)
    (before, spark.table(table).inputFiles.length)
  }

  /** VACUUM for the staging plane: the merge/CDC/compaction sinks
    * stage through scratch directories under the warehouse
    * (`__upsert_stage`, `__cdc_stage`, `__compact_stage`,
    * `__evolve_stage`, `__maint_stage`); each is transient by contract
    * (the NEXT run of the same table overwrites it) but a crashed or
    * final run leaves the last copy on disk forever. This deletes the
    * staging roots — safe by construction because no table ever
    * references staged files (every sink reads the stage back and
    * writes a fresh catalog copy; the Delta-VACUUM orphan-detection
    * problem doesn't arise when staging is namespaced). Returns the
    * number of staging roots removed.
    */
  def vacuumStaging(spark: SparkSession): Int = {
    val wh = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:"))
    val stages = Option(wh.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("__") &&
        f.getName.endsWith("_stage"))
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete(): Unit
    }
    stages.foreach(rm)
    stages.length
  }

  /** Incremental maintenance of an ADDITIVE aggregate table — the
    * 100 TB gold-refresh path: instead of rescanning all history per
    * run (the reference's wholesale recompute), fold each new fact
    * batch into the standing (keys → sums, count) table:
    * `new_sum = old_sum + batch_sum` via full-outer join + coalesce.
    * Correct exactly for the ADDITIVE family (SUM/COUNT — and the
    * AVG/rate family derived from them at read time); MIN/MAX survive
    * inserts but not retractions, and DISTINCT needs a sketch
    * ([[graft.operators.Sketches]]) — that boundary is the classic
    * materialized-view-maintenance taxonomy, enforced here by only
    * accepting sum columns. Maintaining N batches ≡ one aggregate over
    * their union, in ANY batch order (associativity + commutativity of
    * +) — pinned in `MaintenanceSpec`. Scale shape: per batch, one
    * map-side-combined aggregate of the BATCH (not history) + one
    * keyed join against the standing table — cost rides the batch.
    */
  def maintainAdditiveAggregate(spark: SparkSession, table: String,
      batch: DataFrame, keys: Seq[String], sumCols: Seq[String]): Unit = {
    require(sumCols.nonEmpty, "need at least one additive column")
    val aggExprs = sumCols.map(c => sum(col(c)).as(c)) :+
      count(lit(1)).as("n_rows")
    val batchAgg = batch.groupBy(keys.map(col): _*)
      .agg(aggExprs.head, aggExprs.tail: _*)
    if (!spark.catalog.tableExists(table)) {
      batchAgg.write.saveAsTable(table)
      return
    }
    val scratch = s"${spark.conf.get("spark.sql.warehouse.dir")}/__maint_stage/" +
      table.replace('.', '_')
    batchAgg.write.mode(SaveMode.Overwrite).parquet(s"$scratch/batch")
    val b = spark.read.parquet(s"$scratch/batch").alias("b")
    val t = spark.table(table).alias("t")
    // NULL-SAFE key match (<=>): groupBy emits a null-key group per
    // batch, and a plain USING full_outer never matches null keys —
    // each batch would append a fresh duplicate null-key row instead of
    // folding into the standing one, breaking the N-batches ≡ one-
    // aggregate invariant (round-10 advice). Key columns coalesce
    // t-then-b so both matched and one-sided rows keep their key.
    val joined = t.join(b,
      keys.map(k => t(k) <=> b(k)).reduce(_ && _), "full_outer")
    val merged = joined.select(
      keys.map(k => coalesce(t(k), b(k)).as(k)) ++
        (sumCols :+ "n_rows").map { c =>
          (coalesce(t(c), lit(0)) + coalesce(b(c), lit(0))).as(c)
        }: _*)
    merged.write.mode(SaveMode.Overwrite).parquet(s"$scratch/merged")
    spark.read.parquet(s"$scratch/merged").write.mode(SaveMode.Overwrite)
      .saveAsTable(table)
    spark.catalog.refreshTable(table)
  }
}
