package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot reconciliation — derive the CHANGELOG between two keyed
  * snapshots of a table (reference scope: none — beyond-reference; the
  * complement of [[graft.io.Sinks.applyChangeLog]], which CONSUMES a
  * changelog: together they close the CDC loop without a table format's
  * change feed). The everyday uses: verify a backfill reproduced the
  * standing table, turn a full re-extract into an incremental delta,
  * audit what a pipeline change did to a gold table.
  */
object Diff {

  /** One row per CHANGED key: `op` = I (new-only), D (old-only), or
    * U (present in both with any non-key column differing — null-safe
    * `<=>` comparison per column, so NULL→value and value→NULL are
    * changes and NULL→NULL is not). Unchanged keys are dropped — the
    * whole point is that the delta is duplicate-mass-sized, not
    * table-sized. Output: the (coalesced) key columns, `op`, and each
    * non-key column twice as `<c>_old` / `<c>_new` (NULL on the absent
    * side) — exactly what a reconciliation report or a downstream
    * changelog apply needs.
    *
    * Both snapshots must share a schema (checked), and keys must be
    * unique per snapshot (the caller's contract — the same one every
    * keyed MERGE has; a duplicate key diffs as a many-to-many join).
    * NULL keys match each other (`<=>`), mirroring the null-safe keyed
    * upsert family.
    *
    * Scale shape: ONE full-outer join shuffled on the key columns —
    * no hashing trick needed because the per-column compare fuses into
    * the join's projection (and unlike a row-hash it is null-exact and
    * oracle-expressible as `IS DISTINCT FROM`). At 100 TB this is the
    * classic sort-merge reconciliation; bucketed snapshots co-locate
    * and skip both shuffles.
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "need at least one key column")
    require(oldSnap.columns.toSeq == newSnap.columns.toSeq,
      s"snapshot schemas differ: ${oldSnap.columns.mkString(",")} vs " +
        newSnap.columns.mkString(","))
    val missing = keys.filterNot(oldSnap.columns.contains)
    require(missing.isEmpty, s"key columns not in snapshots: ${missing.mkString(",")}")
    val dataCols = oldSnap.columns.filterNot(keys.contains).toSeq
    // each side is re-projected under side-prefixed names FIRST: plain
    // o(c)/n(c) references are ambiguous when both snapshots derive
    // from (or ARE) the same frame — "diff a table against itself" is
    // a legitimate reconciliation call and must not trip Spark's
    // ambiguous-self-join detection. The presence markers survive the
    // outer join where key columns cannot distinguish "absent row"
    // from "present row with NULL key".
    val o = oldSnap.select(oldSnap.columns.toSeq
      .map(c => col(c).as(s"_o_$c")) :+ lit(1).as("_po"): _*)
    val n = newSnap.select(newSnap.columns.toSeq
      .map(c => col(c).as(s"_n_$c")) :+ lit(1).as("_pn"): _*)
    val joined = o.join(n,
      keys.map(k => col(s"_o_$k") <=> col(s"_n_$k")).reduce(_ && _),
      "full_outer")
    val changed =
      if (dataCols.isEmpty) lit(false)
      else dataCols.map(c => !(col(s"_o_$c") <=> col(s"_n_$c"))).reduce(_ || _)
    joined
      .withColumn("op",
        when(col("_po").isNull, lit("I"))
          .when(col("_pn").isNull, lit("D"))
          .when(changed, lit("U")))
      .filter(col("op").isNotNull)
      .select(keys.map(k => coalesce(col(s"_o_$k"), col(s"_n_$k")).as(k)) ++
        Seq(col("op")) ++
        dataCols.flatMap(c =>
          Seq(col(s"_o_$c").as(s"${c}_old"), col(s"_n_$c").as(s"${c}_new"))): _*)
  }
}
