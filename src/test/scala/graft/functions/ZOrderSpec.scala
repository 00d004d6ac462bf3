package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("z2 interleaves bits exactly (known values)") {
    val rows = Seq((5L, 3L), (0xFFFFL, 0L), (0L, 0xFFFFL), (0L, 0L))
      .toDF("x", "y")
      .select(ZOrder.z2(col("x"), col("y")).as("z"))
      .as[Long].collect().toSeq
    // x=101b on even bits -> 010001b; y=011b on odd bits -> 001010b
    assert(rows == Seq(27L, 0x55555555L, 0xAAAAAAAAL, 0L))
  }

  test("z-sorted layout tightens per-file min/max boxes in both dimensions") {
    // the data-skipping claim itself: chunk the table into file-sized
    // groups and compare the total (partkey-range x suppkey-range) box
    // area — what parquet min/max pruning sees — between the natural
    // write order and the z-sorted order. Z-order must shrink it; a
    // single-column sort tightens one side only.
    // sort through the LIBRARY's z2 (not a private re-implementation,
    // which could silently drift from the code under test)
    val base = graft.Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val rows = base.select("l_partkey", "l_suppkey")
      .as[(Long, Long)].collect()
    val zrows = base
      .orderBy(ZOrder.z2(col("l_partkey"), col("l_suppkey")),
        col("l_orderkey"), col("l_linenumber"))
      .select("l_partkey", "l_suppkey")
      .as[(Long, Long)].collect()
    def area(rs: Seq[(Long, Long)], chunk: Int): Double =
      rs.grouped(chunk).map { g =>
        val xs = g.map(_._1); val ys = g.map(_._2)
        (xs.max - xs.min + 1).toDouble * (ys.max - ys.min + 1)
      }.sum
    val natural = area(rows.toSeq, 512)
    val zsorted = area(zrows.toSeq, 512)
    info(f"total box area: natural=$natural%.3g z-sorted=$zsorted%.3g")
    assert(zsorted < natural,
      s"z-order must tighten chunk boxes: $natural -> $zsorted")
  }
}
