package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton (Z-order) codes from plain Column bit arithmetic — the
  * multi-column data-skipping layout (Delta's OPTIMIZE ZORDER, Iceberg's
  * sort-order transform) expressed as a composable sort key:
  * `df.sortWithinPartitions(ZOrder.z2(a, b))` before a parquet write
  * makes each file's (a, b) min/max box tight in BOTH dimensions, so a
  * 2-D range predicate prunes files instead of scanning everything —
  * single-column sorting only ever tightens one side. The bit-spread is
  * the classic mask cascade (shift-or then mask, 4 steps for 16 bits),
  * all integer ops: codegen'd in Spark, bit-identical in any SQL engine
  * with `&`/`|`/`<<` — hence oracle-checkable end to end.
  */
object ZOrder {

  private val Steps = Seq(
    (8, 0x00FF00FFL), (4, 0x0F0F0F0FL), (2, 0x33333333L), (1, 0x55555555L))

  /** Spread the low 16 bits of `c`: bit i moves to position 2·i. */
  def spread16(c: Column): Column =
    Steps.foldLeft(c.bitwiseAND(lit(0xFFFFL))) { case (x, (s, m)) =>
      x.bitwiseOR(shiftleft(x, s)).bitwiseAND(lit(m))
    }

  /** 32-bit Morton code of two 16-bit keys (x on even bits, y on odd). */
  def z2(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  /** The same spread as SQL text, for DuckDB oracle mirrors. */
  def spread16Sql(e: String): String =
    Steps.foldLeft(s"($e & 65535)") { case (x, (s, m)) =>
      s"(($x | ($x << $s)) & $m)"
    }

  def z2Sql(x: String, y: String): String =
    s"(${spread16Sql(x)} | (${spread16Sql(y)} << 1))"
}
