package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The events loader's timestamp normalization. The driver has shipped
  * `events.ts` under two physical parquet encodings across testdata
  * generations — TIMESTAMP(NANOS), which arrives as epoch-nanos LONG
  * under the legacy conf, and TIMESTAMP(MICROS) without UTC adjustment,
  * which arrives as TIMESTAMP_NTZ — and only the generation currently
  * on disk exercises its path through the gate. This spec pins BOTH
  * paths (and the already-TimestampType no-op) against the same known
  * instant so a future regeneration flip cannot silently break the
  * dormant branch.
  */
class TablesSpec extends SparkSpec {

  // 2026-03-15T12:34:56.789012 UTC, with sub-microsecond nanos that
  // truncation (not rounding) must drop — matching DuckDB's ns→us cast
  private val micros = 1773578096789012L
  private val nanos  = micros * 1000L + 345L

  private def normalized(df: org.apache.spark.sql.DataFrame): Long = {
    val out = Tables.normalizeTs(df)
    assert(out.schema("ts").dataType == TimestampType,
      s"normalizeTs must yield TimestampType, got ${out.schema("ts").dataType}")
    out.select(unix_micros(col("ts"))).head.getLong(0)
  }

  test("nanos-as-long normalizes by integer division (no double rounding)") {
    val df = spark.createDataFrame(
      java.util.List.of(Row(Long.box(nanos))),
      StructType(Seq(StructField("ts", LongType))))
    assert(normalized(df) == micros)
  }

  test("large epoch-nanos survive: the value exceeds double's 2^53 mantissa") {
    // 1.77e18 nanos: a double round-trip would corrupt the low bits;
    // DIV must keep them exact
    val tricky = 1773578096789012345L
    val df = spark.createDataFrame(
      java.util.List.of(Row(Long.box(tricky))),
      StructType(Seq(StructField("ts", LongType))))
    assert(normalized(df) == tricky / 1000L)
  }

  test("TIMESTAMP_NTZ re-tags as the same UTC instant (session is UTC)") {
    val ldt = java.time.LocalDateTime.ofEpochSecond(
      micros / 1000000L, ((micros % 1000000L) * 1000L).toInt,
      java.time.ZoneOffset.UTC)
    val df = spark.createDataFrame(
      java.util.List.of(Row(ldt)),
      StructType(Seq(StructField("ts", TimestampNTZType))))
    assert(normalized(df) == micros)
  }

  test("already-TimestampType input passes through untouched") {
    val inst = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(micros / 1000000L,
        (micros % 1000000L) * 1000L))
    val df = spark.createDataFrame(
      java.util.List.of(Row(inst)),
      StructType(Seq(StructField("ts", TimestampType))))
    assert(normalized(df) == micros)
  }
}
