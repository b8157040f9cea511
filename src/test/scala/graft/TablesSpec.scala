package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType
import org.scalatest.funsuite.AnyFunSuite

/** Gate for [[graft.queries.Tables.coerceTs]] — the one place every reader
  * (batch AND streaming file sources) normalizes the testdata's timestamp
  * physical types. Two hazards pinned here:
  *  - a TIMESTAMP(NANOS) drop arrives as LongType under `nanosAsLong` and
  *    must floor to micros exactly like DuckDB's TIMESTAMP_NS cast;
  *  - a foreign session (no GraftSession config) may read micros as
  *    TimestampNTZ AND run a non-UTC session timezone — the naive values
  *    are UTC by the generator contract, so the coercion must preserve the
  *    instant under ANY session timezone (a bare NTZ→TS cast does not: it
  *    reads the wall clock in the session zone — the round-9 ADVICE item). */
class TablesSpec extends AnyFunSuite {

  lazy val spark = GraftSession.builder("4").getOrCreate()

  test("coerceTs floors nano-long ts to whole micros as TimestampType") {
    import spark.implicits._
    // 1700000000.123456789s since epoch: the 789 sub-micro nanos must drop
    val nanos = 1700000000L * 1000000000L + 123456789L
    val df = Seq(nanos).toDF("ts")
    val out = graft.queries.Tables.coerceTs(df, "events")
    assert(out.schema("ts").dataType == TimestampType)
    val micros = out.select(unix_micros(col("ts"))).as[Long].head()
    assert(micros == 1700000000L * 1000000L + 123456L)
  }

  test("coerceTs preserves the UTC instant of an NTZ ts under a non-UTC session timezone") {
    import spark.implicits._
    val tzKey = "spark.sql.session.timeZone"
    val prev = spark.conf.get(tzKey)
    try {
      spark.conf.set(tzKey, "America/New_York")
      // naive wall clock 2024-03-01T12:00:00 is 12:00 UTC by contract
      val df = spark.sql("SELECT TIMESTAMP_NTZ '2024-03-01 12:00:00' AS ts")
      val out = graft.queries.Tables.coerceTs(df, "events")
      assert(out.schema("ts").dataType == TimestampType)
      val micros = out.select(unix_micros(col("ts"))).as[Long].head()
      val expected = java.time.Instant.parse("2024-03-01T12:00:00Z")
      assert(micros == expected.getEpochSecond * 1000000L)
    } finally spark.conf.set(tzKey, prev)
  }

  test("coerceTs NTZ handling is exact inside a DST fall-back overlap") {
    import spark.implicits._
    val tzKey = "spark.sql.session.timeZone"
    val prev = spark.conf.get(tzKey)
    try {
      spark.conf.set(tzKey, "America/New_York")
      // 2024-11-03 06:30 UTC renders as 01:30 in New York — a wall clock
      // that occurs TWICE (EDT first pass, EST second pass). A
      // render-then-cast round trip resolves the ambiguity to the earlier
      // offset and lands one hour off; the make_timestamp('UTC') path has
      // no ambiguity to resolve. Fractional micros must survive too.
      val df = spark.sql("SELECT TIMESTAMP_NTZ '2024-11-03 06:30:00.123456' AS ts")
      val out = graft.queries.Tables.coerceTs(df, "events")
      val micros = out.select(unix_micros(col("ts"))).as[Long].head()
      val expected = java.time.Instant.parse("2024-11-03T06:30:00.123456Z")
      assert(micros == expected.getEpochSecond * 1000000L + 123456L)
    } finally spark.conf.set(tzKey, prev)
  }

  test("coerceTs leaves an already-TimestampType column untouched") {
    val df = spark.sql("SELECT TIMESTAMP '2024-03-01 12:00:00Z' AS ts")
    val out = graft.queries.Tables.coerceTs(df, "events")
    assert(out.schema("ts").dataType == TimestampType)
    assert(out.queryExecution.analyzed == df.queryExecution.analyzed)
  }
}
