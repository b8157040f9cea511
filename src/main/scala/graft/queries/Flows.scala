package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Derived flow records over the `events` table.
  *
  * The reference operates on netflow documents carrying a time RANGE
  * (`first_switched`/`last_switched`) plus a value; the synthetic `events`
  * table only has a point timestamp, so queries derive a deterministic range:
  * `range_start = ts` (epoch millis) and
  * `range_end = range_start + (event_id % 7200) * 1000` (0..2h durations,
  * including zero-duration flows, which the reference special-cases).
  *
  * The SQL fragment below is the DuckDB mirror of the DataFrame derivation —
  * keep the two in lockstep; every flow-query oracle builds on it. Millis are
  * obtained by floor-division of micros in both engines, so the derived
  * inputs are bit-identical.
  */
object Flows {

  def df(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "events")
      // locally a single parquet file scans as ONE partition; spread the
      // explode/bucket work the way a many-split cluster scan would
      .repartition(col("event_id"))
      .select(
      col("event_id"),
      col("user_id"),
      col("event_type"),
      col("value").as("v"),
      expr("unix_micros(ts) DIV 1000").as("rs"),
      (expr("unix_micros(ts) DIV 1000") + (col("event_id") % 7200) * 1000).as("re"))

  /** DuckDB CTE body equivalent to [[df]] (tables are registered by bare name). */
  val sqlCte: String =
    """flows AS (
      |  SELECT event_id, user_id, event_type, value AS v,
      |         epoch_ms(ts) AS rs,
      |         epoch_ms(ts) + (event_id % 7200) * 1000 AS re
      |  FROM events
      |)""".stripMargin

  /** 2024-01-01T00:00:00Z .. 2024-02-01T00:00:00Z — the events table's span. */
  val JAN_START_MS: Long = 1704067200000L
  val FEB_START_MS: Long = 1706745600000L
  val MAY_START_MS: Long = 1714521600000L
  val HOUR_MS: Long = 3600000L
  val DAY_MS: Long = 86400000L
}
