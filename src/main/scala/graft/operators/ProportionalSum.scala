package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Spark-native re-expression of the reference engine's `proportional_sum`
  * aggregation (see /root/reference/es-8.18.2/src/main/java/org/opennms/
  * elasticsearch/plugin/aggregations/bucket/histogram/
  * ProportionalSumAggregator.java:136-228).
  *
  * Semantics: each input row carries a time range `[rangeStart, rangeEnd]`
  * (epoch millis) and a value. Time is bucketed by a fixed `intervalMs`
  * (shifted by `offsetMs`); the row's value is credited to every bucket it
  * overlaps, proportionally to `overlap(bucket, range) / duration(range)`.
  * A zero-duration range contributes its full value to its single bucket
  * (ProportionalSumAggregator.java:198-200). Optional `startMs`/`endMs`
  * clamp WHICH buckets are emitted, but ratios keep using the unclamped
  * range (ProportionalSumAggregator.java:183-186). An optional sampling
  * column multiplies the value when finite and non-zero
  * (ProportionalSumAggregator.java:171-180). Every overlapped bucket counts
  * the row in `doc_count`, even when the time overlap is zero at the closed
  * upper end (ProportionalSumAggregator.java:190, 206-214).
  *
  * Design (Spark-first, NOT a port): instead of the reference's per-shard
  * imperative collector + coordinator reduce, we express the whole thing
  * declaratively — `explode(sequence(firstBucket, lastBucket, interval))`
  * followed by `groupBy(bucket).agg(...)`. Catalyst then gives us column
  * pruning / filter pushdown on the scan, whole-stage codegen for the
  * bucket math, and map-side partial aggregation so only (group, bucket)
  * partial sums cross the shuffle — the distributed equivalent of the ES
  * shard-level pre-aggregation. Bucket cardinality is bounded by
  * `(end-start)/interval`, not by input rows, so this holds at 100 TB.
  */
object ProportionalSum {

  /** Mirrors ProportionalSumAggregationBuilder's knobs (fixed-interval form).
    * `validate=true` reproduces the reference's hard failures on negative
    * range starts/ends and start-after-end rows
    * (ProportionalSumAggregator.java:143-159); off by default because the
    * derived test flows are valid by construction and the branch costs a
    * per-row check. */
  final case class Config(
      intervalMs: Long,
      startMs: Option[Long] = None,
      endMs: Option[Long] = None,
      offsetMs: Long = 0L,
      validate: Boolean = false)

  /** value scaled by the sampling multiplier when finite and non-zero
    * (ProportionalSumAggregator.java:171-180, SamplingIT). */
  def effectiveValue(value: Column, sampling: Option[Column]): Column =
    sampling match {
      case None => value
      case Some(s) =>
        when(
          s.isNotNull && !isnan(s) && s =!= 0.0d &&
            s =!= Double.PositiveInfinity && s =!= Double.NegativeInfinity,
          value * s
        ).otherwise(value)
    }

  /** Floor `x` to the bucket grid: floor((x - offset) / interval) * interval + offset.
    * Double division then floor — bit-compatible with the DuckDB oracle SQL. */
  private def roundToBucket(x: Column, cfg: Config): Column = {
    val shifted = if (cfg.offsetMs == 0L) x else x - lit(cfg.offsetMs)
    val floored = floor(shifted / lit(cfg.intervalMs)) * lit(cfg.intervalMs)
    if (cfg.offsetMs == 0L) floored else floored + lit(cfg.offsetMs)
  }

  /** One output row per (input row, overlapped bucket): adds
    * `bucket_ms` (bucket start, epoch millis) and `__contrib` (this row's
    * proportional value share in that bucket). All other input columns pass
    * through untouched, so callers can group by arbitrary dimensions. */
  def explodeContrib(
      df: DataFrame,
      rangeStartMs: Column,
      rangeEndMs: Column,
      value: Column,
      sampling: Option[Column],
      cfg: Config): DataFrame = {
    val clampS = cfg.startMs.map(s => greatest(rangeStartMs, lit(s))).getOrElse(rangeStartMs)
    val clampE = cfg.endMs.map(e => least(rangeEndMs, lit(e))).getOrElse(rangeEndMs)
    val itv = lit(cfg.intervalMs)
    val rsChecked =
      if (!cfg.validate) rangeStartMs.cast("long")
      else when(rangeStartMs < 0L, raise_error(concat(lit("Invalid range start: "), rangeStartMs)))
        .otherwise(rangeStartMs).cast("long")
    val reChecked =
      if (!cfg.validate) rangeEndMs.cast("long")
      else when(rangeEndMs < 0L, raise_error(concat(lit("Invalid range end: "), rangeEndMs)))
        .when(rangeEndMs < rangeStartMs,
          raise_error(concat(lit("Start cannot be after end! start: "), rangeStartMs, lit(" end: "), rangeEndMs)))
        .otherwise(rangeEndMs).cast("long")
    df.withColumn("__rs", rsChecked)
      .withColumn("__re", reChecked)
      .withColumn("__dur", col("__re") - col("__rs"))
      .withColumn("__val", effectiveValue(value, sampling))
      // ES skips any doc missing one of the agg's fields (the values-source
      // advanceExact miss): null range or value ⇒ no buckets, no doc_count.
      // (A null range already fails the __fb <= __lb filter via null
      // comparison; the null VALUE case must not count the doc either.)
      .filter(col("__rs").isNotNull && col("__re").isNotNull && col("__val").isNotNull)
      .withColumn("__fb", roundToBucket(clampS, cfg))
      .withColumn("__lb", roundToBucket(clampE, cfg))
      // rows whose (clamped) bucket range is empty never enter the reference's
      // bucket loop (ProportionalSumAggregator.java:189-190)
      .filter(col("__fb") <= col("__lb"))
      .withColumn("bucket_ms", explode(sequence(col("__fb"), col("__lb"), itv)))
      // getTimeInWindow (ProportionalSumAggregator.java:222-228): overlap of
      // [bucket, bucket+interval) with the UNCLAMPED range, floored at 0
      .withColumn(
        "__ov",
        greatest(lit(0L), least(col("bucket_ms") + itv, col("__re")) - greatest(col("bucket_ms"), col("__rs"))))
      .withColumn(
        "__contrib",
        when(col("__dur") === 0L, col("__val"))
          .otherwise(col("__val") * (col("__ov") / col("__dur"))))
  }

  /** Aggregate exploded contributions into histogram buckets, optionally per
    * group (the reference's sub-aggregation-under-`terms` shape).
    *
    * Summation goes through [[graft.functions.detsum]]: per-row terms are
    * bit-identical across engines and the sum is exact-decimal, so the final
    * double is deterministic under any partitioning — both for the DuckDB
    * oracle and across cluster sizes. */
  def aggregate(exploded: DataFrame, groupCols: Seq[Column] = Nil): DataFrame =
    exploded
      .groupBy((groupCols :+ col("bucket_ms")): _*)
      .agg(
        count(lit(1)).as("doc_count"),
        graft.functions.detsum.sumDet(col("__contrib")).as("value"))

  /** The LITERAL-FIDELITY aggregate (the opt-in bug-for-bug audit mode):
    * the reference collector treats a missing VALUE as NaN
    * (ProportionalSumAggregator.java:166-170), so a single missing-value
    * doc POISONS every bucket sum it touches through IEEE += propagation.
    * [[graft.functions.detsum.sumDet]]'s fast path rejects NaN by design
    * (a NaN reaching the scaled-long cast would silently become 0), so
    * the propagation is mirrored EXPLICITLY: an any-NaN poison mask over
    * the exact sum of the non-NaN contributions — bit-identical to the
    * collector's result, since x + NaN = NaN regardless of x. Callers
    * feed the literal defaults (missing endpoint → 0, missing value →
    * NaN) at the values-source boundary; the engine's DEFAULT semantics
    * (values-source skip / `missing` substitution) stay on [[aggregate]]. */
  def aggregateLiteral(exploded: DataFrame, groupCols: Seq[Column] = Nil): DataFrame =
    exploded
      .groupBy((groupCols :+ col("bucket_ms")): _*)
      .agg(
        count(lit(1)).as("doc_count"),
        max(when(isnan(col("__contrib")), 1).otherwise(0)).as("__nan"),
        graft.functions.detsum.sumDet(
          when(isnan(col("__contrib")), lit(0.0)).otherwise(col("__contrib"))).as("__s"))
      .withColumn("value",
        when(col("__nan") === 1, lit(Double.NaN)).otherwise(col("__s")))
      .drop("__nan", "__s")

  /** explodeContrib + aggregate in one call. */
  def run(
      df: DataFrame,
      rangeStartMs: Column,
      rangeEndMs: Column,
      value: Column,
      sampling: Option[Column] = None,
      cfg: Config,
      groupCols: Seq[Column] = Nil): DataFrame =
    aggregate(explodeContrib(df, rangeStartMs, rangeEndMs, value, sampling, cfg), groupCols)

  /** Calendar-interval variant (the reference's `dateHistogramInterval(MONTH)`
    * form, ProportionalSumAggregationBuilder.dateHistogramInterval): buckets
    * are UTC calendar months, so widths vary and rounding goes through
    * `date_trunc` instead of the fixed grid. Overlap/ratio math is identical
    * to the fixed-interval path, on the month-boundary epoch millis. */
  def explodeContribCalendarMonth(
      df: DataFrame,
      rangeStartMs: Column,
      rangeEndMs: Column,
      value: Column,
      sampling: Option[Column],
      startMs: Option[Long],
      endMs: Option[Long]): DataFrame =
    explodeContribCalendar(df, rangeStartMs, rangeEndMs, value, sampling, startMs, endMs, "month")

  /** Any calendar unit Spark's date_trunc + interval arithmetic supports
    * ("week", "month", "quarter", "year") — the reference accepts the full
    * DateHistogramInterval family (ProportionalSumAggregationBuilder:104-116).
    *
    * `offsetMs` shifts the whole calendar grid, exactly as the reference
    * applies it inside every rounding — `rounding.round(x - offset) + offset`
    * (ProportionalSumAggregator.java:183-186) — so e.g. monthly buckets with
    * a +6h offset start at 06:00 on the 1st, and the overlap window is the
    * shifted `[boundary + offset, nextBoundary + offset)`. */
  def explodeContribCalendar(
      df: DataFrame,
      rangeStartMs: Column,
      rangeEndMs: Column,
      value: Column,
      sampling: Option[Column],
      startMs: Option[Long],
      endMs: Option[Long],
      unit: String,
      offsetMs: Long = 0L): DataFrame = {
    val step = unit.toLowerCase match {
      case "week" => "INTERVAL 7 DAY"
      case "month" => "INTERVAL 1 MONTH"
      case "quarter" => "INTERVAL 3 MONTH"
      case "year" => "INTERVAL 1 YEAR"
      // the sub-day units of the reference's DATE_FIELD_UNITS family
      // (ProportionalSumAggregationBuilder.java:78-97); under the pinned UTC
      // session (tz hard-disabled by the reference — builder:434,492-493)
      // they are fixed-width and alias the fixed-interval path, but the
      // builder accepts the calendar spelling, so this path must too
      case "day" => "INTERVAL 1 DAY"
      case "hour" => "INTERVAL 1 HOUR"
      case "minute" => "INTERVAL 1 MINUTE"
      case "second" => "INTERVAL 1 SECOND"
      case other => throw new IllegalArgumentException(s"unsupported calendar unit: $other")
    }
    val off = lit(offsetMs)
    val clampS = startMs.map(s => greatest(rangeStartMs, lit(s))).getOrElse(rangeStartMs)
    val clampE = endMs.map(e => least(rangeEndMs, lit(e))).getOrElse(rangeEndMs)
    df.withColumn("__rs", rangeStartMs.cast("long"))
      .withColumn("__re", rangeEndMs.cast("long"))
      .withColumn("__dur", col("__re") - col("__rs"))
      .withColumn("__val", effectiveValue(value, sampling))
      // same ES missing-field skip as the fixed-interval path: a null range
      // or value field contributes neither buckets nor doc_count
      .filter(col("__rs").isNotNull && col("__re").isNotNull && col("__val").isNotNull)
      .withColumn("__fbts", date_trunc(unit, timestamp_millis(clampS - off)))
      .withColumn("__lbts", date_trunc(unit, timestamp_millis(clampE - off)))
      .filter(col("__fbts") <= col("__lbts"))
      .withColumn(
        "bucket_ts",
        explode(sequence(col("__fbts"), col("__lbts"), expr(step))))
      .withColumn("bucket_ms", expr("unix_micros(bucket_ts) DIV 1000") + off)
      .withColumn("__next_ms", expr(s"unix_micros(bucket_ts + $step) DIV 1000") + off)
      .withColumn(
        "__ov",
        greatest(lit(0L), least(col("__next_ms"), col("__re")) - greatest(col("bucket_ms"), col("__rs"))))
      .withColumn(
        "__contrib",
        when(col("__dur") === 0L, col("__val"))
          .otherwise(col("__val") * (col("__ov") / col("__dur"))))
      .drop("bucket_ts")
  }

  /** Dense-bucket variant: min_doc_count=0 + extended bounds
    * (InternalProportionalSumHistogram.EmptyBucketInfo) — every grid bucket in
    * `[boundsStartMs, boundsEndMs]` appears, zero-filled when empty. */
  def runDense(
      df: DataFrame,
      rangeStartMs: Column,
      rangeEndMs: Column,
      value: Column,
      sampling: Option[Column],
      cfg: Config,
      boundsStartMs: Long,
      boundsEndMs: Long): DataFrame = {
    val agg = run(df, rangeStartMs, rangeEndMs, value, sampling, cfg)
    val spark = df.sparkSession
    val grid = spark
      .range(1)
      .select(explode(sequence(
        roundToBucket(lit(boundsStartMs), cfg),
        roundToBucket(lit(boundsEndMs), cfg),
        lit(cfg.intervalMs))).as("bucket_ms"))
    grid
      .join(agg, Seq("bucket_ms"), "left")
      .select(
        col("bucket_ms"),
        coalesce(col("doc_count"), lit(0L)).as("doc_count"),
        coalesce(col("value"), lit(0.0d)).as("value"))
  }

  /** `min_doc_count=0` WITHOUT extended bounds — the ES DEFAULT: empty grid
    * buckets are materialized between the first and last POPULATED bucket
    * (InternalProportionalSumHistogram.EmptyBucketInfo, whose reduce pass
    * calls addEmptyBuckets over [minKey, maxKey] when no bounds are given).
    * The bounds come from the aggregate itself, declaratively — a 1-row
    * min/max explodes into the grid, no driver round-trip — and the
    * populated aggregate (bounded by bucket count, not input rows) is
    * broadcast into the fill join. */
  def runDenseAuto(
      df: DataFrame,
      rangeStartMs: Column,
      rangeEndMs: Column,
      value: Column,
      sampling: Option[Column],
      cfg: Config): DataFrame = {
    // localCheckpoint, not persist: the result is referenced twice (bounds
    // scan + fill join) but a persist() here would pin cached blocks for
    // the session lifetime with no unpersist hook once this returns —
    // checkpointed RDD blocks are instead freed by the ContextCleaner when
    // the returned frame is dereferenced
    val agg = run(df, rangeStartMs, rangeEndMs, value, sampling, cfg).localCheckpoint(true)
    val grid = agg
      .agg(min(col("bucket_ms")).as("__lo"), max(col("bucket_ms")).as("__hi"))
      .filter(col("__lo").isNotNull) // empty input -> empty histogram
      .select(explode(sequence(col("__lo"), col("__hi"), lit(cfg.intervalMs))).as("bucket_ms"))
    grid
      .join(broadcast(agg), Seq("bucket_ms"), "left")
      .select(
        col("bucket_ms"),
        coalesce(col("doc_count"), lit(0L)).as("doc_count"),
        coalesce(col("value"), lit(0.0d)).as("value"))
  }

  /** Dense buckets PER GROUP — the reference fills empty buckets inside each
    * terms parent bucket independently; the grid is (distinct groups ×
    * bucket range), broadcast-joined against the aggregate. */
  def runDenseGrouped(
      df: DataFrame,
      rangeStartMs: Column,
      rangeEndMs: Column,
      value: Column,
      sampling: Option[Column],
      cfg: Config,
      boundsStartMs: Long,
      boundsEndMs: Long,
      groupName: String): DataFrame = {
    val agg = run(df, rangeStartMs, rangeEndMs, value, sampling, cfg, Seq(col(groupName)))
    val spark = df.sparkSession
    val buckets = spark
      .range(1)
      .select(explode(sequence(
        roundToBucket(lit(boundsStartMs), cfg),
        roundToBucket(lit(boundsEndMs), cfg),
        lit(cfg.intervalMs))).as("bucket_ms"))
    val groups = df.select(col(groupName)).distinct()
    broadcast(groups.crossJoin(buckets))
      .join(agg, Seq(groupName, "bucket_ms"), "left")
      .select(
        col(groupName),
        col("bucket_ms"),
        coalesce(col("doc_count"), lit(0L)).as("doc_count"),
        coalesce(col("value"), lit(0.0d)).as("value"))
  }
}
