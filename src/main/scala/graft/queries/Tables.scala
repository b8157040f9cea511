package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet loader for the driver-generated TPC-H-ish test schema.
  *
  * The generator writes TIMESTAMP(NANOS) columns, which Spark only reads as
  * nano-longs under `spark.sql.legacy.parquet.nanosAsLong` (set by
  * [[graft.GraftSession]]). This loader converts them back to TimestampType
  * (floor to micros — DuckDB's TIMESTAMP_NS→TIMESTAMP cast truncates the
  * same way, keeping both engines bit-identical). */
object Tables {

  private val tsCols: Map[String, Seq[String]] = Map(
    "events" -> Seq("ts"),
    "lineitem" -> Seq("l_shipdate"),
    "orders" -> Seq("o_orderdate"))

  /** Run `f` with `spark.sql.shuffle.partitions` temporarily set to `n`,
    * restoring the previous value after. Streaming harness queries use this
    * to size the STATE STORE shard count to the state they actually keep —
    * a stateful operator spins up one store (with per-batch commit I/O) per
    * shuffle partition, so a tiny-state query at 32 partitions pays 32
    * store commits per side per batch for nothing. On a cluster the same
    * knob tracks executor count; results are partitioning-independent
    * (detsum) either way.
    *
    * NOT thread-safe: it mutates the shared session conf and restores it in
    * `finally`, so two concurrent callers on the same SparkSession race and
    * one can run (or permanently restore) the wrong value. The Verify/Bench
    * harnesses run queries strictly sequentially; a concurrent caller must
    * pass a dedicated `spark.newSession()` instead. */
  def withShufflePartitions[T](spark: SparkSession, n: Int)(f: => T): T = {
    val old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", n.toString)
    try f finally spark.conf.set("spark.sql.shuffle.partitions", old)
  }

  /** Collect the (coordinator-sized: top-N / final-agg) `result` to the
    * driver, then SYNCHRONOUSLY free `sketch`'s localCheckpoint blocks —
    * deterministic release, no reliance on GC + ContextCleaner timing. The
    * returned frame is a LocalRelation (the exact analog of an ES response
    * materializing on the coordinator); the big intermediates stay
    * distributed and their storage is gone when this returns. */
  /** Collect `df` (coordinator-sized by contract) to the driver and return
    * it as a LocalRelation — the ES coordinator-materialization analog.
    * Shared by materializeAndFree, VecIndex, and the one-row-aggregate
    * queries so the collect/rebuild idiom lives in exactly one place. */
  def localize(df: DataFrame): DataFrame =
    df.sparkSession.createDataFrame(java.util.Arrays.asList(df.collect(): _*), df.schema)

  def materializeAndFree(result: DataFrame, sketch: DataFrame): DataFrame = {
    val local = localize(result)
    sketch.unpersist(blocking = true) // cache()/persist()-backed storage
    freeCheckpoint(sketch) // localCheckpoint-backed storage (no-op otherwise)
    local
  }

  /** Synchronously unpersist the localCheckpoint blocks backing `df` (a
    * frame returned by `localCheckpoint(true)`) — ROOT only. The pre-r18
    * shape collected every LogicalRDD in the plan, which frees frames the
    * caller does NOT own: a sketch whose plan references a shared
    * build-once artifact (docsAnalyzed/tfArtifact/postings are
    * LogicalRDD leaves since r17) would tear the artifact's blocks out
    * from under every later consumer (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND
    * on lineage-truncated frames — caught by Verify when r18 routed the
    * dedup family through docsAnalyzed). A caller owns exactly the
    * checkpoint it created, which is the plan ROOT; anything deeper is
    * someone else's. */
  def freeCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = true)
      case other =>
        // not a direct checkpoint frame — nothing OWNED to free. But a
        // derived plan that still CONTAINS checkpoint leaves signals an
        // ownership mistake at the call site (the caller meant to free the
        // root it checkpointed and passed a derived frame instead): that
        // leaks blocks silently — the inverse of the pre-r18 over-free bug
        // — so surface it loudly instead of quietly doing nothing (r18
        // ADVICE item).
        if (other.collectLeaves().exists(_.isInstanceOf[org.apache.spark.sql.execution.LogicalRDD]))
          System.err.println(
            "[graft] freeCheckpoint: called on a DERIVED frame whose plan contains " +
              "checkpoint leaves — nothing freed; pass the checkpoint root itself")
    }

  /** Coerce `name`'s declared timestamp columns to TimestampType whatever
    * physical type the drop and session config produced — nano-longs under
    * `nanosAsLong`, TimestampNTZ under a foreign session that skipped
    * GraftSession's `inferTimestampNTZ=false`. Shared by the batch reader
    * below and the streaming file sources
    * ([[graft.streaming.FlowStream.tableStream]]), so every path that
    * reads `ts` downstream sees the same type. */
  def coerceTs(df0: DataFrame, name: String): DataFrame =
    tsCols.getOrElse(name, Nil).filter(df0.columns.contains).foldLeft(df0) { (df, c) =>
      if (df.schema(c).dataType == org.apache.spark.sql.types.LongType)
        df.withColumn(c, timestamp_micros(expr(s"`$c` DIV 1000")))
      else if (df.schema(c).dataType == org.apache.spark.sql.types.TimestampNTZType)
        // only reachable from a foreign session, which may also run a
        // non-UTC session timezone — a bare NTZ→Timestamp cast would
        // interpret the naive wall clock in THAT zone and silently shift
        // the instant. The naive values are UTC by the generator contract:
        // rebuild the instant from the NTZ fields with an EXPLICIT 'UTC'
        // zone (make_timestamp), which is session-tz-independent AND free
        // of the DST fall-back ambiguity a render-then-cast round trip has
        // in zones with overlapping wall clocks (UTC has no DST). extract
        // SECOND keeps the fractional micros (DECIMAL(8,6)).
        df.withColumn(c,
          expr(s"make_timestamp(year(`$c`), month(`$c`), day(`$c`), " +
            s"hour(`$c`), minute(`$c`), extract(SECOND FROM `$c`), 'UTC')"))
      else df
    }

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    coerceTs(spark.read.parquet(s"$sfDir/$name.parquet"), name)
}
