package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.detlog

/** Cross-engine-deterministic HyperLogLog — the ES `cardinality` agg
  * re-expressed so a DuckDB oracle can replay it bit-for-bit (the q15b
  * histogram-sketch precedent applied to cardinality).
  *
  * Spark's `approx_count_distinct` is the same sketch FAMILY but an opaque
  * implementation (its hash and bias tables aren't replayable in SQL), so
  * it could only ever be rows-only checked. This HLL is built from shared
  * deterministic pieces instead:
  *  - hash: first 15 md5 hex chars of the value's decimal string — the
  *    repo's standard 60-bit cross-engine hash (NativeKernels.scala:27,
  *    q33's convention);
  *  - registers: low 12 bits bucket (m = 4096), remaining 48 bits `w`,
  *    rho(w) = leading-zero count + 1 via an integer CASE chain (exact);
  *  - register sum: Σ 2^(49−rho_max) as an EXACT integer (each term a
  *    power of two ≤ 2^49 — the empty-register rho_max = 0 term — so the
  *    sum is at most 4096·2^49 = 2^61 < 2^63), so the only floating
  *    point is the final estimate formula — a fixed IEEE sequence from
  *    shared SQL text, identical in both engines;
  *  - small-range (linear-counting) branch: m·ln(m/V) via [[detlog]]'s
  *    basic-op log2 (the q13c recipe) — no libm transcendental anywhere.
  *
  * Scale shape: one narrow shuffle of (group, bucket, rho_max) partials —
  * map-side combine bounds rows at groups × 4096 per partition, the
  * classic mergeable-sketch partial aggregation (what the ES agg does
  * across shards). Accuracy: σ ≈ 1.04/√4096 ≈ 1.6% relative.
  *
  * Reference: the effective ES surface's `cardinality` agg
  * (`org.elasticsearch.search.aggregations.metrics.CardinalityAggregator`
  * semantics); constants per Flajolet et al.'s HLL paper. */
object Hll {

  /** Registers (p = 12 ⇒ m = 4096). */
  val M = 4096

  /** Hash bits left after the bucket index: 60 − 12. */
  val WBits = 48

  /** rho of an all-zero w. */
  val MaxRho = WBits + 1

  private def floorLog2Case(in: String): String =
    (WBits - 1 to 1 by -1).map(k => s"WHEN $in >= ${1L << k} THEN $k")
      .mkString("CASE ", " ", " ELSE 0 END")

  /** Shared SQL text: rho (leading-zero count + 1) of the 48-bit integer
    * column `w` — integer comparisons only, exact in any engine. */
  def rhoSql(w: String): String =
    s"CASE WHEN $w = 0 THEN $MaxRho ELSE $WBits - (${floorLog2Case(w)}) END"

  /** Shared SQL text: the HLL estimate from the exact register sum
    * `sTotal` = Σ 2^(49−rho_max) (empty registers contributing 2^49), the
    * zero-register count `v`, and `lgv` = log2(max(v,1)) (detlog). Every
    * literal is spelled once here, so the IEEE op sequence is identical by
    * construction in Spark and DuckDB. Every numeric literal is CAST to
    * DOUBLE explicitly: bare decimal literals parse as DECIMAL in BOTH
    * engines (the q61/q62 type-split lesson), and DuckDB's decimal scale
    * propagation overflows DECIMAL(38) in this very formula. */
  def estimateSql(sTotal: String, v: String, lgv: String): String = {
    def d(x: String) = s"CAST($x AS DOUBLE)"
    // alpha_m for m >= 128, per the HLL paper
    val alpha = s"${d("0.7213")} / (${d("1.0")} + ${d("1.079")} / ${d("4096.0")})"
    val pow2_49 = d((1L << 49).toString) // 2^49 — exact in a double
    val eRaw = s"($alpha) * ${d("4096.0")} * ${d("4096.0")} * $pow2_49 / CAST($sTotal AS DOUBLE)"
    // linear counting below 2.5m with empty registers present:
    // m * ln(m/V) = m * (12 - log2 V) * ln 2 (log2 via detlog, basic ops)
    val ln2 = d("0.6931471805599453")
    s"CASE WHEN ($eRaw) <= ${d("10240.0")} AND $v > 0 " +
      s"THEN ${d("4096.0")} * ((${d("12.0")} - $lgv) * $ln2) ELSE ($eRaw) END"
  }

  /** `groupBy(keys).agg(hll_cardinality(value))` as declarative algebra:
    * returns one row per key group with `outCol` = the HLL estimate
    * (BIGINT). `value` is hashed via its decimal-string rendering. */
  def cardinality(df: DataFrame, keys: Seq[Column], value: Column, outCol: String): DataFrame = {
    val base = df
      .select(keys :+ conv(substring(md5(value.cast("string").cast("binary")), 1, 15), 16, 10)
        .cast("long").as("h"): _*)
      .select(keys ++ Seq(expr(s"h % $M").as("bucket"), expr(s"h DIV $M").as("w")): _*)
      .select(keys ++ Seq(col("bucket"), expr(rhoSql("w")).as("rho")): _*)
    val regs = base.groupBy(keys :+ col("bucket"): _*).agg(max(col("rho")).as("rmax"))
    val g = regs.groupBy(keys: _*)
      .agg(
        count(lit(1)).as("nb"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $MaxRho - rmax)")).as("sp"))
      .withColumn("v", lit(M.toLong) - col("nb"))
      .withColumn("vpos", greatest(col("v"), lit(1L)))
      .withColumn("s_total", col("sp") + col("v") * lit(1L << MaxRho))
    detlog.withLog2(g, "vpos", "lgv")
      .select(keys :+ expr(
        s"CAST(FLOOR((${estimateSql("s_total", "v", "lgv")}) + CAST(0.5 AS DOUBLE)) AS BIGINT)")
        .as(outCol): _*)
  }

  /** The DuckDB mirror of [[cardinality]] over the `events` table grouped
    * by event_type — shared text with the Spark side via [[rhoSql]] /
    * [[estimateSql]] / [[detlog.log2SqlCtes]]. */
  def eventsOracleSql(outCol: String): String =
    s"""WITH hsrc AS (
       |  SELECT event_type,
       |         CAST(concat('0x', substring(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
       |  FROM events
       |),
       |hb AS (SELECT event_type, h % $M AS bucket, h // $M AS w FROM hsrc),
       |hr AS (
       |  SELECT event_type, bucket, MAX(${rhoSql("w")}) AS rmax
       |  FROM hb GROUP BY 1, 2
       |),
       |hg AS (
       |  SELECT event_type, COUNT(*) AS nb,
       |         CAST(SUM(CAST(1 AS BIGINT) << ($MaxRho - rmax)) AS BIGINT) AS sp
       |  FROM hr GROUP BY 1
       |),
       |hg2 AS (
       |  SELECT event_type, $M - nb AS v, GREATEST($M - nb, CAST(1 AS BIGINT)) AS vpos,
       |         sp + CAST($M - nb AS BIGINT) * (CAST(1 AS BIGINT) << $MaxRho) AS s_total
       |  FROM hg
       |),
       |${detlog.log2SqlCtes("hg2", "vpos", "lgv", "hll")}
       |SELECT event_type,
       |       CAST(FLOOR((${estimateSql("s_total", "v", "lgv")}) + CAST(0.5 AS DOUBLE)) AS BIGINT) AS $outCol
       |FROM hllfin""".stripMargin
}
