package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-engine-deterministic log2 over positive integers.
  *
  * libm transcendentals (log/exp/pow) differ in the last ulp across engines,
  * so a hash-compared oracle can never call them (the repo rule since the
  * geo queries). But every IEEE-754 BASIC op (+ − × ÷, compare) is
  * correctly-rounded and bit-identical everywhere, so log2 built from basic
  * ops alone is hash-safe. Algorithm (the classic bit-by-bit square-and-
  * halve; only the squaring multiply rounds, identically on both engines):
  *
  *   E   = floor(log2(c))            — integer CASE chain over powers of 2
  *   m   = c / 2^E ∈ [1,2)           — exact (power-of-two division)
  *   f_0 = 0;  y_0 = m
  *   for k in 1..24:
  *     s_k = y_{k-1}²                — the ONE rounded op per step
  *     y_k = s_k ≥ 2 ? s_k/2 : s_k   — exact
  *     f_k = f_{k-1} + (s_k ≥ 2 ? 2⁻ᵏ : 0)   — exact dyadic additions
  *   log2(c) = E + f_24              — exact (integer + fraction)
  *
  * 24 fraction bits ≈ 6e-8 relative error — far below the round-6 display
  * precision, and in any case BOTH engines compute the same approximation,
  * so the comparison is exact regardless.
  *
  * [[withLog2]] is the Spark side (a withColumn chain); [[log2SqlAliases]]
  * emits the IDENTICAL arithmetic sequence as DuckDB lateral column aliases
  * — the two are generated from the same constants in this file. */
object detlog {

  /** Fraction bits. */
  val Steps = 24

  /** Exponent range: covers counts up to 2^62. */
  private val MaxExp = 62

  /** Spark side: adds `out` = log2(`in`) (double) to `df`. `in` must be a
    * positive integral column. One codegen'd kernel call
    * (graft.plans.DetLog2) computing the identical IEEE sequence as
    * [[withLog2Chain]] — the chain's ~100 withColumns cost quadratic plan
    * analysis per query (measured 2.2 s of pure planning in q70's four
    * chains); NativeExprSpec asserts the two stay bit-equal. */
  def withLog2(df: DataFrame, in: String, out: String): DataFrame =
    df.withColumn(out, call_function("det_log2", col(in).cast("long")))

  /** The original withColumn-chain form — the executable specification of
    * the op sequence (and of the DuckDB mirror [[log2SqlCtes]]); kept for
    * the native expression's parity test. */
  def withLog2Chain(df: DataFrame, in: String, out: String): DataFrame = {
    val c = col(in)
    // E and 2^E via CASE chains (first match = highest power <= c)
    def caseChain(value: Int => Double): org.apache.spark.sql.Column = {
      val first = when(c >= (1L << MaxExp), lit(value(MaxExp)))
      (MaxExp - 1 to 1 by -1)
        .foldLeft(first)((w, k) => w.when(c >= (1L << k), lit(value(k))))
        .otherwise(lit(value(0)))
    }
    val eCol = caseChain(k => k.toDouble)
    val p2Col = caseChain(k => (1L << k).toDouble)
    var d = df
      .withColumn("__y", c.cast("double") / p2Col)
      .withColumn("__f", lit(0.0))
    for (k <- 1 to Steps) {
      val bit = 1.0 / (1L << k) // exact dyadic
      d = d.withColumn("__s", col("__y") * col("__y"))
        .withColumn("__yn", when(col("__s") >= 2.0, col("__s") / 2.0).otherwise(col("__s")))
        .withColumn("__f", when(col("__s") >= 2.0, col("__f") + lit(bit)).otherwise(col("__f")))
        .withColumn("__y", col("__yn"))
    }
    d.withColumn(out, eCol + col("__f"))
      .drop("__y", "__f", "__s", "__yn")
  }

  /** DuckDB side: the same sequence as a chain of MATERIALIZED CTEs — one
    * per squaring step. MATERIALIZED is load-bearing: DuckDB inlines plain
    * CTEs/lateral aliases textually, and each step references the previous
    * step's value more than once, so an inlined chain expands 2^Steps-fold
    * (observed: a 54 GB planner blow-up). Materializing each ~|alphabet|-row
    * step keeps every expression bounded.
    *
    * Returns a WITH-clause fragment (no trailing comma); the final CTE is
    * named `<tag>fin` and exposes all of `src`'s columns plus `out`.
    * Usage: `WITH counts AS (...), ${log2SqlCtes("counts", "c", "lg",
    * "lgc")}, next AS (SELECT ... FROM lgcfin ...)`. */
  def log2SqlCtes(src: String, in: String, out: String, tag: String): String = {
    val eCase = (MaxExp to 1 by -1)
      .map(k => s"WHEN $in >= ${1L << k} THEN ${k.toDouble}")
      .mkString("CASE ", " ", " ELSE 0.0 END")
    val p2Case = (MaxExp to 1 by -1)
      .map(k => s"WHEN $in >= ${1L << k} THEN ${(1L << k).toDouble}")
      .mkString("CASE ", " ", " ELSE 1.0 END")
    val head =
      s"""${tag}0 AS MATERIALIZED (
         |  SELECT *, $eCase AS ${tag}_e,
         |         CAST($in AS DOUBLE) / ($p2Case) AS ${tag}_y0,
         |         CAST(0.0 AS DOUBLE) AS ${tag}_f0
         |  FROM $src
         |)""".stripMargin
    val steps = (1 to Steps).map { k =>
      // exact decimal spelling of the dyadic 2^-k (BigDecimal division by a
      // power of two terminates)
      val bit = java.math.BigDecimal.ONE
        .divide(java.math.BigDecimal.valueOf(1L << k)).toPlainString
      val y = s"${tag}_y${k - 1}"
      s"""$tag$k AS MATERIALIZED (
         |  SELECT *,
         |         CASE WHEN $y * $y >= 2.0 THEN ($y * $y) / 2.0 ELSE $y * $y END AS ${tag}_y$k,
         |         CASE WHEN $y * $y >= 2.0 THEN ${tag}_f${k - 1} + $bit ELSE ${tag}_f${k - 1} END AS ${tag}_f$k
         |  FROM $tag${k - 1}
         |)""".stripMargin
    }
    // DOUBLE f0 (and an explicit DOUBLE at the emit) keep the whole f
    // accumulator in IEEE doubles — the IDENTICAL arithmetic to
    // withLog2Chain. A bare `0.0` seeds a DECIMAL accumulator instead,
    // whose materialized 38-digit cap can drift the late dyadic bits by
    // 1 ulp vs the double chain — invisible under round(x,6) consumers,
    // a hash mismatch for raw-emitted outputs (q76c's factor).
    val fin = s"${tag}fin AS (SELECT *, CAST(${tag}_e AS DOUBLE) + ${tag}_f$Steps AS $out FROM $tag$Steps)"
    (head +: steps :+ fin).mkString(",\n")
  }
}
