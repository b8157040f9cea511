package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic (partition-order-independent) summation of double terms.
  *
  * A plain double SUM depends on accumulation order, so the same query gives
  * different low bits on 8 cores vs 1000 executors — and never hash-matches a
  * single-threaded oracle. Instead we fix a decimal scale, round each TERM in
  * double space (`round(x * 10^s)` — `round` is an exact half-away-from-zero
  * on the double in both Spark and DuckDB, so per-row results are
  * bit-identical across engines), sum the resulting integers exactly as
  * DECIMAL (associative + commutative), and scale back down once at the end.
  *
  * The same recipe at 100 TB: partial aggregation of exact decimals is safe
  * under any partitioning/AQE re-plan, so results are reproducible run-to-run
  * — a property the raw double sum does not have.
  */
object detsum {

  /** Sum `term` (double) deterministically at `scale` decimal digits.
    *
    * Fast path: the rounded term casts to BIGINT and accumulates in
    * [[graft.plans.SumScaledInt128]] — exact 128-bit integer addition at
    * long speed and fully codegen'd, where the original DECIMAL(27,0) sum
    * ran Spark's BigDecimal slow path (~5× slower per aggregate). The
    * result is the identical exact integer, so the decimal-path oracles
    * are unaffected. [[sumDetDecimal]] keeps the original formulation for
    * the equivalence spec.
    *
    * Domain: |term| must stay below ~9.2e18 / 10^scale (the scaled term
    * must fit a BIGINT — far above every column this engine sums, whose
    * rounded doubles are ≲2^53 anyway, but NARROWER than the old decimal
    * path's 1e17). The guard below raises a descriptive error in every
    * eval mode rather than letting an ANSI cast throw late or a legacy
    * cast clamp silently; terms beyond the long domain should use
    * [[sumDetDecimal]]. NaN/Infinity terms also raise (abs(NaN) < bound is
    * false): a non-finite term means the upstream expression is broken, and
    * a loud error beats the decimal path's silent null-skip — asserted in
    * NativeExprSpec. Requires a session with GraftExtensions installed
    * (GraftSession does this; clusters pass
    * `spark.sql.extensions=graft.plans.GraftExtensions`). */
  def sumDet(term: Column, scale: Int = 10): Column = {
    val factor = math.pow(10, scale)
    val scaled = round(term * lit(factor))
    val guarded = when(scaled.isNull, lit(null).cast("long"))
      .when(abs(scaled) < lit(9.2e18), scaled.cast("long"))
      .otherwise(raise_error(concat(
        lit(s"detsum: |term| * 1e$scale exceeds the BIGINT fast-path domain (term="),
        term.cast("string"), lit("); use sumDetDecimal"))))
    call_function("int128_sum", guarded).cast("double") / lit(factor)
  }

  /** The original decimal-typed formulation of [[sumDet]] — kept as the
    * reference implementation the spec checks the int128 path against. */
  def sumDetDecimal(term: Column, scale: Int = 10): Column = {
    val factor = math.pow(10, scale)
    sum(round(term * lit(factor)).cast(DecimalType(27, 0))).cast("double") / lit(factor)
  }

  /** Driver/executor-side HALF_UP (half away from zero) rounding to Long,
    * matching DuckDB `round()` and Spark's `round` — `math.round` is
    * half-toward-+infinity and diverges on negative *.5 values. The single
    * canonical copy for scaffolding code (packet packing, streaming state). */
  def roundHalfUpLong(v: Double): Long =
    BigDecimal(v).setScale(0, BigDecimal.RoundingMode.HALF_UP).longValue

  /** Cross-engine half-up rounding to `scale` decimal digits (the q10g
    * centroid convention): floor(x·10^s + 0.5)/10^s is three correctly-
    * rounded IEEE ops, so both engines produce the identical double —
    * unlike native round(x, s), whose half-way tie detection differs
    * between Spark's BigDecimal path and DuckDB's C++ round and can
    * diverge on doubles within an ulp of a .5 boundary. Used for DISPLAY
    * rounding in oracle-backed outputs; [[roundDetSql]] is the mirror. */
  def roundDet(c: Column, scale: Int): Column = {
    val f = math.pow(10, scale)
    floor(c * lit(f) + lit(0.5)) / lit(f)
  }

  def roundDetSql(e: String, scale: Int): String =
    s"(floor(($e) * 1e$scale + 0.5) / 1e$scale)"

  /** DuckDB SQL mirror of [[sumDet]] — identical operation sequence. */
  def sumDetSql(termSql: String, scale: Int = 10): String = {
    val factor = s"1.0e$scale"
    s"CAST(SUM(CAST(round(($termSql) * $factor) AS DECIMAL(27,0))) AS DOUBLE) / $factor"
  }
}
