package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Exact sum of pre-scaled LONG terms in a 128-bit integer accumulator —
  * the fast path under [[graft.functions.detsum]].
  *
  * The determinism recipe needs an EXACT, order-independent sum of scaled
  * integers. The original implementation cast each term to DECIMAL(27,0)
  * and used the built-in decimal sum, which is exact but runs on Spark's
  * BigDecimal-backed slow path — measured ~0.5 s per aggregate over 6M rows
  * (q61's 16 moments: 8.6 s). This aggregate keeps the exactness and drops
  * the cost: the accumulator is two 64-bit words (hi, lo) updated with
  * plain long arithmetic + a classic carry-out bit trick, fully
  * whole-stage-codegen'd as a [[DeclarativeAggregate]]. Usable capacity is
  * the DECIMAL(38,0) emit bound (|total| < 1e38 — at the standard 1e10
  * scale that is ~1e28 of summed magnitude, exabytes of rows, an order
  * above DECIMAL(27,0)'s bound); evaluation RAISES on a total beyond it
  * rather than wrapping or nulling silently.
  *
  * Semantics match the decimal sum bit-for-bit: same null-skipping (null
  * terms ignored; all-null/empty group → null), same exact integer total,
  * and the final DECIMAL(38,0) result casts to double identically — so
  * every DuckDB oracle that matched the decimal path matches this one.
  *
  * Addition is commutative/associative mod 2^128, so partial aggregation,
  * AQE re-plans, and any merge order give identical results. */
case class SumScaledInt128(child: Expression)
  extends DeclarativeAggregate with UnaryLike[Expression] {

  override def dataType: DataType = DecimalType(38, 0)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"int128_sum needs a BIGINT term, got ${child.dataType.catalogString}")

  private lazy val hi = AttributeReference("hi", LongType, nullable = false)()
  private lazy val lo = AttributeReference("lo", LongType, nullable = false)()
  private lazy val seen = AttributeReference("seen", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(hi, lo, seen)

  override lazy val initialValues: Seq[Expression] =
    Seq(Literal(0L), Literal(0L), Literal(false))

  /** Carry-out of the unsigned 64-bit addition a + b = s:
    * MSB of ((a & b) | ((a | b) & ~s)). */
  private def carry(a: Expression, b: Expression, s: Expression): Expression =
    ShiftRightUnsigned(
      BitwiseOr(
        BitwiseAnd(a, b),
        BitwiseAnd(BitwiseOr(a, b), BitwiseNot(s))),
      Literal(63))

  override lazy val updateExpressions: Seq[Expression] = {
    val x = Coalesce(Seq(child, Literal(0L)))
    val newLo = Add(lo, x, EvalMode.LEGACY)
    Seq(
      // x sign-extends into the high word (x >> 63 is 0 or -1), plus the
      // carry out of the unsigned low-word addition
      Add(Add(hi, ShiftRight(x, Literal(63)), EvalMode.LEGACY), carry(lo, x, newLo), EvalMode.LEGACY),
      newLo,
      Or(seen, IsNotNull(child)))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val newLo = Add(lo.left, lo.right, EvalMode.LEGACY)
    Seq(
      Add(Add(hi.left, hi.right, EvalMode.LEGACY), carry(lo.left, lo.right, newLo), EvalMode.LEGACY),
      newLo,
      Or(seen.left, seen.right))
  }

  override lazy val evaluateExpression: Expression = {
    val dec = DecimalType(38, 0)
    val two64 = Literal(Decimal(BigDecimal(2).pow(64)), dec)
    val loDec = Cast(lo, dec)
    // lo as an UNSIGNED word: add 2^64 back when the sign bit is set
    val loUnsigned = If(LessThan(lo, Literal(0L)), Add(loDec, two64, EvalMode.LEGACY), loDec)
    val total = Add(Multiply(Cast(hi, dec), two64, EvalMode.LEGACY), loUnsigned, EvalMode.LEGACY)
    // totals with |hi| beyond this bound cannot round-trip DECIMAL(38,0)
    // (LEGACY decimal overflow would NULL silently) — fail loudly instead;
    // exactness must never degrade quietly. 5.4e18 ≈ (1e38 − 2^64) / 2^64.
    val hiSafe = LessThan(Abs(hi, failOnError = false), Literal(5400000000000000000L))
    val checked = If(
      hiSafe,
      total,
      Cast(
        RaiseError(Literal("int128_sum: total exceeds the DECIMAL(38,0) emit bound")),
        dec))
    If(Not(seen), Literal(null, dec), checked)
  }

  override def prettyName: String = "int128_sum"
  override protected def withNewChildInternal(newChild: Expression): SumScaledInt128 =
    copy(child = newChild)
}
