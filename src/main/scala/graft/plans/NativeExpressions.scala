package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the sketch/vector hot paths.
  *
  * The composable higher-order-function forms (graft.functions.text/vectors)
  * are interpreted per element and re-hash their inputs once per signature
  * component — measured 19s for MinHash-LSH at sf0.1. These keep exact,
  * oracle-matchable semantics (md5-derived hashes for MinHash/SimHash so
  * DuckDB recomputes the identical sketches; seed-42 xxhash64 only for RHP,
  * which has no oracle; identical accumulation order for dot products) at a
  * fraction of the cost. Registered SQL-side via [[GraftExtensions]].
  *
  * All four generate code (`doGenCode` emits one [[NativeKernels]] call), so
  * they sit INSIDE whole-stage codegen instead of forcing the interpreted
  * fallback that boxes every row of the surrounding stage. The interpreted
  * `nullSafeEval` path calls the same kernel — parity by construction
  * (NativeExprSpec additionally asserts it against the HOF forms). */
object NativeExpressions {
  /** SplitMix64 finalizer (kept as a public alias — see [[NativeKernels.mix64]]). */
  @inline def mix64(z0: Long): Long = NativeKernels.mix64(z0)
}

/** minhash_sig(shingles, k): k-component MinHash signature in one pass over
  * the shingle array (vs k array traversals with k string re-hashes each). */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    NativeKernels.minhashSig(input.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.plans.NativeKernels.minhashSig($c, $k);")
  override protected def withNewChildInternal(newChild: Expression): MinHashSig = copy(child = newChild)
}

/** simhash60(tokens): 60-bit md5-based SimHash in one pass (vs 60 folds
  * each re-hashing every token). */
case class SimHash60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(NativeKernels.simhash60(input.asInstanceOf[ArrayData]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.plans.NativeKernels.simhash60($c);")
  override protected def withNewChildInternal(newChild: Expression): SimHash60 = copy(child = newChild)
}

/** word_shingles(tokens, n): word n-grams joined by ' ', single pass. */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    NativeKernels.wordShingles(input.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.plans.NativeKernels.wordShingles($c, $n);")
  override protected def withNewChildInternal(newChild: Expression): WordShingles = copy(child = newChild)
}

/** rhp_buckets(vec, bits, tables, seedStride): all multi-table RHP-LSH
  * buckets in one pass — the fused form of `tables` separate rhpBucket HOF
  * calls (each of which is `bits` interpreted array folds). */
case class RhpBuckets(child: Expression, bits: Int, tables: Int, seedStride: Int)
    extends UnaryExpression {
  override def prettyName: String = "rhp_buckets"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    NativeKernels.rhpBuckets(input.asInstanceOf[ArrayData], bits, tables, seedStride)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.NativeKernels.rhpBuckets($c, $bits, $tables, $seedStride);")
  override protected def withNewChildInternal(newChild: Expression): RhpBuckets = copy(child = newChild)
}

/** det_log2(c): graft.functions.detlog's cross-engine log2 as a single
  * codegen'd call — bit-equal to the 24-step chain (and therefore to the
  * DuckDB CTE mirror), minus the chain's quadratic plan-analysis cost.
  * Accepts INT or BIGINT (a SQL caller's literal folds through the
  * interpreted path as an Integer — a bare asInstanceOf[Long] would CCE);
  * anything else fails analysis with a readable message. */
case class DetLog2(child: Expression) extends UnaryExpression {
  override def prettyName: String = "det_log2"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"det_log2 requires an integral argument, got $t")
  }
  override def dataType: DataType = DoubleType
  override def nullSafeEval(input: Any): Any =
    java.lang.Double.valueOf(NativeKernels.detLog2(input match {
      case l: java.lang.Long => l.longValue
      case i: java.lang.Integer => i.longValue
    }))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = graft.plans.NativeKernels.detLog2($c);")
  override protected def withNewChildInternal(newChild: Expression): DetLog2 = copy(child = newChild)
}

/** geohash_enc(lat, lon): `chars`-character base32 geohash via the
  * interleaved-bisection kernel — bit-equal to graft.functions.geohash's
  * withColumn chain (and its DuckDB CTE mirror), minus the chain's
  * quadratic plan-analysis cost. */
case class GeohashEnc(left: Expression, right: Expression, chars: Int) extends BinaryExpression {
  override def prettyName: String = "geohash_enc"
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == DoubleType && right.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"geohash_enc requires DOUBLE lat/lon, got (${left.dataType}, ${right.dataType})")
  override def dataType: DataType = StringType
  override def nullSafeEval(lat: Any, lon: Any): Any =
    NativeKernels.geohashEnc(lat.asInstanceOf[Double], lon.asInstanceOf[Double], chars)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (la, lo) =>
      s"${ev.value} = graft.plans.NativeKernels.geohashEnc($la, $lo, $chars);")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): GeohashEnc =
    copy(left = newLeft, right = newRight)
}

/** vec_dot(a, b): double dot product, accumulating left-to-right exactly
  * like the `aggregate(zip_with(...))` fold it replaces — results stay
  * bit-identical to the DuckDB oracle's left-associated term chain. */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(l: Any, r: Any): Any =
    java.lang.Double.valueOf(NativeKernels.vecDot(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = graft.plans.NativeKernels.vecDot($a, $b);")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}
