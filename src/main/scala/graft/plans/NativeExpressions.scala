package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the sketch/vector hot paths.
  *
  * The composable higher-order-function forms (graft.functions.text/vectors)
  * are interpreted per element and re-hash their inputs once per signature
  * component — measured 19s for MinHash-LSH at sf0.1. These single-pass
  * eval implementations keep the same semantics (seed-42 xxhash64 per token,
  * identical accumulation order for dot products, so DuckDB oracles still
  * match bit-for-bit) at a fraction of the cost. Registered SQL-side via
  * [[GraftExtensions]]. */
object NativeExpressions {
  /** SplitMix64 finalizer — derives the i-th MinHash family member from one
    * base hash (standard universal-hashing construction). */
  @inline def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}

/** minhash_sig(shingles, k): k-component MinHash signature in one pass over
  * the shingle array (vs k array traversals with k string re-hashes each). */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      val h0 = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      var j = 0
      while (j < k) {
        val h = NativeExpressions.mix64(h0 + 0x9e3779b97f4a7c15L * (j + 1))
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
  override protected def withNewChildInternal(newChild: Expression): MinHashSig = copy(child = newChild)
}

/** simhash64(tokens): 64-bit SimHash in one pass (vs 64 folds each
  * re-hashing every token). Same semantics as the HOF form: per-token
  * seed-42 xxhash64, bit b set iff strictly more than half the tokens have
  * bit b set. */
case class SimHash64(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      var b = 0
      while (b < 64) {
        counts(b) += ((h >>> b) & 1L).toInt
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) * 2 > n) out |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(out)
  }
  override protected def withNewChildInternal(newChild: Expression): SimHash64 = copy(child = newChild)
}

/** word_shingles(tokens, n): word n-grams joined by ' ', single pass.
  * Produces exactly the strings of the HOF form
  * `transform(sequence(...), i -> array_join(slice(toks, i, n), ' '))` —
  * which costs ~1.4ms/doc interpreted and dominated the dedup pipeline. */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression with CodegenFallback {
  import org.apache.spark.unsafe.types.UTF8String
  private val sep = UTF8String.fromString(" ")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m - n + 1)
    var i = 0
    while (i <= m - n) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = arr.getUTF8String(i + j); j += 1 }
      out(i) = UTF8String.concatWs(sep, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(newChild: Expression): WordShingles = copy(child = newChild)
}

/** vec_dot(a, b): double dot product, accumulating left-to-right exactly
  * like the `aggregate(zip_with(...))` fold it replaces — results stay
  * bit-identical to the DuckDB oracle's left-associated term chain. */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0d
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}
