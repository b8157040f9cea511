package graft.plans

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row kernels shared by the interpreted (`nullSafeEval`) and generated
  * (`doGenCode`) paths of the native expressions — one implementation, two
  * call sites, so eval parity is by construction. Scala objects emit static
  * forwarders, so generated Java calls these directly
  * (`graft.plans.NativeKernels.vecDot(a, b)`), keeping the enclosing stage
  * inside whole-stage codegen with a single non-virtual call per row. */
object NativeKernels {

  private val Sep = UTF8String.fromString(" ")

  /** SplitMix64 finalizer — derives the i-th MinHash family member from one
    * base hash (standard universal-hashing construction). */
  @inline def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** k-component MinHash signature in one pass over the shingle array. */
  def minhashSig(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      val h0 = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      var j = 0
      while (j < k) {
        val h = mix64(h0 + 0x9e3779b97f4a7c15L * (j + 1))
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** 64-bit SimHash in one pass: per-token seed-42 xxhash64, bit b set iff
    * strictly more than half the tokens have bit b set. */
  def simhash64(arr: ArrayData): Long = {
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
    out
  }

  /** Word n-grams joined by ' ', single pass — exactly the strings of the
    * HOF form `transform(sequence(...), i -> array_join(slice(toks, i, n), ' '))`. */
  def wordShingles(arr: ArrayData, n: Int): ArrayData = {
    val m = arr.numElements()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m - n + 1)
    var i = 0
    while (i <= m - n) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) { parts(j) = arr.getUTF8String(i + j); j += 1 }
      out(i) = UTF8String.concatWs(Sep, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** All `tables` random-hyperplane LSH buckets in ONE pass: bucket t bit p
    * is the sign of Σ ±x[i] with the sign of component i drawn from
    * xxhash64(t*seedStride + p, i) — exactly the per-table
    * [[graft.functions.vectors.rhpBucket]] HOF (int literals hash via
    * hashInt, seed chain 42 → plane → component), but tables×bits
    * interpreted array folds collapse into one compiled loop. */
  def rhpBuckets(vec: ArrayData, bits: Int, tables: Int, seedStride: Int): ArrayData = {
    val n = vec.numElements()
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var p = 0
      while (p < bits) {
        val hseed = XXH64.hashInt(t * seedStride + p, 42L)
        var acc = 0.0d
        var i = 0
        while (i < n) {
          val x = vec.getDouble(i)
          acc += (if ((XXH64.hashInt(i, hseed) & 1L) == 0L) x else -x)
          i += 1
        }
        if (acc > 0.0d) bucket |= (1L << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Double dot product, accumulating left-to-right exactly like the
    * `aggregate(zip_with(...))` fold — bit-identical to the DuckDB oracle's
    * left-associated term chain. */
  def vecDot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0d
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }
}
