package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for the training-data pipeline operators —
  * all native Catalyst functions (split/transform/xxhash64/...), no UDFs, so
  * they stay inside codegen and scale linearly with input bytes. */
object text {

  /** Normalized text: lowercase, trimmed, whitespace collapsed. */
  def norm(c: Column): Column =
    regexp_replace(trim(lower(c)), "\\s+", " ")

  /** Whitespace tokens of the normalized text. */
  def tokens(c: Column): Column =
    split(norm(c), " ")

  /** Word n-gram shingles ("a b c" style), empty array when too short —
    * native single-pass expression (graft.plans.WordShingles). */
  def shingles(toks: Column, n: Int): Column =
    call_function("word_shingles", toks, lit(n))

  /** Interpreted HOF form of [[shingles]] — kept for parity testing.
    * (The `when` guard matters: sequence(1, 0) would count DOWN.) */
  def shinglesHof(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(
        transform(
          sequence(lit(1), size(toks) - lit(n - 1)),
          i => array_join(slice(toks, i, lit(n)), " ")))

  /** Count of tokens that appear in `words`. */
  def stopwordCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(lit(_)): _*)))

  /** Full MinHash signature as an array of `k` components — native
    * single-pass expression (graft.plans.MinHashSig). Cross-engine
    * deterministic: md5-based base fingerprint + affine family mod 2³¹−1
    * (see NativeKernels.minhashSig), so DuckDB oracles can recompute the
    * identical signature. */
  def minhashSignature(shingleCol: Column, k: Int): Column =
    call_function("minhash_sig", shingleCol, lit(k))

  /** 60-bit SimHash over tokens: for each bit, majority vote of the tokens'
    * md5-derived bits — native single-pass expression
    * (graft.plans.SimHash60). Cross-engine deterministic: the per-token
    * hash is the value of md5's first 15 hex chars, so DuckDB oracles can
    * recompute the identical sketch. */
  def simhash60(toks: Column): Column =
    call_function("simhash60", toks)

  /** Interpreted HOF form of [[simhash60]] — kept for parity testing. */
  def simhash60Hof(toks: Column): Column = {
    val hashes = transform(toks, t => conv(substring(md5(t.cast("binary")), 1, 15), 16, 10).cast("long"))
    val n = size(toks)
    (0 until 60)
      .map { b =>
        val cnt = aggregate(hashes, lit(0L), (acc, h) => acc + shiftright(h, b).bitwiseAND(lit(1L)))
        when(cnt * 2 > n, shiftleft(lit(1L), b)).otherwise(lit(0L))
      }
      .reduce((a, b) => a.bitwiseOR(b))
  }

  /** Hamming distance between two ≤64-bit hashes. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))
}
