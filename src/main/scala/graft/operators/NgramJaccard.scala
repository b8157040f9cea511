package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inverted-index n-gram Jaccard pair generation with a document-frequency
  * cap.
  *
  * The naive inverted-index self-join is quadratic PER SHINGLE: a shingle
  * shared by k documents lands k(k−1)/2 pairs in one reducer, so a single
  * boilerplate phrase across 1M docs is 5·10¹¹ pairs in one task. Real
  * pipelines drop shingles above a df threshold before pairing — those
  * shingles are templates/stop-phrases with no discriminative value.
  *
  * Shape (the 100 TB-safe one): ONE shuffle groups the exploded
  * (doc, shingle) index into per-shingle posting lists; lists longer than
  * `dfCap` are dropped in the same aggregation; candidate pairs are then
  * enumerated locally by a double explode, so row width is bounded by
  * `dfCap` and pair fan-out by dfCap² — no self-join, no unbounded reducer.
  */
object NgramJaccard {

  /** Boilerplate cap: a 3-gram shared by more documents than this is
    * treated as template text and never generates candidate pairs. */
  val DefaultDfCap = 100

  /** Input: one row per doc with `doc_id`, `n` (shingle count) and `sh`
    * (distinct shingles). Output: (doc_a, doc_b, n_a, n_b, shared) for every
    * pair sharing ≥1 surviving shingle, doc_a < doc_b. */
  def sharedCounts(docs: DataFrame, dfCap: Int = DefaultDfCap): DataFrame = {
    val ex = docs.select(col("doc_id"), col("n"), explode(col("sh")).as("s"))
    val postings = ex
      .groupBy(col("s"))
      .agg(collect_list(struct(col("doc_id"), col("n"))).as("ps"))
      .filter(size(col("ps")) >= 2 && size(col("ps")) <= dfCap)
    postings
      .select(explode(col("ps")).as("a"), col("ps"))
      .select(col("a"), explode(col("ps")).as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("doc_a"),
        col("b.doc_id").as("doc_b"),
        col("a.n").as("n_a"),
        col("b.n").as("n_b"))
      .groupBy(col("doc_a"), col("doc_b"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("shared"))
  }
}
