package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Guards for the rank-windowed text-surface registries: the shipped corpus
  * has only ~24 length-≥4 vocabulary terms at every SF, so a careless rank
  * window silently selects nothing and the dependent oracle row passes
  * VACUOUSLY (the original q77 bug: a 26..33 window over 24 terms). These
  * assertions make an empty registry a loud failure instead. */
class TextSurfaceSpec extends AnyFunSuite {

  lazy val spark = GraftSession.builder("4").getOrCreate()
  private val sf = "/root/testdata/sf0.001"

  test("the ranked vocabulary covers every rank window the queries use") {
    val n = queries.TextQueries.rankedVocab(spark, sf).count()
    assert(n >= 15, s"vocab has $n length->=4 terms; the BM25 window needs rank 15")
  }

  test("the percolator registry holds its full 8 rules and q77 matches rows") {
    val rules = queries.TextQueries.percolateRules(spark, sf)
    assert(rules.count() == 8)
    val out = SparkEntry.queries("q77_percolate")(spark, sf)
    assert(out.count() > 0, "percolation must match at least one rule non-vacuously")
  }

  test("q76's query is the full 5 terms and top hits match several of them") {
    val out = SparkEntry.queries("q76_bm25_search")(spark, sf).collect()
    assert(out.nonEmpty)
    val maxHit = out.map(_.getAs[Long]("n_terms_hit")).max
    assert(maxHit >= 2, s"top docs match only $maxHit query term(s) — query too narrow")
  }

  test("q67b produces suggestions for every prefix") {
    val out = SparkEntry.queries("q67b_completion_suggest")(spark, sf)
    assert(out.select("prefix").distinct().count() > 0)
    assert(out.count() > 0)
  }
}
