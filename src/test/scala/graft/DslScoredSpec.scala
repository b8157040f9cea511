package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.QueryDsl

/** Query-context search through the JSON front door (q148/q149/q155) and
  * the _msearch envelope (q154): the JSON-compiled ranking must be
  * ROW-IDENTICAL to the typed q76/q86/q82 entries (the oracles are shared,
  * this is the second proof direction), and every rejected request must
  * fail LOUDLY. Also pins the analyzed-probe match (q139's token-frame
  * path) equal to the regex-scan path on the real corpus. */
class DslScoredSpec extends AnyFunSuite {

  lazy val spark = GraftSession.builder("4").getOrCreate()
  private val sf = "/root/testdata/sf0.001"

  test("q148: front-door match ranking is row-identical to typed q76 (rank, doc_id, score)") {
    val dsl = SparkEntry.queries("q148_dsl_match_scored")(spark, sf).collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[Long]("doc_id"), r.getAs[Double]("score")))
      .sortBy(_._1)
    val typed = SparkEntry.queries("q76_bm25_search")(spark, sf).collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[Long]("doc_id"), r.getAs[Double]("score")))
      .sortBy(_._1)
    assert(dsl.length == 20)
    assert(dsl.toSeq == typed.toSeq, "front-door BM25 ranking diverged from typed q76")
  }

  test("q149: front-door multi_match best_fields is row-identical to typed q86") {
    val dsl = SparkEntry.queries("q149_dsl_multi_match")(spark, sf).collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[Long]("doc_id"), r.getAs[Double]("score")))
      .sortBy(_._1)
    val typed = SparkEntry.queries("q86_multi_match")(spark, sf).collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[Long]("doc_id"), r.getAs[Double]("final")))
      .sortBy(_._1)
    assert(dsl.length == 20)
    assert(dsl.toSeq == typed.toSeq, "front-door dis_max ranking diverged from typed q86")
  }

  test("q155: front-door highlight payload is row-identical to typed q82") {
    val dsl = SparkEntry.queries("q155_dsl_highlight")(spark, sf).collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("frag_pos"), r.getAs[String]("fragment"))).sortBy(_._1)
    val typed = SparkEntry.queries("q82_highlight")(spark, sf).collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("frag_pos"), r.getAs[String]("fragment"))).sortBy(_._1)
    assert(dsl.length == 20)
    assert(dsl.forall(_._4.contains("<em>")))
    assert(dsl.toSeq == typed.toSeq, "front-door fragments diverged from typed q82")
  }

  test("q166/q167/q168: front-door multi_match types are row-identical to typed q86b/q86c/q86d") {
    def dslRows(name: String) = SparkEntry.queries(name)(spark, sf).collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[Long]("doc_id"), r.getAs[Double]("score")))
      .sortBy(_._1).toSeq
    def typedRows(name: String) = SparkEntry.queries(name)(spark, sf).collect()
      .map(r => (r.getAs[Long]("rank"), r.getAs[Long]("doc_id"), r.getAs[Double]("final")))
      .sortBy(_._1).toSeq
    assert(dslRows("q166_dsl_mm_most_fields") == typedRows("q86b_multi_match_most_fields"),
      "front-door most_fields diverged from typed q86b")
    assert(dslRows("q167_dsl_mm_phrase") == typedRows("q86c_multi_match_phrase"),
      "front-door phrase diverged from typed q86c")
    assert(dslRows("q168_dsl_mm_cross_fields") == typedRows("q86d_multi_match_cross_fields"),
      "front-door cross_fields diverged from typed q86d")
    // unsupported shapes stay loud
    val docs = queries.Tables(spark, sf, "documents")
    val rel = queries.TextQueries.dslRelevance(spark, sf)
    def bad(body: String): Unit =
      intercept[IllegalArgumentException](QueryDsl.searchScored(docs, QueryDsl.parse(body), rel))
    bad("""{"query": {"multi_match": {"query": "a b", "fields": ["title^2", "body"],
          |  "type": "bool_prefix"}}}""".stripMargin)
    bad("""{"query": {"multi_match": {"query": "a b c", "fields": ["title^2", "body"],
          |  "type": "phrase"}}}""".stripMargin)
    bad("""{"query": {"multi_match": {"query": "a b", "fields": ["title^2", "body"],
          |  "type": "most_fields", "tie_breaker": 0.5}}}""".stripMargin)
    bad("""{"query": {"multi_match": {"query": "a b", "fields": ["title^3", "body"],
          |  "type": "cross_fields"}}}""".stripMargin)
  }

  test("q154: _msearch fans out independent bodies, tagged by position") {
    val out = SparkEntry.queries("q154_dsl_msearch")(spark, sf).collect()
    val byReq = out.groupBy(_.getAs[Long]("req"))
    assert(byReq.keySet == Set(0L, 1L))
    assert(byReq(0L).length == 10 && byReq(1L).length == 10)
    assert(byReq(0L).forall(_.getAs[String]("lang") == "en"))
    // body 1 pages from=5: ranks 6..15 of the doc_id-ascending range scan
    assert(byReq(1L).map(_.getAs[Long]("rank")).sorted.toSeq == (6L to 15L).toSeq)
    assert(byReq(1L).forall(_.getAs[Long]("n_chars") >= 300))
    // mismatched _source lists are a loud failure, not a mangled union
    val docs = queries.Tables(spark, sf, "documents")
    intercept[IllegalArgumentException](QueryDsl.msearch(docs, Seq(
      QueryDsl.parse("""{"query": {"match_all": {}}, "_source": ["doc_id"]}"""),
      QueryDsl.parse("""{"query": {"match_all": {}}, "_source": ["doc_id", "lang"]}"""))))
  }

  test("match operator=and through the scored path gates on all terms") {
    val rel = queries.TextQueries.dslRelevance(spark, sf)
    val docs = queries.Tables(spark, sf, "documents")
    val qs = queries.TextQueries.windowQueryString(spark, sf)
    val orHits = QueryDsl.searchScored(docs, QueryDsl.parse(
      s"""{"query": {"match": {"text": "$qs"}}, "size": 10000}"""), rel).count()
    val andHits = QueryDsl.searchScored(docs, QueryDsl.parse(
      s"""{"query": {"match": {"text": {"query": "$qs", "operator": "and"}}}, "size": 10000}"""),
      rel).count()
    assert(andHits < orHits, s"operator=and did not gate ($andHits vs $orHits)")
    assert(andHits > 0)
  }

  test("analyzed-probe match equals the regex-scan match on the real corpus") {
    val body = QueryDsl.parse(
      """{"query": {"match": {"text": {"query": "vector stream", "operator": "and"}}}}""")
    val docs = queries.Tables(spark, sf, "documents")
    val scan = QueryDsl.count(docs, body).collect().head.getAs[Long]("total")
    val probe = SparkEntry.queries("q139_count")(spark, sf).collect().head.getAs[Long]("total")
    assert(scan == probe, s"probe form diverged from scan form ($probe vs $scan)")
    assert(probe > 0)
    // registering a bogus analyzed mapping fails loudly
    intercept[IllegalArgumentException](
      QueryDsl.count(docs, body, analyzed = Map("text" -> "nope")))
    intercept[IllegalArgumentException](
      QueryDsl.count(docs, body, analyzed = Map("n_chars" -> "toks")))
  }

  test("q156: front-door knn is row-identical to typed q85 for the request's source vectors") {
    val dsl = SparkEntry.queries("q156_dsl_knn")(spark, sf).collect()
      .map(r => (r.getAs[Long]("knn_idx"), r.getAs[Long]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("cos")))
    val idOf = queries.SimilarityQueries.KnnSrcIds.zipWithIndex
      .map { case (v, i) => v -> i.toLong }.toMap
    val typed = SparkEntry.queries("q85_knn_filtered")(spark, sf).collect()
      .filter(r => idOf.contains(r.getAs[Long]("query_id")))
      .map(r => (idOf(r.getAs[Long]("query_id")), r.getAs[Long]("rank"),
        r.getAs[Long]("neighbor_id"), r.getAs[Double]("cos")))
    assert(dsl.nonEmpty && dsl.length == typed.length)
    assert(dsl.sorted.toSeq == typed.sorted.toSeq,
      "front-door knn diverged from the typed filtered-kNN pipeline")
    // wire-grammar rejections are loud
    def bad(body: String): Unit = intercept[IllegalArgumentException](
      queries.SimilarityQueries.dslKnn(spark, sf, QueryDsl.parse(body)))
    bad("""{"knn": {"field": "embedding", "k": 5, "num_candidates": 3,
          |  "query_vector": [1.0]}}""".stripMargin) // nc < k
    bad("""{"knn": {"field": "embedding", "k": 5, "num_candidates": 10,
          |  "query_vector": [1.0, 2.0]}}""".stripMargin) // wrong dim
    bad("""{"knn": {"field": "nope", "k": 5, "num_candidates": 10,
          |  "query_vector": [1.0]}}""".stripMargin) // wrong field
    bad("""{"knn": {"field": "embedding", "k": 5, "num_candidates": 10,
          |  "query_vector": [1.0], "boost": 2}}""".stripMargin) // unknown key
    bad("""{"knn": [], "size": 0}""") // empty clause list + extra key
  }

  test("query-context envelope rejections are loud") {
    val rel = queries.TextQueries.dslRelevance(spark, sf)
    val docs = queries.Tables(spark, sf, "documents")
    def bad(q: String): Unit =
      intercept[IllegalArgumentException](QueryDsl.searchScored(docs, QueryDsl.parse(q), rel))
    bad("""{"query": {"term": {"lang": "en"}}}""") // filter-context type → search()
    bad("""{"query": {"match": {"text": "x"}}, "sort": [{"n_chars": "desc"}]}""") // field sort
    bad("""{"query": {"match": {"lang": "en"}}}""") // un-analyzed field (scorer rejects)
    bad("""{"query": {"multi_match": {"query": "x", "fields": ["title^2", "body^3"]}}}""") // body boost
    bad("""{"query": {"multi_match": {"query": "x", "fields": ["title^2", "body"], "type": "phrase"}}}""")
    bad("""{"query": {"multi_match": {"query": "x"}}}""") // no fields
    bad("""{"query": {"match": {"text": "x"}}, "highlight": {"fields": {"lang": {}}}}""") // wrong hl field
    bad("""{"query": {"match": {"text": "   "}}}""") // empty analyzed query
  }
}
