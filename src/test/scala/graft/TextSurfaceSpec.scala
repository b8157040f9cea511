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

  test("q76b rescore: window honored, phrase hits exist, and the re-rank genuinely reorders") {
    val out = SparkEntry.queries("q76b_rescore")(spark, sf).collect()
    assert(out.length == 10)
    assert(out.forall(_.getAs[Long]("first_rank") <= 50), "rescore must stay inside the window")
    assert(out.exists(_.getAs[Long]("phrase_tf") > 0),
      "the rescore query never matched — the secondary pass is vacuous")
    assert(out.exists(r => r.getAs[Long]("rank") != r.getAs[Long]("first_rank")),
      "rescoring changed no rank — the operator is indistinguishable from q76")
    // combine mode `total`: rescored = score + 0.5·phrase_tf exactly
    out.foreach { r =>
      assert(r.getAs[Double]("rescored") ==
        r.getAs[Double]("score") + 0.5 * r.getAs[Long]("phrase_tf"))
    }
  }

  test("q78 match_phrase/span_near: near dominates phrase and a slop-only hit exists") {
    val out = SparkEntry.queries("q78_match_phrase")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("n_near") >= r.getAs[Long]("n_phrase"),
        "every exact adjacency is also a within-slop match")
    }
    assert(out.exists(_.getAs[Long]("n_phrase") > 0), "no exact phrase hit anywhere")
    assert(out.exists(r => r.getAs[Long]("n_near") > r.getAs[Long]("n_phrase")),
      "slop semantics vacuous: span_near found nothing beyond exact adjacency")
  }

  test("q79 terms_set: threshold honored and some doc matches more than the minimum") {
    val out = SparkEntry.queries("q79_terms_set")(spark, sf).collect()
    assert(out.nonEmpty, "no doc reached minimum_should_match")
    assert(out.forall(_.getAs[Long]("n_matched") >= 3))
    assert(out.forall(_.getAs[Long]("n_matched") <= 5), "can never exceed the 5-term set")
  }

  test("q80 boosting: demoted docs halve exactly, others untouched, and demotion reorders") {
    val out = SparkEntry.queries("q80_boosting")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (s, f) = (r.getAs[Double]("score"), r.getAs[Double]("final"))
      if (r.getAs[Boolean]("demoted")) assert(f == s * 0.5) else assert(f == s)
    }
    // non-vacuity: demotion either shows inside the window or pushed docs
    // out of it (at sf0.001, 457/496 scored docs are demoted and the top-20
    // becomes the undemoted survivors — fully disjoint from q76's)
    val q76ids = SparkEntry.queries("q76_bm25_search")(spark, sf)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val q80ids = out.map(_.getAs[Long]("doc_id")).toSet
    assert(out.exists(_.getAs[Boolean]("demoted")) || q76ids != q80ids,
      "demotion changed nothing — the boosting clause is vacuous")
  }

  test("q76c function_score: factor is log2(1+dl) and multiplies the score exactly") {
    val out = SparkEntry.queries("q76c_function_score")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val f = r.getAs[Double]("factor")
      val dl = r.getAs[Long]("dl")
      assert(math.abs(f - math.log(dl + 1.0) / math.log(2.0)) < 1e-6,
        s"factor $f far from log2(${dl + 1})")
      assert(r.getAs[Double]("final") == r.getAs[Double]("score") * f)
    }
  }

  test("q82 highlight: every fragment tags a real query term at its reported position") {
    val qterms = queries.TextQueries.rankedVocab(spark, sf)
      .filter(col("r") >= 11 && col("r") <= 15)
      .select("term").collect().map(_.getString(0)).toSet
    val out = SparkEntry.queries("q82_highlight")(spark, sf).collect()
    assert(out.length == 20, "highlights must cover all 20 hits")
    out.foreach { r =>
      val frag = r.getAs[String]("fragment")
      val m = "<em>(.*?)</em>".r.findFirstMatchIn(frag)
      assert(m.isDefined, s"no <em> tag in '$frag'")
      assert(qterms.contains(m.get.group(1)), s"highlighted '${m.get.group(1)}' is not a query term")
      assert(r.getAs[Long]("frag_pos") >= 1)
    }
  }

  test("q40b: confusion matrix totals are consistent and accuracy is computable") {
    val out = SparkEntry.queries("q40b_langid_eval")(spark, sf).collect()
    assert(out.nonEmpty)
    val total = out.map(_.getAs[Long]("n")).sum
    val docTotal = queries.Tables(spark, sf, "documents").count()
    assert(total == docTotal, s"matrix covers $total of $docTotal docs")
    // marginals: per-lang rows must sum to that lang's carried total
    out.groupBy(_.getAs[String]("lang")).foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Long]("n")).sum == rows.head.getAs[Long]("lang_total"))
    }
    out.groupBy(_.getAs[String]("lang_pred")).foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Long]("n")).sum == rows.head.getAs[Long]("pred_total"))
    }
  }

  test("q83 RRF: fused score is the exact two-term formula and the rankings genuinely disagree") {
    val out = SparkEntry.queries("q83_rrf")(spark, sf).collect()
    assert(out.length == 20)
    out.foreach { r =>
      val (r1, r2) = (r.getAs[Long]("r1"), r.getAs[Long]("r2"))
      assert(r1 >= 1 && r2 >= 1)
      assert(r.getAs[Double]("rrf") == 1.0 / (60.0 + r1) + 1.0 / (60.0 + r2))
    }
    assert(out.exists(r => r.getAs[Long]("r1") != r.getAs[Long]("r2")),
      "both rankings identical everywhere — fusion is vacuous")
  }

  test("q84 search_after: page 2 is disjoint from page 1 and strictly after the cursor") {
    val p1 = SparkEntry.queries("q76_bm25_search")(spark, sf).collect()
    val cursor = p1.filter(_.getAs[Long]("rank") == 20).head
    val (cs, cd) = (cursor.getAs[Double]("score"), cursor.getAs[Long]("doc_id"))
    val p2 = SparkEntry.queries("q84_search_after")(spark, sf).collect()
    assert(p2.nonEmpty, "no page 2 — corpus too small for the window")
    val p1ids = p1.map(_.getAs[Long]("doc_id")).toSet
    p2.foreach { r =>
      assert(!p1ids.contains(r.getAs[Long]("doc_id")), "page 2 re-served a page-1 hit")
      val (s2, d2) = (r.getAs[Double]("score"), r.getAs[Long]("doc_id"))
      assert(s2 < cs || (s2 == cs && d2 > cd), "hit not strictly after the cursor")
    }
  }

  test("st15: the streaming alert set contains q79's whole window with identical counts") {
    val alerts = SparkEntry.queries("st15_terms_set_stream")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_matched")).toMap
    assert(alerts.nonEmpty)
    val top = SparkEntry.queries("q79_terms_set")(spark, sf).collect()
    assert(top.forall(r => alerts.get(r.getAs[Long]("doc_id"))
      .contains(r.getAs[Long]("n_matched"))),
      "a batch top-20 hit is missing (or mismatched) in the streaming alert set")
    assert(alerts.valuesIterator.forall(_ >= 3))
  }

  test("q86 multi_match: dis_max arithmetic exact and both fields decide somewhere") {
    val out = SparkEntry.queries("q86_multi_match")(spark, sf).collect()
    assert(out.length == 20)
    out.foreach { r =>
      val (b, t) = (r.getAs[Double]("s_body"), r.getAs[Double]("s_title_boosted"))
      assert(r.getAs[Double]("final") == math.max(b, t) + 0.5 * math.min(b, t))
      assert(b >= 0.0 && t >= 0.0)
    }
    assert(out.exists(r => r.getAs[Double]("s_title_boosted") > r.getAs[Double]("s_body")),
      "the title field never wins — the boost/field split is vacuous")
    // the boosted short title dominates the top-20 winners (higher idf ×2
    // boost — expected), so pin the body's contribution, not a body win:
    // every tie_breaker addition must include a nonzero body score somewhere
    assert(out.exists(r => r.getAs[Double]("s_body") > 0.0),
      "no top hit has any body match — the body field is dead weight")
  }

  test("q86d cross_fields: blending is non-vacuous and the scores recompute from raw text") {
    // independent driver-side recomputation of the whole term-centric
    // pipeline from raw text with plain collections (the q96/q98
    // discipline): head = first 8 tokens (boost 2), tail = tokens 9+,
    // blended df = max(df_head, df_tail), idf against corpus n_docs,
    // per-field tf-normalization, per-term dis_max, sum over terms
    val raw = queries.Tables(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        r.getString(1).trim.toLowerCase.replaceAll("\\s+", " ").split(" ").toSeq)
      .filter(_._2.exists(_.nonEmpty)).toMap
    val dfAll = raw.values.flatMap(_.distinct.filter(_.length >= 4))
      .groupBy(identity).view.mapValues(_.size).toMap
    val qterms = dfAll.toSeq.sortBy { case (t, df) => (-df, t) }.slice(10, 15).map(_._1)
    assert(qterms.size == 5)
    val heads = raw.view.mapValues(_.take(8)).toMap
    val tails = raw.view.mapValues(_.drop(8)).toMap
    def dfOf(m: Map[Long, Seq[String]], t: String) = m.count(_._2.contains(t))
    // the blend must BITE: at least one query term's head/tail dfs differ
    assert(qterms.exists(t => dfOf(heads, t) != dfOf(tails, t) &&
      math.max(dfOf(heads, t), dfOf(tails, t)) > 0),
      "head/tail dfs identical for every query term — blending is vacuous here")
    val nDocs = raw.size
    val idf = qterms.map { t =>
      val df = math.max(dfOf(heads, t), dfOf(tails, t))
      t -> (math.log((2.0 * nDocs + 2) / (2.0 * df + 1)) / math.log(2.0))
    }.toMap
    def fieldScores(m: Map[Long, Seq[String]], boost: Double): Map[(Long, String), Double] = {
      val dl = m.view.mapValues(_.size).toMap.filter(_._2 > 0)
      val avgdl = dl.values.sum.toDouble / dl.size
      (for {
        (id, toks) <- m.toSeq; t <- qterms
        tf = toks.count(_ == t) if tf > 0
      } yield (id, t) -> boost * (idf(t) * ((tf * 2.2) /
        (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl(id) / avgdl))))).toMap
    }
    val sH = fieldScores(heads.filter(_._2.nonEmpty), 2.0)
    val sL = fieldScores(tails.filter(_._2.nonEmpty), 1.0)
    // the dis_max must decide BOTH ways somewhere (each field wins a term)
    val keys = sH.keySet ++ sL.keySet
    assert(keys.exists(k => sH.getOrElse(k, 0.0) > sL.getOrElse(k, 0.0)), "head never wins")
    assert(keys.exists(k => sL.getOrElse(k, 0.0) > sH.getOrElse(k, 0.0)), "tail never wins")
    // a doc matching a term in ONLY ONE field still gets full idf credit
    assert(keys.exists(k => !sH.contains(k) || !sL.contains(k)),
      "every hit appears in both fields — the full-outer combine is untested")
    val expected = keys.groupBy(_._1).view.mapValues(ks =>
      ks.toSeq.map(k => math.max(sH.getOrElse(k, 0.0), sL.getOrElse(k, 0.0))).sum).toMap
    val out = SparkEntry.queries("q86d_multi_match_cross_fields")(spark, sf).collect()
    assert(out.length == 20)
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val exp = expected(id)
      assert(math.abs(r.getAs[Double]("final") - exp) < 1e-6,
        s"doc $id: engine ${r.getAs[Double]("final")} != recomputed $exp")
    }
    // and the returned ranking is the recomputed top-20
    val top = expected.toSeq.sortBy { case (id, s) => (-s, id) }.take(20).map(_._1)
    assert(out.sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("doc_id")).toSeq == top)
  }

  test("q87 fuzzy: typo queries are non-vocab yet retrieve docs through the expansion") {
    val vocab = queries.Tables(spark, sf, "documents")
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
      .distinct().collect().map(_.getString(0)).toSet
    val out = SparkEntry.queries("q87_fuzzy")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(!vocab.contains(r.getAs[String]("q")),
        s"typo '${r.getAs[String]("q")}' is a real vocab term — exact match could explain the hits")
      assert(r.getAs[Long]("n_docs") > 0, "fuzzy expansion retrieved nothing")
      assert(r.getAs[Long]("n_terms") >= 1)
      assert(r.getAs[Long]("n_term_docs") >= r.getAs[Long]("n_docs"))
    }
  }

  test("q88/q89: prefix and wildcard rewrites genuinely expand to multiple terms") {
    // the structural-derivation contract: the chosen prefixes/patterns are
    // the maximal-coverage ones, so at least one must expand beyond a
    // single dictionary term — otherwise the query degenerates to exact
    // term retrieval and verifies nothing about the rewrite machinery
    val pre = SparkEntry.queries("q88_prefix")(spark, sf).collect()
    assert(pre.length == 3)
    assert(pre.exists(_.getAs[Long]("n_terms") > 1), "no prefix expanded beyond one term")
    pre.foreach { r =>
      assert(r.getAs[String]("q").length == 1)
      assert(r.getAs[Long]("n_docs") > 0 && r.getAs[Long]("n_term_docs") >= r.getAs[Long]("n_docs"))
    }
    val wc = SparkEntry.queries("q89_wildcard")(spark, sf).collect()
    assert(wc.length == 3)
    assert(wc.exists(_.getAs[Long]("n_terms") > 1), "no wildcard pattern expanded beyond one term")
    wc.foreach { r =>
      assert(r.getAs[String]("pat").startsWith("*"), "patterns are ES-style leading wildcards")
      assert(r.getAs[Long]("n_docs") > 0)
    }
  }

  test("q102 match_bool_prefix: both clause types decide and the prefix expansion is non-trivial") {
    val out = SparkEntry.queries("q102_match_bool_prefix")(spark, sf).collect()
    assert(out.length == 20)
    out.foreach { r =>
      val ph = r.getAs[Long]("prefix_hit")
      assert(ph == 0L || ph == 1L)
      assert(r.getAs[Long]("n_exact_hit") >= 0L && r.getAs[Long]("n_exact_hit") <= 4L,
        "exact clauses are the 4 non-last window terms")
      assert(r.getAs[Double]("final") > 0.0)
    }
    // both clause types must decide somewhere in the window
    assert(out.exists(_.getAs[Long]("prefix_hit") == 1L), "the prefix clause never matched")
    assert(out.exists(_.getAs[Long]("n_exact_hit") > 0L), "the term clauses never matched")
    // the constant-score contribution is visible: two docs with the same
    // exact-term profile but different prefix_hit differ by exactly 1.0
    // is data-dependent; instead pin the arithmetic bound: a doc's final
    // is at least its prefix contribution
    out.foreach(r => assert(r.getAs[Double]("final") >= r.getAs[Long]("prefix_hit").toDouble))
  }

  test("q90 match_phrase_prefix: hits require adjacency and the prefix genuinely expands") {
    val out = SparkEntry.queries("q90_match_phrase_prefix")(spark, sf).collect()
    assert(out.nonEmpty)
    val phrase = out.head.getAs[String]("phrase")
    assert(phrase.endsWith("*") && out.forall(_.getAs[String]("phrase") == phrase))
    assert(out.forall(_.getAs[Long]("n_phrase") > 0))
    // the single-char prefix must expand to >1 dictionary term (the
    // multi-term premise); recompute the expansion directly
    val Array(w1, pfxStar) = phrase.split(" ")
    val pfx = pfxStar.stripSuffix("*")
    val expanded = queries.Tables(spark, sf, "documents")
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
      .distinct().filter(col("w").startsWith(pfx)).count()
    assert(expanded > 1, s"prefix '$pfx' expands to $expanded term(s) — premise broken")
    // and a doc whose hit comes only through a NON-w2 expansion exists?
    // not guaranteed structurally; what IS guaranteed: n_phrase counts
    // adjacency, so every reported doc contains w1 followed by a pfx-term
    val docsWithHit = out.map(_.getAs[Long]("doc_id")).toSet
    val checked = queries.Tables(spark, sf, "documents")
      .filter(col("doc_id").isin(docsWithHit.toSeq: _*))
      .select(col("doc_id"), split(trim(lower(col("text"))), "\\s+").as("toks"))
      .collect()
    checked.foreach { r =>
      val toks = r.getSeq[String](1)
      val ok = toks.sliding(2).exists(p => p.length == 2 && p(0) == w1 && p(1).startsWith(pfx))
      assert(ok, s"doc ${r.getLong(0)} reported a phrase-prefix hit but has no adjacency")
    }
  }

  test("q91 regexp: the derived pattern is a real regex and retrieves through the rewrite") {
    val out = SparkEntry.queries("q91_regexp")(spark, sf).collect()
    assert(out.nonEmpty, "the length>=2 tail derivation guarantees a match — vacuous result")
    out.foreach { r =>
      val pat = r.getAs[String]("pat")
      assert(pat.startsWith("^[") && pat.contains("].*") && pat.endsWith("$"),
        s"pattern '$pat' lost the class+wildcard structure")
      assert(r.getAs[Long]("n_docs") > 0 && r.getAs[Long]("n_terms") >= 1)
      assert(r.getAs[Long]("n_term_docs") >= r.getAs[Long]("n_docs"))
    }
  }

  test("q92 combined_fields: single-pass combined statistics, sane ranking") {
    val out = SparkEntry.queries("q92_combined_fields")(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.map(_.getAs[Long]("rank")).sorted.sameElements(1L to out.length), "ranks not contiguous")
    val scores = out.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b }, "score not rank-monotone")
    assert(out.forall(r => r.getAs[Long]("n_terms_hit") >= 1 && r.getAs[Long]("n_terms_hit") <= 5))
    assert(out.forall(_.getAs[Double]("score") > 0.0))
  }

  test("q93/q94: feature terms are the exact saturation/proximity formulas") {
    val rf = SparkEntry.queries("q93_rank_feature")(spark, sf).collect()
    assert(rf.nonEmpty)
    rf.foreach { r =>
      val (s, sat, fin) = (r.getAs[Double]("score"), r.getAs[Double]("sat"), r.getAs[Double]("final"))
      assert(sat > 0.0 && sat < 1.0, s"saturation $sat outside (0,1)")
      assert(fin == s + 1.5 * sat, "final != score + 1.5*sat (bit-exact)")
    }
    val df = SparkEntry.queries("q94_distance_feature")(spark, sf).collect()
    assert(df.nonEmpty)
    df.foreach { r =>
      val (s, px, fin) = (r.getAs[Double]("score"), r.getAs[Double]("prox"), r.getAs[Double]("final"))
      assert(px > 0.0 && px <= 1.0, s"proximity $px outside (0,1]")
      assert(fin == s + 2.0 * px, "final != score + 2*prox (bit-exact)")
    }
  }

  test("q95 span_first: every hit is inside the first-10 window, recomputed from raw text") {
    val out = SparkEntry.queries("q95_span_first")(spark, sf).collect()
    assert(out.nonEmpty)
    val term = out.head.getAs[String]("term")
    out.foreach { r =>
      assert(r.getAs[Long]("first_pos") >= 1 && r.getAs[Long]("first_pos") <= 10)
      assert(r.getAs[Long]("n_within") >= 1)
    }
    val byDoc = out.map(r => r.getAs[Long]("doc_id") -> (r.getAs[Long]("first_pos"), r.getAs[Long]("n_within"))).toMap
    val checked = queries.Tables(spark, sf, "documents")
      .filter(col("doc_id").isin(byDoc.keys.toSeq: _*))
      .select(col("doc_id"), split(trim(lower(col("text"))), "\\s+").as("toks"))
      .collect()
    assert(checked.length == byDoc.size)
    checked.foreach { r =>
      val toks = r.getSeq[String](1).take(10)
      val hits = toks.zipWithIndex.collect { case (t, i) if t == term => i + 1L }
      assert(hits.headOption.contains(byDoc(r.getLong(0))._1), s"doc ${r.getLong(0)}: first_pos mismatch")
      assert(hits.length.toLong == byDoc(r.getLong(0))._2, s"doc ${r.getLong(0)}: n_within mismatch")
    }
  }

  test("q104 pinned: promoted docs head the ranking in pin order, organic follows deduplicated") {
    val out = SparkEntry.queries("q104_pinned")(spark, sf).collect().sortBy(_.getAs[Long]("rank"))
    assert(out.length == 20)
    // the 3 longest docs, in (n_chars desc, id asc) order — recomputed
    val pins = queries.Tables(spark, sf, "documents")
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (id, n) => (-n, id) }.take(3).map(_._1)
    assert(out.take(3).map(_.getAs[Long]("doc_id")).toSeq == pins.toSeq,
      "ranks 1-3 must be the pinned ids in pin order")
    assert(out.take(3).forall(_.getAs[Long]("is_pinned") == 1L))
    // organic section: unpinned, strictly ordered by (score desc, id asc),
    // and no pinned id reappears
    val organic = out.drop(3)
    assert(organic.forall(_.getAs[Long]("is_pinned") == 0L))
    assert(!organic.exists(r => pins.contains(r.getAs[Long]("doc_id"))))
    val keys = organic.map(r => (-r.getAs[Double]("organic_score"), r.getAs[Long]("doc_id")))
    assert(keys.sameElements(keys.sorted), "organic section not ordered by (score desc, id asc)")
    assert(organic.exists(_.getAs[Double]("organic_score") > 0.0))
  }

  test("q105 rank_eval: metrics bounded, NDCG replayed from raw-text ratings, evaluation non-vacuous") {
    val out = SparkEntry.queries("q105_rank_eval")(spark, sf).collect()
    assert(out.length == 5, "one rated request per window term")
    out.foreach { r =>
      val (p, rr, nd) = (r.getAs[Double]("precision_at_10"),
        r.getAs[Double]("recip_rank"), r.getAs[Double]("ndcg_10"))
      assert(p >= 0.0 && p <= 1.0)
      assert(rr == 0.0 || (rr >= 0.1 && rr <= 1.0), "reciprocal rank is 1/rank within top 10 or 0")
      assert(nd > 0.0 && nd <= 1.0 + 1e-12, "DCG can never exceed the ideal ordering's")
    }
    // independent replay: ratings recomputed from raw text with plain
    // collections (rating 2 = term in first 8 tokens, 1 = body tf >= 2),
    // ideal DCG re-accumulated with the engine's own detlog rank table
    val lgMap = graft.functions.detlog.withLog2(
      spark.range(2, 12).toDF("v"), "v", "lg").collect()
      .map(r => r.getAs[Long]("v") -> r.getAs[Double]("lg")).toMap
    val toksByDoc = queries.Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.toLowerCase.replaceAll("\\s+", " ").split(" ").toVector)
    def gain(rt: Long): Double = if (rt == 2L) 3.0 else if (rt == 1L) 1.0 else 0.0
    val allRatings = out.map { r =>
      val term = r.getAs[String]("query_term")
      val ratings = toksByDoc.flatMap { case (_, toks) =>
        val tf = toks.count(_ == term)
        if (tf == 0) None
        else Some(if (toks.take(8).contains(term)) 2L else if (tf >= 2) 1L else 0L)
      }
      val idcgPlain = ratings.filter(_ > 0).sortBy(-_).take(10).zipWithIndex
        .map { case (rt, i) => gain(rt) / lgMap(i + 2L) }.sum
      val idcgQuery = r.getAs[Double]("dcg_10") / r.getAs[Double]("ndcg_10")
      assert(math.abs(idcgQuery - idcgPlain) <= 1e-6 * math.max(1.0, idcgPlain),
        s"$term: ideal DCG ${idcgQuery} != replayed $idcgPlain")
      assert(r.getAs[Long]("rel_in_10") <= math.min(10, ratings.count(_ > 0)),
        s"$term: more relevant-in-top-10 than rated-relevant docs exist")
      ratings
    }
    assert(allRatings.flatten.exists(_ == 2L) && allRatings.flatten.exists(_ == 1L) &&
      allRatings.flatten.exists(_ == 0L), "the graded-relevance derivation must exercise all 3 grades")
    assert(out.exists(_.getAs[Double]("ndcg_10") < 1.0),
      "every request's BM25 ranking equals the ideal ordering — the evaluation is vacuous")
  }

  test("q109 terms_enum: both pages non-empty, cursor prunes exactly, union replays the dictionary") {
    val out = SparkEntry.queries("q109_terms_enum")(spark, sf).collect()
    val p1 = out.filter(_.getAs[Long]("page") == 1L).sortBy(_.getAs[Long]("pos")).map(_.getAs[String]("term"))
    val p2 = out.filter(_.getAs[Long]("page") == 2L).sortBy(_.getAs[Long]("pos")).map(_.getAs[String]("term"))
    assert(p1.length == 4, "page 1 must fill the requested size")
    assert(p2.nonEmpty, "the search_after resume must return the remainder non-vacuously")
    assert((p1 ++ p2).sameElements((p1 ++ p2).sorted), "terms_enum output is term-sorted")
    assert(p1.last < p2.head, "page 2 must start strictly after the cursor")
    // replay the dictionary walk from raw text with plain collections
    val vocab = queries.Tables(spark, sf, "documents")
      .select(col("text")).collect()
      .flatMap(_.getString(0).trim.toLowerCase.replaceAll("\\s+", " ").split(" ").distinct)
      .distinct.sorted
    val pfx = vocab.groupBy(_.take(1)).toSeq
      .sortBy { case (c, ts) => (-ts.length, c) }.head._1
    val expect = vocab.filter(_.startsWith(pfx))
    assert((p1 ++ p2).sameElements(expect.take(4 + 4)),
      s"pages must walk the sorted '$pfx'-prefixed dictionary exactly")
  }

  test("q106 query_string: field scope, boost, and NOT all decide (recomputed from raw text)") {
    val out = SparkEntry.queries("q106_query_string")(spark, sf).collect()
    assert(out.nonEmpty, "the conjunctive query matched nothing — derivation too narrow")
    out.foreach { r =>
      assert(r.getAs[Double]("s_title") > 0.0, "AND semantics: the title clause must have matched")
      assert(r.getAs[Double]("s_group") > 0.0, "AND semantics: the OR group must have matched")
      assert(r.getAs[Double]("final") ==
        r.getAs[Double]("s_title") + r.getAs[Double]("s_group"))
    }
    // replay the clause terms from raw text (the one-scan frame's
    // derivations): tT = title-field top-df length>=4 term, tA/tB = body
    // ranks QLo/QLo+1, tX = rank QHi
    val docsRaw = queries.Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.toLowerCase.replaceAll("\\s+", " ").split(" ").toVector).toMap
    def rankBy(dfm: Map[String, Int]) =
      dfm.toSeq.sortBy { case (w, c) => (-c, w) }.map(_._1)
    val titleDf = docsRaw.values
      .flatMap(_.take(8).distinct.filter(_.length >= 4)).groupBy(identity).map { case (w, xs) => w -> xs.size }
    val bodyDf = docsRaw.values
      .flatMap(_.distinct.filter(_.length >= 4)).groupBy(identity).map { case (w, xs) => w -> xs.size }
    val tT = rankBy(titleDf).head
    val ranked = rankBy(bodyDf)
    val (tA, tB, tX) = (ranked(10), ranked(11), ranked(14)) // ranks QLo, QLo+1, QHi (1-based 11/12/15)
    out.foreach { r =>
      val toks = docsRaw(r.getAs[Long]("doc_id"))
      assert(toks.take(8).contains(tT), "field scope violated: tT not in the doc's title")
      assert(toks.contains(tA) || toks.contains(tB), "OR group violated")
      assert(!toks.contains(tX), "NOT clause violated: excluded term present")
    }
    assert(out.exists(r => docsRaw(r.getAs[Long]("doc_id")).contains(tB)),
      "no returned doc contains the boosted term — the boost never exercised")
  }

  test("q110 termvectors: the full per-term payload replays from raw text for all 3 requested docs") {
    val out = SparkEntry.queries("q110_termvectors")(spark, sf).collect()
    val docsRaw = queries.Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getString(1).trim.toLowerCase.replaceAll("\\s+", " ").split(" ").toVector, r.getLong(2)))
    val targets = docsRaw.sortBy { case (id, _, n) => (-n, id) }.take(3).map(_._1).toSet
    val df = docsRaw.flatMap { case (id, toks, _) => toks.distinct.map(_ -> id) }
      .groupBy(_._1).map { case (t, xs) => t -> xs.length.toLong }
    val ttf = docsRaw.flatMap(_._2).groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    val expect = docsRaw.filter(d => targets.contains(d._1)).flatMap { case (id, toks, _) =>
      toks.distinct.map { t =>
        (id, t, toks.count(_ == t).toLong, (toks.indexOf(t) + 1).toLong, df(t), ttf(t))
      }
    }
    val got = out.map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("term"),
      r.getAs[Long]("tf"), r.getAs[Long]("first_pos"), r.getAs[Long]("df"), r.getAs[Long]("ttf")))
    assert(got.sorted.sameElements(expect.sorted),
      s"termvectors payload mismatch: got ${got.length} rows, expected ${expect.length}")
    assert(expect.exists(_._3 > 1), "every tf is 1 — term statistics are vacuous on these docs")
  }

  test("q103 simple_query_string: all three grammar operators decide (phrase | AND, -NOT)") {
    val docsRaw = queries.Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.toLowerCase.split("\\s+").toVector).toMap
    // the NOT term: rank-QHi of the length>=4 df vocab (the query's derivation)
    val df = scala.collection.mutable.Map.empty[String, Int]
    docsRaw.values.foreach(_.distinct.filter(_.length >= 4).foreach(w => df(w) = df.getOrElse(w, 0) + 1))
    val tX = df.toSeq.sortBy { case (w, c) => (-c, w) }.apply(14)._1 // rank 15 = QHi
    val out = SparkEntry.queries("q103_simple_query_string")(spark, sf).collect()
    assert(out.length == 20)
    // the OR combine: every returned doc matched at least one clause
    out.foreach { r =>
      assert(r.getAs[Double]("s_phrase") > 0.0 || r.getAs[Double]("s_and") > 0.0)
      assert(r.getAs[Double]("final") ==
        r.getAs[Double]("s_phrase") + r.getAs[Double]("s_and"))
    }
    // both positive clause types decide somewhere in the window
    assert(out.exists(_.getAs[Double]("s_phrase") > 0.0), "the phrase clause never matched")
    assert(out.exists(_.getAs[Double]("s_and") > 0.0), "the AND clause never matched")
    // the NOT clause bites: no returned doc contains tX, and the
    // exclusion is non-vacuous (some doc in the corpus does)
    out.foreach(r => assert(!docsRaw(r.getAs[Long]("doc_id")).contains(tX),
      s"doc ${r.getAs[Long]("doc_id")} contains the negated term '$tX'"))
    assert(docsRaw.values.exists(_.contains(tX)), "the negated term occurs nowhere — NOT is vacuous")
  }

  test("q96 intervals: greedy all_of chains recomputed from raw text with plain collections") {
    val out = SparkEntry.queries("q96_intervals")(spark, sf).collect()
    assert(out.nonEmpty)
    // fully independent recomputation: tokenize raw text in Scala, derive
    // the top-3 df terms and the t1-anchored greedy chains with plain
    // collections code — no Spark expressions shared with the query
    val docsRaw = queries.Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.toLowerCase.split("\\s+").toSeq).toMap
    val df = scala.collection.mutable.Map.empty[String, Int]
    docsRaw.values.foreach(_.distinct.filter(_.length >= 4).foreach(w => df(w) = df.getOrElse(w, 0) + 1))
    val Seq(t1, t2, t3) = df.toSeq.sortBy { case (w, c) => (-c, w) }.take(3).map(_._1)
    def chains(toks: Seq[String]): Seq[Int] = {
      def pos(t: String) = toks.zipWithIndex.collect { case (w, i) if w == t => i + 1 }
      val (p2, p3) = (pos(t2), pos(t3))
      pos(t1).filter { i =>
        (for { j <- p2.find(_ > i); k <- p3.find(_ > j) } yield k - i - 2 <= 10).getOrElse(false)
      }
    }
    out.foreach { r =>
      val cs = chains(docsRaw(r.getAs[Long]("doc_id")))
      assert(cs.length.toLong == r.getAs[Long]("n_intervals"),
        s"doc ${r.getAs[Long]("doc_id")}: n_intervals mismatch")
      assert(cs.headOption.map(_.toLong).contains(r.getAs[Long]("first_start")),
        s"doc ${r.getAs[Long]("doc_id")}: first_start mismatch")
    }
  }

  test("q98 span_not: kept/excluded spans recomputed from raw text; exclusions actually occur") {
    val out = SparkEntry.queries("q98_span_not")(spark, sf).collect()
    assert(out.nonEmpty)
    // the result window must surface real exclusions (the derivation's
    // structural non-vacuousness: the top bigram exists by construction)
    assert(out.exists(_.getAs[Long]("n_excluded") > 0), "no span was ever excluded")
    val docsRaw = queries.Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.toLowerCase.split("\\s+").toVector).toMap
    // recompute the top bigram independently
    val bg = scala.collection.mutable.Map.empty[(String, String), Int]
    docsRaw.values.foreach(_.sliding(2).foreach {
      case Seq(a, b) => bg((a, b)) = bg.getOrElse((a, b), 0) + 1
      case _ => ()
    })
    val (w1, w2) = bg.toSeq.sortBy { case ((a, b), c) => (-c, s"$a $b") }.head._1
    out.foreach { r =>
      val toks = docsRaw(r.getAs[Long]("doc_id"))
      val incl = toks.zipWithIndex.collect { case (w, i) if w == w1 => i + 1 }
      val kept = incl.filterNot { j =>
        (j < toks.length && toks(j) == w2) ||
          (j >= 2 && toks(j - 2) == w1 && toks(j - 1) == w2)
      }
      assert(kept.length.toLong == r.getAs[Long]("n_kept"), s"doc ${r.getAs[Long]("doc_id")}: n_kept")
      assert((incl.length - kept.length).toLong == r.getAs[Long]("n_excluded"),
        s"doc ${r.getAs[Long]("doc_id")}: n_excluded")
      assert(kept.headOption.map(_.toLong).contains(r.getAs[Long]("first_pos")),
        s"doc ${r.getAs[Long]("doc_id")}: first_pos")
    }
  }

  test("q100/q101 span containment: both directions recomputed from raw text; the filters bite") {
    val docsRaw = queries.Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.toLowerCase.split("\\s+").toVector).toMap
    val df = scala.collection.mutable.Map.empty[String, Int]
    docsRaw.values.foreach(_.distinct.filter(_.length >= 4).foreach(w => df(w) = df.getOrElse(w, 0) + 1))
    val Seq(t1, t2, t3) = df.toSeq.sortBy { case (w, c) => (-c, w) }.take(3).map(_._1)
    def model(toks: Vector[String]): (Seq[(Int, Int)], Seq[Int]) = {
      def pos(t: String) = toks.zipWithIndex.collect { case (w, i) if w == t => i + 1 }
      val p2 = pos(t2)
      val bigs = pos(t1).flatMap(i => p2.find(_ > i).filter(_ - i - 1 <= 5).map(j => (i, j)))
      (bigs, pos(t3))
    }
    val out100 = SparkEntry.queries("q100_span_containing")(spark, sf).collect()
    assert(out100.nonEmpty)
    out100.foreach { r =>
      val (bigs, p3) = model(docsRaw(r.getAs[Long]("doc_id")))
      val cont = bigs.filter { case (i, j) => p3.exists(p => p >= i && p <= j) }
      assert(bigs.length.toLong == r.getAs[Long]("n_big"), s"doc ${r.getAs[Long]("doc_id")}: n_big")
      assert(cont.length.toLong == r.getAs[Long]("n_containing"),
        s"doc ${r.getAs[Long]("doc_id")}: n_containing")
      assert(cont.headOption.map(_._1.toLong).contains(r.getAs[Long]("first_start")),
        s"doc ${r.getAs[Long]("doc_id")}: first_start")
    }
    // the containment filter must BITE somewhere in the window (a big
    // span that contains nothing) — otherwise q100 degenerates to "has a
    // big span"
    assert(out100.exists(r => r.getAs[Long]("n_big") > r.getAs[Long]("n_containing")),
      "every big span contains a little span — the containment test is vacuous")
    val out101 = SparkEntry.queries("q101_span_within")(spark, sf).collect()
    assert(out101.nonEmpty)
    out101.foreach { r =>
      val (bigs, p3) = model(docsRaw(r.getAs[Long]("doc_id")))
      val within = p3.filter(p => bigs.exists { case (i, j) => p >= i && p <= j })
      assert(p3.length.toLong == r.getAs[Long]("n_little"), s"doc ${r.getAs[Long]("doc_id")}: n_little")
      assert(within.length.toLong == r.getAs[Long]("n_within"),
        s"doc ${r.getAs[Long]("doc_id")}: n_within")
      assert(within.headOption.map(_.toLong).contains(r.getAs[Long]("first_pos")),
        s"doc ${r.getAs[Long]("doc_id")}: first_pos")
    }
    assert(out101.exists(r => r.getAs[Long]("n_little") > r.getAs[Long]("n_within")),
      "every little span lies inside a big span — the within test is vacuous")
  }

  test("q111 span_multi: the top_terms prefix rewrite + span window recomputed from raw text") {
    val out = SparkEntry.queries("q111_span_multi")(spark, sf).collect()
    assert(out.nonEmpty)
    val docsRaw = queries.Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.toLowerCase.split("\\s+").toVector).toMap
    // independent rewrite: FULL vocab df (no length filter — the dfVocab
    // contract), prefix = the single char starting the most vocab terms,
    // expansion = top-10 matching terms by (df desc, term asc)
    val df = scala.collection.mutable.Map.empty[String, Int]
    docsRaw.values.foreach(_.distinct.foreach(w => df(w) = df.getOrElse(w, 0) + 1))
    val pfx = df.keys.toSeq.groupBy(_.take(1)).view.mapValues(_.size).toSeq
      .sortBy { case (q, c) => (-c, q) }.head._1
    val exp = df.toSeq.filter(_._1.startsWith(pfx))
      .sortBy { case (w, c) => (-c, w) }.take(10).map(_._1).toSet
    assert(exp.size > 1, "the prefix rewrite expanded to a single term — span_multi degenerates to span_first")
    out.foreach { r =>
      val toks = docsRaw(r.getAs[Long]("doc_id"))
      val win = toks.take(10)
      val hits = win.zipWithIndex.collect { case (w, i) if exp(w) => i + 1 }
      assert(hits.length.toLong == r.getAs[Long]("n_within"),
        s"doc ${r.getAs[Long]("doc_id")}: n_within")
      assert(hits.headOption.map(_.toLong).contains(r.getAs[Long]("first_pos")),
        s"doc ${r.getAs[Long]("doc_id")}: first_pos")
      assert(win.filter(exp).distinct.length.toLong == r.getAs[Long]("n_terms_matched"),
        s"doc ${r.getAs[Long]("doc_id")}: n_terms_matched")
    }
    // the multi-term rewrite must BITE: some returned window matches >= 2
    // DISTINCT expanded terms, which no single-term span query could
    assert(out.exists(_.getAs[Long]("n_terms_matched") >= 2),
      "every hit matches one expanded term — the rewrite is indistinguishable from a term query")
  }

  test("q112 field_masking_span: cross-field spans recomputed from raw text; the title mask bites") {
    val out = SparkEntry.queries("q112_field_masking_span")(spark, sf).collect()
    assert(out.nonEmpty)
    val docsRaw = queries.Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.toLowerCase.split("\\s+").toVector).toMap
    val df = scala.collection.mutable.Map.empty[String, Int]
    docsRaw.values.foreach(_.distinct.filter(_.length >= 4).foreach(w => df(w) = df.getOrElse(w, 0) + 1))
    val Seq(t1, t2) = df.toSeq.sortBy { case (w, c) => (-c, w) }.take(2).map(_._1)
    def pos(toks: Vector[String], t: String) =
      toks.zipWithIndex.collect { case (w, i) if w == t => i + 1 }
    def spans(toks: Vector[String]): Seq[Int] = {
      val p2 = pos(toks, t2)
      pos(toks, t1).filter(_ <= 8).filter(i => p2.find(_ > i).exists(j => j - i - 1 <= 5))
    }
    out.foreach { r =>
      val sp = spans(docsRaw(r.getAs[Long]("doc_id")))
      assert(sp.length.toLong == r.getAs[Long]("n_spans"),
        s"doc ${r.getAs[Long]("doc_id")}: n_spans")
      assert(sp.headOption.map(_.toLong).contains(r.getAs[Long]("first_start")),
        s"doc ${r.getAs[Long]("doc_id")}: first_start")
    }
    // the field MASK must bite somewhere in the corpus: a t1 occurrence
    // OUTSIDE the first-8 title window that would pair with a t2 under the
    // slop — otherwise the query degenerates to a plain span_near and the
    // masking semantics are untested
    val bites = docsRaw.values.exists { toks =>
      val p2 = pos(toks, t2)
      pos(toks, t1).exists(i => i > 8 && p2.find(_ > i).exists(j => j - i - 1 <= 5))
    }
    assert(bites, "no body-only t1 ever pairs under the slop — the field mask is vacuous")
  }

  test("q119 bool: all four clause types decide, recomputed from raw text") {
    import queries.TextQueries.QLo
    val out = SparkEntry.queries("q119_bool")(spark, sf).collect()
    assert(out.nonEmpty)
    val meta = queries.Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text"), col("n_chars")).collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1).trim.toLowerCase.split("\\s+").toVector, r.getLong(2)))).toMap
    val df = scala.collection.mutable.Map.empty[String, Int]
    meta.values.foreach(_._1.distinct.filter(_.length >= 4).foreach(w => df(w) = df.getOrElse(w, 0) + 1))
    val ranked = df.toSeq.sortBy { case (w, c) => (-c, w) }.map(_._1)
    val (tMust, tS1, tS2, tNot) = (ranked(QLo - 1), ranked(QLo), ranked(QLo + 1), ranked(QLo + 2))
    def gates(id: Long): (Boolean, Boolean, Boolean, Boolean) = {
      val (toks, nChars) = meta(id)
      val set = toks.toSet
      (set(tMust), set(tS1) || set(tS2), !set(tNot), nChars >= 200)
    }
    // every returned doc satisfies must AND msm AND NOT must_not AND filter
    out.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (m, sh, nn, f) = gates(id)
      assert(m && sh && nn && f, s"doc $id violates a clause: must=$m should=$sh not=$nn filter=$f")
    }
    // DECISIVENESS: each gate excludes at least one doc that passes the
    // other three — otherwise that clause type is vacuously tested
    val all = meta.keys.map(id => (id, gates(id)))
    assert(all.exists { case (_, (m, sh, nn, f)) => !m && sh && nn && f }, "must never decides")
    assert(all.exists { case (_, (m, sh, nn, f)) => m && !sh && nn && f },
      "minimum_should_match never decides")
    assert(all.exists { case (_, (m, sh, nn, f)) => m && sh && !nn && f }, "must_not never decides")
    assert(all.exists { case (_, (m, sh, nn, f)) => m && sh && nn && !f }, "filter never decides")
  }

  test("q99 classifier: learns a planted signal (held-out accuracy >= 0.95) and stays honest on the shipped corpus") {
    import spark.implicits._
    // planted-signal corpus: src0 docs speak "alpha beta", the rest speak
    // "gamma delta", with shared filler both classes emit — a classifier
    // that learns must separate these; one that merely memorizes the
    // prior cannot (the shipped corpus, measured source-unconditional,
    // yields exactly the prior — asserted below)
    val planted = (0L until 200L).map { i =>
      val pos = i % 4 == 0 // 25% positive, like the shipped source skew
      val signal = if (pos) "alpha beta alpha beta alpha" else "gamma delta gamma delta gamma"
      (i, if (pos) "src0" else s"src${1 + i % 3}", s"$signal common filler words here $signal")
    }.toDF("doc_id", "source", "text")
    val scored = queries.TextQueries.qualityScoredFrom(planted, "qcls:spec-planted")
      .collect()
    val held = scored.filter(_.getAs[Long]("doc_id") % 5 == 0)
    assert(held.length == 40)
    val correct = held.count { r =>
      (r.getAs[Double]("score") > 0) == r.getAs[Boolean]("label")
    }
    assert(correct >= 38, s"held-out accuracy ${correct}/40 — the learner failed a separable corpus")
    // and on the shipped corpus the honest result is majority-class: the
    // eval row must show zero positive predictions (tp = fp = 0), not a
    // fabricated separation
    val eval = SparkEntry.queries("q99b_quality_classifier_eval")(spark, sf).collect().head
    assert(eval.getAs[Long]("tp") == 0L && eval.getAs[Long]("fp") == 0L,
      "the shipped corpus is source-unconditional; any positive prediction here is suspect")
    assert(eval.getAs[Long]("n_eval") > 0)
  }

  test("st17: the streaming span_first alert set equals the batch matcher exactly") {
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("doc_id"), r.getAs[String]("term"), r.getAs[Long]("first_pos"), r.getAs[Long]("n_within"))
    val streamed = SparkEntry.queries("st17_span_first_stream")(spark, sf).collect().map(key).toSet
    val batch = queries.TextQueries.spanFirstHits(
      queries.Tables(spark, sf, "documents")
        .withColumn("toks", split(trim(lower(col("text"))), "\\s+")),
      queries.TextQueries.spanFirstTerm(spark, sf)).collect().map(key).toSet
    assert(streamed.nonEmpty && streamed == batch,
      s"streaming alert set != batch matcher (${streamed.size} vs ${batch.size})")
    // q95 is exactly the top-20 window of this set
    val q95 = SparkEntry.queries("q95_span_first")(spark, sf).collect().map(key).toSet
    assert(q95.subsetOf(streamed) && q95.size == math.min(20, streamed.size))
  }

  test("st16: streaming media audit is row-identical to batch mm06") {
    val batch = SparkEntry.queries("mm06_media_info")(spark, sf).collect()
      .map(_.toString).sorted.toSeq
    val stream = SparkEntry.queries("st16_media_info_stream")(spark, sf).collect()
      .map(_.toString).sorted.toSeq
    assert(batch.nonEmpty && stream == batch,
      "streaming decode diverged from the batch audit")
  }

  test("q63b bigram LM: backoff fires on held-out sources and only there") {
    val out = SparkEntry.queries("q63b_bigram_logprob")(spark, sf).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Double]("xent") > 0.0))
    val model = Set("src0", "src1", "src2", "src3", "src4")
    val heldOutBackoff = out
      .filter(r => !model.contains(r.getAs[String]("source")))
      .map(_.getAs[Long]("n_backoff")).sum
    assert(heldOutBackoff > 0,
      "no held-out bigram ever backed off — the train/score split is vacuous")
    // a bigram seen in training can never back off: model-source docs are
    // their own training data
    out.filter(r => model.contains(r.getAs[String]("source"))).foreach { r =>
      assert(r.getAs[Long]("n_backoff") == 0L,
        s"doc ${r.getAs[Long]("doc_id")} is IN the model corpus but backed off")
    }
  }

  test("q121 C4 filters: every rule is decisive and the line surgery is real") {
    val out = SparkEntry.queries("q121_c4_filters")(spark, sf).collect()
    assert(out.nonEmpty)
    def b(r: org.apache.spark.sql.Row, c: String) = r.getAs[Boolean](c)
    // each page-level gate excludes a doc that the OTHER gates would keep —
    // none of the three is vacuously tested (the q119 clause discipline)
    assert(out.exists(r => b(r, "has_lorem") && !b(r, "has_brace") &&
      r.getAs[Long]("n_kept_lines") >= 3), "lorem-ipsum rule never decisive")
    assert(out.exists(r => b(r, "has_brace") && !b(r, "has_lorem") &&
      r.getAs[Long]("n_kept_lines") >= 3), "curly-brace rule never decisive")
    assert(out.exists(r => !b(r, "has_lorem") && !b(r, "has_brace") &&
      r.getAs[Long]("n_kept_lines") < 3), "three-sentence rule never decisive")
    assert(out.exists(r => b(r, "kept")), "no page survives — the filter is degenerate")
    // line-level retention bites: kept docs still DROP some lines (the
    // terminal-punctuation / five-word rules are not pass-through)
    assert(out.exists(r => b(r, "kept") &&
      r.getAs[Long]("n_kept_lines") < r.getAs[Long]("n_lines")),
      "no kept page lost a line — line retention is vacuous")
    // the retained text is materialized exactly for kept pages only
    out.foreach { r =>
      assert(b(r, "kept") == (r.getAs[String]("clean_md5") != null))
    }
  }

  test("q123 dis_max: the OR contract and the tie_breaker are both decisive") {
    val out = SparkEntry.queries("q123_dis_max")(spark, sf).collect()
    assert(out.length == 30)
    val two = out.filter(_.getAs[Long]("n_matched") == 2)
    val one = out.filter(_.getAs[Long]("n_matched") == 1)
    assert(two.nonEmpty, "no doc matches both clauses — the tie_breaker is vacuous")
    assert(one.nonEmpty, "every doc matches both clauses — the OR contract is untested")
    // tie_breaker 0.25 contributes exactly when a second clause matched
    two.foreach(r => assert(r.getAs[Double]("score") > r.getAs[Double]("best")))
    one.foreach(r => assert(r.getAs[Double]("score") == r.getAs[Double]("best")))
  }

  test("q124 decay: plateau, slope, cutoff and kernel agreement are all exercised") {
    val out = SparkEntry.queries("q124_decay_functions")(spark, sf).collect()
    assert(out.nonEmpty)
    // every regime of the piecewise kernels is occupied by real docs:
    // the offset plateau (d=0), the decay slope (0<d<s'), and linear's
    // hard cutoff (d>=s' -> score exactly 0 while gauss/exp stay >0... <0 in lg2)
    assert(out.exists(_.getAs[Long]("dist") == 0L), "no doc on the offset plateau")
    assert(out.exists(r => r.getAs[Long]("dist") > 0L &&
      r.getAs[Double]("linear_score") > 0.0), "no doc on the decay slope")
    assert(out.exists(_.getAs[Double]("linear_score") == 0.0),
      "no doc past linear's cutoff — the max(0, ·) clamp is vacuous")
    out.foreach { r =>
      val d = r.getAs[Long]("dist")
      if (d == 0L) {
        assert(r.getAs[Double]("linear_score") == 1.0)
        assert(r.getAs[Double]("gauss_lg2") == 0.0 && r.getAs[Double]("exp_lg2") == 0.0)
      } else {
        assert(r.getAs[Double]("gauss_lg2") < 0.0 && r.getAs[Double]("exp_lg2") < 0.0)
      }
    }
    // monotone agreement: sorted by d, every kernel is non-increasing
    val byD = out.sortBy(_.getAs[Long]("dist"))
    def nonInc(v: Array[Double], n: String) =
      assert(v.zip(v.tail).forall { case (a, b) => a >= b }, s"$n is not monotone in d")
    nonInc(byD.map(_.getAs[Double]("linear_score")), "linear_score")
    nonInc(byD.map(_.getAs[Double]("gauss_lg2")), "gauss_lg2")
    nonInc(byD.map(_.getAs[Double]("exp_lg2")), "exp_lg2")
  }

  test("st19: the benchmark set is bounded and an alert is re-derivable from raw text") {
    val bench = queries.TextQueries.decontamBench(spark, sf)
    // the 100 TB contract: a 5-doc benchmark slice's shingle set is a few
    // hundred strings no matter how large the corpus is
    assert(bench.nonEmpty && bench.size < 2000, s"bench set ${bench.size} — not plan-literal-sized")
    val out = SparkEntry.queries("st19_decontaminate_stream")(spark, sf).collect()
    assert(out.nonEmpty, "no arriving doc ever alerted — the guard is vacuous")
    assert(out.forall(_.getAs[Long]("n_shared") >= 3L))
    // recompute one alert's overlap from the raw text
    val docId = out.head.getAs[Long]("doc_id")
    val txt = queries.Tables(spark, sf, "documents")
      .filter(col("doc_id") === docId).select(col("text")).collect().head.getString(0)
    val toks = txt.trim.toLowerCase.split("\\s+").toSeq
    val sh = toks.sliding(3).map(_.mkString(" ")).toSet
    assert(sh.count(bench.contains) == out.head.getAs[Long]("n_shared"))
  }

  test("q125 analyze: offsets are contiguous, stop filters, edge_ngram expands in place") {
    val out = SparkEntry.queries("q125_analyze")(spark, sf).collect()
    val std = out.filter(_.getAs[String]("analyzer") == "standard")
    val stop = out.filter(_.getAs[String]("analyzer") == "stop")
    val edge = out.filter(_.getAs[String]("analyzer") == "edge_ngram")
    assert(std.nonEmpty && stop.nonEmpty && edge.nonEmpty)
    // offsets span exactly the token, and consecutive tokens are separated
    // by the single normalized space
    std.groupBy(_.getAs[Long]("doc_id")).foreach { case (_, rows) =>
      val byPos = rows.sortBy(_.getAs[Long]("pos"))
      byPos.foreach { r =>
        assert(r.getAs[Long]("end_offset") - r.getAs[Long]("start_offset") ==
          r.getAs[String]("token").length)
      }
      byPos.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Long]("start_offset") == a.getAs[Long]("end_offset") + 1)
        case _ => ()
      }
    }
    // the stop filter genuinely removes stopword positions and keeps the rest
    assert(stop.length < std.length, "stop analyzer removed nothing")
    assert(stop.forall(r => !Seq("the", "a", "of", "and", "is", "to")
      .contains(r.getAs[String]("token"))))
    // edge_ngram: a length>=3 token yields exactly its 3 prefixes at ONE position
    val g = edge.groupBy(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("pos")))
    val full = std.find(_.getAs[String]("token").length >= 3).get
    val grams = g((full.getAs[Long]("doc_id"), full.getAs[Long]("pos")))
      .map(_.getAs[String]("token")).sorted
    val tok = full.getAs[String]("token")
    assert(grams.sameElements(Seq(tok.substring(0, 1), tok.substring(0, 2), tok.substring(0, 3)).sorted))
  }

  test("q132 split: deterministic, complete, all three splits occupied, ~98/1/1") {
    val run1 = SparkEntry.queries("q132_data_split")(spark, sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("split")) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"))).toMap
    val run2 = SparkEntry.queries("q132_data_split")(spark, sf).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("split")) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"))).toMap
    assert(run1 == run2, "split assignment is not deterministic across runs")
    val bySplit = run1.groupBy(_._1._2).view.mapValues(_.values.map(_._1).sum).toMap
    assert(bySplit.keySet == Set("train", "val", "test"),
      s"missing splits: ${bySplit.keySet}")
    val total = bySplit.values.sum
    assert(total == queries.Tables(spark, sf, "documents").count(),
      "assignment is not complete — some doc landed in no split")
    assert(bySplit("train") > 90L * total / 100L, "train share below the contract")
    assert(bySplit("val") > 0 && bySplit("test") > 0)
  }

  test("q127 explain: the breakdown reconstructs the q76 ranking's own numbers") {
    val out = SparkEntry.queries("q127_explain")(spark, sf).collect()
    assert(out.nonEmpty)
    val byDoc = out.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.size == 3, s"expected 3 explained docs, got ${byDoc.keySet}")
    out.foreach { r =>
      assert(r.getAs[Long]("tf") >= 1 && r.getAs[Long]("df") >= 1 && r.getAs[Long]("dl") >= 1)
      assert(r.getAs[Double]("idf") > 0.0 && r.getAs[Double]("score_t") > 0.0)
    }
    // the API's core promise: per-term contributions sum to the score the
    // RANKING assigned (for any explained doc that appears in q76's page)
    val q76 = SparkEntry.queries("q76_bm25_search")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    val checked = byDoc.flatMap { case (id, rows) =>
      q76.get(id).map { want =>
        val got = rows.map(_.getAs[Double]("score_t")).sum
        assert(math.abs(got - want) < 1e-8, s"doc $id: explain sums to $got, ranking says $want")
        id
      }
    }
    assert(checked.nonEmpty,
      "no explained doc appears in q76's page — the sum identity was never exercised")
  }

  test("q122 script_score: filter context is honored and the +1 contract holds") {
    val out = SparkEntry.queries("q122_script_score")(spark, sf).collect()
    assert(out.length == 20)
    out.foreach { r =>
      assert(r.getAs[Long]("vec_id") % 3 == 1, "a doc outside the filter was scored")
      val s = r.getAs[Double]("score")
      assert(s >= 0.0 && s <= 2.0, s"cos+1 out of range: $s")
    }
    // non-vacuous: the filtered corpus is not all near-orthogonal to the query
    assert(out.head.getAs[Double]("score") > 1.0,
      "top score <= 1.0 — the cosine term never discriminates")
  }

  test("q134 terms lookup: the looked-up set comes from the longest doc and the filter is decisive") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("q134_terms_lookup")(spark, sf).collect()
    assert(out.length == 20)
    val total = out.head.getAs[Long]("total_hits")
    val n = queries.Tables(spark, sf, "documents").count()
    assert(total > 20 && total < n, s"terms-lookup filter not decisive: $total of $n")
    // replay the lookup derivation independently: every page doc must share
    // >= 1 length>=6 token with the longest doc's top-16 sorted term set
    val docsDf = queries.Tables(spark, sf, "documents")
      .withColumn("toks", graft.functions.text.tokens(col("text")))
    val lkTerms = docsDf.orderBy(col("n_chars").desc, col("doc_id").asc).limit(1)
      .select(explode(array_distinct(col("toks"))).as("t"))
      .collect().map(_.getString(0)).filter(_.length >= 6).distinct.sorted.take(16).toSet
    assert(lkTerms.nonEmpty && lkTerms.size <= 16)
    val pageIds = out.map(_.getAs[Long]("doc_id")).toSet
    val overlap = docsDf.filter(col("doc_id").isin(pageIds.toSeq: _*))
      .select(col("doc_id"), col("toks")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[scala.collection.Seq[String]]("toks").toSet.count(lkTerms.contains)).toMap
    out.foreach { r =>
      assert(r.getAs[Long]("n_matched") == overlap(r.getAs[Long]("doc_id")).toLong,
        "n_matched disagrees with the independent overlap replay")
      assert(r.getAs[Long]("n_matched") >= 1)
    }
  }

  test("q136 sparse retrieval: whole pipeline replayed in plain Scala collections matches exactly") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("q136_sparse_retrieval")(spark, sf).collect()
    assert(out.length == 20)
    // third implementation: tokenize via the shared tokenizer, then do the
    // expansion + scoring with Scala Maps only
    val docToks = queries.Tables(spark, sf, "documents")
      .select(col("doc_id"), graft.functions.text.tokens(col("text")).as("toks"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[scala.collection.Seq[String]]("toks").toSeq).toMap
    val tf: Map[(Long, String), Long] = docToks.toSeq
      .flatMap { case (d, ts) => ts.map(t => (d, t)) }
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val df4: Map[String, Long] = tf.keys.toSeq.filter(_._2.length >= 4)
      .groupBy(_._2).map { case (t, v) => t -> v.size.toLong }
    val rankedVocab = df4.toSeq.sortBy { case (t, d) => (-d, t) }
    val seeds = rankedVocab.slice(queries.TextQueries.QLo - 1, queries.TextQueries.QLo + 1).map(_._1)
    assert(seeds.length == 2)
    val wq: Map[String, Long] = seeds.flatMap { s =>
      val sdocs = docToks.keys.filter(d => tf.contains((d, s))).toSeq
      val codoc = sdocs.flatMap(d => tf.keys.collect { case (`d`, t) if t.length >= 4 => t })
        .groupBy(identity).map { case (t, v) => t -> v.size.toLong }
      codoc.toSeq.sortBy { case (t, c) => (-c, t) }.take(8)
    }.groupBy(_._1).map { case (t, v) => t -> v.map(_._2).sum }
    seeds.foreach(s => assert(wq.contains(s), "each seed must survive its own expansion"))
    val scored = docToks.keys.map { d =>
      // keys is a Set — go through a Seq or equal products would dedup
      val matched = wq.keys.toSeq.filter(t => tf.contains((d, t)))
      (d, matched.map(t => wq(t) * tf((d, t))).sum, matched.size.toLong)
    }.filter(_._3 > 0).toSeq.sortBy { case (d, s, _) => (-s, d) }.take(20)
    out.sortBy(_.getAs[Long]("rank")).zip(scored).zipWithIndex.foreach { case ((r, (d, s, nt)), i) =>
      assert(r.getAs[Long]("rank") == i + 1)
      assert(r.getAs[Long]("doc_id") == d, s"rank ${i + 1} doc differs")
      assert(r.getAs[Long]("score") == s, s"rank ${i + 1} score differs")
      assert(r.getAs[Long]("n_terms") == nt, s"rank ${i + 1} n_terms differs")
    }
  }

  test("q135 script query: the scripted predicate is exact and decisive, no score exists") {
    val out = SparkEntry.queries("q135_script_query")(spark, sf).collect()
    assert(out.length == 20)
    out.foreach { r =>
      val (id, nc) = (r.getAs[Long]("doc_id"), r.getAs[Long]("n_chars"))
      assert((nc * 7 + id) % 13 == 0 && nc >= 100, "page doc violates the script predicate")
    }
    val total = out.head.getAs[Long]("total_hits")
    val n = queries.Tables(spark, sf, "documents").count()
    assert(total > 20 && total < n, s"script filter not decisive: $total of $n")
    assert(!out.head.schema.fieldNames.contains("score"), "filter context must not score")
  }
}
