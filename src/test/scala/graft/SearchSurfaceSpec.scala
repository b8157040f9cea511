package graft

import org.scalatest.funsuite.AnyFunSuite

/** Decisiveness guards for the events-table search surface added in round
  * 14 (the TextSurfaceSpec discipline on the other fact table): each
  * operator's distinguishing feature must be visible in its result, not
  * just hash-matched. */
class SearchSurfaceSpec extends AnyFunSuite {

  lazy val spark = GraftSession.builder("4").getOrCreate()
  private val sf = "/root/testdata/sf0.001"

  test("q130 msearch: both bodies answer, tagged, each with its own ranking") {
    val out = SparkEntry.queries("q130_msearch")(spark, sf).collect()
    val byReq = out.groupBy(_.getAs[Long]("req"))
    assert(byReq.keySet == Set(0L, 1L))
    byReq.foreach { case (_, rows) =>
      assert(rows.length == 10)
      assert(rows.map(_.getAs[Long]("rank")).sorted.sameElements(1L to 10L))
    }
    // the second body's term query actually filters
    assert(byReq(1L).forall(_.getAs[String]("event_type") == "error"))
    assert(byReq(0L).exists(_.getAs[String]("event_type") != "error"),
      "match_all page is all 'error' — the two bodies are indistinguishable")
  }

  test("q131 collapse inner_hits: 10 groups, each with its own top-3 member page") {
    val out = SparkEntry.queries("q131_collapse_inner_hits")(spark, sf).collect()
    val byGroup = out.groupBy(_.getAs[Long]("group_rank"))
    assert(byGroup.keySet == (1L to 10L).toSet)
    byGroup.foreach { case (_, rows) =>
      assert(rows.length <= 3 && rows.nonEmpty)
      val vals = rows.sortBy(_.getAs[Long]("inner_rank")).map(_.getAs[Double]("value"))
      assert(vals.zip(vals.tail).forall { case (a, b) => a >= b }, "inner page not ranked")
      // inner_hits returns MORE than the collapsed representative
      assert(rows.head.getAs[Long]("group_size") >= rows.length)
    }
    assert(out.exists(_.getAs[Long]("inner_rank") == 2L),
      "every group has one member — inner_hits adds nothing over q16b")
  }

  test("q09d moving_fn: the window genuinely moves and brackets the value") {
    val out = SparkEntry.queries("q09d_moving_fn")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Double]("mov_min") <= r.getAs[Double]("value"))
      assert(r.getAs[Double]("mov_max") >= r.getAs[Double]("value"))
    }
    // non-vacuous: somewhere the trailing max is NOT the row's own value
    assert(out.exists(r => r.getAs[Double]("mov_max") != r.getAs[Double]("value")))
  }
}
