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

  test("q09e moving_fn built-ins: bit-exact vs a plain-Scala replay of the ES recurrences") {
    val out = SparkEntry.queries("q09e_moving_fn_builtins")(spark, sf)
      .orderBy("bucket_ms").collect()
    assert(out.length > 7) // full frames exist
    val vs = out.map(_.getAs[Double]("value"))
    for (i <- out.indices) {
      val frame = vs.slice(math.max(0, i - 6), i + 1) // oldest→newest
      val n = frame.length
      val sum = frame.foldLeft(0.0)(_ + _)
      val avg = sum / n.toDouble
      val sq = frame.foldLeft(0.0)((a, v) => a + (v - avg) * (v - avg))
      val std = math.sqrt(sq / n.toDouble)
      val num = frame.zipWithIndex.map { case (v, k) => (k + 1) * math.round(v * 1.0e6) }.sum
      val lw = (2 * num).toDouble / ((n * (n + 1)).toDouble * 1.0e6)
      val ewma = frame.tail.foldLeft(frame.head)((e, v) => (v * 0.5) + (e * 0.5))
      var (s, b) = (frame.head, 0.0)
      for (v <- frame.tail) {
        val sNew = (v * 0.5) + ((s + b) * 0.5)
        b = ((sNew - s) * 0.25) + (b * 0.75)
        s = sNew
      }
      val r = out(i)
      assert(r.getAs[Double]("mov_sum") == sum, s"mov_sum row $i")
      assert(r.getAs[Double]("mov_avg") == avg, s"mov_avg row $i")
      assert(r.getAs[Double]("mov_stddev") == std, s"mov_stddev row $i")
      assert(r.getAs[Double]("mov_lwavg") == lw, s"mov_lwavg row $i")
      assert(r.getAs[Double]("mov_ewma") == ewma, s"mov_ewma row $i")
      assert(r.getAs[Double]("mov_holt") == s, s"mov_holt row $i")
    }
    // non-vacuous: the smoothers genuinely smooth (differ from the raw value)
    assert(out.exists(r => r.getAs[Double]("mov_ewma") != r.getAs[Double]("value")))
    assert(out.exists(r => r.getAs[Double]("mov_holt") != r.getAs[Double]("mov_ewma")))
  }

  test("q51b time_series downsample: slots bracket their hourly members and rate is the slot normalization") {
    val out = SparkEntry.queries("q51b_time_series_downsample")(spark, sf).collect()
    assert(out.nonEmpty)
    val slotMs = 6L * 3600000L
    out.foreach { r =>
      val n = r.getAs[Long]("n_hours")
      assert(n >= 1 && n <= 6, "a 6h slot holds at most 6 hourly buckets")
      assert(r.getAs[Long]("slot_ms") % slotMs == 0)
      assert(r.getAs[Double]("v_min") <= r.getAs[Double]("v_last"))
      assert(r.getAs[Double]("v_last") <= r.getAs[Double]("v_max"))
      assert(r.getAs[Double]("rate_per_sec") == r.getAs[Double]("v_sum") / 21600.0)
    }
    // multiple series and multi-hour slots both occur
    assert(out.map(_.getAs[String]("event_type")).distinct.length > 1)
    assert(out.exists(_.getAs[Long]("n_hours") == 6))
  }
}
