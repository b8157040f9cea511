package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{FlowStream, Sessionize}
import graft.streaming.Sessionize.Ev

class StreamingSpec extends AnyFunSuite {

  lazy val spark = GraftSession.builder("4").getOrCreate()

  test("streaming proportional_sum equals the batch result") {
    val sf = "/root/testdata/sf0.001"
    val streamed = queries.FlowQueries.queries("st01_prop_sum_stream")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val batch = queries.FlowQueries.queries("q01_prop_sum_basic")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("stateful sessionization emits sessions closed by a gap, keeps the open one") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val out = Sessionize.statefulSessions(mem.toDS(), gapMs = 1000L)
    val q = out.writeStream
      .format("memory").queryName("sessions_out")
      .outputMode(OutputMode.Append)
      .trigger(Trigger.ProcessingTime(0))
      .start()
    try {
      // session 1: two events 100ms apart; then a 5s gap opens session 2
      mem.addData(Ev(1L, 0L, 1.0), Ev(1L, 100L, 2.0))
      q.processAllAvailable()
      mem.addData(Ev(1L, 5000L, 4.0), Ev(2L, 0L, 8.0))
      q.processAllAvailable()
      val closed = spark.table("sessions_out").as[Sessionize.Session].collect().toSet
      // only user 1's first session is closed; u1-s2 and u2-s1 remain open state
      assert(closed == Set(Sessionize.Session(1L, 0L, 100L, 2L, 3.0)))
    } finally q.stop()
  }

  test("multimodal pipeline: deterministic features with correct batch shape") {
    val sf = "/root/testdata/sf0.001"
    val docs = queries.Tables(spark, sf, "documents")
    val feats = graft.operators.Multimodal.pipeline(docs)
    assert(feats.columns.toSeq == Seq("doc_id", "width", "height", "n_bytes", "mean_byte", "max_byte", "payload_hash"))
    val n = docs.count()
    assert(feats.count() == n)
    // n_bytes = width*height*3 always; features deterministic across runs
    assert(feats.filter(col("n_bytes") =!= col("width") * col("height") * 3).count() == 0)
    val a = feats.orderBy("doc_id").collect().toSeq
    val b = graft.operators.Multimodal.pipeline(docs).orderBy("doc_id").collect().toSeq
    assert(a == b)
  }
}
