package graft.tools

import scala.concurrent.{Await, Future}
import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration.DurationInt

import graft.{GraftSession, queries}

/** Dev tool: isolate the vec_index_build timing (BENCH_r09 flagged a
  * 2.97s -> 8.91s movement on a single-shot measurement). Runs the same
  * concurrent coarse+PQ build as [[graft.Bench]] N times back-to-back after
  * one warmup, printing each run — noise shows up as spread, a real plan
  * regression as a uniformly high floor. */
object BenchIndex {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val n = args.headOption.map(_.toInt).getOrElse(4)
    val spark = GraftSession.local()
    val times = (0 until n).map { i =>
      queries.VecIndex.reset()
      val t0 = System.nanoTime()
      val halves = Seq(
        Future(queries.VecIndex.coarse(spark, sfDir).lists.count()),
        Future(queries.VecIndex.pq(spark, sfDir).codes.count()))
      halves.foreach(Await.result(_, 10.minutes))
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"run $i%d: $dt%.3f s")
      dt
    }
    println(f"min ${times.min}%.3f  median ${times.sorted.apply(n / 2)}%.3f  max ${times.max}%.3f")
    spark.stop()
  }
}
