package graft.tools

import graft.{Bench, GraftSession, queries}

/** Dev tool: isolate the vec_index_build timing (BENCH_r09 flagged a
  * 2.97s -> 8.91s movement on a single-shot measurement). Runs the SAME
  * concurrent coarse+PQ build the bench times ([[graft.Bench.buildIndex]] —
  * one definition, so this reproduction cannot drift from what the bench
  * reports) N times back-to-back, printing each run — noise shows up as
  * spread, a real plan regression as a uniformly high floor. */
object BenchIndex {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val n = args.headOption.map(_.toInt).getOrElse(4)
    val spark = GraftSession.local()
    val times = (0 until n).map { i =>
      queries.VecIndex.reset()
      val t0 = System.nanoTime()
      Bench.buildIndex(spark, sfDir)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"run $i%d: $dt%.3f s")
      dt
    }
    println(f"min ${times.min}%.3f  median ${times.sorted.apply(n / 2)}%.3f  max ${times.max}%.3f")
    spark.stop()
  }
}
