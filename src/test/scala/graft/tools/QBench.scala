package graft.tools

/** Dev tool: steady-state timing for individual registered queries —
  * `sbt "Test/runMain graft.tools.QBench <query> [<query> ...]"`.
  * Warmup run + min of 2, mirroring graft.Bench's discipline, for
  * iterating on a single query's plan without a full bench sweep.
  * Data dir from SPARK_GRAFT_SF_DIR (default sf0.1) so the same tool
  * drives the 10x scale-proof pass. */
object QBench {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("32").getOrCreate()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (q <- args) {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(q)(spark, dir).collect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"QBENCH $q: ${times.drop(1).min}%.3f (all: ${times.map(t => f"$t%.2f").mkString(",")})")
    }
    spark.stop()
  }
}
