package graft.tools

/** Scratch: time named registry queries N times each (min also printed).
  * Usage: Test/runMain graft.tools.Scratch <sfDir> <q1,q2,...> [runs]
  * NOT part of any deliverable — measurement scaffolding only. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sf = args(0)
    val runs = if (args.length > 2) args(2).toInt else 3
    for (q <- args(1).split(",")) {
      val fn = graft.SparkEntry.queries(q)
      val ts = (1 to runs).map { i =>
        val t0 = System.nanoTime()
        fn(spark, sf).count()
        val t = (System.nanoTime() - t0) / 1e9
        println(f"$q run$i: $t%.3f s")
        t
      }
      println(f"$q min: ${ts.min}%.3f s")
    }
    spark.stop()
  }
}
