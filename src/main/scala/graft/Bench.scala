package graft

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()
    // One untimed warmup pass (JIT + codegen + parquet footer caching), then
    // time the steady-state run — per-query numbers are otherwise dominated
    // by whichever query pays the first-use compilation cost.
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    ordered.foreach { case (_, fn) =>
      try fn(spark, sfDir).count()
      catch { case _: Throwable => () }
    }
    // min of two timed runs: GC pauses and thread scheduling add seconds of
    // one-sided noise on a shared 32-thread JVM; the min is the honest
    // steady-state cost of the plan itself
    val results = ordered.map { case (name, fn) =>
      var failed = false
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch { case _: Throwable => failed = true }
        (System.nanoTime() - t0) / 1e9
      }
      // a failed query must not masquerade as a (fast) timing
      (name, if (failed) -1.0 else times.min)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errors = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errors,"sf":"$sfDir"}""")
    spark.stop()
  }
}
