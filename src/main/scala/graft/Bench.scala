package graft

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Measurement-integrity guard: concurrent load makes per-query wall
    // times unusable for cross-round comparison (a dirty bench shows 10-50x
    // "regressions" on untouched code). Sample the 1-min load average
    // BEFORE Spark spins up its own pool: a busy machine self-identifies
    // in the output instead of masquerading as a plan regression.
    val nproc = Runtime.getRuntime.availableProcessors()
    val loadStart =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
    val dirty = loadStart > 0.25 * nproc
    val spark = GraftSession.local()
    // One untimed warmup pass (JIT + codegen + parquet footer caching), then
    // time the steady-state run — per-query numbers are otherwise dominated
    // by whichever query pays the first-use compilation cost.
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    ordered.foreach { case (_, fn) =>
      try fn(spark, sfDir).count()
      catch { case _: Throwable => () }
    }
    // the ANN/PQ queries share a train-once index (VecIndex); rebuild it
    // from scratch HERE, timed, so the one-time training cost is visible in
    // the output instead of hiding in the warmup — the per-query times below
    // are then honest steady-state search costs against a built index
    // (exactly how an index-backed deployment runs)
    queries.VecIndex.reset()
    val bt0 = System.nanoTime()
    locally {
      // the coarse (IVF) and PQ halves are independent — build them as
      // concurrent jobs (the cluster shape: two training pipelines sharing
      // the scan cache, scheduled together)
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration.DurationInt
      val halves = Seq(
        Future(queries.VecIndex.coarse(spark, sfDir).lists.count()),
        Future(queries.VecIndex.pq(spark, sfDir).codes.count()))
      halves.foreach(Await.result(_, 10.minutes))
    }
    val indexBuild = ("vec_index_build", (System.nanoTime() - bt0) / 1e9)
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
    } :+ indexBuild
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errors = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    val loadEnd =
      java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errors,"sf":"$sfDir","load_start":$loadStart,"load_end":$loadEnd,"nproc":$nproc,"dirty":$dirty}""")
    spark.stop()
  }
}
