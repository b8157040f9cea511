package graft.tools

/** Timed subset runner for the scale spot-proof artifacts
  * (SCALE100X_r{N}.json): `runMain graft.tools.BenchSubset <sfDir>
  * <q1,q2,...>` times each named registry query against `sfDir` —
  * one untimed warmup pass then min-of-2, the graft.Bench discipline —
  * and prints ONE JSON line {"queries":{name:sec,...}}. Kept separate
  * from Bench because a derived spot-proof dir carries only a table
  * subset (e.g. documents+events at 100x), where the full registry
  * would spend an hour failing on absent tables. */
object BenchSubset {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: BenchSubset <sfDir> <q1,q2,...>")
    val (sfDir, names) = (args(0), args(1).split(',').toSeq)
    val spark = graft.GraftSession.local()
    val qs = names.map(n => n -> graft.SparkEntry.queries(n))
    qs.foreach { case (_, fn) => fn(spark, sfDir).count() } // warmup
    val timed = qs.map { case (n, fn) =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      n -> times.min
    }
    println(timed.map { case (n, t) => s""""$n":$t""" }
      .mkString("""{"queries":{""", ",", "}}"))
    spark.stop()
  }
}
