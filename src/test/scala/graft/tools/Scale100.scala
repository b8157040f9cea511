package graft.tools

/** Timing half of the 100× spot-proof (the SCALE100X_r{N} artifacts):
  * min-of-2 after one warmup pass per query — the graft.Bench discipline —
  * at a base dir and a derived dir, printing one JSON line per query with
  * the scale factor. Correctness at the derived scale is the separate
  * graft.Verify + tools/check_oracle.py pass over the SAME derived files.
  *
  * Usage: Test/runMain graft.tools.Scale100 <baseDir> <bigDir> <q1,q2,...>
  */
object Scale100 {
  def main(args: Array[String]): Unit = {
    val Array(baseDir, bigDir, qcsv) = args.take(3)
    val names = qcsv.split(',').toSeq
    val spark = graft.GraftSession.local()
    // noop-format write, NOT count(): count() lets Catalyst prune a pure
    // projection down to the parquet row count, which would time the
    // footer read instead of the query (q126's regex chain vanished)
    def run(n: String, dir: String): Unit =
      graft.SparkEntry.queries(n)(spark, dir)
        .write.format("noop").mode("overwrite").save()
    def timeOne(n: String, dir: String): Double =
      (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        run(n, dir)
        (System.nanoTime() - t0) / 1e9
      }.min
    names.foreach { n =>
      run(n, baseDir) // warmup (JIT, codegen, footers)
      val base = timeOne(n, baseDir)
      run(n, bigDir) // warmup at scale (first-touch page cache)
      val big = timeOne(n, bigDir)
      println(f"""SCALE100 {"query":"$n","base_sec":$base%.3f,"x100_sec":$big%.3f,"factor":${big / base}%.1f}""")
    }
    spark.stop()
  }
}
