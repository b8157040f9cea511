package graft.tools

import org.apache.spark.sql.execution.FormattedMode

/** Scratch: print formatted plans for named registry queries.
  * Usage: Test/runMain graft.tools.PlanDump <sfDir> <q1,q2,...> */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("8").getOrCreate()
    val sf = args(0)
    for (q <- args(1).split(",")) {
      val p = graft.SparkEntry.queries(q)(spark, sf).queryExecution.explainString(FormattedMode)
      println(s"===== $q =====")
      println(p)
    }
    spark.stop()
  }
}
