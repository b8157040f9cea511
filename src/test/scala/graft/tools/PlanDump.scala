package graft.tools

import org.apache.spark.sql.execution.FormattedMode

/** Scratch: print formatted plans for named registry queries.
  * Usage: Test/runMain graft.tools.PlanDump <sfDir> <q1,q2,...> */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("8").getOrCreate()
    val sf = args(0)
    // localized registry entries (materializeAndFree) expose their
    // distributed shape separately — dump THAT plan under the suffixed name
    val exposed: Map[String, () => org.apache.spark.sql.DataFrame] = Map(
      "q64_distributed" -> (() => graft.queries.EsAggQueries.q64Distributed(spark, sf)._1),
      "q64b_distributed" -> (() => graft.queries.EsAggQueries.q64bDistributed(spark, sf)._1))
    for (q <- args(1).split(",")) {
      val df = exposed.get(q).map(_.apply())
        .getOrElse(graft.SparkEntry.queries(q)(spark, sf))
      val p = df.queryExecution.explainString(FormattedMode)
      println(s"===== $q =====")
      println(p)
    }
    spark.stop()
  }
}
