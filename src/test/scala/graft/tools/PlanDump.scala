package graft.tools

import org.apache.spark.sql.execution.FormattedMode

import graft._

/** Dev tool: print the physical plan tree for a registered query at
  * sf0.001 — `sbt "Test/runMain graft.tools.PlanDump <query> [full]"`.
  * Used to iterate on plans until they're the ones we'd want at 100 TB.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("4").getOrCreate()
    val p = SparkEntry.queries(args(0))(spark, "/root/testdata/sf0.001")
      .queryExecution.explainString(FormattedMode)
    if (args.length > 1 && args(1) == "full") println(p)
    else println(p.split("\n").takeWhile(!_.trim.startsWith("(1)")).mkString("\n"))
    spark.stop()
  }
}
