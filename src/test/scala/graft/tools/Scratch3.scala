package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FormattedMode

/** Scratch: does a localCheckpoint(true) frame keep its hash partitioning
  * for downstream exchange planning (with and without AQE)? */
object Scratch3 {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.range(1000).select(col("id").as("doc_id"), (col("id") % 7).as("v"))
      .repartition(col("doc_id")).localCheckpoint(true)
    val agg = df.groupBy(col("doc_id")).agg(sum(col("v")).as("s"))
    println("== AQE on ==")
    println(agg.queryExecution.explainString(FormattedMode).linesIterator
      .filter(l => l.contains("Exchange") || l.contains("Scan")).mkString("\n"))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val agg2 = df.groupBy(col("doc_id")).agg(sum(col("v")).as("s"))
    println("== AQE off ==")
    println(agg2.queryExecution.explainString(FormattedMode).linesIterator
      .filter(l => l.contains("Exchange") || l.contains("Scan")).mkString("\n"))
    spark.stop()
  }
}
