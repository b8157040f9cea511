package graft.tools

/** Dev tool: dump named queries (+ their oracle SQL) for a single-query
  * DuckDB compare — `sbt "Test/runMain graft.tools.VerifyOne <sfDir> <outDir> <q> [...]"`. */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val outDir = args(1); val names = args.drop(2)
    val spark = graft.GraftSession.local()
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      graft.SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = names.filter(graft.SparkEntry.oracleSql.contains)
      .map(n => s"${q(n)}: ${q(graft.SparkEntry.oracleSql(n))}").mkString("{", ",", "}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
