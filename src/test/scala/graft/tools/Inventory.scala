package graft.tools

/** Dev tool: print registry/§2 consistency counts. */
object Inventory {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    println(s"INV queries=${q.size} oracle=${o.size}")
    println(s"INV oracle-not-in-queries=${(o -- q).toSeq.sorted.mkString(",")}")
    val survey = scala.util.Using.resource(scala.io.Source.fromFile("SURVEY.md", "UTF-8")) {
      _.getLines()
        .filter(_.matches("^- `(q|st|mm).*")).map(_.drop(3).takeWhile(_ != '`')).toSet
    }
    println(s"INV survey_rows=${survey.size}")
    println(s"INV survey-not-in-queries=${(survey -- q).toSeq.sorted.mkString(",")}")
    println(s"INV queries-not-in-survey=${(q -- survey).toSeq.sorted.mkString(",")}")
  }
}
