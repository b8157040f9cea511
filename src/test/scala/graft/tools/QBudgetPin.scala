package graft.tools

/** Generator for the committed per-query cost pins ([[graft.QBudgetSpec]]'s
  * commit-time budget gate) — `sbt "Test/runMain graft.tools.QBudgetPin"`
  * rewrites `src/test/resources/qbudget.txt` after an INTENDED cost change
  * or a new query.
  *
  * Why this exists: round 13's q96 shipped an O(|p1|·|p2|·|p3|)-per-doc
  * span predicate and sat at 90× its family cost profile for 12 commits
  * while every correctness gate stayed green — specs check rows, the
  * oracle checks hashes, PlanSpec checks plan SHAPE, and nothing bounded
  * COST until the end-of-round bench. The pin file is the cost contract:
  * QBudgetSpec re-times every registry query at the pin SF on every
  * `sbt test` and fails any query that exceeds 10× its pinned time
  * (canary-normalized), so the next born-expensive plan dies in the
  * commit that creates it.
  *
  * Born-slow guard: a pin run REFUSES to write a budget for a query whose
  * fresh measurement exceeds [[QBudget.bornSlowMult]]× the median of its
  * group (batch / streaming / multimodal) unless the query is listed in
  * [[QBudget.exempt]] with a justification — so an author cannot launder
  * a pathological plan into the contract by regenerating pins.
  */
object QBudgetPin {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder(QBudget.threads).getOrCreate()
    val timed = QBudget.timeAll(spark, QBudget.sfDir)
    val canary = QBudget.canary()
    val offenders = QBudget.bornSlow(timed)
    if (offenders.nonEmpty) {
      System.err.println(
        "QBudgetPin REFUSED: the following queries are born-slow (>" +
          s"${QBudget.bornSlowMult}x their group median) and not exempt —\n" +
          "fix the plan or add a justified QBudget.exempt entry:\n" +
          offenders.map { case (n, t, med) => f"  $n%-32s $t%.3fs vs group median $med%.3fs" }
            .mkString("\n"))
      spark.stop()
      sys.exit(1)
    }
    val f = new java.io.File(QBudget.pinPath)
    Option(f.getParentFile).foreach(_.mkdirs())
    val w = new java.io.PrintWriter(f)
    try {
      w.println(f"canary $canary%.4f")
      timed.foreach { case (n, t) => w.println(f"$n $t%.4f") }
    } finally w.close()
    println(s"QBudgetPin: wrote ${timed.size} budgets to ${QBudget.pinPath} (canary ${f"$canary%.4f"})")
    spark.stop()
  }
}
