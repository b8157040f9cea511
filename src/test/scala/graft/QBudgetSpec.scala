package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.tools.QBudget

/** Commit-time COST gate — the round-13 lesson made machine-checkable.
  *
  * q96 shipped an O(|p1|·|p2|·|p3|)-per-document span predicate (filter
  * pushdown SUBSTITUTING expensive HOF aliases into per-element lambdas)
  * and sat at 90× its family cost profile for 12 commits while every
  * correctness gate stayed green: specs check rows, the oracle checks
  * hashes, PlanSpec checks plan SHAPE — nothing bounded COST until the
  * end-of-round bench ran. This spec closes that hole: every registry
  * query re-times at sf0.01 on every `sbt test` against its committed pin
  * (`src/test/resources/qbudget.txt`, regenerated via
  * `graft.tools.QBudgetPin` — which itself REFUSES to pin a born-slow
  * plan), so the next pathological plan dies in the commit that creates
  * it instead of in the next round's bench.
  *
  * Noise discipline: ceilings are 10× the pin with a 1.2s floor, scaled
  * by the fixed-work canary ratio (machine speed, not engine), and a
  * breach is only declared after solo re-runs — parallel test suites on
  * the shared session make single timings one-sided-noisy, and a real
  * O(n³) plan breaches every attempt while a GC pause does not.
  *
  * Validated against the round-13 defect itself: with commit `1555930`'s
  * q96 body swapped into the round-14 tree, this spec fails with exactly
  * one breach — `q96_intervals: 4.52s > ceiling 2.86s (pin 0.286s)`,
  * 15.8× over its own steady cost at sf0.01 — and passes on HEAD
  * (measured 2026-08-15; the experiment is reproducible by reverting the
  * q96 entry to that commit's form). */
class QBudgetSpec extends AnyFunSuite {

  lazy val spark = GraftSession.builder(QBudget.threads).getOrCreate()

  test("every registry query stays within its pinned sf0.01 cost budget") {
    val (pinCanary, pins) = QBudget.loadPins()
    val names = SparkEntry.queries.keySet
    val missing = names -- pins.keySet
    val stale = pins.keySet -- names
    assert(missing.isEmpty && stale.isEmpty,
      s"registry/pin drift (missing=${missing.toSeq.sorted}, stale=${stale.toSeq.sorted}) — " +
        "re-run `sbt \"Test/runMain graft.tools.QBudgetPin\"` (it refuses born-slow pins)")
    val speed = math.max(1.0, QBudget.canary() / pinCanary)
    val timed = QBudget.timeAll(spark, QBudget.sfDir)
    // per-group floors from the run's OWN measured medians (round 15): a
    // contended run raises the median and the floor together, while a
    // single 10×-ing cheap query can't move the median it's judged against
    val medByGroup = timed.groupBy { case (n, _) => QBudget.group(n) }
      .map { case (g, ts) => val s = ts.map(_._2).sorted; (g, s(s.length / 2)) }
    val breaches = timed.flatMap { case (n, t0) =>
      val g = QBudget.group(n)
      val ceil = math.max(
        QBudget.floorFor(g, medByGroup(g)),
        QBudget.budgetMult * pins(n) * speed)
      var t = t0
      var tries = 0
      while (t > ceil && tries < 2) {
        tries += 1
        t = math.min(t, QBudget.timeOne(spark, QBudget.sfDir, SparkEntry.queries(n)))
      }
      if (t > ceil)
        Some(f"$n: $t%.2fs > ceiling $ceil%.2fs (pin ${pins(n)}%.3fs, canary speed $speed%.2f)")
      else None
    }
    assert(breaches.isEmpty,
      "cost-budget breaches — a plan got structurally more expensive; " +
        "fix it (or, for an INTENDED cost change, re-pin via QBudgetPin):\n" +
        breaches.mkString("\n"))
  }

  test("per-group floor closes the sub-floor hole: a 10x-regressed cheap batch query breaches") {
    // the round-14 hole: pin 0.11s, regressed to 1.1s — under the old flat
    // 1.2s floor that NEVER breached. With the batch floor at
    // max(0.4, 3 × measured group median), it does.
    val pin = 0.11
    val regressed = 1.15 // >10x the pin, still under the old 1.2s flat floor
    val groupMedian = 0.15 // a typical clean-run batch median at sf0.01
    val ceil = math.max(
      QBudget.floorFor("batch", groupMedian),
      QBudget.budgetMult * pin * 1.0)
    assert(regressed > ceil, f"10x regression must breach (ceiling $ceil%.2f)")
    assert(regressed <= 1.2, "the old flat floor would have passed it — the hole was real")
    // self-normalization: a uniformly contended run (median itself 3x up)
    // lifts the floor so the same absolute timing is NOT a false breach
    assert(QBudget.floorFor("batch", 0.45) > regressed)
    // streaming/multimodal keep the fixed 1.2s floor
    assert(QBudget.floorFor("streaming", 0.05) == QBudget.floorSec)
    assert(QBudget.floorFor("multimodal", 0.05) == QBudget.floorSec)
  }

  test("the born-slow guard flags a pathological new plan and passes the normal profile") {
    // a 15x-over-median timing must be refused at pin time (the guard that
    // stops an author laundering a pathological plan into the contract by
    // regenerating pins)
    val bad = Seq(("q_a", 0.10), ("q_b", 0.12), ("q_c", 0.11), ("q_x_new", 2.0))
    val flagged = QBudget.bornSlow(bad)
    assert(flagged.map(_._1) == Seq("q_x_new"))
    // a wide-but-sane profile (the real registry's shape: capstones a few
    // multiples of the median) pins cleanly
    val sane = Seq(("q_a", 0.10), ("q_b", 0.30), ("q_c", 0.12), ("q_d", 0.9))
    assert(QBudget.bornSlow(sane).isEmpty)
    // groups are gated independently: a streaming query is judged against
    // the streaming median, not the batch one
    val mixed = Seq(("q_a", 0.1), ("q_b", 0.1), ("st_a", 1.5), ("st_b", 1.6))
    assert(QBudget.bornSlow(mixed).isEmpty)
  }
}
