package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation — the step that
  * turns pairwise near-duplicate EDGES into dedup GROUPS (pick one canonical
  * doc per component).
  *
  * Each iteration is one hash-shuffle join + partial-min aggregation, so an
  * iteration costs O(|E|/cluster) with no driver-side data movement; the
  * driver only checks the scalar convergence count. Near-dup graphs have
  * tiny diameters (clusters of copies), so propagation converges in a few
  * rounds; a graph with long chains would want pointer-jumping instead
  * (O(log d) rounds), noted here deliberately. */
object ConnectedComponents {

  /** edges: two long columns (src, dst). Returns (id, component) where
    * component = min vertex id reachable. */
  def run(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    // materialize the (possibly expensive) edge pipeline once — the
    // symmetrization below references it twice
    val e = edges.toDF("src", "dst").persist()
    val sym = e
      .union(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist()
    // seed with the 1-hop minimum (min of self and direct neighbors) — one
    // propagation round folded into initialization
    var labels = sym
      .groupBy(col("src").as("id"))
      .agg(min(col("dst")).as("mn"))
      .select(col("id"), least(col("id"), col("mn")).as("component"))
      .persist()
    var converged = false
    var iter = 0
    // empty edge set ⇒ sum(component) is NULL — return the (empty) labels
    // rather than NPE on getLong
    val firstRow = labels.agg(sum(col("component"))).first()
    if (firstRow.isNullAt(0)) {
      sym.unpersist(blocking = false)
      e.unpersist(blocking = false)
      return labels
    }
    var labelSum = firstRow.getLong(0)
    while (!converged && iter < maxIter) {
      val neighborLabels = sym
        .join(labels, sym("src") === labels("id"))
        .select(col("dst").as("id"), col("component"))
      val next = labels.select(col("id"), col("component"))
        .union(neighborLabels)
        .groupBy(col("id"))
        .agg(min(col("component")).as("component"))
        .persist()
      // labels only ever decrease, so the label sum strictly decreases iff
      // anything changed — one scalar aggregate per round (previous round's
      // sum is carried, not recomputed)
      val sumNew = next.agg(sum(col("component"))).first().getLong(0)
      labels.unpersist()
      labels = next
      converged = sumNew == labelSum
      labelSum = sumNew
      iter += 1
    }
    // labels is materialized (the convergence aggregate forced it); the
    // edge frames are no longer needed — free them so repeated invocations
    // don't accumulate cached blocks
    sym.unpersist(blocking = false)
    e.unpersist(blocking = false)
    labels
  }
}
