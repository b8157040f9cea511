package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{detsum, vectors}

/** Deterministic distributed Lloyd's k-means — the unsupervised coarse
  * quantizer for IVF-style ANN (the reference point is FAISS's IVF training;
  * here it is pure DataFrame algebra so Catalyst/AQE stay in play).
  *
  * Determinism is engineered, not hoped for:
  *  - init: the k vectors with the smallest `xxhash64(id)` — arbitrary but
  *    fixed under any partitioning;
  *  - assignment: argmax cosine with list_id as the tiebreak;
  *  - update: per-dimension means via [[detsum]] (terms rounded in double
  *    space, summed exactly as decimals), so centroids are bit-identical
  *    under any partitioning, AQE re-plan, or speculative retry;
  *  - a FIXED round count — no data-dependent stopping rule.
  *
  * Scale shape per round: one broadcast of k·dim doubles out, one shuffle of
  * (list_id, pos) partial sums back — the vectors themselves never shuffle.
  * Empty lists carry their previous centroid forward. Centroid frames are
  * localCheckpoint'ed so lineage stays flat across rounds. */
object KMeans {

  /** GROUPED k-means: trains an independent codebook per `grp` value in ONE
    * distributed pass — the shape a product-quantization trainer needs (8
    * subspace codebooks from one scan, not 8 sequential fits). Metric is
    * squared-L2 (argmin distance ≡ argmax 2·x·c − ‖c‖², so the per-row score
    * reuses the dot kernel and the x² constant cancels).
    *
    * vecs: (grp: int, id: long, emb: array<double>).
    * Returns (grp, list_id: int, cemb: array<double>).
    *
    * Scale shape per round: all groups' centroids broadcast together
    * (groups·k·dim doubles); assignment is one map-side max_by partial per
    * (grp, id); the update shuffles (grp, list, pos) partials — vectors never
    * move. Determinism identical to [[fit]]: hash-seeded init per group,
    * total-ordered argmax, detsum means. */
  def fitGrouped(vecs: DataFrame, k: Int, rounds: Int): DataFrame = {
    val seedW = Window.partitionBy(col("grp")).orderBy(col("h").asc, col("id").asc)
    var cent = vecs
      .withColumn("h", xxhash64(col("grp"), col("id")))
      .withColumn("rn", row_number().over(seedW))
      .filter(col("rn") <= k)
      .select(col("grp"), col("rn").cast("int").as("list_id"), col("emb").as("cemb"))
      .localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val cn = cent.withColumn("c2", vectors.dot(col("cemb"), col("cemb")))
      val assigned = vecs
        .join(broadcast(cn), Seq("grp"))
        .withColumn("score", lit(2.0) * vectors.dot(col("emb"), col("cemb")) - col("c2"))
        .groupBy(col("grp"), col("id"))
        .agg(max_by(
          struct(col("list_id"), col("emb")),
          struct(col("score"), (-col("list_id")).as("neg"))).as("best"))
        .select(col("grp"), col("best.list_id").as("list_id"), col("best.emb").as("emb"))
      val means = assigned
        .select(col("grp"), col("list_id"), posexplode(col("emb")).as(Seq("pos", "x")))
        .groupBy(col("grp"), col("list_id"), col("pos"))
        .agg((detsum.sumDet(col("x"), 9) / count(lit(1))).as("cx"))
        .groupBy(col("grp"), col("list_id"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("cx")))),
          t => t.getField("cx")).as("cnew"))
      cent = cent
        .join(means, Seq("grp", "list_id"), "left")
        .select(col("grp"), col("list_id"), coalesce(col("cnew"), col("cemb")).as("cemb"))
        .localCheckpoint(true)
    }
    cent
  }

  /** vecs: (id: long, emb: array<double>, nrm: double).
    * Returns centroids (list_id: int, cemb: array<double>). */
  def fit(vecs: DataFrame, k: Int, rounds: Int): DataFrame = {
    val seedW = Window.orderBy(col("h").asc, col("id").asc)
    var cent = vecs
      .withColumn("h", xxhash64(col("id")))
      .orderBy(col("h").asc, col("id").asc)
      .limit(k)
      .withColumn("list_id", row_number().over(seedW).cast("int"))
      .select(col("list_id"), col("emb").as("cemb"))
      .localCheckpoint(true)
    for (_ <- 1 to rounds) {
      val cn = cent.withColumn("cnrm", vectors.norm(col("cemb")))
      // argmax via max_by, not a window: the k candidate rows per vector
      // collapse map-side in the partial aggregate, so the exchange carries
      // one (list_id, emb) per vector instead of k sorted copies. Ordering
      // key (ccos, -list_id) is unique per id, so the argmax is
      // deterministic without a sort.
      val assigned = vecs
        .crossJoin(broadcast(cn))
        .withColumn("ccos", vectors.dot(col("emb"), col("cemb")) / (col("nrm") * col("cnrm")))
        .groupBy(col("id"))
        .agg(max_by(
          struct(col("list_id"), col("emb")),
          struct(col("ccos"), (-col("list_id")).as("neg"))).as("best"))
        .select(col("best.list_id").as("list_id"), col("best.emb").as("emb"))
      // centroid update via posexplode + one narrow aggregate: the explode
      // is in-stage CPU only — partial aggregation on (list_id, pos)
      // collapses to k × dim states per map task BEFORE the exchange, so
      // the wire cost is k × dim partials regardless of corpus size.
      // (64 per-dimension aggregate expressions were measured SLOWER: the
      // generated aggregate overflows codegen limits.)
      val means = assigned
        .select(col("list_id"), posexplode(col("emb")).as(Seq("pos", "x")))
        .groupBy(col("list_id"), col("pos"))
        .agg((detsum.sumDet(col("x"), 9) / count(lit(1))).as("cx"))
        .groupBy(col("list_id"))
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("cx")))),
          t => t.getField("cx")).as("cnew"))
      cent = cent
        .join(means, Seq("list_id"), "left")
        .select(col("list_id"), coalesce(col("cnew"), col("cemb")).as("cemb"))
        .localCheckpoint(true)
    }
    cent
  }
}
