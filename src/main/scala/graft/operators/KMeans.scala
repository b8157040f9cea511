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
  *  - assignment: argmax score with list_id as the tiebreak;
  *  - update: per-dimension means via [[detsum]] (terms rounded in double
  *    space, summed exactly as decimals), so centroids are bit-identical
  *    under any partitioning, AQE re-plan, or speculative retry;
  *  - a FIXED round count — no data-dependent stopping rule.
  *
  * Scale shape per round: one broadcast of k·dim doubles out, one shuffle of
  * (list_id, pos) partial sums back — the vectors themselves never shuffle.
  * Centroids round-trip through the DRIVER between rounds (k·dim doubles —
  * the same bounded payload the broadcast ships anyway); that keeps lineage
  * flat with no per-round checkpoint writes, and the final centroid frame is
  * a literal, so consumers never re-trigger training. Empty lists carry
  * their previous centroid forward.
  *
  * CALLER CONTRACT: `fit`/`fitGrouped` re-evaluate the full lineage of
  * `vecs` once per round plus once for seeding. Callers must materialize an
  * expensive input first (`localCheckpoint(eager = true)` — what every
  * caller in this repo does) or pay rounds+1 recomputations of the lineage. */
object KMeans {

  private type Centroids = Seq[(Int, Seq[Double])]

  /** One Lloyd's round: broadcast `cent`, argmax-assign via max_by (the k
    * candidate rows per vector collapse in the map-side partial, so one row
    * per vector crosses the wire), then per-dimension detsum means.
    * `score` maps (emb, cemb) to the assignment objective. posexplode +
    * one narrow aggregate beats k·dim aggregate expressions, which overflow
    * codegen limits. Returns list_id -> new centroid (empty lists absent). */
  private def round(
      vecs: DataFrame, centDf: DataFrame, keyCols: Seq[String],
      score: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column)
      : DataFrame = {
    val joined =
      if (keyCols.isEmpty) vecs.crossJoin(broadcast(centDf))
      else vecs.join(broadcast(centDf), keyCols)
    val grpCols = keyCols.map(col)
    joined
      .withColumn("sc", score(col("emb"), col("cemb")))
      .groupBy(grpCols :+ col("id"): _*)
      .agg(max_by(
        struct(col("list_id"), col("emb")),
        struct(col("sc"), (-col("list_id")).as("neg"))).as("best"))
      .select(grpCols ++ Seq(col("best.list_id").as("list_id"), col("best.emb").as("emb")): _*)
      .select(grpCols ++ Seq(col("list_id"), posexplode(col("emb")).as(Seq("pos", "x"))): _*)
      .groupBy(grpCols ++ Seq(col("list_id"), col("pos")): _*)
      .agg((detsum.sumDet(col("x"), 9) / count(lit(1))).as("cx"))
      .groupBy(grpCols :+ col("list_id"): _*)
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("cx")))),
        t => t.getField("cx")).as("cnew"))
  }

  /** vecs: (id: long, emb: array<double>, nrm: double).
    * Returns centroids (list_id: int, cemb: array<double>), cosine metric. */
  def fit(vecs: DataFrame, k: Int, rounds: Int): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val seedW = Window.orderBy(col("h").asc, col("id").asc)
    var cent: Centroids = vecs
      .withColumn("h", xxhash64(col("id")))
      .orderBy(col("h").asc, col("id").asc)
      .limit(k)
      .withColumn("list_id", row_number().over(seedW).cast("int"))
      .select(col("list_id"), col("emb"))
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1))).toSeq.sortBy(_._1)
    for (_ <- 1 to rounds) {
      val cn = cent.toDF("list_id", "cemb")
        .withColumn("cnrm", vectors.norm(col("cemb")))
      val updated = round(vecs, cn, Nil,
        (e, c) => vectors.dot(e, c) / (col("nrm") * col("cnrm")))
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
      cent = cent.map { case (l, old) => (l, updated.getOrElse(l, old)) }
    }
    cent.toDF("list_id", "cemb")
  }

  /** GROUPED k-means: trains an independent codebook per `grp` value in ONE
    * distributed pass — the shape a product-quantization trainer needs (8
    * subspace codebooks from one scan, not 8 sequential fits). Metric is
    * squared-L2 (argmin distance ≡ argmax 2·x·c − ‖c‖², so the per-row score
    * reuses the dot kernel and the x² constant cancels).
    *
    * vecs: (grp: int, id: long, emb: array<double>).
    * Returns (grp, list_id: int, cemb: array<double>). */
  def fitGrouped(vecs: DataFrame, k: Int, rounds: Int): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val seedW = Window.partitionBy(col("grp")).orderBy(col("h").asc, col("id").asc)
    var cent: Seq[(Int, Int, Seq[Double])] = vecs
      .withColumn("h", xxhash64(col("grp"), col("id")))
      .withColumn("rn", row_number().over(seedW))
      .filter(col("rn") <= k)
      .select(col("grp"), col("rn").cast("int").as("list_id"), col("emb"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
      .toSeq.sortBy(t => (t._1, t._2))
    for (_ <- 1 to rounds) {
      val cn = cent.toDF("grp", "list_id", "cemb")
        .withColumn("c2", vectors.dot(col("cemb"), col("cemb")))
      val updated = round(vecs, cn, Seq("grp"),
        (e, c) => lit(2.0) * vectors.dot(e, c) - col("c2"))
        .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Double](2)).toMap
      cent = cent.map { case (g, l, old) => (g, l, updated.getOrElse((g, l), old)) }
    }
    cent.toDF("grp", "list_id", "cemb")
  }
}
