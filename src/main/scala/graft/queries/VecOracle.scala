package graft.queries

import graft.functions.{detsum, vectors}

/** DuckDB oracle generators that replay [[graft.operators.KMeans]] index
  * training op-for-op — the q10g recipe (quantile-init 1-D k-means mirrored
  * in SQL) generalized to the n-dimensional coarse quantizer and the grouped
  * PQ trainer, so the IVF/PQ query family (q37, q37b, q58b, q68, q69, st12)
  * is oracle-backed instead of rows-only.
  *
  * Why this is possible at all: every step of the trainer is engineered
  * deterministic AND cross-engine reproducible —
  *  - seeding orders by [[vectors.hash60]] (md5-based; xxhash64 has no
  *    DuckDB counterpart, which is why the trainer switched),
  *  - dot products / norms are strict left-associated chains
  *    ([[vectors.dotSql]] mirrors the native `vec_dot` fold),
  *  - centroid means go through the detsum recipe (per-term rounding, exact
  *    decimal sum — [[detsum.sumDetSql]]),
  *  - assignment is a lexicographic argmax (score desc, list_id asc) that
  *    maps to `row_number() OVER (ORDER BY sc DESC, list_id ASC)`; the
  *    degenerate zero-norm-vector case agrees too — under the engine's
  *    pinned ANSI mode Spark RAISES on the 0/0 division (loud error,
  *    nothing to compare; SketchSpec pins this), and under a legacy
  *    ansi=false override Spark's SQL division yields NULL with
  *    NULLS-LAST DESC ordering, exactly DuckDB's behavior,
  *  - display rounding uses [[detsum.roundDetSql]] (floor(x·10^s + 0.5) —
  *    three correctly-rounded IEEE ops, bit-identical across engines).
  *
  * Hyperparameters come from [[VecIndex]] (one definition with the
  * trainer), and per-round centroid norms / ‖c‖² are hoisted into the
  * centroid CTEs (k rows) instead of being recomputed per (vector,
  * centroid) pair — value-identical (same expression, evaluated once).
  *
  * Every CTE below names the Spark step it mirrors. Fixed round counts mean
  * the whole loop unrolls to a linear CTE chain — ~50 KB of generated SQL
  * for the coarse half, which DuckDB parses and runs in milliseconds at
  * oracle scale (the cross joins are corpus × k, never corpus²). */
object VecOracle {

  private val Dim = 64
  private val Subs = VecIndex.PqSubs
  private val SubDim = VecIndex.PqSubDim

  private def dotN(a: String, b: String) = vectors.dotSql(a, b, Dim)
  private def dotS(a: String, b: String) = vectors.dotSql(a, b, SubDim)

  /** Mirrors KMeans.fit(k=nlistsFor(n), rounds=CoarseRounds, cosine) +
    * VecIndex.assignToLists: CTEs `v` (corpus with norm), `cent` (final
    * centroids with cnrm) and `lists` (the inverted lists — every vector
    * with its nearest list). k is DATA-DEPENDENT (the [[VecIndex.nlistsSql]]
    * rule over the same corpus the trainer counts), so the one static SQL
    * string replays the identical index at every scale — the round-12 nlists
    * rule needs no per-dataset SQL generation because the per-round CTEs are
    * table-shaped (k only enters the seeding cutoff). */
  val coarsePrefix: String = {
    val rounds = VecIndex.CoarseRounds
    val sb = new StringBuilder
    sb ++= s"""WITH e AS (
      |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
      |), v AS MATERIALIZED (
      |  SELECT id, emb, sqrt(${dotN("emb", "emb")}) AS nrm FROM e
      |), kp AS (
      |  -- VecIndex.nlistsFor: nlists = max(floor, floor(sqrt(n/divisor)))
      |  ${VecIndex.nlistsSql("v")}
      |), c0 AS MATERIALIZED (
      |  -- seeding: the k smallest hash60(id), list_id by (h, id) order;
      |  -- cnrm hoisted here (k rows) instead of per (vector, centroid) pair
      |  SELECT list_id, cemb, sqrt(${dotN("cemb", "cemb")}) AS cnrm FROM (
      |    SELECT CAST(rn AS INT) AS list_id, emb AS cemb FROM (
      |      SELECT emb, row_number() OVER (ORDER BY h, id) AS rn
      |      FROM (SELECT id, emb, ${vectors.hash60Sql("id")} AS h FROM v)
      |    ) WHERE rn <= (SELECT kl FROM kp)
      |  )
      |)""".stripMargin
    for (r <- 1 to rounds) {
      val prev = s"c${r - 1}"
      val means = (1 to Dim)
        .map(i => s"${detsum.sumDetSql(s"emb[$i]", 9)} / COUNT(*) AS x$i")
        .mkString(",\n      |           ")
      val cemb = (1 to Dim).map(i => s"x$i").mkString("list_value(", ", ", ")")
      sb ++= s""", a$r AS (
        |  -- round $r assignment: argmax cosine, ties to the smaller list
        |  SELECT id, emb, list_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY id ORDER BY sc DESC, list_id ASC) AS rn
        |    FROM (SELECT v.id, v.emb, c.list_id,
        |                 (${dotN("v.emb", "c.cemb")}) / (v.nrm * c.cnrm) AS sc
        |          FROM v CROSS JOIN $prev c)
        |  ) WHERE rn = 1
        |), u$r AS (
        |  -- round $r update: per-dimension detsum means
        |  SELECT list_id, $cemb AS cemb FROM (
        |    SELECT list_id,
        |           $means
        |    FROM a$r GROUP BY list_id
        |  )
        |), c$r AS MATERIALIZED (
        |  -- empty lists carry the previous centroid forward
        |  SELECT list_id, cemb, sqrt(${dotN("cemb", "cemb")}) AS cnrm FROM (
        |    SELECT p.list_id, COALESCE(u.cemb, p.cemb) AS cemb
        |    FROM $prev p LEFT JOIN u$r u ON p.list_id = u.list_id
        |  )
        |)""".stripMargin
    }
    sb ++= s""", cent AS (
      |  SELECT list_id, cemb, cnrm FROM c$rounds
      |), lists AS MATERIALIZED (
      |  -- VecIndex.assignToLists: final nearest-centroid assignment
      |  SELECT list_id, id AS vec_id, emb, nrm FROM (
      |    SELECT *, row_number() OVER (PARTITION BY id ORDER BY sc DESC, list_id ASC) AS rn
      |    FROM (SELECT v.id, v.emb, v.nrm, c.list_id,
      |                 (${dotN("v.emb", "c.cemb")}) / (v.nrm * c.cnrm) AS sc
      |          FROM v CROSS JOIN cent c)
      |  ) WHERE rn = 1
      |)""".stripMargin
    sb.toString
  }

  /** Mirrors VecIndex.pq — subvector split, KMeans.fitGrouped(k=PqK,
    * rounds=PqRounds, squared-L2) and the PQ encode: CTEs `sv` (one row per
    * (grp, id) subvector), `pcb` (codebooks with ‖c‖²) and `pcodes`
    * (per-subvector chosen code + reconstruction error). Standalone —
    * composes with [[coarsePrefix]] by comma (the CTE names are disjoint).
    * `pe` re-reads embeddings rather than referencing `e` so this prefix
    * also works alone (q58b needs no coarse half). The squared-L2 score
    * 2·x·c − ‖c‖² divides nothing, so no [[nanDiv]] is needed here. */
  val pqPrefix: String = {
    val k = VecIndex.PqK
    val rounds = VecIndex.PqRounds
    val sb = new StringBuilder
    val slices = (0 until Subs).map { g =>
      val elems = (1 to SubDim).map(i => s"emb[${g * SubDim + i}]").mkString(", ")
      s"SELECT $g AS grp, id, list_value($elems) AS emb FROM pe"
    }.mkString("\n      |  UNION ALL ")
    sb ++= s"""pe AS (
      |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
      |), sv AS MATERIALIZED (
      |  -- VecIndex.subvectors: 64 dims -> 8 x 8-dim slices
      |  $slices
      |), pc0 AS MATERIALIZED (
      |  -- fitGrouped seeding: per grp, the k smallest hash60(grp:id);
      |  -- c2 (= ||c||^2) hoisted here, k rows per grp
      |  SELECT grp, list_id, cemb, (${dotS("cemb", "cemb")}) AS c2 FROM (
      |    SELECT grp, CAST(rn AS INT) AS list_id, emb AS cemb FROM (
      |      SELECT grp, id, emb, row_number() OVER (PARTITION BY grp ORDER BY h, id) AS rn
      |      FROM (SELECT grp, id, emb, ${vectors.hash60Sql("grp || ':' || id")} AS h FROM sv)
      |    ) WHERE rn <= $k
      |  )
      |)""".stripMargin
    for (r <- 1 to rounds) {
      val prev = s"pc${r - 1}"
      val means = (1 to SubDim)
        .map(i => s"${detsum.sumDetSql(s"emb[$i]", 9)} / COUNT(*) AS x$i")
        .mkString(",\n      |           ")
      val cemb = (1 to SubDim).map(i => s"x$i").mkString("list_value(", ", ", ")")
      sb ++= s""", pa$r AS (
        |  -- grouped round $r assignment: argmax 2*x*c - ||c||^2 per grp
        |  SELECT grp, id, emb, list_id FROM (
        |    SELECT *, row_number() OVER (PARTITION BY grp, id ORDER BY sc DESC, list_id ASC) AS rn
        |    FROM (SELECT s.grp, s.id, s.emb, c.list_id,
        |                 2.0 * (${dotS("s.emb", "c.cemb")}) - c.c2 AS sc
        |          FROM sv s JOIN $prev c ON s.grp = c.grp)
        |  ) WHERE rn = 1
        |), pu$r AS (
        |  SELECT grp, list_id, $cemb AS cemb FROM (
        |    SELECT grp, list_id,
        |           $means
        |    FROM pa$r GROUP BY grp, list_id
        |  )
        |), pc$r AS MATERIALIZED (
        |  SELECT grp, list_id, cemb, (${dotS("cemb", "cemb")}) AS c2 FROM (
        |    SELECT p.grp, p.list_id, COALESCE(u.cemb, p.cemb) AS cemb
        |    FROM $prev p LEFT JOIN pu$r u ON p.grp = u.grp AND p.list_id = u.list_id
        |  )
        |)""".stripMargin
    }
    val err = (1 to SubDim)
      .map(i => s"(s.emb[$i] - c.cemb[$i]) * (s.emb[$i] - c.cemb[$i])")
      .mkString(" + ")
    sb ++= s""", pcb AS (
      |  SELECT grp, list_id, cemb, c2 FROM pc$rounds
      |), pcodes AS MATERIALIZED (
      |  -- VecIndex.encodeAgainst: chosen code + subspace reconstruction error
      |  SELECT id AS vec_id, grp, list_id AS code, c2,
      |         ${detsum.roundDetSql(s"serr / $SubDim", 9)} AS sub_sq_err
      |  FROM (
      |    SELECT *, row_number() OVER (PARTITION BY grp, id ORDER BY sc DESC, list_id ASC) AS rn
      |    FROM (SELECT s.id, s.grp, c.list_id, c.c2,
      |                 2.0 * (${dotS("s.emb", "c.cemb")}) - c.c2 AS sc,
      |                 ($err) AS serr
      |          FROM sv s JOIN pcb c ON s.grp = c.grp)
      |  ) WHERE rn = 1
      |)""".stripMargin
    sb.toString
  }
}
