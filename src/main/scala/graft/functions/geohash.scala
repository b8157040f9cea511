package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-engine-deterministic geohash encoding (the REAL ES `geohash_grid`
  * cell id, not a lat/lon floor grid).
  *
  * Geohash is pure bisection: interleave longitude/latitude bits (lon
  * first), each bit = "is the coordinate in the upper half of the current
  * range", then base32-encode 5 bits per character. Every midpoint
  * `(lo+hi)/2` and comparison is a correctly-rounded IEEE basic op, so —
  * like [[detlog]] — the encoding is bit-identical across engines as long
  * as both run the IDENTICAL op sequence. [[withGeohash]] emits the Spark
  * side as a withColumn chain (named per-step columns keep the expression
  * tree linear; a nested Column expression would grow 3^bits);
  * [[geohashSqlCtes]] emits the same sequence as DuckDB MATERIALIZED CTEs
  * (materialization stops DuckDB's textual CTE inlining from exponential
  * blow-up — the detlog lesson).
  *
  * Reference semantics: elasticsearch GeoTileUtils/geohash grid — the
  * public geohash spec (Niemeyer): even interleaved bit = longitude,
  * alphabet 0-9 b-z minus a,i,l,o. */
object geohash {

  /** The geohash base32 alphabet. */
  val Alphabet = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** Spark side: adds `out` = `chars`-character geohash of
    * (`latIn`, `lonIn`) to `df` — one codegen'd kernel call
    * (graft.plans.GeohashEnc) computing the identical IEEE sequence as
    * [[withGeohashChain]] (the ~80-projection chain pays quadratic plan
    * analysis per query, the det_log2 lesson; SketchSpec pins the two
    * forms equal). */
  def withGeohash(df: DataFrame, latIn: String, lonIn: String, out: String, chars: Int): DataFrame =
    df.withColumn(out,
      call_function("geohash_enc", col(latIn).cast("double"), col(lonIn).cast("double"), lit(chars)))

  /** The withColumn-chain form — the executable specification of the op
    * sequence (and of the DuckDB mirror [[geohashSqlCtes]]); kept for the
    * native expression's parity test. */
  def withGeohashChain(df: DataFrame, latIn: String, lonIn: String, out: String, chars: Int): DataFrame = {
    val bits = chars * 5
    var d = df
      .withColumn("__lonlo", lit(-180.0)).withColumn("__lonhi", lit(180.0))
      .withColumn("__latlo", lit(-90.0)).withColumn("__lathi", lit(90.0))
      .withColumn("__g", lit(0L))
    for (b <- 0 until bits) {
      val (in, lo, hi) =
        if (b % 2 == 0) (lonIn, "__lonlo", "__lonhi") else (latIn, "__latlo", "__lathi")
      d = d
        .withColumn("__mid", (col(lo) + col(hi)) / lit(2.0))
        .withColumn("__bit", col(in) >= col("__mid"))
        .withColumn("__g", col("__g") * lit(2L) + when(col("__bit"), lit(1L)).otherwise(lit(0L)))
        .withColumn(lo, when(col("__bit"), col("__mid")).otherwise(col(lo)))
        .withColumn(hi, when(col("__bit"), col(hi)).otherwise(col("__mid")))
    }
    val s = concat((0 until chars).map { i =>
      val shift = 5 * (chars - 1 - i)
      lit(Alphabet).substr(
        (shiftright(col("__g"), shift).bitwiseAND(lit(31L)) + lit(1L)).cast("int"),
        lit(1))
    }: _*)
    // null parity with the native kernel: GeohashEnc is nullSafeEval (null
    // lat/lon → null hash), while the bisection chain would silently encode
    // a null coordinate as all-low bits (`null >= mid` is null → otherwise
    // branch every step)
    d.withColumn(out,
        when(col(latIn).isNull || col(lonIn).isNull, lit(null).cast("string")).otherwise(s))
      .drop("__lonlo", "__lonhi", "__latlo", "__lathi", "__g", "__mid", "__bit")
  }

  /** DuckDB side: the identical bisection as a chain of MATERIALIZED CTEs.
    * Returns a WITH-clause fragment (no trailing comma); the final CTE is
    * named `<tag>fin` and exposes `src`'s columns plus `out`. */
  def geohashSqlCtes(src: String, latIn: String, lonIn: String, out: String, chars: Int, tag: String): String = {
    val bits = chars * 5
    val head =
      s"""${tag}0 AS MATERIALIZED (
         |  SELECT *, -180.0 AS ${tag}_lonlo0, 180.0 AS ${tag}_lonhi0,
         |         -90.0 AS ${tag}_latlo0, 90.0 AS ${tag}_lathi0,
         |         CAST(0 AS BIGINT) AS ${tag}_g0
         |  FROM $src
         |)""".stripMargin
    val steps = (1 to bits).map { k =>
      val b = k - 1
      val (in, dim) = if (b % 2 == 0) (lonIn, "lon") else (latIn, "lat")
      val (oth, p) = (if (dim == "lon") "lat" else "lon", k - 1)
      val lo = s"${tag}_${dim}lo$p"
      val hi = s"${tag}_${dim}hi$p"
      val mid = s"(($lo + $hi) / 2.0)"
      s"""$tag$k AS MATERIALIZED (
         |  SELECT *,
         |         ${tag}_g$p * 2 + CASE WHEN $in >= $mid THEN 1 ELSE 0 END AS ${tag}_g$k,
         |         CASE WHEN $in >= $mid THEN $mid ELSE $lo END AS ${tag}_${dim}lo$k,
         |         CASE WHEN $in >= $mid THEN $hi ELSE $mid END AS ${tag}_${dim}hi$k,
         |         ${tag}_${oth}lo$p AS ${tag}_${oth}lo$k,
         |         ${tag}_${oth}hi$p AS ${tag}_${oth}hi$k
         |  FROM $tag$p
         |)""".stripMargin
    }
    val enc = (0 until chars)
      .map { i =>
        val shift = 5 * (chars - 1 - i)
        s"substring('$Alphabet', CAST(((${tag}_g$bits >> $shift) & 31) + 1 AS INT), 1)"
      }
      .mkString(" || ")
    val fin = s"${tag}fin AS (SELECT *, $enc AS $out FROM $tag$bits)"
    (head +: steps :+ fin).mkString(",\n")
  }
}
