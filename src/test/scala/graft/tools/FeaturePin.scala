package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Generator for the committed-feature-hash pins (StreamingSpec's
  * regression locks on the two rows-only multimodal queries and the JPEG
  * aHash path) — `sbt "Test/runMain graft.tools.FeaturePin"` prints the
  * canonical hashes; paste them into the spec after an INTENDED feature
  * change. ONE canonicalization ([[featureHash]]) and ONE JPEG fixture
  * ([[jpegAHash]]) shared with the spec, so the pin and its generator
  * cannot drift. */
object FeaturePin {

  /** Canonical SHA-256 of a DataFrame's full output: every cell rendered
    * exactly (doubles/floats in hex — the pin is bit-exact), cells joined
    * by the \\u0001 separator, rows sorted, NUL-separated into the digest. Order-free, so
    * partitioning/AQE cannot move the pin. */
  def featureHash(df: DataFrame): String = {
    val rows = df.collect().map(_.toSeq.map {
      case d: Double      => java.lang.Double.toHexString(d)
      case f: Float       => java.lang.Float.toHexString(f)
      case b: Array[Byte] => b.map("%02x".format(_)).mkString
      case x              => String.valueOf(x)
    }.mkString("\u0001")).sorted
    val md = java.security.MessageDigest.getInstance("SHA-256")
    rows.foreach { r => md.update(r.getBytes("UTF-8")); md.update(0.toByte) }
    md.digest().map("%02x".format(_)).mkString
  }

  /** aHash of a fixed 20×20 raster through a REAL baseline-JPEG container
    * (encodeJpeg → sniff → decodeJpeg → perceptualHash) — the lossy-path
    * pipeline pin mm04's lossless-only corpus no longer exercises. */
  def jpegAHash(spark: SparkSession): Long = {
    import spark.implicits._
    val rgb = Array.tabulate[Byte](20 * 20 * 3)(i => ((i * 31) % 251).toByte)
    val row = graft.operators.Multimodal.MediaRow(
      9L, graft.operators.MediaCodec.encodeJpeg(20, 20, rgb), 20, 20, 3)
    graft.operators.Multimodal.perceptualHash(Seq(row).toDS()).collect().head.phash
  }

  /** aHash of the SAME 20×20 raster through the lossless PNG container —
    * the reference the JPEG pin is compared against (lossy decode must
    * land within a few bits of the lossless hash). */
  def pngAHash(spark: SparkSession): Long = {
    import spark.implicits._
    val rgb = Array.tabulate[Byte](20 * 20 * 3)(i => ((i * 31) % 251).toByte)
    val row = graft.operators.Multimodal.MediaRow(
      9L, graft.operators.MediaCodec.encodePng(20, 20, rgb), 20, 20, 3)
    graft.operators.Multimodal.perceptualHash(Seq(row).toDS()).collect().head.phash
  }

  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("4").getOrCreate()
    // mm01/mm02 left the rows-only regime in round 18 (DuckDB oracles);
    // the remaining pins are the lossy-JPEG aHash path fixtures.
    println(s"FEATUREPIN jpeg_ahash ${jpegAHash(spark)}L (png ref ${pngAHash(spark)}L)")
    spark.stop()
  }
}
