package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` payloads with typed
  * metadata, processed in per-partition batches.
  *
  * The Spark-side shape is real and tested — schema, typed Dataset encoding,
  * partition-batched processing via `mapPartitions` (the Scala analog of a
  * batched pandas-UDF pipeline), deterministic feature output. The actual
  * media DECODE is a clearly-marked STUB (no image/audio codecs in this
  * environment): it derives fake "pixels" from the payload bytes
  * deterministically, preserving the interface a real codec would have. */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte], width: Int, height: Int, channels: Int)
  case class MediaFeatures(
      doc_id: Long,
      width: Int,
      height: Int,
      n_bytes: Long,
      mean_byte: Double,
      max_byte: Int,
      payload_hash: Long)

  /** STUB decode — stands in for a real image/video codec. Deterministic:
    * "pixels" are the payload bytes cycled to width*height*channels length.
    * A production build swaps this for the real decoder; everything
    * downstream (batching, features, schema) is unchanged. */
  def decodeStub(payload: Array[Byte], width: Int, height: Int, channels: Int): Array[Byte] = {
    val n = width * height * channels
    val out = new Array[Byte](n)
    if (payload.isEmpty) return out // empty doc ⇒ all-zero pixels, not %0
    var i = 0
    while (i < n) { out(i) = payload(i % payload.length); i += 1 }
    out
  }

  /** Attach a synthetic binary payload + media metadata to documents
    * (the testdata carries no real media; payload = utf8 bytes of `text`). */
  def attachPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      (col("n_chars") % 64 + 16).cast("int").as("width"),
      (col("doc_id") % 48 + 16).cast("int").as("height"),
      lit(3).as("channels"))

  /** Partition-batched decode → feature extraction. Features are simple
    * deterministic statistics over the decoded bytes (mean, max, fnv-ish
    * rolling hash) — the shape a real embedding/feature extractor has. */
  def extractFeatures(rows: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      it.map { r =>
        val px = decodeStub(r.payload, r.width, r.height, r.channels)
        var sum = 0L
        var mx = 0
        var h = 1469598103934665603L // FNV offset basis
        var i = 0
        while (i < px.length) {
          val v = px(i) & 0xff
          sum += v
          if (v > mx) mx = v
          h = (h ^ v) * 1099511628211L
          i += 1
        }
        MediaFeatures(r.doc_id, r.width, r.height, px.length.toLong, sum.toDouble / px.length, mx, h)
      }
    }
  }

  /** End-to-end pipeline over the documents table. */
  def pipeline(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    extractFeatures(attachPayload(docs).as[MediaRow]).toDF()
  }

  case class FrameFeatures(doc_id: Long, frame_idx: Int, mean_byte: Double, max_byte: Int)

  /** Video-style frame sampling: treat the payload as `n_frames` frames of
    * width*channels bytes each, keep every `stride`-th frame, and extract
    * per-frame features. One input row fans out to its sampled frames —
    * the explode/batch shape a real video pipeline has (decode stubbed as
    * above). */
  def sampleFrames(rows: Dataset[MediaRow], stride: Int): Dataset[FrameFeatures] = {
    import rows.sparkSession.implicits._
    rows.flatMap { r =>
      val px = decodeStub(r.payload, r.width, r.height, r.channels)
      val frameLen = r.width * r.channels // one "scanline frame" per height unit
      (0 until r.height by stride).map { f =>
        var sum = 0L
        var mx = 0
        var i = f * frameLen
        val end = i + frameLen
        while (i < end) {
          val v = px(i) & 0xff
          sum += v
          if (v > mx) mx = v
          i += 1
        }
        FrameFeatures(r.doc_id, f, sum.toDouble / frameLen, mx)
      }
    }
  }

  /** Frame-sampling pipeline over documents (every 4th frame). */
  def framePipeline(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    sampleFrames(attachPayload(docs).as[MediaRow], stride = 4).toDF()
  }

  case class ResizedFeatures(
      doc_id: Long, out_w: Int, out_h: Int, n_bytes: Long,
      mean_byte: Double, corner_tl: Int, corner_br: Int)

  /** Nearest-neighbor resize to (outW, outH): source index mapping
    * `src = dst * srcDim / outDim` per axis — the standard NN resize grid,
    * run on the stub-decoded pixels. The mapPartitions batch-in/batch-out
    * shape (and the per-row output contract: fixed outW*outH*channels
    * bytes + summary features) is exactly what a real resize UDF has; only
    * [[decodeStub]] stands in for the codec. */
  def resize(rows: Dataset[MediaRow], outW: Int, outH: Int): Dataset[ResizedFeatures] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      it.map { r =>
        val px = decodeStub(r.payload, r.width, r.height, r.channels)
        val c = r.channels
        val out = new Array[Byte](outW * outH * c)
        var y = 0
        while (y < outH) {
          val sy = y * r.height / outH
          var x = 0
          while (x < outW) {
            val sx = x * r.width / outW
            var ch = 0
            while (ch < c) {
              out((y * outW + x) * c + ch) = px((sy * r.width + sx) * c + ch)
              ch += 1
            }
            x += 1
          }
          y += 1
        }
        var sum = 0L
        var i = 0
        while (i < out.length) { sum += out(i) & 0xff; i += 1 }
        ResizedFeatures(
          r.doc_id, outW, outH, out.length.toLong,
          sum.toDouble / out.length, out(0) & 0xff, out(out.length - 1) & 0xff)
      }
    }
  }

  /** Resize pipeline over documents (16×16 thumbnails). */
  def resizePipeline(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    resize(attachPayload(docs).as[MediaRow], outW = 16, outH = 16).toDF()
  }

  case class AudioWindow(doc_id: Long, win_idx: Int, rms: Double, zero_crossings: Int)

  /** Audio-style plumbing: the payload read as big-endian 16-bit PCM mono,
    * framed into `win`-sample windows at `hop` stride, per-window RMS and
    * zero-crossing count — the exact fan-out/feature shape a real audio
    * featurizer (VAD, loudness normalization) has. The byte→sample read IS
    * the stub boundary: a real build decodes the container first; everything
    * downstream (framing, hop arithmetic, features, fan-out) is real. */
  def audioWindows(rows: Dataset[MediaRow], win: Int = 256, hop: Int = 128): Dataset[AudioWindow] = {
    import rows.sparkSession.implicits._
    rows.flatMap { r =>
      val bytes = r.payload
      val n = bytes.length / 2
      val samples = new Array[Int](n)
      var i = 0
      while (i < n) {
        samples(i) = (bytes(2 * i) << 8) | (bytes(2 * i + 1) & 0xff)
        i += 1
      }
      val out = Seq.newBuilder[AudioWindow]
      var w = 0
      var start = 0
      while (start + win <= n) {
        var sumSq = 0L
        var zc = 0
        var j = 0
        while (j < win) {
          val s = samples(start + j)
          sumSq += s.toLong * s
          if (j > 0 && ((s >= 0) != (samples(start + j - 1) >= 0))) zc += 1
          j += 1
        }
        out += AudioWindow(r.doc_id, w, math.sqrt(sumSq.toDouble / win), zc)
        w += 1
        start += hop
      }
      out.result()
    }
  }

  /** Audio-window pipeline over documents (64-sample windows, 32 hop — the
    * doc payloads are short). */
  def audioPipeline(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    audioWindows(attachPayload(docs).as[MediaRow], win = 64, hop = 32).toDF()
  }

  case class PHashRow(doc_id: Long, phash: Long)

  /** Perceptual average-hash (aHash): NN-resize the (stub-)decoded image to
    * 8×8, channel-average to grayscale, threshold each cell against the
    * image mean → 64-bit hash. Visually-near images differ in few bits, so
    * image near-dup detection is Hamming distance on 8 bytes — the standard
    * image-dedup trick at corpus scale. Only [[decodeStub]] stands in for
    * the codec; the hash math is the real aHash. */
  def perceptualHash(rows: Dataset[MediaRow]): Dataset[PHashRow] = {
    import rows.sparkSession.implicits._
    rows.mapPartitions { it =>
      it.map { r =>
        val px = decodeStub(r.payload, r.width, r.height, r.channels)
        val c = r.channels
        val g = new Array[Double](64)
        var y = 0
        while (y < 8) {
          val sy = y * r.height / 8
          var x = 0
          while (x < 8) {
            val sx = x * r.width / 8
            var s = 0
            var ch = 0
            while (ch < c) { s += px((sy * r.width + sx) * c + ch) & 0xff; ch += 1 }
            g(y * 8 + x) = s.toDouble / c
            x += 1
          }
          y += 1
        }
        val mean = g.sum / 64
        var h = 0L
        var i = 0
        while (i < 64) { if (g(i) > mean) h |= (1L << i); i += 1 }
        PHashRow(r.doc_id, h)
      }
    }
  }

  /** Image near-dup summary by perceptual hash: candidates share one of
    * four 16-bit hash chunks (pigeonhole — any pair within Hamming 3 must
    * share a chunk; wider matches surface when chunks agree), then every doc
    * reports its candidate count and closest match by full Hamming. Same
    * bucketed shape as SimHash text dedup: only (chunk, key, id) crosses the
    * shuffle, never pixels. One row per doc — byte-identical images show
    * best_hamming 0. */
  def phashPairs(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    // media dims derive from CONTENT (not doc_id) so duplicate payloads make
    // identical images — the property image dedup actually relies on
    val media = docs.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      (col("n_chars") % 64 + 16).cast("int").as("width"),
      (col("n_chars") % 48 + 16).cast("int").as("height"),
      lit(3).as("channels"))
    val hashes = perceptualHash(media.as[MediaRow]).toDF()
    val chunked = hashes.select(
      col("doc_id"), col("phash"),
      explode(array((0 until 4).map { ci =>
        struct(lit(ci).as("chunk"),
          shiftright(col("phash"), ci * 16).bitwiseAND(lit(0xffffL)).as("ckey"))
      }: _*)).as("cc"))
      .select(col("doc_id"), col("phash"), col("cc.chunk"), col("cc.ckey"))
    val a = chunked.select(col("chunk"), col("ckey"), col("doc_id").as("doc_a"), col("phash").as("ph_a"))
    val b = chunked.select(col("chunk"), col("ckey"), col("doc_id").as("doc_b"), col("phash").as("ph_b"))
    val perDoc = a.join(b, Seq("chunk", "ckey"))
      .filter(col("doc_a") =!= col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("ph_a"), col("ph_b"))
      .distinct()
      .withColumn("hamming", graft.functions.text.hamming64(col("ph_a"), col("ph_b")))
      .groupBy(col("doc_a").as("doc_id"))
      .agg(
        count(lit(1)).as("n_candidates"),
        min_by(struct(col("doc_b"), col("hamming")),
          struct(col("hamming"), col("doc_b"))).as("best"))
      .select(col("doc_id"), col("n_candidates"),
        col("best.doc_b").as("best_match"), col("best.hamming").cast("long").as("best_hamming"))
    hashes.join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("phash"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        col("best_match"), col("best_hamming"))
  }
}
