package graft.operators

/** Pure-JVM media codecs for the multimodal pipeline.
  *
  * The sandbox has no native image/audio libraries, but two ubiquitous
  * container formats need none: uncompressed 24-bit BMP (Windows
  * BITMAPINFOHEADER) and RIFF/WAVE PCM16. Both are fully specified public
  * formats, so the parsers here are real codecs — they read dimensions,
  * strides, chunk layout and sample data from the container itself, exactly
  * as a production decoder would — and the encoders emit files any external
  * viewer/player opens. Formats beyond these two still fall back to
  * [[Multimodal.decodeStub]] (clearly marked there).
  *
  * Everything is per-row and allocation-bounded by the payload size, so the
  * codecs run inside `mapPartitions` with no driver involvement and no
  * shuffle — the 100 TB shape is "decode where the bytes already live".
  */
object MediaCodec {

  /** A decoded raster: `pixels` is top-down, row-major, interleaved RGB
    * (channels = 3), `pixels.length == width * height * 3`. */
  final case class DecodedImage(width: Int, height: Int, pixels: Array[Byte])

  // ---------------------------------------------------------------- BMP ----

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def putLe16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte; b(off + 1) = (v >>> 8).toByte
  }

  private def putLe32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte; b(off + 1) = (v >>> 8).toByte
    b(off + 2) = (v >>> 16).toByte; b(off + 3) = (v >>> 24).toByte
  }

  /** Encode a top-down RGB raster as a standard bottom-up 24bpp BMP
    * (BITMAPFILEHEADER + BITMAPINFOHEADER, rows padded to 4 bytes, BGR
    * byte order — the layout every BMP reader expects).
    * `rgb.length` must be `width * height * 3`. */
  def encodeBmp(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(rgb.length == width * height * 3, s"rgb length ${rgb.length} != ${width * height * 3}")
    val stride = (width * 3 + 3) & ~3
    val dataSize = stride * height
    val out = new Array[Byte](54 + dataSize)
    out(0) = 'B'; out(1) = 'M'
    putLe32(out, 2, out.length) // file size
    putLe32(out, 10, 54) // pixel data offset
    putLe32(out, 14, 40) // BITMAPINFOHEADER size
    putLe32(out, 18, width)
    putLe32(out, 22, height) // positive ⇒ bottom-up
    putLe16(out, 26, 1) // planes
    putLe16(out, 28, 24) // bpp
    putLe32(out, 30, 0) // BI_RGB (uncompressed)
    putLe32(out, 34, dataSize)
    putLe32(out, 38, 2835); putLe32(out, 42, 2835) // 72 DPI
    var y = 0
    while (y < height) {
      val srcRow = y * width * 3
      val dstRow = 54 + (height - 1 - y) * stride // bottom-up
      var x = 0
      while (x < width) {
        out(dstRow + x * 3) = rgb(srcRow + x * 3 + 2) // B
        out(dstRow + x * 3 + 1) = rgb(srcRow + x * 3 + 1) // G
        out(dstRow + x * 3 + 2) = rgb(srcRow + x * 3) // R
        x += 1
      }
      y += 1
    }
    out
  }

  /** Decode an uncompressed 24bpp BMP. Handles bottom-up (positive height)
    * and top-down (negative height) files, row padding, and pixel-data
    * offsets beyond the headers (palette/gap bytes are skipped via the
    * header's own offset field). Returns None for anything that is not a
    * well-formed 24bpp BI_RGB bitmap — truncated files, other bit depths,
    * compressed variants — so callers can fall back. */
  def decodeBmp(bytes: Array[Byte]): Option[DecodedImage] = {
    if (bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M') return None
    val dataOffset = le32(bytes, 10)
    val headerSize = le32(bytes, 14)
    if (headerSize < 40) return None // BITMAPCOREHEADER not supported
    val width = le32(bytes, 18)
    val rawHeight = le32(bytes, 22)
    val topDown = rawHeight < 0
    val height = if (topDown) -rawHeight else rawHeight
    val planes = le16(bytes, 26)
    val bpp = le16(bytes, 28)
    val compression = le32(bytes, 30)
    if (width <= 0 || height <= 0 || planes != 1 || bpp != 24 || compression != 0) return None
    // all size arithmetic in Long: a hostile width like 0x40000000 would wrap
    // `width * 3` to a negative stride and defeat the bounds check below
    val strideL = (width.toLong * 3 + 3) & ~3L
    if (dataOffset < 54 || dataOffset.toLong + strideL * height > bytes.length) return None
    if (width.toLong * height * 3 > Int.MaxValue) return None
    val stride = strideL.toInt
    val out = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      val srcRow = dataOffset + (if (topDown) y else height - 1 - y) * stride
      val dstRow = y * width * 3
      var x = 0
      while (x < width) {
        out(dstRow + x * 3) = bytes(srcRow + x * 3 + 2) // R
        out(dstRow + x * 3 + 1) = bytes(srcRow + x * 3 + 1) // G
        out(dstRow + x * 3 + 2) = bytes(srcRow + x * 3) // B
        x += 1
      }
      y += 1
    }
    Some(DecodedImage(width, height, out))
  }

  // ---------------------------------------------------------------- WAV ----

  /** Encode mono PCM16 samples as a standard RIFF/WAVE file
    * (fmt chunk: PCM, 1 channel, 16-bit little-endian). */
  def encodeWavPcm16(samples: Array[Short], sampleRate: Int = 16000): Array[Byte] = {
    val dataSize = samples.length * 2
    val out = new Array[Byte](44 + dataSize)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    putLe32(out, 4, 36 + dataSize)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    putLe32(out, 16, 16) // fmt chunk size
    putLe16(out, 20, 1) // PCM
    putLe16(out, 22, 1) // mono
    putLe32(out, 24, sampleRate)
    putLe32(out, 28, sampleRate * 2) // byte rate
    putLe16(out, 32, 2) // block align
    putLe16(out, 34, 16) // bits per sample
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    putLe32(out, 40, dataSize)
    var i = 0
    while (i < samples.length) {
      putLe16(out, 44 + 2 * i, samples(i) & 0xffff)
      i += 1
    }
    out
  }

  /** Decode a RIFF/WAVE PCM16 mono file by walking its chunk list (chunks
    * are word-aligned per RIFF, so odd sizes consume a pad byte; unknown
    * chunks such as LIST/INFO are skipped). Returns the samples, or None
    * when the container is not mono 16-bit PCM — callers fall back to the
    * raw-PCM stub path. */
  def decodeWavPcm16(bytes: Array[Byte]): Option[Array[Int]] = {
    if (bytes.length < 44) return None
    if (bytes(0) != 'R' || bytes(1) != 'I' || bytes(2) != 'F' || bytes(3) != 'F') return None
    if (bytes(8) != 'W' || bytes(9) != 'A' || bytes(10) != 'V' || bytes(11) != 'E') return None
    var pos = 12
    var fmtOk = false
    var data: Array[Int] = null
    while (pos + 8 <= bytes.length) {
      val id = new String(bytes, pos, 4, "US-ASCII")
      val size = le32(bytes, pos + 4)
      val body = pos + 8
      // Long arithmetic: a corrupt size near Int.MaxValue would wrap
      // `body + size` negative and bypass this bound
      if (size < 0 || body.toLong + size > bytes.length) return None
      id match {
        case "fmt " =>
          if (size < 16) return None
          val audioFormat = le16(bytes, body)
          val channels = le16(bytes, body + 2)
          val bits = le16(bytes, body + 14)
          if (audioFormat != 1 || channels != 1 || bits != 16) return None
          fmtOk = true
        case "data" =>
          val n = size / 2
          val samples = new Array[Int](n)
          var i = 0
          while (i < n) {
            // little-endian signed 16-bit
            samples(i) = (bytes(body + 2 * i) & 0xff) | (bytes(body + 2 * i + 1) << 8)
            i += 1
          }
          data = samples
        case _ => // skip unknown chunk (LIST, fact, ...)
      }
      pos = body + size + (size & 1) // RIFF chunks are word-aligned
    }
    if (fmtOk && data != null) Some(data) else None
  }
}
