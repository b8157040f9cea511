package graft.operators

/** Pure-JVM media codecs for the multimodal pipeline.
  *
  * The sandbox has no native image/audio libraries, but three ubiquitous
  * container formats need none: uncompressed 24-bit BMP (Windows
  * BITMAPINFOHEADER), 8-bit truecolor PNG (zlib via `java.util.zip`,
  * full filter reconstruction), and RIFF/WAVE PCM16. All are fully
  * specified public formats, so the parsers here are real codecs — they
  * read dimensions, strides, chunk layout, compressed streams and sample
  * data from the container itself, exactly as a production decoder would —
  * and the encoders emit files any external viewer/player opens. Formats
  * beyond these (JPEG, H.264 video) still fall back to
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

  // ---------------------------------------------------------------- PNG ----

  private val PngSig =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def putBe32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v >>> 24).toByte; b(off + 1) = (v >>> 16).toByte
    b(off + 2) = (v >>> 8).toByte; b(off + 3) = v.toByte
  }

  /** Encode a top-down RGB raster as a standard 8-bit truecolor PNG
    * (IHDR color type 2, one zlib-deflated IDAT, filter type 0 rows, CRCs
    * per chunk — any external viewer opens it). */
  def encodePng(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    require(rgb.length == width * height * 3, s"rgb length ${rgb.length} != ${width * height * 3}")
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(PngSig)
    def chunk(tag: String, body: Array[Byte]): Unit = {
      val len = new Array[Byte](4)
      putBe32(len, 0, body.length)
      bos.write(len)
      val tb = tag.getBytes("US-ASCII")
      bos.write(tb)
      bos.write(body)
      val crc = new java.util.zip.CRC32()
      crc.update(tb)
      crc.update(body)
      val cb = new Array[Byte](4)
      putBe32(cb, 0, crc.getValue.toInt)
      bos.write(cb)
    }
    val ihdr = new Array[Byte](13)
    putBe32(ihdr, 0, width)
    putBe32(ihdr, 4, height)
    ihdr(8) = 8 // bit depth
    ihdr(9) = 2 // color type: truecolor RGB
    // bytes 10..12: compression 0, filter method 0, interlace 0
    chunk("IHDR", ihdr)
    // raw scanline stream: each row is a filter byte (0 = None) + RGB bytes
    val stride = width * 3
    val raw = new Array[Byte](height * (stride + 1))
    var y = 0
    while (y < height) {
      System.arraycopy(rgb, y * stride, raw, y * (stride + 1) + 1, stride)
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw)
    deflater.finish()
    val zout = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) zout.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    chunk("IDAT", zout.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    bos.toByteArray
  }

  /** Decode an 8-bit truecolor (color type 2, non-interlaced) PNG: chunk
    * walk (ancillary chunks skipped, multiple IDATs concatenated per spec,
    * every chunk's CRC32 validated per spec §5.3), zlib inflate via
    * `java.util.zip.Inflater`, and FULL filter reconstruction — types 0-4
    * None/Sub/Up/Average/Paeth (PNG spec §9, Paeth predictor §9.4). Returns
    * None for malformed files (including CRC mismatches) and variants
    * outside this profile (palette, alpha, 16-bit, interlaced) so callers
    * can fall back. */
  def decodePng(bytes: Array[Byte]): Option[DecodedImage] = {
    if (bytes.length < PngSig.length + 12) return None
    var i = 0
    while (i < PngSig.length) {
      if (bytes(i) != PngSig(i)) return None
      i += 1
    }
    var pos = PngSig.length
    var width = 0
    var height = 0
    var seenIhdr = false
    var ended = false
    val idat = new java.io.ByteArrayOutputStream()
    while (!ended && pos + 8 <= bytes.length) {
      val len = be32(bytes, pos)
      // Long arithmetic: a corrupt length near Int.MaxValue would wrap the
      // chunk-end bound negative and walk out of the array
      if (len < 0 || pos.toLong + 12 + len > bytes.length) return None
      val tag = new String(bytes, pos + 4, 4, "US-ASCII")
      val body = pos + 8
      // CRC validation (PNG spec §5.3: CRC32 over tag + body) — a chunk
      // whose stored CRC disagrees means the file is corrupt; fall back
      val crc = new java.util.zip.CRC32()
      crc.update(bytes, pos + 4, 4 + len)
      if (crc.getValue.toInt != be32(bytes, body + len)) return None
      tag match {
        case "IHDR" =>
          if (len != 13) return None
          width = be32(bytes, body)
          height = be32(bytes, body + 4)
          val bitDepth = bytes(body + 8)
          val colorType = bytes(body + 9)
          val interlace = bytes(body + 12)
          if (bitDepth != 8 || colorType != 2 || interlace != 0) return None
          if (width <= 0 || height <= 0) return None
          if (width.toLong * height * 3 + height > Int.MaxValue) return None
          seenIhdr = true
        case "IDAT" => idat.write(bytes, body, len)
        case "IEND" => ended = true
        case _ => // ancillary chunk (tEXt, pHYs, tIME, ...) — skip
      }
      pos = body + len + 4 // body + CRC
    }
    if (!seenIhdr || idat.size() == 0) return None
    val stride = width * 3
    val rawLen = height * (stride + 1)
    val raw = new Array[Byte](rawLen)
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    try {
      var got = 0
      while (got < rawLen && !inf.finished()) {
        val n = inf.inflate(raw, got, rawLen - got)
        // n == 0 with output space remaining means the inflater is stuck:
        // truncated stream (needsInput) OR a preset-dictionary request
        // (FDICT, needsDictionary) — looping on either would hang the task
        if (n == 0) return None
        got += n
      }
      if (got < rawLen) return None
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inf.end()
    // per-row filter reconstruction; `out` is the already-reconstructed
    // raster, so the a/b/c predictors read final bytes (spec: Recon(x))
    val out = new Array[Byte](height * stride)
    val bpp = 3
    var y = 0
    while (y < height) {
      val ft = raw(y * (stride + 1)) & 0xff
      if (ft > 4) return None
      val src = y * (stride + 1) + 1
      val dst = y * stride
      var x = 0
      while (x < stride) {
        val v = raw(src + x) & 0xff
        val a = if (x >= bpp) out(dst + x - bpp) & 0xff else 0 // left
        val b = if (y > 0) out(dst - stride + x) & 0xff else 0 // up
        val c = if (x >= bpp && y > 0) out(dst - stride + x - bpp) & 0xff else 0 // up-left
        val rec = ft match {
          case 0 => v
          case 1 => v + a
          case 2 => v + b
          case 3 => v + ((a + b) >> 1)
          case _ => // 4: Paeth — nearest of a/b/c to p = a+b-c, ties a>b>c
            val p = a + b - c
            val pa = math.abs(p - a)
            val pb = math.abs(p - b)
            val pc = math.abs(p - c)
            v + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
        }
        out(dst + x) = rec.toByte
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
