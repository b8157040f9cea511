package graft.queries

/** DuckDB oracles for the multimodal pipelines — the mm06 planted-geometry
  * pattern (SparkEntry.mm06OracleSql) applied to resize (mm03), perceptual
  * hashing (mm04), and audio windowing (mm05).
  *
  * Every oracle recomputes the Spark result ARITHMETICALLY from the
  * documents table, never parsing a container byte: the payloads are
  * synthesized deterministically (Multimodal.makeImageRow /
  * attachAudioPayload — text bytes cycled into a w×h RGB raster inside a
  * real PNG/BMP container, into w×h gray palette indices inside a real
  * GIF89a, or big-endian PCM16 pairs inside a real WAV),
  * and the lossless decoders round-trip those bytes exactly. A hash match
  * therefore proves the real writers AND parsers both work — a codec
  * regression surfaces as a loud mismatch, not a silent pass.
  *
  * Assumes ASCII text (the corpus contract, [a-z0-9 ]): `unicode(char)`
  * equals the UTF-8 byte. A non-ASCII corpus drop would hash-mismatch
  * loudly rather than silently pass (the mm06 precedent). */
object MmOracle {

  /** mm03 resize audit: NN 16×16 grid over the planted raster. Source
    * index per output position k (row-major, 3 channels): y = k/48,
    * x = (k%48)/3, ch = k%3, src = ((y·h/16)·w + (x·w/16))·3 + ch, byte =
    * text[src mod len] (0 when len = 0 — the cycleBytes zeroed raster).
    * JPEG rows: geometry verified, pixel features NULL by the mm06
    * raster_sum contract (lossy entropy coding; pinned by the ImageIO
    * cross-validation spec instead). */
  val mm03Sql: String =
    """WITH m AS (
      |  SELECT doc_id,
      |         CASE CAST(doc_id % 4 AS INTEGER) WHEN 0 THEN 'png' WHEN 1 THEN 'bmp' WHEN 2 THEN 'jpeg' ELSE 'gif' END AS format,
      |         CAST(n_chars % 64 + 16 AS BIGINT) AS w,
      |         CAST(doc_id % 48 + 16 AS BIGINT) AS h,
      |         COALESCE(text, '') AS text,
      |         CAST(length(COALESCE(text, '')) AS BIGINT) AS len
      |  FROM documents
      |)
      |SELECT doc_id, format,
      |       CAST(16 AS BIGINT) AS out_w, CAST(16 AS BIGINT) AS out_h,
      |       CAST(768 AS BIGINT) AS n_bytes,
      |       CASE WHEN format = 'jpeg' THEN NULL
      |            WHEN len = 0 THEN 0
      |            -- gif plants w*h palette INDICES (gray triplets), so the
      |            -- source byte ignores the channel: idx = (sy*w + sx) mod len
      |            WHEN format = 'gif' THEN CAST(list_sum(list_transform(range(768),
      |                   k -> unicode(text[CAST(((((k // 48) * h // 16) * w + (((k % 48) // 3) * w // 16))) % len AS INTEGER) + 1]))) AS BIGINT)
      |            ELSE CAST(list_sum(list_transform(range(768),
      |                   k -> unicode(text[CAST(((((k // 48) * h // 16) * w + (((k % 48) // 3) * w // 16)) * 3 + k % 3) % len AS INTEGER) + 1]))) AS BIGINT)
      |       END AS resized_sum,
      |       CASE WHEN format = 'jpeg' THEN NULL WHEN len = 0 THEN 0
      |            ELSE CAST(unicode(text[1]) AS BIGINT) END AS corner_tl,
      |       CASE WHEN format = 'jpeg' THEN NULL WHEN len = 0 THEN 0
      |            WHEN format = 'gif' THEN CAST(unicode(text[CAST(((15 * h // 16) * w + (15 * w // 16)) % len AS INTEGER) + 1]) AS BIGINT)
      |            ELSE CAST(unicode(text[CAST((((15 * h // 16) * w + (15 * w // 16)) * 3 + 2) % len AS INTEGER) + 1]) AS BIGINT)
      |       END AS corner_br
      |FROM m""".stripMargin

  /** mm04 perceptual-hash near-dup: the WHOLE pipeline replayed — integer
    * aHash bits (64·s_cell > Σs, the channel-divisor-free form
    * Multimodal.perceptualHash computes), signed-64 hash assembly (bit 63
    * via the MIN_VALUE addend — DuckDB's << overflows at 63), the four
    * 16-bit chunk keys rebuilt from the bit list (no cross-engine shift
    * semantics in play), the pigeonhole candidate join, and the
    * (hamming asc, doc_b asc) best-match argmin. NOTE: FIRST(ORDER BY),
    * not MIN(ORDER BY) — DuckDB ignores ORDER BY inside order-insensitive
    * aggregates, silently returning min(doc_b). Dims/format derive from
    * n_chars (content), formats cycle over the lossless pair. */
  val mm04Sql: String = {
    def cell(ch: Int) =
      s"unicode(text[CAST((((((i // 8) * h // 8) * w + ((i % 8) * w // 8)) * 3 + $ch) % len) AS INTEGER) + 1])"
    s"""WITH m AS (
       |  SELECT doc_id,
       |         CAST(n_chars % 64 + 16 AS BIGINT) AS w,
       |         CAST(n_chars % 48 + 16 AS BIGINT) AS h,
       |         COALESCE(text, '') AS text,
       |         CAST(length(COALESCE(text, '')) AS BIGINT) AS len
       |  FROM documents
       |),
       |cells AS (
       |  SELECT doc_id,
       |    list_transform(range(64), i ->
       |      CASE WHEN len = 0 THEN 0
       |           ELSE ${cell(0)} + ${cell(1)} + ${cell(2)} END) AS s
       |  FROM m
       |),
       |bits AS (
       |  SELECT doc_id, list_transform(s, x -> CASE WHEN 64 * x > tot THEN 1 ELSE 0 END) AS b
       |  FROM (SELECT doc_id, s, CAST(list_sum(s) AS BIGINT) AS tot FROM cells)
       |),
       |ph AS (
       |  SELECT doc_id,
       |    CAST(list_sum(list_transform(range(63), i -> CAST(b[CAST(i AS INTEGER) + 1] AS BIGINT) * (1::BIGINT << CAST(i AS INTEGER)))) AS BIGINT)
       |      + CASE WHEN b[64] = 1 THEN (-9223372036854775807 - 1) ELSE 0 END AS phash,
       |    b
       |  FROM bits
       |),
       |ck AS (
       |  SELECT doc_id, phash, CAST(t.ci AS INTEGER) AS chunk,
       |    CAST(list_sum(list_transform(range(16), j -> CAST(b[16 * CAST(t.ci AS INTEGER) + CAST(j AS INTEGER) + 1] AS BIGINT) * (1::BIGINT << CAST(j AS INTEGER)))) AS BIGINT) AS ckey
       |  FROM ph, unnest([0, 1, 2, 3]) AS t(ci)
       |),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.phash AS ph_a, b.phash AS ph_b
       |  FROM ck a JOIN ck b ON a.chunk = b.chunk AND a.ckey = b.ckey AND a.doc_id <> b.doc_id
       |),
       |perdoc AS (
       |  SELECT doc_a AS doc_id, COUNT(*) AS n_candidates,
       |         FIRST(doc_b ORDER BY bit_count(xor(ph_a, ph_b)) ASC, doc_b ASC) AS best_match,
       |         MIN(CAST(bit_count(xor(ph_a, ph_b)) AS BIGINT)) AS best_hamming
       |  FROM pairs GROUP BY doc_a
       |)
       |SELECT p.doc_id, p.phash, COALESCE(d.n_candidates, 0) AS n_candidates,
       |       d.best_match, d.best_hamming
       |FROM ph p LEFT JOIN perdoc d ON p.doc_id = d.doc_id""".stripMargin
  }

  /** mm05 audio windows: PCM16 samples rebuilt from the text bytes
    * (big-endian pairs, sign via mod-2¹⁶ two's complement), windows of 64
    * at hop 32 while start+64 ≤ n, per-window RMS = sqrt(Σs²/64) (integer
    * sum, exact /64, correctly-rounded sqrt — IEEE-identical cross-engine)
    * and adjacent sign-change count. Docs shorter than 64 samples emit no
    * rows (generate_series with start > stop is empty). */
  val mm05Sql: String =
    """WITH m AS (SELECT doc_id, COALESCE(text, '') AS text FROM documents),
      |s AS (
      |  SELECT doc_id,
      |         list_transform(range(CAST(length(text) // 2 AS INTEGER)),
      |           i -> CAST(((unicode(text[2*i+1]) * 256 + unicode(text[2*i+2]) + 32768) % 65536 + 65536) % 65536 - 32768 AS BIGINT)) AS ss
      |  FROM m
      |),
      |w AS (
      |  SELECT doc_id, ss, CAST(t.v // 32 AS INTEGER) AS win_idx, CAST(t.v AS INTEGER) AS start
      |  FROM s, unnest(generate_series(0, CAST(len(ss) AS BIGINT) - 64, 32)) AS t(v)
      |)
      |SELECT doc_id, win_idx,
      |       sqrt(CAST(list_sum(list_transform(range(64), j -> ss[start + j + 1] * ss[start + j + 1])) AS DOUBLE) / 64.0) AS rms,
      |       CAST(len(list_filter(range(1, 64), j -> (ss[start + j + 1] >= 0) <> (ss[start + j] >= 0))) AS INTEGER) AS zero_crossings
      |FROM w""".stripMargin
}
