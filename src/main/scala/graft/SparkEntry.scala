package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §2 for the operator inventory.
  * Query implementations live in graft.queries.*; this object aggregates
  * the registries (the multimodal entries are thin compositions of
  * graft.operators.Multimodal with the shared streaming scaffold). */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_prop_sum_basic")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    FlowQueries.queries ++ EsAggQueries.queries ++ RelationalQueries.queries ++
      TextQueries.queries ++ DedupQueries.queries ++ SimilarityQueries.queries ++
      IngestQueries.queries ++ DslQueries.queries ++
      Map[String, (SparkSession, String) => DataFrame](
        "mm01_binary_pipeline" -> ((s, d) =>
          graft.operators.Multimodal.pipeline(Tables(s, d, "documents"))),
        "mm02_frame_sample" -> ((s, d) =>
          graft.operators.Multimodal.framePipeline(Tables(s, d, "documents"))),
        "mm03_resize_grid" -> ((s, d) =>
          graft.operators.Multimodal.resizeAudit(Tables(s, d, "documents"))),
        "mm04_phash_neardup" -> ((s, d) =>
          graft.operators.Multimodal.phashPairs(Tables(s, d, "documents"))),
        "mm05_audio_windows" -> ((s, d) =>
          graft.operators.Multimodal.audioPipeline(Tables(s, d, "documents"))),
        "mm06_media_info" -> ((s, d) =>
          graft.operators.Multimodal.mediaInfo(Tables(s, d, "documents"))),
        // Multimodal decode AT INGEST — the streaming×multimodal cell:
        // arriving docs get their payload synthesized + STRICTLY decoded
        // mid-stream by mm06's exact map (stateless, no state store), and
        // the audited rows land in append mode. Shares mm06's arithmetic
        // oracle verbatim: a hash match proves streaming decode emits
        // row-identical audits to the batch pipeline.
        "st16_media_info_stream" -> ((s, d) =>
          TextQueries.streamToMemory(
            graft.operators.Multimodal.mediaInfo(TextQueries.docStream(s, d, "st16")),
            "st16_mem", "append")))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get the weaker rows-only check. */
  def oracleSql: Map[String, String] =
    FlowQueries.oracleSql ++ EsAggQueries.oracleSql ++ RelationalQueries.oracleSql ++
      TextQueries.oracleSql ++ DedupQueries.oracleSql ++ SimilarityQueries.oracleSql ++
      IngestQueries.oracleSql ++ DslQueries.oracleSql ++
      Map(
        // mm06: the oracle recomputes the PLANTED payload properties
        // arithmetically (geometry from (doc_id, n_chars), lossless raster
        // sum from the cycled text bytes) — it never parses a container, so
        // a hash match proves the Spark-side writers+parsers round-trip
        // them. See graft.operators.Multimodal.mediaInfo. st16 shares it
        // verbatim (streaming decode must be row-identical to batch).
        // mm03/mm04/mm05 (round 11) extend the same pattern to the resize
        // grid, the aHash near-dup pipeline, and the audio windower —
        // see graft.queries.MmOracle. Only mm01/mm02 (feature extraction
        // over full codec output, incl. lossy JPEG rasters) remain
        // rows-only, pinned by StreamingSpec's committed-feature-hash
        // regression lock (canonical SHA-256 of the full sf0.001 output;
        // regenerate via graft.tools.FeaturePin).
        "st16_media_info_stream" -> mm06OracleSql,
        "mm06_media_info" -> mm06OracleSql,
        "mm03_resize_grid" -> MmOracle.mm03Sql,
        "mm04_phash_neardup" -> MmOracle.mm04Sql,
        "mm05_audio_windows" -> MmOracle.mm05Sql)

  private val mm06OracleSql =
          """WITH m AS (
            |  SELECT doc_id,
            |         CASE CAST(doc_id % 4 AS INTEGER) WHEN 0 THEN 'png' WHEN 1 THEN 'bmp' WHEN 2 THEN 'jpeg' ELSE 'gif' END AS format,
            |         CAST(n_chars % 64 + 16 AS BIGINT) AS width,
            |         CAST(doc_id % 48 + 16 AS BIGINT) AS height,
            |         -- COALESCE mirrors the Scala null guard (cycleBytes of
            |         -- a NULL text is a zeroed raster, sum 0) so a NULL-text
            |         -- corpus can't produce a spurious mismatch
            |         COALESCE(text, '') AS text,
            |         CAST(length(COALESCE(text, '')) AS BIGINT) AS len
            |  FROM documents
            |),
            |b AS (
            |  -- GIF plants the text bytes as w*h palette INDICES (each
            |  -- decoding to a gray triplet), the other lossless containers
            |  -- as w*h*3 RGB bytes — n_cyc is the planted cycle length and
            |  -- the GIF raster sum is 3x its cycled-byte sum
            |  SELECT *, CASE WHEN format = 'gif' THEN width * height ELSE width * height * 3 END AS n_cyc,
            |         CAST(list_sum(list_transform(string_split(text, ''), c -> unicode(c))) AS BIGINT) AS tot
            |  FROM m
            |)
            |SELECT doc_id, format, width, height, width * height AS n_pixels,
            |       CASE WHEN format = 'jpeg' THEN NULL
            |            -- len = 0 mirrors cycleBytes' zeroed raster (sum 0)
            |            -- rather than dividing by zero on an empty text
            |            WHEN len = 0 THEN 0
            |            ELSE (CASE WHEN format = 'gif' THEN 3 ELSE 1 END) *
            |                 ((n_cyc // len) * tot +
            |                 CASE WHEN n_cyc % len = 0 THEN 0
            |                      ELSE CAST(list_sum(list_transform(string_split(substr(text, 1, CAST(n_cyc % len AS INTEGER)), ''), c -> unicode(c))) AS BIGINT) END)
            |       END AS raster_sum
            |FROM b""".stripMargin
}
