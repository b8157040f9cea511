package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §2 for the operator inventory.
  * Query implementations live in graft.queries.*; this object only
  * aggregates the registries. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_prop_sum_basic")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    FlowQueries.queries ++ EsAggQueries.queries ++ RelationalQueries.queries ++
      TextQueries.queries ++ DedupQueries.queries ++ SimilarityQueries.queries ++
      IngestQueries.queries ++
      Map[String, (SparkSession, String) => DataFrame](
        "mm01_binary_pipeline" -> ((s, d) =>
          graft.operators.Multimodal.pipeline(Tables(s, d, "documents"))),
        "mm02_frame_sample" -> ((s, d) =>
          graft.operators.Multimodal.framePipeline(Tables(s, d, "documents"))),
        "mm03_resize_grid" -> ((s, d) =>
          graft.operators.Multimodal.resizePipeline(Tables(s, d, "documents"))),
        "mm04_phash_neardup" -> ((s, d) =>
          graft.operators.Multimodal.phashPairs(Tables(s, d, "documents"))),
        "mm05_audio_windows" -> ((s, d) =>
          graft.operators.Multimodal.audioPipeline(Tables(s, d, "documents"))))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get the weaker rows-only check. */
  def oracleSql: Map[String, String] =
    FlowQueries.oracleSql ++ EsAggQueries.oracleSql ++ RelationalQueries.oracleSql ++
      TextQueries.oracleSql ++ DedupQueries.oracleSql ++ SimilarityQueries.oracleSql ++
      IngestQueries.oracleSql
}
