package graft

import org.apache.spark.sql.SparkSession

/** One place for local SparkSession config shared by Verify, Bench, and the
  * test suites. Mirrors what a cluster deployment would set via spark-submit:
  * AQE on, UTC session time, shuffle parallelism sized to the machine. */
object GraftSession {
  def builder(cpus: String): SparkSession.Builder =
    SparkSession
      .builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // testdata parquet carries TIMESTAMP(NANOS); read as nano-longs and
      // let graft.queries.Tables restore TimestampType
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // testdata TIMESTAMP(MICROS) columns are written isAdjustedToUTC=false;
      // read them as TimestampType (session tz is UTC, so the instant is the
      // wall-clock — DuckDB's naive read of the same file agrees) instead of
      // TIMESTAMP_NTZ, keeping unix_micros()/pushdown on the scan column
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")

  def local(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
