package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet loader for the driver-generated TPC-H-ish test schema.
  *
  * The generator writes TIMESTAMP(NANOS) columns, which Spark only reads as
  * nano-longs under `spark.sql.legacy.parquet.nanosAsLong` (set by
  * [[graft.GraftSession]]). This loader converts them back to TimestampType
  * (floor to micros — DuckDB's TIMESTAMP_NS→TIMESTAMP cast truncates the
  * same way, keeping both engines bit-identical). */
object Tables {

  private val tsCols: Map[String, Seq[String]] = Map(
    "events" -> Seq("ts"),
    "lineitem" -> Seq("l_shipdate"),
    "orders" -> Seq("o_orderdate"))

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val raw = spark.read.parquet(s"$sfDir/$name.parquet")
    tsCols.getOrElse(name, Nil).filter(raw.columns.contains).foldLeft(raw) { (df, c) =>
      if (df.schema(c).dataType == org.apache.spark.sql.types.LongType)
        df.withColumn(c, timestamp_micros(expr(s"`$c` DIV 1000")))
      else df
    }
  }
}
