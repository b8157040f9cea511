package graft

import org.apache.spark.sql.types.{ArrayType, DataType, DecimalType, MapType, StructType}
import org.scalatest.funsuite.AnyFunSuite

/** Output-typing gate. The driver hash-compares TYPED values against the
  * DuckDB oracle, and shared SQL text can type-split across engines: Spark
  * parses `1000000.0` as DECIMAL(8,1) and its `floor` returns LONG, so a
  * `floor(x*1000000.0+0.5)/1000000.0` rounding lands as DECIMAL(30,9) while
  * DuckDB produces DOUBLE — identical values, different typed hash (the
  * q61/q62 round-4 lesson; see SURVEY §5). The repo convention is doubles +
  * exact-integer longs at the query boundary; DecimalType must never leak
  * into a hashed output. */
class TypingSpec extends AnyFunSuite {

  lazy val spark = GraftSession.builder("4").getOrCreate()
  private val sf = "/root/testdata/sf0.001"

  private def hasDecimal(dt: DataType): Boolean = dt match {
    case _: DecimalType => true
    case a: ArrayType => hasDecimal(a.elementType)
    case m: MapType => hasDecimal(m.keyType) || hasDecimal(m.valueType)
    case s: StructType => s.fields.exists(f => hasDecimal(f.dataType))
    case _ => false
  }

  test("no oracle-backed query emits DecimalType anywhere in its output schema") {
    // st* keys are skipped: building their frame EXECUTES the whole stream
    // (writeStream + awaitTermination) just to read a schema, their output
    // types mirror batch queries gated here, and the driver's per-round
    // hash check still covers them end to end
    val offenders = SparkEntry.oracleSql.keys.toSeq.sorted
      .filterNot(_.startsWith("st"))
      .flatMap { name =>
        SparkEntry.queries(name)(spark, sf).schema.fields.collect {
          case f if hasDecimal(f.dataType) => s"$name.${f.name}: ${f.dataType.sql}"
        }
      }
    assert(offenders.isEmpty,
      "decimal-typed output columns can never hash-match the DOUBLE-typed oracle:\n" +
        offenders.mkString("\n"))
  }
}
