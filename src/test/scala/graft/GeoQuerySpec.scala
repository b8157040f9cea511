package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The geo QUERY forms (q128/q129) next to the q19 agg family: the filter
  * must be decisive in BOTH directions at the tested SF (hits exist, and
  * the predicate excludes events — the box/radius sit inside the region
  * the user_id-derived points actually occupy, which a fixed equator box
  * would not at small SFs). */
class GeoQuerySpec extends AnyFunSuite {

  lazy val spark = GraftSession.builder("4").getOrCreate()
  private val sf = "/root/testdata/sf0.001"

  test("q128 bounding box: page inside the box, total counts more than the page, misses exist") {
    val out = SparkEntry.queries("q128_geo_bounding_box")(spark, sf).collect()
    assert(out.length == 20)
    out.foreach { r =>
      val (lat, lon) = (r.getAs[Double]("lat"), r.getAs[Double]("lon"))
      assert(lat >= -85.0 && lat <= -82.0 && lon >= -180.0 && lon <= -172.0)
    }
    val total = out.head.getAs[Long]("total")
    val n = queries.Tables(spark, sf, "events").count()
    assert(total > 20, "hits.total never exceeds the page — pagination is vacuous")
    assert(total < n, s"every event is inside the box ($total of $n) — the filter is vacuous")
  }

  test("q129 distance query: page inside the radius, misses exist") {
    val out = SparkEntry.queries("q129_geo_distance_query")(spark, sf).collect()
    assert(out.length == 20)
    out.foreach(r => assert(r.getAs[Double]("dist") < 3.0))
    val total = out.head.getAs[Long]("total")
    val n = queries.Tables(spark, sf, "events").count()
    assert(total > 20 && total < n, s"distance filter not decisive: $total of $n")
  }
}
