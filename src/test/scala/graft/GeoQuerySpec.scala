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

  test("q133 geo_shape polygon: hits AND misses exist at ALL THREE SFs; page points replay the ray cast") {
    // the polygon: a notched rectangle (see EsAggQueries.geoPolyVertices)
    val verts = Seq(
      (-17800L, -8450L), (-17000L, -8450L), (-17000L, -8150L),
      (-17280L, -8150L), (-17400L, -8400L), (-17520L, -8150L), (-17800L, -8150L))
    def inside(px: Long, py: Long): Boolean = {
      var c = 0
      for (i <- verts.indices) {
        val (x1, y1) = verts(i)
        val (x2, y2) = verts((i + 1) % verts.length)
        if ((y1 > py) != (y2 > py)) {
          val lhs = (px - x1) * (y2 - y1)
          val rhs = (x2 - x1) * (py - y1)
          if (if (y2 > y1) lhs < rhs else lhs > rhs) c += 1
        }
      }
      c % 2 == 1
    }
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")) {
      val out = SparkEntry.queries("q133_geo_shape_polygon")(spark, dir).collect()
      assert(out.length == 20, s"$dir: expected a full page")
      out.foreach { r =>
        assert(inside(r.getAs[Long]("plon"), r.getAs[Long]("plat")),
          s"$dir: page point outside the polygon per the independent Scala ray cast")
      }
      val total = out.head.getAs[Long]("total")
      val n = queries.Tables(spark, dir, "events").count()
      assert(total > 20 && total < n, s"$dir: polygon filter not decisive: $total of $n")
    }
    // the notch matters: a point inside the rectangle but in the V-notch is OUT
    assert(!inside(-17400L, -8200L), "notch point must be outside (non-convexity exercised)")
    assert(inside(-17400L, -8430L), "below-notch point must be inside")
  }
}
