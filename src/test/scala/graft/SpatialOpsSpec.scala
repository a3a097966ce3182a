package graft

import graft.operators.SpatialOps
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class SpatialOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def pts(rows: (Long, Double, Double)*) =
    rows.toDF("id", "x", "y")

  test("gridDistanceJoin: boundary inclusive, cross-cell neighbors found, far pairs absent") {
    // radius 1: (0,0)-(1,0) sit in DIFFERENT cells at exact distance 1
    // (inclusive boundary through the neighbor probe); (0,0)-(0.5,0.5)
    // share a cell; (0,0)-(3,3) is far
    val q = pts((1L, 0.0, 0.0))
    val p = pts((10L, 1.0, 0.0), (11L, 0.5, 0.5), (12L, 3.0, 3.0))
    val got = SpatialOps.gridDistanceJoin(q, p, 1.0)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == Set((1L, 10L, 1.0), (1L, 11L, 0.5)))
  }

  test("gridDistanceJoin: each qualifying pair appears exactly once") {
    // a point diagonal-adjacent to the query's cell could be reached via
    // several probe cells if the point fanned out too — it must not
    val q = pts((1L, 1.9, 1.9))
    val p = pts((20L, 2.1, 2.1), (21L, 1.9, 1.9))
    val rows = SpatialOps.gridDistanceJoin(q, p, 2.0)
      .as[(Long, Long, Double)].collect().toList
    assert(rows.length == 2 && rows.map(_._2).toSet == Set(20L, 21L))
  }

  test("gridDistanceJoin: negative coordinates bucket by floor, not truncation") {
    // (-0.5,-0.5) lives in cell (-1,-1); integer truncation toward zero
    // would put it in (0,0) and still find it, so probe the pair that
    // ONLY works when both sides floor consistently: query at (-2.5, 0)
    // reaching across the -3/-2 cell line
    val q = pts((1L, -2.5, 0.0))
    val p = pts((30L, -3.4, 0.0), (31L, -1.6, 0.0), (32L, -4.0, 0.0))
    val got = SpatialOps.gridDistanceJoin(q, p, 1.0)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, d) => ((a, b), d) }.toMap
    assert(got.keySet == Set((1L, 30L), (1L, 31L)))
  }

  test("gridDistanceJoin: symmetric inputs give symmetric pairs incl. self-match") {
    val a = pts((1L, 0.0, 0.0), (2L, 0.25, 0.0))
    val got = SpatialOps.gridDistanceJoin(a, a, 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == Set((1L, 1L, 0.0), (2L, 2L, 0.0),
      (1L, 2L, 0.0625), (2L, 1L, 0.0625)))
  }

  test("gridDistanceJoin: rejects a non-positive radius") {
    val a = pts((1L, 0.0, 0.0))
    intercept[IllegalArgumentException] {
      SpatialOps.gridDistanceJoin(a, a, 0.0)
    }
  }
}
