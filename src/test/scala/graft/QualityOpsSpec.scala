package graft

import graft.operators.QualityOps
import graft.operators.QualityOps.FkRelation
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class QualityOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("fkOrphans: orphan rows vs distinct keys, nulls skipped, clean relation zeroes") {
    val child = Seq(Some(1L), Some(1L), Some(2L), Some(9L), Some(9L),
      Some(9L), None).toDF("fk")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val got = QualityOps.fkOrphans(Seq(
      FkRelation("child->parent", child, "fk", parent, "pk"),
      FkRelation("parent->parent", parent, "pk", parent, "pk")))
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // 6 non-null child keys checked; key 9 is orphaned 3 times but is
    // ONE distinct orphan key; the null row is not counted at all
    assert(got("child->parent") == ((6L, 3L, 1L)))
    // a self-consistent relation reports explicit zeroes, not absence
    assert(got("parent->parent") == ((3L, 0L, 0L)))
  }

  test("fkOrphans: duplicate parent keys do not multiply child matches") {
    val child = Seq(5L, 6L).toDF("fk")
    val parent = Seq(5L, 5L, 5L).toDF("pk")
    val got = QualityOps.fkOrphans(Seq(
      FkRelation("r", child, "fk", parent, "pk")))
      .as[(String, Long, Long, Long)].collect().head
    // parent reduces to DISTINCT keys first: 2 checked, 1 orphan (6)
    assert(got == (("r", 2L, 1L, 1L)))
  }

  test("fkOrphans: string/UUID keys audit in native type (no silent cast-to-null)") {
    val child = Seq("u-1", "u-1", "u-9", "not-a-number").toDF("fk")
    val parent = Seq("u-1", "u-2").toDF("pk")
    val got = QualityOps.fkOrphans(Seq(
      FkRelation("r", child, "fk", parent, "pk")))
      .as[(String, Long, Long, Long)].collect().head
    // all 4 string keys are CHECKED; "u-9" and "not-a-number" orphan
    assert(got == (("r", 4L, 2L, 2L)))
  }

  test("fkOrphans: integral widths widen losslessly; incompatible types fail loud") {
    val childI = Seq(1, 2, 7).toDF("fk") // int child vs long parent
    val parentL = Seq(1L, 2L).toDF("pk")
    val got = QualityOps.fkOrphans(Seq(
      FkRelation("r", childI, "fk", parentL, "pk")))
      .as[(String, Long, Long, Long)].collect().head
    assert(got == (("r", 3L, 1L, 1L)))
    // string child vs long parent: a declaration error, not a silent skip
    val childS = Seq("1").toDF("fk")
    val e = intercept[IllegalArgumentException] {
      QualityOps.fkOrphans(Seq(FkRelation("bad", childS, "fk", parentL, "pk")))
    }
    assert(e.getMessage.contains("bad"))
  }
}
