package graft

import graft.operators.GraphOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraphOpsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("connectedComponents: chain, clique, and isolated self-loop resolve") {
    // components: {1,2,3,4} (chain), {10,11,12} (triangle), {99} (self-loop)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (12L, 10L), (99L, 99L)).toDF("src", "dst")
    val comps = GraphOps.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    assert(comps == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 99L -> 99L))
  }

  test("connectedComponents: pointer jumping resolves a 200-node chain in O(log d)") {
    // one-hop propagation would need 200 rounds; the doubling step must
    // finish inside the default 25-round bound (2^25 ≫ 200)
    val edges = (0L until 200L).map(i => (i, i + 1)).toDF("src", "dst")
    val comps = GraphOps.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    assert(comps.size == 201 && comps.values.forall(_ == 0L))
  }

  test("pageRank: ranks sum to ~1 on a dangling-free graph and order by in-degree") {
    // star into 0 plus a return edge from 0: node 0 must dominate. The
    // 0↔1 cycle converges by damped oscillation (error ~ d^k), so run
    // enough rounds that the remaining error is below the rank gap.
    val edges = (Seq((0L, 1L)) ++ (1L to 5L).map(i => (i, 0L))).toDF("src", "dst")
    val ranks = GraphOps.pageRank(edges, iterations = 50)
      .as[(Long, Double)].collect().toMap
    assert(math.abs(ranks.values.sum - 1.0) < 1e-9,
      s"rank mass not conserved: ${ranks.values.sum}")
    assert(ranks(0L) > ranks(1L) && ranks(1L) > ranks(2L),
      s"expected rank(0) > rank(1) > rank(others): $ranks")
  }
}
