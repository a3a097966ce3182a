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

  test("triangleCounts: counts per node, ignores direction/dupes/self-loops") {
    // K4 on {1,2,3,4} (4 triangles, each node in 3), plus a dangling
    // edge 4-5 and noise: a self-loop, a duplicate, and a reversed edge
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (2L, 2L), (1L, 2L), (3L, 1L)).toDF("src", "dst")
    val got = GraphOps.triangleCounts(edges)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangleCounts: hub-and-spoke has none; one closing edge makes one") {
    val star = (1L to 6L).map(i => (0L, i)).toDF("src", "dst")
    assert(GraphOps.triangleCounts(star).isEmpty)
    val closed = star.union(Seq((5L, 6L)).toDF("src", "dst"))
    val got = GraphOps.triangleCounts(closed).as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 1L, 5L -> 1L, 6L -> 1L))
  }

  test("shortestHops: multi-seed BFS takes the nearer seed; unreachable absent") {
    // path 0-1-2-3-4-5 with seeds {0, 5}: hops = min(dist to 0, dist
    // to 5); node 9 is in a separate component (unreachable)
    val edges = ((0L until 5L).map(i => (i, i + 1)) :+ (8L, 9L)).toDF("src", "dst")
    val seeds = Seq(0L, 5L).toDF("id")
    val got = GraphOps.shortestHops(edges, seeds)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L, 5L -> 0L))
  }

  test("shortestHops: isolated seed stays at 0; bound enforced") {
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val got = GraphOps.shortestHops(edges, Seq(7L).toDF("id"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(7L -> 0L))
    val chain = (0L until 6L).map(i => (i, i + 1)).toDF("src", "dst")
    intercept[IllegalArgumentException] {
      GraphOps.shortestHops(chain, Seq(0L).toDF("id"), maxIterations = 3)
    }
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

  test("personalizedPageRank: all-nodes seeding is uniform PageRank; seeds concentrate mass") {
    val edges = (Seq((0L, 1L)) ++ (1L to 5L).map(i => (i, 0L)) ++
      Seq((3L, 4L), (4L, 5L))).toDF("src", "dst")
    // identity: seeding EVERY node makes the teleport vector uniform
    // 1/N — personalized PageRank degenerates to plain PageRank
    // (association of (1-d)/N differs by one driver-vs-engine multiply,
    // so compare to 1e-12, not bit-exact)
    val all = edges.select($"src".as("id"))
      .union(edges.select($"dst".as("id"))).distinct()
    val ppr = GraphOps.personalizedPageRank(edges, all, iterations = 20)
      .as[(Long, Double)].collect().toMap
    val pr = GraphOps.pageRank(edges, iterations = 20)
      .as[(Long, Double)].collect().toMap
    assert(ppr.keySet == pr.keySet)
    ppr.foreach { case (id, r) =>
      assert(math.abs(r - pr(id)) < 1e-12, s"node $id: ppr $r != pr ${pr(id)}") }

    // personalization: seeding only node 3 must shift mass toward 3's
    // forward neighborhood (4, 5) relative to the uniform walk, and
    // mass stays conserved (this graph has no dangling nodes)
    val seeded = GraphOps.personalizedPageRank(edges,
      Seq(3L).toDF("id"), iterations = 50)
      .as[(Long, Double)].collect().toMap
    assert(math.abs(seeded.values.sum - 1.0) < 1e-9,
      s"rank mass not conserved: ${seeded.values.sum}")
    // 1-hop neighbor 4 gains over the uniform walk; 2-hop node 5 need
    // not (d²-discounted walk mass can sit under plain PageRank's
    // uniform teleport floor), but it must still beat off-path node 2
    assert(seeded(4L) > pr(4L),
      s"seed neighborhood not up-weighted: $seeded vs $pr")
    assert(seeded(5L) > seeded(2L),
      s"walk-reachable node should outrank off-path node: $seeded")
    assert(seeded(2L) < pr(2L),
      s"off-neighborhood node should lose mass: $seeded vs $pr")
    // seeds outside the graph are dropped; an empty effective seed set throws
    intercept[IllegalArgumentException](
      GraphOps.personalizedPageRank(edges, Seq(99L).toDF("id"), 2))
  }

  test("labelPropagation: bridged cliques split into communities, not components") {
    // two 4-cliques joined by one bridge edge: min-label components
    // collapse everything to one blob; mode-label propagation must
    // keep the cliques apart (hand-traced: A converges to label 1,
    // B to label 10 after 3 synchronous rounds)
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a < b) yield (a, b)
    val edges = (clique(Seq(1L, 2L, 3L, 4L)) ++
      clique(Seq(10L, 11L, 12L, 13L)) :+ (4L, 10L)).toDF("src", "dst")
    val labels = GraphOps.labelPropagation(edges, rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(Seq(1L, 2L, 3L, 4L).map(labels).toSet == Set(1L),
      s"clique A not converged to label 1: $labels")
    assert(Seq(10L, 11L, 12L, 13L).map(labels).toSet == Set(10L),
      s"clique B not converged to label 10: $labels")
    val comps = GraphOps.connectedComponents(edges)
      .as[(Long, Long)].collect().map(_._2).toSet
    assert(comps.size == 1, "sanity: the bridged graph is ONE component")
    // determinism across input row order
    val again = GraphOps.labelPropagation(edges.orderBy(rand(7)), rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(again == labels)
    intercept[IllegalArgumentException](GraphOps.labelPropagation(edges, 0))
  }

  test("kCore: random graphs match an in-memory peel") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val n = 8 + rnd.nextInt(5)
      val raw = Seq.fill(20)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val k = 2 + (trial % 2)
      var und = raw.filter(e => e._1 != e._2)
        .map(e => (e._1 min e._2, e._1 max e._2)).distinct
      var changed = true
      while (changed) {
        val deg = und.flatMap(e => Seq(e._1, e._2))
          .groupBy(identity).map { case (id, xs) => id -> xs.size }
        val low = deg.filter(_._2 < k).keySet
        changed = low.nonEmpty && und.nonEmpty
        und = und.filterNot(e => low(e._1) || low(e._2))
      }
      val expected = und.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).map { case (id, xs) => id -> xs.size }
      val got = GraphOps.kCore(raw.toDF("src", "dst"), k)
        .as[(Long, Int)].collect().toMap
      assert(got == expected, s"trial $trial k=$k edges=$raw")
    }
  }

  test("kCore: cascading peel — removing a pendant exposes the next node") {
    // triangle 1-2-3, chain 1-4-5: at k=2 the chain peels in TWO rounds
    // (5 first, then 4 whose degree only then drops below 2)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val core2 = GraphOps.kCore(edges, k = 2)
      .as[(Long, Int)].collect().toMap
    assert(core2 == Map(1L -> 2, 2L -> 2, 3L -> 2))
    // the triangle is not a 3-core
    assert(GraphOps.kCore(edges, k = 3).isEmpty)
    // duplicate/reversed/self-loop edges don't inflate degrees
    val noisy = edges.union(Seq((2L, 1L), (1L, 1L), (1L, 2L)).toDF("src", "dst"))
    assert(GraphOps.kCore(noisy, k = 2).as[(Long, Int)].collect().toMap ==
      Map(1L -> 2, 2L -> 2, 3L -> 2))
    intercept[IllegalArgumentException](GraphOps.kCore(edges, k = 0))
  }

  test("hits: star center gets top authority, its pointers get top hubs") {
    // 1,2,3 -> 0 and 0 -> 4: node 0 is the authority, 1/2/3 the hubs
    val edges = Seq((1L, 0L), (2L, 0L), (3L, 0L), (0L, 4L)).toDF("src", "dst")
    val s = GraphOps.hits(edges, iterations = 2)
      .select($"id", $"hub", $"auth").as[(Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val topAuth = s.maxBy(_._2._2)._1
    assert(topAuth == 0L, s"authority argmax should be the star center: $s")
    assert(s(1L) == s(2L) && s(2L) == s(3L), s"symmetric hubs must tie: $s")
    assert(s(1L)._1 > s(0L)._1, s"pointers outrank the center on hub: $s")
    // L2 norms are 1 after the final round
    val hubNorm = math.sqrt(s.values.map(v => v._1 * v._1).sum)
    val authNorm = math.sqrt(s.values.map(v => v._2 * v._2).sum)
    assert(math.abs(hubNorm - 1.0) < 1e-9 && math.abs(authNorm - 1.0) < 1e-9)
  }

  test("weightedPageRank: uniform weights reduce to pageRank; skew shifts mass") {
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (2L, 1L))
    val uw = GraphOps.weightedPageRank(
        edges.map { case (s, d) => (s, d, 1.0) }.toDF("src", "dst", "weight"),
        iterations = 6)
      .as[(Long, Double)].collect().toMap
    val plain = GraphOps.pageRank(edges.toDF("src", "dst"), iterations = 6)
      .as[(Long, Double)].collect().toMap
    uw.keys.foreach(k => assert(math.abs(uw(k) - plain(k)) < 1e-12,
      s"node $k: weighted-uniform ${uw(k)} != plain ${plain(k)}"))
    // tilt 1's out-weight heavily toward 2: node 2 must gain, 3 lose
    val tilted = GraphOps.weightedPageRank(
        Seq((1L, 2L, 9.0), (1L, 3L, 1.0), (2L, 3L, 1.0), (3L, 1L, 1.0),
          (2L, 1L, 1.0)).toDF("src", "dst", "weight"), iterations = 6)
      .as[(Long, Double)].collect().toMap
    assert(tilted(2L) > uw(2L) && tilted(3L) < uw(3L))
    // still a probability distribution on this dangling-free graph
    assert(math.abs(tilted.values.sum - 1.0) < 1e-9)
  }

  test("clusteringCoefficient: K4 closes, leaf undefined, wedge-only node zero") {
    // K4 on {1,2,3,4}: deg 3, 3 triangles, 3 wedges → coeff 1.0.
    // Node 5 hangs off 4 (deg 1 → coeff NULL). Node 6 bridges 5 and 7
    // with no closing edge: deg-2 center of one open wedge → coeff 0.
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L), (6L, 7L)).toDF("src", "dst")
    val got = GraphOps.clusteringCoefficient(edges)
      .as[(Long, Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(1L) == ((3L, 3L, 3L, Some(1.0))))
    assert(got(2L) == ((3L, 3L, 3L, Some(1.0))))
    assert(got(3L) == ((3L, 3L, 3L, Some(1.0))))
    // node 4: neighbors {1,2,3,5}, deg 4, 6 wedges, 3 closed
    assert(got(4L) == ((4L, 3L, 6L, Some(0.5))))
    assert(got(5L) == ((2L, 0L, 1L, Some(0.0))))
    assert(got(6L) == ((2L, 0L, 1L, Some(0.0))))
    assert(got(7L) == ((1L, 0L, 0L, None)))
    assert(got.size == 7)
  }

  test("jaccardLinkPred: hand-traced overlap, adjacency excluded, hub cap honored") {
    // 1-3, 2-3, 1-4, 2-4, 4-5. Non-adjacent (1,2): N(1)={3,4},
    // N(2)={3,4} → J = 2/2 = 1. (3,4): N(3)={1,2}, N(4)={1,2,5} →
    // common 2, union 3. (1,5)/(2,5): common {4}, union 2.
    val edges = Seq((1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val got = GraphOps.jaccardLinkPred(edges)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(got((1L, 2L)) == ((2L, 2L, 1.0)))
    assert(got((3L, 4L)) == ((2L, 3L, math.rint(2.0 / 3 * 1e6) / 1e6)))
    assert(got((1L, 5L)) == ((1L, 2L, 0.5)))
    assert(got((2L, 5L)) == ((1L, 2L, 0.5)))
    assert(got.size == 4)
    // maxDegree = 2 drops center 4 (deg 3): only center 3's (1,2) wedge
    // and centers 1/2's (3,4) wedges survive — union sizes keep FULL
    // degrees (the cap bounds candidate generation, not the sets)
    val capped = GraphOps.jaccardLinkPred(edges, maxDegree = 2)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(capped == Map(
      (1L, 2L) -> ((1L, 3L, math.rint(1.0 / 3 * 1e6) / 1e6)),
      (3L, 4L) -> ((2L, 3L, math.rint(2.0 / 3 * 1e6) / 1e6))))
  }

  test("adamicAdar: hand-traced wedges, adjacency excluded, hub cap honored") {
    // 1-3, 2-3 (center 3, deg 2); 1-4, 2-4 (center 4, deg 3); 4-5.
    // non-adjacent pairs: (1,2) via 3 and 4 → 1/ln2 + 1/ln3;
    // (1,5),(2,5) via 4 → 1/ln3; (3,4) are... 3-4 not adjacent, common {1,2}
    val edges = Seq((1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val got = GraphOps.adamicAdar(edges)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val w2 = 1.0 / math.log(2); val w3 = 1.0 / math.log(3)
    assert(got((1L, 2L)) == ((2L, r6(w2 + w3))))
    assert(got((1L, 5L)) == ((1L, r6(w3))))
    assert(got((2L, 5L)) == ((1L, r6(w3))))
    // 3 and 4 share neighbors {1, 2} (deg 2 each) and are not adjacent
    assert(got((3L, 4L)) == ((2L, r6(w2 + w2))))
    // no adjacent pair is ever scored, and 3-5 share no neighbor
    val adj = Set((1L, 3L), (2L, 3L), (1L, 4L), (2L, 4L), (4L, 5L))
    assert(got.keySet.intersect(adj).isEmpty)
    assert(got.size == 4)
    // maxDegree = 2 drops center 4 (deg 3): its wedges (1,5)/(2,5)
    // vanish and (1,2) keeps only center 3's contribution; centers 1
    // and 2 (deg 2) still emit the (3,4) wedge
    val capped = GraphOps.adamicAdar(edges, maxDegree = 2)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(capped == Map((1L, 2L) -> ((1L, r6(w2))), (3L, 4L) -> ((2L, r6(w2 + w2)))))
  }
}
