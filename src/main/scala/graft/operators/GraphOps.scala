package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph computation on DataFrames — the engine's bulk-
  * synchronous loop pattern (each iteration is a join + partial-agg
  * shuffle; lineage is truncated between iterations so the plan does
  * not grow with the iteration count).
  */
object GraphOps {

  /** Simple PageRank (no dangling-mass redistribution): `iterations`
    * rounds of `rank'(v) = (1-d)/N + d * Σ rank(u)/outdeg(u)` over
    * `edges(src, dst)` (deduplicated here). Returns `(id, rank)`.
    *
    * == 100 TB design ==
    *
    * Per iteration: one hash join of edges⋈ranks on src (both sides
    * hash-partitioned on the same key, so successive iterations reuse
    * the edge shuffle under AQE exchange reuse), one partial-aggregated
    * shuffle of (dst, contrib) scalars — edge payloads never travel
    * further than their own partition. Ranks are localCheckpoint'd
    * each round: without it the plan doubles per iteration and the
    * scheduler re-executes the whole history (same trade-off as
    * d6/d10 — documented, swap for reliable checkpoint on a cluster
    * with a checkpoint dir).
    */
  def pageRank(edges: DataFrame, iterations: Int,
      damping: Double = 0.85): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct().cache()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct().cache()
    val n = nodes.count().toDouble
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val teleport = (1.0 - damping) / n
    var ranks = nodes.select(col("id"), lit(1.0 / n).as("rank"))
    (1 to iterations).foreach { i =>
      val prev = ranks
      val contribs = e
        .join(ranks, e("src") === ranks("id"))
        .join(outDeg, "src")
        .select(col("dst").as("id"), (col("rank") / col("deg")).as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("contrib"))
      ranks = nodes.join(contribs, Seq("id"), "left")
        .select(col("id"),
          (lit(teleport) + lit(damping) * coalesce(col("contrib"), lit(0.0)))
            .as("rank"))
        .localCheckpoint(true)
      // the new checkpoint is eager, so the previous round's blocks are
      // dead the moment it returns — free them through the RDD handle
      // (Dataset.unpersist on a checkpointed Dataset is a silent no-op:
      // the persist lives on the RDD, not in the CacheManager, so the
      // old form leaked one MEMORY_AND_DISK generation per round until
      // ContextCleaner GC; GraftCache doc)
      graft.util.GraftCache.releaseCheckpointOf(prev)
    }
    // the final checkpoint no longer reads the cached inputs either
    e.unpersist(); nodes.unpersist()
    ranks
  }

  /** Weighted PageRank: rank flows along edges in proportion to edge
    * weight — `rank'(v) = (1-d)/N + d · Σ_u w(u,v)/W(u) · rank(u)` with
    * `W(u)` the source's total out-weight — the citation-strength /
    * click-count variant of [[pageRank]] (uniform weights reduce to
    * it, spec-pinned). Parallel edges must be pre-aggregated to one
    * `(src, dst, weight)` row; weights must be positive.
    *
    * == 100 TB design ==
    *
    * Identical per-iteration shape to [[pageRank]]: edges⋈ranks hash
    * join (plus the (src, W) scalar join), one (dst, contrib)
    * partial-agg shuffle, localCheckpoint lineage truncation per
    * round. The weight column rides the edge relation it already
    * lives in — nothing extra crosses an exchange.
    */
  def weightedPageRank(edges: DataFrame, iterations: Int,
      damping: Double = 0.85): DataFrame = {
    val e = edges.select(col("src"), col("dst"),
      col("weight").cast("double").as("w")).cache()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct().cache()
    val n = nodes.count().toDouble
    val outW = e.groupBy(col("src")).agg(sum(col("w")).as("wout"))
    val teleport = (1.0 - damping) / n
    var ranks = nodes.select(col("id"), lit(1.0 / n).as("rank"))
    (1 to iterations).foreach { i =>
      val prev = ranks
      val contribs = e
        .join(ranks, e("src") === ranks("id"))
        .join(outW, "src")
        .select(col("dst").as("id"),
          (col("rank") * col("w") / col("wout")).as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("contrib"))
      ranks = nodes.join(contribs, Seq("id"), "left")
        .select(col("id"),
          (lit(teleport) + lit(damping) * coalesce(col("contrib"), lit(0.0)))
            .as("rank"))
        .localCheckpoint(true)
      graft.util.GraftCache.releaseCheckpointOf(prev) // no-op at i=1 (plain plan)
    }
    e.unpersist(); nodes.unpersist()
    ranks
  }

  /** Personalized PageRank (random walk with restart): like
    * [[pageRank]], but the teleport mass returns to the `seeds` set
    * instead of spreading uniformly —
    * `rank'(v) = (1-d)·s(v) + d · Σ rank(u)/outdeg(u)` with
    * `s(v) = 1/|S|` for seed nodes and 0 elsewhere, started from
    * `rank₀ = s`. The result concentrates probability around the
    * seeds: the standard primitive for seed-expansion (finding the
    * neighborhood of known-good users/documents) and graph-local
    * recommendations. Returns `(id, rank)`.
    *
    * == 100 TB design ==
    *
    * Identical per-iteration shape to [[pageRank]] (edges⋈ranks hash
    * join + a (dst, contrib) partial-agg shuffle; localCheckpoint
    * truncates lineage each round). The seed membership is one extra
    * broadcast hash join per round against the seed frame — seeds are
    * small by this operator's contract (a query/probe set, not a
    * corpus), so the teleport term never shuffles anything.
    */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame,
      iterations: Int, damping: Double = 0.85): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct().cache()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct().cache()
    val s = seeds.select(col("id")).distinct()
      .join(nodes, "id").cache() // seeds outside the graph carry no mass
    val nSeeds = s.count().toDouble
    require(nSeeds > 0, "personalizedPageRank needs at least one seed in the graph")
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // teleport vector: 1/|S| on seeds, 0 elsewhere (broadcast membership)
    val tele = nodes.join(broadcast(s.withColumn("__seed", lit(1))), Seq("id"), "left")
      .select(col("id"),
        when(col("__seed").isNotNull, lit(1.0 / nSeeds))
          .otherwise(lit(0.0)).as("t"))
      .localCheckpoint(true)
    var ranks = tele.select(col("id"), col("t").as("rank"))
    (1 to iterations).foreach { i =>
      val prev = ranks
      val contribs = e
        .join(ranks, e("src") === ranks("id"))
        .join(outDeg, "src")
        .select(col("dst").as("id"), (col("rank") / col("deg")).as("c"))
        .groupBy(col("id")).agg(sum(col("c")).as("contrib"))
      ranks = tele.join(contribs, Seq("id"), "left")
        .select(col("id"),
          (lit(1.0 - damping) * col("t") +
            lit(damping) * coalesce(col("contrib"), lit(0.0))).as("rank"))
        .localCheckpoint(true)
      graft.util.GraftCache.releaseCheckpointOf(prev) // no-op at i=1 (tele projection)
    }
    e.unpersist(); nodes.unpersist(); s.unpersist()
    // the tele checkpoint's blocks only die by RDD-handle release; with
    // zero iterations the RETURNED ranks still reads tele (checkpoints
    // cannot recompute), so only release once an iteration checkpoint
    // has superseded it
    if (iterations >= 1) graft.util.GraftCache.releaseCheckpointOf(tele)
    ranks
  }

  /** Connected components by min-label propagation WITH pointer jumping
    * over the UNDIRECTED closure of `edges(src, dst)`: every node's
    * component id converges to the smallest reachable node id. Each
    * round first pulls the min label one hop across edges, then
    * flattens labels through themselves (`comp := comp(comp)`), so
    * propagation distance DOUBLES per round — O(log diameter) rounds
    * instead of O(diameter), the property that makes a 31-node chain
    * (or a 2^25-node one) converge inside the default bound. Throws if
    * the bound is hit without a fixpoint rather than returning silently
    * wrong labels. Returns `(id, comp)`.
    *
    * Scale: each round is one edges⋈labels hash join, a min-combine
    * shuffle of (id, comp) scalars, and one labels self-join — edge
    * payloads never travel beyond their partition; labels are
    * localCheckpoint'd so the plan stays one round deep.
    */
  def connectedComponents(edges: DataFrame, maxIterations: Int = 25): DataFrame = {
    // self-loops fold the keep-own-label branch into the edge pull, so
    // the loop body has no union of two frames sharing lineage
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .union(edges.select(col("src"), col("src").as("dst")))
      .union(edges.select(col("dst").as("src"), col("dst")))
      .distinct().localCheckpoint(true)
    var labels = sym.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("comp"))
      .localCheckpoint(true)
    var converged = false
    var i = 0
    while (!converged && i < maxIterations) {
      val pulled = sym.join(labels, sym("src") === labels("id"))
        .select(col("dst").as("id"), col("comp"))
        .groupBy(col("id")).agg(min(col("comp")).as("comp"))
        .localCheckpoint(true)
      // pointer jump: follow the label's own label (comp is always a
      // node id, so the lookup join always hits)
      val next = pulled.as("p").join(pulled.as("c"), col("p.comp") === col("c.id"))
        .select(col("p.id").as("id"), least(col("p.comp"), col("c.comp")).as("comp"))
        .localCheckpoint(true)
      val changed = next.as("n")
        .join(labels.as("l"), col("n.id") === col("l.id"))
        .where(col("n.comp") =!= col("l.comp")).count()
      // `changed` was the last reader of the previous labels generation,
      // and `next`'s eager build was `pulled`'s — free both rounds'
      // intermediates now (RDD-handle release; GraftCache doc)
      graft.util.GraftCache.releaseCheckpointOf(labels)
      graft.util.GraftCache.releaseCheckpointOf(pulled)
      labels = next
      converged = changed == 0
      i += 1
    }
    require(converged,
      s"connectedComponents did not converge in $maxIterations rounds")
    // the returned labels is the final round's checkpoint — sym is dead
    graft.util.GraftCache.releaseCheckpointOf(sym)
    labels
  }

  /** Synchronous label propagation (Raghavan et al. 2007) for community
    * detection: every node starts labeled with its own id; each round,
    * every node adopts the MOST FREQUENT label among its undirected
    * neighbors (ties → smallest label; isolated nodes keep their own).
    * A fixed `rounds` count with synchronous updates keeps the result
    * deterministic and lets a SQL oracle unroll the identical rounds —
    * the classic async/random-order LPA trades that for convergence
    * speed, which a verification oracle cannot replay.
    *
    * Distinct from [[connectedComponents]] (min-label): mode-label
    * propagation splits a connected graph into densely-linked
    * communities instead of collapsing it to one component per
    * reachable set. Returns `(id, label)`.
    *
    * == 100 TB design ==
    *
    * Per round: one edges⋈labels hash join, then a two-stage scalar
    * aggregation — count per (node, label), max-by per node — both
    * partial-aggregated; only `(id, label, cnt)` scalars cross the
    * exchanges, and labels are localCheckpoint'd so the plan stays one
    * round deep (same discipline as [[pageRank]]).
    */
  def labelPropagation(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds > 0, s"rounds must be positive: $rounds")
    val fwd = edges.select(col("src"), col("dst"))
      .where(col("src") =!= col("dst"))
    val sym = fwd
      .union(fwd.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().localCheckpoint(true)
    val nodes = sym.select(col("src").as("id")).distinct()
      .localCheckpoint(true)
    var labels = nodes.select(col("id"), col("id").as("label"))
    (1 to rounds).foreach { _ =>
      val prev = labels
      // most frequent neighbor label; first-occurrence tie-break =
      // (cnt desc, label asc) — mirrored in the oracle's row_number
      val counts = sym.join(labels, sym("src") === labels("id"))
        .groupBy(col("dst").as("nid"), col("label"))
        .agg(count(lit(1)).as("cnt"))
      val top = counts.groupBy(col("nid"))
        .agg(min_by(col("label"),
          struct((-col("cnt")).as("nc"), col("label"))).as("nlabel"))
      labels = nodes.join(top, nodes("id") === top("nid"), "left")
        .select(nodes("id"), coalesce(col("nlabel"), nodes("id")).as("label"))
        .localCheckpoint(true)
      graft.util.GraftCache.releaseCheckpointOf(prev) // no-op at round 1
    }
    // rounds >= 1, so the returned labels is a checkpoint and reads
    // neither sym nor nodes — free both (RDD-handle release)
    graft.util.GraftCache.releaseCheckpointOf(sym)
    graft.util.GraftCache.releaseCheckpointOf(nodes)
    labels
  }

  /** Per-node triangle count over the undirected simple graph induced
    * by `edges(src, dst)` (self-loops dropped, direction ignored).
    * Returns `(id, triangles)` for every node in at least one triangle.
    *
    * Each undirected edge is oriented from its lower-degree endpoint to
    * its higher-degree endpoint (ties by id), so every triangle is
    * enumerated exactly once from its lowest-degree corner. That is the
    * standard skew bound: a celebrity node with degree D contributes
    * O(D) *incoming* oriented edges but almost no outgoing wedges, so
    * the wedge join does Σ outdeg² ≤ O(m^1.5) work instead of the
    * O(D²) hot-key blowup an id-only orientation hits when the high-id
    * node is the hub. The triangle set itself is orientation-invariant,
    * which is what makes the count oracle-checkable against a plain
    * id-oriented SQL enumeration.
    */
  /** Adamic-Adar link prediction (Adamic & Adar 2003): for every
    * NON-adjacent node pair sharing at least one common neighbor,
    * `AA(a,b) = Σ_n 1/ln(deg(n))` over the common neighbors n — the
    * classic "rare shared friends count more" score, still the standard
    * baseline for link prediction. Returns `(a, b, common, aa_score)`
    * with `a < b`.
    *
    * == 100 TB design ==
    *
    * Candidate pairs come from WEDGE enumeration — the neighbor list of
    * each common-neighbor candidate self-joined on the center — never
    * from an all-pairs product. `maxDegree` excludes hub centers from
    * wedge generation (the standard mitigation: a 10M-degree hub would
    * emit 10¹⁴ wedges, and its `1/ln(deg)` weight is negligible by
    * construction), bounding the work at O(nodes × maxDegree²) with
    * only (center, leaf) scalar pairs crossing the exchanges. The
    * already-adjacent filter is a left-anti hash join on the symmetric
    * edge relation. A common neighbor is adjacent to both endpoints,
    * so its degree is ≥ 2 and the `ln` is never zero.
    */
  def adamicAdar(edges: DataFrame, maxDegree: Int = 10000): DataFrame = {
    require(maxDegree >= 2, s"maxDegree must be >= 2: $maxDegree")
    val e0 = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
      .where(col("src") =!= col("dst"))
    val sym = e0.unionByName(e0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    val deg = sym.groupBy(col("src").as("n")).agg(count(lit(1)).as("deg"))
    val centers = sym.join(deg.where(col("deg") <= maxDegree),
        sym("src") === col("n"))
      .select(col("n"), col("dst").as("leaf"), col("deg"))
    val wedges = centers.as("x").join(centers.as("y"), "n")
      .where(col("x.leaf") < col("y.leaf"))
      .select(col("x.leaf").as("a"), col("y.leaf").as("b"),
        col("x.deg").as("deg"))
    wedges
      .join(sym.select(col("src").as("a"), col("dst").as("b")),
        Seq("a", "b"), "left_anti")
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("common"),
        round(sum(lit(1.0) / log(col("deg"))), 6).as("aa_score"))
  }

  def triangleCounts(edges: DataFrame): DataFrame = {
    val und = edges.select(col("src"), col("dst"))
      .where(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
    val deg = und.select(col("a").as("id")).union(und.select(col("b")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    // orient a→b iff (deg(a), a) < (deg(b), b)
    val oriented = und
      .join(deg.withColumnsRenamed(Map("id" -> "a", "deg" -> "da")), "a")
      .join(deg.withColumnsRenamed(Map("id" -> "b", "deg" -> "db")), "b")
      .select(
        when(col("da") < col("db") ||
            (col("da") === col("db") && col("a") < col("b")), col("a"))
          .otherwise(col("b")).as("src"),
        when(col("da") < col("db") ||
            (col("da") === col("db") && col("a") < col("b")), col("b"))
          .otherwise(col("a")).as("dst"))
      .localCheckpoint(true)
    // wedges from each low corner, closed by an edge between the tips
    val tri = oriented.as("e1")
      .join(oriented.as("e2"), col("e1.dst") === col("e2.src"))
      .join(oriented.as("e3"),
        col("e3.src") === col("e1.src") && col("e3.dst") === col("e2.dst"))
      .select(col("e1.src").as("x"), col("e1.dst").as("y"),
        col("e2.dst").as("z"))
    tri.select(col("x").as("id"))
      .union(tri.select(col("y")))
      .union(tri.select(col("z")))
      .groupBy(col("id")).agg(count(lit(1)).as("triangles"))
  }

  /** Local clustering coefficient (Watts & Strogatz 1998) per node:
    * `C(v) = triangles(v) / (deg(v) choose 2)` over the undirected
    * simple graph. Returns `(id, deg, triangles, wedges, coeff)` for
    * every node — `triangles` is 0 (not absent) for triangle-free
    * nodes, `wedges = deg·(deg-1)/2` is the closed form (both exact
    * longs), and `coeff` is NULL when `deg < 2` (the ratio is
    * undefined, not zero — a leaf is neither clustered nor
    * unclustered).
    *
    * == 100 TB design ==
    *
    * Triangle counts come from [[triangleCounts]]'s degree-oriented
    * wedge join (the O(m^1.5) skew bound — a hub never self-joins its
    * own adjacency), degrees from one partial-aggregated scan of the
    * deduplicated edge relation; the final assembly is a left join of
    * two (id, long) scalar relations. Nothing wider than two longs
    * crosses any exchange.
    */
  def clusteringCoefficient(edges: DataFrame): DataFrame = {
    val und = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .where(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
    val deg = und.select(col("a").as("id")).union(und.select(col("b")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    val tri = triangleCounts(und.select(col("a").as("src"), col("b").as("dst")))
    val wedges = (col("deg") * (col("deg") - 1) / 2).cast("long")
    deg.join(tri, Seq("id"), "left")
      .select(col("id"), col("deg"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        wedges.as("wedges"),
        when(col("deg") >= 2,
          round(coalesce(col("triangles"), lit(0L)) / wedges, 6)).as("coeff"))
  }

  /** Neighbor-set Jaccard link prediction: for every NON-adjacent pair
    * sharing at least one common neighbor,
    * `J(a,b) = |N(a)∩N(b)| / |N(a)∪N(b)|` with the union by
    * inclusion-exclusion `deg(a)+deg(b)-common` — the set-overlap
    * sibling of [[adamicAdar]] (same candidate generation, different
    * normalization: Jaccard penalizes hub endpoints, AA discounts hub
    * *witnesses*). Returns `(a, b, common, union_size, jaccard)` with
    * `a < b`; `common`/`union_size` are exact longs so the only float
    * is the final rounded division.
    *
    * == 100 TB design ==
    *
    * Identical wedge-enumeration shape to [[adamicAdar]]: candidates
    * come from each common-neighbor center's adjacency self-joined on
    * the center (never all-pairs), hub centers above `maxDegree` are
    * excluded from wedge generation (their wedge fan-out is quadratic
    * and a capped center changes `common` only for pairs whose sole
    * witnesses are hubs), adjacency is removed by a left-anti hash
    * join, and endpoint degrees re-join as (id, long) scalars after
    * the wedge aggregation — so the exchanges carry nothing wider than
    * three longs.
    */
  def jaccardLinkPred(edges: DataFrame, maxDegree: Int = 10000): DataFrame = {
    require(maxDegree >= 2, s"maxDegree must be >= 2: $maxDegree")
    val e0 = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
      .where(col("src") =!= col("dst"))
    val sym = e0.unionByName(e0.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    val deg = sym.groupBy(col("src").as("n")).agg(count(lit(1)).as("deg"))
    val centers = sym.join(deg.where(col("deg") <= maxDegree),
        sym("src") === col("n"))
      .select(col("n"), col("dst").as("leaf"))
    val common = centers.as("x").join(centers.as("y"), "n")
      .where(col("x.leaf") < col("y.leaf"))
      .select(col("x.leaf").as("a"), col("y.leaf").as("b"))
      .join(sym.select(col("src").as("a"), col("dst").as("b")),
        Seq("a", "b"), "left_anti")
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(deg.select(col("n").as("a"), col("deg").as("__da")), "a")
      .join(deg.select(col("n").as("b"), col("deg").as("__db")), "b")
      .select(col("a"), col("b"), col("common"),
        (col("__da") + col("__db") - col("common")).as("union_size"),
        round(col("common") /
          (col("__da") + col("__db") - col("common")), 6).as("jaccard"))
  }

  /** Minimum hop distance from a seed set by frontier BFS over the
    * UNDIRECTED closure of `edges(src, dst)`. Returns `(id, hops)` for
    * every node reachable from `seeds(id)`; unreachable nodes are
    * absent. Throws if the frontier is still non-empty after
    * `maxIterations` rounds.
    *
    * Scale: per round only the FRONTIER (nodes first reached last
    * round) joins against the edge list — settled nodes never
    * re-shuffle, so total work is O(Σ frontier-adjacent edges) = O(m)
    * across the whole run, versus O(m · diameter) for relax-everything
    * label propagation. The visited set grows monotonically and is
    * localCheckpoint'd so the anti-join reads a materialized relation,
    * not the whole loop history.
    */
  def shortestHops(edges: DataFrame, seeds: DataFrame,
      maxIterations: Int = 30): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .where(col("src") =!= col("dst"))
      .distinct().localCheckpoint(true)
    var visited = seeds.select(col("id")).distinct()
      .select(col("id"), lit(0L).as("hops"))
      .localCheckpoint(true)
    var frontier = visited
    var i = 0
    while (i < maxIterations && !frontier.isEmpty) {
      i += 1
      val prevFrontier = frontier
      val prevVisited = visited
      frontier = sym.join(frontier, sym("src") === frontier("id"))
        .select(col("dst").as("id"))
        .distinct()
        .join(visited.select(col("id")), Seq("id"), "left_anti")
        .select(col("id"), lit(i.toLong).as("hops"))
        .localCheckpoint(true)
      visited = visited.union(frontier).localCheckpoint(true)
      // this round's eager checkpoints were the last readers of the
      // previous generation — free it (at i=1 frontier aliases visited;
      // the `ne` guard keeps the release single)
      graft.util.GraftCache.releaseCheckpointOf(prevVisited)
      if (prevFrontier ne prevVisited)
        graft.util.GraftCache.releaseCheckpointOf(prevFrontier)
    }
    require(frontier.isEmpty,
      s"shortestHops frontier still active after $maxIterations rounds")
    // the returned visited is the latest checkpoint; sym (and the empty
    // final frontier, when the loop ran) are dead
    graft.util.GraftCache.releaseCheckpointOf(sym)
    if (frontier ne visited) graft.util.GraftCache.releaseCheckpointOf(frontier)
    visited
  }

  /** The k-core of the undirected simple graph induced by
    * `edges(src, dst)`: iteratively peel every node whose degree is
    * below `k` (removing a node lowers its neighbours' degrees, so the
    * peel repeats to fixpoint). Returns the surviving nodes with their
    * within-core degree, `(id, core_deg)` — the standard dense-cluster
    * / spam-ring extractor.
    *
    * == 100 TB design ==
    *
    * Each round: one partial-aggregated degree count ((id) scalars
    * only) and two anti-joins removing the peeled nodes — the low-id
    * frame is tiny (only nodes BELOW the threshold) and broadcasts, so
    * the edge set is never shuffled after its initial dedup; rounds
    * are O(peel depth), bounded by `maxIterations` with lineage
    * truncated per round like [[connectedComponents]].
    */
  def kCore(edges: DataFrame, k: Int, maxIterations: Int = 50): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    var und = edges.where(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct().localCheckpoint(true)
    var converged = false
    var i = 0
    while (!converged && i < maxIterations) {
      val prevUnd = und
      val deg = und.select(col("a").as("id")).union(und.select(col("b")))
        .groupBy(col("id")).agg(count(lit(1)).as("deg"))
      val low = deg.where(col("deg") < k).select(col("id"))
        .localCheckpoint(true)
      if (low.isEmpty) converged = true
      else {
        und = und
          .join(broadcast(low.withColumnRenamed("id", "a")), Seq("a"), "left_anti")
          .join(broadcast(low.withColumnRenamed("id", "b")), Seq("b"), "left_anti")
          .localCheckpoint(true)
        // the new edge generation's eager build was the last reader of
        // the previous one — free it (RDD-handle release; GraftCache doc)
        graft.util.GraftCache.releaseCheckpointOf(prevUnd)
      }
      // the peel set is consumed by the round that built it
      graft.util.GraftCache.releaseCheckpointOf(low)
      i += 1
    }
    require(converged, s"kCore did not converge in $maxIterations rounds")
    und.select(col("a").as("id")).union(und.select(col("b")))
      .groupBy(col("id")).agg(count(lit(1)).cast("int").as("core_deg"))
  }

  /** HITS hub/authority scores (Kleinberg): each round pulls authority
    * from in-neighbors' hubs, then hubs from out-neighbors' fresh
    * authorities, L2-normalizing after each half-step. Per round the
    * work is two edge joins + two key-grouped sums (partial-aggregated,
    * shuffle on node id scalars) and each normalizer is ONE global
    * aggregate — a broadcastable scalar at any graph size, same
    * per-iteration discipline as [[pageRank]]. Scores localCheckpoint
    * between rounds so the plan doesn't nest `iterations` deep.
    */
  def hits(edges: DataFrame, iterations: Int): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
      .where(col("src") =!= col("dst")).distinct().cache()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct().cache()
    var scores = nodes.select(col("id"), lit(1.0).as("hub"), lit(1.0).as("auth"))
    // divide one column by its own L2 norm — the 1-row aggregate is
    // attached via crossJoin(broadcast(...)) like every other global-
    // scalar attach in the codebase (never rely on AQE to discover it)
    def l2(df: DataFrame, c: String): DataFrame = {
      val others = df.columns.filterNot(_ == c)
      df.crossJoin(broadcast(df.agg(sqrt(sum(col(c) * col(c))).as("__n"))))
        .select(others.toIndexedSeq.map(col) :+ (col(c) / col("__n")).as(c): _*)
    }
    (1 to iterations).foreach { i =>
      val prev = scores
      val authRaw = e.join(scores.select(col("id"), col("hub")), e("src") === col("id"))
        .groupBy(col("dst")).agg(sum(col("hub")).as("auth"))
      val withAuth = nodes
        .join(authRaw.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .join(scores.select(col("id"), col("hub")), Seq("id"))
        .select(col("id"), col("hub"), coalesce(col("auth"), lit(0.0)).as("auth"))
      val authNormed = l2(withAuth, "auth")
      val hubRaw = e.join(authNormed.select(col("id"), col("auth")), e("dst") === col("id"))
        .groupBy(col("src")).agg(sum(col("auth")).as("hub"))
      val withHub = nodes
        .join(hubRaw.withColumnRenamed("src", "id"), Seq("id"), "left")
        .join(authNormed.select(col("id"), col("auth")), Seq("id"))
        .select(col("id"), coalesce(col("hub"), lit(0.0)).as("hub"), col("auth"))
      scores = l2(withHub, "hub").localCheckpoint(true)
      // eager checkpoint → the previous round's blocks are dead; free
      // them through the RDD handle (Dataset.unpersist is a no-op on
      // checkpointed Datasets — GraftCache doc)
      graft.util.GraftCache.releaseCheckpointOf(prev)
    }
    e.unpersist(); nodes.unpersist()
    scores
  }
}
