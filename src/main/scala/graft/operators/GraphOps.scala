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
    (1 to iterations).foreach { _ =>
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
    }
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
      labels = next
      converged = changed == 0
      i += 1
    }
    require(converged,
      s"connectedComponents did not converge in $maxIterations rounds")
    labels
  }
}
