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
}
