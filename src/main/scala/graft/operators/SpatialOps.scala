package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Spatial (planar) distance joins without a cross join.
  *
  * The reference engine has no native spatial operator, but a distance
  * join is the 2-D analog of its range-scan/merge patterns
  * (reference: the partition-pruned merge in
  * kcbq-connector/src/main/java/com/wepay/kafka/connect/bigquery/MergeQueries.java:180 —
  * bound the candidate set by a cheap key before the exact predicate),
  * and any geo-tagged training corpus needs one. Spark-first shape:
  * quantize the plane into radius-sized grid cells, turn the distance
  * predicate into a cell equi-join plus an exact residual filter — the
  * same bin-then-refine plan [[TemporalOps.pointInInterval]] uses on
  * the time axis.
  */
object SpatialOps {

  /** All (query, point) pairs within euclidean `radius` (inclusive).
    *
    * Both inputs need columns `(id, x, y)`; output is
    * `(q_id, p_id, dist2)` with `dist2` the exact squared distance.
    *
    * Plan: each side is hashed into cells of side `radius`, so any pair
    * within `radius` lands in the same or an adjacent cell. The QUERY
    * side fans out 9× to its neighbor cells (queries are the small
    * side); the points side maps each row to its single home cell, so
    * every qualifying pair meets in exactly one (cell, cell) bucket —
    * no post-join dedup. The join is a plain hash equi-join on the
    * cell key: at 100 TB the points side shuffles once on cell (or
    * broadcasts the fanned-out queries), never pairs all-to-all, and
    * cell population bounds skew the same way time-bins do in the
    * range join.
    */
  def gridDistanceJoin(queries: DataFrame, points: DataFrame,
      radius: Double): DataFrame = {
    require(radius > 0, s"radius must be positive, got $radius")
    val r2 = radius * radius
    val q = queries
      .select(col("id").as("q_id"), col("x").as("qx"), col("y").as("qy"))
      .withColumn("dx", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("dy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select(col("q_id"), col("qx"), col("qy"),
        (floor(col("qx") / radius) + col("dx")).as("cx"),
        (floor(col("qy") / radius) + col("dy")).as("cy"))
    val p = points
      .select(col("id").as("p_id"), col("x").as("px"), col("y").as("py"),
        floor(col("px") / radius).as("cx"),
        floor(col("py") / radius).as("cy"))
    val d2 = (col("qx") - col("px")) * (col("qx") - col("px")) +
      (col("qy") - col("py")) * (col("qy") - col("py"))
    q.join(p, Seq("cx", "cy"))
      .where(d2 <= r2)
      .select(col("q_id"), col("p_id"), d2.as("dist2"))
  }
}
