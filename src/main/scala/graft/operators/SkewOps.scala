package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins: salt the hot side's key with a
  * deterministic fan-out and replicate the other side across every salt,
  * so one pathological key spreads over `salts` tasks instead of
  * serializing (and spilling) in one.
  *
  * When to reach for this instead of the built-ins, in order:
  *  1. `broadcast(dim)` — no shuffle at all; use whenever the small side
  *     fits an executor.
  *  2. AQE skew-join (`spark.sql.adaptive.skewJoin.enabled`, on by
  *     default) — splits oversized SHUFFLE PARTITIONS at runtime; covers
  *     sort-merge joins of two shuffled sides.
  *  3. Explicit salting (this operator) — for the cases AQE can't fix:
  *     a single join KEY too large for any one task regardless of
  *     partition splits feeding a downstream keyed op, a shuffled hash
  *     join the planner won't split, or engines/plans where runtime
  *     re-optimization is off (e.g. inside a streaming micro-batch,
  *     where AQE is unavailable).
  *
  * Result equals the unsalted inner equi-join exactly (oracle-checked):
  * every (skewed row, dim row) key match meets in exactly one salt
  * bucket, because the skewed row carries ONE salt and the dim row is
  * replicated to ALL salts.
  */
object SkewOps {

  /** Inner equi-join of `skewed` (large, possibly hot-keyed) against
    * `dim` (small-ish, but too big or too dynamic to broadcast) on
    * `keys`, spreading each key over `salts` shuffle groups.
    *
    * The salt must distribute rows of one hot key uniformly WITHOUT
    * depending on row order or partitioning: it hashes `saltCol` (any
    * column set that varies within a key — a row id, an offset, a
    * timestamp), never `rand()` (non-deterministic under task retry —
    * a retried task would re-draw salts and double/drop rows of an
    * at-least-once sink).
    *
    * Cost model: the dim side shuffles `salts ×` its size; the skewed
    * side shuffles once, unchanged. Pick `salts` ≈ (hot-key rows /
    * target task rows), small enough that `salts × |dim|` stays well
    * under the skewed side's volume.
    */
  def saltedJoin(skewed: DataFrame, dim: DataFrame, keys: Seq[String],
      saltCol: String, salts: Int): DataFrame = {
    require(salts > 0, s"salts must be positive: $salts")
    val salted = skewed.withColumn("_salt",
      pmod(xxhash64(col(saltCol)), lit(salts.toLong)).cast("int"))
    val replicated = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, keys :+ "_salt").drop("_salt")
  }
}
