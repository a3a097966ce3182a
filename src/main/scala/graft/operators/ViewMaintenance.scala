package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental maintenance of additive aggregate views from a snapshot
  * CDC diff (`WarehouseTable.tableDiff`): instead of re-aggregating the
  * whole table after every merge, apply the changeset to the previous
  * aggregate — counts move by ±1 and sums by ±value per added/removed
  * row. The materialized-view refresh pattern BigQuery/warehouses run
  * behind the scenes, expressed as a first-class operator.
  *
  * == 100 TB design ==
  *
  * Work scales with the CHANGESET, not the table: the diff is already
  * bounded to rewritten partitions, the delta aggregate map-side
  * combines to one row per touched group, and the merge with the prior
  * aggregate joins group keys only (AQE broadcasts the delta side when
  * it is small, which it is by construction). Re-aggregating 100 TB to
  * refresh a dashboard after a 1 GB merge is the thing this avoids.
  *
  * Only ADDITIVE aggregates (count, sum — and means derived from them)
  * can be maintained this way; min/max/distinct need their own
  * structures and should re-aggregate the touched groups instead.
  */
object ViewMaintenance {

  /** The additive aggregate this module maintains: one row per group,
    * `countCol` rows and `sumCol` of `valueCol`.
    */
  def aggregate(df: DataFrame, groupCols: Seq[String], valueCol: String,
      countCol: String = "n", sumCol: String = "total"): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as(countCol),
        sum(coalesce(col(valueCol), lit(0.0))).as(sumCol))

  /** Apply a `tableDiff` changeset (rows tagged `added`/`removed` in a
    * `change_type` column) to a previously-computed [[aggregate]].
    * Groups whose count reaches zero drop out; groups first seen in the
    * diff appear. The result equals re-running [[aggregate]] on the new
    * table state (up to float-addition order; round on output when
    * hash-comparing).
    */
  def applyDiff(agg: DataFrame, diff: DataFrame, groupCols: Seq[String],
      valueCol: String, countCol: String = "n",
      sumCol: String = "total"): DataFrame = {
    val sign = when(col("change_type") === "added", lit(1L)).otherwise(lit(-1L))
    val delta = diff.groupBy(groupCols.map(col): _*)
      .agg(sum(sign).as("__dn"),
        sum(sign.cast("double") * coalesce(col(valueCol), lit(0.0))).as("__ds"))
    agg.join(delta, groupCols, "full_outer")
      .select(groupCols.map(col) ++ Seq(
        (coalesce(col(countCol), lit(0L)) + coalesce(col("__dn"), lit(0L)))
          .as(countCol),
        (coalesce(col(sumCol), lit(0.0)) + coalesce(col("__ds"), lit(0.0)))
          .as(sumCol)): _*)
      .where(col(countCol) > 0)
  }

  /** Refresh a NON-additive aggregate view (min/max — anything where a
    * removed row cannot be subtracted back out) by re-aggregating ONLY
    * the groups the changeset touched: untouched groups keep their
    * previous view rows verbatim; touched groups recompute from the new
    * table state. Groups the diff deleted entirely drop out (the
    * recompute finds no rows); groups first seen in the diff appear.
    *
    * == 100 TB design ==
    *
    * The touched-group key set is diff-sized, so it broadcasts into
    * both the left-anti (keep untouched) and left-semi (bound the
    * rescan) joins — the old view is scanned once map-only, and the new
    * table's rescan is key-bounded: when the table clusters on the
    * group key, parquet row-group stats prune the scan to the touched
    * keys' files rather than the whole table. This is the documented
    * complement to [[applyDiff]], which handles the additive cases.
    */
  def refreshMinMax(oldAgg: DataFrame, newTable: DataFrame, diff: DataFrame,
      groupCols: Seq[String], valueCol: String,
      minCol: String = "vmin", maxCol: String = "vmax"): DataFrame = {
    val touched = diff.select(groupCols.map(col): _*).distinct()
    val untouched = oldAgg.join(touched, groupCols, "left_anti")
    val recomputed = newTable
      .join(touched, groupCols, "left_semi")
      .groupBy(groupCols.map(col): _*)
      .agg(min(col(valueCol)).as(minCol), max(col(valueCol)).as(maxCol))
    untouched.unionByName(recomputed)
  }

  /** Incrementally maintain an equi-JOIN view `V = A ⋈keys B` (bag
    * semantics) from BOTH tables' CDC diffs. The join is bilinear in
    * signed multiplicities, so the exact delta is three terms:
    * {{{ ΔV = ΔA ⋈ B_old  +  A_old ⋈ ΔB  +  ΔA ⋈ ΔB }}}
    * with `added = +1`, `removed = −1` and term weights multiplying —
    * the cross term corrects rows whose A and B sides changed in the
    * same cycle. The net per-row weight folds into the view's
    * multiplicities; rows reaching zero drop out.
    *
    * Refresh work scales with the CHANGESETS: every term joins at least
    * one delta side, which AQE broadcasts (diffs are partition-bounded
    * by construction), so neither old table is ever shuffled — each is
    * scanned once map-only, and at 100 TB that scan is itself prunable
    * to the diff's join-key partitions when the table clusters on the
    * key. Both inputs must pre-project to `keys` + payload columns with
    * names disjoint across A and B; diffs carry `change_type`.
    */
  def applyJoinDiff(view: DataFrame, aDiff: DataFrame, bDiff: DataFrame,
      aOld: DataFrame, bOld: DataFrame, keys: Seq[String]): DataFrame = {
    val w = when(col("change_type") === "added", lit(1L)).otherwise(lit(-1L))
    val aD = aDiff.withColumn("__wa", w).drop("change_type")
    val bD = bDiff.withColumn("__wb", w).drop("change_type")
    val terms =
      aD.join(bOld.withColumn("__wb", lit(1L)), keys)
        .unionByName(aOld.withColumn("__wa", lit(1L)).join(bD, keys))
        .unionByName(aD.join(bD, keys))
    val viewCols = view.columns.toSeq
    val net = terms
      .withColumn("__dw", col("__wa") * col("__wb"))
      .groupBy(viewCols.map(col): _*).agg(sum(col("__dw")).as("__dw"))
    val cur = view.groupBy(viewCols.map(col): _*).agg(count(lit(1)).as("__n"))
    cur.join(net, viewCols, "full_outer")
      .withColumn("__m",
        coalesce(col("__n"), lit(0L)) + coalesce(col("__dw"), lit(0L)))
      .where(col("__m") > 0)
      .withColumn("__i", explode(sequence(lit(1L), col("__m"))))
      .select(viewCols.map(col): _*)
  }

  /** Per-stratum HLL sketches of a column's distinct values — the
    * RE-AGGREGATABLE distinct-count state ([[ViewMaintenance]]'s header
    * says additive-only; sketches are how distinct joins the club). A
    * refresh appends new strata sketches without touching old ones, and
    * any rollup (per-day → per-month → global) unions the binary
    * sketches instead of re-scanning data: distinct-count maintenance
    * whose refresh cost scales with the CHANGESET, the thing an exact
    * `count(DISTINCT)` over 100 TB cannot do. Datasketches HLL keeps
    * exact counts until the coupon list fills (hundreds of values at
    * the default lgK), so low-cardinality strata estimates are exact —
    * which is what lets an oracle pin this path with exact SQL.
    */
  def distinctSketches(df: DataFrame, strataCols: Seq[String],
      valueCol: String): DataFrame =
    df.groupBy(strataCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol)).as("sketch"))

  /** Roll stratum sketches up to per-`keyCols` distinct-count estimates
    * by unioning the binary sketch states (one partial-aggregated
    * exchange of sketch bytes — no raw values move).
    */
  def mergeDistinct(sketches: DataFrame, keyCols: Seq[String],
      outCol: String = "n_distinct"): DataFrame =
    sketches.groupBy(keyCols.map(col): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col("sketch"))).as(outCol))

  /** Incrementally refresh a per-group TOP-K view under APPEND-ONLY
    * changes: because top-k is monotone under insertion,
    * `topk(A ∪ B) = topk(topk(A) ∪ B)` — so the refresh unions the
    * standing k·groups rows with just the appended batch and re-ranks,
    * never touching the base table. Rank is `(valueCol desc, idCol
    * asc)` row_number, so ties are deterministic and the view is a
    * pure function of the table state. NOT valid under deletes (a
    * delete can promote a row the view already discarded — re-rank the
    * touched groups from base instead).
    *
    * == 100 TB design ==
    *
    * Refresh cost scales with `groups × k + |batch|`, not the table:
    * the union's window is a `row_number() <= k` pattern that Spark's
    * WindowGroupLimit rewrite turns into a map-side per-partition
    * top-k before the exchange, so the shuffle carries O(groups × k)
    * survivors from each side, not the batch's full width.
    */
  def refreshTopK(view: DataFrame, appended: DataFrame,
      groupCols: Seq[String], valueCol: String, idCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val keep = (groupCols :+ idCol :+ valueCol).map(col)
    val u = view.select(keep: _*).unionByName(appended.select(keep: _*))
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(valueCol).desc, col(idCol))
    u.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
  }
}
