package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The relational heart of the engine: upsert/delete MERGE semantics that
  * the reference encodes as generated BigQuery SQL
  * (`kcbq-connector/.../bigquery/MergeQueries.java:176-412`), re-expressed
  * as native Spark plans over a staged micro-batch.
  *
  * Staged-batch schema mirrors the reference's intermediate table
  * (`SchemaManager.java:622-672`):
  * {{{
  *   key:   STRUCT   (required — upsert identity, possibly multi-field)
  *   value: STRUCT   (null = tombstone / delete marker)
  *   i:     LONG     (per-batch iteration counter: total order within key)
  *   [partitionTime: TIMESTAMP, batchNumber: LONG]   (optional)
  * }}}
  * The destination table is flat: key fields ++ value fields as top-level
  * columns (what `MergeQueries` calls `dstTableName` with `_key` exploded).
  *
  * Scale notes (100 TB design intent):
  *  - `latestPerKey` uses `max_by` under `groupBy(key)` — a single shuffle
  *    with map-side partial aggregation, strictly better than a window sort
  *    (`row_number`) which cannot partially aggregate.
  *  - `upsertDelete` shuffles dest + deduped batch on the key. These
  *    frame-level operators are the merge *semantics*; against a real
  *    table, `graft.sources.WarehouseTable.merge` bounds the dest scan to
  *    the batch's day partitions plus bloom-filter key hits before
  *    applying the same join (mirror of the reference's `_PARTITIONTIME`
  *    decorator pruning, `MergeQueries.java:429-452`).
  *  - A micro-batch is usually small relative to dest: Spark's AQE will
  *    broadcast the deduped source side automatically; nothing hand-picked.
  */
object MergeOps {

  private def structFieldNames(df: DataFrame, colName: String): Seq[String] =
    df.schema(colName).dataType.asInstanceOf[StructType].fieldNames.toSeq

  /** Key-equality join condition between a flat dest (aliased `d`) and a
    * staged side (aliased `s`) carrying a `key` struct.
    */
  private def keyCond(keyFields: Seq[String]): Column =
    keyFields.map(f => col(s"d.$f") === col(s"s.key.$f")).reduce(_ && _)

  /** A1 — last-write-wins dedup: one row per key, greatest `i`.
    * Reference: `ARRAY_AGG(x ORDER BY i DESC LIMIT 1)[OFFSET(0)]`
    * (`MergeQueries.java:216-226`). `i` is unique within a batch (it is a
    * monotonic counter), so `max_by` is deterministic.
    */
  def latestPerKey(staged: DataFrame): DataFrame = {
    val others = staged.columns.filterNot(_ == "key").toSeq
    staged
      .groupBy(col("key"))
      .agg(max_by(struct(others.map(col): _*), col("i")).as("__top"))
      .select(col("key") +: others.map(f => col(s"__top.$f").as(f)): _*)
  }

  /** A2 — latest tombstone per key: the `deletes` relation of the
    * delete-only MERGE (`MergeQueries.java:380-390`).
    * Output: key struct + `i` of the newest null-value row.
    */
  def latestTombstonePerKey(staged: DataFrame): DataFrame =
    staged.where(col("value").isNull)
      .groupBy(col("key"))
      .agg(max(col("i")).as("i"))

  /** J1 — upsert-only MERGE (`MergeQueries.java:245-308`): dedup the batch
    * per key, then full-outer join against dest; matched rows take the
    * source's value columns, unmatched source rows are inserted, unmatched
    * dest rows are kept. The reference never stages tombstones when
    * delete is disabled (P2, `BigQuerySinkTask.java:258`) — enforce the
    * precondition here rather than silently emitting all-null value rows
    * for violating inputs.
    */
  def upsert(dest: DataFrame, staged: DataFrame): DataFrame =
    mergeImpl(dest, staged.where(col("value").isNotNull), delete = false)

  /** J1+J2 — upsert/delete MERGE (`MergeQueries.java:176-243`): as
    * [[upsert]], but a key whose latest staged row is a tombstone
    * (value IS NULL) is deleted when matched and dropped when not matched.
    */
  def upsertDelete(dest: DataFrame, staged: DataFrame): DataFrame =
    mergeImpl(dest, staged, delete = true)

  /** Batch-side broadcast gate for the PUBLIC frame-level merge API:
    * the hint is applied only when the staged batch's optimizer size
    * estimate fits under `spark.graft.mergeBroadcastMaxBytes` (default
    * 256 MB). Micro-batches pass easily; an ad-hoc backfill-scale
    * batch (or a frame with no usable stats, whose estimate is the
    * effectively-infinite default) falls back UNHINTED — the planner
    * sort-merges, and AQE still upgrades to broadcast at runtime if
    * the actual exchange turns out small. An unconditional hint here
    * would let one oversized user batch OOM the executors; the
    * table-level path (`WarehouseTable.merge`) gates the same way on
    * its known source row count.
    */
  private def gatedBroadcast(batchScaled: DataFrame)(df: DataFrame): DataFrame = {
    val maxBytes = BigInt(batchScaled.sparkSession.conf
      .get("spark.graft.mergeBroadcastMaxBytes", (256L << 20).toString))
    if (batchScaled.queryExecution.optimizedPlan.stats.sizeInBytes <= maxBytes)
      broadcast(df)
    else df
  }

  /** Decomposed MERGE plan: a full-outer join can never broadcast, so it
    * would sort-merge-shuffle the whole dest per flush. Split into
    * survivors (anti join vs batch keys, batch broadcast), updates
    * (inner join taking batch values, batch broadcast), and inserts
    * (batch anti-joined against dest's KEY column only — column pruning
    * means dest data columns never cross an exchange; at worst its keys
    * do). Same semantics as the reference MERGE, same output as the
    * full-outer form (oracle-checked). Batch-side broadcasts go through
    * [[gatedBroadcast]] — see its contract.
    */
  private def mergeImpl(dest: DataFrame, staged: DataFrame, delete: Boolean): DataFrame = {
    val kfs = structFieldNames(staged, "key")
    val vfs = structFieldNames(staged, "value")
    val hint = gatedBroadcast(staged) _
    val src = latestPerKey(staged).select(col("key"), col("value"))
    val survivors = dest.as("d")
      .join(hint(src.select(col("key")).as("s")), keyCond(kfs), "left_anti")
    // without delete, a (precondition-violating) tombstone updates
    // matched rows to null values and inserts null-value rows — the
    // full-outer plan's exact behavior
    val live = if (delete) src.where(col("value").isNotNull) else src
    val updates = dest.as("d").join(hint(live.as("s")), keyCond(kfs), "inner")
      .select(kfs.map(f => col(s"d.$f").as(f)) ++
        vfs.map(f => col(s"s.value.$f").as(f)): _*)
    val inserts = live.as("s")
      .join(dest.select(kfs.map(col): _*).as("d"), keyCond(kfs), "left_anti")
      .select(kfs.map(f => col(s"s.key.$f").as(f)) ++
        vfs.map(f => col(s"s.value.$f").as(f)): _*)
    survivors.unionByName(updates).unionByName(inserts)
  }

  /** J3 — delete-only tombstone fence (`MergeQueries.java:310-412`): per
    * key find the latest tombstone's `i`; keep batch rows where no
    * tombstone exists or `batch.i >= deletes.i` (rows older than the last
    * tombstone for their key are fenced out). Returns surviving staged
    * rows with the original schema.
    */
  def tombstoneFence(staged: DataFrame): DataFrame = {
    val cols = staged.columns.toSeq
    val deletes = latestTombstonePerKey(staged).withColumnRenamed("i", "__del_i")
    staged.as("b")
      .join(deletes.as("t"), col("b.key") === col("t.key"), "left")
      .where(col("t.__del_i").isNull || col("b.i") >= col("t.__del_i"))
      .select(cols.map(f => col(s"b.$f")): _*)
  }

  /** Delete-only MERGE (`MergeQueries.java:310-412` full semantics): apply
    * the fence, delete dest rows whose key has a surviving tombstone, then
    * insert every surviving non-tombstone row (delete-only mode performs
    * plain inserts — duplicates in dest are allowed by the reference).
    */
  def deleteOnly(dest: DataFrame, staged: DataFrame): DataFrame = {
    val kfs = structFieldNames(staged, "key")
    val vfs = structFieldNames(staged, "value")
    val fenced = tombstoneFence(staged)
    val tombKeys = fenced.where(col("value").isNull).select(col("key")).distinct()
    val survivors = dest.as("d")
      .join(gatedBroadcast(staged)(tombKeys.as("s")), keyCond(kfs), "left_anti")
    val inserts = fenced.where(col("value").isNotNull)
      .select(kfs.map(f => col(s"key.$f").as(f)) ++ vfs.map(f => col(s"value.$f").as(f)): _*)
    survivors.unionByName(inserts)
  }

  /** J4 — insert-new-keys-only: source rows (deduped, non-tombstone) whose
    * key does not exist in dest (`WHEN NOT MATCHED AND src.value IS NOT
    * NULL THEN INSERT`, `MergeQueries.java:232-242, 297-307`), isolated as
    * its own anti-join operator.
    */
  def insertNewOnly(dest: DataFrame, staged: DataFrame): DataFrame = {
    val kfs = structFieldNames(staged, "key")
    val vfs = structFieldNames(staged, "value")
    latestPerKey(staged)
      .where(col("value").isNotNull)
      .as("s")
      .join(dest.as("d"), keyCond(kfs), "left_anti")
      .select(kfs.map(f => col(s"s.key.$f").as(f)) ++ vfs.map(f => col(s"s.value.$f").as(f)): _*)
  }
}
