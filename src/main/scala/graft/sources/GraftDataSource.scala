package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SQLContext, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeReference, BoundReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal, Predicate}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister, RelationProvider, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.{NumericType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `spark.read.format("graft")` — the warehouse consumable by standard
  * tools: plain `spark.sql`, temp views (`CREATE TEMPORARY VIEW ...
  * USING graft OPTIONS (path '...')`), and any BI layer that speaks the
  * DataFrame API, with snapshot isolation, time travel
  * (`option("versionAsOf", v)` / `option("timestampAsOf", ms)`),
  * manifest-exact file listing, partition pruning, and zone-map file
  * skipping — no [[WarehouseTable]] programmatic API needed.
  *
  * == Architecture: custom FileIndex, native parquet execution ==
  *
  * The connector is a [[RelationProvider]] returning a
  * [[HadoopFsRelation]] over [[GraftFileIndex]] — the table-format
  * architecture Delta Lake ships (a FileIndex resolving the
  * transaction log, wrapped over the builtin parquet format) rather
  * than a hand-rolled DSv2 `PartitionReaderFactory`. The payoff is the
  * whole native read path for free: vectorized parquet decoding,
  * whole-stage codegen, filter pushdown to row groups, and column
  * pruning all appear in `.explain` exactly as for a plain parquet
  * scan (`PushedFilters`, `PartitionFilters`, `ReadSchema`), while the
  * FileIndex substitutes the COMMITTED manifest for directory listing:
  *
  *  - only snapshot-committed files enter the scan — a concurrent
  *    writer's landed-but-uncommitted files are invisible, exactly as
  *    in [[WarehouseTable.readCommitted]];
  *  - `versionAsOf` resolves each historical file to the archive
  *    generation that holds it (the [[WarehouseTable.locateAsOf]]
  *    per-file resolution — file-granular DML archives only replaced
  *    files, so one day's as-of generation can span archive dirs and
  *    the live dir);
  *  - partition filters on the partition column prune whole days
  *    driver-side before any split planning;
  *  - data filters prune days through the lazy zone-map sidecars
  *    (current-version reads, columns whose map cache exists) — the
  *    same skipping [[WarehouseTable.readRange]] does, now implicit in
  *    any pushed range predicate.
  *
  * == 100 TB design ==
  *
  * Listing is O(touched location groups), not O(files): one
  * `listStatus` per (generation dir, day). `sizeInBytes` reports the
  * resolved snapshot's true byte size so the optimizer's broadcast
  * decisions see the post-pruning table, and all split planning
  * (`maxPartitionBytes` packing, vectorized batches) is the stock file
  *-source path that already scales to thousand-executor clusters.
  *
  * The partition column is served as STRING holding the exact
  * directory token (`2024-01-01`, or `2024-01-01-08` under HOUR
  * granularity) — granularity-agnostic and stable, where directory
  * inference would flip between DATE and STRING by granularity.
  *
  * Snapshot isolation: the version is pinned and its files resolved
  * when the relation is created; a concurrent swap surfaces as the
  * documented transient FAILED_READ (retry re-resolves), never a mixed
  * read. Reference analog: the always-consistent reads BigQuery gives
  * its users over the sink's tables for free
  * (`BigQuerySinkTask.java`'s output is queried, not re-listed).
  */
class GraftDataSource extends RelationProvider
    with CreatableRelationProvider with StreamSinkProvider
    with StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft"

  /** `spark.readStream.format("graft")` — the table as a STREAMING
    * SOURCE (the Delta streaming-table pattern): offsets are the
    * table's committed snapshot versions, so exactly-once falls out of
    * the commit protocol. The first batch is the full snapshot pinned
    * at stream start (or the appends from `option("startingVersion",
    * v)` on); every later batch is [[WarehouseTable.appendedBetween]]
    * over the newly committed versions — file-granular, one commit's
    * files per advanced version, never a table rescan. Non-append
    * commits in a span fail the stream by default;
    * `option("skipChangeCommits", true)` streams past them without
    * emitting their row changes. Compactions are always transparent
    * (row-preserving). The schema is pinned at stream start; a
    * mid-stream widen keeps streaming the pinned columns until the
    * query restarts (new fields then backfill from the restart batch
    * on).
    */
  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val ci = parameters.map { case (k, v) => k.toLowerCase -> v }
    val path = ci.getOrElse("path", throw new IllegalArgumentException(
      "graft source: 'path' (the warehouse table root) is required"))
    val table = WarehouseTable.open(sqlContext.sparkSession, path)
    val base = StructType(table.schema.fields :+
      StructField(table.partitionCol, StringType, nullable = true))
    val withCdf =
      if (!ci.get("readchangefeed").exists(_.trim.toBoolean)) base
      else base.add("change_type", StringType).add("_commit_version", "long")
    ("graft", withCdf)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String])
      : org.apache.spark.sql.execution.streaming.Source = {
    val ci = parameters.map { case (k, v) => k.toLowerCase -> v }
    val path = ci.getOrElse("path", throw new IllegalArgumentException(
      "graft source: 'path' (the warehouse table root) is required"))
    val pinned = sourceSchema(sqlContext, schema, providerName, parameters)._2
    new GraftStreamingSource(sqlContext.sparkSession, path, pinned, ci)
  }

  /** `df.write.format("graft")` — the write half, routed through the
    * SAME commit protocol as the programmatic API (never a raw file
    * dump):
    *
    *  - `Append`: [[WarehouseTable.append]] of the batch, routed by its
    *    `partitionTime` column (rename with
    *    `option("partitionTimeColumn", ...)`), after proactively
    *    evolving the destination schema from the observed batch (the
    *    R3/R4 discipline the streaming sink uses);
    *  - `Overwrite`: [[WarehouseTable.overwrite]] — ONE atomic commit
    *    replacing the whole content (never truncate-then-append: a
    *    reader must see the old table or the new one, never a
    *    committed empty gap); the pre-overwrite table stays
    *    time-travelable and restorable;
    *  - `ErrorIfExists` / `Ignore`: standard semantics against table
    *    existence.
    *
    * First write to a fresh root must pass `option("keys", "k1,k2")`
    * (the merge key set every later upsert relies on). Returns the read
    * relation over the post-write table.
    */
  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val ci = parameters.map { case (k, v) => k.toLowerCase -> v }
    val path = ci.getOrElse("path", throw new IllegalArgumentException(
      "graft: 'path' (the warehouse table root) is required"))
    val spark = sqlContext.sparkSession
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val exists = fs.exists(new Path(s"$path/_graft/schema.json"))
    if (mode == SaveMode.ErrorIfExists && exists)
      throw new IllegalStateException(
        s"graft table $path already exists (SaveMode.ErrorIfExists)")
    if (!(mode == SaveMode.Ignore && exists)) {
      val ptCol = ci.getOrElse("partitiontimecolumn", "partitionTime")
      require(data.columns.contains(ptCol),
        s"graft: the batch needs a '$ptCol' timestamp column to route " +
          "rows to their time-slice partitions (rename with " +
          "option(\"partitionTimeColumn\", ...))")
      val observed = StructType(data.schema.fields.filterNot(_.name == ptCol))
      val table =
        if (exists) WarehouseTable.open(spark, path)
        else {
          val keys = ci.getOrElse("keys", throw new IllegalArgumentException(
            s"graft: first write to $path must pass option(\"keys\", " +
              "\"k1,k2\") — the merge key set"))
            .split(",").map(_.trim).filter(_.nonEmpty).toSeq
          require(keys.nonEmpty, "graft: 'keys' must name at least one column")
          WarehouseTable.create(spark, path, keys, observed)
        }
      // proactive evolve-then-write (the streaming sink's R3/R4 shape):
      // batch-new fields join the destination schema before the append
      val evolved = table.evolveSchema(observed)
      val conformed = data.select(evolved.fields.toSeq.map { f =>
        if (data.columns.contains(f.name)) col(s"`${f.name}`")
        else lit(null).cast(f.dataType).as(f.name)
      } :+ col(s"`$ptCol`").as("partitionTime"): _*)
      // option("overwriteDays", "2024-01-01,2024-01-02"): day-scoped
      // atomic replacement (the Delta replaceWhere / INSERT OVERWRITE
      // PARTITION backfill shape) — rows routing outside the named
      // slices fail the write rather than widen it
      val overwriteDays = ci.get("overwritedays")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      if (mode == SaveMode.Overwrite) overwriteDays match {
        case Some(days) => table.overwriteDays(conformed, days)
        case None => table.overwrite(conformed)
      } else {
        require(overwriteDays.isEmpty,
          "graft: option(\"overwriteDays\", ...) requires mode(\"overwrite\")")
        table.append(conformed)
      }
      ()
    }
    createRelation(sqlContext, parameters)
  }

  /** `stream.writeStream.format("graft")` — the streaming sink half,
    * exactly-once: every micro-batch routes through
    * [[WarehouseTable.appendBatch]], whose checkpoint-namespaced batch
    * tags make a replayed batch a durable no-op (T2; the
    * `MergeBatches.java:286-299` offsets-after-durable-write contract).
    * Append output mode; rows carry a `partitionTime` timestamp column
    * (rename with `option("partitionTimeColumn", ...)`); first write
    * to a fresh root passes `option("keys", ...)`. Upsert/delete
    * streams use [[graft.streaming.MergePipeline.writer]], which adds
    * the kafka-shaped routing, thresholds and merge semantics this
    * generic sink does not assume.
    */
  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: OutputMode): org.apache.spark.sql.execution.streaming.Sink = {
    val ci = parameters.map { case (k, v) => k.toLowerCase -> v }
    val path = ci.getOrElse("path", throw new IllegalArgumentException(
      "graft: 'path' (the warehouse table root) is required"))
    require(outputMode == OutputMode.Append(),
      s"graft sink supports Append output mode, got $outputMode — " +
        "upsert/delete streams go through MergePipeline.writer")
    // exactly-once namespace: batchIds are monotonic only within one
    // checkpoint lineage (MergePipeline doc) — the replay tags MUST be
    // namespaced by the checkpoint. REQUIRED, never defaulted
    // (advisor-found): Spark forwards only writer-level .option()
    // values here, so a query relying on the
    // spark.sql.streaming.checkpointLocation conf would arrive without
    // one — and a shared fallback namespace would silently no-op a
    // second lineage's small batchIds as replays (data loss). Fail
    // fast instead.
    val streamId = ci.get("checkpointlocation")
      .map(c => java.util.UUID.nameUUIDFromBytes(c.getBytes("UTF-8"))
        .toString.take(8))
      .getOrElse(throw new IllegalArgumentException(
        "graft sink: .option(\"checkpointLocation\", ...) is required on " +
          "the writer — it namespaces the exactly-once replay tags; a " +
          "session-conf default checkpoint is not forwarded to the sink, " +
          "and two checkpoint lineages sharing one namespace would " +
          "silently drop the newer lineage's batches as replays"))
    new GraftStreamingSink(path, ci, streamId)
  }

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val ci = parameters.map { case (k, v) => k.toLowerCase -> v }
    val path = ci.getOrElse("path", throw new IllegalArgumentException(
      "graft: 'path' (the warehouse table root) is required — " +
        "spark.read.format(\"graft\").load(\"/table/root\")"))
    val spark = sqlContext.sparkSession
    val table = WarehouseTable.open(spark, path)
    // batch change-feed read (the Delta table_changes analog):
    // option("readChangeFeed", true) + startingVersion [+ endingVersion]
    // returns the row-level change set of the span as a relation —
    // bounded by the commits read, so a TableScan (no pushdown) is the
    // right shape; incremental consumers at scale use the STREAMING
    // source instead
    if (ci.get("readchangefeed").exists(_.trim.toBoolean)) {
      val from = ci.get("startingversion").map { v =>
        if (v.trim.equalsIgnoreCase("earliest")) 1L
        else v.trim.toLongOption.filter(_ >= 1).getOrElse(
          throw new IllegalArgumentException(
            s"graft: startingVersion must be >= 1 or 'earliest', got '$v'"))
      }.getOrElse(throw new IllegalArgumentException(
        "graft: readChangeFeed requires option(\"startingVersion\", ...)"))
      val to = ci.get("endingversion").map(_.trim.toLong)
        .getOrElse(table.currentVersion)
      val changes = table.changesBetween(from - 1, to)
      val outerCtx = sqlContext
      return new BaseRelation with org.apache.spark.sql.sources.TableScan {
        override def sqlContext: SQLContext = outerCtx
        override def schema: StructType = changes.schema
        override def buildScan(): org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] =
          changes.rdd
      }
    }
    require(!(ci.contains("versionasof") && ci.contains("timestampasof")),
      "graft: versionAsOf and timestampAsOf are mutually exclusive")
    val version: Option[Long] = ci.get("versionasof").map { v =>
      v.trim.toLongOption.getOrElse(throw new IllegalArgumentException(
        s"graft: versionAsOf must be a snapshot version number, got '$v'"))
    }.orElse(ci.get("timestampasof").map(t => resolveTimestamp(table, t)))
    val index = new GraftFileIndex(spark, table, version)
    HadoopFsRelation(index, index.partitionSchema, table.schema, None,
      new GraftReadOnlyParquetFormat, Map.empty)(spark)
  }

  /** `timestampAsOf` accepts epoch millis or `yyyy-MM-dd[ HH:mm:ss]`,
    * resolved to the newest snapshot committed at or before it (the
    * [[WarehouseTable.readAsOfTime]] rule).
    */
  private def resolveTimestamp(table: WarehouseTable, raw: String): Long = {
    val t = raw.trim
    val ms = t.toLongOption.getOrElse {
      val full = if (t.length == 10) s"$t 00:00:00" else t
      try java.sql.Timestamp.valueOf(full).getTime
      catch { case _: IllegalArgumentException =>
        throw new IllegalArgumentException(
          s"graft: timestampAsOf must be epoch millis or " +
            s"'yyyy-MM-dd[ HH:mm:ss]', got '$raw'")
      }
    }
    table.history().filter(_._3 <= ms).map(_._1).maxOption.getOrElse(
      throw new IllegalArgumentException(
        s"graft: no snapshot committed at or before $raw"))
  }
}

/** The read relation's file format: stock parquet READING, but a
  * LOUD refusal to write. Without this, `INSERT INTO` a graft temp
  * view resolves to Spark's native `InsertIntoHadoopFsRelationCommand`
  * — a raw parquet dump at the index's root path that bypasses the
  * commit protocol entirely: the files land outside any manifest, the
  * insert silently reads back as zero rows (measured), and vacuum
  * eventually sweeps them. `prepareWrite` runs at the start of every
  * such write, so the refusal fires before any file lands.
  */
private[sources] class GraftReadOnlyParquetFormat extends ParquetFileFormat {
  override def prepareWrite(sparkSession: SparkSession,
      job: org.apache.hadoop.mapreduce.Job,
      options: Map[String, String],
      dataSchema: StructType)
      : org.apache.spark.sql.execution.datasources.OutputWriterFactory =
    throw new UnsupportedOperationException(
      "INSERT INTO a graft relation would bypass the table's commit " +
        "protocol (the files would land uncommitted and read back as " +
        "nothing) — write with df.write.format(\"graft\") or the " +
        "WarehouseTable API instead")
  override def toString: String = "GraftParquet"
}

/** Micro-batch sink behind `writeStream.format("graft")`: one
  * exactly-once [[WarehouseTable.appendBatch]] per batch (see
  * [[GraftDataSource.createSink]]).
  */
private[sources] class GraftStreamingSink(path: String,
    options: Map[String, String], streamId: String)
    extends org.apache.spark.sql.execution.streaming.Sink {

  override def addBatch(batchId: Long,
      data: org.apache.spark.sql.DataFrame): Unit = {
    // re-plan the incremental data as a BATCH frame (Bridge.asBatch —
    // the FileStreamSink pattern): everything below builds new plans
    // over it, which the raw streaming frame would reject
    val batch = org.apache.spark.sql.graftbridge.Bridge.asBatch(
      data.asInstanceOf[org.apache.spark.sql.classic.DataFrame])
    val spark = batch.sparkSession
    val ptCol = options.getOrElse("partitiontimecolumn", "partitionTime")
    require(batch.columns.contains(ptCol),
      s"graft sink: the stream needs a '$ptCol' timestamp column")
    val observed = StructType(batch.schema.fields.filterNot(_.name == ptCol))
    val fs = new Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val table =
      if (fs.exists(new Path(s"$path/_graft/schema.json")))
        WarehouseTable.open(spark, path)
      else {
        val keys = options.getOrElse("keys", throw new IllegalArgumentException(
          s"graft sink: first write to $path must pass option(\"keys\", ...)"))
          .split(",").map(_.trim).filter(_.nonEmpty).toSeq
        require(keys.nonEmpty, "graft sink: 'keys' must name at least one column")
        WarehouseTable.create(spark, path, keys, observed)
      }
    val evolved = table.evolveSchema(observed)
    val conformed = batch.select(evolved.fields.toSeq.map { f =>
      if (batch.columns.contains(f.name)) col(s"`${f.name}`")
      else lit(null).cast(f.dataType).as(f.name)
    } :+ col(s"`$ptCol`").as("partitionTime"): _*)
    table.appendBatch(conformed, batchId, streamId = streamId)
  }

  override def toString: String = s"GraftStreamingSink[$path]"
}

/** V1 streaming Source over a graft table (see
  * [[GraftDataSource.sourceSchema]] for the contract). Offsets are
  * committed snapshot versions ([[WarehouseTable.currentVersion]]);
  * `getBatch((a, b])` is deterministic given the offsets (the commit
  * manifests are immutable), which is what makes checkpoint replay
  * exactly-once.
  */
private[sources] class GraftStreamingSource(spark: SparkSession,
    path: String, pinnedSchema: StructType, options: Map[String, String])
    extends org.apache.spark.sql.execution.streaming.Source
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow
    with org.apache.spark.internal.Logging {

  import org.apache.spark.sql.connector.read.streaming.{ReadLimit, Offset => OffsetV2}
  import org.apache.spark.sql.execution.streaming.{Offset => V1Offset}
  import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}

  private val skipChangeCommits =
    options.get("skipchangecommits").exists(_.trim.toBoolean)

  /** `failOnVersionRewind` (default true): when the CHECKPOINTED offset
    * is ahead of the table's committed version — a filesystem-level
    * restore rewound the table under a live checkpoint — fail the
    * stream loudly (the reference table format, Delta, fails on an
    * out-of-range offset, surfacing the data loss). Set false to opt
    * into the lenient legacy behavior: the checkpoint stays
    * authoritative, the source emits nothing (with a WARN per
    * occurrence) until the table's version counter passes the
    * checkpointed offset again — note every commit written while
    * behind the checkpoint is silently skipped.
    */
  private val failOnVersionRewind: Boolean =
    options.get("failonversionrewind").forall(_.trim.toBoolean)

  private def rewindError(checkpointed: Long, live: Long): Nothing =
    throw new IllegalStateException(
      s"graft source: checkpointed offset $checkpointed is ahead of the " +
        s"table's committed version $live at $path — the table was " +
        "rewound (restored from backup?) under this checkpoint. " +
        "Commits made while the table is behind the checkpoint would be " +
        "silently lost. Start from a fresh checkpoint, or set " +
        "option(\"failOnVersionRewind\", \"false\") to accept the loss " +
        "and wait for the version counter to pass the checkpoint.")

  /** `readChangeFeed`: stream row-level changes (`change_type` +
    * `_commit_version` columns, [[WarehouseTable.changesBetween]])
    * instead of appended rows. Requires `startingVersion` — a change
    * feed has no meaningful "initial snapshot" batch.
    */
  private val readChangeFeed =
    options.get("readchangefeed").exists(_.trim.toBoolean)

  /** `startingVersion`: stream appends from this committed version ON
    * (inclusive) instead of an initial full snapshot; `earliest` = 1.
    */
  private val startingVersion: Option[Long] =
    options.get("startingversion").map { v =>
      if (v.trim.equalsIgnoreCase("earliest")) 1L
      else v.trim.toLongOption.filter(_ >= 1).getOrElse(
        throw new IllegalArgumentException(
          s"graft source: startingVersion must be >= 1 or 'earliest', got '$v'"))
    }
  require(!readChangeFeed || startingVersion.isDefined,
    "graft source: readChangeFeed requires option(\"startingVersion\", ...) " +
      "(or 'earliest') — a change feed has no initial-snapshot batch")

  /** `maxVersionsPerTrigger`: admission control for long catch-ups —
    * each trigger advances at most N committed versions, so a stream
    * resuming after downtime processes the backlog as bounded batches
    * instead of one giant one. Applied in [[latestOffset]] relative to
    * the engine-supplied start offset, so it bounds the first trigger
    * after a restart too. The only uncapped batch is the
    * initial-snapshot read (no start offset, no `startingVersion`),
    * which is a single version-pinned scan whatever the cap.
    */
  private val maxVersionsPerTrigger: Option[Long] =
    options.get("maxversionspertrigger").map { v =>
      v.trim.toLongOption.filter(_ >= 1).getOrElse(
        throw new IllegalArgumentException(
          s"graft source: maxVersionsPerTrigger must be >= 1, got '$v'"))
    }

  /** Newest offset handed to the engine (admission-control watermark). */
  @volatile private var lastOffered: Long = -1L

  /** `Trigger.AvailableNow` fence: the committed version pinned when the
    * engine announced the run ([[prepareForTriggerAvailableNow]]).
    * Every later [[latestOffset]] is clamped to it, so the run drains
    * exactly the data that existed at start and TERMINATES even while
    * concurrent writers keep committing — their versions are the next
    * scheduled run's backlog (the periodic-incremental-job pattern;
    * Delta's streaming source behaves the same way).
    */
  @volatile private var availableNowFence: Option[Long] = None

  override def schema: StructType = pinnedSchema

  private def table = WarehouseTable.open(spark, path)

  override def prepareForTriggerAvailableNow(): Unit = {
    availableNowFence = Some(table.currentVersion)
  }

  /** Version capping is the source's own `maxVersionsPerTrigger` option
    * (there is no per-version [[ReadLimit]] shape), so the engine's
    * default limit is all-available and [[latestOffset]] applies the
    * cap itself.
    */
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** Admission control (the engine calls this instead of [[getOffset]]
    * once `SupportsAdmissionControl` is implemented): advance from
    * `start` by at most `maxVersionsPerTrigger` committed versions,
    * clamped to the AvailableNow fence when one is pinned. Unlike the
    * old getOffset watermark, the cap is relative to the CHECKPOINTED
    * start offset, so the first trigger after a restart is bounded too
    * (the previously documented Delta-style caveat is gone). The
    * initial-snapshot batch (no start offset, no `startingVersion`) is
    * one version-pinned read and is never version-capped.
    */
  override def latestOffset(start: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val live = table.currentVersion
    val ceiling = availableNowFence.fold(live)(math.min(live, _))
    if (ceiling <= 0L) return null // nothing committed yet
    val from: Option[Long] = Option(start).map(versionOf).orElse(startingVersion.map(_ - 1))
    val capped = (from, maxVersionsPerTrigger) match {
      case (Some(f), Some(n)) => math.min(ceiling, f + n)
      case _ => ceiling
    }
    // Never return an offset BELOW the checkpointed start: a checkpoint
    // reused after `CALL restore` rewinds the table (or an AvailableNow
    // fence pinned before a rewind) would otherwise plan end < start.
    // Default is to FAIL on that rewind (failOnVersionRewind); when
    // opted out, clamping to `start` means "no new data" until the
    // table catches back up past the checkpoint — the checkpoint stays
    // authoritative and the skipped commits are logged, not delivered.
    from.filter(_ > ceiling).foreach { f =>
      if (failOnVersionRewind) rewindError(f, live)
      logWarning(s"graft source: table at $path is at version $live, " +
        s"BEHIND the checkpointed offset $f — emitting no data until the " +
        "version counter passes the checkpoint (failOnVersionRewind=false); " +
        "commits written in between will never be delivered")
    }
    val floored = from.fold(capped)(f => math.max(capped, f))
    lastOffered = math.max(lastOffered, floored)
    LongOffset(floored) // == start ⇒ the engine plans no new batch
  }

  private def versionOf(o: OffsetV2): Long = o match {
    case LongOffset(v) => v
    case other => other.json.trim.toLong
  }

  override def getOffset: Option[V1Offset] = {
    val v = table.currentVersion
    if (v <= 0L) None
    else {
      val capped = maxVersionsPerTrigger match {
        case Some(n) if lastOffered >= 0L => math.min(v, lastOffered + n)
        case _ => v
      }
      lastOffered = capped
      Some(LongOffset(capped))
    }
  }

  private def version(o: V1Offset): Long = o match {
    case LongOffset(v) => v
    case SerializedOffset(json) => json.trim.toLong
    case other => throw new IllegalStateException(
      s"graft source: unexpected offset type $other")
  }

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val endV = version(end)
    lastOffered = math.max(lastOffered, endV)
    val t = table
    val fromV = start.map(version).orElse(startingVersion.map(_ - 1))
    val batch = if (endV > t.currentVersion) {
      // Checkpoint ahead of table (a filesystem-level restore rewound
      // the table below the checkpointed offset). Default: fail loudly
      // (failOnVersionRewind) — this replayed range can never be
      // reproduced, which is data loss. Opted out: the checkpoint stays
      // authoritative — versions up to it count as seen, so a replayed
      // range beyond the table's head has nothing to emit. Pairs with
      // latestOffset's start clamp; without this, restart-time
      // getBatch(committed offsets) dies in readAsOf's range check.
      if (failOnVersionRewind) rewindError(endV, t.currentVersion)
      logWarning(s"graft source: replayed offset range up to $endV is " +
        s"beyond the table head ${t.currentVersion} at $path — emitting " +
        "an empty replacement batch (failOnVersionRewind=false)")
      spark.emptyDataFrame
    } else (fromV, readChangeFeed) match {
      case (Some(f), true) => t.changesBetween(f, endV)
      case (Some(f), false) => t.appendedBetween(f, endV, skipChangeCommits)
      case (None, _) => t.readAsOf(endV) // initial snapshot, version-pinned
    }
    // conform to the PINNED schema — names AND types: a mid-stream
    // widen must not change the analyzed plan's column set under the
    // running query, and the programmatic read infers `_pday` as DATE
    // from the directory tokens under DAY granularity where the source
    // declares the connector's STRING (the cast renders the exact token)
    val conformed = batch.select(pinnedSchema.fields.toSeq.map { f =>
      if (batch.columns.contains(f.name))
        col(s"`${f.name}`").cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
    org.apache.spark.sql.graftbridge.Bridge.asStream(
      conformed.asInstanceOf[org.apache.spark.sql.classic.DataFrame])
  }

  override def stop(): Unit = ()

  override def toString: String = s"GraftStreamingSource[$path]"
}

/** Manifest-backed [[FileIndex]]: the committed snapshot's (or an
  * as-of version's) physical files, resolved once at construction
  * (snapshot isolation), served to the stock file-source planner with
  * day-level partition pruning and zone-map data skipping.
  */
class GraftFileIndex(spark: SparkSession, table: WarehouseTable,
    versionAsOf: Option[Long]) extends FileIndex {

  /** day token → that day's as-of files (possibly spanning archive
    * generations and the live dir under file-granular DML history).
    */
  @volatile private var groups: Seq[(String, Seq[FileStatus])] =
    table.connectorFileGroups(versionAsOf)

  override val rootPaths: Seq[Path] = Seq(new Path(table.root))

  override val partitionSchema: StructType =
    StructType(Seq(StructField(table.partitionCol, StringType, nullable = true)))

  override def refresh(): Unit = {
    groups = table.connectorFileGroups(versionAsOf)
  }

  override def sizeInBytes: Long =
    groups.iterator.flatMap(_._2).map(_.getLen).sum

  override def inputFiles: Array[String] =
    groups.flatMap(_._2).map(_.getPath.toString).toArray

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    // day pruning from the partition filters — the
    // PartitioningAwareFileIndex.prunePartitions binding pattern
    // (Spark's own evaluation of partition predicates driver-side)
    val afterPartition =
      if (partitionFilters.isEmpty) groups
      else {
        val bound = Predicate.createInterpreted(
          partitionFilters.reduce(And).transform {
            case a: AttributeReference if a.name == table.partitionCol =>
              BoundReference(0, StringType, nullable = true)
          })
        bound.initialize(0)
        groups.filter { case (d, _) =>
          bound.eval(InternalRow(UTF8String.fromString(d)))
        }
      }
    // zone-map day skipping from the pushed data filters: only for
    // current-version reads, only over columns whose sidecar cache
    // already exists (the planner must never launch a stats scan of a
    // 100 TB column as a side effect of planning a query), and only
    // where the sidecar's fingerprint matches THIS index's pinned file
    // set — a sidecar rebuilt by a concurrent rewrite describes the
    // NEW files, and pruning the pinned OLD files with it would
    // silently drop rows instead of the documented transient
    // FAILED_READ (advisor-found)
    val skipped = zoneSkippedDays(dataFilters, afterPartition)
    afterPartition.filterNot(g => skipped.contains(g._1)).map {
      case (d, files) =>
        PartitionDirectory(
          InternalRow(UTF8String.fromString(d)), files.toArray)
    }
  }

  /** Days provably empty under some pushed conjunct, by the cached
    * per-day (min, max, non-null) zone maps — READ-ONLY (no plan-time
    * stats build), and a day is only skippable when its sidecar
    * fingerprint equals the fingerprint of the pinned file group, so
    * the stats provably describe the exact files this snapshot scans.
    * Conservative: any parse failure, unsupported shape, fingerprint
    * mismatch, or sidecar error keeps the day.
    */
  private def zoneSkippedDays(dataFilters: Seq[Expression],
      pinned: Seq[(String, Seq[FileStatus])]): Set[String] = {
    val days = pinned.map(_._1).toSet
    if (versionAsOf.nonEmpty || dataFilters.isEmpty || days.isEmpty)
      return Set.empty
    val mapped = table.zoneMapColumnsOnDisk.toSet
    if (mapped.isEmpty) return Set.empty
    // (column, op, literal-as-string) for attr-vs-literal comparisons,
    // normalized to attribute-on-the-left
    val checks: Seq[(String, String, String)] = dataFilters.flatMap {
      case EqualTo(a: AttributeReference, l: Literal) => litStr(l).map((a.name, "=", _))
      case EqualTo(l: Literal, a: AttributeReference) => litStr(l).map((a.name, "=", _))
      case GreaterThan(a: AttributeReference, l: Literal) => litStr(l).map((a.name, ">", _))
      case GreaterThan(l: Literal, a: AttributeReference) => litStr(l).map((a.name, "<", _))
      case GreaterThanOrEqual(a: AttributeReference, l: Literal) => litStr(l).map((a.name, ">=", _))
      case GreaterThanOrEqual(l: Literal, a: AttributeReference) => litStr(l).map((a.name, "<=", _))
      case LessThan(a: AttributeReference, l: Literal) => litStr(l).map((a.name, "<", _))
      case LessThan(l: Literal, a: AttributeReference) => litStr(l).map((a.name, ">", _))
      case LessThanOrEqual(a: AttributeReference, l: Literal) => litStr(l).map((a.name, "<=", _))
      case LessThanOrEqual(l: Literal, a: AttributeReference) => litStr(l).map((a.name, ">=", _))
      case _ => None
    }.filter(c => mapped.contains(c._1))
    if (checks.isEmpty) return Set.empty
    val numericCols = table.schema.fields
      .filter(_.dataType.isInstanceOf[NumericType]).map(_.name).toSet
    // this snapshot's own per-day fingerprint, from the pinned groups
    // (names + sizes — same formula the sidecar writer used)
    val pinnedFp: Map[String, String] = pinned.map { case (d, files) =>
      d -> WarehouseTable.fileSetFingerprint(
        files.map(st => (st.getPath.getName, st.getLen)))
    }.toMap
    val dayList = pinned.map(_._1)
    val maps = checks.map(_._1).distinct.flatMap { c =>
      try Some(c -> table.cachedZoneMaps(c, dayList))
      catch { case scala.util.control.NonFatal(_) => None }
    }.toMap
    days.filter { d =>
      checks.exists { case (c, op, lit) =>
        maps.get(c).flatMap(_.get(d)).exists { case (fp, (mn, mx, nn)) =>
          fp == pinnedFp(d) &&
            provablyEmpty(op, lit, mn, mx, nn, numericCols.contains(c))
        }
      }
    }
  }

  private def litStr(l: Literal): Option[String] =
    Option(l.value).map(_.toString)

  private def provablyEmpty(op: String, lit: String, mn: Option[String],
      mx: Option[String], nonNull: Long, numeric: Boolean): Boolean = {
    if (nonNull == 0L) return true // all-null day never matches a comparison
    (mn, mx) match {
      case (Some(lo), Some(hi)) =>
        try {
          // string bounds compare under UTF8String binary (code-point)
          // order — the SAME collation Spark's min/max used to produce
          // the sidecar stats. Java String.compareTo (UTF-16 code-unit
          // order) disagrees for supplementary characters vs U+E000..
          // U+FFFF, and a collation mismatch here wrongly proves days
          // empty (advisor-found).
          def cmp(a: String, b: String): Int =
            if (numeric) BigDecimal(a).compare(BigDecimal(b))
            else UTF8String.fromString(a).compareTo(UTF8String.fromString(b))
          op match {
            case "=" => cmp(lit, lo) < 0 || cmp(lit, hi) > 0
            case ">" => cmp(hi, lit) <= 0
            case ">=" => cmp(hi, lit) < 0
            case "<" => cmp(lo, lit) >= 0
            case "<=" => cmp(lo, lit) > 0
            case _ => false
          }
        } catch { case _: NumberFormatException => false }
      case _ => false
    }
  }
}
