package graft.streaming

import graft.convert.FieldSanitizer

/** Raised by config validation — the analog of the reference's
  * `ConfigException` out of the `MultiPropertyValidator` chain
  * (`config/BigQuerySinkConfig.java:829-868`).
  */
final class GraftConfigException(msg: String) extends RuntimeException(msg)

/** Typed sink configuration mirroring the reference's
  * `BigQuerySinkConfig` surface (defaults cited per property).
  */
final case class GraftSinkConfig(
    /** Default dataset when the topic doesn't carry `dataset:` —
      * `DEFAULT_DATASET_CONFIG`. */
    defaultDataset: String = "default",
    /** Explicit topic → table overrides — `topic2TableMap`
      * (`BigQuerySinkConfig.java:162-226`). Empty = use topic-name rules. */
    topic2TableMap: Map[String, String] = Map.empty,
    /** The explicit subscription list (the `topics` sink property,
      * `BigQuerySinkConfig`'s Connect-framework subscription). When
      * non-empty, [[MergePipeline.processBatch]] routes from THIS set
      * instead of running a distinct-collect job over each micro-batch
      * to discover its topics — one fewer job per batch. Leave empty
      * for pattern subscriptions (`topics.regex`), where the actual
      * topic set is only knowable from the data. Authoritative when
      * set: records from topics outside the list are not routed. */
    subscribedTopics: Seq[String] = Seq.empty,
    /** Sanitize derived table names — `sanitizeTopics`. */
    sanitizeTableNames: Boolean = false,
    /** Upsert/delete mode — `upsertEnabled`/`deleteEnabled`
      * (`BigQuerySinkTask.java:469-470`). */
    upsertEnabled: Boolean = false,
    deleteEnabled: Boolean = false,
    /** Merge flush cadence — `mergeIntervalMs` default 60 s
      * (`BigQuerySinkConfig.java:353-355`); -1 disables. */
    mergeIntervalMs: Long = 60000L,
    /** Merge row threshold — `mergeRecordsThreshold`, -1 disables
      * (`config/UpsertDeleteValidator.java:48-73`). */
    mergeRecordsThreshold: Long = -1L,
    /** Kafka metadata column name — `kafkaDataFieldName` (P9). */
    kafkaDataFieldName: Option[String] = None,
    /** Key-embedding column name — `kafkaKeyFieldName` (P10); REQUIRED
      * in upsert/delete mode (`UpsertDeleteValidator`). */
    kafkaKeyFieldName: Option[String] = None,
    /** P5 toggle — `convertDoubleSpecialValues`. */
    convertDoubleSpecial: Boolean = false,
    /** Schema evolution gates (U3) — `allowNewBigQueryFields` /
      * `allowBigQueryRequiredFieldRelaxation`. */
    allowNewFields: Boolean = true,
    allowFieldRelaxation: Boolean = true,
    /** Event-time vs processing-time partitioning (T6) —
      * `bigQueryMessageTimePartitioning`. */
    messageTimePartitioning: Boolean = true,
    /** Column-based time partitioning — `timestampPartitionFieldName`
      * (`SchemaManager.java:73`); partitions on this record field instead
      * of ingestion/message time. */
    timestampPartitionFieldName: Option[String] = None,
    /** Partition TTL — `partitionExpirationMs` (`SchemaManager.java:74`). */
    partitionExpirationMs: Option[Long] = None,
    /** Clustering columns, ≤4 — `clusteringPartitionFieldNames`
      * (`BigQuerySinkConfig.java:477-493`). */
    clusteringFieldNames: Seq[String] = Seq.empty,
    /** Time-partitioning granularity — `timePartitioningType`
      * (`BigQuerySinkConfig.java:496-499`). */
    timePartitioningType: String = "DAY") {

  def upsertDeleteEnabled: Boolean = upsertEnabled || deleteEnabled

  /** Table-level layout options derived from this sink config. */
  def tableOptions: graft.sources.TableOptions = graft.sources.TableOptions(
    clusteringFields = clusteringFieldNames,
    partitionField = timestampPartitionFieldName,
    granularity = timePartitioningType,
    partitionExpirationMs = partitionExpirationMs)

  /** The validator chain (`MultiPropertyValidator`,
    * `UpsertDeleteValidator.java:48-73`, `PartitioningModeValidator`):
    * every rule checked, all failures reported together.
    */
  def validate(): Unit = {
    val errs = Seq.newBuilder[String]
    if (upsertDeleteEnabled) {
      if (kafkaKeyFieldName.isEmpty)
        errs += "kafkaKeyFieldName must be set when upsert/delete is enabled"
      if (mergeIntervalMs == -1L && mergeRecordsThreshold == -1L)
        errs += "mergeIntervalMs and mergeRecordsThreshold cannot both be -1 (disabled)"
      if (mergeIntervalMs != -1L && mergeIntervalMs <= 0)
        errs += s"mergeIntervalMs must be positive or -1, got $mergeIntervalMs"
      if (mergeRecordsThreshold != -1L && mergeRecordsThreshold <= 0)
        errs += s"mergeRecordsThreshold must be positive or -1, got $mergeRecordsThreshold"
    }
    if (defaultDataset.isEmpty) errs += "defaultDataset must be non-empty"
    // PartitioningModeValidator: the message-time decorator and a
    // partition field are mutually exclusive routing modes
    if (timestampPartitionFieldName.isDefined && messageTimePartitioning)
      errs += "timestampPartitionFieldName cannot be combined with messageTimePartitioning"
    if (clusteringFieldNames.size > 4)
      errs += s"at most 4 clustering fields allowed, got ${clusteringFieldNames.size}"
    if (!graft.sources.TableOptions.Granularities.contains(timePartitioningType))
      errs += s"timePartitioningType must be one of HOUR/DAY/MONTH/YEAR/NONE, got '$timePartitioningType'"
    partitionExpirationMs.filter(_ <= 0).foreach(ms =>
      errs += s"partitionExpirationMs must be positive, got $ms")
    val found = errs.result()
    if (found.nonEmpty) throw new GraftConfigException(found.mkString("; "))
  }
}

/** S2 — topic → (dataset, table) routing
  * (`BigQuerySinkTask.getRecordTable`, `BigQuerySinkTask.java:180-245`):
  * explicit map first; else `dataset:table` split on ':'; else the topic
  * name itself; optional sanitization of derived names.
  */
object TableRouter {

  final case class Target(dataset: String, table: String)

  def route(topic: String, config: GraftSinkConfig): Target = {
    if (config.topic2TableMap.nonEmpty) {
      val table = config.topic2TableMap.getOrElse(topic, topic)
      Target(config.defaultDataset, table)
    } else {
      val parts = topic.split(":")
      val (dataset, table) = parts.length match {
        case 2 => (parts(0), parts(1))
        case 1 => (config.defaultDataset, parts(0))
        case _ => throw new GraftConfigException(
          s"Incorrect topic name '$topic': expected <dataset>:<tableName> or <tableName>")
      }
      val t = if (config.sanitizeTableNames) FieldSanitizer.sanitizeName(table) else table
      Target(dataset, t)
    }
  }
}
