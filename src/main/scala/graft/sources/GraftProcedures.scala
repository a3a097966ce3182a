package graft.sources

import java.util.Collections

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL `CALL` surface for the table-maintenance operations — the
  * warehouse-side jobs BigQuery runs implicitly (compaction, retention)
  * plus the engine's snapshot toolbox, addressable from pure SQL:
  *
  * {{{
  * CALL gsql.system.history('db.events')
  * CALL gsql.system.compact('db.events')
  * CALL gsql.system.restore('db.events', 7)
  * CALL gsql.system.vacuum('db.events', 10)
  * CALL gsql.system.clone('db.events', 'db.events_dev', true)
  * CALL gsql.system.expire_partitions('db.events')
  * CALL gsql.system.health('db.events')
  * CALL gsql.system.zonemaps('db.events', 'event_id')
  * CALL gsql.system.changes('db.events', 1, 3)
  * }}}
  *
  * Every procedure resolves its `table` argument relative to the
  * owning catalog's warehouse, runs the corresponding
  * [[WarehouseTable]] operation (same commit protocol as the
  * programmatic API), and returns its result as rows.
  */
private[sources] object GraftProcedures {

  val All: Seq[String] = Seq("history", "vacuum", "compact",
    "compact_fragmented", "restore", "clone", "expire_partitions", "health",
    "zonemaps", "changes", "recluster")

  private def str(n: String, comment: String) =
    ProcedureParameter.in(n, StringType).comment(comment).build()

  /** One-string-column result schema, the common maintenance shape. */
  private def strings(col: String, vs: Seq[String]): (StructType, Array[InternalRow]) =
    (StructType(Seq(StructField(col, StringType))),
      vs.map(v => new GenericInternalRow(
        Array[Any](UTF8String.fromString(v))): InternalRow).toArray)

  def load(spark: SparkSession, warehouse: String,
      ident: Identifier): UnboundProcedure = {
    require(ident.namespace().sameElements(Array("system")),
      s"graft procedures live in the 'system' namespace, got $ident")
    def open(tableIdent: String): WarehouseTable = {
      val path = (warehouse +: tableIdent.split('.').toSeq).mkString("/")
      require(new org.apache.hadoop.fs.Path(s"$path/_graft/schema.json")
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
        .exists(new org.apache.hadoop.fs.Path(s"$path/_graft/schema.json")),
        s"graft: no table at $tableIdent (resolved $path)")
      WarehouseTable.open(spark, path)
    }
    ident.name() match {
      case "history" => proc("history",
        "commit log: one row per snapshot version",
        Seq(str("table", "table identifier, e.g. 'db.events'")),
        StructType(Seq(StructField("version", LongType),
          StructField("operation", StringType),
          StructField("committed_ms", LongType)))) { args =>
        open(args.getUTF8String(0).toString).history().map { case (v, op, ts) =>
          new GenericInternalRow(Array[Any](v, UTF8String.fromString(op), ts))
            : InternalRow
        }.toArray
      }
      case "vacuum" => proc("vacuum",
        "drop snapshots older than the retention window and sweep their files",
        Seq(str("table", "table identifier"),
          ProcedureParameter.in("retain_versions", IntegerType)
            .comment("snapshot versions to keep").build()),
        StructType(Seq(StructField("swept_version", LongType)))) { args =>
        open(args.getUTF8String(0).toString).vacuum(args.getInt(1))
          .map(v => new GenericInternalRow(Array[Any](v)): InternalRow).toArray
      }
      case "compact" => proc("compact",
        "rewrite every partition through the clustering sort",
        Seq(str("table", "table identifier")),
        StructType(Seq(StructField("day", StringType)))) { args =>
        strings("day", open(args.getUTF8String(0).toString).compactPartitions())._2
      }
      case "compact_fragmented" => proc("compact_fragmented",
        "compact only partitions holding more than max_files files",
        Seq(str("table", "table identifier"),
          ProcedureParameter.in("max_files", IntegerType)
            .comment("file-count threshold per partition").build()),
        StructType(Seq(StructField("day", StringType)))) { args =>
        strings("day", open(args.getUTF8String(0).toString)
          .compactFragmented(args.getInt(1)))._2
      }
      case "restore" => proc("restore",
        "restore the table to a previous snapshot version (as a new commit)",
        Seq(str("table", "table identifier"),
          ProcedureParameter.in("version", LongType)
            .comment("snapshot version to restore").build()),
        StructType(Seq(StructField("day", StringType)))) { args =>
        strings("day", open(args.getUTF8String(0).toString)
          .restore(args.getLong(1)))._2
      }
      case "clone" => proc("clone",
        "clone the table to a new identifier (shallow = zero-copy links)",
        Seq(str("table", "source table identifier"),
          str("dest", "destination table identifier"),
          ProcedureParameter.in("shallow", BooleanType)
            .comment("true = hardlink data files").build()),
        StructType(Seq(StructField("location", StringType)))) { args =>
        val t = open(args.getUTF8String(0).toString)
        val destPath = (warehouse +:
          args.getUTF8String(1).toString.split('.').toSeq).mkString("/")
        if (args.getBoolean(2)) t.shallowCloneTo(destPath)
        else t.cloneTo(destPath)
        strings("location", Seq(destPath))._2
      }
      case "expire_partitions" => proc("expire_partitions",
        "drop partitions past the table's configured expiration TTL",
        Seq(str("table", "table identifier")),
        StructType(Seq(StructField("day", StringType)))) { args =>
        strings("day", open(args.getUTF8String(0).toString)
          .expirePartitions(System.currentTimeMillis()))._2
      }
      case "zonemaps" => proc("zonemaps",
        "build-or-refresh the column's per-day zone maps (the data-" +
          "skipping sidecars range reads prune with) and return them",
        Seq(str("table", "table identifier"),
          str("column", "numeric or string column to map")),
        StructType(Seq(StructField("day", StringType),
          StructField("min_value", StringType),
          StructField("max_value", StringType),
          StructField("non_null", LongType)))) { args =>
        open(args.getUTF8String(0).toString)
          .dayZoneMaps(args.getUTF8String(1).toString)
          .toSeq.sortBy(_._1).map { case (d, (mn, mx, nn)) =>
            new GenericInternalRow(Array[Any](
              UTF8String.fromString(d),
              mn.map(UTF8String.fromString).orNull,
              mx.map(UTF8String.fromString).orNull,
              nn)): InternalRow
          }.toArray
      }
      case "health" => dfProc("health",
        "per-partition layout/sidecar health report",
        Seq(str("table", "table identifier"))) { input =>
        open(input.getUTF8String(0).toString).describeHealth()
      }
      case "recluster" => proc("recluster",
        "set the clustering columns + layout (LINEAR or ZORDER) and " +
          "rewrite every partition into the new layout",
        Seq(str("table", "table identifier"),
          str("clustering", "comma-separated clustering columns"),
          str("layout", "LINEAR or ZORDER")),
        StructType(Seq(StructField("day", StringType)))) { args =>
        val t = open(args.getUTF8String(0).toString)
        val updated = t.alterOptions(t.options.copy(
          clusteringFields = args.getUTF8String(1).toString
            .split(",").map(_.trim).filter(_.nonEmpty).toSeq,
          layout = args.getUTF8String(2).toString))
        strings("day", updated.compactPartitions())._2
      }
      case "changes" => dfProc("changes",
        "row-level change feed over a committed version span: rows " +
          "tagged change_type (added/removed; an upsert is pre-image + " +
          "post-image) and _commit_version — the SQL twin of " +
          "readChangeFeed (Delta's table_changes workflow)",
        Seq(str("table", "table identifier"),
          ProcedureParameter.in("from_version", LongType)
            .comment("exclusive lower bound (0 = from the first commit)").build(),
          ProcedureParameter.in("to_version", LongType)
            .comment("inclusive upper bound").build())) { input =>
        open(input.getUTF8String(0).toString)
          .changesBetween(input.getLong(1), input.getLong(2))
      }
      case other => throw new IllegalArgumentException(
        s"graft: unknown procedure 'system.$other' — available: " +
          All.mkString(", "))
    }
  }

  /** [[proc]] for bodies whose RESULT SCHEMA is only known at call time
    * (a DataFrame the procedure materializes — health, the change feed).
    */
  private def dfProc(procName: String, desc: String,
      params: Seq[ProcedureParameter])(
      body: InternalRow => org.apache.spark.sql.DataFrame): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = procName
      override def description(): String = desc
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = procName
          override def description(): String = desc
          override def parameters(): Array[ProcedureParameter] = params.toArray
          override def isDeterministic: Boolean = false
          override def call(input: InternalRow): java.util.Iterator[Scan] = {
            val df = body(input)
            val collected = df.queryExecution.executedPlan.executeCollect()
              .map(_.copy(): InternalRow)
            Collections.singletonList[Scan](new LocalScan {
              override def rows(): Array[InternalRow] = collected
              override def readSchema(): StructType = df.schema
            }).iterator()
          }
        }
    }

  /** Build an Unbound/Bound procedure around a driver-side body that
    * maps the argument row to result rows.
    */
  private def proc(procName: String, desc: String,
      params: Seq[ProcedureParameter], out: StructType)(
      body: InternalRow => Array[InternalRow]): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = procName
      override def description(): String = desc
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = procName
          override def description(): String = desc
          override def parameters(): Array[ProcedureParameter] = params.toArray
          override def isDeterministic: Boolean = false
          override def call(input: InternalRow): java.util.Iterator[Scan] = {
            val rs = body(input)
            Collections.singletonList[Scan](new LocalScan {
              override def rows(): Array[InternalRow] = rs
              override def readSchema(): StructType = out
            }).iterator()
          }
        }
    }
}
