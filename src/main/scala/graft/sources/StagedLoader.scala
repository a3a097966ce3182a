package graft.sources

import graft.schema.EvolutionPolicy
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.util.UUID

/** S4/S5 — the staged batch-load path: batches are serialized to
  * newline-delimited JSON blobs under a staging area with the destination
  * table encoded in the path, and a scheduled load runner claims blobs
  * per table, appends them to the destination, and deletes them on
  * success — the GCS→BigQuery load-job pipeline
  * (`write/row/GCSToBQWriter.java:108-193`,
  * `GCSToBQLoadRunnable.java:101-325`) with the local/HDFS filesystem as
  * the bucket and [[WarehouseTable]] as the destination.
  *
  * Scale notes: Spark's `.json` writer is NDJSON, written distributed
  * (one blob per task). The runner enforces the reference's per-load
  * quota guards (≤ `maxFilesPerLoad` files, ≤ `maxBytesPerLoad` bytes per
  * claim, `GCSToBQLoadRunnable.java:70-73`) so one load never exceeds a
  * bounded working set; unclaimed blobs stay for the next cycle — the
  * retry model is at-least-once with idempotent appends.
  */
object StagedLoader {

  /** S4 — stage one batch as NDJSON blobs:
    * `staging/<table>/batch-<uuid>/part-*.json`. Rows pass through
    * `to_json(struct(*))` exactly like the reference's Gson NDJSON
    * serializer (`GCSToBQWriter.java:185-193`). Deterministic write
    * order (W2, `TableWriter.java:187-188`): rows sorted within each
    * task by (partition, offset) when those columns exist.
    */
  def stageBatch(df: DataFrame, stagingDir: String, tableName: String): String = {
    val blobDir = s"$stagingDir/$tableName/batch-${UUID.randomUUID().toString.take(12)}"
    val ordered =
      if (Seq("partition", "offset").forall(df.columns.contains))
        df.sortWithinPartitions(col("partition"), col("offset"))
      else df
    ordered.write.json(blobDir)
    blobDir
  }

  final case class LoadResult(
      table: String, blobsLoaded: Int, rowsLoaded: Long, blobsDeferred: Int)

  /** S5 — one load cycle: list staged batch dirs per table, claim up to
    * the per-load quotas, read NDJSON with the destination schema, append
    * (idempotent — kafka coordinates dedup in [[WarehouseTable.append]]),
    * delete claimed blobs on success. Blobs beyond quota stay for the
    * next cycle (`GCSToBQLoadRunnable.java:101-139`).
    */
  def runOnce(
      spark: SparkSession,
      stagingDir: String,
      tableRootFor: String => String,
      maxFilesPerLoad: Int = 10000,
      maxBytesPerLoad: Long = 15L * 1024 * 1024 * 1024 * 1024): Seq[LoadResult] = {
    val fs = new Path(stagingDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val base = new Path(stagingDir)
    if (!fs.exists(base)) return Seq.empty
    fs.listStatus(base).toSeq.filter(_.isDirectory).map { tableDir =>
      val table = tableDir.getPath.getName
      val batches = fs.listStatus(tableDir.getPath).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch-"))
        .sortBy(_.getPath.getName)
      // claim greedily within quota (files + bytes), defer the rest
      var files = 0
      var bytes = 0L
      val (claimed, deferred) = batches.partition { b =>
        val stats: Seq[FileStatus] = fs.listStatus(b.getPath).toSeq
        val f = stats.count(s => s.getPath.getName.endsWith(".json"))
        val sz = stats.map(_.getLen).sum
        if (files + f <= maxFilesPerLoad && bytes + sz <= maxBytesPerLoad) {
          files += f; bytes += sz; true
        } else false
      }
      if (claimed.isEmpty) LoadResult(table, 0, 0L, deferred.size)
      else {
        val destTable = WarehouseTable.open(spark, tableRootFor(table))
        // read with the destination schema + partitionTime (the column
        // the router strips into _pday on append)
        val schema = destTable.schema.add("partitionTime", "timestamp")
        val staged = spark.read.schema(schema)
          .json(claimed.map(_.getPath.toString): _*)
        val rows = staged.count()
        destTable.append(staged)
        claimed.foreach(b => fs.delete(b.getPath, true))
        LoadResult(table, claimed.size, rows, deferred.size)
      }
    }
  }
}

/** R1/R3 — bounded retry with jitter and adaptive schema-on-error: the
  * Spark analog of `write/row/BigQueryWriter.java:98-149` (retry loop,
  * `bigQueryRetryWait` + ≤1 s jitter) and
  * `AdaptiveBigQueryWriter.java:84-148` (on schema-mismatch errors,
  * update the table schema and re-attempt).
  *
  * Spark task-level transient failures are already retried by the
  * engine (`spark.task.maxFailures`); this wrapper covers *driver-side*
  * warehouse I/O (partition swaps, meta writes, appends).
  */
object Retry {

  /** The failure families a FILE warehouse actually produces, mirroring
    * the *structure* of the reference's error taxonomy
    * (`BigQueryErrorResponses.java:51-129` classifies ~10 reason/code
    * families into retry vs. fail; quota/rate-limit classes have no
    * local analog and are dropped, storage-I/O classes gain subclasses):
    *
    *  - [[ReadTimeout]] — socket/future timeouts: the remote-store
    *    analog of the reference's `backendError`/`internalError` retry
    *    family;
    *  - [[CorruptRead]] — checksum mismatch mid-transfer: a re-read may
    *    hit a healthy replica (retryable; a corrupt *source file* keeps
    *    failing and exhausts the budget — bounded either way);
    *  - [[PartialVisibility]] — a listed path vanished before the read:
    *    the commit-swap / eventual-consistency window; the swap
    *    completes, so a short retry resolves it;
    *  - [[TransientIo]] — any other `IOException`: the catch-all retry
    *    family, as in the reference;
    *  - [[AccessDenied]] — permission failure: PERMANENT (it extends
    *    `IOException`, so the coarse type test alone would loop on it —
    *    the reason the taxonomy must test subclasses first);
    *  - [[Cancelled]] — interrupt-shaped I/O: cooperative cancellation,
    *    never fought with a retry;
    *  - [[Logic]] — analysis/schema/config errors: the reference's
    *    `invalid`/`notFound` permanent family;
    *  - [[Unknown]] — anything else: fail fast, surface it.
    */
  sealed abstract class ErrorClass(val retryable: Boolean)
  case object ReadTimeout extends ErrorClass(true)
  case object CorruptRead extends ErrorClass(true)
  case object PartialVisibility extends ErrorClass(true)
  case object TransientIo extends ErrorClass(true)
  case object AccessDenied extends ErrorClass(false)
  case object Cancelled extends ErrorClass(false)
  case object Logic extends ErrorClass(false)
  case object Unknown extends ErrorClass(false)

  /** Classify a throwable into its [[ErrorClass]], unwrapping causes
    * (Spark wraps storage failures in `SparkException`). Subclass order
    * matters: `AccessControlException`, `ChecksumException`,
    * `SocketTimeoutException`, `InterruptedIOException` and
    * `FileNotFoundException` all extend `IOException` and carry
    * different retry verdicts than the catch-all.
    */
  def classify(t: Throwable): ErrorClass = t match {
    case _: org.apache.hadoop.security.AccessControlException => AccessDenied
    case _: org.apache.hadoop.fs.ChecksumException => CorruptRead
    case _: java.net.SocketTimeoutException => ReadTimeout
    case _: java.io.InterruptedIOException => Cancelled
    case _: java.io.FileNotFoundException => PartialVisibility
    case _: java.util.concurrent.TimeoutException => ReadTimeout
    case _: org.apache.spark.sql.AnalysisException => Logic
    case _: graft.streaming.GraftConfigException => Logic
    case _: java.io.IOException => TransientIo
    case e if e.getCause != null && e.getCause != e => classify(e.getCause)
    case _ => Unknown
  }

  /** Retryable = the transient storage-I/O families above; logic,
    * permission and cancellation errors are not retried.
    */
  def isRetryable(t: Throwable): Boolean = classify(t).retryable

  def withRetry[A](maxRetries: Int = 3, waitMs: Long = 1000L,
      jitterMs: Long = 1000L)(body: => A): A = {
    var attempt = 0
    while (true) {
      try return body
      catch {
        case t: Throwable if isRetryable(t) && attempt < maxRetries =>
          attempt += 1
          // deterministic-ish jitter (reference: random 0-1000 ms,
          // `BigQueryWriter.java:187-190`)
          val jitter = (System.nanoTime() % math.max(jitterMs, 1)).abs
          Thread.sleep(waitMs + jitter)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** R3/R4 — adaptive append: evolve the destination schema from the
    * observed batch (gated by policy) before appending, so "no such
    * field" never happens — the proactive form of the reference's
    * insert-fail-then-fix loop, applied to both the staging and dest
    * schema in one step (`UpsertDeleteBigQueryWriter.java:66-93`).
    */
  def adaptiveAppend(table: WarehouseTable, df: DataFrame,
      policy: EvolutionPolicy = EvolutionPolicy(),
      partitionTimeCol: String = "partitionTime"): Unit = {
    val observed = org.apache.spark.sql.types.StructType(
      df.schema.fields.filterNot(_.name == partitionTimeCol))
    table.evolveSchema(observed, policy)
    withRetry()(table.append(df, partitionTimeCol))
  }
}
