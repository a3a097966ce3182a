package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge exposing the `private[sql]` Column ⇄ Expression
  * converters to the graft engine — the supported pattern for
  * third-party native expressions (the converters live in
  * `org.apache.spark.sql.classic.ExpressionUtils`, Spark 4's
  * columnNodeSupport).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Re-wrap a streaming Sink.addBatch dataset as a BATCH frame over
    * the already-planned incremental RDD — the FileStreamSink /
    * DeltaSink pattern (`internalCreateDataFrame(qe.toRdd, schema,
    * isStreaming = false)`): plans derived from the raw addBatch frame
    * would otherwise fail with "queries with streaming sources must be
    * executed with writeStream".
    */
  def asBatch(df: org.apache.spark.sql.classic.DataFrame)
      : org.apache.spark.sql.classic.DataFrame =
    df.sparkSession.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)

  /** The inverse wrap, for a V1 streaming Source's getBatch: the
    * micro-batch engine requires the returned frame to be tagged
    * streaming (`assert(df.isStreaming)`), while the source computes it
    * with ordinary batch plans over the commit manifests.
    */
  def asStream(df: org.apache.spark.sql.classic.DataFrame)
      : org.apache.spark.sql.classic.DataFrame =
    df.sparkSession.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)

  /** Spark-managed memory in use (storage + execution pools), for the
    * soak probe's driver-vs-task heap attribution: in local mode one
    * JVM hosts driver AND executors, so `usedHeap − sparkManaged`
    * approximates the DRIVER-side footprint (manifests, blooms,
    * collects, JVM overhead) that the soak arm exists to witness.
    */
  def sparkManagedMemoryUsed(): Long = {
    val env = org.apache.spark.SparkEnv.get
    if (env == null) 0L
    else env.memoryManager.storageMemoryUsed +
      env.memoryManager.executionMemoryUsed
  }

  /** The two managed pools separately, one near-atomic sample — so a
    * memory witness can report storage (cached blocks) and execution
    * (task shuffle/sort pages) peaks on their own instead of only the
    * opaque sum.
    */
  def sparkPoolsUsed(): (Long, Long) = {
    val env = org.apache.spark.SparkEnv.get
    if (env == null) (0L, 0L)
    else (env.memoryManager.storageMemoryUsed,
      env.memoryManager.executionMemoryUsed)
  }

  /** Drain the listener bus (private[spark]) — lets a test read
    * listener-accumulated metrics deterministically after an action.
    */
  def waitUntilListenerBusEmpty(sc: org.apache.spark.SparkContext,
      timeoutMs: Long = 30000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)

  /** Wrap an analyzed logical plan back into a DataFrame (the
    * `Dataset.ofRows` the DML commands use to hand a statement's
    * source subtree — exprIds intact — to the merge executor).
    */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
