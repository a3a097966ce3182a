package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A3/A4 — batch bookkeeping operators. In the reference these drive the
  * commit protocol (`MergeBatches.java:175-191, 305-335`); in Spark the
  * micro-batch engine owns commits, but the relational operators remain
  * useful for monitoring/auditing staged data and are part of the §2
  * inventory.
  */
object BatchOps {

  /** A3 — rows per staged batch (`MergeBatches.java:175-191`):
    * `groupBy(batchNumber).count()` with map-side partial aggregation.
    */
  def batchRowCounts(staged: DataFrame): DataFrame =
    staged.groupBy(col("batchNumber")).agg(count(lit(1)).as("n_rows"))

  /** A4 — committable offset per (topic, partition)
    * (`MergeBatches.java:305-335`): max written offset + 1, the offset
    * the reference returns from `preCommit`.
    */
  def maxOffsets(df: DataFrame): DataFrame =
    df.groupBy(col("topic"), col("partition"))
      .agg((max(col("offset")) + 1).as("commit_offset"))
}
