package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

/** Declarative data-quality audits over warehouse relations — the
  * dbt-test / Deequ-style checks a pipeline runs before promoting a
  * load. Each audit is a plain DataFrame plan (oracle-checkable), not
  * a driver-side loop.
  */
object QualityOps {

  /** One foreign-key relationship to audit: every non-null
    * `child(childKey)` must appear in `parent(parentKey)`.
    */
  final case class FkRelation(
      name: String,
      child: DataFrame,
      childKey: String,
      parent: DataFrame,
      parentKey: String)

  /** Referential-integrity audit: for each declared FK relation, count
    * the child rows whose key has no match in the parent (orphans) and
    * the distinct orphaned key values. Returns one row per relation —
    * `(relation, n_checked, n_orphans, n_orphan_keys)` — so a fully
    * consistent warehouse yields all-zero orphan columns rather than
    * an empty relation (absence of evidence made explicit).
    *
    * == 100 TB design ==
    *
    * Per relation: the child is scanned ONCE with only its key column
    * read (column pruning reaches the parquet scan), the parent is
    * reduced to `DISTINCT parentKey` before the join — so the join's
    * build side is the key cardinality, not the parent row count, and
    * Catalyst broadcasts it whenever it fits (dimension FKs) or falls
    * back to a shuffled hash join on the key (fact-to-fact FKs). The
    * match test is a left join + null probe folded into one partial
    * aggregation; each relation's result is a single row, so the final
    * union moves O(relations) rows.
    */
  def fkOrphans(relations: Seq[FkRelation]): DataFrame = {
    require(relations.nonEmpty, "fkOrphans needs at least one relation")
    relations.map { r =>
      // Compare keys in their NATIVE type: a silent cast-to-long would
      // turn string/UUID keys into NULL and exclude them from the audit
      // entirely (an all-clean report over zero checked rows). Equal
      // types join as-is; two integral types widen losslessly to long;
      // anything else is a declaration error the caller must resolve by
      // casting explicitly — fail loud, never silently skip.
      val ct = r.child.schema(r.childKey).dataType
      val pt = r.parent.schema(r.parentKey).dataType
      def integral(t: DataType) =
        t == ByteType || t == ShortType || t == IntegerType || t == LongType
      val keyType: Option[DataType] = (ct, pt) match {
        case (a, b) if a == b => None
        case (a, b) if integral(a) && integral(b) => Some(LongType)
        case _ => throw new IllegalArgumentException(
          s"fkOrphans(${r.name}): key types $ct vs $pt are not directly " +
            "comparable — cast one side explicitly before declaring the relation")
      }
      def key(df: DataFrame, c: String) = keyType match {
        case Some(t) => df.select(col(c).cast(t).as("__k"))
        case None => df.select(col(c).as("__k"))
      }
      val child = key(r.child, r.childKey).where(col("__k").isNotNull)
      val parent = key(r.parent, r.parentKey)
        .where(col("__k").isNotNull)
        .distinct()
        .withColumn("__hit", lit(1))
      child.join(parent, Seq("__k"), "left")
        .agg(
          count(lit(1)).as("n_checked"),
          sum(when(col("__hit").isNull, 1L).otherwise(0L)).as("n_orphans"),
          count_distinct(when(col("__hit").isNull, col("__k")))
            .as("n_orphan_keys"))
        .select(lit(r.name).as("relation"), col("n_checked"),
          col("n_orphans"), col("n_orphan_keys"))
    }.reduce(_ unionByName _)
  }
}
