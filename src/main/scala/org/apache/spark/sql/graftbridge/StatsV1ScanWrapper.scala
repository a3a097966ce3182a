package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.read.{Statistics, SupportsReportStatistics, V1Scan}
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2ScanRelation, PushedDownOperators, V1ScanWrapper}
import org.apache.spark.sql.sources.Filter

/** [[V1ScanWrapper]] that forwards the wrapped V1 scan's statistics.
  *
  * `V2ScanRelationPushDown` wraps every `V1Scan` in a plain
  * `V1ScanWrapper`, which does NOT mix in [[SupportsReportStatistics]]
  * even when the underlying scan does — so a V1-bridged catalog table
  * always reports `defaultSizeInBytes` (effectively infinite) and is
  * never eligible for auto-broadcast, no matter how small its pruned
  * footprint is. This subclass keeps the wrapper's identity (the
  * physical strategy's `V1ScanWrapper(scan, pushed, ops)` pattern and
  * case-class equality both still match — execution is byte-for-byte
  * the same V1 fallback) while exposing the scan's estimate to
  * `DataSourceV2ScanRelation.computeStats`.
  */
class StatsV1ScanWrapper(v1: V1Scan with SupportsReportStatistics,
    handled: Seq[Filter], ops: PushedDownOperators)
    extends V1ScanWrapper(v1, handled, ops) with SupportsReportStatistics {
  override def estimateStatistics(): Statistics = v1.estimateStatistics()
  // MUST differ from the plain wrapper under case-class equality: the
  // rewrite runs inside TreeNode.transformDown, whose fastEquals check
  // (`this == afterRule`) silently DISCARDS a replacement node equal to
  // the original — inherited equals compares only the three fields, so
  // without this the stats never land (found by the no-op rewrite).
  override def canEqual(that: Any): Boolean = that.isInstanceOf[StatsV1ScanWrapper]
  override def equals(that: Any): Boolean = that match {
    case s: StatsV1ScanWrapper => super.equals(s)
    case _ => false
  }
  override def hashCode(): Int = super.hashCode() * 31 + 1
}

/** Pre-CBO optimizer rule (runs AFTER the early scan-pushdown batch
  * that creates the wrappers, BEFORE join planning reads stats):
  * re-wraps any stats-capable V1 scan so its size estimate reaches
  * Catalyst. No-op for scans that don't report statistics.
  */
object ForwardV1ScanStats extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case r: DataSourceV2ScanRelation => r.scan match {
      case w: V1ScanWrapper if !w.isInstanceOf[SupportsReportStatistics] =>
        w.v1Scan match {
          case s: V1Scan with SupportsReportStatistics =>
            r.copy(scan = new StatsV1ScanWrapper(
              s, w.handledFilters, w.pushedDownOperators))
          case _ => r
        }
      case _ => r
    }
  }
}
