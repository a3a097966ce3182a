package graft.tools

import java.util.concurrent.atomic.AtomicLongArray

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Per-arm I/O accounting for the bench's expensive tiers: accumulates
  * task-level input/output/shuffle/spill bytes between [[reset]] and
  * [[snapshotMb]], so a wall-time outlier is attributable — an
  * I/O-bound rep (same bytes, different seconds: page-cache or disk
  * contention) reads differently from a plan problem (byte volume
  * itself out of family). Added for r16's t24 verdict item: two
  * same-day 100× runs disagreed 3.7× on wall time with no byte
  * evidence to adjudicate which side was I/O noise.
  *
  * Listener delivery is asynchronous; callers sleep briefly (outside
  * any timer) before snapshotting so straggler task-end events drain.
  * Register once per session: `sc.addSparkListener(meter)`.
  */
final class IoMeter extends SparkListener {
  // 0 input read, 1 output written, 2 shuffle read, 3 shuffle written,
  // 4 spilled (memory + disk)
  private val acc = new AtomicLongArray(5)

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
    val tm = e.taskMetrics
    if (tm != null) {
      acc.addAndGet(0, tm.inputMetrics.bytesRead)
      acc.addAndGet(1, tm.outputMetrics.bytesWritten)
      acc.addAndGet(2, tm.shuffleReadMetrics.totalBytesRead)
      acc.addAndGet(3, tm.shuffleWriteMetrics.bytesWritten)
      acc.addAndGet(4, tm.memoryBytesSpilled + tm.diskBytesSpilled)
      ()
    }
  }

  def reset(): Unit = { var i = 0; while (i < 5) { acc.set(i, 0L); i += 1 } }

  /** (read, written, shuffle_read, shuffle_write, spilled) in MiB. */
  def snapshotMb: IndexedSeq[Long] =
    (0 until 5).map(i => acc.get(i) / (1024L * 1024L))
}
