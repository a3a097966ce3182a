package graft.util

/** Machine-load gating for measurement mains (`Bench`, `ExponentSweep`).
  *
  * Round-15's official bench artifact was captured at 1-min loadavg
  * 10.2 and contradicted the round's quiet-machine claims; round-16's
  * 100× sweep recorded loadavg 9.88 at tier start while being billed
  * as clean. The rule since: every timed tier (and, for the sweep's
  * expensive arms, every ARM) waits until the 1-min loadavg drops
  * below a threshold before its timer starts, and the artifact records
  * both the gate configuration and any timeout — so a loaded machine
  * can never silently become the artifact of record; at worst the
  * artifact is self-invalidating.
  *
  * Our own just-finished work inflates the 1-min average too; that
  * decays with a ~60 s time constant, which the polling wait absorbs.
  * Configuration (same env contract as the original `Bench` gate):
  * `SPARK_GRAFT_LOADGATE` threshold (default 4.0 on this 32-cpu box;
  * 0 disables), `SPARK_GRAFT_LOADGATE_MAX_WAIT_S` (default 300).
  */
object LoadGate {

  /** Raw `/proc/loadavg` line ("n/a" off-Linux). */
  def loadavg(): String =
    try java.nio.file.Files.readString(
      java.nio.file.Paths.get("/proc/loadavg")).trim
    catch { case _: Throwable => "n/a" }

  /** 1-minute loadavg, or -1.0 when unreadable. */
  def loadavg1(): Double =
    try loadavg().split("\\s+")(0).toDouble
    catch { case _: Throwable => -1.0 }

  val threshold: Double =
    sys.env.getOrElse("SPARK_GRAFT_LOADGATE", "4.0").toDouble
  val maxWaitMs: Long =
    sys.env.getOrElse("SPARK_GRAFT_LOADGATE_MAX_WAIT_S", "300").toLong * 1000L

  /** `waited`: the gate slept at least once. `timedOut`: the deadline
    * passed with load still above threshold — the caller's tier runs
    * anyway but must be flagged in the artifact. `loadAtRelease`: the
    * full loadavg line at the moment the timer may start.
    */
  final case class Outcome(waited: Boolean, timedOut: Boolean,
      loadAtRelease: String)

  /** Poll until the 1-min loadavg drops below [[threshold]] or
    * [[maxWaitMs]] elapses; log progress to stderr under `tier`.
    */
  def awaitQuiet(tier: String): Outcome = {
    if (threshold <= 0) return Outcome(waited = false, timedOut = false, loadavg())
    val deadline = System.nanoTime() + maxWaitMs * 1000000L
    var l = loadavg1()
    var waited = false
    while (l >= 0 && l > threshold && System.nanoTime() < deadline) {
      waited = true
      System.err.println(
        s"[loadgate] ($tier): loadavg $l > $threshold, waiting")
      Thread.sleep(15000L)
      l = loadavg1()
    }
    val timedOut = l > threshold
    if (timedOut)
      System.err.println(s"[loadgate] ($tier): TIMED OUT at loadavg $l — " +
        "this tier's figures are load-contaminated")
    Outcome(waited, timedOut, loadavg())
  }
}
