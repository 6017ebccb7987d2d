package graft.functions

/** Opt-in wall-clock instrumentation for the composed verbs
  * (retrain/swap, audits, trainers): `GRAFT_TIMING=1` prints one
  * stderr line per wrapped block so a bench probe can attribute a
  * multi-second verb to its stages without touching the measured
  * plans. Off (the default) it is a bare call — no clock read, no
  * allocation beyond the closure the caller already built. */
object Timing {
  private val on = sys.env.get("GRAFT_TIMING").contains("1")

  def t[T](name: String)(body: => T): T =
    if (!on) body
    else {
      val t0 = System.nanoTime()
      try body
      finally System.err.println(
        f"[timing] $name ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
}
