package graft

/** Targeted log hygiene for the driver-facing mains (VERDICT r10 item 7).
  *
  * The bounded global windows in this engine (sketch-register walks, day
  * dimensions, top-k picks over pre-aggregated frames — all documented
  * bounded-by-design at their call sites) make WindowExec emit a
  * `No Partition Defined` warning PER EXECUTION; at 271 bench queries ×
  * 3 passes the spam flooded the driver's 2000-char output tail and
  * displaced the bench JSON line. A dummy constant partition key does not
  * help — Catalyst folds foldable partition expressions back to an empty
  * spec — so the honest switch is the logger itself: this demotes exactly
  * that one logger to ERROR, leaving every other WARN (including other
  * window warnings) intact.
  */
object Logs {
  def quietBoundedWindowWarnings(): Unit =
    try org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    catch { case _: Throwable => () } // log config must never fail a run
}
