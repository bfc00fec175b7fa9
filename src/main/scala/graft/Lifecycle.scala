package graft

/** Wall-clock meter for the STORE-BUILD phase inside lifecycle-class
  * judged queries (VERDICT r16 item 6): queries like q287/q313/q315 build
  * a scratch store per invocation because the lifecycle IS the judged
  * subject, so their bench cost mixes "build the store" with "run the
  * consumer". Each such query wraps its build phase in [[time]]; Bench
  * drains the accumulator around every timed run and reports the split —
  * per query per pass in bench_passes.json, and one `lifecycle_builds_sec`
  * total in the JSON line — so the artifact's top-line seconds can be read
  * net of builds without re-deriving anything.
  *
  * Thread-safe and nesting-safe (an inner [[time]] span inside an outer
  * one would double-count, so re-entrant calls on the same thread only
  * meter the outermost span). Costs one AtomicLong add per build phase —
  * nothing on the query path.
  */
object LifecycleMeter {
  private val nanos = new java.util.concurrent.atomic.AtomicLong()
  private val depth = new ThreadLocal[Integer] { override def initialValue = 0 }

  /** Meter `f` as store-build time (outermost span per thread only). */
  def time[T](f: => T): T = {
    val d = depth.get()
    depth.set(d + 1)
    val t0 = System.nanoTime()
    try f
    finally {
      depth.set(d)
      if (d == 0) { nanos.addAndGet(System.nanoTime() - t0); () }
    }
  }

  /** Seconds accumulated since the last drain; resets the meter. */
  def drainSec(): Double = nanos.getAndSet(0L) / 1e9
}
