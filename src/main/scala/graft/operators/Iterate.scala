package graft.operators

import org.apache.spark.sql.DataFrame

/** Shared fixed-point driver for the iterative operator family (Closure,
  * TemporalReach, MaximalIndependentSet, ShortestPath, KCore, LabelProp,
  * Components, KTruss, Hits) — ONE implementation of the loop plumbing
  * each operator used to re-state: the per-round [[Lineage.cut]] of the
  * frontier, the emptiness barrier, the round counter against
  * `maxRounds`, and per-round wall-time capture.
  *
  * Deliberately NOT on the harness: [[PageRank]] and [[Walks]] build one
  * lazy pipelined plan across iterations (no per-round barrier exists to
  * instrument — adding one would regress their single-job design), and
  * [[StableMatching]] terminates on grouped-count comparisons rather than
  * frontier emptiness.
  *
  * Contract per round `r` (1-based): `round(r, frontier, state)` returns
  * the next `(frontier, state)`. The harness cuts the returned frontier's
  * lineage and runs the emptiness test; `absorb(cutFrontier, state)` then
  * folds the MATERIALIZED frontier into the carried state — state updates
  * that reference the frontier must happen there, not in `round`, so the
  * carried plan embeds the flat post-cut scan instead of the round's whole
  * derivation (the plan-growth bug the per-operator loops each dodged by
  * hand). State the round cuts itself (e.g. a shrinking membership set)
  * can pass through `round`'s return and use `(f, s) => s` as absorb.
  *
  * Timing: every round's wall ms (round body + cut + emptiness barrier —
  * i.e. the full driver barrier, the fixed-overhead floor that dominates
  * iterative cost at fixture scale) is recorded under `label`;
  * [[drainRounds]] hands the log to Bench, which writes it beside
  * bench_passes.json so the barrier floor is measured, not inferred.
  */
object Iterate {
  final case class RoundStat(label: String, round: Int, ms: Double)

  private val roundLog = new java.util.concurrent.ConcurrentLinkedQueue[RoundStat]()

  /** Drain and return all per-round stats recorded since the last drain. */
  def drainRounds(): Seq[RoundStat] = {
    val out = scala.collection.mutable.ArrayBuffer[RoundStat]()
    var r = roundLog.poll()
    while (r != null) { out += r; r = roundLog.poll() }
    out.toSeq
  }

  /** Run `round` from (frontier0, state0) until the frontier empties or
    * `maxRounds` rounds elapse; returns the final state.
    *
    * `cutFrontier = false` skips the frontier materialization — for
    * operators whose "frontier" is only a convergence PROBE (a difference
    * set the next round never reads, e.g. the peel family's dropped set),
    * where a checkpoint would add a write for a frame used exactly once
    * by the emptiness test.
    */
  def fixedPoint[S](label: String, frontier0: DataFrame, state0: S, maxRounds: Int,
      cutFrontier: Boolean = true)(
      round: (Int, DataFrame, S) => (DataFrame, S))(
      absorb: (DataFrame, S) => S): S = {
    var frontier = frontier0
    var state = state0
    var r = 0
    var live = !frontier.isEmpty
    while (r < maxRounds && live) {
      r += 1
      val t0 = System.nanoTime()
      val (f, s1) = round(r, frontier, state)
      frontier = if (cutFrontier) Lineage.cut(f) else f
      state = absorb(frontier, s1)
      live = !frontier.isEmpty
      roundLog.add(RoundStat(label, r, (System.nanoTime() - t0) / 1e6))
    }
    state
  }
}
