package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TemporalReach

/** Time-respecting reachability semantics: earliest arrival, the
  * late-then-early unreachable case, and re-relaxation when a better
  * arrival re-enables previously infeasible edges.
  */
class TemporalReachSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark

  private def edges(ts: (String, String, Int)*) = {
    import spark.implicits._
    ts.toDF("name", "dep", "t")
  }

  private def run(g: org.apache.spark.sql.DataFrame, seed: String) =
    TemporalReach.run(spark, g, seed).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("earliest arrival along nondecreasing edge times") {
    val g = edges(("a", "b", 2), ("b", "c", 5), ("a", "c", 9))
    assert(run(g, "a") === Map("a" -> 0L, "b" -> 2L, "c" -> 5L))
  }

  test("statically reachable but temporally unreachable (late edge then early edge)") {
    // a -[5]-> b -[3]-> c: c is reachable ignoring time, but the only
    // chain decreases in time, so no time-respecting path exists
    val g = edges(("a", "b", 5), ("b", "c", 3))
    assert(run(g, "a") === Map("a" -> 0L, "b" -> 5L))
  }

  test("improving an arrival re-enables an edge found infeasible earlier") {
    // First exploration reaches b at 7 (via the t=7 edge, found round 1),
    // making b->c (t=4) infeasible; the 2-hop route a->m->b arrives at 3,
    // which must re-relax b and unlock c at 4.
    val g = edges(("a", "b", 7), ("a", "m", 1), ("m", "b", 3), ("b", "c", 4))
    assert(run(g, "a") === Map("a" -> 0L, "m" -> 1L, "b" -> 3L, "c" -> 4L))
  }

  test("cycle terminates; equal times are allowed (nondecreasing, not strict)") {
    val g = edges(("a", "b", 2), ("b", "a", 2), ("b", "c", 2))
    assert(run(g, "a") === Map("a" -> 0L, "b" -> 2L, "c" -> 2L))
  }

  test("min over parallel chains wins, not the first found") {
    val g = edges(("a", "b", 8), ("a", "x", 1), ("x", "b", 2))
    assert(run(g, "a")("b") === 2L)
  }
}
