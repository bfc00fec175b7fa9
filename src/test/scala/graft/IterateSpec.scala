package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Iterate

/** The shared fixed-point harness's contract: termination on frontier
  * emptiness, the maxRounds bound, absorb seeing the post-cut frontier,
  * and per-round stats landing in the drainable log.
  */
class IterateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark

  test("terminates when the frontier empties; rounds and stats agree") {
    import spark.implicits._
    Iterate.drainRounds()
    // countdown: frontier shrinks by one row per round → exactly 5 rounds
    val f0 = (1 to 5).toDF("n")
    val rounds = scala.collection.mutable.ArrayBuffer[Int]()
    val last = Iterate.fixedPoint("spec_countdown", f0, 0, 100) { (r, f, _) =>
      rounds += r
      (f.filter(col("n") > r), r)
    } { (_, s) => s }
    assert(last == 5)
    assert(rounds.toSeq == (1 to 5))
    val stats = Iterate.drainRounds().filter(_.label == "spec_countdown")
    assert(stats.map(_.round) == (1 to 5))
    assert(stats.forall(_.ms >= 0))
  }

  test("maxRounds bounds the loop even with a never-empty frontier") {
    import spark.implicits._
    val f0 = Seq(1).toDF("n")
    var calls = 0
    Iterate.fixedPoint("spec_bound", f0, (), 3) { (_, f, _) =>
      calls += 1
      (f, ())
    } { (_, s) => s }
    assert(calls == 3)
  }

  test("an initially empty frontier runs zero rounds") {
    import spark.implicits._
    val f0 = Seq(1).toDF("n").filter(lit(false))
    var calls = 0
    Iterate.fixedPoint("spec_empty", f0, (), 10) { (_, f, _) =>
      calls += 1
      (f, ())
    } { (_, s) => s }
    assert(calls == 0)
  }

  test("absorb receives the materialized frontier and can fold it into state") {
    import spark.implicits._
    val f0 = (1 to 4).toDF("n")
    // state accumulates the frontier row count seen by absorb each round
    val total = Iterate.fixedPoint("spec_absorb", f0, 0L, 10) { (r, f, s) =>
      (f.filter(col("n") > r), s)
    } { (f, s) => s + f.count() }
    // frontiers after rounds 1..4 have 3, 2, 1, 0 rows
    assert(total == 6L)
  }
}
