package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Iterate

/** The shared fixed-point harness's contract: termination on frontier
  * emptiness, the maxRounds bound, absorb seeing the post-cut frontier,
  * per-round stats landing in the drainable log (when recording is on),
  * and the r11 fused convergence modes — CountStable's exact stop on
  * monotone peels, FlagSum's embedded change indicator, and FixedRounds'
  * barrier-free loop.
  */
class IterateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark

  test("terminates when the frontier empties; rounds and stats agree") {
    import spark.implicits._
    Iterate.setRecording(true)
    try {
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
    } finally Iterate.setRecording(false)
  }

  test("recording is opt-in: nothing accumulates while disabled (ADVICE r10)") {
    import spark.implicits._
    Iterate.setRecording(false)
    val f0 = (1 to 3).toDF("n")
    Iterate.fixedPoint("spec_silent", f0, (), 10) { (r, f, _) =>
      (f.filter(col("n") > r), ())
    } { (_, s) => s }
    assert(Iterate.drainRounds().isEmpty)
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

  test("CountStable stops exactly when a monotone peel's count repeats") {
    import spark.implicits._
    // peel: keep n > round while round <= 3, then stabilize at {4, 5}
    val f0 = (1 to 5).toDF("n")
    val rounds = scala.collection.mutable.ArrayBuffer[Int]()
    val last = Iterate.fixedPoint("spec_cs", f0, f0, 100,
        conv = Iterate.CountStable) { (r, f, _) =>
      rounds += r
      (f.filter(col("n") > math.min(r, 3)), f)
    } { (f, _) => f }
    // rounds: r1 → {2..5} (4), r2 → {3,4,5} (3), r3 → {4,5} (2),
    // r4 → {4,5} (2 == prev) stop. Exactly 4 round calls.
    assert(rounds.toSeq == (1 to 4))
    assert(last.as[Int].collect().sorted.toSeq == Seq(4, 5))
  }

  test("CountStable stops after the frontier empties (no infinite spin)") {
    import spark.implicits._
    val f0 = (1 to 2).toDF("n")
    var calls = 0
    Iterate.fixedPoint("spec_cs0", f0, (), 100,
        conv = Iterate.CountStable) { (_, f, _) =>
      calls += 1
      (f.filter(lit(false)), ())
    } { (_, s) => s }
    assert(calls == 1)
  }

  test("FlagSum stops when the embedded change column sums to zero") {
    import spark.implicits._
    // constant-size frame; the flag decays: round r marks rows with n > r
    val f0 = (1 to 3).toDF("n").withColumn("chg", lit(1L))
    val rounds = scala.collection.mutable.ArrayBuffer[Int]()
    Iterate.fixedPoint("spec_fs", f0, (), 100,
        conv = Iterate.FlagSum("chg")) { (r, f, _) =>
      rounds += r
      (f.select(col("n"), (col("n") > r).cast("long").as("chg")), ())
    } { (_, s) => s }
    // r1: chg for {2,3} → live; r2: {3} → live; r3: none → stop
    assert(rounds.toSeq == (1 to 3))
  }

  test("FixedRounds runs exactly maxRounds with no convergence action") {
    import spark.implicits._
    val f0 = Seq((1, 10)).toDF("n", "v")
    var calls = 0
    val out = Iterate.fixedPoint("spec_fixed", f0, f0, 4,
        conv = Iterate.FixedRounds) { (_, f, _) =>
      calls += 1
      (f.select(col("n"), (col("v") + 1).as("v")), f)
    } { (f, _) => f }
    assert(calls == 4)
    // the chain of lazily-cut rounds still computes correctly end-to-end
    assert(out.select("v").as[Int].head() == 14)
  }
}
