package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MaximalIndependentSet

/** MIS invariants over deterministic pseudo-random graphs (LCG-seeded):
  * independence and maximality must hold on every generated shape — the
  * properties are checked against the raw edge list, independent of the
  * operator's own neighborhood bookkeeping.
  */
class MisPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark

  test("independent and maximal on 12 pseudo-random graphs") {
    import spark.implicits._
    var lcg = 0x2545F4914F6CDD1DL
    def next(bound: Int): Int = {
      lcg = lcg * 6364136223846793005L + 1442695040888963407L
      (((lcg >>> 33) % bound).toInt + bound) % bound
    }
    for (trial <- 1 to 12) {
      val n = 5 + next(10)
      val m = next(2 * n) + 1
      val edges = (1 to m).map { _ =>
        val u = next(n); var v = next(n)
        if (v == u) v = (v + 1) % n
        (s"v${math.min(u, v)}", s"v${math.max(u, v)}")
      }.distinct
      val nodes = (0 until n).map(i => s"v$i")
      val mis = MaximalIndependentSet.run(spark,
          nodes.toDF("name"), edges.toDF("a", "b"))
        .collect().map(_.getString(0)).toSet
      edges.foreach { case (a, b) =>
        assert(!(mis(a) && mis(b)), s"trial $trial: edge ($a,$b) inside MIS")
      }
      nodes.filterNot(mis).foreach { v =>
        val nbs = edges.collect { case (a, b) if a == v => b; case (a, b) if b == v => a }
        assert(nbs.exists(mis), s"trial $trial: $v uncovered")
      }
    }
  }
}
