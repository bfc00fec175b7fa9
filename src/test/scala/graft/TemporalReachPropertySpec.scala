package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TemporalReach

/** TemporalReach vs an independent in-memory earliest-arrival reference
  * over deterministic pseudo-random temporal graphs (LCG-seeded — no RNG
  * nondeterminism across runs): the distributed relaxation must agree
  * with sequential Dijkstra-style label-correcting on every generated
  * shape, including late-then-early chains (statically reachable nodes
  * with NO time-respecting path) and arrival improvements that re-enable
  * previously infeasible edges.
  */
class TemporalReachPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark

  /** Sequential earliest-arrival reference: label-correcting to fixpoint. */
  private def reference(edges: Seq[(Int, Int, Int)], seed: Int): Map[Int, Long] = {
    val arr = scala.collection.mutable.Map[Int, Long](seed -> 0L)
    var changed = true
    while (changed) {
      changed = false
      edges.foreach { case (u, v, t) =>
        arr.get(u).foreach { au =>
          if (t >= au && arr.get(v).forall(t < _)) { arr(v) = t.toLong; changed = true }
        }
      }
    }
    arr.toMap
  }

  test("agrees with the sequential reference on 20 pseudo-random temporal graphs") {
    import spark.implicits._
    var lcg = 0x5DEECE66DL
    def next(bound: Int): Int = {
      lcg = lcg * 6364136223846793005L + 1442695040888963407L
      (((lcg >>> 33) % bound).toInt + bound) % bound
    }
    for (trial <- 1 to 20) {
      val n = 4 + next(8)
      val m = n + next(2 * n)
      val edges = (1 to m).map { _ =>
        val u = next(n); var v = next(n)
        if (v == u) v = (v + 1) % n
        (u, v, next(6))
      }.distinct
      val df = edges.map { case (u, v, t) => (s"n$u", s"n$v", t) }.toDF("name", "dep", "t")
      val got = TemporalReach.run(spark, df, "n0").collect()
        .map(r => r.getString(0).drop(1).toInt -> r.getLong(1)).toMap
      val want = reference(edges, 0)
      assert(got === want, s"trial $trial: n=$n edges=$edges")
    }
  }
}
