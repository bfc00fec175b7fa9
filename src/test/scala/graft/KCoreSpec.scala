package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.KCore

/** KCore vs an independent in-memory peeling over deterministic
  * pseudo-random graphs, plus shape cases (clique survives its own k,
  * trees vanish at k=2).
  */
class KCoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark

  private def peel(und: Set[(String, String)], k: Int): Set[String] = {
    var alive = und.flatMap(e => Seq(e._1, e._2))
    var changed = true
    while (changed) {
      val deg = und.toSeq.filter(e => alive(e._1) && alive(e._2))
        .groupBy(_._1).map { case (n, es) => n -> es.size }
      val next = alive.filter(n => deg.getOrElse(n, 0) >= k)
      changed = next != alive
      alive = next
    }
    alive
  }

  private def sym(edges: Seq[(String, String)]): Set[(String, String)] =
    edges.filter(e => e._1 != e._2)
      .flatMap(e => Seq(e, (e._2, e._1))).toSet

  test("k-core == in-memory peeling on 8 deterministic random graphs") {
    import spark.implicits._
    var state = 0x2545F4914F6CDD1DL
    def next(bound: Int): Int = {
      state = state * 6364136223846793005L + 1442695040888963407L
      (((state >>> 33) % bound) + bound).toInt % bound
    }
    for (g <- 0 until 8) {
      val n = 6 + next(14)
      val names = (0 until n).map(i => s"n$i")
      val m = 5 + next(4 * n)
      val edges = Seq.fill(m)((names(next(n)), names(next(n))))
      val k = 2 + next(3)
      val expect = peel(sym(edges), k)
      val got = KCore.run(spark,
          KCore.undirect(edges.toDF("name", "dep")), k)
        .collect().map(_.getString(0)).toSet
      assert(got === expect, s"graph $g (n=$n, m=$m, k=$k)")
    }
  }

  test("a 4-clique is its own 3-core; pendant nodes peel off") {
    import spark.implicits._
    val clique = for (a <- 0 until 4; b <- 0 until 4 if a < b) yield (s"c$a", s"c$b")
    val edges = (clique :+ ("c0" -> "p0") :+ ("p0" -> "p1")).toDF("name", "dep")
    val got = KCore.run(spark, KCore.undirect(edges), 3)
      .collect().map(_.getString(0)).toSet
    assert(got === Set("c0", "c1", "c2", "c3"))
  }

  test("a tree has an empty 2-core") {
    import spark.implicits._
    val edges = Seq("a" -> "b", "a" -> "c", "b" -> "d", "b" -> "e").toDF("name", "dep")
    assert(KCore.run(spark, KCore.undirect(edges), 2).isEmpty)
  }
}
