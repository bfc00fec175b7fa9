package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.StableMatching

/** Gale-Shapley invariants: a hand-computed instance, perfection, and the
  * no-blocking-pair property on adversarial/random preferences.
  */
class StableMatchingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark

  private def prefs(rows: (String, String, Long, Long)*) = {
    import spark.implicits._
    rows.toDF("proposer", "acceptor", "p_score", "a_score")
  }

  private def matchOf(p: org.apache.spark.sql.DataFrame) =
    StableMatching.run(spark, p).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap

  test("hand-computed 3x3 deferred acceptance") {
    // p1: A > B > C; p2: A > C > B; p3: B > A > C
    // A: p2 > p1 > p3; B: p1 > p3 > p2; C: p3 > p2 > p1
    val p = prefs(
      ("p1", "A", 1, 2), ("p1", "B", 2, 1), ("p1", "C", 3, 3),
      ("p2", "A", 1, 1), ("p2", "B", 3, 3), ("p2", "C", 2, 2),
      ("p3", "A", 2, 3), ("p3", "B", 1, 2), ("p3", "C", 3, 1))
    // Round 1: p1,p2 -> A (A keeps p2, rejects p1); p3 -> B (keeps).
    // Round 2: p1 -> B; B prefers p1 over p3, rejects p3.
    // Round 3: p3 -> A; A keeps p2, rejects p3. Round 4: p3 -> C.
    assert(matchOf(p) === Map("p1" -> "B", "p2" -> "A", "p3" -> "C"))
  }

  test("matching is perfect and stable on deterministic pseudo-random preferences") {
    import spark.implicits._
    val n = 8
    val rows = for (i <- 0 until n; j <- 0 until n) yield {
      val ps = graft.functions.HllSketch.hash60(s"p:$i:$j") % 100000
      val as = graft.functions.HllSketch.hash60(s"a:$j:$i") % 100000
      (s"p$i", s"a$j", ps, as)
    }
    val p = rows.toDF("proposer", "acceptor", "p_score", "a_score")
    val m = StableMatching.run(spark, p)
    assert(m.count() === n)
    assert(m.select("acceptor").distinct().count() === n)
    val blocking = p.as("x")
      .join(m.join(p, Seq("proposer", "acceptor")).select(col("proposer"), col("p_score").as("mp")), "proposer")
      .join(m.join(p, Seq("proposer", "acceptor")).select(col("acceptor"), col("a_score").as("ma")), "acceptor")
      .filter(col("x.p_score") < col("mp") && col("x.a_score") < col("ma"))
    assert(blocking.isEmpty, "stable matching must admit no blocking pair")
  }

  test("proposer-optimal: unanimous favorite acceptor goes to her favorite proposer") {
    // every proposer ranks A first; A ranks p2 first -> p2 gets A
    val p = prefs(
      ("p1", "A", 1, 2), ("p1", "B", 2, 1),
      ("p2", "A", 1, 1), ("p2", "B", 2, 2))
    assert(matchOf(p)("p2") === "A")
  }
}
