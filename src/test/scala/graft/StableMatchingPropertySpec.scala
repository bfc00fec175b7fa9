package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.StableMatching

/** StableMatching vs the sequential textbook Gale-Shapley reference on
  * LCG-seeded complete preference matrices: the proposer-optimal stable
  * matching is UNIQUE, so the distributed deferred-acceptance rounds must
  * reproduce the sequential algorithm's output exactly, not merely some
  * stable matching.
  */
class StableMatchingPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark

  /** Sequential deferred acceptance (one proposal at a time). */
  private def reference(n: Int, p: Map[(Int, Int), Long],
      a: Map[(Int, Int), Long]): Map[Int, Int] = {
    // each proposer's acceptor list, most-preferred first
    val prefList = (0 until n).map(i =>
      i -> (0 until n).sortBy(j => (p(i -> j), j))).toMap
    val nextIdx = scala.collection.mutable.Map((0 until n).map(_ -> 0): _*)
    val holder = scala.collection.mutable.Map[Int, Int]()
    val free = scala.collection.mutable.Queue((0 until n): _*)
    while (free.nonEmpty) {
      val i = free.dequeue()
      val j = prefList(i)(nextIdx(i))
      nextIdx(i) += 1
      holder.get(j) match {
        case None => holder(j) = i
        case Some(k) =>
          val better = a(j -> i) < a(j -> k) || (a(j -> i) == a(j -> k) && i < k)
          if (better) { holder(j) = i; free.enqueue(k) }
          else free.enqueue(i)
      }
    }
    holder.map { case (j, i) => i -> j }.toMap
  }

  test("matches the sequential reference on 6 pseudo-random instances") {
    import spark.implicits._
    var lcg = 0x9E3779B97F4A7C15L
    def next(bound: Int): Int = {
      lcg = lcg * 6364136223846793005L + 1442695040888963407L
      (((lcg >>> 33) % bound).toInt + bound) % bound
    }
    for (trial <- 1 to 6) {
      val n = 3 + next(4)
      val p = (for (i <- 0 until n; j <- 0 until n) yield (i, j) -> next(1000).toLong).toMap
      val a = (for (i <- 0 until n; j <- 0 until n) yield (i, j) -> next(1000).toLong).toMap
      val prefs = (for (i <- 0 until n; j <- 0 until n)
        yield (s"p$i", s"a$j", p(i -> j), a(j -> i))).toDF("proposer", "acceptor", "p_score", "a_score")
      val got = StableMatching.run(spark, prefs).collect()
        .map(r => r.getString(0).drop(1).toInt -> r.getString(1).drop(1).toInt).toMap
      val want = reference(n, p, (for (((j, i), v) <- a) yield (j, i) -> v))
      assert(got === want, s"trial $trial n=$n")
    }
  }
}
