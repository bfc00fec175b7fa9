package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Closure, ShortestPath}

/** ShortestPath vs an independent in-memory Dijkstra over deterministic
  * pseudo-random node-weighted graphs, plus the unit-weight identity:
  * with every node weight 1, min path cost == BFS depth + 1 (path node
  * count), tying the Bellman-Ford loop to Closure's proven BFS.
  */
class ShortestPathSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark

  private def dijkstra(edges: Seq[(String, String)], w: Map[String, Long],
      seed: String): Map[String, Long] = {
    val adj = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val dist = scala.collection.mutable.Map[String, Long]()
    val pq = scala.collection.mutable.PriorityQueue[(Long, String)]()(
      Ordering.by(-_._1))
    if (w.contains(seed)) { dist(seed) = w(seed); pq.enqueue((w(seed), seed)) }
    while (pq.nonEmpty) {
      val (d, u) = pq.dequeue()
      if (d == dist(u)) {
        adj.getOrElse(u, Nil).foreach { v =>
          w.get(v).foreach { wv =>
            val nd = d + wv
            if (dist.get(v).forall(nd < _)) { dist(v) = nd; pq.enqueue((nd, v)) }
          }
        }
      }
    }
    dist.toMap
  }

  test("min-cost distances == Dijkstra on 8 deterministic random graphs") {
    import spark.implicits._
    var state = 0x51AF9E3779B97F4AL
    def next(bound: Int): Int = {
      state = state * 6364136223846793005L + 1442695040888963407L
      (((state >>> 33) % bound) + bound).toInt % bound
    }
    for (g <- 0 until 8) {
      val n = 5 + next(12)
      val names = (0 until n).map(i => s"n$i")
      val m = 4 + next(3 * n)
      val edges = Seq.fill(m)((names(next(n)), names(next(n))))
      val w = names.map(nm => nm -> (1L + next(9))).toMap
      val seed = names(next(n))
      val expect = dijkstra(edges, w, seed)
      val got = ShortestPath.run(spark, edges.toDF("name", "dep"),
          w.toSeq.toDF("name", "wt"), seed)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === expect, s"graph $g (n=$n, m=$m, seed=$seed)")
    }
  }

  test("unit weights reduce to BFS: cost == depth + 1") {
    import spark.implicits._
    val edges = Seq("a" -> "b", "b" -> "c", "a" -> "c", "c" -> "d", "d" -> "b")
      .toDF("name", "dep")
    val w = Seq("a", "b", "c", "d").map(_ -> 1L).toDF("name", "wt")
    val costs = ShortestPath.run(spark, edges, w, "a")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val depths = Closure.reachable(spark, edges, "a")
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(costs === depths.map { case (k, d) => k -> (d + 1L) })
  }

  test("nodes missing a weight row are unreachable") {
    import spark.implicits._
    val edges = Seq("a" -> "b", "b" -> "c").toDF("name", "dep")
    val w = Seq("a" -> 2L, "c" -> 1L).toDF("name", "wt") // b has no weight
    val costs = ShortestPath.run(spark, edges, w, "a")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(costs === Map("a" -> 2L)) // the walk cannot pass through b
  }
}
