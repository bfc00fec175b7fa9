package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Components

/** Components vs an independent union-find reference over deterministic
  * pseudo-random graphs (LCG-seeded — no RNG nondeterminism across runs):
  * label propagation must agree with path-compressed union-find on every
  * graph shape the generator produces (dense clusters, bridges, isolates
  * never appear — only edge-connected nodes are labeled, matching the
  * operator's contract).
  */
class ComponentsPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // root each node fully, then map every root to the min member id
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, members) =>
      val m = members.min
      members.map(_ -> m)
    }.toMap
  }

  test("connected == union-find on 8 deterministic random graphs") {
    import spark.implicits._
    var state = 0x9E3779B97F4A7C15L
    def next(bound: Int): Int = {
      state = state * 6364136223846793005L + 1442695040888963407L
      (((state >>> 33) % bound) + bound).toInt % bound
    }
    for (g <- 0 until 8) {
      val n = 6 + next(20)
      val m = 3 + next(2 * n)
      val edges = Seq.fill(m)((next(n).toLong, next(n).toLong))
      val expect = unionFind(edges)
      val got = Components.connected(spark, edges.toDF("src", "dst")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expect, s"graph $g (n=$n, m=$m, edges=$edges)")
    }
  }
}
