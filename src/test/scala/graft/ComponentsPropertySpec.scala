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

  test("connectedStars == connected == union-find on 8 deterministic random graphs") {
    import spark.implicits._
    var state = 0x51AF37B8C4D96A23L
    def next(bound: Int): Int = {
      state = state * 6364136223846793005L + 1442695040888963407L
      (((state >>> 33) % bound) + bound).toInt % bound
    }
    for (g <- 0 until 8) {
      val n = 6 + next(20)
      val m = 3 + next(2 * n)
      val edges = Seq.fill(m)((next(n).toLong, next(n).toLong))
      val df = edges.toDF("src", "dst")
      val expect = unionFind(edges)
      val stars = Components.connectedStars(spark, df).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val prop = Components.connected(spark, df).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(stars === expect, s"stars vs union-find, graph $g (edges=$edges)")
      assert(stars === prop, s"stars vs label-propagation, graph $g (edges=$edges)")
    }
  }

  test("connectedStars collapses a 200-node chain in O(log d) rounds, not diameter") {
    // the adversarial shape for label propagation: a path graph of
    // diameter 199 would need ~200 propagation rounds; the star operators
    // must finish within the default maxIter=32 budget (doubly-exponential
    // contraction) AND still label every node with the chain's min id.
    import spark.implicits._
    val chain = (0L until 199L).map(i => (i, i + 1))
    val got = Components.connectedStars(spark, chain.toDF("src", "dst")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === 200)
    assert(got.values.forall(_ === 0L), "every chain node must label to the min id 0")
  }

  test("incremental(base labels, delta) == connected(full) on 8 random graph/delta splits") {
    import spark.implicits._
    var state = 0x7C15D96A23B8F4A7L
    def next(bound: Int): Int = {
      state = state * 6364136223846793005L + 1442695040888963407L
      (((state >>> 33) % bound) + bound).toInt % bound
    }
    for (g <- 0 until 8) {
      val n = 6 + next(20)
      val m = 4 + next(2 * n)
      val edges = Seq.fill(m)((next(n).toLong, next(n).toLong))
      // random split — delta may touch nodes the base never saw, merge
      // several base components, or be entirely novel
      val (base, delta) = edges.partition(_ => next(3) != 0)
      val baseLab = Components.connected(spark, base.toDF("src", "dst"))
      val got = Components.incremental(spark, baseLab, delta.toDF("src", "dst"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val expect = unionFind(edges)
      assert(got === expect, s"graph $g (base=$base, delta=$delta)")
    }
  }

  test("incremental with an empty delta returns the base labels unchanged") {
    import spark.implicits._
    val base = Seq((1L, 2L), (2L, 3L), (8L, 9L)).toDF("src", "dst")
    val lab = Components.connected(spark, base)
    val got = Components.incremental(spark, lab,
        Seq.empty[(Long, Long)].toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 8L -> 8L, 9L -> 8L))
  }

  test("connectedStars handles self-loops and isolated-in-edges nodes like connected") {
    import spark.implicits._
    val edges = Seq((7L, 7L), (1L, 2L), (2L, 1L)).toDF("src", "dst")
    val stars = Components.connectedStars(spark, edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val prop = Components.connected(spark, edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(stars === Map(7L -> 7L, 1L -> 1L, 2L -> 1L))
    assert(stars === prop)
  }

  test("connectedStars on a degenerate graph: self-loops only (empty canonical edge set)") {
    // ADVICE r11: the zero-round path returned the unflagged state0 and the
    // post-loop `filter(__l.isNotNull)` threw UNRESOLVED_COLUMN. Every node
    // must come back self-labeled.
    import spark.implicits._
    val edges = Seq((3L, 3L), (11L, 11L)).toDF("src", "dst")
    val stars = Components.connectedStars(spark, edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(stars === Map(3L -> 3L, 11L -> 11L))
  }

  test("connectedStars on an empty edge frame returns an empty labeling") {
    import spark.implicits._
    val stars = Components.connectedStars(spark,
      Seq.empty[(Long, Long)].toDF("src", "dst")).collect()
    assert(stars.isEmpty)
  }
}
