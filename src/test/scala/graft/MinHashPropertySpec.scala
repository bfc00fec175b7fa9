package graft

import org.scalatest.funsuite.AnyFunSuite

/** MinHash correctness property (SURVEY.md hard part #4): the banded-LSH
  * estimate must track true Jaccard. Implemented in plain Scala with the
  * SAME hash family as Dedup.q42 (md5 31-bit base → universal (a*x+b) mod
  * p), so this validates the family itself, not just the SQL wiring.
  */
class MinHashPropertySpec extends AnyFunSuite {
  private val P = 2147483647L
  private val K = 64 // more functions than q42 for a tighter estimate

  private def base(sh: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(sh.getBytes("UTF-8")).take(4).map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex, 16) % P
  }
  private def sig(set: Set[String]): Array[Long] = {
    val bases = set.map(base)
    Array.tabulate(K)(i => bases.map(x => ((2L * i + 3) * x + 5L * i + 7) % P).min)
  }
  private def estimate(a: Set[String], b: Set[String]): Double = {
    val (sa, sb) = (sig(a), sig(b))
    sa.zip(sb).count { case (x, y) => x == y }.toDouble / K
  }
  private def jaccard(a: Set[String], b: Set[String]): Double =
    a.intersect(b).size.toDouble / a.union(b).size

  test("minhash estimate tracks true jaccard within 3*stderr across overlap levels") {
    val rng = new scala.util.Random(42)
    val universe = Vector.tabulate(400)(i => s"tok-$i-${rng.nextInt(1000)}")
    for (overlap <- Seq(0.0, 0.25, 0.5, 0.75, 0.9, 1.0)) {
      val core = universe.take((100 * overlap).toInt).toSet
      val a = core ++ universe.slice(100, 200 - (100 * overlap).toInt / 2).toSet
      val b = core ++ universe.slice(250, 350 - (100 * overlap).toInt / 2).toSet
      val j = jaccard(a, b)
      val est = estimate(a, b)
      val stderr = math.sqrt(j * (1 - j) / K) max 0.02
      assert(math.abs(est - j) <= 3 * stderr,
        s"overlap=$overlap true=$j est=$est tolerance=${3 * stderr}")
    }
  }

  test("identical sets always collide in every band; disjoint sets rarely do") {
    val a = (0 until 80).map(i => s"sh-$i").toSet
    assert(estimate(a, a) === 1.0)
    val b = (1000 until 1080).map(i => s"sh-$i").toSet
    assert(estimate(a, b) < 0.15) // K=64: expected 0, generous bound
  }
}
