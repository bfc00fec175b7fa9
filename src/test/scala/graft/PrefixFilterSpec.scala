package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** The prefix-filter similarity join (q157's pipeline) against an
  * in-memory brute force on random set fixtures: the AllPairs/PPJoin
  * prefix lemma promises ZERO loss at Jaccard >= 3/5 — every brute-force
  * pair must survive the prefix index, the length filter, and
  * verification, and nothing extra may appear.
  */
class PrefixFilterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark

  private def bruteForce(sets: Map[Long, Set[Long]]): Set[(Long, Long)] = {
    val ids = sets.keys.toSeq.sorted
    (for {
      i <- ids; j <- ids if i < j
      c = (sets(i) & sets(j)).size
      u = (sets(i) | sets(j)).size
      // integer form of jaccard >= 3/5: 8c >= 3(|x|+|y|) <=> 5c >= 3u
      if u > 0 && 8 * c >= 3 * (sets(i).size + sets(j).size)
    } yield (i, j)).toSet
  }

  test("prefix-filtered pairs equal brute force on random set families") {
    import spark.implicits._
    // element universe small enough to force real overlaps; set sizes 1-12
    val setGen = Gen.nonEmptyListOf(Gen.choose(0L, 18L)).map(_.toSet)
    val famGen = Gen.listOfN(14, setGen)
    (0 until 15).foreach { seed =>
      val fam = famGen(Gen.Parameters.default, Seed(seed.toLong)).getOrElse(Nil)
      val sets = fam.zipWithIndex.map { case (s, i) => i.toLong -> s }.toMap
      val hk = sets.toSeq.flatMap { case (id, s) => s.map(e => (id, e)) }
        .toDF("doc_id", "hk")
      val got = graft.queries.Text.prefixFilterPairs(hk)
        .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === bruteForce(sets), s"seed $seed: sets=$sets")
    }
  }

  test("identical sets and threshold-edge pairs (jaccard exactly 3/5) are kept") {
    import spark.implicits._
    // A={1..5}, B={1..5} identical (j=1); C={1,2,3,9,10} vs A: c=3, u=7 →
    // 3/7 < 3/5 dropped; D={1,2,3} vs A/B/C: c=3, u=5 → exactly 3/5 kept
    val rows = Seq(
      (0L, Seq(1L, 2L, 3L, 4L, 5L)), (1L, Seq(1L, 2L, 3L, 4L, 5L)),
      (2L, Seq(1L, 2L, 3L, 9L, 10L)), (3L, Seq(1L, 2L, 3L)))
      .flatMap { case (id, es) => es.map(e => (id, e)) }.toDF("doc_id", "hk")
    val got = graft.queries.Text.prefixFilterPairs(rows)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((0L, 1L), (0L, 3L), (1L, 3L), (2L, 3L)))
  }
}
