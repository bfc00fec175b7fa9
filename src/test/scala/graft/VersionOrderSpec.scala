package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.VersionOrder

/** Truth table + order-isomorphism properties for the version-ordering core
  * (SURVEY.md §5.2 items 2–3; Debian corner cases: epochs, `~`, letter
  * suffixes, numeric-vs-lexicographic segments).
  */
class VersionOrderSpec extends AnyFunSuite {
  private def lt(a: String, b: String): Unit = {
    assert(VersionOrder.compare(a, b) < 0, s"expected $a < $b")
    assert(VersionOrder.compare(b, a) > 0, s"expected $b > $a")
    assert(VersionOrder.sortKey(a) < VersionOrder.sortKey(b), s"sortKey($a) !< sortKey($b)")
  }
  private def eq(a: String, b: String): Unit = {
    assert(VersionOrder.compare(a, b) === 0, s"expected $a == $b")
    assert(VersionOrder.sortKey(a) === VersionOrder.sortKey(b))
  }

  test("numeric segments compare numerically, not lexicographically") {
    lt("1.9", "1.10")
    lt("1.9.9", "1.10.0")
    lt("2", "10")
    eq("1.0", "1.00") // leading zeros
    eq("01.1", "1.1")
  }

  test("tilde sorts before everything, including end of string") {
    lt("1.0~rc1", "1.0")
    lt("1.0~~", "1.0~")
    lt("1.0~rc1", "1.0~rc2")
    lt("1.0~beta1", "1.0~rc1")
  }

  test("letters sort before non-letters; letter suffix after bare version") {
    lt("1.0", "1.0a")
    lt("1.0a", "1.0+b")   // letter 'a' < non-letter '+'
    lt("1.0a", "1.0b")
    lt("1.0", "1.0+git")
  }

  test("epoch dominates") {
    lt("9.9", "1:0.1")
    lt("1:9.9", "2:0.1")
    eq("0:1.2", "1.2")
  }

  test("revision after last dash; absent revision == 0") {
    lt("1.0-r1", "1.0-r2")
    lt("1.2.3-r4", "1.2.4-r1")
    eq("1.0", "1.0-0")
    lt("1.0-1", "1.0-1a") // revision fragment uses the same rules
  }

  test("degenerate inputs are total-ordered, never throw") {
    val weird = Seq("", "-", ":", "~", ".", "1", "0", "a", "1:", ":1", "1-", "-1",
      "1..2", "1.2.3-r4-r5", "999999999999999999.1", "0:0-0")
    for (a <- weird; b <- weird) {
      val c = VersionOrder.compare(a, b)
      assert(c === -VersionOrder.compare(b, a), s"antisymmetry broke: $a vs $b")
      assert(Integer.signum(VersionOrder.sortKey(a).compareTo(VersionOrder.sortKey(b))) === Integer.signum(c),
        s"key mismatch: $a vs $b")
    }
  }

  test("debian policy examples") {
    lt("2.6.0", "2.6.0-r1") // r1 revision vs 0
    lt("1.0-1", "1.0-2")
    lt("2.4.dfsg", "2.4.dfsg+1")
  }

  private val versionGen: Gen[String] = {
    val seg = Gen.oneOf(
      Gen.choose(0, 30).map(_.toString),
      Gen.oneOf("a", "b", "rc", "beta", "~rc", "~~", "alpha", "+git", "dfsg"))
    for {
      epoch <- Gen.option(Gen.choose(0, 3))
      n <- Gen.choose(1, 5)
      segs <- Gen.listOfN(n, seg)
      rev <- Gen.option(Gen.choose(0, 9))
    } yield {
      val up = segs.mkString(".")
      (epoch.map(_ + ":").getOrElse("")) + up + rev.map("-r" + _).getOrElse("")
    }
  }

  // deterministic ScalaCheck sampling (no scalatestplus bridge offline)
  private def samples(n: Int): Vector[String] =
    (0 until n).flatMap(i => versionGen(Gen.Parameters.default, Seed(i.toLong))).toVector

  test("property: sortKey order is isomorphic to compare order") {
    val vs = samples(300)
    for (a <- vs; b <- vs) {
      val c = Integer.signum(VersionOrder.compare(a, b))
      val k = Integer.signum(VersionOrder.sortKey(a).compareTo(VersionOrder.sortKey(b)))
      assert(k === c, s"a=$a b=$b keyA=${VersionOrder.sortKey(a)} keyB=${VersionOrder.sortKey(b)}")
    }
  }

  test("property: compare is a total order (reflexive, antisymmetric, transitive)") {
    val vs = samples(120)
    for (a <- vs) assert(VersionOrder.compare(a, a) === 0)
    for (a <- vs; b <- vs; c <- vs.take(30))
      if (VersionOrder.compare(a, b) <= 0 && VersionOrder.compare(b, c) <= 0)
        assert(VersionOrder.compare(a, c) <= 0, s"a=$a b=$b c=$c")
  }
}
