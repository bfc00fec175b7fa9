package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.{ApkVersion, EcoVersion, RpmVersion, VersionOrder}

/** Truth tables for the rpm/apk ecosystem orderings — pinned on exactly the
  * cases where they DIVERGE from Debian (VERDICT r2 item 8) — plus the
  * same key-isomorphism property VersionOrderSpec proves for deb.
  */
class EcoVersionSpec extends AnyFunSuite {
  private def lt(eco: String)(a: String, b: String): Unit = {
    assert(EcoVersion.compare(a, b, eco) < 0, s"[$eco] expected $a < $b")
    assert(EcoVersion.compare(b, a, eco) > 0, s"[$eco] expected $b > $a")
    assert(EcoVersion.sortKey(a, eco) < EcoVersion.sortKey(b, eco),
      s"[$eco] sortKey($a)=${EcoVersion.sortKey(a, eco)} !< sortKey($b)=${EcoVersion.sortKey(b, eco)}")
  }
  private def eq(eco: String)(a: String, b: String): Unit = {
    assert(EcoVersion.compare(a, b, eco) === 0, s"[$eco] expected $a == $b")
    assert(EcoVersion.sortKey(a, eco) === EcoVersion.sortKey(b, eco))
  }

  test("rpm diverges from deb: numeric segment beats alpha segment") {
    lt("rpm")("1.0.a", "1.0.1") // rpm: digit wins
    lt("deb")("1.0.1", "1.0.a") // deb: byte order says the opposite
    lt("rpm")("1.2", "1.2.a")   // extra segment is newer
    lt("rpm")("1.2.a", "1.2.1") // '' < .a < .1 — the q66 rank
    lt("deb")("1.2.1", "1.2.a") // deb rank: '' < .1 < .a
  }

  test("rpm diverges from deb: separators only break segments") {
    eq("rpm")("1_0", "1.0")
    eq("rpm")("1..0", "1.0")
    eq("rpm")("1.a.2", "1+a+2")
    assert(VersionOrder.compare("1_0", "1.0") != 0, "deb distinguishes _ from .")
  }

  test("rpm tilde and caret") {
    lt("rpm")("1.0~rc1", "1.0")
    lt("rpm")("1.0~~", "1.0~")
    lt("rpm")("1.0", "1.0^git1")  // caret: after end-of-string...
    lt("rpm")("1.0^git1", "1.0.1") // ...but before any real segment
    lt("rpm")("1.0~rc1", "1.0^git1")
  }

  test("rpm segment mechanics") {
    lt("rpm")("1.9", "1.10")
    eq("rpm")("1.010", "1.10")
    lt("rpm")("1.0.ab", "1.0.b") // alpha segments compare lexicographically
    lt("rpm")("9.9", "1:0.1")    // epoch dominates
    lt("rpm")("1.0-1", "1.0-2")  // release fragment
  }

  test("apk pre/post suffix ranks around the bare version") {
    lt("apk")("1.0_alpha", "1.0_beta")
    lt("apk")("1.0_beta", "1.0_pre")
    lt("apk")("1.0_pre", "1.0_rc")
    lt("apk")("1.0_rc", "1.0")
    lt("apk")("1.0", "1.0_cvs")
    lt("apk")("1.0_git", "1.0_p")
    lt("apk")("1.0", "1.0_p1")
    lt("apk")("1.0_p1", "1.0_p2")
    lt("apk")("1.0_alpha1", "1.0_alpha2")
    // deb has no such rule: 1.0_p1 sorts by bytes, after 1.0 as well but
    // 1.0_alpha also sorts AFTER 1.0 in deb — the apk divergence
    assert(VersionOrder.compare("1.0_alpha", "1.0") > 0)
    assert(ApkVersion.compare("1.0_alpha", "1.0") < 0)
  }

  test("apk letters, components, revisions") {
    lt("apk")("1.0", "1.0a")
    lt("apk")("1.0a", "1.0b")
    lt("apk")("1.0", "1.0.1")
    lt("apk")("1.9", "1.10")
    lt("apk")("1.0", "1.0-r1")
    lt("apk")("1.0-r1", "1.0-r2")
    lt("apk")("1.0_rc1_alpha1", "1.0_rc1") // missing suffix = (none) rank
    lt("apk")("1.0_rc1", "1.0_rc1_p1")
  }

  private def rpmGen: Gen[String] = {
    val seg = Gen.oneOf(
      Gen.choose(0, 30).map(_.toString),
      Gen.oneOf("a", "b", "rc", "git", "el", "ab"))
    val sep = Gen.oneOf(".", "_", "+", "", "~", "^")
    for {
      epoch <- Gen.option(Gen.choose(0, 2))
      n <- Gen.choose(1, 5)
      segs <- Gen.listOfN(n, seg)
      seps <- Gen.listOfN(n, sep)
      rev <- Gen.option(Gen.choose(0, 9))
    } yield epoch.map(_ + ":").getOrElse("") +
      segs.zip(seps).map { case (s, p) => p + s }.mkString +
      rev.map("-" + _).getOrElse("")
  }

  private def apkGen: Gen[String] = {
    val suffix = for {
      w <- Gen.oneOf("alpha", "beta", "pre", "rc", "cvs", "svn", "git", "hg", "p")
      d <- Gen.option(Gen.choose(0, 20))
    } yield "_" + w + d.map(_.toString).getOrElse("")
    for {
      n <- Gen.choose(1, 4)
      nums <- Gen.listOfN(n, Gen.choose(0, 30))
      letter <- Gen.option(Gen.oneOf('a', 'b', 'z'))
      nsuf <- Gen.choose(0, 2)
      sufs <- Gen.listOfN(nsuf, suffix)
      rev <- Gen.option(Gen.choose(0, 9))
    } yield nums.mkString(".") + letter.map(_.toString).getOrElse("") +
      sufs.mkString + rev.map("-r" + _).getOrElse("")
  }

  private def samples(g: Gen[String], n: Int): Vector[String] =
    (0 until n).flatMap(i => g(Gen.Parameters.default, Seed(i.toLong))).toVector

  test("property: rpm sortKey order is isomorphic to rpm compare order") {
    val vs = samples(rpmGen, 250)
    for (a <- vs; b <- vs) {
      val c = Integer.signum(RpmVersion.compare(a, b))
      val k = Integer.signum(RpmVersion.sortKey(a).compareTo(RpmVersion.sortKey(b)))
      assert(k === c, s"a=$a b=$b keyA=${RpmVersion.sortKey(a)} keyB=${RpmVersion.sortKey(b)}")
    }
  }

  test("property: apk sortKey order is isomorphic to apk compare order") {
    val vs = samples(apkGen, 250)
    for (a <- vs; b <- vs) {
      val c = Integer.signum(ApkVersion.compare(a, b))
      val k = Integer.signum(ApkVersion.sortKey(a).compareTo(ApkVersion.sortKey(b)))
      assert(k === c, s"a=$a b=$b keyA=${ApkVersion.sortKey(a)} keyB=${ApkVersion.sortKey(b)}")
    }
  }

  test("property: rpm/apk compares are total orders") {
    for ((g, cmp) <- Seq(
        (rpmGen, RpmVersion.compare _),
        (apkGen, ApkVersion.compare _))) {
      val vs = samples(g, 100)
      for (a <- vs) assert(cmp(a, a) === 0)
      for (a <- vs; b <- vs) assert(cmp(a, b) === -cmp(b, a), s"$a vs $b")
      for (a <- vs; b <- vs; c <- vs.take(25))
        if (cmp(a, b) <= 0 && cmp(b, c) <= 0)
          assert(cmp(a, c) <= 0, s"transitivity: $a $b $c")
    }
  }

  test("SQL surface: version_compare/version_sort_key take an ecosystem literal") {
    val spark = SparkTestHarness.spark
    graft.functions.GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    val r = Seq(("1.0.a", "1.0.1")).toDF("a", "b")
      .select(
        org.apache.spark.sql.functions.expr("version_compare(a, b, 'rpm')").as("rpm"),
        org.apache.spark.sql.functions.expr("version_compare(a, b, 'deb')").as("deb"),
        org.apache.spark.sql.functions.expr("version_compare(a, b)").as("dflt"))
      .head()
    assert(r.getInt(0) < 0 && r.getInt(1) > 0 && r.getInt(2) > 0)
    // apk ordering drives max_by through the sort-key form
    val top = Seq("1.0_alpha", "1.0", "1.0_p1", "1.0_rc2").toDF("v")
      .select(org.apache.spark.sql.functions
        .expr("max_by(v, version_sort_key(v, 'apk'))").as("m"))
      .head().getString(0)
    assert(top == "1.0_p1")
  }
}
