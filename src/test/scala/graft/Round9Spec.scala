package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 operator properties: the sort-based 2-D skyline vs brute-force
  * dominance, personalized PageRank vs the global fixed point in its
  * degenerate case, and the DataFrame-needle substring search vs the
  * literal-needle path.
  */
class Round9Spec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark

  private var state = 0x9E3779B97F4A7C15L
  private def next(bound: Int): Int = {
    state = state * 6364136223846793005L + 1442695040888963407L
    (((state >>> 33) % bound) + bound).toInt % bound
  }

  test("skyline2d == brute-force dominance on 10 deterministic random point sets") {
    import spark.implicits._
    for (_ <- 0 until 10) {
      val n = 20 + next(60)
      // small coordinate range on purpose: forces x ties and exact-duplicate
      // points, the cases where the group-max/running-max logic can slip
      val pts = (0 until n).map(i => (i.toLong, next(12).toLong, next(12).toLong))
      val df = pts.toDF("id", "x", "y")
      val got = Graft.skyline2d(df, "x", "y")
        .select("id").as[Long].collect().toSet
      val want = pts.filter { case (_, x, y) =>
        !pts.exists { case (_, x2, y2) =>
          x2 >= x && y2 >= y && (x2 > x || y2 > y)
        }
      }.map(_._1).toSet
      assert(got == want, s"skyline mismatch on ${pts.take(8)}...")
    }
  }

  test("personalized PageRank with seeds == all nodes reproduces global PageRank") {
    import spark.implicits._
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "a"))
      .toDF("name", "dep")
    val nodes = Seq("a", "b", "c", "d").toDF("name")
    // scale divisible by 100 * 4 so both variants' init/floor are exact
    val scale = 4000000L
    val global = operators.PageRank.run(spark, edges, nodes, 6, scale)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val ppr = operators.PageRank.personalized(spark, edges, nodes, nodes, 6, scale)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ppr == global)
  }

  test("personalized PageRank: unreachable nodes rank 0, seed neighborhood > 0") {
    import spark.implicits._
    val edges = Seq(("s", "x"), ("x", "y"), ("far", "farther")).toDF("name", "dep")
    val nodes = Seq("s", "x", "y", "far", "farther").toDF("name")
    val pr = operators.PageRank.personalized(spark, edges, nodes,
        Seq("s").toDF("name"), 4, 2000000L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pr("s") > 0 && pr("x") > 0 && pr("y") > 0)
    assert(pr("far") == 0 && pr("farther") == 0)
  }

  test("substringSearchDF == literal-needle substringSearch on the fixture corpus") {
    import spark.implicits._
    val docs = Tables.documents(spark, SparkTestHarness.Sf0001)
    val needles = Seq("batch merge", "value table", "zz-never-present")
    val lit = Graft.substringSearch(docs, needles)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val df = Graft.substringSearchDF(docs, needles.toDF("needle"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(lit == df)
    assert(lit.nonEmpty)
  }

  test("fuzzyJoin == brute-force levenshtein<=1 on random tiny-alphabet strings") {
    import spark.implicits._
    // 3-char alphabet + short strings force every edit class (equal,
    // deletion, insertion, substitution) AND near-misses like transposed
    // pairs ("ab"/"ba", ed=2) that naive variant-intersection overmatches
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    for (_ <- 0 until 4) {
      val strs = (0 until 30).map { i =>
        (i.toLong, (0 until (2 + next(4))).map(_ => ('a' + next(3)).toChar).mkString)
      }
      val left = strs.toDF("lid", "ls")
      val right = strs.toDF("rid", "rs")
      val got = Graft.fuzzyJoin(left, "ls", right, "rs")
        .select("lid", "rid").as[(Long, Long)].collect().toSet
      val want = (for {
        (i, x) <- strs; (j, y) <- strs if lev(x, y) <= 1
      } yield (i, j)).toSet
      assert(got == want, s"fuzzyJoin mismatch on ${strs.take(8)}")
    }
  }

  test("HITS on a two-hub star: the sink takes all authority, sources split hub mass") {
    import spark.implicits._
    val edges = Seq(("a", "c"), ("b", "c")).toDF("name", "dep")
    val nodes = Seq("a", "b", "c").toDF("name")
    val scale = 600000L
    val m = operators.Hits.run(spark, edges, nodes, 3, scale)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(m("c") == ((scale, 0L)))
    assert(m("a") == ((0L, scale / 2)) && m("b") == ((0L, scale / 2)))
  }

  test("substringSearchDF drops sub-trigram needles instead of matching everything") {
    import spark.implicits._
    val docs = Seq((1L, "abcdef"), (2L, "xyz")).toDF("doc_id", "text")
    val got = Graft.substringSearchDF(docs, Seq("ab", "bcd").toDF("needle"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("bcd", 1L)))
  }
}
