package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.HllSketch

/** Deterministic-HLL invariants: the SQL-reproducible hash, sketch-merge
  * distributivity (merge of sketches == sketch of union), and estimator
  * accuracy across cardinality decades.
  */
class HllSketchSpec extends AnyFunSuite {

  private def sketch(keys: Iterable[String]): Array[Byte] = {
    val a = new HllSketch
    keys.foldLeft(a.zero)((b, k) => a.reduce(b, k))
  }

  private def estimate(regs: Array[Byte]): Long = {
    val s = regs.map(r => 1L << (55 - r)).sum
    ((BigInt(1890844672) << 55) / (BigInt(650790) * s)).toLong
  }

  test("hash60 matches the DuckDB derivation CAST('0x'||substr(md5(k),1,15) AS BIGINT)") {
    // duckdb: SELECT CAST(('0x'||substr(md5('123'),1,15)) AS BIGINT) = 144901983852400757
    assert(HllSketch.hash60("123") === 144901983852400757L)
  }

  test("merge of disjoint sketches equals sketch of the union") {
    val a = (1 to 500).map(i => s"a$i")
    val b = (1 to 500).map(i => s"b$i")
    val merged = new HllSketch().merge(sketch(a), sketch(b))
    assert(merged.toSeq === sketch(a ++ b).toSeq)
  }

  test("merge is idempotent on overlapping key sets") {
    val a = (1 to 800).map(i => s"k$i")
    val b = (400 to 1200).map(i => s"k$i")
    val merged = new HllSketch().merge(sketch(a), sketch(b))
    assert(merged.toSeq === sketch((1 to 1200).map(i => s"k$i")).toSeq)
  }

  test("registers stay within the 54-bit rho bound") {
    val regs = sketch((1 to 10000).map(_.toString))
    assert(regs.forall(r => r >= 0 && r <= 55))
  }

  test("estimate within 3 standard errors (1.04/sqrt(64) ~ 13%) across decades") {
    for (n <- Seq(100, 1000, 10000, 100000)) {
      val est = estimate(sketch((1 to n).map(i => s"v$i")))
      val rel = math.abs(est.toDouble - n) / n
      assert(rel < 0.39, s"n=$n est=$est rel=$rel")
    }
  }

  test("duplicate insertion never changes the sketch") {
    val once = sketch((1 to 300).map(_.toString))
    val thrice = sketch(((1 to 300) ++ (1 to 300) ++ (1 to 300)).map(_.toString))
    assert(once.toSeq === thrice.toSeq)
  }
}
