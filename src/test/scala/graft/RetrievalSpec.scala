package graft

import org.scalatest.funsuite.AnyFunSuite

/** q97 hybrid retrieval: structural properties of the RRF fusion that the
  * hash-oracle can't articulate (the oracle proves value equality; this
  * proves the ranking semantics hold on their own terms).
  */
class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark

  test("q97: dense ranks 1..3 per query, rrf strictly descending, bounded by the two-modality max") {
    val rows = SparkEntry.queries("q97_hybrid_retrieval")(spark, SparkTestHarness.Sf0001)
      .collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size === 5)
    byQ.foreach { case (qid, rs) =>
      assert(rs.map(_.getInt(1)).sorted.toSeq === Seq(1, 2, 3), s"qid=$qid ranks")
      val rrfs = rs.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(rrfs.zip(rrfs.tail).forall { case (a, b) => a > b }, s"qid=$qid not descending: ${rrfs.toSeq}")
      // rank-1-in-both is the ceiling: 1/61 + 1/61
      assert(rrfs.head <= 2.0 / 61 + 1e-12 && rrfs.last > 0.0, s"qid=$qid rrf out of range")
    }
  }
}
