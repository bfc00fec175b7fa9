package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.RangeJoinRewrite

/** Equivalence property for the bucketed range-join rewrite: on random
  * point/interval frames (including empty, degenerate, negative, and
  * boundary-hugging intervals, across several bucket widths) the rewritten
  * join returns EXACTLY the naive join's rows. Randomness is seeded —
  * failures reproduce.
  */
class RangeJoinRewriteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark

  test("rewritten join == naive join on 6 seeded random instances x 3 widths") {
    val rnd = new scala.util.Random(20260814L)
    for (inst <- 1 to 6; w <- Seq(3L, 10L, 1000L)) {
      val pts = Seq.fill(40)(rnd.nextLong() % 200L)
      val ivs = Seq.fill(15) {
        val a = rnd.nextLong() % 200L
        // mix proper, empty, and degenerate intervals
        val b = rnd.nextInt(4) match {
          case 0 => a // empty
          case 1 => a - rnd.nextInt(20) // inverted
          case _ => a + rnd.nextInt(40) + 1
        }
        (a, b)
      }
      val sNaive = spark.newSession()
      val sRule = spark.newSession()
      RangeJoinRewrite.ensure(sRule)
      sRule.conf.set(RangeJoinRewrite.WidthKey, w.toString)
      def run(s: org.apache.spark.sql.SparkSession): Seq[(Long, Long, Long)] = {
        import s.implicits._
        val p = pts.toDF("t")
        val iv = ivs.toDF("ws", "we")
        p.join(iv, col("t") >= col("ws") && col("t") < col("we"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          .toSeq.sorted
      }
      val rewritten = {
        import sRule.implicits._
        val p = pts.toDF("t")
        val iv = ivs.toDF("ws", "we")
        val j = p.join(iv, col("t") >= col("ws") && col("t") < col("we"))
        assert(j.queryExecution.executedPlan.toString.contains("__rj_b"),
          s"instance $inst width $w: rewrite did not fire")
        j.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted
      }
      assert(rewritten == run(sNaive), s"instance $inst width $w diverged")
    }
  }
}
