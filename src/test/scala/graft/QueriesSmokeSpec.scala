package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every judged query must plan and execute on sf0.001 (localizes failures
  * before the driver's sf0.01 gate) and each must have an oracle or be a
  * documented rows-only sketch query.
  */
class QueriesSmokeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark
  private val dir = SparkTestHarness.Sf0001

  /** Sketch queries intentionally without DuckDB oracles. */
  private val RowsOnly = Set("q19_approx_stats")

  test("every query has an oracle unless documented rows-only") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- RowsOnly
    assert(missing.isEmpty, s"queries missing oracles: $missing")
    val orphaned = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphaned.isEmpty, s"oracles without queries: $orphaned")
  }

  test("entry smoke returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name executes on sf0.001") {
      val n = fn(spark, dir).count()
      assert(n >= 0)
    }
  }
}
