package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed tables co-locate join keys at WRITE time so the join runs with
  * no shuffle at READ time — the 100 TB answer for repeated fact-fact
  * joins (SURVEY.md §1.2 "co-located joins via bucketing"). The assertion
  * is on the physical plan: a SortMergeJoin over two bucketed scans must
  * contain NO shuffle Exchange.
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark
  private val dir = SparkTestHarness.Sf0001

  test("join over co-bucketed tables plans without a shuffle exchange") {
    // tables land in the default ./spark-warehouse (gitignored);
    // warehouse.dir is a static conf and cannot be set per-test.
    // Force the non-broadcast path so the exchange question is real
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.orders(spark, dir)
        .write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("orders_b")
      Tables.lineitem(spark, dir)
        .select("l_orderkey", "l_quantity", "l_extendedprice")
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("lineitem_b")

      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 2).as("total"))

      val plan = joined.queryExecution.executedPlan.toString
      val joinSection = plan.split("HashAggregate").last // below the final agg
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a shuffle-family join:\n${plan.take(1500)}")
      // the join inputs are bucketed scans: no Exchange between join and scans
      val exchangesInJoin = "Exchange hashpartitioning\\((l_orderkey|o_orderkey)".r
        .findAllIn(plan).length
      assert(exchangesInJoin === 0,
        s"join over co-bucketed tables still shuffles:\n${plan.take(2500)}")
      // and the result is correct vs the plain join
      val expected = Tables.lineitem(spark, dir)
        .join(Tables.orders(spark, dir), col("l_orderkey") === col("o_orderkey"))
        .count()
      assert(spark.table("lineitem_b")
        .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey")).count() === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
