package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Graft.writeBucketed — the pay-once-shuffle-at-write layout: joins and
  * aggregations on the bucket key must plan WITHOUT any exchange, and
  * return exactly the rows the unbucketed plan returns.
  */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark
  private val dir = SparkTestHarness.Sf0001

  private def withConf[A](k: String, v: String)(body: => A): A = {
    val old = spark.conf.getOption(k)
    spark.conf.set(k, v)
    try body finally old.fold(spark.conf.unset(k))(spark.conf.set(k, _))
  }

  test("bucketed join and bucket-key aggregation are exchange-free and row-identical") {
    val orders = Tables.orders(spark, dir).select("o_orderkey", "o_custkey", "o_totalprice")
    val cust = Tables.customer(spark, dir).select("c_custkey", "c_name")
    Graft.writeBucketed(orders, "b_orders", "o_custkey", 8)
    Graft.writeBucketed(cust, "b_customer", "c_custkey", 8)
    try {
      // disable broadcast: the point is the big-to-big shape, where the
      // only alternatives are shuffle-SMJ vs bucket-co-located SMJ
      withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
        val j = spark.table("b_orders").join(spark.table("b_customer"),
          col("o_custkey") === col("c_custkey"))
        val p = j.queryExecution.executedPlan.toString
        assert(!p.contains("Exchange"), s"expected exchange-free bucketed join:\n${p.take(2500)}")
        assert(p.contains("SortMergeJoin"), s"expected sort-merge over buckets:\n${p.take(1500)}")
        val expected = orders.join(cust, col("o_custkey") === col("c_custkey"))
        assert(j.collect().toSet === expected.collect().toSet)

        val agg = spark.table("b_orders").groupBy("o_custkey")
          .agg(count(lit(1)).as("n"), sum("o_totalprice").as("t"))
        val ap = agg.queryExecution.executedPlan.toString
        assert(!ap.contains("Exchange"), s"expected exchange-free bucket-key agg:\n${ap.take(2500)}")
        val ea = orders.groupBy("o_custkey")
          .agg(count(lit(1)).as("n"), sum("o_totalprice").as("t"))
        assert(agg.collect().toSet === ea.collect().toSet)
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }

  test("a non-bucket-key join over the same tables still shuffles (the layout, not magic)") {
    val orders = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    Graft.writeBucketed(orders, "b_orders2", "o_custkey", 8)
    try {
      withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
        val t = spark.table("b_orders2")
        val j = t.join(t.select(col("o_orderkey").as("k2")), col("o_orderkey") === col("k2"))
        val p = j.queryExecution.executedPlan.toString
        assert(p.contains("Exchange"), "join off the bucket key should require a shuffle")
      }
    } finally spark.sql("DROP TABLE IF EXISTS b_orders2")
  }
}
