package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The co-located join lever (SURVEY.md §2.3 scale notes: "bucketing for
  * co-located joins"): two tables bucketed AND sorted on the join key join
  * with ZERO data exchanges — at 100 TB, pre-bucketing the fact tables on
  * their join keys turns every recurring key join from a full shuffle into
  * a partition-local merge. Spark's bucketed scan is a catalog property of
  * saved tables, so this is exercised through saveAsTable into a temp
  * external location (judged queries read raw fixture parquet, which
  * carries no bucket metadata — the lever is a deployment choice, pinned
  * here so the engine is known to deliver it when the layout provides it).
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark
  private val dir = SparkTestHarness.Sf0001

  test("bucketed+sorted tables join with zero exchanges and match the plain join") {
    val tmp = new java.io.File(queries.StatsStore.scratchDir("graft_bucket_"))
    val conf = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(conf)
    try {
      spark.conf.set(conf, "-1") // force the shuffle-join scenario bucketing removes
      Tables.orders(spark, dir)
        .write.mode("overwrite").option("path", s"$tmp/orders_b")
        .bucketBy(4, "o_custkey").sortBy("o_custkey").saveAsTable("graft_orders_b")
      Tables.customer(spark, dir).select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
        .write.mode("overwrite").option("path", s"$tmp/cust_b")
        .bucketBy(4, "o_custkey").sortBy("o_custkey").saveAsTable("graft_cust_b")
      val j = spark.table("graft_orders_b").join(spark.table("graft_cust_b"), "o_custkey")
      j.collect() // finalize the adaptive plan before auditing it
      val p = j.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      assert(!p.contains("Exchange"),
        s"bucketed join still exchanges data:\n${p.take(2000)}")
      val plain = Tables.orders(spark, dir)
        .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      assert(j.count() === plain.count(), "bucketed join changed the result")
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_orders_b")
      spark.sql("DROP TABLE IF EXISTS graft_cust_b")
      spark.conf.set(conf, prev)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete()
      }
      rm(tmp)
    }
  }
}
