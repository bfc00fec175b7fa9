package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partition-layout read-path properties (the 100 TB scan levers next to
  * PlanAuditSpec's pushdown/broadcast pins): a date-partitioned write must
  * prune statically on a partition-column filter, and dynamically (DPP)
  * when the partition column is only constrained through a join.
  */
class PartitionPruningSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark
  private val dir = SparkTestHarness.Sf0001

  private def withPartitionedEvents[A](body: String => A): A = {
    val tmp = new java.io.File(queries.StatsStore.scratchDir("graft_part"))
    try {
      val path = new java.io.File(tmp, "ev").getAbsolutePath
      Tables.events(spark, dir)
        .withColumn("d", to_date(col("ts")))
        .write.mode("overwrite").partitionBy("d").parquet(path)
      body(path)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(tmp)
    }
  }

  test("static partition pruning: a partition-column filter reaches PartitionFilters and skips files") {
    withPartitionedEvents { path =>
      val all = spark.read.parquet(path)
      val day = all.select(col("d")).distinct().orderBy("d").head().get(0).toString
      val one = all.filter(col("d") === lit(day))
      val p = one.queryExecution.executedPlan.toString
      assert(p.contains("PartitionFilters:") && p.contains("(d"),
        s"partition filter not applied at the scan:\n${p.take(2000)}")
      // data filters on non-partition columns must NOT lose the partition filter
      assert(one.count() ===
        Tables.events(spark, dir).filter(to_date(col("ts")) === lit(day)).count())
      // every file actually scanned comes from the single selected partition
      val scans = one.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      assert(scans.nonEmpty)
      assert(scans.forall(_.inputRDDs().nonEmpty))
      val files = scans.head.relation.location.listFiles(
        scans.head.partitionFilters, scans.head.dataFilters)
      assert(files.map(_.files.size).sum > 0)
      assert(files.length === 1, s"expected 1 selected partition, got ${files.length}")
      val total = scans.head.relation.location.listFiles(Nil, Nil).length
      assert(total > 1, "fixture produced a single partition; pruning untestable")
    }
  }

  test("dynamic partition pruning: a join-side filter prunes fact partitions at runtime") {
    withPartitionedEvents { path =>
      val fact = spark.read.parquet(path)
      // DPP plans only against a FILTERED scan-backed dim (a LocalRelation
      // carries no selective predicate for the rule to push) — write one
      val dimPath = new java.io.File(new java.io.File(path).getParentFile, "dim").getAbsolutePath
      fact.select(col("d")).distinct()
        .withColumn("flag", (dayofmonth(col("d")) === 1).cast("int"))
        .write.mode("overwrite").parquet(dimPath)
      val dim = spark.read.parquet(dimPath).filter(col("flag") === 1)
        .select(col("d").as("dd"))
      val j = fact.join(broadcast(dim), col("d") === col("dd"))
      val p = j.queryExecution.executedPlan.toString
      assert(p.toLowerCase.contains("dynamicpruning"),
        s"expected a dynamic partition pruning subquery on the fact scan:\n${p.take(2500)}")
      val expected = fact.join(dim.hint("broadcast"), col("d") === col("dd")).count()
      assert(j.count() === expected)
    }
  }
}
