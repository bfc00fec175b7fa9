package graft

import org.scalatest.funsuite.AnyFunSuite

/** Persisted ANN index lifecycle (q262/q263): the probe must serve from
  * the written artifact — not silently retrain from the raw fixture — and
  * the persisted path must reproduce the inline-trained search exactly.
  */
class AnnIndexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark
  private val dir = SparkTestHarness.Sf0001

  test("probe plan touches ONLY the persisted index tables") {
    // build first so the probe has an artifact to read
    SparkEntry.queries("q262_ivf_index_build")(spark, dir).collect()
    val df = SparkEntry.queries("q263_ivf_index_search")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    val idx = queries.Vectors.ivfIndexDir(dir)
    val locations = p.linesIterator.filter(_.contains("Location:")).toSeq
    assert(locations.nonEmpty, s"no file scans in probe plan:\n${p.take(2000)}")
    locations.foreach { l =>
      assert(l.contains("graft_ivf_index"),
        s"probe scans a non-index table: $l")
    }
    assert(!p.contains("embeddings.parquet"),
      "probe plan rescans the raw embeddings fixture")
    assert(idx.contains("graft_ivf_index"))
  }

  test("persisted-index search == inline-trained q130 search, row for row") {
    val fromIndex = SparkEntry.queries("q263_ivf_index_search")(spark, dir)
      .collect().map(_.toSeq).toSeq
    val inline = SparkEntry.queries("q130_trained_ivf_search")(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(fromIndex == inline)
  }

  test("IVFPQ probe plan touches ONLY the persisted index tables") {
    SparkEntry.queries("q268_ivfpq_index_build")(spark, dir).collect()
    val df = SparkEntry.queries("q269_ivfpq_index_search")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    val locations = p.linesIterator.filter(_.contains("Location:")).toSeq
    assert(locations.nonEmpty, s"no file scans in IVFPQ probe plan:\n${p.take(2000)}")
    locations.foreach { l =>
      assert(l.contains("graft_ivf_index"), s"IVFPQ probe scans a non-index table: $l")
    }
    assert(!p.contains("embeddings.parquet"),
      "IVFPQ probe plan rescans the raw embeddings fixture")
  }

  test("persisted IVFPQ search == inline-trained q144 search, row for row") {
    val fromIndex = SparkEntry.queries("q269_ivfpq_index_search")(spark, dir)
      .collect().map(_.toSeq).toSeq
    val inline = SparkEntry.queries("q144_ivfpq_residual_search")(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(fromIndex == inline)
  }

  test("codes table is partitioned by cluster (cell-pruned probes read a file subset)") {
    SparkEntry.queries("q262_ivf_index_build")(spark, dir).collect()
    // the store is generation-versioned (r11): resolve the latest
    // complete generation the way probes do
    val idx = IndexStore.latestPath(queries.Vectors.ivfIndexDir(dir)).get
    val parts = new java.io.File(s"$idx/codes").listFiles()
      .filter(_.getName.startsWith("cluster=")).map(_.getName).sorted
    assert(parts.nonEmpty, "codes written unpartitioned")
    // a single-cell read plans a partition-pruned scan: partition count
    // strictly below the full table's
    val all = spark.read.parquet(s"$idx/codes")
    val one = all.filter(org.apache.spark.sql.functions.col("cluster") === 1)
    val pruned = one.queryExecution.executedPlan.toString
    assert(pruned.contains("PartitionFilters: [isnotnull(cluster"),
      s"no partition filter on cluster:\n${pruned.take(1500)}")
  }
}
