package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Skew-cap identity proofs (VERDICT r2 items 6/10): q41's hot-shingle
  * df-cap and q42's degenerate-bucket cap are SKEW guards — on
  * non-degenerate data they must drop nothing and change nothing. Proven
  * two ways on the fixture: the capped-away set is empty, and the capped
  * q41 output equals an uncapped inline rebuild row-for-row.
  */
class DedupCapSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark
  private val dir = SparkTestHarness.Sf0001

  test("q41: fixture has no hot shingles, capped result == uncapped rebuild") {
    val hk = queries.Shingles.frame(spark, dir).select(col("doc_id"), col("hk"))
    val hot = hk.groupBy("hk").agg(count(lit(1)).as("df")).filter(col("df") > 20)
    assert(hot.count() == 0, "sf0.001 corpus unexpectedly has boilerplate shingles")

    // uncapped inline rebuild of the q41 pipeline
    val b = hk.select(col("doc_id").as("doc_id2"), col("hk").as("hk2"))
    val sizes = hk.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val uncapped = hk.join(b, col("hk") === col("hk2") && col("doc_id") < col("doc_id2"))
      .groupBy(col("doc_id").as("d1"), col("doc_id2").as("d2"))
      .agg(count(lit(1)).as("common"))
      .join(sizes.select(col("doc_id").as("d1"), col("sz").as("sz1")), "d1")
      .join(sizes.select(col("doc_id").as("d2"), col("sz").as("sz2")), "d2")
      .withColumn("jaccard", col("common") / (col("sz1") + col("sz2") - col("common")))
      .filter(col("jaccard") >= 0.6)
      .select("d1", "d2", "common", "sz1", "sz2", "jaccard")
      .orderBy("d1", "d2")

    val capped = SparkEntry.queries("q41_shingle_jaccard_pairs")(spark, dir)
    assert(capped.collect().toSeq == uncapped.collect().toSeq)
  }

  test("q42: fixture has no degenerate LSH buckets") {
    // rebuild the bucket table exactly as q42 does and assert no
    // (band, bkey) bucket exceeds the cap — the anti-join is an identity.
    val sh = queries.Shingles.frame(spark, dir)
    val hashed = sh.withColumn("base", expr("shiftright(hk, 28) % 2147483647"))
    val minCols = (0 until 12).map(i =>
      min(expr(s"((2 * $i + 3) * base + 5 * $i + 7) % 2147483647")).as(s"mh$i"))
    val sig = hashed.groupBy("doc_id").agg(minCols.head, minCols.tail: _*)
    val bandCols = (0 until 4).map { bnd =>
      concat_ws(",", (0 until 3).map(r => col(s"mh${bnd * 3 + r}").cast("string")): _*)
        .as(s"band$bnd")
    }
    val buckets = sig.select(col("doc_id") +: bandCols: _*)
      .select(col("doc_id"), expr("stack(4, 0, band0, 1, band1, 2, band2, 3, band3) as (band, bkey)"))
    val degenerate = buckets.groupBy("band", "bkey").agg(count(lit(1)).as("bn"))
      .filter(col("bn") > 50)
    assert(degenerate.count() == 0, "sf0.001 corpus unexpectedly has degenerate buckets")
  }
}
