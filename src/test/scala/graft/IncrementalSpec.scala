package graft

import org.scalatest.funsuite.AnyFunSuite

/** q98 sequence packing and q99 incremental near-dup: invariants the hash
  * oracle proves by value but not by meaning.
  */
class IncrementalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark

  test("q99 agrees with q42: every confirmed full-corpus pair crossing the new/base split is found") {
    // q42 (full-corpus LSH pairs, jaccard >= 0.5) restricted to pairs with
    // exactly one side in the new batch (id % 7 == 0) must be a subset of
    // what the directional new-vs-base query confirms — same buckets, same
    // cap, same verification, different join shape.
    val q42 = SparkEntry.queries("q42_minhash_lsh_pairs")(spark, SparkTestHarness.Sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => (a % 7 == 0) != (b % 7 == 0) }
      .map { case (a, b) => if (a % 7 == 0) (a, b) else (b, a) }
    val q99 = SparkEntry.queries("q99_incremental_neardup")(spark, SparkTestHarness.Sf0001)
      .collect()
      .map(r => r.getLong(0) -> r.getLong(2))
      .toMap
    val perNew = q42.groupBy(_._1).map { case (d, ps) => d -> ps.length.toLong }
    perNew.foreach { case (d, n) =>
      assert(q99.getOrElse(d, 0L) >= n,
        s"new doc $d: q42 confirms $n cross-split dup(s), q99 reports ${q99.get(d)}")
    }
  }

  test("q101 mixture table: shares sum to 1, drops equal q69's non-canonical members") {
    val rows = SparkEntry.queries("q101_data_mixture")(spark, SparkTestHarness.Sf0001).collect()
    assert(rows.nonEmpty)
    val shareSum = rows.map(_.getDouble(3)).sum
    assert(math.abs(shareSum - 1.0) < 1e-9, s"token shares must sum to 1, got $shareSum")
    rows.foreach { r =>
      assert(r.getLong(5) <= r.getLong(2), s"kept_tokens must not exceed n_tokens: $r")
      assert(r.getLong(4) <= r.getLong(1), s"dropped docs must not exceed docs: $r")
    }
    val totalDropped = rows.map(_.getLong(4)).sum
    val q69Dropped = SparkEntry.queries("q69_dedup_clusters")(spark, SparkTestHarness.Sf0001)
      .collect().count(_.getInt(3) == 0)
    assert(totalDropped === q69Dropped.toLong,
      "mixture drop count must equal the cluster assignment's non-canonical members")
  }

  test("q98 conserves token mass per language and bounds crossers") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q98_sequence_packing")(spark, SparkTestHarness.Sf0001).collect()
    val byLang = rows.groupBy(_.getString(0))
    val truth = Tables.documents(spark, SparkTestHarness.Sf0001)
      .groupBy("lang")
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("toks"),
        count(lit(1)).as("docs"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(byLang.keySet === truth.keySet)
    byLang.foreach { case (lang, rs) =>
      assert(rs.map(_.getLong(3)).sum === truth(lang)._1, s"$lang token mass")
      assert(rs.map(_.getLong(2)).sum === truth(lang)._2, s"$lang doc count")
      rs.foreach(r => assert(r.getLong(4) <= r.getLong(2), s"$lang crossers>docs: $r"))
      // bins are starts over a monotone running sum -> strictly increasing
      val bins = rs.map(_.getLong(1)).sorted
      assert(bins.distinct.length === bins.length, s"$lang duplicate bins")
    }
  }
}
