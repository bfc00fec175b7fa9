package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Components

/** Connected-components semantics on adversarial graphs: multiple
  * components, long chains (diameter ≫ 1 forces several propagation
  * rounds), direction-blindness, self-loops, and cluster assignment
  * canonical flags.
  */
class ComponentsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark

  private def comps(pairs: (Long, Long)*): Map[Long, Long] = {
    import spark.implicits._
    Components.connected(spark, pairs.toDF("src", "dst")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("two components get their own min labels") {
    val r = comps(5L -> 3L, 3L -> 9L, 20L -> 30L)
    assert(r === Map(3L -> 3L, 5L -> 3L, 9L -> 3L, 20L -> 20L, 30L -> 20L))
  }

  test("long chain converges to the global min despite diameter") {
    // 10 → 9 → ... → 1, min label must travel the whole chain
    val r = comps((1L to 9L).map(i => (i + 1) -> i): _*)
    assert(r === (1L to 10L).map(_ -> 1L).toMap)
  }

  test("edges are undirected: label flows against edge direction") {
    val r = comps(1L -> 7L, 9L -> 7L) // 9 reaches min 1 only via reversed edge
    assert(r === Map(1L -> 1L, 7L -> 1L, 9L -> 1L))
  }

  test("self-loop is harmless and keeps the node labeled") {
    val r = comps(4L -> 4L, 4L -> 2L)
    assert(r === Map(2L -> 2L, 4L -> 2L))
  }

  test("q74 curation audit: every doc is kept, dup-dropped, or quality-dropped") {
    val rows = SparkEntry.queries("q74_corpus_curation")(spark, SparkTestHarness.Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (docs, kept, dup, qual) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(docs == kept + dup + qual, s"unattributed drops in ${r.getString(0)}")
    }
    // the quality bar must actually drop something somewhere
    assert(rows.map(_.getLong(4)).sum > 0)
  }

  test("q69 cluster assignment: exactly one canonical per cluster, sizes add up") {
    val out = SparkEntry.queries("q69_dedup_clusters")(spark, SparkTestHarness.Sf0001).collect()
    if (out.nonEmpty) {
      val byCluster = out.groupBy(_.getLong(1))
      byCluster.foreach { case (cid, rows) =>
        assert(rows.count(_.getInt(3) == 1) == 1, s"cluster $cid canonical count != 1")
        assert(rows.forall(_.getLong(2) == rows.length), s"cluster $cid size mismatch")
        assert(rows.map(_.getLong(0)).min == cid, s"cluster $cid id is not the min doc_id")
      }
    }
  }
}
