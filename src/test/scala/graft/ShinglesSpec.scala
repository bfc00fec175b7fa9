package graft

import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

/** Unpersist discipline for the shared memoized frames (VERDICT r3 item 9):
  * the cluster branch persists MEMORY_AND_DISK; evicting the memo entry
  * must release the storage, not leave it pinned for the session's life.
  * The cluster branch is driven from the local test session via
  * `Memo.cached(local = false)` — on a PRIVATE kind and dir key, so this
  * suite never mutates the "shingles"/"pairs"/"install_plan" entries that
  * other (parallel) suites are reading.
  */
class ShinglesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark

  test("cluster-branch memo entry is persisted, and evict releases the storage") {
    import spark.implicits._
    val dir = "spec://shingles-spec" // private key — not a real fixture dir
    val df = queries.Memo.cached("spec_probe", spark, dir, local = false) {
      Seq(1, 2, 3).toDF("x")
    }
    assert(df.storageLevel == StorageLevel.MEMORY_AND_DISK)
    val again = queries.Memo.cached("spec_probe", spark, dir, local = false) {
      fail("memo must reuse the frame, not rebuild")
    }
    assert(again eq df)
    queries.Memo.evict(spark, dir)
    assert(df.storageLevel == StorageLevel.NONE, "evict must unpersist the cluster-branch frame")
  }

  test("local-branch memo entry is checkpointed and survives eviction untouched") {
    import spark.implicits._
    val dir = "spec://shingles-spec-local"
    val df = queries.Memo.cached("spec_probe", spark, dir, local = true) {
      Seq(4, 5).toDF("x")
    }
    queries.Memo.evict(spark, dir)
    // localCheckpoint lineage is truncated; evict must NOT unpersist it —
    // a concurrent holder's frame stays readable after eviction
    assert(df.count() == 2)
  }
}
