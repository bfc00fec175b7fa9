package graft

import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

/** Unpersist discipline for the shared shingle frame (VERDICT r3 item 9):
  * the cluster branch persists MEMORY_AND_DISK; evicting the memo entry
  * must release the storage, not leave it pinned for the session's life.
  * The cluster branch is driven from the local test session via
  * `frameImpl(local = false)`.
  */
class ShinglesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark
  private val dir = SparkTestHarness.Sf0001

  test("cluster-branch frame is persisted, and evict releases the storage") {
    queries.Shingles.evict(spark, dir) // drop any localCheckpoint memo from other suites
    val df = queries.Shingles.frameImpl(spark, dir, local = false)
    assert(df.storageLevel == StorageLevel.MEMORY_AND_DISK)
    assert(queries.Shingles.frameImpl(spark, dir, local = false) eq df, "memo must reuse the frame")
    queries.Shingles.evict(spark, dir)
    assert(df.storageLevel == StorageLevel.NONE, "evict must unpersist the cluster-branch frame")
  }
}
