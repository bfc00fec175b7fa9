package graft

import java.util.concurrent.CyclicBarrier

import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Memo

/** Memo one-materialization cache: the concurrent-first-build race must
  * leave the winner's cache alive (ADVICE r4: Spark's CacheManager uncaches
  * by canonicalized plan, so a losing builder calling unpersist on its
  * plan-identical frame would silently drop the winner's cache too).
  */
class MemoSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark

  test("both racers get one frame and the winner's persist survives the race") {
    import spark.implicits._
    val barrier = new CyclicBarrier(2)
    val out = new Array[org.apache.spark.sql.DataFrame](2)
    val ts = (0 until 2).map { i =>
      new Thread(() => {
        out(i) = Memo.cached("race-test", spark, "memo-spec-shared", local = false) {
          // both threads are inside build before either reaches putIfAbsent
          barrier.await()
          Seq(1, 2, 3).toDF("v").groupBy().sum("v")
        }
      })
    }
    ts.foreach(_.start())
    ts.foreach(_.join(30000))
    assert(out(0) != null && out(1) != null)
    // exactly one entry won; both callers hold the same memoized frame
    assert(out(0) eq out(1))
    // the surviving frame is still persisted — before the fix the loser's
    // unpersist cleared the winner's cache (storage level back to NONE)
    assert(out(0).storageLevel === StorageLevel.MEMORY_AND_DISK)
    Memo.evict(spark, "memo-spec-shared")
    assert(out(0).storageLevel === StorageLevel.NONE, "evict must release the persist")
  }
}
