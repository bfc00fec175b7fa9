package graft

import org.scalatest.funsuite.AnyFunSuite

/** The generation-versioned index store's contract (VERDICT r10 item 5):
  * writes land in fresh generations behind an atomically-swapped
  * manifest, a probe pinned to generation N serves correctly WHILE
  * generation N+1 is half-written, incomplete generations are invisible,
  * and retention deletes only generations older than the keep window.
  */
class GenerationStoreSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_genstore").toString + "/store"

  test("publish → latest; incomplete generations are invisible") {
    val root = freshRoot()
    assert(IndexStore.latestGen(root).isEmpty)
    val p1 = IndexStore.publish(root) { g =>
      java.nio.file.Files.write(java.nio.file.Paths.get(g, "data"), "v1".getBytes)
    }
    assert(IndexStore.latestGen(root).contains(1L))
    assert(IndexStore.latestPath(root).contains(p1))
    // a half-written generation (staging dir, no manifest swap) is invisible
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(root, ".inprogress-xxxx"))
    assert(IndexStore.latestGen(root).contains(1L))
    // a gen dir WITHOUT its completion marker is also invisible even if
    // someone scribbled the manifest first (torn publish)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root, "gen=9"))
    java.nio.file.Files.write(java.nio.file.Paths.get(root, "LATEST"), "9".getBytes)
    assert(IndexStore.latestGen(root).isEmpty) // gen=9 incomplete → no complete latest
  }

  test("a probe pinned to gen N serves correctly while gen N+1 is half-written") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val root = freshRoot()
    val g1 = IndexStore.publish(root) { g =>
      (1 to 100).map(i => (i.toLong, i * 2L)).toDF("k", "v")
        .coalesce(1).write.parquet(s"$g/t")
    }
    val pinned = IndexStore.latestPath(root).get
    assert(pinned == g1)
    var probedMidWrite = 0L
    var latestMidWrite: Option[Long] = None
    IndexStore.publish(root) { g =>
      // gen 2 is HALF-WRITTEN right now: one table already landed,
      // nothing marked complete, manifest still points at gen 1
      (1 to 50).map(i => (i.toLong, i * 3L)).toDF("k", "v")
        .coalesce(1).write.parquet(s"$g/t")
      latestMidWrite = IndexStore.latestGen(root)
      probedMidWrite = spark.read.parquet(s"$pinned/t")
        .agg(sum("v")).head().getLong(0)
    }
    assert(latestMidWrite.contains(1L), "manifest moved before gen 2 completed")
    assert(probedMidWrite == (1 to 100).map(_ * 2L).sum,
      "pinned-generation probe diverged during the concurrent rebuild")
    // after the publish completes, the manifest points at gen 2
    assert(IndexStore.latestGen(root).contains(2L))
    val newSum = spark.read.parquet(s"${IndexStore.latestPath(root).get}/t")
      .agg(sum("v")).head().getLong(0)
    assert(newSum == (1 to 50).map(_ * 3L).sum)
  }

  test("retention keeps the newest `keep` generations and deletes the rest") {
    val root = freshRoot()
    (1 to 4).foreach { i =>
      IndexStore.publish(root, keep = 2) { g =>
        java.nio.file.Files.write(java.nio.file.Paths.get(g, "data"), s"v$i".getBytes)
      }
    }
    assert(IndexStore.latestGen(root).contains(4L))
    val gens = new java.io.File(root).listFiles()
      .map(_.getName).filter(_.startsWith("gen=")).sorted.toSeq
    assert(gens == Seq("gen=3", "gen=4"), s"retention left $gens")
  }

  test("concurrent publishes serialize per root and land as distinct generations") {
    val root = freshRoot()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      val futures = (1 to 4).map { i =>
        pool.submit(new java.util.concurrent.Callable[String] {
          override def call(): String = IndexStore.publish(root, keep = 10) { g =>
            java.nio.file.Files.write(java.nio.file.Paths.get(g, "data"), s"w$i".getBytes)
          }
        })
      }
      val paths = futures.map(_.get(120, java.util.concurrent.TimeUnit.SECONDS))
      assert(paths.distinct.size == 4, "publishes collided on a generation dir")
      assert(IndexStore.latestGen(root).contains(4L))
    } finally pool.shutdown()
  }
}
