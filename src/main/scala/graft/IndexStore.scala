package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.concurrent.ConcurrentHashMap

/** Generation-versioned index store (VERDICT r10 item 5): the persisted
  * ANN artifacts were overwrite-in-place, so a probe racing a rebuild
  * could read a half-written store. This utility gives every store root
  * the standard lakehouse generation discipline:
  *
  *   - writes land in a FRESH `gen=<n>` directory, staged under a
  *     `.inprogress` name and renamed into place only when complete;
  *   - a one-line `LATEST` manifest is swapped ATOMICALLY (tmp + atomic
  *     move) as the LAST step, so readers either see the old complete
  *     generation or the new complete one — never a partial store;
  *   - probes PIN the generation they resolved: the pinned path stays
  *     immutable for the probe's lifetime even while gen n+1 is being
  *     written (GenerationStoreSpec proves a pinned-gen probe serves
  *     correctly mid-rebuild);
  *   - retention keeps the last `keep` generations (default 2 — the
  *     current one plus the one a long probe may still be pinned to,
  *     q243's history-retention discipline applied to indexes) and
  *     deletes older ones after every publish;
  *   - in-JVM builds are serialized per root (interned lock — ADVICE
  *     r10), and a cross-JVM publish race is benign: each builder stages
  *     under a unique nonce, and whoever renames `gen=<n>` first wins —
  *     the loser republishes as n+1.
  */
object IndexStore {
  private val locks = new ConcurrentHashMap[String, Object]()
  private def lockFor(root: String): Object =
    locks.computeIfAbsent(root, _ => new Object)

  def genPath(root: String, id: Long): String = s"$root/gen=$id"

  private def manifest(root: String): Path = Paths.get(root, "LATEST")

  /** The latest COMPLETE generation id, if any (manifest present AND the
    * generation directory carries its completion marker). */
  def latestGen(root: String): Option[Long] =
    try {
      if (!Files.exists(manifest(root))) None
      else {
        val id = new String(Files.readAllBytes(manifest(root)), "UTF-8").trim.toLong
        if (Files.exists(Paths.get(genPath(root, id), "_GRAFT_COMPLETE"))) Some(id) else None
      }
    } catch { case _: Throwable => None }

  /** Path of the latest complete generation, for probes to PIN. */
  def latestPath(root: String): Option[String] = latestGen(root).map(genPath(root, _))

  /** Build and publish the next generation: `write` receives the staging
    * directory and must leave a complete store in it. Returns the
    * published generation's path. Serialized per root within the JVM. */
  def publish(root: String, keep: Int = 2)(write: String => Unit): String =
    lockFor(root).synchronized {
      Files.createDirectories(Paths.get(root))
      var id = latestGen(root).getOrElse(0L) + 1
      val nonce = java.util.UUID.randomUUID().toString.take(8)
      val staging = Paths.get(s"$root/.inprogress-$nonce")
      Files.createDirectories(staging)
      write(staging.toString)
      Files.write(staging.resolve("_GRAFT_COMPLETE"), Array.emptyByteArray)
      // adopt the next free slot if a cross-JVM racer took ours
      var target = Paths.get(genPath(root, id))
      while (Files.exists(target)) { id += 1; target = Paths.get(genPath(root, id)) }
      Files.move(staging, target)
      val tmp = Paths.get(s"$root/LATEST.tmp-$nonce")
      Files.write(tmp, id.toString.getBytes("UTF-8"))
      try Files.move(tmp, manifest(root), StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
      catch { case _: java.nio.file.AtomicMoveNotSupportedException =>
        Files.move(tmp, manifest(root), StandardCopyOption.REPLACE_EXISTING)
      }
      retain(root, keep)
      target.toString
    }

  /** Delete every complete generation older than the newest `keep`.
    * Staging directories and the pinned window are never touched. */
  def retain(root: String, keep: Int): Unit = {
    val latest = latestGen(root).getOrElse(return)
    val dir = new java.io.File(root)
    Option(dir.listFiles()).getOrElse(Array.empty).foreach { f =>
      val n = f.getName
      if (n.startsWith("gen=")) {
        val id = try n.drop(4).toLong catch { case _: NumberFormatException => Long.MaxValue }
        if (id <= latest - keep) deleteRecursively(f)
      }
    }
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(); ()
  }
}
