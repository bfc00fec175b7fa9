package graft.queries

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.Tables

/** One materialized word-3-gram shingle frame per (session, fixture dir),
  * shared by the near-dup family (q41 inverted-index, q42 MinHash+LSH,
  * q43 SimHash). The split+transform+array_distinct+explode+md5 subtree is
  * the dominant common cost of all three queries; materializing it once and
  * memoizing avoids both (a) recomputing it per query and (b) the round-1
  * `cache()` approach, whose CacheManager entry pinned session memory and
  * silently warmed CROSS-query plan matches.
  *
  * Columns: (doc_id, sh, hk) where hk is the 60-bit md5-prefix key. The
  * narrower hash bases the other queries need are exact integer projections
  * of hk (first-8-hex-chars value = hk >> 28, since 16^7 = 2^28), so one
  * md5 per shingle serves all three hash families and the DuckDB oracles —
  * which re-derive from md5 directly — still hash-match bit-for-bit.
  *
  * Materialization strategy (ADVICE r2): `localCheckpoint` blocks are
  * executor-local and unreplicated — fine on local[*] where there is one
  * "executor" and the ContextCleaner releases blocks on GC, but an executor
  * loss on a real cluster would kill the job with lineage truncated. So on
  * a cluster this memoizes a MEMORY_AND_DISK persist instead (recomputable
  * lineage, released by unpersist/GC).
  */
object Shingles {
  /** `persisted` marks the cluster branch — the only branch evict may
    * unpersist. A localCheckpoint frame has TRUNCATED lineage: unpersisting
    * it would destroy the data for any concurrent holder, so local-branch
    * blocks are left to the ContextCleaner (GC-driven), as before.
    */
  private final case class Entry(df: DataFrame, persisted: Boolean)

  /** Keyed (session, dir, kind): kind "shingles" is the raw shingle-key
    * frame; kind "pairs" is the q41 pair frame (shared by q41/q69/q74 —
    * the pair join is the dedup family's second dominant shared cost).
    */
  private val memo = new ConcurrentHashMap[(SparkSession, String, String), Entry]()

  private def cached(kind: String, s: SparkSession, dir: String, local: Boolean)(
      build: => DataFrame): DataFrame = {
    // entries for stopped sessions are dead weight — drop before insert
    // (their blocks died with the context; nothing to unpersist)
    memo.keySet.removeIf(k => k._1.sparkContext.isStopped)
    memo.computeIfAbsent((s, dir, kind), _ => {
      val raw = build
      if (local) Entry(raw.localCheckpoint(), persisted = false)
      else { raw.persist(StorageLevel.MEMORY_AND_DISK); Entry(raw, persisted = true) }
    }).df
  }

  def frame(s: SparkSession, dir: String): DataFrame =
    frameImpl(s, dir, s.sparkContext.isLocal)

  /** Materialization split out with an explicit `local` flag so the cluster
    * (persist) branch is unit-testable from a local session (ShinglesSpec).
    */
  private[graft] def frameImpl(s: SparkSession, dir: String, local: Boolean): DataFrame =
    cached("shingles", s, dir, local) {
      Tables.documents(s, dir)
        .select(col("doc_id"),
          expr("explode(array_distinct(transform(sequence(1, size(split(text, ' ')) - 2), " +
            "i -> concat_ws(' ', slice(split(text, ' '), i, 3)))))").as("sh"))
        .withColumn("hk", expr("cast(conv(substring(md5(sh), 1, 15), 16, 10) as bigint)"))
    }

  /** Memoized materialization of the q41 near-dup pair frame under the same
    * (session, dir) discipline as the shingle frame.
    */
  private[graft] def pairsFrame(s: SparkSession, dir: String)(build: => DataFrame): DataFrame =
    cached("pairs", s, dir, s.sparkContext.isLocal)(build)

  /** Unpersist discipline (VERDICT r3 item 9): memo eviction releases the
    * cluster-branch persists — a long-lived shared session no longer pins
    * MEMORY_AND_DISK blocks forever.
    */
  def evict(s: SparkSession, dir: String): Unit =
    Seq("shingles", "pairs").foreach { kind =>
      Option(memo.remove((s, dir, kind))).foreach { e =>
        if (e.persisted)
          try e.df.unpersist(blocking = false)
          catch { case _: Throwable => () } // stopped context: blocks already gone
      }
    }
}
