package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** One materialized word-3-gram shingle frame per (session, fixture dir),
  * shared by the near-dup family (q41 inverted-index, q42 MinHash+LSH,
  * q43 SimHash). The split+transform+array_distinct+explode+md5 subtree is
  * the dominant common cost of all three queries.
  *
  * Columns: (doc_id, sh, hk) where hk is the 60-bit md5-prefix key. The
  * narrower hash bases the other queries need are exact integer projections
  * of hk (first-8-hex-chars value = hk >> 28, since 16^7 = 2^28), so one
  * md5 per shingle serves all three hash families and the DuckDB oracles —
  * which re-derive from md5 directly — still hash-match bit-for-bit.
  *
  * Materialization + eviction semantics live in [[Memo]].
  */
object Shingles {
  def frame(s: SparkSession, dir: String): DataFrame =
    Memo.memoized("shingles", s, dir) {
      // shingle construction is the codegen'd token_ngrams kernel (one
      // boundary scan per doc); ExpressionsSpec pins it equal to the
      // split/slice/concat HOF pipeline it replaced, so every oracle that
      // re-derives shingles from string ops still hash-matches
      graft.functions.GraftFunctions.ensureRegistered(s)
      Tables.documents(s, dir)
        .select(col("doc_id"),
          explode(array_distinct(call_function("token_ngrams", col("text"), lit(3)))).as("sh"))
        .withColumn("hk", expr("cast(conv(substring(md5(sh), 1, 15), 16, 10) as bigint)"))
    }

  /** Memoized materialization of the q41 near-dup pair frame under the same
    * (session, dir) discipline as the shingle frame.
    */
  private[graft] def pairsFrame(s: SparkSession, dir: String)(build: => DataFrame): DataFrame =
    Memo.memoized("pairs", s, dir)(build)

  /** Release every memoized frame for (session, dir) — see [[Memo.evict]]. */
  def evict(s: SparkSession, dir: String): Unit = Memo.evict(s, dir)
}
