package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Deterministic mergeable HyperLogLog sketch (m = 64 registers, p = 6).
  *
  * The reference exposes approximate distinct counts over package/user keys
  * (SURVEY.md §2.4 A3); Spark's builtin `approx_count_distinct` is a
  * HLL++ whose register layout is engine-private, which is why q19 is the
  * one judged query stuck at a rows-only check. This sketch closes that
  * gap: every step is deterministic and REPRODUCIBLE IN ANSI SQL, so the
  * DuckDB oracle rebuilds the identical registers and the identical
  * integer estimate — the sketch itself is hash-verified (q230), not just
  * row-counted.
  *
  * Determinism discipline:
  *   - hash = first 15 hex chars of md5(key) → a 60-bit non-negative long
  *     (15 chars so the SQL re-derivation fits a signed BIGINT cast).
  *   - bucket = top 6 bits (h div 2^54); rem = h mod 2^54.
  *   - rho = 55 - bitlength(rem) (rem = 0 → 55), i.e. leading-zero count
  *     of the 54-bit remainder + 1 — in SQL: 55 - length(ltrim(bin(rem),'0')).
  *   - estimate: alpha_64 = 0.7213/(1 + 1.079/64) EXACTLY as the rational
  *     461632/650790, and the harmonic sum Σ 2^-reg is carried as the
  *     INTEGER Σ 2^(55-reg) (max 64·2^55 = 2^61, no overflow), so
  *     raw_est = (461632·4096·2^55) div (650790·Σ) is pure integer
  *     arithmetic — no float ever enters, both engines floor identically.
  *
  * Scale notes (100 TB): the whole point of HLL — the aggregation state is
  * 64 bytes per group regardless of cardinality, partial aggregation
  * (map-side combine) applies, and `merge` (element-wise max) makes the
  * sketch mergeable across partitions, days, or rollup levels. Register
  * arrays can be persisted and OR-merged later exactly like the q225
  * bitmap family, but at fixed size instead of |distinct|/8 bits.
  */
class HllSketch extends Aggregator[String, Array[Byte], Seq[Long]] {
  import HllSketch._

  override def zero: Array[Byte] = new Array[Byte](M)

  override def reduce(buf: Array[Byte], key: String): Array[Byte] = {
    if (key == null) return buf
    val h = hash60(key)
    val bucket = (h >>> 54).toInt
    val rem = h & ((1L << 54) - 1)
    val rho = if (rem == 0L) 55 else java.lang.Long.numberOfLeadingZeros(rem) - 9
    if (rho > buf(bucket)) buf(bucket) = rho.toByte
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Byte]): Seq[Long] = buf.toSeq.map(_.toLong)

  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object HllSketch {
  /** Register count (2^6). */
  val M = 64

  /** md5(key) first 15 hex chars as a 60-bit long — the same digest DuckDB's
    * `md5(CAST(k AS VARCHAR))` yields, so the oracle derives bit-equal
    * hashes from SQL.
    */
  private[graft] def hash60(key: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(key.getBytes("UTF-8"))
    // first 15 hex chars = first 7 bytes + high nibble of byte 8
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    (h << 4) | ((d(7) & 0xf0L) >>> 4)
  }
}
