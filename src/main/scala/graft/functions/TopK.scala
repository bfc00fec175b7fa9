package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.Encoder

/** Bounded-state per-group top-k by (score DESC, id ASC tie-break) — the
  * generalization of [[KthSmallestDistinct]]'s pattern from order
  * statistics to ranked rows. State is a sorted array of at most k
  * (score, id) pairs: partial aggregation runs map-side with O(k) memory
  * per group and merge is an O(k) sorted merge. Contrast with the
  * `row_number() OVER (PARTITION BY g ORDER BY score DESC)` formulation
  * (q10), which shuffles and SORTS every row of every group to keep k —
  * at 100 TB the window sort is the bottleneck, the aggregator is a
  * map-side combine. q77 judges this against a DuckDB window oracle;
  * PlanAuditSpec pins the no-Window plan shape.
  */
class TopKByScore(k: Int) extends Aggregator[
    (Double, Long), Array[(Double, Long)], Array[(Double, Long)]] {
  require(k >= 1)

  /** a ranks strictly before b. */
  @inline private def before(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Array[(Double, Long)] = Array.empty

  override def reduce(buf: Array[(Double, Long)], x: (Double, Long)): Array[(Double, Long)] = {
    var ins = 0
    while (ins < buf.length && before(buf(ins), x)) ins += 1
    if (ins >= k) buf
    else {
      val n = math.min(buf.length + 1, k)
      val out = new Array[(Double, Long)](n)
      System.arraycopy(buf, 0, out, 0, ins)
      out(ins) = x
      System.arraycopy(buf, ins, out, ins + 1, n - ins - 1)
      out
    }
  }

  override def merge(a: Array[(Double, Long)], b: Array[(Double, Long)]): Array[(Double, Long)] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new Array[(Double, Long)](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var n = 0
    while (n < out.length) {
      val takeA = j >= b.length || (i < a.length && before(a(i), b(j)))
      out(n) = if (takeA) a(i) else b(j)
      if (takeA) i += 1 else j += 1
      n += 1
    }
    out
  }

  override def finish(buf: Array[(Double, Long)]): Array[(Double, Long)] = buf

  override def bufferEncoder: Encoder[Array[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[(Double, Long)]]()
  override def outputEncoder: Encoder[Array[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[(Double, Long)]]()
}
