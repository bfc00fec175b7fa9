package graft.functions

import java.util.Arrays

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Bounded-state k-smallest-DISTINCT aggregation — the scale-safe core of
  * the KMV distinct sketch (q61) and of KMV set-operation estimation
  * (q125). State is a sorted array of at most k distinct values, so
  * partial aggregation runs map-side with O(k) memory per group and merge
  * is an O(k) sorted merge; contrast with the window-sort formulation
  * (`row_number() OVER (ORDER BY h)` then `rn = k`), which shuffles and
  * SORTS every distinct hash in each group to extract 64 values.
  * Distinctness is enforced inside the buffer (binary search on insert),
  * so no upstream `.distinct()` shuffle is needed either — the whole
  * sketch is one aggregation pass.
  */
abstract class KSmallestDistinctBase[OUT](k: Int)
    extends Aggregator[Long, Array[Long], OUT] {
  require(k >= 1)

  override def zero: Array[Long] = Array.emptyLongArray

  /** Sorted-insert x if absent and within the k smallest; arrays this
    * small (k = 64) make an arraycopy insert cheaper than any tree.
    */
  override def reduce(buf: Array[Long], x: Long): Array[Long] = {
    val pos = Arrays.binarySearch(buf, x)
    if (pos >= 0) buf // already present
    else {
      val ins = -pos - 1
      if (ins >= k) buf // larger than the current k smallest
      else {
        val n = math.min(buf.length + 1, k)
        val out = new Array[Long](n)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = x
        System.arraycopy(buf, ins, out, ins + 1, n - ins - 1)
        out
      }
    }
  }

  /** Sorted merge keeping the k smallest distinct values. */
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var n = 0
    while (n < out.length && (i < a.length || j < b.length)) {
      val takeA = j >= b.length || (i < a.length && a(i) <= b(j))
      val v = if (takeA) a(i) else b(j)
      if (takeA) i += 1 else j += 1
      if (i < a.length && a(i) == v) i += 1 // skip duplicate across sides
      if (j < b.length && b(j) == v) j += 1
      out(n) = v; n += 1
    }
    if (n == out.length) out else Arrays.copyOf(out, n)
  }

  // native long-array encoder: the buffer ships as an UnsafeArrayData of
  // primitives between partial and final aggregation, not Java serialization
  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}

/** `finish` returns the k-th smallest distinct value, or null when the
  * group holds fewer than k distinct values (the KMV estimator is
  * undefined there — callers filter, exactly as the old `rn = k` inner
  * join dropped those groups).
  */
class KthSmallestDistinct(k: Int) extends KSmallestDistinctBase[java.lang.Long](k) {
  override def finish(buf: Array[Long]): java.lang.Long =
    if (buf.length >= k) Long.box(buf(k - 1)) else null
  override def outputEncoder: Encoder[java.lang.Long] = Encoders.LONG
}

/** `finish` returns the whole sorted k-smallest-distinct array — the
  * mergeable KMV SKETCH itself. Sketches compose relationally: the k
  * smallest of `array_distinct(concat(sk_a, sk_b))` IS the union sketch
  * (KMV mergeability), which q125 exploits for union/intersection
  * cardinality estimates between groups without touching the raw data
  * again.
  */
class KSmallestDistinctList(k: Int) extends KSmallestDistinctBase[Array[Long]](k) {
  override def finish(buf: Array[Long]): Array[Long] = buf
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
