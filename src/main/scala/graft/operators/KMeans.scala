package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-iteration Lloyd's k-means over an embedding column — the trainer
  * for the IVF coarse quantizer (queries/Vectors.scala q73/q104/q109 note
  * "a real deployment would train centroids with k-means"; this is that
  * trainer) and the blocking key for semantic dedup (cluster first, compare
  * pairs only within a cluster).
  *
  * Determinism / cross-engine parity: every arithmetic step is either an
  * exact IEEE operation or 64-bit integer fixed-point, so the DuckDB oracle
  * re-derives bit-identical centroids by unrolling the same iterations:
  *   - assignment maximizes `dot(v, c) - 0.5*|c|^2` (the squared-distance
  *     argmin with the constant `|v|^2` dropped); dot products and squared
  *     norms use the SEQUENTIAL left fold (codegen'd `array_dot` here,
  *     `list_reduce` over a prepended zero there), `0.5 * x` is exact, and
  *     ties break to the lowest cluster id on both engines;
  *   - the centroid update converts each element to binary fixed-point
  *     (`floor(x * 2^24)` — exact scale, exact floor) BEFORE summing, so
  *     the per-cluster sums are order-independent int64s; the new element
  *     divides two exactly-represented integers — one correctly-rounded
  *     IEEE divide, identical everywhere (same construction as q112's
  *     label centroids);
  *   - a cluster that captures no vectors keeps its previous centroid.
  *
  * Scale notes (100 TB): the plan per iteration is MLlib's own shape — the
  * centroid set (k x dim doubles) is tiny and lives on the driver, embedded
  * into the assignment projection as literals, so assignment is a MAP-ONLY
  * codegen'd pass over the corpus (no join, no shuffle); the update is one
  * partial-aggregated shuffle of at most k*dim groups. Iteration count is
  * fixed (no convergence test), keeping the job count deterministic and the
  * oracle unrollable.
  */
object KMeans {
  /** Fixed-point scale for centroid updates: 2^24 (exact for the fixture's
    * float32-derived values; q112 precedent).
    */
  val Scale = 16777216L

  /** Sequential left fold of `sum c_i * c_i` — the SAME order as the
    * codegen'd array_dot loop and the oracle's list_reduce.
    */
  def sqNorm(c: IndexedSeq[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < c.length) { s += c(i) * c(i); i += 1 }
    s
  }

  /** Assignment column (1-based cluster id) for `vecCol` under `centroids`.
    * Literal centroid arrays keep the pass map-only; `array_position` over
    * the score array takes the FIRST maximal index — ties to the lowest
    * cluster id, mirroring the oracle's `ORDER BY score DESC, cluster`.
    */
  def assignColumn(centroids: IndexedSeq[IndexedSeq[Double]], vecCol: String): Column = {
    val scores = centroids.map { c =>
      call_function("array_dot", col(vecCol), array(c.map(lit): _*)) -
        lit(0.5 * sqNorm(c))
    }
    val sa = array(scores: _*)
    array_position(sa, array_max(sa)).cast("int")
  }

  /** Run `iters` Lloyd iterations from `init` (k x dim); returns the final
    * centroids. `vecs` must carry `vecCol: array<double>` with no nulls and
    * a constant length `dim = init.head.length`.
    */
  def fit(vecs: DataFrame, init: IndexedSeq[IndexedSeq[Double]], iters: Int,
      vecCol: String = "v"): IndexedSeq[IndexedSeq[Double]] = {
    require(init.nonEmpty && iters >= 0, "need >= 1 initial centroid and iters >= 0")
    val dim = init.head.length
    require(init.forall(_.length == dim), "ragged initial centroids")
    graft.functions.GraftFunctions.ensureRegistered(vecs.sparkSession)
    var cent = init
    var it = 0
    while (it < iters) {
      // one partial-aggregated shuffle of <= k*dim fixed-point groups; the
      // collect is k*dim doubles — driver-tiny at any corpus size
      val upd = vecs
        .select(assignColumn(cent, vecCol).as("cluster"),
          posexplode(col(vecCol)).as(Seq("pos", "x")))
        .groupBy("cluster", "pos")
        .agg(sum(floor(col("x") * lit(Scale.toDouble))).cast("long").as("sxn"),
          count(lit(1)).as("nn"))
        .collect()
        .groupBy(_.getInt(0))
        .map { case (cl, rows) =>
          val c = new Array[Double](dim)
          rows.foreach(r => c(r.getInt(1)) = r.getLong(2).toDouble / (r.getLong(3) * Scale).toDouble)
          cl -> c.toIndexedSeq
        }
      cent = cent.indices.map(i => upd.getOrElse(i + 1, cent(i)))
      it += 1
    }
    cent
  }

  /** fit + final assignment appended as `cluster` (1-based int). */
  def fitAssign(vecs: DataFrame, init: IndexedSeq[IndexedSeq[Double]], iters: Int,
      vecCol: String = "v"): DataFrame = {
    val cent = fit(vecs, init, iters, vecCol)
    vecs.withColumn("cluster", assignColumn(cent, vecCol))
  }
}
