package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deterministic graph walks — the sampling primitive under node2vec/
  * DeepWalk-style embedding pipelines, made reproducible (and oracle-
  * checkable) by replacing the RNG with a hash: at step k, walker `seed`
  * standing on `c` moves to the out-neighbor `d` minimizing
  * (md5("seed:k:c:d"), d). Every engine that can md5 agrees on the walk.
  *
  * Scale notes (100 TB): state is one row per walker; each step is one
  * equi-join walker-state ⋈ edges (shuffle on the current node — or a
  * broadcast probe when the edge list is dim-sized) plus a per-walker
  * window top-1. Steps are driver-loop iterations like Closure/PageRank —
  * barrier count = walk length, independent of graph or walker count.
  * The hash ranking means no per-walker RNG state ships across the
  * shuffle, so restarts/retries are idempotent (a lost executor replays
  * to the same walk).
  */
object Walks {
  /** Walk `steps` steps from every row of `seeds` (column `name`) over
    * `edges` (columns `name` → `dep`). Returns (seed, step, node) with
    * step 0 = the seed itself; a walker on a node with no out-edges stops
    * (no row for later steps).
    */
  def deterministicWalk(s: SparkSession, edges: DataFrame, seeds: DataFrame,
      steps: Int): DataFrame = {
    // materialize the edge relation once — every step joins it
    val e = Lineage.cut(edges.select(col("name").as("cur"), col("dep").as("nxt")))
    var state = seeds.select(col("name").as("seed"), col("name").as("node"),
      lit(0).as("step"))
    var all = state
    for (k <- 1 to steps) {
      val w = Window.partitionBy("seed").orderBy(col("hk"), col("nxt"))
      state = state.join(e, state("node") === e("cur"))
        .withColumn("hk", md5(concat_ws(":", col("seed"), lit(k), col("node"), col("nxt"))))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("seed"), col("nxt").as("node"), lit(k).as("step"))
      all = all.unionAll(state)
    }
    all
  }
}
