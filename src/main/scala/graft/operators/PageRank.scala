package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixed-point power-iteration PageRank over an edge DataFrame — the
  * "most-depended-upon" centrality a package database surfaces on its
  * stats pages (reference analog: pkg2's popularity/importance ranking
  * over the depends graph; SURVEY.md §2.4 extension family).
  *
  * All arithmetic is 64-bit INTEGER fixed-point (`scale` = total rank
  * mass, integer division for both the per-edge contribution split and
  * the damping multiply). Floating-point power iteration is not
  * reproducible across engines (summation order changes low-order bits);
  * the integer form is bit-exact everywhere, so the DuckDB oracle can
  * re-derive the identical ranks by unrolling the same iterations.
  *
  * Dangling nodes (no out-edges) drop their mass — documented choice,
  * mirrored by the oracle; ranking is unaffected for the graphs this
  * engine serves (every rank still has the (1-d) floor).
  *
  * Scale notes (100 TB): each iteration is one equi-join of the rank
  * vector against the (static, cacheable) out-degree-annotated edges plus
  * one sum-aggregation keyed on the target node — partial aggregation
  * (map-side combine) applies, and the rank vector (one row per node) is
  * far smaller than the edge list. The fixed iteration count keeps the
  * whole power iteration one lazy plan (no per-step driver barrier, unlike
  * [[Closure]]'s emptiness-tested loop). Damping 85/100, the standard
  * public constant, as integer multiply-then-divide.
  */
object PageRank {
  /** @param edges directed edges (name, dep): rank flows name → dep
    * @param nodes one row per node (name) — defines the rank universe
    *              (isolated nodes keep the (1-d) floor)
    * @param iters fixed iteration count (no convergence test — keeps the
    *              job deterministic and the oracle unrollable)
    * @param scale total rank mass in fixed-point units; choose divisible
    *              by 100*|nodes| so init and floor are exact
    * @return (name, pr) with pr summing to ≤ scale
    */
  def run(spark: SparkSession, edges: DataFrame, nodes: DataFrame,
      iters: Int, scale: Long): DataFrame = {
    // Precondition probe must be eager and driver-side (an in-plan
    // assert_true would be pruned with its column); limit-1, not a full
    // count — the node COUNT itself stays in the plan below.
    require(!nodes.isEmpty, "PageRank needs a non-empty node set")
    // n folded in as a broadcast one-row aggregate instead of a driver
    // count(): building the rank frame costs zero full-table jobs, and at
    // 100x the node scan happens once inside the job instead of once
    // before it. `scale div 100 * 15` is n-free literal arithmetic.
    val consts = broadcast(nodes.agg(
      expr(s"$scale div count(1)").as("__init"),
      expr(s"${scale / 100 * 15} div count(1)").as("__floor")))

    // static per-iteration build side: each edge annotated with its
    // source's out-degree, so the contribution split is a single project.
    // No cache: all iterations live in ONE plan, where Catalyst dedups the
    // repeated subtree into a ReusedExchange — same one-materialization
    // effect with no storage pin to unpersist (PageRankSpec pins this).
    val ed = edges.join(edges.groupBy("name").agg(count(lit(1)).as("od")), "name")

    // The iteration count is FIXED, so the whole power iteration is one
    // lazy plan — no per-iteration action, checkpoint, or driver barrier
    // (unlike Closure, whose loop must run an emptiness test each step).
    // Each iteration adds one join + one partial-aggregated shuffle to the
    // chain; 8–16 layers is well inside Catalyst's comfort zone, and the
    // single job pipelines every stage. Lineage cuts would only add
    // write-barriers here: nothing is ever recomputed in one action.
    var pr = nodes.crossJoin(consts).select(col("name"), col("__init").as("pr"))
    var it = 0
    while (it < iters) {
      val contrib = pr.join(ed, "name")
        .select(col("dep").as("name"), expr("pr div od").as("c"))
        .groupBy("name").agg(sum("c").as("sc"))
      pr = nodes.join(contrib, Seq("name"), "left").crossJoin(consts)
        .select(col("name"),
          (col("__floor") + expr("(85 * coalesce(sc, 0L)) div 100")).as("pr"))
      it += 1
    }
    pr
  }

  /** Personalized PageRank (random walk with restart): the restart mass
    * returns to the SEED set instead of spreading uniformly, so ranks
    * measure proximity to the seeds — "what does this part of the graph
    * depend on", the recommendation/affinity signal next to [[run]]'s
    * global popularity. Same integer fixed-point contract as [[run]]
    * (bit-exact, oracle-unrollable); non-seed nodes start at 0 and earn
    * rank only through in-edges from the seeds' neighborhoods.
    *
    * Scale notes: identical per-iteration shape to [[run]] — one equi-join
    * against the degree-annotated edges + one partial-aggregated sum. The
    * seed set joins as a broadcast (seed lists are human-sized); the rank
    * vector stays one row per node.
    *
    * @param seeds one-column DataFrame (name) ⊆ nodes; restart mass splits
    *              evenly across it — pick `scale` divisible by
    *              100×|seeds| so init and restart floor are exact
    */
  def personalized(spark: SparkSession, edges: DataFrame, nodes: DataFrame,
      seeds: DataFrame, iters: Int, scale: Long): DataFrame = {
    require(!seeds.isEmpty, "personalized PageRank needs a non-empty seed set")
    val consts = broadcast(seeds.agg(
      expr(s"$scale div count(1)").as("__init"),
      expr(s"${scale / 100 * 15} div count(1)").as("__floor")))
    val seed = broadcast(seeds.select(col("name")).distinct()
      .withColumn("__is_seed", lit(1)))
    val ed = edges.join(edges.groupBy("name").agg(count(lit(1)).as("od")), "name")
    def withSeed(df: DataFrame): DataFrame =
      df.join(seed, Seq("name"), "left").crossJoin(consts)
    var pr = withSeed(nodes)
      .select(col("name"),
        when(col("__is_seed") === 1, col("__init")).otherwise(0L).as("pr"))
    var it = 0
    while (it < iters) {
      val contrib = pr.join(ed, "name")
        .select(col("dep").as("name"), expr("pr div od").as("c"))
        .groupBy("name").agg(sum("c").as("sc"))
      pr = withSeed(nodes.join(contrib, Seq("name"), "left"))
        .select(col("name"),
          (when(col("__is_seed") === 1, col("__floor")).otherwise(0L) +
            expr("(85 * coalesce(sc, 0L)) div 100")).as("pr"))
      it += 1
    }
    pr
  }
}
