package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed transitive closure / BFS over an edge DataFrame — the one
  * driver-side loop in the engine (SURVEY.md §3.1 entry point 3: pkg2's
  * install-plan resolution walk, re-expressed as iterative joins).
  *
  * Cycle-safe by construction: the frontier is anti-joined against the
  * visited set every iteration, so each node enters at most once (at its
  * minimum depth — BFS order guarantees it). [[Lineage.cut]] per iteration
  * truncates lineage (reliable checkpoint when the session has a
  * checkpoint dir, localCheckpoint otherwise); without it, iteration i's
  * plan embeds all i-1 predecessors and analysis time grows quadratically.
  *
  * Scale notes (100 TB): each iteration is one shuffled join keyed on the
  * frontier node id + one distinct — the standard Pregel-without-Pregel
  * shape. Caching `edges` is the caller's choice (do it when the loop
  * dominates); frontier/visited stay small relative to edges in typical
  * dependency graphs.
  */
object Closure {
  /** Reachable set from `seed` with minimal BFS depth per node.
    *
    * @param edges DataFrame with columns (name, dep): a directed edge
    *              name → dep
    * @return DataFrame (name, depth) sorted by name; seed has depth 0
    */
  def reachable(spark: SparkSession, edges: DataFrame, seed: String, maxIter: Int = 64): DataFrame = {
    import spark.implicits._
    // the single-source walk IS the multi-source walk with one root — one
    // loop to maintain, no chance for the two forms to drift
    reachableAll(spark, edges, Seq(seed).toDF("root"), maxIter)
      .select(col("name"), col("depth")).orderBy("name")
  }

  /** Multi-source BFS: the reachable set WITH min depth from EVERY root at
    * once — the batch form a package database runs to annotate all
    * packages (install-set size, tree depth) in one pass instead of
    * looping `reachable` per root. State is keyed (root, name); each
    * iteration is still ONE shuffled join + one min-aggregation + one
    * anti-join, just on the composite key, and all roots advance together
    * so the iteration count is the MAX closure depth, not the sum.
    *
    * @param roots DataFrame with column (root)
    * @return DataFrame (root, name, depth)
    */
  def reachableAll(spark: SparkSession, edgesIn: DataFrame, roots: DataFrame,
      maxIter: Int = 64): DataFrame = {
    // ONE exchange per hop (VERDICT r11 item 1's stage-floor discipline).
    // The carried state is the whole visited set with min depths, pinned
    // hash(name, N) — a SUBSET of the (root, name) grouping key, so the
    // min-depth re-aggregation runs on it exchange-free, the layer filter
    // preserves it, and the frontier⋈edges probe is co-partitioned with
    // the once-partitioned edge relation (shuffle_hash hint so AQE never
    // demotes it to a broadcast build job). The old shape anti-joined each
    // hop's candidates against an UNPARTITIONED visited union — two
    // exchanges re-shuffling the whole visited set every hop, ~11–15 AQE
    // stage-jobs per round; this shape re-aggregates instead of
    // anti-joining (min-depth is idempotent, so rediscoveries are free)
    // and pays 1 exchange per hop + the signal. Rewriting visited per
    // round is the standard Pregel superstep economics; at 100 TB it is
    // a hash-local write, not a shuffle.
    //
    // TWO hops per driver barrier (measured in r10/r11: 4-hop batching
    // regressed — the uncut deep chain recomputes; the in-batch
    // intermediate is lazily cut here, so nothing is computed twice).
    // Convergence is exact and batch-aware: new nodes need a parent in
    // the LAST layer, so "no depth == 2r row" means the closure is
    // complete even when hop 1 of the round found nodes.
    val shufN = spark.sessionState.conf.numShufflePartitions
    // claimed cuts (Lineage.cutHash/cutLazyHash): every frame below ends
    // in a pinned repartition(N, name) (or a partitioning-preserving tail
    // over one), so the hash(name, N) layout survives the checkpoint and
    // the hop join is co-partitioned with NO exchange on either side —
    // a plain cut comes back unknown-partitioned and re-shuffles both
    // sides every hop (see CheckpointBridge).
    val edges = Lineage.cutHash(edgesIn.repartition(shufN, col("name")), shufN, "name")
    val init = roots.select(col("root"), col("root").as("name"), lit(0).as("depth"))
    def hop(fr: DataFrame, vis: DataFrame): DataFrame =
      vis.unionByName(
          fr.hint("shuffle_hash").join(edges, "name")
            .select(col("root"), col("dep").as("name"), (col("depth") + 1).as("depth")))
        .repartition(shufN, col("name"))
        .groupBy("root", "name").agg(min("depth").as("depth"))
    val visited = Iterate.fixedPoint("closure", init, init,
        (maxIter + 1) / 2, conv = Iterate.FlagSum("__new"),
        cut = Lineage.cutLazyHash(_, shufN, "name")) { (r, st, _) =>
      val vis0 = st.select(col("root"), col("name"), col("depth"))
      val st1 = Lineage.cutLazyHash(
        hop(vis0.filter(col("depth") === lit(2 * (r - 1))), vis0), shufN, "name")
      // odd maxIter: the final round runs a single hop so the cap is
      // honored exactly (maxIter bounds HOPS, not barriers)
      val two = 2 * r - 1 < maxIter
      val stN = if (two) hop(st1.filter(col("depth") === lit(2 * r - 1)), st1) else st1
      val st2 = stN.withColumn("__new",
        (col("depth") === lit(if (two) 2 * r else 2 * r - 1)).cast("long"))
      (st2, st)
    } { (f, _) => f }
    visited.select(col("root"), col("name"), col("depth").cast("int").as("depth"))
  }
}
