package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Luby-style maximal independent set with DETERMINISTIC coins — the
  * symmetry-breaking primitive behind parallel scheduling/coloring
  * (SURVEY.md §2 annex; third member of the parallel-algorithm family
  * beside [[StableMatching]] and the closure loops).
  *
  * Per round every remaining node draws an md5-derived priority (keyed on
  * round AND node, so rounds are independent), joins the MIS iff its
  * priority precedes every remaining neighbor's (string order over
  * "hash:name", so ties are impossible), and winners' neighborhoods leave
  * the graph. Expected O(log n) rounds on any graph (Luby's analysis —
  * public, FOCS'85); the loop stops when no node remains. md5 in place of
  * RNG keeps every round replayable — reproducible, retry-idempotent, and
  * SQL-unrollable for the oracle, the same discipline as [[Walks]].
  *
  * Scale notes (100 TB): each round is one neighborhood min-aggregation +
  * one anti-join, all keyed on node — executor-parallel, state shrinks
  * monotonically (winners + their neighborhoods leave), and the round
  * count is logarithmic, not diameter-bound. [[Lineage.cut]] per round
  * keeps the plan flat.
  */
object MaximalIndependentSet {
  /** MIS membership with selection round.
    *
    * @param nodes (name) — full vertex set (isolated vertices included)
    * @param edges (a, b) — undirected edges, one canonical row per pair
    * @return (name, round) — MIS members and the 1-based round that
    *         selected them
    */
  def run(spark: SparkSession, nodes: DataFrame, edges: DataFrame,
      maxIter: Int = 32): DataFrame = {
    // materialize the adjacency ONCE, in the two partitionings the rounds
    // consume (VERDICT r11 item 1's stage-floor discipline): by nb for the
    // neighbor-priority probe, by name for the winners'-neighborhood
    // sweep. The carried remaining set keeps hash(name, N) through the
    // checkpoint, so the center-side joins are co-partitioned exchange-
    // free; each round pays exactly three exchanges (priorities re-keyed
    // to nb, candidates re-keyed to name, removed-set dedup) plus the
    // signal count. shuffle_hash hints stop AQE's broadcast demotion
    // (a broadcast build job per round for nothing).
    val shufN = spark.sessionState.conf.numShufflePartitions
    val sym = edges.select(col("a").as("name"), col("b").as("nb"))
      .unionByName(edges.select(col("b").as("name"), col("a").as("nb")))
    val symByNb = Lineage.cutHash(sym.repartition(shufN, col("nb")), shufN, "nb")
    val symByName = Lineage.cutHash(sym.repartition(shufN, col("name")), shufN, "name")
    val remaining0 = Lineage.cutHash(
      nodes.select("name").repartition(shufN, col("name")), shufN, "name")
    val mis0 = remaining0.withColumn("round", lit(0)).filter(lit(false))
    Iterate.fixedPoint("luby_mis", remaining0, mis0, maxIter,
        cut = Lineage.cutLazyHash(_, shufN, "name")) { (r, remaining, mis) =>
      val pri = remaining.withColumn("pri",
        expr(s"substring(md5('$r:' || name), 1, 15) || ':' || name"))
      val nbMin = symByNb
        .join(pri.hint("shuffle_hash")
          .select(col("name").as("nb"), col("pri").as("nb_pri"))
          .repartition(shufN, col("nb")), "nb")
        .select(col("name"), col("nb_pri"))
        .repartition(shufN, col("name"))
        .join(remaining.hint("shuffle_hash"), "name")
        .groupBy("name").agg(min("nb_pri").as("nb_min"))
      val winners = pri.join(nbMin.hint("shuffle_hash"), Seq("name"), "left")
        .filter(col("nb_min").isNull || col("pri") < col("nb_min"))
        .select(col("name"), lit(r).as("round"))
      val removed = winners.select("name")
        .unionByName(symByName.join(winners.hint("shuffle_hash").select("name"), "name")
          .select(col("nb").as("name")))
        .repartition(shufN, col("name"))
        .distinct()
      // LAZY cut: the MIS accumulator is never read by the loop itself, so
      // its blocks materialize at the caller's terminal action — the cut
      // only keeps the logical plan flat (VERDICT r10 item 1).
      (remaining.join(removed.hint("shuffle_hash"), Seq("name"), "left_anti"),
        Lineage.cutLazy(mis.unionByName(winners)))
    } { (_, mis) => mis }
  }
}
