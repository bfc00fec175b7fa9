package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** k-core decomposition by iterative peeling (A11/A12 graph-family annex):
  * repeatedly drop nodes whose degree in the SURVIVING subgraph is < k
  * until a fixpoint — the standard density filter for dependency-graph
  * "load-bearing core" analysis and for community pre-filtering before
  * more expensive graph passes.
  *
  * Each round is one alive-semi-join on both edge endpoints + one degree
  * aggregation; convergence is the harness's count-stability test (the
  * alive set only shrinks, so a repeated count is the exact fixpoint) —
  * the same
  * Pregel-without-Pregel economics as [[Closure]]: per-round cost at toy
  * scale is the driver barrier; the joins scale out with executors. The
  * round count is bounded by the peeling depth (≤ |V|, in practice a few
  * rounds), and every round strictly shrinks the alive set or stops.
  */
object KCore {
  /** Nodes of the k-core of an UNDIRECTED graph.
    *
    * @param edges undirected edge list given as a DISTINCT symmetric-closed
    *              (name, dep) frame (callers pass both directions; see
    *              [[undirect]]) with no self-loops
    * @return single-column (name) frame of surviving core members
    */
  def run(spark: SparkSession, edgesIn: DataFrame, k: Int, maxIter: Int = 64): DataFrame = {
    // materialize the adjacency ONCE — every peel round joins it twice
    val edges = Lineage.cut(edgesIn)
    val alive0 = Lineage.cut(edges.select("name").distinct())
    // ONE job per round (VERDICT r10 item 1): next ⊆ alive by construction
    // (the degree frame only emits surviving-subgraph nodes), so subset +
    // equal cardinality ⟺ set equality — the harness's count of the cut
    // frame IS the exact fixpoint test, no anti-join probe job.
    Iterate.fixedPoint("kcore", alive0, alive0, maxIter,
        conv = Iterate.CountStable) { (_, alive, _) =>
      val survivingEdges = edges
        .join(alive, "name")
        .join(alive.select(col("name").as("dep")), "dep")
      val next = survivingEdges.groupBy("name").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select("name")
      (next, alive)
    } { (alive, _) => alive }
  }

  /** Symmetric closure of a directed edge frame, self-loops dropped — the
    * canonical input shape for [[run]].
    */
  def undirect(edges: DataFrame): DataFrame = {
    val fwd = edges.filter(col("name") =!= col("dep")).select("name", "dep")
    fwd.unionByName(fwd.select(col("dep").as("name"), col("name").as("dep")))
      .distinct()
  }
}
