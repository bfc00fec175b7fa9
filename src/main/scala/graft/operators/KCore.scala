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
    // EDGE-level peel state with windowed degrees (VERDICT r11 item 1's
    // stage-floor discipline): the carried frame is the surviving
    // symmetric edge set itself, and a round attaches both endpoints'
    // surviving degrees via two windowed counts — `count over (partition
    // by name)` then `over (partition by dep)` — and keeps edges whose
    // endpoints both clear k. No joins at all, so nothing re-shuffles the
    // adjacency per round and AQE has no join to demote: a round is
    // exactly two window exchanges plus the count signal. Node-alive and
    // edge-alive peeling reach the same fixpoint (an edge dies iff an
    // endpoint dies; a node dies iff its surviving degree drops below k —
    // the windowed filter applies both rules at once), and the surviving
    // edge count only shrinks, so the harness's count-stability test is
    // exact set equality. WindowExec sorts and spills per partition — a
    // hub node degrades to disk, the same exposure the old alive-join's
    // shuffle always had.
    import org.apache.spark.sql.expressions.Window
    val alive0 = Lineage.cut(edgesIn.select("name", "dep").distinct())
    val core = Iterate.fixedPoint("kcore", alive0, alive0, maxIter,
        conv = Iterate.CountStable) { (_, alive, _) =>
      val next = alive
        .withColumn("dn", count(lit(1)).over(Window.partitionBy("name")))
        .withColumn("dd", count(lit(1)).over(Window.partitionBy("dep")))
        .filter(col("dn") >= k && col("dd") >= k)
        .select("name", "dep")
      (next, alive)
    } { (alive, _) => alive }
    core.select("name").distinct()
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
