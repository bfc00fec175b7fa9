package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
import org.apache.spark.sql.execution.LogicalRDD

/** Lineage truncation that PRESERVES a hash-partitioning claim.
  *
  * `Dataset.localCheckpoint(eager = false)` under AQE constructs its
  * LogicalRDD with an unusable output partitioning (the adaptive plan's
  * partitioning is not final at cut time, and the attribute rewrite drops
  * it), so every iterative operator's carried frame re-enters the next
  * round as UNKNOWN-partitioned and EnsureRequirements re-shuffles it at
  * every join — one extra exchange stage-job per use per round, measured
  * throughout the fixed-point family.
  *
  * This bridge rebuilds the cut frame's LogicalRDD with an EXPLICIT
  * HashPartitioning over the named output columns. The claim is sound iff
  * the frame's physical layout really is that partitioning — which the
  * callers guarantee by ending the plan in `repartition(n, cols)` (pinned
  * REPARTITION_BY_NUM: AQE never coalesces user-numbered repartitions)
  * followed only by partitioning-preserving operators (aggregate on a
  * superset of the keys, filter, project keeping the key exprIds, window
  * partitioned by the keys). A checkpoint/`map(_.copy())` never moves rows
  * between partitions, so the claim survives the cut. The partition-count
  * half of the claim is verified at runtime (`require` below); the
  * hash-function half is by construction (both the pinned exchange and any
  * future consumer exchange use Murmur3 `HashPartitioning`).
  *
  * Misuse caution: claiming a partitioning the rows do not have produces
  * WRONG JOIN RESULTS, not an error — this API is for the operator loops,
  * each of which is covered by randomized property specs plus the
  * 280-query DuckDB parity gate.
  */
object CheckpointBridge {
  def cutLazyHash(df: DataFrame, numPartitions: Int, cols: Seq[String]): DataFrame = {
    val classic = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
    val spark = classic.sparkSession
    val qe = classic.queryExecution
    val rdd = qe.toRdd.map(_.copy())
    if (spark.sparkContext.getCheckpointDir.isDefined) rdd.checkpoint()
    else rdd.localCheckpoint()
    val output = qe.analyzed.output
    // Optimizer rewrites can collapse the pinned tail — most commonly
    // PropagateEmptyRelation turning an empty frame into a 0-partition
    // LocalRelation. The claim's partition-count half no longer holds, so
    // fall back to an UNCLAIMED cut (correctness over the saved exchange);
    // claims only attach when the physical layout provably matches.
    val part =
      if (rdd.getNumPartitions == numPartitions) {
        val exprs = cols.map(c => output.find(_.name == c).getOrElse(
          throw new IllegalArgumentException(s"cutLazyHash: no output column '$c'")))
        HashPartitioning(exprs, numPartitions)
      } else org.apache.spark.sql.catalyst.plans.physical.UnknownPartitioning(
        rdd.getNumPartitions)
    org.apache.spark.sql.classic.Dataset.ofRows(spark,
      LogicalRDD(output, rdd, part, Nil, false)(spark))
  }
}
