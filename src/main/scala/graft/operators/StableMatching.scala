package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed Gale-Shapley stable matching — proposer-optimal deferred
  * acceptance over a complete bipartite preference relation (SURVEY.md §2
  * annex; the assignment companion to the closure/shortest-path/temporal
  * operator family).
  *
  * The package-manager reading: proposers are workloads (or repos),
  * acceptors are mirrors (or build slots), and both sides rank each other;
  * the stable matching is the assignment no pair wants to defect from —
  * the property that makes decentralized placement converge instead of
  * thrash.
  *
  * Parallel deferred acceptance: every free proposer proposes to its best
  * not-yet-rejecting acceptor in the SAME round; each acceptor keeps the
  * best of {current holder} ∪ {this round's proposals} and rejects the
  * rest. All steps are relational — one anti-join (rejections), two
  * row_number windows (best proposal per proposer, best suitor per
  * acceptor), one union — so rounds are executor-parallel; the driver only
  * checks the free count. Determinism: scores are totally ordered with
  * name tie-breaks, so the fixed point is unique and SQL-replayable.
  * Classic G-S theory bounds rounds by O(n²) but random preferences
  * converge in a handful; the loop stops the first round with no free
  * proposer. [[Lineage.cut]] per round keeps the plan flat.
  *
  * Scale notes (100 TB): state is (engagements, rejections) — both bounded
  * by proposals made, not n²; preference rows are scanned per round keyed
  * on the free proposers (a shrinking set). At warehouse scale the
  * preference relation is the big side: partition it by proposer and the
  * per-round candidate join is co-located.
  */
object StableMatching {
  /** Proposer-optimal stable matching over complete preferences.
    *
    * @param prefs (proposer, acceptor, p_score, a_score) — complete
    *              bipartite preference table; LOWER score = more preferred
    *              on both sides
    * @return (proposer, acceptor) — the unique proposer-optimal stable
    *         matching under the (score, name) total order
    */
  def run(spark: SparkSession, prefsIn: DataFrame, maxIter: Int = 64): DataFrame = {
    // materialize the preference relation ONCE — every round joins it
    // three times, and without the cut each round's jobs re-execute the
    // caller's derivation (scans, distincts, the md5 cross product)
    val prefs = Lineage.cut(prefsIn)
    val proposers = Lineage.cutLazy(prefs.select("proposer").distinct())
    // the proposer-optimal/unique-fixpoint guarantees (and the "everyone
    // matches" termination test) assume a COMPLETE bipartite relation —
    // enforce it instead of silently spinning maxIter rounds on partial
    // preferences. ONE upfront job for all three counts (and it
    // materializes the lazy proposers cut's source scan).
    val shape = prefs.agg(count(lit(1)).as("n"),
      countDistinct(col("proposer")).as("np"),
      countDistinct(col("acceptor")).as("na")).head()
    val (nPrefs, nProposers, nAcceptors) = (shape.getLong(0), shape.getLong(1), shape.getLong(2))
    require(nPrefs == nProposers * nAcceptors,
      s"StableMatching requires complete preferences: expected ${nProposers * nAcceptors} " +
        s"rows ($nProposers proposers x $nAcceptors acceptors)")
    // ONE tagged state frame (eng ∪ rej) per round, lazily checkpointed —
    // the loop head's grouped-count job both materializes it and reads the
    // termination counts, so each iteration costs exactly one driver job
    // (driver barriers, not data volume, dominate iterative cost at the
    // small end)
    var state = Lineage.cutLazy(prefs
      .select(col("proposer"), col("acceptor"), lit("eng").as("tag"))
      .filter(lit(false)))
    var iter = 0
    var done = false
    var prevEng = -1L
    var prevRej = -1L
    val wProp = Window.partitionBy("proposer").orderBy(col("p_score"), col("acceptor"))
    val wAcc = Window.partitionBy("acceptor").orderBy(col("a_score"), col("proposer"))
    while (iter < maxIter && !done) {
      val eng = state.filter(col("tag") === "eng").select("proposer", "acceptor")
      val rej = state.filter(col("tag") === "rej").select("proposer", "acceptor")
      // ONE count job per round (grouped by tag); terminate on full
      // engagement OR on a fixed point — a round that changes neither the
      // engagement nor the rejection count can never make progress again
      // (rejections grow monotonically), so looping to maxIter would just
      // re-checkpoint identical state
      val counts = state.groupBy("tag").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val engCount = counts.getOrElse("eng", 0L)
      val rejCount = counts.getOrElse("rej", 0L)
      if (engCount == nProposers || (engCount == prevEng && rejCount == prevRej)) done = true
      else {
        prevEng = engCount
        prevRej = rejCount
        val free = proposers.join(eng.select("proposer"), Seq("proposer"), "left_anti")
        val prop = prefs.join(free, "proposer")
          .join(rej, Seq("proposer", "acceptor"), "left_anti")
          .withColumn("rn", row_number().over(wProp)).filter(col("rn") === 1)
          .select("proposer", "acceptor")
        val cont = prop.unionByName(eng)
          .join(prefs.select("proposer", "acceptor", "a_score"), Seq("proposer", "acceptor"))
        val best = cont.withColumn("rn", row_number().over(wAcc)).filter(col("rn") === 1)
          .select("proposer", "acceptor")
        val losers = cont.select("proposer", "acceptor")
          .join(best, Seq("proposer", "acceptor"), "left_anti")
        // LAZY cut: the next loop head's grouped-count job is the action
        // that materializes this round's state — one driver job per round
        // instead of checkpoint + count (VERDICT r10 item 1).
        state = Lineage.cutLazy(
          best.withColumn("tag", lit("eng"))
            .unionByName(rej.unionByName(losers).withColumn("tag", lit("rej"))))
        iter += 1
      }
    }
    state.filter(col("tag") === "eng").select("proposer", "acceptor")
  }
}
