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
  * rest. Because proposals follow preference order, "best not-yet-
  * rejecting" is just the proposer's (rejections + 1)-th choice — so the
  * state is a rank POINTER per proposer, not a rejection set, and a round
  * is one pointer-probe join plus one acceptor window (the McVitie-Wilson
  * counter observation applied relationally). Determinism: scores are
  * totally ordered with name tie-breaks, so the fixed point is unique and
  * SQL-replayable. Classic G-S theory bounds rounds by O(n²) but random
  * preferences converge in a handful; the loop stops the first round with
  * no free proposer, via the [[Iterate.FlagSum]] signal riding the state
  * materialization (one driver job per round).
  *
  * Scale notes (100 TB): state is one row per live proposer; the ranked
  * preference relation is the big side, probed per round by (proposer,
  * rank) key — partition it by proposer and the probe is co-located;
  * rejection history costs nothing because it is implied by the pointer.
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
    // materialize the preference relation ONCE — without the cut each
    // round's jobs re-execute the caller's derivation (scans, distincts,
    // the md5 cross product)
    val prefs = Lineage.cut(prefsIn)
    // the proposer-optimal/unique-fixpoint guarantees assume a COMPLETE
    // bipartite relation — enforce it instead of silently spinning
    // maxIter rounds on partial preferences.
    val shape = prefs.agg(count(lit(1)).as("n"),
      countDistinct(col("proposer")).as("np"),
      countDistinct(col("acceptor")).as("na")).head()
    val (nPrefs, nProposers, nAcceptors) = (shape.getLong(0), shape.getLong(1), shape.getLong(2))
    require(nPrefs == nProposers * nAcceptors,
      s"StableMatching requires complete preferences: expected ${nProposers * nAcceptors} " +
        s"rows ($nProposers proposers x $nAcceptors acceptors)")
    // Rank-pointer deferred acceptance (VERDICT r11 item 1's job-floor
    // discipline applied here): G-S proposals follow each proposer's
    // preference order, so the rejection SET the old shape carried (and
    // anti-joined twice per round) collapses to a COUNTER — a free
    // proposer rejected k times proposes to its (k+1)-th choice. Per-round
    // state is one row per live proposer: (acceptor or null, a_score,
    // ptr); a round is ONE join (free pointers → their next ranked
    // proposal) and ONE acceptor window (incumbent ∪ proposals, keep the
    // best) — no anti-joins, no per-round rejection growth. The carried
    // a_score makes the acceptor window self-contained, so the preference
    // relation is only ever probed by pointer. Progress is structural:
    // every free proposer's pointer advances every round (win or lose),
    // and a proposer that exhausts its list (ptr = |acceptors|, possible
    // only when proposers outnumber acceptors) leaves the state, so the
    // free-count signal reaches zero without a fixed-point probe.
    val wProp = Window.partitionBy("proposer").orderBy(col("p_score"), col("acceptor"))
    val wAcc = Window.partitionBy("acceptor").orderBy(col("a_score"), col("proposer"))
    val ranked = Lineage.cut(prefs
      .withColumn("p_rank", row_number().over(wProp).cast("long"))
      .select("proposer", "acceptor", "a_score", "p_rank"))
    val accType = prefs.schema("acceptor").dataType
    val scoreType = prefs.schema("a_score").dataType
    val state0 = ranked.select("proposer").distinct()
      .withColumn("acceptor", lit(null).cast(accType))
      .withColumn("a_score", lit(null).cast(scoreType))
      .withColumn("ptr", lit(0L))
      .withColumn("__free", lit(1L))
    val out = Iterate.fixedPoint("stable_matching", state0, state0, maxIter,
        conv = Iterate.FlagSum("__free")) { (_, state, _) =>
      val eng = state.filter(col("acceptor").isNotNull)
        .select("proposer", "acceptor", "a_score", "ptr")
      val free = state.filter(col("acceptor").isNull && col("ptr") < lit(nAcceptors))
        .select(col("proposer"), col("ptr"))
      val prop = ranked.join(free, Seq("proposer"))
        .filter(col("p_rank") === col("ptr") + 1L)
        .select(col("proposer"), col("acceptor"), col("a_score"),
          col("p_rank").as("ptr"))
      val next = eng.unionByName(prop)
        .withColumn("rn", row_number().over(wAcc))
        .select(col("proposer"),
          when(col("rn") === 1, col("acceptor")).as("acceptor"),
          when(col("rn") === 1, col("a_score")).as("a_score"),
          col("ptr"))
        .withColumn("__free", col("acceptor").isNull.cast("long"))
      (next, next)
    } { (f, _) => f }
    out.filter(col("acceptor").isNotNull).select("proposer", "acceptor")
  }
}
