package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Lineage

/** The partitioning-preserving checkpoint (graftbridge.CheckpointBridge)
  * is correctness-critical: a WRONG partitioning claim silently corrupts
  * joins (rows that should meet never co-locate) rather than erroring.
  * These cases pin (1) result-equality of claimed-cut co-partitioned joins
  * against plain-cut joins on randomized data, (2) that the claim really
  * eliminates the carried-side exchange (the whole point), and (3) the
  * empty-frame fallback (PropagateEmptyRelation collapses the pinned tail
  * to a 0-partition local relation — the claim must quietly downgrade).
  */
class CheckpointBridgeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark
  private def shufN = spark.sessionState.conf.numShufflePartitions

  test("claimed-cut joins equal plain-cut joins on 6 randomized frames") {
    import spark.implicits._
    var state = 0x2B5C91D7E3A64F01L
    def next(bound: Int): Int = {
      state = state * 6364136223846793005L + 1442695040888963407L
      (((state >>> 33) % bound) + bound).toInt % bound
    }
    for (g <- 0 until 6) {
      val n = 20 + next(200)
      val left = Seq.fill(n)((next(40).toLong, next(1000).toLong)).toDF("k", "v")
      val right = Seq.fill(n)((next(40).toLong, next(1000).toLong)).toDF("k", "w")
      // tails are pinned repartitions + preserving ops — the claim contract
      val lc = Lineage.cutLazyHash(
        left.repartition(shufN, col("k")).groupBy("k").agg(sum("v").as("v")),
        shufN, "k")
      val rc = Lineage.cutLazyHash(
        right.repartition(shufN, col("k")).filter(col("w") >= 0), shufN, "k")
      val got = lc.join(rc.hint("shuffle_hash"), Seq("k"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      val expect = Lineage.cutLazy(
          left.repartition(shufN, col("k")).groupBy("k").agg(sum("v").as("v")))
        .join(Lineage.cutLazy(right.repartition(shufN, col("k")).filter(col("w") >= 0)), Seq("k"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
      assert(got === expect, s"claimed-cut join diverged on instance $g")
    }
  }

  test("the claim eliminates the carried-side exchange; a plain cut does not") {
    import spark.implicits._
    val df = Seq.tabulate(500)(i => (i.toLong % 37, i.toLong)).toDF("k", "v")
    val base = df.repartition(shufN, col("k")).groupBy("k").agg(sum("v").as("v"))
    val probe = Seq.tabulate(37)(i => (i.toLong, i.toLong)).toDF("k", "p")
      .repartition(shufN, col("k"))
    // count k-keyed Exchange nodes: the claimed side must reach the join
    // with zero re-shuffles, so the claimed plan has strictly fewer
    def exchanges(plan: String): Int =
      plan.split("\n").count(l => l.contains("Exchange hashpartitioning(k"))
    val claimed = Lineage.cutLazyHash(base, shufN, "k")
    val pc = claimed.join(probe.hint("shuffle_hash"), Seq("k"))
      .queryExecution.executedPlan.toString
    val plain = Lineage.cutLazy(base)
    val pp = plain.join(probe.hint("shuffle_hash"), Seq("k"))
      .queryExecution.executedPlan.toString
    // both plans shuffle the probe side once; only the PLAIN cut re-shuffles
    // the carried side too
    assert(exchanges(pc) < exchanges(pp),
      s"claim did not remove an exchange:\nCLAIMED:\n${pc.take(1500)}\nPLAIN:\n${pp.take(1500)}")
    assert(!pc.split("\n").exists(l =>
        l.contains("Exchange") && l.contains("ENSURE_REQUIREMENTS") && l.contains("Scan ExistingRDD")),
      "claimed RDD scan was re-exchanged")
  }

  test("opt-in claim validation passes a true claim and fails a false one loudly") {
    import spark.implicits._
    val prev = spark.conf.getOption("graft.checkpoint.validateClaim")
    spark.conf.set("graft.checkpoint.validateClaim", "true")
    try {
      val df = Seq.tabulate(400)(i => (i.toLong % 53, i.toLong)).toDF("k", "v")
      // true claim: pinned repartition on k, claim k — every read re-hashes
      // a sample through the claim's partitionIdExpression and passes
      val good = Lineage.cutLazyHash(df.repartition(shufN, col("k")), shufN, "k")
      assert(good.count() === 400)
      // false claim #1: layout is hash(k), claim says hash(v)
      val wrongCol = Lineage.cutLazyHash(df.repartition(shufN, col("k")), shufN, "v")
      val e1 = intercept[Exception] { wrongCol.count() }
      assert(exceptionChain(e1).exists(_.getMessage != null) &&
        exceptionChain(e1).exists(m => m.getMessage != null &&
          m.getMessage.contains("claim VIOLATED")),
        s"expected a claim-violation failure, got: $e1")
      // false claim #2 (the ADVICE r12 scenario): a ROUND-ROBIN
      // repartition(N) has the right partition count but no hash layout
      val roundRobin = Lineage.cutLazyHash(df.repartition(shufN), shufN, "k")
      val e2 = intercept[Exception] { roundRobin.count() }
      assert(exceptionChain(e2).exists(m => m.getMessage != null &&
        m.getMessage.contains("claim VIOLATED")),
        s"expected a claim-violation failure, got: $e2")
    } finally prev match {
      case Some(v) => spark.conf.set("graft.checkpoint.validateClaim", v)
      case None => spark.conf.unset("graft.checkpoint.validateClaim")
    }
  }

  private def exceptionChain(e: Throwable): List[Throwable] = {
    val buf = scala.collection.mutable.ListBuffer[Throwable]()
    var cur = e
    while (cur != null && buf.size < 10) { buf += cur; cur = cur.getCause }
    buf.toList
  }

  test("empty frames fall back to an unclaimed cut and stay correct") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("k", "v")
      .repartition(shufN, col("k")).filter(col("v") > 0)
    val cut = Lineage.cutLazyHash(empty, shufN, "k")
    assert(cut.count() === 0)
    val probe = Seq((1L, 1L)).toDF("k", "p")
    assert(cut.join(probe, Seq("k")).count() === 0)
    assert(probe.join(cut, Seq("k"), "left").count() === 1)
  }
}
