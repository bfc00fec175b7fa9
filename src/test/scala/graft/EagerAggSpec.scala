package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The eager-aggregation rewrite's soundness contract (Yan & Larson
  * VLDB'95), proven on CONSTRUCTED frames rather than the fixture so the
  * edge cases are guaranteed present:
  *
  *  - DUPLICATE dim keys (a multiplying join) — the duplication argument
  *    itself: every row of a key group joins the same m dim rows, so a
  *    pre-aggregate receiving m matches contributes exactly m copies of
  *    the group total, like the raw rows would;
  *  - NULL fact keys — dropped by the inner join on both plans;
  *  - NULLs in aggregated columns — count(x) skips them per key and the
  *    final sum of per-key counts equals the global skip-aware count;
  *  - dangling keys on both sides.
  *
  * Plus the bail-out pins: DISTINCT aggregates, non-inner joins, and
  * grouping on a fact attribute other than the join key must leave the
  * plan untouched — the rewrite only runs where the duplication argument
  * holds.
  */
class EagerAggSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark

  import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join => LJoin}

  private def hasPartialAggBelowJoin(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.collect { case j: LJoin => j }.exists { j =>
      Seq(j.left, j.right).exists(_.collectFirst { case a: Aggregate => a }.nonEmpty)
    }

  /** A session with the rule active over a flat stats store covering the
    * constructed fact table (rows=2000, ndv(k)=40 → fanout 50 ≥ 8). */
  private lazy val env: (org.apache.spark.sql.SparkSession, String, String) = {
    val s = spark.newSession()
    graft.plans.SketchStats.ensure(s)
    val scratch = java.nio.file.Files.createTempDirectory("graft_eageragg").toString
    import s.implicits._
    // fact: 2000 rows over 40 keys (~5% null keys), v = deterministic
    // ints, w nullable every 7th row
    val fact = (0 until 2000).map { i =>
      val k = if (i % 20 == 19) None else Some((i * 13 % 40).toLong)
      val w = if (i % 7 == 0) None else Some((i % 11).toLong)
      (k, (i * 31 % 97).toLong, w)
    }.toDF("k", "v", "w")
    fact.write.parquet(s"$scratch/facttbl")
    // dim: keys 0..49 (10 dangling), keys < 10 DUPLICATED 3×
    val dim = ((0 until 50).map(k => (k.toLong, s"g${k % 5}")) ++
      (0 until 10).flatMap(k => Seq((k.toLong, s"g${k % 5}"), (k.toLong, s"g${k % 5}"))))
      .toDF("dk", "grp")
    dim.write.parquet(s"$scratch/dimtbl")
    val store = s"$scratch/stats"
    Seq(("facttbl", "k", 40L)).toDF("tbl", "col", "ndv_est")
      .coalesce(1).write.parquet(s"$store/column_ndv")
    Seq(("facttbl", 2000L)).toDF("tbl", "row_count")
      .coalesce(1).write.parquet(s"$store/table_rows")
    s.conf.set(graft.plans.SketchStats.DirKey, store)
    (s, s"$scratch/facttbl", s"$scratch/dimtbl")
  }

  private def frames() = {
    val (s, fp, dp) = env
    (s, s.read.parquet(fp), s.read.parquet(dp))
  }

  test("duplicate dim keys, null keys, null agg inputs: rewritten == plain, exactly") {
    val (s, fact, dim) = frames()
    def q(f: org.apache.spark.sql.DataFrame, d: org.apache.spark.sql.DataFrame) =
      f.join(d, col("k") === col("dk"))
        .groupBy("grp")
        .agg(count(lit(1)).as("n"), sum("v").as("sv"), min("v").as("mn"),
          max("v").as("mx"), count(col("w")).as("nw"))
        .orderBy("grp")
    val rewritten = q(fact, dim)
    assert(hasPartialAggBelowJoin(rewritten), "rule did not fire on the covered fact")
    val sPlain = spark.newSession()
    val plain = q(sPlain.read.parquet(env._2), sPlain.read.parquet(env._3))
    assert(!hasPartialAggBelowJoin(plain))
    assert(rewritten.collect().toSeq === plain.collect().toSeq,
      "eager aggregation diverged from the plain plan")
    // sanity: the duplicated keys actually multiplied (n > fact matches)
    val nTotal = rewritten.agg(sum("n")).head().getLong(0)
    val factMatches = fact.join(dim.select("dk").distinct(), col("k") === col("dk")).count()
    assert(nTotal > factMatches, "fixture lost its duplicate-dim-key regime")
  }

  test("bails: DISTINCT aggregate, outer join, grouping on a non-key fact attribute") {
    val (s, fact, dim) = frames()
    val d1 = fact.join(dim, col("k") === col("dk"))
      .groupBy("grp").agg(countDistinct("v").as("ndv"))
    assert(!hasPartialAggBelowJoin(d1), "rewrote a DISTINCT aggregate")
    val d2 = fact.join(dim, col("k") === col("dk"), "left")
      .groupBy("grp").agg(sum("v").as("sv"))
    assert(!hasPartialAggBelowJoin(d2), "rewrote an outer join")
    val d3 = fact.join(dim, col("k") === col("dk"))
      .groupBy("w").agg(sum("v").as("sv"))
    assert(!hasPartialAggBelowJoin(d3), "rewrote a group-by on a non-key fact attribute")
  }

  test("avg decomposes to sum+count partials: rewritten == plain, exactly (incl. all-null groups)") {
    val (s, fact, dim) = frames()
    def q(f: org.apache.spark.sql.DataFrame, d: org.apache.spark.sql.DataFrame) =
      f.join(d, col("k") === col("dk"))
        .groupBy("grp")
        .agg(avg("v").as("av"), avg("w").as("aw"), count(lit(1)).as("n"))
        .orderBy("grp")
    val rewritten = q(fact, dim)
    assert(hasPartialAggBelowJoin(rewritten), "avg did not decompose through the pushdown")
    val sPlain = spark.newSession()
    val plain = q(sPlain.read.parquet(env._2), sPlain.read.parquet(env._3))
    // exact comparison: integral sums are exact in doubles and the final
    // division is the identical IEEE operation both ways
    assert(rewritten.collect().toSeq === plain.collect().toSeq,
      "decomposed avg diverged from Average")
  }

  test("grouping by the fact key itself is allowed and exact") {
    val (s, fact, dim) = frames()
    def q(f: org.apache.spark.sql.DataFrame, d: org.apache.spark.sql.DataFrame) =
      f.join(d, col("k") === col("dk"))
        .groupBy("k").agg(sum("v").as("sv"), count(lit(1)).as("n"))
        .orderBy("k")
    val rewritten = q(fact, dim)
    assert(hasPartialAggBelowJoin(rewritten))
    val sPlain = spark.newSession()
    val plain = q(sPlain.read.parquet(env._2), sPlain.read.parquet(env._3))
    assert(rewritten.collect().toSeq === plain.collect().toSeq)
  }
}
