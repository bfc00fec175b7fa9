package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The DOUBLE→cents stats domain (VERDICT r16 item 5): stored counters
  * must equal exact cents masses, the planner must consume them for
  * equality AND range shapes, and an unbounded price domain must refuse
  * loudly instead of materializing a key-sized relation.
  */
class CentsDomainSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark
  private val dir = SparkTestHarness.Sf0001

  test("stored l_discount cents counters equal the exact per-cent masses through build + append") {
    val s = spark.newSession()
    val root = queries.StatsStore.scratchRoot("graft_cents_eq")
    val li = Tables.lineitem(s, dir)
    queries.StatsStore.buildTableStats(s, root, "lineitem",
      li.filter(expr("l_orderkey % 5 <> 0")), Seq("l_partkey"), Nil, Seq("l_discount"))
    queries.StatsStore.appendTableStats(s, root, "lineitem",
      li.filter(expr("l_orderkey % 5 = 0")), Seq("l_partkey"), Nil, Seq("l_discount"))
    val stored = graft.plans.StatsCatalog.histCounts(s, root)(("lineitem", "l_discount"))
    val exact = li.groupBy(
        expr("cast(floor(cast(l_discount as double) * 100 + cast(0.5 as double)) as bigint)").as("k"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(stored == exact,
      s"merged cents counters diverged from exact masses: $stored vs $exact")
  }

  test("a DOUBLE equality literal lowers through the cents key to the EXACT counter mass") {
    // litKey lowers `l_discount = 0.1` through the identical
    // floor(x·100 + 0.5) → key 10 (the double 0.1 rounds UP through the
    // +0.5, exactly like the builder's in-plan lowering), and the scan
    // bound equals ceil(base · mass / total) — the store→catalog→planner
    // arithmetic pinned end-to-end without a size-tuned join
    val s = spark.newSession()
    val root = queries.StatsStore.scratchRoot("graft_cents_eqkey")
    queries.StatsStore.buildTableStats(s, root, "lineitem",
      Tables.lineitem(s, dir), Seq("l_partkey"), Nil, Seq("l_discount"))
    val rows = graft.plans.StatsCatalog.rows(s, root)
    val cnts = graft.plans.StatsCatalog.histCounts(s, root)
    val bytes = graft.plans.StatsCatalog.srcBytes(s, root)
    val plan = Tables.lineitem(s, dir)
      .filter(col("l_discount") === 0.1)
      .select(col("l_partkey"), col("l_discount"))
      .queryExecution.optimizedPlan
    val bound = graft.plans.SketchStats.histFilteredScanBound(
      plan, rows, Map.empty, cnts, bytes)
    val m = cnts(("lineitem", "l_discount"))
    val exactMass = Tables.lineitem(s, dir)
      .filter(col("l_discount") === 0.1).count()
    assert(m.getOrElse(10L, 0L) == exactMass,
      s"stored mass for cents key 10 diverged: ${m.get(10L)} vs $exactMass")
    val base = rows("lineitem")
    val total = m.values.sum
    val expected = (BigInt(base) * exactMass + total - 1) / total
    assert(bound.contains(expected.toLong.max(1L)),
      s"double equality bound $bound != ceil($base*$exactMass/$total)")
  }

  test("DECIMAL columns lower to the same cents domain: stored counters and literal pricing agree") {
    // the fixtures ship only DOUBLE money columns, so the DecimalType
    // branches (counterDomain, litKey/litRangeKey, inSetKeys) get a
    // constructed DECIMAL(12,2) frame: stored counter keys must equal the
    // exact cents, and a Decimal literal must price through the identical
    // lowering — one arithmetic across both storage types
    val s = spark.newSession()
    val scratch = queries.StatsStore.scratchDir("graft_dec_cents")
    import s.implicits._
    val raw = (0 until 600).map(i => (i.toLong, BigDecimal((i % 40) * 25, 2)))
      .toDF("id", "price")
      .select(col("id"), col("price").cast("decimal(12,2)").as("price"))
    raw.write.parquet(s"$scratch/prices.parquet")
    val tbl = s.read.parquet(s"$scratch/prices.parquet")
    assert(tbl.schema("price").dataType ==
      org.apache.spark.sql.types.DecimalType(12, 2))
    val root = s"$scratch/store"
    queries.StatsStore.buildTableStats(s, root, "prices", tbl,
      Seq("id"), Seq("price"))
    val stored = graft.plans.StatsCatalog.histCounts(s, root)(("prices", "price"))
    // domain: (i % 40) * 25 basis points → cents keys 0, 25, 50, ... 975
    val exact = (0 until 40).map(k => (k * 25).toLong -> 15L).toMap
    assert(stored == exact, s"decimal cents counters diverged: $stored")
    // a DECIMAL literal prices through the identical lowering: the
    // optimized filter carries a Decimal-typed literal, and the equality
    // bound equals the exact per-key mass share
    val rows = graft.plans.StatsCatalog.rows(s, root)
    val bytes = graft.plans.StatsCatalog.srcBytes(s, root)
    val cnts = graft.plans.StatsCatalog.histCounts(s, root)
    val eqPlan = tbl.filter(col("price") === BigDecimal("2.50"))
      .queryExecution.optimizedPlan
    val eqBound = graft.plans.SketchStats.histFilteredScanBound(
      eqPlan, rows, Map.empty, cnts, bytes)
    assert(eqBound.contains(15L), s"decimal equality bound $eqBound != 15")
    // and a RANGE literal through the cents boundaries (price >= 7.50
    // keeps keys 750..975 — 10 of 40 keys; the equi-depth bound charges
    // from the nearest stored boundary, so it is an upper bound >= 150)
    val hist = graft.plans.StatsCatalog.hist(s, root)
    val rgPlan = tbl.filter(col("price") >= BigDecimal("7.50"))
      .queryExecution.optimizedPlan
    val rgBound = graft.plans.SketchStats.histFilteredScanBound(
      rgPlan, rows, hist, cnts, bytes)
    val trueSel = tbl.filter(col("price") >= BigDecimal("7.50")).count()
    assert(rgBound.exists(b => b >= trueSel && b <= 600L),
      s"decimal range bound $rgBound is not a sound upper bound on $trueSel")
  }

  test("an unbounded double domain refuses loudly from BOTH the counter build and the analyze walk") {
    val s = spark.newSession()
    // l_extendedprice: 5,998 distinct cents at sf0.001 (583k at sf0.1) —
    // lower the seams below it so the spec exercises the production
    // refusal without a 600k-row fixture
    queries.StatsStore.withCaps(carryRows = 4096, histDomain = 4096L) {
      val root = queries.StatsStore.scratchRoot("graft_cents_refuse")
      val e1 = intercept[IllegalStateException] {
        queries.StatsStore.buildTableStats(s, root, "lineitem",
          Tables.lineitem(s, dir), Seq("l_partkey"), Seq("l_extendedprice"))
      }
      assert(e1.getMessage.contains("counter domain"),
        s"counter refusal lost its message: ${e1.getMessage}")
      val e2 = intercept[IllegalArgumentException] {
        queries.StatsStore.analyze(s, dir,
          queries.StatsStore.scratchRoot("graft_cents_refuse2"),
          Seq(("lineitem", Seq("l_partkey"))),
          hist = Seq(("lineitem", Seq("l_extendedprice"))))
      }
      assert(e2.getMessage.contains("histogram domain"),
        s"analyze-walk refusal lost its message: ${e2.getMessage}")
    }
  }
}
