package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Truth tables for the constraint-resolution surface (VERDICT r2 item 4):
  * parse_constraint splitting and the op-CASE satisfaction semantics that
  * q64 composes with version_compare.
  */
class ResolutionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark

  private def parse(spec: String): (String, String, String) = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    val r = Seq(spec).toDF("s")
      .select(expr("parse_constraint(s)").as("c"))
      .select("c.name", "c.op", "c.ver").head()
    (r.getString(0), r.getString(1), r.getString(2))
  }

  test("parse_constraint truth table: every operator plus bare names") {
    assert(parse("foo>=1.2.3") == ("foo", ">=", "1.2.3"))
    assert(parse("foo<=1.2.3") == ("foo", "<=", "1.2.3"))
    assert(parse("foo>1.2") == ("foo", ">", "1.2"))
    assert(parse("foo<2:1.0-r1") == ("foo", "<", "2:1.0-r1"))
    assert(parse("foo=1.0") == ("foo", "=", "1.0"))
    assert(parse("foo~1.4") == ("foo", "~", "1.4"))
    assert(parse("libc-dev") == ("libc-dev", "", ""))
    // first operator wins; the rest stays in ver (degenerate but total)
    assert(parse("a>=1>=2") == ("a", ">=", "1>=2"))
    assert(parse(">=1.0") == ("", ">=", "1.0"))
  }

  test("satisfaction semantics: op CASE over version_compare") {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    val cases = Seq(
      // (version, spec, expected)
      ("2.6.0-r1", "x>=2.6.0", true),   // -r1 > no-revision
      ("2.5.9-r5", "x>=2.6.0", false),
      ("2.6.0-r1", "x<2.6.0", false),
      ("1.9.0-r1", "x<1.10.0", true),   // numeric-aware: 9 < 10
      ("2.6.0-r1", "x=2.6.0", false),   // revision breaks exact equality
      ("2.6.0", "x=2.6.0", true),
      ("1.6.2-r1", "x~1.4", true),      // same major, >= 1.4
      ("2.0.0-r1", "x~1.4", false),     // major moved
      ("1.2.0-r1", "x~1.4", false),     // below the floor
      ("0.1.0-r1", "x", true))          // bare name: any version
    val df = cases.toDF("version", "spec", "expected")
      .withColumn("c", expr("parse_constraint(spec)"))
      .withColumn("ok", expr(
        """case c.op
          | when '>=' then version_compare(version, c.ver) >= 0
          | when '>'  then version_compare(version, c.ver) > 0
          | when '<=' then version_compare(version, c.ver) <= 0
          | when '<'  then version_compare(version, c.ver) < 0
          | when '='  then version_compare(version, c.ver) = 0
          | when '~'  then version_compare(version, c.ver) >= 0
          |            and split(version, '[.]')[0] = split(c.ver, '[.]')[0]
          | else version is not null
          |end""".stripMargin))
    val bad = df.filter(col("ok") =!= col("expected")).collect()
    assert(bad.isEmpty, s"satisfaction mismatches: ${bad.mkString(", ")}")
  }

  test("q63/q64/q65 return non-degenerate results on sf0.001") {
    val dir = SparkTestHarness.Sf0001
    val owners = SparkEntry.queries("q63_file_owner")(spark, dir).collect()
    assert(owners.nonEmpty && owners.forall { r: Row => r.getLong(1) >= 1 })
    val res = SparkEntry.queries("q64_provides_resolution")(spark, dir).collect()
    assert(res.length == 120) // 60 names x 2 specs
    // '>=' specs (i % 3 == 0) must resolve: several providers carry high versions
    assert(res.exists(r => r.getLong(3) > 1))
    val rev = SparkEntry.queries("q65_reverse_provides")(spark, dir).collect()
    assert(rev.length == 20 && rev.forall(_.getLong(1) == 3)) // 60 names / 20 aliases
  }

  test("q70: replaces overrides a conflict, plain conflicts block, both directions count") {
    val dir = SparkTestHarness.Sf0001
    val rows = SparkEntry.queries("q70_conflict_check")(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getString(2), r.getInt(3)))).toMap
    assert(rows.size == 40) // 60 names minus 20 installed
    // i=2: conflicts with pkg-27 (installed, 27%3==0), no replaces (2%4!=0) → blocked
    assert(rows("pkg-02") == ((1L, "pkg-27", 0)))
    // i=8: conflicts with pkg-33 (installed) BUT 8%4==0 → replaces overrides → installable
    assert(rows("pkg-08") == ((0L, "", 1)))
    // some candidate must be blocked purely by direction 2 (an installed
    // package declaring the conflict against it)
    assert(rows.values.exists(_._1 > 0))
  }

  test("q72: apk and deb pick different latest versions on the _rc/_p family") {
    val dir = SparkTestHarness.Sf0001
    val rows = SparkEntry.queries("q72_apk_version_order")(spark, dir).collect()
    assert(rows.length == 60)
    val full = rows.filter(_.getLong(1) == 3) // names carrying all three variants
    assert(full.nonEmpty)
    full.foreach { r =>
      assert(r.getString(2).endsWith("_p1"), s"apk latest must be _p1: $r")
      assert(r.getString(3).endsWith("_rc1"), s"deb latest must be _rc1: $r")
    }
  }

  test("q95: a < pin held back by the upgrade, a >= spec surviving it, a broken = pin") {
    import spark.implicits._
    // X has 1.0 and 3.0: A's "X<2.0" resolves today (1.0) but breaks on
    // upgrade-to-latest (3.0) -> held_back. B's "X>=1.0" survives. C's
    // "X=9.9" never resolves (not held back - it was never resolvable).
    val packages = Seq("X" -> "1.0", "X" -> "3.0", "Y" -> "1.0")
      .toDF("name", "version")
    val provides = packages.select(col("name"), col("name").as("provides_name")).distinct()
    val specs = Seq("A" -> "X<2.0", "B" -> "X>=1.0", "C" -> "X=9.9", "D" -> "Y")
      .toDF("name", "spec")
    val r = graft.queries.Resolution.upgradeBreakage(specs, provides, packages)
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4))).toMap
    assert(r("X") === ((3L, 2L, 1L, 1L)), s"got $r") // 3 specs; <2.0 and >=1.0 resolvable; only >=1.0 latest-ok; <2.0 held back
    assert(r("Y") === ((1L, 1L, 1L, 0L)), s"got $r") // bare name: any version, upgrade-proof
  }

  test("q95 fixture invariants: latest-ok bounded by resolvable, held_back is the exact delta") {
    val rows = SparkEntry.queries("q95_upgrade_breakage")(spark, SparkTestHarness.Sf0001).collect()
    assert(rows.length === 60)
    rows.foreach { r =>
      val (inc, res, lat, held) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(lat <= res && res <= inc, s"ordering violated: $r")
      assert(held === res - lat, s"held_back must be resolvable minus latest-ok: $r")
    }
  }

  test("q96: plan license rollup partitions the q68 install plan") {
    val plan = SparkEntry.queries("q68_install_plan")(spark, SparkTestHarness.Sf0001).collect()
    val roll = SparkEntry.queries("q96_plan_licenses")(spark, SparkTestHarness.Sf0001).collect()
    assert(roll.map(_.getString(0)).toSet.subsetOf(Set("mit", "gpl", "apache")))
    assert(roll.map(_.getLong(1)).sum === plan.length.toLong,
      "every plan member contributes exactly one license")
    assert(roll.map(_.getLong(3)).sum <= roll.map(_.getLong(1)).sum)
  }

  test("q102 owner_curr agrees with q63's owner pick on the /usr/bin subset") {
    // same snapshot, same (version, name) max-by rule — two independent
    // query formulations must name the same owner for every shared path
    val q63 = SparkEntry.queries("q63_file_owner")(spark, SparkTestHarness.Sf0001)
      .collect().map(r => r.getString(0) -> r.getAs[String]("owner_name")).toMap
    val q102 = SparkEntry.queries("q102_owner_transitions")(spark, SparkTestHarness.Sf0001)
      .collect().map(r => r.getString(0) -> r.getAs[String]("owner_curr")).toMap
    assert(q63.nonEmpty)
    q63.foreach { case (path, owner) =>
      assert(q102.get(path).contains(owner), s"owner mismatch on $path")
    }
    // and the release must actually move some ownership
    val changed = SparkEntry.queries("q102_owner_transitions")(spark, SparkTestHarness.Sf0001)
      .collect().count(_.getAs[Int]("owner_changed") == 1)
    assert(changed > 0, "fixture release must change at least one path's owner")
  }

  test("reverse impact walks only satisfiable edges, transitively") {
    // A depends on X with a satisfiable range; B's '=' pin matches no
    // existing X version (pruned — B is NOT impacted); C reaches X only
    // through A. Reverse closure from X must be exactly {X:0, A:1, C:2}.
    import spark.implicits._
    val packages = Seq("A" -> "1.0", "B" -> "1.0", "C" -> "1.0", "X" -> "2.0")
      .toDF("name", "version")
    val provides = packages.select(col("name"), col("name").as("provides_name"))
    val specs = Seq("A" -> "X>=1.0", "B" -> "X=9.9", "C" -> "A").toDF("name", "spec")
    val fwd = graft.queries.Resolution.resolutionEdges(specs, provides, packages)
    val rev = fwd.select(col("dep").as("name"), col("name").as("dep"))
    val r = graft.operators.Closure.reachable(spark, rev, "X").collect()
      .map(row => row.getString(0) -> row.getInt(1)).toMap
    assert(r === Map("X" -> 0, "A" -> 1, "C" -> 2))
  }
}
