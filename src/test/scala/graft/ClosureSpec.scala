package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Closure

/** Closure termination + min-depth semantics on adversarial graphs
  * (SURVEY.md hard part #3: cycles, diamonds, disconnected nodes).
  */
class ClosureSpec extends AnyFunSuite {
  private lazy val spark = SparkTestHarness.spark

  private def edges(pairs: (String, String)*) = {
    import spark.implicits._
    pairs.toDF("name", "dep")
  }

  test("terminates on a pure cycle and visits each node once at min depth") {
    val g = edges("a" -> "b", "b" -> "c", "c" -> "a")
    val r = Closure.reachable(spark, g, "a").collect()
      .map(row => row.getString(0) -> row.getInt(1)).toMap
    assert(r === Map("a" -> 0, "b" -> 1, "c" -> 2))
  }

  test("diamond takes the shorter path") {
    // a -> b -> d and a -> d: d must be depth 1, not 2
    val g = edges("a" -> "b", "b" -> "d", "a" -> "d")
    val r = Closure.reachable(spark, g, "a").collect()
      .map(row => row.getString(0) -> row.getInt(1)).toMap
    assert(r === Map("a" -> 0, "b" -> 1, "d" -> 1))
  }

  test("disconnected nodes are not visited; self-loop is safe") {
    val g = edges("a" -> "a", "a" -> "b", "x" -> "y")
    val r = Closure.reachable(spark, g, "a").collect()
      .map(row => row.getString(0) -> row.getInt(1)).toMap
    assert(r === Map("a" -> 0, "b" -> 1))
  }

  test("maxIter caps runaway expansion") {
    // a long chain, capped at 3 iterations → only depths 0..3 visited
    val g = edges((0 until 20).map(i => s"n$i" -> s"n${i + 1}"): _*)
    val r = Closure.reachable(spark, g, "n0", maxIter = 3).collect()
    assert(r.length === 4)
  }

  test("reliable-checkpoint branch: same results once a checkpoint dir is set") {
    // cluster deployments configure sparkContext.setCheckpointDir; the
    // iterative loops must then cut lineage via reliable checkpoint and
    // still produce identical results. The dir is RESTORED afterwards
    // (reflection — SparkContext has no public unset) so the rest of the
    // suite keeps exercising the localCheckpoint branch regardless of
    // suite execution order.
    val dir = queries.StatsStore.scratchDir("graft_ckpt")
    spark.sparkContext.setCheckpointDir(dir)
    assert(spark.sparkContext.getCheckpointDir.isDefined)
    var bodyError: Throwable = null
    try {
      val g = edges("a" -> "b", "b" -> "c", "c" -> "a", "b" -> "d")
      val r = Closure.reachable(spark, g, "a").collect()
        .map(row => row.getString(0) -> row.getInt(1)).toMap
      assert(r === Map("a" -> 0, "b" -> 1, "c" -> 2, "d" -> 2))
      import spark.implicits._
      val cc = operators.Components.connected(spark, Seq((1L, 2L), (3L, 4L)).toDF("src", "dst"))
        .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
      assert(cc === Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
    } catch {
      case t: Throwable => bodyError = t; throw t
    } finally {
      // Guarded (ADVICE r4): if a Spark upgrade renames the private field,
      // report it with an actionable message — attached as SUPPRESSED when
      // the body also failed (a throw from finally would otherwise replace
      // and hide the body's failure).
      try {
        val f = classOf[org.apache.spark.SparkContext].getDeclaredField("checkpointDir")
        f.setAccessible(true)
        f.set(spark.sparkContext, None)
      } catch {
        case e: ReflectiveOperationException =>
          val msg = "SparkContext.checkpointDir reflection restore broke (Spark " +
            "internals changed?) — later suites in this shared session would silently " +
            "run the reliable-checkpoint branch; update ClosureSpec's restore."
          if (bodyError != null) bodyError.addSuppressed(new IllegalStateException(msg, e))
          else fail(msg, e)
      }
      if (bodyError == null)
        assert(spark.sparkContext.getCheckpointDir.isEmpty, "checkpoint dir must be restored")
    }
  }

  test("reachableAll equals per-root reachable on every root") {
    import spark.implicits._
    val g = edges("a" -> "b", "b" -> "c", "c" -> "a", "b" -> "d", "x" -> "a")
    val roots = Seq("a", "b", "x").toDF("root")
    val all = Closure.reachableAll(spark, g, roots).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getInt(2)).toMap
    for (root <- Seq("a", "b", "x")) {
      val single = Closure.reachable(spark, g, root).collect()
        .map(r => (root, r.getString(0)) -> r.getInt(1)).toMap
      assert(all.filter(_._1._1 == root) === single, s"divergence for root $root")
    }
  }

  test("random graphs: depths match an in-memory BFS model (hop batching exact)") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    (0 until 8).foreach { trial =>
      val n = 12
      val es = Seq.fill(30)((s"v${rng.nextInt(n)}", s"v${rng.nextInt(n)}")).distinct
      val g = es.toDF("name", "dep")
      val root = "v0"
      // in-memory BFS
      val adj = es.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
      var depth = Map(root -> 0)
      var front = Seq(root)
      var d = 0
      while (front.nonEmpty) {
        d += 1
        val nxt = front.flatMap(u => adj.getOrElse(u, Nil))
          .distinct.filterNot(depth.contains)
        nxt.foreach(v => depth += v -> d)
        front = nxt
      }
      val got = Closure.reachable(spark, g, root).collect()
        .map(r => r.getString(0) -> r.getInt(1)).toMap
      assert(got === depth, s"trial $trial: edges $es")
    }
  }

  test("install plan: a version constraint prunes a branch name-BFS would take") {
    import spark.implicits._
    functions.GraftFunctions.ensureRegistered(spark)
    // A depends on B at exactly 1.0 (only 2.0 exists → unsatisfiable) and
    // on C >= 1.0 (satisfiable). C depends on D < 2.0 (only 1.5 exists →
    // satisfiable). Name-BFS would reach {A, B, C, D}; the constrained
    // install plan must prune the B branch: {A, C, D}.
    val specs = Seq("A" -> "B=1.0", "A" -> "C>=1.0", "C" -> "D<2.0").toDF("name", "spec")
    val provides = Seq("A" -> "A", "B" -> "B", "C" -> "C", "D" -> "D").toDF("name", "provides_name")
    val packages = Seq("A" -> "1.0", "B" -> "2.0", "C" -> "1.0", "D" -> "1.5").toDF("name", "version")
    val resolved = queries.Resolution.resolutionEdges(specs, provides, packages)
    val plan = Closure.reachable(spark, resolved, "A").collect()
      .map(row => row.getString(0) -> row.getInt(1)).toMap
    assert(plan === Map("A" -> 0, "C" -> 1, "D" -> 2))

    // and the same walk over UNCONSTRAINED name edges does take the B branch
    val nameEdges = specs.selectExpr("name", "parse_constraint(spec).name AS dep")
    val naive = Closure.reachable(spark, nameEdges, "A").collect().map(_.getString(0)).toSet
    assert(naive === Set("A", "B", "C", "D"))
  }

  test("dependency cycles: 2-cycle grouped, chain stays acyclic, self-loop counts alone") {
    import spark.implicits._
    // a <-> b form one SCC; c -> a is on a chain INTO the cycle (reaches a,
    // a does not reach c — must stay acyclic); s -> s self-loops; z is
    // isolated. scc_id = least member, scc_size counts members.
    val g = edges("a" -> "b", "b" -> "a", "c" -> "a", "s" -> "s")
    val nodes = Seq("a", "b", "c", "s", "z").toDF("name")
    val reach = Closure.reachableAll(spark, g, nodes.selectExpr("name AS root"))
    val r = queries.Resolution.dependencyCycles(reach, g, nodes).collect()
      .map(x => x.getString(0) -> ((x.getInt(1), x.getString(2), x.getLong(3)))).toMap
    assert(r("a") === ((1, "a", 2L)))
    assert(r("b") === ((1, "a", 2L)))
    assert(r("c") === ((0, "c", 1L)))
    assert(r("s") === ((1, "s", 1L)))
    assert(r("z") === ((0, "z", 1L)))
  }
}
