package graft
import org.apache.spark.sql.SparkSession

object Bench {
  /** One timed invocation: wall seconds, metered store-build seconds
    * inside it, and whether the query body completed (VERDICT r17 item 2:
    * a swallowed throw used to feed its — possibly near-zero — wall time
    * into the per-query minimum, so a failed pass could masquerade as the
    * headline number; failures are now first-class and excluded). */
  private final case class Run(t: Double, build: Double, ok: Boolean)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // default to the full box (32 hw threads); the driver can pin
    // parallelism with SPARK_GRAFT_CPUS
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // wall budget for the TIMED PASSES (VERDICT r17 item 1: the protocol
    // outgrew the driver's timeout and the artifact died with it — the
    // bench now sheds passes, never the artifact): before starting a
    // pass, if the elapsed pass wall plus a conservative estimate of the
    // next pass would cross the budget, the remaining passes are skipped
    // and the artifact says so. Loaded-box runs complete with fewer
    // samples; idle runs are untouched.
    val budgetSec = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_SEC", "2100").toDouble
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Logs.quietBoundedWindowWarnings()
    // a PREVIOUS run's artifacts must not masquerade as this one's if
    // this run dies before writing them (review r18: a kill during pass 1
    // would have left the prior round's complete:true line and a
    // different run's job baseline on disk): stub every artifact to an
    // honest empty "in progress" state before any work
    def put(path: String, body: String): Unit =
      try java.nio.file.Files.write(java.nio.file.Paths.get(path),
        body.getBytes("UTF-8"))
      catch { case _: Throwable => () }
    put("BENCH_LINE.json",
      s"""{"metric":"total","value":0.000,"unit":"sec","n_queries":0,"failed_queries":0,"passes_completed":0,"complete":false,"sf":"$sfDir"}\n""")
    put("bench_passes.json",
      s"""{"sf":"$sfDir","passes":{},"failed_passes":{},"store_builds":{}}""")
    put("bench_jobs.json",
      s"""{"sf":"$sfDir","note":"run in progress - no job pass recorded yet","jobs":{}}""")
    put("bench_rounds.json",
      s"""{"sf":"$sfDir","unit":"sec","fields":["label","round","sec","jobs"],"rounds":[]}""")
    // per-round stat capture is opt-in (ADVICE r10: Verify/Serve/test JVMs
    // must not accumulate an undrained log) — Bench is the one drainer
    graft.operators.Iterate.setRecording(true)
    // JIT/codegen warmup on the tiny tier (different dir — no data-cache
    // effect on the measured sf): steady-state numbers, not JVM boot cost.
    val warm = "/root/testdata/sf0.001"
    Seq("q01_pricing_summary", "q22_user_sessions", "q46_token_stats").foreach { n =>
      try SparkEntry.queries(n)(spark, warm).count() catch { case _: Throwable => () }
    }
    // One-time store builds OUT of the timed passes (VERDICT r14 item 8).
    // Failures are visible by name and in the JSON line (VERDICT r15
    // item 7: a silent catch meant pass 1 quietly re-paid the lifecycle).
    val b0 = System.nanoTime()
    val prebuilds: Seq[(String, () => Any)] = Seq(
      "stats" -> (() => graft.queries.StatsStore.ensureStats(spark, sfDir)),
      "streamed_hdr" -> (() => graft.queries.StreamServe.ensureStreamedHdr(spark, sfDir)),
      "streamed_hll" -> (() => graft.queries.StreamServe.ensureStreamedHll(spark, sfDir)),
      "streamed_stats" -> (() => graft.queries.StreamServe.ensureStreamedStats(spark, sfDir)),
      "unified_stats" -> (() => graft.queries.StreamServe.ensureUnifiedStats(spark, sfDir)),
      "ivf_index" -> (() => graft.queries.Vectors.ensureIvfIndex(spark, sfDir)),
      "pq_index" -> (() => graft.queries.Vectors.ensurePqIndex(spark, sfDir)),
      "dpp_catalog" -> (() => graft.queries.Advanced.ensureDppCatalog(spark, sfDir)))
    val failedBuilds = prebuilds.flatMap { case (name, build) =>
      try { build(); None }
      catch { case e: Throwable =>
        System.err.println(s"[bench] prebuild '$name' FAILED: ${e.getMessage}")
        Some(name)
      }
    }
    val prebuildFailed = failedBuilds.nonEmpty
    val coldBuildsSec = (System.nanoTime() - b0) / 1e9
    // Spark-job counter: bench WALL times on this box vary up to 3× under
    // load (the r10→r11 "drift" lesson), but the number of driver jobs a
    // query schedules (AQE stage jobs + actions + broadcast builds) is
    // load-INDEPENDENT — bench_jobs.json is the noise-free per-query
    // baseline regressions get diffed against.
    val jobs = new java.util.concurrent.atomic.AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    // jobs per (pass, query): pass 2 is the canonical warm count (no
    // first-run side-effect builds inflating it); pass 1's is kept so a
    // budget-shed run still writes A job baseline, flagged as cold
    val jobCounts = Seq(1, 2).map(p =>
      p -> scala.collection.mutable.LinkedHashMap[String, Long]()).toMap
    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        name: String, pass: Int): Run = {
      // flush the PREVIOUS query's late events off the bus (ADVICE r11:
      // onJobStart delivers asynchronously — a late event must never
      // attribute one query's job to the next); the drain sits OUTSIDE
      // the timed span
      org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
      LifecycleMeter.drainSec() // discard accrual outside any timed span
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
      val t = (System.nanoTime() - t0) / 1e9
      val build = LifecycleMeter.drainSec()
      jobCounts.get(pass).foreach { m =>
        org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
        m(name) = jobs.get() - j0
      }
      Run(t, build, ok)
    }
    // THREE full-suite passes (r8 ADVICE): pass 1 is the cold pass (frame
    // builds, shuffle-file materialization, JIT tiers) and is expected to
    // be noisy; passes 2 and 3 are warm and give a STABLE per-query
    // reference. Two protocol cuts since r17 (VERDICT r17 item 1):
    //  - LIFECYCLE-class queries (any that metered store-build seconds in
    //    pass 1 — they rebuild scratch stores per invocation because the
    //    lifecycle IS the judged subject) run in passes 1–2 only: two
    //    samples bound their load noise, and the third rebuild of every
    //    scratch store (~50–70 s/pass at sf0.1, q319's RocksDB replays
    //    included) stops being protocol cost.
    //  - the pass-wall BUDGET sheds whole passes on a loaded box.
    val names = SparkEntry.queries.toSeq
    val passStart = System.nanoTime()
    def elapsed(): Double = (System.nanoTime() - passStart) / 1e9
    val f3fmt = (v: Double) =>
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // --- artifact state, maintained AFTER EVERY PASS so a SIGTERM
    // mid-run still leaves a complete, parseable line (VERDICT r17
    // what's-wrong 1: the line printed only after spark.stop(), so the
    // driver's timeout killed the artifact with the run)
    @volatile var lastLine: Option[String] = None
    @volatile var printedFinal = false
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      if (!printedFinal) lastLine.foreach(println)
    }))
    val passes = scala.collection.mutable.ArrayBuffer[Map[String, Run]]()
    val passWalls = scala.collection.mutable.ArrayBuffer[Double]()

    def headline(): (Seq[(String, Double)], Map[String, Double], Seq[String]) = {
      // per query: min wall over SUCCESSFUL attempts, the store-build
      // seconds INSIDE the pass the min came from, and the failed list
      val results = scala.collection.mutable.ArrayBuffer[(String, Double)]()
      val buildsAtMin = scala.collection.mutable.HashMap[String, Double]()
      val failedQueries = scala.collection.mutable.ArrayBuffer[String]()
      names.foreach { case (n, _) =>
        val oks = passes.flatMap(_.get(n)).filter(_.ok)
        if (oks.isEmpty) failedQueries += n
        else {
          val best = oks.minBy(_.t)
          results += (n -> best.t)
          buildsAtMin(n) = best.build
        }
      }
      (results.toSeq, buildsAtMin.toMap, failedQueries.toSeq)
    }

    def emitLine(complete: Boolean): Unit = {
      val f3 = f3fmt
      val (results, buildsAtMin, failedQueries) = headline()
      val total = results.map(_._2).sum
      val lifecycleBuilds = buildsAtMin.values.sum
      // The driver records only the LAST 2000 chars of output and parses
      // the JSON line out of that tail: print the TOP-25 slowest queries
      // inline (the ones a reader acts on) with short qNN keys, and leave
      // the complete per-query map to bench_passes.json. ms precision and
      // Locale.ROOT keep the line short and valid JSON everywhere.
      val qs = results.sortBy(-_._2).take(25)
        .map { case (k, v) => s"\"" + k.takeWhile(_ != '_') + "\":" + f3(v) }
        .mkString("{", ",", "}")
      def passTotal(i: Int): Double = if (i < passWalls.length) passWalls(i) else 0.0
      // Load self-report (VERDICT r11 item 8): when completed full-suite
      // pass totals diverge >50%, ambient load moved during the run and
      // the wall numbers are suspect — the artifact says so itself.
      // (Lifecycle queries skip pass 3, so pass 3's total is compared
      // net of that class's pass-1 share being absent — the cheap
      // conservative form: only flag when pass 1 vs pass 2 diverge.)
      val loadSuspect = passWalls.length >= 2 &&
        math.max(passWalls(0), passWalls(1)) > 1.5 * math.min(passWalls(0), passWalls(1))
      val line =
        s"""{"metric":"total","value":${f3(total)},"unit":"sec"""" +
          s""","n_queries":${results.size},"failed_queries":${failedQueries.size}""" +
          s""","passes_completed":${passWalls.length},"complete":$complete""" +
          s""","budget_sec":${f3(budgetSec)}""" +
          s""","pass1_total":${f3(passTotal(0))},"pass2_total":${f3(passTotal(1))},"pass3_total":${f3(passTotal(2))}""" +
          s""","cold_builds_sec":${f3(coldBuildsSec)},"lifecycle_builds_sec":${f3(lifecycleBuilds)}""" +
          s""","prebuild_failed":$prebuildFailed,"load_suspect":$loadSuspect""" +
          s""","queries":$qs,"queries_note":"top-25 by time; full map in bench_passes.json","sf":"$sfDir"}"""
      lastLine = Some(line)
      // the line survives a timeout as a FILE beside the other artifacts
      // even if the tail capture loses it
      try java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_LINE.json"),
        (line + "\n").getBytes("UTF-8"))
      catch { case _: Throwable => () }
    }

    def writePasses(): Unit = {
      val f3 = f3fmt
      // per-query per-pass walls; a pass a query did not run (budget shed,
      // lifecycle class) or FAILED is null — never a bogus near-zero
      // minimum candidate (VERDICT r17 item 2: 35 shutdown-artifact 0.0s
      // entries contaminated the r17 file)
      def cell(n: String, i: Int): String =
        if (i >= passes.length) "null"
        else passes(i).get(n) match {
          case Some(r) if r.ok => f3(r.t)
          case _ => "null"
        }
      val detail = names.map { case (n, _) =>
        s"\"$n\":[${cell(n, 0)},${cell(n, 1)},${cell(n, 2)}]"
      }.mkString("{", ",", "}")
      val failedDetail = names.flatMap { case (n, _) =>
        val fp = passes.zipWithIndex.collect {
          case (p, i) if p.get(n).exists(!_.ok) => i + 1 }
        if (fp.isEmpty) None else Some(s"\"$n\":[${fp.mkString(",")}]")
      }.mkString("{", ",", "}")
      // store-build seconds per query per pass — only queries that
      // metered any build appear (the lifecycle class)
      def bsum(n: String): Double =
        passes.flatMap(_.get(n)).map(_.build).sum
      val buildDetail = names.collect {
        case (n, _) if bsum(n) > 0.0005 =>
          def bcell(i: Int): String =
            if (i >= passes.length) "null"
            else passes(i).get(n).map(r => f3(r.build)).getOrElse("null")
          s"\"$n\":[${bcell(0)},${bcell(1)},${bcell(2)}]"
      }.mkString("{", ",", "}")
      try java.nio.file.Files.write(java.nio.file.Paths.get("bench_passes.json"),
        s"""{"sf":"$sfDir","passes":$detail,"failed_passes":$failedDetail,"store_builds":$buildDetail}""".getBytes("UTF-8"))
      catch { case _: Throwable => () } // diagnostics must never fail the bench
    }

    def runPass(pass: Int, subset: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)]): Unit = {
      val w0 = System.nanoTime()
      val m = subset.map { case (n, fn) => n -> once(fn, n, pass) }.toMap
      passes += m
      passWalls += (System.nanoTime() - w0) / 1e9
      writePasses()
      emitLine(complete = false)
    }

    runPass(1, names)
    // budget gate: run the next pass only if the last completed pass's
    // wall (the best available estimate of the next one's) still fits
    val pass2Runs = elapsed() + passWalls.last <= budgetSec
    if (pass2Runs) runPass(2, names)
    // lifecycle class = metered a store build in pass 2 (review r18:
    // pass 1 alone conflates PER-INVOCATION scratch rebuilds — the class
    // the pass-3 cut exists to shed — with ONE-TIME first-touch builds
    // like the parquet-backed memos, which are cheap to re-run warm and
    // deserve their third sample); under a budget-shed pass 2 the cold
    // pass-1 meter is the only evidence and classifies conservatively
    val lifecycle = (if (passes.length >= 2) names.collect {
      case (n, _) if passes(1).get(n).exists(_.build > 0.0005) => n
    } else names.collect {
      case (n, _) if passes.head.get(n).exists(_.build > 0.0005) => n
    }).toSet
    val pass3Est = if (passWalls.length >= 2)
      passWalls.last * (names.size - lifecycle.size).toDouble / names.size
    else Double.MaxValue
    if (pass2Runs && elapsed() + pass3Est <= budgetSec)
      runPass(3, names.filterNot { case (n, _) => lifecycle.contains(n) })

    // Per-round wall ms for every iterative-operator invocation across
    // the passes (VERDICT r9 item 8): the driver-barrier floor of the
    // fixed-point family, measured by the shared Iterate harness.
    val f3 = f3fmt
    val rounds = graft.operators.Iterate.drainRounds()
    val roundsJson = rounds.map(r =>
        s"""["${r.label}",${r.round},${f3(r.ms / 1000.0)},${r.jobs}]""")
      .mkString("[", ",", "]")
    try java.nio.file.Files.write(java.nio.file.Paths.get("bench_rounds.json"),
      s"""{"sf":"$sfDir","unit":"sec","fields":["label","round","sec","jobs"],"rounds":$roundsJson}""".getBytes("UTF-8"))
    catch { case _: Throwable => () }
    // job baseline: warm pass 2 when it ran; cold pass 1 otherwise (a
    // budget-shed run still leaves a diffable baseline, honestly labeled)
    val (jobsPass, jobsNote) =
      if (jobCounts(2).nonEmpty) (2, "Spark jobs per query, warm pass 2 (load-independent)")
      else (1, "Spark jobs per query, COLD pass 1 (budget shed pass 2; first-run builds included)")
    val jobsJson = jobCounts(jobsPass).map { case (n, j) => s"\"$n\":$j" }.mkString("{", ",", "}")
    try java.nio.file.Files.write(java.nio.file.Paths.get("bench_jobs.json"),
      s"""{"sf":"$sfDir","note":"$jobsNote","jobs":$jobsJson}""".getBytes("UTF-8"))
    catch { case _: Throwable => () }
    emitLine(complete = true)
    // stop BEFORE the print: the driver parses the tail's final line, and
    // session shutdown must not append anything after it. If stop() never
    // returns (the r17 SIGTERM), the shutdown hook prints the same line.
    spark.stop()
    lastLine.foreach(println)
    printedFinal = true
  }
}
