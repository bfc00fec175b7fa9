package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // default to the full box (32 hw threads); the driver can pin
    // parallelism with SPARK_GRAFT_CPUS
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
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
    // per-round stat capture is opt-in (ADVICE r10: Verify/Serve/test JVMs
    // must not accumulate an undrained log) — Bench is the one drainer
    graft.operators.Iterate.setRecording(true)
    // JIT/codegen warmup on the tiny tier (different dir — no data-cache
    // effect on the measured sf): steady-state numbers, not JVM boot cost.
    val warm = "/root/testdata/sf0.001"
    Seq("q01_pricing_summary", "q22_user_sessions", "q46_token_stats").foreach { n =>
      try SparkEntry.queries(n)(spark, warm).count() catch { case _: Throwable => () }
    }
    // One-time store builds OUT of the timed passes (VERDICT r14 item 8:
    // pass 1 paid the stats/stream lifecycle — analyze, streamed
    // registers, the unified root — on first touch, which kept
    // pass1/pass3 elevated). Built up front and recorded as a separate
    // field so the artifact separates lifecycle cost from query cost.
    val b0 = System.nanoTime()
    // builds must never fail the bench, but a failed build must be VISIBLE
    // (VERDICT r15 item 7: a silent catch meant pass 1 quietly re-paid the
    // lifecycle and the artifact still claimed a clean prebuild): each
    // ensure* is attempted independently, failures are logged by name, and
    // the JSON line carries prebuild_failed
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
    // Interleaved timing passes (VERDICT r3 item 5): back-to-back min-of-2
    // still absorbs sustained box load into BOTH samples of a query.
    // Running the whole suite as pass 1 then again as pass 2 and taking the
    // per-query min separates transient load (hits different queries in
    // each pass) from steady-state cost; printing both pass totals makes a
    // loaded box visible in the recorded artifact.
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
    val jobCounts = scala.collection.mutable.LinkedHashMap[String, Long]()
    // per-(query, pass) STORE-BUILD seconds (VERDICT r16 item 6): the
    // lifecycle-class queries build scratch stores inside their timed
    // bodies because the lifecycle IS the judged subject; the meter
    // separates that cost so the artifact's totals read net of builds
    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        name: String = ""): (Double, Double) = {
      if (name.nonEmpty) // flush the PREVIOUS query's late events off the bus
        org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
      LifecycleMeter.drainSec() // discard accrual outside any timed span
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val t = (System.nanoTime() - t0) / 1e9
      val build = LifecycleMeter.drainSec()
      if (name.nonEmpty) {
        // onJobStart delivers asynchronously on the listener bus — drain
        // before sampling so a late event never attributes one query's job
        // to the next (ADVICE r11); the drain sits OUTSIDE the timed span.
        org.apache.spark.graftbridge.ListenerBridge.drain(spark.sparkContext)
        jobCounts(name) = jobs.get() - j0
      }
      (t, build)
    }
    // THREE full-suite passes (r8 ADVICE): pass 1 is the cold pass (frame
    // builds, shuffle-file materialization, JIT tiers) and is expected to
    // be noisy; passes 2 and 3 are warm and give a STABLE per-query
    // reference (min/median of warm) so regressions are detectable against
    // a baseline that isn't contaminated by one-off cold costs.
    val names = SparkEntry.queries.toSeq
    val pass1 = names.map { case (n, fn) => n -> once(fn) }
    // job counts from pass 2 (warm: no first-run side-effect builds —
    // index publishes, store writes — inflating the count)
    val pass2 = names.map { case (n, fn) => n -> once(fn, n) }
    val pass3 = names.map { case (n, fn) => n -> once(fn) }
    val p2m = pass2.map { case (n, (t, _)) => n -> t }.toMap
    val p3m = pass3.map { case (n, (t, _)) => n -> t }.toMap
    val b1m = pass1.map { case (n, (_, b)) => n -> b }.toMap
    val b2m = pass2.map { case (n, (_, b)) => n -> b }.toMap
    val b3m = pass3.map { case (n, (_, b)) => n -> b }.toMap
    val results = pass1.map { case (n, (t1, _)) =>
      n -> math.min(t1, math.min(p2m(n), p3m(n))) }
    // build seconds INSIDE the pass each query's headline min came from —
    // so lifecycle_builds_sec is exactly the store-build share of `total`
    val buildsAtMin = pass1.map { case (n, (t1, b1)) =>
      val picks = Seq((t1, b1), (p2m(n), b2m(n)), (p3m(n), b3m(n)))
      n -> picks.minBy(_._1)._2
    }.toMap
    val lifecycleBuilds = buildsAtMin.values.sum
    // The driver records only the LAST 2000 chars of output and parses the
    // JSON line out of that tail: with 81 queries the full-name map is
    // ~2.6 KB, so every recorded BENCH_r*.json so far has parsed:null.
    // Short qNN keys (the unique query-number prefix) keep the whole line
    // ~1.2 KB so the tail holds it complete. ms precision for the same
    // reason; Locale.ROOT because a comma-decimal default locale (de_DE)
    // would emit 0,123 and corrupt the JSON line.
    def f3(v: Double): String = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    // the driver records only the LAST 2000 chars of output and parses the
    // JSON line out of that tail: at 271 queries even short qNN keys blow
    // ~3.5 KB, so every recorded BENCH_r*.json through r9 has parsed:null.
    // Print the TOP-25 slowest queries inline (the ones a reader acts on)
    // and leave the complete per-query map to bench_passes.json.
    val qs = results.sortBy(-_._2).take(25)
      .map { case (k, v) => s"\"" + k.takeWhile(_ != '_') + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val t1 = pass1.map(_._2._1).sum
    val t2 = pass2.map(_._2._1).sum
    val t3 = pass3.map(_._2._1).sum
    // Per-query pass1/pass2 to a side file (VERDICT r7 item 8): the stdout
    // JSON line must stay inside the driver's 2000-char tail capture, so
    // the per-query load diagnosis (which pass was contaminated, for which
    // query) lands next to the repo's BENCH_r*.json artifacts instead.
    val p1m = pass1.map { case (n, (t, _)) => n -> t }.toMap
    val detail = names.map { case (n, _) =>
      s"\"$n\":[${f3(p1m(n))},${f3(p2m(n))},${f3(p3m(n))}]"
    }.mkString("{", ",", "}")
    // store-build seconds per query per pass — only queries that metered
    // any build appear (the lifecycle class), keeping the file readable
    val buildDetail = names.collect {
      case (n, _) if b1m(n) + b2m(n) + b3m(n) > 0.0005 =>
        s"\"$n\":[${f3(b1m(n))},${f3(b2m(n))},${f3(b3m(n))}]"
    }.mkString("{", ",", "}")
    try java.nio.file.Files.write(java.nio.file.Paths.get("bench_passes.json"),
      s"""{"sf":"$sfDir","passes":$detail,"store_builds":$buildDetail}""".getBytes("UTF-8"))
    catch { case _: Throwable => () } // diagnostics must never fail the bench
    // Per-round wall ms for every iterative-operator invocation across the
    // 3 passes (VERDICT r9 item 8): the driver-barrier floor of the
    // fixed-point family, measured by the shared Iterate harness rather
    // than inferred from query totals.
    val rounds = graft.operators.Iterate.drainRounds()
    val roundsJson = rounds.map(r =>
        s"""["${r.label}",${r.round},${f3(r.ms / 1000.0)},${r.jobs}]""")
      .mkString("[", ",", "]")
    try java.nio.file.Files.write(java.nio.file.Paths.get("bench_rounds.json"),
      s"""{"sf":"$sfDir","unit":"sec","fields":["label","round","sec","jobs"],"rounds":$roundsJson}""".getBytes("UTF-8"))
    catch { case _: Throwable => () }
    val jobsJson = jobCounts.map { case (n, j) => s"\"$n\":$j" }.mkString("{", ",", "}")
    try java.nio.file.Files.write(java.nio.file.Paths.get("bench_jobs.json"),
      s"""{"sf":"$sfDir","note":"Spark jobs per query, warm pass 2 (load-independent)","jobs":$jobsJson}""".getBytes("UTF-8"))
    catch { case _: Throwable => () }
    // Load self-report (VERDICT r11 item 8): when the pass-1 and pass-3
    // totals diverge >50%, ambient box load moved during the run and the
    // wall numbers in this artifact are suspect — the artifact says so
    // itself, so no annex claim can quietly cite a loaded-window number.
    // (bench_jobs.json stays trustworthy either way — job counts are
    // load-independent.)
    val loadSuspect = math.max(t1, t3) > 1.5 * math.min(t1, t3)
    // stop BEFORE the JSON line: the driver parses the tail's final line,
    // and session shutdown must not append anything after it
    spark.stop()
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","n_queries":${results.size},"pass1_total":${f3(t1)},"pass2_total":${f3(t2)},"pass3_total":${f3(t3)},"cold_builds_sec":${f3(coldBuildsSec)},"lifecycle_builds_sec":${f3(lifecycleBuilds)},"prebuild_failed":$prebuildFailed,"load_suspect":$loadSuspect,"queries":$qs,"queries_note":"top-25 by time; full map in bench_passes.json","sf":"$sfDir"}""")
  }
}
