package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Statistical text/stream analytics (SURVEY.md M4 "tf-idf-ish", A-family
  * second moments).
  *
  * Parity notes: idf uses the rational form `N/df` (not ln — Math.log and
  * libm can differ in the last ulp); variance/correlation are computed
  * from EXACT decimal moment sums (Σx, Σx², Σxy over 2-decimal fixture
  * values) then finished with identical double arithmetic on both engines
  * — no Welford-vs-textbook formula divergence, no summation-order noise.
  */
object Analytics {
  type QFn = (SparkSession, String) => DataFrame

  import graft.Tables

  val queries: Seq[(String, QFn)] = Seq(
    // Count-min sketch heavy hitters (A3/A8 sketch-family annex): a
    // d=3 × w=64 CMS over the event stream's user_id with DETERMINISTIC
    // arithmetic hashes ((a·u + b) mod P mod w — both engines compute the
    // identical counters, so the sketch itself is judged, not just its
    // users). 150 distinct keys into 64 cells forces real collisions; the
    // query reports est vs exact and the measured overestimate for the
    // top-10 exact heavy hitters, quantifying the sketch's error instead
    // of asserting it. The 100 TB story: counters are (d·w) bounded state
    // with map-side partial aggregation — the batch twin of the streaming
    // sketch every telemetry pipeline keeps; estimates never under-count
    // (CMS guarantee: min over d counters ≥ true count).
    "q150_cms_heavy_hitters" -> { (s, dir) =>
      val P = 1048573L
      val W = 64L
      val hashes = Seq((0, 31L, 7L), (1, 37L, 11L), (2, 41L, 13L))
      val ev = Tables.events(s, dir).select("user_id")
      def cell(a: Long, b: Long) = pmod(pmod(col("user_id") * a + b, lit(P)), lit(W))
      val counters = hashes.map { case (r, a, b) =>
          ev.select(lit(r).as("r"), cell(a, b).as("cell"))
        }.reduce(_ unionByName _)
        .groupBy("r", "cell").agg(count(lit(1)).as("cnt"))
      val exact = ev.groupBy("user_id").agg(count(lit(1)).as("exact_cnt"))
      val probes = hashes.map { case (r, a, b) =>
          exact.select(col("user_id"), lit(r).as("r"), cell(a, b).as("cell"))
        }.reduce(_ unionByName _)
      val est = probes.join(counters, Seq("r", "cell"))
        .groupBy("user_id").agg(min("cnt").as("est_cnt"))
      exact.join(est, "user_id")
        .select(col("user_id"), col("exact_cnt"), col("est_cnt"),
          (col("est_cnt") - col("exact_cnt")).as("overestimate"))
        .orderBy(desc("exact_cnt"), col("user_id")).limit(10)
    },

    // Per-group top-k via a BOUNDED-STATE typed Aggregator (A9/O4) — the
    // 100 TB formulation of q10's window rank: O(k) state per group with
    // map-side partial aggregation, vs. the window form's full shuffle +
    // per-group sort of EVERY row. Same answer as the DuckDB row_number
    // oracle; PlanAuditSpec pins the no-Window plan.
    "q77_topk_agg" -> { (s, dir) =>
      val topk = udaf(new graft.functions.TopKByScore(3))
      Tables.part(s, dir)
        .groupBy("p_brand")
        .agg(topk(col("p_retailprice"), col("p_partkey")).as("top"))
        .select(col("p_brand"), posexplode(col("top")))
        .select(col("p_brand"), (col("pos") + 1).cast("int").as("rank"),
          col("col._2").as("p_partkey"), col("col._1").as("p_retailprice"))
        .orderBy("p_brand", "rank")
    },

    // tf-idf-ish top terms per document (rational idf; bounded output).
    "q58_tfidf_top_terms" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      // idf anchor (N = doc count) as a broadcast single-row crossJoin: one
      // plan, no driver-side count() job before the query even runs.
      val nDocs = broadcast(docs.agg(count(lit(1)).as("n_total_docs")))
      val tf = docs.filter(col("doc_id") < 20)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
      val df = docs
        .select(explode(expr("array_distinct(split(text, ' '))")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("df"))
      val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("tok"))
      tf.join(df, "tok")
        .crossJoin(nDocs)
        .withColumn("score", col("tf") * col("n_total_docs") / col("df"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .select(col("doc_id"), col("rank"), col("tok"), col("tf"), col("df"), col("score"))
        .orderBy("doc_id", "rank")
    },

    // BM25 ranked retrieval for a fixed 3-term query — the canonical
    // sparse-retrieval scorer (q58's tf-idf plus term-frequency saturation
    // k1=1.2 and length normalization b=0.75). idf stays RATIONAL
    // ((N - df + 0.5)/(df + 0.5), no ln — Math.log and DuckDB ln round
    // differently); per-term contributions are exact-identical doubles, and
    // the per-doc sum goes through binary fixed-point (floor(x * 2^40)
    // int64) so summation order can't flip low bits — the final ORDER BY
    // score is deterministic cross-engine with NO rounding. Plan: the term
    // filter prunes the posting explode before both aggregations; df and
    // the corpus stats ride broadcasts; at 100 TB the tf frame is the
    // (bucketed) inverted index and a query touches 3 posting lists.
    // ONE definition of the scorer — the facade's Graft.bm25 — so the
    // judged query and the library API cannot drift.
    "q120_bm25_retrieval" -> { (s, dir) =>
      graft.Graft.bm25(Tables.documents(s, dir), Seq("join", "vector", "stream"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(15)
    },

    // per-language token frequency profile (top 5 tokens per lang).
    "q59_lang_ngram_profile" -> { (s, dir) =>
      val w = Window.partitionBy("lang").orderBy(col("n").desc, col("tok"))
      Tables.documents(s, dir)
        .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
        .groupBy("lang", "tok").agg(count(lit(1)).as("n"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 5)
        .orderBy("lang", "rank")
    },

    // KMV (k-minimum-values) distinct sketch with a DETERMINISTIC md5 hash
    // family — unlike HLL++ (q19, engine-specific), this sketch is fully
    // oracle-verifiable: both engines compute identical order statistics.
    // estimate = (k-1) * 2^60 / kth_smallest_hash over distinct 60-bit
    // hashes of the key. The k-th order statistic comes from the
    // bounded-state KthSmallestDistinct aggregator (O(k) memory per group,
    // map-side partials, distinctness enforced in-buffer) — NOT a
    // row_number window, which would shuffle and fully sort every distinct
    // hash per group to extract 64 values; PlanAuditSpec pins the
    // no-Window plan shape.
    // DETERMINISTIC bootstrap confidence intervals (Efron's nonparametric
    // bootstrap, public — with md5-derived resampling in place of RNG, so
    // the oracle replays the identical replicas and the whole uncertainty
    // estimate is judged, not just the point estimate): per event type,
    // B=40 replicas each draw n indices via md5(type:b:j) mod n, replica
    // means come from exact decimal sums, and the 95%-ish band is the
    // 2nd/39th ORDER-STATISTIC pick over the 40 means (tie-broken
    // row_number — no interpolation). The resample join is a hash
    // equi-join on (type, idx): B×n rows against the indexed base — at
    // scale B caps the blow-up and the replica means partial-aggregate,
    // the standard distributed-bootstrap shape.
    "q202_bootstrap_ci" -> { (s, dir) =>
      val B = 40
      val ev = Tables.events(s, dir).select("event_type", "event_id", "value")
      val idxd = ev
        .withColumn("idx", row_number().over(
          Window.partitionBy("event_type").orderBy("event_id")))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
      // ONE md5 per event TYPE seeds an integer quadratic-congruential
      // draw; the per-draw path is pure 64-bit-safe integer arithmetic
      // (x < 2^31 so x*x < 2^62 — no overflow, and overflow semantics
      // never diverge between engines). The r8 form re-md5'd every draw:
      // 4M string digests at sf0.1, ~5x the whole query's useful work.
      // The x*x mixing matters: a LINEAR congruence in (b, j) makes each
      // replicate a constant-stride walk mod n — a permutation, i.e.
      // every "resample" would be the original sample.
      val nPer = idxd.select("event_type", "n").distinct()
        .withColumn("tseed",
          expr("cast(conv(substring(md5(event_type), 1, 8), 16, 10) as bigint)"))
      val draws = nPer
        .select(col("event_type"), col("n"), col("tseed"),
          explode(expr(s"sequence(1, $B)")).as("b"))
        .select(col("event_type"), col("n"), col("tseed"), col("b"),
          explode(expr("sequence(1, n)")).as("j"))
        .withColumn("x", expr(
          "(cast(b as bigint) * 1103515245 + cast(j as bigint) * 12345 + tseed) % 2147483647"))
        .withColumn("idx", expr("cast((x * x) % 2147483647 % n as int) + 1"))
      // explicit broadcast of the indexed sample: the generator fan-out is
      // invisible to size estimation, so the planner otherwise broadcasts
      // the 4M-row DRAWS side (BuildLeft over two stacked explodes —
      // measured 7s of the query's 13s at sf0.1)
      val reps = draws
        .join(broadcast(idxd.select(col("event_type"), col("idx"), col("value"))),
          Seq("event_type", "idx"))
        .groupBy("event_type", "b")
        .agg((sum(col("value").cast("decimal(28,2)")).cast("double") / count(lit(1))).as("m"))
      // lo and hi in ONE aggregation over the ranked replicates: separate
      // filter-then-join frames re-evaluated the whole 4M-row resample
      // pipeline once per bound (the other half of the measured 13s)
      val ranked = reps.withColumn("rn", row_number().over(
        Window.partitionBy("event_type").orderBy(col("m"), col("b"))))
      val ci = ranked.groupBy("event_type")
        .agg(min(when(col("rn") === 2, col("m"))).as("boot_lo"),
          min(when(col("rn") === B - 1, col("m"))).as("boot_hi"))
      val base = ev.groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          (sum(col("value").cast("decimal(28,2)")).cast("double") / count(lit(1))).as("mean_value"))
      base.join(ci, "event_type")
        .select("event_type", "n_events", "mean_value", "boot_lo", "boot_hi")
        .orderBy("event_type")
    },

    // Sliding-window distinct counting from MERGEABLE daily sketches —
    // the streaming-dashboard shape ("7-day active users per type") where
    // exact sliding distinct forces either a per-window rescan or an
    // unbounded distinct state: instead each day keeps its k=32-smallest
    // distinct user-hash sketch (bounded state, one pass), and the
    // trailing-7-day estimate merges the 7 daily sketches (KMV
    // mergeability: k-smallest of the sketch union == k-smallest of the
    // raw union — the oracle re-derives the window sketch from the RAW
    // hash sets, so mergeability itself is what the hash match proves).
    // The exact sliding distinct rides along as the judged error
    // reference — at 100 TB you'd keep only the sketch path (5 types ×
    // 32 longs per day vs rescanning the stream per window). Windows are
    // RANGE frames over the day index, so calendar gaps stay honest.
    "q195_sliding_distinct" -> { (s, dir) =>
      val k = 32
      val C = 1.152921504606846976e18
      val kl = udaf(new graft.functions.KSmallestDistinctList(k))
      val ev = Tables.events(s, dir).select(col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"),
        datediff(col("ts").cast("date"), lit("2024-01-01").cast("date")).cast("long").as("di"),
        col("user_id"),
        expr("cast(conv(substring(md5(cast(user_id as string)), 1, 15), 16, 10) as bigint)").as("h"))
      val daily = ev.groupBy("event_type", "day", "di")
        .agg(kl(col("h")).as("sk"), countDistinct("user_id").as("n_day_users"))
      val w = Window.partitionBy("event_type").orderBy("di").rangeBetween(-6, 0)
      val est = daily
        .withColumn("sks", collect_list("sk").over(w))
        .withColumn("allh", expr("array_sort(array_distinct(flatten(sks)))"))
        .withColumn("kth", expr(s"try_element_at(allh, $k)"))
        .withColumn("win_est",
          when(col("kth").isNotNull, lit(k - 1) * lit(C) / col("kth"))
            .otherwise(size(col("allh")).cast("double")))
      val du = ev.select("event_type", "di", "user_id").distinct()
      val exact = daily.select("event_type", "di")
        .join(du.select(col("event_type"), col("di").as("di2"), col("user_id")), Seq("event_type"))
        .filter(col("di2") >= col("di") - 6 && col("di2") <= col("di"))
        .groupBy("event_type", "di").agg(countDistinct("user_id").as("win_exact"))
      est.join(exact, Seq("event_type", "di"))
        .select(col("event_type"), col("day"), col("n_day_users"),
          col("win_exact"), col("win_est"),
          (col("win_est") - col("win_exact")).as("err"))
        .orderBy("event_type", "day")
    },

    "q61_kmv_distinct_sketch" -> { (s, dir) =>
      val k = 64
      val kth64 = udaf(new graft.functions.KthSmallestDistinct(k))
      Tables.events(s, dir)
        .select(col("event_type"), col("user_id"),
          expr("cast(conv(substring(md5(cast(user_id as string)), 1, 15), 16, 10) as bigint)").as("h"))
        .groupBy("event_type")
        .agg(countDistinct("user_id").as("exact_distinct"), kth64(col("h")).as("kth"))
        .filter(col("kth").isNotNull) // KMV undefined under k distinct values
        .select(col("event_type"), col("exact_distinct"), col("kth"),
          (lit(k - 1) * lit(1.152921504606846976e18) / col("kth")).as("kmv_estimate"))
        .orderBy("event_type")
    },

    // KMV set-operation estimation — cross-segment audience overlap from
    // SKETCHES alone (q61's deterministic KMV generalized from cardinality
    // to set algebra). Each event type keeps its k=64 smallest distinct
    // 60-bit user hashes (bounded-state aggregator, one pass); for every
    // type pair the UNION sketch is just the k smallest of
    // array_distinct(concat(sk_a, sk_b)) — KMV mergeability means that
    // EQUALS the sketch of the raw union, which is exactly what the oracle
    // computes from scratch — and intersection falls out by
    // inclusion-exclusion. Exact counts ride along to expose the error.
    // At 100 TB the sketch table (5 rows × 64 longs) replaces re-scanning
    // the event stream for every pair: set-op estimates become metadata
    // lookups, the same way the incremental-agg state (q122) replaces
    // recomputation.
    "q125_kmv_set_ops" -> { (s, dir) =>
      val k = 64
      val kl = udaf(new graft.functions.KSmallestDistinctList(k))
      val tu = Tables.events(s, dir).select(col("event_type").as("t"), col("user_id"),
        expr("cast(conv(substring(md5(cast(user_id as string)), 1, 15), 16, 10) as bigint)").as("h"))
      // the sketch table feeds both join sides — materialize once; it is
      // 5 rows of 64 longs, the whole point of sketching
      val sk = graft.operators.Lineage.cut(tu.groupBy("t")
        .agg(kl(col("h")).as("sk"), countDistinct("user_id").as("exact")))
      val a = sk.select(col("t").as("ta"), col("sk").as("ska"), col("exact").as("xa"))
      val b = sk.select(col("t").as("tb"), col("sk").as("skb"), col("exact").as("xb"))
      val du = tu.select("t", "user_id").distinct()
      val xinter = du.join(du.select(col("t").as("tb"), col("user_id")), "user_id")
        .filter(col("t") < col("tb"))
        .groupBy(col("t").as("ta"), col("tb")).agg(count(lit(1)).as("x_inter"))
      val C = 1.152921504606846976e18 // 2^60, the hash range
      a.join(b, col("ta") < col("tb"))
        .join(xinter, Seq("ta", "tb"), "left")
        .withColumn("x_inter", coalesce(col("x_inter"), lit(0L)))
        .withColumn("ka", expr(s"try_element_at(ska, $k)"))
        .withColumn("kb", expr(s"try_element_at(skb, $k)"))
        .withColumn("ku",
          expr(s"try_element_at(array_sort(array_distinct(concat(ska, skb))), $k)"))
        .filter(col("ka").isNotNull && col("kb").isNotNull && col("ku").isNotNull)
        .withColumn("est_a", lit(k - 1) * lit(C) / col("ka"))
        .withColumn("est_b", lit(k - 1) * lit(C) / col("kb"))
        .withColumn("est_union", lit(k - 1) * lit(C) / col("ku"))
        .withColumn("est_inter", col("est_a") + col("est_b") - col("est_union"))
        .select("ta", "tb", "xa", "xb", "x_inter",
          "est_a", "est_b", "est_union", "est_inter")
        .orderBy("ta", "tb")
    },

    // Spark 4 VariantType path for semi-structured props: parse_json once,
    // then typed variant_get extraction — the modern engine-native form of
    // the open key->value metadata the reference kept per package record.
    "q62_variant_props" -> { (s, dir) =>
      Tables.events(s, dir)
        .withColumn("vp", parse_json(col("props")))
        .withColumn("k", expr("variant_get(vp, '$.k', 'long')"))
        .filter(col("k").isNotNull)
        // floor division (matches DuckDB `k // 10`); `/`+cast would
        // truncate toward zero and diverge for negative k.
        .groupBy(floor(col("k") / 10).cast("int").as("k_decile"))
        .agg(count(lit(1)).as("n"), countDistinct("event_type").as("n_types"),
          round(sum("value"), 2).as("total_value"))
        .orderBy("k_decile")
    },

    // Percentile outlier gate — the distribution-tail quality filter
    // (drop docs outside the per-language [p05, p95] length band): exact
    // per-group percentiles computed IN-PLAN, broadcast back to the scan,
    // and the gate counts derived in one aggregation. Exact `percentile`
    // is right here because groups are few and bounded (one row of state
    // per language); per-KEY percentiles at 100 TB would use
    // approx_percentile (the q19 sketch path) — the cutoffs' broadcast
    // shape is identical either way.
    "q93_outlier_gate" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val cuts = docs.groupBy("lang").agg(
        expr("percentile(n_chars, 0.05)").as("p05"),
        expr("percentile(n_chars, 0.95)").as("p95"))
      docs.join(broadcast(cuts), "lang")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          max("p05").as("p05"), max("p95").as("p95"),
          sum(when(col("n_chars") < col("p05"), 1L).otherwise(0L)).as("n_low"),
          sum(when(col("n_chars") > col("p95"), 1L).otherwise(0L)).as("n_high"),
          sum(when(col("n_chars") >= col("p05") && col("n_chars") <= col("p95"), 1L)
            .otherwise(0L)).as("n_kept"))
        .orderBy("lang")
    },

    // Bigram-LM fluency — the next rung above q92's unigram ranks: score
    // each document by its average corpus-conditional bigram probability
    // (the perplexity-filter shape real pretraining pipelines run, with
    // the LM trained on the corpus itself in the same plan). Integer-exact
    // throughout: per adjacent pair (a,b), p(b|a) ≈ (1000·C(a,b)) div C(a→·)
    // in parts-per-thousand, document score = mean. Training is two
    // partial-aggregated counts; scoring re-joins the pair stream on
    // (a,b) and (a) — hash equi-joins keyed on the n-gram, the join shape
    // that survives a 100 TB corpus (the LM tables shard with the data;
    // nothing driver-side).
    "q166_bigram_fluency" -> { (s, dir) =>
      val toks = Tables.documents(s, dir)
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("i", "tok")))
      val w = Window.partitionBy("doc_id").orderBy("i")
      val pairs = toks.withColumn("nxt", lead("tok", 1).over(w))
        .filter(col("nxt").isNotNull)
        .select(col("doc_id"), col("tok").as("a"), col("nxt").as("b"))
      val bc = pairs.groupBy("a", "b").agg(count(lit(1)).as("cab"))
      val uc = pairs.groupBy("a").agg(count(lit(1)).as("ca"))
      pairs.join(bc, Seq("a", "b")).join(uc, Seq("a"))
        .withColumn("sc", expr("(1000 * cab) div ca"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_pairs"), sum("sc").as("prob_sum_x1000"))
        .withColumn("fluency_x1000", expr("prob_sum_x1000 div n_pairs"))
        .orderBy("doc_id")
    },

    // Unigram-rank fluency scoring — the CCNet-style "does this read like
    // the corpus" quality filter, in integer-exact form: build a BOUNDED
    // top-64 vocabulary ranked by (count desc, token asc), broadcast it,
    // and score each document by the average rank of its tokens (out-of-
    // vocabulary tokens take rank V+1). The vocabulary bound is the 100 TB
    // design point: token counts partial-aggregate, the top-V cut is a
    // TakeOrderedAndProject (never a global sort of the full vocabulary),
    // and the scoring join is a broadcast of 64 rows. Integer rank sums,
    // not float log-probs, so the oracle re-derives identical values.
    "q92_unigram_fluency" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val toks = Tables.documents(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      val vocab = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("tok")).limit(64)
        .withColumn("rnk", row_number().over(Window.orderBy(col("cnt").desc, col("tok"))))
        .select("tok", "rnk")
      toks.join(broadcast(vocab), Seq("tok"), "left")
        .withColumn("r", coalesce(col("rnk"), lit(65)))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"), sum("r").as("rank_sum"))
        .withColumn("fluency_x100", expr("100 * rank_sum div n_tokens"))
        .orderBy("doc_id")
    },

    // exact second moments: variance/stddev of event value per type, plus
    // correlation between value and props.k — all from decimal sums.
    "q60_stats_moments" -> { (s, dir) =>
      Tables.events(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .filter(col("k").isNotNull)
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          sum(col("value").cast("decimal(28,2)")).cast("double").as("sx"),
          sum((col("value") * col("value")).cast("decimal(30,4)")).cast("double").as("sxx"),
          sum(col("k").cast("decimal(28,0)")).cast("double").as("sy"),
          sum((col("k") * col("k")).cast("decimal(30,0)")).cast("double").as("syy"),
          sum((col("value") * col("k")).cast("decimal(30,2)")).cast("double").as("sxy"))
        .select(col("event_type"), col("n"),
          ((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1)).as("var_value"),
          sqrt((col("sxx") - col("sx") * col("sx") / col("n")) / (col("n") - 1)).as("stddev_value"),
          ((col("sxy") - col("sx") * col("sy") / col("n")) /
            (sqrt(col("sxx") - col("sx") * col("sx") / col("n")) *
             sqrt(col("syy") - col("sy") * col("sy") / col("n")))).as("corr_value_k"))
        .orderBy("event_type")
    },

    // Checksum-validated PII detection (q84's missing class): card-like
    // 12-digit numbers with a REAL Luhn check digit (ISO/IEC 7812,
    // public). Detection alone over-fires on any 12-digit run; the Luhn
    // pass separates true card shapes (even custkeys carry a correct
    // check digit) from random numerics (odd custkeys carry a broken
    // one) — the precision filter every production PII scrubber applies
    // before redacting. The Luhn fold runs over the EXTRACTED string
    // (what the detector actually found), digit-doubling via a HOF
    // aggregate in whole-stage codegen; redact-then-rescan proves clean.
    // All arithmetic exact ints; one scan + one small aggregate.
    "q207_luhn_pii" -> { (s, dir) =>
      def luhnSum(c: String, n: Int) = expr(
        s"""aggregate(sequence(1, $n), 0, (acc, j) -> acc +
           (case when j % 2 = 1
            then (case when 2 * cast(substring($c, j, 1) as int) > 9
                  then 2 * cast(substring($c, j, 1) as int) - 9
                  else 2 * cast(substring($c, j, 1) as int) end)
            else cast(substring($c, j, 1) as int) end))""")
      val cust = Tables.customer(s, dir)
        .withColumn("pay",
          lpad((lit(10000000000L) + col("c_custkey") * 37).cast("string"), 11, "0"))
        .withColumn("lsum", luhnSum("pay", 11))
        .withColumn("chk", expr("(10 - lsum % 10) % 10"))
        .withColumn("digit",
          when(pmod(col("c_custkey"), lit(2)) === 0, col("chk"))
            .otherwise(expr("(chk + 5) % 10")))
        .withColumn("card", concat(col("pay"), col("digit").cast("string")))
        .withColumn("blurb",
          concat(lit("cust "), col("c_name"), lit(" card "), col("card"), lit(" end")))
      cust
        .withColumn("found", regexp_extract(col("blurb"), "[0-9]{12}", 0))
        .withColumn("fsum", luhnSum("found", 12))
        .withColumn("valid", (col("fsum") % 10 === 0).cast("int"))
        .withColumn("redacted", regexp_replace(col("blurb"), "[0-9]{12}", "<CARD>"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_customers"),
          sum(when(col("found") =!= "", 1L).otherwise(0L)).as("n_found"),
          sum(col("valid").cast("long")).as("n_luhn_valid"),
          sum(when(col("found") =!= "" && col("valid") === 0, 1L).otherwise(0L)).as("n_luhn_invalid"),
          sum(when(expr("redacted not rlike '[0-9]{12}'"), 1L).otherwise(0L)).as("n_clean"))
        .orderBy("c_mktsegment")
    },

    // PII scrubbing — the redaction pass every published training corpus
    // runs. The PII is DERIVED in-plan (an email from c_name, a phone for
    // custkey % 3 != 0, an alias address for custkey % 4 == 0) so the
    // fixture stays clean and the oracle can re-derive the ground truth
    // independently; the judged surface is find (regexp_extract_all) +
    // scrub (regexp_replace) + prove-clean (re-scan of the redacted text
    // must find nothing). Patterns use only character classes and bounded
    // quantifiers — the regex subset where Java (Spark) and RE2 (DuckDB)
    // semantics coincide. Pure per-row regex work in whole-stage codegen +
    // one small aggregation: nothing here widens at 100 TB.
    "q84_pii_redaction" -> { (s, dir) =>
      val blurb = Tables.customer(s, dir)
        .withColumn("email",
          concat(lower(regexp_replace(col("c_name"), "[^a-zA-Z0-9]", ".")), lit("@example.com")))
        .withColumn("blurb", concat(
          lit("Contact "), col("c_name"), lit(" <"), col("email"), lit(">"),
          when(pmod(col("c_custkey"), lit(4)) === 0,
            concat(lit(" alias <second."), col("email"), lit(">"))).otherwise(lit("")),
          when(pmod(col("c_custkey"), lit(3)) =!= 0,
            concat(lit(" call 555-"), lpad(pmod(col("c_custkey"), lit(10000)).cast("string"), 4, "0")))
            .otherwise(lit("")),
          lit(" re "), col("c_mktsegment")))
      val EmailPat = "[a-z0-9.]+@[a-z.]+"
      val PhonePat = "555-[0-9]{4}"
      blurb
        .withColumn("redacted",
          regexp_replace(regexp_replace(col("blurb"), EmailPat, "<EMAIL>"), PhonePat, "<PHONE>"))
        .groupBy("c_mktsegment")
        .agg(
          count(lit(1)).as("n_customers"),
          sum(size(expr(s"regexp_extract_all(blurb, '$EmailPat', 0)"))).cast("long").as("emails_found"),
          sum(size(expr(s"regexp_extract_all(blurb, '$PhonePat', 0)"))).cast("long").as("phones_found"),
          sum(length(col("blurb")) - length(col("redacted"))).cast("long").as("chars_removed"),
          sum(when(size(expr(s"regexp_extract_all(redacted, '$EmailPat', 0)")) === 0 &&
            size(expr(s"regexp_extract_all(redacted, '$PhonePat', 0)")) === 0, 1).otherwise(0))
            .cast("long").as("n_clean"))
        .orderBy("c_mktsegment")
    },

    // Join-cardinality estimation by correlated key-domain sampling
    // (optimizer-statistics family, beside q124's histograms and q150's
    // CMS): keep a key iff its hash lands in 1/16 of the hash space, apply
    // the SAME predicate to BOTH join sides (sampling keys, not rows —
    // independent row-level Bernoulli would square the survival rate of a
    // matched pair and wreck the estimate), count the sample join, scale
    // by 16. This is the correlated/end-biased sampling every CBO uses
    // when the exact join is too big to count — here the exact count IS
    // still computable, so the estimator's measured relative error is a
    // judged column, not a claim. Cost shape at 100 TB: two scans with a
    // pushed hash predicate + a join 1/16 the true size; all arithmetic
    // is exact int64 (md5-prefix hashing, error in basis points via
    // integer div).
    "q181_join_cardinality_estimate" -> { (s, dir) =>
      def keyKept(c: String) =
        expr(s"pmod(cast(conv(substring(md5(cast($c as string)), 1, 15), 16, 10) as bigint), 16) = 0")
      val o = Tables.orders(s, dir).select("o_orderkey")
      val l = Tables.lineitem(s, dir).select("l_orderkey")
      val exact = o.join(l, col("o_orderkey") === col("l_orderkey"))
        .agg(count(lit(1)).as("exact_rows"))
      val sample = o.filter(keyKept("o_orderkey"))
        .join(l.filter(keyKept("l_orderkey")), col("o_orderkey") === col("l_orderkey"))
        .agg(count(lit(1)).as("sample_rows"))
      exact.crossJoin(broadcast(sample))
        .withColumn("est_rows", col("sample_rows") * 16)
        .withColumn("err_bp",
          expr("abs(est_rows - exact_rows) * 10000 div exact_rows"))
        .select("exact_rows", "sample_rows", "est_rows", "err_bp")
    })

  val oracles: Seq[(String, String)] = Seq(
    "q207_luhn_pii" ->
      """WITH cd AS (
        | SELECT c_custkey, c_name, c_mktsegment,
        |  lpad(CAST(10000000000 + c_custkey * 37 AS VARCHAR), 11, '0') AS pay
        | FROM customer),
        |ls AS (
        | SELECT *, list_reduce(list_prepend(0, list_transform(range(1, 12),
        |   j -> CASE WHEN j % 2 = 1
        |    THEN (CASE WHEN 2 * CAST(substr(pay, CAST(j AS INTEGER), 1) AS INTEGER) > 9
        |          THEN 2 * CAST(substr(pay, CAST(j AS INTEGER), 1) AS INTEGER) - 9
        |          ELSE 2 * CAST(substr(pay, CAST(j AS INTEGER), 1) AS INTEGER) END)
        |    ELSE CAST(substr(pay, CAST(j AS INTEGER), 1) AS INTEGER) END)),
        |   (a, x) -> a + x) AS lsum
        | FROM cd),
        |card AS (
        | SELECT c_mktsegment, c_name,
        |  pay || CAST(CASE WHEN c_custkey % 2 = 0 THEN (10 - lsum % 10) % 10
        |              ELSE ((10 - lsum % 10) % 10 + 5) % 10 END AS VARCHAR) AS card
        | FROM ls),
        |bl AS (SELECT c_mktsegment, 'cust ' || c_name || ' card ' || card || ' end' AS blurb FROM card),
        |fx AS (
        | SELECT c_mktsegment, regexp_extract(blurb, '[0-9]{12}', 0) AS found,
        |  regexp_replace(blurb, '[0-9]{12}', '<CARD>', 'g') AS redacted
        | FROM bl),
        |vl AS (
        | SELECT c_mktsegment, found, redacted,
        |  list_reduce(list_prepend(0, list_transform(range(1, 13),
        |   j -> CASE WHEN j % 2 = 1
        |    THEN (CASE WHEN 2 * CAST(substr(found, CAST(j AS INTEGER), 1) AS INTEGER) > 9
        |          THEN 2 * CAST(substr(found, CAST(j AS INTEGER), 1) AS INTEGER) - 9
        |          ELSE 2 * CAST(substr(found, CAST(j AS INTEGER), 1) AS INTEGER) END)
        |    ELSE CAST(substr(found, CAST(j AS INTEGER), 1) AS INTEGER) END)),
        |   (a, x) -> a + x) % 10 AS fmod
        | FROM fx)
        |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers,
        | CAST(sum(CASE WHEN found <> '' THEN 1 ELSE 0 END) AS BIGINT) AS n_found,
        | CAST(sum(CASE WHEN fmod = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_luhn_valid,
        | CAST(sum(CASE WHEN found <> '' AND fmod <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_luhn_invalid,
        | CAST(sum(CASE WHEN NOT regexp_matches(redacted, '[0-9]{12}') THEN 1 ELSE 0 END) AS BIGINT) AS n_clean
        |FROM vl GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    "q202_bootstrap_ci" ->
      """WITH iv AS (
        | SELECT event_type, value,
        |  CAST(row_number() OVER (PARTITION BY event_type ORDER BY event_id) AS INTEGER) AS idx,
        |  count(*) OVER (PARTITION BY event_type) AS n
        | FROM events),
        |np AS (SELECT DISTINCT event_type, n,
        |  CAST(('0x' || substr(md5(event_type), 1, 8)) AS BIGINT) AS tseed FROM iv),
        |bs AS (SELECT event_type, n, tseed, unnest(range(1, 41)) AS b FROM np),
        |dr AS (
        | SELECT event_type, n, b, t2.j,
        |  CAST(((b * 1103515245 + t2.j * 12345 + tseed) % 2147483647)
        |    * ((b * 1103515245 + t2.j * 12345 + tseed) % 2147483647)
        |    % 2147483647 % n AS INTEGER) + 1 AS idx
        | FROM bs, unnest(range(1, CAST(bs.n AS INTEGER) + 1)) AS t2(j)),
        |rep AS (
        | SELECT d.event_type, d.b,
        |  CAST(sum(CAST(i.value AS DECIMAL(28,2))) AS DOUBLE) / count(*) AS m
        | FROM dr d JOIN iv i ON i.event_type = d.event_type AND i.idx = d.idx
        | GROUP BY 1, 2),
        |rk AS (SELECT event_type, m, row_number() OVER (PARTITION BY event_type ORDER BY m, b) AS rn FROM rep),
        |base AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        | CAST(sum(CAST(value AS DECIMAL(28,2))) AS DOUBLE) / count(*) AS mean_value FROM events GROUP BY 1)
        |SELECT b.event_type, b.n_events, b.mean_value, lo.m AS boot_lo, hi.m AS boot_hi
        |FROM base b
        |JOIN rk lo ON lo.event_type = b.event_type AND lo.rn = 2
        |JOIN rk hi ON hi.event_type = b.event_type AND hi.rn = 39
        |ORDER BY b.event_type""".stripMargin,

    "q195_sliding_distinct" ->
      """WITH ev AS (
        | SELECT event_type, strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
        |  date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS di, user_id,
        |  CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        | FROM events),
        |dd AS (SELECT event_type, day, di, CAST(count(DISTINCT user_id) AS BIGINT) AS n_day_users
        |       FROM ev GROUP BY 1, 2, 3),
        |hs AS (SELECT DISTINCT event_type, di, h FROM ev),
        |wh AS (
        | SELECT DISTINCT d.event_type, d.di, h.h
        | FROM dd d JOIN hs h ON h.event_type = d.event_type AND h.di BETWEEN d.di - 6 AND d.di),
        |rk AS (SELECT event_type, di, h,
        |  row_number() OVER (PARTITION BY event_type, di ORDER BY h) AS rn FROM wh),
        |kc AS (SELECT event_type, di, CAST(count(*) AS BIGINT) AS nh,
        |  max(CASE WHEN rn = 32 THEN h END) AS kth FROM rk GROUP BY 1, 2),
        |du AS (SELECT DISTINCT event_type, di, user_id FROM ev),
        |exw AS (
        | SELECT d.event_type, d.di, CAST(count(DISTINCT u.user_id) AS BIGINT) AS win_exact
        | FROM dd d JOIN du u ON u.event_type = d.event_type AND u.di BETWEEN d.di - 6 AND d.di
        | GROUP BY 1, 2)
        |SELECT d.event_type, d.day, d.n_day_users, e.win_exact,
        | CASE WHEN k.kth IS NOT NULL THEN 31 * 1.152921504606846976e18 / k.kth
        |      ELSE CAST(k.nh AS DOUBLE) END AS win_est,
        | CASE WHEN k.kth IS NOT NULL THEN 31 * 1.152921504606846976e18 / k.kth
        |      ELSE CAST(k.nh AS DOUBLE) END - e.win_exact AS err
        |FROM dd d
        |JOIN kc k ON k.event_type = d.event_type AND k.di = d.di
        |JOIN exw e ON e.event_type = d.event_type AND e.di = d.di
        |ORDER BY d.event_type, d.day""".stripMargin,

    "q181_join_cardinality_estimate" ->
      """WITH ex AS (
        | SELECT CAST(count(*) AS BIGINT) AS exact_rows
        | FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
        |sm AS (
        | SELECT CAST(count(*) AS BIGINT) AS sample_rows
        | FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        | WHERE CAST(('0x' || substr(md5(CAST(o.o_orderkey AS VARCHAR)), 1, 15)) AS BIGINT) % 16 = 0)
        |SELECT e.exact_rows, s.sample_rows,
        | s.sample_rows * 16 AS est_rows,
        | abs(s.sample_rows * 16 - e.exact_rows) * 10000 // e.exact_rows AS err_bp
        |FROM ex e CROSS JOIN sm s""".stripMargin,
    "q150_cms_heavy_hitters" ->
      """WITH h AS (
        | SELECT r,
        |  CASE r WHEN 0 THEN 31 WHEN 1 THEN 37 ELSE 41 END AS a,
        |  CASE r WHEN 0 THEN 7 WHEN 1 THEN 11 ELSE 13 END AS b
        | FROM range(3) t(r)),
        |cells AS (
        | SELECT h.r, ((e.user_id * h.a + h.b) % 1048573) % 64 AS cell
        | FROM events e CROSS JOIN h),
        |counters AS (SELECT r, cell, count(*) AS cnt FROM cells GROUP BY 1, 2),
        |ex AS (SELECT user_id, count(*) AS exact_cnt FROM events GROUP BY 1),
        |probes AS (
        | SELECT ex.user_id, h.r, ((ex.user_id * h.a + h.b) % 1048573) % 64 AS cell
        | FROM ex CROSS JOIN h),
        |est AS (
        | SELECT p.user_id, min(c.cnt) AS est_cnt
        | FROM probes p JOIN counters c USING (r, cell)
        | GROUP BY 1)
        |SELECT e.user_id, e.exact_cnt, s.est_cnt, s.est_cnt - e.exact_cnt AS overestimate
        |FROM ex e JOIN est s USING (user_id)
        |ORDER BY e.exact_cnt DESC, e.user_id
        |LIMIT 10""".stripMargin,

    "q77_topk_agg" ->
      """SELECT p_brand,
        | CAST(row_number() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS INTEGER) AS rank,
        | p_partkey, p_retailprice
        |FROM part
        |QUALIFY rank <= 3
        |ORDER BY p_brand, rank""".stripMargin,

    "q120_bm25_retrieval" ->
      """WITH base AS (
        | SELECT doc_id, string_split(text, ' ') AS toks,
        |  CAST(len(string_split(text, ' ')) AS INTEGER) AS dl
        | FROM documents),
        |stats AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl FROM base),
        |tf AS (
        | SELECT doc_id, dl, tok, count(*) AS tf
        | FROM (SELECT doc_id, dl, unnest(toks) AS tok FROM base) t
        | WHERE tok IN ('join', 'vector', 'stream')
        | GROUP BY doc_id, dl, tok),
        |dfq AS (
        | SELECT tok, count(*) AS df
        | FROM (SELECT unnest(list_distinct(toks)) AS tok FROM base) t
        | WHERE tok IN ('join', 'vector', 'stream')
        | GROUP BY tok),
        |sc AS (
        | SELECT t.doc_id, count(*) AS n_terms,
        |  CAST(sum(CAST(floor(
        |   ((s.n_docs - d.df + CAST(0.5 AS DOUBLE)) / (d.df + CAST(0.5 AS DOUBLE)))
        |   * (t.tf * CAST(2.2 AS DOUBLE) / (t.tf + CAST(1.2 AS DOUBLE)
        |      * (CAST(0.25 AS DOUBLE) + CAST(0.75 AS DOUBLE) * (t.dl
        |         / (CAST(s.sum_dl AS DOUBLE) / CAST(s.n_docs AS DOUBLE))))))
        |   * 1099511627776) AS BIGINT)) AS BIGINT) AS sfix
        | FROM tf t JOIN dfq d USING (tok) CROSS JOIN stats s
        | GROUP BY t.doc_id)
        |SELECT doc_id, CAST(n_terms AS BIGINT) AS n_terms,
        | CAST(sfix AS DOUBLE) / CAST(1099511627776 AS DOUBLE) AS score
        |FROM sc
        |ORDER BY score DESC, doc_id
        |LIMIT 15""".stripMargin,

    "q58_tfidf_top_terms" ->
      """WITH nd AS (SELECT count(*) AS n FROM documents),
        |tf AS (
        | SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents WHERE doc_id < 20),
        |tfc AS (SELECT doc_id, tok, count(*) AS tf FROM tf GROUP BY 1, 2),
        |dfc AS (
        | SELECT tok, count(*) AS df FROM (
        |  SELECT unnest(list_distinct(string_split(text, ' '))) AS tok FROM documents) t
        | GROUP BY tok),
        |scored AS (
        | SELECT doc_id, tok, tf, df, tf * (SELECT n FROM nd) / df AS score
        | FROM tfc JOIN dfc USING (tok))
        |SELECT doc_id, CAST(row_number() OVER w AS INTEGER) AS rank, tok, tf, df, score
        |FROM scored
        |WINDOW w AS (PARTITION BY doc_id ORDER BY score DESC, tok)
        |QUALIFY rank <= 5
        |ORDER BY doc_id, rank""".stripMargin,

    "q59_lang_ngram_profile" ->
      """WITH t AS (
        | SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents),
        |c AS (SELECT lang, tok, count(*) AS n FROM t GROUP BY 1, 2)
        |SELECT lang, tok, n, CAST(row_number() OVER w AS INTEGER) AS rank
        |FROM c
        |WINDOW w AS (PARTITION BY lang ORDER BY n DESC, tok)
        |QUALIFY rank <= 5
        |ORDER BY lang, rank""".stripMargin,

    "q125_kmv_set_ops" ->
      """WITH th AS (
        | SELECT DISTINCT event_type AS t, user_id,
        |  CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        | FROM events),
        |hs AS (SELECT DISTINCT t, h FROM th),
        |rn AS (SELECT t, h, row_number() OVER (PARTITION BY t ORDER BY h) AS rn FROM hs),
        |kth AS (SELECT t, h AS kv FROM rn WHERE rn = 64),
        |ex AS (SELECT t, count(DISTINCT user_id) AS x FROM th GROUP BY t),
        |prs AS (SELECT a.t AS ta, b.t AS tb FROM ex a JOIN ex b ON a.t < b.t),
        |uh AS (
        | SELECT p.ta, p.tb, s.h
        | FROM prs p JOIN hs s ON s.t = p.ta OR s.t = p.tb
        | GROUP BY p.ta, p.tb, s.h),
        |urn AS (SELECT ta, tb, h, row_number() OVER (PARTITION BY ta, tb ORDER BY h) AS rn FROM uh),
        |ukth AS (SELECT ta, tb, h AS ku FROM urn WHERE rn = 64),
        |xi AS (
        | SELECT a.t AS ta, b.t AS tb, count(*) AS x_inter
        | FROM (SELECT DISTINCT t, user_id FROM th) a
        | JOIN (SELECT DISTINCT t, user_id FROM th) b
        |  ON a.user_id = b.user_id AND a.t < b.t
        | GROUP BY 1, 2)
        |SELECT p.ta, p.tb, ea.x AS xa, eb.x AS xb,
        | CAST(coalesce(xi.x_inter, 0) AS BIGINT) AS x_inter,
        | 63 * 1.152921504606846976e18 / ka.kv AS est_a,
        | 63 * 1.152921504606846976e18 / kb.kv AS est_b,
        | 63 * 1.152921504606846976e18 / uk.ku AS est_union,
        | (63 * 1.152921504606846976e18 / ka.kv) + (63 * 1.152921504606846976e18 / kb.kv)
        |  - (63 * 1.152921504606846976e18 / uk.ku) AS est_inter
        |FROM prs p
        |JOIN ex ea ON ea.t = p.ta
        |JOIN ex eb ON eb.t = p.tb
        |JOIN kth ka ON ka.t = p.ta
        |JOIN kth kb ON kb.t = p.tb
        |JOIN ukth uk ON uk.ta = p.ta AND uk.tb = p.tb
        |LEFT JOIN xi ON xi.ta = p.ta AND xi.tb = p.tb
        |ORDER BY p.ta, p.tb""".stripMargin,

    "q61_kmv_distinct_sketch" ->
      """WITH h AS (
        | SELECT DISTINCT event_type,
        |  CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT) AS h
        | FROM events),
        |kth AS (
        | SELECT event_type, h AS kth
        | FROM (SELECT event_type, h, row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn FROM h) t
        | WHERE rn = 64),
        |exact AS (SELECT event_type, count(DISTINCT user_id) AS exact_distinct FROM events GROUP BY event_type)
        |SELECT e.event_type, e.exact_distinct, k.kth,
        | 63 * 1.152921504606846976e18 / k.kth AS kmv_estimate
        |FROM exact e JOIN kth k ON e.event_type = k.event_type
        |ORDER BY e.event_type""".stripMargin,

    "q62_variant_props" ->
      """WITH e AS (
        | SELECT event_type, value,
        |  CAST(regexp_extract(props, '"k": *(-?\d+)', 1) AS BIGINT) AS k
        | FROM events
        | WHERE regexp_extract(props, '"k": *(-?\d+)', 1) <> '')
        |SELECT CAST(k // 10 AS INTEGER) AS k_decile, count(*) AS n,
        | count(DISTINCT event_type) AS n_types, round(sum(value), 2) AS total_value
        |FROM e
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,

    // quantile_cont matches Spark's exact `percentile` (both linear
    // interpolation over the sorted group)
    "q93_outlier_gate" ->
      """WITH c AS (
        | SELECT lang, quantile_cont(n_chars, 0.05) AS p05,
        |  quantile_cont(n_chars, 0.95) AS p95
        | FROM documents GROUP BY lang)
        |SELECT d.lang, count(*) AS n_docs, max(c.p05) AS p05, max(c.p95) AS p95,
        | CAST(sum(CASE WHEN d.n_chars < c.p05 THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
        | CAST(sum(CASE WHEN d.n_chars > c.p95 THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
        | CAST(sum(CASE WHEN d.n_chars >= c.p05 AND d.n_chars <= c.p95 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        |FROM documents d JOIN c USING (lang)
        |GROUP BY d.lang
        |ORDER BY d.lang""".stripMargin,

    "q166_bigram_fluency" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        |p AS (
        | SELECT doc_id, l[i] AS a, l[i + 1] AS b
        | FROM d, LATERAL (SELECT unnest(generate_series(1, len(l) - 1)) AS i) g),
        |bc AS (SELECT a, b, count(*) AS cab FROM p GROUP BY a, b),
        |uc AS (SELECT a, count(*) AS ca FROM p GROUP BY a),
        |sc AS (
        | SELECT p.doc_id, (1000 * bc.cab) // uc.ca AS s
        | FROM p JOIN bc USING (a, b) JOIN uc USING (a))
        |SELECT doc_id, count(*) AS n_pairs, CAST(sum(s) AS BIGINT) AS prob_sum_x1000,
        | CAST(sum(s) // count(*) AS BIGINT) AS fluency_x1000
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q92_unigram_fluency" ->
      """WITH t AS (
        | SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |vc AS (SELECT tok, count(*) AS cnt FROM t GROUP BY tok ORDER BY cnt DESC, tok LIMIT 64),
        |v AS (SELECT tok, CAST(row_number() OVER (ORDER BY cnt DESC, tok) AS INTEGER) AS rnk FROM vc),
        |j AS (SELECT t.doc_id, coalesce(v.rnk, 65) AS r FROM t LEFT JOIN v USING (tok))
        |SELECT doc_id, count(*) AS n_tokens, CAST(sum(r) AS BIGINT) AS rank_sum,
        | CAST((100 * sum(r)) // count(*) AS BIGINT) AS fluency_x100
        |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q60_stats_moments" ->
      """WITH e AS (
        | SELECT event_type, value,
        |  CAST(regexp_extract(props, '"k": *(-?\d+)', 1) AS BIGINT) AS k
        | FROM events
        | WHERE regexp_extract(props, '"k": *(-?\d+)', 1) <> ''),
        |m AS (
        | SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS sx,
        |  CAST(sum(CAST(value * value AS DECIMAL(30,4))) AS DOUBLE) AS sxx,
        |  CAST(sum(CAST(k AS DECIMAL(28,0))) AS DOUBLE) AS sy,
        |  CAST(sum(CAST(k * k AS DECIMAL(30,0))) AS DOUBLE) AS syy,
        |  CAST(sum(CAST(value * k AS DECIMAL(30,2))) AS DOUBLE) AS sxy
        | FROM e GROUP BY event_type)
        |SELECT event_type, n,
        | (sxx - sx * sx / n) / (n - 1) AS var_value,
        | sqrt((sxx - sx * sx / n) / (n - 1)) AS stddev_value,
        | (sxy - sx * sy / n) / (sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n)) AS corr_value_k
        |FROM m
        |ORDER BY event_type""".stripMargin,

    // Same derivation + scrub in DuckDB's RE2. regexp_replace needs the
    // 'g' flag: DuckDB replaces only the first match by default, Spark
    // replaces all.
    "q84_pii_redaction" ->
      """WITH c AS (
        | SELECT c_mktsegment, c_custkey, c_name,
        |  lower(regexp_replace(c_name, '[^a-zA-Z0-9]', '.', 'g')) || '@example.com' AS email
        | FROM customer),
        |t AS (
        | SELECT c_mktsegment,
        |  'Contact ' || c_name || ' <' || email || '>'
        |   || CASE WHEN c_custkey % 4 = 0 THEN ' alias <second.' || email || '>' ELSE '' END
        |   || CASE WHEN c_custkey % 3 <> 0
        |      THEN ' call 555-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') ELSE '' END
        |   || ' re ' || c_mktsegment AS blurb
        | FROM c),
        |r AS (
        | SELECT c_mktsegment, blurb,
        |  regexp_replace(regexp_replace(blurb, '[a-z0-9.]+@[a-z.]+', '<EMAIL>', 'g'),
        |    '555-[0-9]{4}', '<PHONE>', 'g') AS redacted
        | FROM t)
        |SELECT c_mktsegment, count(*) AS n_customers,
        | CAST(sum(len(regexp_extract_all(blurb, '[a-z0-9.]+@[a-z.]+'))) AS BIGINT) AS emails_found,
        | CAST(sum(len(regexp_extract_all(blurb, '555-[0-9]{4}'))) AS BIGINT) AS phones_found,
        | CAST(sum(length(blurb) - length(redacted)) AS BIGINT) AS chars_removed,
        | CAST(sum(CASE WHEN len(regexp_extract_all(redacted, '[a-z0-9.]+@[a-z.]+')) = 0
        |   AND len(regexp_extract_all(redacted, '555-[0-9]{4}')) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_clean
        |FROM r
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin)
}
