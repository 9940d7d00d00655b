package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** Headline subset for the final (compact) metric line: one per
    * operator family plus the historically slowest queries. The full
    * per-query map is still printed (earlier line) and written to
    * bench_full.json — this subset only bounds the FINAL line's length
    * so it survives a bounded log-tail capture (the per-round driver
    * keeps ~2000 chars; a 145-query map alone is larger than that, and
    * three rounds of BENCH_r{N}.json came back `parsed: null`).
    * Trimmed in round 7 to fit the first/steady pair per query into
    * the same budget. */
  private val headline = Seq(
    "q_pricing_summary", "q_revenue_by_nation", "q_shipping_priority",
    "q_market_share", "q_merge_scd2",
    "q_dedup_minhash", "q_dedup_cluster", "q_dedup_prefix",
    "q_dedup_simhash_pairs", "q_dedup_embedding_cosine",
    "q_ann_ivf", "q_pagerank_loop", "q_text_tfidf",
    "q_contamination_bloom", "q_events_sessionize",
    "q_ann_ivfpq", "q_dedup_cluster_delta", "q_bpe_encode",
    "q_global_rownum", "q_pca_deflate", "q_pca_power_iter")

  /** Steady-run watchlist for the compact line: the queries whose
    * first-vs-steady split past verdicts actually adjudicated
    * (iterative builds, megaplan codegen, staged-chain billing).
    * Every query's steady number is in bench_full.json — the compact
    * line only carries the ones a cross-round reader needs, to stay
    * inside the driver's ~2000-char log-tail window. */
  private val steadyWatch = Seq(
    "q_dedup_cluster", "q_dedup_cluster_delta", "q_ann_ivfpq",
    "q_dedup_prefix", "q_pca_deflate", "q_pca_power_iter",
    "q_pagerank_loop", "q_text_tfidf")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.local(cpus)
    def loadAvg: Double = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    // run conditions, sampled BEFORE the run as well as after: round-6's
    // artifact carried machine-state noise that a single post-run
    // 1-minute average could not adjudicate (it reflects only the run's
    // own tail pressure)
    //
    // QUIET GATE: making pollution visible (r7) was not enough — the
    // committed artifact still carried ambient load that inflated
    // first/steady numbers 2-5×. Wait for a quiet window (1-minute
    // load below threshold) before timing, bounded at ~5 minutes of
    // waiting so an always-busy machine still produces an artifact;
    // the attempts and the final pre-run load are in the output, so a
    // gated-but-still-loaded run remains self-adjudicating. Threshold
    // and ceiling are env-tunable for constrained environments.
    val quietBelow = sys.env.get("SPARK_GRAFT_QUIET_BELOW")
      .flatMap(_.toDoubleOption).getOrElse(0.5)
    val quietMaxWaitSec = sys.env.get("SPARK_GRAFT_QUIET_MAX_WAIT_SEC")
      .flatMap(_.toIntOption).getOrElse(300)
    var quietWaits = 0
    val waitStep = 15
    while (loadAvg >= quietBelow && quietWaits * waitStep < quietMaxWaitSec) {
      quietWaits += 1
      Thread.sleep(waitStep * 1000L)
    }
    val loadBefore = loadAvg
    // deterministic starting state: r5 vs r6 totals differed partly on
    // leftover /tmp/graft_stage dirs from PREVIOUS JVMs — a warm
    // leftover turns a stage-building query into a parquet read, a cold
    // one bills the build to it; delete the stage root so every bench
    // run starts from the same (cold, then explicitly prewarmed) state
    SparkEntry.cleanupStages()
    // Untimed warmup: JVM/codegen/shuffle-infra startup otherwise lands
    // on whichever query happens to run first and distorts its number.
    try SparkEntry.queries("q_pricing_summary")(spark, sfDir).count()
    catch { case _: Throwable => () }
    // Shared staged artifacts (interchange transform, similarity and
    // shingle indexes, cluster map) are built once per JVM — pay that
    // here, untimed, so per-query numbers measure the query, not
    // whichever cold stage it was first to touch. A prewarm failure is
    // survivable (each query rebuilds its cold stages) but shifts that
    // stage-build cost back onto timed queries — record it in the
    // output so a distorted run is identifiable instead of silent.
    val prewarmFailed: Option[String] =
      try { SparkEntry.prewarmStages(spark, sfDir); None }
      catch { case e: Throwable => Some(e.getClass.getSimpleName) }
    // sorted order: stable cross-round per-query comparison (Map
    // iteration order shifts whenever a query is added)
    // a failed query must NOT read as a fast success: it reports -1
    // (excluded from the total) and lands in the errors map, so a
    // regression that breaks a query can't masquerade as a speed-up
    //
    // Each query runs TWICE: `first` carries plan+codegen+
    // first-consumer-stage-build cost, `steady` the repeat dataflow
    // cost — r6's cross-round comparison was unadjudicable because one
    // number conflated the two (a cold first-consumer stage build looks
    // identical to a plan regression in a single sample).
    // errors are tracked PER RUN: a query that succeeds first and
    // fails only on the steady re-run keeps its valid first-run number
    // (masking it as -1 would misattribute a transient steady failure
    // as "query broken" in the cross-round first-run comparison — the
    // exact conflation the first/steady split exists to prevent)
    case class R(name: String, first: Double, steady: Double,
                 err1: Option[String], err2: Option[String], rounds: Int,
                 load: Double, firstCpu: Double, steadyCpu: Double)
    // Process CPU time (all JVM threads) — the interference evidence
    // the 1-minute loadavg can't see: r11 proved two steady samples
    // can AGREE while both are polluted (q_pca_project 12.7 s at load
    // 1.46 — the load conjunct alone missed it). When external load
    // starves this JVM, wall-time inflates while the process's own
    // CPU-time barely moves; on a quiet local[N] run every batch
    // query keeps cpu/wall ≥ ~1 (the driver thread alone is busy the
    // whole wall window). cpu/wall < 0.6 on a >0.3 s sample is
    // machine-flagged below as suspect. −1 where the platform bean is
    // unavailable (flag suppressed, never false-fired).
    val procCpu: () => Double = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean match {
        case b: com.sun.management.OperatingSystemMXBean =>
          () => b.getProcessCpuTime / 1e9
        case _ => () => -1.0
      }
    // min-of-N steady: a SINGLE steady sample was the artifact's last
    // untrustworthy column — the r8 quiet-START gate could not stop
    // mid-run ambient load from inflating 8 steady entries up to 4.8×
    // their quiet truth. Two samples that agree (within 20% + 50 ms
    // absolute slack, so millisecond queries don't triple-run on
    // scheduler jitter) accept the min; disagreement is interference
    // evidence and buys a third sample, min of all three. The min is
    // the right statistic here: steady dataflow cost has a hard floor
    // and pollution only ever ADDS time.
    var steadyThirdRuns = 0
    // MID-RUN quiet gate (r11): the r10 DRIVER artifact ran at load
    // 1.97 and its single-sample FIRST runs came out up to 5× off
    // quiet truth (q_dataset_card 5.98 vs 1.22) — the pre-run gate
    // cannot see load that arrives mid-sweep. Before each query's
    // first run, if the 1-minute load is above the quiet threshold,
    // wait in short steps against a shared budget; waits and the
    // remaining budget are in the output so an exhausted-budget
    // (still-loaded) run stays self-adjudicating. A RETRY-MIN of
    // polluted first runs was considered and REJECTED: codegen and
    // timed-alias stage builds are unrepeatable inside one JVM
    // (writeStageOnce memoizes; the JIT cache persists), so a warm
    // retry measures ~steady and min(first, retry) would silently
    // replace the architectural first-run cost with the steady number
    // — for q_pca_power_iter (first 3.11 / steady 0.17, QUIET) that
    // "fix" would erase the very number the timed-alias billing
    // design exists to report. Prevention + per-query load evidence
    // + the first_suspect list below is the honest version.
    var midrunWaits = 0
    var midrunBudgetSec = sys.env.get("SPARK_GRAFT_MIDRUN_WAIT_BUDGET_SEC")
      .flatMap(_.toIntOption).getOrElse(240)
    def midrunQuietGate(): Unit = {
      val step = 5
      while (loadAvg >= quietBelow && midrunBudgetSec >= step) {
        midrunWaits += 1
        midrunBudgetSec -= step
        Thread.sleep(step * 1000L)
      }
    }
    // stage-OWNER queries run before the alphabetical sweep: a
    // deliberately-unprewarmed shared stage (the cluster map) must
    // bill its build to the query whose computation it IS, not to
    // whichever consumer sorts first (r9 billed the CC build to
    // q_cluster_source_entropy because "c" < "d"). Output maps are
    // re-sorted by name below, so cross-round comparison is unchanged.
    val owners = SparkEntry.stageOwners
    val ordered =
      owners.flatMap(n => SparkEntry.queries.get(n).map(n -> _)) ++
      SparkEntry.queries.toSeq.sortBy(_._1)
        .filterNot { case (n, _) => owners.contains(n) }
    val results0 = ordered.map { case (name, fn) =>
      // each sample carries its own CPU-time delta so min-of-N can
      // keep the CHOSEN sample's wall/cpu pair together (flagging the
      // min sample on another sample's utilization would misfire)
      def once(): (Double, Double, Option[String]) = {
        val c0 = procCpu()
        val t0 = System.nanoTime()
        val err = try { fn(spark, sfDir).count(); None }
                  catch { case e: Throwable => Some(e.getClass.getSimpleName) }
        val wall = (System.nanoTime() - t0) / 1e9
        val cpu = if (c0 < 0) -1.0 else procCpu() - c0
        (wall, cpu, err)
      }
      // an errored steady sample reports immediately (a steady failure
      // must stay visible, not be retried away as if it were noise)
      def steadyMinOfN(): (Double, Double, Option[String]) = {
        def minS(x: (Double, Double, Option[String]),
                 y: (Double, Double, Option[String])) =
          if (x._1 <= y._1) x else y
        val a = once()
        if (a._3.isDefined) a
        else {
          val b = once()
          if (b._3.isDefined) b
          else if (math.max(a._1, b._1) <= math.min(a._1, b._1) * 1.2 + 0.05)
            minS(a, b)
          else {
            steadyThirdRuns += 1
            val c = once()
            if (c._3.isDefined) c else minS(minS(a, b), c)
          }
        }
      }
      graft.ops.Cluster.resetRounds()
      midrunQuietGate()
      val (t1, cpu1, e1) = once()
      // the load sample bracketing this query's first run (the
      // 1-minute average moves slowly, so one post-run sample is the
      // per-query evidence column — coarse, but enough to adjudicate
      // a 5× first-run outlier as load vs regression cross-round)
      val qLoad = loadAvg
      // iterative ops emit their round count (convergence behaviour is
      // otherwise invisible in a wall-clock number — a round-count
      // change and a per-round regression read identically)
      val rounds = graft.ops.Cluster.lastRounds
      val (t2, cpu2, e2) =
        if (e1.isDefined) (-1.0, -1.0, e1) else steadyMinOfN()
      R(name, t1, t2, e1, e2, rounds, qLoad, cpu1, cpu2)
    }
    // name-sorted for the output maps (stable cross-round comparison
    // regardless of the owner-first run order above)
    val results = results0.sortBy(_.name)
    // ALL number formatting is Locale.ROOT: the scala f interpolator
    // uses the default locale, and a de_DE-style JVM would render
    // "1,234" — invalid JSON in the exact line the driver must parse
    def num(fmt: String, v: Double): String =
      String.format(java.util.Locale.ROOT, fmt, Double.box(v))
    def qmap(rs: Seq[R], v: R => Double, bad: R => Boolean): String =
      rs.map { r =>
        "\"" + r.name + "\":" + (if (bad(r)) "-1" else num("%.3f", v(r)))
      }.mkString("{", ",", "}")
    def qfirst(rs: Seq[R]) = qmap(rs, _.first, _.err1.isDefined)
    def qsteady(rs: Seq[R]) = qmap(rs, _.steady, r => r.err1.isDefined || r.err2.isDefined)
    // the errors map says WHICH run failed, so a steady-only failure
    // stays distinguishable from a broken query
    val errs = results.flatMap { r =>
      r.err1.map(e => s""""${r.name}":"first:$e"""")
        .orElse(r.err2.map(e => s""""${r.name}":"steady:$e""""))
    }.mkString("{", ",", "}")
    val roundsMap = results.filter(r => r.rounds >= 0 && r.err1.isEmpty)
      .map(r => s""""${r.name}":${r.rounds}""").mkString("{", ",", "}")
    val total = results.filter(_.err1.isEmpty).map(_.first).sum
    val totalSteady = results
      .filter(r => r.err1.isEmpty && r.err2.isEmpty).map(_.steady).sum
    // queries whose first run LOOKS polluted: wall-time well past its
    // own steady (3× + 0.3 s slack — legitimate codegen-heavy ratios
    // like the timed-alias iterations are excluded by the load
    // conjunct) while the bracketing load sample was above the quiet
    // threshold. A cross-round comparator should treat these
    // first-run cells as load noise, not regressions.
    // the wall≫cpu starvation test (see procCpu above): suspect when
    // the sample is non-trivial (>0.3 s) and the process earned less
    // than 60% of one core over its wall window — a quiet local[N]
    // batch query can't do that (the driver thread alone keeps
    // cpu/wall near 1), only an externally-starved JVM can
    def cpuStarved(wall: Double, cpu: Double): Boolean =
      wall > 0.3 && cpu >= 0 && cpu < 0.6 * wall
    val firstSuspect = results.filter { r =>
      r.err1.isEmpty && r.err2.isEmpty &&
        r.first > 3.0 * math.max(r.steady, 0.0) + 0.3 &&
        // load above threshold OR the cpu-gap evidence — r11 proved
        // the load conjunct alone can miss polluted cells
        (r.load >= quietBelow || cpuStarved(r.first, r.firstCpu))
    }.map(r => "\"" + r.name + "\"").mkString("[", ",", "]")
    // steady cells have no "3× its own steady" reference — the CHOSEN
    // min sample's own wall/cpu gap is the whole test. A flagged cell
    // means: treat this steady number as interference, reproduce on a
    // quiet machine before calling it a regression.
    val steadySuspect = results.filter { r =>
      r.err1.isEmpty && r.err2.isEmpty && cpuStarved(r.steady, r.steadyCpu)
    }.map(r => "\"" + r.name + "\"").mkString("[", ",", "]")
    val maxLoad = results.map(_.load).foldLeft(-1.0)(math.max)
    val loadMap = results
      .map(r => "\"" + r.name + "\":" + (if (r.load < 0) "null" else num("%.2f", r.load)))
      .mkString("{", ",", "}")
    val prewarm = prewarmFailed.map(c => s""""$c"""").getOrElse("null")
    // getSystemLoadAverage is -1.0 where unsupported — emit null, not a
    // legitimate-looking negative load
    def loadJson(v: Double) = if (v < 0) "null" else num("%.2f", v)
    val nSuspect = firstSuspect.count(_ == '"') / 2
    val nSteadySuspect = steadySuspect.count(_ == '"') / 2
    val cond = s""""load_avg_before":${loadJson(loadBefore)},"load_avg_1m":${loadJson(loadAvg)},"max_load_1m":${loadJson(maxLoad)},"quiet_waits":$quietWaits,"midrun_waits":$midrunWaits,"n_first_suspect":$nSuspect,"n_steady_suspect":$nSteadySuspect,"steady_third_runs":$steadyThirdRuns,"cpus":${cpus.trim.toIntOption.getOrElse(-1)}"""
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","total_steady":$totalSteady,"queries":${qfirst(results)},"queries_steady":${qsteady(results)},"queries_load":$loadMap,"first_suspect":$firstSuspect,"steady_suspect":$steadySuspect,"cc_rounds":$roundsMap,"errors":$errs,"prewarm_failed":$prewarm,$cond,"sf":"$sfDir"}"""
    // full per-query map: first as a log line (for a reader of the whole
    // log), then as a file next to the repo (survives log truncation)
    println(full)
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_full.json"), full)
    catch { case scala.util.control.NonFatal(_) => () }
    // FINAL line, emitted last so a tail-bounded log capture ends with a
    // complete, parseable record: headline queries only, plus every
    // errored query (a failure must stay visible even off-headline).
    // `queries` stays the first-run map (the number every prior round
    // reported); `queries_steady` is the repeat-run dataflow cost.
    val compact = results.filter(r =>
      headline.contains(r.name) || r.err1.isDefined || r.err2.isDefined)
    val compactSteady = results.filter(r =>
      steadyWatch.contains(r.name) && r.err1.isEmpty && r.err2.isEmpty)
    // steady_suspect rides the compact line too: normally empty (a
    // quiet run), and when non-empty it is exactly the evidence a
    // log-tail reader needs to not chase flagged cells as regressions
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"total_steady":$totalSteady,"queries":${qfirst(compact)},"queries_steady":${qsteady(compactSteady)},"steady_suspect":$steadySuspect,"errors":$errs,"prewarm_failed":$prewarm,$cond,"detail":"bench_full.json","sf":"$sfDir"}""")
    spark.stop()
  }
}
