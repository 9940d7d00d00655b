package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** Headline subset for the final (compact) metric line: one per
    * operator family plus the historically slowest queries. The full
    * per-query map is still printed (earlier line) and written to
    * bench_full.json — this subset only bounds the FINAL line's length
    * so it survives a bounded log-tail capture (the per-round driver
    * keeps ~2000 chars; a 145-query map alone is larger than that, and
    * three rounds of BENCH_r{N}.json came back `parsed: null`). */
  private val headline = Seq(
    "q_pricing_summary", "q_revenue_by_nation", "q_shipping_priority",
    "q_market_share", "q_product_profit", "q_merge_scd2", "q_merge_upsert",
    "q_dedup_minhash", "q_dedup_cluster", "q_dedup_prefix",
    "q_dedup_substring", "q_dedup_simhash_pairs", "q_dedup_embedding_cosine",
    "q_knn_bruteforce", "q_ann_ivf", "q_ann_sign_lsh", "q_kmeans_step",
    "q_pagerank_loop", "q_text_tfidf", "q_heavy_hitters", "q_corpus_filter",
    "q_contamination_bloom", "q_events_sessionize", "q_pack_sequences",
    "q_sample_weighted", "q_pareto_customers", "q_profile_orders",
    "q_hll_merge", "q_fuzzy_join", "q_waiting_orders",
    // round-5 flagships
    "q_ann_ivfpq", "q_dedup_cluster_delta", "q_bpe_encode",
    "q_global_rownum")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.local(cpus)
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
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err = try { fn(spark, sfDir).count(); None }
                catch { case e: Throwable => Some(e.getClass.getSimpleName) }
      (name, (System.nanoTime() - t0) / 1e9, err)
    }
    // ALL number formatting is Locale.ROOT: the scala f interpolator
    // uses the default locale, and a de_DE-style JVM would render
    // "1,234" — invalid JSON in the exact line the driver must parse
    def num(fmt: String, v: Double): String =
      String.format(java.util.Locale.ROOT, fmt, Double.box(v))
    def qmap(rs: Seq[(String, Double, Option[String])]): String =
      rs.map { case (k, v, err) =>
        "\"" + k + "\":" + (if (err.isDefined) "-1" else num("%.3f", v))
      }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) => s"\"$k\":\"$e\"" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v, None) => v }.sum
    val prewarm = prewarmFailed.map(c => s"\"$c\"").getOrElse("null")
    // run conditions: round-4's snapshot carried a uniform ~1.9×
    // machine-load slowdown that polluted cross-round comparison —
    // record the 1-minute load average (taken AFTER the run, so it
    // reflects this JVM's own pressure plus whatever else ran) and the
    // worker count, so a loaded run is identifiable from the artifact
    // getSystemLoadAverage is -1.0 where unsupported — emit null, not a
    // legitimate-looking negative load
    val loadAvg = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val loadJson = if (loadAvg < 0) "null" else num("%.2f", loadAvg)
    // cpus is a raw env string; parse defensively so a non-numeric
    // value can never make this (the driver-parsed) line unparseable
    val cond = s""""load_avg_1m":$loadJson,"cpus":${cpus.trim.toIntOption.getOrElse(-1)}"""
    val full =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":${qmap(results)},"errors":$errs,"prewarm_failed":$prewarm,$cond,"sf":"$sfDir"}"""
    // full per-query map: first as a log line (for a reader of the whole
    // log), then as a file next to the repo (survives log truncation)
    println(full)
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_full.json"), full)
    catch { case scala.util.control.NonFatal(_) => () }
    // FINAL line, emitted last so a tail-bounded log capture ends with a
    // complete, parseable record: headline queries only, plus every
    // errored query (a failure must stay visible even off-headline)
    val compact = results.filter { case (k, _, err) =>
      headline.contains(k) || err.isDefined }
    println(s"""{"metric":"total","value":$total,"unit":"sec","n_queries":${results.size},"queries":${qmap(compact)},"errors":$errs,"prewarm_failed":$prewarm,$cond,"detail":"bench_full.json","sf":"$sfDir"}""")
    spark.stop()
  }
}
