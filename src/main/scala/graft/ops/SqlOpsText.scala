package graft.ops

/** Text analysis: language id, quality scoring, entropy/TTR/readability, n-gram LMs, novelty, fingerprinting.
  *
  * Split out of the single-file SqlOps (r11) as a PURE MOVE: member
  * order across the [[SqlOpsAll]] linearization equals the pre-split
  * declaration order, so val-initialization semantics are unchanged.
  * The self-type keeps every cross-domain reference compiling against
  * the same single [[SqlOps]] instance.
  */
trait SqlOpsText { this: SqlOpsAll =>

  // ---- text analysis ----

  /** Token counting: whitespace tokens, regex words, BPE-ish subtokens. */
  def textTokens(d: Dialect): String =
    s"""SELECT doc_id,
       |  ${d.size(toks(d))} AS n_ws_tokens,
       |  ${d.reCount("text", "\\S+")} AS n_words,
       |  ${d.reCount("text", "[a-z]+|[0-9]+|[^a-z0-9\\s]")} AS n_subtokens
       |FROM documents""".stripMargin

  /** Stopword-hit counts over a `toks` column and the lang-guess rule —
    * single-sourced so [[textLangId]] and [[corpusFilter]] cannot
    * drift (the per-query oracle gate is structurally blind to drift
    * between two queries that each stay self-consistent). */
  private[ops] def langHitExprs(d: Dialect): (String, String) = (
    d.size(d.filter("toks", s"t -> ${d.arrayContains(d.arrayLit(STOP_EN), "t")}")),
    d.size(d.filter("toks", s"t -> ${d.arrayContains(d.arrayLit(STOP_ID), "t")}")))
  private[ops] def langGuessCase(en: String, id: String): String =
    s"""CASE WHEN $en > $id THEN 'en'
       |       WHEN $id > $en THEN 'id'
       |       ELSE 'und' END""".stripMargin
  /** The quality score over its three components (weights/caps live
    * here, once) — shared by [[textQuality]] and [[corpusFilter]]. */
  private[ops] def qualityFormula(nWords: String, stopRatio: String, avgWlen: String): String =
    s"""LEAST(CAST($nWords AS DOUBLE) / 1.0e2, 1.0e0) * 5.0e-1
       |      + (1.0e0 - $stopRatio) * 3.0e-1
       |      + LEAST(($avgWlen) / 8.0e0, 1.0e0) * 2.0e-1""".stripMargin
  private[ops] def stopHitsExpr(d: Dialect): String =
    d.size(d.filter("toks", s"t -> ${d.arrayContains(d.arrayLit(STOP_EN ++ STOP_ID), "t")}"))

  /** The Spark renderings of the language-guess and quality formulas,
    * as expressions over `text` + `toks` columns — the streaming
    * corpus gate ([[graft.streaming.StreamingOps.corpusGate]]) scores
    * arriving documents with the SAME single-sourced formulas the
    * batch queries use, so batch and stream cannot drift (a parity
    * test asserts identical survivor sets). */
  def sparkScoreExprs: (String, String) = {
    val d: Dialect = SparkDialect
    val (en, id) = langHitExprs(d)
    val quality = qualityFormula(
      nWords = d.size("toks"),
      stopRatio = s"CAST(${stopHitsExpr(d)} AS DOUBLE) / ${d.size("toks")}",
      avgWlen = s"CAST(length(replace(text, ' ', '')) AS DOUBLE) / ${d.size("toks")}")
    (langGuessCase(en, id), quality)
  }

  /** N-gram/stopword language id heuristic (en vs id markers). */
  def textLangId(d: Dialect): String = {
    val (en, id) = langHitExprs(d)
    s"""WITH ltoks AS (SELECT doc_id, lang, ${toks(d)} AS toks FROM documents)
       |SELECT doc_id, lang, en_hits, id_hits,
       |  ${langGuessCase("en_hits", "id_hits")} AS lang_guess
       |FROM (SELECT doc_id, lang, $en AS en_hits, $id AS id_hits FROM ltoks)""".stripMargin
  }

  /** Confident-learning-style LABEL NOISE estimate (Northcutt et al.
    * 2021, simplified to the binary en/non-en slice this corpus's
    * heuristic scorer can judge): a doc labeled non-en whose
    * en-stopword rate is at or above the MEAN rate of docs labeled en
    * "looks confidently English" — a suspected mislabel — and vice
    * versa. The class thresholds are the CL self-confidence means,
    * here the per-class mean en-hit rate in exact integer ppm (idiv
    * of int64 sums), so every comparison is integer-exact. Output is
    * the per-class audit a labeling pipeline reads: suspect count and
    * rate next to the threshold used. One scoring pass (the langid
    * token arithmetic), one class-grain aggregate, one broadcast-back
    * comparison — no per-doc state. */
  def labelNoise(d: Dialect): String = {
    val (en, _) = langHitExprs(d)
    s"""WITH ltoks AS (
       |  SELECT doc_id, lang, ${toks(d)} AS toks FROM documents
       |),
       |sc AS (
       |  SELECT doc_id,
       |    CASE WHEN lang = 'en' THEN 'en' ELSE 'non_en' END AS label,
       |    ${d.idiv(s"1000000 * CAST($en AS BIGINT)",
                 s"GREATEST(CAST(${d.size("toks")} AS BIGINT), 1)")} AS s_mu
       |  FROM ltoks
       |),
       |thr AS (
       |  SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
       |    ${d.idiv("CAST(SUM(s_mu) AS BIGINT)", "COUNT(*)")} AS t_mu
       |  FROM sc GROUP BY label
       |),
       |sus AS (
       |  SELECT s.label, CAST(COUNT(*) AS BIGINT) AS n_suspect
       |  FROM sc s
       |  JOIN thr o ON o.label <> s.label
       |  WHERE (s.label = 'non_en' AND s.s_mu >= o.t_mu)
       |     OR (s.label = 'en' AND s.s_mu <= o.t_mu)
       |  GROUP BY s.label
       |)
       |SELECT t.label, t.n AS n_docs, t.t_mu AS own_mean_mu,
       |  CAST(COALESCE(u.n_suspect, 0) AS BIGINT) AS n_suspect,
       |  ${d.idiv("1000000 * COALESCE(u.n_suspect, 0)", "t.n")} AS suspect_ppm
       |FROM thr t LEFT JOIN sus u ON u.label = t.label
       |ORDER BY t.label""".stripMargin
  }

  /** Quality scoring: length, stopword ratio, mean word length. */
  def textQuality(d: Dialect): String =
    s"""WITH qtoks AS (SELECT doc_id, text, ${toks(d)} AS toks FROM documents),
       |m AS (
       |  SELECT doc_id,
       |    ${d.size("toks")} AS n_words,
       |    CAST(${stopHitsExpr(d)} AS DOUBLE) / ${d.size("toks")} AS stop_ratio,
       |    CAST(length(replace(text, ' ', '')) AS DOUBLE) / ${d.size("toks")} AS avg_wlen
       |  FROM qtoks
       |)
       |SELECT doc_id, n_words, stop_ratio, avg_wlen,
       |  ${qualityFormula("n_words", "stop_ratio", "avg_wlen")} AS quality
       |FROM m""".stripMargin

  /** Ordered funnel analysis (view → click → purchase): per user, the
    * first view, the first click strictly after it, the first purchase
    * strictly after that — then one row per stage with how many users
    * got there. Each stage is a groupBy-min over an equi-join against
    * the (user-cardinality) previous stage: three shuffles on user_id,
    * each candidate set smaller than the last, broadcast-joinable
    * whenever a stage's survivors fit. Timestamps are compared as
    * microsecond epochs (exact integers in both engines). */
  def eventsFunnel(d: Dialect): String =
    s"""WITH s1 AS (
       |  SELECT user_id, MIN(${d.epochMicros("ts")}) AS t1
       |  FROM events WHERE event_type = 'view' GROUP BY user_id
       |),
       |s2 AS (
       |  SELECT e.user_id, MIN(${d.epochMicros("ts")}) AS t2
       |  FROM events e JOIN s1 ON e.user_id = s1.user_id
       |  WHERE e.event_type = 'click' AND ${d.epochMicros("ts")} > s1.t1
       |  GROUP BY e.user_id
       |),
       |s3 AS (
       |  SELECT e.user_id, MIN(${d.epochMicros("ts")}) AS t3
       |  FROM events e JOIN s2 ON e.user_id = s2.user_id
       |  WHERE e.event_type = 'purchase' AND ${d.epochMicros("ts")} > s2.t2
       |  GROUP BY e.user_id
       |)
       |SELECT 1 AS stage, 'view' AS name, COUNT(*) AS n_users FROM s1
       |UNION ALL
       |SELECT 2 AS stage, 'click' AS name, COUNT(*) AS n_users FROM s2
       |UNION ALL
       |SELECT 3 AS stage, 'purchase' AS name, COUNT(*) AS n_users FROM s3""".stripMargin

  /** Cohort retention matrix: customers grouped by first-order month,
    * counted again in each later month they order in. All-integer
    * month keys (y·12+m) make the offsets engine-exact — no interval /
    * months_between semantics to disagree on. Two shuffles: the
    * per-customer first-order aggregate, then the (cohort, offset)
    * count; the join is customer-cardinality and broadcastable when
    * the cohort map fits, else a co-partitioned shuffle on the key
    * both sides already grouped by. */
  def ordersRetention(d: Dialect): String = {
    val mkey = "CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) * 12 + " +
      "CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) - 1"
    s"""WITH om AS (SELECT o_custkey, $mkey AS mk FROM orders),
       |cohort AS (SELECT o_custkey, MIN(mk) AS c0 FROM om GROUP BY o_custkey)
       |SELECT CAST(FLOOR(c.c0 / 12) AS INT) AS cohort_year,
       |  CAST(c.c0 % 12 + 1 AS INT) AS cohort_month,
       |  CAST(o.mk - c.c0 AS INT) AS months_later,
       |  COUNT(DISTINCT o.o_custkey) AS n_customers
       |FROM om o JOIN cohort c ON o.o_custkey = c.o_custkey
       |GROUP BY 1, 2, 3""".stripMargin
  }

  /** Cohort lifetime value — [[ordersRetention]]'s revenue companion:
    * for each acquisition cohort (first-order month) and each month
    * offset k = 0..5, the cumulative revenue per acquired customer
    * through month k — the LTV curve a growth model reads. The
    * (cohort × k) grid is CROSS-JOIN-driven so a cohort with a quiet
    * month still emits its row with the cumulative carried forward
    * (the absent-row convention applied to a running series: a LEFT
    * JOIN hole would silently freeze the curve). Integer month keys
    * (year·12+month — no months_between float divergence), exact int64
    * cents; the one window runs per cohort over ≤ 6 rows (grid grain,
    * never per order). Scale shape: one corpus-scale rollup to
    * (cohort, k), everything after at cohort-month cardinality. */
  def cohortLtv(d: Dialect): String = {
    val mkey = "CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) * 12 + " +
      "CAST(EXTRACT(MONTH FROM o_orderdate) AS INT) - 1"
    val dom = domainRel("k", (0 to 5).map(_.toString))
    s"""WITH om AS (
       |  SELECT o_custkey, $mkey AS mk,
       |    CAST(FLOOR(o_totalprice * 1.0e2 + 5.0e-1) AS BIGINT) AS cents
       |  FROM orders
       |),
       |cohort AS (SELECT o_custkey, MIN(mk) AS c0 FROM om GROUP BY o_custkey),
       |sz AS (SELECT c0, CAST(COUNT(*) AS BIGINT) AS n_customers
       |       FROM cohort GROUP BY c0),
       |rev AS (
       |  SELECT c.c0, o.mk - c.c0 AS k, CAST(SUM(o.cents) AS BIGINT) AS cents
       |  FROM om o JOIN cohort c ON o.o_custkey = c.o_custkey
       |  WHERE o.mk - c.c0 <= 5
       |  GROUP BY c.c0, o.mk - c.c0
       |),
       |grid AS (SELECT s.c0, dm.k, s.n_customers FROM sz s CROSS JOIN ($dom) dm),
       |cum AS (
       |  SELECT g.c0, g.k, g.n_customers,
       |    CAST(SUM(COALESCE(r.cents, 0)) OVER (
       |      PARTITION BY g.c0 ORDER BY g.k) AS BIGINT) AS cum_cents
       |  FROM grid g LEFT JOIN rev r ON r.c0 = g.c0 AND r.k = g.k
       |)
       |SELECT CAST(${d.idiv("c0", "12")} AS INT) AS cohort_year,
       |  CAST(c0 % 12 + 1 AS INT) AS cohort_month,
       |  CAST(k AS INT) AS months_since_first,
       |  n_customers, cum_cents,
       |  ${d.idiv("cum_cents", "n_customers")} AS ltv_cents
       |FROM cum""".stripMargin
  }

  /** Per-source corpus health report — the one-page rollup a corpus
    * owner reads before a training run: volume, exact-dup rate,
    * language mix, mean quality, per source. Reuses the single-sourced
    * language-guess and quality formulas (drift between the report and
    * the filters it summarizes would be invisible to per-query
    * oracles). Mean quality is micro-quantized per doc and summed as
    * integers (order-independent); the dup/lang fractions are single
    * exact IEEE divisions. One scan, narrow scoring, one groupBy
    * shuffle on source (20 groups here; a skewed source at 100 TB
    * rides the same partial-agg path as every count). */
  def corpusReport(d: Dialect): String = {
    val (en, id) = langHitExprs(d)
    val quality = qualityFormula(
      nWords = d.size("toks"),
      stopRatio = s"CAST(${stopHitsExpr(d)} AS DOUBLE) / ${d.size("toks")}",
      avgWlen = s"CAST(length(replace(text, ' ', '')) AS DOUBLE) / ${d.size("toks")}")
    s"""WITH ptoks AS (SELECT doc_id, source, text, ${toks(d)} AS toks FROM documents),
       |scored AS (
       |  SELECT source, md5(text) AS ch,
       |    ${langGuessCase(en, id)} AS lang_guess,
       |    $quality AS quality
       |  FROM ptoks
       |)
       |SELECT source, COUNT(*) AS n_docs,
       |  COUNT(DISTINCT ch) AS n_unique,
       |  CAST(COUNT(*) - COUNT(DISTINCT ch) AS DOUBLE) / COUNT(*) AS dup_frac,
       |  CAST(SUM(CASE WHEN lang_guess = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
       |  CAST(SUM(CAST(FLOOR(quality * 1.0e6 + 5.0e-1) AS BIGINT)) AS DOUBLE)
       |    / COUNT(*) / 1.0e6 AS avg_quality
       |FROM scored GROUP BY source""".stripMargin
  }

  /** Repetition quality rule (Gopher-style): the frequency share of the
    * most repeated token per document. The ratio is one exact IEEE
    * division of two ints — bit-identical across engines. */
  def textRepetition(d: Dialect): String =
    s"""WITH rtoks AS (SELECT doc_id, ${toks(d)} AS toks FROM documents),
       |tok AS (${d.explode("SELECT doc_id, toks FROM rtoks", "doc_id", "toks", "t")}),
       |tf AS (SELECT doc_id, t, COUNT(*) AS tf FROM tok GROUP BY doc_id, t),
       |agg AS (SELECT doc_id, MAX(tf) AS top_tf,
       |  CAST(SUM(tf) AS BIGINT) AS n_toks FROM tf GROUP BY doc_id)
       |SELECT doc_id, top_tf, n_toks,
       |  CAST(top_tf AS DOUBLE) / n_toks AS rep_ratio
       |FROM agg""".stripMargin

  /** The composed cleaning pipeline as ONE query: language-ID gate +
    * quality gate + exact-dedup survivor selection — the "clean corpus
    * manifest" a training-data pipeline actually emits. Each stage is
    * the same logic as its standalone query; composing them keeps all
    * three in a single distributed pass (scan → narrow scoring →
    * two window/group shuffles). */
  /** The per-doc scoring prefix (tokenize → lang guess + quality),
    * ending in `scored(doc_id, text, lang_guess, quality)` — ONE copy
    * shared by [[corpusFilter]] (which gates at the shipped 0.4
    * threshold) and [[qualitySweep]] (which sweeps the threshold), so
    * the sweep can never score differently from the gate it tunes. */
  private[ops] def scoredCtes(d: Dialect, from: String): String = {
    val (en, id) = langHitExprs(d)
    val quality = qualityFormula(
      nWords = d.size("toks"),
      stopRatio = s"CAST(${stopHitsExpr(d)} AS DOUBLE) / ${d.size("toks")}",
      avgWlen = s"CAST(length(replace(text, ' ', '')) AS DOUBLE) / ${d.size("toks")}")
    s"""ftoks AS (SELECT doc_id, text, ${toks(d)} AS toks FROM $from),
       |scored AS (
       |  SELECT doc_id, text, toks,
       |    ${langGuessCase(en, id)} AS lang_guess,
       |    $quality AS quality
       |  FROM ftoks
       |)""".stripMargin
  }

  /** The shipped survivor predicate over (rn, lang_guess, quality) —
    * ONE copy of the gate DECISION (not just the scores) shared by
    * [[corpusFilter]] and [[datasetCard]]'s quality_pass_docs row, so
    * a card can never report a different survivor count than the
    * filter ships. [[qualitySweep]] sweeps the quality term of this
    * predicate; its thr=40 row uses the double literal 40.0e-2, which
    * parses to the identical double as this 4.0e-1 (both are the
    * correctly-rounded decimal 0.4), so the sweep's shipped-threshold
    * row equals the filter's survivor count EXACTLY — a scaled
    * integer compare (quality·100 ≥ 40) would not: ×100 can round a
    * one-ulp-below-0.4 quality up to exactly 40.0. */
  private[ops] val SurvivorGate =
    "rn = 1 AND lang_guess <> 'und' AND quality >= 4.0e-1"

  def corpusFilter(d: Dialect, from: String = "documents"): String = {
    s"""WITH ${scoredCtes(d, from)},
       |survivors AS (
       |  SELECT doc_id, lang_guess, quality,
       |    ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
       |  FROM scored
       |)
       |SELECT doc_id, lang_guess, quality FROM survivors
       |WHERE $SurvivorGate""".stripMargin
  }

  /** Quality-threshold sensitivity sweep — the tuning table behind
    * [[corpusFilter]]'s shipped 0.4 cutoff: for thresholds
    * 0.30/0.35/…/0.55, how many docs pass (lang-gated, exact-dedup'd
    * exactly like the filter), their language mix, and the corpus
    * pass share in exact ppm. Scores come from the SAME
    * [[scoredCtes]] the filter reads (one copy), computed ONCE — the
    * sweep is one corpus scoring pass joined to a 6-row threshold
    * domain, never six filter runs (the dedup-threshold-sweep rule).
    * Each threshold is carried as the DOUBLE literal t·e-2 and the
    * compare is quality ≥ thr_q — at thr=40 that literal is the
    * identical double as [[SurvivorGate]]'s 4.0e-1, so the
    * shipped-threshold row equals the filter's survivor count
    * EXACTLY (a scaled quality·100 ≥ thr compare would not: the ×100
    * can round a one-ulp-below-0.4 quality up to exactly 40.0 and
    * overcount the row that exists to calibrate the gate). */
  def qualitySweep(d: Dialect): String = {
    val dom = domainRel("thr, thr_q", (30 to 55 by 5).map(t => s"$t, ${t}.0e-2"))
    s"""WITH ${scoredCtes(d, "documents")},
       |first_of_dup AS (
       |  SELECT doc_id, lang_guess, quality FROM (
       |    SELECT doc_id, lang_guess, quality,
       |      ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
       |    FROM scored
       |  ) WHERE rn = 1 AND lang_guess <> 'und'
       |),
       |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM scored),
       |dom AS ($dom)
       |SELECT dom.thr,
       |  CAST(SUM(CASE WHEN f.quality >= dom.thr_q THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
       |  CAST(SUM(CASE WHEN f.quality >= dom.thr_q AND f.lang_guess = 'en'
       |           THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
       |  CAST(SUM(CASE WHEN f.quality >= dom.thr_q AND f.lang_guess = 'id'
       |           THEN 1 ELSE 0 END) AS BIGINT) AS n_id,
       |  -- ppm is NULL (not ÷0) on an empty corpus: zero evidence,
       |  -- not a zero rate
       |  CASE WHEN MAX(n.total) = 0 THEN NULL ELSE ${d.idiv(
             "1000000 * CAST(SUM(CASE WHEN f.quality >= dom.thr_q THEN 1 ELSE 0 END) AS BIGINT)",
             "MAX(n.total)")} END AS pass_ppm
       |-- dom-driven LEFT JOIN (the acfRevenue absent-row rule): an
       |-- empty/fully-'und' corpus must emit all six threshold rows
       |-- with zero counts, not zero rows — a consumer iterating the
       |-- sweep reads absence as a parse error, zeros as evidence
       |FROM dom CROSS JOIN n LEFT JOIN first_of_dup f ON 1 = 1
       |GROUP BY dom.thr""".stripMargin
  }

  /** Autocorrelation of daily revenue at lags 1–7 — the
    * pre-forecasting diagnostic (is there weekly structure worth a
    * seasonal model, or is [[ewmaForecast]]'s level-only smoothing
    * right?): r_k over the day-indexed revenue series, computed from
    * EXACT integer-dollar moments (per-day cents floored to dollars —
    * both engines floor identically — keeps Σy² for a decade of days
    * inside int64 under the y ≤ 5e7 guard below (~3,650 days · 2.5e15
    * ≈ 9.1e18; a century would reach ~9.1e19 and wrap); cents would
    * wrap at ~2,400 days) and
    * assembled in one fixed double sequence, 6dp-quantized. The lag
    * join is an equi-join through a 7-row lag domain (days × 7 rows
    * — never a days² range join, the ewma rule); day cardinality is
    * calendar-bounded at any corpus scale. NULL when the series is
    * shorter than the lag or variance is zero. */
  def acfRevenue(d: Dialect): String = {
    val dom = domainRel("k", (1 to 7).map(_.toString))
    s"""WITH ${dailyDollarsCtes(d, "acf")},
       |mn AS (SELECT MIN(day) AS d0 FROM daily),
       |idx AS (
       |  -- CALENDAR index (day − first day), not ROW_NUMBER over
       |  -- days-with-orders: on a gappy series a row-number lag-7
       |  -- pair spans >7 calendar days and rotates through the week,
       |  -- smearing exactly the weekly structure this diagnostic
       |  -- exists to find; with the calendar index an absent day
       |  -- simply yields no pair at that lag
       |  SELECT day - d0 + 1 AS t, y FROM daily CROSS JOIN mn
       |),
       |m AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(y) AS BIGINT) AS sy,
       |    CAST(SUM(y * y) AS BIGINT) AS syy
       |  FROM idx
       |),
       |dom AS ($dom),
       |lagm AS (
       |  SELECT dm.k,
       |    CAST(COUNT(*) AS BIGINT) AS nk,
       |    CAST(SUM(a.y * b.y) AS BIGINT) AS sxy,
       |    CAST(SUM(a.y) AS BIGINT) AS sh,
       |    CAST(SUM(b.y) AS BIGINT) AS st
       |  FROM dom dm
       |  JOIN idx a ON a.t > dm.k
       |  JOIN idx b ON b.t = a.t - dm.k
       |  GROUP BY dm.k
       |)
       |-- dom LEFT JOIN lagm: a lag longer than the series (or with
       |-- every pair straddling a gap) must emit (lag, 0, NULL), not
       |-- silently vanish — a consumer iterating lags 1..7 reads
       |-- absence as a parse error, NULL as "no evidence"
       |SELECT dm.k AS lag, CAST(COALESCE(l.nk, 0) AS BIGINT) AS n_pairs,
       |  -- the variance guard runs in DOUBLE: n·syy and sy² each wrap
       |  -- int64 at fixture scale already (n·syy ≈ 9e20 at sf0.1)
       |  CASE WHEN CAST(m.syy AS DOUBLE) - CAST(m.sy AS DOUBLE) * m.sy / m.n <= 0.0e0
       |            OR l.nk IS NULL THEN NULL
       |       ELSE ${r6(
                 "(CAST(l.sxy AS DOUBLE) - CAST(m.sy AS DOUBLE) * (l.sh + l.st) / m.n " +
                 "+ CAST(l.nk AS DOUBLE) * m.sy * m.sy / (CAST(m.n AS DOUBLE) * m.n)) " +
                 "/ (CAST(m.syy AS DOUBLE) - CAST(m.sy AS DOUBLE) * m.sy / m.n)")}
       |  END AS acf
       |FROM dom dm LEFT JOIN lagm l ON l.k = dm.k CROSS JOIN m
       |ORDER BY lag""".stripMargin
  }

  /** Herfindahl–Hirschman concentration of revenue by nation — the
    * market-concentration screen (and, re-keyed on `source`, the
    * single-supplier-risk readout a data-mix policy watches): HHI =
    * Σ shareᵢ² over the per-nation revenue shares, plus the top
    * share. Shares derive from exact integer cents; each share² term
    * is quantized to an int64 picodecimal BEFORE the sum (Σ over
    * groups of raw doubles is order-dependent across engines — the
    * float-sum parity rule), so both engines add identical integers.
    * One fact-side aggregate, then nation-cardinality arithmetic. */
  def revenueHhi(d: Dialect): String =
    s"""WITH r AS (
       |  SELECT n_name,
       |    CAST(SUM(CAST(FLOOR(o_totalprice * 1.0e2 + 5.0e-1) AS BIGINT)) AS BIGINT) AS rev
       |  FROM orders
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation ON c_nationkey = n_nationkey
       |  GROUP BY n_name
       |),
       |t AS (SELECT n_name, rev, CAST(SUM(rev) OVER () AS BIGINT) AS tot FROM r),
       |q AS (
       |  SELECT rev, tot,
       |    CAST(FLOOR(CAST(rev AS DOUBLE) * rev / (CAST(tot AS DOUBLE) * tot)
       |      * 1.0e12 + 5.0e-1) AS BIGINT) AS qs
       |  FROM t
       |)
       |SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
       |  ${r6("CAST(SUM(qs) AS DOUBLE) / 1.0e12")} AS hhi,
       |  ${r6("CAST(MAX(rev) AS DOUBLE) / MAX(tot)")} AS top_share
       |FROM q""".stripMargin

  /** 7-day rolling MEDIAN of daily revenue — the robust trend line a
    * volume monitor plots next to the EWMA (a single spiked day moves
    * the mean for a week; the median shrugs it off). Same exact
    * integer-dollar day series as [[acfRevenue]]; the window is the
    * lag-domain equi-join (days × 7 rows, never a range self-join)
    * with the interpolated median per day — warm-up days report their
    * actual present count, so a consumer can gate on n_present = 7.
    * Day cardinality is calendar-bounded at any corpus scale. */
  def rollingMedianRevenue(d: Dialect): String = {
    val day = s"CAST(FLOOR(${d.epochSeconds("CAST(o_orderdate AS TIMESTAMP)")} / 86400.0e0) AS BIGINT)"
    val dom = domainRel("k", (0 to 6).map(_.toString))
    s"""WITH daily AS (
       |  SELECT $day AS day,
       |    ${d.idiv(
             "CAST(SUM(CAST(FLOOR(o_totalprice * 1.0e2 + 5.0e-1) AS BIGINT)) AS BIGINT)",
             "100")} AS y
       |  FROM orders GROUP BY $day
       |),
       |mn AS (SELECT MIN(day) AS d0 FROM daily),
       |idx AS (SELECT day - d0 + 1 AS t, y FROM daily CROSS JOIN mn),
       |dom AS ($dom),
       |w AS (
       |  SELECT a.t, b.y
       |  FROM idx a CROSS JOIN dom dm
       |  JOIN idx b ON b.t = a.t - dm.k
       |)
       |SELECT t AS day_index, CAST(COUNT(*) AS BIGINT) AS n_present,
       |  ${r6(d.percentileCont("y", "5.0e-1"))} AS rolling_median
       |FROM w GROUP BY t""".stripMargin
  }

  /** Gini coefficient of per-customer revenue — the inequality
    * readout (identically useful re-keyed as tokens-per-source for a
    * training-mix skew audit): G = (2·Σrᵢxᵢ − (n+1)·Σxᵢ)/(n·Σxᵢ)
    * with rᵢ the ascending value rank. The rank is computed WITHOUT a
    * global sort — the [[globalRowNumber]] decomposition applied to a
    * VALUE ordering: floor-log2 revenue buckets (≤ ~47, the
    * length(bin()) trick), per-bucket local ranks (parallel windows),
    * prefix offsets over the tiny bucket histogram, global rank =
    * offset + local rank. Ties share a value, so Σr·x is invariant
    * to intra-tie rank assignment and the (cents, custkey) tie-break
    * only pins determinism. Σr·x accumulates in DECIMAL(38,0) —
    * rank×cents sums reach n²·x̄/2, past int64 at real customer
    * counts (the labelSum precedent); the oracle runs the single
    * global-window form, proving the decomposition exact. */
  def revenueGini(d: Dialect): String =
    s"""WITH cust AS (
       |  SELECT o_custkey,
       |    CAST(SUM(CAST(FLOOR(o_totalprice * 1.0e2 + 5.0e-1) AS BIGINT)) AS BIGINT) AS cents
       |  FROM orders GROUP BY o_custkey
       |),
       |b AS (
       |  SELECT o_custkey, cents,
       |    CAST(length(bin(GREATEST(cents, 1))) AS BIGINT) AS bkt
       |  FROM cust
       |),
       |r AS (
       |  SELECT cents, bkt,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY bkt ORDER BY cents, o_custkey) AS BIGINT) AS lr
       |  FROM b
       |),
       |h AS (SELECT bkt, CAST(COUNT(*) AS BIGINT) AS c FROM b GROUP BY bkt),
       |osets AS (
       |  SELECT bkt,
       |    CAST(COALESCE(SUM(c) OVER (ORDER BY bkt
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off0
       |  FROM h
       |),
       |s AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(cents) AS BIGINT) AS t,
       |    SUM(CAST(r.lr + osets.off0 AS DECIMAL(38,0)) * cents) AS rx
       |  FROM r JOIN osets ON r.bkt = osets.bkt
       |)
       |SELECT n AS n_customers,
       |  CASE WHEN n = 0 OR t = 0 THEN NULL
       |       ELSE ${r6(
                 "(2.0e0 * CAST(rx AS DOUBLE) - (CAST(n AS DOUBLE) + 1.0e0) * t) " +
                 "/ (CAST(n AS DOUBLE) * t)")}
       |  END AS gini
       |FROM s""".stripMargin

  /** Degree assortativity of the minhash candidate graph — Pearson
    * correlation of endpoint degrees over the directed edge list
    * (both orientations, the standard Newman 2002 form): do heavily-
    * duplicated docs collide with other heavy hubs (assortative,
    * r > 0 — dup FARMS) or with leaves (dissortative, r < 0 — one
    * template fanning out)? All base moments are exact int64 sums
    * over the symmetric edge list; every DERIVED product (the
    * variance guard and the ratio) runs in DOUBLE, because the
    * binding envelope is Σdeg² squared — sx·sx wraps int64 once
    * Σdeg² exceeds ~3.04e9, which one ~55k-degree hub reaches while
    * sxx is still 9 orders inside int64; by symmetry the two
    * endpoint marginals coincide, so the readout also emits them
    * once. NULL when the degree variance is zero (a perfectly
    * regular graph has no assortativity to measure). */
  val graphAssortativity: StagedOp = StagedOp(
    stages = dedupMinhash.stages,
    body = { _ =>
      s"""WITH sym AS (
         |  SELECT doc_a AS u, doc_b AS v FROM mh_cand
         |  UNION ALL
         |  SELECT doc_b AS u, doc_a AS v FROM mh_cand
         |),
         |deg AS (SELECT u AS id, CAST(COUNT(*) AS BIGINT) AS dg FROM sym GROUP BY u),
         |ed AS (
         |  SELECT da.dg AS x, db.dg AS y
         |  FROM sym s JOIN deg da ON s.u = da.id JOIN deg db ON s.v = db.id
         |),
         |m AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(x) AS BIGINT) AS sx,
         |    CAST(SUM(x * x) AS BIGINT) AS sxx,
         |    CAST(SUM(x * y) AS BIGINT) AS sxy
         |  FROM ed
         |)
         |SELECT n AS n_directed_edges, sx AS sum_degree,
         |  -- the variance guard runs in DOUBLE (the acfRevenue rule):
         |  -- sx = Σdeg² over directed edges, so the int64 form sx·sx
         |  -- wraps once Σdeg² exceeds ~3.04e9 — a single ~55k-degree
         |  -- hub gets there long before sxx is anywhere near int64
         |  CASE WHEN CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n <= 0.0e0 THEN NULL
         |       ELSE ${r6(
                   "(CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) " +
                   "/ (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n)")}
         |  END AS assortativity
         |FROM m""".stripMargin
    })

  /** The per-doc ADDITIVE metric expressions of the dataset card, over
    * the card's sx(text, ntok, lang_guess, …) projection — ONE copy
    * shared by [[datasetCard]]'s fused aggregate and
    * [[datasetCardAdditive]] (the per-batch ingest-card delta), so the
    * rollup the streaming card sums can never drift from the datasheet
    * row it mirrors. Additive means: computed per doc and summed, so
    * the metric over a union of doc-DISJOINT slices equals the sum of
    * the per-slice values. Group-grain card rows (quality_pass_docs —
    * its [[SurvivorGate]] rn term needs the cross-corpus exact-dup
    * window —, dup counts, source spread, near-dup pairs) are NOT in
    * this list by construction. */
  private[ops] val CardAdditiveExprs: Seq[(String, String)] = Seq(
    // COALESCE: an EMPTY slice (an ingest batch that re-delivers only
    // already-counted docs) must emit zero rows' worth of zeros, not
    // NULLs — the repo's absent-row convention; both engines agree on
    // SUM-over-empty = NULL so the coalesce is cross-engine neutral
    "docs" -> "CAST(COUNT(*) AS BIGINT)",
    "tokens" -> "CAST(COALESCE(SUM(ntok), 0) AS BIGINT)",
    "chars" -> "CAST(COALESCE(SUM(CAST(length(text) AS BIGINT)), 0) AS BIGINT)",
    "lang_en_docs" -> "CAST(COALESCE(SUM(CASE WHEN lang_guess = 'en' THEN 1 ELSE 0 END), 0) AS BIGINT)",
    "lang_id_docs" -> "CAST(COALESCE(SUM(CASE WHEN lang_guess = 'id' THEN 1 ELSE 0 END), 0) AS BIGINT)",
    "lang_und_docs" -> "CAST(COALESCE(SUM(CASE WHEN lang_guess = 'und' THEN 1 ELSE 0 END), 0) AS BIGINT)")

  /** The ADDITIVE slice of [[datasetCard]]: the per-doc metric rows
    * (docs, tokens, chars, language mix, PII candidate occurrences)
    * over ANY (doc_id, text) relation. These are exactly the card rows
    * that sum over doc-disjoint slices — the streaming ingest card
    * ([[graft.streaming.StreamingOps]].ingestCard) runs this SQL
    * VERBATIM over each batch's newly-counted docs, and DailyIngestSpec
    * proves per-metric SUM over batches == this same SQL over the
    * replayed corpus. The scoring CTEs are [[scoredCtes]] (the gate's
    * one copy); PII occurrences come from the same
    * [[piiMatrixSql]]/[[piiOccSql]] renderers the staged [[piiScan]]
    * reads, inlined as CTEs because a bounded batch slice doesn't
    * warrant a staged artifact (distinct CTE names so the batch card's
    * staged pii_o view is never shadowed). */
  def datasetCardAdditive(d: Dialect, from: String = "documents"): String = {
    val adds = CardAdditiveExprs
      .map { case (m, e) => s"$e AS a_$m" }.mkString(",\n    ")
    val rows = CardAdditiveExprs.map(_._1).zipWithIndex.map { case (m, i) =>
      if (i == 0) s"SELECT '$m' AS metric, a_$m AS value FROM agg"
      else s"UNION ALL SELECT '$m', a_$m FROM agg"
    }.mkString("\n")
    s"""WITH ${scoredCtes(d, from)},
       |sx AS (SELECT text, CAST(${d.size("toks")} AS BIGINT) AS ntok, lang_guess
       |       FROM scored),
       |agg AS (
       |  SELECT $adds
       |  FROM sx
       |),
       |pii_mx AS (${piiMatrixSql(d, from)}),
       |pii_ox AS (${piiOccSql(d, "pii_mx")}),
       |pii AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM pii_ox)
       |$rows
       |UNION ALL SELECT 'pii_candidate_matches', n FROM pii""".stripMargin
  }

  /** The DATASET CARD — the one-page datasheet (Gebru et al. 2021)
    * a release ships next to [[releaseManifest]]: corpus size in
    * docs/tokens/chars, source spread and the hottest source's share,
    * language mix and quality-gate pass count (the [[corpusFilter]]
    * body nested VERBATIM — one copy of the gate), exact-duplicate
    * group/doc counts, near-dup candidate pairs (the staged mh_cand —
    * over the two-snapshot corpus, the dedup family's input
    * convention), and total PII CANDIDATE matches (the staged pii_o
    * pre-validation occurrence rows, named `pii_candidate_matches` so
    * they can't be read as Luhn/octet-confirmed PII — with the
    * two-snapshot doc count emitted as its OWN row,
    * so the pair count's denominator is in the card, not only in the
    * Scala source). One (metric, value) row per fact, all exact
    * int64. Spark INLINES CTEs (the StagedOp premise), so every
    * scored fact — size, language mix, quality pass, exact-dup
    * counts — folds into ONE aggregate over ONE scoring pass (an
    * earlier draft referenced the scoring subtree three times and
    * nested corpusFilter whole, tokenizing the corpus 3×); the
    * quality_pass_docs row applies [[SurvivorGate]] verbatim, the
    * exact-dup counts read off the same dedup window (groups = rn 2
    * rows, member docs = rn≥2 rows + their rn=1 representatives).
    * Only the column-pruned source histogram and the two staged
    * artifact counts scan anything else. (lazy: declared before
    * [[piiScan]] in source order — a strict val would NPE at object
    * init, the annDegreeHist precedent.) */
  lazy val datasetCard: StagedOp = StagedOp(
    stages = dedupMinhash.stages ++ piiScan.stages,
    body = { d =>
      val adds = CardAdditiveExprs
        .map { case (m, e) => s"$e AS a_$m" }.mkString(",\n    ")
      s"""WITH ${scoredCtes(d, "documents")},
         |sx AS (
         |  SELECT text, CAST(${d.size("toks")} AS BIGINT) AS ntok,
         |    lang_guess, quality,
         |    ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
         |  FROM scored
         |),
         |agg AS (
         |  SELECT $adds,
         |    CAST(SUM(CASE WHEN $SurvivorGate THEN 1 ELSE 0 END) AS BIGINT) AS q_pass,
         |    CAST(SUM(CASE WHEN rn = 2 THEN 1 ELSE 0 END) AS BIGINT) AS dup_groups,
         |    CAST(SUM(CASE WHEN rn >= 2 THEN 1 ELSE 0 END)
         |       + SUM(CASE WHEN rn = 2 THEN 1 ELSE 0 END) AS BIGINT) AS dup_docs
         |  FROM sx
         |),
         |src AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_sources,
         |    CAST(MAX(c) AS BIGINT) AS max_c, CAST(SUM(c) AS BIGINT) AS tot
         |  FROM (SELECT source, COUNT(*) AS c FROM documents GROUP BY source)
         |),
         |nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM mh_cand),
         |pii AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM pii_o)
         |SELECT 'docs' AS metric, a_docs AS value FROM agg
         |UNION ALL SELECT 'tokens', a_tokens FROM agg
         |UNION ALL SELECT 'chars', a_chars FROM agg
         |UNION ALL SELECT 'sources', n_sources FROM src
         |UNION ALL SELECT 'max_source_share_ppm', ${d.idiv("1000000 * max_c", "tot")} FROM src
         |UNION ALL SELECT 'lang_en_docs', a_lang_en_docs FROM agg
         |UNION ALL SELECT 'lang_id_docs', a_lang_id_docs FROM agg
         |UNION ALL SELECT 'lang_und_docs', a_lang_und_docs FROM agg
         |UNION ALL SELECT 'quality_pass_docs', q_pass FROM agg
         |UNION ALL SELECT 'exact_dup_groups', dup_groups FROM agg
         |UNION ALL SELECT 'exact_dup_docs', dup_docs FROM agg
         |UNION ALL SELECT 'neardup_candidate_pairs', n FROM nd
         |-- the pair count's own denominator: mh_cand is built over
         |-- the two-snapshot corpus (every doc appears twice), so a
         |-- rate computed against 'docs' would be inflated — the card
         |-- carries the correct denominator itself
         |UNION ALL SELECT 'neardup_corpus_docs', 2 * a_docs FROM agg
         |-- CANDIDATE matches: pii_o is the raw regex-occurrence set
         |-- (pre-validation — includes Luhn-invalid card candidates and
         |-- out-of-range octet runs); piiScan's n_valid column is the
         |-- confirmed count. Named so a card consumer cannot read the
         |-- scan's widest net as confirmed PII.
         |UNION ALL SELECT 'pii_candidate_matches', n FROM pii""".stripMargin
    })

  /** The RELEASE MANIFEST — the artifact a curation pipeline actually
    * ships: every [[corpusFilter]] survivor (its body nested VERBATIM,
    * one copy of the gate logic) with the columns a consumer needs to
    * load, verify and reproduce the release: language and quality
    * score, token count, a deterministic md5-ring shard (the
    * shuffleShards rule — every re-run and engine assigns the same
    * doc to the same output file), and the content hash of the
    * PII-REDACTED text ([[piiRedactExpr]] — the checksum certifies
    * what ships, not what was scraped; a post-release redaction
    * change is visible as a hash change). One join back to the
    * narrow text column; everything else rides the single filter
    * pass. */
  def releaseManifest(d: Dialect, from: String = "documents"): String =
    s"""WITH cf AS (SELECT * FROM (
       |${corpusFilter(d, from)}
       |)),
       |dt AS (SELECT doc_id, text, ${toks(d)} AS toks FROM $from)
       |SELECT cf.doc_id, cf.lang_guess,
       |  ${r6("cf.quality")} AS quality,
       |  CAST(${d.size("dt.toks")} AS BIGINT) AS n_tokens,
       |  ${md5Bucket("CAST(cf.doc_id AS STRING) || ':release'")} % 16 AS shard,
       |  md5(${piiRedactExpr("dt.text", d)}) AS content_hash
       |FROM cf JOIN dt ON dt.doc_id = cf.doc_id""".stripMargin

  /** Release-shard balance audit — the writer-side skew check a
    * release pipeline runs before shipping: per md5-ring shard of the
    * [[releaseManifest]] (its SQL nested verbatim — one copy), doc and
    * token counts with exact ppm shares. A hot shard here means the
    * hash ring is mis-keyed (or the corpus has degenerate content) and
    * one output file will dominate the write; the 16-shard literal
    * domain is LEFT JOINed so an EMPTY shard — the other failure —
    * emits its zero row instead of vanishing (the absent-row
    * convention). */
  def shardSkew(d: Dialect): String =
    s"""WITH rm AS (SELECT * FROM (
       |${releaseManifest(d)}
       |)),
       |per AS (
       |  SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
       |  FROM rm GROUP BY shard
       |),
       |t AS (
       |  SELECT CAST(SUM(n_docs) AS BIGINT) AS td,
       |    CAST(SUM(n_tokens) AS BIGINT) AS tt
       |  FROM per
       |),
       |dom AS (${domainRel("shard", (0 to 15).map(_.toString))})
       |SELECT dom.shard,
       |  CAST(COALESCE(p.n_docs, 0) AS BIGINT) AS n_docs,
       |  CAST(COALESCE(p.n_tokens, 0) AS BIGINT) AS n_tokens,
       |  ${d.idiv("1000000 * COALESCE(p.n_docs, 0)", "t.td")} AS doc_share_ppm,
       |  ${d.idiv("1000000 * COALESCE(p.n_tokens, 0)", "t.tt")} AS token_share_ppm
       |FROM dom LEFT JOIN per p ON p.shard = dom.shard
       |CROSS JOIN t""".stripMargin

  /** Shard-count change audit: how many documents MOVE when the
    * release ring grows 16 → 17 shards, under (a) modulo assignment
    * and (b) a consistent-hash ring (Karger et al. 1997) with 4
    * virtual nodes per shard — the capacity-planning question behind
    * every resharding decision, and the reason consistent hashing
    * exists: mod-N reassigns an expected (N−1)/N ≈ 94% of keys, the
    * ring only ~1/(N+1) ≈ 6%. Both strategies hash the SAME doc key
    * ([[md5Hex32]] — engine-portable hex arithmetic, no RNG); ring
    * lookup is "first vnode position ≥ key, wrapping", expressed as
    * ONE map-side-combinable aggregate over the doc × 68-vnode cross
    * join — the argmin is MIN(wrap-key·32 + shard) with the shard
    * decoded by % 32 (key < 2³³ so the encoding sits far inside
    * int64; ties at equal position resolve to the smaller shard,
    * deterministically), and both rings come out of the SAME pass
    * (the 16-shard ring is the 17-shard ring's shard < 16 slice —
    * MIN(CASE...) — so the shared vnodes provably keep their
    * positions). No window, no per-doc sort: one hash aggregate with
    * partial combine, which is the shape that survives 100 TB.
    * Expected-move ppm columns carry the closed-form prediction next
    * to the measurement. */
  def shardRebalance(d: Dialect): String = {
    val shardDom = domainRel("shard", (0 to 16).map(_.toString))
    val vnodeDom = domainRel("v", (0 until 4).map(_.toString))
    val wrapKey = "CASE WHEN r.pos >= d.p THEN r.pos ELSE r.pos + 4294967296 END"
    s"""WITH ring AS (
       |  SELECT s.shard, ${md5Hex32(
            "CONCAT('shard:', CAST(s.shard AS STRING), ':', CAST(v.v AS STRING))")} AS pos
       |  FROM ($shardDom) s CROSS JOIN ($vnodeDom) v
       |),
       |dpos AS (
       |  SELECT doc_id, ${md5Hex32("CAST(doc_id AS STRING)")} AS p FROM documents
       |),
       |asg AS (
       |  SELECT d.doc_id, d.p,
       |    MIN(CASE WHEN r.shard < 16 THEN ($wrapKey) * 32 + r.shard END) % 32 AS s16,
       |    MIN(($wrapKey) * 32 + r.shard) % 32 AS s17
       |  FROM dpos d CROSS JOIN ring r
       |  GROUP BY d.doc_id, d.p
       |),
       |agg AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS total,
       |    CAST(SUM(CASE WHEN p % 16 <> p % 17 THEN 1 ELSE 0 END) AS BIGINT) AS mod_moved,
       |    CAST(SUM(CASE WHEN s16 <> s17 THEN 1 ELSE 0 END) AS BIGINT) AS ring_moved
       |  FROM asg
       |)
       |SELECT 'mod' AS strategy, total AS total_docs, mod_moved AS moved_docs,
       |  ${d.idiv("1000000 * mod_moved", "total")} AS moved_ppm,
       |  ${d.idiv("1000000 * 16", "17")} AS expected_moved_ppm
       |FROM agg
       |UNION ALL
       |SELECT 'ring' AS strategy, total AS total_docs, ring_moved AS moved_docs,
       |  ${d.idiv("1000000 * ring_moved", "total")} AS moved_ppm,
       |  ${d.idiv("1000000", "17")} AS expected_moved_ppm
       |FROM agg
       |ORDER BY strategy""".stripMargin
  }

  /** The held-out "benchmark" slice of the documents table (by source)
    * and the shared decontamination fragments — single-sourced by
    * [[contamination]] and [[contaminationBloom]] so the two gates
    * cannot drift. */
  private[ops] val BenchSrcs = "('src0', 'src1', 'src2', 'src3', 'src4')"
  private[ops] def contaminationShingleCtes(d: Dialect): String =
    s"""${shinglesCtes(d, n = 3, from = "documents")},
       |srcd AS (SELECT sh.doc_id, documents.source, sh.s
       |         FROM sh JOIN documents ON sh.doc_id = documents.doc_id)""".stripMargin
  private[ops] def contaminationTail(cshView: String, bshView: String): String =
    s"""hits AS (
       |  SELECT c.doc_id, COUNT(*) AS shared
       |  FROM $cshView c JOIN $bshView b ON c.s = b.s
       |  GROUP BY c.doc_id
       |)
       |SELECT d.doc_id, COALESCE(h.shared, 0) AS shared_ngrams,
       |  COALESCE(h.shared, 0) >= 10 AS contaminated
       |FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
       |WHERE d.source NOT IN $BenchSrcs""".stripMargin

  /** N-gram NOVELTY of a held-out split against its training split —
    * the memorization-side sibling of decontamination (how much of
    * the eval text is literally present in training n-grams; the
    * audit behind "is the model reciting or generalizing" readouts):
    * corpus split into deterministic md5 halves, each test doc's
    * DISTINCT 4-grams probed against the train side's distinct 4-gram
    * index, rolled up per source as exact ppm novelty. Shape at
    * 100 TB: grams join on the 64-bit shingle fingerprint (Spark
    * side; DuckDB keeps strings — the count-equivalence the
    * shingleId contract proves), the train index is the one big
    * DISTINCT, and the probe is the same inverted-index equi-join as
    * the dedup family — with a bloom gate on the train side when the
    * index outgrows a shuffle (the contaminationBloom pattern,
    * result-invisible). Docs under 4 words have no 4-grams and drop
    * from both engines identically. The split is the deterministic
    * md5 half, NOT doc_id parity — the fixture assigns source =
    * f(doc_id mod), so a parity split would test only cross-source
    * novelty; the hash split puts every source on both sides. */
  def ngramNovelty(d: Dialect): String =
    s"""WITH ${shinglesCtes(d, n = 4, from = "documents")},
       |ids AS (SELECT doc_id, ${d.shingleId("s")} AS sid,
       |          ${md5Bucket("CAST(doc_id AS STRING)")} % 2 AS half
       |        FROM sh),
       |tr AS (SELECT DISTINCT sid FROM ids WHERE half = 0),
       |ted AS (SELECT DISTINCT doc_id, sid FROM ids WHERE half = 1),
       |pd AS (
       |  SELECT t.doc_id,
       |    CAST(COUNT(*) AS BIGINT) AS n_grams,
       |    CAST(SUM(CASE WHEN tr.sid IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
       |  FROM ted t LEFT JOIN tr ON t.sid = tr.sid
       |  GROUP BY t.doc_id
       |)
       |SELECT dd.source,
       |  CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(pd.n_grams) AS BIGINT) AS n_grams,
       |  CAST(SUM(pd.n_novel) AS BIGINT) AS n_novel,
       |  ${d.idiv("1000000 * CAST(SUM(pd.n_novel) AS BIGINT)",
                   "CAST(SUM(pd.n_grams) AS BIGINT)")} AS novelty_ppm
       |FROM pd JOIN documents dd ON pd.doc_id = dd.doc_id
       |GROUP BY dd.source""".stripMargin

  /** Benchmark decontamination: 3-gram overlap of each corpus document
    * against a held-out "benchmark" slice (sources src0-src4), via the
    * same inverted-index shape as the jaccard dedup — the benchmark
    * shingle set is DISTINCT'd (broadcast-sized at any realistic
    * benchmark size) and the corpus only ever joins against it. */
  def contamination(d: Dialect): String =
    s"""WITH ${contaminationShingleCtes(d)},
       |bsh AS (SELECT DISTINCT s FROM srcd WHERE source IN $BenchSrcs),
       |csh AS (SELECT DISTINCT doc_id, s FROM srcd WHERE source NOT IN $BenchSrcs),
       |${contaminationTail("csh", "bsh")}""".stripMargin

  /** Bloom-gated decontamination — the 100 TB shape of
    * [[contamination]]: the benchmark shingle set is folded into ONE
    * bloom-filter value (bloom_filter_agg, Spark's runtime-filter
    * sketch) and the corpus shingle index is prefiltered with
    * might_contain BEFORE the exact equi-join, so the shuffle carries
    * only probable hits (~fpp of the corpus index instead of all of
    * it). Bloom false positives are eliminated by the exact join that
    * follows — the gate is result-invisible, which is exactly what the
    * oracle asserts (DuckDB renders the ungated exact form; identical
    * rows prove it). Both index stages are materialized once, like the
    * other shared indexes. */
  val contaminationBloom: StagedOp = StagedOp(
    // the (doc, source, shingle) index is built ONCE and both slices
    // derive from the materialized stage — the 3-gram explode is the
    // expensive pass, and the old two-stage shape re-ran it per slice
    stages = Seq(
      "ctm_srcd" -> { d =>
        s"""WITH ${contaminationShingleCtes(d)}
           |SELECT doc_id, source, s FROM srcd""".stripMargin
      },
      "ctm_bsh" -> { _ =>
        s"SELECT DISTINCT s FROM ctm_srcd WHERE source IN $BenchSrcs"
      },
      "ctm_csh" -> { _ =>
        s"SELECT DISTINCT doc_id, s FROM ctm_srcd WHERE source NOT IN $BenchSrcs"
      }),
    body = { d =>
      s"""WITH ${d.bloomPrefilter("cshb", "ctm_csh", "ctm_bsh", "s")},
         |${contaminationTail("cshb", "ctm_bsh")}""".stripMargin
    })

  /** Per-source contamination rollup — WHICH upstream sources leak
    * the benchmark, not just which docs: the [[contamination]] tail
    * run over the SAME staged indexes ([[contaminationBloom]]'s
    * ctm_* artifacts — the 3-gram explode never re-runs), then one
    * groupBy on provenance. The table a pipeline acts on: a source
    * with a high contamination rate gets quarantined wholesale, not
    * filtered doc-by-doc. Rates are exact integer ratios. */
  val contaminationBySource: StagedOp = StagedOp(
    stages = contaminationBloom.stages,
    body = { d =>
      s"""WITH c AS (SELECT * FROM (
         |  WITH ${contaminationTail("ctm_csh", "ctm_bsh")}
         |)),
         |r AS (
         |  SELECT dd.source,
         |    CAST(COUNT(*) AS BIGINT) AS n_docs,
         |    CAST(SUM(CASE WHEN c.contaminated THEN 1 ELSE 0 END) AS BIGINT)
         |      AS n_contaminated,
         |    CAST(SUM(c.shared_ngrams) AS BIGINT) AS shared_total
         |  FROM c JOIN documents dd ON dd.doc_id = c.doc_id
         |  GROUP BY dd.source
         |)
         |SELECT source, n_docs, n_contaminated,
         |  ${r6("CAST(n_contaminated AS DOUBLE) / n_docs")} AS contamination_rate,
         |  shared_total
         |FROM r ORDER BY source""".stripMargin
    })

  /** Explicit grouping sets (beyond rollup/cube): status-only,
    * priority-only, and grand-total groups in one pass. Identical
    * syntax in both dialects. */
  def groupingSets(d: Dialect): String =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin

  /** Exact percentiles per event type. Interpolation is done over
    * integer cents so the midpoint arithmetic is exact in both engines
    * (double interpolation formulas differ in the last ulp). */
  def eventPercentiles(d: Dialect): String = {
    val cents = "CAST(FLOOR(value * 100 + 5.0e-1) AS BIGINT)"
    s"""SELECT event_type,
       |  ${d.percentileCont(cents, "5.0e-1")} / 1.0e2 AS p50,
       |  ${d.percentileCont(cents, "9.0e-1")} / 1.0e2 AS p90,
       |  COUNT(*) AS n
       |FROM events GROUP BY event_type""".stripMargin
  }

}
