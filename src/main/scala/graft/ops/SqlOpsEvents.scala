package graft.ops

/** Event-time analytics: sessionization, funnels, windows, changepoints, EWMA/MAD monitors, revenue series statistics.
  *
  * Split out of the single-file SqlOps (r11) as a PURE MOVE: member
  * order across the [[SqlOpsAll]] linearization equals the pre-split
  * declaration order, so val-initialization semantics are unchanged.
  * The self-type keeps every cross-domain reference compiling against
  * the same single [[SqlOps]] instance.
  */
trait SqlOpsEvents { this: SqlOpsAll =>

  // ---- event-time analytics ----

  /** Tumbling 5-minute window aggregation (batch form; the streaming
    * form with watermarks lives in graft.streaming). */
  def eventsTumbling(d: Dialect): String =
    s"""WITH e AS (SELECT ${d.epochSeconds("ts")} AS es, event_type, value FROM events)
       |SELECT es - es % 300 AS window_start, event_type,
       |  COUNT(*) AS n_events,
       |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
       |FROM e GROUP BY es - es % 300, event_type""".stripMargin

  /** Time-weighted average of an irregular series — the telemetry
    * integral (∫value·dt / ∫dt) a plain AVG gets wrong whenever
    * sampling is uneven: each observation holds its value until the
    * NEXT one (step interpolation), so it is weighted by its gap.
    * One LEAD window per (user, day) shard + one aggregate — no
    * self-join, same shuffle count as sessionize. Exactness: gaps in
    * whole seconds (≤ 86 400) × µ-quantized values keeps every product
    * and sum in int64 (≤ ~4.3e13 per term); the single final division
    * runs on exact integers in both engines, and a day whose events
    * all share one timestamp (zero total span) falls back to the
    * plain mean, exactly. LEAD order is (t, event_id) — the repo's
    * deterministic event order under timestamp ties. */
  def eventsTimeWeightedAvg(d: Dialect): String =
    s"""WITH e AS (
       |  SELECT user_id, event_id,
       |    CAST(FLOOR(${d.epochSeconds("ts")} / 86400.0e0) AS BIGINT) AS day,
       |    ${d.epochSeconds("ts")} AS t,
       |    CAST(FLOOR(value * 1.0e6 + 5.0e-1) AS BIGINT) AS qv
       |  FROM events
       |),
       |g AS (
       |  SELECT user_id, day, qv, t,
       |    LEAD(t) OVER (PARTITION BY user_id, day ORDER BY t, event_id) AS tn
       |  FROM e
       |),
       |a AS (
       |  SELECT user_id, day, COUNT(*) AS n_events,
       |    CAST(SUM(CASE WHEN tn IS NULL THEN 0 ELSE qv * (tn - t) END) AS BIGINT) AS num,
       |    CAST(SUM(CASE WHEN tn IS NULL THEN 0 ELSE tn - t END) AS BIGINT) AS den,
       |    CAST(SUM(qv) AS BIGINT) AS sq
       |  FROM g GROUP BY user_id, day
       |)
       |SELECT user_id, day, n_events,
       |  CASE WHEN den = 0
       |    THEN ${r6("CAST(sq AS DOUBLE) / n_events / 1.0e6")}
       |    ELSE ${r6("CAST(num AS DOUBLE) / den / 1.0e6")} END AS twa
       |FROM a""".stripMargin

  /** Kaplan-Meier survival curve for time-to-first-purchase, with
    * right censoring at each user's last observed activity — the
    * survival-analysis staple (retention, churn, time-to-convert
    * under incomplete observation). S(t) = Π(1 − dᵤ/nᵤ) is computed
    * as a µ-quantized log2 cumulative sum in int64 (the exact-sum
    * discipline; the product itself would underflow and double
    * products don't associate across engines) exponentiated once per
    * output row; a day where everyone remaining events drives S to
    * exactly 0 from there on (the log is undefined — handled by a
    * zero-flag window, not a sentinel). Scale shape: one user-level
    * groupBy (the only corpus-sized shuffle), then all windows run on
    * the day-cardinality aggregate — the changepoint rule. */
  def survivalKm(d: Dialect): String = {
    val qlogRatio =
      """CAST(FLOOR(log2(CAST(n_t - d_t AS DOUBLE) / CAST(n_t AS DOUBLE))
        |     * 1.0e6 + 5.0e-1) AS BIGINT)""".stripMargin
    s"""WITH e AS (
       |  SELECT user_id, ${d.idiv(d.epochSeconds("ts"), "86400")} AS day, event_type
       |  FROM events
       |),
       |u AS (
       |  SELECT user_id, MIN(day) AS d0, MAX(day) AS dlast,
       |    MIN(CASE WHEN event_type = 'purchase' THEN day END) AS dpur
       |  FROM e GROUP BY user_id
       |),
       |tu AS (
       |  SELECT CASE WHEN dpur IS NOT NULL THEN dpur - d0 ELSE dlast - d0 END AS t,
       |    CASE WHEN dpur IS NOT NULL THEN 1 ELSE 0 END AS ev
       |  FROM u
       |),
       |agg AS (
       |  SELECT t, CAST(SUM(ev) AS BIGINT) AS d_t,
       |    CAST(COUNT(*) AS BIGINT) AS leave_t
       |  FROM tu GROUP BY t
       |),
       |n0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n0 FROM tu),
       |risk AS (
       |  SELECT t, d_t, leave_t,
       |    n0 - COALESCE(CAST(SUM(leave_t) OVER (ORDER BY t
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS n_t
       |  FROM agg CROSS JOIN n0
       |),
       |terms AS (
       |  SELECT t, d_t, n_t,
       |    CASE WHEN d_t = 0 THEN 0
       |         WHEN n_t > d_t THEN $qlogRatio
       |         ELSE NULL END AS ql,
       |    CASE WHEN n_t = d_t AND d_t > 0 THEN 1 ELSE 0 END AS zero_here
       |  FROM risk
       |),
       |curve AS (
       |  SELECT t, d_t, n_t,
       |    CAST(SUM(ql) OVER (ORDER BY t) AS BIGINT) AS cum_ql,
       |    CAST(SUM(zero_here) OVER (ORDER BY t) AS BIGINT) AS zeroed
       |  FROM terms
       |)
       |SELECT t AS day_offset, n_t AS n_risk, d_t AS n_events,
       |  CASE WHEN zeroed > 0 THEN 0.0e0
       |       ELSE ${r6("pow(2.0e0, CAST(cum_ql AS DOUBLE) / 1.0e6)")}
       |  END AS survival
       |FROM curve""".stripMargin
  }

  /** Sessionization: 30-minute inactivity gap via lag + running sum. */
  def eventsSessionize(d: Dialect): String =
    s"""WITH e AS (SELECT user_id, event_id, ${d.epochMicros("ts")} AS us FROM events),
       |lagd AS (
       |  SELECT user_id, event_id, us,
       |    LAG(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev
       |  FROM e
       |),
       |flags AS (
       |  SELECT user_id, event_id, us,
       |    CASE WHEN prev IS NULL OR us - prev > 1800000000 THEN 1 ELSE 0 END AS new_s
       |  FROM lagd
       |),
       |sess AS (
       |  SELECT user_id, us,
       |    CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no
       |  FROM flags
       |)
       |SELECT user_id, session_no, COUNT(*) AS n_events,
       |  MIN(us) AS start_us, MAX(us) AS end_us
       |FROM sess GROUP BY user_id, session_no""".stripMargin

  /** Hopping (sliding) window counts: 10-minute windows every 5
    * minutes. Each event lands in exactly size/hop = 2 windows,
    * emitted by ONE scan + a 2-element explode (the union-of-shifted-
    * grids form scanned the fact table twice), then one
    * map-side-combinable groupBy. The 2× row duplication before the
    * partial aggregate is the textbook cost of hopping windows
    * (Flink/Structured Streaming pay exactly the same); the streaming
    * twin is [[graft.streaming.StreamingOps.hoppingCounts]]. */
  def eventsHopping(d: Dialect): String = {
    val e = s"SELECT ${d.epochSeconds("ts")} AS es, event_type, " +
      s"${d.seqArray("0", "1")} AS ks FROM events"
    s"""WITH w AS (${d.explode(e, "es, event_type", "ks", "k")})
       |SELECT es - es % 300 - k * 300 AS window_start, event_type,
       |  COUNT(*) AS n_events
       |FROM w GROUP BY es - es % 300 - k * 300, event_type""".stripMargin
  }

  /** URL canonicalization + dedup — the crawl-frontier normalization
    * every web-scale corpus runs BEFORE content dedup (the reference
    * scrapes listing URLs; a real frontier sees the same page under
    * scheme-case, www, trailing-slash, tracking-param-order and
    * fragment variants). Deterministic messy variants are synthesized
    * from `part` (no RNG), then canonicalized relationally: drop the
    * fragment, lowercase scheme+host, strip `www.`, strip the
    * trailing slash (except a bare "/"), drop `utm_*` tracking params
    * (substr-prefix test — `_` is a LIKE wildcard), and SORT the surviving
    * params — the canonical form groups all variants of a page. Every
    * step is a narrow string projection (codegen'd, no UDF); the one
    * shuffle is the final groupBy on the canonical key, exactly the
    * exact-dedup shape. Survivor = min id (keep-first). */
  def urlCanonical(d: Dialect): String = {
    // substr-prefix test, not LIKE: `_` is a LIKE wildcard and the
    // ESCAPE clause doesn't parse inside Spark's lambda bodies.
    // COALESCE: joining the EMPTY filtered list is '' in Spark but
    // NULL in DuckDB (the documented empty-array divergence class —
    // it silently nulled every no-query canonical URL).
    val params = s"COALESCE(${d.arrayJoin(
      d.arraySort(d.filter(d.split("qs", "&"),
        "x -> substr(x, 1, 4) <> 'utm_' AND x <> ''")), "&")}, '')"
    s"""WITH raw AS (
       |  SELECT p_partkey AS id,
       |    CASE WHEN p_partkey % 4 = 0 THEN 'https://'
       |         WHEN p_partkey % 4 = 1 THEN 'HTTPS://'
       |         WHEN p_partkey % 4 = 2 THEN 'https://WWW.'
       |         ELSE 'https://www.' END
       |    || 'rumah123.com/properti/p' || CAST(p_partkey % 571 AS VARCHAR(8))
       |    || CASE WHEN p_partkey % 5 = 0 THEN '/' ELSE '' END
       |    || CASE WHEN p_partkey % 3 = 0 THEN '?utm_source=mail&b=2&a=1'
       |            WHEN p_partkey % 3 = 1 THEN '?a=1&utm_campaign=x&b=2'
       |            ELSE '' END
       |    || CASE WHEN p_partkey % 7 = 0 THEN '#section' ELSE '' END AS url
       |  FROM part
       |),
       |nofrag AS (
       |  SELECT id, url,
       |    CASE WHEN instr(url, '#') > 0 THEN substr(url, 1, instr(url, '#') - 1)
       |         ELSE url END AS u1
       |  FROM raw
       |),
       |sp AS (
       |  SELECT id, url, lower(substr(u1, 1, instr(u1, '://') + 2)) AS sch,
       |    substr(u1, instr(u1, '://') + 3) AS rest
       |  FROM nofrag
       |),
       |hp AS (
       |  SELECT id, url, sch,
       |    lower(CASE WHEN instr(rest, '/') > 0
       |               THEN substr(rest, 1, instr(rest, '/') - 1) ELSE rest END) AS host,
       |    CASE WHEN instr(rest, '/') > 0 THEN substr(rest, instr(rest, '/')) ELSE '' END AS pathq
       |  FROM sp
       |),
       |h2 AS (
       |  SELECT id, url, sch,
       |    CASE WHEN host LIKE 'www.%' THEN substr(host, 5) ELSE host END AS host, pathq
       |  FROM hp
       |),
       |pq AS (
       |  SELECT id, url, sch, host,
       |    CASE WHEN instr(pathq, '?') > 0 THEN substr(pathq, 1, instr(pathq, '?') - 1)
       |         ELSE pathq END AS path,
       |    CASE WHEN instr(pathq, '?') > 0 THEN substr(pathq, instr(pathq, '?') + 1)
       |         ELSE '' END AS qs
       |  FROM h2
       |),
       |p2 AS (
       |  SELECT id, url, sch, host,
       |    CASE WHEN path <> '/' AND path LIKE '%/'
       |         THEN substr(path, 1, length(path) - 1) ELSE path END AS path, qs
       |  FROM pq
       |),
       |qp AS (
       |  SELECT id, url,
       |    sch || host || path ||
       |      CASE WHEN $params = '' THEN '' ELSE '?' || $params END AS canonical_url
       |  FROM p2
       |)
       |SELECT canonical_url,
       |  CAST(COUNT(*) AS BIGINT) AS n_raw,
       |  CAST(COUNT(DISTINCT url) AS BIGINT) AS n_raw_forms,
       |  MIN(id) AS keep_id
       |FROM qp GROUP BY canonical_url""".stripMargin
  }

  /** CDC apply: collapse an insert/update/delete change stream to the
    * final table state — the Debezium/change-data-feed materialization
    * step. The change stream is derived deterministically from orders
    * (every key gets an I; every 3rd an U; every 5th a D), the apply is
    * keep-latest-by-sequence then drop-deletes: ONE window over the
    * change stream partitioned by key (the SCD2/keep-first shape — at
    * 100 TB this is a single shuffle on the key, no iteration). Values
    * stay exact (DECIMAL arithmetic only). */
  def cdcApply(d: Dialect): String =
    s"""WITH changes AS (
       |  SELECT o_orderkey AS key, 1 AS seq, 'I' AS op, CAST(o_totalprice AS DECIMAL(18,2)) AS val FROM orders
       |  UNION ALL
       |  SELECT o_orderkey, 2, 'U', CAST(o_totalprice AS DECIMAL(18,2)) * 2 FROM orders WHERE o_orderkey % 3 = 0
       |  UNION ALL
       |  SELECT o_orderkey, 3, 'D', CAST(NULL AS DECIMAL(18,2)) FROM orders WHERE o_orderkey % 5 = 0
       |),
       |latest AS (
       |  SELECT key, seq, op, val,
       |    ROW_NUMBER() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
       |  FROM changes
       |)
       |SELECT key, CAST(val AS DOUBLE) AS val, seq AS last_seq
       |FROM latest WHERE rn = 1 AND op <> 'D'""".stripMargin

  /** Retraction-maintained aggregate — incremental view maintenance
    * over a before/after change feed (the Flink-retract / DBSP /
    * materialized-view delta shape, and [[cdcApply]]'s aggregate-level
    * sibling): every change row carries its before- and after-image
    * (Debezium's envelope), contributes signed deltas
    * (Δcount = [after≠NULL] − [before≠NULL], Δsum = after − before),
    * and the per-group aggregate is ONE map-side-combinable SUM of
    * deltas — no per-key window, no state lookup, exactly how a
    * streaming materialized view folds a 100 TB change log. The query
    * also computes the ground truth the long way (keep-latest per key,
    * then aggregate the live state) and asserts the maintenance
    * identity IN-ROW per group, so the oracle gate proves the
    * decomposition itself (the joinSizeAudit pattern). All money stays
    * DECIMAL until the output cast. */
  def aggRetract(d: Dialect): String = {
    val p = "CAST(o_totalprice AS DECIMAL(18,2))"
    s"""WITH changes AS (
       |  SELECT o_orderkey AS key, 1 AS seq,
       |    CAST(NULL AS DECIMAL(18,2)) AS before_val, $p AS after_val
       |  FROM orders
       |  UNION ALL
       |  SELECT o_orderkey, 2, $p, CAST($p * 2 AS DECIMAL(18,2))
       |  FROM orders WHERE o_orderkey % 3 = 0
       |  UNION ALL
       |  SELECT o_orderkey, 3,
       |    CASE WHEN o_orderkey % 3 = 0 THEN CAST($p * 2 AS DECIMAL(18,2)) ELSE $p END,
       |    CAST(NULL AS DECIMAL(18,2))
       |  FROM orders WHERE o_orderkey % 5 = 0
       |),
       |deltas AS (
       |  SELECT key % 100 AS grp,
       |    (CASE WHEN after_val IS NOT NULL THEN 1 ELSE 0 END)
       |      - (CASE WHEN before_val IS NOT NULL THEN 1 ELSE 0 END) AS dc,
       |    COALESCE(after_val, CAST(0 AS DECIMAL(18,2)))
       |      - COALESCE(before_val, CAST(0 AS DECIMAL(18,2))) AS ds
       |  FROM changes
       |),
       |maintained AS (
       |  SELECT grp, CAST(SUM(dc) AS BIGINT) AS n_live,
       |    CAST(SUM(ds) AS DECIMAL(28,2)) AS sum_live
       |  FROM deltas GROUP BY grp
       |),
       |latest AS (
       |  SELECT key, after_val AS val FROM (
       |    SELECT key, after_val,
       |      ROW_NUMBER() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
       |    FROM changes
       |  ) WHERE rn = 1
       |),
       |direct AS (
       |  SELECT key % 100 AS grp, CAST(COUNT(val) AS BIGINT) AS n_direct,
       |    CAST(COALESCE(SUM(val), CAST(0 AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS sum_direct
       |  FROM latest GROUP BY key % 100
       |)
       |SELECT m.grp, m.n_live, CAST(m.sum_live AS DOUBLE) AS sum_live,
       |  m.n_live = d.n_direct AS count_matches,
       |  m.sum_live = d.sum_direct AS sum_matches
       |FROM maintained m JOIN direct d ON m.grp = d.grp""".stripMargin
  }

  /** Per-user union of overlapping time intervals (total covered
    * seconds + merged-interval count) — the classic gaps-and-islands
    * reduction, the watch-time/dwell-time operator. Interval length is
    * a deterministic function of the event value (no RNG). One window
    * pass per user (running MAX of interval end over strictly preceding
    * rows marks island starts; a running SUM numbers islands), then two
    * grouped aggregates. At scale this is one shuffle on user_id and
    * in-partition sorts — no self-join, no per-second explode. The
    * window ORDER BY carries a full tiebreak (start, end, event_id) so
    * the result is deterministic under equal timestamps. */
  def intervalCoverage(d: Dialect): String =
    s"""WITH iv AS (
       |  SELECT user_id, event_id, ${d.epochSeconds("ts")} AS s,
       |    ${d.epochSeconds("ts")} + abs(CAST(FLOOR(value) AS BIGINT)) % 120 + 60 AS e
       |  FROM events
       |),
       |m AS (
       |  SELECT user_id, event_id, s, e,
       |    MAX(e) OVER (PARTITION BY user_id ORDER BY s, e, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
       |  FROM iv
       |),
       |isl AS (
       |  SELECT user_id, s, e,
       |    CAST(SUM(CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY user_id ORDER BY s, e, event_id
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS island
       |  FROM m
       |),
       |g AS (SELECT user_id, island, MIN(s) AS st, MAX(e) AS en
       |      FROM isl GROUP BY user_id, island)
       |SELECT user_id, CAST(SUM(en - st) AS BIGINT) AS covered_seconds,
       |  COUNT(*) AS n_intervals
       |FROM g GROUP BY user_id""".stripMargin

  /** Interval-OVERLAP join (two interval SETS, not point-in-interval
    * like the range join): per-day user activity spans joined against
    * per-day event-type spans, keeping overlapping pairs with their
    * exact overlap length. The scale shape is the equi-join on the
    * BUCKET key (day) with the overlap inequality applied after — a
    * hash join whose fan-out is bounded by per-bucket cardinality,
    * never a nested loop over the cross product; at finer granularity
    * the same plan uses multiple covering buckets per interval +
    * DISTINCT. Both span tables are aggregate-cardinality (users×days,
    * types×days) from one map-side-combined pass each; all arithmetic
    * is epoch-second int64. */
  def intervalOverlapJoin(d: Dialect): String = {
    val day = s"CAST(FLOOR(${d.epochSeconds("ts")} / 86400.0e0) AS BIGINT)"
    s"""WITH ua AS (
       |  SELECT user_id, $day AS day,
       |    MIN(${d.epochSeconds("ts")}) AS us, MAX(${d.epochSeconds("ts")}) AS ue
       |  FROM events GROUP BY user_id, $day
       |),
       |ta AS (
       |  SELECT event_type, $day AS day,
       |    MIN(${d.epochSeconds("ts")}) AS ts_s, MAX(${d.epochSeconds("ts")}) AS ts_e
       |  FROM events GROUP BY event_type, $day
       |)
       |SELECT u.user_id, t.event_type, u.day,
       |  CAST(LEAST(u.ue, t.ts_e) - GREATEST(u.us, t.ts_s) AS BIGINT) AS overlap_seconds
       |FROM ua u JOIN ta t
       |  ON u.day = t.day AND u.us <= t.ts_e AND t.ts_s <= u.ue
       |WHERE u.user_id % 20 = 0""".stripMargin
  }

  /** Changepoint detection by single binary segmentation over the
    * daily revenue series: for every candidate split day, score the
    * separation of left vs right segment means; report the argmax
    * split. Scored on the day-cardinality aggregate (the corpus is
    * touched once for the daily rollup), with running-sum windows
    * providing every candidate's left/right sums in one pass — no
    * per-candidate rescan. The score is the pooled-variance-free
    * |meanL − meanR| · sqrt(harmonic n) form (sufficient for argmax);
    * computed in doubles from exact integer cents, rounded to 6dp
    * BEFORE ranking and id-tiebroken, so both engines pick the same
    * day. */
  /** EWMA revenue forecast with one-step-ahead error — exponential
    * smoothing S_t = α·y_t + (1−α)·S_{t−1} expressed in CLOSED FORM
    * (the CUSUM rule: a per-row recursion can't window, its unrolled
    * sum can): S_t = Σ α(1−α)^(t−j)·y_j over a 60-lag horizon. The
    * dropped tail's weight (1−α)^61 ≈ 3.6e-10 is NOT sub-µ against a
    * large daily revenue (3e7 $ · 3.6e-10 ≈ $0.01) — the truncation
    * is safe because it IS the op's definition, shared identically by
    * both engines and the Scala oracle, not because it vanishes. The
    * 61 weights α(1−α)^k are FINITE DECIMALS (3·7^k/10^(k+1)) —
    * precomputed exactly in Scala as pico-scaled int64 literals and
    * inlined as a 61-row table, so NO transcendental ever runs in
    * either engine (a first attempt used pow(0.7, k): Java's and
    * DuckDB's pow differ in the last ulp, and after scaling by daily
    * revenue the µ-quantization straddled — transcendentals are NOT
    * IEEE-pinned across engines, unlike +·−·/·sqrt). The series is
    * whole-dollar daily revenue; each term is y·wqₖ/1e6 in pure int64
    * (headroom: y < 3e7 $/day at wq ≤ 3e11 — beyond that, drop a
    * digit of weight precision), and each day's sum is NORMALIZED by
    * its window's exact weight sum (an un-normalized truncated EWMA
    * under-forecasts for the first ~horizon days — the warm-up bias
    * flagged every early day in the anomaly gate's first test run;
    * normalizing makes S_t a true convex combination from day 1).
    * The int-ratio normalization runs in doubles on exact int64
    * operands — deterministic IEEE, no transcendental. The forecast
    * for day t is S_{t−1}
    * (one LAG over the day-cardinality curve); abs_err scores it
    * against the actual. Past the envelope both engines must fail the
    * SAME way — Spark would silently wrap where DuckDB errors — so a
    * guard CAST throws loudly in both. Scale shape: the daily rollup
    * is the one corpus-sized shuffle; the window is a pure EQUI-join
    * through the 61-row weight table (b.t = a.t − w.k — a range
    * self-join here plans a days×days nested loop before the lag
    * filter), days × 61 rows regardless of corpus size. */
  /** The EWMA chain's CTE prefix (daily rollup → weight table →
    * closed-form curve → LAG forecast, ending in
    * `f(day, y, ewma_q, fc_q)`) — ONE copy shared by
    * [[ewmaForecast]] (the curve readout) and [[anomalyEwma]] (the
    * residual gate), so the forecaster and its monitor cannot
    * drift. */
  private[ops] def ewmaCtes(d: Dialect): String = {
    val day = s"CAST(FLOOR(${d.epochSeconds("CAST(o_orderdate AS TIMESTAMP)")} / 86400.0e0) AS BIGINT)"
    // wq_k = round(α·(1−α)^k · 1e12), exact via BigDecimal; α and the
    // lookback are single-sourced in [[EwmaParams]] (shared with the
    // streaming admission gate)
    val wq = (0 to EwmaParams.Lookback).map { k =>
      (EwmaParams.Alpha * (BigDecimal(1) - EwmaParams.Alpha).pow(k)
        * BigDecimal(1000000000000L))
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLongExact
    }
    // one inline VALUES relation, not 61 UNION ALL one-row selects:
    // the union form cost ~122 plan nodes (Project + OneRowRelation per
    // weight) analyzed and optimized on EVERY run of every consumer —
    // VALUES parses to a single LocalRelation in Spark and a single
    // constant table in DuckDB (r14, guide §1.2 "per-task work" +
    // plan-size note in §3.3)
    val wtRows = wq.zipWithIndex
      .map { case (w, k) => s"($k, CAST($w AS BIGINT))" }
      .mkString(", ")
    s"""daily AS (
       |  SELECT $day AS day,
       |    ${d.idiv("CAST(SUM(CAST(FLOOR(o_totalprice * 1.0e2 + 5.0e-1) AS BIGINT)) AS BIGINT)", "100")} AS y
       |  FROM orders GROUP BY $day
       |),
       |idx AS (
       |  SELECT day, y, CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS t
       |  FROM daily
       |),
       |terms AS (
       |  SELECT a.t, a.day, a.y,
       |    ${d.idiv("b.yg * w.wq", "1000000")} AS q, w.wq
       |  FROM idx a
       |  CROSS JOIN (VALUES $wtRows) w(k, wq)
       |  JOIN (SELECT t, CASE WHEN y > 30000000
       |                       THEN CAST('ewma: daily revenue exceeds the int64 weight envelope — rescale wq' AS BIGINT)
       |                       ELSE y END AS yg
       |        FROM idx) b ON b.t = a.t - w.k
       |),
       |curve AS (
       |  SELECT t, day, y,
       |    CAST(FLOOR(CAST(CAST(SUM(q) AS BIGINT) AS DOUBLE) * 1.0e12
       |               / CAST(CAST(SUM(wq) AS BIGINT) AS DOUBLE) + 5.0e-1) AS BIGINT) AS ewma_q
       |  FROM terms GROUP BY t, day, y
       |),
       |f AS (
       |  SELECT day, y, ewma_q,
       |    LAG(ewma_q) OVER (ORDER BY t) AS fc_q
       |  FROM curve
       |)""".stripMargin
  }

  /** The finished smoother table `f` (day, y, ewma_q, fc_q — day
    * grain, ~2.4k rows at sf0.1) materialized ONCE as a stage: it has
    * THREE consumers (the curve readout below, [[forecastSkill]]'s
    * backtest, [[anomalyEwma]]'s residual gate), and the inlined-CTE
    * form re-ran the whole orders→daily→61-term chain — with `idx`
    * referenced twice, so the orders scan and the global ROW_NUMBER
    * ran TWICE — per consumer per run (~1.3 s steady each at sf0.1;
    * 12 Exchanges in each consumer's plan). The stage build is the
    * smoother's computation, so it is NOT prewarmed and
    * q_ewma_forecast is its stage OWNER (SparkEntry.stageOwners): the
    * build bills to the query that IS the smoother, the two monitors
    * read the day-grain parquet (r14, guide §2.4 — share one
    * exchange / materialize the common subtree). */
  private[ops] val ewmaFStage: (String, Dialect => String) =
    "ewma_f" -> { (d: Dialect) =>
      s"""WITH ${ewmaCtes(d)}
         |SELECT day, y, ewma_q, fc_q FROM f""".stripMargin
    }

  val ewmaForecast: StagedOp = StagedOp(
    stages = Seq(ewmaFStage),
    body = { d =>
      s"""SELECT day, y AS actual,
         |  ${r6("CAST(ewma_q AS DOUBLE) / 1.0e6")} AS ewma,
         |  ${r6("CAST(fc_q AS DOUBLE) / 1.0e6")} AS forecast,
         |  CASE WHEN fc_q IS NULL THEN NULL
         |       ELSE ${r6("CAST(ABS(y * 1000000 - fc_q) AS DOUBLE) / 1.0e6")}
         |  END AS abs_err
         |FROM ewma_f""".stripMargin
    })

  /** Forecast BACKTEST (rolling-origin skill score): every day's
    * one-step-ahead EWMA forecast in [[ewmaForecast]] already uses
    * only strictly-prior data (the lagged smoother), so the per-day
    * errors ARE an honest backtest — this readout aggregates them
    * against the naive lag-1 baseline every forecast evaluation
    * starts from: MAE(ewma), MAE(naive), and the skill score
    * 1 − MAE_ewma/MAE_naive (positive ⇔ the smoother beats
    * persistence; Hyndman's MASE idea with the same-series naive
    * denominator). Errors are exact int64 µ-sums over the shared
    * [[ewmaCtes]] chain — the estimator and its evaluation read ONE
    * rollup — and only the two final divisions are float, r6'd. Days
    * without both forecasts (the first) drop from both sums
    * symmetrically. */
  val forecastSkill: StagedOp = StagedOp(
    stages = Seq(ewmaFStage),
    body = { d =>
    s"""WITH e AS (
       |  SELECT y, fc_q,
       |    LAG(y) OVER (ORDER BY day) AS y_prev
       |  FROM ewma_f
       |),
       |s AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(ABS(y * 1000000 - fc_q)) AS BIGINT) AS ae_ewma,
       |    CAST(SUM(ABS(y - y_prev) * 1000000) AS BIGINT) AS ae_naive
       |  FROM e WHERE fc_q IS NOT NULL AND y_prev IS NOT NULL
       |)
       |SELECT n AS n_days,
       |  CASE WHEN n = 0 THEN NULL
       |       ELSE ${r6("CAST(ae_ewma AS DOUBLE) / 1.0e6 / n")} END AS mae_ewma,
       |  CASE WHEN n = 0 THEN NULL
       |       ELSE ${r6("CAST(ae_naive AS DOUBLE) / 1.0e6 / n")} END AS mae_naive,
       |  CASE WHEN n = 0 OR ae_naive = 0 THEN NULL
       |       ELSE ${r6("1.0e0 - CAST(ae_ewma AS DOUBLE) / ae_naive")} END AS skill
       |FROM s""".stripMargin
    })

  /** DESEASONALIZED anomaly gate — [[anomalyEwma]]'s calendar-aware
    * sibling: divide each day's revenue by its weekday's seasonal
    * index ([[seasonalityDow]]'s ratio, inlined as integer
    * arithmetic: y*µ = ⌊10⁶·y·n_dow / cents_dow⌋, the uniform tc/td
    * factor dropped because a constant scale cancels in the
    * |r − med| > k·MAD comparison), then flag days whose
    * deseasonalized value deviates from the median by > 3 robust
    * sigmas. A raw-value MAD gate flags every Saturday of a weekly
    * business; this one flags only days abnormal FOR THEIR WEEKDAY.
    * Envelope: 10⁶·y·n_dow ≤ 10⁶·5e7·522 ≈ 2.6e16 over a decade of
    * weekdays — three orders inside int64 at the same y ≤ 5e7 guard
    * acfRevenue uses (a century still fits). Robust statistics are
    * exact interpolated percentiles over int64 µ-values (the
    * anomalyMad discipline); day-cardinality input. */
  def anomalyDeseasonal(d: Dialect): String = {
    s"""WITH ${dailyDollarsCtes(d, "deseasonal")},
       |dw AS (SELECT day, (day + 4) % 7 AS dow, y FROM daily),
       |ix AS (
       |  SELECT dow, CAST(COUNT(*) AS BIGINT) AS nd,
       |    CAST(SUM(y) AS BIGINT) AS yd
       |  FROM dw GROUP BY dow
       |),
       |ds AS (
       |  SELECT w.day, w.y,
       |    CASE WHEN i.yd = 0 THEN NULL
       |         ELSE ${d.idiv("1000000 * w.y * i.nd", "i.yd")} END AS ymu
       |  FROM dw w JOIN ix i ON i.dow = w.dow
       |),
       |med AS (SELECT ${d.percentileCont("ymu", "5.0e-1")} AS med FROM ds),
       |mad AS (
       |  SELECT ${d.percentileCont("ABS(ymu - med)", "5.0e-1")} AS mad
       |  FROM ds CROSS JOIN med
       |)
       |SELECT day, y AS actual,
       |  ${r6("CAST(ymu AS DOUBLE) / 1.0e6")} AS deseasonalized,
       |  CASE WHEN ymu IS NULL THEN 0
       |       WHEN ABS(ymu - med) > ${graft.ops.EwmaParams.thresholdSql} THEN 1
       |       ELSE 0 END AS is_anomaly
       |FROM ds CROSS JOIN med CROSS JOIN mad""".stripMargin
  }

  /** Forecast-residual anomaly gate — the monitoring op the EWMA
    * exists for: flag days whose one-step-ahead residual deviates
    * from the residual MEDIAN by more than 3 robust sigmas
    * (1.4826·MAD — both robust statistics are exact interpolated
    * percentiles over int64 µ-residuals, so a genuine anomaly cannot
    * drag its own threshold the way a mean/stddev gate would; the
    * anomalyMad pattern applied to the forecast residual instead of
    * the raw value, which makes it trend- and season-aware to the
    * extent the smoother tracks them). Residuals are SIGNED — a
    * revenue collapse flags exactly like a spike. The MAD is floored
    * at 1 µ-unit: a perfectly regular series has MAD = 0, and an
    * unfloored threshold would then flag EVERY day whose residual
    * differs at all from the median. The residual table
    * is STAGED (three consumers: median, MAD, and the flag pass —
    * inlined CTEs would re-run the whole EWMA chain, orders scan
    * included, per reference); the two threshold scalars broadcast
    * back over the day-cardinality stage. */
  val anomalyEwma: StagedOp = StagedOp(
    // ewma_res now derives from the shared ewma_f stage (r14) instead
    // of re-running the whole smoother chain inside its own build —
    // with a warm ewma_f the residual table is a day-grain projection
    stages = Seq(ewmaFStage, "ewma_res" -> { (d: Dialect) =>
      s"""SELECT day, y, fc_q, y * 1000000 - fc_q AS r
         |FROM ewma_f WHERE fc_q IS NOT NULL""".stripMargin
    }),
    body = { d =>
      s"""WITH med AS (SELECT ${d.percentileCont("r", "5.0e-1")} AS med FROM ewma_res),
         |mad AS (
         |  SELECT ${d.percentileCont("ABS(r - med)", "5.0e-1")} AS mad
         |  FROM ewma_res CROSS JOIN med
         |)
         |SELECT day, y AS actual,
         |  ${r6("CAST(fc_q AS DOUBLE) / 1.0e6")} AS forecast,
         |  ${r6("CAST(r AS DOUBLE) / 1.0e6")} AS residual,
         |  CASE WHEN ABS(r - med) > ${EwmaParams.thresholdSql} THEN 1 ELSE 0 END AS is_anomaly
         |FROM ewma_res CROSS JOIN med CROSS JOIN mad""".stripMargin
    })

  def changepointRevenue(d: Dialect): String = {
    val day = s"CAST(FLOOR(${d.epochSeconds("CAST(o_orderdate AS TIMESTAMP)")} / 86400.0e0) AS BIGINT)"
    s"""WITH daily AS (
       |  SELECT $day AS day,
       |    CAST(SUM(CAST(FLOOR(o_totalprice * 1.0e2 + 5.0e-1) AS BIGINT)) AS BIGINT) AS cents
       |  FROM orders GROUP BY $day
       |),
       |w AS (
       |  SELECT day, cents,
       |    CAST(SUM(cents) OVER (ORDER BY day
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS lsum,
       |    CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS ln,
       |    CAST(SUM(cents) OVER () AS BIGINT) AS tsum,
       |    CAST(COUNT(*) OVER () AS BIGINT) AS tn
       |  FROM daily
       |),
       |scored AS (
       |  SELECT day,
       |    ${r6("""ABS(CAST(lsum AS DOUBLE) / ln - CAST(tsum - lsum AS DOUBLE) / (tn - ln))
       |      * sqrt(CAST(ln AS DOUBLE) * (tn - ln) / tn) / 1.0e2""")} AS score
       |  FROM w WHERE ln < tn
       |)
       |SELECT day AS split_day, score FROM scored
       |ORDER BY score DESC, day LIMIT 1""".stripMargin
  }

  /** User growth curve: first-seen day per user → daily new users →
    * running cumulative — the cumulative-distinct-over-time query,
    * computed without any distinct-over-window: one shuffle on user_id
    * (map-side-combinable MIN), one tiny day-cardinality aggregate,
    * and a running sum over the day table (window input is bounded by
    * the calendar, not the event volume). */
  def userGrowth(d: Dialect): String =
    s"""WITH e AS (
       |  SELECT user_id,
       |    CAST(FLOOR(${d.epochSeconds("ts")} / 86400.0) AS BIGINT) AS day
       |  FROM events
       |),
       |fs AS (SELECT user_id, MIN(day) AS first_day FROM e GROUP BY user_id),
       |dd AS (SELECT first_day AS day, COUNT(*) AS new_users FROM fs GROUP BY first_day)
       |SELECT day, new_users,
       |  CAST(SUM(new_users) OVER (ORDER BY day
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
       |FROM dd""".stripMargin

  /** Snapshot diff: classify every doc across two corpus snapshots as
    * added / removed / changed / unchanged — the ingest-audit step
    * between crawl generations. Old = docs surviving `% 7`, new = docs
    * surviving `% 5` with every 3rd's text perturbed (all
    * deterministic). ONE full outer join on the key comparing content
    * hashes — at 100 TB a single co-partitioned shuffle join; the md5
    * comparison means text never crosses the wire twice. */
  def snapshotDiff(d: Dialect): String =
    s"""WITH old_s AS (
       |  SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 7 <> 0
       |),
       |new_s AS (
       |  SELECT doc_id, md5(CASE WHEN doc_id % 3 = 0 THEN text || ' v2' ELSE text END) AS h
       |  FROM documents WHERE doc_id % 5 <> 0
       |),
       |cl AS (
       |  SELECT CASE
       |    WHEN o.doc_id IS NULL THEN 'added'
       |    WHEN n.doc_id IS NULL THEN 'removed'
       |    WHEN o.h <> n.h THEN 'changed'
       |    ELSE 'unchanged' END AS status
       |  FROM old_s o FULL JOIN new_s n ON o.doc_id = n.doc_id
       |)
       |SELECT status, COUNT(*) AS n_docs FROM cl GROUP BY status""".stripMargin

  /** Merkle-style range reconciliation between two corpus snapshots —
    * the anti-entropy shape (rsync, Cassandra repair, lakehouse
    * snapshot diff at fleet scale): each side collapses to 64 range
    * summaries (row count + order-independent content digest), and
    * only ranges whose summaries disagree are reported for descent /
    * re-sync. At 100 TB the exchange is 2×64 tiny rows instead of two
    * table scans' worth of hashes — the full-outer content compare
    * ([[snapshotDiff]]) then runs ONLY inside dirty ranges. The
    * digest is BIT_XOR of the 48-bit md5 prefix: commutative,
    * map-side combinable, no overflow at any cardinality. Snapshot B
    * deletes every 191st doc and perturbs every 193rd (~1% — sparse,
    * so clean ranges actually occur and the dirty set discriminates).
    * A count collision with differing content is caught by the
    * digest; a digest collision needs an adversarial 2⁻⁴⁸ xor
    * cancellation. */
  def merkleRanges(d: Dialect): String =
    s"""WITH a AS (
       |  SELECT doc_id, md5(text) AS h FROM documents
       |),
       |b AS (
       |  SELECT doc_id,
       |    md5(CASE WHEN doc_id % 193 = 0 THEN text || ' v2' ELSE text END) AS h
       |  FROM documents WHERE doc_id % 191 <> 0
       |),
       |da AS (
       |  SELECT doc_id % 64 AS rng, COUNT(*) AS c,
       |    BIT_XOR(${md5U48("h")}) AS dg
       |  FROM a GROUP BY doc_id % 64
       |),
       |db AS (
       |  SELECT doc_id % 64 AS rng, COUNT(*) AS c,
       |    BIT_XOR(${md5U48("h")}) AS dg
       |  FROM b GROUP BY doc_id % 64
       |)
       |SELECT COALESCE(da.rng, db.rng) AS rng,
       |  CAST(COALESCE(da.c, 0) AS BIGINT) AS n_old,
       |  CAST(COALESCE(db.c, 0) AS BIGINT) AS n_new
       |FROM da FULL JOIN db ON da.rng = db.rng
       |WHERE da.rng IS NULL OR db.rng IS NULL
       |   OR da.c <> db.c OR da.dg <> db.dg""".stripMargin

  /** Per-column data-quality profile of orders (row count, null count,
    * distinct count, min/max) — the Deequ/dbt-test profiling operator a
    * pipeline runs before trusting an ingest. One aggregate per column,
    * unioned: each is a map-side-combinable global aggregate (the
    * distinct counts are the only shuffles, one per column — at 100 TB
    * swap COUNT(DISTINCT) for approx_count_distinct per column when
    * exactness isn't required; [[Relational.approxDistinctParts]] is
    * that operator). Min/max are rendered to strings through
    * type-stable casts (DECIMAL for doubles, epoch seconds for
    * timestamps) so one schema fits every column.
    *
    * Two stages over one scan each, NOT one mixed aggregate: a string
    * MIN/MAX makes the aggregation buffer immutable, which knocks the
    * whole operator down from HashAggregate to SortAggregate — and in a
    * mixed plan that sorts the Expand-multiplied multi-distinct input
    * (rows × (columns+1), by a 7-column key, twice) instead of the raw
    * rows. Splitting keeps the distinct-count pass (long buffers) in
    * HashAggregate over the Expand, and the min/max pass (no Expand,
    * no grouping key → nothing to sort) over plain rows. Measured at
    * sf0.1: 4.7 s mixed → ~0.6 s split. */
  val profileOrders: StagedOp = {
    val asStr = (x: String) => s"CAST($x AS STRING)"
    val decStr = (x: String) => s"CAST(CAST($x AS DECIMAL(18,2)) AS STRING)"
    val cols: Seq[(String, Dialect => String => String)] = Seq(
      "o_orderkey" -> (_ => asStr), "o_custkey" -> (_ => asStr),
      "o_orderstatus" -> (_ => asStr), "o_totalprice" -> (_ => decStr),
      "o_orderdate" -> ((d: Dialect) => (x: String) =>
        s"CAST(${d.epochSeconds(s"CAST($x AS TIMESTAMP)")} AS STRING)"),
      "o_orderpriority" -> (_ => asStr))
    StagedOp(
      stages = Seq(
        // scan 1: row count, null counts, min/max — global aggregate,
        // no distinct → no Expand, no grouping key → no sort
        "prof_mm" -> { d =>
          val metrics = cols.map { case (c, mm) =>
            s"""  COUNT(*) - COUNT($c) AS nn_$c,
               |  ${mm(d)(s"MIN($c)")} AS mn_$c, ${mm(d)(s"MAX($c)")} AS mx_$c""".stripMargin
          }.mkString(",\n")
          s"SELECT COUNT(*) AS n_rows,\n$metrics\nFROM orders"
        },
        // scan 2: the distinct counts alone — Expand ×columns, but the
        // dedup level has an empty buffer and the count level a long
        // buffer, so both stay HashAggregate
        "prof_nd" -> { _ =>
          val metrics = cols.map { case (c, _) =>
            s"  COUNT(DISTINCT $c) AS nd_$c" }.mkString(",\n")
          s"SELECT\n$metrics\nFROM orders"
        }),
      body = { _ =>
        cols.map { case (c, _) =>
          s"""SELECT '$c' AS col, n_rows, nn_$c AS n_null, nd_$c AS n_distinct,
             |  mn_$c AS min_val, mx_$c AS max_val FROM prof_mm CROSS JOIN prof_nd""".stripMargin
        }.mkString("\nUNION ALL\n")
      })
  }

  /** The 100 TB profiling shape: per-column NDV WITHOUT the Expand
    * that [[profileOrders]]'s multi-distinct plans (Expand multiplies
    * the scan rows by the column count before aggregating — the one
    * operator shape the round-4 verdict flagged as not runnable at
    * scale). Each column gets its own column-pruned pass:
    *   - exact NDV as a two-phase distinct (partial map-side dedup →
    *     shuffle on the value → final count), the plan that scales
    *     linearly with ONE column's data, and
    *   - approx_count_distinct (HLL) next to it, the estimator a real
    *     profiler ships — per the q_hll_merge precedent only the
    *     in-query CONTRACT (|approx − exact| ≤ 10 %) crosses the
    *     comparator, never the engine-specific estimate itself. */
  def profileOrdersApprox(d: Dialect): String = {
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
    cols.map { c =>
      s"""SELECT '$c' AS col, ex.n_distinct,
         |  ABS(CAST(ap.approx_nd AS DOUBLE) - ex.n_distinct)
         |    <= 1.0e-1 * ex.n_distinct AS approx_ok
         |FROM (SELECT COUNT(*) AS n_distinct
         |      FROM (SELECT $c FROM orders GROUP BY $c) t) ex
         |CROSS JOIN (SELECT approx_count_distinct($c) AS approx_nd
         |            FROM orders) ap""".stripMargin
    }.mkString("\nUNION ALL\n")
  }

  /** Mann-Kendall trend TEST over daily revenue — the significance
    * companion to [[theilSenRevenue]]'s slope (the classic pairing:
    * Theil-Sen estimates the trend, Mann-Kendall decides whether one
    * exists): S = Σ_{i<j} sign(yⱼ − yᵢ) over the same day pairs, the
    * tie-corrected variance Var(S) = [n(n−1)(2n+5) − Σt(t−1)(2t+5)]/18
    * carried UN-divided as var18 (18 rarely divides it), and the
    * continuity-corrected z. The 5% verdict is an EXACT integer test:
    * z² > 1.96² ⟺ 180000·(|S|−1)² > 38416·var18 (10⁴·18 and 38416 are
    * the exact scalings of 1.96² = 38416/10⁴) — no float crosses the
    * decision. Int64 envelope: (|S|−1)² ≤ n⁴/4 meets the 180000 factor
    * at ~3500 days — the loud guard throws beyond (a decade fits with
    * margin). Pairs are calendar-bounded like the slope's. */
  def mannKendallRevenue(d: Dialect): String =
    s"""WITH ${dailyCentsCte(d)},
       |s AS (
       |  SELECT CAST(COALESCE(SUM(CASE WHEN b.cents > a.cents THEN 1
       |                                WHEN b.cents < a.cents THEN -1
       |                                ELSE 0 END), 0) AS BIGINT) AS s
       |  FROM daily a JOIN daily b ON b.day > a.day
       |),
       |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily),
       |ties AS (
       |  SELECT CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT) AS tt
       |  FROM (SELECT cents, CAST(COUNT(*) AS BIGINT) AS t FROM daily GROUP BY cents)
       |),
       |f AS (
       |  SELECT nn.n, s.s,
       |    CASE WHEN nn.n > 3500
       |      THEN CAST('mann-kendall: day count exceeds the int64 verdict envelope — rescale' AS BIGINT)
       |      ELSE nn.n * (nn.n - 1) * (2 * nn.n + 5) - ties.tt END AS var18
       |  FROM nn CROSS JOIN s CROSS JOIN ties
       |)
       |SELECT n AS n_days, CAST(s AS BIGINT) AS s_stat,
       |  CAST(var18 AS BIGINT) AS var18,
       |  CASE WHEN var18 <= 0 THEN NULL
       |       ELSE ${r6(
                 "(CAST(s AS DOUBLE) - CASE WHEN s > 0 THEN 1.0e0 WHEN s < 0 THEN -1.0e0 ELSE 0.0e0 END) " +
                 "/ SQRT(CAST(var18 AS DOUBLE) / 18.0e0)")}
       |  END AS z,
       |  CASE WHEN var18 <= 0 OR ABS(s) <= 1 THEN 0
       |       WHEN 180000 * (ABS(s) - 1) * (ABS(s) - 1) > 38416 * var18 THEN 1
       |       ELSE 0 END AS significant,
       |  CASE WHEN s > 0 THEN 'increasing' WHEN s < 0 THEN 'decreasing'
       |       ELSE 'none' END AS trend
       |FROM f""".stripMargin

  /** Approximate-percentile CONTRACT check over order totals — the
    * fourth approx-sketch class after HLL distinct, CMS frequency and
    * Misra-Gries top-k: exact P50/P90/P99 of integer cents via the
    * value-cardinality cumulative window (percentile_disc lower
    * semantics, no per-row global sort), next to each engine's own
    * percentile sketch ([[Dialect.approxPercentile]] — Greenwald-
    * Khanna on Spark, t-digest in DuckDB; DIFFERENT sketches, so only
    * the |approx − exact| ≤ max(5%, $1) boolean crosses the oracle
    * comparator, the approx_count_distinct rule). The exact rank test
    * cum·100 ≥ p·n is integer-only (ceil(p·n/100) without division).
    * Scale shape: one groupBy on cents (price cardinality), one
    * bounded window, one sketch aggregate. */
  def pricePercentileApprox(d: Dialect): String = {
    val ps = Seq(50, 90, 99)
    val apCols = ps.map(p =>
      s"${d.approxPercentile("cents", s"0.${if (p == 50) "5" else p}")} AS a$p")
      .mkString(",\n    ")
    val apCase = s"CASE ex.p ${ps.map(p => s"WHEN $p THEN a$p").mkString(" ")} END"
    s"""WITH oc AS (
       |  SELECT CAST(FLOOR(o_totalprice * 1.0e2 + 5.0e-1) AS BIGINT) AS cents
       |  FROM orders
       |),
       |cw AS (SELECT cents, CAST(COUNT(*) AS BIGINT) AS c FROM oc GROUP BY cents),
       |cc AS (
       |  SELECT cents, c,
       |    CAST(SUM(c) OVER (ORDER BY cents) AS BIGINT) AS cum,
       |    CAST(SUM(c) OVER () AS BIGINT) AS n
       |  FROM cw
       |),
       |dom AS (${domainRel("p", ps.map(_.toString))}),
       |ex AS (
       |  SELECT dm.p, CAST(MIN(cents) AS BIGINT) AS exact_cents
       |  FROM dom dm JOIN cc ON cc.cum * 100 >= dm.p * cc.n
       |  GROUP BY dm.p
       |),
       |ap AS (
       |  SELECT $apCols
       |  FROM oc
       |)
       |SELECT ex.p, ex.exact_cents,
       |  ABS(CAST($apCase AS DOUBLE) - exact_cents)
       |    <= GREATEST(5.0e-2 * exact_cents, 1.0e2) AS approx_ok
       |FROM ex CROSS JOIN ap""".stripMargin
  }

  /** Theil–Sen robust trend of daily revenue: the median over all day
    * pairs of (Δcents / Δdays), plus the matching median-residual
    * intercept — the outlier-proof alternative to [[trendByBrand]]'s
    * OLS (a single flash-sale day drags an OLS slope; the pairwise
    * median shrugs it off, the property MicroOracleSpec pins with a
    * planted outlier). Arithmetic is cross-engine exact end to end:
    * slopes are int64-cents / int64-days single IEEE divisions
    * (correctly rounded in both engines), the median picks VALUES at
    * ranks ⌊(n+1)/2⌋ / ⌈(n+1)/2⌉ (ties in ROW_NUMBER are harmless —
    * tied rows carry the same value), and the even-n average is one
    * addition + one halving. Scale shape: the pair set is CALENDAR-
    * bounded — d days make d(d−1)/2 pairs regardless of corpus size
    * (a decade ≈ 6.7M rows), so the global rank window runs over a
    * constant-bounded input, and the daily rollup is the only
    * corpus-scale pass. Empty/one-day series: scalar subqueries over
    * an empty median CTE yield NULL slope/intercept on the always-
    * emitted stats row (the absent-row convention). */
  /** Daily revenue in integer DOLLARS under the shared loud y ≤ 5e7
    * int64-moment envelope — ONE copy of the guarded rollup
    * (review-caught: acfRevenue, olsRevenue and anomalyDeseasonal
    * each carried a verbatim daily0/guard block whose envelope or
    * rounding could silently drift apart; now they all read THIS
    * series). Emits `daily0`/`daily`, ending in daily(day, y); `op`
    * names the thrower in the guard message. [[ewmaCtes]] keeps its
    * own tighter 3e7 guard — its envelope protects the 10¹²-scaled
    * weight products, a different bound. */
  private[ops] def dailyDollarsCtes(d: Dialect, op: String): String = {
    val day = s"CAST(FLOOR(${d.epochSeconds("CAST(o_orderdate AS TIMESTAMP)")} / 86400.0e0) AS BIGINT)"
    s"""daily0 AS (
       |  SELECT $day AS day,
       |    ${d.idiv(
             "CAST(SUM(CAST(FLOOR(o_totalprice * 1.0e2 + 5.0e-1) AS BIGINT)) AS BIGINT)",
             "100")} AS y
       |  FROM orders GROUP BY $day
       |),
       |daily AS (
       |  SELECT day, CASE WHEN y > 50000000
       |    THEN CAST('$op: daily revenue exceeds the int64 moment envelope — rescale y' AS BIGINT)
       |    ELSE y END AS y
       |  FROM daily0
       |)""".stripMargin
  }

  /** Daily revenue in integer cents, keyed by the calendar day index —
    * ONE copy of the rollup shared by [[theilSenRevenue]] (the robust
    * slope) and [[mannKendallRevenue]] (the trend significance test),
    * so the estimator and its test can never disagree on the series
    * they describe. */
  private[ops] def dailyCentsCte(d: Dialect): String = {
    val day = s"CAST(FLOOR(${d.epochSeconds("CAST(o_orderdate AS TIMESTAMP)")} / 86400.0e0) AS BIGINT)"
    s"""daily AS (
       |  SELECT $day AS day,
       |    CAST(SUM(CAST(FLOOR(o_totalprice * 1.0e2 + 5.0e-1) AS BIGINT)) AS BIGINT) AS cents
       |  FROM orders GROUP BY $day
       |)""".stripMargin
  }

  /** Stationary distribution of the session-transition Markov chain —
    * eventTransitions gives the per-step matrix; this gives where the
    * chain SETTLES (the long-run share of attention per event type, a
    * product-analytics staple). Three power iterations π ← πP over
    * the STAGED transition counts (the matrix build is the corpus
    * pass; the iteration runs at event-type² cardinality, so staging
    * keeps CTE inlining from re-running the corpus window per round —
    * the pagerankIter discipline without damping): contributions
    * ⌊π(i)·n(i,j) / rowsum(i)⌋ are exact int64 with the FLOOR sitting
    * ≥ 1/rowsum from the next integer, so both engines produce
    * bit-identical ppm vectors at every depth. π is seeded UNIFORM at
    * ⌊10⁶/#states⌋ so the vector is an honest ppm distribution (sums
    * to ≤ 10⁶; review-caught — the old per-state 10⁶ seed summed to
    * #states·10⁶ while the docstring sold a share). Mass leaks at
    * most #states µ per round to the floors — a readout bias, never
    * an engine divergence. Total mass ≤ 10⁶ keeps π·n ≤ 10⁶·max(n),
    * loud-guarded at 9.2e12 transitions per cell (the CASE-throw
    * envelope discipline). States are prev ∪ next so a sink type
    * still emits its row. SINK states (types with no outgoing
    * transitions) are completed with a SELF-LOOP: each round, mass
    * sitting on a state with no rs row carries forward unchanged (the
    * standard absorbing completion — without it the transition JOIN
    * silently DISCARDS a sink's accumulated mass and the vector
    * decays toward whatever escapes the sinks, which is not the
    * stationary distribution of any completion of the chain). π is
    * therefore the power-iterate of the self-loop-completed stochastic
    * matrix, an honest ppm distribution at every depth. */
  val markovStationary: StagedOp = StagedOp(
    stages = Seq(
      "mkv_tc" -> { (_: Dialect) =>
        s"""WITH s AS (
           |  SELECT user_id, event_type,
           |    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
           |  FROM events
           |)
           |SELECT prev, event_type AS next, CAST(COUNT(*) AS BIGINT) AS n
           |FROM s WHERE prev IS NOT NULL GROUP BY prev, event_type""".stripMargin
      }),
    body = { dd =>
      s"""WITH ${markovPiCtes(dd)}
         |SELECT s.state AS event_type,
         |  CAST(COALESCE(r.tot, 0) AS BIGINT) AS n_outgoing,
         |  CAST(COALESCE(p.pi, 0) AS BIGINT) AS pi_ppm
         |FROM states s
         |LEFT JOIN p$MarkovSteps p ON p.state = s.state
         |LEFT JOIN rs r ON r.prev = s.state
         |ORDER BY event_type""".stripMargin
    })

  private[ops] val MarkovSteps = 3

  /** The π power-iteration CTE chain (rs → states → p0 … p3) shared
    * by [[markovStationary]] and [[markovEntropyRate]] — ONE copy of
    * the seed, the envelope guard, the per-round floor arithmetic,
    * and the self-loop sink completion, so the stationary readout and
    * the entropy rate weighted by it can never disagree on what π
    * is. Ends at p$MarkovSteps. */
  private[ops] def markovPiCtes(dd: Dialect): String = {
    val steps = (1 to MarkovSteps).map { k =>
      // two arms per round: mass flowing along transitions, plus the
      // self-loop arm holding a sink state's mass in place (a state
      // with no rs row has nowhere to send — dropping it, as the
      // plain JOIN would, leaks its whole accumulated pi)
      s"""p$k AS (
         |  SELECT state, CAST(SUM(pi) AS BIGINT) AS pi FROM (
         |    SELECT t.next AS state,
         |      CAST(FLOOR(CAST(r.pi * t.n AS DOUBLE) / rs.tot) AS BIGINT) AS pi
         |    FROM mkv_tc t
         |    JOIN p${k - 1} r ON r.state = t.prev
         |    JOIN rs ON rs.prev = t.prev
         |    UNION ALL
         |    SELECT r.state, r.pi
         |    FROM p${k - 1} r LEFT JOIN rs ON rs.prev = r.state
         |    WHERE rs.prev IS NULL
         |  ) u GROUP BY state
         |)""".stripMargin
    }.mkString(",\n")
    s"""rs AS (SELECT prev, CAST(SUM(n) AS BIGINT) AS tot FROM mkv_tc GROUP BY prev),
       |states AS (
       |  SELECT prev AS state FROM mkv_tc
       |  UNION
       |  SELECT next AS state FROM mkv_tc
       |),
       |p0 AS (
       |  SELECT state,
       |    CASE WHEN (SELECT MAX(n) FROM mkv_tc) > 9200000000000
       |      THEN CAST('markov: transition count exceeds the int64 pi*n envelope' AS BIGINT)
       |      ELSE ${dd.idiv("1000000", "(SELECT COUNT(*) FROM states)")}
       |    END AS pi
       |  FROM states
       |),
       |$steps""".stripMargin
  }

  /** ENTROPY RATE of the session-transition chain — how many bits of
    * surprise each user step carries once the chain has settled:
    * H = Σᵢ πᵢ·Hᵢ with Hᵢ = Σⱼ pᵢⱼ·log2(1/pᵢⱼ) the per-state
    * conditional entropy, π the [[markovStationary]] vector (the one
    * shared [[markovPiCtes]] chain — the estimator and its weights
    * cannot drift). The engagement-diversity readout next to the
    * stationary SHARE: a corpus can concentrate its mass on one event
    * type (π) yet still be unpredictable step-to-step (H), and this
    * is the number that says which. Arithmetic: log2 terms are the
    * µ-quantized [[qlog2]] int64s (log2 pᵢⱼ = qlog2(n) − qlog2(tot));
    * each (prev,next) term nᵢⱼ·(qlog2 tot − qlog2 n)/tot is FLOOR'd
    * to int64 µ-bits before the per-state sum, and each πᵢ·Hᵢ/10⁶
    * likewise before the final sum — every cross-row SUM is int64
    * (the float-sum parity rule), with ≤ (#cells + #states) µ of
    * floor bias, the markov readout convention. Sink states (no rs
    * row) contribute exactly 0 — their self-loop completion is
    * deterministic, H_sink = 0 — which the inner JOIN encodes by
    * omission. Per-state rows emitted (cond_entropy ranks the
    * unpredictable states); the rate itself rides every row (the
    * single-readout-per-row convention for multi-grain reports). */
  val markovEntropyRate: StagedOp = StagedOp(
    stages = markovStationary.stages,
    body = { dd =>
      s"""WITH ${markovPiCtes(dd)},
         |hrow AS (
         |  SELECT t.prev AS state,
         |    CAST(SUM(CAST(FLOOR(
         |      CAST(t.n AS DOUBLE) * (${qlog2("rs.tot")} - ${qlog2("t.n")}) / rs.tot
         |    ) AS BIGINT)) AS BIGINT) AS h_mu
         |  FROM mkv_tc t JOIN rs ON rs.prev = t.prev
         |  GROUP BY t.prev
         |),
         |j AS (
         |  -- p$MarkovSteps consumed ONCE: a second reference (a
         |  -- separate scalar hr CTE) re-ran the whole $MarkovSteps-round
         |  -- chain under Spark CTE inlining; the rate is instead an
         |  -- unpartitioned window over the state-cardinality rows
         |  -- (bounded by the event-type domain at any corpus scale)
         |  SELECT h.state, CAST(COALESCE(p.pi, 0) AS BIGINT) AS pi,
         |    h.h_mu,
         |    CAST(FLOOR(CAST(COALESCE(p.pi, 0) AS DOUBLE) * h.h_mu / 1000000) AS BIGINT) AS contrib
         |  FROM hrow h LEFT JOIN p$MarkovSteps p ON p.state = h.state
         |)
         |SELECT state AS event_type,
         |  CAST(pi AS BIGINT) AS pi_ppm,
         |  CAST(h_mu AS BIGINT) AS cond_entropy_mu,
         |  CAST(SUM(contrib) OVER () AS BIGINT) AS entropy_rate_mu,
         |  ${r6("CAST(SUM(contrib) OVER () AS DOUBLE) / 1.0e6")} AS entropy_rate_bits
         |FROM j
         |ORDER BY event_type""".stripMargin
    })

  /** WAU/MAU engagement stickiness — the product-analytics ratio
    * "what fraction of the month's users show up in any given week":
    * per (week, month) CELL (epoch-day DIV 7 week keys — pure integer,
    * no engine week-of-year semantics), the distinct in-month weekly
    * actives over the distinct actives of that calendar month. The
    * grain is the cell, not the week: a month-straddling week
    * contributes one row per month it touches, each ratio'd against
    * its OWN month's MAU — attributing the whole week to one month
    * would count users the denominator month never saw and push the
    * ratio past 10⁶ (review-caught; the micro-oracle now plants a
    * straddling week). Cell actives ⊆ month actives by construction,
    * so stickiness_ppm ≤ 10⁶ always. Both distincts are two-phase
    * (map-side dedup on (period, user) → count — never a
    * distinct-over-window), joined at cell grain. */
  def dauMauStickiness(d: Dialect): String = {
    val day = s"CAST(FLOOR(${d.epochSeconds("ts")} / 86400.0e0) AS BIGINT)"
    val month = "CAST(EXTRACT(YEAR FROM ts) AS INT) * 12 + CAST(EXTRACT(MONTH FROM ts) AS INT) - 1"
    s"""WITH e AS (
       |  SELECT user_id, ${d.idiv(day, "7")} AS wk, $month AS mth FROM events
       |),
       |wau AS (
       |  SELECT wk, mth, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau
       |  FROM e GROUP BY wk, mth
       |),
       |mau AS (
       |  SELECT mth, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS mau
       |  FROM e GROUP BY mth
       |)
       |SELECT w.wk AS week, CAST(w.mth AS INT) AS month_key, w.wau, m.mau,
       |  ${d.idiv("1000000 * w.wau", "m.mau")} AS stickiness_ppm
       |FROM wau w JOIN mau m ON m.mth = w.mth
       |ORDER BY week, month_key""".stripMargin
  }

  /** SEASONAL STRENGTH (Hyndman's F_s = max(0, 1 − Var(remainder) /
    * Var(raw))) of the weekly pattern in daily revenue — the one
    * number that says whether [[seasonalityDow]]'s index is worth
    * applying and [[anomalyDeseasonal]]'s gate is worth running:
    * F_s → 0 means the weekday means explain nothing, → 1 a pure
    * weekly series. The remainder is the day's deviation from its
    * weekday MEAN (the within-group variance — decomposition
    * identity: Var(raw) = Var(weekday means) + Var(remainder), so
    * this is also the R² of the weekday-dummies regression).
    * Integer-exact: both variances come from int64 moments over the
    * shared [[dailyDollarsCtes]] series (Σy² rides the same decade
    * envelope as the OLS), with the within-group sum decomposed as
    * Σy² − Σ_g (Σ_g y)²/n_g. Each per-group term (Σ_g y)²/n_g is two
    * correctly-rounded IEEE ops on exact int64 inputs (deterministic
    * per row), then ROUNDED TO INT64 before the 7-term SUM — a plain
    * double SUM's order is not guaranteed across partitions/engines
    * (the float-sum parity rule ljungBox follows); the int64 sum is
    * exact and order-free. Unit quantization is ample: the term is
    * bounded by (Σy)²/n ≪ 2⁶³ under the dailyDollars envelope and the
    * ≤ 7-unit rounding slack is 1e-17 relative against it. Final
    * ratio r6'd; NULL when the series is constant. */
  def seasonalStrength(d: Dialect): String =
    s"""WITH ${dailyDollarsCtes(d, "seasonal-strength")},
       |dw AS (SELECT (day + 4) % 7 AS dow, y FROM daily),
       |g AS (
       |  SELECT dow, CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(y) AS BIGINT) AS sy
       |  FROM dw GROUP BY dow
       |),
       |t AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(y) AS BIGINT) AS sy,
       |    CAST(SUM(y * y) AS BIGINT) AS syy
       |  FROM dw
       |),
       |b AS (
       |  SELECT CAST(COALESCE(SUM(
       |    CAST(FLOOR(CAST(g.sy AS DOUBLE) * g.sy / g.n + 5.0e-1) AS BIGINT)
       |  ), 0) AS BIGINT) AS bg
       |  FROM g
       |)
       |SELECT t.n AS n_days,
       |  CASE WHEN t.n < 2 OR CAST(t.syy AS DOUBLE) - CAST(t.sy AS DOUBLE) * t.sy / t.n <= 0.0e0
       |       THEN NULL
       |       ELSE ${r6(
                 // LEAST: the half-up per-group rounding of bg can
                 // overshoot SSW=0 by up to 3.5 units and push the
                 // variance fraction marginally past 1 on tiny SST
                 "LEAST(1.0e0, GREATEST(0.0e0, 1.0e0 - " +
                 "(CAST(t.syy AS DOUBLE) - CAST(b.bg AS DOUBLE)) " +
                 "/ (CAST(t.syy AS DOUBLE) - CAST(t.sy AS DOUBLE) * t.sy / t.n)))")}
       |  END AS seasonal_strength
       |FROM t CROSS JOIN b""".stripMargin

  /** Ljung-Box whiteness test over the first 7 revenue
    * autocorrelations — "is there ANY serial structure left?", the
    * portmanteau companion to [[graft.ops.SqlOpsText]]'s per-lag ACF:
    * Q = n(n+2)·Σ_{k≤7} r_k²/(n−k), compared against the χ²₇ 5%
    * critical value 14.067 (an exact literal — inverse-χ² is
    * engine-specific, the power-analysis z rule). The r_k are the
    * ACF query's OWN rows, its SQL nested verbatim (the shardSkew
    * one-copy precedent) — the test and the diagnostic it summarizes
    * cannot disagree. r_k arrive r6-quantized; each term
    * r_k²/(n−k) is p12-quantized to int64 BEFORE the sum (a 7-term
    * double SUM is order-dependent across engines — the float-sum
    * parity rule), so Q is exact integer arithmetic finished by one
    * fixed double sequence, r6'd. Lags with NULL acf (longer than
    * the series) drop from the sum — n_lags_used makes that
    * visible. */
  def ljungBox(d: Dialect): String =
    s"""WITH acf AS (SELECT * FROM (
       |${graft.ops.SqlOps.acfRevenue(d)}
       |)),
       |${dailyDollarsCtes(d, "ljung-box")},
       |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily),
       |q AS (
       |  SELECT CAST(COUNT(acf) AS BIGINT) AS n_lags_used,
       |    CAST(COALESCE(SUM(
       |      CAST(FLOOR(acf * acf / (nn.n - lag) * 1.0e12 + 5.0e-1) AS BIGINT)
       |    ), 0) AS BIGINT) AS sq
       |  FROM acf CROSS JOIN nn
       |  GROUP BY nn.n
       |)
       |SELECT nn.n AS n_days, q.n_lags_used,
       |  CASE WHEN nn.n < 9 THEN NULL
       |       ELSE ${r6("CAST(nn.n AS DOUBLE) * (nn.n + 2) * q.sq / 1.0e12")} END AS lb_q,
       |  CASE WHEN nn.n < 9 THEN 0
       |       WHEN CAST(nn.n AS DOUBLE) * (nn.n + 2) * q.sq / 1.0e12 > 1.4067e1 THEN 1
       |       ELSE 0 END AS reject_white_noise
       |FROM q CROSS JOIN nn""".stripMargin

  /** A/B test POWER ANALYSIS — the planning companion to the ab-test
    * readout: given the corpus's observed view→purchase conversion as
    * the baseline p₁ and a 10% relative minimum detectable effect,
    * the required per-arm sample size for a two-proportion z-test at
    * α = 5% (two-sided), power = 80%:
    * n = (z_{α/2}·√(2p̄q̄) + z_β·√(p₁q₁ + p₂q₂))² / (p₁−p₂)².
    * The z constants are exact decimal literals (1.96, 0.8416 — the
    * textbook values, not a normal-quantile evaluation: inverse-CDF
    * is engine-specific); every other operand derives from exact
    * integer counts, so the float sequence is fixed and identical in
    * both engines (+·−·/·√ only), r6'd/CEIL'd at the end. Baseline
    * p₁ is the purchase SHARE of all events (this fixture's event
    * types are independent streams, not a per-user funnel — a
    * purchases/views "conversion" exceeds 1 here); a degenerate
    * p₂ ≥ 1 yields a NULL sample size on the always-emitted stats
    * row (the absent-row convention), never a √(negative). One
    * narrow conditional aggregate over events. */
  def powerAnalysis(d: Dialect): String = {
    val nTerm =
      """(1.96e0 * SQRT(2.0e0 * ((p1 + p2) / 2.0e0) * (1.0e0 - (p1 + p2) / 2.0e0))
        |     + 8.416e-1 * SQRT(p1 * (1.0e0 - p1) + p2 * (1.0e0 - p2)))""".stripMargin
    s"""WITH c AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS total,
       |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS buys
       |  FROM events
       |),
       |p AS (
       |  -- the aggregate emits one row even on an empty table, and the
       |  -- stats row must always be emitted (absent-row convention) —
       |  -- a WHERE here would contradict it (review-caught); the
       |  -- degenerate cases carry NULLs instead
       |  SELECT total, buys,
       |    CASE WHEN total = 0 THEN NULL
       |         ELSE CAST(buys AS DOUBLE) / total END AS p1,
       |    CASE WHEN total = 0 THEN NULL
       |         ELSE CAST(buys AS DOUBLE) / total * 1.1e0 END AS p2
       |  FROM c
       |)
       |SELECT total AS n_events, buys AS n_purchases,
       |  CASE WHEN total = 0 THEN NULL
       |       ELSE ${d.idiv("1000000 * buys", "total")} END AS p1_ppm,
       |  CASE WHEN total = 0 OR buys = 0 OR p2 >= 1.0e0 THEN NULL
       |       ELSE CAST(CEIL($nTerm * $nTerm / ((p2 - p1) * (p2 - p1))) AS BIGINT)
       |  END AS n_per_arm
       |FROM p""".stripMargin
  }

  /** Day-of-week seasonal decomposition of revenue — the multiplicative
    * seasonal index (mean revenue on weekday w ÷ grand mean daily
    * revenue) a forecast pipeline divides out before trend fitting,
    * and the first diagnostic read when [[acfRevenue]] spikes at lag
    * 7. Rides [[dailyCentsCte]] (THE daily rollup — the index and the
    * ACF it explains can never disagree on the series). Weekday from
    * the epoch-day index by pure integer arithmetic ((day + 4) % 7,
    * 0 = Sunday — epoch day 0 was a Thursday), so no engine date
    * function is trusted for the mapping. The 7-row weekday domain is
    * LEFT-JOIN-driven (the acfRevenue absent-row convention: a weekday
    * with no trading days emits (dow, 0, 0, NULL), never vanishes).
    * Scale shape: one corpus-scale aggregate (the daily rollup), then
    * all arithmetic at day/weekday cardinality. The index is a ratio
    * of two exact int64-derived means — a fixed 4-op IEEE sequence,
    * identical in both engines. */
  def seasonalityDow(d: Dialect): String = {
    val dom = domainRel("dow", (0 to 6).map(_.toString))
    s"""WITH ${dailyCentsCte(d)},
       |dw AS (SELECT (day + 4) % 7 AS dow, cents FROM daily),
       |ag AS (
       |  SELECT dow, CAST(COUNT(*) AS BIGINT) AS n_days,
       |    CAST(SUM(cents) AS BIGINT) AS cents
       |  FROM dw GROUP BY dow
       |),
       |tot AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS td,
       |    CAST(SUM(cents) AS BIGINT) AS tc
       |  FROM daily
       |),
       |dom AS ($dom)
       |SELECT dm.dow,
       |  CASE dm.dow WHEN 0 THEN 'sun' WHEN 1 THEN 'mon' WHEN 2 THEN 'tue'
       |    WHEN 3 THEN 'wed' WHEN 4 THEN 'thu' WHEN 5 THEN 'fri'
       |    ELSE 'sat' END AS day_name,
       |  CAST(COALESCE(a.n_days, 0) AS BIGINT) AS n_days,
       |  CAST(COALESCE(a.cents, 0) AS BIGINT) AS cents,
       |  CASE WHEN a.n_days IS NULL OR t.tc = 0 THEN NULL
       |       ELSE ${r6(
                 "(CAST(a.cents AS DOUBLE) / a.n_days) " +
                 "/ (CAST(t.tc AS DOUBLE) / t.td)")}
       |  END AS seasonal_index
       |FROM dom dm LEFT JOIN ag a ON a.dow = dm.dow CROSS JOIN tot t
       |ORDER BY dm.dow""".stripMargin
  }

  /** Two-factor OLS of daily revenue on (calendar trend, weekend flag)
    * — closed-form multiple regression by the normal equations, the
    * step past [[theilSenRevenue]]'s univariate slope when the weekly
    * seasonality [[seasonalityDow]] quantifies must be controlled for
    * (otherwise the weekend mix of the observed days biases the
    * trend). Design: y = β₀ + β₁·(day − d₀) + β₂·weekend. Moments are
    * exact int64 sums with [[acfRevenue]]'s loud y ≤ 5e7-dollar
    * envelope (Σy² over a decade then stays inside int64); the 3×3
    * Cramer solve runs in DOUBLE on those exact integers — a fixed
    * literal expression tree, so both engines execute the identical
    * correctly-rounded sequence. Degeneracy is decided on INTEGER
    * structure (x₂ constant, or fewer than 4 days), never on a
    * float-zero determinant test. R² comes from the moment identity
    * SSE = Σy² − β·(Xᵀy) — no residual pass, so no order-dependent
    * float sum. Scale shape: one corpus-scale rollup, then all
    * algebra on one 1-row moment tuple. */
  def olsRevenue(d: Dialect): String = {
    // Cramer cofactors over the symmetric moment matrix
    // [[n,s1,s2],[s1,s11,s12],[s2,s12,s2]] (x2 is 0/1 so s22 = s2)
    val det = "(CAST(n AS DOUBLE) * (CAST(s11 AS DOUBLE) * s2 - CAST(s12 AS DOUBLE) * s12)" +
      " - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) * s2 - CAST(s12 AS DOUBLE) * s2)" +
      " + CAST(s2 AS DOUBLE) * (CAST(s1 AS DOUBLE) * s12 - CAST(s11 AS DOUBLE) * s2))"
    val det0 = "(CAST(sy AS DOUBLE) * (CAST(s11 AS DOUBLE) * s2 - CAST(s12 AS DOUBLE) * s12)" +
      " - CAST(s1 AS DOUBLE) * (CAST(s1y AS DOUBLE) * s2 - CAST(s12 AS DOUBLE) * s2y)" +
      " + CAST(s2 AS DOUBLE) * (CAST(s1y AS DOUBLE) * s12 - CAST(s11 AS DOUBLE) * s2y))"
    val det1 = "(CAST(n AS DOUBLE) * (CAST(s1y AS DOUBLE) * s2 - CAST(s12 AS DOUBLE) * s2y)" +
      " - CAST(sy AS DOUBLE) * (CAST(s1 AS DOUBLE) * s2 - CAST(s12 AS DOUBLE) * s2)" +
      " + CAST(s2 AS DOUBLE) * (CAST(s1 AS DOUBLE) * s2y - CAST(s1y AS DOUBLE) * s2))"
    val det2 = "(CAST(n AS DOUBLE) * (CAST(s11 AS DOUBLE) * s2y - CAST(s1y AS DOUBLE) * s12)" +
      " - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) * s2y - CAST(s1y AS DOUBLE) * s2)" +
      " + CAST(sy AS DOUBLE) * (CAST(s1 AS DOUBLE) * s12 - CAST(s11 AS DOUBLE) * s2))"
    val sing = "m.n < 4 OR m.s2 = 0 OR m.s2 = m.n"
    s"""WITH ${dailyDollarsCtes(d, "ols")},
       |mn AS (SELECT MIN(day) AS d0 FROM daily),
       |x AS (
       |  SELECT day - d0 AS x1,
       |    CASE WHEN (day + 4) % 7 IN (0, 6) THEN 1 ELSE 0 END AS x2,
       |    y
       |  FROM daily CROSS JOIN mn
       |),
       |m AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(x1) AS BIGINT) AS s1, CAST(SUM(x2) AS BIGINT) AS s2,
       |    CAST(SUM(x1 * x1) AS BIGINT) AS s11,
       |    CAST(SUM(x1 * x2) AS BIGINT) AS s12,
       |    CAST(SUM(y) AS BIGINT) AS sy,
       |    CAST(SUM(x1 * y) AS BIGINT) AS s1y,
       |    CAST(SUM(x2 * y) AS BIGINT) AS s2y,
       |    CAST(SUM(y * y) AS BIGINT) AS syy
       |  FROM x
       |),
       |b AS (
       |  SELECT n, s2,
       |    CASE WHEN $sing THEN NULL ELSE $det0 / $det END AS b0,
       |    CASE WHEN $sing THEN NULL ELSE $det1 / $det END AS b1,
       |    CASE WHEN $sing THEN NULL ELSE $det2 / $det END AS b2,
       |    sy, s1y, s2y, syy
       |  FROM m
       |)
       |SELECT n AS n_days, s2 AS n_weekend_days,
       |  ${r6("b0")} AS beta0,
       |  ${r6("b1")} AS beta1_per_day,
       |  ${r6("b2")} AS beta2_weekend,
       |  CASE WHEN b0 IS NULL
       |            OR CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n <= 0.0e0
       |       THEN NULL
       |       ELSE ${r6(
                 "1.0e0 - (CAST(syy AS DOUBLE) - b0 * sy - b1 * s1y - b2 * s2y) " +
                 "/ (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n)")}
       |  END AS r2
       |FROM b""".stripMargin
  }

  def theilSenRevenue(d: Dialect): String = {
    s"""WITH ${dailyCentsCte(d)},
       |pr AS (
       |  SELECT CAST(b.cents - a.cents AS DOUBLE) / (b.day - a.day) AS slope
       |  FROM daily a JOIN daily b ON b.day > a.day
       |),
       |rk AS (
       |  SELECT slope, ROW_NUMBER() OVER (ORDER BY slope) AS rn,
       |    COUNT(*) OVER () AS n
       |  FROM pr
       |),
       |med AS (
       |  SELECT SUM(slope) / COUNT(*) AS m FROM rk
       |  WHERE rn = ${d.idiv("n + 1", "2")} OR rn = ${d.idiv("n + 2", "2")}
       |),
       |resid AS (
       |  SELECT CAST(dd.cents AS DOUBLE) - md.m * dd.day AS r
       |  FROM daily dd CROSS JOIN med md
       |),
       |rr AS (
       |  SELECT r, ROW_NUMBER() OVER (ORDER BY r) AS rn, COUNT(*) OVER () AS n
       |  FROM resid
       |),
       |icp AS (
       |  SELECT SUM(r) / COUNT(*) AS b FROM rr
       |  WHERE rn = ${d.idiv("n + 1", "2")} OR rn = ${d.idiv("n + 2", "2")}
       |)
       |SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
       |  ${d.idiv("CAST(COUNT(*) AS BIGINT) * (CAST(COUNT(*) AS BIGINT) - 1)", "2")} AS n_pairs,
       |  ${r6("(SELECT m FROM med)")} AS slope_cents_per_day,
       |  ${r6("(SELECT b FROM icp)")} AS intercept_cents
       |FROM daily""".stripMargin
  }

}
