package graft.ops

/** Multimodal column plumbing: binary payload schemas and the SQL-reproducible stub-codec feature paths.
  *
  * Split out of the single-file SqlOps (r11) as a PURE MOVE: member
  * order across the [[SqlOpsAll]] linearization equals the pre-split
  * declaration order, so val-initialization semantics are unchanged.
  * The self-type keeps every cross-domain reference compiling against
  * the same single [[SqlOps]] instance.
  */
trait SqlOpsMultimodal { this: SqlOpsAll =>

  // ---- multimodal column plumbing ----

  /** The canonical near-dup pipeline end-to-end: minhash LSH bands for
    * candidate RECALL, exact jaccard on the df-capped shingle index for
    * PRECISION (≥ 0.6), in one query. Both indexes are the same staged
    * tables the standalone queries use (memoized per JVM), so this
    * composes rather than recomputes. At 100 TB this is the shape that
    * ships: bands bound the candidate set, exact verification touches
    * only candidate pairs. */
  val dedupVerified: StagedOp = StagedOp(
    stages = dedupMinhash.stages ++ dedupNgramJaccard.stages,
    body = { _ =>
      s"""WITH cand AS (SELECT doc_a, doc_b FROM mh_cand),
         |$szCte,
         |$interGatedCte
         |$jaccardSelect""".stripMargin
    })

  /** Dedup-threshold sensitivity sweep — the tuning table for the
    * Jaccard cutoff the verified-dedup gate hardcodes at 0.6: for
    * each candidate threshold 0.50/0.55/…/0.90, how many candidate
    * pairs the verifier would keep, how many distinct docs those
    * pairs touch, and the corpus fraction affected. One scan of the
    * gated intersections (the staged mh_cand candidates scored
    * against the staged shingle index — the [[dedupVerified]] CTEs
    * verbatim, minus its fixed WHERE), so the sweep costs ONE
    * verification pass, not nine: each pair collapses to its MAXIMAL
    * passing bar ⌊100·inter/union⌋ (integer-exact — j ≥ bar/100 ⟺
    * that floor ≥ bar), each doc to the max bar over its pairs, and
    * the per-threshold counts are sums over the tiny bar-bucket
    * tables joined to the 9-row threshold domain. The first draft
    * re-ran the gated intersection join once per consumer (ScanAudit:
    * 16 scans); this shape runs it once. */
  val dedupThresholdSweep: StagedOp = StagedOp(
    stages = dedupMinhash.stages ++ dedupNgramJaccard.stages :+
      // each pair's maximal passing bar — MATERIALIZED: three
      // consumers below (pair buckets + both endpoint arms) would
      // re-run the gated intersection join per reference as a CTE
      ("dts_pb" -> { (d: Dialect) =>
        s"""WITH cand AS (SELECT doc_a, doc_b FROM mh_cand),
           |$szCte,
           |$interGatedCte
           |SELECT i.doc_a, i.doc_b,
           |  -- snapshot twins (2d, 2d+1) are corpus-construction
           |  -- artifacts every threshold keeps; flagged so the doc
           |  -- count can show the DISCRIMINATING membership too
           |  CASE WHEN ${d.idiv("i.doc_a", "2")} = ${d.idiv("i.doc_b", "2")}
           |       THEN 1 ELSE 0 END AS twin,
           |  CAST(${d.idiv("100 * i.inter", "sa.n + sb.n - i.inter")} AS BIGINT) AS pmax
           |FROM inter i
           |JOIN sz sa ON i.doc_a = sa.doc_id
           |JOIN sz sb ON i.doc_b = sb.doc_id""".stripMargin
      }),
    body = { d =>
      val bars = Seq(50, 55, 60, 65, 70, 75, 80, 85, 90)
      val dom = domainRel("bar", bars.map(_.toString))
      s"""WITH dom AS ($dom),
         |pb AS (SELECT doc_a, doc_b, twin, pmax FROM dts_pb),
         |pcnt AS (SELECT pmax, CAST(COUNT(*) AS BIGINT) AS c FROM pb GROUP BY pmax),
         |-- each doc's maximal bar over all its pairs / its non-twin pairs
         |db AS (
         |  SELECT doc_id,
         |    CAST(MAX(pmax) AS BIGINT) AS dmax,
         |    CAST(MAX(CASE WHEN twin = 0 THEN pmax END) AS BIGINT) AS dmax_nt
         |  FROM (
         |    SELECT doc_a AS doc_id, twin, pmax FROM pb
         |    UNION ALL SELECT doc_b AS doc_id, twin, pmax FROM pb
         |  ) GROUP BY doc_id
         |),
         |dcnt AS (
         |  SELECT dmax, CAST(COUNT(*) AS BIGINT) AS c FROM db GROUP BY dmax
         |),
         |dcntn AS (
         |  SELECT dmax_nt, CAST(COUNT(*) AS BIGINT) AS c FROM db
         |  WHERE dmax_nt IS NOT NULL GROUP BY dmax_nt
         |),
         |-- corpus size = 2 × documents (the corpusCte snapshot pairing)
         |nc AS (SELECT CAST(2 * COUNT(*) AS BIGINT) AS n FROM documents),
         |pairs AS (
         |  SELECT dom.bar, CAST(COALESCE(SUM(p.c), 0) AS BIGINT) AS n_pairs
         |  FROM dom LEFT JOIN pcnt p ON p.pmax >= dom.bar GROUP BY dom.bar
         |),
         |docs AS (
         |  SELECT dom.bar, CAST(COALESCE(SUM(dc.c), 0) AS BIGINT) AS n_docs
         |  FROM dom LEFT JOIN dcnt dc ON dc.dmax >= dom.bar GROUP BY dom.bar
         |),
         |docsn AS (
         |  SELECT dom.bar, CAST(COALESCE(SUM(dn.c), 0) AS BIGINT) AS n_docs_nontwin
         |  FROM dom LEFT JOIN dcntn dn ON dn.dmax_nt >= dom.bar GROUP BY dom.bar
         |)
         |SELECT ${r6("CAST(p.bar AS DOUBLE) / 100")} AS threshold,
         |  p.n_pairs, dc.n_docs, dn.n_docs_nontwin,
         |  ${r6("CAST(dn.n_docs_nontwin AS DOUBLE) / nc.n")} AS nontwin_frac
         |FROM pairs p
         |JOIN docs dc ON dc.bar = p.bar
         |JOIN docsn dn ON dn.bar = p.bar
         |CROSS JOIN nc
         |ORDER BY threshold""".stripMargin
    })

  /** LSH quality evaluation: recall/precision of the minhash band
    * candidates against exact-jaccard (≥ 0.6) ground truth — the
    * metrics row a pipeline publishes when tuning band/row counts.
    *
    * The truth side is all-pairs exact jaccard, which no 100 TB corpus
    * can afford — so BOTH sides of the estimator are restricted to the
    * deterministic ~12.5% content-hash sample ([[sampleHash]]'s bucket
    * predicate): truth = exact pairs with both endpoints sampled,
    * candidates likewise, recall = hits/truth and precision =
    * hits/candidates over that subset. Content-hash sampling keeps or
    * drops both members of an exact-duplicate pair together and is
    * independent of near-dup structure, so the sampled ratios are
    * consistent estimators of the full-corpus ones while the exact
    * self-join shrinks by the sample rate squared (~64×). Counts are
    * exact on the sample; the ratios are single IEEE divisions. */
  val dedupLshEval: StagedOp = StagedOp(
    stages = dedupMinhash.stages ++ dedupNgramJaccard.stages,
    body = { d =>
      s"""WITH ${corpusCte(d)},
         |${lshSampCte},
         |cands AS (
         |  SELECT c.doc_a, c.doc_b
         |  FROM mh_cand c
         |  JOIN samp pa ON c.doc_a = pa.doc_id
         |  JOIN samp pb ON c.doc_b = pb.doc_id
         |),
         |$szCte,
         |$interSampledCte,
         |truth AS (
         |  SELECT i.doc_a, i.doc_b FROM inter i
         |  JOIN sz sa ON i.doc_a = sa.doc_id
         |  JOIN sz sb ON i.doc_b = sb.doc_id
         |  WHERE $jaccardExpr >= 0.6
         |),
         |m AS (
         |  SELECT
         |    (SELECT COUNT(*) FROM truth) AS n_true,
         |    (SELECT COUNT(*) FROM cands) AS n_cand,
         |    (SELECT COUNT(*) FROM truth t JOIN cands c
         |       ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b) AS n_hit
         |)
         |SELECT n_true, n_cand, n_hit,
         |  CASE WHEN n_true = 0 THEN NULL
         |       ELSE CAST(n_hit AS DOUBLE) / n_true END AS recall,
         |  CASE WHEN n_cand = 0 THEN NULL
         |       ELSE CAST(n_hit AS DOUBLE) / n_cand END AS precision_
         |FROM m""".stripMargin
    })

  /** LSH design audit — the S-curve tuning readout for the SHIPPED
    * [[MhBands]]×[[MhRows]] minhash geometry: per exact-Jaccard decile
    * (over the deterministic content-hash sample, the [[dedupLshEval]]
    * truth pattern), the EMPIRICAL candidate rate (fraction of sampled
    * pairs the band join actually surfaced) next to the THEORETICAL
    * collision probability 1 − (1 − sʳ)ᵇ at the decile midpoint —
    * the curve a pipeline inspects before changing band geometry
    * (more bands → the S shifts left, more recall, more candidates).
    * The theory column renders from [[scurveDetectPpm]] — the SAME
    * host-exact ppm table [[lshParamOpt]] scores every factorization
    * with, instantiated at the shipped constants, so this audit
    * re-curves automatically with any future re-band.
    * Only pairs sharing ≥1 shingle appear (the inter join's own
    * grain — disjoint pairs are the flat left tail of the curve);
    * the decile domain is a literal list left-joined so empty deciles
    * emit their zero row. Scale shape: everything is sample² bounded;
    * the full-corpus band join is read from the staged mh_cand. */
  /** Sampled pair-similarity decile buckets (true Jaccard → bucket
    * ⌊10j⌋ capped at 9, over the deterministic md5 sample) — ONE copy
    * shared by [[lshScurve]] (the empirical-vs-theoretical audit) and
    * [[lshParamOpt]] (the banding optimizer), so the two can never
    * disagree about the histogram they both claim to read. */
  private[ops] def lshPairBucketCte(d: Dialect): String =
    s"""pairs AS (
       |  SELECT i.doc_a, i.doc_b,
       |    LEAST(${d.idiv("10 * i.inter", "sa.n + sb.n - i.inter")}, 9) AS bkt
       |  FROM inter i
       |  JOIN sz sa ON i.doc_a = sa.doc_id
       |  JOIN sz sb ON i.doc_b = sb.doc_id
       |)""".stripMargin

  val lshScurve: StagedOp = StagedOp(
    stages = dedupMinhash.stages ++ dedupNgramJaccard.stages,
    body = { d =>
      // the shipped geometry's detection curve as host-exact ppm
      // literals — the same scurveDetectPpm table lshParamOpt scores
      // every (b, r) with, so audit and optimizer share one curve
      val th = domainRel("bkt, p_ppm", (0 to 9).map { k =>
        s"$k, CAST(${scurveDetectPpm(MhBands, MhRows, k)} AS BIGINT)"
      })
      s"""WITH ${corpusCte(d)},
         |${lshSampCte},
         |$szCte,
         |$interSampledCte,
         |${lshPairBucketCte(d)},
         |h AS (
         |  SELECT p.bkt, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |    CAST(SUM(CASE WHEN c.doc_a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_cand
         |  FROM pairs p
         |  LEFT JOIN mh_cand c ON c.doc_a = p.doc_a AND c.doc_b = p.doc_b
         |  GROUP BY p.bkt
         |),
         |th AS ($th)
         |SELECT th.bkt AS bucket,
         |  CAST(COALESCE(h.n_pairs, 0) AS BIGINT) AS n_pairs,
         |  CAST(COALESCE(h.n_cand, 0) AS BIGINT) AS n_candidates,
         |  CASE WHEN COALESCE(h.n_pairs, 0) = 0 THEN NULL
         |       ELSE ${r6("CAST(h.n_cand AS DOUBLE) / h.n_pairs")} END AS empirical_rate,
         |  ${r6("CAST(th.p_ppm AS DOUBLE) / 1.0e6")} AS theoretical_rate
         |FROM th LEFT JOIN h ON h.bkt = th.bkt
         |ORDER BY bucket""".stripMargin
    })

  /** LSH banding-parameter optimizer — which (bands, rows) split of
    * the 8-slice minhash signature minimizes expected dedup error on
    * THIS corpus? For every factorization b·r = 8, the expected
    * false-negative mass (true dups — Jaccard ≥ 0.6, the verified
    * gate's bar — the banding would MISS) and false-positive mass
    * (non-dups it would surface to the verifier) under the S-curve
    * P(s) = 1 − (1 − sʳ)ᵇ, evaluated against the corpus's OWN
    * sampled pair-similarity histogram (the [[lshScurve]] decile
    * buckets, same stages, same deterministic sample). Detection
    * probabilities are computed HOST-SIDE with BigDecimal at the
    * decile midpoints and inlined as exact ppm integer literals (the
    * EXPQ rule: no transcendental ever crosses an engine boundary),
    * so the whole query is integer arithmetic until the final
    * 6dp-quantized ratios. The engine ACTS on this readout: round 11
    * re-banded [[mhBandRows]] to the argmin (b=2, r=4) this table
    * identified — the previously-shipped (4, 2) was FP-heavy on this
    * corpus (see the measured candidate/precision delta at
    * [[MhBands]]). At 100 TB the same table re-runs per corpus before
    * each re-index, and the band constants are the one knob to turn. */
  val lshParamOpt: StagedOp = {
    val configs = Seq((1, 8), (2, 4), (4, 2), (8, 1))
    val pTable = for ((b, r) <- configs; k <- 0 to 9) yield
      s"SELECT $b AS b, $r AS r, $k AS bkt, " +
        s"CAST(${scurveDetectPpm(b, r, k)} AS BIGINT) AS p_ppm"
    StagedOp(
      stages = dedupMinhash.stages ++ dedupNgramJaccard.stages,
      body = { d =>
        s"""WITH ${corpusCte(d)},
           |${lshSampCte},
           |$szCte,
           |$interSampledCte,
           |${lshPairBucketCte(d)},
           |h AS (SELECT bkt, CAST(COUNT(*) AS BIGINT) AS n_pairs FROM pairs GROUP BY bkt),
           |pt AS (${pTable.mkString("\n           |  UNION ALL ")}),
           |e AS (
           |  SELECT pt.b, pt.r,
           |    CAST(SUM(CASE WHEN pt.bkt >= 6
           |             THEN COALESCE(h.n_pairs, 0) * (1000000 - pt.p_ppm)
           |             ELSE 0 END) AS BIGINT) AS fn_mass,
           |    CAST(SUM(CASE WHEN pt.bkt < 6
           |             THEN COALESCE(h.n_pairs, 0) * pt.p_ppm
           |             ELSE 0 END) AS BIGINT) AS fp_mass
           |  FROM pt LEFT JOIN h ON h.bkt = pt.bkt
           |  GROUP BY pt.b, pt.r
           |)
           |SELECT b, r,
           |  ${r6("CAST(fn_mass AS DOUBLE) / 1.0e6")} AS exp_false_neg,
           |  ${r6("CAST(fp_mass AS DOUBLE) / 1.0e6")} AS exp_false_pos,
           |  ${r6("CAST(fn_mass + fp_mass AS DOUBLE) / 1.0e6")} AS exp_cost
           |FROM e ORDER BY b, r""".stripMargin
      })
  }

}
