package graft.ops

/** Tokenizer trainers (BPE, unigram-LM/SentencePiece) and their read paths, preference-data aggregation (DPO/Bradley-Terry/win-rate), eval statistics, and the JL random projection.
  *
  * Split out of the single-file SqlOps (r11) as a PURE MOVE: member
  * order across the [[SqlOpsAll]] linearization equals the pre-split
  * declaration order, so val-initialization semantics are unchanged.
  * The self-type keeps every cross-domain reference compiling against
  * the same single [[SqlOps]] instance.
  */
trait SqlOpsTokenEval { this: SqlOpsAll =>

  // ---- the FULL SentencePiece trainer loop (Kudo 2018 §3.2):
  // soft-EM expected counts over ALL segmentations, and iterative
  // vocabulary pruning to a target size with re-Viterbi per round ----

  /** Posterior-weight staircase: soft-EM needs exp2 of score
    * differences, and transcendentals are NOT IEEE-pinned across
    * engines — so the posterior weight is DEFINED on a 1/16-bit
    * staircase: rel µ-bits below the word's best mask quantize to
    * k = ⌊rel/62500⌋ sixteenths, and the weight is the HOST-exact
    * integer table T[k mod 16] = round(2^(r/16)·10⁶) halved ⌊k/16⌋
    * times (integer division by an exact power of two). Both engines
    * evaluate only int64 +·−·%·÷ and the shared literal table, so
    * the posteriors are bit-identical by construction; weights more
    * than 40 bits below the mode are 0 (they cannot move a µ-count).
    * The quantized posterior under-weights a mask by < 2^(1/16)−1 ≈
    * 4.4% relative — bounded, documented, and identical in both
    * engines (the "documented quantization" alternative to pinning
    * exp). */
  private[ops] val UlmStairStepMu = 62500
  private[ops] val UlmStairBits = 16
  private[ops] def ulmStairExpr(rr: String): String = {
    val t = (0 until UlmStairBits)
      .map(r => math.round(StrictMath.pow(2.0, r / 16.0) * 1e6))
    "CASE " + t.zipWithIndex
      .map { case (v, r) => s"WHEN ($rr) = $r THEN CAST($v AS BIGINT)" }
      .mkString(" ") + " ELSE CAST('ulm stair: unreachable residue' AS BIGINT) END"
  }

  /** Staircase posterior weights of every valid mask of every word
    * under `piecesTbl` probabilities: (w, m, score, wq). Reused for
    * the re-estimated model (`ulm_wq2`) so the marginal-likelihood
    * audit measures both models through the SAME quantizer. */
  private[ops] def ulmWqStage(name: String, piecesTbl: String): (String, Dialect => String) =
    name -> { (d: Dialect) =>
      val fd = floorDiv(d) _
      s"""WITH ${ulmCandCte(d)},
         |${ulmScoredCte(piecesTbl)},
         |kq AS (
         |  -- per-word mode as a WINDOW, not a groupBy+self-join: ok is
         |  -- an aggregation subtree and a second reference would
         |  -- inline (re-run) it whole
         |  SELECT w, m, score, ${fd("score - mxs", UlmStairStepMu.toString)} AS k
         |  FROM (SELECT w, m, score, MAX(score) OVER (PARTITION BY w) AS mxs FROM ok)
         |),
         |qr AS (
         |  SELECT w, m, score,
         |    ${fd("k", UlmStairBits.toString)} AS qq,
         |    ${pmodPos("k", UlmStairBits.toString)} AS rr
         |  FROM kq
         |)
         |SELECT w, m, score,
         |  CASE WHEN qq < -40 THEN CAST(0 AS BIGINT)
         |       ELSE ${d.idiv(ulmStairExpr("rr"), "CAST(pow(2, -qq) AS BIGINT)")} END AS wq
         |FROM qr""".stripMargin
    }

  /** Soft-EM E+M step: expected piece counts over ALL segmentations
    * (not just the Viterbi path — the [[ulmEmStep]] hard-count
    * refinement Kudo's trainer actually runs). Per word, each piece's
    * posterior-expected occurrence count is the exact rational
    * Σ wq·occurrences / Σ wq, half-up µ-quantized with the pure
    * integer identity ⌊a/b + ½⌋ = (2a+b) div 2b — no doubles cross an
    * aggregate anywhere. tf-weighted corpus sums then re-estimate the
    * piece log-probs (µ-log2). Envelope: tf·fq ≤ 10¹³ per word at
    * tf ≤ 10⁶ — int64-safe far past the test corpus; the num·10⁶
    * term is ≤ 2·10¹⁶. Pieces whose soft count quantizes to zero
    * µ-counts drop out (below-quantization mass — the soft analogue
    * of the hard prune signal). */
  private[ops] val ulmSoftStage: (String, Dialect => String) =
    "ulm_softq" -> { (d: Dialect) =>
      s"""WITH ${ulmCandCte(d)},
         |num AS (
         |  SELECT c.w, c.piece, CAST(SUM(q.wq) AS BIGINT) AS num
         |  FROM cand c JOIN ulm_wq q ON q.w = c.w AND q.m = c.m
         |  GROUP BY c.w, c.piece
         |),
         |den AS (SELECT w, CAST(SUM(wq) AS BIGINT) AS den FROM ulm_wq GROUP BY w),
         |fq AS (
         |  SELECT n.w, n.piece,
         |    ${d.idiv("2 * n.num * 1000000 + d.den", "2 * d.den")} AS fq
         |  FROM num n JOIN den d ON d.w = n.w
         |),
         |ec AS (
         |  SELECT f.piece, CAST(SUM(v.c * f.fq) AS BIGINT) AS ecq
         |  FROM fq f JOIN ulm_vocab v ON v.w = f.w
         |  GROUP BY f.piece
         |)
         |-- total as a window: a scalar-CTE cross-join would inline
         |-- (re-run) the whole num/den/fq chain a second time
         |SELECT piece, ecq, ${qlog2("ecq")} - ${qlog2("t")} AS qlp
         |FROM (SELECT piece, ecq, CAST(SUM(ecq) OVER () AS BIGINT) AS t FROM ec)
         |WHERE ecq > 0""".stripMargin
    }

  /** The soft-EM step with its own monotonicity audit: per-piece soft
    * (posterior-expected) vs hard (Viterbi) counts and both models'
    * log-probs, plus the EM guarantee on the MARGINAL likelihood —
    * Σ_w tf·log2 Z_w measured through the same staircase for the
    * initial and the re-estimated model (Z_w = 2^{M_w}·Σ wq/10⁶, so
    * log2 Z_w = M_w + qlog2(Σ wq) − qlog2(10⁶) in exact µ-bits;
    * qlog2's operand Σ wq ≤ 512·2·10⁶ stays small). `soft_improves`
    * re-proves EM's L(θ') ≥ L(θ) on every run, like
    * [[ulmEmGain]]'s columns for the hard step. */
  val ulmSoftEm: StagedOp = StagedOp(
    stages = ulmEmStep.stages ++ Seq(
      ulmWqStage("ulm_wq", "ulm_pieces"),
      ulmSoftStage,
      ulmWqStage("ulm_wq2", "ulm_softq")),
    body = { _ =>
      def lm(tbl: String) =
        s"""SELECT CAST(SUM(v.c * (s.mxs + ${qlog2("s.dens")} - ${qlog2("1000000")})) AS BIGINT) AS q
           |  FROM (SELECT w, MAX(score) AS mxs, CAST(SUM(wq) AS BIGINT) AS dens
           |        FROM $tbl GROUP BY w) s
           |  JOIN ulm_vocab v ON v.w = s.w""".stripMargin
      s"""WITH lm0 AS (
         |${lm("ulm_wq")}
         |),
         |lm1 AS (
         |${lm("ulm_wq2")}
         |)
         |SELECT s.piece,
         |  ${r6("CAST(s.ecq AS DOUBLE) / 1.0e6")} AS soft_count,
         |  h.ec AS hard_count,
         |  ${r6("CAST(s.qlp AS DOUBLE) / 1.0e6")} AS logp_soft_bits,
         |  ${r6("CAST(h.qlp AS DOUBLE) / 1.0e6")} AS logp_hard_bits,
         |  ${r6("CAST(l0.q AS DOUBLE) / 1.0e6")} AS marginal_init_bits,
         |  ${r6("CAST(l1.q AS DOUBLE) / 1.0e6")} AS marginal_soft_bits,
         |  l1.q >= l0.q AS soft_improves
         |FROM ulm_softq s
         |LEFT JOIN ulm_pcs2 h ON h.piece = s.piece
         |CROSS JOIN lm0 l0 CROSS JOIN lm1 l1
         |ORDER BY s.ecq DESC, s.piece LIMIT 30""".stripMargin
    })

  /** One vocabulary-pruning round (Kudo 2018 §3.2's outer loop):
    * re-Viterbi under the current vocabulary, per-piece likelihood
    * LOSS = Σ_w tf·(best − best-avoiding-the-piece) over the words
    * whose winning path uses it (exact, off the same enumeration —
    * no Viterbi approximation needed), then drop the lowest-loss
    * HALF of the multi-char pieces, floored so the total vocabulary
    * never goes below `target`. Single-char pieces are never dropped
    * (the SentencePiece coverage rule — every word stays segmentable
    * via its all-singles mask, so an alternative path always exists
    * for any multi-char piece; a missing alternative is still
    * guarded by a 100-bit sentinel loss). Survivor log-probs are
    * re-estimated from this round's Viterbi counts; a kept-but-
    * unused piece carries its previous estimate. */
  /** Round stage A — this round's winning paths at (word, piece)
    * grain: occurrences `cnt` on the path, word tf `c` and the path
    * score carried along, so stage B's loss and count aggregates are
    * plain scans of this table. Materialized because TWO independent
    * branches of the round (the per-piece Viterbi counts and the
    * loss ranking) consume it — Spark inlines a twice-referenced CTE
    * and would re-run the whole score→window→join subtree per
    * reference (the r8 shape: 60 exchanges / 42 aggregates compiled
    * into ONE round stage, ~1.8 s of AQE-scheduled micro-jobs for
    * <2k-row dataflow). */
  private[ops] def ulmPruneWinStage(prev: String, name: String): (String, Dialect => String) =
    name -> { (d: Dialect) =>
      s"""WITH ${ulmCandCte(d)},
         |${ulmScoredCte(prev)},
         |win AS (
         |  SELECT w, m, score FROM (
         |    SELECT w, m, score,
         |      ROW_NUMBER() OVER (PARTITION BY w ORDER BY score DESC, np, m) AS rk
         |    FROM ok
         |  ) WHERE rk = 1
         |)
         |SELECT c.w, c.piece, c.ln, v.c, n.score, COUNT(*) AS cnt
         |FROM cand c
         |JOIN win n ON n.w = c.w AND n.m = c.m
         |JOIN ulm_vocab v ON v.w = c.w
         |GROUP BY c.w, c.piece, c.ln, v.c, n.score""".stripMargin
    }

  /** Round stage B — the prune decision. Every CTE here is referenced
    * exactly ONCE (multi-consumed intermediates are either the
    * materialized stage-A table or plain table scans), and the final
    * total is a window over `ke` instead of a scalar cross-join —
    * both deliberate: CTE inlining duplicates the whole subtree per
    * reference, and this stage's cost is plan overhead, not
    * dataflow. */
  private[ops] def ulmPruneRound(prev: String, pw: String, name: String,
                            target: Int): (String, Dialect => String) =
    name -> { (d: Dialect) =>
      s"""WITH ${ulmCandCte(d)},
         |${ulmScoredCte(prev)},
         |av AS (
         |  -- per (word, multi-char path piece): best score among ok
         |  -- masks AVOIDING the piece — mask membership read off the
         |  -- enumeration as a LEFT JOIN + conditional MAX (an avoided
         |  -- mask has no membership row), so a piece with no
         |  -- alternative path keeps its row with a NULL alt
         |  SELECT pg.w, pg.piece, pg.c, pg.score,
         |    MAX(CASE WHEN h.w IS NULL THEN o.score END) AS alt_score
         |  FROM $pw pg
         |  JOIN ok o ON o.w = pg.w
         |  LEFT JOIN (SELECT DISTINCT w, m, piece FROM cand) h
         |    ON h.w = o.w AND h.m = o.m AND h.piece = pg.piece
         |  WHERE pg.ln > 1
         |  GROUP BY pg.w, pg.piece, pg.c, pg.score
         |),
         |loss0 AS (
         |  -- a missing alternative is guarded by a 100-bit sentinel
         |  SELECT piece,
         |    CAST(SUM(c * (score - COALESCE(alt_score, score - 100000000)))
         |         AS BIGINT) AS lossq
         |  FROM av GROUP BY piece
         |),
         |ranked AS (
         |  SELECT vp.piece,
         |    ROW_NUMBER() OVER (ORDER BY COALESCE(l.lossq, CAST(0 AS BIGINT)) ASC,
         |                       vp.piece) AS rn
         |  FROM $prev vp LEFT JOIN loss0 l ON l.piece = vp.piece
         |  WHERE length(vp.piece) > 1
         |),
         |ec AS (SELECT piece, CAST(SUM(c * cnt) AS BIGINT) AS ec FROM $pw GROUP BY piece),
         |ke AS (
         |  -- one pass: singles always keep, multis keep past the drop
         |  -- line (a single's rn is NULL — the ranking covers multis).
         |  -- ndrop's inputs are WINDOW counts over this same join, not
         |  -- a scalar-CTE cross-join (which would re-scan the
         |  -- vocabulary through a second broadcast build)
         |  SELECT piece, qlp_prev, ec FROM (
         |    SELECT vp.piece, vp.qlp AS qlp_prev,
         |      CAST(COALESCE(e.ec, 0) AS BIGINT) AS ec, r.rn,
         |      CAST(SUM(CASE WHEN length(vp.piece) > 1 THEN 1 ELSE 0 END) OVER () AS BIGINT) AS nm,
         |      CAST(SUM(CASE WHEN length(vp.piece) = 1 THEN 1 ELSE 0 END) OVER () AS BIGINT) AS n1
         |    FROM $prev vp
         |    LEFT JOIN ranked r ON r.piece = vp.piece
         |    LEFT JOIN ec e ON e.piece = vp.piece
         |  )
         |  WHERE length(piece) = 1
         |     OR rn > LEAST(${d.idiv("nm + 1", "2")},
         |                   GREATEST(nm - GREATEST($target - n1, 0), 0))
         |)
         |SELECT piece,
         |  CASE WHEN ec > 0 THEN ${qlog2("ec")} - ${qlog2("t")} ELSE qlp_prev END AS qlp,
         |  ec
         |FROM (SELECT piece, qlp_prev, ec,
         |        CAST(SUM(CASE WHEN ec > 0 THEN ec ELSE 0 END) OVER () AS BIGINT) AS t
         |      FROM ke)""".stripMargin
    }

  /** The trainer's outer loop, materialized: `rounds` pruning rounds
    * (each re-Viterbis under the shrinking vocabulary) down to
    * `target` total pieces. The round count is static; once the
    * multi-char pool reaches max(0, target − n_singles) further
    * rounds are no-ops (ndrop = 0), so a fixed-round chain converges
    * for any corpus whose pool halves down to target within
    * `rounds`. Body re-scores the corpus one last time under the
    * final vocabulary and asserts the two trainer invariants as
    * output columns: the vocabulary hit its target (up to the
    * never-dropped single-chars floor) and EVERY corpus word is
    * still segmentable — plus the per-round remaining-pool trace
    * (`pool_after_r1, pool_after_r2, …`), so a corpus that needs
    * MORE rounds than the instantiation provides is visible in the
    * output itself (which round stalled above target), not just in
    * the final `within_target = false` flag. */
  def ulmPrune(target: Int, rounds: Int, prefix: String = "ulm_p"): StagedOp = {
    val roundStages = (1 to rounds).flatMap { r =>
      val prev = if (r == 1) "ulm_pieces" else s"${prefix}v${r - 1}"
      Seq(ulmPruneWinStage(prev, s"${prefix}w$r"),
          ulmPruneRound(prev, s"${prefix}w$r", s"${prefix}v$r", target))
    }
    val fin = s"${prefix}v$rounds"
    StagedOp(
      // the base chain only: the prune loop re-Viterbis per round and
      // never reads the ulm_seg segmenter — building it here billed
      // an unconsumed 0.7 s stage to every cold prune run
      stages = ulmBaseStages ++ roundStages,
      body = { d =>
        // the final round's pool is derivable from the one fin scan
        // (pool = n_vocab − n_singles); earlier rounds scan their own
        // (tiny) table — one scalar CTE per round, not per metric
        val poolCtes = (1 until rounds).map { r =>
          s"pool$r AS (SELECT COUNT(*) AS n FROM ${prefix}v$r WHERE length(piece) > 1),"
        }.mkString("\n")
        val poolCols = ((1 until rounds)
          .map(r => s"pool$r.n AS pool_after_r$r") :+
          s"sc.n - sc.n1 AS pool_after_r$rounds").mkString(",\n  ")
        val poolJoins = (1 until rounds).map(r => s"CROSS JOIN pool$r").mkString(" ")
        s"""WITH ${ulmCandCte(d)},
           |${ulmScoredCte(fin)},
           |sc AS (
           |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
           |    CAST(SUM(CASE WHEN length(piece) = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
           |  FROM $fin
           |),
           |cov AS (
           |  -- coverage and vocab size off ONE scan: a word is covered
           |  -- iff it has any scorable mask under the final vocabulary
           |  SELECT COUNT(*) AS nw, COUNT(o.w) AS ncov
           |  FROM ulm_vocab v LEFT JOIN (SELECT DISTINCT w FROM ok) o ON o.w = v.w
           |),
           |$poolCtes
           |pcs AS (SELECT piece, qlp, ec FROM $fin)
           |SELECT v.piece,
           |  ${r6("CAST(v.qlp AS DOUBLE) / 1.0e6")} AS logp_bits,
           |  v.ec AS viterbi_count,
           |  CASE WHEN length(v.piece) = 1 THEN 1 ELSE 0 END AS is_char,
           |  sc.n AS n_vocab,
           |  $target AS target_vocab,
           |  $poolCols,
           |  sc.n <= GREATEST($target, sc.n1) AS within_target,
           |  cov.ncov = cov.nw AS all_words_covered
           |FROM pcs v CROSS JOIN sc CROSS JOIN cov
           |$poolJoins
           |ORDER BY v.ec DESC, v.piece""".stripMargin
      })
  }

  /** The registered instance: 64-piece target over the fixture corpus
    * (24 single chars + 40 kept multi-char pieces; 157 multi-char
    * candidates reach the target in exactly two rounds, 157 → 78 →
    * 40). The convergence NO-OP round — ndrop = 0 once the pool is at
    * target — is proven by the micro-oracle's 3-round instantiation,
    * not paid for on every bench run. The rounds constant also names
    * the final vocabulary stage ([[ulmPruneFin]]) — single-sourced so
    * a rounds change can never pin a downstream reader to a stale
    * iterate. */
  private[ops] val UlmPruneRounds = 2
  val ulmPrune64: StagedOp = ulmPrune(64, UlmPruneRounds)
  private[ops] val ulmPruneFin = s"ulm_pv$UlmPruneRounds"

  /** The SAME prune loop under ALIAS stage names (`ulm_tp*`) — the
    * variant q_ulm_prune times. The canonical `ulm_pw…/ulm_pv…` chain
    * has TWO consumers (the prune readout and the drift baseline's
    * final vocabulary) and is therefore prewarmed like every
    * multi-consumer artifact; but the pruning iteration IS this
    * query's computation, so it re-runs the rounds under names no
    * other query reads — first-consumer billing stops depending on
    * bench name order (the pci_* precedent). Identical SQL modulo
    * stage names → identical result, and the oracle proves that every
    * run. */
  val ulmPrune64Timed: StagedOp = ulmPrune(64, UlmPruneRounds, "ulm_tp")

  /** Tokenizer-drift baseline under the TRAINED pruned vocabulary:
    * per-source fertility (pieces per word under the final
    * segmenter's winning paths) and degenerate-segmentation rate
    * (words whose winning path is all single-char pieces — the
    * fallback the trainer exists to avoid; its rate climbing is the
    * "retrain the tokenizer" signal). The batch twin of the streaming
    * `tokdrift` monitor ([[graft.streaming.StreamingOps]]): this is
    * the per-source baseline a production monitor compares incoming
    * batches against. Re-uses the prune chain's winning-path stage
    * shape under the FINAL vocabulary; both ratios are one exact
    * integer division each (correctly rounded in IEEE, so portable
    * without µ-staging). */
  // ---- preference-data aggregation (the RLHF data-prep family):
  // pairwise judgments → win-rate matrix → Bradley-Terry strengths ----

  /** Deterministic pairwise-preference fixture derivation, ONE staged
    * artifact shared by the win-rate and Bradley-Terry readers: each
    * doc is compared against the representative of its md5-rotated
    * content bucket (the [[negativePairs]] hash-ring — RNG-free,
    * self-pair-impossible, stable across engines), restricted to
    * CROSS-source pairs; the judge prefers the longer document
    * (deterministic tie-break by id) with a ~25% md5-keyed flip — a
    * latent-strength-plus-noise model, which is exactly the regime
    * Bradley-Terry assumes. Aggregated to source-pair grain
    * (si < sj, n comparisons, w_i wins for si): the comparison matrix
    * is SOURCE-cardinality — bounded at any corpus scale, which is
    * what makes the MM iteration below a tiny fixed-point loop no
    * matter how many judgments feed it. */
  private[ops] val prefCmpStage: (String, Dialect => String) =
    "pref_cmp" -> { (d: Dialect) =>
      s"""WITH t AS (
         |  SELECT doc_id, source, text,
         |    CAST(${d.size(toks(d))} AS BIGINT) AS n_tok
         |  FROM documents
         |),
         |b AS (SELECT doc_id, source, n_tok, ${md5Bucket("text")} AS bkt FROM t),
         |rep AS (SELECT bkt, MIN(doc_id) AS rep_id FROM b GROUP BY bkt),
         |pair0 AS (
         |  SELECT a.doc_id AS a_id, a.source AS a_src, a.n_tok AS a_tok,
         |    p.doc_id AS b_id, p.source AS b_src, p.n_tok AS b_tok
         |  FROM b a
         |  JOIN rep r ON (a.bkt + 97) % 256 = r.bkt
         |  JOIN b p ON p.doc_id = r.rep_id
         |  WHERE p.source <> a.source
         |),
         |j AS (
         |  SELECT a_src, b_src,
         |    CASE WHEN (a_tok > b_tok OR (a_tok = b_tok AND a_id < b_id))
         |              <> (substr(md5(concat(CAST(a_id AS STRING), '|',
         |                                    CAST(b_id AS STRING))), 1, 1) < '4')
         |         THEN 1 ELSE 0 END AS win_a
         |  FROM pair0
         |)
         |SELECT LEAST(a_src, b_src) AS si, GREATEST(a_src, b_src) AS sj,
         |  COUNT(*) AS n,
         |  CAST(SUM(CASE WHEN (a_src < b_src AND win_a = 1)
         |                  OR (a_src > b_src AND win_a = 0)
         |           THEN 1 ELSE 0 END) AS BIGINT) AS w_i
         |FROM j GROUP BY LEAST(a_src, b_src), GREATEST(a_src, b_src)""".stripMargin
    }

  /** The pairwise win-rate matrix — the first readout of any
    * preference dataset (annotator dashboards, model-vs-model
    * comparison tables). One scan of the source-pair artifact. */
  val prefWinrate: StagedOp = StagedOp(
    stages = Seq(prefCmpStage),
    body = { _ =>
      s"""SELECT si AS source_a, sj AS source_b,
         |  n AS n_comparisons, w_i AS wins_a,
         |  ${r6("CAST(w_i AS DOUBLE) / n")} AS winrate_a
         |FROM pref_cmp ORDER BY si, sj""".stripMargin
    })

  /** One Bradley-Terry minorize-maximize round (Hunter 2004's MM
    * update, the standard BT fitter): s'_i = W_i / Σ_j n_ij/(s_i+s_j),
    * in pure int64 — per-pair terms at 1e12 precision, strengths
    * normalized to mean 1e6 each round (BT is scale-invariant), and a
    * VIRTUAL win+loss against a fixed 1.0 opponent regularizes the
    * never-wins/never-loses endpoints the raw MLE sends to 0/∞.
    * Every CTE is single-referenced; the normalizer is a window. */
  private[ops] def btRound(prev: String, name: String): (String, Dialect => String) =
    name -> { (d: Dialect) =>
      s"""WITH sym AS (
         |  SELECT si AS a, sj AS b, n, w_i AS w FROM pref_cmp
         |  UNION ALL
         |  SELECT sj AS a, si AS b, n, n - w_i AS w FROM pref_cmp
         |),
         |den AS (
         |  SELECT y.a AS src, CAST(SUM(w) AS BIGINT) AS wins,
         |    CAST(SUM(${d.idiv("y.n * 1000000000000", "sa.s + sb.s")}) AS BIGINT) AS den
         |  FROM sym y
         |  JOIN $prev sa ON sa.src = y.a
         |  JOIN $prev sb ON sb.src = y.b
         |  GROUP BY y.a
         |),
         |raw AS (
         |  SELECT d0.src,
         |    ${d.idiv("(d0.wins + 1) * 1000000000000",
                       s"d0.den + ${d.idiv("2 * 1000000000000", "p.s + 1000000")}")} AS s0
         |  FROM den d0 JOIN $prev p ON p.src = d0.src
         |)
         |SELECT src,
         |  GREATEST(${d.idiv("s0 * 1000000",
                              s"GREATEST(${d.idiv("sm", "cnt")}, 1)")}, 1) AS s
         |FROM (SELECT src, s0, CAST(SUM(s0) OVER () AS BIGINT) AS sm,
         |        COUNT(*) OVER () AS cnt FROM raw)""".stripMargin
    }

  private[ops] val BtRounds = 3

  /** Bradley-Terry strength estimation over the preference matrix:
    * [[BtRounds]] staged MM rounds from the uniform start, with the
    * MM monotonicity audited IN-QUERY — the tf-weighted log-likelihood
    * of the judgments under the initial and the final strengths
    * (µ-log2 int64, the [[ulmEmGain]] pattern) and `mm_improves` as an
    * output column the oracle re-proves every run. Everything after
    * the judgment aggregation is source-cardinality. */
  val prefBradleyTerry: StagedOp = {
    val s0Stage = "bt_s0" -> { (_: Dialect) =>
      s"""SELECT src, CAST(1000000 AS BIGINT) AS s FROM (
         |  SELECT si AS src FROM pref_cmp
         |  UNION
         |  SELECT sj AS src FROM pref_cmp
         |)""".stripMargin
    }
    val roundStages = (1 to BtRounds).map { r =>
      btRound(if (r == 1) "bt_s0" else s"bt_s${r - 1}", s"bt_s$r")
    }
    StagedOp(
      stages = Seq(prefCmpStage, s0Stage) ++ roundStages,
      body = { _ =>
        def ll(tbl: String) =
          s"""SELECT CAST(SUM(y.w * (${qlog2("sa.s")} - ${qlog2("sa.s + sb.s")})) AS BIGINT) AS q
             |  FROM (SELECT si AS a, sj AS b, w_i AS w FROM pref_cmp
             |        UNION ALL
             |        SELECT sj AS a, si AS b, n - w_i AS w FROM pref_cmp) y
             |  JOIN $tbl sa ON sa.src = y.a
             |  JOIN $tbl sb ON sb.src = y.b""".stripMargin
        val fin = s"bt_s$BtRounds"
        s"""WITH wl AS (
           |  SELECT a AS src, CAST(SUM(w) AS BIGINT) AS wins, CAST(SUM(n) AS BIGINT) AS n_cmp
           |  FROM (SELECT si AS a, n, w_i AS w FROM pref_cmp
           |        UNION ALL
           |        SELECT sj AS a, n, n - w_i AS w FROM pref_cmp)
           |  GROUP BY a
           |),
           |l0 AS (${ll("bt_s0")}),
           |l1 AS (${ll(fin)})
           |SELECT f.src AS source,
           |  ${r6("CAST(f.s AS DOUBLE) / 1.0e6")} AS strength,
           |  ROW_NUMBER() OVER (ORDER BY f.s DESC, f.src) AS bt_rank,
           |  wl.wins, wl.n_cmp,
           |  ${r6("CAST(l0.q AS DOUBLE) / 1.0e6")} AS loglik_init_bits,
           |  ${r6("CAST(l1.q AS DOUBLE) / 1.0e6")} AS loglik_final_bits,
           |  l1.q >= l0.q AS mm_improves
           |FROM $fin f
           |JOIN wl ON wl.src = f.src
           |CROSS JOIN l0 CROSS JOIN l1
           |ORDER BY f.s DESC, f.src""".stripMargin
      })
  }

  /** Calibration audit of a cheap quality signal against the
    * expensive rule battery — Expected Calibration Error over 10
    * confidence bins: does a one-scan length score (word count
    * against the Gopher lower band — the kind of score a pipeline
    * uses to SKIP full filtering) actually predict the Gopher
    * verdict at its stated confidence? The score deliberately sees
    * only length, so the rules it cannot see (the stop-word gate)
    * surface as per-bin over-confidence — a non-trivial reliability
    * curve, which is the point of the audit. Per-bin exact integer
    * ratios (µ-quantized accuracy and mean confidence), ECE as the
    * doc-weighted |gap| mean via a window — one corpus scan, one
    * 10-row aggregate, no float sums. The readout a curation
    * pipeline reads before trusting a cheap gate at 100 TB (where
    * running the full battery everywhere is the cost). */
  def filterCalibration(d: Dialect): String =
    s"""WITH g AS (SELECT doc_id, text, ${toks(d)} AS toks FROM documents),
       |m AS (
       |  SELECT doc_id,
       |    ${gopherCounts(d)}
       |  FROM g
       |),
       |sc AS (
       |  SELECT doc_id,
       |    LEAST(${d.idiv("1000000 * n_words", "100")}, 1000000) AS conf,
       |    CASE WHEN $GopherPass THEN 1 ELSE 0 END AS pass
       |  FROM m
       |),
       |bins AS (
       |  SELECT LEAST(${d.idiv("conf * 10", "1000001")}, 9) AS bin,
       |    COUNT(*) AS n_docs,
       |    CAST(SUM(pass) AS BIGINT) AS n_pass,
       |    CAST(SUM(conf) AS BIGINT) AS sum_conf
       |  FROM sc GROUP BY LEAST(${d.idiv("conf * 10", "1000001")}, 9)
       |),
       |w AS (
       |  SELECT bin, n_docs,
       |    ${d.idiv("1000000 * n_pass", "n_docs")} AS acc_mu,
       |    ${d.idiv("sum_conf", "n_docs")} AS conf_mu
       |  FROM bins
       |)
       |SELECT bin, n_docs,
       |  ${r6("CAST(conf_mu AS DOUBLE) / 1.0e6")} AS mean_conf,
       |  ${r6("CAST(acc_mu AS DOUBLE) / 1.0e6")} AS pass_rate,
       |  ${r6("CAST(acc_mu - conf_mu AS DOUBLE) / 1.0e6")} AS gap,
       |  ${r6(s"""CAST(${d.idiv("CAST(SUM(n_docs * ABS(acc_mu - conf_mu)) OVER () AS BIGINT)",
                                 "CAST(SUM(n_docs) OVER () AS BIGINT)")} AS DOUBLE) / 1.0e6""")} AS ece
       |FROM w
       |ORDER BY bin""".stripMargin

  /** Token-budget allocation across domains by WATER-FILLING: give
    * every domain an equal share of the budget until its available
    * mass caps it, then re-level the remainder over the uncapped rest
    * — the max-min-fair allocation (equivalently: maximize Σ log t_d
    * under Σ t_d = B, t_d ≤ cap_d), the standard way a mixture
    * schedule spends a token budget without starving small domains.
    * Closed form, no iteration: with caps sorted ascending, domain j
    * is capped iff cap_j·(n−j+1) + prefix_{j−1} ≤ B (a prefix
    * property — window-computable), the water level is the integer
    * share of what capping leaves, and the sub-level remainder is
    * distributed largest-remainder-style (the [[mixTemperature]]
    * rule). Everything is ONE scan → ONE domain-cardinality aggregate
    * → windows: exact int64 (envelope: cap·n ≤ 9e18 — petabyte token
    * masses at thousands of domains), with the two invariants
    * (budget exactly spent, no allocation above its cap) asserted as
    * output columns. */
  def mixWaterfill(d: Dialect): String =
    s"""WITH sc AS (
       |  -- domain = (source × language) cell: heavily skewed masses,
       |  -- so both arms of the water-fill (capped small cells,
       |  -- levelled large ones) are exercised on every corpus
       |  SELECT concat(source, ':', lang) AS source, CAST(SUM(n_chars) AS BIGINT) AS cap
       |  FROM documents GROUP BY concat(source, ':', lang)
       |),
       |t AS (
       |  SELECT source, cap,
       |    CAST(SUM(cap) OVER () AS BIGINT) AS total,
       |    CAST(SUM(cap) OVER (ORDER BY cap, source
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS pfx,
       |    ROW_NUMBER() OVER (ORDER BY cap, source) AS j,
       |    COUNT(*) OVER () AS n
       |  FROM sc
       |),
       |b AS (
       |  SELECT source, cap, total, pfx, j, n,
       |    ${d.idiv("total * 3", "5")} AS budget,
       |    CASE WHEN cap * (n - j + 1) + (pfx - cap) <= ${d.idiv("total * 3", "5")}
       |         THEN 1 ELSE 0 END AS capped
       |  FROM t
       |),
       |k AS (
       |  SELECT source, cap, budget, n, capped,
       |    CAST(SUM(capped) OVER () AS BIGINT) AS nk,
       |    CAST(SUM(CASE WHEN capped = 1 THEN cap ELSE 0 END) OVER () AS BIGINT) AS cmass,
       |    ROW_NUMBER() OVER (PARTITION BY capped ORDER BY source) AS urk
       |  FROM b
       |),
       |a AS (
       |  SELECT source, cap, budget, capped,
       |    CASE WHEN capped = 1 THEN cap
       |         ELSE ${d.idiv("budget - cmass", "GREATEST(n - nk, 1)")}
       |              + CASE WHEN urk <= (budget - cmass) % GREATEST(n - nk, 1)
       |                     THEN 1 ELSE 0 END
       |    END AS alloc
       |  FROM k
       |)
       |SELECT source AS domain, cap AS available, alloc AS allocated, budget,
       |  capped = 1 AS is_capped,
       |  CAST(SUM(alloc) OVER () AS BIGINT) = budget AS fully_allocated,
       |  alloc <= cap AS within_cap
       |FROM a ORDER BY domain""".stripMargin

  /** THE one copy of the cheap conformal filter score (µ-scaled capped
    * word count) — shared by the [[filterConformal]] calibration stage
    * and the streaming gate's Spark-side scorer; a formula change must
    * not be forkable between calibration and deployment. */
  private[ops] def confScoreExpr(d: Dialect, nWords: String): String =
    s"LEAST(${d.idiv(s"1000000 * ($nWords)", "100")}, 1000000)"

  /** The calibrated conformal keep-cutoff τ over the staged `conf_sc`
    * table — the ⌈npos/10⌉-th smallest calibration-positive score, so
    * at most α = 10% of true-pass calibration docs fall below it.
    * Single-sourced: [[filterConformal]]'s body nests it as its tau
    * CTE, and [[graft.streaming.StreamingOps.conformalGate]]'s static
    * side runs it verbatim over the same stage. */
  def confTauSelect(d: Dialect): String =
    s"""  SELECT conf AS tau FROM (
       |    SELECT conf, ROW_NUMBER() OVER (ORDER BY conf, doc_id) AS rk,
       |      COUNT(*) OVER () AS npos
       |    FROM conf_sc WHERE is_cal = 1 AND pass = 1
       |  ) WHERE rk = ${d.idiv("npos + 9", "10")}""".stripMargin

  /** Spark-dialect conf score over a prepared `toks` array column —
    * the streaming gate's scorer, same single-sourced formula as the
    * calibration stage. The BIGINT cast matches the stage's n_words
    * type: size() is INT and 1000000·INT ANSI-throws past 2147
    * words, where the calibration side would have scored fine. */
  def sparkConfExpr: String =
    confScoreExpr(SparkDialect, s"CAST(${SparkDialect.size("toks")} AS BIGINT)")

  /** Split-conformal threshold for a cheap filter score: calibrate the
    * keep-cutoff τ on an md5-split calibration half so that at most
    * α = 10% of the TRUE-pass calibration docs fall below it (a
    * distribution-free false-negative guarantee — the modern way to
    * run a cheap gate in front of an expensive filter with a bounded
    * miss rate), then report the held-out test half's achieved FNR,
    * keep rate and rejection precision. τ is an ordered statistic
    * (one window over calibration positives), every rate is one
    * exact integer ratio, and the α guarantee is re-proven in-query
    * (`cal_within_alpha`: cal_fn·10 ≤ cal_pos — integer compare, no
    * float). The score table is a STAGE: three consumers (the
    * threshold, the calibration audit, the test metrics) would
    * otherwise re-run the token-counting scan per reference. */
  val filterConformal: StagedOp = StagedOp(
    stages = Seq("conf_sc" -> { (d: Dialect) =>
      s"""WITH g AS (SELECT doc_id, text, ${toks(d)} AS toks FROM documents),
         |m AS (
         |  SELECT doc_id, text,
         |    ${gopherCounts(d)}
         |  FROM g
         |)
         |SELECT doc_id,
         |  ${confScoreExpr(d, "n_words")} AS conf,
         |  CASE WHEN $GopherPass THEN 1 ELSE 0 END AS pass,
         |  CASE WHEN ${md5Bucket("text")} < 128 THEN 1 ELSE 0 END AS is_cal
         |FROM m""".stripMargin
    }),
    body = { d =>
      s"""WITH tau AS (
         |${confTauSelect(d)}
         |),
         |agg AS (
         |  SELECT
         |    -- loud guard: an empty calibration split empties the tau
         |    -- CROSS JOIN and every aggregate here — both engines
         |    -- throw on the string cast instead of reporting an
         |    -- all-NULL "calibration" (the conformalGate blackhole)
         |    CASE WHEN MAX(t.tau) IS NULL
         |         THEN CAST('conformal: empty calibration split — no true-pass calibration docs' AS BIGINT)
         |         ELSE CAST(MAX(t.tau) AS BIGINT) END AS tau,
         |    CAST(SUM(CASE WHEN is_cal = 1 AND pass = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cal_pos,
         |    CAST(SUM(CASE WHEN is_cal = 1 AND pass = 1 AND conf < t.tau THEN 1 ELSE 0 END) AS BIGINT) AS cal_fn,
         |    CAST(SUM(CASE WHEN is_cal = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_test,
         |    CAST(SUM(CASE WHEN is_cal = 0 AND pass = 1 THEN 1 ELSE 0 END) AS BIGINT) AS test_pos,
         |    CAST(SUM(CASE WHEN is_cal = 0 AND pass = 1 AND conf < t.tau THEN 1 ELSE 0 END) AS BIGINT) AS test_fn,
         |    CAST(SUM(CASE WHEN is_cal = 0 AND conf >= t.tau THEN 1 ELSE 0 END) AS BIGINT) AS test_keep,
         |    CAST(SUM(CASE WHEN is_cal = 0 AND conf < t.tau AND pass = 0 THEN 1 ELSE 0 END) AS BIGINT) AS test_tn
         |  FROM conf_sc CROSS JOIN tau t
         |)
         |SELECT
         |  ${r6("CAST(tau AS DOUBLE) / 1.0e6")} AS tau,
         |  cal_pos,
         |  ${r6("CAST(cal_fn AS DOUBLE) / cal_pos")} AS cal_fnr,
         |  cal_fn * 10 <= cal_pos AS cal_within_alpha,
         |  CASE WHEN test_pos = 0 THEN NULL
         |       ELSE ${r6("CAST(test_fn AS DOUBLE) / test_pos")} END AS test_fnr,
         |  ${r6("CAST(test_keep AS DOUBLE) / n_test")} AS test_keep_rate,
         |  CASE WHEN n_test - test_keep = 0 THEN NULL
         |       ELSE ${r6("CAST(test_tn AS DOUBLE) / (n_test - test_keep)")} END AS reject_precision
         |FROM agg""".stripMargin
    })

  /** Group-relative reward normalization (the GRPO/RLOO advantage
    * baseline): per group (source plays the prompt), each sample's
    * advantage = (x − μ_group)/σ_group, computed EXACTLY as
    * (n·x − Σx)/√(n·Σx² − (Σx)²) — integer window sums, one
    * correctly-rounded division and sqrt, so the z-scores are
    * bit-identical across engines with no float accumulation.
    * Degenerate groups (n < 2 or zero variance) emit NULL rather than
    * a fake 0 advantage. One scan, one window partition — the same
    * shape at any group count. */
  def rewardGroupNorm(d: Dialect): String =
    s"""WITH t AS (
       |  SELECT doc_id, source,
       |    CAST(${d.size(toks(d))} AS BIGINT) AS reward
       |  FROM documents
       |),
       |s AS (
       |  SELECT doc_id, source, reward,
       |    COUNT(*) OVER (PARTITION BY source) AS n,
       |    CAST(SUM(reward) OVER (PARTITION BY source) AS BIGINT) AS sx,
       |    CAST(SUM(reward * reward) OVER (PARTITION BY source) AS BIGINT) AS sxx
       |  FROM t
       |)
       |SELECT doc_id, source, reward,
       |  -- loud envelope guard (the ULM-vocab pattern): n·sxx and sx²
       |  -- must stay inside int64 or Spark WRAPS silently where DuckDB
       |  -- raises — a group that outgrows the moment envelope throws
       |  -- identically in both engines instead of emitting a wrong
       |  -- z-score (3037000499 = ⌊√(2⁶³−1)⌋)
       |  CASE WHEN sx > 3037000499 OR sxx > ${d.idiv("4611686018427387903", "GREATEST(n, 1)")}
       |       THEN CAST('reward-group-norm: group moment envelope exceeded — rescale rewards first' AS BIGINT)
       |       WHEN n < 2 OR n * sxx - sx * sx <= 0 THEN NULL
       |       ELSE ${r6("CAST(n * reward - sx AS DOUBLE) / sqrt(CAST(n * sxx - sx * sx AS DOUBLE))")}
       |  END AS advantage
       |FROM s ORDER BY doc_id""".stripMargin

  /** DPO/best-of-n preference-pair construction: per prompt group
    * (source × lang plays the prompt), CHOSEN = the top-reward sample
    * and REJECTED = the bottom-reward sample (ties to the smaller
    * doc_id — deterministic in both engines), kept only when the
    * group has ≥ 4 candidates and the margin clears 10% of the chosen
    * reward AND is strictly positive (an integer compare — weak pairs
    * teach a DPO objective nothing and a zero margin is a coin flip;
    * the explicit margin > 0 conjunct matters when chosen_reward = 0,
    * where the 10% gate alone would pass an all-zero-reward group and
    * emit a degenerate chosen_id == rejected_id pair — unreachable
    * with the current ≥1 token-count reward, latent if the reward
    * expression ever changes). ONE scan, ONE window
    * partition (both rank directions share it), and the final rollup
    * groups on the same key the window already partitioned by — no
    * second shuffle. Scale shape: rows = group count, never corpus
    * size. */
  def prefDpoPairs(d: Dialect): String =
    s"""WITH t AS (
       |  SELECT doc_id, concat(source, ':', lang) AS grp,
       |    CAST(${d.size(toks(d))} AS BIGINT) AS reward
       |  FROM documents
       |),
       |w AS (
       |  SELECT doc_id, grp, reward,
       |    COUNT(*) OVER (PARTITION BY grp) AS n,
       |    ROW_NUMBER() OVER (PARTITION BY grp ORDER BY reward DESC, doc_id) AS rk_top,
       |    ROW_NUMBER() OVER (PARTITION BY grp ORDER BY reward ASC, doc_id) AS rk_bot
       |  FROM t
       |),
       |g AS (
       |  SELECT grp, MAX(n) AS n_candidates,
       |    MAX(CASE WHEN rk_top = 1 THEN doc_id END) AS chosen_id,
       |    MAX(CASE WHEN rk_top = 1 THEN reward END) AS chosen_reward,
       |    MAX(CASE WHEN rk_bot = 1 THEN doc_id END) AS rejected_id,
       |    MAX(CASE WHEN rk_bot = 1 THEN reward END) AS rejected_reward
       |  FROM w GROUP BY grp
       |)
       |SELECT grp AS prompt_group, n_candidates,
       |  chosen_id, chosen_reward, rejected_id, rejected_reward,
       |  chosen_reward - rejected_reward AS margin
       |FROM g
       |WHERE n_candidates >= 4
       |  AND (chosen_reward - rejected_reward) * 10 >= chosen_reward
       |  AND chosen_reward - rejected_reward > 0
       |ORDER BY prompt_group""".stripMargin

  /** Multiplicative-weights staircase for [[mixDoremi]]: EXPQ(i) =
    * round(exp(i/16)·10⁹) for i ∈ [−32, 32] — a 1/16-bit grid over the
    * clamped ±2-bit excess range, host-exact via StrictMath (the
    * transcendental-pinning rule: exp never crosses an engine
    * boundary; quantization error ≤ e^(1/32)−1 ≈ 3.2% relative,
    * documented and engine-identical). */
  private[ops] val DoremiExpQ: Seq[Long] =
    (-32 to 32).map(i => math.round(StrictMath.exp(i / 16.0) * 1e9))

  /** DoReMi-style domain reweighting (Xie et al. 2023, arXiv:
    * 2305.10429, data-side instantiation): one multiplicative-weights
    * step that UPWEIGHTS domains with high excess loss. The loss proxy
    * is the corpus unigram-LM surprisal (bits/token off the staged
    * ulm_tf index — the same signal q_text_unigram_lm reads): a
    * domain whose text the corpus LM finds surprising is exactly the
    * under-represented kind DoReMi boosts. Per-domain excess =
    * bits/token − corpus bits/token in exact µ-bits (µ-log2 int64
    * sums), clamped to ±2 bits, stepped through the [[DoremiExpQ]]
    * staircase (signed grid round via floorDiv — Spark DIV truncates
    * toward zero where DuckDB floors), and normalized to ppm by
    * largest remainder (the [[mixTemperature]] rule). Everything
    * after the one ulm_tf scan is domain-cardinality; the
    * normalization identity is asserted in-row. */
  def mixDoremi(d: Dialect): String = {
    // the ulmStair pattern: a CASE over the bounded grid index — both
    // engines evaluate only int64 arithmetic plus this literal table
    val expCase = "CASE " + DoremiExpQ.zipWithIndex.map { case (v, i) =>
      s"WHEN gi = ${i - 32} THEN CAST($v AS BIGINT)"
    }.mkString("\n      ") +
      "\n      ELSE CAST('doremi stair: unreachable grid index' AS BIGINT) END"
    s"""WITH c AS (SELECT doc_id, tf,
       |    CAST(SUM(tf) OVER (PARTITION BY s) AS BIGINT) AS c FROM ulm_tf),
       |n AS (SELECT CAST(SUM(tf) AS BIGINT) AS nn FROM ulm_tf),
       |db AS (
       |  SELECT doc_id,
       |    CAST(SUM(tf) AS BIGINT) AS n_tokens,
       |    CAST(SUM(tf * (${qlog2("nn")} - ${qlog2("c")})) AS BIGINT) AS bits_mu
       |  FROM c CROSS JOIN n GROUP BY doc_id
       |),
       |dd AS (
       |  -- domain = (source × lang) cell: minority-language cells are
       |  -- genuinely surprising under the corpus-wide LM (their tokens
       |  -- are globally rare), so the staircase's upweighting arms are
       |  -- exercised on every corpus — source alone is statistically
       |  -- uniform here and would quantize to an all-uniform readout
       |  SELECT concat(doc.source, ':', doc.lang) AS source, COUNT(*) AS n_docs,
       |    CAST(SUM(b.n_tokens) AS BIGINT) AS toks,
       |    CAST(SUM(b.bits_mu) AS BIGINT) AS bits_mu
       |  FROM db b JOIN documents doc ON b.doc_id = doc.doc_id
       |  GROUP BY concat(doc.source, ':', doc.lang)
       |),
       |g AS (SELECT source, n_docs, toks, bits_mu,
       |    CAST(SUM(toks) OVER () AS BIGINT) AS gtoks,
       |    CAST(SUM(bits_mu) OVER () AS BIGINT) AS gbits,
       |    COUNT(*) OVER () AS nd
       |  FROM dd),
       |x AS (
       |  SELECT source, n_docs, toks, nd,
       |    ${d.idiv("bits_mu", "toks")} AS bpt_mu,
       |    ${d.idiv("gbits", "gtoks")} AS gbpt_mu
       |  FROM g
       |),
       |e AS (
       |  SELECT source, n_docs, toks, nd, bpt_mu, gbpt_mu,
       |    LEAST(GREATEST(bpt_mu - gbpt_mu, -2000000), 2000000) AS exq
       |  FROM x
       |),
       |gi AS (
       |  SELECT source, n_docs, toks, nd, bpt_mu, gbpt_mu, exq,
       |    ${floorDiv(d)("exq + 31250", "62500")} AS gi
       |  FROM e
       |),
       |w AS (
       |  SELECT source, n_docs, toks, nd, bpt_mu, gbpt_mu, exq,
       |    $expCase AS wq
       |  FROM gi
       |),
       |t AS (SELECT source, n_docs, toks, nd, bpt_mu, gbpt_mu, exq, wq,
       |    CAST(SUM(wq) OVER () AS BIGINT) AS tw FROM w),
       |alloc AS (
       |  SELECT source, n_docs, toks, nd, bpt_mu, gbpt_mu, exq, wq,
       |    ${d.idiv("1000000 * wq", "tw")} AS base,
       |    (1000000 * wq) % tw AS rem
       |  FROM t
       |),
       |ranked AS (
       |  SELECT source, n_docs, toks, nd, bpt_mu, gbpt_mu, exq, base,
       |    ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rk,
       |    CAST(1000000 - SUM(base) OVER () AS BIGINT) AS leftover
       |  FROM alloc
       |)
       |SELECT source AS domain, n_docs, toks AS n_tokens,
       |  ${r6("CAST(bpt_mu AS DOUBLE) / 1.0e6")} AS bits_per_token,
       |  ${r6("CAST(bpt_mu - gbpt_mu AS DOUBLE) / 1.0e6")} AS excess_bits,
       |  CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS weight_ppm,
       |  (base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END) * nd > 1000000 AS upweighted,
       |  CAST(SUM(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END) OVER () AS BIGINT) = 1000000
       |    AS fully_normalized
       |FROM ranked ORDER BY domain""".stripMargin
  }

  /** Staged wrapper: [[mixDoremi]] reads the shared ulm_tf index. */
  val mixDoremiOp: StagedOp = StagedOp(
    stages = textUnigramLm.stages,
    body = mixDoremi)

  /** Resample count and weight cap for [[evalBootstrap]]. */
  private[ops] val BootB = 64
  private[ops] val BootWMax = 8

  /** Cumulative Poisson(1) thresholds at 48-bit resolution —
    * T_k = ⌊CDF(k−1)·2⁴⁸⌋, so a 48-bit uniform u draws weight
    * w = |{k : u ≥ T_k}| ~ Poisson(1), truncated at [[BootWMax]]
    * (P(w > 8) ≈ 1.1e−6 — a bounded, documented truncation both
    * engines share). Host-exact at 60 digits (the transcendental-
    * pinning rule: e⁻¹ never crosses an engine boundary, only these
    * integer literals do). */
  private[ops] val PoissonT: Seq[Long] = {
    val mc = new java.math.MathContext(60)
    val one = BigDecimal(1, mc)
    // e^{-1} by the alternating factorial series, |error| < 1/51!
    var term = one
    var einv = one
    for (j <- 1 to 50) { term = term / j; einv += (if (j % 2 == 1) -term else term) }
    val pow48 = BigDecimal(1L << 48)
    var invFact = one   // 1/j! running
    var cum = BigDecimal(0, mc) // Σ_{j<k} 1/j!
    (1 to BootWMax).map { k =>
      cum += invFact    // now Σ_{j<=k-1} 1/j!
      invFact = invFact / k
      (einv * cum * pow48).setScale(0, BigDecimal.RoundingMode.FLOOR).toLongExact
    }
  }

  /** Poisson bootstrap over the corpus pass-rate — THE distributed
    * bootstrap (Chamandy et al. 2012): a true multinomial resample
    * needs a global draw, but Poisson(1) per-doc weights are
    * independent, so each of the [[BootB]] resamples is ONE narrow
    * map-side expression and the whole CI costs docs×B tiny rows that
    * collapse to B partial aggregates before any shuffle. Weights are
    * deterministic and engine-portable: a 48-bit md5 uniform per
    * (doc, replicate) stepped through the [[PoissonT]] integer
    * staircase. Per-replicate rates are µ-quantized int64 (exact
    * division — ranking and the ordered-statistic CI never compare
    * doubles), the CI is the 2.5%/97.5% ordered ranks — BOTH derived
    * from [[BootB]] (⌈0.025·B⌉ and B+1−⌈0.025·B⌉; a literal pair
    * would silently desynchronize if B changes), and the bootstrap
    * SE comes off exact integer moments. The empty-resample guard
    * throws loudly in both engines rather than silently shifting
    * ranks. */
  def evalBootstrap(d: Dialect): String = {
    // ceil(0.025·B) as exact integer arithmetic: (B + 39) / 40
    val loRank = (BootB + 39) / 40
    val hiRank = BootB + 1 - loRank
    val wSum = PoissonT.map(t => s"(CASE WHEN u >= $t THEN 1 ELSE 0 END)")
      .mkString("(", "\n      + ", ")")
    val rep =
      s"""SELECT doc_id, pass, ${d.seqArray("1", BootB.toString)} AS bs
         |  FROM p""".stripMargin
    s"""WITH g AS (SELECT doc_id, text, ${toks(d)} AS toks FROM documents),
       |m AS (
       |  SELECT doc_id,
       |    ${gopherCounts(d)}
       |  FROM g
       |),
       |p AS (SELECT doc_id, CASE WHEN $GopherPass THEN 1 ELSE 0 END AS pass FROM m),
       |pb AS (
       |  ${d.explode(rep, "doc_id, pass", "bs", "b")}
       |),
       |hb AS (
       |  SELECT b, pass,
       |    md5(concat(CAST(doc_id AS STRING), '#', CAST(b AS STRING))) AS mh
       |  FROM pb
       |),
       |uv AS (SELECT b, pass, ${md5U48("mh")} AS u FROM hb),
       |wv AS (SELECT b, pass, $wSum AS w FROM uv),
       |rb AS (
       |  SELECT b,
       |    CAST(SUM(w * pass) AS BIGINT) AS wpass,
       |    CAST(SUM(w) AS BIGINT) AS wtot
       |  FROM wv GROUP BY b
       |),
       |rq AS (
       |  SELECT b,
       |    CASE WHEN wtot = 0
       |         THEN CAST('eval-bootstrap: empty Poisson resample — corpus too small' AS BIGINT)
       |         ELSE ${d.idiv("wpass * 1000000", "wtot")} END AS rq
       |  FROM rb
       |),
       |ord AS (SELECT b, rq, ROW_NUMBER() OVER (ORDER BY rq, b) AS rk FROM rq),
       |st AS (
       |  SELECT COUNT(*) AS nb,
       |    CAST(SUM(rq) AS BIGINT) AS s1,
       |    CAST(SUM(rq * rq) AS BIGINT) AS s2,
       |    MAX(CASE WHEN rk = $loRank THEN rq END) AS lo,
       |    MAX(CASE WHEN rk = $hiRank THEN rq END) AS hi
       |  FROM ord
       |),
       |pt AS (SELECT COUNT(*) AS n_docs, CAST(SUM(pass) AS BIGINT) AS np FROM p)
       |SELECT n_docs,
       |  ${r6("CAST(np AS DOUBLE) / n_docs")} AS pass_rate,
       |  ${r6("CAST(lo AS DOUBLE) / 1.0e6")} AS ci_lo,
       |  ${r6("CAST(hi AS DOUBLE) / 1.0e6")} AS ci_hi,
       |  ${r6("sqrt(CAST(nb * s2 - s1 * s1 AS DOUBLE) / (nb * (nb - 1))) / 1.0e6")} AS boot_se,
       |  CAST($BootB AS BIGINT) AS n_resamples
       |FROM st CROSS JOIN pt""".stripMargin
  }

  // ---- Johnson-Lindenstrauss random projection: dimensionality
  // reduction for the embedding column with a distortion audit ----

  /** JL projection dimensions. */
  private[ops] val JlDims = 16

  /** Deterministic ±1 projection matrix: sign(k, pos) from the first
    * md5 hex digit of "k:pos" (< '8' → +1 — exactly half the digit
    * space), so the matrix is RNG-free and identical in both engines
    * at any dimensionality. */
  private[ops] val jlSignStage: (String, Dialect => String) =
    "jl_r" -> { (d: Dialect) =>
      s"""WITH ks0 AS (SELECT 0 AS z, ${d.seqArray("0", (JlDims - 1).toString)} AS kk),
         |ks AS (${d.explode("SELECT z, kk FROM ks0", "z", "kk", "k")}),
         |ps AS (SELECT DISTINCT pos FROM pca_q)
         |SELECT k, pos,
         |  CASE WHEN substr(md5(concat(CAST(k AS STRING), ':',
         |                              CAST(pos AS STRING))), 1, 1) < '8'
         |       THEN 1 ELSE -1 END AS r
         |FROM ks CROSS JOIN ps""".stripMargin
    }

  /** Projected vectors (vec_id, k, qp = Σ_pos r·qv in µ-units): one
    * broadcast join of the µ-quantized matrix against the 16×64 sign
    * table + a narrow aggregate — zero shuffles of the vectors beyond
    * the projection's own groupBy, the shape that makes JL the cheap
    * FIRST step before any ANN index at scale. */
  private[ops] val jlProjStage: (String, Dialect => String) =
    "jl_p" -> { (_: Dialect) =>
      s"""SELECT q.vec_id, r.k, CAST(SUM(r.r * q.qv) AS BIGINT) AS qp
         |FROM pca_q q JOIN jl_r r ON r.pos = q.pos
         |GROUP BY q.vec_id, r.k""".stripMargin
    }

  /** The projection read-out: every vector's 16 JL coordinates
    * (scaled by 1/√16 = exactly 1/4). */
  lazy val embedJlProject: StagedOp = StagedOp(
    stages = pcaMatrixStages.take(1) ++ Seq(jlSignStage, jlProjStage),
    body = { _ =>
      s"""SELECT vec_id, k, ${r6("CAST(qp AS DOUBLE) / 4.0e6")} AS proj
         |FROM jl_p ORDER BY vec_id, k""".stripMargin
    })

  /** The JL distortion audit: deterministic pair sample (mod-ring
    * partners, self-pair impossible), per-pair ratio of projected to
    * original Euclidean distance — ‖Pa−Pb‖/√16 over ‖a−b‖ — plus the
    * corpus-level mean distortion and the fraction inside a ±50%
    * band, all from exact int64 sums (projection diffs floor-scaled
    * to milli-units so their squares stay in range; the final
    * sqrt/divisions are single correctly-rounded IEEE ops). The
    * audit that licenses replacing 64-dim distances with 16-dim ones
    * in a downstream dedup/ANN stage. */
  lazy val embedJlDistortion: StagedOp = StagedOp(
    stages = pcaMatrixStages.take(1) ++ Seq(jlSignStage, jlProjStage,
      // the per-pair distortion table is MATERIALIZED (µ-quantized to
      // int64 at the pair grain — the corpus-level mean must never SUM
      // raw doubles, float accumulation is order-dependent across
      // engines): the corpus scalars are then a shuffle-parallel
      // aggregate over the artifact instead of an unpartitioned
      // OVER () window funneling every pair through one partition.
      // Single consumer -> not prewarmed; the build is this query's
      // own computation
      "jl_dd" -> { (d: Dialect) =>
        s"""WITH v AS (SELECT DISTINCT vec_id FROM jl_p),
           |b AS (SELECT vec_id, vec_id % 256 AS bkt FROM v),
           |rep AS (SELECT bkt, MIN(vec_id) AS rep_id FROM b GROUP BY bkt),
           |pr AS (
           |  SELECT b.vec_id AS a_id, r.rep_id AS b_id
           |  FROM b JOIN rep r ON (b.bkt + 128) % 256 = r.bkt
           |  WHERE r.rep_id <> b.vec_id
           |),
           |so AS (
           |  SELECT p.a_id, p.b_id,
           |    CAST(SUM((qa.qv - qb.qv) * (qa.qv - qb.qv)) AS BIGINT) AS so
           |  FROM pr p
           |  JOIN pca_q qa ON qa.vec_id = p.a_id
           |  JOIN pca_q qb ON qb.vec_id = p.b_id AND qb.pos = qa.pos
           |  GROUP BY p.a_id, p.b_id
           |),
           |sp AS (
           |  SELECT p.a_id, p.b_id,
           |    CAST(SUM(${floorDiv(d)("pa.qp - pb.qp", "1000")}
           |             * ${floorDiv(d)("pa.qp - pb.qp", "1000")}) AS BIGINT) AS sp
           |  FROM pr p
           |  JOIN jl_p pa ON pa.vec_id = p.a_id
           |  JOIN jl_p pb ON pb.vec_id = p.b_id AND pb.k = pa.k
           |  GROUP BY p.a_id, p.b_id
           |)
           |SELECT so.a_id AS vec_a, so.b_id AS vec_b,
           |  CASE WHEN so.so = 0 THEN NULL
           |       ELSE CAST(FLOOR(sqrt(CAST(sp.sp AS DOUBLE) * 1.0e6 / 16.0
           |                             / CAST(so.so AS DOUBLE)) * 1.0e6 + 5.0e-1) AS BIGINT)
           |  END AS dmu
           |FROM so JOIN sp ON sp.a_id = so.a_id AND sp.b_id = so.b_id""".stripMargin
      }),
    body = { _ =>
      s"""WITH g AS (
         |  SELECT CAST(SUM(dmu) AS BIGINT) AS sd,
         |    CAST(SUM(CASE WHEN dmu IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn,
         |    CAST(SUM(CASE WHEN dmu BETWEEN 500000 AND 1500000 THEN 1 ELSE 0 END) AS BIGINT) AS nb
         |  FROM jl_dd
         |)
         |SELECT vec_a, vec_b,
         |  CAST(dmu AS DOUBLE) / 1.0e6 AS distortion,
         |  ${r6("CAST(g.sd AS DOUBLE) / 1.0e6 / g.nn")} AS mean_distortion,
         |  ${r6("CAST(g.nb AS DOUBLE) / g.nn")} AS frac_within_50pct
         |FROM jl_dd CROSS JOIN g
         |ORDER BY vec_a, vec_b""".stripMargin
    })

  val ulmDrift: StagedOp = StagedOp(
    stages = ulmPrune64.stages :+ ulmPruneWinStage(ulmPruneFin, "ulm_segf"),
    body = { _ =>
      s"""WITH seg AS (
         |  SELECT w, CAST(SUM(cnt) AS BIGINT) AS np,
         |    MAX(CASE WHEN ln > 1 THEN 1 ELSE 0 END) AS has_multi
         |  FROM ulm_segf GROUP BY w
         |)
         |SELECT d.source,
         |  CAST(SUM(t.tf) AS BIGINT) AS n_words,
         |  ${r6("CAST(SUM(t.tf * g.np) AS DOUBLE) / SUM(t.tf)")} AS fertility,
         |  ${r6("CAST(SUM(t.tf * (1 - g.has_multi)) AS DOUBLE) / SUM(t.tf)")} AS allsingle_rate
         |FROM ulm_tf t
         |JOIN documents d ON d.doc_id = t.doc_id
         |JOIN seg g ON g.w = t.s
         |GROUP BY d.source
         |ORDER BY d.source""".stripMargin
    })


  /** One BPE-training iteration: count adjacent character pairs
    * weighted by word frequency and propose the top merge candidates
    * — the tokenizer-fitting step of an LLM data pipeline, computed
    * the way real BPE trainers do it at scale: the corpus collapses
    * ONCE to the word-frequency table (the only corpus-sized shuffle,
    * shared with the staged [[textUnigramLm]] index), and pair
    * counting then runs over the VOCABULARY (unique words × word
    * length — orders of magnitude smaller than the corpus), as a
    * narrow position-explode + one tiny aggregate. Counts are exact
    * integers; the top-20 is deterministically tie-broken by pair. */
  val bpePairs: StagedOp = StagedOp(
    stages = textUnigramLm.stages,
    body = { d =>
      s"""WITH vocab AS (
         |  SELECT s AS w, CAST(SUM(tf) AS BIGINT) AS c FROM ulm_tf GROUP BY s
         |),
         |wi AS (SELECT w, c, ${d.seqArray("1", "length(w) - 1")} AS ii FROM vocab),
         |pe AS (${d.explode("SELECT w, c, ii FROM wi", "w, c", "ii", "i")})
         |SELECT substr(w, i, 2) AS pair, CAST(SUM(c) AS BIGINT) AS cnt
         |FROM pe GROUP BY substr(w, i, 2)
         |ORDER BY cnt DESC, pair LIMIT 20""".stripMargin
    })

  /** BPE merge TRAINING loop — 3 rounds of the byte-pair-encoding
    * update rule over the corpus vocabulary, the genuinely iterative
    * tokenizer-training op (q_bpe_pairs only counts; this MERGES and
    * re-counts):
    *   round r: count adjacent symbol pairs weighted by word
    *   frequency → pick the (count DESC, pair ASC) winner → rewrite
    *   every word's symbol sequence with the pair fused.
    * The fuse is RELATIONAL, not a string replace: a naive
    * `replace(' a b ', ' ab ')` consumes the shared delimiter space
    * and silently skips every second occurrence of a back-to-back
    * pair (`b a n a n a` under merge (a,n) would lose the second
    * `an`), so occurrences are marked per position, grouped into
    * consecutive-match runs (gaps-and-islands), and merged at the
    * EVEN offsets within each run — exactly greedy left-to-right
    * non-overlapping BPE (`a a a` → `aa a`, `banana` → `b an an a`),
    * asserted against a from-first-principles Scala trainer on
    * corpora that include back-to-back pairs. Each round is a staged
    * artifact (the recurrence reads its predecessor twice — the
    * staged-rounds rule for recurrences, see k-core), and every
    * per-round table is vocabulary-cardinality, never corpus-
    * cardinality — at 100 TB the corpus is touched once (the ulm_tf
    * stage); the loop runs on the tiny aggregated vocab, which is
    * exactly how production BPE trainers are structured. The round
    * stages are prewarmed in Bench: TWO consumers read them (the
    * merge-list readout and [[bpeEncode]]), and the two-consumer rule
    * overrides keep-it-timed — training cost is visible in the
    * prewarm, and trainer correctness is carried by the oracle gate
    * plus the independent-trainer spec, not by a bench number. */
  val bpeMerges: StagedOp = {
    val rounds = 3
    def topStage(d: Dialect, prev: String): String =
      s"""WITH va AS (
         |  SELECT w, c, ${d.filter(d.split("sym", " "), "x -> x <> ''")} AS arr
         |  FROM $prev
         |),
         |wi AS (SELECT w, c, arr, ${d.seqArray("1", s"${d.size("arr")} - 1")} AS ii FROM va),
         |pe AS (${d.explode("SELECT w, c, arr, ii FROM wi", "w, c, arr", "ii", "i")}),
         |pr AS (SELECT ${d.elem("arr", "i")} AS a, ${d.elem("arr", "i + 1")} AS b, c FROM pe),
         |pc AS (SELECT a, b, CAST(SUM(c) AS BIGINT) AS cnt FROM pr GROUP BY a, b)
         |SELECT a, b, cnt FROM pc ORDER BY cnt DESC, a, b LIMIT 1""".stripMargin
    // greedy left-to-right non-overlapping fuse: mark matches, group
    // consecutive matched positions into runs, merge at even offsets
    // within each run, and drop the symbol AFTER each merge point
    def mergeStage(d: Dialect, prev: String, top: String): String =
      s"""WITH va AS (
         |  SELECT w, c, ${d.filter(d.split("sym", " "), "x -> x <> ''")} AS arr
         |  FROM $prev
         |),
         |px AS (SELECT w, c, arr, ${d.seqArray("1", d.size("arr"))} AS ii FROM va),
         |pe AS (${d.explode("SELECT w, c, arr, ii FROM px", "w, c, arr", "ii", "i")}),
         |mk AS (
         |  SELECT p.w, p.c, p.arr, p.i,
         |    CASE WHEN p.i < ${d.size("p.arr")}
         |           AND ${d.elem("p.arr", "p.i")} = t.a
         |           AND ${d.elem("p.arr", "p.i + 1")} = t.b THEN 1 ELSE 0 END AS m
         |  FROM pe p CROSS JOIN $top t
         |),
         |run AS (
         |  SELECT w, c, arr, i, m,
         |    CASE WHEN m = 1 THEN i - ROW_NUMBER() OVER (
         |      PARTITION BY w, m ORDER BY i) ELSE NULL END AS grp
         |  FROM mk
         |),
         |fused AS (
         |  SELECT w, c, arr, i,
         |    CASE WHEN m = 1
         |           AND (i - MIN(i) OVER (PARTITION BY w, grp)) % 2 = 0
         |         THEN 1 ELSE 0 END AS do_merge
         |  FROM run
         |),
         |emitd AS (
         |  SELECT w, c, arr, i, do_merge,
         |    COALESCE(LAG(do_merge) OVER (PARTITION BY w ORDER BY i), 0) AS prev_m
         |  FROM fused
         |)
         |SELECT w, c,
         |  ' ' || ${d.stringAggOrdered(
                s"""CASE WHEN do_merge = 1
                   |      THEN ${d.elem("arr", "i")} || ${d.elem("arr", "i + 1")}
                   |      ELSE ${d.elem("arr", "i")} END""".stripMargin, "i", " ")} || ' ' AS sym
         |FROM emitd WHERE prev_m = 0
         |GROUP BY w, c""".stripMargin
    val roundStages = (1 to rounds).flatMap { r =>
      val prev = if (r == 1) "bpe_v0" else s"bpe_m${r - 1}"
      Seq(
        s"bpe_t$r" -> { (d: Dialect) => topStage(d, prev) },
        s"bpe_m$r" -> { (d: Dialect) => mergeStage(d, prev, s"bpe_t$r") })
    }
    StagedOp(
      stages = (textUnigramLm.stages :+
        ("bpe_v0" -> { (d: Dialect) =>
          s"""SELECT w, c,
             |  concat(' ', ${d.reReplaceAll("w", "(.)", "$1 ")}) AS sym
             |FROM (SELECT s AS w, CAST(SUM(tf) AS BIGINT) AS c FROM ulm_tf GROUP BY s)""".stripMargin
        })) ++ roundStages,
      body = { _ =>
        (1 to rounds).map { r =>
          s"SELECT $r AS round, a AS sym_a, b AS sym_b, cnt FROM bpe_t$r"
        }.mkString("\nUNION ALL\n")
      })
  }

  /** BPE ENCODE — the read path of [[bpeMerges]]: per-doc token vs
    * subtoken counts under the trained merges (the compression number
    * a packing/budget stage tracks per document). The final round's
    * vocabulary table (bpe_m3) ALREADY holds every word's merged
    * symbol sequence — training's own output is the encoder's lookup
    * table, so encoding is one broadcast-sized join from the staged
    * term-frequency index to per-word symbol counts: no re-derivation,
    * no second copy of the merge semantics that could drift from the
    * trainer, and each DISTINCT word is measured once regardless of
    * corpus frequency. */
  val bpeEncode: StagedOp = StagedOp(
    stages = bpeMerges.stages,
    body = { d =>
      s"""WITH n AS (
         |  SELECT w, ${d.size(d.filter(d.split("sym", " "), "x -> x <> ''"))} AS n_syms
         |  FROM bpe_m3
         |)
         |SELECT t.doc_id,
         |  CAST(SUM(t.tf) AS BIGINT) AS n_tokens,
         |  CAST(SUM(t.tf * n.n_syms) AS BIGINT) AS n_subtokens
         |FROM ulm_tf t JOIN n ON t.s = n.w
         |GROUP BY t.doc_id""".stripMargin
    })

  /** Tokenizer-selection A/B — BPE vs unigram-LM over the SAME corpus,
    * the readout a pipeline makes before committing a tokenizer: both
    * trained artifacts ([[bpeMerges]]' final vocabulary, [[ulmViterbi]]'s
    * segmenter) are joined through the one collapsed tf index, so each
    * DISTINCT word is measured once per tokenizer and the corpus is
    * never re-scanned. Corpus-level tf-weighted fertility for each,
    * plus per-doc winner counts (pure int64 comparisons — no float
    * crosses an aggregate). Coverage is total by construction on both
    * sides: bpe_v0 is built FROM ulm_tf's words and the ULM candidate
    * vocabulary includes all single chars, so the inner joins drop
    * nothing. Stage lists of the two families share the
    * [[textUnigramLm]] prefix — dedup by name keeps the oracle's CTE
    * rendering single-copy; on the Spark side the per-JVM stage memo
    * makes the repeat registrations free. Named to sort AFTER
    * q_ulm_viterbi so the timed ulm_seg build stays billed to its
    * owning query (the bench first-consumer rule). */
  val ulmVsBpe: StagedOp = StagedOp(
    stages = (ulmViterbi.stages ++ bpeMerges.stages).distinctBy(_._1),
    body = { d =>
      s"""WITH useg AS (SELECT w, np FROM ulm_seg WHERE segid = 0),
         |bseg AS (
         |  SELECT w, ${d.size(d.filter(d.split("sym", " "), "x -> x <> ''"))} AS n_syms
         |  FROM bpe_m3
         |),
         |per_doc AS (
         |  SELECT t.doc_id,
         |    CAST(SUM(t.tf) AS BIGINT) AS n_words,
         |    CAST(SUM(t.tf * u.np) AS BIGINT) AS ulm_pieces,
         |    CAST(SUM(t.tf * b.n_syms) AS BIGINT) AS bpe_pieces
         |  FROM ulm_tf t
         |  JOIN useg u ON u.w = t.s
         |  JOIN bseg b ON b.w = t.s
         |  GROUP BY t.doc_id
         |),
         |tot AS (SELECT CAST(SUM(tf) AS BIGINT) AS nt FROM ulm_tf)
         |SELECT
         |  COUNT(*) AS n_docs,
         |  -- in-query proof of the total-coverage claim: a future
         |  -- trainer change that drops a word from either vocabulary
         |  -- would deflate the joined sum identically in both engines
         |  -- (oracle-invisible) — this column turns it visible
         |  CAST(SUM(n_words) AS BIGINT) = MAX(t.nt) AS coverage_ok,
         |  CAST(SUM(n_words) AS BIGINT) AS n_words,
         |  CAST(SUM(ulm_pieces) AS BIGINT) AS ulm_pieces,
         |  CAST(SUM(bpe_pieces) AS BIGINT) AS bpe_pieces,
         |  ${r6("CAST(SUM(ulm_pieces) AS DOUBLE) / CAST(SUM(n_words) AS DOUBLE)")} AS ulm_fertility,
         |  ${r6("CAST(SUM(bpe_pieces) AS DOUBLE) / CAST(SUM(n_words) AS DOUBLE)")} AS bpe_fertility,
         |  CAST(SUM(CASE WHEN ulm_pieces < bpe_pieces THEN 1 ELSE 0 END) AS BIGINT) AS ulm_wins,
         |  CAST(SUM(CASE WHEN bpe_pieces < ulm_pieces THEN 1 ELSE 0 END) AS BIGINT) AS bpe_wins,
         |  CAST(SUM(CASE WHEN ulm_pieces = bpe_pieces THEN 1 ELSE 0 END) AS BIGINT) AS ties
         |FROM per_doc CROSS JOIN tot t""".stripMargin
    })

  /** Heavy-hitter bigrams via a Misra-Gries candidate gate: the
    * frequent-n-gram profile (boilerplate phrases, template markers) a
    * corpus pipeline tracks, computed at 100 TB shape — a mergeable
    * k-slot sketch (graft.functions.MisraGriesAgg, O(k) memory
    * regardless of key cardinality) proposes candidates, an exact
    * count over the gated slice verifies, and the 0.1% threshold is
    * integer-exact (cnt·1000 ≥ N). The MG guarantee (any key with
    * share > 1/(k+1) survives the summary; k=1024 ≫ 1000) makes the
    * gate result-invisible, which the oracle proves by running the
    * ungated exact form — the bloom-decontamination pattern applied
    * to frequency. On THIS corpus the bigram vocabulary is smaller
    * than k, so eviction never fires in the query (the sketch
    * degenerates to exact counting); the eviction and merge-reduction
    * paths are exercised adversarially in ExpressionSpec instead —
    * the gate earns its keep on unbounded key spaces (urls, ids,
    * higher-order n-grams). */
  val heavyHitters: StagedOp = StagedOp(
    stages = Seq(
      "hh_bg" -> { d =>
        s"""WITH docs AS (SELECT doc_id, text FROM documents),
           |${d.shingleRows("docs", 2)}
           |SELECT ${d.shingleId("s")} AS sid, s FROM sh""".stripMargin
      }),
    body = { d =>
      s"""WITH ${d.heavyHitterGate("hh_gated", "hh_bg", "sid", 1024)},
         |ex AS (SELECT s AS ngram, COUNT(*) AS cnt FROM hh_gated GROUP BY s),
         |n AS (SELECT COUNT(*) AS nn FROM hh_bg)
         |SELECT ngram, cnt FROM ex CROSS JOIN n WHERE cnt * 1000 >= nn""".stripMargin
    })

  /** RFM (recency / frequency / monetary) customer segmentation — the
    * classic mart rollup, shaped for scale: per-customer metrics are
    * one map-side-combinable aggregate; the quintile boundaries are 12
    * SCALARS (exact interpolated percentiles) that ride a broadcast
    * cross join; scoring is a narrow CASE projection. The naive
    * ntile-over-all-customers form would single-partition the whole
    * customer set — boundaries-then-bucket is the same segmentation
    * without the global sort. Integer-exact: recency in whole days
    * (order dates are midnight UTC, so the /86400 quotient is an
    * integer and one IEEE division is exact), monetary in cents. */
  val ordersRfm: StagedOp = StagedOp(
    stages = Seq(
      // the per-customer metric table is read twice (boundary scalars +
      // scoring) — staged so the orders aggregate runs once, not per
      // CTE reference
      "rfm_per" -> { d =>
        val es = (x: String) => d.epochSeconds(s"CAST($x AS TIMESTAMP)")
        s"""WITH mx AS (SELECT ${es("MAX(o_orderdate)")} AS gmx FROM orders)
           |SELECT o_custkey AS custkey,
           |  CAST((mx.gmx - ${es("MAX(o_orderdate)")}) / 86400 AS BIGINT) AS recency_days,
           |  COUNT(*) AS frequency,
           |  CAST(SUM(CAST(FLOOR(o_totalprice * 1.0e2 + 5.0e-1) AS BIGINT)) AS BIGINT) AS monetary_cents
           |FROM orders CROSS JOIN mx
           |GROUP BY o_custkey, mx.gmx""".stripMargin
      }),
    body = { d => s"""WITH per AS (SELECT * FROM rfm_per),
       |b AS (
       |  SELECT
       |    ${d.percentileCont("recency_days", "0.2")} AS r20, ${d.percentileCont("recency_days", "0.4")} AS r40,
       |    ${d.percentileCont("recency_days", "0.6")} AS r60, ${d.percentileCont("recency_days", "0.8")} AS r80,
       |    ${d.percentileCont("frequency", "0.2")} AS f20, ${d.percentileCont("frequency", "0.4")} AS f40,
       |    ${d.percentileCont("frequency", "0.6")} AS f60, ${d.percentileCont("frequency", "0.8")} AS f80,
       |    ${d.percentileCont("monetary_cents", "0.2")} AS m20, ${d.percentileCont("monetary_cents", "0.4")} AS m40,
       |    ${d.percentileCont("monetary_cents", "0.6")} AS m60, ${d.percentileCont("monetary_cents", "0.8")} AS m80
       |  FROM per
       |)
       |SELECT custkey, recency_days, frequency, monetary_cents,
       |  CASE WHEN recency_days <= r20 THEN 5 WHEN recency_days <= r40 THEN 4
       |       WHEN recency_days <= r60 THEN 3 WHEN recency_days <= r80 THEN 2 ELSE 1 END AS r_score,
       |  CASE WHEN frequency >= f80 THEN 5 WHEN frequency >= f60 THEN 4
       |       WHEN frequency >= f40 THEN 3 WHEN frequency >= f20 THEN 2 ELSE 1 END AS f_score,
       |  CASE WHEN monetary_cents >= m80 THEN 5 WHEN monetary_cents >= m60 THEN 4
       |       WHEN monetary_cents >= m40 THEN 3 WHEN monetary_cents >= m20 THEN 2 ELSE 1 END AS m_score
       |FROM per CROSS JOIN b""".stripMargin
    })

  /** Temperature-weighted source-mixture allocation (the data-mixing
    * step of multi-source training pipelines): each source's sampling
    * mass is its char volume tempered by τ=0.5 (√mass — flattens the
    * head like the multilingual-sampling exponent), and a budget of
    * 1000 samples is split by the largest-remainder method so the
    * allocation is integer-exact and sums to the budget exactly.
    * ⌊√mass⌋ is safe cross-engine (IEEE sqrt is correctly rounded;
    * exact squares stay exact); ⌊1000·wt/tw⌋ is the documented
    * FLOOR-on-division case (quotient gaps ≥ 1/tw dwarf one ulp).
    * Everything after the one map-side-combinable groupBy is
    * source-cardinality — the unpartitioned windows are bounded by the
    * source count at any corpus size. */
  def mixTemperature(d: Dialect): String =
    s"""WITH sc AS (SELECT source, COUNT(*) AS cnt,
       |    CAST(SUM(n_chars) AS BIGINT) AS mass
       |  FROM documents GROUP BY source),
       |w AS (SELECT source, cnt, mass,
       |    CAST(FLOOR(SQRT(CAST(mass AS DOUBLE))) AS BIGINT) AS wt FROM sc),
       |t AS (SELECT source, cnt, mass, wt,
       |    CAST(SUM(wt) OVER () AS BIGINT) AS tw FROM w),
       |alloc AS (SELECT source, cnt, mass, wt,
       |    CAST(FLOOR((1000.0 * wt) / tw) AS BIGINT) AS base,
       |    (1000 * wt) % tw AS rem
       |  FROM t),
       |ranked AS (SELECT source, cnt, mass, wt, base,
       |    ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rk,
       |    CAST(1000 - SUM(base) OVER () AS BIGINT) AS leftover
       |  FROM alloc)
       |SELECT source, cnt, mass, wt,
       |  CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS n_alloc
       |FROM ranked""".stripMargin

  /** Neyman allocation for stratified sampling — the optimal-variance
    * split of a fixed sample budget: stratum h gets n_h ∝ N_h·σ_h
    * (big AND internally-varied strata deserve more samples than big
    * uniform ones — the advance over proportional allocation), here
    * over language strata with doc length as the survey variable,
    * CAPPED at the stratum population (a without-replacement sampler
    * cannot draw 83 docs from an 8-row stratum; capped budget
    * redistributes to the uncapped strata — the [[mixWaterfill]]
    * rule with caps = N_h: sorted by N_h/w_h the capped set is a
    * prefix, tested per row by cross-multiplication). σ_h comes off
    * exact integer moments inside a LOUD envelope guard — n·Σx² and
    * (Σx)² must fit int64, and past the envelope BOTH engines throw
    * the string-cast error instead of Spark ANSI-failing while
    * DuckDB's hugeint silently sails on (the documented-envelope
    * rule; switch to centered or decimal moments past ~3e9 total
    * chars per stratum). The weight ⌊N_h·√(num/den)⌋ is two
    * correctly-rounded IEEE ops on exact operands, so the FLOOR
    * lands identically in both engines; the uncapped remainder is
    * integerized by largest remainder (exact integer remainders,
    * stratum name as the total tie-break). Zero-variance or
    * singleton strata get weight 0 (Neyman's own verdict); a fully
    * degenerate corpus (all weights 0) emits NULL allocations; a
    * budget exceeding the sampleable mass leaves every stratum
    * capped and flags `budget_unfilled` instead of inventing rows.
    * One scan, one stratum groupBy; everything after is
    * strata-cardinality. */
  def sampleNeyman(d: Dialect): String =
    s"""WITH sc0 AS (
       |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(n_chars) AS BIGINT) AS s1,
       |    CAST(SUM(n_chars * n_chars) AS BIGINT) AS s2
       |  FROM documents GROUP BY lang
       |),
       |sc AS (
       |  SELECT lang, n,
       |    CASE WHEN s1 > 3037000499 THEN
       |      CAST('neyman: (sum x)^2 exceeds the int64 moment envelope — use centered/decimal moments' AS BIGINT)
       |    ELSE s1 END AS s1,
       |    CASE WHEN n > 0 AND s2 > ${d.idiv("9223372036854775807", "GREATEST(n, 1)")} THEN
       |      CAST('neyman: n*sum(x^2) exceeds the int64 moment envelope — use centered/decimal moments' AS BIGINT)
       |    ELSE s2 END AS s2
       |  FROM sc0
       |),
       |w AS (
       |  SELECT lang, n,
       |    CASE WHEN n < 2 OR n * s2 - s1 * s1 <= 0 THEN CAST(0 AS BIGINT)
       |         ELSE CAST(FLOOR(CAST(n AS DOUBLE) *
       |                sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE) / (n * (n - 1))))
       |              AS BIGINT) END AS wt,
       |    CASE WHEN n < 2 OR n * s2 - s1 * s1 <= 0 THEN 0.0e0
       |         ELSE ${r6("sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE) / (n * (n - 1)))")}
       |    END AS sigma
       |  FROM sc
       |),
       |-- capped-prefix test over the positive-weight strata, sorted by
       |-- N/w ascending: stratum j is capped iff its proportional share
       |-- of the budget REMAINING after the (smaller-ratio) prefix is
       |-- capped meets its population: n_j·W_suffix ≥/≤ cross-multiplied
       |-- in DOUBLE (correctly-rounded products — both engines land the
       |-- same side; the decision is a design choice, not a comparator)
       |t AS (
       |  SELECT lang, n, wt, sigma,
       |    CAST(SUM(wt) OVER () AS BIGINT) AS tw,
       |    CAST(SUM(wt) OVER (ORDER BY ${d.idiv("1000000 * n", "GREATEST(wt, 1)")}, lang
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS pfxw,
       |    CAST(SUM(n) OVER (ORDER BY ${d.idiv("1000000 * n", "GREATEST(wt, 1)")}, lang
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS pfxn
       |  FROM w WHERE wt > 0
       |),
       |b AS (
       |  SELECT lang, n, wt, sigma, tw,
       |    CASE WHEN CAST(n AS DOUBLE) * (tw - (pfxw - wt))
       |              <= CAST(200 - (pfxn - n) AS DOUBLE) * wt
       |         THEN 1 ELSE 0 END AS capped
       |  FROM t
       |),
       |k AS (
       |  SELECT lang, n, wt, sigma, tw, capped,
       |    CAST(SUM(CASE WHEN capped = 1 THEN n ELSE 0 END) OVER () AS BIGINT) AS cn,
       |    CAST(SUM(CASE WHEN capped = 0 THEN wt ELSE 0 END) OVER () AS BIGINT) AS wu
       |  FROM b
       |),
       |alloc AS (
       |  SELECT lang, n, wt, sigma, tw, capped, cn, wu,
       |    CASE WHEN capped = 1 THEN n
       |         ELSE CAST(${d.idiv("(200 - cn) * wt", "GREATEST(wu, 1)")} AS BIGINT)
       |    END AS base,
       |    CASE WHEN capped = 1 THEN CAST(-1 AS BIGINT)
       |         ELSE ((200 - cn) * wt) % GREATEST(wu, 1) END AS rem
       |  FROM k
       |),
       |ranked AS (
       |  SELECT lang, n, wt, sigma, capped, cn, base,
       |    ROW_NUMBER() OVER (ORDER BY rem DESC, lang) AS rk,
       |    CAST(200 - SUM(base) OVER () AS BIGINT) AS leftover
       |  FROM alloc
       |)
       |SELECT w.lang, w.n, w.sigma, w.wt,
       |  CASE WHEN (SELECT MAX(tw) FROM t) IS NULL THEN NULL
       |       ELSE CAST(COALESCE(
       |         r.base + CASE WHEN r.capped = 0 AND r.rk <= r.leftover
       |                       THEN 1 ELSE 0 END, 0) AS BIGINT)
       |  END AS n_alloc,
       |  COALESCE(r.capped = 1, FALSE) AS is_capped,
       |  -- unfilled ⟺ every stratum is capped and the caps fall short: with
       |  -- any uncapped stratum the largest-remainder pass spends the
       |  -- budget exactly (Σ floor-bases + leftover, leftover < #uncapped)
       |  COALESCE((SELECT MAX(wu) FROM k) = 0
       |           AND (SELECT MAX(cn) FROM k) < 200, TRUE) AS budget_unfilled
       |FROM w LEFT JOIN ranked r ON r.lang = w.lang
       |ORDER BY w.lang""".stripMargin

  /** 32-bit SimHash CTEs over the corpus: md5-derived per-token 32-bit
    * values, per-bit signed majority, reassembled digest. 32 bits keeps
    * the random-collision rate of the band join negligible (16 bits
    * produced tens of thousands of false candidates on random text). */
  private[ops] def simhashCtes(d: Dialect): String =
    s"""${corpusCte(d)},
       |ctoks AS (SELECT doc_id, ${toks(d)} AS toks FROM corpus),
       |tok AS (${d.explode("SELECT doc_id, toks FROM ctoks", "doc_id", "toks", "t")}),
       |${d.simhashDigestCtes}""".stripMargin


  /** SimHash digests per doc. */
  def dedupSimhash(d: Dialect): String =
    s"WITH ${simhashCtes(d)} SELECT doc_id, simhash FROM sim"

  /** SimHash near-dup pairs: byte-band candidates, hamming ≤ 3. The
    * digest table (1 row/doc) is staged; only the band join re-reads it. */
  /** The 4×8-bit simhash band projection over a `(doc_id, simhash)`
    * relation — ONE copy of the band geometry, shared by
    * [[dedupSimhashPairs]]' candidate join and the cascade economics
    * readout ([[SqlOpsDedup.dedupCascadeCost]]), so a band-width
    * change moves both. */
  private[ops] def simhashBandRows(from: String): String =
    (0 until 4).map { b =>
      s"SELECT doc_id, simhash, $b AS band, CAST(FLOOR(simhash / ${1L << (8 * b)}) AS BIGINT) % 256 AS bkey FROM $from"
    }.mkString("\n  UNION ALL\n  ")

  val dedupSimhashPairs: StagedOp = {
    val bands = simhashBandRows("sh_sim")
    StagedOp(
      stages = Seq("sh_sim" -> { d =>
        s"WITH ${simhashCtes(d)} SELECT doc_id, simhash FROM sim"
      }),
      body = { d =>
        s"""WITH sbands AS (
           |  $bands
           |)
           |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           |  bit_count(${d.bitXor("a.simhash", "b.simhash")}) AS hamming
           |FROM sbands a JOIN sbands b
           |  ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
           |WHERE bit_count(${d.bitXor("a.simhash", "b.simhash")}) <= 3""".stripMargin
      })
  }

  /** Sorted-neighborhood near-dup pairs (Hernández & Stolfo's
    * record-linkage method): sort by the simhash digest and compare
    * each doc only to its 3 predecessors in sort order — the
    * complementary blocking strategy to band EQUALITY (bands catch
    * equal-key collisions; sort adjacency catches near keys that
    * straddle a band boundary). Sharded the way the method actually
    * scales: the sort runs WITHIN 256 top-byte blocks (at 100 TB:
    * repartitionByRange on the digest + sortWithinPartitions — the
    * window never spans executors; cross-block misses at the 255
    * boundaries are the method's documented recall trade-off). The
    * lag table is a STAGE so the three per-offset projections read
    * the materialized artifact instead of re-running the window (CTE
    * inlining), and the six LAG calls share one window spec → one
    * Window node. Pairs are LEAST/GREATEST-normalized, hamming ≤ 3
    * like the band verify. */
  val dedupSortedNeighborhood: StagedOp = {
    val w = "(PARTITION BY blk ORDER BY simhash, doc_id)"
    val lags = (1 to 3).flatMap { k =>
      Seq(s"LAG(doc_id, $k) OVER $w AS p$k", s"LAG(simhash, $k) OVER $w AS s$k")
    }.mkString(",\n    ")
    StagedOp(
      stages = dedupSimhashPairs.stages ++ Seq(
        "sn_lag" -> { d =>
          s"""WITH b AS (
             |  SELECT doc_id, simhash, ${d.idiv("simhash", "16777216")} AS blk
             |  FROM sh_sim
             |)
             |SELECT doc_id, simhash,
             |    $lags
             |FROM b""".stripMargin
        }),
      body = { d =>
        val arms = (1 to 3).map { k =>
          s"""SELECT doc_a, doc_b, hamming FROM (
             |  SELECT LEAST(p$k, doc_id) AS doc_a, GREATEST(p$k, doc_id) AS doc_b,
             |    bit_count(${d.bitXor(s"s$k", "simhash")}) AS hamming
             |  FROM sn_lag WHERE p$k IS NOT NULL
             |) t$k WHERE hamming <= 3""".stripMargin
        }.mkString("\nUNION ALL\n")
        s"""SELECT DISTINCT doc_a, doc_b, hamming FROM (
           |$arms
           |) u""".stripMargin
      })
  }

  /** Incremental-ingest dedup: content-addressed anti-join of an
    * incoming crawl snapshot against the already-ingested corpus — the
    * daily-ingestion shape (the reference's cross-run ON CONFLICT
    * merge, generalized from key identity to content identity). Base
    * corpus = the even-id half of the table (yesterday's ingest);
    * incoming = the full fresh snapshot; survivors = incoming docs
    * whose content hash is unseen. NOT EXISTS plans as a hash
    * anti-join: one shuffle on the 128-bit digest (or a broadcast when
    * the base's hash set fits), never a scan-per-row — at 100 TB the
    * base side is the full historical corpus and the digest anti-join
    * is the standard content-addressed ingest gate. */
  def dedupIncremental(d: Dialect): String =
    s"""WITH base AS (
       |  SELECT md5(text) AS ch FROM documents WHERE doc_id % 2 = 0
       |),
       |incoming AS (SELECT doc_id, lang, md5(text) AS ch FROM documents)
       |SELECT i.doc_id, i.lang FROM incoming i
       |WHERE NOT EXISTS (SELECT 1 FROM base b WHERE b.ch = i.ch)""".stripMargin

  /** dense_rank + cume_dist per customer over order value — the two
    * rank functions the window family didn't cover yet. Both are pure
    * functions of the (key, value) multiset (ties collapse in
    * dense_rank and share one cume_dist), so output is deterministic
    * without a tiebreaker; the single shuffle is on o_custkey. */
  def windowDenseCume(d: Dialect): String =
    s"""SELECT o_orderkey, o_custkey, o_totalprice,
       |  dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice) AS dr,
       |  cume_dist()  OVER (PARTITION BY o_custkey ORDER BY o_totalprice) AS cd
       |FROM orders""".stripMargin

  /** Adaptive quality filter: keep documents at or above their
    * DECLARED language's median quality — the per-slice threshold form
    * every mixed-language corpus needs (a single global cutoff
    * over-prunes low-resource languages). Quality is micro-quantized
    * before the percentile so the interpolated median is arithmetic on
    * exact integers (halves at worst) — engine-identical; the
    * comparison runs on the quantized values too. The median table is
    * language-cardinality (broadcast join); one narrow scoring pass +
    * one lang-keyed aggregate. */
  val qualityAdaptiveFilter: StagedOp = StagedOp(
    stages = Seq(
      // the per-doc metrics table is read TWICE (median aggregate +
      // join-back filter); Spark inlines CTEs, so the un-staged form
      // ran the tokenize + score pipeline twice per query (round-4
      // bench: 6.65 s). Staged it is one tokenization pass, and the
      // narrow (doc_id, lang, qmicro) table serves both consumers.
      "qa_m" -> { d =>
        s"""WITH qtoks AS (SELECT doc_id, lang, text, ${toks(d)} AS toks FROM documents)
           |SELECT doc_id, lang,
           |  CAST(FLOOR((${qualityFormula(
                  d.size("toks"),
                  s"CAST(${stopHitsExpr(d)} AS DOUBLE) / ${d.size("toks")}",
                  s"CAST(length(replace(text, ' ', '')) AS DOUBLE) / ${d.size("toks")}")}
           |  ) * 1.0e6 + 5.0e-1) AS BIGINT) AS qmicro
           |FROM qtoks""".stripMargin
      }),
    body = { d =>
      s"""WITH med AS (
         |  SELECT lang, ${d.percentileCont("qmicro", "0.5")} AS med_micro
         |  FROM qa_m GROUP BY lang
         |)
         |SELECT m.doc_id, m.lang, m.qmicro / 1.0e6 AS quality,
         |  med.med_micro / 1.0e6 AS lang_median
         |FROM qa_m m JOIN med ON m.lang = med.lang
         |WHERE CAST(m.qmicro AS DOUBLE) >= med.med_micro""".stripMargin
    })

  /** Per-dimension embedding statistics (the normalization table a
    * whitening / feature-scaling stage consumes): n, mean, variance,
    * min, max per position. Components are micro-quantized to int64 —
    * sums and sums of squares are exact integers (|q| ≤ ~1.6e6 →
    * Σq² ≤ ~2.6e12·n, within int64 up to ~3.5e6 vectors per partial;
    * production re-blocks the sum tree before that), and every
    * double op after the casts is the same expression in both
    * engines. One explode + one 64-group aggregate — map-side
    * combinable, no joins. */
  def embeddingDimStats(d: Dialect): String = {
    val qv = qvExpr("v")
    val expV = d.explodeWithPos(
      "SELECT vec_id, embedding FROM embeddings", "vec_id", "embedding", "pos", "v")
    s"""WITH ev AS ($expV),
       |q AS (SELECT vec_id, pos, $qv AS qv FROM ev)
       |SELECT pos, COUNT(*) AS n,
       |  CAST(SUM(qv) AS DOUBLE) / COUNT(*) AS mean_micro,
       |  (CAST(SUM(qv * qv) AS DOUBLE)
       |     - CAST(SUM(qv) AS DOUBLE) * CAST(SUM(qv) AS DOUBLE) / COUNT(*)
       |  ) / COUNT(*) AS var_micro,
       |  MIN(qv) AS min_micro, MAX(qv) AS max_micro
       |FROM q GROUP BY pos""".stripMargin
  }

  /** Whitened (per-dimension standardized) embeddings: z = (v − µ)/σ
    * per position — [[embeddingDimStats]] applied back to the vectors,
    * the feature-scaling step in front of distance-based ops. The
    * stats side is a 64-row aggregate (broadcast join back); the
    * z computation is the same expression tree in both engines over
    * micro-quantized exact integers, so the 1e-6-quantized z codes are
    * bit-identical. Output is one row per vector with the codes as a
    * position-tagged sorted string (scalar, hash-comparable; lpad
    * makes lexicographic order = position order). Constant dimensions
    * (σ = 0) are excluded — z is undefined there. */
  def embeddingWhiten(d: Dialect): String = {
    val qv = qvExpr("v")
    val expV = d.explodeWithPos(
      "SELECT vec_id, embedding FROM embeddings", "vec_id", "embedding", "pos", "v")
    s"""WITH ev AS ($expV),
       |q AS (SELECT vec_id, pos, $qv AS qv FROM ev),
       |st AS (
       |  SELECT pos,
       |    CAST(SUM(qv) AS DOUBLE) / COUNT(*) AS mean_m,
       |    (CAST(SUM(qv * qv) AS DOUBLE)
       |       - CAST(SUM(qv) AS DOUBLE) * CAST(SUM(qv) AS DOUBLE) / COUNT(*)
       |    ) / COUNT(*) AS var_m
       |  FROM q GROUP BY pos
       |),
       |z AS (
       |  SELECT q.vec_id, q.pos,
       |    CAST(FLOOR((CAST(q.qv AS DOUBLE) - s.mean_m) / sqrt(s.var_m) * 1.0e6 + 5.0e-1) AS BIGINT) AS zq
       |  FROM q JOIN st s ON q.pos = s.pos
       |  WHERE s.var_m > 0
       |)
       |SELECT vec_id, COUNT(*) AS n_dims,
       |  ${d.arrayAggSortedStr(
              "concat(lpad(CAST(pos AS STRING), 2, '0'), ':', CAST(zq AS STRING))")} AS whitened
       |FROM z GROUP BY vec_id""".stripMargin
  }

  /** Document-length histogram in log2 buckets (bucket k = lengths in
    * [2^k, 2^(k+1))) — the corpus length profile read before choosing
    * chunk/pack sizes. The bucket index is ⌊log2 n⌋ computed EXACTLY as
    * string-length-of-binary (both engines render n in base 2 without
    * leading zeros) — no floating log to disagree at powers of two.
    * One narrow scan + a bucket-cardinality groupBy (≤ 64 groups at
    * any corpus size); the fraction is one exact int division. */
  def lengthHistogram(d: Dialect): String =
    s"""WITH lt AS (SELECT doc_id, ${d.size(toks(d))} AS n FROM documents),
       |b AS (
       |  SELECT doc_id, n, CAST(length(bin(n)) - 1 AS INT) AS bucket
       |  FROM lt WHERE n > 0
       |)
       |SELECT bucket, COUNT(*) AS n_docs,
       |  MIN(n) AS min_tokens, MAX(n) AS max_tokens,
       |  CAST(COUNT(*) AS DOUBLE) / (SELECT COUNT(*) FROM b) AS frac_docs
       |FROM b GROUP BY bucket""".stripMargin

  /** Key-skew profile of orders per customer: how many keys carry how
    * many rows — the diagnostic that decides whether a join/agg needs
    * salting ([[graft.ops.Relational.saltedJoinRevenue]]) or AQE skew
    * splitting. Two groupBys, both map-side combinable; the second's
    * cardinality is the distinct-count-per-key range (tiny). The
    * row-fraction per bucket is n_orders·n_customers / total — exact
    * int64 products ≪ 2^53, one exact division. */
  def skewProfile(d: Dialect): String =
    s"""WITH pc AS (
       |  SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey
       |)
       |SELECT n_orders, COUNT(*) AS n_customers,
       |  CAST(n_orders * COUNT(*) AS BIGINT) AS n_rows,
       |  CAST(n_orders * COUNT(*) AS DOUBLE) / (SELECT COUNT(*) FROM orders) AS frac_rows
       |FROM pc GROUP BY n_orders""".stripMargin

  /** Type-token ratio (lexical diversity): distinct tokens over total
    * tokens per document — the complement of [[textRepetition]]'s
    * top-token share in a quality-filter stack. The ratio is one exact
    * IEEE division of two ints, bit-identical across engines. */
  def textTtr(d: Dialect): String =
    s"""WITH dtoks AS (SELECT doc_id, ${toks(d)} AS toks FROM documents),
       |tok AS (${d.explode("SELECT doc_id, toks FROM dtoks", "doc_id", "toks", "t")})
       |SELECT doc_id, COUNT(*) AS n_tokens, COUNT(DISTINCT t) AS n_types,
       |  CAST(COUNT(DISTINCT t) AS DOUBLE) / COUNT(*) AS ttr
       |FROM tok GROUP BY doc_id""".stripMargin

  /** Duplicate 3-gram fraction (Gopher's n-gram repetition filter,
    * complementing [[textRepetition]]'s top-token share and
    * [[textTtr]]'s type-token ratio): the fraction of a document's
    * 3-gram occurrences that are repeats of an earlier one —
    * 1 − distinct/total. High values flag boilerplate/looping text.
    * One narrow shingle pass + a per-doc aggregate; the division is
    * one exact IEEE op (both counts < 2^53). Docs shorter than 3
    * tokens have no 3-grams and drop out (same rows both renderings:
    * the explode yields nothing). */
  def textDupNgrams(d: Dialect): String =
    s"""WITH ${shinglesCtes(d, n = 3, from = "documents")}
       |SELECT doc_id, COUNT(*) AS n_ngrams,
       |  COUNT(DISTINCT s) AS n_distinct,
       |  1.0e0 - CAST(COUNT(DISTINCT s) AS DOUBLE) / COUNT(*) AS dup_frac
       |FROM sh GROUP BY doc_id""".stripMargin

  /** MinHash similarity ESTIMATION (the sketch's second job beyond
    * candidate generation): for every band-candidate pair, the fraction
    * of the 8 signature slots that agree — an unbiased estimate of
    * Jaccard similarity read straight off the staged signatures,
    * without touching the shingle sets. At 100 TB this is how pair
    * similarity is scored: the signature table is ~100 bytes/doc while
    * the shingle index is ~the corpus, so est-then-verify gates the
    * expensive exact comparison ([[dedupVerified]]) behind a sketch
    * read. Planted snapshot duplicates estimate at exactly 1.0. */
  val dedupMinhashEst: StagedOp = {
    val agree = (0 until 8).map(j =>
      s"CASE WHEN a.h$j = b.h$j THEN 1 ELSE 0 END").mkString("(", "\n      + ", ")")
    StagedOp(
      stages = dedupMinhash.stages, // same mh_sig/mh_cand artifacts, shared per JVM
      body = { _ =>
        s"""SELECT c.doc_a, c.doc_b,
           |  CAST($agree AS DOUBLE) / 8 AS est_jaccard
           |FROM mh_cand c
           |JOIN mh_sig a ON c.doc_a = a.doc_id
           |JOIN mh_sig b ON c.doc_b = b.doc_id""".stripMargin
      })
  }

  /** Minhash-estimator CALIBRATION — the bias table for the 8-slice
    * signature: every candidate pair scored BOTH ways (sketch estimate
    * agree/8 from [[dedupMinhashEst]]'s join, exact df-capped 3-gram
    * Jaccard from the same staged index [[dedupVerified]] reads),
    * bucketed by exact similarity into the estimator's own ⅛ grid, and
    * averaged per bucket. The readout says where the 8-perm sketch
    * over- or under-calls similarity — exactly what
    * [[lshParamOpt]]-style S-curve tuning assumes away and a 100 TB
    * rollout must check first (an estimator that over-calls at 0.4
    * floods the verify stage; one that under-calls at 0.7 silently
    * loses recall). LEFT JOINs keep candidate pairs whose docs have
    * EMPTY df-capped shingle sets (exact similarity defined 0 there) —
    * an inner join would drop exactly the over-call evidence the
    * calibration exists to surface; the 9-bucket literal domain is
    * LEFT JOINed so empty buckets report n_pairs=0 (the domain-join
    * rule). Per-pair exact values are µ-quantized int64 BEFORE the
    * bucket mean (the µ-sum rule: double sums are order-dependent
    * across engines). Cost: candidate-set-sized joins against two
    * staged indexes — nothing rescans text. */
  val dedupMinhashCalibration: StagedOp = {
    val agree = (0 until 8).map(j =>
      s"CASE WHEN a.h$j = b.h$j THEN 1 ELSE 0 END").mkString("(", "\n      + ", ")")
    StagedOp(
      stages = dedupMinhash.stages ++ dedupNgramJaccard.stages,
      body = { d =>
        s"""WITH cand AS (SELECT doc_a, doc_b FROM mh_cand),
           |$szCte,
           |$interGatedCte,
           |pj AS (
           |  SELECT c.doc_a, c.doc_b,
           |    COALESCE(i.inter, 0) AS inter,
           |    COALESCE(sa.n, 0) + COALESCE(sb.n, 0) - COALESCE(i.inter, 0) AS un
           |  FROM cand c
           |  LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
           |  LEFT JOIN sz sa ON c.doc_a = sa.doc_id
           |  LEFT JOIN sz sb ON c.doc_b = sb.doc_id
           |),
           |pb AS (
           |  SELECT doc_a, doc_b,
           |    CASE WHEN un = 0 THEN 0
           |         ELSE CAST(${d.idiv("8 * inter", "un")} AS BIGINT) END AS bucket,
           |    CASE WHEN un = 0 THEN 0
           |         ELSE ${qvExpr("CAST(inter AS DOUBLE) / un")} END AS qj
           |  FROM pj
           |),
           |est AS (
           |  SELECT c.doc_a, c.doc_b, $agree AS agr
           |  FROM mh_cand c
           |  JOIN mh_sig a ON c.doc_a = a.doc_id
           |  JOIN mh_sig b ON c.doc_b = b.doc_id
           |),
           |j AS (
           |  SELECT p.bucket, p.qj, e.agr
           |  FROM pb p JOIN est e ON p.doc_a = e.doc_a AND p.doc_b = e.doc_b
           |),
           |g AS (
           |  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_pairs,
           |    CAST(SUM(agr) AS BIGINT) AS sagr,
           |    CAST(SUM(qj) AS BIGINT) AS sqj
           |  FROM j GROUP BY bucket
           |),
           |dom AS (${domainRel("bucket", (0 to 8).map(_.toString))})
           |SELECT dom.bucket,
           |  COALESCE(g.n_pairs, 0) AS n_pairs,
           |  CASE WHEN g.n_pairs IS NULL THEN NULL
           |       ELSE ${r6("CAST(g.sagr AS DOUBLE) / (8 * g.n_pairs)")} END AS mean_est,
           |  CASE WHEN g.n_pairs IS NULL THEN NULL
           |       ELSE ${r6(s"CAST(${d.idiv("g.sqj", "g.n_pairs")} AS DOUBLE) / 1.0e6")} END AS mean_exact
           |FROM dom LEFT JOIN g ON dom.bucket = g.bucket
           |ORDER BY dom.bucket""".stripMargin
      })
  }

  /** Shared graph CTEs over the staged candidate pairs: undirected
    * edge list + degrees — the base of [[pagerankStep]] and
    * [[pagerankIter]]. */
  private[ops] val graphCtes: String =
    s"""edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM mh_cand
       |  UNION ALL
       |  SELECT doc_b AS src, doc_a AS dst FROM mh_cand
       |),
       |deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src)""".stripMargin

  /** One PageRank power-iteration step over the minhash candidate-pair
    * graph (undirected; damping 0.85, uniform init rank 1) — the
    * canonical "which duplicates are HUBS" signal on the dedup graph,
    * and the shape of every iterative graph analytic here: edges ⋈ deg
    * (shuffle on src), contribution aggregate (shuffle on dst). Ranks
    * are parts-per-million integers: contributions ⌊1e6/deg⌋, damped
    * sum ⌊85·Σ/100⌋ — all sums exact int64, and each FLOOR sits on a
    * division whose true value is ≥ 1/deg (resp. 1/20) away from the
    * next integer when fractional, so the one rounded IEEE op per
    * division cannot cross an integer boundary: bit-identical across
    * engines with no decimal in the hot path. At 100 TB each step is
    * two bounded shuffles; the iteration driver is the same
    * re-plan-per-round loop the CC operator uses. */
  val pagerankStep: StagedOp = StagedOp(
    stages = dedupMinhash.stages, // same mh_sig/mh_cand artifacts, shared per JVM
    body = { _ =>
      s"""WITH $graphCtes,
         |contrib AS (
         |  SELECT e.dst,
         |    CAST(FLOOR(1.0e6 / d.deg) AS BIGINT) AS c
         |  FROM edges e JOIN deg d ON e.src = d.src
         |),
         |agg AS (SELECT dst AS doc_id, SUM(c) AS s FROM contrib GROUP BY dst)
         |SELECT a.doc_id, g.deg AS degree,
         |  150000 + CAST(FLOOR(CAST(85 * a.s AS DOUBLE) / 1.0e2) AS BIGINT) AS rank_ppm
         |FROM agg a JOIN deg g ON a.doc_id = g.src""".stripMargin
    })

  /** Three unrolled PageRank power iterations in one SQL tree (ranks in
    * micro-units, damping 0.85) — the fixed-depth form an engine
    * without driver loops can run, and the oracle-checkable twin of an
    * iterate-to-convergence driver loop (same per-step shape as
    * [[pagerankStep]]). All arithmetic keeps the integer-exact
    * discipline of the single step: per-edge contributions
    * ⌊r/deg⌋, damped sums ⌊85·Σ/100⌋ — each FLOOR'd division sits
    * ≥ 1/deg (resp. 1/20) from the next integer when fractional,
    * magnitudes stay ≪ 2^53, so both engines produce bit-identical
    * int64 ranks at every depth. */
  val pagerankIter: StagedOp = {
    val nSteps = 3
    val steps = (1 to nSteps).map { k =>
      s"""c$k AS (
         |  SELECT e.dst AS id,
         |    SUM(CAST(FLOOR(CAST(r.r AS DOUBLE) / d.deg) AS BIGINT)) AS s
         |  FROM edges e
         |  JOIN r${k - 1} r ON e.src = r.id
         |  JOIN deg d ON e.src = d.src
         |  GROUP BY e.dst
         |),
         |r$k AS (
         |  SELECT id,
         |    150000 + CAST(FLOOR(CAST(85 * s AS DOUBLE) / 1.0e2) AS BIGINT) AS r
         |  FROM c$k
         |)""".stripMargin
    }.mkString(",\n")
    StagedOp(
      stages = dedupMinhash.stages,
      body = { _ =>
        s"""WITH $graphCtes,
           |r0 AS (SELECT src AS id, 1000000 AS r FROM deg),
           |$steps
           |SELECT id AS doc_id, r AS rank_ppm FROM r$nSteps""".stripMargin
      })
  }

  /** Link prediction over the part CO-PURCHASE graph by common
    * neighbors + Adamic-Adar (Adamic & Adar 2003) — "which two parts
    * are headed for a real co-purchase relationship even though they
    * have none yet", the recommender/substitution signal: a 2-hop
    * path a–m–b through the staged co-purchase edges, scored
    * Σ 1/log2(deg m) so a promiscuous hub neighbor certifies far
    * less than a rare one. The SUBSTRATE choice is the lesson here:
    * the dedup candidate graph is transitively closed by construction
    * (near-dup bands produce cliques — every 2-hop pair is already an
    * edge, so prediction is vacuous there; measured, not assumed),
    * while the support ≥ 2 co-purchase graph is sparse and STABLE in
    * edge count across corpus scale (~2.3k → 3.6k edges at
    * sf0.001 → 0.1: the support floor filters incidental one-off
    * co-orders, which is also what bounds Σ deg(m)² for the 2-hop
    * join — the triangles rule). Edge build: one distinct incidence
    * pass + an order-keyed self-join whose fan-out is bounded by
    * order SIZE, never part cardinality. Score is exact int64: each
    * term ⌊10¹² / qlog2(deg)⌋ (1/log2 in µ-units; [[qlog2]] operands
    * are small-degree ints) with a GREATEST floor for degree-1
    * middles. Top-20 by score, (a, b) tiebreak — TakeOrdered. */
  val linkPrediction: StagedOp = StagedOp(
    stages = Seq(
      "lpr_edges" -> { (_: Dialect) =>
        s"""WITH inc AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
           |e0 AS (
           |  SELECT a.p AS pa, b.p AS pb, CAST(COUNT(*) AS BIGINT) AS supp
           |  FROM inc a JOIN inc b ON a.o = b.o AND a.p < b.p
           |  GROUP BY a.p, b.p
           |  HAVING COUNT(*) >= 2
           |)
           |SELECT pa AS src, pb AS dst, supp FROM e0
           |UNION ALL
           |SELECT pb AS src, pa AS dst, supp FROM e0""".stripMargin
      }),
    body = { d =>
      s"""WITH deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg
         |             FROM lpr_edges GROUP BY src),
         |paths AS (
         |  SELECT e1.src AS a, e2.dst AS b, e1.dst AS m
         |  FROM lpr_edges e1 JOIN lpr_edges e2 ON e1.dst = e2.src
         |  WHERE e1.src < e2.dst
         |),
         |cand AS (
         |  SELECT p.a, p.b, p.m FROM paths p
         |  LEFT JOIN lpr_edges x ON x.src = p.a AND x.dst = p.b
         |  WHERE x.src IS NULL
         |),
         |sc AS (
         |  SELECT c.a, c.b, CAST(COUNT(*) AS BIGINT) AS common_neighbors,
         |    CAST(SUM(${d.idiv("1000000000000",
                   s"GREATEST(${qlog2("dg.deg")}, 1000000)")}) AS BIGINT) AS aa_micro
         |  FROM cand c JOIN deg dg ON dg.src = c.m
         |  GROUP BY c.a, c.b
         |)
         |SELECT a AS part_a, b AS part_b, common_neighbors, aa_micro
         |FROM sc
         |ORDER BY aa_micro DESC, part_a, part_b LIMIT 20""".stripMargin
    })

  /** TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank
    * over the WORD CO-OCCURRENCE graph — nodes are corpus tokens,
    * edges weighted by adjacent-position co-occurrence counts — and
    * the top-ranked tokens are the corpus keywords. The graph build is
    * one positional-shingle pass + a pos+1 self-join (linear in corpus
    * tokens, shuffled on (doc_id, pos) — never all-pairs), staged
    * because the iteration reads it 2·rounds times. The iteration is
    * [[pagerankIter]]'s integer-exact discipline generalized to
    * WEIGHTED edges: contributions ⌊r·w/strength⌋ (rank mass is
    * conserved, so Σr stays ≈ vocab·10⁶ and the int64 product r·w has
    * headroom while rank-mass·max-weight < 9.2e18 — at larger corpora
    * quantize w down), damped sums ⌊85·Σ/100⌋, three unrolled rounds,
    * every value int64 in both engines. Top-20 by final rank with a
    * token tiebreak — ORDER BY+LIMIT, which Spark plans as
    * TakeOrderedAndProject, never a global sort. */
  val textrankKeywords: StagedOp = StagedOp(
    stages = Seq(
      "trk_edges" -> { (d: Dialect) =>
        s"""WITH docs AS (SELECT doc_id, text FROM documents),
           |${d.shingleRowsPos("docs", 1)},
           |adj AS (
           |  SELECT a.s AS src, b.s AS dst, CAST(COUNT(*) AS BIGINT) AS w
           |  FROM shp a JOIN shp b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
           |  WHERE a.s <> b.s
           |  GROUP BY a.s, b.s
           |)
           |SELECT src, dst, CAST(SUM(w) AS BIGINT) AS w FROM (
           |  SELECT src, dst, w FROM adj
           |  UNION ALL
           |  SELECT dst AS src, src AS dst, w FROM adj
           |) u GROUP BY src, dst""".stripMargin
      },
      // node strength has FOUR consumers in the body (r0 + one per
      // round) — the mh_cand rule: stage it, never a CTE
      "trk_str" -> { (_: Dialect) =>
        "SELECT src, CAST(SUM(w) AS BIGINT) AS str FROM trk_edges GROUP BY src"
      }),
    body = { dd =>
      val nSteps = 3
      val steps = (1 to nSteps).map { k =>
        s"""c$k AS (
           |  SELECT e.dst AS id,
           |    SUM(CAST(FLOOR(CAST(r.r * e.w AS DOUBLE) / s.str) AS BIGINT)) AS s
           |  FROM trk_edges e
           |  JOIN r${k - 1} r ON e.src = r.id
           |  JOIN trk_str s ON e.src = s.src
           |  GROUP BY e.dst
           |),
           |r$k AS (
           |  SELECT id,
           |    150000 + CAST(FLOOR(CAST(85 * s AS DOUBLE) / 1.0e2) AS BIGINT) AS r
           |  FROM c$k
           |)""".stripMargin
      }.mkString(",\n")
      // loud int64 envelope for the r·w products: rank mass is
      // conserved (Σr ≤ #nodes·10⁶ under the damped update), so a
      // single rank can reach #nodes·10⁶ and the guard is
      // max(w) ≤ 9.2e18 / (#nodes·10⁶) — checked by division so the
      // guard itself cannot overflow (the CASE-throw discipline;
      // Spark would silently wrap where DuckDB errors)
      s"""WITH r0 AS (
         |  SELECT src AS id,
         |    CASE WHEN (SELECT MAX(w) FROM trk_edges) >
         |           ${dd.idiv("9200000000000",
                  "GREATEST((SELECT COUNT(*) FROM trk_str), 1)")}
         |      THEN CAST('textrank: rank-mass x edge-weight exceeds the int64 envelope — quantize w' AS BIGINT)
         |      ELSE CAST(1000000 AS BIGINT)
         |    END AS r
         |  FROM trk_str
         |),
         |$steps
         |SELECT r.id AS token, s.str AS strength, r.r AS rank_ppm
         |FROM r$nSteps r JOIN trk_str s ON r.id = s.src
         |ORDER BY rank_ppm DESC, token LIMIT 20""".stripMargin
    })

  /** 1-D SPECTRAL WORD EMBEDDING off the PPMI matrix (Levy & Goldberg
    * 2014's observation that word2vec factorizes shifted PMI, done
    * honestly: build positive pointwise mutual information over the
    * co-occurrence graph, power-iterate its dominant eigenvector):
    * reuses [[textrankKeywords]]'s staged co-occurrence counts AND
    * [[graft.ops.SqlOpsCuration]]'s ONE power-iteration chain
    * (powerIterStages — the pcaPower machinery pointed at a token
    * matrix instead of the embedding matrix; key columns are token
    * strings, which the iteration's equi-joins carry unchanged). PPMI
    * cell = max(0, qlog2(w·T / (s_a·s_b))) in µ-log2 int64 (µ-log2,
    * not floor-bits: near-uniform ratios collapse to 0 bits — the
    * dsirWeights lesson), so the matrix is symmetric int64 and every
    * iteration sum is exact under the staged adaptive envelope. The
    * component orders tokens along the corpus's dominant
    * distributional axis — the 1-D embedding a mixing/clustering
    * heuristic can consume without a vector pipeline. */
  lazy val pmiSpectral: StagedOp = StagedOp(
    stages = textrankKeywords.stages ++ (("pmi_cv" -> { (_: Dialect) =>
      s"""WITH t AS (SELECT CAST(SUM(w) AS BIGINT) AS tw FROM trk_edges)
         |SELECT e.src AS vec_id, e.dst AS pos,
         |  GREATEST(0, ${qlog2(
              "CAST(e.w AS DOUBLE) * t.tw / (CAST(sa.str AS DOUBLE) * sb.str)")}) AS cv
         |FROM trk_edges e
         |JOIN trk_str sa ON sa.src = e.src
         |JOIN trk_str sb ON sb.src = e.dst
         |CROSS JOIN t""".stripMargin
    }) +: powerIterStages("pms", "pmi_cv", PcaRounds)),
    body = { d =>
      s"""WITH ${pcaScaled(d, s"pms_w$PcaRounds", "pos", "w", "vq")}
         |SELECT pos AS token,
         |  ${r6("CAST(vq AS DOUBLE) / 1.0e6")} AS component
         |FROM sc""".stripMargin
    })

  /** Prefix-filtering set-similarity self-join (the PPJoin candidate
    * rule): order each document's distinct 5-grams by ascending global
    * document frequency (rarest first), index only the PREFIX of
    * length n − ⌈0.6·n⌉ + 1, and generate candidates from prefix
    * collisions — for Jaccard ≥ t, two qualifying sets MUST share a
    * prefix token under ANY consistent global order, so the gate is
    * recall-lossless while the indexed rows shrink to ~the prefix
    * fraction. The candidate join also applies the PPJoin LENGTH
    * filter — J ≤ min/max, so 5·min(n) ≥ 3·max(n) is a lossless
    * integer-exact prune. The two renderings order ties differently
    * (Spark sorts 64-bit shingle fingerprints, DuckDB strings),
    * giving different CANDIDATE sets — but losslessness holds for
    * each order, so the verified output (exact Jaccard ≥ 0.6 on the
    * uncapped index) is identical, and the oracle gate proves exactly
    * that every run. ⌈0.6n⌉ is computed as ⌊(3n+4)/5⌋ — pure integer
    * arithmetic, no float boundary.
    *
    * 5-gram shingles, not 3: prefix filtering's candidate bound is
    * Σ df², so it needs shingle identities rare enough that "rarest
    * 40% of a doc" means df ≈ 1-2 — on this corpus's flat ~30-word
    * vocabulary, 3-gram space (27e3) saturates (median df 18 at
    * sf0.1, verify join 14s) while 5-gram space (24e6) keeps median
    * df at 2 — the Zipf-tail regime the technique is designed for.
    * This is the third bounded-candidate near-dup path (minhash
    * bands ∪ simhash bands ∪ prefix filter), the one that needs no
    * signatures — just the df table the index already implies. */
  val dedupPrefix: StagedOp = StagedOp(
    stages = Seq(
      "pfx_dsh" -> { d =>
        val sid = d.shingleId("s")
        s"""WITH ${corpusCte(d)},
           |${shinglesCtes(d, n = 5)}
           |SELECT DISTINCT doc_id, $sid AS s FROM sh""".stripMargin
      },
      // the rarity-RANKED index (per-doc ascending global df, position
      // + set size attached) — index construction, not the join: at
      // scale the df table and the per-doc rank ordering are built once
      // with the inverted index (the mh_sig pattern), and every
      // prefix-join run reads them
      "pfx_rk" -> { _ =>
        s"""WITH df AS (SELECT s, COUNT(*) AS df FROM pfx_dsh GROUP BY s)
           |SELECT c.doc_id, c.s,
           |  ROW_NUMBER() OVER (PARTITION BY c.doc_id ORDER BY f.df, c.s) AS rk,
           |  COUNT(*) OVER (PARTITION BY c.doc_id) AS n
           |FROM pfx_dsh c JOIN df f ON c.s = f.s""".stripMargin
      },
      // the doc-grain ARRAY packing of the same index (r15): one row
      // per doc with its sorted distinct shingle set. The batch
      // verify used to join the 500 k-row pfx_dsh index onto the
      // candidates TWICE (two 500 k-row broadcast hash relations per
      // run, then a 300 k-row expansion re-aggregated to pair grain —
      // measured at sf0.1); joining the 10 k-row array table instead
      // moves the same bytes in 50× fewer rows and verifies each pair
      // with ONE native set-intersection call (guide §2.3/§3). The
      // delta/streaming probes keep the row-grain verify against
      // pfx_dsh (their candidate sets are delta-sized, and the
      // standing streaming index dir only carries pfx_rk/pfx_dsh).
      "pfx_arr" -> { d =>
        s"""SELECT doc_id, ${d.arrayAggSorted("s")} AS arr
           |FROM pfx_dsh GROUP BY doc_id""".stripMargin
      }),
    body = { d =>
      // The candidate step also applies the PPJoin POSITION filter: a
      // shared prefix token at (1-indexed, order-consistent) positions
      // (i, j) bounds the overlap by min(i,j) + min(na−i, nb−j) —
      // common tokens at-or-before the match inject ≤ min(i,j)
      // distinct positions, those after ≤ min(na−i, nb−j) — so a pair
      // whose TIGHTEST per-match bound (MIN over shared prefix tokens)
      // is below the overlap threshold α = ⌈3(na+nb)/8⌉ (inter ≥
      // t/(1+t)·(na+nb) for Jaccard t=0.6, integer-exact as
      // ⌊(3(na+nb)+7)/8⌋) cannot verify, under either engine's tie
      // order. Sizes (na, nb) ride along from the prefix rows — the
      // former psz CTE re-scanned the full index and joined it twice
      // per verified pair just to recover them. The candidate
      // fragments are the SHARED pfx* pieces, so this body and the
      // incremental/streaming probes ([[dedupPrefixDelta]],
      // [[prefixProbeBody]]) cannot drift on prefix length, length
      // filter, or α; the verify step here is the r15 ARRAY form
      // (pfx_arr — see the stage comment), equivalent to the probes'
      // row-grain [[pfxVerifySelect]]: |a ∩ b| over distinct-element
      // sets is the same count either way (a zero-intersection pair
      // is absent from the join form and jaccard-0-filtered here; the
      // output set is identical, and the oracle gate re-proves it
      // every run).
      s"""WITH ${pfxPreCte("pfx_rk")},
         |cand AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n AS na, b.n AS nb
         |  FROM pre a JOIN pre b ON a.s = b.s AND a.doc_id < b.doc_id
         |    AND $pfxLenFilter
         |  GROUP BY a.doc_id, b.doc_id, a.n, b.n
         |  HAVING MIN($pfxPosBound) >= ${pfxAlpha("a.n + b.n")}
         |),
         |${pfxVerifyArrSelect(d)}""".stripMargin
    })

  /** Rarity-ranked PREFIX rows (rk ≤ n − ⌈0.6n⌉ + 1 over `rkTbl`) —
    * one copy of the prefix-length rule. */
  private[ops] def pfxPreCte(rkTbl: String): String =
    s"""pre AS (
       |  SELECT doc_id, s, n, rk FROM $rkTbl
       |  WHERE rk <= n - CAST(FLOOR(CAST(3 * n + 4 AS DOUBLE) / 5.0e0) AS BIGINT) + 1
       |)""".stripMargin
  /** PPJoin length filter: J ≥ 0.6 ⇒ 5·min(n) ≥ 3·max(n), lossless. */
  private[ops] val pfxLenFilter = "5 * LEAST(a.n, b.n) >= 3 * GREATEST(a.n, b.n)"
  /** Per-shared-token overlap bound (symmetric in the join sides). */
  private[ops] val pfxPosBound =
    "LEAST(a.rk, b.rk) + LEAST(a.n - a.rk, b.n - b.rk)"
  /** Overlap threshold α = ⌈3·(na+nb)/8⌉ as ⌊(3(na+nb)+7)/8⌋. */
  private[ops] def pfxAlpha(sumN: String): String =
    s"CAST(FLOOR(CAST(3 * ($sumN) + 7 AS DOUBLE) / 8.0e0) AS BIGINT)"
  /** Exact-Jaccard verification of `cand(doc_a, doc_b, na, nb)`
    * against the doc-grain ARRAY index (r15): one native
    * set-intersection per candidate pair instead of the double
    * row-grain join + re-aggregation. Used by the batch self-join
    * body; the probes keep [[pfxVerifySelect]] (see pfx_arr's stage
    * comment for the measured trade). */
  private[ops] def pfxVerifyArrSelect(d: Dialect, arrTbl: String = "pfx_arr"): String =
    s"""pinter AS (
       |  SELECT c.doc_a, c.doc_b, c.na, c.nb,
       |    CAST(${d.arrayIntersectSize("a.arr", "b.arr")} AS BIGINT) AS inter
       |  FROM cand c
       |  JOIN $arrTbl a ON a.doc_id = c.doc_a
       |  JOIN $arrTbl b ON b.doc_id = c.doc_b
       |)
       |SELECT doc_a, doc_b,
       |  ${r6("CAST(inter AS DOUBLE) / (na + nb - inter)")} AS jaccard
       |FROM pinter
       |WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.6""".stripMargin

  /** Exact-Jaccard verification of `cand(doc_a, doc_b, na, nb)`
    * against the uncapped index — the recall-lossless gates above
    * make this the only scoring pass. */
  private[ops] def pfxVerifySelect(dshTbl: String): String =
    s"""pinter AS (
       |  SELECT c.doc_a, c.doc_b, c.na, c.nb, COUNT(*) AS inter
       |  FROM cand c
       |  JOIN $dshTbl a ON a.doc_id = c.doc_a
       |  JOIN $dshTbl b ON b.doc_id = c.doc_b AND b.s = a.s
       |  GROUP BY c.doc_a, c.doc_b, c.na, c.nb
       |)
       |SELECT doc_a, doc_b,
       |  ${r6("CAST(inter AS DOUBLE) / (na + nb - inter)")} AS jaccard
       |FROM pinter
       |WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.6""".stripMargin

  /** The prefix PROBE body, parameterized on the probing side:
    * `newTbl` (a view or parenthesized subquery of `doc_id` — the
    * arriving/new docs, aliased `ni`) probes the staged rarity-ranked
    * index `rkTbl`, with exact verification against `dshTbl`. ONE
    * rendering shared by the incremental batch twin
    * ([[dedupPrefixDelta]] — the NewDoc slice) and the streaming
    * per-batch probe (graft.streaming.StreamingOps.prefixProbeBatch),
    * the abTestFromUsers protocol-sharing pattern. The candidate join
    * runs new × all (`<>` not `<`), normalized via LEAST/GREATEST:
    * a both-new pair appears in both orientations, but every grouped
    * expression and the position bound are SYMMETRIC, so the GROUP BY
    * collapses the doubled orientation without changing MIN or α —
    * which is why the output equals the full self-join restricted to
    * pairs touching a probe doc (pinned in OpsSpec). */
  def prefixProbeBody(newTbl: String, rkTbl: String = "pfx_rk",
                      dshTbl: String = "pfx_dsh"): String =
    s"""WITH ${pfxPreCte(rkTbl)},
       |npre AS (
       |  SELECT p.doc_id, p.s, p.n, p.rk
       |  FROM pre p JOIN $newTbl ni ON p.doc_id = ni.doc_id
       |),
       |cand AS (
       |  SELECT LEAST(a.doc_id, b.doc_id) AS doc_a,
       |    GREATEST(a.doc_id, b.doc_id) AS doc_b,
       |    CASE WHEN a.doc_id < b.doc_id THEN a.n ELSE b.n END AS na,
       |    CASE WHEN a.doc_id < b.doc_id THEN b.n ELSE a.n END AS nb
       |  FROM npre a JOIN pre b ON a.s = b.s AND a.doc_id <> b.doc_id
       |    AND $pfxLenFilter
       |  GROUP BY LEAST(a.doc_id, b.doc_id), GREATEST(a.doc_id, b.doc_id),
       |    CASE WHEN a.doc_id < b.doc_id THEN a.n ELSE b.n END,
       |    CASE WHEN a.doc_id < b.doc_id THEN b.n ELSE a.n END
       |  HAVING MIN($pfxPosBound) >= ${pfxAlpha("MIN(a.n + b.n)")}
       |),
       |${pfxVerifySelect(dshTbl)}""".stripMargin

  /** Incremental prefix-filter dedup — the daily-ingest twin of
    * [[dedupPrefix]] (the dedupMinhashDelta pattern for the PPJoin
    * family): only the NEW docs' prefix rows (the shared 1/16
    * NewDoc slice) probe the staged rarity-ranked index, so the
    * candidate join costs delta × prefix-bucket instead of the
    * corpus-wide prefix self-join, and the verified output is exactly
    * the full [[dedupPrefix]] result restricted to pairs touching a
    * new doc (equivalence pinned in OpsSpec — the position bound's
    * symmetry is what makes the both-new double orientation collapse).
    * At 100 TB this is the difference between a per-batch probe of a
    * standing index and re-joining yesterday's whole corpus. */
  val dedupPrefixDelta: StagedOp = StagedOp(
    stages = dedupPrefix.stages,
    body = { _ =>
      prefixProbeBody(
        s"(SELECT DISTINCT doc_id FROM pfx_dsh WHERE doc_id % $NewDocMod = $NewDocRem)")
    })

  /** Token BURSTINESS (Church & Gale's observation, as the Fano
    * factor): a content word's occurrences CLUSTER in few documents
    * while a function word's spread evenly — the dispersion
    * variance/mean of per-doc counts (zeros included) is ~1 for
    * Poisson-spread tokens and ≫1 for bursty ones. This is the
    * signal a stopword-list builder and a keyword extractor read
    * (TextRank's window statistics approximate it); over a training
    * corpus it flags template/boilerplate tokens (extreme burst =
    * one doc stamps the token thousands of times). Exact integer
    * arithmetic off the SHARED ulm_tf index: with T = Σc and
    * Σc² over all N docs (zero rows contribute zero to both),
    * Fano = (N·Σc² − T²)/(N·T), reported in ppm via one idiv; the
    * 10⁶·N·Σc² product is loud-guarded in double (the CASE-throw
    * discipline). Top-20 by (fano, token) over df ≥ 5 tokens —
    * deterministic, domain-bounded output. */
  val tokenBurstiness: StagedOp = StagedOp(
    stages = textUnigramLm.stages,
    body = { d =>
      s"""WITH m AS (
         |  SELECT s, CAST(SUM(tf) AS BIGINT) AS t,
         |    CAST(SUM(tf * tf) AS BIGINT) AS sc2,
         |    CAST(COUNT(*) AS BIGINT) AS df
         |  FROM ulm_tf GROUP BY s
         |),
         |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nd FROM documents),
         |f AS (
         |  SELECT s, df, t,
         |    CASE WHEN 1.0e6 * CAST(nd AS DOUBLE) * sc2 > 9.0e18
         |           OR CAST(t AS DOUBLE) * t > 9.0e18
         |           OR CAST(nd AS DOUBLE) * t > 9.0e18
         |      THEN CAST('burstiness: ppm products exceed the int64 envelope — rescale' AS BIGINT)
         |      ELSE ${d.idiv("1000000 * (nd * sc2 - t * t)", "nd * t")}
         |    END AS fano_ppm
         |  FROM m CROSS JOIN n WHERE df >= 5
         |)
         |SELECT s AS token, df, t AS total_tf, CAST(fano_ppm AS BIGINT) AS fano_ppm
         |FROM f ORDER BY fano_ppm DESC, token LIMIT 20""".stripMargin
    })

  /** Per-language precision/recall/F1 off the language-ID confusion
    * matrix ([[textLangIdEval]]'s cells, re-aggregated) — the
    * one-row-per-class eval readout a model dashboard renders next to
    * the raw confusion counts. The class domain is the LABEL domain
    * (every lang present in the table, via the domain-join rule — a
    * language the guesser never predicts must still show its row with
    * precision NULL, not vanish); 'und' is a guess value only, never
    * a label, so it contributes to false negatives through the guess
    * cells. Counts are exact int64; the ratios are single divisions
    * on exact operands, NULL-guarded on empty denominators,
    * 6dp-quantized. */
  def langidF1(d: Dialect): String = {
    val (en, id) = langHitExprs(d)
    s"""WITH ltoks AS (SELECT doc_id, lang, ${toks(d)} AS toks FROM documents),
       |guessed AS (
       |  SELECT lang, ${langGuessCase(en, id)} AS lang_guess FROM ltoks
       |),
       |conf AS (
       |  SELECT lang, lang_guess, CAST(COUNT(*) AS BIGINT) AS n
       |  FROM guessed GROUP BY lang, lang_guess
       |),
       |dom AS (SELECT DISTINCT lang FROM documents),
       |per AS (
       |  SELECT d.lang,
       |    COALESCE(SUM(CASE WHEN c.lang = d.lang AND c.lang_guess = d.lang THEN c.n END), 0) AS tp,
       |    COALESCE(SUM(CASE WHEN c.lang <> d.lang AND c.lang_guess = d.lang THEN c.n END), 0) AS fp,
       |    COALESCE(SUM(CASE WHEN c.lang = d.lang AND c.lang_guess <> d.lang THEN c.n END), 0) AS fn
       |  FROM dom d LEFT JOIN conf c
       |    ON c.lang = d.lang OR c.lang_guess = d.lang
       |  GROUP BY d.lang
       |)
       |SELECT lang, CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
       |  CAST(fn AS BIGINT) AS fn,
       |  CASE WHEN tp + fp = 0 THEN NULL
       |       ELSE ${r6("CAST(tp AS DOUBLE) / (tp + fp)")} END AS precision_6,
       |  CASE WHEN tp + fn = 0 THEN NULL
       |       ELSE ${r6("CAST(tp AS DOUBLE) / (tp + fn)")} END AS recall_6,
       |  CASE WHEN 2 * tp + fp + fn = 0 THEN NULL
       |       ELSE ${r6("2.0e0 * tp / (2 * tp + fp + fn)")} END AS f1_6
       |FROM per""".stripMargin
  }

  /** Corpus DIVERSITY by sampled mean pairwise similarity — the
    * self-BLEU-shaped health metric a data-mixing pipeline tracks per
    * source/epoch (a rising mean similarity means the corpus is
    * collapsing toward templates): draw a deterministic ~3% content
    * sample (md5 bucket < 8 — no RNG, engine-portable), compute exact
    * 3-gram Jaccard over ALL sample pairs, and report the mean with
    * non-overlapping pairs counted as 0 via the closed-form C(n,2)
    * denominator (enumerating them would be the n² the sample exists
    * to avoid; only OVERLAPPING pairs ever materialize, bounded by the
    * inverted-index join). Per-pair scores are µ-quantized to int64
    * before the order-independent sum; diversity = 1 − mean. Sampling
    * is over the ORIGINAL documents, not the two-snapshot corpus —
    * the planted snapshot duplicates would floor the metric by
    * construction. Docs whose text yields no 3-gram (< 3 tokens) have
    * no similarity support and are excluded from the population,
    * which the n_docs column makes visible. */
  val corpusDiversity: StagedOp = StagedOp(
    stages = Seq(
      "dvs_dsh" -> { d =>
        s"""WITH samp AS (
           |  SELECT doc_id, text FROM documents WHERE ${md5Bucket("text")} < 8
           |),
           |${shinglesCtes(d, n = 3, from = "samp")}
           |SELECT DISTINCT doc_id, ${d.shingleId("s")} AS s FROM sh""".stripMargin
      }),
    body = { d =>
      s"""WITH nd AS (
         |  SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n FROM dvs_dsh
         |),
         |sz AS (SELECT doc_id, COUNT(*) AS n FROM dvs_dsh GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
         |  FROM dvs_dsh a JOIN dvs_dsh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY a.doc_id, b.doc_id
         |),
         |qj AS (
         |  SELECT ${qvExpr("CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter)")} AS qj
         |  FROM inter i
         |  JOIN sz sa ON i.doc_a = sa.doc_id
         |  JOIN sz sb ON i.doc_b = sb.doc_id
         |),
         |tot AS (SELECT CAST(COALESCE(SUM(qj), 0) AS BIGINT) AS sqj FROM qj)
         |SELECT n AS n_docs,
         |  ${d.idiv("n * (n - 1)", "2")} AS n_pairs,
         |  CASE WHEN n < 2 THEN NULL
         |       ELSE ${r6(s"CAST(sqj AS DOUBLE) / 1.0e6 / ${d.idiv("n * (n - 1)", "2")}")}
         |  END AS mean_jaccard,
         |  CASE WHEN n < 2 THEN NULL
         |       ELSE ${r6(s"1.0e0 - CAST(sqj AS DOUBLE) / 1.0e6 / ${d.idiv("n * (n - 1)", "2")}")}
         |  END AS diversity
         |FROM nd CROSS JOIN tot""".stripMargin
    })

  /** Simpson concentration of the token distribution, per source and
    * corpus-wide — [[corpusDiversity]]'s EXACT-integer sibling (that
    * one estimates mean pairwise doc similarity off a sample; this one
    * is the closed-form probability that two random TOKENS coincide):
    * unbiased Simpson λ = Σ c(c−1) / (N(N−1)) over the token-count
    * marginals, plus the inverse-Simpson effective vocabulary 1/λ —
    * the "how template-collapsed is this source" number a mixing
    * policy compares across sources. The numerator and denominator
    * are pure int64 (the linkageFs marginal identity — no pair ever
    * materializes); Σc(c−1) ≤ N² wraps past ~3e9 tokens per group,
    * guarded loud (at larger corpora the sums move to DECIMAL(38,0),
    * the Gini rule). One join of the staged term frequencies to the
    * doc→source map, one vocab-cardinality aggregate per group; the
    * two final divisions are the only float ops, r6'd. */
  val simpsonDiversity: StagedOp = StagedOp(
    // per-(source, token) counts are a STAGE: the union body reads
    // them twice, and inlined CTEs would run the corpus join+aggregate
    // per reference
    stages = textUnigramLm.stages :+ ("sd_st" -> { (_: Dialect) =>
      s"""SELECT dm.source, t.s, CAST(SUM(t.tf) AS BIGINT) AS c
         |FROM ulm_tf t JOIN documents dm ON t.doc_id = dm.doc_id
         |GROUP BY dm.source, t.s""".stripMargin
    }),
    body = { _ =>
      s"""WITH st AS (
         |  -- the '__all__' rollup label is IN-BAND: a real source by
         |  -- that name would silently merge into the corpus row and
         |  -- lose its own (review-caught) — guard loudly instead
         |  SELECT source, s,
         |    CASE WHEN source = '__all__'
         |      THEN CAST('simpson: source name __all__ collides with the rollup label' AS BIGINT)
         |      ELSE c END AS c
         |  FROM sd_st
         |),
         |both_g AS (
         |  SELECT source, s, c FROM st
         |  UNION ALL
         |  SELECT '__all__' AS source, s, CAST(SUM(c) AS BIGINT) AS c
         |  FROM st GROUP BY s
         |),
         |g0 AS (
         |  SELECT source, CAST(SUM(c) AS BIGINT) AS n,
         |    CAST(SUM(c * (c - 1)) AS BIGINT) AS num,
         |    CAST(COUNT(*) AS BIGINT) AS v
         |  FROM both_g GROUP BY source
         |),
         |g AS (
         |  SELECT source, CASE WHEN n > 3000000000
         |    THEN CAST('simpson: token count exceeds the int64 moment envelope — move to DECIMAL' AS BIGINT)
         |    ELSE n END AS n, num, v
         |  FROM g0
         |)
         |SELECT source, n AS n_tokens, v AS vocab,
         |  CASE WHEN n < 2 THEN NULL
         |       ELSE ${r6("CAST(num AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1))")}
         |  END AS simpson_lambda,
         |  CASE WHEN n < 2 OR num = 0 THEN NULL
         |       ELSE ${r6("(CAST(n AS DOUBLE) * (n - 1)) / num")}
         |  END AS effective_vocab
         |FROM g
         |ORDER BY source""".stripMargin
    })

  /** Sliding-window document chunking (chunk = 16 tokens, stride = 12,
    * overlap = 4) — the RAG/pretraining chunker: every token is covered,
    * consecutive chunks share the overlap, the final chunk ends at the
    * document's last token. Chunk count = 1 + ⌈(n−16)/12⌉ (one chunk
    * when n ≤ 16), computed in doubles (token counts ≪ 2^53, exact).
    * The whole op is a narrow per-doc projection + explode — no
    * shuffle at any scale; chunk ids are (doc_id, chunk_no), the shape
    * a downstream embedding/packing stage consumes. */
  def chunkDocuments(d: Dialect): String = {
    val slice = d.arraySlice("toks", "CAST(chunk_no * 12 + 1 AS INT)", "16")
    s"""WITH ctoks AS (
       |  SELECT doc_id, ${toks(d)} AS toks FROM documents
       |),
       |sized AS (
       |  SELECT doc_id, toks, ${d.size("toks")} AS n_toks FROM ctoks
       |  WHERE ${d.size("toks")} > 0
       |),
       |spans AS (
       |  SELECT doc_id, toks,
       |    ${d.seqArray("0",
             "CASE WHEN n_toks <= 16 THEN 0 ELSE CAST(FLOOR((n_toks - 5) / 1.2e1) AS BIGINT) END")} AS cnos
       |  FROM sized
       |),
       |ch AS (${d.explode("SELECT doc_id, toks, cnos FROM spans", "doc_id, toks", "cnos", "chunk_no")})
       |SELECT doc_id, CAST(chunk_no AS INT) AS chunk_no,
       |  CAST(${d.size(slice)} AS INT) AS n_chunk_toks,
       |  ${d.arrayJoin(slice, " ")} AS chunk_text
       |FROM ch""".stripMargin
  }

  /** Per-document unigram Shannon entropy (bits/token) — the
    * information-density quality signal next to [[textTtr]] and
    * [[textRepetition]]: low entropy = looping/template text.
    * Computed as H = log2(n) − (Σ c·log2 c)/n, which needs only
    * per-(doc,term) counts rolled straight into a per-doc aggregate —
    * one scan, no tf⋈totals self-join (Spark inlines CTEs, so the
    * naive H = Σ (c/n)·log2(n/c) form plans the token pipeline twice
    * plus a join; PlanSpec pins the single-scan shape). Each c·log2 c
    * term is quantized to micro-bits and summed as BIGINT (order-
    * independent), and the final value is floor-rounded to 6dp; log2's
    * last ulp (not correctly rounded in either engine) sits ~6 orders
    * below both quanta — verified identical at all three SFs. (The
    * linear-idf trick of [[textTfIdf]] can't apply: entropy IS the
    * log.) Map-side combinable at every level. */
  def textEntropy(d: Dialect): String =
    s"""WITH etoks AS (SELECT doc_id, ${toks(d)} AS toks FROM documents),
       |tok AS (${d.explode("SELECT doc_id, toks FROM etoks", "doc_id", "toks", "t")}),
       |tf AS (SELECT doc_id, t, COUNT(*) AS c FROM tok GROUP BY doc_id, t),
       |agg AS (
       |  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n, COUNT(*) AS n_types,
       |    SUM(CAST(FLOOR(c * log2(CAST(c AS DOUBLE)) * 1.0e6 + 5.0e-1) AS BIGINT)) AS sq
       |  FROM tf GROUP BY doc_id
       |)
       |SELECT doc_id, n AS n_tokens, n_types,
       |  ${r6("log2(CAST(n AS DOUBLE)) - CAST(sq AS DOUBLE) / 1.0e6 / n")} AS entropy_bits
       |FROM agg""".stripMargin

  /** Stopword scrub: drop function words from every document and emit
    * the cleaned text — the corpus-cleaning counterpart of
    * [[textQuality]]'s stopword RATIO (that one measures, this one
    * rewrites). Pure narrow projection (array filter + join), no
    * shuffle, codegen-friendly; the stoplist is a literal (at 100 TB a
    * real list broadcasts the same way). Exact string output — the
    * strongest oracle comparison available. */
  def textScrub(d: Dialect): String = {
    val stops = d.arrayLit(STOP_EN ++ STOP_ID)
    val kept = d.filter("toks", s"t -> NOT ${d.arrayContains(stops, "t")}")
    s"""WITH stoks AS (SELECT doc_id, ${toks(d)} AS toks FROM documents),
       |sk AS (
       |  SELECT doc_id, ${d.size("toks")} AS n_toks, $kept AS kept FROM stoks
       |)
       |SELECT doc_id,
       |  CAST(n_toks - ${d.size("kept")} AS INT) AS n_removed,
       |  ${d.arrayJoin("kept", " ")} AS clean_text
       |FROM sk""".stripMargin
  }

  /** Symmetric int8 quantization of the embedding column (the vector-
    * storage compression every 100 TB ANN index runs): per-vector scale
    * = max |component|, codes = round(v·127/scale) ∈ [−127, 127].
    * Every arithmetic step is a correctly-rounded IEEE op on exact
    * inputs (float→double widening, one multiply, one divide), so the
    * integer codes are bit-identical across engines — emitted as a
    * joined string, the exact whole-vector comparison. Zero vectors
    * (no scale) are excluded like the nv stages exclude them. Narrow
    * projection: no shuffle, one pass. */
  def embeddingQuantize(d: Dialect): String = {
    val absArr = d.transform("embedding", "v -> abs(CAST(v AS DOUBLE))")
    val codes = d.transform("embedding",
      "v -> CAST(FLOOR(CAST(v AS DOUBLE) * 1.27e2 / maxabs + 5.0e-1) AS BIGINT)")
    s"""WITH ma AS (
       |  SELECT vec_id, embedding, ${d.arrayMax(absArr)} AS maxabs FROM embeddings
       |),
       |qc AS (
       |  SELECT vec_id, $codes AS q8 FROM ma WHERE maxabs > 0
       |)
       |SELECT vec_id, CAST(${d.size("q8")} AS INT) AS n_dims,
       |  ${d.arrayJoin(d.transform("q8", "c -> CAST(c AS STRING)"), ",")} AS codes
       |FROM qc""".stripMargin
  }

  /** One power-iteration step toward the top principal direction:
    * y = Aᵀ(A·v₀) over the embedding matrix with v₀ = 1 — the
    * distributed linear-algebra kernel (uncentered PCA / spectral
    * initialization) done the way a 100 TB matrix does it: A·v is a
    * per-ROW reduction (here a window sum per vec_id — sharded by
    * vector, no global state), Aᵀ(Av) is a per-DIMENSION aggregate
    * (64 groups), and v broadcasts. One explode pipeline, one keyed
    * window, one tiny groupBy — no matrix shuffle. Exact arithmetic:
    * entries are µ-quantized to integers (×1024, round-half-up, which
    * is sign-correct), so every product and sum is int64-exact and
    * the unnormalized iterate is bit-identical across engines
    * (normalization — one float division per dim — is the consumer's
    * step; deferring it keeps the op exact). */
  def pcaPowerStep(d: Dialect): String =
    s"""WITH e AS (
       |  ${d.explodeWithPos("SELECT vec_id, embedding FROM embeddings",
            "vec_id", "embedding", "p", "v")}
       |),
       |q AS (
       |  SELECT vec_id, p,
       |    CAST(FLOOR(CAST(v AS DOUBLE) * 1.024e3 + 5.0e-1) AS BIGINT) AS qv
       |  FROM e
       |),
       |w AS (
       |  SELECT p, qv, CAST(SUM(qv) OVER (PARTITION BY vec_id) AS BIGINT) AS dot
       |  FROM q
       |)
       |SELECT p AS dim, CAST(SUM(qv * dot) AS BIGINT) AS y
       |FROM w GROUP BY p""".stripMargin

  /** 48-bit uniform integer from the leading 12 hex digits of an
    * md5 column — exactly representable in both BIGINT and DOUBLE,
    * so arithmetic on it is engine-exact (same hex-digit arithmetic
    * as [[md5Bucket]], widened). */
  private[ops] def md5U48(hexCol: String): String =
    (1 to 12).map { i =>
      s"CAST(instr('0123456789abcdef', substr($hexCol, $i, 1)) - 1 AS BIGINT) * ${1L << (4 * (12 - i))}"
    }.mkString("(", "\n      + ", ")")

  /** Deterministic weighted sampling: 100 docs chosen by hash priority
    * u/w, where u is a 48-bit content-hash uniform and w = n_chars —
    * keeping the k SMALLEST priorities makes longer documents
    * proportionally more likely to be drawn, with zero RNG state
    * (re-runnable on any engine/partitioning, like [[sampleHash]]).
    * This is priority sampling in the Efraimidis–Spirakis style with a
    * u/w key (a deterministic weighted draw, not their exact u^(1/w)
    * distribution — documented as such). u ≤ 2^48 is exact in DOUBLE
    * and w is an int, so the priority is ONE correctly-rounded IEEE
    * division — bit-identical across engines. The Spark plan is a
    * global top-k (TakeOrderedAndProject), not a single-partition
    * window. */
  def sampleWeighted(d: Dialect): String =
    s"""WITH h AS (
       |  SELECT doc_id, lang, n_chars, md5(text) AS mh
       |  FROM documents WHERE n_chars > 0
       |),
       |pri AS (
       |  SELECT doc_id, lang, n_chars,
       |    CAST(${md5U48("mh")} AS DOUBLE) / n_chars AS priority
       |  FROM h
       |)
       |SELECT doc_id, lang, n_chars, priority FROM pri
       |ORDER BY priority, doc_id LIMIT 100""".stripMargin

  /** Most-characteristic term per document by tf·idf ranking. The idf
    * factor is the *linear* rarity ratio n_docs/df rather than its log:
    * ln() is not correctly-rounded and differs across engines in the
    * last ulp, which would flip near-tie rankings — the linear form is
    * exact integer arithmetic and ranks identically (log is monotone in
    * n_docs/df, so for a fixed tf the order matches; cross-tf trade-offs
    * differ from textbook tf-idf and are documented as such).
    *
    * Plan shape: df is a COUNT window over the tf rows, not a
    * separate GROUP BY t CTE joined back — Spark inlines CTEs, so the
    * join form re-ran the whole token pipeline (scan + explode +
    * (doc,term) aggregate) a second time just to count df. The window
    * form runs the heavy pipeline ONCE; the rank orders by tf/df,
    * which is score order (n_docs is a constant factor, attached from
    * a count-only scan at the end).
    *
    * r15: the (doc, term, tf) rollup IS the staged `ulm_tf` artifact
    * (unigram shingles are exactly `split(text, ' ')` tokens —
    * word_shingles(text, 1) and the oracle's n=1 explode both keep
    * empty tokens, so the token multisets are identical), and ulm_tf
    * already has five other consumers and is prewarmed. Reading it
    * instead of re-tokenizing per run removes the scan+explode+
    * GROUP BY pipeline from every execution (guide §2.4 — the
    * mh_sig/ewma_f multi-consumer rule); the body keeps the window
    * shape unchanged. PlanSpec pins the no-Generate read path. */
  lazy val textTfIdf: StagedOp = StagedOp(
    stages = textUnigramLm.stages,
    body = { _ =>
      s"""WITH tf AS (SELECT doc_id, s AS t, tf FROM ulm_tf),
         |n AS (SELECT COUNT(*) AS n_docs FROM documents),
         |scored AS (
         |  SELECT doc_id, t, tf,
         |    COUNT(*) OVER (PARTITION BY t) AS df
         |  FROM tf
         |),
         |ranked AS (
         |  SELECT *, ROW_NUMBER() OVER (
         |    PARTITION BY doc_id ORDER BY CAST(tf AS DOUBLE) / df DESC, t) AS rn
         |  FROM scored
         |)
         |SELECT doc_id, t AS top_term, tf, df,
         |  CAST(tf * n.n_docs AS DOUBLE) / df AS score
         |FROM ranked CROSS JOIN n WHERE rn = 1""".stripMargin
    })

  /** Per-label embedding statistics: count and mean L2 norm. Norms are
    * bit-identical doubles per row (fixed fold); rounding to 6dp and
    * summing in DECIMAL makes the group aggregate order-independent. */
  def embeddingStats(d: Dialect): String =
    s"""WITH nv AS (SELECT label, sqrt(${d.dot("embedding", "embedding")}) AS nrm FROM embeddings)
       |SELECT label, COUNT(*) AS n,
       |  CAST(SUM(CAST(FLOOR(nrm * 1.0e6 + 5.0e-1) AS BIGINT)) AS DOUBLE) / COUNT(*) / 1.0e6 AS avg_norm
       |FROM nv GROUP BY label""".stripMargin

  /** Edit-distance near-dup: Levenshtein over 40-char prefixes for
    * candidate pairs sharing a (source, length-bucket) — the blocking
    * keys bound the quadratic edit-distance work, the standard shape
    * for fuzzy dedup at scale. Both engines implement the same classic
    * edit distance. Run over the two-snapshot corpus so planted dups
    * surface at distance 0. */
  def dedupLevenshtein(d: Dialect): String =
    s"""WITH ${corpusCte(d, "source")},
       |keyed AS (
       |  SELECT doc_id, substr(text, 1, 40) AS prefix,
       |    concat(source, ':', CAST(CAST(FLOOR(length(text) / 50) AS BIGINT) AS STRING),
       |           ':', substr(text, 1, 3)) AS blk
       |  FROM corpus
       |)
       |SELECT doc_a, doc_b, edit_dist FROM (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    levenshtein(a.prefix, b.prefix) AS edit_dist
       |  FROM keyed a JOIN keyed b
       |    ON a.blk = b.blk AND a.doc_id < b.doc_id
       |) WHERE edit_dist <= 5""".stripMargin

  /** Interval RANGE window frame: 30-day trailing spend per customer —
    * the frame is defined by the ORDER BY value (event time), not row
    * position, so peers and calendar gaps are handled by the engine.
    * Exact decimal sum keeps the frame aggregate order-independent. */
  def windowRangeSpend(d: Dialect): String =
    """SELECT o_custkey, o_orderkey,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate
      |    RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW) AS DOUBLE) AS spend_30d
      |FROM orders""".stripMargin

  /** FIRST_VALUE / LAST_VALUE over the full partition frame: each
    * customer's first and last order (by date, key-tiebroken) plus
    * their order count — the frame must be explicitly UNBOUNDED BOTH
    * (the default frame stops at CURRENT ROW, where LAST_VALUE is just
    * the current row — the classic window-frame trap, identical in
    * both engines only when spelled out). One row per customer via
    * DISTINCT over the constant-per-partition window values. */
  def windowFirstLast(d: Dialect): String =
    """SELECT DISTINCT o_custkey,
      |  FIRST_VALUE(o_orderkey) OVER w AS first_order,
      |  LAST_VALUE(o_orderkey) OVER w AS last_order,
      |  COUNT(*) OVER w AS n_orders
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin

  /** Language-ID confusion matrix: the stopword heuristic's guess
    * against the table's ground-truth lang label — the evaluation rows
    * a model-quality dashboard reads (the same eval shape as
    * [[dedupLshEval]] for the LSH gate). The corpus is majority non-en
    * non-id, so most mass lands in the 'und' row; the interesting
    * cells are en→en recall and the false-en rate. */
  def textLangIdEval(d: Dialect): String = {
    val (en, id) = langHitExprs(d)
    s"""WITH ltoks AS (SELECT doc_id, lang, ${toks(d)} AS toks FROM documents),
       |guessed AS (
       |  SELECT lang, ${langGuessCase(en, id)} AS lang_guess FROM ltoks
       |)
       |SELECT lang, lang_guess, COUNT(*) AS n
       |FROM guessed GROUP BY lang, lang_guess""".stripMargin
  }

  /** Per-group mode (most frequent value) with deterministic tie-break
    * — mode is not a portable built-in, but count + row_number is. */
  def modePriority(d: Dialect): String =
    """SELECT o_orderstatus, o_orderpriority AS mode_priority, n FROM (
      |  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
      |    ROW_NUMBER() OVER (PARTITION BY o_orderstatus
      |      ORDER BY COUNT(*) DESC, o_orderpriority) AS rn
      |  FROM orders GROUP BY o_orderstatus, o_orderpriority
      |) WHERE rn = 1""".stripMargin

  /** Array aggregation: per-customer sorted list of order keys,
    * emitted as a comma-joined string (sorted so the value is
    * set-deterministic regardless of arrival order; a scalar so the
    * result is hash-comparable — array cells are not). */
  def collectOrders(d: Dialect): String =
    s"""SELECT o_custkey, ${d.arrayAggSortedStr("o_orderkey")} AS order_keys,
       |  COUNT(*) AS n_orders
       |FROM orders GROUP BY o_custkey""".stripMargin

  /** Full Pearson correlation MATRIX over the lineitem numerics in
    * ONE scan — the multi-column profiling shape: all 4 columns' and
    * 6 pairs' sufficient statistics accumulate in a single aggregate
    * (exact DECIMAL sums, the [[corrQtyPrice]] discipline), and every
    * pairwise correlation is a deterministic finalizer over that one
    * row. A per-pair loop would scan the fact table C(k,2) times;
    * this is the k-column generalization that stays one pass at any
    * k. Output is one wide row (pair columns), hash-comparable. */
  def corrMatrix(d: Dialect): String = {
    val cols = Seq(
      "qty" -> "CAST(l_quantity AS DECIMAL(18,2))",
      "price" -> "CAST(l_extendedprice AS DECIMAL(18,2))",
      "disc" -> "CAST(l_discount AS DECIMAL(18,2))",
      "tax" -> "CAST(l_tax AS DECIMAL(18,2))")
    def toDbl(sum: String) =
      s"CAST(CAST(($sum) * 10000 AS DECIMAL(38,0)) AS DOUBLE) / 1.0e4"
    val sums = cols.map { case (n, e) => s"${toDbl(s"SUM($e)")} AS s_$n" } ++
      cols.map { case (n, e) => s"${toDbl(s"SUM($e * $e)")} AS ss_$n" } ++
      cols.combinations(2).map { case Seq((na, ea), (nb, eb)) =>
        s"${toDbl(s"SUM($ea * $eb)")} AS sp_${na}_$nb"
      }.toSeq
    val corrs = cols.combinations(2).map { case Seq((na, _), (nb, _)) =>
      val num = s"(n * sp_${na}_$nb - s_$na * s_$nb)"
      val den = s"sqrt(n * ss_$na - s_$na * s_$na) * sqrt(n * ss_$nb - s_$nb * s_$nb)"
      s"""CASE WHEN $den = 0 THEN NULL
         |       ELSE ${r6(s"$num / ($den)")} END AS corr_${na}_$nb""".stripMargin
    }.toSeq
    s"""WITH m AS (
       |  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
       |    ${sums.mkString(",\n    ")}
       |  FROM lineitem
       |)
       |SELECT CAST(n AS BIGINT) AS n,
       |  ${corrs.mkString(",\n  ")}
       |FROM m""".stripMargin
  }

  /** Pearson correlation from exact components: the five sufficient
    * statistics are decimal-exact sums cast to double at the end, and
    * the correlation is one fixed IEEE expression over them — so the
    * result is bit-identical across engines and partitionings, unlike
    * a native corr() whose streaming accumulation is order-dependent.
    * This is how distributed exact statistics should be built: exact
    * sufficient statistics + deterministic finalizer. */
  def corrQtyPrice(d: Dialect): String = {
    val q = "CAST(l_quantity AS DECIMAL(18,2))"
    val p = "CAST(l_extendedprice AS DECIMAL(18,2))"
    // decimal→double conversion is NOT identical across engines in the
    // last ulp (Java converts the exact decimal correctly-rounded;
    // DuckDB divides the scaled integer — two roundings). Route both
    // through the same sequence: exact integer (×10⁴, DECIMAL(38,0))
    // → double (integer conversion, correctly rounded everywhere)
    // → one IEEE division.
    def toDbl(sum: String) =
      s"CAST(CAST(($sum) * 10000 AS DECIMAL(38,0)) AS DOUBLE) / 1.0e4"
    s"""WITH m AS (
       |  SELECT l_returnflag, COUNT(*) AS n,
       |    ${toDbl(s"SUM($q)")} AS sx,
       |    ${toDbl(s"SUM($p)")} AS sy,
       |    ${toDbl(s"SUM($q * $q)")} AS sxx,
       |    ${toDbl(s"SUM($p * $p)")} AS syy,
       |    ${toDbl(s"SUM($q * $p)")} AS sxy
       |  FROM lineitem GROUP BY l_returnflag
       |)
       |SELECT l_returnflag, n,
       |  (CAST(n AS DOUBLE) * sxy - sx * sy)
       |    / (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx) * sqrt(CAST(n AS DOUBLE) * syy - sy * sy)) AS corr_qty_price
       |FROM m""".stripMargin
  }

  /** Moving average over a row frame (7-order trailing window), exact:
    * frame SUM in decimal and frame COUNT output separately, the mean
    * as one IEEE division — window aggregates stay order-independent. */
  def windowMovingAvg(d: Dialect): String =
    """SELECT o_custkey, o_orderkey,
      |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
      |    / COUNT(*) OVER w AS DOUBLE) AS avg_7,
      |  COUNT(*) OVER w AS n_in_frame
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)""".stripMargin

  /** Relative standing: PERCENT_RANK over a deterministic total order —
    * (rank−1)/(n−1) is exact integer arithmetic finished by one IEEE
    * division, identical in both engines. */
  def percentRankOrders(d: Dialect): String =
    """SELECT o_orderkey,
      |  PERCENT_RANK() OVER (ORDER BY o_totalprice, o_orderkey) AS pr
      |FROM orders""".stripMargin

  /** Arithmetic bucketization: the same value bands as [[rangeJoinBands]]
    * computed by FLOOR division instead of an interval join — at scale
    * this is the winning plan for fixed-width bands (a narrow projection
    * plus one aggregation; no join at all), while the interval join
    * covers irregular band tables. The WHERE restricts to the bands'
    * covered domain [0, 500) so the two forms are identical on ANY
    * input, not just the fixture's value range (the interval join drops
    * out-of-range rows; unguarded FLOOR would clamp them into edge
    * bands). Both oracle-checked. */
  def bucketizeValues(d: Dialect): String =
    """SELECT CAST(FLOOR(value / 50.0e0) AS INT) AS band,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events
      |WHERE value >= 0.0e0 AND value < 500.0e0
      |GROUP BY CAST(FLOOR(value / 50.0e0) AS INT)""".stripMargin

  /** Decile assignment (NTILE) of order value within each status. */
  def orderDeciles(d: Dialect): String =
    """SELECT o_orderkey, o_orderstatus,
      |  CAST(NTILE(10) OVER (PARTITION BY o_orderstatus
      |    ORDER BY o_totalprice, o_orderkey) AS INT) AS decile
      |FROM orders""".stripMargin

  /** Cramér's V association between source and language — the
    * EFFECT-SIZE companion to the chi-square tests (χ² grows with n
    * even for a fixed weak association; V = √(χ² / (n·min(r−1,c−1)))
    * is the 0..1 strength a mixing policy actually wants: "are my
    * sources language-silos?"). Cell terms reuse the single-sourced
    * [[chi2CellTerm]] and are µ-quantized to int64 BEFORE the sum
    * (order-independent across engines — the float-sum parity rule);
    * dims/n are exact integers; the two final ops (÷, √) are the
    * fixed IEEE sequence, r6'd. NULL on a degenerate 1×k table. One
    * (source, lang)-cardinality aggregate — bounded domain. */
  def cramersV(d: Dialect): String = {
    val term = chi2CellTerm
    s"""WITH o AS (
       |  SELECT source, lang, COUNT(*) AS obs FROM documents
       |  GROUP BY source, lang
       |),
       |grid AS (
       |  -- the FULL r x c grid, zero cells included: a GROUP BY emits
       |  -- only observed cells, and dropping the zero cells of a
       |  -- near-diagonal table understates chi-square — V for a
       |  -- perfect association would read 0.82, not 1 (caught by the
       |  -- micro-oracle's perfect-association sanity, in BOTH the SQL
       |  -- and the first independent implementation: shared-wrong
       |  -- semantics the cross-engine oracle cannot see)
       |  SELECT s.source, l.lang, CAST(COALESCE(o.obs, 0) AS BIGINT) AS obs
       |  FROM (SELECT DISTINCT source FROM documents) s
       |  CROSS JOIN (SELECT DISTINCT lang FROM documents) l
       |  LEFT JOIN o ON o.source = s.source AND o.lang = l.lang
       |),
       |x AS (
       |  SELECT source, lang, CAST(obs AS DOUBLE) AS obs,
       |    CAST(SUM(obs) OVER (PARTITION BY source) AS DOUBLE) AS rt,
       |    CAST(SUM(obs) OVER (PARTITION BY lang) AS DOUBLE) AS ct,
       |    CAST(SUM(obs) OVER () AS DOUBLE) AS n
       |  FROM grid
       |),
       |q AS (SELECT CAST(FLOOR($term * 1.0e6 + 5.0e-1) AS BIGINT) AS qt FROM x),
       |dims AS (
       |  SELECT CAST(COUNT(DISTINCT source) AS BIGINT) AS r,
       |    CAST(COUNT(DISTINCT lang) AS BIGINT) AS c,
       |    CAST(COUNT(*) AS BIGINT) AS n
       |  FROM documents
       |),
       |s AS (SELECT CAST(COALESCE(SUM(qt), 0) AS BIGINT) AS chi2q FROM q)
       |SELECT dm.r AS n_sources, dm.c AS n_langs, dm.n AS n_docs,
       |  ${r6("CAST(chi2q AS DOUBLE) / 1.0e6")} AS chi2,
       |  CASE WHEN dm.n = 0 OR LEAST(dm.r - 1, dm.c - 1) <= 0 THEN NULL
       |       ELSE ${r6(
                 "SQRT(CAST(chi2q AS DOUBLE) / 1.0e6 " +
                 "/ (CAST(dm.n AS DOUBLE) * LEAST(dm.r - 1, dm.c - 1)))")}
       |  END AS cramers_v
       |FROM dims dm CROSS JOIN s""".stripMargin
  }

  /** Canonical-token-set fingerprint (sorted distinct tokens → md5). */
  def textFingerprint(d: Dialect): String =
    s"""WITH ftoks AS (SELECT doc_id, ${toks(d)} AS toks FROM documents)
       |SELECT doc_id,
       |  md5(${d.arrayJoin(d.arraySort(d.arrayDistinct("toks")), " ")}) AS fingerprint
       |FROM ftoks""".stripMargin

  /** Dedup groups by fingerprint over the two-snapshot corpus. */
  def dedupFingerprint(d: Dialect): String =
    s"""WITH ${corpusCte(d)},
       |ftoks AS (SELECT doc_id, ${toks(d)} AS toks FROM corpus),
       |fp AS (SELECT doc_id,
       |  md5(${d.arrayJoin(d.arraySort(d.arrayDistinct("toks")), " ")}) AS fingerprint
       |FROM ftoks)
       |SELECT fingerprint, MIN(doc_id) AS keep_id, COUNT(*) AS n_docs
       |FROM fp GROUP BY fingerprint""".stripMargin

  /** Calibration/reliability table of the quality score read as
    * P(doc is English) — the SCORE-side sibling of
    * [[filterCalibration]] (which calibrates the Gopher GATE's rule
    * confidence in fixed-width bins; this one calibrates the
    * continuous quality score against the language label in
    * data-driven deciles, the two ends a release report shows side by
    * side): docs bucketed into score deciles, each decile
    * reporting its mean score ("confidence", already in ppm — the
    * µ-quantized quality lives on 0..10⁶) against its observed
    * English rate ("accuracy", exact ppm), plus the expected
    * calibration error ECE = Σ (n_d/n)·|acc_d − conf_d| carried
    * in-row (the metric-contribution share-of-total pattern). Decile
    * assignment happens at SCORE-GROUP grain — a tied score group
    * lands wholly in the decile where its cumulative range starts
    * (1 + ⌊10·cum_before/n⌋) — because splitting a tie across deciles
    * would need an arbitrary per-row order that no engine pair agrees
    * on; consequence: deciles are ragged on tie-heavy corpora, which
    * the n column makes visible. All integer-exact (idiv ppm, int64
    * sums); the decile domain is a literal 1..10 LEFT JOIN so empty
    * deciles emit zero rows rather than vanish. One scoring pass, one
    * score-cardinality window — no per-doc global sort. */
  /** The score-decile reliability chain (scored docs → µ-quantized
    * score groups → tie-safe decile assignment → per-decile n/conf/acc)
    * shared by [[qualityCalibration]] and [[qualityBrier]] — ONE copy,
    * so the reliability diagram and the Brier decomposition built on
    * it can never disagree about what a decile is. Ends at
    * `per(decile, n_docs, conf_ppm, acc_ppm)`. */
  private[ops] def calibPerCtes(d: Dialect): String =
    s"""lab AS (
       |  SELECT ${qvExpr("quality")} AS q,
       |    CASE WHEN lang_guess = 'en' THEN 1 ELSE 0 END AS pos
       |  FROM scored
       |),
       |g AS (
       |  SELECT q, CAST(COUNT(*) AS BIGINT) AS c, CAST(SUM(pos) AS BIGINT) AS cp
       |  FROM lab GROUP BY q
       |),
       |r AS (
       |  SELECT q, c, cp,
       |    CAST(COALESCE(SUM(c) OVER (ORDER BY q
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb,
       |    CAST(SUM(c) OVER () AS BIGINT) AS n
       |  FROM g
       |),
       |dd AS (
       |  SELECT 1 + ${d.idiv("10 * cb", "n")} AS decile, q, c, cp FROM r
       |),
       |per AS (
       |  -- CAST AS BIGINT: DuckDB SUM(int) is HUGEINT and // keeps it
       |  SELECT decile, CAST(SUM(c) AS BIGINT) AS n_docs,
       |    CAST(${d.idiv("SUM(q * c)", "SUM(c)")} AS BIGINT) AS conf_ppm,
       |    CAST(${d.idiv("1000000 * SUM(cp)", "SUM(c)")} AS BIGINT) AS acc_ppm
       |  FROM dd GROUP BY decile
       |)""".stripMargin

  def qualityCalibration(d: Dialect): String =
    s"""WITH ${scoredCtes(d, "documents")},
       |${calibPerCtes(d)},
       |tot AS (
       |  SELECT CAST(SUM(n_docs) AS BIGINT) AS n,
       |    CAST(SUM(n_docs * ABS(acc_ppm - conf_ppm)) AS BIGINT) AS w
       |  FROM per
       |),
       |dom AS (${domainRel("decile", (1 to 10).map(_.toString))})
       |SELECT dom.decile,
       |  CAST(COALESCE(p.n_docs, 0) AS BIGINT) AS n_docs,
       |  p.conf_ppm, p.acc_ppm,
       |  CASE WHEN p.decile IS NULL THEN NULL
       |       ELSE CAST(ABS(p.acc_ppm - p.conf_ppm) AS BIGINT) END AS gap_ppm,
       |  CAST(${d.idiv("t.w", "t.n")} AS BIGINT) AS ece_ppm_total
       |FROM dom LEFT JOIN per p ON p.decile = dom.decile
       |CROSS JOIN tot t""".stripMargin

  /** Murphy decomposition of the (decile-binned) Brier score of the
    * quality-as-P(English) forecaster — the three-way answer to "is
    * this score USEFUL, not just calibrated": BS = UNC − RES + REL
    * with UNC = ȳ(1−ȳ) the task's irreducible uncertainty, RES =
    * Σ nₖ(ȳₖ−ȳ)²/N the resolution (how far the bins pull outcomes
    * apart — the part a useful score maximizes), REL =
    * Σ nₖ(p̄ₖ−ȳₖ)²/N the reliability penalty ([[qualityCalibration]]'s
    * ECE squared-ified). Decomposes the DECILE-QUANTIZED forecaster
    * (forecast = the bin's mean score), over the SAME shared
    * [[calibPerCtes]] bins as the reliability diagram — the two
    * reports cannot disagree about binning. Arithmetic: ȳ is an exact
    * floor-ppm from the lab counts; each bin term nₖ·(gap ppm)² is
    * exact int64 under a loud ≤9.2e6-doc envelope (ppm² ≤ 1e12 —
    * past it, move the terms to DECIMAL, the Gini rule); the final
    * three ratios and their sum are one fixed IEEE sequence, r6'd. */
  def qualityBrier(d: Dialect): String =
    s"""WITH ${scoredCtes(d, "documents")},
       |${calibPerCtes(d)},
       |t0 AS (
       |  SELECT
       |    CASE WHEN COUNT(*) > 9200000
       |      THEN CAST('brier: n*(ppm gap)^2 exceeds int64 past ~9.2M docs — move to DECIMAL' AS BIGINT)
       |      ELSE CAST(COUNT(*) AS BIGINT) END AS n,
       |    CAST(SUM(pos) AS BIGINT) AS p
       |  FROM lab
       |),
       |yb AS (SELECT n, ${d.idiv("1000000 * p", "n")} AS ybar FROM t0),
       |terms AS (
       |  SELECT
       |    CAST(SUM(per.n_docs * (per.conf_ppm - per.acc_ppm)
       |             * (per.conf_ppm - per.acc_ppm)) AS BIGINT) AS rel_num,
       |    CAST(SUM(per.n_docs * (per.acc_ppm - yb.ybar)
       |             * (per.acc_ppm - yb.ybar)) AS BIGINT) AS res_num
       |  FROM per CROSS JOIN yb
       |)
       |SELECT yb.n AS n_docs, CAST(yb.ybar AS BIGINT) AS base_rate_ppm,
       |  ${r6("CAST(rel_num AS DOUBLE) / yb.n / 1.0e12")} AS reliability,
       |  ${r6("CAST(res_num AS DOUBLE) / yb.n / 1.0e12")} AS resolution,
       |  ${r6("CAST(yb.ybar AS DOUBLE) * (1000000 - yb.ybar) / 1.0e12")} AS uncertainty,
       |  ${r6("(CAST(rel_num AS DOUBLE) / yb.n - CAST(res_num AS DOUBLE) / yb.n" +
             " + CAST(yb.ybar AS DOUBLE) * (1000000 - yb.ybar)) / 1.0e12")} AS brier_score
       |FROM yb CROSS JOIN terms""".stripMargin

  /** Spearman rank correlation between the quality score and document
    * length (token count) — "is the gate just a length detector?" is
    * the first question asked of any quality score, and the rank
    * correlation answers it robustly (Pearson would be dragged by the
    * length tail). Midranks for ties on BOTH variables via the
    * doubled-midrank trick (u = 2·rank is an integer: 2·cb + c + 1
    * per tied group — the [[qualityAuc]] identity), computed at
    * VALUE-group grain and joined back per doc, so no per-doc global
    * sort exists; ρ = Pearson over (u, v) — the ×2 scaling cancels in
    * the ratio. Moments are exact int64 sums with a loud envelope:
    * n·Σuv ≤ 4n⁴ wraps past ~35k docs (the guard throws; at scale the
    * moments move to DECIMAL(38,0), the Gini rule). The final ρ is
    * the fixed correctly-rounded IEEE sequence, r6'd; NULL when
    * either variable is constant. */
  def qualitySpearman(d: Dialect): String = {
    def rankCte(g: String, col: String, out: String): String =
      s"""$g AS (
         |  SELECT $col, CAST(COUNT(*) AS BIGINT) AS c FROM xy GROUP BY $col
         |),
         |$out AS (
         |  SELECT $col,
         |    2 * CAST(COALESCE(SUM(c) OVER (ORDER BY $col
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |      + c + 1 AS r2
         |  FROM $g
         |)""".stripMargin
    s"""WITH ${scoredCtes(d, "documents")},
       |xy AS (
       |  SELECT doc_id, ${qvExpr("quality")} AS x,
       |    CAST(${d.size("toks")} AS BIGINT) AS y
       |  FROM scored
       |),
       |${rankCte("gx", "x", "rx")},
       |${rankCte("gy", "y", "ry")},
       |j AS (
       |  SELECT rx.r2 AS u, ry.r2 AS v
       |  FROM xy JOIN rx ON xy.x = rx.x JOIN ry ON xy.y = ry.y
       |),
       |m AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(u) AS BIGINT) AS su, CAST(SUM(v) AS BIGINT) AS sv,
       |    CAST(SUM(u * u) AS BIGINT) AS suu, CAST(SUM(v * v) AS BIGINT) AS svv,
       |    CAST(SUM(u * v) AS BIGINT) AS suv
       |  FROM j
       |),
       |g AS (
       |  SELECT CASE WHEN n > 35000
       |    THEN CAST('spearman: n*suv exceeds the int64 moment envelope past ~35k docs — move to DECIMAL' AS BIGINT)
       |    ELSE n END AS n, su, sv, suu, svv, suv
       |  FROM m
       |)
       |SELECT n AS n_docs,
       |  CASE WHEN n * suu - su * su <= 0 OR n * svv - sv * sv <= 0 THEN NULL
       |       ELSE ${r6(
                 "CAST(n * suv - su * sv AS DOUBLE) " +
                 "/ SQRT(CAST(n * suu - su * su AS DOUBLE) * (n * svv - sv * sv))")}
       |  END AS spearman_rho
       |FROM g""".stripMargin
  }

  /** Kendall τ-b between the quality score and document length —
    * [[qualitySpearman]]'s companion rank test (τ weights every
    * discordant pair equally where ρ squares rank gaps, so the two
    * disagreeing flags a cluster of locally-inverted pairs). Both
    * variables are COARSENED to a fixed grid first (quality → 20
    * fixed-width buckets over [0,1], length → 64 token-count buckets
    * of width 16 capped at the top), and τ-b is computed exactly ON
    * THAT GRID: concordant/discordant mass comes from the joint-cell
    * contingency table (≤ 1,280 cells regardless of corpus size), so
    * the all-pairs O(n²) a naive τ needs collapses to a constant-
    * bounded cell-pair join — the Gini/AUC bucket-decomposition rule
    * applied to pair counting. Every count is exact int64 (C, D ≤ n²
    * wraps only past ~3e9 docs); the c2/d2 sums count ordered pairs
    * (each unordered pair twice), and the /2 cancels against the
    * doubled tie terms: τ-b = (c2 − d2) / √(A2·B2) with
    * A2 = n(n−1) − Σtₓ(tₓ−1). The one float op is that final
    * division (operands exact-int-to-double), r6'd; NULL when either
    * variable is grid-constant. Independent Scala τ-b in
    * MicroOracleSpec. The cell table is a STAGE (five body references
    * — cd's self-join twice + both tie marginals + n — would each
    * re-run the corpus scoring pass under CTE inlining; the staged
    * grid is ≤ 1,280 rows). */
  val qualityKendall: StagedOp = StagedOp(
    stages = Seq(
      "qk_cells" -> { (d: Dialect) =>
        s"""WITH ${scoredCtes(d, "documents")},
           |xy AS (
           |  SELECT LEAST(CAST(FLOOR(quality * 2.0e1) AS BIGINT), 19) AS qb,
           |    LEAST(${d.idiv(s"CAST(${d.size("toks")} AS BIGINT)", "16")}, 63) AS lb
           |  FROM scored
           |)
           |SELECT qb, lb, CAST(COUNT(*) AS BIGINT) AS n FROM xy GROUP BY qb, lb""".stripMargin
      }),
    body = { d =>
    s"""WITH cells AS (SELECT qb, lb, n FROM qk_cells),
       |cd AS (
       |  SELECT
       |    CAST(COALESCE(SUM(CASE WHEN (a.qb < b.qb AND a.lb < b.lb)
       |                             OR (a.qb > b.qb AND a.lb > b.lb)
       |                           THEN a.n * b.n END), 0) AS BIGINT) AS c2,
       |    CAST(COALESCE(SUM(CASE WHEN (a.qb < b.qb AND a.lb > b.lb)
       |                             OR (a.qb > b.qb AND a.lb < b.lb)
       |                           THEN a.n * b.n END), 0) AS BIGINT) AS d2
       |  FROM cells a JOIN cells b
       |    ON NOT (a.qb = b.qb AND a.lb = b.lb)
       |),
       |tx AS (
       |  SELECT CAST(COALESCE(SUM(g.n * (g.n - 1)), 0) AS BIGINT) AS t2
       |  FROM (SELECT qb, CAST(SUM(n) AS BIGINT) AS n FROM cells GROUP BY qb) g
       |),
       |ty AS (
       |  SELECT CAST(COALESCE(SUM(g.n * (g.n - 1)), 0) AS BIGINT) AS t2
       |  FROM (SELECT lb, CAST(SUM(n) AS BIGINT) AS n FROM cells GROUP BY lb) g
       |),
       |nn AS (SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) AS n FROM cells),
       |f AS (
       |  SELECT nn.n, cd.c2, cd.d2,
       |    nn.n * (nn.n - 1) - tx.t2 AS a2,
       |    nn.n * (nn.n - 1) - ty.t2 AS b2
       |  FROM nn CROSS JOIN cd CROSS JOIN tx CROSS JOIN ty
       |)
       |SELECT n AS n_docs,
       |  ${d.idiv("c2", "2")} AS concordant,
       |  ${d.idiv("d2", "2")} AS discordant,
       |  CASE WHEN a2 <= 0 OR b2 <= 0 THEN NULL
       |       ELSE ${r6(
                 "CAST(c2 - d2 AS DOUBLE) " +
                 "/ SQRT(CAST(a2 AS DOUBLE) * b2)")}
       |  END AS kendall_tau_b
       |FROM f""".stripMargin
    })

  /** AUC (Mann-Whitney) of the quality score as a separator of English
    * vs unknown-language docs — the ranking-quality readout behind
    * "does the gate's score actually order good docs above bad ones",
    * reported as exact integer ppm. The standard rank-sum identity
    * AUC = (Σ ranks⁺ − n₁(n₁+1)/2) / (n₁·n₀) with MIDRANKS for ties is
    * computed entirely in int64 by carrying 2·midrank (for a tied
    * score group with `cb` items below and `c` members, every member's
    * doubled midrank is 2·cb + c + 1 — an integer), so no float rank
    * arithmetic crosses the engines. Scale shape: one scoring pass,
    * then all rank algebra runs at SCORE cardinality (the µ-quantized
    * quality domain — the grouped-rank form, not a per-doc global
    * sort); the one window is over that bounded domain. Loud int64
    * envelope: 10⁶·2U reaches 2·10⁶·n², wrapping past ~2.1e6 labeled
    * docs — the guard throws in both engines instead of wrapping.
    * Labels ride [[scoredCtes]] (the gate's one scoring copy).
    * Independent Scala midrank AUC in MicroOracleSpec. */
  def qualityAuc(d: Dialect): String =
    s"""WITH ${scoredCtes(d, "documents")},
       |lab AS (
       |  SELECT ${qvExpr("quality")} AS q,
       |    CASE WHEN lang_guess = 'en' THEN 1 ELSE 0 END AS pos
       |  FROM scored WHERE lang_guess IN ('en', 'und')
       |),
       |g AS (
       |  SELECT q, CAST(COUNT(*) AS BIGINT) AS c,
       |    CAST(SUM(pos) AS BIGINT) AS cp
       |  FROM lab GROUP BY q
       |),
       |r AS (
       |  SELECT q, c, cp,
       |    CAST(COALESCE(SUM(c) OVER (ORDER BY q
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb
       |  FROM g
       |),
       |u AS (
       |  SELECT CAST(SUM(cp * (2 * cb + c + 1)) AS BIGINT) AS r2,
       |    CAST(SUM(cp) AS BIGINT) AS n1,
       |    CAST(SUM(c - cp) AS BIGINT) AS n0
       |  FROM r
       |)
       |SELECT n1 AS n_pos, n0 AS n_neg,
       |  CASE WHEN n1 + n0 > 2000000
       |         THEN CAST('quality-auc: labeled-doc count exceeds the int64 ppm envelope' AS BIGINT)
       |       WHEN n1 = 0 OR n0 = 0 THEN NULL
       |       ELSE ${d.idiv("1000000 * (r2 - n1 * (n1 + 1))", "2 * n1 * n0")}
       |  END AS auc_ppm
       |FROM u""".stripMargin

}
