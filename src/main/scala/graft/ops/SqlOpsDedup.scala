package graft.ops

/** Deduplication (exact/minhash/simhash/ngram/containment/substring), duplicate-graph analytics, retrieval metrics, and the relational-analytics query shapes that share their staged indexes.
  *
  * Split out of the single-file SqlOps (r11) as a PURE MOVE: member
  * order across the [[SqlOpsAll]] linearization equals the pre-split
  * declaration order, so val-initialization semantics are unchanged.
  * The self-type keeps every cross-domain reference compiling against
  * the same single [[SqlOps]] instance.
  */
trait SqlOpsDedup { this: SqlOpsAll =>

  // ---- deduplication ----

  /** Exact dedup: content-hash groupBy, survivor = min doc_id. */
  def dedupExact(d: Dialect): String =
    s"""WITH ${corpusCte(d)}
       |SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
       |FROM corpus GROUP BY md5(text)""".stripMargin

  /** Raw (doc, shingle) word-3-gram rows (duplicates kept) — the shared
    * base of minhash and jaccard.
    *
    * Spark rendering: the native codegen'd [[graft.functions.WordShingles]]
    * expression exploded — a narrow projection with no window, so
    * shingling is an embarrassingly parallel scan→explode. The
    * relational form (posexplode + LEAD window) costs a shuffle+sort on
    * (doc_id, pos) just to see adjacent tokens, and the array-lambda
    * form evaluates interpreted per element (4-5× slower, commit
    * 1487599).
    *
    * DuckDB rendering keeps the relational posexplode+LEAD form — the
    * oracle gate is exactly what proves the two renderings identical. */
  private[ops] def shinglesCtes(d: Dialect, n: Int = 3, from: String = "corpus"): String = {
    require(n >= 1, s"shingle size must be >= 1, got $n")
    d.shingleRows(from, n)
  }


  /** MinHash LSH candidate pairs: ONE md5 per shingle sliced into 8
    * 16-bit hash functions (min over each slice), [[MhBands]] bands of
    * [[MhRows]] → join on band key. One hash pass + a map-side-
    * combinable groupBy, not 8 lambda passes over shingle arrays. No
    * DISTINCT on the shingle rows: MIN over a multiset equals MIN over
    * its support, so the signature aggregation dedups for free
    * (map-side partial MIN — the shuffle carries one partial signature
    * per doc per partition, not the shingle index). The signature
    * table (1 row/doc) is staged so the band self-join doesn't rebuild
    * it. */
  /** LSH band geometry over the 8-slice signature (MhBands · MhRows =
    * 8). (2 bands × 4 rows) is [[lshParamOpt]]'s expected-cost argmin
    * on this corpus — the optimizer's own round-10 readout proved the
    * previously-shipped (4 × 2) split FP-heavy (its S-curve at the
    * sub-threshold deciles surfaces far more non-dup mass than the
    * (2,4) curve loses in true-dup mass: the fixture's true dups are
    * the exact two-snapshot twins at j = 1, where EVERY banding
    * detects with p = 1), and round 11 acts on the engine's own tuner
    * instead of shipping against it. MEASURED at sf0.1: exp_cost
    * 263.95 (4,2) vs 23.61 (2,4); mh_cand 8,100 → 6,008 pairs (−26%
    * verifier input), q_dedup_lsh_eval recall 1.0 → 1.0 (unchanged),
    * precision 0.9635 → 0.9937.
    * Public (not private): the streaming twin
    * (graft.streaming.StreamingOps.minhashCandidates / bandRowsOf)
    * renders its band structs from these same constants, so the
    * batch and streaming band keys cannot drift. */
  val MhBands = 2
  val MhRows = 4

  /** Exact detection probability of a (b, r) banding at the decile-k
    * midpoint s = (2k+1)/20 — P(s) = 1 − (1 − sʳ)ᵇ as a half-up ppm
    * integer, computed HOST-SIDE with BigDecimal (the EXPQ rule: no
    * transcendental ever crosses an engine boundary; s has a finite
    * decimal expansion, so the powers are exact). ONE copy shared by
    * [[lshParamOpt]] (every factorization of 8) and [[lshScurve]]
    * (the shipped geometry's theory column), so the optimizer and the
    * audit can never disagree about the curve. */
  def scurveDetectPpm(b: Int, r: Int, k: Int): Long = {
    val s = BigDecimal(2 * k + 1) / BigDecimal(20)
    val p = BigDecimal(1) - (BigDecimal(1) - s.pow(r)).pow(b)
    (p * BigDecimal(1000000))
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLongExact
  }

  /** The [[MhBands]]×[[MhRows]] band projection rows over a signature
    * relation — THE single source of band geometry (band count, bkey
    * slice width): [[mhBandsCte]] (full self-join) and
    * [[dedupMinhashDelta]]'s probe both render from here, so a
    * geometry change cannot leave the delta path on stale bands. */
  private[ops] def mhBandRows(from: String): String =
    (0 until MhBands).map { b =>
      val ks = (0 until MhRows).map(j => s"h${b * MhRows + j}").mkString(", ")
      s"SELECT doc_id, $b AS band, concat($ks) AS bkey FROM $from"
    }.mkString("\n  UNION ALL\n  ")
  private[ops] val mhBandsCte: String = s"bands AS (\n  ${mhBandRows("mh_sig")}\n)"

  /** "Today's ingest" slice for the incremental family (~1/16 of the
    * corpus) — single-sourced: the delta candidate probe here,
    * SparkEntry's base-cluster-map build, and the OpsSpec equivalence
    * test must all agree on what counts as a new doc. */
  val NewDocMod = 16
  val NewDocRem = 3
  private[ops] val mhCandCte: String =
    """cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM bands a JOIN bands b
      |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
      |)""".stripMargin

  /** Jaccard verification fragments over the staged df-capped index —
    * doc sizes, pairwise intersections (full, or gated to `cand`), and
    * the ≥ 0.6 score expression — szCte is shared by every fragment
    * consumer (see the nj_sz stage comment for the r15 audit list);
    * interFullCte only by [[dedupNgramJaccard]], [[dedupContainment]]
    * and the cascade. */
  /** sz/inter are ALIASES of the staged nj_sz / nj_inter artifacts
    * (r14): the doc-size rollup and the full pairwise-intersection
    * join were being re-planned and re-executed inside EVERY fragment
    * consumer — q_dedup_cascade_cost's plan alone carried 54
    * Exchanges because its 3 references to the truth CTE re-ran the
    * nj_dshf self-join each time (guide §2.4: materialize the shared
    * subtree once, like mh_cand). Single-reference aliases inline to
    * plain parquet scans; the builders keep the names `sz`/`inter` so
    * every existing body reads unchanged. Ops whose stage lists
    * include [[dedupNgramJaccard.stages]] get both artifacts. */
  private[ops] val szCte = "sz AS (SELECT doc_id, n FROM nj_sz)"
  /** The deterministic ~12.5% content-hash truth sample and the
    * sample-gated exact-intersection join — THE single source of the
    * sampled-truth pattern shared by [[dedupLshEval]] and
    * [[lshScurve]]: a sample-rate or truth-join change must move the
    * recall/precision eval and the S-curve audit together. Both
    * assume a `corpus` CTE is already in scope. */
  // a val like interSampledCte: the SQL is dialect-invariant (a
  // Dialect parameter here would imply dialect-sensitive rendering)
  private[ops] val lshSampCte: String =
    s"samp AS (SELECT doc_id FROM corpus WHERE ${md5Bucket("text")} < 32)"
  private[ops] val interSampledCte: String =
    """inter AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
      |  FROM nj_dshf a
      |  JOIN samp pa ON a.doc_id = pa.doc_id
      |  JOIN nj_dshf b ON a.s = b.s AND a.doc_id < b.doc_id
      |  JOIN samp pb ON b.doc_id = pb.doc_id
      |  GROUP BY a.doc_id, b.doc_id
      |)""".stripMargin
  private[ops] val interFullCte =
    "inter AS (SELECT doc_a, doc_b, inter FROM nj_inter)"
  private[ops] val interGatedCte =
    """inter AS (
      |  SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
      |  FROM cand c
      |  JOIN nj_dshf a ON a.doc_id = c.doc_a
      |  JOIN nj_dshf b ON b.doc_id = c.doc_b AND b.s = a.s
      |  GROUP BY c.doc_a, c.doc_b
      |)""".stripMargin
  private[ops] val jaccardExpr = "CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter)"
  private[ops] val jaccardSelect =
    s"""SELECT i.doc_a, i.doc_b,
       |  ${r6(jaccardExpr)} AS jaccard
       |FROM inter i
       |JOIN sz sa ON i.doc_a = sa.doc_id
       |JOIN sz sb ON i.doc_b = sb.doc_id
       |WHERE $jaccardExpr >= 0.6""".stripMargin

  val dedupMinhash: StagedOp = {
    val sigCols = (0 until 8).map { j =>
      s"MIN(substr(md5(s), ${4 * j + 1}, 4)) AS h$j"
    }.mkString(",\n    ")
    StagedOp(
      stages = Seq(
        "mh_sig" -> { d =>
          s"""WITH ${corpusCte(d)},
             |${shinglesCtes(d)}
             |SELECT doc_id,
             |    $sigCols
             |FROM sh GROUP BY doc_id""".stripMargin
        },
        // the candidate-pair set is its OWN staged artifact: five
        // consumers (minhash, est, verified, source-overlap, pagerank)
        // and the cluster map all read these pairs, and Spark's CTE
        // inlining would otherwise re-run the band self-join + DISTINCT
        // once per reference (q_pagerank_step planned 48 scans of
        // mh_sig before this stage existed). Exactly how a production
        // pipeline treats candidate pairs: generate once, consume many.
        "mh_cand" -> { _ =>
          s"""WITH $mhBandsCte,
             |$mhCandCte
             |SELECT doc_a, doc_b FROM cand""".stripMargin
        }),
      body = { _ => "SELECT doc_a, doc_b FROM mh_cand" })
  }

  /** Incremental candidate generation — the daily-ingest twin of
    * [[dedupMinhash]]: only the NEW docs' signatures (the same 1/16
    * slice [[graft.SparkEntry]]'s delta-CC demo treats as today's
    * batch) probe the existing band index, so the band join costs
    * delta × bucket-size instead of the corpus-wide self-join. Emits
    * exactly the full candidate set restricted to pairs touching a new
    * doc (equivalence asserted in OpsSpec) — these pairs are the input
    * [[graft.ops.Cluster.incrementalUpdate]] merges into the map,
    * closing the gate → candidates → clusters incremental pipeline. */
  val dedupMinhashDelta: StagedOp = StagedOp(
    stages = Seq(dedupMinhash.stages.head), // mh_sig, shared
    body = { _ =>
      s"""WITH aband AS (
         |  ${mhBandRows("mh_sig")}
         |),
         |nband AS (SELECT doc_id, band, bkey FROM aband
         |          WHERE doc_id % $NewDocMod = $NewDocRem)
         |SELECT DISTINCT
         |  LEAST(n.doc_id, t.doc_id) AS doc_a,
         |  GREATEST(n.doc_id, t.doc_id) AS doc_b
         |FROM nband n JOIN aband t
         |  ON n.band = t.band AND n.bkey = t.bkey AND n.doc_id <> t.doc_id""".stripMargin
    })

  /** N-gram jaccard near-dup: inverted-index join on distinct shingles,
    * exact jaccard ≥ 0.6. Shingles appearing in > 20 docs are dropped
    * from the index AND the sizes (so identical docs still score 1.0):
    * ubiquitous shingles carry no near-dup signal and are exactly the
    * hot keys that skew the self-join at scale.
    *
    * One materialized stage: distinct (doc, shingle) pairs with the
    * document-frequency cap applied in the same pass via a count window
    * (df = COUNT OVER (PARTITION BY shingle) on distinct rows ≡ the
    * GROUP BY … HAVING + join-back form, minus one parquet round-trip
    * and the join).
    *
    * Spark-side the shingle identity is `xxhash64(shingle)` — Broder-
    * style shingle fingerprinting: every downstream op (df cap,
    * inverted-index self-join, intersection counts) uses only shingle
    * identity, so a 64-bit fingerprint gives identical counts unless
    * two distinct shingles in one corpus collide (P ≈ n²/2⁶⁵ ≈ 1e-8 at
    * half a million shingles), and shrinks the shuffle/index ~4× while
    * making the hot self-join key a fixed-width long. The oracle keeps
    * the string form — the hash gate itself proves count-equivalence on
    * every run. */
  val dedupNgramJaccard: StagedOp = StagedOp(
    stages = Seq(
      "nj_dshf" -> { d =>
        val sid = d.shingleId("s")
        s"""WITH ${corpusCte(d)},
           |${shinglesCtes(d)},
           |dsh AS (SELECT DISTINCT doc_id, $sid AS s FROM sh),
           |w AS (SELECT doc_id, s, COUNT(*) OVER (PARTITION BY s) AS df FROM dsh)
           |SELECT doc_id, s FROM w WHERE df <= 20""".stripMargin
      },
      // doc sizes + full pairwise intersections as their own staged
      // artifacts (r14) — the mh_cand rule: generate once, consume
      // many. Pair-grain, df-cap-bounded at any scale. Consumers
      // (r15 audit): nj_sz via szCte is read by NINE ops (jaccard,
      // containment, cascade, verified, threshold sweep, lsh eval,
      // lsh s-curve, lsh param-opt, minhash calibration); nj_inter
      // via interFullCte only by the three FULL-intersection bodies
      // (jaccard, containment, cascade) — the gated/sampled variants
      // recount intersections from nj_dshf against their own
      // candidate sets and never read nj_inter.
      "nj_sz" -> { _ =>
        "SELECT doc_id, COUNT(*) AS n FROM nj_dshf GROUP BY doc_id"
      },
      "nj_inter" -> { _ =>
        s"""SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
           |FROM nj_dshf a JOIN nj_dshf b ON a.s = b.s AND a.doc_id < b.doc_id
           |GROUP BY a.doc_id, b.doc_id""".stripMargin
      }),
    body = { _ =>
      s"""WITH $szCte,
         |$interFullCte
         |$jaccardSelect""".stripMargin
    })

  /** CAPTURE-RECAPTURE estimate of the corpus's shingle universe
    * (Lincoln-Petersen with Chapman's bias correction): two
    * deterministic 25% document samples (md5 content buckets — the
    * RNG-free sampling rule) each "capture" a set of distinct
    * 3-gram shingles; the overlap m between captures estimates the
    * UNSEEN remainder, N̂ = (n1+1)(n2+1)/(m+1) − 1 — how a pipeline
    * sizes a vocabulary / shingle index for capacity planning
    * WITHOUT a full-corpus distinct pass at 100 TB (here the exact
    * distinct count rides along as the audit column, the
    * approx-distinct contract pattern). One shingle pass → one
    * per-shingle presence aggregate (map-side combined) → a 1-row
    * exact-integer readout; the (n1+1)(n2+1) product is
    * loud-guarded. Shingle identity is the engine-portable
    * [[Dialect.shingleId]] fingerprint (the nj_dshf rule — the
    * oracle's string side proves count-equivalence every run). */
  def captureRecapture(d: Dialect): String = {
    val sid = d.shingleId("s")
    s"""WITH ${shinglesCtes(d, n = 3, from = "documents")},
       |db AS (SELECT doc_id, ${md5Bucket("text")} AS b FROM documents),
       |pres AS (
       |  SELECT $sid AS sf,
       |    MAX(CASE WHEN db.b < 64 THEN 1 ELSE 0 END) AS ina,
       |    MAX(CASE WHEN db.b >= 64 AND db.b < 128 THEN 1 ELSE 0 END) AS inb
       |  FROM sh JOIN db ON sh.doc_id = db.doc_id
       |  GROUP BY $sid
       |),
       |cnt AS (
       |  SELECT CAST(SUM(ina) AS BIGINT) AS n1, CAST(SUM(inb) AS BIGINT) AS n2,
       |    CAST(SUM(ina * inb) AS BIGINT) AS m,
       |    CAST(COUNT(*) AS BIGINT) AS truth
       |  FROM pres
       |),
       |est AS (
       |  SELECT n1, n2, m, truth,
       |    CASE WHEN (CAST(n1 AS DOUBLE) + 1) * (CAST(n2 AS DOUBLE) + 1) > 9.0e18
       |      THEN CAST('capture-recapture: chapman product exceeds int64' AS BIGINT)
       |      ELSE ${d.idiv("(n1 + 1) * (n2 + 1)", "m + 1")} - 1 END AS est_universe
       |  FROM cnt
       |)
       |SELECT n1, n2, m, CAST(est_universe AS BIGINT) AS est_universe,
       |  truth AS true_universe,
       |  CASE WHEN truth = 0 THEN NULL
       |       WHEN ABS(CAST(est_universe AS DOUBLE) - truth) > 9.0e12
       |       THEN CAST('capture-recapture: err ppm product exceeds int64' AS BIGINT)
       |       ELSE ${d.idiv("1000000 * ABS(est_universe - truth)", "truth")}
       |  END AS err_ppm
       |FROM est""".stripMargin
  }

  /** Dedup-cascade ECONOMICS: one table comparing the three banded
    * near-dup candidate generators (minhash bands, simhash bands
    * pre-Hamming, PPJoin prefix filter) on candidate volume,
    * true-pair yield, precision and recall against the corpus's ONE
    * ground truth (exact df-capped 3-gram Jaccard ≥ 0.6 — the house
    * standard every verify stage uses). This is the readout a
    * pipeline owner reads to pick (or stack) techniques at 100 TB:
    * candidate volume IS the shuffle bill, and precision·recall
    * says what the bill buys. All sides read the already-staged
    * artifacts (mh_cand, sh_sim, pfx_rk/pfx_dsh, nj_dshf) — the
    * body is counts and joins over index-sized tables, nothing
    * rescans text. Simhash is counted at its BAND-COLLISION stage
    * (before the Hamming verify) deliberately: the cascade question
    * is what each CANDIDATE generator admits; every family's exact
    * verify is the same Jaccard pass. lazy: references vals across
    * the SqlOps trait split (the datasetCard init-order rule). */
  lazy val dedupCascadeCost: StagedOp = StagedOp(
    stages = {
      val all = dedupMinhash.stages ++ dedupSimhashPairs.stages ++
        dedupPrefix.stages ++ dedupNgramJaccard.stages
      // distinctBy keeps the FIRST builder per stage name — sound only
      // while same-named stages render identical SQL. If two families
      // ever diverge on a shared name, the cascade would silently
      // compare techniques against the wrong artifact; render-compare
      // both dialects at init so that drift fails loud instead.
      all.groupBy(_._1).foreach { case (name, bs) =>
        val renders = bs.map(b =>
          (b._2(SparkDialect), b._2(DuckDialect))).distinct
        require(renders.size == 1,
          s"cascade stage '$name' has ${renders.size} distinct SQL " +
            "renderings across families — shared-stage reuse is unsound")
      }
      all.distinctBy(_._1)
    },
    body = { d =>
      s"""WITH cm AS (SELECT doc_a, doc_b FROM mh_cand),
         |sbands AS (
         |  ${simhashBandRows("sh_sim")}
         |),
         |cs AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM sbands a JOIN sbands b
         |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
         |),
         |${pfxPreCte("pfx_rk")},
         |cp AS (
         |  SELECT doc_a, doc_b FROM (
         |    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |    FROM pre a JOIN pre b ON a.s = b.s AND a.doc_id < b.doc_id
         |      AND $pfxLenFilter
         |    GROUP BY a.doc_id, b.doc_id, a.n, b.n
         |    HAVING MIN($pfxPosBound) >= ${pfxAlpha("a.n + b.n")}
         |  ) x
         |),
         |$szCte,
         |$interFullCte,
         |tr AS (
         |  SELECT doc_a, doc_b FROM (
         |    $jaccardSelect
         |  ) jj
         |),
         |tagged AS (
         |  SELECT 'minhash' AS technique, doc_a, doc_b FROM cm
         |  UNION ALL SELECT 'simhash_bands', doc_a, doc_b FROM cs
         |  UNION ALL SELECT 'prefix', doc_a, doc_b FROM cp
         |  UNION ALL SELECT 'truth', doc_a, doc_b FROM tr
         |),
         |j AS (
         |  SELECT t.technique, CAST(COUNT(*) AS BIGINT) AS cand_pairs,
         |    CAST(COUNT(v.doc_a) AS BIGINT) AS true_pairs
         |  FROM tagged t LEFT JOIN tr v
         |    ON v.doc_a = t.doc_a AND v.doc_b = t.doc_b
         |  GROUP BY t.technique
         |),
         |-- the technique DOMAIN is literal (the langidF1 / pii-kind
         |-- domain-join rule): a generator that admits zero pairs at
         |-- some slice must still show its cand_pairs=0 row — that row
         |-- IS the finding a reader needs, and a GROUP BY over tagged
         |-- rows alone would silently drop it
         |dom AS (
         |  SELECT 'minhash' AS technique UNION ALL SELECT 'simhash_bands'
         |  UNION ALL SELECT 'prefix' UNION ALL SELECT 'truth'
         |),
         |tc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM tr)
         |SELECT dom.technique,
         |  COALESCE(j.cand_pairs, 0) AS cand_pairs,
         |  COALESCE(j.true_pairs, 0) AS true_pairs,
         |  CASE WHEN COALESCE(j.cand_pairs, 0) = 0 THEN NULL
         |       ELSE ${d.idiv("1000000 * j.true_pairs", "j.cand_pairs")}
         |  END AS precision_ppm,
         |  CASE WHEN n_truth = 0 THEN NULL
         |       ELSE ${d.idiv("1000000 * COALESCE(j.true_pairs, 0)", "n_truth")}
         |  END AS recall_ppm
         |FROM dom LEFT JOIN j ON j.technique = dom.technique
         |CROSS JOIN tc""".stripMargin
    })

  /** Deterministic train/val/test corpus split (80/10/10 by content
    * hash): the dataset-assembly step every training pipeline runs.
    * Assignment is the md5 first-byte bucket (0-255: <205 train,
    * <230 val, else test) of the document id — RNG-free, so the split
    * is reproducible at any scale, stable under re-runs and
    * partitioning, and a doc never migrates between splits when the
    * corpus grows. Output is the per-(language, split) manifest; the
    * assignment itself is the narrow projection inside. */
  def corpusSplit(d: Dialect): String =
    s"""WITH s AS (
       |  SELECT doc_id, lang,
       |    CASE WHEN ${md5Bucket("CAST(doc_id AS STRING)")} < 205 THEN 'train'
       |         WHEN ${md5Bucket("CAST(doc_id AS STRING)")} < 230 THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM documents
       |)
       |SELECT lang, split, COUNT(*) AS n_docs
       |FROM s GROUP BY lang, split""".stripMargin

  /** Fuzzy-match (record-linkage) join: incoming documents (the odd
    * snapshot) matched to canonical corpus documents (the even
    * snapshot) through the SAME staged minhash band candidates the
    * dedup family uses, restricted to cross-snapshot pairs — the
    * bipartite entity-resolution shape ("link each new record to an
    * existing master record by similarity, not by key"). Survivor =
    * smallest canonical id; n_candidates reports match ambiguity. At
    * 100 TB the band join IS the fuzzy join — candidates stay
    * LSH-bounded, never a cross join of the two sides. */
  val fuzzyJoin: StagedOp = StagedOp(
    stages = dedupMinhash.stages,
    body = { _ =>
      s"""WITH bip AS (
         |  SELECT CASE WHEN doc_a % 2 = 1 THEN doc_a ELSE doc_b END AS incoming_id,
         |         CASE WHEN doc_a % 2 = 1 THEN doc_b ELSE doc_a END AS canonical_id
         |  FROM mh_cand
         |  WHERE doc_a % 2 <> doc_b % 2
         |)
         |SELECT incoming_id, MIN(canonical_id) AS matched_id,
         |  COUNT(*) AS n_candidates
         |FROM bip GROUP BY incoming_id""".stripMargin
    })

  /** Two-phase distinct count: COUNT(DISTINCT user) per event type as
    * dedup-then-count — phase 1 collapses to the (type, user) support
    * (map-side combinable, spreads the reduction over all partitions),
    * phase 2 counts rows per type. The classic rewrite that replaces
    * the planner's Expand-based distinct with two plain aggregates —
    * at 100 TB the difference between one skew-prone distinct
    * aggregation and two well-distributed ones. The DuckDB oracle runs
    * the direct COUNT(DISTINCT …) form: equality proves the rewrite
    * result-invisible (the bloom/heavy-hitter gate pattern applied to
    * aggregation strategy). */
  def distinctTwoPhase(d: Dialect): String =
    if (d.name == "duckdb")
      s"""SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
         |FROM events GROUP BY event_type""".stripMargin
    else
      s"""WITH su AS (
         |  SELECT event_type, user_id, COUNT(*) AS c
         |  FROM events GROUP BY event_type, user_id
         |)
         |SELECT event_type, COUNT(*) AS n_users,
         |  CAST(SUM(c) AS BIGINT) AS n_events
         |FROM su GROUP BY event_type""".stripMargin

  /** Mutual information I(source; lang) over the corpus — the
    * information-theoretic association measure next to the chi-square
    * test (chi-square answers "is there dependence?", MI answers "how
    * many bits does knowing the source tell you about the
    * language?" — the corpus-mix diagnostic for sampling stratification
    * decisions). One scan → contingency table; marginals are windows
    * over that tiny table (the chi-square pattern, no re-aggregation);
    * each cell's n_ij·log2(n_ij·N/(n_i·n_j)) term is a fixed chain of
    * correctly-rounded IEEE ops on exact integers, µ-quantized before
    * the int64 sum (round-half-up via FLOOR(x+½) is sign-correct for
    * the negative terms). Marginal products stay in int64 at bench
    * scale; at 100 TB move n_i·n_j to DECIMAL(38). */
  def mutualInfo(d: Dialect): String =
    s"""WITH o AS (
       |  SELECT source, lang, COUNT(*) AS nij FROM documents GROUP BY source, lang
       |),
       |x AS (
       |  SELECT source, lang, nij,
       |    CAST(SUM(nij) OVER (PARTITION BY source) AS BIGINT) AS ni,
       |    CAST(SUM(nij) OVER (PARTITION BY lang) AS BIGINT) AS nj,
       |    CAST(SUM(nij) OVER () AS BIGINT) AS n
       |  FROM o
       |),
       |q AS (
       |  SELECT source, lang, n,
       |    CAST(FLOOR(nij * log2(CAST(nij AS DOUBLE) * n / (ni * nj))
       |      * 1.0e6 + 5.0e-1) AS BIGINT) AS qt
       |  FROM x
       |)
       |SELECT COUNT(DISTINCT source) AS n_sources, COUNT(DISTINCT lang) AS n_langs,
       |  ${r6("CAST(SUM(qt) AS DOUBLE) / 1.0e6 / MAX(n)")} AS mi_bits
       |FROM q""".stripMargin

  /** First-order event-transition matrix (Markov behavior profile):
    * per-user previous→next event-type pair counts and row-normalized
    * transition probabilities — the session-behavior model a product
    * pipeline fits nightly. One shuffle on user_id for the LAG window
    * (arbitrarily parallel — no global ordering), one pair aggregate,
    * and the row normalizer is a window over the TYPE×TYPE matrix
    * (≤ |types|² rows). LAG order is (ts, event_id) so simultaneous
    * events break ties identically in both engines; the probability
    * is the single float division, r6'd. */
  def eventTransitions(d: Dialect): String =
    s"""WITH s AS (
       |  SELECT user_id, event_type,
       |    LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
       |  FROM events
       |),
       |m AS (
       |  SELECT prev, event_type AS next, COUNT(*) AS n
       |  FROM s WHERE prev IS NOT NULL GROUP BY prev, event_type
       |)
       |SELECT prev, next, CAST(n AS BIGINT) AS n_transitions,
       |  ${r6("CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY prev) AS DOUBLE)")} AS p
       |FROM m""".stripMargin

  /** Skyline (Pareto frontier) of orders over (price ↓, recency ↑) —
    * the multi-objective dominance operator: a point survives iff no
    * other point is cheaper-or-equal AND newer-or-equal with at least
    * one strict. The naive formulations are an O(n²) self-join or a
    * single global window (one partition holding the whole fact
    * table). This runs the boundary-bucket pattern instead: stage the
    * per-price-bucket max recency with its running cross-bucket max
    * (a ≤256-row table — the only ordered window over "everything"
    * runs there), broadcast it back, and keep only rows newer than
    * every strictly-cheaper bucket's best — the skyline is provably a
    * subset, and the exact dominance window then runs over that tiny
    * survivor set. Skyline is also mergeable (skyline(A∪B) =
    * skyline(skyline(A)∪skyline(B))), which is what makes the
    * prune-then-exact composition correct at any partition count.
    * All integer: price cents, epoch days, distinct-pair dedup before
    * the strict-dominance test. */
  val skylineOrders: StagedOp = StagedOp(
    stages = Seq(
      "sky_b" -> { d =>
        s"""WITH o AS (
           |  SELECT CAST(FLOOR(o_totalprice * 1.0e2 + 5.0e-1) AS BIGINT) AS pc,
           |    ${d.idiv(d.epochSeconds("CAST(o_orderdate AS TIMESTAMP)"), "86400")} AS ed
           |  FROM orders
           |),
           |b AS (
           |  SELECT ${d.idiv("pc", "262144")} AS pb, MAX(ed) AS bmax
           |  FROM o GROUP BY ${d.idiv("pc", "262144")}
           |)
           |SELECT pb, bmax,
           |  MAX(bmax) OVER (ORDER BY pb
           |    RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS premax
           |FROM b""".stripMargin
      }),
    body = { d =>
      s"""WITH o AS (
         |  SELECT CAST(FLOOR(o_totalprice * 1.0e2 + 5.0e-1) AS BIGINT) AS pc,
         |    ${d.idiv(d.epochSeconds("CAST(o_orderdate AS TIMESTAMP)"), "86400")} AS ed
         |  FROM orders
         |),
         |surv AS (
         |  SELECT DISTINCT o.pc, o.ed
         |  FROM o JOIN sky_b sb ON ${d.idiv("o.pc", "262144")} = sb.pb
         |  WHERE sb.premax IS NULL OR o.ed > sb.premax
         |),
         |w AS (
         |  SELECT pc, ed, MAX(ed) OVER (ORDER BY pc ASC, ed DESC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
         |  FROM surv
         |)
         |SELECT pc AS price_cents, ed AS epoch_day
         |FROM w WHERE pm IS NULL OR ed > pm
         |ORDER BY pc""".stripMargin
    })

  /** Per-brand monthly revenue trend by closed-form OLS — regression
    * at scale done the distributed way: each group's slope comes from
    * five sufficient statistics (n, Σx, Σy, Σxy, Σx²) that are plain
    * map-side-combinable SUMs over the (brand, month) pre-aggregate,
    * so the whole fit is two hash aggregations and zero windows/sorts
    * — the pattern that fits a million per-key models in one pass at
    * 100 TB (with DECIMAL(38) partials there; int64 bounds hold at
    * bench scale). Exact integers end-to-end: x = months since
    * 1992-01, y = revenue in cents×100 (price cents × (100 −
    * discount hundredths)); slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) is
    * the only float, two correctly-rounded divisions r6'd. */
  def trendByBrand(d: Dialect): String =
    s"""WITH m AS (
       |  SELECT p_brand AS brand,
       |    CAST(year(l_shipdate) * 12 + month(l_shipdate) - 23904 AS BIGINT) AS x,
       |    CAST(SUM(
       |      CAST(FLOOR(l_extendedprice * 1.0e2 + 5.0e-1) AS BIGINT)
       |      * (100 - CAST(FLOOR(l_discount * 1.0e2 + 5.0e-1) AS BIGINT))
       |    ) AS BIGINT) AS y
       |  FROM lineitem JOIN part ON l_partkey = p_partkey
       |  GROUP BY p_brand, year(l_shipdate) * 12 + month(l_shipdate) - 23904
       |),
       |s AS (
       |  SELECT brand, COUNT(*) AS n,
       |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
       |    CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx
       |  FROM m GROUP BY brand
       |)
       |SELECT brand, CAST(n AS BIGINT) AS n_months,
       |  ${r6("CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE) / 1.0e4")}
       |    AS slope_dollars_per_month
       |FROM s""".stripMargin

  /** Degree distribution of the near-dup candidate graph — the
    * structural diagnostic read next to the triangle count (a heavy
    * tail = hub/template pages about to quadratic-blow a downstream
    * verify join; the df-cap/band design keeps it bounded). Rolls up
    * the SAME staged band-candidate edges every other graph op uses:
    * two tiny aggregates over the materialized pair table. */
  val graphDegrees: StagedOp = StagedOp(
    stages = dedupMinhash.stages,
    body = { _ =>
      s"""WITH e AS (
         |  SELECT doc_a AS v FROM mh_cand
         |  UNION ALL
         |  SELECT doc_b AS v FROM mh_cand
         |),
         |deg AS (SELECT v, COUNT(*) AS deg FROM e GROUP BY v)
         |SELECT deg, COUNT(*) AS n_nodes FROM deg GROUP BY deg""".stripMargin
    })

  /** Z-order (Morton-curve) layout audit: bucketize two query
    * dimensions of orders (price, order date) to 8 bits each,
    * interleave the bits into a 16-bit z-value, group rows into
    * 256-z-value "files", and report each file's per-dimension
    * min/max span. This is the table-layout operator behind
    * OPTIMIZE/ZORDER in lakehouse engines: at 100 TB you
    * `repartitionByRange(zval)` + sort-within-partitions before the
    * parquet write so every file's min/max footer stats cover a tight
    * rectangle in BOTH dimensions and either predicate prunes files —
    * a single-dimension sort gives perfect pruning on one column and
    * none on the other (the honest win is the WORST dimension's span,
    * not the rectangle area — BucketingSpec proves it against a
    * date-sorted layout on real written files). The query emits
    * exactly that audit (span per z-file); its own plan is one scan +
    * one 256-group aggregate.
    *
    * All integer arithmetic: buckets are floor-divisions of exact
    * values (price floored to whole units first — DuckDB CAST rounds
    * where Spark truncates), the interleave is Σ bit·4^i via
    * idiv/modulo (no engine bit operators needed), so both engines
    * produce identical rows. Date bucket anchors at epoch day 8035
    * (1992-01-01, the TPC-H date floor) over ~10-day cells; price
    * cells are 2500 units capped at bucket 255. */
  def zorderLayout(d: Dialect): String = {
    def bit(x: String, i: Int): String =
      s"(${d.idiv(x, (1L << i).toString)} % 2)"
    val z = (0 until 8).map { i =>
      s"${bit("pb", i)} * ${1L << (2 * i)} + ${bit("db", i)} * ${1L << (2 * i + 1)}"
    }.mkString(" + ")
    s"""WITH b AS (
       |  SELECT
       |    LEAST(${d.idiv("CAST(FLOOR(o_totalprice) AS BIGINT)", "2500")}, 255) AS pb,
       |    LEAST(${d.idiv(
             // clamp BEFORE dividing: idiv's nonnegative contract (Spark
             // DIV truncates toward zero, DuckDB // floors — they only
             // agree at ≥ 0, and a pre-anchor date would diverge silently)
             s"GREATEST(${d.epochSeconds("CAST(o_orderdate AS TIMESTAMP)")} - ${8035L * 86400}, 0)",
             "864000")}, 255) AS db
       |  FROM orders
       |),
       |z AS (SELECT pb, db, $z AS zval FROM b)
       |SELECT ${d.idiv("zval", "256")} AS zfile, COUNT(*) AS n_rows,
       |  MIN(pb) AS pb_min, MAX(pb) AS pb_max,
       |  MIN(db) AS db_min, MAX(db) AS db_max,
       |  CAST((MAX(pb) - MIN(pb) + 1) * (MAX(db) - MIN(db) + 1) AS BIGINT) AS span_area
       |FROM z GROUP BY ${d.idiv("zval", "256")}""".stripMargin
  }

  /** Chi-square independence test between event type and (epoch) day
    * of week — the drift/seasonality monitor a data-quality suite
    * runs per ingest. Observed counts are one map-side-combinable
    * aggregate; row/column/grand totals are windows over the
    * TYPE×7-row contingency table (single reference — no re-scan per
    * marginal); each cell's (o−e)²/e term is an IEEE chain on exact
    * integer inputs, µ-quantized before the final sum so both engines
    * add identical int64 values. */
  /** The (o−e)²/e cell term over window marginals rt/ct/n — THE one
    * copy of the chi-square contribution, shared by [[chiSquare]] and
    * [[labelDrift]] (the per-op-fork rule: a quantization or guard
    * change must not be applicable to one op and missed in the
    * other). Callers with spine-filled contingencies must guard the
    * e = 0 cells themselves (an all-observed contingency like
    * [[chiSquare]]'s never has one). */
  private[ops] val chi2CellTerm: String =
    "(obs - rt * ct / n) * (obs - rt * ct / n) / (rt * ct / n)"

  def chiSquare(d: Dialect): String = {
    val term = chi2CellTerm
    s"""WITH e AS (
       |  SELECT event_type,
       |    CAST(FLOOR(${d.epochSeconds("ts")} / 86400.0) AS BIGINT) % 7 AS dow
       |  FROM events
       |),
       |o AS (SELECT event_type, dow, COUNT(*) AS obs FROM e GROUP BY event_type, dow),
       |x AS (
       |  SELECT event_type, dow, CAST(obs AS DOUBLE) AS obs,
       |    CAST(SUM(obs) OVER (PARTITION BY event_type) AS DOUBLE) AS rt,
       |    CAST(SUM(obs) OVER (PARTITION BY dow) AS DOUBLE) AS ct,
       |    CAST(SUM(obs) OVER () AS DOUBLE) AS n
       |  FROM o
       |),
       |q AS (
       |  SELECT CAST(FLOOR($term * 1.0e6 + 5.0e-1) AS BIGINT) AS qt,
       |    event_type, dow
       |  FROM x
       |)
       |SELECT COUNT(DISTINCT event_type) AS n_types, COUNT(DISTINCT dow) AS n_dows,
       |  ${r6("CAST(SUM(qt) AS DOUBLE) / 1.0e6")} AS chi2
       |FROM q""".stripMargin
  }

  /** One-sided CUSUM drift detector over daily event volumes per type
    * — the sequential change-point monitor (Page 1954) that completes
    * the data-quality family next to the chi-square seasonality test
    * and the MAD outlier gate: chi-square asks "is the composition
    * off?", MAD asks "is this row off?", CUSUM asks "did the LEVEL
    * shift and stay shifted?". Slack κ = μ/4, alarm when the
    * statistic exceeds 2μ.
    *
    * The textbook recursion S_d = max(0, S_{d−1} + (c_d − μ − κ)) is
    * not a window function, but its closed form is: S_d = P_d −
    * min(0, min_{j≤d} P_j) over the running sum P of deviations — so
    * the whole detector is ONE daily pre-aggregation (the only big
    * shuffle; map-side combinable) plus windows over the tiny
    * (type × day) series. The per-type totals are WINDOWS over the
    * daily counts, not a GROUP BY joined back — Spark inlines CTEs,
    * so the join form re-ran the daily aggregation (and the fact
    * scan) twice; the window form shares the one event_type exchange
    * with the cumulative sums (PlanSpec pins single-scan). Deviations
    * are scaled by 4·n_days so μ and κ stay exact integers
    * (4·c·D − 5·T); the single unscaled float op is the final peak
    * division. */
  def cusumDrift(d: Dialect): String =
    s"""WITH dc AS (
       |  SELECT event_type,
       |    ${d.idiv(d.epochSeconds("ts"), "86400")} AS day, COUNT(*) AS c
       |  FROM events GROUP BY event_type, ${d.idiv(d.epochSeconds("ts"), "86400")}
       |),
       |w AS (
       |  SELECT event_type, day, c,
       |    CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT) AS t,
       |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS nd
       |  FROM dc
       |),
       |p AS (
       |  SELECT event_type, day, nd, t,
       |    CAST(SUM(4 * c * nd - 5 * t) OVER (
       |      PARTITION BY event_type ORDER BY day
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS pre
       |  FROM w
       |),
       |s AS (
       |  SELECT event_type, day, nd, t,
       |    pre - LEAST(CAST(MIN(pre) OVER (
       |      PARTITION BY event_type ORDER BY day
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT), 0) AS cus
       |  FROM p
       |)
       |SELECT event_type, CAST(MAX(nd) AS BIGINT) AS n_days,
       |  CAST(SUM(CASE WHEN cus > 8 * t THEN 1 ELSE 0 END) AS BIGINT) AS n_alarm_days,
       |  ${r6("CAST(MAX(cus) AS DOUBLE) / (4.0 * MAX(nd))")} AS peak_dev
       |FROM s GROUP BY event_type""".stripMargin

  /** Asymmetric containment near-dup (|A∩B| / min(|A|,|B|) ≥ 0.9): the
    * quote/boilerplate-inclusion signal Jaccard misses — a short doc
    * fully embedded in a long one has tiny Jaccard but containment 1.
    * Runs over the SAME staged df-capped shingle index as the Jaccard
    * ops (no extra pipeline); the df cap bounds the self-join exactly
    * as there, so candidates stay bounded at any corpus size. At 100 TB
    * the gated form (candidates from minhash bands) composes the same
    * way [[dedupVerified]] gates Jaccard. */
  val dedupContainment: StagedOp = StagedOp(
    stages = dedupNgramJaccard.stages,
    body = { _ =>
      val cont = "CAST(i.inter AS DOUBLE) / LEAST(sa.n, sb.n)"
      s"""WITH $szCte,
         |$interFullCte
         |SELECT i.doc_a, i.doc_b,
         |  ${r6(cont)} AS containment
         |FROM inter i
         |JOIN sz sa ON i.doc_a = sa.doc_id
         |JOIN sz sb ON i.doc_b = sb.doc_id
         |WHERE $cont >= 0.9""".stripMargin
    })

  /** Triangle count of the near-dup candidate graph — the
    * graph-cohesion diagnostic (triangle-dense regions = tight
    * duplicate families, triangle-free stars = hub/template pages).
    * Edges are already oriented doc_a < doc_b, so the two-hop path join
    * (a<b<c) plus the closing-edge join counts each triangle exactly
    * once — the standard oriented-edge algorithm (at 100 TB orient by
    * DEGREE instead of id so high-degree hubs don't own both join
    * sides; candidate edges here are band-bounded so id order
    * suffices). Both joins shuffle on an edge endpoint — no all-pairs
    * step anywhere. */
  val graphTriangles: StagedOp = StagedOp(
    stages = dedupMinhash.stages,
    body = { _ =>
      s"""WITH ec AS (SELECT COUNT(*) AS n_edges FROM mh_cand),
         |tri AS (
         |  SELECT COUNT(*) AS n_triangles
         |  FROM mh_cand e1
         |  JOIN mh_cand e2 ON e2.doc_a = e1.doc_b
         |  JOIN mh_cand e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b
         |)
         |SELECT ec.n_edges, tri.n_triangles FROM ec CROSS JOIN tri""".stripMargin
    })

  /** Robust per-type outlier detection: median + MAD (median absolute
    * deviation), flagging |x − med| > 5·MAD — the data-quality monitor
    * that survives the heavy tails a mean/stddev z-score drowns in.
    * Values are µ-quantized to integer cents first (the
    * [[eventPercentiles]] parity rule), so both percentile passes
    * interpolate over exactly-representable values (halves at worst) —
    * bit-identical across engines. Two grouped exact percentiles = two
    * shuffles on event_type; at 100 TB swap in approx_percentile for
    * the same two-pass shape. */
  val anomalyMad: StagedOp = {
    val cents = "CAST(FLOOR(value * 100 + 5.0e-1) AS BIGINT)"
    StagedOp(
      stages = Seq(
        // per-type median (tiny: one row per event type) — staged so the
        // deviation pass and the final pass don't re-run it under CTE
        // inlining (a stats table this hot is exactly what production
        // materializes)
        "madm" -> { d =>
          s"""SELECT event_type, ${d.percentileCont(cents, "5.0e-1")} AS medc
             |FROM events GROUP BY event_type""".stripMargin
        },
        // per-type MAD off the staged medians (same shape, one more pass)
        "mads" -> { d =>
          s"""SELECT e.event_type, m.medc,
             |  ${d.percentileCont(s"abs($cents - m.medc)", "5.0e-1")} AS madc
             |FROM events e JOIN madm m ON e.event_type = m.event_type
             |GROUP BY e.event_type, m.medc""".stripMargin
        }),
      body = { _ =>
        s"""SELECT e.event_type,
           |  ${r6("s.medc / 1.0e2")} AS median_value,
           |  ${r6("s.madc / 1.0e2")} AS mad_value,
           |  CAST(SUM(CASE WHEN abs($cents - s.medc) > 5 * s.madc THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           |  COUNT(*) AS n
           |FROM events e JOIN mads s ON e.event_type = s.event_type
           |GROUP BY e.event_type, s.medc, s.madc""".stripMargin
      })
  }

  /** Corpus-common n-gram fraction (the C4/CCNet line-dedup analogue at
    * shingle granularity): for every corpus doc, the fraction of its
    * DISTINCT 3-grams whose document frequency is ≥ 4 — i.e. shared
    * boilerplate, since the two-snapshot corpus gives every shingle
    * df ≥ 2 for free and df ≥ 4 means "appears in at least two distinct
    * source documents". The staged stage is the UNCAPPED distinct
    * (doc, shingle) index ([[dedupNgramJaccard]]'s index drops df > 20
    * rows, which is exactly the signal here). The df aggregate is
    * shingle-cardinality with map-side partial counts; the join back is
    * one shuffle on the fixed-width shingle id; the per-doc aggregate
    * closes it — three bounded shuffles at any corpus size, never a
    * pairwise comparison. */
  val dedupCommonNgrams: StagedOp = StagedOp(
    stages = Seq(
      "cng_dsh" -> { d =>
        val sid = d.shingleId("s")
        s"""WITH ${corpusCte(d)},
           |${shinglesCtes(d)}
           |SELECT DISTINCT doc_id, $sid AS s FROM sh""".stripMargin
      }),
    body = { _ =>
      s"""WITH df AS (SELECT s, COUNT(*) AS df FROM cng_dsh GROUP BY s)
         |SELECT c.doc_id, COUNT(*) AS n_shingles,
         |  CAST(SUM(CASE WHEN f.df >= 4 THEN 1 ELSE 0 END) AS BIGINT) AS n_common,
         |  CAST(SUM(CASE WHEN f.df >= 4 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS common_frac
         |FROM cng_dsh c JOIN df f ON c.s = f.s
         |GROUP BY c.doc_id""".stripMargin
    })

  /** Cross-document duplicated-span profile — the ExactSubstr dedup
    * signal (Lee et al. 2022, "Deduplicating Training Data Makes
    * Language Models Better") at 8-token window granularity: for each
    * doc, how many of its token windows also appear verbatim in
    * another document, and the longest consecutive duplicated run.
    * Windows are position-aware shingles; a window is duplicated iff
    * its shingle occurs in ≥ 2 distinct docs; runs are
    * gaps-and-islands over the duplicated positions (pos − ROW_NUMBER,
    * all-integer). flag_substr marks docs whose longest run spans ≥ 8
    * windows (a ≥ 15-token verbatim overlap) — the remove-this-span
    * decision input. Scale shape: window df is shingle-cardinality
    * with map-side partial counts; the join back is one shuffle on the
    * fixed-width shingle id; runs are a per-doc window — never a
    * pairwise doc join, unlike true suffix-array ExactSubstr. */
  val dedupSubstring: StagedOp = StagedOp(
    stages = Seq(
      // the position-aware window index (doc, start-pos, window id) —
      // the heavy token pipeline runs ONCE here; the body's three
      // references (df, dup join, totals) scan the columnar artifact.
      // Spark would otherwise inline this CTE per reference and run
      // the 8-LEAD shingle explode three times (ScanAudit caught it)
      "ss_win" -> { d =>
        s"""WITH docs AS (SELECT doc_id, text FROM documents),
           |${d.shingleRowsPos("docs", 8)}
           |SELECT doc_id, pos, ${d.shingleId("s")} AS sid FROM shp""".stripMargin
      }),
    body = { _ =>
      s"""WITH df AS (SELECT sid, COUNT(DISTINCT doc_id) AS ndocs
         |  FROM ss_win GROUP BY sid),
         |dup AS (SELECT w.doc_id, w.pos FROM ss_win w JOIN df ON w.sid = df.sid
         |        WHERE df.ndocs >= 2),
         |runs AS (SELECT doc_id,
         |    pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
         |  FROM dup),
         |runlen AS (SELECT doc_id, grp, COUNT(*) AS run FROM runs GROUP BY doc_id, grp),
         |da AS (SELECT doc_id, CAST(SUM(run) AS BIGINT) AS n_dup,
         |    CAST(MAX(run) AS BIGINT) AS max_run
         |  FROM runlen GROUP BY doc_id),
         |tot AS (SELECT doc_id, COUNT(*) AS n_windows FROM ss_win GROUP BY doc_id)
         |SELECT t.doc_id, t.n_windows,
         |  COALESCE(a.n_dup, 0) AS n_dup_windows,
         |  COALESCE(a.max_run, 0) AS max_dup_run,
         |  CASE WHEN COALESCE(a.max_run, 0) >= 8 THEN 1 ELSE 0 END AS flag_substr
         |FROM tot t LEFT JOIN da a ON t.doc_id = a.doc_id""".stripMargin
    })

  /** Unigram language-model surprisal score (the CCNet/KenLM
    * quality-filter analogue, integer-exact): a token's surprisal is
    * its floor-log2 code length ⌊log2 N⌋ − ⌊log2 c⌋ bits, computed
    * EXACTLY in both engines as length(bin(N)) − length(bin(c)); a
    * doc's score is the total and mean bits per token. Rare-token-
    * heavy docs score high, boilerplate scores low — the standard
    * perplexity-bucket signal, denominated in integers so the only
    * float op is the final mean (one division of two exact values).
    * One vocab-cardinality count (map-side combinable), a token→vocab
    * join on the token, one per-doc aggregate; the corpus total rides
    * a broadcastable 1-row cross join. */
  val textUnigramLm: StagedOp = StagedOp(
    stages = Seq(
      // per-(doc, token) term frequencies — the token explode runs
      // ONCE; the body's two references (vocab window + corpus total)
      // scan the columnar artifact. Global count per token is then a
      // token-partitioned window over tf (the tfidf df trick), not a
      // separate vocab join
      "ulm_tf" -> { d =>
        s"""WITH docs AS (SELECT doc_id, text FROM documents),
           |${d.shingleRows("docs", 1)}
           |SELECT doc_id, s, COUNT(*) AS tf FROM sh GROUP BY doc_id, s""".stripMargin
      }),
    body = { _ =>
      s"""WITH c AS (SELECT doc_id, tf,
         |    CAST(SUM(tf) OVER (PARTITION BY s) AS BIGINT) AS c FROM ulm_tf),
         |n AS (SELECT CAST(SUM(tf) AS BIGINT) AS nn FROM ulm_tf)
         |SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
         |  CAST(SUM(tf * (length(bin(nn)) - length(bin(c)))) AS BIGINT) AS total_bits,
         |  CAST(SUM(tf * (length(bin(nn)) - length(bin(c)))) AS DOUBLE) /
         |    CAST(SUM(tf) AS BIGINT) AS mean_bits
         |FROM c CROSS JOIN n
         |GROUP BY doc_id""".stripMargin
    })

  /** Last-touch attribution: each purchase credited to the same user's
    * most recent preceding view/click within the hour — the marketing
    * analytics staple, expressed as one window pass (running MAX of
    * touch time over strictly preceding rows; MAX skips the NULLs
    * non-touch events produce, so no IGNORE NULLS dialect divergence).
    * One shuffle on user_id; the ORDER BY carries event_id so ties at
    * equal timestamps resolve identically everywhere. */
  def attributionLastTouch(d: Dialect): String =
    s"""WITH e AS (
       |  SELECT event_id, user_id, event_type, ${d.epochSeconds("ts")} AS us
       |  FROM events
       |),
       |u AS (
       |  SELECT user_id, event_id, event_type, us,
       |    MAX(CASE WHEN event_type IN ('view', 'click') THEN us END) OVER (
       |      PARTITION BY user_id ORDER BY us, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch_us
       |  FROM e
       |)
       |SELECT user_id, event_id AS purchase_id, touch_us,
       |  us - touch_us AS delay_s
       |FROM u
       |WHERE event_type = 'purchase' AND touch_us IS NOT NULL
       |  AND us - touch_us <= 3600""".stripMargin

  /** Zipf slope of the corpus unigram distribution: OLS fit of
    * log2(count) against log2(rank) over the top-64 tokens — the
    * corpus-health diagnostic (natural text ≈ −1; template/generated
    * text flattens). Reuses the staged [[textUnigramLm]] term
    * frequencies; ranking is a window over the VOCAB-sized aggregate
    * (the vocabCoverage bound), and the regression sums are
    * µ-quantized log2 values in int64 so both engines sum exactly —
    * the only unquantized float op is the final slope division. */
  /** Heaps'-law vocabulary-growth fit — [[zipfFit]]'s sibling
    * diagnostic: V(N) ≈ K·N^β, with natural text at β ≈ 0.4–0.6
    * (template/generated text flattens toward 0; unbounded noise
    * pushes toward 1). Vocabulary size at a prefix length N needs no
    * per-prefix distinct: a token's FIRST global occurrence position
    * is one groupBy-min, and V(N) = #{first ≤ N}. Global positions
    * use the sharded global-rownum decomposition (per-doc offsets via
    * a window over the doc-cardinality length table — never a global
    * sort of the token stream). Checkpoints are powers of two
    * inlined as exact literals (the EWMA pow lesson: never compute
    * even 2^k through a float pow in-engine when a literal table
    * costs nothing), so log2(N) is EXACTLY k·1e6 µbits and the OLS
    * x-coordinates carry zero quantization error; the y side is the
    * shared µ-quantized log2. One token pass + vocab-sized joins. */
  val heapsFit: StagedOp = StagedOp(
    stages = textUnigramLm.stages :+ ("hp_first" -> { (d: Dialect) =>
      s"""WITH docs AS (SELECT doc_id, text FROM documents),
         |${d.shingleRowsPos("docs", 1)},
         |dlen AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM shp GROUP BY doc_id),
         |off AS (
         |  SELECT doc_id,
         |    CAST(SUM(n) OVER (ORDER BY doc_id) AS BIGINT) - n AS o
         |  FROM dlen
         |)
         |SELECT t.s, CAST(MIN(o.o + t.pos + 1) AS BIGINT) AS first_pos
         |FROM shp t JOIN off o ON t.doc_id = o.doc_id
         |GROUP BY t.s""".stripMargin
    }),
    body = { _ =>
      val cps = (0 to 30).map(k => s"SELECT $k AS k, CAST(${1L << k} AS BIGINT) AS cp")
        .mkString("\n         |  UNION ALL ")
      s"""WITH tot AS (SELECT CAST(SUM(tf) AS BIGINT) AS nn FROM ulm_tf),
         |cps AS (
         |  $cps
         |),
         |valid AS (SELECT k, cp FROM cps CROSS JOIN tot WHERE cp <= nn),
         |vat AS (
         |  SELECT v.k, v.cp, CAST(COUNT(*) AS BIGINT) AS vocab
         |  FROM valid v JOIN hp_first f ON f.first_pos <= v.cp
         |  GROUP BY v.k, v.cp
         |),
         |q AS (SELECT CAST(k AS BIGINT) * 1000000 AS qx, ${qlog2("vocab")} AS qy FROM vat),
         |m AS (
         |  SELECT COUNT(*) AS n, CAST(SUM(qx) AS BIGINT) AS sx,
         |    CAST(SUM(qy) AS BIGINT) AS sy, CAST(SUM(qx * qy) AS BIGINT) AS sxy,
         |    CAST(SUM(qx * qx) AS BIGINT) AS sxx
         |  FROM q
         |)
         |SELECT n AS n_checkpoints,
         |  CASE WHEN n * sxx - sx * sx = 0 THEN NULL
         |       ELSE ${r6("CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)")}
         |  END AS heaps_beta
         |FROM m""".stripMargin
    })

  val zipfFit: StagedOp = StagedOp(
    stages = textUnigramLm.stages,
    body = { _ =>
      val qlog = qlog2 _
      s"""WITH vc AS (SELECT s, CAST(SUM(tf) AS BIGINT) AS c FROM ulm_tf GROUP BY s),
         |rk AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, s) AS r FROM vc),
         |q AS (
         |  SELECT ${qlog("r")} AS qx, ${qlog("c")} AS qy
         |  FROM rk WHERE r <= 64
         |),
         |m AS (
         |  SELECT COUNT(*) AS n, CAST(SUM(qx) AS BIGINT) AS sx,
         |    CAST(SUM(qy) AS BIGINT) AS sy, CAST(SUM(qx * qy) AS BIGINT) AS sxy,
         |    CAST(SUM(qx * qx) AS BIGINT) AS sxx
         |  FROM q
         |)
         |SELECT n AS n_terms,
         |  CASE WHEN n * sxx - sx * sx = 0 THEN NULL
         |       ELSE ${r6("CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)")}
         |  END AS zipf_slope
         |FROM m""".stripMargin
    })

  /** Good-Turing frequency re-estimation over the corpus unigram
    * distribution (Good 1953; the Katz-backoff discount and the
    * standard answer to "how much probability mass belongs to tokens
    * we have never seen") — the vocabulary-growth companion to
    * [[heapsFit]] and the smoothing step under any n-gram LM built on
    * these counts: per count class r, the frequency-of-frequencies
    * N_r, the Turing-discounted count r* = (r+1)·N_{r+1}/N_r, its
    * probability p = r* / N, and the corpus-constant unseen mass
    * P₀ = N₁/N. Every input is an exact int64 count off the staged
    * [[textUnigramLm]] term frequencies; the class table is COUNT-
    * cardinality (≤ distinct token counts, ≪ vocab) and the r ∈ 1..8
    * readout domain is LEFT-JOIN-driven (the acfRevenue absent-row
    * convention: an empty class emits (r, 0, 0, NULL, NULL), never
    * vanishes — and r* is NULL exactly when the estimator is
    * undefined, N_r = 0). The only float ops are the final two
    * divisions per row on exact integers, r6'd. Scale shape: one
    * vocab-cardinality aggregate over the staged index, then all
    * arithmetic at count-class cardinality (dozens of rows at any
    * corpus size). */
  val goodTuring: StagedOp = StagedOp(
    // the vocab-count table is a STAGE, not a CTE: the body reads it
    // three times (class table, totals, N₁ subquery), and Spark's CTE
    // inlining would re-run the corpus-scale aggregate per reference
    stages = textUnigramLm.stages :+ ("gt_vc" -> { (_: Dialect) =>
      "SELECT s, CAST(SUM(tf) AS BIGINT) AS c FROM ulm_tf GROUP BY s"
    }),
    body = { _ =>
      val dom = domainRel("r", (1 to 8).map(_.toString))
      s"""WITH vc AS (SELECT s, c FROM gt_vc),
         |ff AS (SELECT c AS r, CAST(COUNT(*) AS BIGINT) AS nr FROM vc GROUP BY c),
         |tot AS (
         |  SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) AS n,
         |    CAST(COUNT(*) AS BIGINT) AS v
         |  FROM vc
         |),
         |dom AS ($dom)
         |SELECT dm.r,
         |  CAST(COALESCE(f0.nr, 0) AS BIGINT) AS n_r,
         |  CAST(COALESCE(f1.nr, 0) AS BIGINT) AS n_r_next,
         |  CASE WHEN COALESCE(f0.nr, 0) = 0 THEN NULL
         |       ELSE ${r6("CAST((dm.r + 1) * COALESCE(f1.nr, 0) AS DOUBLE) / f0.nr")}
         |  END AS r_star,
         |  CASE WHEN COALESCE(f0.nr, 0) = 0 OR t.n = 0 THEN NULL
         |       ELSE ${r6(
                   "CAST((dm.r + 1) * COALESCE(f1.nr, 0) AS DOUBLE) / f0.nr " +
                   "/ CAST(t.n AS DOUBLE)")}
         |  END AS p_gt,
         |  t.n AS n_tokens, t.v AS vocab,
         |  CASE WHEN t.n = 0 THEN NULL
         |       ELSE ${r6("CAST((SELECT COALESCE(MAX(f9.nr), 0) FROM ff f9 WHERE f9.r = 1) AS DOUBLE) / t.n")}
         |  END AS p_unseen
         |FROM dom dm
         |LEFT JOIN ff f0 ON f0.r = dm.r
         |LEFT JOIN ff f1 ON f1.r = dm.r + 1
         |CROSS JOIN tot t
         |ORDER BY dm.r""".stripMargin
    })

  /** Chao1 species-richness estimate of the vocabulary (Chao 1984,
    * bias-corrected form) — "how many word types does this corpus'
    * SOURCE have, including the ones we haven't seen yet": V̂ = V +
    * N₁(N₁−1)/(2(N₂+1)) from the same frequency-of-frequencies the
    * Good-Turing readout uses (one shared staged gt_vc — the
    * estimator and the smoother cannot disagree on the counts), plus
    * Good's sample-coverage Ĉ = 1 − N₁/N (the fraction of the source
    * distribution's mass the corpus has already observed — the
    * "diminishing returns" number a crawl-more decision reads). All
    * inputs are exact int64 class counts at count-class cardinality;
    * the correction term is one fixed IEEE expression (N₂ = 0 is
    * well-defined in the bias-corrected form), coverage is an exact
    * idiv ppm. */
  val chao1Richness: StagedOp = StagedOp(
    stages = goodTuring.stages,
    body = { d =>
      s"""WITH ff AS (
         |  SELECT
         |    CAST(COUNT(*) AS BIGINT) AS v,
         |    CAST(COALESCE(SUM(c), 0) AS BIGINT) AS n,
         |    CAST(COALESCE(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n1,
         |    CAST(COALESCE(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n2
         |  FROM gt_vc
         |)
         |SELECT v AS vocab, n AS n_tokens, n1 AS singletons, n2 AS doubletons,
         |  ${r6("CAST(v AS DOUBLE) + CAST(n1 AS DOUBLE) * (n1 - 1) / (2.0e0 * (n2 + 1))")} AS chao1,
         |  CASE WHEN n = 0 THEN NULL
         |       ELSE ${d.idiv("1000000 * (n - n1)", "n")} END AS coverage_ppm
         |FROM ff""".stripMargin
    })

  /** Hill tail-index estimator over the token-frequency distribution
    * (Hill 1975) — the heavy-tail companion to [[zipfFit]]'s log-log
    * OLS: the OLS says "roughly a power law", the Hill estimator
    * measures the tail exponent α from the top-k order statistics
    * alone, 1/α̂ = (1/k)·Σ_{i≤k} ln(c_(i)/c_(k+1)). k = 16 (the
    * fixture vocabulary is 31 types; k+1 ranks must exist or the
    * readout is NULL — the degenerate-input convention). The rank
    * window runs over the staged vocab-count table (vocab-cardinality,
    * the zipfFit precedent — never over tokens); each log term is an
    * exact int64 µ-log2 difference ([[qlog2]]), summed exactly, and
    * the single ln(2) factor to convert log2→ln is one literal
    * multiply (a CONSTANT literal both engines share — the
    * transcendental-pinning rule; only the per-row logs must avoid
    * engine pow/ln divergence, and qlog2 does). */
  val hillTail: StagedOp = StagedOp(
    stages = goodTuring.stages,
    body = { _ =>
      val k = 16
      s"""WITH rk AS (
         |  SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, s) AS r FROM gt_vc
         |),
         |kth AS (SELECT c AS ck FROM rk WHERE r = ${k + 1}),
         |s AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_top,
         |    CAST(COALESCE(SUM(${qlog2("rk.c")} - ${qlog2("kth.ck")}), 0) AS BIGINT) AS slog2
         |  FROM rk CROSS JOIN kth WHERE rk.r <= $k
         |)
         |SELECT $k AS k, n_top, slog2 AS sum_log2_mu,
         |  CASE WHEN n_top < $k THEN NULL
         |       ELSE ${r6(s"6.93147180559945e-1 * slog2 / (1.0e6 * $k)")} END AS hill_inv,
         |  CASE WHEN n_top < $k OR slog2 = 0 THEN NULL
         |       ELSE ${r6(s"1.0e6 * $k / (6.93147180559945e-1 * slog2)")} END AS tail_index
         |FROM s""".stripMargin
    })

  /** Fellegi-Sunter record-linkage weights (Fellegi & Sunter 1969 —
    * the probabilistic-matching standard behind every production
    * entity-resolution stack): for each comparison field, the
    * agreement probability among MATCHED pairs (m) vs among RANDOM
    * pairs (u), whose ratio is the field's match weight. Matches are
    * the engine's own near-dup candidate pairs (the staged minhash
    * mh_cand — the labeled set a dedup pipeline already owns);
    * attributes join back through the snapshot id (doc_id DIV 2, the
    * corpusCte contract). u needs NO pair sampling: under the random-
    * pairing model, P(two random docs agree on field F) is exactly
    * Σ_g n_g(n_g−1) / (N(N−1)) over F's value marginals — closed-form
    * integer arithmetic at field-cardinality, replacing the usual
    * sampled-nonmatch estimate (and its RNG nondeterminism) with the
    * exact expectation. Fields: source, lang, and the 32-char length
    * bucket. All probabilities are exact integer ppm ([[qualityAuc]]'s
    * idiv discipline; loud int64 guard past 2M docs where 10⁶·N²
    * approaches the envelope); the weight ratio is the one r6'd float
    * division. Scale shape: one bounded pair-table aggregate + ONE
    * GROUPING SETS pass for all three marginals and the doc count
    * (three separate per-field aggregates would each re-scan the
    * corpus under CTE inlining) — nothing all-pairs anywhere. Att
    * columns are COALESCE'd to a sentinel so the grouping-set NULLs
    * are unambiguous set tags even if a raw attribute were NULL. */
  val linkageFs: StagedOp = StagedOp(
    stages = dedupMinhash.stages,
    body = { d =>
      val pairAgg = Seq(
        ("source", "a.source = b.source"),
        ("lang", "a.lang = b.lang"),
        ("len_bucket", "a.lb = b.lb")).map { case (f, cond) =>
        s"CAST(SUM(CASE WHEN $cond THEN 1 ELSE 0 END) AS BIGINT) AS ag_$f"
      }.mkString(",\n    ")
      def row(f: String) =
        s"""SELECT '$f' AS field,
           |  CASE WHEN mp.n = 0 THEN NULL
           |       ELSE ${d.idiv("1000000 * mp.ag_" + f, "mp.n")} END AS m_ppm,
           |  CASE WHEN nn.n < 2 THEN NULL
           |       ELSE ${d.idiv(s"1000000 * um.a_$f", "nn.n * (nn.n - 1)")} END AS u_ppm,
           |  CASE WHEN mp.n = 0 OR nn.n < 2 OR um.a_$f = 0 THEN NULL
           |       ELSE ${r6(
                 s"(CAST(${d.idiv("1000000 * mp.ag_" + f, "mp.n")} AS DOUBLE)) " +
                 s"/ ${d.idiv(s"1000000 * um.a_$f", "nn.n * (nn.n - 1)")}")}
           |  END AS weight_ratio
           |FROM mp CROSS JOIN nn CROSS JOIN um""".stripMargin
      s"""WITH att AS (
         |  SELECT doc_id, COALESCE(source, CHR(1)) AS source,
         |    COALESCE(lang, CHR(1)) AS lang,
         |    COALESCE(${d.idiv("n_chars", "32")}, -1) AS lb
         |  FROM documents
         |),
         |mp AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |    $pairAgg
         |  FROM mh_cand c
         |  JOIN att a ON a.doc_id = ${d.idiv("c.doc_a", "2")}
         |  JOIN att b ON b.doc_id = ${d.idiv("c.doc_b", "2")}
         |),
         |mg AS (
         |  SELECT source, lang, lb, CAST(COUNT(*) AS BIGINT) AS n
         |  FROM att GROUP BY GROUPING SETS ((source), (lang), (lb))
         |),
         |um AS (
         |  SELECT
         |    CAST(COALESCE(SUM(CASE WHEN source IS NOT NULL THEN n * (n - 1) END), 0) AS BIGINT) AS a_source,
         |    CAST(COALESCE(SUM(CASE WHEN lang IS NOT NULL THEN n * (n - 1) END), 0) AS BIGINT) AS a_lang,
         |    CAST(COALESCE(SUM(CASE WHEN lb IS NOT NULL THEN n * (n - 1) END), 0) AS BIGINT) AS a_len_bucket,
         |    CAST(COALESCE(SUM(CASE WHEN source IS NOT NULL THEN n END), 0) AS BIGINT) AS nd
         |  FROM mg
         |),
         |nn AS (
         |  SELECT CASE WHEN nd > 2000000
         |    THEN CAST('linkage-fs: doc count exceeds the int64 ppm envelope' AS BIGINT)
         |    ELSE nd END AS n
         |  FROM um
         |)
         |${row("source")}
         |UNION ALL
         |${row("lang")}
         |UNION ALL
         |${row("len_bucket")}
         |ORDER BY field""".stripMargin
    })

  /** DSIR-style importance weighting (Xie et al. 2023,
    * arXiv:2302.03169): score every document by how much more likely
    * its tokens are under a TARGET distribution (here the corpus's
    * English slice — stand-in for "looks like Wikipedia") than under
    * the raw pool, then keep the top-k. Features are hashed unigrams
    * ([[md5Bucket]] → 256 buckets; DSIR's 10k-bucket n-gram hash
    * scaled to this corpus); each bucket's score is the add-1-smoothed
    * log-likelihood ratio as a µ-quantized log2 integer (the zipfFit
    * qlog arithmetic — floor-log2 bits are too coarse here: with
    * near-uniform bucket ratios every bucket rounds to 0 bits and the
    * op degenerates), and a doc's weight is its tf-weighted
    * bucket-score sum — int64 all the way, so both engines sum
    * exactly.
    *
    * Scale shape: token explode runs once (the staged ulm_tf), the
    * bucket model is a 256-row broadcast, the per-doc weight is one
    * map-side-combinable groupBy, and the final top-50 is ORDER
    * BY+LIMIT — Spark plans TakeOrderedAndProject, never a global
    * window sort. */
  val dsirWeights: StagedOp = StagedOp(
    // dsir_tfb (bucketed tfs + lang) is consumed TWICE in the body
    // (bucket model + per-doc weights) — the two-consumer rule: stage
    // it, or CTE inlining re-runs the join and the md5 per reference
    stages = textUnigramLm.stages :+ ("dsir_tfb" -> { (_: Dialect) =>
      s"""SELECT t.doc_id, ${md5Bucket("t.s")} AS b, t.tf, d.lang
         |FROM ulm_tf t JOIN documents d ON d.doc_id = t.doc_id""".stripMargin
    }),
    body = { _ =>
      s"""WITH bc AS (
         |  SELECT b,
         |    CAST(SUM(CASE WHEN lang = 'en' THEN tf ELSE 0 END) AS BIGINT) AS ct,
         |    CAST(SUM(tf) AS BIGINT) AS cs
         |  FROM dsir_tfb GROUP BY b
         |),
         |tot AS (
         |  SELECT CAST(SUM(ct) AS BIGINT) AS nt, CAST(SUM(cs) AS BIGINT) AS ns FROM bc
         |),
         |sc AS (
         |  SELECT b,
         |    (${qlog2("ct + 1")} + ${qlog2("ns + 256")})
         |      - (${qlog2("cs + 1")} + ${qlog2("nt + 256")}) AS sbits
         |  FROM bc CROSS JOIN tot
         |),
         |wd AS (
         |  SELECT t.doc_id, t.lang,
         |    CAST(SUM(t.tf) AS BIGINT) AS n_tokens,
         |    CAST(SUM(t.tf * s.sbits) AS BIGINT) AS weight_bits
         |  FROM dsir_tfb t JOIN sc s ON t.b = s.b
         |  GROUP BY t.doc_id, t.lang
         |)
         |SELECT doc_id, lang, n_tokens, weight_bits
         |FROM wd
         |ORDER BY weight_bits DESC, doc_id
         |LIMIT 50""".stripMargin
    })

  /** Pareto concentration cutoff: how many customers carry 80% of
    * revenue — computed at 100 TB shape. A global
    * rank-and-cumulative-sum over all customers would single-partition
    * the whole dimension; instead the per-customer totals collapse
    * into a ≤64-row log2-bucket histogram (buckets strictly order by
    * value range, so cross-bucket rank is free), the boundary bucket
    * is found on the histogram's cumulative sums, and the EXACT
    * rank-and-cumsum window runs over that one bucket's customers
    * only — the boundaries-then-bucket philosophy ([[ordersRfm]])
    * applied to a global top-share query, bit-exact (integer cents,
    * DECIMAL(38) sums). The per-customer table is staged (three
    * consumers; CTE inlining would re-run the orders aggregate per
    * reference). */
  val paretoCustomers: StagedOp = StagedOp(
    stages = Seq(
      "par_pc" -> { _ =>
        s"""SELECT o_custkey AS ck,
           |  CAST(SUM(CAST(FLOOR(o_totalprice * 1.0e2 + 5.0e-1) AS BIGINT)) AS DECIMAL(38,0)) AS c
           |FROM orders GROUP BY o_custkey""".stripMargin
      },
      // grand total + customer count (1 row) and the ≤64-row log2
      // histogram with its descending cumulative sums — staged so the
      // body's multiple references re-read tiny parquet instead of
      // re-running the per-customer aggregate per reference
      "par_t" -> { _ =>
        "SELECT CAST(SUM(c) AS DECIMAL(38,0)) AS total, COUNT(*) AS ncust FROM par_pc"
      },
      "par_hc" -> { _ =>
        s"""WITH h AS (
           |  SELECT length(bin(CAST(c AS BIGINT))) - 1 AS b, COUNT(*) AS nc,
           |    CAST(SUM(c) AS DECIMAL(38,0)) AS sc
           |  FROM par_pc GROUP BY length(bin(CAST(c AS BIGINT))) - 1
           |)
           |SELECT b, nc, sc,
           |  CAST(SUM(sc) OVER (ORDER BY b DESC
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(38,0)) AS cum_sc,
           |  CAST(SUM(nc) OVER (ORDER BY b DESC
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_nc
           |FROM h""".stripMargin
      }),
    body = { _ =>
      s"""WITH bb AS (
         |  SELECT b, cum_sc - sc AS above_sc, cum_nc - nc AS above_nc
         |  FROM par_hc CROSS JOIN par_t
         |  WHERE (cum_sc - sc) * 5 < total * 4 AND cum_sc * 5 >= total * 4
         |),
         |w AS (
         |  SELECT bb.above_sc, ROW_NUMBER() OVER (ORDER BY p.c DESC, p.ck) AS rk,
         |    CAST(SUM(p.c) OVER (ORDER BY p.c DESC, p.ck
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(38,0)) AS cum
         |  FROM par_pc p CROSS JOIN bb
         |  WHERE length(bin(CAST(p.c AS BIGINT))) - 1 = bb.b
         |),
         |k AS (
         |  SELECT MIN(w.rk) AS in_bucket FROM w CROSS JOIN par_t
         |  WHERE (w.above_sc + w.cum) * 5 >= par_t.total * 4
         |)
         |SELECT t.ncust AS n_customers,
         |  CAST(bb.above_nc + k.in_bucket AS BIGINT) AS n_top80,
         |  ${r6("CAST(bb.above_nc + k.in_bucket AS DOUBLE) / t.ncust")} AS frac_top80
         |FROM par_t t CROSS JOIN bb CROSS JOIN k""".stripMargin
    })

  /** Flesch-style readability score per document: sentence count
    * (terminal punctuation), word count, and a vowel-group syllable
    * proxy, combined by the classic 206.835 − 1.015·(w/s) −
    * 84.6·(syll/w) formula. The counts are exact integers (regex
    * match counts); the formula is a fixed chain of correctly-rounded
    * IEEE ops on those exact inputs, identical in both engines. A
    * narrow stateless projection — streams and scales trivially. */
  def textReadability(d: Dialect): String =
    s"""WITH f AS (
       |  SELECT doc_id,
       |    ${d.size(d.split("text", " "))} AS n_words,
       |    GREATEST(${d.reCount("text", "[.!?]")}, 1) AS n_sentences,
       |    ${d.reCount("lower(text)", "[aeiouy]+")} AS n_syllables
       |  FROM documents
       |)
       |SELECT doc_id, n_words, n_sentences, n_syllables,
       |  ${r6("206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences) - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words)")} AS flesch
       |FROM f WHERE n_words > 0""".stripMargin

  /** Incremental JOIN-view maintenance — the delta decomposition
    * Δ(A⋈B) = ΔA⋈B₀ ∪ A₀⋈ΔB ∪ ΔA⋈ΔB that every materialized
    * join view refresh rests on, here over the orders⋈lineitem
    * revenue rollup: base/delta splits on BOTH sides (delta orders =
    * orderkey ≡ 0 mod 16, the newly-landed orders; delta lineitems =
    * linenumber ≥ 5, the late-arriving lines), the four quadrant
    * joins unioned and aggregated. The ORACLE runs the direct join
    * over the full tables — equality proves the decomposition
    * lossless, the identity an incremental refresh pipeline rests on
    * (and the reason it can skip the base⋈base quadrant entirely:
    * that term IS yesterday's materialization; only the three
    * delta-touching joins — each bounded by a delta side — run per
    * refresh). Revenue combines in exact DECIMAL across the union,
    * cast to double once at the end. */
  def joinDelta(d: Dialect): String = {
    val rev = "CAST(l_extendedprice AS DECIMAL(18,2)) " +
      "* (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))"
    def quad(lSide: String, oSide: String): String =
      s"""SELECT o.o_orderpriority, $rev AS rv
         |  FROM $lSide l JOIN $oSide o ON l.l_orderkey = o.o_orderkey""".stripMargin
    s"""WITH ob AS (SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderkey % 16 <> 0),
       |od AS (SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderkey % 16 = 0),
       |lb AS (SELECT l_orderkey, l_extendedprice, l_discount FROM lineitem WHERE l_linenumber < 5),
       |ld AS (SELECT l_orderkey, l_extendedprice, l_discount FROM lineitem WHERE l_linenumber >= 5),
       |parts AS (
       |  ${quad("lb", "ob")}
       |  UNION ALL
       |  ${quad("lb", "od")}
       |  UNION ALL
       |  ${quad("ld", "ob")}
       |  UNION ALL
       |  ${quad("ld", "od")}
       |)
       |SELECT o_orderpriority, COUNT(*) AS n_items,
       |  CAST(SUM(rv) AS DOUBLE) AS revenue
       |FROM parts GROUP BY o_orderpriority""".stripMargin
  }

  /** Mix drift between two crawl "snapshots" (deterministic md5
    * halves of the corpus — doc_id PARITY would be the wrong split
    * here: the fixture assigns source = f(doc_id mod), so parity
    * separates the sources entirely and the readout degenerates to
    * ±∞-ish terms; the hash split gives every source presence in
    * both halves, the realistic drift regime): the per-source
    * KL-divergence contribution of today's source distribution
    * against yesterday's, the number a mixing policy watches before
    * re-fitting weights (a source surging from 2% to 6% of the feed
    * moves DoReMi/temperature weights; KL says by how much, in
    * bits). Terms are µ-quantized over Laplace-smoothed counts (+1
    * per source on each side, so a source absent from one half
    * contributes a finite, loud term instead of ±∞).
    * Source-cardinality dataflow after one corpus-wide count:
    * scale-trivial. */
  def sourceKl(d: Dialect): String =
    s"""WITH hs AS (
       |  SELECT source, ${md5Bucket("CAST(doc_id AS STRING)")} % 2 AS half
       |  FROM documents
       |),
       |c AS (
       |  SELECT source,
       |    CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) + 1 AS BIGINT) AS na,
       |    CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) + 1 AS BIGINT) AS nb
       |  FROM hs GROUP BY source
       |),
       |t AS (
       |  SELECT source, na, nb,
       |    CAST(SUM(na) OVER () AS BIGINT) AS ta,
       |    CAST(SUM(nb) OVER () AS BIGINT) AS tb
       |  FROM c
       |),
       |q AS (
       |  SELECT source, na, nb,
       |    -- p_b · log2(p_b/p_a) in µbits, per source: KL(today ‖ yesterday)
       |    CAST(FLOOR(CAST(nb AS DOUBLE) / tb
       |      * log2((CAST(nb AS DOUBLE) * ta) / (CAST(na AS DOUBLE) * tb))
       |      * 1.0e6 + 5.0e-1) AS BIGINT) AS qkl
       |  FROM t
       |)
       |SELECT source, na - 1 AS n_yesterday, nb - 1 AS n_today,
       |  ${r6("CAST(qkl AS DOUBLE) / 1.0e6")} AS kl_contrib_bits
       |FROM q""".stripMargin

  /** Functional-dependency audit: does source determine lang? For
    * each source, the distinct-lang count, the majority lang (max
    * count, lexicographic tie-break — deterministic in both engines)
    * and its share — the profiling readout an ingestion pipeline
    * runs before trusting a column as a partition/routing key. A
    * clean FD shows n_langs = 1 everywhere; drift shows up as
    * falling majority share. One corpus scan, two source×lang-sized
    * aggregates. */
  def fdAudit(d: Dialect): String =
    s"""WITH sl AS (
       |  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n
       |  FROM documents GROUP BY source, lang
       |),
       |r AS (
       |  SELECT source, lang, n,
       |    CAST(SUM(n) OVER (PARTITION BY source) AS BIGINT) AS tot,
       |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY n DESC, lang) AS rk,
       |    COUNT(*) OVER (PARTITION BY source) AS n_langs
       |  FROM sl
       |)
       |SELECT source, CAST(n_langs AS BIGINT) AS n_langs,
       |  lang AS majority_lang,
       |  ${d.idiv("1000000 * n", "tot")} AS majority_ppm,
       |  CASE WHEN n_langs = 1 THEN 1 ELSE 0 END AS fd_holds
       |FROM r WHERE rk = 1""".stripMargin

  /** Incremental aggregate maintenance: merge a stored monthly-revenue
    * aggregate with a delta batch's partial aggregate — the
    * materialized-view refresh every warehouse pipeline runs nightly.
    * The even-orderkey half stands in for the stored state, the odd
    * half for the delta; the merge is a full outer join of the two
    * partial states with additive combination (sums and counts are
    * mergeable; integer cents keep it exact). The ORACLE aggregates
    * the union directly — equality proves the partial-state merge
    * lossless, the property incremental maintenance rests on. At
    * 100 TB the stored side is a parquet read of aggregate
    * cardinality, never a fact-table rescan. */
  def aggIncremental(d: Dialect): String = {
    def part(pred: String): String =
      s"""SELECT year(o_orderdate) * 100 + month(o_orderdate) AS month_key,
         |    CAST(SUM(CAST(FLOOR(o_totalprice * 1.0e2 + 5.0e-1) AS BIGINT)) AS BIGINT) AS cents,
         |    COUNT(*) AS n
         |  FROM orders WHERE $pred GROUP BY year(o_orderdate) * 100 + month(o_orderdate)""".stripMargin
    s"""WITH base AS (
       |  ${part("o_orderkey % 2 = 0")}
       |),
       |delta AS (
       |  ${part("o_orderkey % 2 = 1")}
       |)
       |SELECT COALESCE(b.month_key, d.month_key) AS month_key,
       |  CAST(COALESCE(b.cents, 0) + COALESCE(d.cents, 0) AS BIGINT) AS revenue_cents,
       |  CAST(COALESCE(b.n, 0) + COALESCE(d.n, 0) AS BIGINT) AS n_orders
       |FROM base b FULL JOIN delta d ON b.month_key = d.month_key""".stripMargin
  }

  /** Bigram conditional surprisal (the KenLM-bucket analogue one order
    * up from [[textUnigramLm]]): a bigram w1w2's code length is
    * ⌊log2 c(w1)⌋ − ⌊log2 c(w1w2)⌋ bits — the integer-exact floor-log2
    * rendering of −log2 P(w2|w1) — and a doc scores the total and mean
    * over its bigrams. c(w1w2) ≤ c(w1) always, so the difference is
    * non-negative. Both count tables are token/bigram-cardinality
    * windows over the staged tf artifacts (one explode each, no
    * re-derived joins); the bigram→first-token join is on the token
    * string, one bounded shuffle. High mean bits = rare continuations
    * (fresh text); low = templated text. */
  val textBigramLm: StagedOp = StagedOp(
    stages = textUnigramLm.stages ++ Seq(
      "blm_tf" -> { d =>
        s"""WITH docs AS (SELECT doc_id, text FROM documents),
           |${d.shingleRows("docs", 2)}
           |SELECT doc_id, s, COUNT(*) AS tf FROM sh GROUP BY doc_id, s""".stripMargin
      }),
    body = { d =>
      s"""WITH bc AS (
         |  SELECT doc_id, s, tf,
         |    CAST(SUM(tf) OVER (PARTITION BY s) AS BIGINT) AS c12,
         |    ${d.elem(d.split("s", " "), "1")} AS w1
         |  FROM blm_tf
         |),
         |uc AS (SELECT s AS w1, CAST(SUM(tf) AS BIGINT) AS c1 FROM ulm_tf GROUP BY s),
         |j AS (
         |  SELECT bc.doc_id, bc.tf,
         |    length(bin(uc.c1)) - length(bin(bc.c12)) AS bits
         |  FROM bc JOIN uc ON bc.w1 = uc.w1
         |)
         |SELECT doc_id,
         |  CAST(SUM(tf) AS BIGINT) AS n_bigrams,
         |  CAST(SUM(tf * bits) AS BIGINT) AS total_bits,
         |  CAST(SUM(tf * bits) AS DOUBLE) / CAST(SUM(tf) AS BIGINT) AS mean_bits
         |FROM j GROUP BY doc_id""".stripMargin
    })

  /** Stupid-Backoff bigram LM filter (Brants et al. 2007) — the
    * CCNet-style perplexity gate with the detail the in-corpus bigram
    * score ([[textBigramLm]]) cannot show: UNSEEN bigrams. Counts are
    * trained on the md5 calibration half (the [[filterConformal]]
    * split) and score the HELD-OUT half, so cross-half novel bigrams
    * genuinely occur and take the backoff arm:
    * S(w₂|w₁) = c₁₂/c₁ when the bigram was seen, else
    * 0.4·c₂/N (OOV words floor at c₂ = 1 — one extra µ-bit term, not
    * a dropped row). Surprisals are µ-log2 int64 ([[qlog2]]); the
    * −log₂(0.4) backoff penalty is PRECOMPUTED HOST-SIDE and inlined
    * as the same integer literal in both dialect renderings (the
    * transcendental-pinning rule — engine libm never evaluates it).
    * Output per held-out doc: bigram count, how many backed off, and
    * the mean µ-bit score — the filter signal plus the backoff-rate
    * diagnostic (a spike means the train half stopped representing
    * the stream). Scale shape: two staged train-half count tables
    * (vocab/bigram cardinality), one join per arm, no corpus
    * re-scan. */
  val textBackoffLm: StagedOp = {
    // −log2(0.4) in µ-bits, pinned host-side (same JVM renders both
    // dialects, so the literal is identical by construction)
    val b04 = math.floor(-math.log(0.4) / math.log(2.0) * 1e6 + 0.5).toLong
    StagedOp(
      stages = textBigramLm.stages ++ Seq(
        "bo_u" -> { (d: Dialect) =>
          s"""WITH docs AS (SELECT doc_id, text FROM documents
             |             WHERE ${md5Bucket("text")} < 128),
             |${d.shingleRows("docs", 1)}
             |SELECT s AS w, CAST(COUNT(*) AS BIGINT) AS c FROM sh GROUP BY s""".stripMargin
        },
        "bo_b" -> { (d: Dialect) =>
          s"""WITH docs AS (SELECT doc_id, text FROM documents
             |             WHERE ${md5Bucket("text")} < 128),
             |${d.shingleRows("docs", 2)}
             |SELECT s, CAST(COUNT(*) AS BIGINT) AS c12 FROM sh GROUP BY s""".stripMargin
        }),
      body = { d =>
        s"""WITH ho AS (SELECT doc_id FROM documents WHERE ${md5Bucket("text")} >= 128),
           |bt AS (
           |  SELECT b.doc_id, b.s, b.tf,
           |    ${d.elem(d.split("b.s", " "), "1")} AS w1,
           |    ${d.elem(d.split("b.s", " "), "2")} AS w2
           |  FROM blm_tf b JOIN ho ON b.doc_id = ho.doc_id
           |),
           |tn AS (SELECT CAST(SUM(c) AS BIGINT) AS nn FROM bo_u),
           |sc AS (
           |  SELECT bt.doc_id, bt.tf,
           |    CASE WHEN bb.c12 IS NOT NULL THEN 0 ELSE 1 END AS backed,
           |    CASE WHEN bb.c12 IS NOT NULL
           |         THEN ${qlog2("u1.c")} - ${qlog2("bb.c12")}
           |         ELSE $b04 + ${qlog2("tn.nn")} - ${qlog2("COALESCE(u2.c, 1)")}
           |    END AS q
           |  FROM bt
           |  LEFT JOIN bo_b bb ON bb.s = bt.s
           |  LEFT JOIN bo_u u1 ON u1.w = bt.w1
           |  LEFT JOIN bo_u u2 ON u2.w = bt.w2
           |  CROSS JOIN tn
           |)
           |SELECT doc_id,
           |  CAST(SUM(tf) AS BIGINT) AS n_bigrams,
           |  CAST(SUM(tf * backed) AS BIGINT) AS n_backoff,
           |  ${r6(s"CAST(${d.idiv("CAST(SUM(tf * q) AS BIGINT)", "CAST(SUM(tf) AS BIGINT)")} AS DOUBLE) / 1.0e6")}
           |    AS mean_bits
           |FROM sc GROUP BY doc_id""".stripMargin
      })
  }

  /** Bigram PMI (pointwise mutual information) — the collocation
    * detector that separates genuine phrases from chance co-occurrence
    * (high c12 relative to c1·c2): the corpus diagnostic behind
    * phrase-aware tokenization and stop-phrase lists. Reuses the
    * staged unigram + bigram term-frequency indexes; following the
    * bigram-LM precedent, the score is the floor-log2 surrogate
    * (length(bin(x)) per factor — exact integer ops, engine-identical;
    * real log2 differs across engines' libm). c12 ≥ 5 prunes noise
    * pairs, ties break lexicographically. */
  val bigramPmi: StagedOp = StagedOp(
    stages = textBigramLm.stages,
    body = { d =>
      s"""WITH bg AS (SELECT s, CAST(SUM(tf) AS BIGINT) AS c12 FROM blm_tf GROUP BY s),
         |u AS (SELECT s AS w, CAST(SUM(tf) AS BIGINT) AS c FROM ulm_tf GROUP BY s),
         |n1 AS (SELECT CAST(SUM(tf) AS BIGINT) AS nu FROM ulm_tf),
         |sp AS (
         |  SELECT s, c12,
         |    ${d.elem(d.split("s", " "), "1")} AS w1,
         |    ${d.elem(d.split("s", " "), "2")} AS w2
         |  FROM bg WHERE c12 >= 5
         |)
         |SELECT bigram, c12, pmi_bits FROM (
         |  SELECT sp.s AS bigram, sp.c12,
         |    (length(bin(sp.c12)) + length(bin(n1.nu)))
         |      - (length(bin(u1.c)) + length(bin(u2.c))) AS pmi_bits
         |  FROM sp
         |  JOIN u u1 ON sp.w1 = u1.w
         |  JOIN u u2 ON sp.w2 = u2.w
         |  CROSS JOIN n1
         |)
         |ORDER BY pmi_bits DESC, bigram LIMIT 20""".stripMargin
    })

  /** Interpolated Kneser-Ney bigram probabilities (Kneser & Ney 1995;
    * the modified-KN family of Chen & Goodman 1998 at one discount) —
    * the LM-smoothing estimator behind real n-gram models, next to
    * [[textBackoffLm]]'s stupid-backoff: the lower-order weight is the
    * CONTINUATION count (in how many distinct contexts does w₂
    * appear), not the raw unigram count, which is the detail that
    * separates KN from every count-ratio smoother. With discount
    * d = 3/4 exactly:
    *
    *   P_KN(w₂|w₁) = (c₁₂ − 3/4)/c₁ + (3/4)·N₁₊(w₁·)/c₁ · N₁₊(·w₂)/N₁₊(··)
    *
    * Multiplied through by 4·c₁·N₁₊(··), the whole probability is ONE
    * exact-int64 rational — num = (4c₁₂−3)·N₁₊(··) + 3·N₁₊(w₁·)·N₁₊(·w₂),
    * den = 4·c₁·N₁₊(··) — evaluated by a single correctly-rounded
    * double division then µ-rounded ([[r6]]); no max(·,0) arm because
    * every observed bigram has c₁₂ ≥ 1 > 3/4. All counts come from ONE
    * aggregate over the staged bigram index: c₁ is the PREFIX total
    * Σ_w c₁₂(w₁,w) (the KN denominator), the N₁₊ terms are distinct
    * counts over the same bigram-TYPE table. Loud int64 envelope guard
    * on the den product (the overflow-guard rule — Spark wraps where
    * DuckDB raises). Scale shape: every table after blm_tf is
    * bigram-TYPE grain (vocabulary-bounded, never corpus-bounded), so
    * the top-20 ORDER BY sorts a vocab²-sized table, not the corpus. */
  val ngramKneserNey: StagedOp = StagedOp(
    // the bigram-TYPE table is MATERIALIZED (kn_bg): the body reads it
    // four times (the prefix rollup p, the continuation rollup c, the
    // type total nd, and the per-bigram join), and as an inlined CTE
    // Spark re-ran the blm_tf GROUP BY + split per reference — 20
    // Exchanges in the r14-baseline plan, 4 redundant bigram rollups
    // per run (guide §2.4: share one exchange; vocab²-bounded stage)
    stages = textBigramLm.stages ++ Seq(
      "kn_bg" -> { (d: Dialect) =>
        s"""WITH bg0 AS (SELECT s, CAST(SUM(tf) AS BIGINT) AS c12 FROM blm_tf GROUP BY s)
           |SELECT s, c12,
           |  ${d.elem(d.split("s", " "), "1")} AS w1,
           |  ${d.elem(d.split("s", " "), "2")} AS w2
           |FROM bg0""".stripMargin
      }),
    body = { d =>
      val num = "(4 * bg.c12 - 3) * nd.ndd + 3 * p.n1w * c.ncw"
      val den = "4 * p.c1 * nd.ndd"
      s"""WITH bg AS (SELECT s, c12, w1, w2 FROM kn_bg),
         |p AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
         |             CAST(COUNT(*) AS BIGINT) AS n1w
         |      FROM kn_bg GROUP BY w1),
         |c AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS ncw FROM kn_bg GROUP BY w2),
         |nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS ndd FROM kn_bg)
         |SELECT bigram, c12, p_kn, p_ml FROM (
         |  SELECT bg.s AS bigram, bg.c12,
         |    CASE WHEN p.c1 > 2300000000000000000 / GREATEST(nd.ndd, 1)
         |         THEN CAST('kn_envelope_overflow' AS BIGINT)
         |         ELSE ${r6(s"CAST($num AS DOUBLE) / CAST($den AS DOUBLE)")}
         |    END AS p_kn,
         |    ${r6("CAST(bg.c12 AS DOUBLE) / p.c1")} AS p_ml
         |  FROM bg
         |  JOIN p ON bg.w1 = p.w1
         |  JOIN c ON bg.w2 = c.w2
         |  CROSS JOIN nd
         |)
         |ORDER BY c12 DESC, bigram LIMIT 20""".stripMargin
    })

  /** LSH band-bucket skew audit — the shuffle-hotspot readout for the
    * banded minhash self-join: per band, how many buckets the corpus
    * hashes into, the LARGEST bucket (the hot key a banded self-join
    * stalls on at 100 TB — one 10⁶-doc bucket is a 10¹²-pair join
    * task no matter how uniform the rest is), the exact implied
    * candidate volume Σ C(b,2) (the shuffle bill [[dedupCascadeCost]]
    * prices per technique, here decomposed per band), and the top
    * bucket's corpus share in exact ppm. This is the table a pipeline
    * owner reads BEFORE launching the self-join: a band whose
    * max_bucket share grows with corpus size means that band's slice
    * of the signature has collapsed (degenerate hash input) and needs
    * salting or a wider band key. One aggregate over the banded
    * signature rows — index-sized, no text rescan, no join. Loud
    * int64 guard on b·(b−1) (wraps in Spark, raises in DuckDB). */
  val dedupLshBucketSkew: StagedOp = StagedOp(
    stages = Seq(dedupMinhash.stages.head), // mh_sig, shared
    body = { d =>
      s"""WITH bands AS (
         |  ${mhBandRows("mh_sig")}
         |),
         |bk AS (
         |  SELECT band, bkey, CAST(COUNT(*) AS BIGINT) AS b
         |  FROM bands GROUP BY band, bkey
         |),
         |g AS (
         |  SELECT band,
         |    CAST(SUM(b) AS BIGINT) AS n_docs,
         |    CAST(COUNT(*) AS BIGINT) AS n_buckets,
         |    CAST(MAX(b) AS BIGINT) AS max_bucket,
         |    CAST(SUM(CASE WHEN b > 3000000000 THEN CAST('bucket_sq_overflow' AS BIGINT)
         |                  ELSE b * (b - 1) END) AS BIGINT) AS pair2
         |  FROM bk GROUP BY band
         |)
         |SELECT band, n_docs, n_buckets, max_bucket,
         |  CAST(${d.idiv("pair2", "2")} AS BIGINT) AS cand_pairs,
         |  CAST(${d.idiv("1000000 * max_bucket", "n_docs")} AS BIGINT) AS top_share_ppm
         |FROM g ORDER BY band""".stripMargin
    })

  /** Contribution (root-cause) analysis: decompose a month-over-month
    * revenue change by brand — per-slice Δ plus its share of the total
    * Δ, the "what moved the metric" readout every analytics engine
    * ships. One filtered fact scan (two-month predicate pushed to the
    * parquet scan) + broadcast part join + conditional aggregate at
    * brand cardinality; cents stay exact int64 and the share is one
    * final division, NULL-guarded when the total Δ is zero. */
  def metricContribution(d: Dialect): String =
    s"""WITH m AS (
       |  SELECT p.p_brand AS brand,
       |    year(l.l_shipdate) * 100 + month(l.l_shipdate) AS mk,
       |    CAST(FLOOR(l.l_extendedprice * (1.0e0 - l.l_discount) * 1.0e2 + 5.0e-1) AS BIGINT) AS cents
       |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
       |  WHERE year(l.l_shipdate) * 100 + month(l.l_shipdate) IN (199502, 199503)
       |),
       |g AS (
       |  SELECT brand,
       |    CAST(SUM(CASE WHEN mk = 199502 THEN cents ELSE 0 END) AS BIGINT) AS prev_cents,
       |    CAST(SUM(CASE WHEN mk = 199503 THEN cents ELSE 0 END) AS BIGINT) AS cur_cents
       |  FROM m GROUP BY brand
       |),
       |t AS (SELECT CAST(SUM(cur_cents - prev_cents) AS BIGINT) AS tot FROM g)
       |SELECT g.brand, g.prev_cents, g.cur_cents,
       |  CAST(g.cur_cents - g.prev_cents AS BIGINT) AS delta_cents,
       |  CASE WHEN t.tot = 0 THEN NULL
       |       ELSE ${r6("CAST(g.cur_cents - g.prev_cents AS DOUBLE) / t.tot")} END AS delta_share
       |FROM g CROSS JOIN t""".stripMargin

  /** Join-size audit: predict |A ⋈ B| from per-key count histograms
    * BEFORE running the join — Σ_k cntA(k)·cntB(k), the exact identity
    * a planner's cardinality estimator approximates (and the skew
    * diagnostic that finds the hot key whose product term dominates).
    * Histograms are one map-side-combined groupBy per side at key
    * cardinality; the audit query also runs the real join and asserts
    * the identity in-row, so the oracle gate proves the estimator
    * formula itself. */
  def joinSizeAudit(d: Dialect): String =
    s"""WITH ha AS (SELECT o_orderkey AS k, COUNT(*) AS ca FROM orders GROUP BY o_orderkey),
       |hb AS (SELECT l_orderkey AS k, COUNT(*) AS cb FROM lineitem GROUP BY l_orderkey),
       |est AS (SELECT CAST(SUM(ca * cb) AS BIGINT) AS est_rows FROM ha JOIN hb ON ha.k = hb.k),
       |act AS (SELECT COUNT(*) AS actual_rows
       |        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey)
       |SELECT est_rows, actual_rows, est_rows = actual_rows AS exact_match
       |FROM est CROSS JOIN act""".stripMargin

  /** TPC-H Q12's shipmode-priority aggregation adapted to this schema
    * (the fixture lineitem carries no l_shipmode / l_commitdate /
    * l_receiptdate — it ends at l_shipdate): the "mode" is the ship
    * LATENCY BUCKET — 30-day floor-bins of l_shipdate − o_orderdate,
    * SIGNED because the synthetic fixture ships both before and after
    * the order date, hence [[floorDiv]] (Spark DIV truncates toward
    * zero where DuckDB // floors; the pmod-subtract makes them agree)
    * — and the measure is Q12's exact CASE aggregation: critical- vs
    * non-critical-priority line counts for the two "slow" buckets
    * standing in for Q12's two mail modes. One co-partitioned shuffle
    * join on the order key, then a map-side-combinable aggregate; at
    * 100 TB this is a plain co-located fact⋈fact join. */
  def shipLatencyPriority(d: Dialect): String = {
    val diff = s"(${d.epochSeconds("CAST(l_shipdate AS TIMESTAMP)")} - ${d.epochSeconds("CAST(o_orderdate AS TIMESTAMP)")})"
    s"""WITH j AS (
       |  SELECT ${floorDiv(d)(diff, "2592000")} AS latency_bucket, o.o_orderpriority
       |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       |)
       |SELECT latency_bucket,
       |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
       |           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
       |           THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
       |FROM j
       |WHERE latency_bucket IN (2, 3)
       |GROUP BY latency_bucket""".stripMargin
  }

  /** BM25 ranked retrieval over the corpus for a fixed 3-term query —
    * the text-search operator (Robertson/Spärck Jones probabilistic
    * weighting, the Lucene default) a corpus pipeline uses to pull
    * topical slices. Reuses the staged [[textUnigramLm]] term
    * frequencies as the inverted index: the term filter is a pushed
    * predicate on the columnar artifact (at 100 TB the index is
    * partitioned by term and the scan touches only the query's terms),
    * doc length is one aggregate over the same artifact, and the
    * final ranking is a TakeOrdered top-10.
    *
    * Cross-engine exactness, following the zipfFit/tfidf precedent:
    * ln() is banned, so the IDF is the µ-quantized log2 of the exact
    * integer odds ratio — (N−df+½)/(df+½)+1 simplifies to
    * (2N+2)/(2df+1), one correctly-rounded division into log2. Every
    * other factor is exact int64 rational arithmetic: with k1 = 6/5
    * and b = 3/4, scaling the per-term fraction by 20·total_tokens
    * gives score_t = qidf·(44·tf·T) / (20·tf·T + 6·T + 18·dl·N),
    * floor-divided to an integer per term and summed exactly.
    * Headroom: qidf·44·tf·T stays under 2⁶³ up to ~10⁸ total corpus
    * tokens at tf ≤ 50; past that, drop the IDF quantization to ×10³
    * or move the product to DECIMAL(38,0). */
  /** The fixed evaluation query's terms — shared by the BM25 ranking
    * and its quality eval so the two cannot drift. */
  private[ops] val SearchTerms = Seq("join", "merge", "window")

  val searchBm25: StagedOp = StagedOp(
    stages = textUnigramLm.stages,
    body = { d =>
      val inList = SearchTerms.map(t => s"'$t'").mkString(", ")
      val qidf =
        s"""CAST(FLOOR(log2(CAST(2 * t.n_docs + 2 AS DOUBLE) / (2 * df.df + 1))
           |    * 1.0e6 + 5.0e-1) AS BIGINT)""".stripMargin
      s"""WITH dl AS (
         |  SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM ulm_tf GROUP BY doc_id
         |),
         |t AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(dl) AS BIGINT) AS td
         |  FROM dl
         |),
         |tq AS (SELECT doc_id, s AS term, CAST(tf AS BIGINT) AS tf
         |       FROM ulm_tf WHERE s IN ($inList)),
         |df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tq GROUP BY term),
         |sc AS (
         |  SELECT tq.doc_id,
         |    ${d.idiv(
               s"$qidf * (44 * tq.tf * t.td)",
               "20 * tq.tf * t.td + 6 * t.td + 18 * dl.dl * t.n_docs")} AS s_term
         |  FROM tq
         |  JOIN df ON tq.term = df.term
         |  JOIN dl ON tq.doc_id = dl.doc_id
         |  CROSS JOIN t
         |)
         |SELECT doc_id, CAST(SUM(s_term) AS BIGINT) AS bm25_micro
         |FROM sc GROUP BY doc_id
         |ORDER BY bm25_micro DESC, doc_id LIMIT 10""".stripMargin
    })

  /** WINNOWING fingerprint dedup (Schleimer, Wilkerson & Aiken,
    * SIGMOD 2003 — the MOSS algorithm): hash every k-gram (k = 5),
    * slide a w = 4 window over the hash sequence and keep each
    * window's MINIMUM — the selected fingerprints carry the paper's
    * guarantee that any shared run of ≥ w+k−1 = 8 tokens yields at
    * least one shared fingerprint, while storing only ~2/(w+1) of the
    * k-grams. This is the third LOCAL near-dup candidate family next
    * to minhash bands (whole-doc Jaccard) and [[dedupSubstring]]'s
    * exact window index (which stores EVERY window: winnowing is its
    * scale path — same guarantee class at a fraction of the index).
    * The window min is a bounded 4-row frame per doc (never a global
    * sort), restricted to FULL w-length frames (COUNT over the same
    * frame = w): the trailing <w frames a bare sliding min would also
    * emit select k-grams canonical winnowing does not (the last hash
    * of every doc would always be a fingerprint) — the cost is that
    * docs shorter than w+k−1 tokens emit no fingerprints, exactly the
    * below-noise-threshold region the paper's guarantee excludes
    * anyway. The fingerprint index is staged and DISTINCT at
    * (doc, fingerprint) grain; candidate pairs join ON the
    * fingerprint value and a pair's evidence is its shared-fingerprint
    * count — kept at the ≥ 1 floor, because ONE shared fingerprint is
    * the minimum a shared 8-token run is guaranteed to produce (a ≥ 2
    * gate would buy precision by silently voiding the guarantee the
    * operator exists for; downstream exact verification is the
    * precision stage, the minhash-candidate rule). Top-50 by evidence
    * with a pair tiebreak — TakeOrdered.
    * Two-snapshot corpus (guaranteed positives). Hashes are
    * [[md5Bucket]]'s 32-bit sibling ([[md5Hex32]]), NOT the usual
    * [[Dialect.shingleId]]: winnowing's window MIN picks a k-gram BY
    * ITS HASH ORDER, so engine-specific hashes (xxhash64 ints vs
    * DuckDB strings) would select different fingerprints and the two
    * candidate sets would legitimately diverge — the one shingle
    * consumer where count-equivalence is not enough and the hash
    * itself must be engine-portable. */
  val dedupWinnow: StagedOp = StagedOp(
    stages = Seq(
      "wf_idx" -> { (d: Dialect) =>
        s"""WITH ${corpusCte(d)},
           |${d.shingleRowsPos("corpus", 5)},
           |h AS (SELECT doc_id, pos, ${md5Hex32("s")} AS h FROM shp),
           |wm AS (
           |  SELECT doc_id,
           |    MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
           |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp,
           |    COUNT(*) OVER (PARTITION BY doc_id ORDER BY pos
           |      ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wlen
           |  FROM h
           |)
           |SELECT DISTINCT doc_id, fp FROM wm WHERE wlen = 4""".stripMargin
      }),
    body = { _ =>
      s"""SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(COUNT(*) AS BIGINT) AS n_shared
         |FROM wf_idx a JOIN wf_idx b
         |  ON a.fp = b.fp AND a.doc_id < b.doc_id
         |GROUP BY a.doc_id, b.doc_id
         |ORDER BY n_shared DESC, doc_a, doc_b LIMIT 50""".stripMargin
    })

  /** PHRASE search over a positional inverted index — the capability
    * [[searchBm25]]'s bag-of-words index cannot express: "these words
    * ADJACENT, in order". The positional postings (doc, pos, token)
    * are the staged artifact (at 100 TB: the standard
    * position-augmented inverted index, partitioned by token); the
    * phrase match is the classic postings intersection — join the
    * first word's postings with the second's on (doc, pos+1) — which
    * shuffles only the two terms' postings, never the corpus. The
    * evaluation phrase is self-calibrating: the corpus's most frequent
    * bigram (deterministic ORDER BY count DESC, w1, w2 LIMIT 1 — a
    * TakeOrdered over the staged bigram-count index, which is built
    * as a narrow 2-gram shingle pass + one aggregate, NO join: the
    * adjacent-pair count and the 2-shingle count are the same number
    * by construction). Integer counts end to end; top-10 docs by hit
    * count with a doc_id tiebreak. */
  val searchPhrase: StagedOp = StagedOp(
    stages = Seq(
      "sp_pos" -> { (d: Dialect) =>
        s"""WITH docs AS (SELECT doc_id, text FROM documents),
           |${d.shingleRowsPos("docs", 1)}
           |SELECT doc_id, pos, s FROM shp""".stripMargin
      },
      "sp_big" -> { (d: Dialect) =>
        s"""WITH docs2 AS (SELECT doc_id, text FROM documents),
           |${d.shingleRows("docs2", 2)}
           |SELECT s, CAST(COUNT(*) AS BIGINT) AS n FROM sh GROUP BY s""".stripMargin
      }),
    body = { d =>
      val sToks = d.split("s", " ")
      s"""WITH top AS (
         |  SELECT ${d.elem(sToks, "1")} AS w1, ${d.elem(sToks, "2")} AS w2, n
         |  FROM sp_big ORDER BY n DESC, s LIMIT 1
         |),
         |hits AS (
         |  -- BOTH sides term-filtered against the broadcast 1-row top
         |  -- BEFORE the positional equi-join: leaving b's term filter
         |  -- in the join condition lets the planner shuffle the whole
         |  -- postings table on the b side (review-caught) — filtered
         |  -- first, the join carries only the two terms' postings
         |  SELECT a.doc_id, a.pos
         |  FROM (SELECT p.doc_id, p.pos FROM top t JOIN sp_pos p ON p.s = t.w1) a
         |  JOIN (SELECT p.doc_id, p.pos FROM top t JOIN sp_pos p ON p.s = t.w2) b
         |    ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
         |)
         |SELECT h.doc_id, t.w1, t.w2,
         |  CAST(COUNT(*) AS BIGINT) AS n_hits,
         |  CAST(MIN(h.pos) AS BIGINT) AS first_pos
         |FROM hits h CROSS JOIN top t
         |GROUP BY h.doc_id, t.w1, t.w2
         |ORDER BY n_hits DESC, doc_id LIMIT 10""".stripMargin
    })

  /** The BM25 top-10 as a ranked staged artifact — shared by the nDCG
    * eval and the RRF fusion (two consumers → staged, never a CTE:
    * each reference would re-run the scorer against the index). */
  private[ops] val ndcgRankedStage: (String, Dialect => String) =
    "ndcg_ranked" -> { (d: Dialect) =>
      s"""SELECT doc_id, ROW_NUMBER() OVER (ORDER BY bm25_micro DESC, doc_id) AS rk
         |FROM (
         |${searchBm25.body(d)}
         |)""".stripMargin
    }

  /** The coverage-ranked boolean retriever's top-10 (distinct query
    * terms matched, then summed tf) — the second ranker, staged
    * because TWO consumers read it (the RRF fusion and the RBO churn
    * metric). */
  private[ops] val covRankedStage: (String, Dialect => String) =
    "cov_ranked" -> { (_: Dialect) =>
      val inList = SearchTerms.map(t => s"'$t'").mkString(", ")
      s"""WITH cov AS (
         |  SELECT doc_id, COUNT(*) AS n_terms, CAST(SUM(tf) AS BIGINT) AS tot_tf
         |  FROM ulm_tf WHERE s IN ($inList) GROUP BY doc_id
         |)
         |SELECT doc_id, rk FROM (
         |  SELECT doc_id, ROW_NUMBER() OVER (
         |    ORDER BY n_terms DESC, tot_tf DESC, doc_id) AS rk
         |  FROM cov
         |) WHERE rk <= 10""".stripMargin
    }

  /** Retrieval-quality eval for the BM25 ranking — nDCG@10 and MRR
    * against a graded relevance oracle (rel = the summed query-term
    * frequency, floored halves capped at 5), completing the eval
    * family (langid eval, LSH eval, ANN recall eval). The ranked list
    * is [[searchBm25]]'s own body nested verbatim (one copy of the
    * scorer); relevance is graded 0–5 from the summed query-term
    * frequency (a binary present/absent label saturates on this
    * corpus — 97% of docs contain a term, so nDCG degenerates to a
    * constant 1.0; the tf grade spreads the ideal list and makes the
    * number move when BM25's length normalization disagrees with raw
    * frequency); gains use the exact integer 2^rel−1 table (no POW —
    * a float power could diverge in the last ulp) and each DCG term
    * is µ-quantized to int64 BEFORE summation, because double sums
    * are order-dependent across engines; the only unquantized float
    * ops are the shared log2 discount and the final ratios. MRR
    * rewards the first rank with rel ≥ 4 — and since the ranked list
    * is the BM25 top-10, it is by construction MRR@10 (a rel ≥ 4 doc
    * first appearing at rank 11 scores 0), which the column name says
    * explicitly. idcg_q = 0 (no doc with rel > 0 anywhere) yields
    * ndcg10 = NULL rather than a division blow-up. */
  val searchNdcg: StagedOp = StagedOp(
    // ranked list and relevance table are staged: ranked feeds the DCG
    // and MRR passes, rel feeds DCG, the ideal ranking, and MRR — as
    // CTEs each reference would re-run the BM25 scorer / the relevance
    // aggregate against the index (ScanAudit showed 12 scans)
    stages = textUnigramLm.stages ++ Seq(
      ndcgRankedStage,
      "ndcg_rel" -> { (d: Dialect) =>
        val inList = SearchTerms.map(t => s"'$t'").mkString(", ")
        s"""SELECT doc_id, LEAST(5, ${d.idiv("CAST(SUM(tf) AS BIGINT)", "2")}) AS rel
           |FROM ulm_tf WHERE s IN ($inList) GROUP BY doc_id""".stripMargin
      }),
    body = { d =>
      def gain(rel: String): String =
        s"""(CASE $rel WHEN 1 THEN 1 WHEN 2 THEN 3 WHEN 3 THEN 7
           |  WHEN 4 THEN 15 WHEN 5 THEN 31 ELSE 0 END)""".stripMargin
      def dcgTerm(rel: String, rk: String): String =
        qvExpr(s"CAST(${gain(rel)} AS DOUBLE) / log2(CAST($rk AS DOUBLE) + 1.0e0)")
      s"""WITH dcg AS (
         |  SELECT CAST(SUM(${dcgTerm("COALESCE(rel.rel, 0)", "r.rk")}) AS BIGINT) AS dcg_q
         |  FROM ndcg_ranked r LEFT JOIN ndcg_rel rel ON r.doc_id = rel.doc_id
         |),
         |ideal AS (
         |  SELECT rel, ROW_NUMBER() OVER (ORDER BY rel DESC, doc_id) AS rk FROM ndcg_rel
         |),
         |idcg AS (
         |  SELECT CAST(SUM(${dcgTerm("rel", "rk")}) AS BIGINT) AS idcg_q
         |  FROM ideal WHERE rk <= 10
         |),
         |mrr AS (
         |  SELECT MIN(r.rk) AS first_good
         |  FROM ndcg_ranked r JOIN ndcg_rel rel ON r.doc_id = rel.doc_id
         |  WHERE rel.rel >= 4
         |)
         |SELECT
         |  CASE WHEN idcg_q = 0 THEN NULL
         |       ELSE ${r6("CAST(dcg_q AS DOUBLE) / CAST(idcg_q AS DOUBLE)")}
         |  END AS ndcg10,
         |  CASE WHEN first_good IS NULL THEN 0.0e0
         |       ELSE ${r6("1.0e0 / first_good")} END AS mrr_at_10,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM ndcg_rel WHERE rel > 0) AS n_relevant
         |FROM dcg CROSS JOIN idcg CROSS JOIN mrr""".stripMargin
    })

  /** Reciprocal-rank fusion of two retrievers over the same fixed
    * query — the hybrid-search read path (Cormack/Clarke/Buettcher:
    * score(d) = Σ_r 1/(k + rank_r(d)), k = 60): the BM25 top-10 (the
    * staged [[ndcgRankedStage]] artifact) fused with a coverage-ranked
    * boolean retriever (distinct query terms matched, then summed tf)
    * — two genuinely different rankers, which is where RRF earns its
    * keep. Both lists are rank-capped at 10; the fuse is one FULL
    * OUTER join on doc_id over two ≤10-row relations (a doc on one
    * list only keeps its single reciprocal term); the two reciprocal
    * terms are summed in ONE fixed two-operand expression tree —
    * deterministic IEEE in both engines, so the µ-quantized-comparator
    * rule for longer float sums doesn't arise. At scale both input
    * rankings are TakeOrdered top-k artifacts, so the fusion cost is
    * O(k) regardless of corpus size. */
  val searchRrf: StagedOp = StagedOp(
    stages = textUnigramLm.stages :+ ndcgRankedStage :+ covRankedStage,
    body = { _ =>
      s"""WITH fused AS (
         |  SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
         |    COALESCE(1.0e0 / (60 + a.rk), 0.0e0)
         |      + COALESCE(1.0e0 / (60 + b.rk), 0.0e0) AS s,
         |    a.rk AS bm25_rank, b.rk AS coverage_rank
         |  FROM ndcg_ranked a FULL JOIN cov_ranked b ON a.doc_id = b.doc_id
         |)
         |SELECT doc_id, ${r6("s")} AS rrf_score, bm25_rank, coverage_rank,
         |  rk AS fused_rank
         |FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY s DESC, doc_id) AS rk FROM fused)
         |WHERE rk <= 10""".stripMargin
    })

  /** Rank-biased overlap (Webber/Moffat/Zobel 2010) between the two
    * retrievers' top-10 lists — the RANK-agreement complement of
    * [[filterKappa]]'s set-level agreement and the churn metric a
    * search team tracks between ranker versions: RBO@10 =
    * (1−p)·Σ_{d≤10} p^{d−1}·|A_d ∩ B_d|/d with p = 0.9, weighting
    * agreement at the top far above the tail. The geometric weights
    * are precomputed EXACTLY host-side (BigDecimal → µ-quantized
    * int64 literals — the EWMA transcendental-pinning rule; engine
    * pow() is not IEEE-pinned); the depth-d overlap count comes from
    * each shared doc's max(rank_a, rank_b) ≤ d over a 10-row depth
    * spine, so the whole body is two ≤10-row staged reads, one ≤10-row
    * join and a 10-row weighted sum — O(k) at any corpus size. Each
    * w_d·overlap/d term is a fixed expression tree on exact ints,
    * µ-quantized before the final int64 sum. */
  val searchRbo: StagedOp = {
    // w_d = (1−p)·p^(d−1)·1e12 exact, p = 9/10
    val wq = (1 to 10).map { d =>
      (BigDecimal(1) - BigDecimal("0.9")) * BigDecimal("0.9").pow(d - 1) *
        BigDecimal(1000000000000L)
    }.map(_.setScale(0, BigDecimal.RoundingMode.HALF_UP).toLongExact)
    val wtRows = wq.zipWithIndex
      .map { case (w, i) => s"SELECT ${i + 1} AS d, CAST($w AS BIGINT) AS wq" }
      .mkString("\nUNION ALL ")
    StagedOp(
      stages = textUnigramLm.stages :+ ndcgRankedStage :+ covRankedStage,
      body = { _ =>
        s"""WITH shared AS (
           |  SELECT GREATEST(a.rk, b.rk) AS mr
           |  FROM ndcg_ranked a JOIN cov_ranked b ON a.doc_id = b.doc_id
           |),
           |wt AS (
           |  $wtRows
           |),
           |terms AS (
           |  -- depth-spine inequality join (10 × ≤10 rows): COUNT of
           |  -- non-null matches keeps zero-overlap depths at 0 (a
           |  -- correlated scalar subquery here failed Spark's
           |  -- decorrelation outright — "key not found" at planning)
           |  SELECT w.d, w.wq, CAST(COUNT(s.mr) AS BIGINT) AS ov
           |  FROM wt w LEFT JOIN shared s ON s.mr <= w.d
           |  GROUP BY w.d, w.wq
           |)
           |SELECT
           |  ${r6("CAST(SUM(CAST(FLOOR(CAST(wq AS DOUBLE) * ov / d + 5.0e-1) AS BIGINT)) AS DOUBLE) / 1.0e12")} AS rbo_at_10,
           |  CAST(MAX(CASE WHEN d = 10 THEN ov END) AS BIGINT) AS n_shared_top10
           |FROM terms""".stripMargin
      })
  }

  /** Unigram-LM tokenizer DP bounds: Viterbi positions 1..[[UlmMaxLen]]
    * (the fixture vocabulary tops out at 8 characters; the vocab stage
    * guards the bound LOUDLY — a longer word throws identically in
    * both engines instead of silently dropping out of the DP joins),
    * candidate pieces are all substrings up to [[UlmMaxPiece]]
    * characters. Every +1 on the bound DOUBLES the per-word cut-mask
    * space of [[ulmCandCte]], so the bound is deliberately snug. */
  private[ops] val UlmMaxLen = 10
  private[ops] val UlmMaxPiece = 3

  /** Candidate-segmentation enumeration: under the snug
    * [[UlmMaxLen]] = 10 bound, EVERY segmentation of a word is one of
    * ≤ 2^9 = 512 cut-point bitmasks (bit j = cut after character
    * j+1), so the whole Viterbi lattice flattens into ONE bounded
    * enumeration — word × mask × position, segment ids by
    * `bit_count(m % 2^(p-1))`, three small aggregates and a single
    * winner window. No sequential DP rounds at all: the staged
    * 10-round chain this replaced (git history, round 7) paid ~0.4 s
    * of fixed plan/codegen/write overhead per tiny stage × 10
    * positions × 2 chains — 11 s first-run quiet for sub-second
    * dataflow. The enumeration is exact and embarrassingly parallel
    * (zero shuffle BARRIERS between rounds, which is also the better
    * cluster-latency shape for a huge vocabulary); its candidate
    * count grows ~1.84^len (gap-≤3 masks), so if the bound is ever
    * raised past ~16, resurrect the staged-DP shape instead. Rows:
    * one per (word, mask, segment) with the segment's piece, the
    * mask's piece count np = bit_count+1, and the segment length for
    * the ≤ [[UlmMaxPiece]] validity filter. pow(2, k) is exact in
    * IEEE double for k ≤ 52 and k here is ≤ 9 (the vocab stage's
    * loud bound guard), so the CAST agrees across engines. */
  /** The enumeration is PROBABILITY-INDEPENDENT, so it materializes
    * once ([[ulmCandStage]]) and every chain — initial Viterbi,
    * soft-EM posteriors, each pruning round, the re-scored audit —
    * reads the same tiny parquet artifact instead of re-deriving the
    * mask lattice (a pruning round referenced it 3× per stage; CTE
    * inlining re-ran the double explode each time). */
  private[ops] val ulmCandStage: (String, Dialect => String) =
    "ulm_cand" -> { (d: Dialect) =>
      s"""WITH wm0 AS (SELECT w, ${d.seqArray("0", "CAST(pow(2, length(w) - 1) AS BIGINT) - 1")} AS mm
         |        FROM ulm_vocab),
         |wm AS (${d.explode("SELECT w, mm FROM wm0", "w", "mm", "m")}),
         |wp0 AS (SELECT w, m, ${d.seqArray("1", "length(w)")} AS pp FROM wm),
         |wp AS (${d.explode("SELECT w, m, pp FROM wp0", "w, m", "pp", "p")}),
         |seg AS (
         |  SELECT w, m, segid, MIN(p) AS lo, COUNT(*) AS ln
         |  FROM (SELECT w, m, p,
         |          bit_count(m % CAST(pow(2, p - 1) AS BIGINT)) AS segid
         |        FROM wp)
         |  GROUP BY w, m, segid
         |)
         |-- validity filter as a WINDOW, not a groupBy+self-join: a CTE
         |-- referenced twice would inline (and so re-run) the whole
         |-- enumeration subtree per reference
         |SELECT w, m, segid, substr(w, lo, ln) AS piece, ln,
         |  CAST(bit_count(m) + 1 AS BIGINT) AS np
         |FROM (SELECT w, m, segid, lo, ln,
         |        MAX(ln) OVER (PARTITION BY w, m) AS mxln FROM seg)
         |WHERE mxln <= $UlmMaxPiece""".stripMargin
    }

  private[ops] def ulmCandCte(d: Dialect): String =
    "cand AS (SELECT * FROM ulm_cand)"

  /** Scored candidates: piece rows joined to `piecesTbl`
    * log-probabilities, summed per (word, mask). The HAVING
    * `COUNT(*) = MAX(np)` guards the PRUNED-vocabulary case
    * (chain 2): a mask any of whose pieces is absent from the table
    * is not a candidate at all — the sum over the surviving pieces
    * must never masquerade as a path score. Segment-length validity
    * (every piece ≤ [[UlmMaxPiece]] chars) is enforced once at the
    * [[ulmCandStage]] materialization — `cand` holds only valid
    * masks, so no consumer re-derives the filter. */
  private[ops] def ulmScoredCte(piecesTbl: String): String =
    s"""ok AS (
       |  SELECT c.w, c.m, CAST(SUM(p.qlp) AS BIGINT) AS score, MAX(c.np) AS np
       |  FROM cand c JOIN $piecesTbl p ON p.piece = c.piece
       |  GROUP BY c.w, c.m
       |  HAVING COUNT(*) = MAX(c.np)
       |)""".stripMargin

  /** The trained segmenter, materialized once: every word's WINNING
    * segmentation as its piece rows (w, segid, piece, score, np).
    * Winner = max (score DESC, fewer pieces, smallest mask) — mask
    * order is a total, engine-portable tie-break (a mask IS the
    * segmentation). One row per piece occurrence, so the EM E-step
    * reads its path counts straight off this table (`segid = 0`
    * collapses it to one row per word for the score/np readouts). */
  private[ops] val ulmSegStage: (String, Dialect => String) =
    "ulm_seg" -> { (d: Dialect) =>
      s"""WITH ${ulmCandCte(d)},
         |${ulmScoredCte("ulm_pieces")},
         |win AS (
         |  SELECT w, m, score, np FROM (
         |    SELECT w, m, score, np,
         |      ROW_NUMBER() OVER (PARTITION BY w ORDER BY score DESC, np, m) AS rk
         |    FROM ok
         |  ) WHERE rk = 1
         |)
         |SELECT c.w, c.segid, c.piece, n.score, n.np
         |FROM cand c JOIN win n ON n.w = c.w AND n.m = c.m""".stripMargin
    }

  /** Chain 2 — re-segmentation under the RE-ESTIMATED (pruned)
    * probabilities: the same enumeration scored against the M-step
    * table, score-only (a max needs no tie-break). */
  private[ops] val ulmSeg2Stage: (String, Dialect => String) =
    "ulm_seg2" -> { (d: Dialect) =>
      s"""WITH ${ulmCandCte(d)},
         |${ulmScoredCte("ulm_pcs2")}
         |SELECT w, CAST(MAX(score) AS BIGINT) AS score
         |FROM ok GROUP BY w""".stripMargin
    }

  /** SentencePiece-style UNIGRAM-LM tokenization (Kudo 2018), the
    * other canonical subword family next to [[bpeMerges]]: score every
    * word's best segmentation into candidate pieces under a unigram
    * piece LM by exact Viterbi DP. Candidate vocabulary = ALL
    * substrings up to 3 chars of corpus words, tf-weighted (single
    * chars included by construction → full coverage, no unreachable
    * word); piece log-probabilities are µ-log2 int64
    * (qlog2(cnt) − qlog2(total) — the [[qlog2]] quantizer, no float
    * sum ever crosses an aggregate); the lattice max is the bounded
    * mask ENUMERATION of [[ulmCandCte]] over the VOCABULARY (the
    * corpus collapses once into ulm_tf; every derived table is
    * vocab-cardinality — the BPE trainer's scale shape). The segment
    * stages ARE the computation (pagerankIter rule: not prewarmed).
    * Output: per-word best piece count and segmentation
    * log-likelihood, tf-weighted — the tokenizer-fitting diagnostic
    * (fertility under a unigram LM vs BPE's merge table). */
  /** The shared ULM trainer substrate — corpus tf index, bounded
    * vocabulary, substring-candidate pieces with their initial
    * log-probs, and the mask enumeration. Six queries consume these
    * four artifacts; every trainer chain appends its own stages. */
  private[ops] val ulmBaseStages: Seq[(String, Dialect => String)] =
    textUnigramLm.stages ++ Seq(
      "ulm_vocab" -> { (_: Dialect) =>
        // the loud bound guard: under ANSI both engines throw on the
        // string-to-int cast, so a corpus word outlasting the DP bound
        // can never silently vanish from the tokenizer
        s"""SELECT s AS w,
           |  CASE WHEN length(s) > $UlmMaxLen
           |       THEN CAST('ulm: word longer than UlmMaxLen — raise the DP bound' AS BIGINT)
           |       ELSE CAST(SUM(tf) AS BIGINT) END AS c
           |FROM ulm_tf GROUP BY s""".stripMargin
      },
      "ulm_pieces" -> { (d: Dialect) =>
        // single-copy plan: the position explode is joined against a
        // 3-row length leaf (not UNION ALL'd three times — CTE
        // inlining would re-run the explode per branch), and the
        // total is a window (not a scalar cross-join re-read)
        s"""WITH wi AS (SELECT w, c, ${d.seqArray("1", "length(w)")} AS ii FROM ulm_vocab),
           |pe AS (${d.explode("SELECT w, c, ii FROM wi", "w, c", "ii", "i")}),
           |ll AS (${domainRel("l", (1 to UlmMaxPiece).map(_.toString))}),
           |pc AS (
           |  SELECT substr(w, i, l) AS piece, CAST(SUM(c) AS BIGINT) AS cnt
           |  FROM pe JOIN ll ON i + l - 1 <= length(w)
           |  GROUP BY substr(w, i, l)
           |)
           |SELECT piece, cnt, ${qlog2("cnt")} - ${qlog2("t")} AS qlp
           |FROM (SELECT piece, cnt, CAST(SUM(cnt) OVER () AS BIGINT) AS t FROM pc)""".stripMargin
      }) :+ ulmCandStage

  /** Prewarm handle for the shared substrate above (the body is never
    * run — prewarm builds stages only). The trainer chains themselves
    * — segmenter, EM steps, soft-EM staircase, prune rounds — are
    * deliberately NOT reachable through this: they ARE their queries'
    * computation and must stay timed. */
  val ulmBase: StagedOp = StagedOp(ulmBaseStages, _ => "SELECT 1 AS one")

  val ulmViterbi: StagedOp = StagedOp(
    stages = ulmBaseStages :+ ulmSegStage,
    body = { _ =>
      s"""SELECT v.w AS word, v.c AS tf, a.np AS n_pieces,
         |  ${r6("CAST(a.score AS DOUBLE) / 1.0e6")} AS loglik_bits
         |FROM ulm_vocab v
         |JOIN (SELECT w, np, score FROM ulm_seg WHERE segid = 0) a ON a.w = v.w
         |ORDER BY v.c DESC, v.w""".stripMargin
    })

  /** The unigram-LM tokenizer's READ path: tokenize the corpus with
    * the trained segmenter — per-document word, subword-piece and
    * total-log-likelihood counts, the [[bpeEncode]] counterpart for
    * the ULM family (a tokenizer-choice A/B over the same corpus).
    * All per-word work is already in the staged DP tables; the encode
    * is ONE join of the per-(doc, word) tf index against the
    * vocab-cardinality best-segmentation table — the corpus is never
    * re-scanned, which is the whole point of training on the collapsed
    * vocabulary. Words longer than [[UlmMaxLen]] cannot silently fall
    * out of the join — the vocab stage's bound guard throws first. */
  val ulmEncode: StagedOp = StagedOp(
    stages = ulmViterbi.stages,
    body = { _ =>
      s"""WITH seg AS (
         |  SELECT w, np, score FROM ulm_seg WHERE segid = 0
         |)
         |SELECT t.doc_id,
         |  CAST(SUM(t.tf) AS BIGINT) AS n_words,
         |  CAST(SUM(t.tf * s.np) AS BIGINT) AS n_pieces,
         |  ${r6("CAST(SUM(t.tf * s.np) AS DOUBLE) / SUM(t.tf)")} AS fertility,
         |  ${r6("CAST(SUM(t.tf * s.score) AS DOUBLE) / 1.0e6")} AS loglik_bits
         |FROM ulm_tf t JOIN seg s ON s.w = t.s
         |GROUP BY t.doc_id""".stripMargin
    })

  /** One hard-EM training iteration for the unigram LM (the Kudo 2018
    * trainer's E+M under Viterbi counts, the standard hard-EM
    * variant): read every word's BEST segmentation straight off the
    * materialized segmenter ([[ulmSegStage]] carries one row per
    * piece occurrence of the winning path — the E step is a plain
    * scan; the ten staged back-walk hops this replaced were ~4 s of
    * fixed stage overhead for the same multiset of path pieces),
    * count each piece's tf-weighted occurrences along those paths
    * (the E step), and re-estimate the piece log-probabilities from
    * the counts (the M step), reporting the µ-bit delta against the
    * substring-frequency initialization. A piece that Viterbi never
    * uses drops out — exactly the vocabulary pruning signal the real
    * trainer thresholds on. Shares the segmenter stage with
    * [[ulmViterbi]] (first consumer in bench name order builds it
    * timed, the clustersStaged convention for iterative
    * artifacts). */
  val ulmEmStep: StagedOp = {
    // THE one copy of the M step (E-step counts → MLE log-probs):
    // staged, because TWO bodies consume it — this op's report and
    // [[ulmEmGain]]'s L1/L2 (a smoothing or prune-threshold change
    // applied to a second inline copy would make the gain audit
    // silently score a different model than the step reports)
    val pcs2Stage = "ulm_pcs2" -> { (_: Dialect) =>
      s"""WITH cnt AS (
         |  SELECT p.piece, CAST(SUM(v.c) AS BIGINT) AS ec
         |  FROM ulm_seg p JOIN ulm_vocab v ON v.w = p.w
         |  GROUP BY p.piece
         |)
         |-- total as a window: a scalar-CTE cross-join would inline
         |-- (re-run) the counting join a second time
         |SELECT piece, ec, ${qlog2("ec")} - ${qlog2("t")} AS qlp
         |FROM (SELECT piece, ec, CAST(SUM(ec) OVER () AS BIGINT) AS t FROM cnt)""".stripMargin
    }
    StagedOp(
      stages = ulmViterbi.stages :+ pcs2Stage,
      body = { _ =>
        s"""SELECT c.piece, c.ec AS expected_count,
           |  ${r6("CAST(c.qlp AS DOUBLE) / 1.0e6")} AS logp_new_bits,
           |  ${r6("CAST(p.qlp AS DOUBLE) / 1.0e6")} AS logp_init_bits,
           |  ${r6("CAST(c.qlp - p.qlp AS DOUBLE) / 1.0e6")} AS delta_bits
           |FROM ulm_pcs2 c
           |JOIN ulm_pieces p ON p.piece = c.piece
           |ORDER BY c.ec DESC, c.piece LIMIT 30""".stripMargin
      })
  }

  /** EM improvement audit — the hard-EM step's monotonicity
    * guarantees asserted IN-QUERY (the q_agg_retract identity pattern
    * applied to the tokenizer trainer). Three corpus log-likelihoods,
    * all tf-weighted exact µ-bit int64 sums:
    *   L0 = the OLD best paths under the INITIAL piece probs (the
    *        ulm_seg readout);
    *   L1 = the same old paths re-scored under the RE-ESTIMATED probs
    *        (ulm_seg's piece rows joined to the M-step table);
    *   L2 = the NEW best paths under the re-estimated probs — the
    *        second enumeration pass over the PRUNED vocabulary
    *        ([[ulmSeg2Stage]]: only path-used pieces survive; every
    *        word stays segmentable because its own old path survives
    *        the prune).
    * Theory says L1 ≥ L0 (Gibbs: the MLE re-estimate maximizes the
    * expected-count likelihood; exact up to the ±0.5µ log
    * quantization) and L2 ≥ L1 (re-segmentation under fixed probs
    * only improves; EXACT in int64 — the old path is a valid
    * candidate). Both inequalities are output columns, so the oracle
    * gate re-proves the trainer's improvement every run. */
  val ulmEmGain: StagedOp = {
    // ulm_pcs2 (the M-step table) is a stage of [[ulmEmStep]] — one
    // copy, two consumers
    StagedOp(
      stages = ulmEmStep.stages :+ ulmSeg2Stage,
      body = { _ =>
        s"""WITH l0 AS (
           |  SELECT CAST(SUM(v.c * a.score) AS BIGINT) AS q
           |  FROM ulm_vocab v
           |  JOIN (SELECT w, score FROM ulm_seg WHERE segid = 0) a ON a.w = v.w
           |),
           |l1 AS (
           |  SELECT CAST(SUM(v.c * p2.qlp) AS BIGINT) AS q
           |  FROM ulm_seg p
           |  JOIN ulm_vocab v ON v.w = p.w
           |  JOIN ulm_pcs2 p2 ON p2.piece = p.piece
           |),
           |l2 AS (
           |  SELECT CAST(SUM(v.c * d.score) AS BIGINT) AS q
           |  FROM ulm_vocab v JOIN ulm_seg2 d ON d.w = v.w
           |)
           |SELECT
           |  ${r6("CAST(l0.q AS DOUBLE) / 1.0e6")} AS loglik_init_bits,
           |  ${r6("CAST(l1.q AS DOUBLE) / 1.0e6")} AS loglik_mstep_bits,
           |  ${r6("CAST(l2.q AS DOUBLE) / 1.0e6")} AS loglik_resegment_bits,
           |  l1.q >= l0.q AS mstep_improves,
           |  l2.q >= l1.q AS resegment_improves
           |FROM l0 CROSS JOIN l1 CROSS JOIN l2""".stripMargin
      })
  }

}
