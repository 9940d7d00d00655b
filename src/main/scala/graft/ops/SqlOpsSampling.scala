package graft.ops

/** Sampling, splits and mixing (stratified/Neyman/k-fold/temporal/curriculum/DoReMi/temperature), canonical selection, corpus statistics.
  *
  * Split out of the single-file SqlOps (r11) as a PURE MOVE: member
  * order across the [[SqlOpsAll]] linearization equals the pre-split
  * declaration order, so val-initialization semantics are unchanged.
  * The self-type keeps every cross-domain reference compiling against
  * the same single [[SqlOps]] instance.
  */
trait SqlOpsSampling { this: SqlOpsAll =>

  // ---- sampling / canonical selection / corpus statistics ----

  /** Deterministic content-hash sampling: bucket = first byte of
    * md5(text) (0-255), keep buckets < 32 → a reproducible ~12.5%
    * sample. The scale pattern for training-data subsetting: no RNG
    * state, independent of partitioning and row order, re-runnable on
    * any engine. */
  def sampleHash(d: Dialect): String =
    s"""SELECT doc_id, lang, n_chars FROM documents
       |WHERE ${md5Bucket("text")} < 32""".stripMargin

  /** Per-source document cap — the C4-style per-domain quota that
    * stops any single source from dominating a training mix: keep at
    * most 30 docs per source, chosen by content-hash priority
    * (deterministic, position-unbiased, RNG-free — re-runnable on any
    * engine and any partitioning). One window shuffle on the source
    * key; at 100 TB each source's rows rank independently, and a
    * pre-aggregated count gate could skip the window entirely for
    * sources already under quota. */
  def capPerSource(d: Dialect): String =
    s"""SELECT doc_id, source, rn FROM (
       |  SELECT doc_id, source,
       |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY md5(text), doc_id) AS rn
       |  FROM documents
       |) WHERE rn <= 30""".stripMargin

  /** Globally consecutive row ids WITHOUT a global sort — the
    * technique that replaces `ROW_NUMBER() OVER (ORDER BY …)` (a
    * single-partition window, the classic 100 TB deadend) with a
    * two-phase decomposition: per-shard local ranks (parallel windows
    * over 16 hash shards), per-shard counts (a 16-row table), prefix
    * offsets over that tiny table, and one broadcast join adding
    * offset + local rank. The oracle runs the single global window —
    * proving the decomposition emits byte-identical ids. Total order
    * is (shard, md5(text), doc_id): deterministic, engine-portable,
    * no RNG. */
  def globalRowNumber(d: Dialect): String =
    s"""WITH sh AS (
       |  SELECT doc_id, ${md5Bucket("text")} % 16 AS shard, md5(text) AS h
       |  FROM documents
       |),
       |r AS (
       |  SELECT doc_id, shard, h,
       |    ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h, doc_id) AS lr
       |  FROM sh
       |),
       |cnt AS (SELECT shard, COUNT(*) AS n FROM sh GROUP BY shard),
       |osets AS (
       |  SELECT shard,
       |    SUM(n) OVER (ORDER BY shard
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS off0
       |  FROM cnt
       |)
       |SELECT r.doc_id, CAST(r.lr + COALESCE(o.off0, 0) AS BIGINT) AS global_id
       |FROM r JOIN osets o ON r.shard = o.shard""".stripMargin

  /** Stratified sampling: exactly 50 docs per language, chosen by
    * content-hash order (deterministic, unbiased w.r.t. position).
    * One window shuffle on the stratum key; at 100 TB strata are
    * processed independently per partition group. */
  def sampleStratified(d: Dialect): String =
    s"""SELECT doc_id, lang FROM (
       |  SELECT doc_id, lang,
       |    ROW_NUMBER() OVER (PARTITION BY lang ORDER BY md5(text), doc_id) AS rn
       |  FROM documents
       |) WHERE rn <= 50""".stripMargin

  /** Context-length sizing audit — the padding-waste table a pipeline
    * reads before choosing max_len and deciding whether packing is
    * worth it: for each candidate length, the NAIVE per-doc regime
    * (every doc padded to ⌈n/L⌉ full sequences — the no-packing
    * baseline) against the concat-packing LOWER BOUND (one global
    * token stream, ⌈Σn/L⌉ sequences — what perfect packing achieves;
    * [[packSequences]]' shard-greedy lands between the two). All
    * closed-form integer arithmetic off one scan of per-doc token
    * counts: ⌈n/L⌉ = (n + L − 1) DIV L, waste = padded − tokens,
    * fractions are single exact divisions. Scale shape: one narrow
    * aggregate per candidate length over the doc-cardinality token
    * counts read off the STAGED tf index (a 4-armed UNION over an
    * inline corpus CTE would re-tokenize the corpus per arm under
    * CTE inlining) — no packing simulation, no window, no shuffle
    * beyond the aggregates. */
  val packEfficiency: StagedOp = StagedOp(
    stages = textUnigramLm.stages,
    body = { d =>
      val lens = Seq(64, 128, 256, 512)
      val rows = lens.map { l =>
        def ceilDoc = d.idiv(s"n + ${l - 1}", l.toString)
        def ceilAll = d.idiv(s"SUM(n) + ${l - 1}", l.toString)
        s"""SELECT $l AS max_len,
           |  CAST(COUNT(*) AS BIGINT) AS n_docs,
           |  CAST(SUM(n) AS BIGINT) AS n_tokens,
           |  CAST(SUM($ceilDoc) AS BIGINT) AS naive_seqs,
           |  CAST(SUM($ceilDoc) * $l AS BIGINT) AS naive_padded,
           |  ${r6(s"CAST(SUM($ceilDoc) * $l - SUM(n) AS DOUBLE)" +
                  s" / (SUM($ceilDoc) * $l)")} AS naive_waste,
           |  CAST($ceilAll AS BIGINT) AS packed_seqs,
           |  ${r6(s"CAST($ceilAll * $l - SUM(n) AS DOUBLE)" +
                  s" / ($ceilAll * $l)")} AS packed_waste
           |FROM tn""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH tn AS (
         |  SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n FROM ulm_tf GROUP BY doc_id
         |)
         |$rows
         |ORDER BY max_len""".stripMargin
    })

  /** Shard-parallel sequence packing: assign documents to fixed
    * token-budget training sequences. Global greedy packing is
    * inherently sequential, so the scale shape is the one real
    * pipelines use — pack WITHIN deterministic shards: shard = content
    * hash (8 here; one per output worker in production), order within
    * the shard by content hash (the reproducible shuffle), running
    * token total via a shard-partitioned window, and
    * seq = ⌊(cum − n_tokens)/budget⌋ (first-fit in hash order; a
    * sequence may overflow the budget by at most one document — the
    * drop-or-split of the overhang is a downstream choice). The window
    * partitions on shard, so there is NO single-partition exchange:
    * shards pack independently, exactly like per-worker packing at
    * 100 TB. All sums are integer; the only division is exact. */
  def packSequences(d: Dialect): String = {
    val budget = 512
    s"""WITH t AS (
       |  SELECT doc_id,
       |    ${md5Bucket("text")} % 8 AS shard,
       |    CAST(${d.size(toks(d))} AS BIGINT) AS n_tokens,
       |    md5(text) AS mh
       |  FROM documents
       |),
       |cumt AS (
       |  SELECT doc_id, shard, n_tokens,
       |    CAST(SUM(n_tokens) OVER (
       |      PARTITION BY shard ORDER BY mh, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
       |  FROM t
       |)
       |SELECT doc_id, shard, n_tokens, cum_tokens,
       |  CAST(FLOOR(CAST(cum_tokens - n_tokens AS DOUBLE) / $budget.0e0) AS BIGINT) AS seq_id
       |FROM cumt""".stripMargin
  }

  /** Source-weighted corpus mixing: replicate each document
    * epochs(source) times — the "data mixing weights" op that turns
    * per-source sampling ratios into a physical training corpus.
    * Epochs here derive deterministically from the source id (1-3);
    * production feeds a weights table. The replication is
    * explode(sequence(1, epochs)) — a NARROW per-row generator, no
    * join, no shuffle; output volume is Σ epochs by construction,
    * which is the budgeted size of the training mix. */
  def mixEpochs(d: Dialect): String = {
    val base =
      s"""SELECT doc_id, source,
         |    1 + (CAST(substr(source, 4) AS INT) % 3) AS epochs,
         |    ${d.seqArray("1", "1 + (CAST(substr(source, 4) AS INT) % 3)")} AS eps
         |  FROM documents""".stripMargin
    s"""WITH reps AS (
       |  ${d.explode(s"$base", "doc_id, source, epochs", "eps", "ep")}
       |)
       |SELECT doc_id, source, CAST(epochs AS BIGINT) AS epochs,
       |  CAST(ep AS BIGINT) AS copy_idx
       |FROM reps""".stripMargin
  }

  /** Vocabulary cumulative-coverage cutoff — the tokenizer-building
    * profile: global token counts ordered by frequency, cumulative
    * corpus share, and the 95%-coverage vocabulary flag. The groupBy
    * shuffle is bounded by VOCAB cardinality (map-side partial
    * counts), and the ordered-cumsum window runs over the vocab-sized
    * aggregate — at 100 TB the token scan is the only full pass; the
    * window input is ~1M rows regardless of corpus size (the one
    * place a global window is the right plan). The coverage test is
    * all-integer ((cum−n)·100 < 95·total — no FP boundary); the
    * reported share is one exact IEEE division. */
  def vocabCoverage(d: Dialect): String =
    s"""WITH dtoks AS (SELECT doc_id, ${toks(d)} AS toks FROM documents),
       |tok AS (${d.explode("SELECT doc_id, toks FROM dtoks", "doc_id", "toks", "t")}),
       |vc AS (SELECT t AS token, COUNT(*) AS n FROM tok GROUP BY t),
       |cum AS (
       |  SELECT token, n,
       |    CAST(SUM(n) OVER (ORDER BY n DESC, token
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n,
       |    CAST(SUM(n) OVER () AS BIGINT) AS total_n
       |  FROM vc
       |)
       |SELECT token, n, cum_n,
       |  CAST(cum_n AS DOUBLE) / total_n AS cum_share,
       |  (cum_n - n) * 100 < 95 * total_n AS in_vocab95
       |FROM cum""".stripMargin

  /** Source×source near-duplicate overlap matrix: which sources copy
    * from which — the provenance view of dedup, aggregated from the
    * SAME staged minhash band candidates the dedup family uses (no new
    * pairwise work; the matrix is a rollup of an index that already
    * exists). Pair sources are normalized LEAST/GREATEST so the matrix
    * is upper-triangular regardless of id order. Output is
    * |sources|² at most — driver-sized at any corpus scale. */
  val dedupSourceOverlap: StagedOp = StagedOp(
    stages = dedupMinhash.stages,
    body = { d =>
      // the snapshot-id → source map comes from the SHARED corpusCte
      // (projecting source), never a hand-forked copy of the id scheme
      // — a desynced fork would silently empty the join while the
      // oracle (sharing the same SQL) stayed green
      s"""WITH ${corpusCte(d, "source")}
         |SELECT LEAST(sa.source, sb.source) AS source_a,
         |  GREATEST(sa.source, sb.source) AS source_b,
         |  COUNT(*) AS n_pairs
         |FROM mh_cand c
         |JOIN corpus sa ON c.doc_a = sa.doc_id
         |JOIN corpus sb ON c.doc_b = sb.doc_id
         |GROUP BY LEAST(sa.source, sb.source), GREATEST(sa.source, sb.source)""".stripMargin
    })

  /** Canonical-survivor selection: within each exact-duplicate group
    * (content hash over the two-snapshot corpus), keep the best
    * representative — longest text first, ties to the smallest id (the
    * quality-aware flavor of dedup survivor choice; here length is the
    * quality proxy). */
  def dedupCanonical(d: Dialect): String =
    s"""WITH ${corpusCte(d)},
       |h AS (SELECT doc_id, text, md5(text) AS ch FROM corpus)
       |SELECT ch AS content_hash, doc_id AS survivor_id, n_members FROM (
       |  SELECT ch, doc_id,
       |    ROW_NUMBER() OVER (PARTITION BY ch ORDER BY length(text) DESC, doc_id) AS rn,
       |    COUNT(*) OVER (PARTITION BY ch) AS n_members
       |  FROM h
       |) WHERE rn = 1""".stripMargin

  /** Global top-20 word bigrams over the documents table — corpus
    * n-gram statistics (the LM-data profiling primitive). Spark side
    * reuses the codegen'd word_shingles expression with n=2; ordering
    * ties break on the bigram string. */
  def textBigrams(d: Dialect): String =
    s"""WITH ${shinglesCtes(d, n = 2, from = "documents")}
       |SELECT s AS bigram, COUNT(*) AS n
       |FROM sh GROUP BY s
       |ORDER BY n DESC, s LIMIT 20""".stripMargin

  /** Per-source top-3 bigrams: the grouped flavor of [[textBigrams]]
    * (which corpus slice says what) — a per-group top-k over text
    * aggregates: bigram counts shuffle once on (source, bigram) with
    * map-side partials, then the rank window runs per source. Ties
    * break on the bigram string, so the top-3 set is deterministic. */
  def topBigramsPerSource(d: Dialect): String =
    s"""WITH ${shinglesCtes(d, n = 2, from = "documents")},
       |bs AS (
       |  SELECT doc.source, sh.s, COUNT(*) AS n
       |  FROM sh JOIN documents doc ON sh.doc_id = doc.doc_id
       |  GROUP BY doc.source, sh.s
       |)
       |SELECT source, s AS bigram, n, rk FROM (
       |  SELECT source, s, n,
       |    ROW_NUMBER() OVER (PARTITION BY source ORDER BY n DESC, s) AS rk
       |  FROM bs
       |) WHERE rk <= 3""".stripMargin

  /** Per-type p99 outlier events: exact integer-cent percentile per
    * event type (same cross-engine-exact interpolation as
    * [[eventPercentiles]]) joined back against the stream — the
    * analytic-join shape of quality filtering (compute per-group
    * thresholds once, broadcast them against the fact table). */
  def valueOutliers(d: Dialect): String = {
    val cents = "CAST(FLOOR(value * 100 + 5.0e-1) AS BIGINT)"
    s"""WITH p AS (
       |  SELECT event_type, ${d.percentileCont(cents, "9.9e-1")} / 1.0e2 AS p99
       |  FROM events GROUP BY event_type
       |)
       |SELECT e.event_id, e.event_type, e.value, p.p99
       |FROM events e JOIN p ON e.event_type = p.event_type
       |WHERE e.value > p.p99""".stripMargin
  }

  /** Range classification into UNIFORM 50-unit value bands. Uniform
    * contiguous intervals need no join at all: the band is a closed-form
    * projection (`floor(value/50)`), so the whole operator is one
    * codegen'd map + one map-side-combinable groupBy — zero row
    * amplification, zero nested-loop, the shape that survives 100 TB.
    * (Round-4 verdict: the previous theta-join against a 10-interval
    * band table BroadcastNestedLoop'd every event row 10×.) The WHERE
    * reproduces the old inner join's drop of out-of-range values, and
    * both engines run the identical IEEE divide + floor, so boundary
    * rounding is cross-engine-exact. */
  def rangeJoinBands(d: Dialect): String =
    s"""SELECT CAST(FLOOR(value / 5.0e1) AS INT) AS band, COUNT(*) AS n_events,
       |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
       |FROM events
       |WHERE value >= 0.0e0 AND value < 5.0e2
       |GROUP BY CAST(FLOOR(value / 5.0e1) AS INT)""".stripMargin

  /** Range join proper: IRREGULAR value bands (no closed form — width
    * varies per band), the case that genuinely needs an interval
    * condition. The band table is literal/broadcast-sized, so the join
    * is a broadcast nested-loop over 6 intervals — the right plan for
    * small interval tables; with large interval sets this becomes
    * interval-tree bucketize-then-equi-join. */
  def rangeJoinIrregular(d: Dialect): String = {
    val edges = Seq(0, 10, 25, 70, 160, 310, 500)
    val bands = edges.init.zip(edges.tail).zipWithIndex.map { case ((lo, hi), i) =>
      s"SELECT $i AS band, $lo.0e0 AS lo, $hi.0e0 AS hi"
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH bands AS (
       |  $bands
       |)
       |SELECT b.band, b.lo, b.hi, COUNT(*) AS n_events,
       |  CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
       |FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
       |GROUP BY b.band, b.lo, b.hi""".stripMargin
  }

  /** Binary-column metadata extraction: documents.text treated as an
    * opaque binary payload (this container has no image/audio codecs —
    * the "decode" is a deterministic fake; the schema/partition/batch
    * plumbing is the real part, see graft.ops.Multimodal). */
  def multimodalMeta(d: Dialect): String =
    s"""WITH b AS (SELECT doc_id, ${d.toBinary("text")} AS bin FROM documents)
       |SELECT doc_id,
       |  octet_length(bin) AS n_bytes,
       |  CAST(octet_length(bin) % 317 + 16 AS INT) AS fake_width,
       |  CAST(octet_length(bin) % 211 + 16 AS INT) AS fake_height,
       |  CAST(octet_length(bin) % 3 + 1 AS INT) AS fake_channels
       |FROM b""".stripMargin

  /** Overlapping audio analysis windows over the opaque payload bytes
    * (the doc_id%3==1 slice plays the audio modality, as %3==2 plays
    * video in [[SparkEntry]]'s frame query): window = 256 bytes,
    * hop = 192 (25% overlap), last window ends at the payload's final
    * byte — the STFT/feature-extraction geometry. Pure integer window
    * math + one explode, no shuffle; the sample decode itself would
    * live in the batched mapPartitions decoder (codec-free container,
    * like the image path). */
  def multimodalAudioWindows(d: Dialect): String =
    s"""WITH a AS (
       |  SELECT doc_id, octet_length(${d.toBinary("text")}) AS nb FROM documents
       |  WHERE doc_id % 3 = 1
       |),
       |spans AS (
       |  SELECT doc_id, nb,
       |    ${d.seqArray("0",
           "CASE WHEN nb <= 256 THEN 0 ELSE CAST(FLOOR((nb - 65) / 1.92e2) AS BIGINT) END")} AS wins
       |  FROM a
       |),
       |w AS (${d.explode("SELECT doc_id, nb, wins FROM spans", "doc_id, nb", "wins", "win_no")})
       |SELECT doc_id, CAST(win_no AS INT) AS win_no,
       |  CAST(win_no * 192 AS INT) AS start_byte,
       |  CAST(LEAST(nb - win_no * 192, 256) AS INT) AS win_len
       |FROM w""".stripMargin

  /** 8-point DFT band energies over the audio windows — the spectral
    * feature-extraction step after [[multimodalAudioWindows]]'s STFT
    * geometry: per full 256-byte window, 8 samples at stride 32, and
    * for bins k = 0..4 (real input ⇒ the upper bins mirror) the power
    * |X_k|² = (Σx·cos)² + (Σx·sin)². Twiddle factors cos/sin(2πkj/8)
    * take only the values {0, ±1, ±√2/2}; they are PRECOMPUTED
    * host-side as µ-quantized int64 literals (the EWMA
    * transcendental-pinning rule — engine cos() is not IEEE-pinned),
    * so every product and sum is exact int64: |x| ≤ 255 ⇒ |Σx·c| ≤
    * 8·255·10⁶ ≈ 2.04e9 and the power ≤ 8.3e18, inside int64. The
    * byte read is the deterministic stub rule (ASCII corpus ⇒
    * ascii(substr) = payload byte — the aHash path's identity); a
    * real audio deployment swaps in the batched mapPartitions PCM
    * decoder (graft.ops.Multimodal) upstream of the SAME window/DFT
    * SQL. Shape: one narrow explode, a 40-row broadcast twiddle
    * spine, one (doc, window, k) aggregate — no corpus self-join. */
  def multimodalSpectrum(d: Dialect): String = {
    val cosT = Map(0 -> 1000000L, 1 -> 707107L, 2 -> 0L, 3 -> -707107L,
      4 -> -1000000L, 5 -> -707107L, 6 -> 0L, 7 -> 707107L)
    val sinT = Map(0 -> 0L, 1 -> 707107L, 2 -> 1000000L, 3 -> 707107L,
      4 -> 0L, 5 -> -707107L, 6 -> -1000000L, 7 -> -707107L)
    val tw = (for (k <- 0 to 4; j <- 0 to 7) yield {
      val a = (k * j) % 8
      s"SELECT $k AS k, $j AS j, CAST(${cosT(a)} AS BIGINT) AS cq, CAST(${sinT(a)} AS BIGINT) AS sq"
    }).mkString("\n  UNION ALL ")
    s"""WITH aa AS (
       |  SELECT doc_id, text, octet_length(${d.toBinary("text")}) AS nb FROM documents
       |  WHERE doc_id % 3 = 1 AND octet_length(${d.toBinary("text")}) >= 256
       |),
       |spans AS (
       |  SELECT doc_id, text, nb,
       |    ${d.seqArray("0", "CAST(FLOOR((nb - 256) / 1.92e2) AS BIGINT)")} AS wins
       |  FROM aa
       |),
       |w AS (${d.explode("SELECT doc_id, text, nb, wins FROM spans",
                          "doc_id, text, nb", "wins", "win_no")}),
       |tw AS (
       |  $tw
       |),
       |js AS (${domainRel("j", (0 to 7).map(_.toString))}),
       |samp AS (
       |  -- bytes extracted ONCE per (window, j) on the 8-row j spine;
       |  -- the 5 k rows join the already-read byte (reading inside the
       |  -- 40-row spine evaluated every substr/ascii five times)
       |  SELECT w.doc_id, w.win_no, js.j,
       |    ascii(substr(w.text, CAST(w.win_no * 192 + 1 + 32 * js.j AS INT), 1)) AS x
       |  FROM w CROSS JOIN js
       |),
       |sp AS (
       |  SELECT s.doc_id, s.win_no, t.k,
       |    CAST(SUM(s.x * t.cq) AS BIGINT) AS xr,
       |    CAST(SUM(s.x * t.sq) AS BIGINT) AS xi
       |  FROM samp s JOIN tw t ON t.j = s.j
       |  GROUP BY s.doc_id, s.win_no, t.k
       |)
       |SELECT doc_id, CAST(win_no AS INT) AS win_no, CAST(k AS INT) AS k,
       |  CAST(xr * xr + xi * xi AS BIGINT) AS power_mu2
       |FROM sp""".stripMargin
  }

  /** Aspect-preserving resize planning over the (fake) decoded
    * dimensions: fit into a 64×64 box. The geometry arithmetic is the
    * real pipeline stage (pure integer math, exact in both engines);
    * the pixel resampling itself would live in the batched
    * mapPartitions decoder (graft.ops.Multimodal), stubbed in this
    * codec-free container. */
  def multimodalResize(d: Dialect): String =
    s"""WITH b AS (SELECT doc_id, octet_length(${d.toBinary("text")}) AS nb FROM documents),
       |dims AS (SELECT doc_id,
       |    CAST(nb % 317 + 16 AS INT) AS w,
       |    CAST(nb % 211 + 16 AS INT) AS h
       |  FROM b)
       |SELECT doc_id, w, h,
       |  CAST(FLOOR(CAST(w * 64 AS DOUBLE) / GREATEST(w, h)) AS INT) AS new_w,
       |  CAST(FLOOR(CAST(h * 64 AS DOUBLE) / GREATEST(w, h)) AS INT) AS new_h
       |FROM dims""".stripMargin

  /** Shared market-basket stages: distinct (order, brand) incidence,
    * per-item basket supports, and apriori-gated pair supports —
    * consumed by [[assocRules]] and [[itemSimilarity]], built once per
    * JVM. `ar_isup` is a stage (not a CTE) because every consumer
    * references it 2-3 times and Spark CTE inlining would recompute
    * the groupBy per reference. The self-join inside `ar_pairs` is
    * the one pairwise step, gated by the minsup-40 frequent-item
    * filter (apriori monotonicity: an infrequent item cannot appear
    * in a frequent pair, so the prune is lossless for the HAVING-10
    * pair floor). */
  private[ops] val basketStages: Seq[(String, Dialect => String)] = Seq(
    // distinct (basket, item): an order may hold a brand many times —
    // support counts baskets, not line items
    "ar_baskets" -> { _ =>
      s"""SELECT DISTINCT l_orderkey AS basket, p_brand AS item
         |FROM lineitem JOIN part ON l_partkey = p_partkey""".stripMargin
    },
    "ar_isup" -> { _ =>
      "SELECT item, COUNT(*) AS supp FROM ar_baskets GROUP BY item"
    },
    "ar_pairs" -> { _ =>
      s"""WITH fb AS (
         |  SELECT b.basket, b.item FROM ar_baskets b
         |  JOIN ar_isup s ON b.item = s.item AND s.supp >= 40
         |)
         |SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS supp_ab
         |FROM fb a JOIN fb b ON a.basket = b.basket AND a.item < b.item
         |GROUP BY a.item, b.item
         |HAVING COUNT(*) >= 10""".stripMargin
    })

  /** Market-basket association rules (Agrawal & Srikant, "Fast
    * Algorithms for Mining Association Rules", VLDB 1994): baskets are
    * orders, items are part brands, rules are brand→brand with
    * support / confidence / lift. The apriori monotonicity gate is the
    * scale design: only items whose own basket support clears minsup
    * enter the pairwise self-join, so the join fan-out per basket is
    * bounded by the frequent-item count, never the raw item count — at
    * 100 TB the freq gate is what keeps the candidate space from
    * exploding on long-tail items. Shapes: the staged basket table is
    * one broadcast dim join off lineitem; item support is a map-side-
    * combined groupBy; the pair join shuffles both (pre-filtered) sides
    * on basket id; the rule join back to item supports broadcasts the
    * tiny support table. All stats are integer counts; confidence and
    * lift divide exact-integer doubles and quantize to 6dp, so both
    * engines run identical IEEE ops. */
  val assocRules: StagedOp = StagedOp(
    stages = basketStages,
    body = { _ =>
      s"""WITH n AS (SELECT COUNT(DISTINCT basket) AS n_baskets FROM ar_baskets),
         |rules AS (
         |  SELECT item_a AS antecedent, item_b AS consequent, supp_ab FROM ar_pairs
         |  UNION ALL
         |  SELECT item_b AS antecedent, item_a AS consequent, supp_ab FROM ar_pairs
         |)
         |SELECT r.antecedent, r.consequent, r.supp_ab,
         |  ${r6("CAST(r.supp_ab AS DOUBLE) / sa.supp")} AS confidence,
         |  ${r6("CAST(r.supp_ab AS DOUBLE) * n.n_baskets / (CAST(sa.supp AS DOUBLE) * sc.supp)")} AS lift
         |FROM rules r
         |JOIN ar_isup sa ON r.antecedent = sa.item
         |JOIN ar_isup sc ON r.consequent = sc.item
         |CROSS JOIN n""".stripMargin
    })

  /** k-anonymity audit over the quasi-identifier (nation, segment):
    * the privacy gate a dataset passes before release — any
    * quasi-identifier combination observed fewer than k=5 times
    * re-identifies its members and is flagged. One map-side-combined
    * groupBy at quasi-identifier cardinality (bounded domain, never
    * row count); exact integer counts, the flag is integer CASE. The
    * release decision reads `SUM(at_risk)` = 0; the per-group rows
    * are the remediation worklist (generalize or suppress those
    * cells). */
  def kAnonymity(d: Dialect): String =
    s"""SELECT c_nationkey, c_mktsegment, COUNT(*) AS group_size,
       |  CASE WHEN COUNT(*) < 5 THEN 1 ELSE 0 END AS at_risk
       |FROM customer
       |GROUP BY c_nationkey, c_mktsegment""".stripMargin

  /** l-diversity audit — [[kAnonymity]]'s stronger sibling: a
    * quasi-identifier group can be large (k-anonymous) yet still leak
    * if everyone in it shares one sensitive value, so each (nation,
    * segment) cell must also contain at least l = 3 DISTINCT sensitive
    * values (here the account-balance sign bucket: negative / low /
    * high — a bounded categorical derived with exact integer
    * thresholds). Same shape and cost as the k-anonymity gate: one
    * groupBy at quasi-identifier cardinality with a distinct-count,
    * release decision = SUM(below_l) = 0. */
  def lDiversity(d: Dialect): String =
    s"""WITH s AS (
       |  SELECT c_nationkey, c_mktsegment,
       |    CASE WHEN c_acctbal < 0 THEN 'neg'
       |         WHEN c_acctbal < 5000 THEN 'low'
       |         ELSE 'high' END AS bal_class
       |  FROM customer
       |)
       |SELECT c_nationkey, c_mktsegment,
       |  COUNT(*) AS group_size,
       |  COUNT(DISTINCT bal_class) AS n_sensitive,
       |  CASE WHEN COUNT(DISTINCT bal_class) < 3 THEN 1 ELSE 0 END AS below_l
       |FROM s GROUP BY c_nationkey, c_mktsegment""".stripMargin

  /** t-closeness audit — the privacy triad's third gate after
    * [[kAnonymity]] and [[lDiversity]]: a cell can be large AND
    * diverse yet still leak if its sensitive DISTRIBUTION deviates
    * from the table-wide one (e.g. a cell that is 95% 'neg' when the
    * population is 10%). Distance is the ordered-category Earth
    * Mover's Distance — mean |cumulative difference| over the ordered
    * classes — computed as exact integer cross-products over one
    * common denominator (|cumᶜ·G − cumᵍ·nᶜ|; the only float op is the
    * final division, r6'd), so the audit is engine-identical. A
    * category spine LEFT-joins so absent classes count as zero mass
    * rather than silently shrinking a cell's distribution. Cost: two
    * groupBys at cell×3 cardinality — same shape as the siblings. */
  def tCloseness(d: Dialect): String =
    s"""WITH s AS (
       |  SELECT c_nationkey, c_mktsegment,
       |    CASE WHEN c_acctbal < 0 THEN 1
       |         WHEN c_acctbal < 5000 THEN 2
       |         ELSE 3 END AS ord
       |  FROM customer
       |),
       |cellcat AS (
       |  SELECT c_nationkey, c_mktsegment, ord, CAST(COUNT(*) AS BIGINT) AS n
       |  FROM s GROUP BY c_nationkey, c_mktsegment, ord
       |),
       |cats AS (SELECT 1 AS ord UNION ALL SELECT 2 UNION ALL SELECT 3),
       |cells AS (SELECT DISTINCT c_nationkey, c_mktsegment FROM s),
       |cc AS (
       |  SELECT sp.c_nationkey, sp.c_mktsegment, sp.ord, COALESCE(x.n, 0) AS n
       |  FROM (SELECT * FROM cells CROSS JOIN cats) sp
       |  LEFT JOIN cellcat x
       |    ON sp.c_nationkey = x.c_nationkey
       |   AND sp.c_mktsegment = x.c_mktsegment AND sp.ord = x.ord
       |),
       |g AS (
       |  SELECT ord, CAST(COUNT(*) AS BIGINT) AS gn FROM s GROUP BY ord
       |),
       |gc AS (
       |  SELECT c.ord, CAST(SUM(COALESCE(g.gn, 0)) AS BIGINT) AS gcum
       |  FROM cats c LEFT JOIN g ON g.ord <= c.ord GROUP BY c.ord
       |),
       |cum AS (
       |  SELECT c_nationkey, c_mktsegment, ord,
       |    CAST(SUM(n) OVER (PARTITION BY c_nationkey, c_mktsegment
       |                      ORDER BY ord) AS BIGINT) AS ccum,
       |    CAST(SUM(n) OVER (PARTITION BY c_nationkey, c_mktsegment) AS BIGINT) AS nc
       |  FROM cc
       |),
       |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS gt FROM s),
       |emd AS (
       |  SELECT c_nationkey, c_mktsegment, MIN(nc) AS group_size,
       |    CAST(SUM(ABS(ccum * gt - gcum * nc)) AS BIGINT) AS num,
       |    MIN(nc) * MIN(gt) AS den
       |  FROM cum JOIN gc ON cum.ord = gc.ord CROSS JOIN tot
       |  GROUP BY c_nationkey, c_mktsegment
       |)
       |SELECT c_nationkey, c_mktsegment, group_size,
       |  ${r6("CAST(num AS DOUBLE) / CAST(den AS DOUBLE) / 2.0e0")} AS t_distance,
       |  CASE WHEN num * 2 > den THEN 1 ELSE 0 END AS above_t
       |FROM emd""".stripMargin

  /** Correlated LATERAL top-1 join: each customer's single most
    * expensive order via a per-row dependent subquery — the form an
    * analyst writes when the "top-k per group" intent is one row per
    * outer row. Catalyst decorrelates the lateral subquery into a
    * ranked join (same physical family as the window form in
    * q_topk_per_group), so the declarative per-row loop costs one
    * shuffle, not N subqueries — the reason LATERAL is safe to expose
    * at scale. Deterministic tie-break on (price DESC, orderkey);
    * customers with no orders drop (inner lateral semantics, the
    * intent of a "best order" readout). */
  def lateralLatest(d: Dialect): String =
    s"""SELECT c.c_custkey, l.o_orderkey AS best_orderkey,
       |  CAST(FLOOR(l.o_totalprice * 1.0e2 + 5.0e-1) AS BIGINT) AS best_cents
       |FROM customer c,
       |LATERAL (
       |  SELECT o_orderkey, o_totalprice FROM orders o
       |  WHERE o.o_custkey = c.c_custkey
       |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 1
       |) l""".stripMargin

  /** Two-proportion z-test between experiment arms (the A/B readout):
    * users split by id parity (the deterministic stand-in for an
    * assignment column), conversion = ever made a LARGE purchase
    * (value > 150 — the shared [[twoPropCtes]] rule), and the
    * statistic is (p0−p1)/√(p̂(1−p̂)(1/n0+1/n1)) with the pooled p̂ —
    * the standard large-sample test an experimentation platform
    * computes per metric. Shape: one per-user conditional aggregate
    * (map-side combined), one 2-group rollup, then scalar arithmetic
    * on a single row — nothing after the first aggregate touches more
    * than two rows at any scale. Counts are exact int64; the z value
    * is one fixed IEEE sequence, 6dp-quantized, with a NULL guard on
    * the degenerate all-convert/none-convert pool. */
  def abTest(d: Dialect): String =
    s"""WITH ${twoPropCtes("user_id % 2")}
       |$twoPropZSelect""".stripMargin

  /** The z-readout SELECT over the pivoted `s(n0,c0,n1,c1)` row —
    * the third shared piece of the two-proportion protocol, consumed
    * by [[abTest]] and by the STREAMING experiment monitor
    * ([[graft.streaming.StreamingOps]]`.abMonitorBatch` via
    * [[abTestFromUsers]]), so the batch readout and the per-batch
    * stream log compute the identical statistic. */
  // the two-proportion expression strings — ONE copy consumed by the
  // z readout AND the A/A calibration, so the pooled-variance formula
  // cannot fork between the real test and its null check
  private[ops] val TwoPropP0 = "(CAST(c0 AS DOUBLE) / n0)"
  private[ops] val TwoPropP1 = "(CAST(c1 AS DOUBLE) / n1)"
  private[ops] val TwoPropPooled = "(CAST(c0 + c1 AS DOUBLE) / (n0 + n1))"
  private[ops] val TwoPropSe2 =
    s"($TwoPropPooled * (1.0e0 - $TwoPropPooled) * (1.0e0 / n0 + 1.0e0 / n1))"

  private[graft] def twoPropZSelect: String = {
    val se = s"SQRT($TwoPropSe2)"
    s"""SELECT n0, c0, n1, c1,
       |  ${r6(TwoPropP0)} AS rate_a, ${r6(TwoPropP1)} AS rate_b,
       |  CASE WHEN $se = 0.0e0 THEN NULL
       |       ELSE ${r6(s"($TwoPropP0 - $TwoPropP1) / $se")} END AS z_score
       |FROM s""".stripMargin
  }

  /** The arm-rollup + pivot CTEs from a (arm, converted) user relation
    * — shared by [[twoPropCtes]] (which derives the users from the
    * events table) and [[abTestFromUsers]] (which reads an
    * already-maintained user-state view). */
  private[graft] def twoPropAggCtes(from: String): String =
    s"""a AS (
       |  SELECT arm, COUNT(*) AS n,
       |    COUNT(CASE WHEN converted = 1 THEN 1 END) AS conv
       |  FROM $from GROUP BY arm
       |),
       |s AS (
       |  SELECT
       |    MAX(CASE WHEN arm = 0 THEN n END) AS n0,
       |    MAX(CASE WHEN arm = 0 THEN conv END) AS c0,
       |    MAX(CASE WHEN arm = 1 THEN n END) AS n1,
       |    MAX(CASE WHEN arm = 1 THEN conv END) AS c1
       |  FROM a
       |)""".stripMargin

  /** The full two-proportion readout over a user-grain view/table
    * with (arm, converted) columns — the entry point the streaming
    * experiment monitor runs per batch against its merged user
    * state. Identical arithmetic to [[abTest]] by construction (the
    * same [[twoPropAggCtes]] + [[twoPropZSelect]] pieces). */
  def abTestFromUsers(usersView: String): String =
    s"""WITH ${twoPropAggCtes(usersView)}
       |$twoPropZSelect""".stripMargin

  /** The two-proportion protocol (arm split → per-user conversion →
    * 2-arm rollup → one wide row) shared by [[abTest]] and
    * [[aaCalibration]] — ONE copy, so the real test and its null
    * calibration can never drift apart on what "converted" or an arm
    * count means (the dailyDollarsCtes single-sourcing rule).
    * Conversion is a LARGE purchase (value > 150), not "ever
    * purchased": on a mature product every user eventually purchases
    * — the binary saturates at p̂ = 1, the pooled variance collapses
    * to 0, and the z readout degenerates to NULL (eyeball-caught:
    * the fixture converts 100% of users under the old rule at every
    * SF, ~45% under this one — an interior rate the test can actually
    * move). */
  /** The LARGE-purchase value floor — ONE copy of the conversion
    * threshold shared by the user-grain rule here and the per-trial
    * SPRT ([[abSprt]]), so the sequential and fixed-horizon readouts
    * cannot drift on what counts as a conversion. */
  private[ops] val ConvValueFloor = "150"
  private[ops] def twoPropCtes(armExpr: String): String =
    s"""u AS (
       |  SELECT user_id, $armExpr AS arm,
       |    MAX(CASE WHEN event_type = 'purchase' AND value > $ConvValueFloor THEN 1 ELSE 0 END) AS converted
       |  FROM events GROUP BY user_id
       |),
       |${twoPropAggCtes("u")}""".stripMargin

  /** Wald's SEQUENTIAL probability ratio test over the treatment
    * arm's daily large-purchase rate — the always-valid sequential
    * companion to the fixed-horizon [[abTest]]: a monitor that peeks
    * every day needs boundaries that survive optional stopping, which
    * is exactly the SPRT's log-likelihood-ratio walk with
    * ±log₂((1−β)/α) boundaries (α = β = 0.05). Hypotheses are
    * per-purchase success rates H0: p = 0.10 vs H1: p = 0.03,
    * bracketing the fixture's ~4% so the walk drifts decisively
    * toward H1 at the larger SFs while the smallest SF honestly reads
    * 'continue' — the sequential answer when the evidence hasn't
    * accumulated. ALL arithmetic is exact int64: the per-trial
    * µ-scaled log2 increments (L1 = ⌊log₂(p1/p0)·10⁶⌉ = −1736966,
    * L0 = ⌊log₂((1−p1)/(1−p0))·10⁶⌉ = 108060) and the boundary
    * ±4247928 are HOST-EXACT literals (the EWMA weight-table rule —
    * transcendentals are not IEEE-pinned across engines, so the
    * finite constant set is precomputed), the daily increment is
    * succ·L1 + (trials−succ)·L0, and the cumulative walk is a
    * day-cardinality window (30 rows — the calendar-chain
    * convention, never a per-event sort). Trials envelope: |L1| ≈
    * 1.74e6 ⇒ ~5e12 lifetime trials fit int64; loud-guarded. */
  def abSprt(d: Dialect): String = {
    val (l1, l0, bound) = (-1736966L, 108060L, 4247928L)
    val llrDay = s"(succ * $l1 + (trials - succ) * $l0)"
    // the CUMULATIVE walk needs its own guard: the per-day trials cap
    // alone admits |llr_day| up to ~1.7e18, so a handful of same-sign
    // heavy days could wrap the int64 window sum without any single
    // day tripping. A CASE around the window cannot gate it (the
    // WindowExec computes every window function before the
    // projection), so the guard is STRUCTURAL: a scalar Σ|llr| bound
    // (double on exact addends — ulp error ≪ the 1.2e18 margin)
    // joined UNDER the window input, so it materializes (and throws
    // its loud message) before the exact sum can overflow; its 0
    // rides into the sum to keep the dependency visible to both
    // planners.
    s"""WITH t AS (
       |  SELECT ${d.idiv(d.epochSeconds("ts"), "86400")} AS day,
       |    CASE WHEN COUNT(*) > 1000000000000
       |      THEN CAST('ab-sprt: daily trials exceed the LLR int64 envelope' AS BIGINT)
       |      ELSE CAST(COUNT(*) AS BIGINT) END AS trials,
       |    CAST(COUNT(CASE WHEN value > $ConvValueFloor THEN 1 END) AS BIGINT) AS succ
       |  FROM events
       |  WHERE user_id % 2 = 1 AND event_type = 'purchase'
       |  GROUP BY 1
       |),
       |chk AS (
       |  SELECT CASE WHEN SUM(ABS(CAST($llrDay AS DOUBLE))) > 8.0e18
       |    THEN CAST('ab-sprt: cumulative LLR exceeds the int64 envelope' AS BIGINT)
       |    ELSE 0 END AS ok
       |  FROM t
       |),
       |c AS (
       |  SELECT day, trials, succ, $llrDay AS llr_day_mu,
       |    CAST(SUM($llrDay + chk.ok) OVER (ORDER BY day) AS BIGINT) AS cum_llr_mu
       |  FROM t CROSS JOIN chk
       |)
       |SELECT CAST(day AS BIGINT) AS day, trials, succ AS successes,
       |  CAST(llr_day_mu AS BIGINT) AS llr_day_mu, cum_llr_mu,
       |  CASE WHEN cum_llr_mu >= $bound THEN 'accept_h1'
       |       WHEN cum_llr_mu <= -$bound THEN 'accept_h0'
       |       ELSE 'continue' END AS decision
       |FROM c""".stripMargin
  }

  /** A/A calibration of the experimentation readout — the null-split
    * sanity every A/B platform runs before trusting its p-values:
    * the SAME two-proportion protocol as [[abTest]] (one shared CTE
    * copy) over a split that is KNOWN to be null — the md5 bucket of
    * the user id, an assignment orthogonal to the id-parity "arms"
    * the real test uses and to any id-correlated behavior. A
    * calibrated pipeline sees z² below the χ²₁ 5% critical value
    * 3.8416 (the exact literal the power/Mann-Kendall family uses);
    * a failure means the unit of randomization leaks (per-user
    * correlation, interference, a broken split) and every "real" A/B
    * readout from the same pipeline is suspect. z² is one fixed IEEE
    * expression on exact int64 counts; NULL on the degenerate
    * all/none-convert pool. */
  def aaCalibration(d: Dialect): String = {
    val z2 = s"(($TwoPropP0 - $TwoPropP1) * ($TwoPropP0 - $TwoPropP1) / $TwoPropSe2)"
    // IS NULL first: an empty arm leaves se2 NULL, and `se2 = 0` is
    // then NULL too — without the explicit guard both WHENs skip and
    // ELSE 0 falsely reports a FAILED calibration on degenerate input
    s"""WITH ${twoPropCtes(s"${md5Bucket("CAST(user_id AS STRING)")} % 2")}
       |SELECT n0, c0, n1, c1,
       |  CASE WHEN $TwoPropSe2 IS NULL OR $TwoPropSe2 = 0.0e0 THEN NULL
       |       ELSE ${r6(z2)} END AS z_squared,
       |  CASE WHEN $TwoPropSe2 IS NULL OR $TwoPropSe2 = 0.0e0 THEN NULL
       |       WHEN $z2 < 3.8416e0 THEN 1 ELSE 0 END AS calibrated
       |FROM s""".stripMargin
  }

  /** Difference-in-differences estimator over the event stream — the
    * panel-data causal readout next to [[abTest]]'s cross-sectional z:
    * with arms as groups (the id-parity assignment) and a fixed
    * intervention date as the period split, DiD = (ȳ_T,post −
    * ȳ_T,pre) − (ȳ_C,post − ȳ_C,pre) nets out both the stable
    * group difference and the common time trend — the estimate an
    * experimentation platform reports when assignment predates the
    * launch. Cell sums are DECIMAL-exact (order-independent); the
    * four means and their double difference are one fixed IEEE
    * expression on exact operands, r6'd; NULL when any cell is empty
    * (a DiD with a missing cell is undefined, not zero). Shape: one
    * narrow scan (the NULL guard pushes; the period split is a
    * projected CASE), one map-side-combined 4-group aggregate, scalar
    * arithmetic — nothing after the groupBy touches more than 4 rows
    * at any scale. */
  def didEstimator(d: Dialect): String = {
    def mean(g: Int, p: Int) =
      s"(CAST(s$g$p AS DOUBLE) / n$g$p)"
    val cells = (for (g <- 0 to 1; p <- 0 to 1) yield {
      s"""CAST(SUM(CASE WHEN arm = $g AND post = $p THEN 1 ELSE 0 END) AS BIGINT) AS n$g$p,
         |    CAST(SUM(CASE WHEN arm = $g AND post = $p THEN vq ELSE CAST(0 AS DECIMAL(18,2)) END) AS DECIMAL(38,2)) AS s$g$p"""
        .stripMargin
    }).mkString(",\n    ")
    s"""WITH e AS (
       |  SELECT user_id % 2 AS arm,
       |    CASE WHEN ts >= CAST('2024-01-16' AS TIMESTAMP) THEN 1 ELSE 0 END AS post,
       |    CAST(value AS DECIMAL(18,2)) AS vq
       |  FROM events
       |  -- a NULL value must not enter n while being skipped by the sum
       |  WHERE value IS NOT NULL
       |),
       |c AS (
       |  SELECT
       |    $cells
       |  FROM e
       |)
       |SELECT n00, n01, n10, n11,
       |  CASE WHEN n00 = 0 THEN NULL ELSE ${r6(mean(0, 0))} END AS mean_ctrl_pre,
       |  CASE WHEN n01 = 0 THEN NULL ELSE ${r6(mean(0, 1))} END AS mean_ctrl_post,
       |  CASE WHEN n10 = 0 THEN NULL ELSE ${r6(mean(1, 0))} END AS mean_treat_pre,
       |  CASE WHEN n11 = 0 THEN NULL ELSE ${r6(mean(1, 1))} END AS mean_treat_post,
       |  CASE WHEN n00 = 0 OR n01 = 0 OR n10 = 0 OR n11 = 0 THEN NULL
       |       ELSE ${r6(s"(${mean(1, 1)} - ${mean(1, 0)}) - (${mean(0, 1)} - ${mean(0, 0)})")}
       |  END AS did_estimate
       |FROM c""".stripMargin
  }

  /** Wald–Wolfowitz RUNS TEST of the corpus's STORAGE ORDER — the
    * shuffle-quality audit a training pipeline runs before pointing a
    * sequential data loader at the table: are the 'en' docs arranged
    * randomly along doc_id, or clustered (a bad shuffle — consecutive
    * same-language training batches) / alternating (a suspiciously
    * regular interleave)? R = 1 + #(adjacent label flips); under the
    * null E[R] = 1 + 2n₁n₀/n and Var[R] = 2n₁n₀(2n₁n₀−n)/(n²(n−1)),
    * so z² = A²(n−1)/(2n₁n₀(2n₁n₀−n)) with the EXACT int64 numerator
    * A = R·n − n − 2n₁n₀, compared against the χ²₁ 5% literal 3.8416
    * as one fixed IEEE expression (A² and the denominator product run
    * in DOUBLE — each factor is an exact int64, the products would
    * overflow int64 near the envelope). Adjacency is an equi-join on
    * doc_id + 1 (the fixture's ids are dense — the storage-position
    * contract; at scale the loader's order column plays this role),
    * so the flip count shuffles on the id key and needs NO global
    * window. Envelope: R·n and 2n₁n₀ must fit int64 ⇒ n ≤ 3e9 rows,
    * loud-guarded (the CASE-throw discipline). Direction is the SIGN
    * of A: negative = fewer runs than chance = clustered (the
    * bad-shuffle verdict), positive = alternating. NULL verdict on
    * one-class or 2n₁n₀ = n degenerate inputs.
    *
    * The dense-id contract is ENFORCED, not assumed: with gaps in
    * doc_id (filtering/deletes upstream) the +1 adjacency join
    * silently undercounts flips while n/n₁ still count every row —
    * a bias toward 'clustered' that reads like a real bad shuffle.
    * The guard is one cheap check off the same aggregate
    * (MAX − MIN + 1 = COUNT(*)): when it fails, z is NULL and the
    * verdict is the loud 'ids_not_dense' instead of a biased answer. */
  def runsTest(d: Dialect): String = {
    val a = "(runs * n - n - 2 * n1 * n0)"
    val den = "(CAST(2 * n1 * n0 AS DOUBLE) * (2 * n1 * n0 - n))"
    val z2 = s"(CAST($a AS DOUBLE) * $a * (n - 1) / $den)"
    s"""WITH sx AS (
       |  SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS x
       |  FROM documents
       |),
       |t AS (
       |  SELECT
       |    CASE WHEN COUNT(*) > 3000000000
       |      THEN CAST('runs-test: n exceeds the R*n int64 envelope' AS BIGINT)
       |      ELSE CAST(COUNT(*) AS BIGINT) END AS n,
       |    CAST(SUM(x) AS BIGINT) AS n1,
       |    CAST(MIN(doc_id) AS BIGINT) AS mn,
       |    CAST(MAX(doc_id) AS BIGINT) AS mx
       |  FROM sx
       |),
       |fl AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS flips
       |  FROM sx a JOIN sx b ON b.doc_id = a.doc_id + 1 AND a.x <> b.x
       |),
       |r AS (
       |  SELECT t.n, t.n1, t.n - t.n1 AS n0, fl.flips + 1 AS runs,
       |    CASE WHEN t.mx - t.mn + 1 = t.n THEN 1 ELSE 0 END AS dense
       |  FROM t CROSS JOIN fl
       |)
       |SELECT n, n1, n0, CAST(runs AS BIGINT) AS runs,
       |  CASE WHEN n1 = 0 OR n0 = 0 THEN NULL
       |       ELSE CAST(FLOOR(CAST(n + 2 * n1 * n0 AS DOUBLE) * 1000000 / n) AS BIGINT)
       |  END AS expected_runs_mu,
       |  CASE WHEN n1 = 0 OR n0 = 0 OR dense = 0 OR 2 * n1 * n0 = n OR n < 2 THEN NULL
       |       ELSE ${r6(z2)} END AS z_squared,
       |  CASE WHEN n1 = 0 OR n0 = 0 THEN NULL
       |       WHEN dense = 0 THEN 'ids_not_dense'
       |       WHEN 2 * n1 * n0 = n OR n < 2 THEN NULL
       |       WHEN $z2 <= 3.8416e0 THEN 'random'
       |       WHEN $a < 0 THEN 'clustered'
       |       ELSE 'alternating' END AS verdict
       |FROM r""".stripMargin
  }

  /** Order fulfillment cycle time: per order, days between the first
    * and last line shipment, rolled up per order priority — the ops
    * latency metric behind shipping SLAs. Ship dates are midnight UTC
    * so the /86400 quotient is an exact integer; the mean is one
    * exact-sum division, 6dp-quantized. Shape: a map-side-combined
    * per-order aggregate, one join to the order dim on its key, a
    * 5-group rollup. */
  def orderCycleTime(d: Dialect): String = {
    val es = (x: String) => d.epochSeconds(s"CAST($x AS TIMESTAMP)")
    s"""WITH per AS (
       |  SELECT l_orderkey AS okey,
       |    CAST((MAX(${es("l_shipdate")}) - MIN(${es("l_shipdate")})) / 86400 AS BIGINT) AS span_days
       |  FROM lineitem GROUP BY l_orderkey
       |)
       |SELECT o_orderpriority, COUNT(*) AS n_orders,
       |  CAST(MAX(span_days) AS BIGINT) AS max_span_days,
       |  ${r6("CAST(SUM(span_days) AS DOUBLE) / COUNT(*)")} AS mean_span_days
       |FROM per JOIN orders ON okey = o_orderkey
       |GROUP BY o_orderpriority""".stripMargin
  }

  /** Event-time disorder profile: per event type, how far event
    * timestamps run BEHIND the maximum already seen in arrival order
    * (event_id) within each user's stream — the empirical
    * out-of-orderness distribution that sizes a streaming watermark
    * (a "10 minutes" horizon is exactly a claim about max_delta_s,
    * and this query is how you check it against data instead of
    * guessing). delta = running-MAX(ts) − ts is 0 for in-order
    * arrivals, positive for late ones. The running MAX shards by
    * user (no global order, the per-key watermark shape); integer
    * epoch-second arithmetic throughout, the mean is one exact-sum
    * division 6dp-quantized. */
  def disorderProfile(d: Dialect): String = {
    val es = d.epochSeconds("CAST(ts AS TIMESTAMP)")
    s"""WITH x AS (
       |  SELECT event_type, $es AS s,
       |    MAX($es) OVER (PARTITION BY user_id ORDER BY event_id) AS mx
       |  FROM events
       |),
       |del AS (SELECT event_type, mx - s AS delta_s FROM x)
       |SELECT event_type, COUNT(*) AS n,
       |  COUNT(CASE WHEN delta_s > 0 THEN 1 END) AS n_late,
       |  CAST(MAX(delta_s) AS BIGINT) AS max_delta_s,
       |  ${r6("CAST(SUM(delta_s) AS DOUBLE) / COUNT(*)")} AS mean_delta_s
       |FROM del GROUP BY event_type""".stripMargin
  }

  /** Deterministic negative sampling for contrastive training pairs:
    * each document draws 2 negatives by hash-ring rotation — its
    * content bucket b (md5 head, 0-255) points at buckets b+64 and
    * b+128 (mod 256), and the negative is that bucket's smallest
    * doc_id. RNG-free (re-runnable at any scale, stable across
    * engines), and self-pairing is impossible by construction: the
    * rotation offsets are nonzero mod 256, so the negative's bucket
    * never equals the anchor's. Shape at 100 TB: the representative
    * table is ≤256 rows (a broadcast), the rotation is a narrow
    * projection — the whole op is one scan + one map-side-combined
    * 256-group aggregate + one broadcast join, no shuffle of the fact
    * rows. The hash ring is the same negatives-from-other-shards
    * heuristic contrastive pipelines use: content-hash distance is
    * uncorrelated with semantic similarity, which is exactly what a
    * random negative wants. */
  def negativePairs(d: Dialect): String =
    s"""WITH b AS (SELECT doc_id, ${md5Bucket("text")} AS bkt FROM documents),
       |rep AS (SELECT bkt, MIN(doc_id) AS rep_id FROM b GROUP BY bkt),
       |wj AS (
       |  ${d.explode("SELECT doc_id, bkt, " + d.seqArray("1", "2") + " AS js FROM b",
                      "doc_id, bkt", "js", "j")}
       |)
       |SELECT w.doc_id, CAST(w.j AS BIGINT) AS neg_rank, r.rep_id AS neg_id
       |FROM wj w JOIN rep r ON (w.bkt + 64 * w.j) % 256 = r.bkt""".stripMargin

  /** Calendar gap-fill of the daily order series: a generated day
    * spine (min..max epoch day) LEFT-joined to the per-day aggregate,
    * zero-filling silent days and carrying the last active day
    * forward — days_since_activity is the gap-age monitor a freshness
    * SLA reads. The forward fill is a running MAX over a CASE-nulled
    * monotone day key, which skips NULLs portably in both engines (the
    * IGNORE NULLS dialect split the attribution op also avoids). All
    * keys are integer epoch days (dates are midnight UTC so /86400 is
    * exact). Scale shape: the per-day aggregate is map-side combined
    * to date-domain cardinality, the spine is date-domain too (a few
    * thousand rows from one generate), so the join and the ordered
    * window both run on day-grain data — never on raw facts. */
  def gapFill(d: Dialect): String = {
    val es = (x: String) => d.epochSeconds(s"CAST($x AS TIMESTAMP)")
    s"""WITH daily AS (
       |  SELECT CAST(${es("o_orderdate")} / 86400 AS BIGINT) AS day,
       |    COUNT(*) AS n_orders,
       |    CAST(SUM(CAST(FLOOR(o_totalprice * 1.0e2 + 5.0e-1) AS BIGINT)) AS BIGINT) AS cents
       |  FROM orders GROUP BY 1
       |),
       |bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM daily),
       |spine AS (
       |  ${d.explode("SELECT lo, " + d.seqArray("lo", "hi") + " AS ds FROM bounds",
                      "lo", "ds", "day")}
       |),
       |joined AS (
       |  SELECT s.day, COALESCE(dl.n_orders, 0) AS n_orders,
       |    COALESCE(dl.cents, 0) AS cents,
       |    CASE WHEN dl.day IS NOT NULL THEN s.day END AS active_day
       |  FROM spine s LEFT JOIN daily dl ON s.day = dl.day
       |)
       |SELECT day, n_orders, cents,
       |  day - MAX(active_day) OVER (ORDER BY day) AS days_since_activity
       |FROM joined""".stripMargin
  }

  /** Conversion latency: per user, seconds from first signup to first
    * purchase, for the clean-converter cohort (users whose first-ever
    * purchase comes at or after their first signup — a
    * purchase-before-signup history disqualifies, by definition, not
    * as an approximation). One map-side-combinable conditional
    * aggregate per user (no self-join, no window): MIN(ts) over each
    * event class, then an integer-seconds difference on int64 epochs. */
  def timeToConvert(d: Dialect): String = {
    val es = (x: String) => d.epochSeconds(s"CAST($x AS TIMESTAMP)")
    s"""WITH per AS (
       |  SELECT user_id,
       |    MIN(CASE WHEN event_type = 'signup' THEN ${es("ts")} END) AS s0,
       |    MIN(CASE WHEN event_type = 'purchase' THEN ${es("ts")} END) AS p0
       |  FROM events GROUP BY user_id
       |)
       |SELECT user_id, p0 - s0 AS latency_s
       |FROM per WHERE s0 IS NOT NULL AND p0 IS NOT NULL AND p0 >= s0""".stripMargin
  }

  /** Data-quality audit: declarative expectations over the fact tables
    * — range rules, null rules, and referential integrity — emitted as
    * one (rule, n_violations, n_checked) row each, the contract report
    * a pipeline gate reads before publishing a snapshot. The fixture
    * makes some rules fire (quantity > 45, discount > 5%) and others
    * hold (negative totals, orphan keys), so the report exercises both
    * outcomes. Shape: ONE wide counting aggregate per table (each a
    * 1-row staged artifact — the naive per-rule form scans the table
    * once per rule), plus one LEFT-JOIN-null count per foreign key;
    * every counter is COUNT (int64), never SUM(int), so the DuckDB
    * side stays out of hugeint. */
  val dqAudit: StagedOp = StagedOp(
    stages = Seq(
      "dq_li" -> { _ =>
        s"""SELECT COUNT(*) AS n,
           |  COUNT(CASE WHEN l_quantity > 45 THEN 1 END) AS qty_gt_45,
           |  COUNT(CASE WHEN l_discount > 0.05 THEN 1 END) AS disc_gt_5pct,
           |  COUNT(CASE WHEN l_tax < 0 OR l_tax > 0.08 THEN 1 END) AS tax_out_of_range,
           |  COUNT(CASE WHEN l_orderkey IS NULL THEN 1 END) AS null_orderkey
           |FROM lineitem""".stripMargin
      },
      "dq_ord" -> { _ =>
        s"""SELECT COUNT(*) AS n,
           |  COUNT(CASE WHEN o_totalprice <= 0 THEN 1 END) AS nonpositive_total,
           |  COUNT(CASE WHEN o_custkey IS NULL THEN 1 END) AS null_custkey
           |FROM orders""".stripMargin
      },
      "dq_ref" -> { _ =>
        s"""SELECT
           |  (SELECT COUNT(*) FROM orders o
           |   LEFT JOIN customer c ON o.o_custkey = c.c_custkey
           |   WHERE c.c_custkey IS NULL) AS orphan_orders,
           |  (SELECT COUNT(*) FROM orders) AS n_orders,
           |  (SELECT COUNT(*) FROM lineitem l
           |   LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
           |   WHERE o.o_orderkey IS NULL) AS orphan_lineitems,
           |  (SELECT COUNT(*) FROM lineitem) AS n_lineitems""".stripMargin
      }),
    body = { _ =>
      s"""SELECT 'lineitem_qty_gt_45' AS rule, qty_gt_45 AS n_violations, n AS n_checked FROM dq_li
         |UNION ALL SELECT 'lineitem_discount_gt_5pct', disc_gt_5pct, n FROM dq_li
         |UNION ALL SELECT 'lineitem_tax_out_of_range', tax_out_of_range, n FROM dq_li
         |UNION ALL SELECT 'lineitem_null_orderkey', null_orderkey, n FROM dq_li
         |UNION ALL SELECT 'orders_nonpositive_total', nonpositive_total, n FROM dq_ord
         |UNION ALL SELECT 'orders_null_custkey', null_custkey, n FROM dq_ord
         |UNION ALL SELECT 'orders_orphan_custkey', orphan_orders, n_orders FROM dq_ref
         |UNION ALL SELECT 'lineitem_orphan_orderkey', orphan_lineitems, n_lineitems FROM dq_ref""".stripMargin
    })

  /** Synchronous label-propagation communities (Raghavan et al., "Near
    * linear time algorithm to detect community structures in
    * large-scale networks", Phys. Rev. E 2007) on the minhash
    * candidate graph, three rounds: every node adopts the most
    * frequent label among its neighbors, ties to the smallest label —
    * the deterministic sync variant (the async/random classic is not
    * reproducible across engines or runs). Labels start as node ids;
    * communities after a fixed depth separate template families the
    * pairwise candidate view can't show. Each round is one stage (a
    * round reads its predecessor once, but materialization keeps the
    * plan depth flat and matches the re-plan-per-round driver shape);
    * per round: edges ⋈ labels (shuffle on src), a (node, label)
    * count aggregate, and a per-node argmax window over the few
    * distinct neighbor labels — all integer-exact with total
    * tie-break, so both engines land identical fixpoints. */
  /** Undirected edge list of the minhash candidate graph (both
    * orientations of each candidate pair) — the shared adjacency
    * artifact under label propagation and BFS landmark distances.
    * Named stage: one parquet per JVM, shared by every consumer. */
  private[ops] val lpEdgeStage: (String, Dialect => String) =
    "lp_edges" -> { (_: Dialect) =>
      s"""SELECT doc_a AS src, doc_b AS dst FROM mh_cand
         |UNION ALL
         |SELECT doc_b AS src, doc_a AS dst FROM mh_cand""".stripMargin
    }

  val labelProp: StagedOp = {
    val nRounds = 3
    val roundStages = (1 to nRounds).map { i =>
      s"lp_l$i" -> { (_: Dialect) =>
        s"""WITH cnt AS (
           |  SELECT e.dst AS id, l.lbl, COUNT(*) AS c
           |  FROM lp_edges e JOIN lp_l${i - 1} l ON e.src = l.id
           |  GROUP BY e.dst, l.lbl
           |)
           |SELECT id, lbl FROM (
           |  SELECT id, lbl,
           |    ROW_NUMBER() OVER (PARTITION BY id ORDER BY c DESC, lbl) AS rn
           |  FROM cnt
           |) WHERE rn = 1""".stripMargin
      }
    }
    StagedOp(
      stages = dedupMinhash.stages ++ Seq(
        lpEdgeStage,
        "lp_l0" -> { (_: Dialect) =>
          "SELECT DISTINCT src AS id, src AS lbl FROM lp_edges"
        }) ++ roundStages,
      body = { _ =>
        s"""SELECT lbl AS community, COUNT(*) AS n_members,
           |  MIN(id) AS min_member
           |FROM lp_l$nRounds GROUP BY lbl""".stripMargin
      })
  }

  /** Per-user ordered event paths (3-step click-stream sequences) with
    * a global top-20: the sequential-pattern profile of an event
    * stream. The path is built by two LEADs inside each user's
    * timeline — ordered by (ts, event_id) because a bare timestamp
    * order is non-deterministic under ties (the cross-engine
    * determinism rule every window here follows). One scan, one
    * user-partitioned window, one count aggregate, one bounded top-k:
    * at 100 TB the window shuffles on user_id (no global sort), and
    * the final TOP 20 is a TakeOrdered, not a full ordering. */
  def eventPaths(d: Dialect): String =
    s"""WITH seq AS (
       |  SELECT user_id, event_type AS e0,
       |    LEAD(event_type, 1) OVER w AS e1,
       |    LEAD(event_type, 2) OVER w AS e2
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       |),
       |paths AS (
       |  SELECT e0 || '>' || e1 || '>' || e2 AS path
       |  FROM seq WHERE e1 IS NOT NULL AND e2 IS NOT NULL
       |)
       |SELECT path, COUNT(*) AS cnt FROM paths GROUP BY path
       |ORDER BY cnt DESC, path LIMIT 20""".stripMargin

  /** Top talkers via a count-min-sketch candidate gate: users
    * contributing ≥ 0.08% of the event stream, the canonical CMS use
    * (frequent-flow detection over an unbounded key space). Shape at
    * 100 TB: the sketch is one O(d·w)-state mergeable aggregate over
    * the stream (map-side combined, 64 KiB regardless of user
    * cardinality), the estimate runs once per DISTINCT key, and only
    * the gated slice pays the exact count. CMS never undercounts, so
    * the gate is a lossless superset of the truly-frequent keys and
    * the integer-exact cnt·1250 ≥ N verify makes it result-invisible —
    * proved by the oracle running the ungated exact form (the
    * bloom-decontamination pattern, third sketch class after bloom
    * membership and Misra-Gries top-k). The 1/1250 share is chosen so
    * the fixture has survivors at EVERY oracle SF (15/150/104 rows at
    * sf0.001/0.01/0.1 — at sf0.1 the max user share is ~0.099%, so any
    * gate ≥ 0.1% is vacuously empty and proves nothing; the gate still
    * rejects ~93% of sf0.1 users, so the estimate→candidate→exact-
    * verify positive path is genuinely exercised). On this fixture
    * user cardinality is far below the 2048-bucket width, so collision
    * paths are exercised adversarially in ExpressionSpec with w=2. */
  def cmsTopUsers(d: Dialect): String =
    s"""WITH ev AS (SELECT user_id FROM events),
       |${d.cmsGate("cms_gated", "ev", "user_id", 1250)},
       |ex AS (SELECT user_id, COUNT(*) AS cnt FROM cms_gated GROUP BY user_id),
       |n AS (SELECT COUNT(*) AS nn FROM ev)
       |SELECT user_id, cnt FROM ex CROSS JOIN n WHERE cnt * 1250 >= nn""".stripMargin

  /** Salt-audit readout: does salting the shuffle key actually buy
    * anything on THIS data? For each audited key domain, the hottest
    * of 32 hash partitions' row share (ppm), unsalted vs salted —
    * the number a skew mitigation must move. Two domains on purpose:
    *  - `l_orderkey`: high-cardinality and uniform on this fixture,
    *    so the salt CANNOT win — kept as the uniform-key
    *    counterexample. (The pre-r11 q_join_salted demo salted this
    *    key and paid a 4× build-side explode for nothing; this row is
    *    exactly why r11 re-keyed the demo.)
    *  - `event_type` (the q_join_salted key since r11): 5 distinct
    *    values, so whole keys pin partitions at ≥ 200,000 ppm
    *    regardless of per-key balance — THE case where a salt (or AQE
    *    skew split) rescues the stage; salting ×8 spreads each key
    *    across 8 reducers.
    * The partition function is the portable md5 bucket (mod 32 — the
    * engine's shuffle-partition count), so both engines compute the
    * identical assignment; shares are exact integer ppm. One scan per
    * domain, two tiny aggregates: scale-trivial, and at 100 TB this
    * readout is exactly the pre-flight a pipeline runs before
    * choosing salt factors. An independent Scala micro-oracle checks
    * the salted-max-share contraction on a synthetic power-law key. */
  def joinSaltAudit(d: Dialect): String =
    s"""WITH le AS (
       |  SELECT CAST(l_orderkey AS STRING) AS k,
       |    CAST(l_linenumber % 4 AS STRING) AS s
       |  FROM lineitem
       |),
       |ev AS (
       |  SELECT event_type AS k, CAST(event_id % 8 AS STRING) AS s
       |  FROM events
       |),
       |u AS (
       |  SELECT 'l_orderkey' AS key_domain, 'unsalted' AS variant,
       |    ${md5Bucket("k")} % 32 AS p FROM le
       |  UNION ALL
       |  SELECT 'l_orderkey', 'salted', ${md5Bucket("k || '#' || s")} % 32 FROM le
       |  UNION ALL
       |  SELECT 'event_type', 'unsalted', ${md5Bucket("k")} % 32 FROM ev
       |  UNION ALL
       |  SELECT 'event_type', 'salted', ${md5Bucket("k || '#' || s")} % 32 FROM ev
       |),
       |pc AS (
       |  SELECT key_domain, variant, p, COUNT(*) AS c
       |  FROM u GROUP BY key_domain, variant, p
       |)
       |SELECT key_domain, variant,
       |  COUNT(*) AS n_parts_hit,
       |  ${d.idiv("CAST(MAX(c) AS BIGINT) * 1000000", "CAST(SUM(c) AS BIGINT)")} AS max_share_ppm
       |FROM pc GROUP BY key_domain, variant
       |ORDER BY key_domain, variant""".stripMargin

  /** Benford first-digit audit of order totals (Newcomb 1881 / Benford
    * 1938; the classic fraud/corruption screen for financial columns):
    * observed leading-digit counts against the Benford expectation
    * P(d) = log10(1 + 1/d), with the per-digit chi-square contribution
    * (obs − exp)²/exp. The leading digit comes from the exact integer
    * cents value via one string head — scale-invariant (×100 never
    * changes the leading digit) and engine-portable, no float log on
    * data. The expectations are baked parts-per-million integer
    * constants (math, not data), so the only floating-point the data
    * touches is the final 3-op chi-square contribution, 6dp-quantized
    * — identical IEEE sequences in both engines. One scan, one
    * 9-group aggregate: trivially scale-safe. */
  def benfordProfile(d: Dialect): String =
    s"""WITH t AS (
       |  SELECT SUBSTRING(CAST(
       |    CAST(FLOOR(o_totalprice * 1.0e2 + 5.0e-1) AS BIGINT) AS STRING),
       |    1, 1) AS digit
       |  FROM orders
       |),
       |obs AS (
       |  SELECT digit, COUNT(*) AS n_obs,
       |    CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS n,
       |    CASE digit
       |      WHEN '1' THEN 301030 WHEN '2' THEN 176091 WHEN '3' THEN 124939
       |      WHEN '4' THEN 96910 WHEN '5' THEN 79181 WHEN '6' THEN 66947
       |      WHEN '7' THEN 57992 WHEN '8' THEN 51153 ELSE 45757
       |    END AS p_ppm
       |  FROM t GROUP BY digit
       |)
       |SELECT digit, n_obs, p_ppm,
       |  ${r6("CAST(n AS DOUBLE) * p_ppm / 1.0e6")} AS n_exp,
       |  ${r6(
             "(n_obs - CAST(n AS DOUBLE) * p_ppm / 1.0e6) " +
             "* (n_obs - CAST(n AS DOUBLE) * p_ppm / 1.0e6) " +
             "/ (CAST(n AS DOUBLE) * p_ppm / 1.0e6)")} AS chi2_part
       |FROM obs""".stripMargin

  /** Quantity-weighted median line price per return flag: the smallest
    * price whose cumulative weight reaches half the group's total
    * (2·cum ≥ tot — the integer form of cum ≥ tot/2, no division).
    * Prices are exact integer cents and weights exact integer
    * quantities, so every comparison is int64 — no percentile
    * interpolation, no float boundary.
    *
    * Scale shape: the single-histogram form degenerates when the
    * price domain is near-unique (at sf0.1 the "(group, price)
    * histogram" was ~the row count, so its running-sum window sorted
    * 600k rows inside 3 partitions). This is the two-phase
    * BOUNDARY-BUCKET form (the Pareto-cutoff idea, exact): phase 1
    * aggregates to $1000 buckets — a map-side-combined groupBy whose
    * window input is ~100 rows per group — and finds each group's
    * boundary bucket (the first whose cumulative reaches half) plus
    * the cumulative weight BEFORE it; phase 2 scans only the boundary
    * bucket's rows for the exact in-bucket running sum. Global
    * cumulative at a price = cum_before(bucket) + in-bucket cum, so
    * the answer is identical to the single-pass form while every
    * window input is bounded by the bucket count or one bucket's
    * contents. */
  def weightedMedian(d: Dialect): String = {
    val bkt = d.idiv("cents", "100000")
    s"""WITH x AS (
       |  SELECT l_returnflag AS grp,
       |    CAST(FLOOR(l_extendedprice * 1.0e2 + 5.0e-1) AS BIGINT) AS cents,
       |    CAST(l_quantity AS BIGINT) AS w
       |  FROM lineitem
       |),
       |b AS (SELECT grp, $bkt AS bkt, CAST(SUM(w) AS BIGINT) AS w
       |      FROM x GROUP BY grp, $bkt),
       |cb AS (
       |  SELECT grp, bkt, w,
       |    CAST(SUM(w) OVER (PARTITION BY grp ORDER BY bkt) AS BIGINT) AS cum,
       |    CAST(SUM(w) OVER (PARTITION BY grp) AS BIGINT) AS tot
       |  FROM b
       |),
       |sel AS (
       |  SELECT grp, MIN(bkt) AS bkt,
       |    MIN(tot) AS tot, MIN(cum - w) AS cum_before
       |  FROM cb WHERE 2 * cum >= tot GROUP BY grp
       |),
       |inb AS (
       |  SELECT x.grp, x.cents, CAST(SUM(x.w) AS BIGINT) AS w,
       |    MIN(s.tot) AS tot, MIN(s.cum_before) AS cum_before
       |  FROM x JOIN sel s ON x.grp = s.grp AND $bkt = s.bkt
       |  GROUP BY x.grp, x.cents
       |),
       |c2 AS (
       |  SELECT grp, cents, tot,
       |    cum_before + CAST(SUM(w) OVER (PARTITION BY grp ORDER BY cents) AS BIGINT) AS cum
       |  FROM inb
       |)
       |SELECT grp AS l_returnflag,
       |  CAST(MIN(cents) AS BIGINT) AS wmedian_cents,
       |  CAST(MIN(tot) AS BIGINT) AS total_qty
       |FROM c2 WHERE 2 * cum >= tot GROUP BY grp""".stripMargin
  }

  /** 2-core of the minhash candidate-pair graph by depth-bounded
    * peeling (Seidman, "Network structure and minimum degree", Social
    * Networks 1983): delete degree-<2 nodes and their edges, four
    * rounds, then report each survivor's in-core degree — on the dedup
    * graph the 2-core separates densely duplicated clusters from
    * incidental pairwise collisions (chain ends peel away). Each round
    * is its OWN materialized stage, not a CTE: a round references the
    * previous round's edge set three times (degree count + both
    * endpoint filters), so CTE inlining would re-expand the whole
    * prefix chain ~3^depth times — the staged form re-reads one small
    * parquet instead, and the edge set only shrinks. That is also the
    * production shape: at 100 TB each peel round is one map-side-
    * combined degree aggregate plus two semi-join filters on a
    * monotonically shrinking edge list. Depth 4 covers this corpus's
    * fixpoint (asserted in the spec); the loop-until-convergence form
    * is [[graft.ops.Graph.kcore]], gated against this same oracle. */
  val kcoreIter: StagedOp = {
    val k = 2
    val nRounds = 4
    val roundStages = (1 to nRounds).map { i =>
      s"kc_e$i" -> { (_: Dialect) =>
        s"""WITH d AS (SELECT src, COUNT(*) AS deg FROM kc_e${i - 1} GROUP BY src),
           |a AS (SELECT src AS id FROM d WHERE deg >= $k)
           |SELECT e.src, e.dst FROM kc_e${i - 1} e
           |JOIN a x ON e.src = x.id
           |JOIN a y ON e.dst = y.id""".stripMargin
      }
    }
    StagedOp(
      stages = dedupMinhash.stages ++ Seq(
        "kc_e0" -> { (_: Dialect) =>
          s"""WITH $graphCtes,
             |alive AS (SELECT src AS id FROM deg WHERE deg >= $k)
             |SELECT e.src, e.dst FROM edges e
             |JOIN alive x ON e.src = x.id
             |JOIN alive y ON e.dst = y.id""".stripMargin
        }) ++ roundStages,
      body = { _ =>
        s"""SELECT src AS doc_id, COUNT(*) AS core_deg
           |FROM kc_e$nRounds GROUP BY src""".stripMargin
      })
  }

  /** 4-TRUSS of the minhash candidate-pair graph by depth-bounded
    * support peeling (Cohen, "Trusses: cohesive subgraphs for social
    * network analysis", NSA tech report 2008): repeatedly delete every
    * edge in fewer than k−2 = 2 triangles. Where [[kcoreIter]] peels
    * NODES by degree, the truss peels EDGES by triangle support — the
    * sharper cohesion test on a dedup graph: an isolated snapshot-twin
    * edge (a doc with no near-dup partner) and chain-shaped incidental
    * band collisions peel away, while any genuine multi-doc duplicate
    * community (whose two-snapshot image is a ≥4-clique, every edge in
    * ≥2 triangles) survives intact. Each round is its OWN materialized
    * stage (the kcore rule — a round reads its predecessor three
    * times: the edge list and both sides of the common-neighbor join;
    * CTE inlining would re-expand the prefix ~3^depth). Support is one
    * common-neighbor equi-join: edges ⋈ sym ⋈ sym grouped per edge,
    * Σ_e deg work on a monotonically shrinking edge list — the
    * standard distributed-truss round at 100 TB. Depth 3 covers this
    * corpus's fixpoint — OpsSpec peels the REAL sf0.001 candidate
    * graph to its true fixpoint independently and fails if that needs
    * more than 3 rounds (the kcore depth rule: under-iteration would
    * otherwise be identical in both engines and invisible to the
    * oracle); MicroOracleSpec additionally pins a synthetic graph and
    * a fourth-round no-op. */
  val trussIter: StagedOp = {
    val nRounds = 3
    val support = 2 // k − 2 for the 4-truss
    val roundStages = (1 to nRounds).map { i =>
      s"tt_e$i" -> { (_: Dialect) =>
        s"""WITH sym AS (
           |  SELECT src AS x, dst AS y FROM tt_e${i - 1}
           |  UNION ALL
           |  SELECT dst AS x, src AS y FROM tt_e${i - 1}
           |),
           |sup AS (
           |  SELECT e.src, e.dst, COUNT(*) AS sup
           |  FROM tt_e${i - 1} e
           |  JOIN sym s1 ON s1.x = e.src
           |  JOIN sym s2 ON s2.x = e.dst AND s2.y = s1.y
           |  GROUP BY e.src, e.dst
           |)
           |SELECT e.src, e.dst FROM tt_e${i - 1} e
           |JOIN sup s ON s.src = e.src AND s.dst = e.dst AND s.sup >= $support""".stripMargin
      }
    }
    StagedOp(
      stages = dedupMinhash.stages ++ Seq(
        "tt_e0" -> { (_: Dialect) =>
          "SELECT doc_a AS src, doc_b AS dst FROM mh_cand" }) ++ roundStages,
      body = { _ =>
        // final support recount on the surviving edge set: the peel
        // guarantees ≥ 2 only against the PREVIOUS round's edges, so
        // the reported number must be recomputed at the fixpoint
        s"""WITH sym AS (
           |  SELECT src AS x, dst AS y FROM tt_e$nRounds
           |  UNION ALL
           |  SELECT dst AS x, src AS y FROM tt_e$nRounds
           |)
           |SELECT e.src AS doc_a, e.dst AS doc_b, CAST(COUNT(*) AS BIGINT) AS support
           |FROM tt_e$nRounds e
           |JOIN sym s1 ON s1.x = e.src
           |JOIN sym s2 ON s2.x = e.dst AND s2.y = s1.y
           |GROUP BY e.src, e.dst""".stripMargin
      })
  }

  /** Item-item collaborative-filtering neighborhoods (Sarwar et al.,
    * "Item-Based Collaborative Filtering Recommendation Algorithms",
    * WWW 2001) over the same basket incidence: similarity between two
    * brands is the cosine of their basket-membership indicator
    * vectors, supp_ab / √(supp_a·supp_b), and the output is each
    * item's top-5 most-similar neighbors. Reuses the staged apriori
    * pair table — the similarity join touches only frequent-gated
    * pairs, which is exactly the neighborhood-model prune used at
    * scale (rare items have no stable neighborhood). All inputs are
    * exact int64 counts; cosine is the same 3-op IEEE sequence
    * (multiply, √, divide) in both engines, then 6dp-quantized, and
    * the top-5 window breaks cosine ties on the neighbor name, so
    * ranking is cross-engine deterministic. */
  val itemSimilarity: StagedOp = StagedOp(
    stages = basketStages,
    body = { _ =>
      s"""WITH sym AS (
         |  SELECT item_a AS item, item_b AS neighbor, supp_ab FROM ar_pairs
         |  UNION ALL
         |  SELECT item_b AS item, item_a AS neighbor, supp_ab FROM ar_pairs
         |),
         |scored AS (
         |  SELECT s.item, s.neighbor, s.supp_ab,
         |    ${r6("CAST(s.supp_ab AS DOUBLE) / SQRT(CAST(sa.supp * sb.supp AS DOUBLE))")} AS cosine
         |  FROM sym s
         |  JOIN ar_isup sa ON s.item = sa.item
         |  JOIN ar_isup sb ON s.neighbor = sb.item
         |)
         |SELECT item, neighbor, supp_ab, cosine, CAST(rk AS BIGINT) AS rk FROM (
         |  SELECT *, ROW_NUMBER() OVER (
         |    PARTITION BY item ORDER BY cosine DESC, neighbor) AS rk
         |  FROM scored
         |) WHERE rk <= 5""".stripMargin
    })

  /** TPC-H Q20's "excess availability" shape adapted to this schema
    * (the fixture has no partsupp/availqty): suppliers whose shipped
    * quantity of a name-filtered part family exceeds 1.5× that part's
    * per-supplier average — the nested-aggregate-threshold semi-join
    * an inventory planner runs to find over-concentrated supply.
    * The threshold compares each (supplier, part) aggregate against a
    * window over its part (2·qty·n_suppliers > 3·total keeps the test
    * integer-exact, no division), then the qualifying supplier set
    * joins the two dims. Shape at 100 TB: the fact collapses to
    * (supplier × part) grain map-side first, the window runs over
    * partkey on that aggregate (never raw rows), and the dim joins
    * broadcast — the only fact-sized shuffle is the first groupBy.
    * l_quantity is a whole-number double, so CAST to BIGINT is exact
    * in both engines (DuckDB rounds, Spark truncates — equal on
    * integers). */
  def excessSuppliers(d: Dialect): String =
    s"""WITH sp AS (
       |  SELECT l_suppkey AS sk, l_partkey AS pk,
       |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
       |  FROM lineitem JOIN part ON p_partkey = l_partkey
       |  WHERE p_name LIKE 'small %' OR p_name LIKE 'large %'
       |  GROUP BY l_suppkey, l_partkey
       |),
       |w AS (
       |  SELECT sk, pk, qty,
       |    CAST(SUM(qty) OVER (PARTITION BY pk) AS BIGINT) AS tot,
       |    CAST(COUNT(*) OVER (PARTITION BY pk) AS BIGINT) AS ns
       |  FROM sp
       |),
       |ex AS (SELECT sk, pk FROM w WHERE 2 * qty * ns > 3 * tot)
       |SELECT s_name, n_name, COUNT(*) AS n_excess_parts
       |FROM ex
       |JOIN supplier ON sk = s_suppkey
       |JOIN nation ON s_nationkey = n_nationkey
       |GROUP BY s_name, n_name""".stripMargin

  /** Winsorized summary of order totals: exact 5th/95th-percentile
    * boundaries and the mean after clipping to them — the robust-mean
    * readout a metrics pipeline uses against fat-tailed spend columns.
    * The k-th order statistic comes from a (cents, count) HISTOGRAM
    * with a cumulative window over the price domain (the
    * weighted-median pattern): `lo` is the smallest cents value whose
    * cumulative count reaches ⌈0.05n⌉ — stated integer-only as
    * 20·cum ≥ n (no division, no float percentile). Shape at 100 TB:
    * the histogram is one map-side-combined aggregate to price-domain
    * cardinality, the window orders the DOMAIN (never raw rows), the
    * 1-row boundary table broadcasts back for the clipped re-aggregate
    * — two fact scans, zero fact-row sorts. Clipped sum stays int64
    * (n·max_cents ≪ 2⁶³ here; DECIMAL(38) is the headroom swap at
    * extreme scale). */
  def winsorize(d: Dialect): String =
    s"""WITH c AS (
       |  SELECT CAST(FLOOR(o_totalprice * 1.0e2 + 5.0e-1) AS BIGINT) AS cents
       |  FROM orders
       |),
       |h AS (SELECT cents, COUNT(*) AS cnt FROM c GROUP BY cents),
       |cum AS (
       |  SELECT cents,
       |    CAST(SUM(cnt) OVER (ORDER BY cents
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cm,
       |    CAST(SUM(cnt) OVER () AS BIGINT) AS n
       |  FROM h
       |),
       |b AS (
       |  SELECT MIN(CASE WHEN cm * 20 >= n THEN cents END) AS lo,
       |         MIN(CASE WHEN cm * 20 >= 19 * n THEN cents END) AS hi,
       |         MAX(n) AS n
       |  FROM cum
       |)
       |SELECT b.lo AS lo_cents, b.hi AS hi_cents, b.n AS n_rows,
       |  COUNT(CASE WHEN c.cents < b.lo THEN 1 END) AS n_clip_lo,
       |  COUNT(CASE WHEN c.cents > b.hi THEN 1 END) AS n_clip_hi,
       |  ${r6("CAST(SUM(LEAST(GREATEST(c.cents, b.lo), b.hi)) AS DOUBLE) / b.n / 1.0e2")} AS win_mean
       |FROM c CROSS JOIN b
       |GROUP BY b.lo, b.hi, b.n""".stripMargin

  /** Shared 30-minute-gap session spans with the conversion flag:
    * (user, session) → event count, purchase indicator, first/last
    * event micros. Same gap logic as [[eventsSessionize]] (lag +
    * running flag sum inside each user's timeline), with event_type
    * carried through for the conversion readout. Emitted as a CTE
    * chain consumed ONCE by each caller (linear — safe under Spark
    * CTE inlining). */
  private[ops] def sessionSpanCtes(d: Dialect): String =
    s"""e AS (SELECT user_id, event_id, event_type, ${d.epochMicros("ts")} AS us FROM events),
       |lagd AS (
       |  SELECT user_id, event_id, event_type, us,
       |    LAG(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev
       |  FROM e
       |),
       |flags AS (
       |  SELECT user_id, event_id, event_type, us,
       |    CASE WHEN prev IS NULL OR us - prev > 1800000000 THEN 1 ELSE 0 END AS new_s
       |  FROM lagd
       |),
       |sess AS (
       |  SELECT user_id, event_type, us,
       |    CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY us, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no
       |  FROM flags
       |),
       |sess_per AS (
       |  SELECT user_id, session_no, COUNT(*) AS n_events,
       |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv,
       |    MIN(us) AS start_us, MAX(us) AS end_us
       |  FROM sess GROUP BY user_id, session_no
       |)""".stripMargin

  /** Session conversion by session size: sessions bucketed by
    * ⌊log2(n_events)⌋ (the exact `length(bin(n))−1` integer form both
    * engines share), conversion = the session contains a purchase —
    * the engagement-vs-conversion curve a funnel owner reads. Shape:
    * the sessionize window (one shuffle on user_id), a per-session
    * aggregate, then a ≤⌊log2 max⌋-group rollup — nothing after the
    * session grain touches raw events. */
  def sessionConversion(d: Dialect): String =
    s"""WITH ${sessionSpanCtes(d)}
       |SELECT CAST(length(bin(n_events)) - 1 AS BIGINT) AS size_bucket,
       |  COUNT(*) AS n_sessions,
       |  CAST(COUNT(CASE WHEN conv = 1 THEN 1 END) AS BIGINT) AS n_converted,
       |  ${r6("CAST(COUNT(CASE WHEN conv = 1 THEN 1 END) AS DOUBLE) / COUNT(*)")} AS conv_rate
       |FROM sess_per
       |GROUP BY length(bin(n_events)) - 1""".stripMargin

  /** Per-day peak concurrent sessions — the capacity-planning metric
    * (max simultaneous actives) computed WITHOUT a global ordered
    * sweep. Classic formulations sort every start/end event into one
    * timeline (a single-partition window at scale); this one shards
    * by day: each day's peak = (sessions already active at midnight,
    * a count) + the max of a running ±1 sweep over only that day's
    * own start/end events. A session active range is [start_us,
    * end_us] inclusive; the −1 lands at end_us+1 (and is dropped when
    * that instant falls past the session's last covered day — the
    * next day's midnight carry-in already excludes the session).
    * Start events order before end events at the same microsecond
    * (delta DESC), so touching sessions count as overlapping;
    * permuting equal (us, delta) rows cannot change any prefix sum,
    * so the peak is cross-engine deterministic. The day-span explode
    * is bounded by session length (gap-bounded sessions span few
    * days). The session-interval stage is materialized because the
    * sweep references it three times (covered days, +1s, −1s) —
    * Spark CTE inlining would re-run the sessionize pipeline per
    * reference. */
  val concurrencyPeak: StagedOp = {
    val D = "86400000000"
    StagedOp(
      stages = Seq(
        "cp_iv" -> { (d: Dialect) =>
          s"""WITH ${sessionSpanCtes(d)}
             |SELECT start_us, end_us,
             |  ${d.idiv("start_us", D)} AS sd, ${d.idiv("end_us", D)} AS ed
             |FROM sess_per""".stripMargin
        }),
      body = { d =>
        s"""WITH cov AS (
           |  ${d.explode("SELECT sd, " + d.seqArray("sd", "ed") + " AS ds FROM cp_iv",
                          "sd", "ds", "day")}
           |),
           |ci AS (
           |  SELECT day, CAST(COUNT(CASE WHEN day > sd THEN 1 END) AS BIGINT) AS base
           |  FROM cov GROUP BY day
           |),
           |ev AS (
           |  SELECT sd AS day, start_us AS us, 1 AS delta FROM cp_iv
           |  UNION ALL
           |  SELECT ed, end_us + 1, -1 FROM cp_iv
           |  WHERE ${d.idiv("end_us + 1", D)} = ed
           |),
           |swept AS (
           |  SELECT day, SUM(delta) OVER (PARTITION BY day ORDER BY us, delta DESC
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
           |  FROM ev
           |),
           |pk AS (SELECT day, CAST(MAX(run) AS BIGINT) AS mx FROM swept GROUP BY day)
           |SELECT c.day, c.base,
           |  c.base + GREATEST(COALESCE(p.mx, 0), 0) AS peak
           |FROM ci c LEFT JOIN pk p ON c.day = p.day""".stripMargin
      })
  }

  /** Exponentially weighted moving average of daily revenue with a
    * one-day half-life over an 8-day horizon — the trend smoother a
    * revenue dashboard plots, computed integer-exactly: weights are
    * powers of two (128·today + 64·yesterday + … + 1·(d−7), weight
    * sum 255), applied as 8 LAG terms over the zero-filled day spine
    * (silent days genuinely contribute 0 — the spine is the gap-fill
    * pattern), so the weighted sum is one exact int64 per day and the
    * only float is the final /255/100 display division, 6dp-quantized
    * (an identical 3-op IEEE sequence in both engines). The ordered
    * window runs over DAY-grain data (a few thousand rows from one
    * aggregate) — the same never-on-raw-facts argument as gap_fill. */
  def ewmaRevenue(d: Dialect): String = {
    val es = (x: String) => d.epochSeconds(s"CAST($x AS TIMESTAMP)")
    val wsum = (0 to 7).map { k =>
      val w = 1L << (7 - k)
      if (k == 0) s"cents * $w"
      else s"COALESCE(LAG(cents, $k) OVER (ORDER BY day), 0) * $w"
    }.mkString(" + ")
    s"""WITH daily AS (
       |  SELECT CAST(${es("o_orderdate")} / 86400 AS BIGINT) AS day,
       |    CAST(SUM(CAST(FLOOR(o_totalprice * 1.0e2 + 5.0e-1) AS BIGINT)) AS BIGINT) AS cents
       |  FROM orders GROUP BY 1
       |),
       |bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM daily),
       |spine AS (
       |  ${d.explode("SELECT lo, " + d.seqArray("lo", "hi") + " AS ds FROM bounds",
                      "lo", "ds", "day")}
       |),
       |filled AS (
       |  SELECT s.day, COALESCE(dl.cents, 0) AS cents
       |  FROM spine s LEFT JOIN daily dl ON s.day = dl.day
       |),
       |wtd AS (SELECT day, cents, CAST($wsum AS BIGINT) AS wsum FROM filled)
       |SELECT day, cents, wsum,
       |  ${r6("CAST(wsum AS DOUBLE) / 2.55e2 / 1.0e2")} AS ewma_value
       |FROM wtd""".stripMargin
  }

  /** Multi-source BFS landmark distances on the minhash candidate
    * graph: hop distance from the nearest seed (every 16th node id —
    * the deterministic landmark set), four synchronous rounds, then a
    * distance histogram. Each round relaxes dist' = min(dist,
    * min(frontier neighbor)+1) propagating ONLY from the previous
    * frontier (nodes first reached last round — with unit weights a
    * node's first-reach distance is final, so the frontier restriction
    * is lossless and keeps each round's join to frontier × adjacency).
    * Rounds are materialized stages (each references its predecessor
    * twice — carry + relax — and Spark CTE inlining would re-run the
    * whole prefix per reference; the k-core lesson). At 100 TB this is
    * the standard Pregel-as-joins shape: per round one shuffle on the
    * edge src plus a min-combine groupBy, state bounded by the node
    * set. Unreached nodes report distance −1. */
  val bfsLevels: StagedOp = {
    val nRounds = 4
    val roundStages = (1 to nRounds).map { i =>
      s"bfs_d$i" -> { (_: Dialect) =>
        s"""SELECT id, MIN(dist) AS dist FROM (
           |  SELECT id, dist FROM bfs_d${i - 1}
           |  UNION ALL
           |  SELECT e.dst AS id, l.dist + 1 AS dist
           |  FROM lp_edges e JOIN bfs_d${i - 1} l ON e.src = l.id
           |  WHERE l.dist = ${i - 1}
           |) u GROUP BY id""".stripMargin
      }
    }
    StagedOp(
      stages = dedupMinhash.stages ++ Seq(
        lpEdgeStage,
        "bfs_d0" -> { (_: Dialect) =>
          s"""SELECT id, CASE WHEN id % 16 = 0 THEN 0 END AS dist
             |FROM (SELECT DISTINCT src AS id FROM lp_edges) n""".stripMargin
        }) ++ roundStages,
      body = { _ =>
        s"""SELECT CAST(COALESCE(dist, -1) AS BIGINT) AS dist,
           |  COUNT(*) AS n_nodes
           |FROM bfs_d$nRounds GROUP BY COALESCE(dist, -1)""".stripMargin
      })
  }

  /** Min-K%-prob memorization/contamination signal (Shi et al. 2023,
    * "Detecting Pretraining Data"): per document, the mean surprisal
    * of its k% LEAST-probable tokens — a doc whose rarest tokens are
    * still corpus-common is template/duplicate-suspect (the signal
    * that catches members a whole-doc mean would wash out). Unigram
    * approximation over the staged tf index: per-(doc, distinct
    * token) µ-bit surprisal ([[qlog2]]), rank per doc by surprisal
    * DESCENDING (token string as the total tie-break), keep
    * r ≤ ⌈m/5⌉ (k = 20%; the test is the exact integer 5r ≤ m+4),
    * mean as one exact idiv. Scale shape: the rank is a per-doc
    * window over (doc, distinct token) rows — the tf index's own
    * grain — and the global counts ride the same token-partitioned
    * window the tf-idf family uses. */
  val minkProb: StagedOp = StagedOp(
    stages = textUnigramLm.stages,
    body = { d =>
      s"""WITH c AS (
         |  SELECT doc_id, s, tf,
         |    CAST(SUM(tf) OVER (PARTITION BY s) AS BIGINT) AS cg
         |  FROM ulm_tf
         |),
         |n AS (SELECT CAST(SUM(tf) AS BIGINT) AS nn FROM ulm_tf),
         |sp AS (
         |  SELECT doc_id, s, ${qlog2("nn")} - ${qlog2("cg")} AS q
         |  FROM c CROSS JOIN n
         |),
         |rk AS (
         |  SELECT doc_id, q,
         |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY q DESC, s) AS r,
         |    CAST(COUNT(*) OVER (PARTITION BY doc_id) AS BIGINT) AS m
         |  FROM sp
         |)
         |SELECT doc_id,
         |  CAST(MAX(m) AS BIGINT) AS n_distinct,
         |  CAST(COUNT(*) AS BIGINT) AS k_used,
         |  ${r6(s"CAST(${d.idiv("CAST(SUM(q) AS BIGINT)", "COUNT(*)")} AS DOUBLE) / 1.0e6")}
         |    AS mink_bits
         |FROM rk WHERE 5 * r <= m + 4
         |GROUP BY doc_id""".stripMargin
    })

  /** Curriculum data ordering — [[shuffleShards]]' difficulty-ordered
    * complement: a curriculum trainer reads easy documents first, so
    * every doc gets a difficulty (mean unigram surprisal in µ-bits —
    * the [[qlog2]] quantizer, NOT [[textUnigramLm]]'s floor-log2
    * bits: on this corpus the 1-bit granularity collapses 95% of
    * docs onto one value and the quartiles degenerate to an
    * empty-middle two-phase split, the CCNet-terciles lesson), a
    * curriculum PHASE (difficulty quartile), and a deterministic
    * shard within its phase (md5 ring — reproducible across re-runs
    * and engines, the shuffleShards rule). Phases come from THREE
    * percentile scalars
    * riding a one-row broadcast cross join — boundaries-then-bucket,
    * never an ntile global sort (the ordersRfm shape); interpolated
    * midpoints of int64 µ-values are exact doubles, so the bucket
    * comparisons are engine-portable. At 100 TB the exact percentile
    * pass is the one shuffle — swap in approx_percentile and the rest
    * of the plan is unchanged. Output: the (phase, shard) manifest
    * with doc/token counts and the difficulty envelope per cell. */
  val curriculumOrder: StagedOp = StagedOp(
    stages = textUnigramLm.stages :+ ("cur_d" -> { (d: Dialect) =>
      // per-token µ-bit surprisal summed tf-weighted in int64, one
      // exact idiv to the per-doc mean (operands nonnegative: c ≤ nn)
      s"""WITH c AS (SELECT doc_id, tf,
         |    CAST(SUM(tf) OVER (PARTITION BY s) AS BIGINT) AS c FROM ulm_tf),
         |n AS (SELECT CAST(SUM(tf) AS BIGINT) AS nn FROM ulm_tf)
         |SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
         |  ${d.idiv(s"CAST(SUM(tf * (${qlog2("nn")} - ${qlog2("c")})) AS BIGINT)",
                      "CAST(SUM(tf) AS BIGINT)")} AS diff_q
         |FROM c CROSS JOIN n GROUP BY doc_id""".stripMargin
    }),
    body = { d =>
      s"""WITH b AS (
         |  SELECT ${d.percentileCont("diff_q", "0.25")} AS q1,
         |         ${d.percentileCont("diff_q", "0.5")} AS q2,
         |         ${d.percentileCont("diff_q", "0.75")} AS q3
         |  FROM cur_d
         |),
         |ph AS (
         |  SELECT doc_id, n_tokens, diff_q,
         |    CASE WHEN diff_q <= b.q1 THEN 1
         |         WHEN diff_q <= b.q2 THEN 2
         |         WHEN diff_q <= b.q3 THEN 3
         |         ELSE 4 END AS phase,
         |    ${md5Bucket("CAST(doc_id AS STRING) || ':curriculum'")} % 8 AS shard
         |  FROM cur_d CROSS JOIN b
         |)
         |SELECT phase, shard,
         |  CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
         |  ${r6("CAST(MIN(diff_q) AS DOUBLE) / 1.0e6")} AS d_lo,
         |  ${r6("CAST(MAX(diff_q) AS DOUBLE) / 1.0e6")} AS d_hi
         |FROM ph GROUP BY phase, shard""".stripMargin
    })

  /** Deterministic training-order shuffle: every document is assigned
    * a shard (md5 ring, 32 shards) and a position within it (ordered
    * by the full content-independent md5 of its id — the
    * reproducible "random" permutation a training pipeline needs so
    * every re-run, resumption, and engine reads the same order), then
    * each shard reports its size, head document, and an
    * order-sensitive checksum (Σ (id mod p)·(pos mod p) mod p in
    * DECIMAL — overflow-free at any corpus size) that any consumer
    * can re-verify cheaply. Shape at 100 TB: the permutation is a
    * per-shard window (32-way shuffle, no global sort), the report is
    * a 32-row aggregate. */
  def shuffleShards(d: Dialect): String = {
    val h = "md5(CAST(doc_id AS STRING) || ':shuffle')"
    val P = "1000000007"
    s"""WITH a AS (
       |  SELECT doc_id, $h AS h, ${md5Bucket(s"CAST(doc_id AS STRING) || ':shuffle'")} % 32 AS shard
       |  FROM documents
       |),
       |p AS (
       |  SELECT doc_id, shard,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h, doc_id) AS BIGINT) AS pos
       |  FROM a
       |)
       |SELECT CAST(shard AS BIGINT) AS shard, COUNT(*) AS n_docs,
       |  CAST(MIN(CASE WHEN pos = 1 THEN doc_id END) AS BIGINT) AS head_doc,
       |  CAST(CAST(SUM(CAST((doc_id % $P) * (pos % $P) AS DECIMAL(38,0))) AS DECIMAL(38,0)) % $P AS BIGINT) AS checksum
       |FROM p GROUP BY shard""".stripMargin
  }

  /** Leave-one-out SOURCE VALUATION — the data-valuation table behind
    * "which source, if dropped, most lifts the corpus": per source,
    * the corpus mean quality and PER-DOC gate pass rate recomputed
    * WITHOUT that source, from one scoring pass and additive group
    * sums — leave-one-out over an additive metric is subtraction, so
    * the full LOO table costs one [[graft.ops.SqlOpsText.scoredCtes]]
    * pass plus a source-cardinality aggregate, never |sources|
    * re-scores. The gate here is deliberately the PER-DOC predicate
    * (lang ≠ 'und' AND quality ≥ 0.4) without [[SurvivorGate]]'s rn
    * term: the exact-dedup rank is a cross-corpus group property that
    * does not decompose additively by source, and the single-snapshot
    * `documents` table has no exact dups (the dataset card's
    * exact_dup_groups row is its proof), so per-doc == gate here
    * while staying decomposable everywhere. All integer-exact:
    * µ-quantized quality sums, ppm/µ readouts via integer division;
    * LOO columns NULL for a source owning the whole corpus. */
  def sourceLoo(d: Dialect): String =
    s"""WITH ${scoredCtes(d, "documents")},
       |sq AS (
       |  SELECT s.doc_id, dd.source, ${qvExpr("s.quality")} AS q,
       |    CASE WHEN s.lang_guess <> 'und' AND s.quality >= 4.0e-1
       |         THEN 1 ELSE 0 END AS pass,
       |    CAST(${d.size("s.toks")} AS BIGINT) AS ntok
       |  FROM scored s JOIN documents dd ON dd.doc_id = s.doc_id
       |),
       |tot AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(q) AS BIGINT) AS t,
       |    CAST(SUM(pass) AS BIGINT) AS p, CAST(SUM(ntok) AS BIGINT) AS tk
       |  FROM sq
       |),
       |bys AS (
       |  SELECT source, CAST(COUNT(*) AS BIGINT) AS ns,
       |    CAST(SUM(q) AS BIGINT) AS ts, CAST(SUM(pass) AS BIGINT) AS ps,
       |    CAST(SUM(ntok) AS BIGINT) AS tks
       |  FROM sq GROUP BY source
       |)
       |SELECT b.source, b.ns AS n_docs,
       |  ${d.idiv("1000000 * b.tks", "t.tk")} AS token_share_ppm,
       |  ${d.idiv("t.t", "t.n")} AS mean_quality_mu,
       |  CASE WHEN t.n = b.ns THEN NULL
       |       ELSE ${d.idiv("t.t - b.ts", "t.n - b.ns")} END AS loo_mean_quality_mu,
       |  CASE WHEN t.n = b.ns THEN NULL
       |       ELSE ${d.idiv("t.t - b.ts", "t.n - b.ns")} - ${d.idiv("t.t", "t.n")}
       |  END AS loo_quality_delta_mu,
       |  CASE WHEN t.n = b.ns THEN NULL
       |       ELSE ${d.idiv("1000000 * (t.p - b.ps)", "t.n - b.ns")}
       |  END AS loo_pass_ppm
       |FROM bys b CROSS JOIN tot t""".stripMargin

}
