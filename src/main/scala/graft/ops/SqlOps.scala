package graft.ops

/** LLM-training-data pipeline operators (dedup, similarity search,
  * text analysis, event-time analytics, multimodal plumbing), written
  * once against [[Dialect]] and rendered to both Spark SQL and the
  * DuckDB oracle.
  *
  * Scale design notes (these run on ~100 TB in production):
  *  - Exact dedup = hash-groupBy on a content digest: one shuffle on
  *    md5(text), map-side partial agg.
  *  - MinHash LSH = per-doc signature (narrow, codegen'd) → band keys →
  *    self-join on (band, key). Candidate pairs are bounded by band
  *    collisions, never O(n²); this is the scale path for near-dup.
  *  - N-gram jaccard = inverted-index join on shingles, exact verify.
  *    Quadratic in the worst case — used for verification at small
  *    scale, while minhash bands gate candidates at full scale.
  *  - SimHash = 16-bit bit-majority digest; near-dup candidates via
  *    nibble bands (hamming ≤ 3 verify) — constant state per doc.
  *  - ANN = sign-LSH buckets over the first 8 dims (2^8 buckets),
  *    cosine only within bucket; brute-force top-k is the correctness
  *    baseline, restricted to a bounded query set.
  *
  * The "two crawl snapshots" corpus (documents ∪ shifted copy) gives
  * every dedup operator guaranteed true-positive duplicates in the
  * synthetic word-soup fixture.
  */
/** An operator whose expensive intermediate is materialized once.
  *
  * Spark inlines SQL CTEs, so a self-joined CTE re-computes its whole
  * subtree per reference (the n-gram index was being rebuilt 6× in one
  * plan). Each stage here becomes a persisted temp view on the Spark
  * side (exactly what a production pipeline does with a shingle index
  * before a self-join — materialize, then join) and stays a plain CTE
  * on the DuckDB side (which materializes CTEs natively).
  */
case class StagedOp(stages: Seq[(String, Dialect => String)], body: Dialect => String) {
  /** Single-statement rendering (the oracle): stages as outer CTEs, the
    * body (which may open its own WITH) nested as a derived table. */
  def single(d: Dialect): String = {
    val withs = stages
      .map { case (n, b) => s"$n AS ${d.cteMaterialize}(\n${b(d)}\n)" }
      .mkString(",\n")
    s"WITH $withs\nSELECT * FROM (\n${body(d)}\n)"
  }
}

/** EWMA+MAD anomaly-gate parameters, single-sourced for the batch
  * monitor ([[SqlOps.ewmaForecast]]/[[SqlOps.anomalyEwma]]) and the
  * streaming admission gate (graft.streaming.StreamingOps
  * .ewmaAdmissionGate) — the same formula runs as two dataflows
  * (SQL over orders, DataFrame over the ingest volume history), and a
  * drifted α / lookback / threshold between the two copies would make
  * the streaming gate silently disagree with the batch monitor it
  * mirrors. Exact decimals so the batch side's integer weight table
  * (round(α·(1−α)^k·10¹²)) is reproducible to the last digit. */
object EwmaParams {
  val Alpha: BigDecimal = BigDecimal("0.3")
  /** Rows 0..Lookback of the weight table — 61 lag terms. */
  val Lookback: Int = 60
  /** Flag when |residual − median| > Sigmas robust sigmas. */
  val Sigmas: Int = 3
  /** MAD→σ under normality: 1/Φ⁻¹(3/4). */
  val MadToSigma: BigDecimal = BigDecimal("1.4826")
  /** A perfectly regular feed has MAD = 0 and must not flag every
    * row — floor the scale at one unit. */
  val MadFloor: BigDecimal = BigDecimal("1.0")
  /** The SQL threshold expression over a column named `mad` (double
    * scientific literals so both engines type it DOUBLE). */
  def thresholdSql: String =
    s"$Sigmas.0e0 * ${MadToSigma}e0 * GREATEST(mad, ${MadFloor}e0)"
  /** The same threshold factor for the DataFrame side — the runtime
    * double product matches the SQL side's (correctly-rounded IEEE
    * multiply in both). */
  def thresholdFactor: Double = Sigmas.toDouble * MadToSigma.toDouble
}


/** The engine's SQL-operator façade — every operator keeps its
  * pre-split name (`SqlOps.foo`); the bodies live in the domain
  * traits composed by [[SqlOpsAll]]. */
object SqlOps extends SqlOpsAll

/** Composition of the domain modules. The extends order IS the
  * pre-split single-file declaration order: trait linearization
  * initializes vals left-to-right, so splitting changed nothing
  * about which StagedOp vals exist when a later val's initializer
  * runs (the forward-reference rule — any val reading a
  * later-declared one must be lazy — carries over verbatim). */
trait SqlOpsAll
  extends SqlOpsCore
  with SqlOpsDedup
  with SqlOpsTokenEval
  with SqlOpsAnn
  with SqlOpsText
  with SqlOpsEvents
  with SqlOpsMultimodal
  with SqlOpsSampling
  with SqlOpsCuration

/** Shared core: the single-copy quantizers (µ-value, µ-log2, r6),
  * the md5 bucket key, and the two-snapshot corpus CTE every dedup
  * operator builds on. */
trait SqlOpsCore { this: SqlOpsAll =>

  private[ops] val STOP_EN = Seq("the", "and", "of", "to", "in", "is", "a")
  private[ops] val STOP_ID = Seq("yang", "dan", "di", "ke", "itu", "untuk")

  /** Half-up rounding to 6dp as pure IEEE ops (⌊x·1e6+½⌋/1e6): the
    * cross-engine-stable comparator quantizer. SQL ROUND on doubles
    * goes through BigDecimal in Spark (slow on hot self-join paths)
    * and can disagree with other engines on boundary-adjacent doubles
    * — the parity rule learned on the corr sums. */
  private[ops] def r6(x: String): String = s"FLOOR(($x) * 1.0e6 + 5.0e-1) / 1.0e6"

  /** µ-quantized log2 as int64 — THE one copy of the quantized-log
    * arithmetic ([[zipfFit]]'s regression inputs, [[dsirWeights]]'
    * bucket scores), shared wherever a log-ratio must survive exact
    * cross-engine summation (floor-log2 bits are exactly portable but
    * only 1-bit-granular; this keeps 6 decimal digits). */
  private[ops] def qlog2(x: String): String =
    s"CAST(FLOOR(log2(CAST($x AS DOUBLE)) * 1.0e6 + 5.0e-1) AS BIGINT)"

  /** µ-quantized value as int64 (half-up at 6 decimals) — THE one copy
    * of the quantization every exact-integer distance/centroid op in
    * the similarity family builds on; a rounding change here must not
    * be forkable per-op. */
  private[ops] def qvExpr(v: String): String =
    s"CAST(FLOOR(CAST($v AS DOUBLE) * 1.0e6 + 5.0e-1) AS BIGINT)"

  /** First byte of md5(col) as an integer 0-255 — the deterministic,
    * engine-portable bucket key behind [[sampleHash]] and the sampled
    * LSH-eval truth side (hex-digit arithmetic; no engine-specific
    * hash or RNG involved). */
  def md5Bucket(col: String): String =
    // self-parenthesized: callers compose this with tighter-binding
    // operators (`% 8` in packSequences bound only the second addend
    // before the outer parens, silently yielding ~128 shard values —
    // identically in both dialects, so the oracle gate can't see it)
    // public (not private): the salt-audit micro-oracle composes the
    // same bucket SQL over its synthetic table
    s"""((instr('0123456789abcdef', substr(md5($col), 1, 1)) - 1) * 16
       |    + (instr('0123456789abcdef', substr(md5($col), 2, 1)) - 1))""".stripMargin

  /** First 8 hex digits of md5(col) as a 32-bit nonnegative int64 —
    * the ring-position hash behind [[shardRebalance]]'s consistent
    * ring ([[md5Bucket]]'s one byte collides far too often to place
    * ring positions). Same engine-portable hex-digit arithmetic, no
    * engine-specific hash or RNG; every term is BIGINT from the first
    * digit so the 2³² magnitudes never touch int32. */
  private[ops] def md5Hex32(col: String): String = {
    val terms = (1 to 8).map { k =>
      val digit = s"(CAST(instr('0123456789abcdef', substr(md5($col), $k, 1)) AS BIGINT) - 1)"
      val shift = (8 - k) * 4
      if (shift == 0) digit else s"$digit * ${1L << shift}"
    }
    s"(${terms.mkString("\n      + ")})"
  }

  private[ops] def toks(d: Dialect): String = d.split("text", " ")

  /** A literal DOMAIN relation as one inline VALUES table (the r14
    * EWMA weight-table rule, generalized): `SELECT 0 AS k UNION ALL
    * SELECT 1 …` parses to one Project+OneRowRelation pair per row
    * plus a Union spine — ~2 plan nodes per domain row analyzed on
    * EVERY run — while VALUES is a single LocalRelation in Spark and
    * a single VALUES node in DuckDB. Rows are rendered verbatim
    * (`Seq("0", "CAST(12 AS BIGINT)")`-style entries keep their
    * types), one parenthesized tuple per row. Dialect-invariant. */
  private[ops] def domainRel(cols: String, rows: Seq[String]): String =
    s"SELECT * FROM (VALUES ${rows.map(r => s"($r)").mkString(", ")}) __dom($cols)"

  /** Two "crawl snapshots": every doc appears twice under different ids
    * → guaranteed duplicate pairs for the dedup operators. Snapshot ids
    * are doc_id·2 / doc_id·2+1 — disjoint BY CONSTRUCTION for any
    * corpus size (an additive shift like +1e6 silently aliases distinct
    * documents once the table reaches the shift, corrupting every
    * cluster built on the corpus while the shared-CTE oracle stays
    * green). `extraCols` carries additional projected columns (e.g.
    * `source` for the blocked edit-distance op) so no caller forks its
    * own copy of the snapshot definition. */
  def corpusCte(d: Dialect, extraCols: String = ""): String = {
    val extra = if (extraCols.isEmpty) "" else s", $extraCols"
    s"""corpus AS (
       |  SELECT doc_id * 2 AS doc_id, text$extra FROM documents
       |  UNION ALL
       |  SELECT doc_id * 2 + 1 AS doc_id, text$extra FROM documents
       |)""".stripMargin
  }

}
