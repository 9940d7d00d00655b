package graft.ops

/** Dual-dialect SQL fragment generation.
  *
  * The dedup / similarity / text-analysis operators are verified by the
  * driver against DuckDB (BASELINE.json). Their logic (minhash
  * signatures, simhash bit-majorities, jaccard over shingles, cosine)
  * is identical on both sides but the engines name their collection
  * functions differently (`split` vs `string_split`, `aggregate` vs
  * `list_sum`, …) and differ in regex/string-literal escaping. Rather
  * than maintaining two hand-written copies that drift, each operator
  * is written ONCE against this tiny dialect trait and rendered to
  * both Spark SQL (executed through `spark.sql` → Catalyst, identical
  * plans to the DataFrame API) and DuckDB SQL (the oracle).
  *
  * Only functions whose spelling differs are abstracted; everything
  * portable (md5, substr, instr, floor, round, least, CASE, TRY_CAST,
  * ||, window functions) is written inline.
  */
trait Dialect {
  def name: String
  /** CTE materialization hint for [[graft.ops.StagedOp]] stage
    * renderings ("MATERIALIZED " in DuckDB, unsupported → "" in Spark
    * SQL). Staged subtrees are consumed multiple times by design;
    * without the hint DuckDB INLINES each reference, and a stage chain
    * whose rounds reference their predecessor 3× expands ~3^depth
    * copies of the whole prefix (the k-core oracle never finished).
    * Materialization also mirrors what the Spark side actually does
    * with stages (parquet artifacts). */
  def cteMaterialize: String = ""
  /** String literal containing regex backslashes: Spark SQL literals
    * process backslash escapes, DuckDB's do not. */
  def relit(raw: String): String
  def split(x: String, sep: String): String
  def size(l: String): String
  /** 1-based array element access. */
  def elem(l: String, i: String): String
  def filter(l: String, lambda: String): String
  /** Element-wise map over an array with a `x -> expr` lambda. */
  def transform(l: String, lambda: String): String
  /** Maximum element of a (non-empty) array. */
  def arrayMax(l: String): String
  /** Length-based 1-indexed sub-array: `len` elements starting at
    * 1-based `from1`, clamped to the array end (both engines clamp;
    * a start past the end yields an empty array). */
  def arraySlice(l: String, from1: String, len: String): String
  def arrayDistinct(l: String): String
  def arraySort(l: String): String
  def arrayJoin(l: String, sep: String): String
  def arrayContains(l: String, x: String): String
  /** Array literal of string elements. */
  def arrayLit(items: Seq[String]): String
  /** Count of regex matches (whole-match, group 0). */
  def reCount(x: String, rawRegex: String): String
  /** Array of ALL whole-match (group 0) regex matches — the
    * extraction sibling of [[reCount]]; both engines name the
    * function regexp_extract_all and take the group index. */
  def reExtractAll(x: String, rawRegex: String): String
  /** regexp_replace over ALL matches with capture-group backrefs:
    * `repl` uses `$1` syntax and is rendered per engine (Spark `$1`
    * natively replaces all matches; DuckDB needs `\1` and the 'g'
    * flag — without it only the FIRST match is replaced). */
  def reReplaceAll(x: String, rawRegex: String, repl: String): String
  /** ORDER-DETERMINISTIC string aggregation: join `value` rows by
    * `sep` in ascending `order` order. DuckDB has ordered string_agg
    * natively; Spark collects (order, value) structs and sorts the
    * array (collect_list order is partition-dependent — never join
    * unsorted). */
  def stringAggOrdered(value: String, order: String, sep: String): String
  def bitXor(a: String, b: String): String
  /** Integer (floor) division — for the NONNEGATIVE operands the
    * callers use, where Spark `DIV` and DuckDB `//` agree. */
  def idiv(a: String, b: String): String
  /** Approximate percentile sketch — Spark's percentile_approx
    * (Greenwald-Khanna at accuracy 10000) vs DuckDB's approx_quantile
    * (t-digest). The two SKETCHES differ, so only a boolean
    * |approx − exact| ≤ bound contract may cross the oracle
    * comparator (the approx_count_distinct rule); `p` is a fraction
    * literal like `0.5`. */
  def approxPercentile(col: String, p: String): String
  /** Inclusive integer sequence [lo..hi] as an array value (hi < lo →
    * empty array in both engines). */
  def seqArray(lo: String, hi: String): String
  /** Explode `arrCol` of `fromSql` into one row per element. */
  def explode(fromSql: String, keyCol: String, arrCol: String, alias: String): String
  /** Explode with 0-based element position. */
  def explodeWithPos(fromSql: String, keyCol: String, arrCol: String,
                     posAlias: String, elemAlias: String): String
  def epochSeconds(ts: String): String
  def epochMicros(ts: String): String
  def toBinary(x: String): String
  /** Float-vector dot product, widened to double, summed in element
    * order (both renderings produce bit-identical IEEE doubles). */
  def dot(a: String, b: String): String
  /** Exact interpolated percentile of a numeric column. */
  def percentileCont(x: String, p: String): String
  /** Aggregate values into a sorted, comma-joined STRING — the
    * hash-comparable rendering of a collected list (scalar output so
    * downstream comparators never see an array cell). Sorting happens
    * on the native type, joining after, so numeric order is kept. */
  def arrayAggSortedStr(x: String): String
  /** CTE body producing (doc_id, s) word n-gram rows from `from`
    * (which has doc_id + text). Each engine declares its fast path:
    * Spark explodes the native codegen'd word_shingles expression;
    * DuckDB uses the relational posexplode + LEAD-window form. The
    * oracle gate is what proves the two renderings identical. */
  def shingleRows(from: String, n: Int): String
  /** Like [[shingleRows]] but position-aware: CTE chain ending in
    * `shp(doc_id, pos, s)` where `pos` is the 0-based token position
    * of the window start. Spark posexplodes the codegen'd
    * word_shingles array (array index = start position); DuckDB keeps
    * the LEAD-window form's own token position — the oracle gate
    * proves the two identical. */
  def shingleRowsPos(from: String, n: Int): String
  /** Identity used for a shingle downstream (joins/df caps/counts).
    * Spark fingerprints to a 64-bit hash (Broder-style: identical
    * counts w.h.p., ~4× smaller index and a fixed-width join key);
    * DuckDB keeps the string, proving count-equivalence every run. */
  def shingleId(s: String): String
  /** Aggregate a column's group values into a SORTED array (native
    * type, deterministic order — the array twin of
    * [[arrayAggSortedStr]], for joins that consume the set itself
    * rather than a hash-comparable rendering). */
  def arrayAggSorted(x: String): String
  /** |a ∩ b| for two array columns, distinct-element semantics (both
    * engines dedup the intersection). Exact when the inputs are
    * already distinct-element arrays — the pfx_arr contract. */
  def arrayIntersectSize(a: String, b: String): String
  /** Hamming distance between two 64-char '0'/'1' bit-string columns
    * (the aHash signature encoding — packed int64 would overflow at
    * bit 63, so hashes travel as strings). Each engine popcounts
    * natively instead of exploding 64 positions per pair: Spark xors
    * two 32-bit halves (conv(...,2,10) of a 32-char half is < 2³²,
    * exactly representable in BIGINT) and sums the codegen'd
    * bit_counts; DuckDB casts the whole string to BIT and popcounts
    * one 64-bit xor. Integer-exact in both; the oracle gate proves
    * the two renderings identical on every run. */
  def hamming64(pa: String, pb: String): String
  /** Full IVF-assignment stage SQL: given `centCtes` (CTEs ending in
    * `cent(label, pos, qc)`, the µ-quantized centroid components) and
    * the `emb_nv`/`embeddings` views, produce
    * `(vec_id, embedding, nrm, cell)` — each vector tagged with its
    * nearest centroid by exact int64 L2 over quantized components,
    * ties to the smallest label. Spark's fast path packs the
    * broadcast-sized centroid table into one array value (1-row cross
    * join = broadcast nested-loop) and runs the codegen'd
    * graft_nearest_centroid argmin — assignment is a narrow projection
    * with ZERO shuffle of the vectors. DuckDB keeps the relational
    * posexplode + per-(vector,label) distance groupBy form; the oracle
    * gate proves the two identical. */
  def ivfAssign(centCtes: String): String
  /** Product-quantization code assignment: given a view/CTE
    * `pq_cent(label, pos, qc)` (µ-quantized per-label component means —
    * the shared codebook source) and the `embeddings` view, produce
    * `(vec_id, code0..code{m-1})` where code_b is the label whose
    * block-b slice is nearest (exact int64 L2 over µ-quantized
    * components, ties to the smallest label) to the vector's block-b
    * slice. `m` blocks of `bs` dims; vectors of any other
    * dimensionality are excluded in BOTH renderings. Spark packs the
    * codebook once (1-row cross join = broadcast) and evaluates m
    * codegen'd graft_nearest_centroid argmins over array slices — a
    * narrow projection, zero shuffle of the vectors; DuckDB renders
    * the relational explode + per-(vector, block, label) distance
    * groupBy. The oracle gate proves the two identical. */
  def pqAssign(m: Int, bs: Int): String
  /** CTE(s) defining `out` = the rows of `items` whose `col` MIGHT be
    * in `set`'s `col` values. Spark's fast path folds `set` into one
    * bloom-filter value (bloom_filter_agg — the runtime-filter sketch)
    * and prefilters with might_contain, so a following exact join
    * shuffles only probable hits; false positives must be removed by
    * that exact join (the gate is result-invisible). DuckDB renders
    * the identity (no prefilter) — the oracle gate is what proves
    * result-invisibility. */
  def bloomPrefilter(out: String, items: String, set: String, col: String): String
  /** Heavy-hitter candidate gate: CTE `out` = the rows of `items`
    * whose int64 `col` is in the Misra-Gries k-slot summary of
    * `items` itself. Any key with share > 1/(k+1) is guaranteed
    * retained, so with a query threshold above that the gate is
    * result-invisible; DuckDB renders the ungated pass-through and the
    * oracle equality is the proof (the bloom-prefilter pattern). */
  def heavyHitterGate(out: String, items: String, col: String, k: Int): String
  /** Count-min-sketch share gate: keep rows of `items` whose int64
    * `col` has estimated frequency · share ≥ total rows. est ≥ exact
    * always (CMS only overcounts), so the gated set is a superset of
    * the truly-≥-1/share keys — result-invisible before an exact
    * count+HAVING, which the DuckDB side proves by running ungated. */
  def cmsGate(out: String, items: String, col: String, share: Int): String
  /** CTE chain ending in `sim(doc_id, simhash)`: the 32-bit SimHash
    * digest over token rows CTE `tok(doc_id, t)`. Spark folds the
    * whole digest into one custom imperative aggregate
    * (graft.functions.SimHashAgg); DuckDB renders the relational form
    * (hex-parse token hash, 32 SUM(CASE) bit votes, reassemble) —
    * identical values: v < 2³² so floor(v/2^k) ≡ v >> k exactly, and
    * ties set the bit in both forms. */
  def simhashDigestCtes: String
}

object SparkDialect extends Dialect {
  val name = "spark"
  // '' is the portable in-literal escape for a single quote (both
  // engines accept it) — without it a quoted input like "don't"
  // renders broken SQL
  private def q(s: String): String = s.replace("'", "''")
  def relit(raw: String): String = "'" + q(raw.replace("\\", "\\\\")) + "'"
  def split(x: String, sep: String): String = s"split($x, '${q(sep)}')"
  def size(l: String): String = s"size($l)"
  def elem(l: String, i: String): String = s"element_at($l, $i)"
  def filter(l: String, lambda: String): String = s"filter($l, $lambda)"
  def transform(l: String, lambda: String): String = s"transform($l, $lambda)"
  def arrayMax(l: String): String = s"array_max($l)"
  def arraySlice(l: String, from1: String, len: String): String =
    s"slice($l, $from1, $len)"
  def arrayDistinct(l: String): String = s"array_distinct($l)"
  def arraySort(l: String): String = s"array_sort($l)"
  def arrayJoin(l: String, sep: String): String = s"array_join($l, '${q(sep)}')"
  def arrayContains(l: String, x: String): String = s"array_contains($l, $x)"
  def arrayLit(items: Seq[String]): String =
    items.map(i => s"'${q(i)}'").mkString("array(", ", ", ")")
  def reCount(x: String, rawRegex: String): String =
    s"size(regexp_extract_all($x, ${relit(rawRegex)}, 0))"
  def reExtractAll(x: String, rawRegex: String): String =
    s"regexp_extract_all($x, ${relit(rawRegex)}, 0)"
  def reReplaceAll(x: String, rawRegex: String, repl: String): String =
    s"regexp_replace($x, ${relit(rawRegex)}, '${q(repl)}')"
  def stringAggOrdered(value: String, order: String, sep: String): String =
    s"concat_ws('${q(sep)}', transform(array_sort(" +
      s"collect_list(struct($order AS o, $value AS v))), s -> s.v))"
  def bitXor(a: String, b: String): String = s"($a ^ $b)"
  def idiv(a: String, b: String): String = s"(($a) DIV ($b))"
  def approxPercentile(col: String, p: String): String =
    s"percentile_approx($col, $p, 10000)"
  // bare sequence(lo, hi) with hi < lo defaults to step -1 and returns
  // a DESCENDING array where DuckDB's generate_series returns [] — the
  // CASE guard makes the trait's empty-on-inverted contract actually
  // hold (a zero-weight source in mixEpochs would otherwise emit
  // phantom copies on the Spark side only)
  def seqArray(lo: String, hi: String): String =
    s"CASE WHEN ($hi) >= ($lo) THEN sequence($lo, $hi) ELSE array() END"
  def explode(fromSql: String, keyCol: String, arrCol: String, alias: String): String =
    s"SELECT $keyCol, $alias FROM ($fromSql) LATERAL VIEW explode($arrCol) _t AS $alias"
  def explodeWithPos(fromSql: String, keyCol: String, arrCol: String,
                     posAlias: String, elemAlias: String): String =
    s"SELECT $keyCol, $posAlias, $elemAlias FROM ($fromSql) " +
      s"LATERAL VIEW posexplode($arrCol) _t AS $posAlias, $elemAlias"
  def epochSeconds(ts: String): String = s"unix_seconds($ts)"
  def epochMicros(ts: String): String = s"unix_micros($ts)"
  def toBinary(x: String): String = s"CAST($x AS BINARY)"
  /** Native codegen'd expression (graft.functions.DotProduct); the
    * HOF form evaluates interpreted per element. */
  def dot(a: String, b: String): String = s"graft_dot($a, $b)"
  def percentileCont(x: String, p: String): String = s"percentile($x, $p)"
  def arrayAggSortedStr(x: String): String =
    s"array_join(transform(sort_array(collect_list($x)), v -> CAST(v AS STRING)), ',')"
  def shingleRows(from: String, n: Int): String =
    s"""sh AS (
       |  SELECT doc_id, s FROM $from
       |  LATERAL VIEW explode(word_shingles(text, $n)) _t AS s
       |)""".stripMargin
  def shingleRowsPos(from: String, n: Int): String =
    s"""shp AS (
       |  SELECT doc_id, pos, s FROM $from
       |  LATERAL VIEW posexplode(word_shingles(text, $n)) _t AS pos, s
       |)""".stripMargin
  def shingleId(s: String): String = s"xxhash64($s)"
  def arrayAggSorted(x: String): String = s"sort_array(collect_list($x))"
  def arrayIntersectSize(a: String, b: String): String =
    s"size(array_intersect($a, $b))"
  def hamming64(pa: String, pb: String): String = {
    // per 32-char half: conv to < 2³² BIGINT (exact), xor, popcount
    def half(off: Int): String = "bit_count(" + bitXor(
      s"CAST(conv(substr($pa, $off, 32), 2, 10) AS BIGINT)",
      s"CAST(conv(substr($pb, $off, 32), 2, 10) AS BIGINT)") + ")"
    s"(${half(1)} + ${half(33)})"
  }
  def ivfAssign(centCtes: String): String =
    s"""WITH $centCtes,
       |cent_arr AS (
       |  SELECT label,
       |    transform(array_sort(collect_list(struct(pos, qc))), s -> s.qc) AS qcs
       |  FROM cent GROUP BY label
       |),
       |packed AS (SELECT collect_list(struct(label, qcs)) AS cents FROM cent_arr)
       |SELECT vec_id, embedding, nrm, cell FROM (
       |  SELECT a.vec_id, a.embedding, a.nrm,
       |    graft_nearest_centroid(a.embedding, p.cents) AS cell
       |  FROM emb_nv a CROSS JOIN packed p
       |) WHERE cell IS NOT NULL""".stripMargin
  def pqAssign(m: Int, bs: Int): String = {
    val dims = m * bs
    val codeCols = (0 until m).map { b =>
      val centsB = s"transform(p.cents, s -> named_struct(" +
        s"'label', s.label, 'qcs', slice(s.qcs, ${b * bs + 1}, $bs)))"
      s"graft_nearest_centroid(slice(embedding, ${b * bs + 1}, $bs), $centsB) AS code$b"
    }.mkString(",\n  ")
    s"""WITH cent_arr AS (
       |  SELECT label,
       |    transform(array_sort(collect_list(struct(pos, qc))), s -> s.qc) AS qcs
       |  FROM pq_cent GROUP BY label
       |),
       |packed AS (SELECT collect_list(struct(label, qcs)) AS cents FROM cent_arr)
       |SELECT vec_id,
       |  $codeCols
       |FROM embeddings CROSS JOIN packed p
       |WHERE size(embedding) = $dims""".stripMargin
  }
  // might_contain requires the bloom side to be a constant or scalar
  // subquery (it is broadcast as one value, the runtime-filter shape),
  // hence the (SELECT f FROM bf) form rather than a join. The 1e6
  // estimated-items sizing keeps fpp ~3% up to a million benchmark
  // shingles (~1 MB of bits); production sizes this to |set|.
  def bloomPrefilter(out: String, items: String, set: String, col: String): String =
    s"""bf AS (SELECT bloom_filter_agg(xxhash64($col), 1000000L) AS f FROM $set),
       |$out AS (
       |  SELECT i.* FROM $items i
       |  WHERE might_contain((SELECT f FROM bf), xxhash64(i.$col))
       |)""".stripMargin
  def heavyHitterGate(out: String, items: String, col: String, k: Int): String =
    s"""mgc AS (SELECT explode(mg_topk($col, $k)) AS hh FROM $items),
       |cand AS (SELECT hh.key AS $col FROM mgc),
       |$out AS (SELECT i.* FROM $items i
       |         WHERE i.$col IN (SELECT $col FROM cand))""".stripMargin
  def cmsGate(out: String, items: String, col: String, share: Int): String =
    s"""cms_sk AS (SELECT cms_sketch($col, 2048, 4) AS s, COUNT(*) AS nn FROM $items),
       |cms_keep AS (
       |  SELECT c.$col FROM (SELECT DISTINCT $col FROM $items) c
       |  CROSS JOIN cms_sk k
       |  WHERE cms_est(k.s, c.$col) * $share >= k.nn
       |),
       |$out AS (SELECT i.* FROM $items i
       |         WHERE i.$col IN (SELECT $col FROM cms_keep))""".stripMargin
  // NULL tokens are filtered in BOTH renderings (not just skipped by
  // the aggregate): without the filter a NULL token votes -1 per bit
  // in the relational form (its CASE test is NULL → ELSE) while the
  // aggregate ignores it — a silent cross-engine divergence on
  // nullable token columns
  def simhashDigestCtes: String =
    "sim AS (SELECT doc_id, simhash_agg(t) AS simhash FROM tok WHERE t IS NOT NULL GROUP BY doc_id)"
}

object DuckDialect extends Dialect {
  val name = "duckdb"
  override val cteMaterialize: String = "MATERIALIZED "
  private def q(s: String): String = s.replace("'", "''")
  def relit(raw: String): String = "'" + q(raw) + "'"
  def split(x: String, sep: String): String = s"string_split($x, '${q(sep)}')"
  def size(l: String): String = s"len($l)"
  def elem(l: String, i: String): String = s"($l)[$i]"
  def filter(l: String, lambda: String): String = s"list_filter($l, $lambda)"
  def transform(l: String, lambda: String): String = s"list_transform($l, $lambda)"
  def arrayMax(l: String): String = s"list_max($l)"
  // list_slice is END-indexed (inclusive) where Spark's slice takes a
  // LENGTH — the end bound is from+len-1, and both engines clamp
  // out-of-range bounds to the array
  def arraySlice(l: String, from1: String, len: String): String =
    s"list_slice($l, $from1, ($from1) + ($len) - 1)"
  def arrayDistinct(l: String): String = s"list_distinct($l)"
  def arraySort(l: String): String = s"list_sort($l)"
  def arrayJoin(l: String, sep: String): String = s"array_to_string($l, '${q(sep)}')"
  def arrayContains(l: String, x: String): String = s"list_contains($l, $x)"
  def arrayLit(items: Seq[String]): String =
    items.map(i => s"'${q(i)}'").mkString("[", ", ", "]")
  def reCount(x: String, rawRegex: String): String =
    s"len(regexp_extract_all($x, ${relit(rawRegex)}, 0))"
  def reExtractAll(x: String, rawRegex: String): String =
    s"regexp_extract_all($x, ${relit(rawRegex)}, 0)"
  def reReplaceAll(x: String, rawRegex: String, repl: String): String = {
    // `repl` arrives in Spark replacement syntax ($N backrefs). DuckDB
    // (RE2) wants \N, so translate ONLY backref tokens; anything else
    // involving '$' or '\' has no single faithful rendering across the
    // two engines, so fail loudly instead of silently corrupting it.
    require(!repl.contains("\\"), s"reReplaceAll: backslash in replacement '$repl' unsupported")
    require("\\$(?!\\d)".r.findFirstIn(repl).isEmpty,
      s"reReplaceAll: literal '$$' in replacement '$repl' unsupported (only $$N backrefs translate)")
    // RE2 rewrites know \0-\9 only: a multi-digit backref ($12) would
    // translate to \1 followed by a literal '2' — the exact silent
    // cross-engine divergence this guard chain exists to prevent
    require("\\$\\d\\d".r.findFirstIn(repl).isEmpty,
      s"reReplaceAll: multi-digit backref in replacement '$repl' unsupported (RE2 rewrites stop at \\9)")
    val ducked = repl.replaceAll("\\$(\\d)", "\\\\$1")
    s"regexp_replace($x, ${relit(rawRegex)}, '${q(ducked)}', 'g')"
  }
  def stringAggOrdered(value: String, order: String, sep: String): String =
    s"string_agg($value, '${q(sep)}' ORDER BY $order)"
  def bitXor(a: String, b: String): String = s"xor($a, $b)"
  def idiv(a: String, b: String): String = s"(($a) // ($b))"
  def approxPercentile(col: String, p: String): String =
    s"approx_quantile($col, $p)"
  // expression-context generate_series returns a LIST, inclusive of hi
  def seqArray(lo: String, hi: String): String = s"generate_series($lo, $hi)"
  def explode(fromSql: String, keyCol: String, arrCol: String, alias: String): String =
    s"SELECT $keyCol, unnest($arrCol) AS $alias FROM ($fromSql)"
  def explodeWithPos(fromSql: String, keyCol: String, arrCol: String,
                     posAlias: String, elemAlias: String): String =
    s"SELECT $keyCol, generate_subscripts($arrCol, 1) - 1 AS $posAlias, " +
      s"unnest($arrCol) AS $elemAlias FROM ($fromSql)"
  def epochSeconds(ts: String): String = s"CAST(FLOOR(epoch($ts)) AS BIGINT)"
  def epochMicros(ts: String): String = s"epoch_us($ts)"
  def toBinary(x: String): String = s"encode($x)"
  def dot(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a) + 1), " +
      s"i -> CAST(($a)[i] AS DOUBLE) * CAST(($b)[i] AS DOUBLE)))"
  def percentileCont(x: String, p: String): String = s"quantile_cont($x, $p)"
  def arrayAggSortedStr(x: String): String =
    s"array_to_string(list_sort(list($x)), ',')"
  // positionless form = the position-aware pipeline + a pos-dropping
  // projection, so the tricky LEAD/concat window SQL lives in exactly
  // one builder and cannot drift between the two
  def shingleRows(from: String, n: Int): String =
    s"""${shingleRowsPos(from, n)},
       |sh AS (SELECT doc_id, s FROM shp)""".stripMargin
  def shingleRowsPos(from: String, n: Int): String = {
    val toksCol = split("text", " ")
    if (n == 1)
      s"""ctoks AS (SELECT doc_id, $toksCol AS toks FROM $from),
         |shp AS (${explodeWithPos("SELECT doc_id, toks FROM ctoks", "doc_id", "toks", "pos", "s")})""".stripMargin
    else {
      val leads = (1 until n).map(k =>
        s"LEAD(tkn, $k) OVER (PARTITION BY doc_id ORDER BY pos)")
      val concatArgs = ("tkn" +: leads).mkString(", ' ', ")
      s"""ctoks AS (SELECT doc_id, $toksCol AS toks FROM $from),
         |tokp AS (${explodeWithPos("SELECT doc_id, toks FROM ctoks", "doc_id", "toks", "pos", "tkn")}),
         |shnp AS (
         |  SELECT doc_id, pos,
         |    concat($concatArgs) AS s,
         |    ${leads.last} AS tlast
         |  FROM tokp
         |),
         |shp AS (SELECT doc_id, pos, s FROM shnp WHERE tlast IS NOT NULL)""".stripMargin
    }
  }
  def shingleId(s: String): String = s
  def arrayAggSorted(x: String): String = s"list_sort(list($x))"
  def arrayIntersectSize(a: String, b: String): String =
    s"len(list_intersect($a, $b))"
  def hamming64(pa: String, pb: String): String =
    "bit_count(" + bitXor(s"CAST($pa AS BIT)", s"CAST($pb AS BIT)") + ")"
  def ivfAssign(centCtes: String): String = {
    val expA = explodeWithPos(
      "SELECT vec_id, embedding FROM embeddings", "vec_id", "embedding", "pos", "v")
    def qv(v: String) = s"CAST(FLOOR(CAST($v AS DOUBLE) * 1.0e6 + 5.0e-1) AS BIGINT)"
    // a centroid is a candidate only on a FULL dimension match
    // (matched positions = vector dims = centroid dims) — the pos
    // equi-join alone would score a PREFIX distance for a shorter/
    // longer centroid, which is systematically smaller and would win
    // the argmin where the Spark expression (qcs.numElements() == n)
    // skips that centroid entirely
    s"""WITH $centCtes,
       |eva AS ($expA),
       |vdim AS (SELECT vec_id, COUNT(*) AS nd FROM eva GROUP BY vec_id),
       |cdim AS (SELECT label, COUNT(*) AS cd FROM cent GROUP BY label),
       |dist AS (
       |  SELECT eva.vec_id, c.label AS cl,
       |    SUM((${qv("eva.v")} - c.qc) * (${qv("eva.v")} - c.qc)) AS d2,
       |    COUNT(*) AS npos
       |  FROM eva JOIN cent c ON eva.pos = c.pos
       |  GROUP BY eva.vec_id, c.label
       |),
       |asgn AS (
       |  SELECT vec_id, cl AS cell FROM (
       |    SELECT d.vec_id, d.cl, ROW_NUMBER() OVER (
       |      PARTITION BY d.vec_id ORDER BY d.d2, d.cl) AS rn
       |    FROM dist d
       |    JOIN vdim ON d.vec_id = vdim.vec_id
       |    JOIN cdim ON d.cl = cdim.label
       |    WHERE d.npos = vdim.nd AND d.npos = cdim.cd
       |  ) WHERE rn = 1
       |)
       |SELECT a.vec_id, a.embedding, a.nrm, s.cell
       |FROM emb_nv a JOIN asgn s ON a.vec_id = s.vec_id""".stripMargin
  }
  def pqAssign(m: Int, bs: Int): String = {
    val dims = m * bs
    val expV = explodeWithPos(
      s"SELECT vec_id, embedding FROM embeddings WHERE len(embedding) = $dims",
      "vec_id", "embedding", "pos", "v")
    val codeCols = (0 until m).map(b =>
      s"CAST(MAX(CASE WHEN block = $b THEN label END) AS INT) AS code$b").mkString(",\n  ")
    s"""WITH ev AS ($expV),
       |evb AS (
       |  SELECT vec_id, CAST(FLOOR(pos / $bs) AS INT) AS block, pos % $bs AS bpos,
       |    CAST(FLOOR(CAST(v AS DOUBLE) * 1.0e6 + 5.0e-1) AS BIGINT) AS qv
       |  FROM ev
       |),
       |cb AS (
       |  SELECT label, CAST(FLOOR(pos / $bs) AS INT) AS block, pos % $bs AS bpos, qc
       |  FROM pq_cent
       |),
       |dist AS (
       |  SELECT e.vec_id, e.block, c.label,
       |    SUM((e.qv - c.qc) * (e.qv - c.qc)) AS d2, COUNT(*) AS npos
       |  FROM evb e JOIN cb c ON e.block = c.block AND e.bpos = c.bpos
       |  GROUP BY e.vec_id, e.block, c.label
       |),
       |asgn AS (
       |  SELECT vec_id, block, label FROM (
       |    SELECT vec_id, block, label, ROW_NUMBER() OVER (
       |      PARTITION BY vec_id, block ORDER BY d2, label) AS rn
       |    FROM dist WHERE npos = $bs
       |  ) WHERE rn = 1
       |)
       |SELECT vec_id,
       |  $codeCols
       |FROM asgn GROUP BY vec_id""".stripMargin
  }
  // no prefilter: DuckDB is the exact oracle side, so `out` is just
  // the items unchanged — identical final rows prove the Spark bloom
  // gate result-invisible
  def bloomPrefilter(out: String, items: String, set: String, col: String): String =
    s"$out AS (SELECT * FROM $items)"
  def heavyHitterGate(out: String, items: String, col: String, k: Int): String =
    s"$out AS (SELECT * FROM $items)"
  // ungated: DuckDB is the exact oracle side (see heavyHitterGate)
  def cmsGate(out: String, items: String, col: String, share: Int): String =
    s"$out AS (SELECT * FROM $items)"
  def simhashDigestCtes: String = {
    val hexv = (1 to 8).map { i =>
      s"CAST(instr('0123456789abcdef', substr(md5(t), $i, 1)) - 1 AS BIGINT) * ${1L << (4 * (8 - i))}"
    }.mkString(" + ")
    val bitSums = (0 until 32).map { j =>
      s"SUM(CASE WHEN CAST(FLOOR(v / ${1L << (31 - j)}) AS BIGINT) % 2 = 1 THEN 1 ELSE -1 END) AS b$j"
    }.mkString(",\n    ")
    val assemble = (0 until 32).map { j =>
      s"(CASE WHEN b$j >= 0 THEN ${1L << (31 - j)} ELSE 0 END)"
    }.mkString(" + ")
    s"""tv AS (SELECT doc_id, $hexv AS v FROM tok WHERE t IS NOT NULL),
       |bits AS (SELECT doc_id,
       |    $bitSums
       |  FROM tv GROUP BY doc_id),
       |sim AS (SELECT doc_id, CAST($assemble AS BIGINT) AS simhash FROM bits)""".stripMargin
  }
}
