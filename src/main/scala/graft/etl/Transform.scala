package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The reference's cleaning stage (reference src/transform.py:70-95) as
  * pure Catalyst column expressions — no UDFs, so every step stays
  * inside whole-stage codegen. Order mirrors transform_data:
  * null-key filter → keep-first dedup → numeric size extract → price
  * normalize/parse → coercing int casts, plus the badge tokenizer from
  * the extract stage (reference src/extract.py:75-88).
  *
  * Pandas-vs-Spark parity decisions (SURVEY.md §7 risk list):
  *  - `str.extract` yields NaN on no-match; `regexp_extract` yields ""
  *    — `try_cast` maps both to NULL, matching the observed end state.
  *  - `parse_price` returns the input string unchanged when no unit
  *    matches (reference src/transform.py:25-43); the observed
  *    end-to-end result after `.astype("Int64")` is numeric-or-NULL →
  *    encoded as `try_cast(... as double)`.
  *  - keep-first dedup (`drop_duplicates`, src/transform.py:11) needs an
  *    explicit order in a distributed engine → `ingest_order` column +
  *    row_number window. At 100 TB this is a single shuffle on the key;
  *    the window keeps one row per key with no driver involvement.
  */
object Transform {

  /** Null-key filter (F1, reference src/transform.py:8). */
  def dropNullKeys(df: DataFrame): DataFrame = df.filter(col("link").isNotNull)

  /** Keep-first dedup by link (D1, reference src/transform.py:11). */
  def dedupKeepFirst(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("link")).orderBy(col("ingest_order"))
    df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }

  /** Price normalize + unit parse (P2-P4, reference src/transform.py:25-53).
    * Indonesian units: triliun=1e12, miliar=1e9, juta=1e6, ribu=1e3;
    * comma is the decimal separator; bare numbers pass through;
    * unparseable → NULL. */
  def parsePrice(df: DataFrame): DataFrame =
    df.withColumn("price_s",
        trim(regexp_replace(regexp_replace(lower(col("price_rp")), "rp ", ""), ",", ".")))
      .withColumn("price_d", expr(
        """CASE
          |  WHEN price_s IS NULL THEN NULL
          |  WHEN contains(price_s, 'triliun') THEN try_cast(replace(price_s, ' triliun', '') AS DOUBLE) * 1000000000000
          |  WHEN contains(price_s, 'miliar') THEN try_cast(replace(price_s, ' miliar', '') AS DOUBLE) * 1000000000
          |  WHEN contains(price_s, 'juta') THEN try_cast(replace(price_s, ' juta', '') AS DOUBLE) * 1000000
          |  WHEN contains(price_s, 'ribu') THEN try_cast(replace(price_s, ' ribu', '') AS DOUBLE) * 1000
          |  ELSE try_cast(price_s AS DOUBLE) END""".stripMargin))
      // FLOOR(x+0.5), not ROUND: same half-up result for these
      // non-negative prices, but pure IEEE ops (Spark's ROUND on
      // doubles allocates a BigDecimal per row and can disagree with
      // other engines on boundary-adjacent doubles)
      .withColumn("price_rp", expr("cast(floor(price_d + 0.5e0) AS BIGINT)"))
      .drop("price_s", "price_d")

  /** Badge tokenizer (P6, reference src/extract.py:75-88): 4-regex
    * boundary splitting, normalize separators, strip, drop the first
    * token (the property type). Output is the ', '-joined feature
    * string (the reference's CSV-interchange shape, SURVEY.md §1).
    * The reference's first regex uses a lookbehind; the capture-group
    * form here is match-for-match equivalent and RE2-portable for the
    * oracle. */
  def tokenizeBadge(df: DataFrame): DataFrame = {
    val norm = regexp_replace(regexp_replace(regexp_replace(regexp_replace(col("badge"),
      "([a-z])([A-Z])", "$1, $2"),
      "([A-Z]{2,})([A-Z][a-z])", "$1, $2"),
      "([^\\w\\s])([A-Za-z])", "$1, $2"),
      "\\s*,\\s*", ", ")
    val stripped = regexp_replace(norm, "^[, ]+|[, ]+$", "")
    df.withColumn("additional_features", regexp_replace(stripped, "^[^,]*(, )?", ""))
      .drop("badge")
  }

  /** Numeric size extract (P1) + coercing int casts (P5,
    * reference src/transform.py:16-22,56-67). */
  def castNumerics(df: DataFrame): DataFrame =
    df.withColumn("lot_size", expr("try_cast(regexp_extract(lot_size, '(\\\\d+)', 1) AS INT)"))
      .withColumn("building_size", expr("try_cast(regexp_extract(building_size, '(\\\\d+)', 1) AS INT)"))
      .withColumn("n_bedroom", expr("try_cast(n_bedroom AS INT)"))
      .withColumn("n_bathroom", expr("try_cast(n_bathroom AS INT)"))
      .withColumn("n_carport", expr("try_cast(n_carport AS INT)"))

  /** Full transform_data chain in the reference's order. */
  def transform(raw: DataFrame): DataFrame = {
    val deduped = dedupKeepFirst(dropNullKeys(raw))
    val typed   = castNumerics(parsePrice(deduped))
    tokenizeBadge(typed).select(
      col("ingest_order"), col("link"), col("name"), col("price_rp"),
      col("location"), col("lot_size"), col("building_size"),
      col("n_bedroom"), col("n_bathroom"), col("n_carport"),
      col("additional_features"), col("ads_type"), col("property_type"))
  }
}
