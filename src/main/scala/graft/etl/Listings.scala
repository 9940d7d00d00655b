package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Fixture-backed source for the reference's property-listing pipeline.
  *
  * The reference scrapes rumah123.com listing cards into an all-string
  * raw table (reference src/extract.py:91-116: every field nullable
  * string; constants attached at src/extract.py:177). This environment
  * is offline, so the raw stage is derived *deterministically* from the
  * driver's `part` parquet table — the same derivation is mirrored in
  * the DuckDB oracle SQL (`ListingSql.RAW_CTE`), which is what makes the
  * whole ETL chain hash-checkable end-to-end.
  *
  * The derived columns intentionally cover every edge case the
  * reference's transforms handle: NULL keys, duplicate keys, every
  * price unit (triliun/miliar/juta/ribu/bare/garbage/NULL), sizes with
  * and without digits, coerce-failure counts ("10+", "dua"), and all
  * four badge-tokenizer regex branches.
  *
  * Scale note: this is a pure projection over a columnar scan — no
  * shuffle, fully whole-stage-codegen'd, and at 100 TB it parallelizes
  * per input split with zero coordination.
  */
object Listings {

  /** Raw all-string listing table (the post-scrape, post-CSV stage). */
  def raw(spark: SparkSession, dir: String): DataFrame = {
    val k = col("p_partkey")
    Tables.part(spark, dir).select(
      k.as("ingest_order"),
      when(k % 19 === 3, lit(null).cast("string"))
        .otherwise(concat(lit("rumah123.com/properti/p"), (k % 571).cast("string")))
        .as("link"),
      col("p_name").as("name"),
      when(k % 7 === 0, concat(lit("Rp "), (k % 9 + 1).cast("string"), lit(","),
          (k % 10).cast("string"), lit(" Miliar")))
        .when(k % 7 === 1, concat(lit("Rp "), col("p_size").cast("string"), lit(" Juta")))
        .when(k % 7 === 2, lit("Rp 2,5 Triliun"))
        .when(k % 7 === 3, concat(lit("Rp "), col("p_size").cast("string"), lit("00 Ribu")))
        .when(k % 7 === 4, concat(lit("Rp "), floor(col("p_retailprice")).cast("bigint").cast("string")))
        .when(k % 7 === 5, lit("Rp abc Miliar"))
        .otherwise(lit(null).cast("string"))
        .as("price_rp"),
      when(k % 3 === 0, lit("Kebon Jeruk, Jakarta Barat"))
        .when(k % 3 === 1, lit(""))
        .otherwise(lit("Tebet, Jakarta Selatan"))
        .as("location"),
      when(k % 5 === 0, concat(col("p_size").cast("string"), lit(" m²")))
        .when(k % 5 === 1, concat(lit("Tanah: "), (col("p_size") * 3).cast("string")))
        .when(k % 5 === 2, lit("tidak ada angka"))
        .when(k % 5 === 3, lit(null).cast("string"))
        .otherwise(concat((col("p_size") + 7).cast("string"), lit(" m²")))
        .as("lot_size"),
      when(k % 4 === 0, concat(col("p_size").cast("string"), lit(" m²")))
        .when(k % 4 === 1, lit(null).cast("string"))
        .otherwise(concat((col("p_size") + 2).cast("string"), lit(" m²")))
        .as("building_size"),
      when(k % 6 === 0, lit("10+"))
        .when(k % 6 === 1, lit(null).cast("string"))
        .otherwise((k % 7).cast("string"))
        .as("n_bedroom"),
      when(k % 5 === 4, lit("dua")).otherwise((k % 4).cast("string")).as("n_bathroom"),
      when(k % 3 === 0, lit(null).cast("string")).otherwise((k % 3).cast("string")).as("n_carport"),
      when(k % 4 === 0, lit("RumahCarportGarasi"))
        .when(k % 4 === 1, lit("ApartemenKolam RenangAC"))
        .when(k % 4 === 2, lit("KostWIFIDapur"))
        .otherwise(lit("Villa-Pool.Spa"))
        .as("badge"),
      when(k % 2 === 0, lit("jual")).otherwise(lit("sewa")).as("ads_type"),
      when(k % 5 === 0, lit("rumah"))
        .when(k % 5 === 1, lit("apartemen"))
        .when(k % 5 === 2, lit("kost"))
        .when(k % 5 === 3, lit("villa"))
        .otherwise(lit("hotel"))
        .as("property_type"))
  }
}

/** DuckDB-dialect SQL mirrors of the Listings/Transform pipeline, used
  * as the oracle side of the driver's hash-compare. Kept adjacent to the
  * Spark implementation so the two evolve together. */
object ListingSql {

  /** Mirror of [[Listings.raw]] as a CTE over the `part` table. */
  val RAW_CTE: String =
    """raw AS (
      |  SELECT
      |    p_partkey AS ingest_order,
      |    CASE WHEN p_partkey % 19 = 3 THEN NULL
      |         ELSE 'rumah123.com/properti/p' || CAST(p_partkey % 571 AS STRING) END AS link,
      |    p_name AS name,
      |    CASE p_partkey % 7
      |      WHEN 0 THEN 'Rp ' || CAST(p_partkey % 9 + 1 AS STRING) || ',' || CAST(p_partkey % 10 AS STRING) || ' Miliar'
      |      WHEN 1 THEN 'Rp ' || CAST(p_size AS STRING) || ' Juta'
      |      WHEN 2 THEN 'Rp 2,5 Triliun'
      |      WHEN 3 THEN 'Rp ' || CAST(p_size AS STRING) || '00 Ribu'
      |      WHEN 4 THEN 'Rp ' || CAST(CAST(FLOOR(p_retailprice) AS BIGINT) AS STRING)
      |      WHEN 5 THEN 'Rp abc Miliar'
      |      ELSE NULL END AS price_rp,
      |    CASE p_partkey % 3 WHEN 0 THEN 'Kebon Jeruk, Jakarta Barat' WHEN 1 THEN '' ELSE 'Tebet, Jakarta Selatan' END AS location,
      |    CASE p_partkey % 5
      |      WHEN 0 THEN CAST(p_size AS STRING) || ' m²'
      |      WHEN 1 THEN 'Tanah: ' || CAST(p_size * 3 AS STRING)
      |      WHEN 2 THEN 'tidak ada angka'
      |      WHEN 3 THEN NULL
      |      ELSE CAST(p_size + 7 AS STRING) || ' m²' END AS lot_size,
      |    CASE p_partkey % 4
      |      WHEN 0 THEN CAST(p_size AS STRING) || ' m²'
      |      WHEN 1 THEN NULL
      |      ELSE CAST(p_size + 2 AS STRING) || ' m²' END AS building_size,
      |    CASE p_partkey % 6 WHEN 0 THEN '10+' WHEN 1 THEN NULL ELSE CAST(p_partkey % 7 AS STRING) END AS n_bedroom,
      |    CASE p_partkey % 5 WHEN 4 THEN 'dua' ELSE CAST(p_partkey % 4 AS STRING) END AS n_bathroom,
      |    CASE p_partkey % 3 WHEN 0 THEN NULL ELSE CAST(p_partkey % 3 AS STRING) END AS n_carport,
      |    CASE p_partkey % 4
      |      WHEN 0 THEN 'RumahCarportGarasi'
      |      WHEN 1 THEN 'ApartemenKolam RenangAC'
      |      WHEN 2 THEN 'KostWIFIDapur'
      |      ELSE 'Villa-Pool.Spa' END AS badge,
      |    CASE p_partkey % 2 WHEN 0 THEN 'jual' ELSE 'sewa' END AS ads_type,
      |    CASE p_partkey % 5 WHEN 0 THEN 'rumah' WHEN 1 THEN 'apartemen' WHEN 2 THEN 'kost' WHEN 3 THEN 'villa' ELSE 'hotel' END AS property_type
      |  FROM part
      |)""".stripMargin

  /** Mirror of [[Transform.transform]]: keep-first dedup + scalar
    * cleaning, as chained CTEs. DuckDB regexp_replace needs the 'g'
    * flag (Spark/pandas replace globally by default). */
  val TRANSFORMED_CTE: String =
    RAW_CTE + """,
      |deduped AS (
      |  SELECT * FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY link ORDER BY ingest_order) AS rn
      |    FROM raw WHERE link IS NOT NULL
      |  ) WHERE rn = 1
      |),
      |priced AS (
      |  SELECT *, TRIM(REPLACE(REPLACE(LOWER(price_rp), 'rp ', ''), ',', '.')) AS price_s
      |  FROM deduped
      |),
      |badged AS (
      |  SELECT *,
      |    regexp_replace(regexp_replace(
      |      regexp_replace(regexp_replace(regexp_replace(badge,
      |        '([a-z])([A-Z])', '\1, \2', 'g'),
      |        '([A-Z]{2,})([A-Z][a-z])', '\1, \2', 'g'),
      |        '([^\w\s])([A-Za-z])', '\1, \2', 'g'),
      |        '\s*,\s*', ', ', 'g'),
      |      '^[, ]+|[, ]+$', '', 'g') AS badge_norm
      |  FROM priced
      |),
      |transformed AS (
      |  SELECT
      |    ingest_order, link, name,
      |    CAST(FLOOR((CASE
      |      WHEN price_s IS NULL THEN NULL
      |      WHEN contains(price_s, 'triliun') THEN TRY_CAST(REPLACE(price_s, ' triliun', '') AS DOUBLE) * 1000000000000
      |      WHEN contains(price_s, 'miliar') THEN TRY_CAST(REPLACE(price_s, ' miliar', '') AS DOUBLE) * 1000000000
      |      WHEN contains(price_s, 'juta') THEN TRY_CAST(REPLACE(price_s, ' juta', '') AS DOUBLE) * 1000000
      |      WHEN contains(price_s, 'ribu') THEN TRY_CAST(REPLACE(price_s, ' ribu', '') AS DOUBLE) * 1000
      |      ELSE TRY_CAST(price_s AS DOUBLE) END) + 0.5e0) AS BIGINT) AS price_rp,
      |    location,
      |    TRY_CAST(regexp_extract(lot_size, '(\d+)', 1) AS INT) AS lot_size,
      |    TRY_CAST(regexp_extract(building_size, '(\d+)', 1) AS INT) AS building_size,
      |    TRY_CAST(n_bedroom AS INT) AS n_bedroom,
      |    TRY_CAST(n_bathroom AS INT) AS n_bathroom,
      |    TRY_CAST(n_carport AS INT) AS n_carport,
      |    regexp_replace(badge_norm, '^[^,]*(, )?', '') AS additional_features,
      |    ads_type, property_type
      |  FROM badged
      |)""".stripMargin
}
