package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The spark.sql.extensions registration path: a session built with
  * GraftExtensions resolves every graft function from plain SQL with
  * no programmatic registration call. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("a session built with GraftExtensions resolves graft functions from SQL") {
    // getOrCreate returns any existing default session (and skips
    // extension injection), so detach the shared test session first and
    // restore it after — the new session reuses the same SparkContext.
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      // withExtensions = the programmatic form of
      // spark.sql.extensions=graft.GraftExtensions; the string conf is
      // static and only read when the SparkContext itself is built, so
      // it can't be exercised over the suite's shared context
      val spark = SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-test")
        .withExtensions(new GraftExtensions)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      val r = spark.sql(
        """SELECT rolling_hash('abc') AS rh,
          |  graft_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
          |            array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS dp,
          |  size(word_shingles('a b c d', 3)) AS ns,
          |  md5_prefix32('x') AS mp""".stripMargin).head
      assert(r.getAs[Long]("rh") === graft.functions.RollingHash.hash("abc"))
      assert(r.getAs[Double]("dp") === 11.0)
      assert(r.getAs[Int]("ns") === 2)
      assert(r.getAs[Long]("mp") ===
        graft.functions.Md5Prefix32.hash(org.apache.spark.unsafe.types.UTF8String.fromString("x")))
      val agg = spark.sql(
        "SELECT simhash_agg(t) AS sh FROM (SELECT explode(split('a b a', ' ')) AS t)").head
      assert(agg.getAs[Long]("sh") >= 0L)
      // the full registry: the IVF argmin must resolve from SQL too
      // (it is what Dialect's Spark-side IVF assignment SQL calls)
      val nc = spark.sql(
        """SELECT graft_nearest_centroid(
          |  array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
          |  array(struct(7, array(CAST(1000000 AS BIGINT), CAST(0 AS BIGINT))),
          |        struct(9, array(CAST(-1000000 AS BIGINT), CAST(0 AS BIGINT))))) AS cell""".stripMargin).head
      assert(nc.getAs[Int]("cell") === 7)
      // DISTINCT resolves because the builder returns the RAW aggregate
      // function (the analyzer wraps it with the isDistinct flag)
      val dist = spark.sql(
        "SELECT simhash_agg(DISTINCT t) AS sh FROM (SELECT explode(split('a b a', ' ')) AS t)").head
      assert(dist.getAs[Long]("sh") >= 0L)
      // defined null contracts of the argmin: empty centroid table and
      // dimensionality mismatch assign no cell (never Int.MaxValue or a
      // prefix distance) — the session-wide SQL surface can hit both
      val ncNull = spark.sql(
        """SELECT
          |  graft_nearest_centroid(array(CAST(1.0 AS FLOAT)),
          |    CAST(array() AS array<struct<label:int, qcs:array<bigint>>>)) AS empty_cents,
          |  graft_nearest_centroid(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
          |    array(struct(3, array(CAST(1000000 AS BIGINT))))) AS dim_mismatch""".stripMargin).head
      assert(ncNull.isNullAt(0), "empty centroid table must assign null")
      assert(ncNull.isNullAt(1), "dimension mismatch must assign null")
      // the bloom runtime-filter pair injected this round, exercised in
      // the production shape (COLUMN probe against the scalar-subquery
      // bloom — an all-constant probe hits a Janino codegen edge in
      // Spark's might_contain and falls back to interpreter; the
      // column form stays codegen'd): every inserted key must probe
      // true (no false negatives)
      val bloom = spark.sql(
        """WITH s AS (SELECT explode(array('a','b','c')) AS v),
          |bf AS (SELECT bloom_filter_agg(xxhash64(v), 10L) AS f FROM s)
          |SELECT count(*) AS hits FROM s
          |WHERE might_contain((SELECT f FROM bf), xxhash64(v))""".stripMargin).head
      assert(bloom.getAs[Long]("hits") === 3L, "every inserted key must probe true")
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
