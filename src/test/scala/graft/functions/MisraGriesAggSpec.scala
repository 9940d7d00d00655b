package graft.functions

import graft.SparkSpec

/** Adversarial coverage of the Misra-Gries summary's eviction and
  * merge-reduction paths — the production query's bigram vocabulary is
  * smaller than its slot budget, so these paths never fire there. */
class MisraGriesAggSpec extends SparkSpec {

  private def summarize(rows: Seq[Long], k: Int,
                        parts: Int = 1): Map[Long, Long] = {
    GraftFunctions.registerAll(spark)
    import spark.implicits._
    rows.toDF("v").repartition(parts).createOrReplaceTempView("mg_in")
    spark.sql(s"SELECT explode(mg_topk(v, $k)) AS hh FROM mg_in")
      .selectExpr("hh.key", "hh.est").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
  }

  test("eviction: a key with share > 1/(k+1) survives k slots under adversarial churn") {
    // 60 distinct light keys (1 occurrence each) churn an 8-slot
    // summary; the heavy key (40 of 100 total, share 0.4 > 1/9) must
    // survive with estimate ≤ true count and ≥ count − N/(k+1)
    val heavy = Seq.fill(40)(999L)
    val light = (1L to 60L)
    val interleaved = (heavy ++ light).zipWithIndex
      .sortBy { case (v, i) => (i % 10, i) }.map(_._1) // spread the churn
    val s = summarize(interleaved, k = 8)
    assert(s.contains(999L), s"heavy key evicted: $s")
    assert(s(999L) <= 40L && s(999L) >= 40L - (100L / 9L + 1L))
    assert(s.size <= 8)
  }

  test("merge reduction: partition-local summaries combine within the additive bound") {
    // 4 partitions force partial-summary merges; 200 distinct light
    // keys overflow k=16 in every partial
    val heavy = Seq.fill(120)(7L)
    val light = (100L to 299L)
    val s = summarize(scala.util.Random.shuffle(heavy ++ light), k = 16, parts = 4)
    assert(s.contains(7L), s"heavy key lost in merge: $s")
    assert(s(7L) <= 120L, "an estimate must never overcount")
    assert(s.size <= 16, "merge reduction must respect the slot budget")
  }

  test("null keys are skipped; an empty group yields an empty summary") {
    GraftFunctions.registerAll(spark)
    val out = spark.sql(
      """SELECT size(mg_topk(v, 4)) FROM VALUES
        |  (CAST(NULL AS BIGINT)), (CAST(NULL AS BIGINT)) AS t(v)""".stripMargin)
      .collect()(0).getInt(0)
    assert(out === 0)
  }
}
