package graft.functions

import graft.SparkSpec

/** Cross-engine edge semantics of the simhash aggregate. */
class SimHashAggSpec extends SparkSpec {

  test("a group with only NULL tokens digests to 0, matching the SQL rendering") {
    GraftFunctions.registerAll(spark)
    // the relational (oracle) form's bit-vote SUMs are NULL on an
    // all-NULL group, so every `>= 0` CASE fails and the reassembled
    // digest is 0 — the aggregate must agree, not emit 0xFFFFFFFF
    val row = spark.sql(
      """SELECT g, simhash_agg(t) AS h FROM VALUES
        |  (1, CAST(NULL AS STRING)), (1, CAST(NULL AS STRING)),
        |  (2, 'alpha'), (2, 'beta')
        |AS v(g, t) GROUP BY g ORDER BY g""".stripMargin)
      .collect()
    assert(row(0).getLong(1) === 0L)
    assert(row(1).getLong(1) !== 0L)
  }
}
