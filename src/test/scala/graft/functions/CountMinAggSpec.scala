package graft.functions

import graft.SparkSpec

/** Adversarial coverage of the count-min sketch's collision and merge
  * paths — the production query's user cardinality sits far below the
  * 2048-bucket width, so forced-collision behavior never shows there. */
class CountMinAggSpec extends SparkSpec {

  private def sketch(rows: Seq[Long], w: Int, d: Int,
                     parts: Int = 1): Array[Long] = {
    GraftFunctions.registerAll(spark)
    import spark.implicits._
    rows.toDF("v").repartition(parts).createOrReplaceTempView("cms_in")
    spark.sql(s"SELECT cms_sketch(v, $w, $d) AS s FROM cms_in")
      .collect().head.getSeq[Long](0).toArray
  }

  private def est(sk: Array[Long], key: Long): Long = {
    val d = sk(0).toInt
    val w = sk(1).toInt
    (0 until d).map(r => sk(2 + r * w + CmsHash.bucket(key, r, w))).min
  }

  test("estimates never undercount, and are exact when no bucket collides") {
    val rows = (1L to 50L).flatMap(k => Seq.fill(k.toInt)(k))
    val sk = sketch(rows, w = 4096, d = 4)
    // wide sketch: 50 keys in 4096 buckets collide with probability
    // ~0.3 per row pair; require only the one-sided guarantee per key
    // plus exactness for a majority (collisions inflate, never deflate)
    val errs = (1L to 50L).map(k => est(sk, k) - k)
    assert(errs.forall(_ >= 0L), s"undercount: $errs")
    assert(errs.count(_ == 0L) >= 40, s"wide sketch should be mostly exact: $errs")
  }

  test("forced collisions (w=2) overcount but row sums equal N") {
    val rows = (1L to 20L) ++ Seq.fill(30)(5L)
    val sk = sketch(rows, w = 2, d = 3)
    val d = sk(0).toInt
    val w = sk(1).toInt
    (0 until d).foreach { r =>
      val rowSum = (0 until w).map(i => sk(2 + r * w + i)).sum
      assert(rowSum === rows.length.toLong, s"depth row $r must count every update")
    }
    assert(est(sk, 5L) >= 31L, "the heavy key keeps at least its true count")
  }

  test("sketch content is identical regardless of partition layout") {
    val rows = scala.util.Random.shuffle(
      (1L to 200L).flatMap(k => Seq.fill((k % 7).toInt + 1)(k)))
    val one = sketch(rows, w = 64, d = 4, parts = 1)
    val many = sketch(rows, w = 64, d = 4, parts = 8)
    assert(one.toSeq === many.toSeq,
      "element-wise merge must be layout-independent")
  }

  test("null keys are skipped; an empty group yields a zero sketch") {
    GraftFunctions.registerAll(spark)
    spark.sql("SELECT cms_sketch(CAST(NULL AS BIGINT), 8, 2) AS s FROM range(3)")
      .collect().head.getSeq[Long](0) match {
      case s => assert(s.drop(2).forall(_ == 0L) && s.take(2) == Seq(2L, 8L))
    }
  }

  test("cms_est agrees with a driver-side replay of the hash rows") {
    val rows = (1L to 30L).flatMap(k => Seq.fill(3)(k))
    val sk = sketch(rows, w = 16, d = 4)
    GraftFunctions.registerAll(spark)
    import spark.implicits._
    rows.distinct.toDF("v").createOrReplaceTempView("cms_q")
    val viaSql = spark.sql(
      s"""WITH sk AS (SELECT cms_sketch(v, 16, 4) AS s FROM cms_in)
         |SELECT q.v, cms_est(sk.s, q.v) AS e FROM cms_q q CROSS JOIN sk""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    rows.distinct.foreach { k =>
      assert(viaSql(k) === est(sk, k), s"estimator mismatch for key $k")
    }
  }
}
