package graft.ops

import graft.SparkSpec

/** Independent micro-oracles for the round-14 analytics (the
  * MicroOracleSpec discipline: each test recomputes the operator from
  * first principles in plain Scala on a crafted input — a second,
  * structurally unrelated implementation — and asserts the SQL result
  * equal; planted positives keep every metric column non-degenerate).
  */
class R14MicroSpec extends SparkSpec {

  private def r6(x: Double): Double = math.floor(x * 1.0e6 + 0.5) / 1.0e6
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
  private def wshingles(text: String, n: Int): Seq[String] = {
    val w = text.split(" ").toSeq
    if (w.size < n) Seq.empty else w.sliding(n).map(_.mkString(" ")).toSeq
  }

  /** Crafted corpus: three sources with distinct quality profiles, a
    * family of overlapping variants (mid-Jaccard near-dups for the
    * calibration buckets), and single-space text so the whitespace
    * tokenizer here stays faithful to word_shingles. */
  private val fixtureDocs: Seq[(Long, String, String, String, Long)] = {
    val base = "the quick brown fox jumps over the lazy dog and runs far " +
      "into the green field of tall grass near the old stone bridge"
    val docs = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String)]
    // alpha: six good-quality docs, each unique (filler varies)
    for (i <- 0 until 6)
      docs += ((docs.size.toLong,
        s"$base while bird$i sings softly and water$i flows under it", "alpha"))
    // beta: low-quality short docs (few words -> low quality score)
    for (i <- 0 until 6)
      docs += ((docs.size.toLong, s"stub$i note$i item$i", "beta"))
    // gamma: overlapping variants of one long text — high but sub-1.0
    // pairwise Jaccard, the mid-bucket mass the calibration needs
    for (i <- 0 until 6)
      docs += ((docs.size.toLong,
        s"$base $base and extra$i words of drift appear here", "gamma"))
    docs.toSeq.map { case (id, text, src) =>
      (id, text, "en", src, text.length.toLong)
    }
  }

  private def registerFixture(): Unit = {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    fixtureDocs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .createOrReplaceTempView("documents")
  }

  // ---- shared independent pipeline pieces (two-snapshot corpus,
  //      signatures, bands, df-capped shingle sets) ----

  private lazy val corpus: Seq[(Long, String)] =
    fixtureDocs.flatMap { case (id, text, _, _, _) =>
      Seq((2 * id, text), (2 * id + 1, text))
    }

  private def sigOf(text: String): Option[IndexedSeq[String]] = {
    val sh = wshingles(text, 3)
    if (sh.isEmpty) None
    else Some((0 until 8).map(j => sh.map(s => md5hex(s).substring(4 * j, 4 * j + 4)).min))
  }

  private lazy val sigs: Map[Long, IndexedSeq[String]] =
    corpus.flatMap { case (id, t) => sigOf(t).map(id -> _) }.toMap

  /** (band, bkey) -> member doc ids, from the 2x4 band split. */
  private lazy val bandRows: Seq[(Long, Int, String)] =
    sigs.toSeq.flatMap { case (id, h) =>
      Seq((id, 0, h.slice(0, 4).mkString), (id, 1, h.slice(4, 8).mkString))
    }

  private lazy val candPairs: Set[(Long, Long)] =
    bandRows.groupBy(r => (r._2, r._3)).values.flatMap { members =>
      val ids = members.map(_._1).sorted
      for (i <- ids.indices; j <- (i + 1) until ids.size) yield (ids(i), ids(j))
    }.toSet

  /** df-capped (df <= 20 over the corpus) distinct 3-shingle sets. */
  private lazy val cappedSets: Map[Long, Set[String]] = {
    val perDoc = corpus.map { case (id, t) => id -> wshingles(t, 3).toSet }
    val df = perDoc.flatMap(_._2).groupBy(identity).map { case (s, xs) => s -> xs.size }
    perDoc.map { case (id, set) => id -> set.filter(s => df(s) <= 20) }
      .filter(_._2.nonEmpty).toMap
  }

  test("LSH band-bucket skew: SQL per-band stats equal an independent band walk") {
    registerFixture()
    val got = spark.sql(SqlOps.dedupLshBucketSkew.single(SparkDialect)).collect()
      .map(r => (r.getAs[Number]("band").longValue(), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_buckets"), r.getAs[Long]("max_bucket"),
        r.getAs[Long]("cand_pairs"), r.getAs[Long]("top_share_ppm")))
    val exp = bandRows.groupBy(_._2).toSeq.sortBy(_._1).map { case (band, rows) =>
      val buckets = rows.groupBy(_._3).values.map(_.size.toLong).toSeq
      val n = buckets.sum
      val mx = buckets.max
      (band.toLong, n, buckets.size.toLong, mx,
        buckets.map(b => b * (b - 1)).sum / 2, 1000000L * mx / n)
    }
    assert(got.toSeq === exp)
    // planted positive: the snapshot twins guarantee every band holds
    // at least one >=2 bucket, so max_bucket and cand_pairs are live
    assert(exp.forall { case (_, _, _, mx, cp, _) => mx >= 2 && cp >= 1 })
    spark.catalog.dropTempView("documents")
  }

  test("minhash calibration: SQL bucket table equals an independent est-vs-exact pass") {
    registerFixture()
    val got = spark.sql(SqlOps.dedupMinhashCalibration.single(SparkDialect)).collect()
      .map(r => (r.getAs[Number]("bucket").longValue(), r.getAs[Long]("n_pairs"),
        Option(r.getAs[java.lang.Double]("mean_est")).map(_.doubleValue()),
        Option(r.getAs[java.lang.Double]("mean_exact")).map(_.doubleValue())))
      .sortBy(_._1)
    // independent: per candidate pair, exact jaccard on the capped
    // sets (absent set = empty, union 0 -> bucket 0 by definition) and
    // the 8-slice agreement estimate; bucket means via the same
    // mu-quantize-then-floor-divide integer path the SQL uses
    val per = candPairs.toSeq.map { case (a, b) =>
      val sa = cappedSets.getOrElse(a, Set.empty[String])
      val sb = cappedSets.getOrElse(b, Set.empty[String])
      val inter = (sa & sb).size.toLong
      val un = sa.size + sb.size - inter
      val bucket = if (un == 0) 0L else 8 * inter / un
      val qj = if (un == 0) 0L
        else math.floor(inter.toDouble / un * 1e6 + 0.5).toLong
      val agr = (0 until 8).count(j => sigs(a)(j) == sigs(b)(j)).toLong
      (bucket, qj, agr)
    }
    val g = per.groupBy(_._1)
    val exp = (0L to 8L).map { bkt =>
      g.get(bkt) match {
        case None => (bkt, 0L, None, None)
        case Some(xs) =>
          val n = xs.size.toLong
          val sagr = xs.map(_._3).sum
          val sqj = xs.map(_._2).sum
          (bkt, n, Some(r6(sagr.toDouble / (8 * n))),
            Some(r6((sqj / n).toDouble / 1e6)))
      }
    }
    assert(got.toSeq === exp)
    // planted positives: twins land in bucket 8 at est 1.0, and the
    // gamma variants put mass in at least one other bucket — without
    // this the table would only restate the twin artifact
    val live = exp.filter(_._2 > 0).map(_._1)
    assert(live.contains(8L) && live.size >= 2,
      s"calibration fixture degenerate: only buckets $live occupied")
    spark.catalog.dropTempView("documents")
  }

  test("Kneser-Ney bigrams: SQL top-20 equals an independent count-and-smooth pass") {
    registerFixture()
    val got = spark.sql(SqlOps.ngramKneserNey.single(SparkDialect)).collect()
      .map(r => (r.getAs[String]("bigram"), r.getAs[Long]("c12"),
        r.getAs[Double]("p_kn"), r.getAs[Double]("p_ml")))
    // independent: bigram type/token counts over the ORIGINAL docs
    // (blm_tf reads documents, not the snapshot corpus)
    val bigrams = fixtureDocs.flatMap { case (_, text, _, _, _) => wshingles(text, 2) }
    val c12 = bigrams.groupBy(identity).map { case (s, xs) => s -> xs.size.toLong }
    val types = c12.keys.toSeq
    val pre = types.groupBy(_.split(" ")(0)).map { case (w1, ss) =>
      w1 -> (ss.map(c12).sum, ss.size.toLong)
    }
    val con = types.groupBy(s => s.split(" ")(1)).map { case (w2, ss) => w2 -> ss.size.toLong }
    val ndd = types.size.toLong
    val exp = types.map { s =>
      val Array(w1, w2) = s.split(" ")
      val (c1, n1w) = pre(w1)
      val num = (4 * c12(s) - 3) * ndd + 3 * n1w * con(w2)
      val den = 4 * c1 * ndd
      (s, c12(s), r6(num.toDouble / den.toDouble), r6(c12(s).toDouble / c1))
    }.sortBy { case (s, c, _, _) => (-c, s) }.take(20)
    assert(got.toSeq === exp)
    // planted positive: "the quick" style repeats give c12 > 1 rows and
    // the smoothing must keep every probability strictly inside (0,1)
    assert(exp.exists(_._2 > 1) && exp.forall(e => e._3 > 0 && e._3 < 1))
    spark.catalog.dropTempView("documents")
  }

  test("Wilson CI: SQL intervals equal an independent recompute from the counts") {
    registerFixture()
    val got = spark.sql(SqlOps.qualityWilson(SparkDialect)).collect()
    assert(got.length === 3) // alpha, beta, gamma
    got.foreach { r =>
      val n = r.getAs[Long]("n_docs").toDouble
      val k = r.getAs[Long]("n_pass").toDouble
      val p = k / n
      val den = 1.0 + 3.8416 / n
      val half = (1.96 / den) * math.sqrt(p * (1.0 - p) / n + 3.8416 / (4.0 * n * n))
      val center = (p + 3.8416 / (2 * n)) / den
      assert(r.getAs[Double]("pass_rate") === r6(p))
      assert(r.getAs[Double]("wilson_lo") === r6(center - half))
      assert(r.getAs[Double]("wilson_hi") === r6(center + half))
      // the interval must bracket the rate and stay inside [0,1]
      assert(r.getAs[Double]("wilson_lo") <= r6(p) && r6(p) <= r.getAs[Double]("wilson_hi"))
      assert(r.getAs[Double]("wilson_lo") >= 0.0 && r.getAs[Double]("wilson_hi") <= 1.0)
    }
    // planted contrast: long alpha/gamma docs pass, stub beta docs fail
    val byCol = got.map(r => r.getAs[String]("source") -> r.getAs[Long]("n_pass")).toMap
    assert(byCol("alpha") > 0 && byCol("beta") === 0,
      s"fixture lost its pass-rate contrast: $byCol")
    spark.catalog.dropTempView("documents")
  }

  test("partial correlation: SQL r-values equal an independent moments pass") {
    registerFixture()
    val got = spark.sql(SqlOps.qualityPartialCorr.single(SparkDialect)).collect()
    assert(got.length === 1)
    // independent scoring (the shipped quality formula, reimplemented)
    val stop = (SqlOps.STOP_EN ++ SqlOps.STOP_ID).toSet
    def quality(text: String): Double = {
      val toks = text.split(" ").toSeq
      val nW = toks.size.toDouble
      val stopRatio = toks.count(stop) / nW
      val avgW = text.replace(" ", "").length / nW
      math.min(nW / 100.0, 1.0) * 0.5 + (1.0 - stopRatio) * 0.3 +
        math.min(avgW / 8.0, 1.0) * 0.2
    }
    // candidate degree folded to original grain (corpus ids / 2)
    val deg = candPairs.toSeq.flatMap { case (a, b) => Seq(a / 2, b / 2) }
      .groupBy(identity).map { case (d, xs) => d -> xs.size.toLong }
    val v = fixtureDocs.map { case (id, text, _, _, nChars) =>
      (math.floor(quality(text) * 1e4 + 0.5).toLong,
        deg.getOrElse(id, 0L), nChars)
    }
    val n = v.size.toLong
    def s(f: ((Long, Long, Long)) => Long): Long = v.map(f).sum
    val (sx, sy, sz) = (s(_._1), s(_._2), s(_._3))
    val (sxx, syy, szz) = (s(t => t._1 * t._1), s(t => t._2 * t._2), s(t => t._3 * t._3))
    val (sxy, sxz, syz) = (s(t => t._1 * t._2), s(t => t._1 * t._3), s(t => t._2 * t._3))
    def cv(nab: Long, a: Long, b: Long): Double = n.toDouble * nab - a.toDouble * b
    val (cxx, cyy, czz) = (cv(sxx, sx, sx), cv(syy, sy, sy), cv(szz, sz, sz))
    val rxy = cv(sxy, sx, sy) / math.sqrt(cxx * cyy)
    val rxz = cv(sxz, sx, sz) / math.sqrt(cxx * czz)
    val ryz = cv(syz, sy, sz) / math.sqrt(cyy * czz)
    val rp = (rxy - rxz * ryz) / math.sqrt((1.0 - rxz * rxz) * (1.0 - ryz * ryz))
    val row = got(0)
    assert(row.getAs[Long]("n_docs") === n)
    assert(row.getAs[Double]("r_quality_dup") === r6(rxy))
    assert(row.getAs[Double]("r_quality_len") === r6(rxz))
    assert(row.getAs[Double]("r_dup_len") === r6(ryz))
    assert(row.getAs[Double]("r_partial") === r6(rp))
    // planted positive: the beta stubs are short AND low-degree, so
    // every raw correlation is non-degenerate (non-NULL, nonzero)
    assert(math.abs(rxy) > 1e-6 && math.abs(rxz) > 1e-6 && math.abs(ryz) > 1e-6)
    spark.catalog.dropTempView("documents")
  }
}
