package graft.ops

import graft.SparkSpec

/** Independent micro-oracles for shared-SQL algorithmic ops.
  *
  * The dual-dialect oracle gate renders the SAME SQL semantics on Spark
  * and DuckDB, so a bug both engines agree on is invisible to the
  * hash-match (proven by the round-5 BPE fuse incident). Each test here
  * recomputes the operator from first principles in plain Scala on a
  * crafted input — a second, structurally unrelated implementation —
  * and asserts the SQL result equal. Nothing below reuses the SQL
  * fragments, Dialect helpers, or each other's arithmetic.
  */
class MicroOracleSpec extends SparkSpec {

  private def r6(x: Double): Double = math.floor(x * 1.0e6 + 0.5) / 1.0e6
  private def bits(x: Long): Int = 64 - java.lang.Long.numberOfLeadingZeros(x)

  test("changepoint: SQL argmax split equals an independent binary-segmentation scan") {
    import spark.implicits._
    import java.sql.Date
    graft.functions.GraftFunctions.registerAll(spark)
    // 30 days of revenue with a planted mean shift after day 20, plus
    // in-day multiplicity (3 orders/day) so the daily rollup matters
    val base = java.time.LocalDate.of(1995, 3, 1)
    val rows = for {
      d <- 0 until 30
      k <- 0 until 3
    } yield {
      val level = if (d < 20) 100.0 else 180.0
      // deterministic jitter, including .005 cents cases that exercise
      // the half-up cent quantization
      val price = level + (d * 7 + k * 3) % 11 + 0.005 * ((d + k) % 3)
      (Date.valueOf(base.plusDays(d.toLong)), price)
    }
    rows.toDF("o_orderdate", "o_totalprice").createOrReplaceTempView("orders")
    val got = spark.sql(SqlOps.changepointRevenue(SparkDialect)).collect()
    assert(got.length === 1)

    // ---- independent implementation ----
    // daily cents, keyed by epoch day
    val daily = rows.groupBy { case (dt, _) => dt.toLocalDate.toEpochDay }
      .map { case (day, rs) =>
        day -> rs.map { case (_, p) => math.floor(p * 100.0 + 0.5).toLong }.sum
      }.toSeq.sortBy(_._1)
    val tn = daily.size.toLong
    val tsum = daily.map(_._2).sum
    var lsum = 0L
    val scored = daily.zipWithIndex.dropRight(1).map { case ((day, cents), i) =>
      lsum += cents
      val ln = i + 1L
      val rawScore = math.abs(lsum.toDouble / ln - (tsum - lsum).toDouble / (tn - ln)) *
        math.sqrt(ln.toDouble * (tn - ln) / tn) / 100.0
      (day, r6(rawScore))
    }
    val (expDay, expScore) = scored.minBy { case (day, s) => (-s, day) }
    assert(expDay === base.plusDays(19).toEpochDay,
      "sanity: the best split must land on the last pre-shift day")
    assert(got(0).getAs[Long]("split_day") === expDay)
    assert(got(0).getAs[Double]("score") === expScore)
    spark.catalog.dropTempView("orders")
  }

  test("bigram PMI: SQL top-k equals an independent count-and-score pass") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    // crafted corpus: "new york" is a true collocation (always
    // together), "the cat" / "the dog" share the frequent "the", and
    // filler inflates the corpus size. Single-space text keeps the
    // independent whitespace tokenizer faithful to word_shingles.
    val docs = (0 until 12).map { i =>
      val phrases = Seq.fill(3)("new york") ++
        Seq("the cat", "the dog", "the cat sat", s"filler$i one two") ++
        Seq.fill(4)("the")
      (i.toLong, phrases.mkString(" "))
    }
    docs.toDF("doc_id", "text").createOrReplaceTempView("documents")
    val got = spark.sql(SqlOps.bigramPmi.single(SparkDialect)).collect()
      .map(r => (r.getAs[String]("bigram"), r.getAs[Long]("c12"), r.getAs[Int]("pmi_bits")))

    // ---- independent implementation ----
    val toks = docs.flatMap { case (_, t) => t.split(" ", -1) }
    val uni = toks.groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
    val nu = toks.size.toLong
    val bi = docs.flatMap { case (_, t) =>
      val ws = t.split(" ", -1); ws.zip(ws.drop(1)).map { case (a, b) => s"$a $b" }
    }.groupBy(identity).map { case (s, xs) => s -> xs.size.toLong }
    val expected = bi.toSeq.collect { case (s, c12) if c12 >= 5 =>
      val Array(w1, w2) = s.split(" ", -1)
      (s, c12, (bits(c12) + bits(nu)) - (bits(uni(w1)) + bits(uni(w2))))
    }.sortBy { case (s, _, p) => (-p, s) }.take(20)
    assert(got.toSeq === expected)
    // sanity: both planted perfect collocations outrank the
    // frequent-word pair "the cat" (the filler pair "one two" is a
    // perfect collocation too, with smaller marginals)
    def pmiOf(s: String) = expected.find(_._1 == s).map(_._3)
    assert(pmiOf("new york").exists(p => pmiOf("the cat").forall(_ < p)))
    spark.catalog.dropTempView("documents")
  }

  test("DSIR weights: SQL top-k equals an independent hash-and-score pass") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    // crafted corpus: the 'en' target slice lives on vocab {alpha,
    // beta, gamma}, the rest on {delta, epsilon}, one mixed doc, one
    // shared token everywhere. Single-space text keeps the independent
    // whitespace tokenizer faithful to word_shingles.
    val docs = Seq(
      (0L, "en", "alpha beta alpha gamma common"),
      (1L, "en", "beta beta gamma common"),
      (2L, "en", "alpha gamma gamma alpha common"),
      (3L, "de", "delta epsilon delta common"),
      (4L, "de", "epsilon epsilon delta common"),
      (5L, "fr", "delta alpha epsilon common"),
      (6L, "fr", "delta delta epsilon epsilon common"))
    docs.map { case (id, lang, t) => (id, t, lang, s"src$id", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .createOrReplaceTempView("documents")
    SqlOps.dsirWeights.stages.foreach { case (name, build) =>
      spark.sql(build(SparkDialect)).localCheckpoint().createOrReplaceTempView(name)
    }
    val got = spark.sql(SqlOps.dsirWeights.body(SparkDialect)).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("weight_bits")))

    // ---- independent implementation ----
    def md5b(s: String): Int = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      d(0) & 0xff
    }
    def qlog(x: Long): Long =
      math.floor(math.log(x.toDouble) / math.log(2.0) * 1.0e6 + 0.5).toLong
    val tf = docs.flatMap { case (id, lang, t) =>
      t.split(" ", -1).groupBy(identity).map { case (w, xs) =>
        (id, lang, md5b(w), xs.length.toLong)
      }
    }
    val buckets = tf.map(_._3).distinct
    val ct = buckets.map(b => b ->
      tf.collect { case (_, "en", `b`, n) => n }.sum).toMap
    val cs = buckets.map(b => b ->
      tf.collect { case (_, _, `b`, n) => n }.sum).toMap
    val (nt, ns) = (ct.values.sum, cs.values.sum)
    val sbits = buckets.map(b => b ->
      ((qlog(ct(b) + 1) + qlog(ns + 256)) - (qlog(cs(b) + 1) + qlog(nt + 256)))).toMap
    val expected = docs.map { case (id, lang, _) =>
      val mine = tf.filter(_._1 == id)
      (id, lang, mine.map(_._4).sum, mine.map { case (_, _, b, n) => n * sbits(b) }.sum)
    }.sortBy { case (id, _, _, w) => (-w, id) }.take(50)
    assert(got.toSeq === expected)
    // sanity: every en doc outweighs every pure non-target doc
    val wOf = expected.map(e => e._1 -> e._4).toMap
    for (e <- Seq(0L, 1L, 2L); o <- Seq(3L, 4L, 6L)) assert(wOf(e) > wOf(o))
    spark.catalog.dropTempView("documents")
  }

  test("margin mining: SQL pairs equal an independent margin-criterion pass") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    val dim = 64
    val rnd = new scala.util.Random(11)
    def vec(f: Int => Float): Seq[Float] = Seq.tabulate(dim)(f)
    def noisy(base: Seq[Float], eps: Float): Seq[Float] =
      base.zipWithIndex.map { case (x, _) => x + (rnd.nextFloat() - 0.5f) * eps }
    val q0 = vec(j => if (j < 8) 1f else 0.01f * j)
    val q1 = vec(j => if (j >= 8 && j < 16) 1f else -0.01f * j)
    val q2 = vec(j => math.sin(j.toDouble).toFloat)
    // queries: even AND % 50 == 0; database: odd ids — including true
    // matches for q0/q1, a HUB vector (midway between everything, so
    // raw cosine likes it but the margin should suppress it), and
    // fillers
    val rows: Seq[(Long, Seq[Float])] =
      Seq(0L -> q0, 50L -> q1, 100L -> q2) ++
      Seq(1L -> noisy(q0, 0.2f), 3L -> noisy(q1, 0.2f),
        5L -> q0.zip(q1).map { case (a, b) => (a + b) / 2 }, // hub
        7L -> noisy(q2, 0.3f), 9L -> vec(j => ((j * 37) % 11 - 5).toFloat / 7f),
        11L -> noisy(q0, 0.9f), 13L -> noisy(q1, 0.9f),
        15L -> vec(j => ((j * 13) % 17 - 8).toFloat / 9f)) ++
      // extra even ids (not % 50) prove the query slice is respected
      Seq(2L -> noisy(q0, 0.1f), 4L -> noisy(q1, 0.1f))
    rows.map { case (id, v) => (id, 0, v) }.toDF("vec_id", "label", "embedding")
      .selectExpr("vec_id", "label", "CAST(embedding AS ARRAY<FLOAT>) AS embedding")
      .createOrReplaceTempView("embeddings")
    SqlOps.annMargin.stages.foreach { case (name, build) =>
      spark.sql(build(SparkDialect)).localCheckpoint().createOrReplaceTempView(name)
    }
    val got = spark.sql(SqlOps.annMargin.body(SparkDialect)).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("pair_id"),
        r.getAs[Long]("qcos"), r.getAs[Double]("margin"),
        r.getAs[Number]("rk").longValue())).sortBy(t => (t._1, t._5))

    // ---- independent implementation (k = 4) ----
    val k = 4
    val byId = rows.toMap
    def qcos(a: Seq[Float], b: Seq[Float]): Long = {
      val dot = (0 until dim).map(i => a(i).toDouble * b(i).toDouble).sum
      def nrm(x: Seq[Float]) = math.sqrt((0 until dim).map(i => x(i).toDouble * x(i).toDouble).sum)
      math.floor(dot / (nrm(a) * nrm(b)) * 1.0e6 + 0.5).toLong
    }
    val queries = rows.map(_._1).filter(id => id % 50 == 0 && id % 2 == 0).sorted
    val odd = rows.map(_._1).filter(_ % 2 == 1).sorted
    val even = rows.map(_._1).filter(_ % 2 == 0).sorted
    val top = queries.map { qa =>
      qa -> odd.map(qb => qb -> qcos(byId(qa), byId(qb)))
        .sortBy { case (qb, c) => (-c, qb) }.take(k)
    }.toMap
    val aavg = top.map { case (qa, ns) => qa -> (ns.map(_._2).sum, ns.size.toLong) }
    val bavg = top.values.flatten.map(_._1).toSeq.distinct.map { qb =>
      val ns = even.map(qa2 => qa2 -> qcos(byId(qb), byId(qa2)))
        .sortBy { case (qa2, c) => (-c, qa2) }.take(k)
      qb -> (ns.map(_._2).sum, ns.size.toLong)
    }.toMap
    val expected = queries.flatMap { qa =>
      top(qa).flatMap { case (qb, c) =>
        val (as_, ca) = aavg(qa)
        val (bs, cb) = bavg(qb)
        val den = as_ * cb + bs * ca
        if (den > 0) Some((qb, c, r6(2.0 * c * ca * cb / den))) else None
      }.sortBy { case (qb, _, m) => (-m, qb) }.take(2).zipWithIndex
        .map { case ((qb, c, m), i) => (qa, qb, c, m, i + 1L) }
    }.sortBy(t => (t._1, t._5))
    assert(got.toSeq === expected)
    assert(expected.size === queries.size * 2)
    // sanity: the hub partner never wins rank 1 for q0 or q1 — its raw
    // cosine is high for both, but the margin normalizes it away
    for (qa <- Seq(0L, 50L))
      assert(got.find(t => t._1 == qa && t._5 == 1L).get._2 !== 5L)
    spark.catalog.dropTempView("embeddings")
  }

  test("semantic dedup: SQL survivors equal an independent SemDeDup reimplementation") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    val dim = 64
    val rnd = new scala.util.Random(7)
    // 3 clusters; each point = center + noise. Points 100/101 and
    // 200/201 are PLANTED near-identical pairs (dup evidence no matter
    // how the noise falls); the zero vector exercises the nrm>0 gate.
    val centers = Array.fill(3, dim)(rnd.nextFloat() * 2f - 1f)
    val vecs: Seq[(Long, Int, Seq[Float])] =
      (0 until 24).map { i =>
        val lbl = i % 3
        val v = Array.tabulate(dim)(j => centers(lbl)(j) + (rnd.nextFloat() - 0.5f) * 0.8f)
        (i.toLong, lbl, v.toSeq)
      } ++ Seq(100L, 200L).flatMap { base =>
        val lbl = (base / 100).toInt % 3
        val v = Array.tabulate(dim)(j => centers(lbl)(j) + (rnd.nextFloat() - 0.5f) * 0.8f)
        Seq((base, lbl, v.toSeq),
          (base + 1, lbl, v.map(x => x * 1.0005f).toSeq))
      } :+ ((999L, 0, Seq.fill(dim)(0f)))
    vecs.toDF("vec_id", "label", "embedding")
      .selectExpr("vec_id", "label", "CAST(embedding AS ARRAY<FLOAT>) AS embedding")
      .createOrReplaceTempView("embeddings")
    SqlOps.dedupSemantic.stages.foreach { case (name, build) =>
      spark.sql(build(SparkDialect)).localCheckpoint().createOrReplaceTempView(name)
    }
    val got = spark.sql(SqlOps.dedupSemantic.body(SparkDialect)).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Number]("cell").intValue(),
        r.getAs[Number]("rk").longValue())).toSet

    // ---- independent implementation ----
    def quant(v: Float): Long = math.floor(v.toDouble * 1.0e6 + 0.5).toLong
    def qmean(xs: Seq[Long]): Long = math.floor(xs.sum.toDouble / xs.size + 0.5).toLong
    val data = vecs.collect { case (id, lbl, v)
      if v.map(x => x.toDouble * x.toDouble).sum > 0 => (id, lbl, v.toArray) }
    // centroids train over ALL embeddings (the cent CTE has no norm
    // gate), assignment runs over the norm-filtered emb_nv
    val cent: Map[(Int, Int), Long] = vecs.groupBy(_._2).flatMap { case (lbl, vs) =>
      (0 until dim).map(p => (lbl, p) -> qmean(vs.map(t => quant(t._3(p)))))
    }
    val labels = cent.keys.map(_._1).toSeq.distinct.sorted
    def l2(q: Array[Long], lbl: Int): Long =
      (0 until dim).map(p => { val d = q(p) - cent((lbl, p)); d * d }).sum
    val cellOf: Map[Long, Int] = data.map { case (id, _, v) =>
      val q = v.map(quant)
      id -> labels.minBy(l => (l2(q, l), l))
    }.toMap
    val d2own: Map[Long, Long] = data.map { case (id, _, v) =>
      id -> l2(v.map(quant), cellOf(id))
    }.toMap
    // per-cell keep-order: distance DESC, id ASC
    val rank: Map[Long, Long] = data.groupBy(t => cellOf(t._1)).values.flatMap { members =>
      members.map(_._1).sortBy(id => (-d2own(id), id)).zipWithIndex
        .map { case (id, i) => id -> (i + 1L) }
    }.toMap
    def cosine(a: Array[Float], b: Array[Float]): Double = {
      val dot = (0 until dim).map(i => a(i).toDouble * b(i).toDouble).sum
      def nrm(x: Array[Float]) = math.sqrt((0 until dim).map(i => x(i).toDouble * x(i).toDouble).sum)
      r6(dot / (nrm(a) * nrm(b)))
    }
    val byId = data.map(t => t._1 -> t._3).toMap
    val dropped = data.map(_._1).filter { x =>
      data.map(_._1).exists { y =>
        y != x && cellOf(y) == cellOf(x) && rank(y) < rank(x) &&
          cosine(byId(x), byId(y)) >= 0.35
      }
    }.toSet
    val expected = data.map(_._1).filterNot(dropped)
      .map(id => (id, cellOf(id), rank(id))).toSet
    assert(got === expected)
    // sanity: each planted pair lost exactly its earlier-ranked member,
    // the zero vector is absent (not a survivor, not an input), and
    // survivors are nonempty
    assert(dropped.nonEmpty && expected.nonEmpty)
    for (base <- Seq(100L, 200L))
      assert(dropped.contains(base) || dropped.contains(base + 1))
    assert(!got.exists(_._1 == 999L))
    spark.catalog.dropTempView("embeddings")
  }

  test("residual IVF-PQ: SQL top-5 equals an independent full-pipeline reimplementation") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    val dim = 64
    val rnd = new scala.util.Random(42)
    // 3 query ids (vec_id % 50 == 0) + 27 database vectors in 3
    // label-clustered groups so cells, residuals, and neighbors are
    // all non-trivial
    val centers = Array.fill(3, dim)(rnd.nextFloat() * 2f - 1f)
    val ids = Seq(0L, 50L, 100L) ++ (1L to 27L).filterNot(_ % 50 == 0)
    val vecs = ids.zipWithIndex.map { case (id, i) =>
      val lbl = i % 3
      val v = Array.tabulate(dim)(j => centers(lbl)(j) + (rnd.nextFloat() - 0.5f) * 0.4f)
      (id, lbl, v.toSeq)
    }
    vecs.toDF("vec_id", "label", "embedding")
      .selectExpr("vec_id", "label", "CAST(embedding AS ARRAY<FLOAT>) AS embedding")
      .createOrReplaceTempView("embeddings")
    // run the staged pipeline: materialize each stage as a temp view
    // with truncated lineage (localCheckpoint) — the chain is 6 stages
    // deep and Spark would otherwise re-inline the whole prefix per
    // reference
    SqlOps.annIvfPq.stages.foreach { case (name, build) =>
      val df = spark.sql(build(SparkDialect)).localCheckpoint()
      df.createOrReplaceTempView(name)
    }
    val got = spark.sql(SqlOps.annIvfPq.body(SparkDialect)).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Double]("cosine"), r.getAs[Number]("rk").longValue()))
      .sortBy(t => (t._1, t._4))

    // ---- independent implementation (m=4 blocks of bs=16) ----
    val (m, bs) = (4, 16)
    def quant(v: Float): Long = math.floor(v.toDouble * 1.0e6 + 0.5).toLong
    def qmean(xs: Seq[Long]): Long = math.floor(xs.sum.toDouble / xs.size + 0.5).toLong
    val data = vecs.map { case (id, lbl, v) => (id, lbl, v.toArray) }
    // coarse centroids: per-(label, pos) quantized means
    val cent: Map[(Int, Int), Long] = data.groupBy(_._2).flatMap { case (lbl, vs) =>
      (0 until dim).map(p => (lbl, p) -> qmean(vs.map(t => quant(t._3(p)))))
    }
    val labels = cent.keys.map(_._1).toSeq.distinct.sorted
    def l2ToCent(q: Array[Long], lbl: Int): Long =
      (0 until dim).map(p => { val d = q(p) - cent((lbl, p)); d * d }).sum
    // cell assignment: argmin, ties to the smaller label
    val cellOf: Map[Long, Int] = data.map { case (id, _, v) =>
      val q = v.map(quant)
      id -> labels.minBy(l => (l2ToCent(q, l), l))
    }.toMap
    // residuals per (vec, pos)
    val res: Map[Long, Array[Long]] = data.map { case (id, _, v) =>
      id -> Array.tabulate(dim)(p => quant(v(p)) - cent((cellOf(id), p)))
    }.toMap
    // codebook: 6-bit sign seed, then two Lloyd rounds
    def signBucket(r: Array[Long], block: Int): Int =
      (0 until 6).map(i => if (r(block * bs + i) >= 0) 1 << i else 0).sum
    type Cb = Map[(Int, Int), Array[Long]] // (block, cw) -> 16 components
    def means(assign: Map[(Long, Int), Int]): Cb =
      assign.toSeq.groupBy { case ((_, b), cw) => (b, cw) }.map { case ((b, cw), members) =>
        (b, cw) -> Array.tabulate(bs)(i =>
          qmean(members.map { case ((id, _), _) => res(id)(b * bs + i) }))
      }
    def encode(cb: Cb): Map[(Long, Int), Int] =
      (for (id <- res.keys.toSeq; b <- 0 until m) yield {
        val cws = cb.keys.collect { case (`b`, cw) => cw }.toSeq
        val best = cws.minBy { cw =>
          val c = cb((b, cw))
          ((0 until bs).map(i => { val d = res(id)(b * bs + i) - c(i); d * d }).sum, cw)
        }
        (id, b) -> best
      }).toMap
    val seed: Map[(Long, Int), Int] =
      (for (id <- res.keys.toSeq; b <- 0 until m) yield (id, b) -> signBucket(res(id), b)).toMap
    var cb = means(seed)
    for (_ <- 1 to 2) cb = means(encode(cb))
    val codes = encode(cb)
    // read path per query
    val queries = ids.filter(_ % 50 == 0)
    val expected = queries.flatMap { qid =>
      val q = data.find(_._1 == qid).get._3.map(quant)
      val probes = labels.sortBy(l => (l2ToCent(q, l), l)).take(2)
      val adc = probes.flatMap { cell =>
        val qr = Array.tabulate(dim)(p => q(p) - cent((cell, p)))
        val lut: Map[(Int, Int), Long] =
          cb.map { case ((b, cw), c) =>
            (b, cw) -> (0 until bs).map(i => { val d = qr(b * bs + i) - c(i); d * d }).sum
          }
        data.collect { case (id, _, _) if cellOf(id) == cell && id != qid =>
          id -> (0 until m).map(b => lut((b, codes((id, b))))).sum
        }
      }
      val shortlist = adc.sortBy { case (id, d) => (d, id) }.take(20).map(_._1)
      def fvec(id: Long) = data.find(_._1 == id).get._3
      def cosine(a: Array[Float], b: Array[Float]): Double = {
        val dot = (0 until dim).map(i => a(i).toDouble * b(i).toDouble).sum
        def nrm(x: Array[Float]) = math.sqrt((0 until dim).map(i => x(i).toDouble * x(i).toDouble).sum)
        r6(dot / (nrm(a) * nrm(b)))
      }
      shortlist.map(nid => (nid, cosine(fvec(qid), fvec(nid))))
        .sortBy { case (nid, c) => (-c, nid) }.take(5).zipWithIndex
        .map { case ((nid, c), i) => (qid, nid, c, i + 1L) }
    }.sortBy(t => (t._1, t._4))
    assert(got.toSeq === expected)
    assert(expected.nonEmpty && expected.size === queries.size * 5)
    spark.catalog.dropTempView("embeddings")
  }
}
