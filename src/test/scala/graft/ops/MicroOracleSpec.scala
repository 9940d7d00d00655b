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

  test("power-iteration PCA: SQL component equals an independent int64 implementation") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    // crafted matrix: spread along u dominates spread along w, so the
    // true first principal component is u/|u|
    val dim = 6
    val u = Array(3.0, 1.0, 0.0, 2.0, 0.0, 1.0)
    val w = Array(-1.0, 2.0, 1.0, 0.0, 1.0, 0.5)
    val data: Seq[(Long, Array[Float])] = (0 until 40).map { i =>
      val a = ((i * 7) % 13) - 6.0
      val b = ((i * 3) % 5) - 2.0
      i.toLong -> Array.tabulate(dim)(j => (a * u(j) + 0.3 * b * w(j)).toFloat)
    }
    data.map { case (id, v) => (id, v, 0) }
      .toDF("vec_id", "embedding", "label").createOrReplaceTempView("embeddings")
    SqlOps.pcaPower.stages.foreach { case (name, build) =>
      spark.sql(build(SparkDialect)).localCheckpoint().createOrReplaceTempView(name)
    }
    val got = spark.sql(SqlOps.pcaPower.body(SparkDialect)).collect()
      .map(r => (r.getAs[Long]("pos"), r.getAs[Double]("component"))).sortBy(_._1)

    // ---- independent implementation (same int64 spec, no SQL) ----
    def fd(a: Long, b: Long): Long = Math.floorDiv(a, b) // b > 0
    val qv: Map[(Long, Int), Long] = data.flatMap { case (id, v) =>
      v.zipWithIndex.map { case (x, p) =>
        (id, p) -> math.floor(x.toDouble * 1e6 + 0.5).toLong
      }
    }.toMap
    val n = data.size.toLong
    val mu = Array.tabulate(dim)(p => fd(data.map(d => qv((d._1, p))).sum, n))
    val cv: Map[(Long, Int), Long] =
      qv.map { case ((id, p), x) => (id, p) -> (x - mu(p)) }
    def rescale(xs: Seq[Long]): Seq[Long] = {
      val mx = math.max(xs.map(math.abs).max, 1L)
      val dm = 1L + (mx - 1L) / 1000000L
      xs.map(fd(_, dm))
    }
    var v: Array[Long] = Array.fill(dim)(1000000L)
    var wv: Array[Long] = null
    for (_ <- 1 to 3) {
      val s = data.map { case (id, _) => (0 until dim).map(p => cv((id, p)) * v(p)).sum }
      val sn = rescale(s)
      wv = Array.tabulate(dim) { p =>
        data.zip(sn).map { case ((id, _), sni) => cv((id, p)) * sni }.sum
      }
      v = rescale(wv.toSeq).toArray
    }
    val expected = (0 until dim).map(p => (p.toLong, r6(v(p).toDouble / 1e6)))
    assert(got.toSeq === expected)
    // the driver-loop execution path (q_pca_power_iter's) must replay
    // the same integers off the same staged matrix + envelope views
    val gotPL = graft.ops.PcaLoop.powerComponent1(spark).collect()
      .map(r => (r.getAs[Long]("pos"), r.getAs[Double]("component"))).sortBy(_._1)
    assert(gotPL.toSeq === expected)
    // convergence sanity: the learned direction aligns with u
    val nv = math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)
    val nu = math.sqrt(u.map(x => x * x).sum)
    val cos = (0 until dim).map(p => v(p).toDouble * u(p)).sum / (nv * nu)
    assert(math.abs(cos) > 0.99, s"component should align with the planted direction, cos=$cos")

    // ---- read path: projection + alignment off the same stages ----
    val gotP = spark.sql(SqlOps.pcaProject.body(SparkDialect)).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Double]("proj"), r.getAs[Double]("align2")))
      .sortBy(_._1)
    val nv2 = v.map(x => x * x).sum
    val expP = data.map { case (id, _) =>
      val t = (0 until dim).map(p => cv((id, p)) * v(p)).sum
      val ss = (0 until dim).map(p => cv((id, p)) * cv((id, p))).sum
      val proj = r6(t.toDouble / 1e6 / math.sqrt(nv2.toDouble))
      val a2 = r6(t.toDouble * t.toDouble / (ss.toDouble * nv2.toDouble))
      (id, proj, a2)
    }.sortBy(_._1)
    assert(gotP.toSeq === expP)
    // pure-u rows (b == 0 → i*3 % 5 == 2) are fully explained by the
    // learned direction; mixed rows are not
    val pureU = data.collect { case (id, _) if (id * 3) % 5 == 2 => id }.toSet
    assert(expP.filter(e => pureU(e._1)).forall(_._3 > 0.99))

    // ---- deflation: second component off the same stages ----
    SqlOps.pcaDeflate.stages.drop(SqlOps.pcaPower.stages.size).foreach { case (name, build) =>
      spark.sql(build(SparkDialect)).localCheckpoint().createOrReplaceTempView(name)
    }
    val gotD = spark.sql(SqlOps.pcaDeflate.body(SparkDialect)).collect()
      .map(r => (r.getAs[Long]("pos"), r.getAs[Double]("component2"))).sortBy(_._1)
    // independent deflation with the same spec: double-rounded rank-one
    // subtraction, then the same int64 power iteration
    val cv2: Map[(Long, Int), Long] = data.flatMap { case (id, _) =>
      val t = (0 until dim).map(p => cv((id, p)) * v(p)).sum
      (0 until dim).map { p =>
        (id, p) -> (cv((id, p)) -
          math.floor(t.toDouble * v(p).toDouble / nv2.toDouble + 0.5).toLong)
      }
    }.toMap
    var v2: Array[Long] = Array.fill(dim)(1000000L)
    for (_ <- 1 to 3) {
      val s = data.map { case (id, _) => (0 until dim).map(p => cv2((id, p)) * v2(p)).sum }
      val sn = rescale(s)
      val wv2 = Array.tabulate(dim) { p =>
        data.zip(sn).map { case ((id, _), sni) => cv2((id, p)) * sni }.sum
      }
      v2 = rescale(wv2.toSeq).toArray
    }
    val expD = (0 until dim).map(p => (p.toLong, r6(v2(p).toDouble / 1e6)))
    assert(gotD.toSeq === expD)
    // the driver-loop execution path (the one q_pca_deflate ships) must
    // replay the same integers: loop == staged SQL == independent Scala
    val gotL = graft.ops.PcaLoop.deflateComponent2(spark).collect()
      .map(r => (r.getAs[Long]("pos"), r.getAs[Double]("component2"))).sortBy(_._1)
    assert(gotL.toSeq === expD)
    // the second component aligns with the planted minor direction w
    // (after orthogonalizing w against u) and is orthogonal to v1
    val nw = math.sqrt(w.map(x => x * x).sum)
    val n2 = math.sqrt(v2.map(x => x.toDouble * x.toDouble).sum)
    val cosW = (0 until dim).map(p => v2(p).toDouble * w(p)).sum / (n2 * nw)
    assert(math.abs(cosW) > 0.9, s"component2 should mostly align with w, cos=$cosW")
    val cos12 = (0 until dim).map(p => v2(p).toDouble * v(p)).sum /
      (n2 * math.sqrt(v.map(x => x.toDouble * x.toDouble).sum))
    assert(math.abs(cos12) < 0.02, s"components must be near-orthogonal, cos=$cos12")
    spark.catalog.dropTempView("embeddings")
  }

  test("power-iteration PCA at the overflow boundary: the rescale target auto-scales " +
      "from the staged envelope where the fixed 1e6 target would wrap int64") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    // the same planted directions, magnified 1e6×: µ-quantized entries
    // reach ~1.8e13, so n_vec·mxcv·1e6 ≈ 7e20 — far past int64. The
    // adaptive target must drop below 1e6 and keep every sum exact.
    val dim = 6
    val u = Array(3.0, 1.0, 0.0, 2.0, 0.0, 1.0)
    val w = Array(-1.0, 2.0, 1.0, 0.0, 1.0, 0.5)
    val data: Seq[(Long, Array[Float])] = (0 until 40).map { i =>
      val a = ((i * 7) % 13) - 6.0
      val b = ((i * 3) % 5) - 2.0
      i.toLong -> Array.tabulate(dim)(j => ((a * u(j) + 0.3 * b * w(j)) * 1.0e6).toFloat)
    }
    data.map { case (id, v) => (id, v, 0) }
      .toDF("vec_id", "embedding", "label").createOrReplaceTempView("embeddings")
    SqlOps.pcaPower.stages.foreach { case (name, build) =>
      spark.sql(build(SparkDialect)).localCheckpoint().createOrReplaceTempView(name)
    }
    val got = spark.sql(SqlOps.pcaPower.body(SparkDialect)).collect()
      .map(r => (r.getAs[Long]("pos"), r.getAs[Double]("component"))).sortBy(_._1)

    // ---- independent mirror of the ADAPTIVE spec ----
    def fd(a: Long, b: Long): Long = Math.floorDiv(a, b)
    val qv: Map[(Long, Int), Long] = data.flatMap { case (id, vv) =>
      vv.zipWithIndex.map { case (x, p) =>
        (id, p) -> math.floor(x.toDouble * 1e6 + 0.5).toLong
      }
    }.toMap
    val n = data.size.toLong
    val mu = Array.tabulate(dim)(p => fd(data.map(d => qv((d._1, p))).sum, n))
    val cv: Map[(Long, Int), Long] =
      qv.map { case ((id, p), x) => (id, p) -> (x - mu(p)) }
    val mxcv = math.max(cv.values.map(math.abs).max, 1L)
    def target(terms: Long): Long =
      math.max(1L, math.min(1000000L, fd(fd(9200000000000000000L, mxcv), terms)))
    val tV = target(dim.toLong)  // feeds the matvec (sums over pos)
    val tS = target(n)           // feeds the vecmat (sums over vec_id)
    assert(tV < 1000000L && tS < 1000000L,
      s"the fixture must actually engage the adaptive target, tV=$tV tS=$tS")
    // prove the boundary is real: under the OLD fixed 1e6 interior
    // target the first vecmat's true sum exceeds int64 for some pos
    // (Spark would WRAP silently — the failure this machinery removes)
    def rescaleTo(xs: Seq[Long], t: Long): Seq[Long] = {
      val mx = math.max(xs.map(math.abs).max, 1L)
      val dm = 1L + (mx - 1L) / t
      xs.map(fd(_, dm))
    }
    {
      val s0 = data.map { case (id, _) => (0 until dim).map(p => BigInt(cv((id, p))) * 1000000L).sum }
      val sn0 = {
        val mx = s0.map(_.abs).max.max(BigInt(1))
        val dm = BigInt(1) + (mx - 1) / 1000000L
        s0.map(x => x / dm) // BigInt / truncates toward zero, close enough for a magnitude proof
      }
      val w0 = (0 until dim).map { p =>
        data.zip(sn0).map { case ((id, _), sni) => BigInt(cv((id, p))) * sni }.sum }
      assert(w0.map(_.abs).max > BigInt(Long.MaxValue),
        "fixture must overflow int64 under the fixed target, else this test proves nothing")
    }
    var v: Array[Long] = Array.fill(dim)(tV)
    var wv: Array[Long] = null
    for (r <- 1 to 3) {
      val s = data.map { case (id, _) => (0 until dim).map(p => cv((id, p)) * v(p)).sum }
      val sn = rescaleTo(s, tS)
      wv = Array.tabulate(dim) { p =>
        data.zip(sn).map { case ((id, _), sni) => cv((id, p)) * sni }.sum
      }
      // interior rescale (to tV) happens when the NEXT round's matvec
      // consumes w; the final w3 is rescaled only by the body, at the
      // fixed OUTPUT target — rescaling it to tV first would discard
      // output resolution the SQL keeps
      if (r < 3) v = rescaleTo(wv.toSeq, tV).toArray
    }
    val vOut = rescaleTo(wv.toSeq, 1000000L)
    val expected = (0 until dim).map(p => (p.toLong, r6(vOut(p).toDouble / 1e6)))
    assert(got.toSeq === expected)
    // the driver loop derives its targets from the same envelope —
    // the overflow boundary is exactly where its host-side target()
    // twin would silently diverge from pcaTargetCte, so pin it here
    val gotPL = graft.ops.PcaLoop.powerComponent1(spark).collect()
      .map(r => (r.getAs[Long]("pos"), r.getAs[Double]("component"))).sortBy(_._1)
    assert(gotPL.toSeq === expected)
    // and it still converges to the planted direction
    val nv = math.sqrt(vOut.map(x => x.toDouble * x.toDouble).sum)
    val nu = math.sqrt(u.map(x => x * x).sum)
    val cos = (0 until dim).map(p => vOut(p).toDouble * u(p)).sum / (nv * nu)
    assert(math.abs(cos) > 0.99, s"component should align with the planted direction, cos=$cos")
    spark.catalog.dropTempView("embeddings")
  }

  test("histogram quantiles: SQL estimates equal an independent sketch and bracket truth") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    // two types with different shapes; .005 values exercise the cent
    // rounding; 'b' is right-skewed so p99 lands in a sparse bin
    val rows: Seq[(String, Double)] =
      (0 until 200).map(i => ("a", (i % 100) + 0.005 * (i % 3))) ++
      (0 until 200).map(i => ("b", math.pow(1.04, (i * 37) % 200)))
    rows.toDF("event_type", "value").createOrReplaceTempView("events")
    val got = spark.sql(SqlOps.histogramQuantiles(SparkDialect)).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("n"),
        r.getAs[Double]("p50_est"), r.getAs[Double]("p95_est"), r.getAs[Double]("p99_est")))
      .sortBy(_._1)

    // ---- independent implementation ----
    val expected = rows.groupBy(_._1).toSeq.map { case (t, rs) =>
      val cents = rs.map { case (_, v) => math.floor(v * 100 + 0.5).toLong }
      val (mn, mx) = (cents.min, cents.max)
      val width = mx - mn + 1
      val hist = cents.groupBy(c => math.min(31L, (c - mn) * 32 / width))
        .map { case (b, xs) => b -> xs.size.toLong }
      val bins = hist.keys.toSeq.sorted
      val tot = cents.size.toLong
      def pick(num: Long, den: Long): Long = {
        var cm = 0L
        bins.find { b => cm += hist(b); cm * den >= tot * num }.get
      }
      def est(b: Long): Double = r6((mn + (b + 0.5) * width / 32.0) / 100.0)
      (t, tot, est(pick(1, 2)), est(pick(19, 20)), est(pick(99, 100)))
    }.sortBy(_._1)
    assert(got.toSeq === expected)
    // sketch contract: each estimate within half a bin of the exact
    // rank value it summarizes — the picked bin CONTAINS the
    // ceil(tot·p)-th smallest cent, and the estimate is its midpoint
    rows.groupBy(_._1).foreach { case (t, rs) =>
      val cents = rs.map { case (_, v) => math.floor(v * 100 + 0.5).toLong }.sorted
      val halfBinVal = (cents.last - cents.head + 1).toDouble / 32.0 / 2.0 / 100.0 + 0.01
      val (_, _, p50, p95, p99) = got.find(_._1 == t).get
      def rankVal(num: Long, den: Long): Double = {
        val r = (cents.size * num + den - 1) / den // ceil(tot·num/den)
        cents(r.toInt - 1) / 100.0
      }
      assert(math.abs(p50 - rankVal(1, 2)) <= halfBinVal)
      assert(math.abs(p95 - rankVal(19, 20)) <= halfBinVal)
      assert(math.abs(p99 - rankVal(99, 100)) <= halfBinVal)
    }
    spark.catalog.dropTempView("events")
  }

  test("gopher rules: SQL flags equal an independent rule evaluation at the boundaries") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    // docs pinned to rule boundaries: 49 vs 50 words, mean word length
    // exactly 3 vs just under, symbol ratio exactly at vs under the
    // 10% cut, alpha fraction at 80%, 1 vs 2 distinct stopwords
    val fill = (1 to 46).map(i => f"w$i%03d") // 4-char filler words
    val docs = Seq(
      0L -> (Seq("the", "and", "abc", "abcd") ++ fill),            // 50 words, passes all
      1L -> (Seq("the", "and", "abc") ++ fill),                    // 49 words: r_wordcount false
      2L -> (Seq.fill(50)("ab") ++ Seq("the", "and")),             // mean len < 3: fails
      3L -> (Seq("the", "and") ++ Seq.fill(48)("abcd")),           // mean len 3.9 ok
      4L -> (Seq("the", "and", "#", "#", "#", "#", "#") ++ fill),  // 53 words, 5 syms: ratio<0.1 ok
      5L -> (Seq("the", "and") ++ Seq.fill(6)("#") ++ fill.take(44) ++ Seq("x", "y")), // 54w 6sym: fails
      6L -> (Seq("the", "and") ++ Seq.fill(12)("123") ++ fill.take(36)),  // 50w, 12 non-alpha: fails 80%
      7L -> (Seq("the", "the", "the") ++ fill ++ Seq("zz"))        // 1 distinct stopword: r_stop false
    ).map { case (id, ws) => (id, ws.mkString(" ")) }
    docs.toDF("doc_id", "text").createOrReplaceTempView("documents")
    val got = spark.sql(SqlOps.gopherRules(SparkDialect)).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_words"),
        r.getAs[Boolean]("r_wordcount"), r.getAs[Boolean]("r_wordlen"),
        r.getAs[Boolean]("r_symbol"), r.getAs[Boolean]("r_alpha"),
        r.getAs[Boolean]("r_stop"), r.getAs[Boolean]("gopher_pass")))
      .sortBy(_._1)

    // ---- independent implementation ----
    val stopSet = Set("the", "and", "of", "to", "in", "is", "a")
    val expected = docs.map { case (id, text) =>
      val ws = text.split(" ", -1).filter(_.nonEmpty)
      val nWords = ws.length.toLong
      val nChars = text.replace(" ", "").length.toLong
      val nSym = "#|\\.\\.\\.".r.findAllIn(text).size.toLong
      val nAlpha = ws.count(_.exists(_.isLetter)).toLong
      val nStop = ws.filter(stopSet).distinct.length.toLong
      val (rWc, rWl) = (nWords >= 50 && nWords <= 100000,
        nChars >= 3 * nWords && nChars <= 10 * nWords)
      val (rSym, rAlpha, rStop) = (nSym * 10 < nWords, nAlpha * 10 >= nWords * 8, nStop >= 2)
      (id, nWords, rWc, rWl, rSym, rAlpha, rStop, rWc && rWl && rSym && rAlpha && rStop)
    }.sortBy(_._1)
    assert(got.toSeq === expected)
    // the battery must discriminate: at least one pass and one fail,
    // and each rule must be the sole cause of some failure
    assert(expected.exists(_._8) && expected.exists(!_._8))
    spark.catalog.dropTempView("documents")
  }

  test("EWMA forecast: SQL curve equals an independent closed-form pass and tracks a step") {
    import spark.implicits._
    import java.sql.Date
    graft.functions.GraftFunctions.registerAll(spark)
    // 90 days of daily revenue with a planted step at day 45, plus
    // in-day multiplicity so the daily rollup matters
    val base = java.time.LocalDate.of(1995, 3, 1)
    val rows = for {
      t <- 0 until 90
      k <- 0 until 2
    } yield {
      val level = if (t < 45) 1000.0 else 4000.0
      (Date.valueOf(base.plusDays(t.toLong)), level / 2 + (t * 13 + k * 7) % 50 + 0.005 * (k % 2))
    }
    rows.toDF("o_orderdate", "o_totalprice").createOrReplaceTempView("orders")
    val got = spark.sql(SqlOps.ewmaForecast.single(SparkDialect)).collect()
      .map(r => (r.getAs[Long]("day"), r.getAs[Long]("actual"), r.getAs[Double]("ewma"),
        Option(r.getAs[Any]("forecast")).map(_.asInstanceOf[Double]),
        Option(r.getAs[Any]("abs_err")).map(_.asInstanceOf[Double])))
      .sortBy(_._1)

    // ---- independent implementation (same truncated-closed-form spec) ----
    def r6o(x: Double): Double = math.floor(x * 1.0e6 + 0.5) / 1.0e6 // re-spelled, not shared
    val daily: Seq[(Long, Long)] = rows.groupBy(_._1.toLocalDate.toEpochDay)
      .map { case (day, rs) =>
        day -> rs.map { case (_, p) => math.floor(p * 100 + 0.5).toLong }.sum / 100
      }.toSeq.sortBy(_._1)
    val wq = (0 to 60).map(k =>
      (BigDecimal("0.3") * BigDecimal("0.7").pow(k) * BigDecimal(1000000000000L))
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLongExact)
    val ewmaQ = daily.indices.map { t =>
      val window = math.max(0, t - 60) to t
      val sq = window.map(j => daily(j)._2 * wq(t - j) / 1000000L).sum
      val ws = window.map(j => wq(t - j)).sum
      math.floor(sq.toDouble * 1e12 / ws.toDouble + 0.5).toLong
    }
    val expected = daily.indices.map { t =>
      val fc = if (t == 0) None else Some(ewmaQ(t - 1))
      (daily(t)._1, daily(t)._2, r6o(ewmaQ(t).toDouble / 1e6),
        fc.map(q => r6o(q.toDouble / 1e6)),
        fc.map(q => r6o(math.abs(daily(t)._2 * 1000000L - q).toDouble / 1e6)))
    }
    assert(got.toSeq === expected)
    // step response: the smoothed curve converges monotonically toward
    // the new level after the step and sits near the old level before
    // (the weight-sum normalization makes this hold from day 1 — the
    // un-normalized truncated form under-forecast the whole warm-up)
    val pre = expected(44)._3
    assert(pre > 900 && pre < 1100, s"pre-step EWMA should sit near the old level: $pre")
    assert(expected(3)._3 > 900, s"warm-up must be unbiased: ${expected(3)._3}")
    val post = expected.drop(46).take(10).map(_._3)
    assert(post.zip(post.drop(1)).forall { case (a, b) => b >= a },
      "EWMA must rise monotonically toward the new level after the step")
    assert(expected.last._3 > 2200, s"converged EWMA too low: ${expected.last._3}")
    spark.catalog.dropTempView("orders")
  }

  test("EWMA anomaly gate: a planted spike flags; its neighbors do not") {
    import spark.implicits._
    import java.sql.Date
    graft.functions.GraftFunctions.registerAll(spark)
    val base = java.time.LocalDate.of(1995, 3, 1)
    // stable level with bounded-step alternating jitter (a sawtooth's
    // wrap step is itself an outlier to a robust gate on an otherwise
    // quiet series — realistic, but not what this test isolates), one
    // 8x spike at day 60
    val rows = (0 until 90).map { t =>
      val level = if (t == 60) 8000.0 else 1000.0
      (Date.valueOf(base.plusDays(t.toLong)), level + (if (t % 2 == 0) 20.0 else -20.0))
    }
    rows.toDF("o_orderdate", "o_totalprice").createOrReplaceTempView("orders")
    SqlOps.anomalyEwma.stages.foreach { case (name, build) =>
      spark.sql(build(SparkDialect)).localCheckpoint().createOrReplaceTempView(name)
    }
    val got = spark.sql(SqlOps.anomalyEwma.body(SparkDialect)).collect()
      .map(r => (r.getAs[Long]("day"), r.getAs[Int]("is_anomaly"))).toMap
    val spikeDay = base.plusDays(60L).toEpochDay
    assert(got(spikeDay) === 1, "the planted spike must flag")
    // days after the spike carry an inflated forecast until its
    // weight decays below the robust threshold (~0.7^k): those flags
    // are correct behavior; anything OUTSIDE the decay window is a
    // false positive
    val flagged = got.collect { case (day, 1) => day }
    assert(flagged.forall(day => day >= spikeDay && day <= spikeDay + 9),
      s"flags outside the spike's decay window: ${flagged.toSeq.sorted}")
    spark.catalog.dropTempView("orders")
  }

  test("floorDiv/pmod SQL rendering equals Math.floorDiv exhaustively around zero") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    // the signed floor-division idiom underpins every PCA rescale;
    // exhaustive over the sign/boundary lattice where Spark DIV
    // (truncating) and a floor must differ
    val pairs = for { a <- -100L to 100L; b <- 1L to 20L } yield (a, b)
    pairs.toDF("a", "b").createOrReplaceTempView("fd_in")
    // same rendering SqlOps.floorDiv produces (private — inlined here;
    // MicroOracleSpec's independence rule: re-spell, don't import)
    val got = spark.sql(
      """SELECT a, b,
        |  ((a - (((a % b) + b) % b)) DIV b) AS fd
        |FROM fd_in""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pairs.foreach { case (a, b) =>
      assert(got((a, b)) === Math.floorDiv(a, b), s"floorDiv($a, $b)")
    }
    spark.catalog.dropTempView("fd_in")
  }

  test("Heaps fit: SQL beta equals an independent first-occurrence OLS pass") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    // controlled vocabulary growth: each doc introduces two new tokens
    // and repeats a rotation of old ones; single-space text keeps the
    // independent tokenizer faithful to word_shingles
    val docs: Seq[(Long, String)] = (0 until 40).map { i =>
      val fresh = Seq(s"new${i}a", s"new${i}b")
      val old = (0 until 6).map(j => s"new${(i * 7 + j) % math.max(1, i)}a")
      (i.toLong, (fresh ++ old).mkString(" "))
    }
    docs.toDF("doc_id", "text").createOrReplaceTempView("documents")
    SqlOps.heapsFit.stages.foreach { case (name, build) =>
      spark.sql(build(SparkDialect)).localCheckpoint().createOrReplaceTempView(name)
    }
    val got = spark.sql(SqlOps.heapsFit.body(SparkDialect)).collect()
    assert(got.length === 1)

    // ---- independent implementation ----
    val stream: Seq[String] = docs.sortBy(_._1).flatMap(_._2.split(" ", -1).filter(_.nonEmpty))
    val firstPos: Map[String, Int] = stream.zipWithIndex.reverse.toMap.map {
      case (w, i) => w -> (i + 1) } // reverse keeps the FIRST index
    def qlog(x: Long): Long =
      math.floor(math.log(x.toDouble) / math.log(2.0) * 1e6 + 0.5).toLong
    val pts = (0 to 30).map(k => 1L << k).filter(_ <= stream.size).map { cp =>
      (cp, firstPos.values.count(_ <= cp).toLong)
    }
    val q = pts.zipWithIndex.map { case ((cp, v), _) =>
      (java.lang.Long.numberOfTrailingZeros(cp).toLong * 1000000L, qlog(v))
    }
    val n = q.size.toLong
    val (sx, sy) = (q.map(_._1).sum, q.map(_._2).sum)
    val (sxy, sxx) = (q.map(p => p._1 * p._2).sum, q.map(p => p._1 * p._1).sum)
    val beta = r6((n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble)
    assert(got(0).getAs[Long]("n_checkpoints") === n)
    assert(got(0).getAs[Double]("heaps_beta") === beta)
    // sanity: steady two-new-tokens-per-doc growth is sublinear but
    // well away from saturation
    assert(beta > 0.2 && beta < 0.9, s"unexpected beta: $beta")
    spark.catalog.dropTempView("documents")
  }

  test("CCNet buckets: SQL terciles equal an independent LM-scoring pass") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    // three quality strata: docs of common tokens (low bits), mixed,
    // and rare-heavy (high bits); single-space text keeps the
    // independent tokenizer faithful to word_shingles
    val docs: Seq[(Long, String)] = (0 until 12).map { i =>
      val words =
        if (i < 4) Seq.fill(8)("common")
        else if (i < 8) Seq.fill(4)("common") ++ Seq.fill(4)(s"mid${i % 2}")
        else Seq(s"rare${i}a", s"rare${i}b", s"rare${i}c", "common")
      (i.toLong, words.mkString(" "))
    }
    docs.toDF("doc_id", "text").createOrReplaceTempView("documents")
    SqlOps.ccnetBuckets.stages.foreach { case (name, build) =>
      spark.sql(build(SparkDialect)).localCheckpoint().createOrReplaceTempView(name)
    }
    val got = spark.sql(SqlOps.ccnetBuckets.body(SparkDialect)).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("mean_bits"), r.getAs[String]("bucket")))
      .sortBy(_._1)

    // ---- independent implementation ----
    def qlog2(x: Long): Long = math.floor(math.log(x.toDouble) / math.log(2.0) * 1e6 + 0.5).toLong
    val tf: Map[(Long, String), Long] = docs.flatMap { case (id, t) =>
      t.split(" ", -1).filter(_.nonEmpty).groupBy(identity)
        .map { case (w, xs) => (id, w) -> xs.size.toLong }
    }.toMap
    val cGlob: Map[String, Long] =
      tf.groupBy(_._1._2).map { case (w, m) => w -> m.values.sum }
    val nn = tf.values.sum
    val scores: Seq[(Long, Long)] = docs.map { case (id, _) =>
      val mine = tf.collect { case ((d, w), f) if d == id => (w, f) }
      val totalBits = mine.map { case (w, f) => f * (qlog2(nn) - qlog2(cGlob(w))) }.sum
      val nTok = mine.map(_._2).sum
      id -> totalBits / nTok // non-negative: plain truncation == floor
    }
    // Spark `percentile`: index (n-1)*p, linear interpolation
    def pct(xs: Seq[Long], p: Double): Double = {
      val s = xs.sorted
      val idx = (s.size - 1) * p
      val (lo, hi) = (math.floor(idx).toInt, math.ceil(idx).toInt)
      s(lo) + (idx - lo) * (s(hi) - s(lo))
    }
    val (t33, t67) = (pct(scores.map(_._2), 0.33), pct(scores.map(_._2), 0.67))
    val expected = scores.map { case (id, q) =>
      val b = if (q <= t33) "head" else if (q <= t67) "middle" else "tail"
      (id, r6(q.toDouble / 1e6), b)
    }.sortBy(_._1)
    assert(got.toSeq === expected)
    // stratification sanity: common-token docs are head, rare-heavy tail
    assert((0L to 3L).forall(id => expected(id.toInt)._3 == "head"))
    assert((8L to 11L).forall(id => expected(id.toInt)._3 == "tail"))
    spark.catalog.dropTempView("documents")
  }

  test("unigram-LM Viterbi: SQL DP equals an independent Scala segmenter") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    // crafted corpus: overlapping substrings (ban/an/ana/and/nab) so
    // the best segmentation is genuinely contested and the per-position
    // tie order matters; word lengths 2..6 exercise every DP arm
    val docs: Seq[(Long, String)] = Seq(
      (0L, "banana band ban an"),
      (1L, "banana banana ban and"),
      (2L, "and band banana nab"),
      (3L, "nab ban and an an"))
    docs.toDF("doc_id", "text").createOrReplaceTempView("documents")
    SqlOps.ulmViterbi.stages.foreach { case (name, build) =>
      spark.sql(build(SparkDialect)).localCheckpoint().createOrReplaceTempView(name)
    }
    val got = spark.sql(SqlOps.ulmViterbi.body(SparkDialect)).collect()
      .map(r => (r.getAs[String]("word"), r.getAs[Long]("tf"),
        r.getAs[Long]("n_pieces"), r.getAs[Double]("loglik_bits")))

    // ---- independent implementation ----
    def qlog2(x: Long): Long =
      math.floor(math.log(x.toDouble) / math.log(2.0) * 1e6 + 0.5).toLong
    val vocab: Map[String, Long] = docs.flatMap(_._2.split(" ", -1))
      .groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
    val pieceCnt = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    for ((w, c) <- vocab; i <- 0 until w.length; l <- 1 to 3 if i + l <= w.length)
      pieceCnt(w.substring(i, i + l)) += c
    val total = pieceCnt.values.sum
    val qlp: Map[String, Long] =
      pieceCnt.toMap.map { case (p, c) => p -> (qlog2(c) - qlog2(total)) }
    // exhaustive lattice max under the SQL's exact total tie order:
    // score DESC, fewer pieces, smallest cut-mask — off the SHARED
    // ulmOk/ulmSegmentsOf mirror (one copy for all four ULM tests)
    def best(w: String): (Long, Long) = {
      val (_, s, np) = ulmOk(w, qlp).minBy { case (m, s, np) => (-s, np, m) }
      (s, np)
    }
    val expected = vocab.toSeq.map { case (w, c) =>
      val (score, np) = best(w)
      (w, c, np, r6(score.toDouble / 1e6))
    }.sortBy { case (w, c, _, _) => (-c, w) }
    assert(got.toSeq === expected)
    // structural sanity: coverage — every word segmentable (got covers
    // the whole vocab), single chars never beat a whole-word piece for
    // 3-char words that are themselves frequent pieces
    assert(got.map(_._1).toSet === vocab.keySet)
    val np = got.map(g => g._1 -> g._3).toMap
    assert(np("an") === 1L, "the 2-char word is itself a candidate piece")
    assert(np("banana") <= 3L, "3-char pieces must bound banana at 3")
    spark.catalog.dropTempView("documents")
  }

  test("unigram-LM hard-EM step: SQL back-walk counts equal an independent path trace") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    val docs: Seq[(Long, String)] = Seq(
      (0L, "banana band ban an"),
      (1L, "banana banana ban and"),
      (2L, "and band banana nab"),
      (3L, "nab ban and an an"))
    docs.toDF("doc_id", "text").createOrReplaceTempView("documents")
    SqlOps.ulmEmStep.stages.foreach { case (name, build) =>
      spark.sql(build(SparkDialect)).localCheckpoint().createOrReplaceTempView(name)
    }
    val got = spark.sql(SqlOps.ulmEmStep.body(SparkDialect)).collect()
      .map(r => (r.getAs[String]("piece"), r.getAs[Long]("expected_count"),
        r.getAs[Double]("logp_new_bits"), r.getAs[Double]("delta_bits")))

    // ---- independent implementation (segmenter + path trace) ----
    def qlog2(x: Long): Long =
      math.floor(math.log(x.toDouble) / math.log(2.0) * 1e6 + 0.5).toLong
    val vocab: Map[String, Long] = docs.flatMap(_._2.split(" ", -1))
      .groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
    val pieceCnt = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    for ((w, c) <- vocab; i <- 0 until w.length; l <- 1 to 3 if i + l <= w.length)
      pieceCnt(w.substring(i, i + l)) += c
    val total = pieceCnt.values.sum
    val qlp: Map[String, Long] =
      pieceCnt.toMap.map { case (p, c) => p -> (qlog2(c) - qlog2(total)) }
    // the same exhaustive-lattice winner as the viterbi test, path
    // form — off the SHARED ulmOk/ulmSegmentsOf mirror
    def bestPath(w: String): List[String] = {
      val win = ulmOk(w, qlp).minBy { case (m, s, np) => (-s, np, m) }._1
      ulmSegmentsOf(w, win).toList
    }
    val ec = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    for ((w, c) <- vocab; p <- bestPath(w)) ec(p) += c
    val t = ec.values.sum
    val expected = ec.toSeq.map { case (p, c) =>
      val qNew = qlog2(c) - qlog2(t)
      (p, c, r6(qNew.toDouble / 1e6), r6((qNew - qlp(p)).toDouble / 1e6))
    }.sortBy { case (p, c, _, _) => (-c, p) }.take(30)
    assert(got.toSeq === expected)
    // E-step coverage: the surviving vocabulary is exactly the pieces
    // some best path uses — the pruning signal the trainer thresholds
    assert(got.map(_._1).toSet === ec.keySet)

    // --- the EM-gain audit against the same independent trace ---
    SqlOps.ulmEmGain.stages.foreach { case (name, build) =>
      spark.sql(build(SparkDialect)).localCheckpoint().createOrReplaceTempView(name)
    }
    val gain = spark.sql(SqlOps.ulmEmGain.body(SparkDialect)).collect().head
    // independent L0/L1/L2 in µ-bits
    // exhaustive max over masks whose EVERY piece the prob table still
    // carries — exactly ulmOk's candidate set
    def segScore(w: String, probs: Map[String, Long]): Long =
      ulmOk(w, probs).map(_._2).max
    val qlp2: Map[String, Long] = ec.toMap.map { case (p, c) => p -> (qlog2(c) - qlog2(t)) }
    val l0 = vocab.map { case (w, c) => c * segScore(w, qlp) }.sum
    val l1 = vocab.map { case (w, c) => c * bestPath(w).map(qlp2).sum }.sum
    val l2 = vocab.map { case (w, c) => c * segScore(w, qlp2) }.sum
    assert(gain.getAs[Double]("loglik_init_bits") === r6(l0.toDouble / 1e6))
    assert(gain.getAs[Double]("loglik_mstep_bits") === r6(l1.toDouble / 1e6))
    assert(gain.getAs[Double]("loglik_resegment_bits") === r6(l2.toDouble / 1e6))
    assert(gain.getAs[Boolean]("mstep_improves") && gain.getAs[Boolean]("resegment_improves"))
    assert(l1 >= l0 && l2 >= l1, "the EM monotonicity the op exists to prove")
    spark.catalog.dropTempView("documents")
  }

  // ---- shared plain-Scala mirror of the ULM enumeration trainer ----
  private def ulmSegmentsOf(w: String, m: Int): Seq[String] = {
    val cuts = (0 until w.length - 1).filter(j => ((m >> j) & 1) == 1)
    val bounds = 0 +: cuts.map(_ + 1) :+ w.length
    bounds.sliding(2).map { case Seq(a, b) => w.substring(a, b) }.toSeq
  }
  private def ulmQlog2(x: Long): Long =
    math.floor(math.log(x.toDouble) / math.log(2.0) * 1e6 + 0.5).toLong
  /** Valid masks whose every piece the prob table carries, with their
    * integer scores — the `ok` CTE. */
  private def ulmOk(w: String, probs: Map[String, Long]): Seq[(Int, Long, Long)] =
    (0 until (1 << (w.length - 1))).flatMap { m =>
      val segs = ulmSegmentsOf(w, m)
      if (segs.exists(_.length > 3) || !segs.forall(probs.contains)) None
      else Some((m, segs.map(probs).sum, segs.size.toLong))
    }
  private val ulmStairT: IndexedSeq[Long] =
    (0 until 16).map(r => math.round(StrictMath.pow(2.0, r / 16.0) * 1e6))
  /** Staircase posterior weights per mask — the ulm_wq stage. */
  private def ulmWq(w: String, probs: Map[String, Long]): Map[Int, (Long, Long)] = {
    val ok = ulmOk(w, probs)
    val mx = ok.map(_._2).max
    ok.map { case (m, s, _) =>
      val k = Math.floorDiv(s - mx, 62500L)
      val q = Math.floorDiv(k, 16L)
      val r = Math.floorMod(k, 16L).toInt
      val wq = if (q < -40) 0L else ulmStairT(r) / (1L << (-q).toInt)
      m -> (s, wq)
    }.toMap
  }

  test("unigram-LM soft EM: staircase posteriors, expected counts and marginal audit " +
    "equal an independent enumeration") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    val docs: Seq[(Long, String)] = Seq(
      (0L, "banana band ban an"),
      (1L, "banana banana ban and"),
      (2L, "and band banana nab"),
      (3L, "nab ban and an an"))
    docs.toDF("doc_id", "text").createOrReplaceTempView("documents")
    SqlOps.ulmSoftEm.stages.foreach { case (name, build) =>
      spark.sql(build(SparkDialect)).localCheckpoint().createOrReplaceTempView(name)
    }
    val got = spark.sql(SqlOps.ulmSoftEm.body(SparkDialect)).collect()

    // ---- independent enumeration ----
    val vocab: Map[String, Long] = docs.flatMap(_._2.split(" ", -1))
      .groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
    val pieceCnt = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    for ((w, c) <- vocab; i <- 0 until w.length; l <- 1 to 3 if i + l <= w.length)
      pieceCnt(w.substring(i, i + l)) += c
    val total = pieceCnt.values.sum
    val qlp0: Map[String, Long] =
      pieceCnt.toMap.map { case (p, c) => p -> (ulmQlog2(c) - ulmQlog2(total)) }
    // soft expected counts: per word, rational Σwq·occ / Σwq µ-quantized
    val ecq = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    for ((w, c) <- vocab) {
      val wq = ulmWq(w, qlp0)
      val den = wq.values.map(_._2).sum
      val num = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      for ((m, (_, q)) <- wq; p <- ulmSegmentsOf(w, m)) num(p) += q
      for ((p, n) <- num) ecq(p) += c * ((2 * n * 1000000L + den) / (2 * den))
    }
    val softTot = ecq.values.sum
    val qlpSoft = ecq.toMap.collect {
      case (p, e) if e > 0 => p -> (ulmQlog2(e) - ulmQlog2(softTot))
    }
    // hard counts along the (score, np, mask)-winner paths
    val hardEc = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    for ((w, c) <- vocab) {
      val best = ulmOk(w, qlp0).minBy { case (m, s, np) => (-s, np, m) }
      for (p <- ulmSegmentsOf(w, best._1)) hardEc(p) += c
    }
    // marginals through the same staircase, under both models
    def marginal(probs: Map[String, Long]): Long =
      vocab.map { case (w, c) =>
        val wq = ulmWq(w, probs)
        val mx = wq.values.map(_._1).max
        c * (mx + ulmQlog2(wq.values.map(_._2).sum) - ulmQlog2(1000000L))
      }.sum
    val (lm0, lm1) = (marginal(qlp0), marginal(qlpSoft))
    assert(lm1 >= lm0, "soft-EM marginal monotonicity on the crafted corpus")

    val expected = ecq.toSeq.filter(_._2 > 0)
      .sortBy { case (p, e) => (-e, p) }.take(30)
    assert(got.map(_.getAs[String]("piece")).toSeq === expected.map(_._1))
    got.foreach { r =>
      val p = r.getAs[String]("piece")
      assert(r.getAs[Double]("soft_count") === r6(ecq(p).toDouble / 1e6))
      assert(r.getAs[Double]("logp_soft_bits") === r6(qlpSoft(p).toDouble / 1e6))
      if (hardEc.contains(p)) assert(r.getAs[Long]("hard_count") === hardEc(p))
      else assert(r.isNullAt(r.fieldIndex("hard_count")))
      assert(r.getAs[Double]("marginal_init_bits") === r6(lm0.toDouble / 1e6))
      assert(r.getAs[Double]("marginal_soft_bits") === r6(lm1.toDouble / 1e6))
      assert(r.getAs[Boolean]("soft_improves"))
    }
    spark.catalog.dropTempView("documents")
  }

  test("unigram-LM prune loop: per-round loss ranking, drops and re-estimates equal " +
    "an independent replay; coverage and target invariants hold") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    val docs: Seq[(Long, String)] = Seq(
      (0L, "banana band ban an"),
      (1L, "banana banana ban and"),
      (2L, "and band banana nab"),
      (3L, "nab ban and an an"))
    docs.toDF("doc_id", "text").createOrReplaceTempView("documents")
    val target = 8
    val op = SqlOps.ulmPrune(target, 3)
    op.stages.foreach { case (name, build) =>
      spark.sql(build(SparkDialect)).localCheckpoint().createOrReplaceTempView(name)
    }
    val got = spark.sql(op.body(SparkDialect)).collect()
      .map(r => r.getAs[String]("piece") ->
        (r.getAs[Double]("logp_bits"), r.getAs[Long]("viterbi_count"),
          r.getAs[Long]("n_vocab"), r.getAs[Boolean]("within_target"),
          r.getAs[Boolean]("all_words_covered"))).toMap

    // ---- independent replay of the 3 pruning rounds ----
    val vocab: Map[String, Long] = docs.flatMap(_._2.split(" ", -1))
      .groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
    val pieceCnt = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    for ((w, c) <- vocab; i <- 0 until w.length; l <- 1 to 3 if i + l <= w.length)
      pieceCnt(w.substring(i, i + l)) += c
    val tot0 = pieceCnt.values.sum
    var v: Map[String, Long] =
      pieceCnt.toMap.map { case (p, c) => p -> (ulmQlog2(c) - ulmQlog2(tot0)) }
    var lastEc: Map[String, Long] = Map.empty
    for (_ <- 1 to 3) {
      val wins = vocab.keys.map { w =>
        w -> ulmOk(w, v).minBy { case (m, s, np) => (-s, np, m) }
      }.toMap
      val ec = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      for ((w, c) <- vocab; p <- ulmSegmentsOf(w, wins(w)._1)) ec(p) += c
      val losses = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      for ((w, c) <- vocab; p <- ulmSegmentsOf(w, wins(w)._1).distinct if p.length > 1) {
        val alts = ulmOk(w, v).filterNot { case (m, _, _) => ulmSegmentsOf(w, m).contains(p) }
        val alt = if (alts.isEmpty) wins(w)._2 - 100000000L else alts.map(_._2).max
        losses(p) += c * (wins(w)._2 - alt)
      }
      val mp = v.keys.filter(_.length > 1).toSeq
        .map(p => p -> losses(p)).sortBy { case (p, l) => (l, p) }
      val n1 = v.keys.count(_.length == 1)
      val ndrop = math.min((mp.size + 1) / 2,
        math.max(mp.size - math.max(target - n1, 0), 0))
      val keep = v.keys.filter(_.length == 1).toSet ++ mp.drop(ndrop).map(_._1)
      val totKept = keep.toSeq.map(p => ec(p)).filter(_ > 0).sum
      v = keep.map { p =>
        p -> (if (ec(p) > 0) ulmQlog2(ec(p)) - ulmQlog2(totKept) else v(p))
      }.toMap
      lastEc = keep.map(p => p -> ec(p)).toMap
    }
    assert(got.keySet === v.keySet, "final vocabulary must match the replay")
    v.foreach { case (p, q) =>
      assert(got(p)._1 === r6(q.toDouble / 1e6), s"logp of $p")
      assert(got(p)._2 === lastEc(p), s"viterbi count of $p")
    }
    val n1 = v.keys.count(_.length == 1)
    assert(got.head._2._3 === v.size.toLong)
    assert(v.size <= math.max(target, n1))
    assert(got.values.forall(t => t._4 && t._5), "target + coverage invariants")
    // the loop genuinely pruned: more candidate pieces existed than survived
    assert(pieceCnt.size > v.size)
    spark.catalog.dropTempView("documents")
  }

  test("unigram-LM prune loop: an under-provisioned round budget fails VISIBLY — " +
    "within_target false, the pool trace shows the stall, coverage never sacrificed") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    val docs: Seq[(Long, String)] = Seq(
      (0L, "banana band ban an"),
      (1L, "banana banana ban and"),
      (2L, "and band banana nab"),
      (3L, "nab ban and an an"))
    docs.toDF("doc_id", "text").createOrReplaceTempView("documents")
    // fixture validity: compute the candidate pool and prove ONE
    // halving round genuinely cannot reach the target
    val vocab: Map[String, Long] = docs.flatMap(_._2.split(" ", -1))
      .groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
    val pieces = (for ((w, _) <- vocab; i <- 0 until w.length; l <- 1 to 3
                       if i + l <= w.length) yield w.substring(i, i + l)).toSet
    val nm0 = pieces.count(_.length > 1)
    val n1 = pieces.count(_.length == 1)
    val target = 8
    assert(nm0 - (nm0 + 1) / 2 + n1 > target,
      s"fixture must make one round insufficient (nm0=$nm0 n1=$n1)")

    val op = SqlOps.ulmPrune(target, 1)
    op.stages.foreach { case (name, build) =>
      spark.sql(build(SparkDialect)).localCheckpoint().createOrReplaceTempView(name)
    }
    val rows = spark.sql(op.body(SparkDialect)).collect()
    val nVocab = rows.head.getAs[Long]("n_vocab")
    val pool1 = rows.head.getAs[Long]("pool_after_r1")
    // the in-query guard fails loudly: every output row says the
    // vocabulary is NOT within target...
    assert(rows.forall(!_.getAs[Boolean]("within_target")),
      "an under-provisioned round budget must flag on every row")
    // ...the pool trace pinpoints the stall (too many multis remain)...
    assert(pool1 > target - n1 && nVocab === pool1 + n1)
    assert(nVocab > math.max(target, n1).toLong)
    // ...and the halving actually happened — the budget, not the
    // round, is what fell short
    assert(pool1 === nm0 - (nm0 + 1) / 2)
    // coverage is never traded for the target: singles survive, every
    // word stays segmentable
    assert(rows.forall(_.getAs[Boolean]("all_words_covered")))
    spark.catalog.dropTempView("documents")
  }

  /** Spark `percentile`: index (n−1)·p, linear interpolation — shared
    * by the label/temporal-split micro-oracles below. */
  private def pctCont(xs: Seq[Long], p: Double): Double = {
    val s = xs.sorted
    val idx = (s.size - 1) * p
    val (lo, hi) = (math.floor(idx).toInt, math.ceil(idx).toInt)
    s(lo) + (idx - lo) * (s(hi) - s(lo))
  }

  test("label drift: SQL chi-square parts and ppm shares equal an independent contingency") {
    import spark.implicits._
    // labels 0..3; label 3 exists ONLY in the base slice (the
    // spine-fill case); slice = vec_id % 16 == 3
    val rows: Seq[(Long, Array[Float], Long)] = (0L until 160L).map { i =>
      val label = if (i % 16 == 3) i % 3 else i % 4
      (i, Array(0f), label)
    }
    rows.toDF("vec_id", "embedding", "label").createOrReplaceTempView("embeddings")
    val got = spark.sql(SqlOps.labelDrift(SparkDialect)).collect()
      .map(r => r.getAs[Long]("label") ->
        (r.getAs[Long]("n_base"), r.getAs[Long]("n_new"),
          Option(r.getAs[java.lang.Long]("share_base_ppm")).map(_.toLong),
          Option(r.getAs[java.lang.Long]("share_new_ppm")).map(_.toLong),
          r.getAs[Double]("chi2_part"))).toMap

    // ---- independent contingency ----
    val cells = rows.groupBy { case (id, _, l) => (l, if (id % 16 == 3) 1 else 0) }
      .view.mapValues(_.size.toLong).toMap.withDefaultValue(0L)
    val labels = rows.map(_._3).distinct.sorted
    val ct = Map(0 -> labels.map(l => cells((l, 0))).sum,
                 1 -> labels.map(l => cells((l, 1))).sum)
    val n = ct(0) + ct(1)
    val expected = labels.map { l =>
      val (nb, nn) = (cells((l, 0)), cells((l, 1)))
      val rt = nb + nn
      val qts = Seq(0, 1).map { sl =>
        val e = rt.toDouble * ct(sl) / n
        val o = cells((l, sl)).toDouble
        if (rt.toDouble * ct(sl) > 0) math.floor((o - e) * (o - e) / e * 1e6 + 0.5).toLong
        else 0L
      }
      l -> (nb, nn, Some(nb * 1000000L / ct(0)), Some(nn * 1000000L / ct(1)),
        r6(qts.sum.toDouble / 1e6))
    }.toMap
    assert(got === expected)
    // label 3 has zero new-slice mass and a positive contribution
    assert(got(3L)._2 === 0L && got(3L)._5 > 0.0)

    // robustness: an EMPTY ingest slice must report, not crash — new
    // shares NULL, every chi-square contribution 0 (degenerate table)
    rows.filter(_._1 % 16 != 3)
      .toDF("vec_id", "embedding", "label").createOrReplaceTempView("embeddings")
    val empty = spark.sql(SqlOps.labelDrift(SparkDialect)).collect()
    assert(empty.nonEmpty)
    assert(empty.forall(r => r.isNullAt(r.fieldIndex("share_new_ppm"))))
    assert(empty.forall(_.getAs[Double]("chi2_part") === 0.0))
    spark.catalog.dropTempView("embeddings")
  }

  test("embedding drift: SQL smd equals independent statistics; constant-shift dims still flag") {
    import spark.implicits._
    // dim 0: genuine shift (base ~0.1, new ~0.5); dim 1: identical
    // distributions; dim 2: constant in both slices but DIFFERENT
    // constants (zero spread — the masking case); dim 3: identical
    // constants (no drift at all)
    val rows: Seq[(Long, Array[Float])] = (0L until 64L).map { i =>
      val isNew = i % 16 == 3
      val d0 = (if (isNew) 0.5f else 0.1f) + (i % 5).toFloat / 100f
      val d1 = (i % 7).toFloat / 10f
      val d2 = if (isNew) 0.25f else -0.25f
      val d3 = 0.125f
      (i, Array(d0, d1, d2, d3))
    }
    rows.toDF("vec_id", "embedding").createOrReplaceTempView("embeddings")
    val got = spark.sql(SqlOps.embeddingDrift(SparkDialect)).collect()
      .map(r => r.getAs[Long]("pos") ->
        (Option(r.getAs[java.lang.Double]("smd")).map(_.toDouble),
          r.getAs[Int]("drift_flag"))).toMap

    // ---- independent statistics (same µ-quantization) ----
    def qv(v: Float): Long = math.floor(v.toDouble * 1e6 + 0.5).toLong
    def smdOf(pos: Int): Option[Double] = {
      val (base, nw) = rows.partition(_._1 % 16 != 3)
      def stats(xs: Seq[Long]) = {
        val nn = xs.size
        val m = xs.sum.toDouble / nn
        val v = (xs.map(x => x.toDouble * x).sum - xs.sum.toDouble * xs.sum / nn) / (nn - 1)
        (m, v)
      }
      val (mb, vb) = stats(base.map(r => qv(r._2(pos))))
      val (mn, vn) = stats(nw.map(r => qv(r._2(pos))))
      if (vb + vn <= 0) None else Some(r6((mn - mb) / math.sqrt((vb + vn) / 2.0)))
    }
    assert(got(0L)._1 === smdOf(0) && got(0L)._2 === 1, "shifted dim must flag")
    // dim 1's slices are close but not engineered-identical: the flag
    // must agree with the independent statistic's threshold verdict
    assert(got(1L)._1 === smdOf(1))
    assert(got(1L)._2 === (if (smdOf(1).exists(s => math.abs(s) > 0.1)) 1 else 0))
    assert(got(2L)._1.isEmpty && got(2L)._2 === 1,
      "constant-but-different dims are the bluntest drift and must flag")
    assert(got(3L)._1.isEmpty && got(3L)._2 === 0, "identical constants must not flag")

    // robustness: an EMPTY ingest slice must still report every
    // dimension — status 'no_data', NULL smd, NULL flag — so the
    // monitor reads "no data", never the silent "no drift"
    rows.filterNot(_._1 % 16 == 3)
      .toDF("vec_id", "embedding").createOrReplaceTempView("embeddings")
    val noData = spark.sql(SqlOps.embeddingDrift(SparkDialect)).collect()
    assert(noData.length === 4, "all dimensions must appear")
    assert(noData.forall(r => r.getAs[String]("status") === "no_data"))
    assert(noData.forall(r => r.isNullAt(r.fieldIndex("smd"))))
    assert(noData.forall(r => r.isNullAt(r.fieldIndex("drift_flag"))))
    assert(noData.forall(r => r.getAs[Long]("n_new") === 0L))
    spark.catalog.dropTempView("embeddings")
  }

  test("temporal split: SQL counts and leakage audit equal an independent replay") {
    import spark.implicits._
    // 6 users × 5 events at staggered seconds; user 0's last event is
    // EARLY (second 10) so its holdout test event precedes most train
    val rows: Seq[(Long, Long, java.sql.Timestamp)] = for {
      u <- 0L until 6L
      k <- 0L until 5L
    } yield {
      val sec = if (u == 0) 2 + 2 * k else 100 * u + 10 * k
      (u, u * 10 + k, new java.sql.Timestamp(sec * 1000L))
    }
    rows.map { case (u, id, ts) => (id, ts, u, "view", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .createOrReplaceTempView("events")
    val got = spark.sql(SqlOps.splitTemporal(SparkDialect)).collect()
      .map(r => r.getAs[String]("strategy") ->
        (r.getAs[Long]("n_train"), r.getAs[Long]("n_test"),
          r.getAs[Long]("leaky_test_events"))).toMap

    // ---- independent replay ----
    val es = rows.map { case (u, id, ts) => (u, id, ts.getTime / 1000) }
    // per-user holdout: max (es, event_id) per user is test
    val test1 = es.groupBy(_._1).values.map(_.maxBy(e => (e._3, e._2))).toSet
    val train1 = es.filterNot(test1).map(_._3)
    val leak1 = test1.count(_._3 < train1.max)
    // global cutoff at the interpolated 80th percentile
    val c80 = pctCont(es.map(_._3), 0.8)
    val (trainG, testG) = es.partition(_._3 <= c80)
    assert(got("per_user_holdout") === ((train1.size.toLong, test1.size.toLong, leak1.toLong)))
    assert(got("global_cutoff") === ((trainG.size.toLong, testG.size.toLong, 0L)))
    assert(leak1 > 0, "the crafted early user must exhibit time travel")
    spark.catalog.dropTempView("events")
  }

  test("filter kappa: SQL contingency and kappa equal an independent judge pair") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    // docs crafted to land on all four contingency cells: gopher pass
    // needs >=50 words, >=2 distinct designated stopwords, mean word
    // length 3..10, >=80% alphabetic, <10% symbol hits
    val stopFill = "the and " // 2 designated stops -> r_stop passes
    def doc(body: String, n: Int): String =
      (stopFill + (1 to n).map(i => body + i).mkString(" ")).trim
    val docs: Seq[(Long, String)] = Seq(
      (0L, doc("alpha", 60)),          // gopher pass, common-ish tokens
      (1L, doc("alpha", 60)),          // duplicate content profile
      (2L, doc("beta", 60)),
      (3L, "tiny doc"),                // fails r_wordcount
      (4L, (1 to 60).map(i => s"## $i ##").mkString(" ")), // symbol/alpha fail
      (5L, doc("gamma", 70)),
      (6L, "the and " + (1 to 55).map(_ => "zz").mkString(" ")), // repeated short tokens
      (7L, doc("delta", 52)))
    docs.toDF("doc_id", "text").createOrReplaceTempView("documents")
    SqlOps.filterKappa.stages.foreach { case (name, build) =>
      spark.sql(build(SparkDialect)).localCheckpoint().createOrReplaceTempView(name)
    }
    val got = spark.sql(SqlOps.filterKappa.body(SparkDialect)).collect().head

    // ---- independent judges ----
    val stops = Set("the", "and", "of", "to", "in", "is", "a",
      "yang", "dan", "di", "ke", "itu", "untuk")
    def gopher(t: String): Boolean = {
      val toks = t.split(" ", -1)
      val words = toks.length.toLong
      val chars = t.replace(" ", "").length.toLong
      val sym = "#|\\.\\.\\.".r.findAllIn(t).length.toLong
      val alpha = toks.count(w => w.toLowerCase != w.toUpperCase).toLong
      val stop = toks.filter(stops).distinct.length.toLong
      (words >= 50 && words <= 100000) &&
        (chars >= 3 * words && chars <= 10 * words) &&
        (sym * 10 < words) && (alpha * 10 >= words * 8) && (stop >= 2)
    }
    def qlog2(x: Long): Long =
      math.floor(math.log(x.toDouble) / math.log(2.0) * 1e6 + 0.5).toLong
    val tf: Map[(Long, String), Long] = docs.flatMap { case (id, t) =>
      t.split(" ", -1).groupBy(identity).map { case (w, xs) => (id, w) -> xs.size.toLong }
    }.toMap
    val cGlob = tf.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val nn = tf.values.sum
    val q: Map[Long, Long] = docs.map { case (id, _) =>
      val mine = tf.collect { case ((d, w), f) if d == id => (w, f) }
      val bits = mine.map { case (w, f) => f * (qlog2(nn) - qlog2(cGlob(w))) }.sum
      id -> bits / mine.map(_._2).sum
    }.toMap
    val t67 = pctCont(q.values.toSeq, 0.67)
    val ab = docs.map { case (id, t) =>
      (if (gopher(t)) 1 else 0, if (q(id) <= t67) 1 else 0)
    }
    val n = ab.size.toLong
    val n11 = ab.count(p => p._1 == 1 && p._2 == 1).toLong
    val n10 = ab.count(p => p._1 == 1 && p._2 == 0).toLong
    val n01 = ab.count(p => p._1 == 0 && p._2 == 1).toLong
    val n00 = ab.count(p => p._1 == 0 && p._2 == 0).toLong
    val po = (n11 + n00).toDouble / n
    val pe = ((n11 + n10).toDouble * (n11 + n01) + (n01 + n00).toDouble * (n10 + n00)) / (n.toDouble * n)
    assert((got.getAs[Long]("n"), got.getAs[Long]("n11"), got.getAs[Long]("n10"),
      got.getAs[Long]("n01"), got.getAs[Long]("n00")) === ((n, n11, n10, n01, n00)))
    assert(got.getAs[Double]("observed_agreement") === r6(po))
    assert(got.getAs[Double]("chance_agreement") === r6(pe))
    assert(got.getAs[Double]("kappa") === r6((po - pe) / (1.0 - pe)))
    // the crafted corpus must exercise BOTH judges' both verdicts
    assert(Seq(n11, n10, n01, n00).count(_ > 0) >= 3, s"degenerate contingency: $n11 $n10 $n01 $n00")
    spark.catalog.dropTempView("documents")
  }

  test("RBO: SQL weighted overlap equals an independent textbook computation") {
    import spark.implicits._
    // hand-built rank lists: doc 1 tops both; docs 3 and 7 shared at
    // different depths; the rest disjoint
    val listA = (1 to 10).map(r => (r.toLong * 100 + 1, r)) // docs 101,201,...
    val listB = Seq((101L, 1), (301L, 4), (701L, 2)) ++
      (4 to 10).map(r => (r.toLong * 100 + 99, r))
    listA.toDF("doc_id", "rk").createOrReplaceTempView("ndcg_ranked")
    listB.toDF("doc_id", "rk").createOrReplaceTempView("cov_ranked")
    val got = spark.sql(SqlOps.searchRbo.body(SparkDialect)).collect().head

    // ---- independent textbook RBO@10, same exact weight pinning ----
    val wq = (1 to 10).map { d =>
      ((BigDecimal(1) - BigDecimal("0.9")) * BigDecimal("0.9").pow(d - 1) *
        BigDecimal(1000000000000L)).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLongExact
    }
    val ra = listA.toMap
    val shared = listB.collect { case (id, rb) if ra.contains(id) => math.max(ra(id), rb) }
    val terms = (1 to 10).map { d =>
      val ov = shared.count(_ <= d).toLong
      math.floor(wq(d - 1).toDouble * ov / d + 0.5).toLong
    }
    assert(got.getAs[Long]("n_shared_top10") === shared.size.toLong)
    assert(got.getAs[Double]("rbo_at_10") === r6(terms.sum.toDouble / 1e12))
    // sanity: identical lists give RBO@10 = Σ w_d (the truncated mass)
    listA.toDF("doc_id", "rk").createOrReplaceTempView("cov_ranked")
    val same = spark.sql(SqlOps.searchRbo.body(SparkDialect)).collect().head
    assert(same.getAs[Double]("rbo_at_10") === r6(wq.sum.toDouble / 1e12))
    spark.catalog.dropTempView("ndcg_ranked")
    spark.catalog.dropTempView("cov_ranked")
  }

  // ---- shared plain-Scala md5 mirror for the hash-ring fixtures ----
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString

  test("Bradley-Terry: SQL MM strengths equal an independent integer replay, " +
    "and the likelihood audit holds") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    // 3 sources with planted latent strengths via token counts (A docs
    // longest, C shortest) — enough docs that the hash ring yields
    // cross-source comparisons
    val docs: Seq[(Long, String, String)] = (0 until 120).map { i =>
      val src = "SRC" + ('A' + i % 3).toChar
      val len = 4 + (i % 3 match { case 0 => 16 case 1 => 8 case _ => 0 }) + i % 4
      (i.toLong, src, (0 until len).map(j => s"w${i}x$j").mkString(" "))
    }
    docs.toDF("doc_id", "source", "text").createOrReplaceTempView("documents")
    SqlOps.prefBradleyTerry.stages.foreach { case (name, build) =>
      spark.sql(build(SparkDialect)).localCheckpoint().createOrReplaceTempView(name)
    }
    val got = spark.sql(SqlOps.prefBradleyTerry.body(SparkDialect)).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Double]("strength"), r.getAs[Long]("bt_rank"),
          r.getAs[Long]("wins"), r.getAs[Long]("n_cmp"),
          r.getAs[Double]("loglik_init_bits"), r.getAs[Double]("loglik_final_bits"),
          r.getAs[Boolean]("mm_improves"))).toMap

    // ---- independent replay: fixture derivation + integer MM ----
    def bucket(t: String): Int = {
      val h = md5hex(t)
      ("0123456789abcdef".indexOf(h(0))) * 16 + "0123456789abcdef".indexOf(h(1))
    }
    val byId = docs.map(d => d._1 -> d).toMap
    val b = docs.map { case (id, src, t) => (id, src, t.split(" ", -1).length.toLong, bucket(t)) }
    val rep = b.groupBy(_._4).map { case (bk, xs) => bk -> xs.map(_._1).min }
    val judgments = b.flatMap { case (aId, aSrc, aTok, aBkt) =>
      rep.get((aBkt + 97) % 256).map(byId).collect {
        case (bId, bSrc, bText) if bSrc != aSrc =>
          val bTok = bText.split(" ", -1).length.toLong
          val latent = aTok > bTok || (aTok == bTok && aId < bId)
          val flip = md5hex(s"$aId|$bId").head < '4'
          (aSrc, bSrc, if (latent != flip) 1 else 0)
      }
    }
    val cmp: Map[(String, String), (Long, Long)] = judgments
      .groupBy { case (a, bb, _) => (Seq(a, bb).min, Seq(a, bb).max) }
      .map { case ((si, sj), js) =>
        (si, sj) -> (js.size.toLong,
          js.count { case (a, _, w) => (a == si && w == 1) || (a != si && w == 0) }.toLong)
      }
    assert(cmp.nonEmpty, "fixture must produce cross-source comparisons")
    val srcs = cmp.keys.flatMap(k => Seq(k._1, k._2)).toSeq.distinct.sorted
    def fd(a: Long, bb: Long): Long = a / bb // all operands nonnegative
    var s: Map[String, Long] = srcs.map(_ -> 1000000L).toMap
    for (_ <- 1 to 3) {
      val sym = cmp.toSeq.flatMap { case ((si, sj), (n, w)) =>
        Seq((si, sj, n, w), (sj, si, n, n - w)) }
      val den = sym.groupBy(_._1).map { case (src, xs) =>
        src -> (xs.map(_._4).sum,
          xs.map { case (_, o, n, _) => fd(n * 1000000000000L, s(src) + s(o)) }.sum)
      }
      val raw = den.map { case (src, (wins, dn)) =>
        src -> fd((wins + 1) * 1000000000000L, dn + fd(2000000000000L, s(src) + 1000000L))
      }
      val mean = math.max(fd(raw.values.sum, raw.size.toLong), 1L)
      s = raw.map { case (src, r0) => src -> math.max(fd(r0 * 1000000L, mean), 1L) }
    }
    def ll(st: Map[String, Long]): Long = cmp.toSeq.flatMap { case ((si, sj), (n, w)) =>
      Seq((si, sj, w), (sj, si, n - w)) }.map { case (a, bb, w) =>
      w * (ulmQlog2(st(a)) - ulmQlog2(st(a) + st(bb))) }.sum
    val l0 = ll(srcs.map(_ -> 1000000L).toMap)
    val l1 = ll(s)
    assert(got.keySet === s.keySet)
    s.foreach { case (src, sv) =>
      assert(got(src)._1 === r6(sv.toDouble / 1e6), s"strength of $src")
      assert(got(src)._5 === r6(l0.toDouble / 1e6))
      assert(got(src)._6 === r6(l1.toDouble / 1e6))
    }
    assert(l1 >= l0 && got.values.forall(_._7), "the MM step must improve the likelihood")
    // the planted ordering surfaces: every A-source strength ranks
    // above every C-source strength
    assert(got("SRCA")._1 > got("SRCC")._1, "latent strength must drive the fit")
    val wantRank = s.toSeq.sortBy { case (src, sv) => (-sv, src) }.map(_._1)
      .zipWithIndex.map { case (src, i) => src -> (i + 1).toLong }.toMap
    got.foreach { case (src, g) => assert(g._2 === wantRank(src), s"rank of $src") }
    spark.catalog.dropTempView("documents")
  }

  test("JL projection: SQL distortion audit equals an independent integer replay " +
    "and the distances genuinely concentrate") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    val dim = 8
    // ids span both halves of the mod-256 ring so every rotated
    // bucket (b+128) actually has a representative
    val data: Seq[(Long, Array[Float])] = ((0 until 40) ++ (128 until 168)).map { i =>
      i.toLong -> Array.tabulate(dim)(j =>
        (math.sin(i * 1.7 + j * 0.9) * 2.0 + ((i * 13 + j * 7) % 5) * 0.3).toFloat)
    }
    data.map { case (id, v) => (id, v, 0) }
      .toDF("vec_id", "embedding", "label").createOrReplaceTempView("embeddings")
    SqlOps.embedJlDistortion.stages.foreach { case (name, build) =>
      spark.sql(build(SparkDialect)).localCheckpoint().createOrReplaceTempView(name)
    }
    val got = spark.sql(SqlOps.embedJlDistortion.body(SparkDialect)).collect()
      .map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"),
        r.getAs[Double]("distortion"), r.getAs[Double]("mean_distortion"),
        r.getAs[Double]("frac_within_50pct"))).sortBy(t => (t._1, t._2))

    // ---- independent integer replay ----
    def fd(a: Long, bb: Long): Long = Math.floorDiv(a, bb)
    val qv: Map[(Long, Int), Long] = data.flatMap { case (id, v) =>
      v.zipWithIndex.map { case (x, p) => (id, p) -> math.floor(x.toDouble * 1e6 + 0.5).toLong }
    }.toMap
    val sign: Map[(Int, Int), Long] = (for (k <- 0 until 16; p <- 0 until dim) yield
      (k, p) -> (if (md5hex(s"$k:$p").head < '8') 1L else -1L)).toMap
    val qp: Map[(Long, Int), Long] = (for ((id, _) <- data; k <- 0 until 16) yield
      (id, k) -> (0 until dim).map(p => sign((k, p)) * qv((id, p))).sum).toMap
    val rep = data.map(_._1).groupBy(_ % 256).map { case (bk, xs) => bk -> xs.min }
    val pairs = data.map(_._1).flatMap { a =>
      rep.get((a % 256 + 128) % 256).collect { case bId if bId != a => (a, bId) } }
    val expected = pairs.map { case (a, bb) =>
      val so = (0 until dim).map(p => { val d0 = qv((a, p)) - qv((bb, p)); d0 * d0 }).sum
      val sp = (0 until 16).map(k => { val d0 = fd(qp((a, k)) - qp((bb, k)), 1000L); d0 * d0 }).sum
      val dmu = math.floor(math.sqrt(sp.toDouble * 1e6 / 16.0 / so.toDouble) * 1e6 + 0.5).toLong
      (a, bb, dmu)
    }.sortBy(t => (t._1, t._2))
    val dmus = expected.map(_._3)
    val meanD = r6(dmus.sum.toDouble / 1e6 / dmus.size)
    val frac = r6(dmus.count(d => d >= 500000L && d <= 1500000L).toDouble / dmus.size)
    assert(got.map(t => (t._1, t._2, t._3)) ===
      expected.map(t => (t._1, t._2, t._3.toDouble / 1e6)))
    got.foreach { t => assert(t._4 === meanD && t._5 === frac) }
    // JL actually works on this fixture: distances concentrate
    assert(frac >= 0.9, s"JL distortion should concentrate, frac=$frac")
    spark.catalog.dropTempView("embeddings")
  }

  test("filter calibration: SQL ECE equals an independent binned replay") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    // planted lengths straddling the Gopher word-count band and a mix
    // of stopword-bearing and stopword-free docs → a reliability curve
    // with both under- and over-confident bins
    val stopTail = "the and of"
    val docs: Seq[(Long, String)] = (0 until 60).map { i =>
      val n = 10 + i * 3
      val body = (0 until n).map(j => s"tok${i}v$j").mkString(" ")
      (i.toLong, if (i % 3 != 0) s"$body $stopTail" else body)
    }
    docs.toDF("doc_id", "text").createOrReplaceTempView("documents")
    val got = spark.sql(SqlOps.filterCalibration(SparkDialect)).collect()
      .map(r => r.getAs[Long]("bin") ->
        (r.getAs[Long]("n_docs"), r.getAs[Double]("mean_conf"),
          r.getAs[Double]("pass_rate"), r.getAs[Double]("gap"),
          r.getAs[Double]("ece"))).toMap

    // ---- independent replay of the counters, rules, bins and ECE ----
    val stops = Set("the", "and", "of", "to", "in", "is", "a")
    val rows = docs.map { case (_, t) =>
      val toks = t.split(" ", -1)
      val nWords = toks.length.toLong
      val nChars = t.replace(" ", "").length.toLong
      val nSym = ("#|\\.\\.\\.".r).findAllIn(t).length.toLong
      val nAlpha = toks.count(w => w.toLowerCase != w.toUpperCase).toLong
      val nStop = toks.filter(stops).distinct.length.toLong
      val pass = (nWords >= 50 && nWords <= 100000) &&
        (nChars >= 3 * nWords && nChars <= 10 * nWords) &&
        (nSym * 10 < nWords) && (nAlpha * 10 >= nWords * 8) && (nStop >= 2)
      val conf = math.min(1000000L * nWords / 100L, 1000000L)
      (conf, if (pass) 1L else 0L)
    }
    val bins = rows.groupBy { case (c, _) => math.min(c * 10 / 1000001L, 9L) }
    val perBin = bins.map { case (bin, xs) =>
      val n = xs.size.toLong
      val acc = 1000000L * xs.map(_._2).sum / n
      val cf = xs.map(_._1).sum / n
      bin -> (n, cf, acc)
    }
    val tot = rows.size.toLong
    val ece = perBin.values.map { case (n, cf, acc) => n * math.abs(acc - cf) }.sum / tot
    assert(got.keySet === perBin.keySet)
    perBin.foreach { case (bin, (n, cf, acc)) =>
      val g = got(bin)
      assert(g._1 === n, s"bin $bin count")
      assert(g._2 === r6(cf.toDouble / 1e6), s"bin $bin conf")
      assert(g._3 === r6(acc.toDouble / 1e6), s"bin $bin accuracy")
      assert(g._4 === r6((acc - cf).toDouble / 1e6), s"bin $bin gap")
      assert(g._5 === r6(ece.toDouble / 1e6), s"ece")
    }
    // the curve is genuinely mixed: some bin under-confident, some over
    assert(perBin.values.exists { case (_, cf, acc) => acc > cf } &&
           perBin.values.exists { case (_, cf, acc) => acc < cf })
    spark.catalog.dropTempView("documents")
  }

  test("water-filling: SQL closed-form allocation equals an independent " +
    "iterative re-levelling fixpoint") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    // 8 domains with skewed caps: a tie among the small (all-or-none
    // capping), four large ones that get levelled, and a cap mass that
    // leaves a nonzero sub-level remainder — every arm of the SQL is
    // exercised; multiple rows per domain so the SUM rollup matters
    val domCaps: Seq[(String, String, Long)] = Seq(
      ("A", "en", 12L), ("B", "en", 30L), ("C", "en", 30L), ("D", "en", 55L),
      ("E", "en", 4000L), ("F", "en", 5000L), ("G", "en", 7000L), ("H", "en", 9000L))
    val rows = domCaps.zipWithIndex.flatMap { case ((s, l, cap), i) =>
      // split each cap over 3 rows (two fixed chips + remainder)
      val chip = cap / 4
      Seq((i * 3L, s, l, chip), (i * 3L + 1, s, l, chip), (i * 3L + 2, s, l, cap - 2 * chip))
    }
    rows.toDF("doc_id", "source", "lang", "n_chars").createOrReplaceTempView("documents")
    val got = spark.sql(SqlOps.mixWaterfill(SparkDialect)).collect()
      .map(r => r.getAs[String]("domain") ->
        (r.getAs[Long]("available"), r.getAs[Long]("allocated"),
          r.getAs[Boolean]("is_capped"), r.getAs[Boolean]("fully_allocated"),
          r.getAs[Boolean]("within_cap"))).toMap

    // ---- independent implementation: textbook iterative water-fill,
    // re-levelling over the uncapped set until the fixpoint (the SQL
    // instead uses the sorted-prefix closed form) ----
    val caps: Map[String, Long] = domCaps.map { case (s, l, c) => s"$s:$l" -> c }.toMap
    val budget = caps.values.sum * 3 / 5
    var cappedSet = Set.empty[String]
    var changed = true
    while (changed) {
      val unc = caps.keys.filterNot(cappedSet).toSeq
      val rem = budget - cappedSet.toSeq.map(caps).sum
      val newly = unc.filter(d => caps(d) * unc.size <= rem)
      changed = newly.nonEmpty
      cappedSet ++= newly
    }
    val unc = caps.keys.filterNot(cappedSet).toSeq.sorted
    val rem = budget - cappedSet.toSeq.map(caps).sum
    val base = rem / unc.size
    val extra = rem % unc.size
    val expAlloc: Map[String, Long] =
      cappedSet.map(d => d -> caps(d)).toMap ++
        unc.zipWithIndex.map { case (d, i) => d -> (base + (if (i < extra) 1L else 0L)) }
    assert(got.keySet === caps.keySet)
    caps.keys.foreach { d =>
      val (avail, alloc, isCapped, full, within) = got(d)
      assert(avail === caps(d), s"$d available")
      assert(alloc === expAlloc(d), s"$d allocated")
      assert(isCapped === cappedSet(d), s"$d is_capped")
      assert(full && within, s"$d invariants")
    }
    // the fixture genuinely exercises every arm
    assert(cappedSet.nonEmpty && unc.nonEmpty, "need both capped and levelled domains")
    assert(extra > 0, "need a sub-level remainder so largest-remainder +1s happen")
    assert(expAlloc.values.sum === budget)
    spark.catalog.dropTempView("documents")
  }

  test("split-conformal threshold: SQL tau and held-out rates equal an " +
    "independent ordered-statistic replay") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    // 160 docs: word counts sweep 40..129 (so conf sweeps the band and
    // caps at 1.0 → ties at the top), short docs fail the Gopher
    // word-count rule (true negatives below tau), every 11th doc is a
    // symbol-spam fail with HIGH conf (false keeps) — both halves of
    // the md5 split get positives and negatives
    val stopTail = "the and of"
    val docs: Seq[(Long, String)] = (0 until 160).map { i =>
      val n = 40 + (i * 7) % 90
      val body = (0 until n).map(j => s"w${i}x$j").mkString(" ")
      val text =
        if (i % 11 == 0) s"$body ${Seq.fill(n / 5)("#").mkString(" ")} $stopTail"
        else s"$body $stopTail"
      (i.toLong, text)
    }
    docs.toDF("doc_id", "text").createOrReplaceTempView("documents")
    val got = spark.sql(SqlOps.filterConformal.single(SparkDialect)).collect()
    assert(got.length === 1)
    val g = got(0)

    // ---- independent replay: counters, md5 split, ordered-statistic
    // tau, exact integer rates ----
    val stops = Set("the", "and", "of", "to", "in", "is", "a")
    case class D(id: Long, conf: Long, pass: Boolean, cal: Boolean)
    val ds = docs.map { case (id, t) =>
      val toks = t.split(" ", -1)
      val nWords = toks.length.toLong
      val nChars = t.replace(" ", "").length.toLong
      val nSym = ("#|\\.\\.\\.".r).findAllIn(t).length.toLong
      val nAlpha = toks.count(w => w.toLowerCase != w.toUpperCase).toLong
      val nStop = toks.filter(stops).distinct.length.toLong
      val pass = (nWords >= 50 && nWords <= 100000) &&
        (nChars >= 3 * nWords && nChars <= 10 * nWords) &&
        (nSym * 10 < nWords) && (nAlpha * 10 >= nWords * 8) && (nStop >= 2)
      val conf = math.min(1000000L * nWords / 100L, 1000000L)
      val cal = Integer.parseInt(md5hex(t).substring(0, 2), 16) < 128
      D(id, conf, pass, cal)
    }
    val calPos = ds.filter(d => d.cal && d.pass).sortBy(d => (d.conf, d.id))
    val npos = calPos.size.toLong
    val tau = calPos(((npos + 9) / 10 - 1).toInt).conf
    val calFn = calPos.count(_.conf < tau).toLong
    val test = ds.filterNot(_.cal)
    val nTest = test.size.toLong
    val testPos = test.count(_.pass).toLong
    val testFn = test.count(d => d.pass && d.conf < tau).toLong
    val testKeep = test.count(_.conf >= tau).toLong
    val testTn = test.count(d => d.conf < tau && !d.pass).toLong
    assert(g.getAs[Double]("tau") === r6(tau.toDouble / 1e6))
    assert(g.getAs[Long]("cal_pos") === npos)
    assert(g.getAs[Double]("cal_fnr") === r6(calFn.toDouble / npos))
    assert(g.getAs[Boolean]("cal_within_alpha") === (calFn * 10 <= npos))
    assert(g.getAs[Boolean]("cal_within_alpha"), "the ordered statistic must enforce alpha")
    assert(g.getAs[Double]("test_fnr") === r6(testFn.toDouble / testPos))
    assert(g.getAs[Double]("test_keep_rate") === r6(testKeep.toDouble / nTest))
    assert(g.getAs[Double]("reject_precision") === r6(testTn.toDouble / (nTest - testKeep)))
    // the fixture discriminates: an interior tau, real misses on the
    // held-out half, and genuine true rejections below tau
    assert(npos >= 20 && tau > 500000L && tau < 1000000L, s"tau=$tau npos=$npos")
    assert(testFn > 0 && testTn > 0 && testKeep < nTest)
    spark.catalog.dropTempView("documents")
  }

  test("DPO pairs: SQL chosen/rejected selection equals an independent " +
    "per-group scan with ties and threshold edges") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    // groups engineered at the rule edges: a tie at the top AND at the
    // bottom (doc_id must break both), a group with margin exactly AT
    // the 10% line, one just UNDER it, and a group below the size gate
    def doc(id: Long, src: String, lang: String, nTok: Int): (Long, String, String, String) =
      (id, src, lang, (0 until nTok).map(j => s"t${id}x$j").mkString(" "))
    val docs: Seq[(Long, String, String, String)] = Seq(
      // G1: top tie 100@(1,2), bottom tie 40@(3,4) — ids break ties
      doc(2, "A", "en", 100), doc(1, "A", "en", 100), doc(4, "A", "en", 40), doc(3, "A", "en", 40),
      // G2: margin exactly 10% of chosen (50 -> 45): 5*10 = 50 — kept
      doc(10, "B", "en", 50), doc(11, "B", "en", 45), doc(12, "B", "en", 47), doc(13, "B", "en", 48),
      // G3: margin just under 10% (50 -> 46): 4*10 < 50 — dropped
      doc(20, "C", "en", 50), doc(21, "C", "en", 46), doc(22, "C", "en", 47), doc(23, "C", "en", 48),
      // G4: only 3 candidates — dropped by the size gate
      doc(30, "D", "en", 90), doc(31, "D", "en", 10), doc(32, "D", "en", 50))
    docs.toDF("doc_id", "source", "lang", "text").createOrReplaceTempView("documents")
    val got = spark.sql(SqlOps.prefDpoPairs(SparkDialect)).collect()
      .map(r => (r.getAs[String]("prompt_group"), r.getAs[Long]("n_candidates"),
        r.getAs[Long]("chosen_id"), r.getAs[Long]("chosen_reward"),
        r.getAs[Long]("rejected_id"), r.getAs[Long]("rejected_reward"),
        r.getAs[Long]("margin")))

    // ---- independent per-group scan ----
    val expected = docs.groupBy { case (_, s, l, _) => s"$s:$l" }.toSeq.flatMap {
      case (grp, ds) =>
        val scored = ds.map { case (id, _, _, t) => (id, t.split(" ", -1).length.toLong) }
        val chosen = scored.minBy { case (id, r) => (-r, id) }
        val rejected = scored.minBy { case (id, r) => (r, id) }
        val margin = chosen._2 - rejected._2
        if (scored.size >= 4 && margin * 10 >= chosen._2)
          Some((grp, scored.size.toLong, chosen._1, chosen._2, rejected._1, rejected._2, margin))
        else None
    }.sortBy(_._1)
    assert(got.toSeq === expected)
    // the edges actually fired: G1 kept with both ties id-broken,
    // G2 kept at the exact line, G3 and G4 dropped
    assert(expected.map(_._1) === Seq("A:en", "B:en"))
    assert(expected.head._3 === 1L && expected.head._5 === 3L)
    spark.catalog.dropTempView("documents")
  }

  test("Poisson bootstrap: SQL weights, rates, CI ranks and SE equal an " +
    "independent replay with independently derived thresholds") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    // 120 docs, a planted ~55% Gopher pass-rate: ids ending 0..5 pass
    // (55+ words with stopwords), the rest fail the word-count rule
    val stopTail = "the and of"
    val docs: Seq[(Long, String)] = (0 until 120).map { i =>
      val n = if (i % 10 <= 5) 60 + i % 7 else 30 + i % 7
      (i.toLong, (0 until n).map(j => s"w${i}x$j").mkString(" ") + " " + stopTail)
    }
    docs.toDF("doc_id", "text").createOrReplaceTempView("documents")
    val got = spark.sql(SqlOps.evalBootstrap(SparkDialect)).collect()
    assert(got.length === 1)
    val g = got(0)

    // ---- independent replay ----
    // thresholds re-derived a DIFFERENT way: e via Σ1/j! then inverted,
    // CDF terms multiplied down recursively (the main path uses the
    // alternating e^{-1} series)
    val mc = new java.math.MathContext(50)
    val e = (0 to 40).foldLeft(BigDecimal(0, mc)) { (s, j) =>
      s + BigDecimal(1, mc) / (1 to j).foldLeft(BigDecimal(1, mc))(_ * _)
    }
    val thresholds: Seq[Long] = {
      var cdf = BigDecimal(0, mc)
      var term = BigDecimal(1, mc) / e // e^{-1}·1/0!
      (1 to 8).map { k =>
        cdf += term
        term = term / k
        (cdf * BigDecimal(1L << 48)).setScale(0, BigDecimal.RoundingMode.FLOOR).toLongExact
      }
    }
    val stops = Set("the", "and", "of", "to", "in", "is", "a")
    val pass: Map[Long, Long] = docs.map { case (id, t) =>
      val toks = t.split(" ", -1)
      val nWords = toks.length.toLong
      val nChars = t.replace(" ", "").length.toLong
      val ok = (nWords >= 50 && nWords <= 100000) &&
        (nChars >= 3 * nWords && nChars <= 10 * nWords) &&
        toks.count(w => w.toLowerCase != w.toUpperCase) * 10 >= nWords * 8 &&
        toks.filter(stops).distinct.length >= 2
      id -> (if (ok) 1L else 0L)
    }.toMap
    def u48(s: String): Long = java.lang.Long.parseLong(md5hex(s).substring(0, 12), 16)
    val weights: Seq[(Int, Long, Long)] = for {
      (id, _) <- docs; b <- 1 to 64
    } yield {
      val u = u48(s"$id#$b")
      (b, pass(id), thresholds.count(u >= _).toLong)
    }
    val rates: Seq[(Long, Int)] = weights.groupBy(_._1).toSeq.map { case (b, ws) =>
      val wtot = ws.map(_._3).sum
      val wpass = ws.collect { case (_, p, w) if p == 1 => w }.sum
      (wpass * 1000000L / wtot, b)
    }.sorted
    // CI ranks derived from B the same way the query derives them
    // (⌈0.025·B⌉ and B+1−⌈0.025·B⌉), not hardcoded — a B change must
    // move both sides of this comparison together
    val loRank = (64 + 39) / 40
    val lo = rates(loRank - 1)._1
    val hi = rates(64 - loRank)._1
    val s1 = rates.map(_._1).sum
    val s2 = rates.map(r => r._1 * r._1).sum
    val nb = 64L
    val se = math.sqrt((nb * s2 - s1 * s1).toDouble / (nb * (nb - 1))) / 1.0e6
    val np = pass.values.sum
    assert(g.getAs[Long]("n_docs") === 120L)
    assert(g.getAs[Double]("pass_rate") === r6(np.toDouble / 120))
    assert(g.getAs[Double]("ci_lo") === r6(lo.toDouble / 1e6))
    assert(g.getAs[Double]("ci_hi") === r6(hi.toDouble / 1e6))
    assert(g.getAs[Double]("boot_se") === r6(se))
    assert(g.getAs[Long]("n_resamples") === 64L)
    // the resampling is genuinely Poisson-spread (zeros and multiples
    // both occur), the CI is nondegenerate and brackets the estimate
    assert(weights.exists(_._3 == 0L) && weights.exists(_._3 >= 2L))
    assert(lo < hi && lo.toDouble / 1e6 <= np.toDouble / 120 && np.toDouble / 120 <= hi.toDouble / 1e6)
    spark.catalog.dropTempView("documents")
  }

  test("k-means loop: SQL staged Lloyd rounds equal an independent fixpoint replay") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    val dim = 64 // emb_nv's sign bands read the first 64 positions
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(3, dim)(rnd.nextFloat() * 2f - 1f)
    // 45 vectors near 3 planted centers; a third of the initial labels
    // are deliberately scrambled so round 1 has real work to do
    val vecs = (0 until 45).map { i =>
      val t = i % 3
      val v = Array.tabulate(dim)(j => centers(t)(j) + (rnd.nextFloat() - 0.5f) * 0.3f)
      val lbl = if (i % 5 == 0) (t + 1) % 3 else t
      (i.toLong, lbl.toLong, v.toSeq)
    }
    vecs.toDF("vec_id", "label", "embedding")
      .selectExpr("vec_id", "CAST(label AS INT) AS label",
        "CAST(embedding AS ARRAY<FLOAT>) AS embedding")
      .createOrReplaceTempView("embeddings")
    SqlOps.kmeansLoop.stages.foreach { case (name, build) =>
      spark.sql(build(SparkDialect)).localCheckpoint().createOrReplaceTempView(name)
    }
    val got = spark.sql(SqlOps.kmeansLoop.body(SparkDialect)).collect()
      .map(r => (r.getAs[Int]("round"), r.getAs[Long]("n_reassigned"),
        r.getAs[Long]("shift_l1"), r.getAs[Long]("n_cells"))).sortBy(_._1)

    // ---- independent plain-Scala Lloyd on the same µ-quantized grid ----
    def qvq(v: Float): Long = math.floor(v.toDouble * 1e6 + 0.5).toLong
    val pts: Map[Long, Array[Long]] = vecs.map { case (id, _, v) => id -> v.map(qvq).toArray }.toMap
    def centroidsOf(asgn: Map[Long, Long]): Map[Long, Array[Long]] =
      asgn.groupBy(_._2).map { case (c, m) =>
        val members = m.keys.toSeq.map(pts)
        c -> Array.tabulate(dim) { j =>
          math.floor(members.map(_(j)).sum.toDouble / members.size + 0.5).toLong
        }
      }
    def assignAll(cents: Map[Long, Array[Long]]): Map[Long, Long] =
      pts.map { case (id, p) =>
        id -> cents.toSeq.map { case (c, q) =>
          ((0 until dim).map { j => val dd = p(j) - q(j); dd * dd }.sum, c)
        }.min._2
      }
    var asgn: Map[Long, Long] = vecs.map(v => v._1 -> v._2).toMap
    var cents = centroidsOf(asgn)
    val expected = (1 to 3).map { r =>
      val na = assignAll(cents)
      val nc = centroidsOf(na)
      val shift = nc.keys.filter(cents.contains).toSeq.map { c =>
        (0 until dim).map(j => math.abs(nc(c)(j) - cents(c)(j))).sum
      }.sum
      val row = (r, na.count { case (id, c) => asgn(id) != c }.toLong,
        shift, na.values.toSet.size.toLong)
      asgn = na; cents = nc
      row
    }
    assert(got.toSeq === expected)
    // the loop genuinely converges on this fixture: round 1 fixes the
    // scrambled labels, later rounds reassign strictly less
    assert(expected.head._2 >= 9L, s"round 1 must do real work: ${expected.head._2}")
    assert(expected.last._2 < expected.head._2)
    spark.catalog.dropTempView("embeddings")
  }

  test("Stupid-Backoff LM: SQL seen/backoff/OOV arms equal an independent " +
    "replay with an independently derived penalty constant") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    def bucket(t: String): Int = Integer.parseInt(md5hex(t).substring(0, 2), 16)
    // brute-force texts into the right md5 halves: train docs teach
    // the bigrams, the held-out doc replays one seen bigram, one
    // novel-but-known-words bigram, and one OOV word
    val trainBody = "alpha beta alpha beta gamma alpha"
    val train = Iterator.from(0).map(i => s"$trainBody pad$i")
      .filter(t => bucket(t) < 128).take(3).toSeq
    // "gamma gamma" is the novel known-words bigram (train never has
    // it), "alpha zzoovN" the OOV backoff, "alpha beta" the seen arm
    val hoText = Iterator.from(0).map(i => s"alpha beta gamma gamma alpha zzoov$i")
      .filter(t => bucket(t) >= 128).next()
    val docs = train.zipWithIndex.map { case (t, i) => (i.toLong, t) } :+ (100L, hoText)
    docs.toDF("doc_id", "text").createOrReplaceTempView("documents")
    SqlOps.textBackoffLm.stages.foreach { case (name, build) =>
      spark.sql(build(SparkDialect)).localCheckpoint().createOrReplaceTempView(name)
    }
    val got = spark.sql(SqlOps.textBackoffLm.body(SparkDialect)).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_bigrams"),
        r.getAs[Long]("n_backoff"), r.getAs[Double]("mean_bits")))
    assert(got.map(_._1).toSet === Set(100L), "only the held-out doc is scored")

    // ---- independent replay ----
    def qlog2(x: Long): Long =
      math.floor(math.log(x.toDouble) / math.log(2.0) * 1e6 + 0.5).toLong
    // penalty derived a different way: log2(5/2) via BigDecimal ln
    // ratio is overkill here — use log1p for an independent code path
    val b04 = math.floor(math.log1p(1.5) / math.log(2.0) * 1e6 + 0.5).toLong
    val trTok = train.flatMap(_.split(" ", -1).filter(_.nonEmpty))
    val uni = trTok.groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
    val bi = train.flatMap { t =>
      val ws = t.split(" ", -1).filter(_.nonEmpty)
      ws.zip(ws.drop(1)).map { case (a, b) => s"$a $b" }
    }.groupBy(identity).map { case (s, xs) => s -> xs.size.toLong }
    val nn = trTok.size.toLong
    val hoWs = hoText.split(" ", -1).filter(_.nonEmpty)
    val hoBis = hoWs.zip(hoWs.drop(1)).map { case (a, b) => s"$a $b" }
    val qs = hoBis.map { s =>
      val Array(w1, w2) = s.split(" ", -1)
      bi.get(s) match {
        case Some(c12) => (qlog2(uni(w1)) - qlog2(c12), 0L)
        case None => (b04 + qlog2(nn) - qlog2(uni.getOrElse(w2, 1L)), 1L)
      }
    }
    val expMean = r6((qs.map(_._1).sum / qs.size).toDouble / 1e6)
    assert(got.head === ((100L, qs.size.toLong, qs.map(_._2).sum, expMean)))
    // the fixture exercises all three arms
    assert(qs.map(_._2).sum >= 2L, "novel bigram AND the OOV word back off")
    assert(qs.exists(_._2 == 0L), "a seen bigram takes the direct arm")
    spark.catalog.dropTempView("documents")
  }

  test("Neyman allocation: SQL cap-aware weights and largest-remainder split " +
    "equal an independent replay; capped, degenerate and unfilled paths hold") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    // A: big, varied (absorbs the redistribution); B: tiny but very
    // varied (Neyman share ~13 > its 8 rows → CAPPED at 8); C:
    // constant lengths (sigma 0 → weight 0); D: singleton (→ 0)
    val docs: Seq[(Long, String, Long)] =
      (0 until 300).map(i => (i.toLong, "A", 100L + 7 * (i % 9))) ++
      (0 until 8).map(i => (1000L + i, "B", 50L + 90 * (i % 2))) ++
      (0 until 20).map(i => (2000L + i, "C", 333L)) :+
      ((3000L, "D", 123L))
    docs.toDF("doc_id", "lang", "n_chars").createOrReplaceTempView("documents")
    def run() = spark.sql(SqlOps.sampleNeyman(SparkDialect)).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("n"),
        r.getAs[Double]("sigma"), r.getAs[Long]("wt"), r.getAs[Long]("n_alloc"),
        r.getAs[Boolean]("is_capped"), r.getAs[Boolean]("budget_unfilled")))
      .sortBy(_._1)
    val got = run()

    // ---- independent replay of the cap-aware water-fill ----
    val strata = docs.groupBy(_._2).toSeq.map { case (l, xs) =>
      val n = xs.size.toLong
      val s1 = xs.map(_._3).sum
      val s2 = xs.map(x => x._3 * x._3).sum
      val num = n * s2 - s1 * s1
      val (wt, sig) =
        if (n < 2 || num <= 0) (0L, 0.0)
        else {
          val s = math.sqrt(num.toDouble / (n * (n - 1)))
          (math.floor(n.toDouble * s).toLong, r6(s))
        }
      (l, n, sig, wt)
    }
    val pos = strata.filter(_._4 > 0).sortBy { case (l, n, _, wt) =>
      (1000000L * n / wt, l)
    }
    // prefix cap test, same DOUBLE cross-multiplication as the SQL
    var pfxN = 0L; var pfxW = 0L
    val tw = pos.map(_._4).sum
    val capFlags = pos.map { case (l, n, _, wt) =>
      val capped = n.toDouble * (tw - pfxW) <= (200L - pfxN).toDouble * wt
      if (capped) { pfxN += n }
      pfxW += wt
      (l, capped)
    }.toMap
    val cn = pos.collect { case (l, n, _, _) if capFlags(l) => n }.sum
    val wu = pos.collect { case (l, _, _, wt) if !capFlags(l) => wt }.sum
    val baseRem = pos.map { case (l, n, _, wt) =>
      if (capFlags(l)) (l, n, -1L)
      else (l, (200L - cn) * wt / wu, ((200L - cn) * wt) % wu)
    }
    val leftover = 200L - baseRem.map(_._2).sum
    val plusOne = baseRem.sortBy { case (l, _, rem) => (-rem, l) }.zipWithIndex
      .map { case ((l, b, rem), i) =>
        l -> (b + (if (rem >= 0 && i < leftover) 1L else 0L))
      }.toMap
    val expected = strata.map { case (l, n, sig, wt) =>
      (l, n, sig, wt, plusOne.getOrElse(l, 0L), capFlags.getOrElse(l, false), false)
    }.sortBy(_._1)
    assert(got.toSeq === expected)
    // semantic invariants: no over-allocation, budget exactly spent
    assert(got.forall(g => g._5 <= g._2), "never allocate past the population")
    assert(got.map(_._5).sum === 200L, "budget exactly spent with an uncapped stratum")
    val byL = got.map(g => g._1 -> g).toMap
    assert(byL("B")._6 && byL("B")._5 === 8L, "tiny varied stratum capped at its size")
    assert(!byL("A")._6 && byL("A")._5 === 192L, "uncapped stratum absorbs the rest")
    assert(byL("C")._5 === 0L && byL("D")._5 === 0L)
    spark.catalog.dropTempView("documents")

    // budget exceeding the sampleable mass: everything caps, the flag
    // fires, and allocations equal the populations
    val tiny: Seq[(Long, String, Long)] =
      (0 until 6).map(i => (i.toLong, "A", 100L + 31 * (i % 3))) ++
      (0 until 4).map(i => (100L + i, "B", 50L + 90 * (i % 2)))
    tiny.toDF("doc_id", "lang", "n_chars").createOrReplaceTempView("documents")
    val got2 = run()
    assert(got2.forall(_._7), "budget_unfilled must flag")
    assert(got2.map(g => g._1 -> g._5).toMap === Map("A" -> 6L, "B" -> 4L))
    spark.catalog.dropTempView("documents")
  }

  test("min-k% prob: SQL per-doc selection and mean equal an independent " +
    "surprisal replay, and the all-common doc scores lowest") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    // doc 0 all-common (memorization suspect), doc 1 mixed, doc 2
    // rare-heavy; sizes chosen so ceil(m/5) exercises 1 and 2 picks.
    // Single-space text keeps the tokenizer faithful to word_shingles.
    val docs: Seq[(Long, String)] = Seq(
      (0L, Seq.fill(12)("common").mkString(" ")),                       // m=1
      (1L, (Seq.fill(6)("common") ++ Seq("mid0", "mid1", "r1a", "r1b",
        "r1c", "r1d")).mkString(" ")),                                  // m=7
      (2L, ((0 until 9).map(j => s"r2x$j") ++ Seq("common", "mid0",
        "mid1")).mkString(" ")))                                        // m=12
    docs.toDF("doc_id", "text").createOrReplaceTempView("documents")
    SqlOps.minkProb.stages.foreach { case (name, build) =>
      spark.sql(build(SparkDialect)).localCheckpoint().createOrReplaceTempView(name)
    }
    val got = spark.sql(SqlOps.minkProb.body(SparkDialect)).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_distinct"),
        r.getAs[Long]("k_used"), r.getAs[Double]("mink_bits"))).sortBy(_._1)

    // ---- independent replay ----
    def qlog2(x: Long): Long =
      math.floor(math.log(x.toDouble) / math.log(2.0) * 1e6 + 0.5).toLong
    val tf: Map[(Long, String), Long] = docs.flatMap { case (id, t) =>
      t.split(" ", -1).filter(_.nonEmpty).groupBy(identity)
        .map { case (w, xs) => (id, w) -> xs.size.toLong }
    }.toMap
    val cGlob = tf.groupBy(_._1._2).map { case (w, m) => w -> m.values.sum }
    val nn = tf.values.sum
    val expected = docs.map { case (id, _) =>
      // .toSeq BEFORE collect: collecting (q, w) pairs straight off
      // the Map would build a Map keyed by q and collapse
      // equal-surprisal words (the groupBy-Map re-keying pitfall)
      val qs = tf.toSeq.collect { case ((d, w), _) if d == id =>
        (qlog2(nn) - qlog2(cGlob(w)), w) }
      val m = qs.size
      val k = (m + 4) / 5
      val sel = qs.sortBy { case (q, w) => (-q, w) }.take(k).map(_._1)
      (id, m.toLong, k.toLong, r6((sel.sum / sel.size).toDouble / 1e6))
    }
    assert(got.toSeq === expected)
    assert(got.map(_._3).toSeq === Seq(1L, 2L, 3L), "ceil(m/5) pick sizes")
    // the all-common doc must score strictly lowest; docs 1 and 2 tie
    // exactly — their min-k picks are all global singletons, so the
    // signal correctly ignores how much COMMON filler surrounds them
    assert(got(0)._4 < got(1)._4 && got(1)._4 === got(2)._4)
    spark.catalog.dropTempView("documents")
  }

  test("pass@k: SQL ratio-product estimates equal exact C(n,k) combinatorics, " +
    "including the all-but-guaranteed and undefined edges") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    val stopTail = " the and of"
    def doc(pass: Boolean, id: Long): String = {
      val n = if (pass) 60 else 30 // word-count rule decides
      (0 until n).map(j => s"w${id}x$j").mkString(" ") + stopTail
    }
    // tasks: A 3/10 pass, B 8/10 (n−c=2 < k=4 → pass@4 = 1 exactly),
    // C 0/10, D n=3 < k (pass@4 undefined → NULL)
    val spec = Seq(("A", 10, 3), ("B", 10, 8), ("C", 10, 0), ("D", 3, 2))
    val docs = spec.zipWithIndex.flatMap { case ((src, n, c), t) =>
      (0 until n).map { i =>
        val id = t * 100L + i
        (id, src, doc(i < c, id))
      }
    }
    docs.toDF("doc_id", "source", "text").createOrReplaceTempView("documents")
    val got = spark.sql(SqlOps.evalPassAtK(SparkDialect)).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n"), r.getAs[Long]("c"),
        r.getAs[Double]("pass_at_1"),
        Option(r.get(r.fieldIndex("pass_at_4"))).map(_.asInstanceOf[Double])))
      .sortBy(_._1)
    // exact combinatorial truth: 1 − C(n−c,k)/C(n,k) in BigInt
    def cnk(n: Int, k: Int): BigInt =
      if (k > n) BigInt(0)
      else (0 until k).map(i => BigInt(n - i)).product / (1 to k).map(BigInt(_)).product
    val expected = spec.map { case (src, n, c) =>
      val p4 = if (n < 4) None
        else Some(r6(1.0 - (BigDecimal(cnk(n - c, 4)) / BigDecimal(cnk(n, 4))).toDouble))
      (src, n.toLong, c.toLong, r6(c.toDouble / n), p4)
    }.sortBy(_._1)
    assert(got.toSeq === expected)
    val byS = got.map(g => g._1 -> g).toMap
    assert(byS("B")._5 === Some(1.0), "n−c < k must give pass@4 = 1 exactly")
    assert(byS("C")._5 === Some(0.0), "zero passes must give pass@4 = 0")
    assert(byS("D")._5 === None, "n < k must be NULL, not zero")
    spark.catalog.dropTempView("documents")
  }

  test("KS drift: SQL exact-integer D equals an independent replay, and a " +
    "planted shift trips the asymptotic bar while a matched split does not") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    def run(docs: Seq[(Long, String, Long)]): (Long, Long, Double, Double, Boolean) = {
      docs.toDF("doc_id", "lang", "n_chars").createOrReplaceTempView("documents")
      val r = spark.sql(SqlOps.ksDrift(SparkDialect)).collect().head
      val out = (r.getAs[Long]("n1"), r.getAs[Long]("n2"), r.getAs[Double]("d_stat"),
        r.getAs[Double]("reject_bar"), r.getAs[Boolean]("drifted"))
      spark.catalog.dropTempView("documents")
      out
    }
    def replay(docs: Seq[(Long, String, Long)]): (Double, Boolean) = {
      val en = docs.collect { case (_, "en", x) => x }
      val rest = docs.collect { case (_, l, x) if l != "en" => x }
      val (n1, n2) = (en.size.toLong, rest.size.toLong)
      val dmax = (en ++ rest).distinct.map { v =>
        math.abs(en.count(_ <= v) * n2 - rest.count(_ <= v) * n1)
      }.max
      val d = dmax.toDouble / (n1.toDouble * n2)
      (d, d > 1.358 * math.sqrt((n1 + n2).toDouble / (n1.toDouble * n2)))
    }
    // planted shift: en lengths 100..139, rest 160..199 — disjoint
    // supports, D must be 1 and decisively over the bar
    val shifted = (0 until 40).map(i => (i.toLong, "en", 100L + i)) ++
      (0 until 40).map(i => (100L + i, "de", 160L + i))
    val gotS = run(shifted); val (dS, fS) = replay(shifted)
    assert(gotS._3 === r6(dS) && gotS._5 === fS && fS && gotS._3 === 1.0)
    // matched split: identical interleaved lengths on both sides —
    // D small, under the bar
    val matched = (0 until 40).map(i => (i.toLong, "en", 100L + i % 10)) ++
      (0 until 40).map(i => (100L + i, "de", 100L + i % 10))
    val gotM = run(matched); val (dM, fM) = replay(matched)
    assert(gotM._3 === r6(dM) && gotM._5 === fM && !fM && gotM._3 === 0.0)
    assert(gotS._4 === r6(1.358 * math.sqrt(80.0 / 1600.0)))
  }

  test("LSH S-curve: bucketing and counting replay exactly, and the " +
    "rational theory column equals an independent BigDecimal power series") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    // texts brute-forced into the md5 < 32 sample gate so every
    // planted snapshot doc survives the body's own sampling
    val sampledTexts = Iterator.from(0).map(i => s"planted doc $i")
      .filter(t => Integer.parseInt(md5hex(t).substring(0, 2), 16) < 32)
      .take(3).toSeq
    // documents d → snapshot ids 2d/2d+1 (the corpusCte convention)
    sampledTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text").createOrReplaceTempView("documents")
    // handcrafted shingle index at snapshot grain: ids 0,1 share 3 of
    // 5 (j=0.6 → bucket 6), ids 2,3 share 1 of 7 (j≈0.14 → bucket 1),
    // ids 4,5 identical 4 shingles (j=1 → clamped bucket 9)
    val shingles: Seq[(Long, String)] =
      Seq(0L -> Seq("a", "b", "c", "x"), 1L -> Seq("a", "b", "c", "y"),
          2L -> Seq("p", "q", "r", "s"), 3L -> Seq("p", "t", "u", "v"),
          4L -> Seq("m", "n", "o", "w"), 5L -> Seq("m", "n", "o", "w"))
        .flatMap { case (id, ss) => ss.map(id -> _) }
    shingles.toDF("doc_id", "s").createOrReplaceTempView("nj_dshf")
    // the body's sz alias reads the staged nj_sz artifact (r14);
    // derive it from the planted index via the op's OWN stage SQL so
    // the fixture can't drift from the shipped rollup
    spark.sql(SqlOps.lshScurve.stages.toMap.apply("nj_sz")(SparkDialect))
      .createOrReplaceTempView("nj_sz")
    // the band join surfaced the twin pair and ONE of the overlapers
    Seq((4L, 5L), (0L, 1L)).toDF("doc_a", "doc_b")
      .createOrReplaceTempView("mh_cand")
    val got = spark.sql(SqlOps.lshScurve.body(SparkDialect)).collect()
      .map(r => (r.getAs[Number]("bucket").intValue, r.getAs[Long]("n_pairs"),
        r.getAs[Long]("n_candidates"), Option(r.get(r.fieldIndex("empirical_rate")))
          .map(_.asInstanceOf[Double]),
        r.getAs[Double]("theoretical_rate"))).sortBy(_._1)
    // bucketing replay: (0,1) inter=3 union=5 → 6; (2,3) 1/7 → 1;
    // (4,5) 4/4 → 10 clamped 9
    val expCounts = Map(6 -> (1L, 1L), 1 -> (1L, 0L), 9 -> (1L, 1L))
    got.foreach { case (b, np, nc, emp, th) =>
      val (enp, enc) = expCounts.getOrElse(b, (0L, 0L))
      assert((np, nc) === (enp, enc), s"bucket $b")
      assert(emp === (if (enp == 0) None else Some(r6(enc.toDouble / enp))))
      // theory replayed with BigDecimal exact powers of the midpoint,
      // at the SHIPPED band geometry (1 − (1 − s^MhRows)^MhBands)
      val mc = new java.math.MathContext(40)
      val s = BigDecimal(2 * b + 1, mc) / 20
      val p = BigDecimal(1, mc) -
        (BigDecimal(1, mc) - s.pow(SqlOps.MhRows)).pow(SqlOps.MhBands)
      assert(th === r6(p.toDouble), s"theory at bucket $b")
    }
    assert(got.map(_._1).toSeq === (0 to 9).toSeq, "full decile domain must be emitted")
    spark.catalog.dropTempView("documents")
    spark.catalog.dropTempView("nj_dshf"); spark.catalog.dropTempView("mh_cand")
    spark.catalog.dropTempView("nj_sz")
  }

  test("attribution shortlist: the 2-probe IVF pair stage and its recall " +
    "readout replay exactly against an independent Scala probe + cosine oracle") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    val dim = 64
    // three WELL-separated clusters; c2 shares its first 32 dims with
    // c0 and its last 32 with c1, so it is the SECOND-nearest cell for
    // members of both — a c0 query's 2-probe opens (c0, c2), never c1
    def center(c: Int): Array[Float] = c match {
      case 0 => Array.fill(dim)(0.8f)
      case 1 => Array.fill(dim)(-0.8f)
      case _ => Array.tabulate(dim)(i => if (i < 32) 0.8f else -0.8f)
    }
    val rnd = new scala.util.Random(7)
    def jitter(c: Int): Array[Float] =
      center(c).map(v => v + (rnd.nextFloat() - 0.5f) * 0.2f)
    val base = (0 until 60).map(id => (id.toLong, (id % 3).toLong, jitter(id % 3)))
    // the STALE-INDEX plant: id 97 is id 0's near-twin in embedding
    // space (so it MUST be in q0's exact top-3) but its index cell
    // says c1 — the one cell a c0 query's 2-probe never opens. The
    // shortlist must miss it and the recall readout must count the
    // miss (this is the path that makes the recall query a real
    // audit, not a tautology).
    val twin = base.find(_._1 == 0L).get._3.map(v => v + 0.001f)
    val rows = base :+ ((97L, 1L, twin))
    rows.toDF("vec_id", "label", "embedding").createOrReplaceTempView("embeddings")
    // a label-partitioned index whose cells coincide with labels —
    // including the stale plant (cell 1 despite c0-like coordinates)
    rows.map(t => (t._1, t._2)).toDF("vec_id", "cell")
      .createOrReplaceTempView("__attr_cells")
    spark.sql(
      """SELECT e.vec_id, e.embedding,
        |  sqrt(graft_dot(e.embedding, e.embedding)) AS nrm, c.cell
        |FROM embeddings e JOIN __attr_cells c ON e.vec_id = c.vec_id"""
        .stripMargin).createOrReplaceTempView("ivf_nvc")
    spark.sql("SELECT vec_id, embedding, nrm FROM ivf_nvc")
      .createOrReplaceTempView("emb_nv")
    val stages = SqlOps.trainAttribution.stages.toMap
    spark.sql(stages("ivf_cent")(SparkDialect)).createOrReplaceTempView("ivf_cent")
    spark.sql(stages("attr_sl")(SparkDialect)).createOrReplaceTempView("attr_sl")

    // ---- independent Scala replay ----
    val byId = rows.map(t => t._1 -> t._3).toMap
    val cellOf = rows.map(t => t._1 -> t._2).toMap
    val labOf = cellOf // labels double as cells in this fixture
    def qv(x: Float): Long = math.floor(x.toDouble * 1.0e6 + 0.5).toLong
    // centroid replay: per (label, pos), floor(mean of µ-quantized) —
    // the ivfCentCtes formula verbatim
    val qc: Map[(Long, Int), Long] = rows.groupBy(_._2).flatMap { case (l, ms) =>
      (0 until dim).map { p =>
        val s = ms.map(m => qv(m._3(p))).sum
        (l, p) -> math.floor(s.toDouble / ms.size + 0.5).toLong
      }
    }
    def probes(q: Array[Float]): Seq[Long] =
      rows.map(_._2).distinct.map { l =>
        val d2 = (0 until dim).map { p =>
          val d = qv(q(p)) - qc((l, p)); d * d
        }.sum
        (d2, l)
      }.sortBy(identity).take(2).map(_._2)
    def cosine(a: Array[Float], b: Array[Float]): Double = {
      val dot = (0 until dim).map(i => a(i).toDouble * b(i).toDouble).sum
      def nrm(x: Array[Float]) = math.sqrt((0 until dim).map(i => x(i).toDouble * x(i).toDouble).sum)
      r6(dot / (nrm(a) * nrm(b)))
    }
    val evalIds = rows.map(_._1).filter(_ % 10 == 0)
    val trainIds = rows.map(_._1).filter(_ % 10 != 0)
    val wantSl: Map[Long, Seq[Long]] = evalIds.map { e =>
      val pr = probes(byId(e)).toSet
      e -> trainIds.filter(t => pr(cellOf(t)))
        .map(t => (t, cosine(byId(e), byId(t))))
        .sortBy { case (t, c) => (-c, t) }.take(3).map(_._1)
    }.toMap
    val gotSl = spark.sql("SELECT eval_id, train_id FROM attr_sl").collect()
      .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .map { case (e, ps) => e -> ps.map(_._2).toSet }
    assert(gotSl === wantSl.filter(_._2.nonEmpty).map { case (e, ts) => e -> ts.toSet })
    // the plant: q0's exact top-3 contains 97, its shortlist cannot
    val exact0 = trainIds.map(t => (t, cosine(byId(0L), byId(t))))
      .sortBy { case (t, c) => (-c, t) }.take(3).map(_._1)
    assert(exact0.contains(97L) && !wantSl(0L).contains(97L))

    // ---- the inversion body ----
    val gotInf = spark.sql(SqlOps.trainAttribution.body(SparkDialect)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val wantInf = wantSl.toSeq.flatMap { case (e, ts) => ts.map(e -> _) }
      .groupBy(_._2).map { case (t, es) =>
        val n = es.size.toLong
        val m = es.count { case (e, _) => labOf(e) == labOf(t) }.toLong
        (t, n, m, 1000000L * m / n)
      }.toSeq.sortBy { case (t, n, _, _) => (-n, t) }.take(20).toSet
    assert(gotInf === wantInf)

    // ---- the recall readout ----
    val gotRec = spark.sql(SqlOps.attrShortlistRecall.body(SparkDialect)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    val wantRec = evalIds.filter(q => q % 10 == 0 && q < 320).map { q =>
      val exact = trainIds.map(t => (t, cosine(byId(q), byId(t))))
        .sortBy { case (t, c) => (-c, t) }.take(3).map(_._1).toSet
      val hit = (exact intersect wantSl(q).toSet).size.toLong
      (q, hit, r6(hit.toDouble / 3))
    }.sortBy(_._1)
    assert(gotRec.toSeq === wantRec)
    // the planted miss is visible in the readout: q0 hits exactly 2
    assert(gotRec.find(_._1 == 0L).get._2 === 2L)
    // and the undisturbed sample query is perfect
    assert(gotRec.find(_._1 == 50L).get._2 === 3L)

    Seq("embeddings", "__attr_cells", "ivf_nvc", "emb_nv", "ivf_cent", "attr_sl")
      .foreach(spark.catalog.dropTempView)
  }

  test("k-means silhouette: SQL centroid-based scores equal an independent " +
    "Lloyd + silhouette replay on a separated fixture") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    val dim = 64
    val rnd = new scala.util.Random(11)
    // two WELL-separated planted clusters (centers at ±0.8 per dim,
    // jitter 0.2) — the mean silhouette must come out decisively high
    val centers = Array(Array.fill(dim)(0.8f), Array.fill(dim)(-0.8f))
    val vecs = (0 until 40).map { i =>
      val t = i % 2
      val v = Array.tabulate(dim)(j => centers(t)(j) + (rnd.nextFloat() - 0.5f) * 0.2f)
      (i.toLong, t.toLong, v.toSeq)
    }
    vecs.toDF("vec_id", "label", "embedding")
      .selectExpr("vec_id", "CAST(label AS INT) AS label",
        "CAST(embedding AS ARRAY<FLOAT>) AS embedding")
      .createOrReplaceTempView("embeddings")
    SqlOps.kmeansSilhouette.stages.foreach { case (name, build) =>
      spark.sql(build(SparkDialect)).localCheckpoint().createOrReplaceTempView(name)
    }
    val got = spark.sql(SqlOps.kmeansSilhouette.body(SparkDialect)).collect()
      .map(r => (r.getAs[Number]("cell").longValue, r.getAs[Long]("n_vecs"),
        r.getAs[Double]("mean_silhouette"))).sortBy(_._1)

    // ---- independent replay: Lloyd to the same final round, then the
    // centroid-based silhouette on the same µ-quantized grid ----
    def qvq(v: Double): Long = math.floor(v * 1e6 + 0.5).toLong
    val pts: Map[Long, Array[Long]] =
      vecs.map { case (id, _, v) => id -> v.map(f => qvq(f.toDouble)).toArray }.toMap
    def centroidsOf(asgn: Map[Long, Long]): Map[Long, Array[Long]] =
      asgn.groupBy(_._2).map { case (c, m) =>
        val members = m.keys.toSeq.map(pts)
        c -> Array.tabulate(dim) { j =>
          math.floor(members.map(_(j)).sum.toDouble / members.size + 0.5).toLong
        }
      }
    def d2(p: Array[Long], q: Array[Long]): Long =
      (0 until dim).map { j => val dd = p(j) - q(j); dd * dd }.sum
    def assignAll(cents: Map[Long, Array[Long]]): Map[Long, Long] =
      pts.map { case (id, p) => id -> cents.toSeq.map(c => (d2(p, c._2), c._1)).min._2 }
    var asgn: Map[Long, Long] = vecs.map(v => v._1 -> v._2).toMap
    var cents = centroidsOf(asgn)
    (1 to 3).foreach { _ => val na = assignAll(cents); cents = centroidsOf(na); asgn = na }
    val expected = asgn.groupBy(_._2).toSeq.map { case (cell, m) =>
      val sqs = m.keys.toSeq.map { id =>
        val a2 = d2(pts(id), cents(cell))
        val b2 = cents.collect { case (c, q) if c != cell => d2(pts(id), q) }.min
        val (a, b) = (math.sqrt(a2.toDouble), math.sqrt(b2.toDouble))
        if (a2 == 0 && b2 == 0) 0L else qvq((b - a) / math.max(a, b))
      }
      (cell, m.size.toLong, r6(sqs.sum.toDouble / (sqs.size * 1e6)))
    }.sortBy(_._1)
    assert(got.toSeq === expected)
    // separated clusters must score decisively: every cell > 0.5
    assert(got.nonEmpty && got.forall(_._3 > 0.5), s"weak silhouette: $got")
    spark.catalog.dropTempView("embeddings")
  }

  test("DoReMi reweighting: SQL staircase weights equal an independent " +
    "replay, with both clamp arms and the largest remainder exercised") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    // A:en floods the corpus with one token (surprisal ~0 → excess
    // clamps at −2 bits), B:de is all-unique tokens (excess clamps at
    // +2), C:fr sits between (an interior staircase arm)
    val docs: Seq[(Long, String, String, String)] =
      (0 until 10).map(i => (i.toLong, "A", "en", Seq.fill(40)("aa").mkString(" "))) ++
      (0 until 5).map(i => (100L + i, "B", "de",
        (0 until 30).map(j => s"rare${i}u$j").mkString(" "))) ++
      (0 until 5).map(i => (200L + i, "C", "fr",
        (Seq.fill(10)("aa") ++ (0 until 10).map(j => s"mid${j % 5}")).mkString(" ")))
    docs.toDF("doc_id", "source", "lang", "text").createOrReplaceTempView("documents")
    SqlOps.mixDoremiOp.stages.foreach { case (name, build) =>
      spark.sql(build(SparkDialect)).localCheckpoint().createOrReplaceTempView(name)
    }
    val got = spark.sql(SqlOps.mixDoremiOp.body(SparkDialect)).collect()
      .map(r => (r.getAs[String]("domain"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_tokens"), r.getAs[Double]("bits_per_token"),
        r.getAs[Double]("excess_bits"), r.getAs[Long]("weight_ppm"),
        r.getAs[Boolean]("upweighted"), r.getAs[Boolean]("fully_normalized")))
      .sortBy(_._1)

    // ---- independent replay ----
    def qlog2(x: Long): Long =
      math.floor(math.log(x.toDouble) / math.log(2.0) * 1e6 + 0.5).toLong
    val toksOf: Map[Long, Seq[String]] =
      docs.map { case (id, _, _, t) => id -> t.split(" ", -1).filter(_.nonEmpty).toSeq }.toMap
    val cGlob: Map[String, Long] =
      toksOf.values.flatten.groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
    val nn = cGlob.values.sum
    case class Dom(nDocs: Long, toks: Long, bitsMu: Long)
    val byDom: Map[String, Dom] = docs.groupBy { case (_, s, l, _) => s"$s:$l" }.map {
      case (dom, ds) =>
        val perDoc = ds.map { case (id, _, _, _) =>
          val tf = toksOf(id).groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
          (tf.values.sum, tf.map { case (w, f) => f * (qlog2(nn) - qlog2(cGlob(w))) }.sum)
        }
        dom -> Dom(ds.size.toLong, perDoc.map(_._1).sum, perDoc.map(_._2).sum)
    }
    val gtoks = byDom.values.map(_.toks).sum
    val gbits = byDom.values.map(_.bitsMu).sum
    val gbpt = gbits / gtoks
    val nd = byDom.size.toLong
    val rows = byDom.toSeq.map { case (dom, dm) =>
      val bpt = dm.bitsMu / dm.toks
      val exq = math.max(-2000000L, math.min(2000000L, bpt - gbpt))
      val gi = Math.floorDiv(exq + 31250L, 62500L)
      val wq = math.round(StrictMath.exp(gi / 16.0) * 1e9)
      (dom, dm, bpt, bpt - gbpt, exq, wq)
    }
    val tw = rows.map(_._6).sum
    val alloc = rows.map { case t => (t, 1000000L * t._6 / tw, (1000000L * t._6) % tw) }
    val leftover = 1000000L - alloc.map(_._2).sum
    val rankedUp = alloc.sortBy { case (t, _, rem) => (-rem, t._1) }.zipWithIndex.map {
      case (((dom, dm, bpt, ex, exq, _), base, _), i) =>
        val w = base + (if (i < leftover) 1L else 0L)
        (dom, dm.nDocs, dm.toks, r6(bpt.toDouble / 1e6), r6(ex.toDouble / 1e6),
          w, w * nd > 1000000L, true)
    }.sortBy(_._1)
    assert(got.toSeq === rankedUp)
    // the fixture exercises the machinery end to end
    val exqs = rows.map(_._5)
    assert(exqs.contains(2000000L) && exqs.contains(-2000000L), s"both clamps must fire: $exqs")
    assert(rows.map(_._6).distinct.size === 3, "three distinct staircase arms")
    assert(got.map(_._6).sum === 1000000L)
    val wByDom = got.map(r => r._1 -> r._6).toMap
    assert(wByDom("B:de") > wByDom("C:fr") && wByDom("C:fr") > wByDom("A:en"),
      s"rare domains must be upweighted: $wByDom")
    spark.catalog.dropTempView("documents")
  }

  test("k-fold split: SQL fold assignment and straddle audit equal an " +
    "independent md5 replay over the snapshot corpus") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    // 12 docs → 24 snapshot copies (ids 2d/2d+1); 8 docs clustered in
    // dup pairs, 4 singletons
    val docs = (0 until 12).map(i => (i.toLong, s"text body number $i"))
    docs.toDF("doc_id", "text").createOrReplaceTempView("documents")
    val pairs = (0 until 8).flatMap { d =>
      Seq((2L * d, 2L * d), (2L * d + 1, 2L * d))
    }
    pairs.toDF("doc_id", "cluster_id").createOrReplaceTempView("clusters")
    spark.sql(SqlOps.splitKfoldAssign(SparkDialect)).localCheckpoint()
      .createOrReplaceTempView("kfold_a")
    val got = spark.sql(SqlOps.splitKfoldReport(SparkDialect)).collect()
      .map(r => (r.getAs[Long]("fold"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_groups"), r.getAs[Long]("train_docs"),
        r.getAs[Long]("naive_straddling_groups"), r.getAs[Double]("balance_ratio")))
      .sortBy(_._1)

    // ---- independent replay ----
    def bkt(s: String): Int = Integer.parseInt(md5hex(s).substring(0, 2), 16)
    val cmap = pairs.toMap
    val corpusIds = docs.flatMap { case (d0, _) => Seq(2 * d0, 2 * d0 + 1) }
    val asgn = corpusIds.map { id =>
      val grp = cmap.getOrElse(id, id)
      (id, grp, bkt(grp.toString) % 5, bkt(id.toString) % 5)
    }
    val straddle = asgn.groupBy(_._2).count { case (_, xs) => xs.map(_._4).distinct.size > 1 }.toLong
    val byFold = asgn.groupBy(_._3)
    val total = asgn.size.toLong
    val mx = byFold.values.map(_.size).max.toLong
    val mn = byFold.values.map(_.size).min.toLong
    val expected = byFold.toSeq.map { case (f, xs) =>
      (f.toLong, xs.size.toLong, xs.map(_._2).distinct.size.toLong,
        total - xs.size, straddle, r6(mx.toDouble / mn))
    }.sortBy(_._1)
    assert(got.toSeq === expected)
    // cluster safety by construction: no GROUP straddles folds
    assert(asgn.groupBy(_._2).values.forall(xs => xs.map(_._3).distinct.size == 1))
    assert(straddle > 0, "the naive audit must catch real straddling on dup pairs")
    spark.catalog.dropTempView("documents"); spark.catalog.dropTempView("clusters")
  }

  test("PII scan: SQL counts equal an independent regex/Luhn/octet replay " +
    "on planted PII, and redaction removes every match") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    // planted fixture: each kind in its own docs, with duplicate
    // occurrences (n_matches > n_docs), an invalid Luhn card, an
    // out-of-range octet IP, and one clean doc
    val docs: Seq[(Long, String)] = Seq(
      (0L, "contact alice@example.com or bob.smith+tag@mail.co for details"),
      (1L, "escalate to ops@example.org please"),
      (2L, "call (415) 555-1234 or 415.555.9876 after hours"),
      (3L, "cards 4111-1111-1111-1111 and 4111-1111-1111-1112 on file"),
      (4L, "backup card 5500 0000 0000 0004 expires soon"),
      (5L, "hosts 10.0.0.1 and 10.0.0.1 plus bogus 999.1.1.256"),
      (6L, "a perfectly clean document with no identifiers at all"))
    docs.toDF("doc_id", "text").createOrReplaceTempView("documents")
    SqlOps.piiScan.stages.foreach { case (name, build) =>
      spark.sql(build(SparkDialect)).localCheckpoint().createOrReplaceTempView(name)
    }
    val got = spark.sql(SqlOps.piiScan.body(SparkDialect)).collect()
      .map(r => (r.getAs[String]("kind"), r.getAs[Long]("n_matches"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("n_valid"))).sortBy(_._1)

    // ---- independent replay (java.util.regex + hand Luhn/octets) ----
    import java.util.regex.Pattern
    def allMatches(rx: String, t: String): Seq[String] = {
      val m = Pattern.compile(rx).matcher(t)
      val b = Seq.newBuilder[String]; while (m.find()) b += m.group(); b.result()
    }
    def luhn(ds: String): Boolean = {
      val n = ds.length
      ds.zipWithIndex.map { case (ch, idx) =>
        val dg = ch - '0'
        if ((n - (idx + 1)) % 2 == 1) { val d2 = 2 * dg; if (d2 > 9) d2 - 9 else d2 }
        else dg
      }.sum % 10 == 0
    }
    def octetsOk(ip: String): Boolean = ip.split("\\.").forall(o =>
      o.nonEmpty && o.length <= 3 && (o == "0" || !o.startsWith("0")) && o.toInt <= 255)
    val expected = SqlOps.PiiPatterns.map { case (kind, rx) =>
      val perDoc = docs.map { case (id, t) => id -> allMatches(rx, t) }
      val occ = perDoc.flatMap(_._2)
      val valid = kind match {
        case "card" =>
          occ.map(_.replaceAll("[- ]", "")).count(ds =>
            ds.length >= 13 && ds.length <= 16 && luhn(ds))
        case "ipv4" => occ.count(octetsOk)
        case _ => occ.size
      }
      (kind, occ.size.toLong, perDoc.count(_._2.nonEmpty).toLong, valid.toLong)
    }.sortBy(_._1)
    assert(got.toSeq === expected)
    // the fixture must exercise every discriminating path
    val byKind = expected.map(e => e._1 -> e).toMap
    assert(byKind("email")._2 === 3L && byKind("email")._3 === 2L)
    assert(byKind("phone")._2 === 2L)
    assert(byKind("card")._2 === 3L && byKind("card")._4 === 2L,
      "one planted card must fail Luhn")
    assert(byKind("ipv4")._2 === 3L && byKind("ipv4")._4 === 2L,
      "the out-of-range octet must fail validation")
    // redaction round-trip: after piiRedactExpr no pattern matches
    // remain and every tag appears where its kind was planted
    val red = docs.toDF("doc_id", "text")
      .selectExpr("doc_id", s"${SqlOps.piiRedactExpr("text")} AS text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    SqlOps.PiiPatterns.foreach { case (kind, rx) =>
      assert(red.values.forall(t => allMatches(rx, t).isEmpty),
        s"redaction must leave no $kind match")
    }
    assert(red(0L).contains("[EMAIL]") && red(2L).contains("[PHONE]")
      && red(3L).contains("[CARD]") && red(5L).contains("[IPV4]"))
    assert(red(6L) === docs(6)._2, "clean text must pass through untouched")
    spark.catalog.dropTempView("documents")
  }

  test("curriculum order: SQL manifest equals an independent surprisal, " +
    "quartile and md5-shard replay") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    // difficulty staircase: doc i carries i rare singletons diluted in
    // common filler — 16 distinct surprisal levels so every quartile
    // boundary separates real docs. Single-space text keeps the
    // independent tokenizer faithful to word_shingles.
    val docs: Seq[(Long, String)] = (0 until 16).map { i =>
      val words = Seq.fill(16 - i)("common") ++ (0 until i).map(j => s"rare${i}x$j")
      (i.toLong, words.mkString(" "))
    }
    docs.toDF("doc_id", "text").createOrReplaceTempView("documents")
    SqlOps.curriculumOrder.stages.foreach { case (name, build) =>
      spark.sql(build(SparkDialect)).localCheckpoint().createOrReplaceTempView(name)
    }
    val got = spark.sql(SqlOps.curriculumOrder.body(SparkDialect)).collect()
      .map(r => (r.getAs[Number]("phase").intValue, r.getAs[Number]("shard").intValue,
        r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
        r.getAs[Double]("d_lo"), r.getAs[Double]("d_hi")))
      .sortBy(t => (t._1, t._2))

    // ---- independent replay ----
    def qlog2(x: Long): Long =
      math.floor(math.log(x.toDouble) / math.log(2.0) * 1e6 + 0.5).toLong
    val tf: Map[(Long, String), Long] = docs.flatMap { case (id, t) =>
      t.split(" ", -1).filter(_.nonEmpty).groupBy(identity)
        .map { case (w, xs) => (id, w) -> xs.size.toLong }
    }.toMap
    val cGlob = tf.groupBy(_._1._2).map { case (w, m) => w -> m.values.sum }
    val nn = tf.values.sum
    val scored: Seq[(Long, Long, Long)] = docs.map { case (id, _) =>
      val mine = tf.collect { case ((d, w), f) if d == id => (w, f) }
      val nTok = mine.map(_._2).sum
      val diffQ = mine.map { case (w, f) => f * (qlog2(nn) - qlog2(cGlob(w))) }.sum / nTok
      (id, nTok, diffQ)
    }
    assert(scored.map(_._3).distinct.size === 16, "staircase must not collapse")
    // Spark `percentile`: index (n-1)*p, linear interpolation
    def pct(xs: Seq[Long], p: Double): Double = {
      val s = xs.sorted
      val idx = (s.size - 1) * p
      val (lo, hi) = (math.floor(idx).toInt, math.ceil(idx).toInt)
      s(lo) + (idx - lo) * (s(hi) - s(lo))
    }
    val qs = Seq(0.25, 0.5, 0.75).map(pct(scored.map(_._3), _))
    def bkt(s: String): Int = Integer.parseInt(md5hex(s).substring(0, 2), 16)
    val expected = scored.map { case (id, nTok, dq) =>
      val phase = qs.indexWhere(dq <= _) match { case -1 => 4; case k => k + 1 }
      (phase, bkt(s"$id:curriculum") % 8, id, nTok, dq)
    }.groupBy(t => (t._1, t._2)).toSeq.map { case ((ph, sh), xs) =>
      (ph, sh, xs.size.toLong, xs.map(_._4).sum,
        r6(xs.map(_._5).min.toDouble / 1e6), r6(xs.map(_._5).max.toDouble / 1e6))
    }.sortBy(t => (t._1, t._2))
    assert(got.toSeq === expected)
    // all four phases occupied, each with 4 of the 16 docs
    assert(expected.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap ===
      Map(1 -> 4L, 2 -> 4L, 3 -> 4L, 4 -> 4L))
    spark.catalog.dropTempView("documents")
  }

  test("salt audit: salting contracts the hottest partition's share on a " +
    "power-law key and the SQL readout reproduces the Scala shares") {
    import spark.implicits._
    // synthetic power-law keys: one hot key owns 80% of rows, the
    // rest spread over 20 cold keys — the distribution the salted
    // join exists for (the FIXTURE keys are uniform or merely
    // low-cardinality, so the contraction claim needs this oracle)
    val rows = (0 until 1000).map { i =>
      val k = if (i < 800) "hot" else s"cold${i % 20}"
      (k, (i % 8).toString)
    }
    def bkt(s: String): Int = Integer.parseInt(md5hex(s).substring(0, 2), 16) % 32
    // exact integer ppm, the same floor-divide the SQL computes
    def maxSharePpm(parts: Seq[Int]): Long = {
      val hottest = parts.groupBy(identity).values.map(_.size).max
      hottest.toLong * 1000000L / parts.size
    }
    val unsalted = maxSharePpm(rows.map { case (k, _) => bkt(k) })
    val salted = maxSharePpm(rows.map { case (k, s) => bkt(s"$k#$s") })
    // the hot key alone pins one partition at ≥ 80% unsalted; salted
    // ×8 must contract that by at least 3× (8 salts → ~10-14% each)
    assert(unsalted >= 800000L, s"hot key must dominate unsalted: $unsalted")
    assert(salted <= unsalted / 3,
      s"salting must contract the hottest share ≥3×: $unsalted -> $salted")
    // the SQL readout computes the same shares on the same rows: run
    // joinSaltAudit's aggregation shape over this synthetic table and
    // compare its ppm numbers against the Scala computation
    rows.zipWithIndex
      .map { case ((k, s), i) => (i.toLong, k, s.toLong) }
      .toDF("l_orderkey", "k", "l_linenumber")
      .createOrReplaceTempView("salt_probe")
    val got = spark.sql(
      s"""WITH u AS (
         |  SELECT 'probe' AS key_domain, 'unsalted' AS variant,
         |    ${SqlOps.md5Bucket("k")} % 32 AS p FROM salt_probe
         |  UNION ALL
         |  SELECT 'probe', 'salted',
         |    ${SqlOps.md5Bucket("k || '#' || CAST(l_linenumber AS STRING)")} % 32
         |  FROM salt_probe
         |),
         |pc AS (SELECT key_domain, variant, p, COUNT(*) AS c
         |       FROM u GROUP BY key_domain, variant, p)
         |SELECT variant, CAST(MAX(c) AS BIGINT) * 1000000 DIV CAST(SUM(c) AS BIGINT) AS ppm
         |FROM pc GROUP BY key_domain, variant""".stripMargin)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("unsalted") === unsalted)
    assert(got("salted") === salted)
    spark.catalog.dropTempView("salt_probe")
  }

  test("k-fold report emits empty folds with zero counts and a NULL balance " +
    "ratio instead of omitting them") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    def bkt(s: String): Int = Integer.parseInt(md5hex(s).substring(0, 2), 16)
    // two docs → four snapshot ids, each its own singleton group:
    // small enough that at least one of the 5 folds MUST be empty
    val docs = (0 until 2).map(i => (i.toLong, s"tiny corpus doc $i"))
    docs.toDF("doc_id", "text").createOrReplaceTempView("documents")
    Seq.empty[(Long, Long)].toDF("doc_id", "cluster_id")
      .createOrReplaceTempView("clusters")
    spark.sql(SqlOps.splitKfoldAssign(SparkDialect)).localCheckpoint()
      .createOrReplaceTempView("kfold_a")
    val got = spark.sql(SqlOps.splitKfoldReport(SparkDialect)).collect()
    val occupied = (0 until 2).flatMap(d => Seq(2L * d, 2L * d + 1))
      .map(id => bkt(id.toString) % 5).toSet
    assert(occupied.size < 5, "fixture must leave at least one fold empty")
    // every fold of the domain appears, empties included…
    assert(got.map(_.getAs[Long]("fold")).toSet === (0L until 5L).toSet)
    val empties = got.filter(r => !occupied.contains(r.getAs[Long]("fold").toInt))
    assert(empties.nonEmpty && empties.forall(r =>
      r.getAs[Long]("n_docs") == 0L && r.getAs[Long]("n_groups") == 0L))
    // …and the balance audit flags the pathology instead of reading
    // healthy over only the non-empty folds
    assert(got.forall(_.isNullAt(got.head.fieldIndex("balance_ratio"))))
    spark.catalog.dropTempView("documents"); spark.catalog.dropTempView("clusters")
  }

  test("acf: SQL autocorrelation equals an independent calendar-indexed Scala " +
    "ACF on a gappy series, and over-long lags emit (lag, 0, NULL)") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    val base = java.time.LocalDate.of(1995, 3, 1)
    // 40 calendar days with a planted period-7 level shift, Sundays
    // (every 7th day) MISSING — the gap case the calendar index exists
    // for — and 2 orders per day so the daily rollup matters
    val days = (0 until 40).filter(_ % 7 != 6)
    val rows = for { d <- days; k <- 0 until 2 } yield {
      val price = (if (d % 7 < 3) 1000.0 else 3000.0) + d * 7.13 + k * 11.31
      (java.sql.Timestamp.valueOf(base.plusDays(d).atStartOfDay), price)
    }
    rows.toDF("o_orderdate", "o_totalprice").createOrReplaceTempView("orders")
    val got = spark.sql(SqlOps.acfRevenue(SparkDialect)).collect()
      .map(r => r.getAs[Long]("lag") ->
        (r.getAs[Long]("n_pairs"),
          Option(r.getAs[java.lang.Double]("acf")).map(_.doubleValue))).toMap
    // independent Scala ACF: exact integer dollars, calendar index
    val daily = rows.groupBy(_._1.toLocalDateTime.toLocalDate).toSeq
      .map { case (d, rs) =>
        val cents = rs.map(r => math.floor(r._2 * 100.0 + 0.5).toLong).sum
        (d.toEpochDay, cents / 100)
      }.sortBy(_._1)
    val y = daily.map { case (ed, v) => (ed - daily.head._1 + 1) -> v }.toMap
    val n = y.size
    val sy = y.values.sum
    val syy = y.values.map(v => v * v).sum
    val mean = sy.toDouble / n
    val denom = syy.toDouble - sy.toDouble * sy / n
    (1 to 7).foreach { k =>
      val pairs = y.keys.toSeq.filter(t => y.contains(t - k)).sorted
      val (nk, wantAcf) =
        if (pairs.isEmpty) (0L, None)
        else {
          val num = pairs.map(t => (y(t) - mean) * (y(t - k) - mean)).sum
          (pairs.size.toLong, Some(r6(num / denom)))
        }
      assert(got(k.toLong)._1 === nk, s"lag $k pair count")
      assert(got(k.toLong)._2 === wantAcf, s"lag $k acf")
    }
    // short series: 5 present days → lags 5-7 must be (lag, 0, NULL)
    val short = (0 until 5).flatMap(d => Seq(
      (java.sql.Timestamp.valueOf(base.plusDays(d).atStartOfDay), 100.0 + d)))
    short.toDF("o_orderdate", "o_totalprice").createOrReplaceTempView("orders")
    val g2 = spark.sql(SqlOps.acfRevenue(SparkDialect)).collect()
      .map(r => r.getAs[Long]("lag") ->
        (r.getAs[Long]("n_pairs"), r.isNullAt(r.fieldIndex("acf")))).toMap
    assert(g2.keySet === (1L to 7L).toSet, "all seven lag rows present")
    Seq(5L, 6L, 7L).foreach(k => assert(g2(k) === ((0L, true)), s"lag $k"))
    spark.catalog.dropTempView("orders")
  }

  test("seasonal strength: pure weekly pattern scores ~1, flat noise ~0, " +
    "and the mixed case equals the independent variance decomposition") {
    import spark.implicits._
    import java.sql.Date
    graft.functions.GraftFunctions.registerAll(spark)
    val base = java.time.LocalDate.of(1996, 9, 2)
    def dow(i: Int): Long = (base.plusDays(i.toLong).toEpochDay + 4) % 7
    def run(f: Int => Double): Double = {
      (0 until 56).map(i => (Date.valueOf(base.plusDays(i.toLong)), f(i)))
        .toDF("o_orderdate", "o_totalprice").createOrReplaceTempView("orders")
      val r = spark.sql(SqlOps.seasonalStrength(SparkDialect)).collect()(0)
      r.getAs[Double]("seasonal_strength")
    }
    // pure function of weekday → remainder variance 0 → strength 1
    assert(run(i => 100.0 * (dow(i) + 1)) === 1.0)
    // noise orthogonal to the week (period 9) → strength near 0
    assert(run(i => 100.0 + (i * 5) % 9) < 0.1)
    // mixed: weekly level + drift; independent within-group decomposition
    val mixed = (0 until 56).map(i =>
      (if (dow(i) == 6) 300L else 100L) + (i * 5) % 9)
    val got = run(i => mixed(i).toDouble)
    val groups = mixed.zipWithIndex.groupBy { case (_, i) => dow(i) }
    val syy = mixed.map(v => v * v).sum
    val sy = mixed.sum; val n = mixed.size
    // each group term is FLOOR'd to int64 before the sum (the SQL's
    // float-sum parity rule — a plain double sum is order-dependent)
    val bg = groups.values.map { g =>
      val s = g.map(_._1).sum
      math.floor(s.toDouble * s / g.size + 0.5).toLong
    }.sum
    val sst = syy.toDouble - sy.toDouble * sy / n
    assert(got === r6(math.min(1.0, math.max(0.0, 1.0 - (syy - bg.toDouble) / sst))))
    assert(got > 0.5, s"weekly signal should dominate: $got")
    spark.catalog.dropTempView("orders")
  }

  test("ljung-box: Q equals an independent ACF-and-sum pass and rejects on a weekly series") {
    import spark.implicits._
    import java.sql.Date
    graft.functions.GraftFunctions.registerAll(spark)
    val base = java.time.LocalDate.of(1995, 3, 1)
    val rows = (0 until 40).map { i =>
      (Date.valueOf(base.plusDays(i.toLong)),
        (if (i % 7 < 3) 1000.0 else 3000.0) + i * 7.0)
    }
    rows.toDF("o_orderdate", "o_totalprice").createOrReplaceTempView("orders")
    val got = spark.sql(SqlOps.ljungBox(SparkDialect)).collect()(0)

    // ---- independent implementation: daily dollars → ACF → Q ----
    val y = rows.map { case (d, p) =>
      (d.toLocalDate.toEpochDay, math.floor(p * 100.0 + 0.5).toLong / 100)
    }.toMap
    val t0 = y.keys.min
    val idx = y.map { case (ed, v) => (ed - t0 + 1) -> v }
    val n = idx.size
    val sy = idx.values.sum; val syy = idx.values.map(v => v * v).sum
    val mean = sy.toDouble / n
    val denom = syy.toDouble - sy.toDouble * sy / n
    val sq = (1 to 7).map { k =>
      val pairs = idx.keys.toSeq.filter(t => idx.contains(t - k))
      val acf = r6(pairs.map(t => (idx(t) - mean) * (idx(t - k) - mean)).sum / denom)
      math.floor(acf * acf / (n - k) * 1e12 + 0.5).toLong
    }.sum
    val q = r6(n.toDouble * (n + 2) * sq / 1e12)
    assert(got.getAs[Long]("n_days") === n.toLong)
    assert(got.getAs[Long]("n_lags_used") === 7L)
    assert(got.getAs[Double]("lb_q") === q)
    assert(got.getAs[Int]("reject_white_noise") === 1,
      "a planted period-7 series must reject white noise")
    spark.catalog.dropTempView("orders")
  }

  test("assortativity: SQL Pearson over endpoint degrees equals an " +
    "independent Scala computation on a star + clique graph") {
    import spark.implicits._
    // a hub-star (dissortative pull) plus a 4-clique (assortative
    // pull) plus a 2-chain — mixed structure, nontrivial r
    val pairs = Seq(
      (0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (0L, 5L),
      (10L, 11L), (10L, 12L), (10L, 13L), (11L, 12L), (11L, 13L), (12L, 13L),
      (20L, 21L))
    pairs.toDF("doc_a", "doc_b").createOrReplaceTempView("mh_cand")
    val got = spark.sql(SqlOps.graphAssortativity.body(SparkDialect)).head
    val sym = pairs ++ pairs.map(_.swap)
    val deg = sym.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val xy = sym.map { case (u, v) => (deg(u), deg(v)) }
    val n = xy.size
    val sx = xy.map(_._1).sum
    val sxx = xy.map(p => p._1 * p._1).sum
    val sxy = xy.map(p => p._1 * p._2).sum
    val want = r6((sxy.toDouble - sx.toDouble * sx / n) /
      (sxx.toDouble - sx.toDouble * sx / n))
    assert(got.getAs[Long]("n_directed_edges") === n.toLong)
    assert(got.getAs[Long]("sum_degree") === sx)
    assert(got.getAs[Double]("assortativity") === want)
    spark.catalog.dropTempView("mh_cand")
  }

  test("k-means purity/NMI: SQL equals an independent Scala computation, " +
    "and a single-label run reads NULL NMI, not 0 or infinity") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    val finA = SqlOps.kmeansLoop.stages.map(_._1).filter(_.startsWith("km_a")).last
    // 3 cells × 2 labels with one noisy assignment per cell
    val asgn = Seq(
      (1L, 0L), (2L, 0L), (3L, 0L), (4L, 1L), (5L, 1L), (6L, 1L),
      (7L, 2L), (8L, 2L), (9L, 2L))
    val labels = Seq(
      (1L, 0), (2L, 0), (3L, 1), (4L, 1), (5L, 1), (6L, 0),
      (7L, 0), (8L, 0), (9L, 1))
    asgn.toDF("vec_id", "cell").createOrReplaceTempView(finA)
    labels.toDF("vec_id", "label").createOrReplaceTempView("embeddings")
    val got = spark.sql(SqlOps.kmeansPurity.body(SparkDialect)).head
    // independent Scala: same µ-quantization spec, unrelated code path
    val ct = asgn.map { case (v, c) => (c, labels.toMap.apply(v)) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = ct.values.sum
    val ni = ct.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val nj = ct.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    def q6(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong
    def log2(x: Double): Double = math.log(x) / math.log(2.0)
    val mi = ct.map { case ((c, l), nij) =>
      q6(nij * log2(nij.toDouble * n / (ni(c).toDouble * nj(l)))) }.sum / 1e6 / n
    def h(m: Map[_, Long]): Double =
      q6(log2(n.toDouble)) / 1e6 - m.values.map(v => q6(v * log2(v.toDouble))).sum / 1e6 / n
    val purity = r6(ct.groupBy(_._1._1).view
      .mapValues(_.values.max).values.sum.toDouble / n)
    assert(got.getAs[Long]("n_vectors") === n)
    assert(got.getAs[Double]("purity") === purity)
    assert(got.getAs[Double]("mi_bits") === r6(mi))
    assert(got.getAs[Double]("nmi") === r6(mi / math.sqrt(h(ni) * h(nj))))
    // degenerate: every vector the same label → H(label)=0 → NMI NULL
    labels.map { case (v, _) => (v, 7) }.toDF("vec_id", "label")
      .createOrReplaceTempView("embeddings")
    val g2 = spark.sql(SqlOps.kmeansPurity.body(SparkDialect)).head
    assert(g2.isNullAt(g2.fieldIndex("nmi")))
    spark.catalog.dropTempView(finA); spark.catalog.dropTempView("embeddings")
  }

  test("source KL: SQL per-source contributions equal an independent " +
    "Scala computation with Laplace smoothing over the md5 halves") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    val docs = (0 until 60).map { i =>
      (i.toLong, s"src${i % 3}", s"text $i")
    }
    docs.toDF("doc_id", "source", "text").createOrReplaceTempView("documents")
    val got = spark.sql(SqlOps.sourceKl(SparkDialect)).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_yesterday"), r.getAs[Long]("n_today"),
          r.getAs[Double]("kl_contrib_bits"))).toMap
    def half(id: Long): Int = Integer.parseInt(md5hex(id.toString).substring(0, 2), 16) % 2
    val bySrc = docs.groupBy(_._2).view.mapValues { ds =>
      (ds.count(d => half(d._1) == 0).toLong, ds.count(d => half(d._1) == 1).toLong)
    }.toMap
    val ta = bySrc.values.map(_._1 + 1).sum
    val tb = bySrc.values.map(_._2 + 1).sum
    def log2(x: Double): Double = math.log(x) / math.log(2.0)
    bySrc.foreach { case (src, (a0, b0)) =>
      val (na, nb) = (a0 + 1, b0 + 1)
      val term = math.floor(nb.toDouble / tb *
        log2(nb.toDouble * ta / (na.toDouble * tb)) * 1e6 + 0.5) / 1e6
      assert(got(src) === ((a0, b0, r6(term))), src)
    }
    spark.catalog.dropTempView("documents")
  }

  test("gini: the bucket-decomposed rank equals an independent fully-sorted " +
    "Scala Gini on a skewed synthetic revenue distribution") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    val base = java.time.LocalDate.of(1995, 3, 1)
    // power-law-ish per-customer revenue spread across many log2
    // buckets (the decomposition's interesting regime), with one
    // customer split over two orders so the pre-aggregate matters
    val rows = (1 to 200).flatMap { c =>
      val v = 10.0 + c * c * 3.17
      if (c % 17 == 0) Seq((c.toLong, v / 2, base), (c.toLong, v / 2, base.plusDays(1)))
      else Seq((c.toLong, v, base))
    }.map { case (c, v, d) =>
      (c, v, java.sql.Timestamp.valueOf(d.atStartOfDay)) }
    rows.toDF("o_custkey", "o_totalprice", "o_orderdate")
      .createOrReplaceTempView("orders")
    val got = spark.sql(SqlOps.revenueGini(SparkDialect)).head
    // independent Scala: one full sort, the textbook formula
    val cents = rows.groupBy(_._1).values
      .map(_.map(r => math.floor(r._2 * 100.0 + 0.5).toLong).sum).toSeq.sorted
    val n = cents.size
    val t = cents.sum
    val rx = cents.zipWithIndex.map { case (x, i) => (i + 1L) * x }.sum
    val want = r6((2.0 * rx - (n + 1.0) * t) / (n.toDouble * t))
    assert(got.getAs[Long]("n_customers") === n.toLong)
    assert(got.getAs[Double]("gini") === want)
    spark.catalog.dropTempView("orders")
  }

  test("mcnemar: SQL cells, chi-square and verdict equal an independent " +
    "Scala evaluation of both gates on crafted docs") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    // gate A = Gopher rules (needs ≥50 words, ≥2 distinct stopwords,
    // sane word lengths); gate B = q ≤ 67th percentile of ccn_sc.q.
    // Five q=0 docs and one q=100 doc put t67 at 0, so B-pass = q=0.
    val passText = (Seq("the", "and") ++ (1 to 58).map(i => s"word$i")).mkString(" ")
    val failText = "tiny doc only"
    val docs = Seq(
      (1L, passText, 0L),   // A-pass, B-pass  → n11
      (2L, passText, 100L), // A-pass, B-fail  → n10
      (3L, passText, 0L),   // n11
      (4L, failText, 0L),   // A-fail, B-pass  → n01
      (5L, failText, 0L),   // n01
      (6L, passText, 0L))   // n11
    docs.map(d => (d._1, d._2)).toDF("doc_id", "text")
      .createOrReplaceTempView("documents")
    docs.map(d => (d._1, d._3)).toDF("doc_id", "q")
      .createOrReplaceTempView("ccn_sc")
    val got = spark.sql(SqlOps.filterMcnemar.body(SparkDialect)).head
    // independent Scala gates: A re-derived from the rule list, B from
    // an interpolated percentile over the q values
    def gopherA(text: String): Boolean = {
      val toks = text.split(" ").toSeq
      val nWords = toks.size
      val nChars = text.replace(" ", "").length
      val nStop = toks.filter(Set("the", "and", "of", "to", "in", "is", "a")).distinct.size
      val nAlpha = toks.count(t => t.toLowerCase != t.toUpperCase)
      nWords >= 50 && nWords <= 100000 &&
        nChars >= 3 * nWords && nChars <= 10 * nWords &&
        nAlpha * 10 >= nWords * 8 && nStop >= 2
    }
    val qs = docs.map(_._3.toDouble).sorted
    val idx = (qs.size - 1) * 0.67
    val t67 = qs(idx.toInt) + (idx - idx.toInt) * (qs(math.ceil(idx).toInt) - qs(idx.toInt))
    val cells = docs.map(d => (gopherA(d._2), d._3.toDouble <= t67))
    val n10 = cells.count(c => c._1 && !c._2).toLong
    val n01 = cells.count(c => !c._1 && c._2).toLong
    val g = math.max(math.abs(n10 - n01) - 1, 0L)
    assert(got.getAs[Long]("a_only") === n10)
    assert(got.getAs[Long]("b_only") === n01)
    assert(got.getAs[Double]("chi2") === r6(g.toDouble * g / (n10 + n01)))
    assert(got.getAs[Int]("significant") ===
      (if (g * g * 1000000L > 3841459L * (n10 + n01)) 1 else 0))
    spark.catalog.dropTempView("documents"); spark.catalog.dropTempView("ccn_sc")
  }

  test("CMS gate: a planted >2% heavy user survives, overcounted candidates " +
    "are pruned by the exact verify (candidate set STRICTLY exceeds survivors)") {
    import org.apache.spark.sql.functions.{col, lit}
    graft.functions.GraftFunctions.registerAll(spark)
    // 1250 noise users × 16 events sit JUST under the 1/1250 share gate
    // (N = 20,500 → exact survivor needs cnt·1250 ≥ N, i.e. cnt ≥ 17),
    // plus one heavy user at 500 events (2.44% — the planted >2% user).
    // est(noise) = 16 + min-row collision mass, so ONE same-bucket
    // collider in every one of the 4 sketch rows pushes a noise user
    // over the candidate gate (P ≈ (1−(1−1/2048)^1250)^4 ≈ 4% per
    // user, deterministic for this fixed key set) — the estimate-
    // overshoot → exact-verify REJECTION branch, which the parquet
    // fixture never exercises (its survivors all genuinely pass).
    // user_id is LONG, the events fixture's type (the sketch hashes
    // int64 keys); the heavy user gets an id outside the noise range.
    val heavyId = 9999999L
    val noise = spark.range(1250L * 16L).select((col("id") % 1250L).as("user_id"))
    val heavy = spark.range(500L).select(lit(heavyId).as("user_id"))
    noise.union(heavy).createOrReplaceTempView("events")
    // the query output must equal the EXACT survivor set: only the
    // heavy user reaches cnt ≥ 17 — every noise user has exactly 16
    val out = spark.sql(SqlOps.cmsTopUsers(SparkDialect)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((heavyId, 500L)))
    // the sketch's candidate set must be a STRICT superset: CMS never
    // undercounts (the heavy user is always a candidate), and on this
    // key set some noise users provably overshoot — if this ever fires
    // the fixture needs a denser key set, not a weaker assertion
    val cand = spark.sql(
        s"""WITH ev AS (SELECT user_id FROM events),
           |${SparkDialect.cmsGate("cms_gated", "ev", "user_id", 1250)}
           |SELECT DISTINCT user_id FROM cms_keep""".stripMargin)
      .collect().map(_.getLong(0)).toSet
    assert(cand.contains(heavyId), "CMS must never undercount the heavy user")
    assert((cand - heavyId).nonEmpty,
      s"no overcounted candidate on ${cand.size} candidates — the exact-verify " +
        "rejection branch was not exercised")
    spark.catalog.dropTempView("events")
  }

  test("quality AUC: integer midrank identity equals an independent Scala AUC, " +
    "sharp on a planted CROSS-class quality tie") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    // the tie pair: both score exactly 0.37 after µ-quantization —
    // en: 4 words, one 'the' (stopRatio 1/4), 20 chars (avgWlen 5);
    // und: 4 words, no stops, 8 chars (avgWlen 2). 0.02 + 0.225 +
    // 0.125 == 0.02 + 0.3 + 0.05. A row_number (non-midrank) rank
    // would mis-handle exactly this group; within-class ties cannot
    // distinguish the two, so the cross-class tie is load-bearing.
    val docs = Seq(
      (1L, "the zzzzzz zzzzzz zzzzz"),                    // en, q = .37 (tie)
      (2L, "zz zz zz zz"),                                 // und, q = .37 (tie)
      (3L, "z z z z"),                                     // und, q = .345
      (4L, "the the xx yy"),                               // en, q = .2325
      (5L, "the quantum processors executed numerous benchmark workloads " +
        "delivering consistent throughput across distributed clusters"), // en, high
      (6L, "yang dan xx yy"))                              // id — excluded
    docs.toDF("doc_id", "text").createOrReplaceTempView("documents")
    val got = spark.sql(SqlOps.qualityAuc(SparkDialect)).head

    // ---- independent implementation (scores, labels, midrank AUC) ----
    val stopEn = Set("the", "and", "of", "to", "in", "is", "a")
    val stopId = Set("yang", "dan", "di", "ke", "itu", "untuk")
    val scored = docs.map { case (_, t) =>
      val toks = t.split(" ").toSeq
      val n = toks.size
      val en = toks.count(stopEn); val id = toks.count(stopId)
      val lang = if (en > id) "en" else if (id > en) "id" else "und"
      val stopRatio = toks.count(w => stopEn(w) || stopId(w)).toDouble / n
      val avgW = t.replace(" ", "").length.toDouble / n
      val q = math.min(n / 100.0, 1.0) * 0.5 + (1.0 - stopRatio) * 0.3 +
        math.min(avgW / 8.0, 1.0) * 0.2
      (lang, math.floor(q * 1.0e6 + 0.5).toLong)
    }.filter(s => s._1 == "en" || s._1 == "und")
    // guard the fixture: the cross-class tie must actually exist
    val enScores = scored.filter(_._1 == "en").map(_._2).toSet
    val undScores = scored.filter(_._1 == "und").map(_._2).toSet
    assert(enScores.intersect(undScores) === Set(370000L),
      "fixture must plant exactly one cross-class tied score")
    val sorted = scored.sortBy(_._2)
    // midranks: per tied group, rank = mean position (1-based)
    // .toSeq before flatMap: mapping a groupBy Map to (lang, mid)
    // tuples would re-key BY LANG and collapse every class to one rank
    val ranks = sorted.zipWithIndex.groupBy(_._1._2).toSeq.flatMap { case (_, g) =>
      val mid = g.map(_._2 + 1).sum.toDouble / g.size
      g.map { case ((lang, _), _) => (lang, mid) }
    }
    val n1 = scored.count(_._1 == "en").toLong
    val n0 = scored.count(_._1 == "und").toLong
    val u = ranks.filter(_._1 == "en").map(_._2).sum - n1 * (n1 + 1) / 2.0
    val wantPpm = math.floor(1.0e6 * u / (n1 * n0)).toLong
    assert(got.getAs[Long]("n_pos") === n1 && got.getAs[Long]("n_neg") === n0)
    assert(got.getAs[Long]("auc_ppm") === wantPpm)
    spark.catalog.dropTempView("documents")
  }

  test("Theil-Sen: SQL median-of-slopes equals an independent Scala computation " +
    "and shrugs off a planted outlier day that would drag OLS") {
    import spark.implicits._
    import java.sql.Date
    graft.functions.GraftFunctions.registerAll(spark)
    val base = java.time.LocalDate.of(1995, 3, 1)
    // 15 days on an exact 250-cents/day trend, two orders per day (the
    // rollup must aggregate before pairing), plus a single huge
    // flash-sale outlier on day 7
    val rows = (0 until 15).flatMap { d =>
      val daily = 10.0 + 2.5 * d // dollars; cents = 1000 + 250·d
      val parts = Seq(daily * 0.25, daily * 0.75)
      val outlier = if (d == 7) Seq(50000.0) else Seq.empty
      (parts ++ outlier).map(p => (Date.valueOf(base.plusDays(d.toLong)), p))
    }
    rows.toDF("o_orderdate", "o_totalprice").createOrReplaceTempView("orders")
    val got = spark.sql(SqlOps.theilSenRevenue(SparkDialect)).head

    // ---- independent implementation ----
    val epochDay = (d: Date) => d.toLocalDate.toEpochDay
    val daily = rows.groupBy(r => epochDay(r._1)).toSeq.map { case (day, rs) =>
      (day, rs.map(r => math.floor(r._2 * 100.0 + 0.5).toLong).sum)
    }.sortBy(_._1)
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; val n = s.size
      (s((n + 1) / 2 - 1) + s((n + 2) / 2 - 1)) / 2.0
    }
    val slopes = for {
      i <- daily.indices; j <- daily.indices if j > i
    } yield (daily(j)._2 - daily(i)._2).toDouble / (daily(j)._1 - daily(i)._1)
    val m = median(slopes)
    val b = median(daily.map { case (day, c) => c.toDouble - m * day })
    def r6d(x: Double): Double = math.floor(x * 1.0e6 + 0.5) / 1.0e6
    assert(got.getAs[Long]("n_days") === 15L)
    assert(got.getAs[Long]("n_pairs") === 105L)
    assert(got.getAs[Double]("slope_cents_per_day") === r6d(m))
    assert(got.getAs[Double]("intercept_cents") === r6d(b))
    // robustness: the median slope IS the clean 250 cents/day — the
    // outlier day taints only 14 of 105 pairs (an OLS fit would move)
    assert(got.getAs[Double]("slope_cents_per_day") === 250.0)
    spark.catalog.dropTempView("orders")
  }

  test("calibration: group-grain deciles + ECE equal an independent computation, " +
    "tie group straddling a boundary stays whole") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    // 8 docs: doc 1/2 tie exactly (q=.37, one en one und — the AUC
    // fixture's planted tie), so with n=8 the tied group's cumulative
    // range straddles a decile boundary and must land WHOLE in the
    // decile where it starts
    val docs = Seq(
      (1L, "the zzzzzz zzzzzz zzzzz"),
      (2L, "zz zz zz zz"),
      (3L, "z z z z"),
      (4L, "the the xx yy"),
      (5L, "the quantum processors executed numerous benchmark workloads " +
        "delivering consistent throughput across distributed clusters"),
      (6L, "yang dan xx yy"),
      (7L, "the alpha beta gamma delta"),
      (8L, "qq ww ee rr tt yy"))
    docs.toDF("doc_id", "text").createOrReplaceTempView("documents")
    val got = spark.sql(SqlOps.qualityCalibration(SparkDialect)).collect()
      .map(r => r.getInt(0) -> (r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]))).toMap

    // ---- independent: score every doc, group-grain decile, ECE ----
    val stopEn = Set("the", "and", "of", "to", "in", "is", "a")
    val stopId = Set("yang", "dan", "di", "ke", "itu", "untuk")
    val scoredAll = docs.map { case (_, t) =>
      val toks = t.split(" ").toSeq; val n = toks.size
      val en = toks.count(stopEn); val id = toks.count(stopId)
      val pos = if (en > id) 1L else 0L
      val sr = toks.count(w => stopEn(w) || stopId(w)).toDouble / n
      val aw = t.replace(" ", "").length.toDouble / n
      val q = math.min(n / 100.0, 1.0) * 0.5 + (1.0 - sr) * 0.3 +
        math.min(aw / 8.0, 1.0) * 0.2
      (math.floor(q * 1.0e6 + 0.5).toLong, pos)
    }
    val n = scoredAll.size.toLong
    val groups = scoredAll.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (q, xs) => (q, xs.size.toLong, xs.map(_._2).sum) }
    val withCb = groups.scanLeft((0L, 0L, 0L, 0L)) { case ((cb, _, _, _), (q, c, cp)) =>
      (cb + c, q, c, cp) }.tail.map { case (cbAfter, q, c, cp) => (cbAfter - c, q, c, cp) }
    val perDecile = withCb.groupBy { case (cb, _, _, _) => 1 + 10 * cb / n }
      .toSeq.map { case (dec, xs) =>
        val nd = xs.map(_._3).sum; val np = xs.map(_._4).sum
        val conf = xs.map(x => x._2 * x._3).sum / nd
        val acc = 1000000L * np / nd
        (dec, nd, conf, acc)
      }
    // the tie group q=370000 (2 docs) must be in ONE decile
    perDecile.foreach { case (dec, nd, conf, acc) =>
      assert(got(dec.toInt) === ((nd, Some(conf), Some(acc))), s"decile $dec")
    }
    val ece = perDecile.map { case (_, nd, conf, acc) => nd * math.abs(acc - conf) }.sum / n
    val gotEce = spark.sql(SqlOps.qualityCalibration(SparkDialect))
      .collect().head.getAs[Long]("ece_ppm_total")
    assert(gotEce === ece)
    // empty deciles emit zero rows, present ones match the domain
    assert(got.keySet === (1 to 10).toSet)
    spark.catalog.dropTempView("documents")
  }

  test("exact percentile rank: SQL value-cardinality form equals a sorted-array " +
    "percentile_disc on crafted cents") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    import java.sql.Date
    // 7 orders with repeated prices — ties exercise the cum >= rank MIN
    val prices = Seq(10.00, 10.00, 12.50, 13.75, 13.75, 13.75, 99.99)
    prices.zipWithIndex.map { case (p, i) =>
      (Date.valueOf(java.time.LocalDate.of(1995, 1, 1).plusDays(i.toLong)), p) }
      .toDF("o_orderdate", "o_totalprice").createOrReplaceTempView("orders")
    val got = spark.sql(SqlOps.pricePercentileApprox(SparkDialect)).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    val cents = prices.map(p => math.floor(p * 100 + 0.5).toLong).sorted
    def disc(p: Int): Long = cents((p * cents.size + 99) / 100 - 1) // ceil(p·n/100), 1-based
    Seq(50, 90, 99).foreach { p =>
      assert(got(p)._1 === disc(p), s"P$p")
      assert(got(p)._2, s"P$p approx sketch outside its contract bound")
    }
    spark.catalog.dropTempView("orders")
  }

  test("embedding outliers: planted far vector and degenerate zero-median cell " +
    "flag; an independent Scala recompute agrees") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    // cell 0: four tight vectors around the centroid plus ONE far
    // vector (the planted outlier the parquet fixture's uniform cloud
    // never produces — its zero rows are the healthy baseline);
    // cell 1: three vectors EXACTLY on the centroid (median 0) plus a
    // diverging member — the degenerate case where any dist > 0 flags
    val cent = Seq((0L, Seq(0f, 0f)), (1L, Seq(10f, 10f)))
    val vecs = Seq(
      (100L, 0L, Seq(0.1f, 0.0f)), (101L, 0L, Seq(-0.1f, 0.1f)),
      (102L, 0L, Seq(0.0f, -0.1f)), (103L, 0L, Seq(0.1f, 0.1f)),
      (104L, 0L, Seq(3.0f, 3.0f)),   // far: dist >> 4x median
      (200L, 1L, Seq(10f, 10f)), (201L, 1L, Seq(10f, 10f)),
      (202L, 1L, Seq(10f, 10f)),
      (203L, 1L, Seq(10.5f, 10f)))   // any positive dist beats median 0
    vecs.map { case (id, cell, e) => (id, cell, e, 1.0) }
      .toDF("vec_id", "cell", "embedding", "nrm")
      .createOrReplaceTempView("ivf_nvc")
    cent.flatMap { case (l, cs) => cs.zipWithIndex.map { case (c, p) =>
      (l, p.toLong, math.floor(c * 1.0e6 + 0.5).toLong) } }
      .toDF("label", "pos", "qc").createOrReplaceTempView("ivf_cent")
    val got = spark.sql(SqlOps.embeddingOutliers.body(SparkDialect)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Long]))).toMap

    // ---- independent recompute ----
    def q(x: Float): Long = math.floor(x.toDouble * 1.0e6 + 0.5).toLong
    val centMap = cent.map { case (l, cs) => l -> cs.map(q) }.toMap
    val dists = vecs.map { case (id, cell, e) =>
      (id, cell, e.map(q).zip(centMap(cell)).map { case (a, b) =>
        (a - b) * (a - b) }.sum)
    }
    dists.groupBy(_._2).foreach { case (cell, xs) =>
      val ds = xs.map(_._3).sorted
      val n = ds.size
      val m2 = ds((n + 1) / 2 - 1) + ds((n + 2) / 2 - 1)
      val out = xs.filter(_._3 > 2 * m2)
      val worst = if (out.isEmpty) None else Some(out.map(_._3).max)
      assert(got(cell) === ((n.toLong, m2, out.size.toLong, worst)), s"cell $cell")
    }
    assert(got(0L)._3 === 1L && got(1L)._3 === 1L,
      "both planted outliers must flag")
    Seq("ivf_nvc", "ivf_cent").foreach(spark.catalog.dropTempView)
  }

  test("Spearman: SQL doubled-midrank rho equals an independent computation " +
    "with ties on BOTH variables") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    // the AUC fixture's planted quality tie (docs 1/2 both 0.37) plus
    // token-count ties (docs 2,4 at 4 tokens; 3 also 4 tokens) — ties
    // on both rank variables exercise the midrank algebra end to end
    val docs = Seq(
      (1L, "the zzzzzz zzzzzz zzzzz"),
      (2L, "zz zz zz zz"),
      (3L, "z z z z"),
      (4L, "the the xx yy"),
      (5L, "the quantum processors executed numerous benchmark workloads " +
        "delivering consistent throughput across distributed clusters"),
      (6L, "yang dan xx yy"))
    docs.toDF("doc_id", "text").createOrReplaceTempView("documents")
    val got = spark.sql(SqlOps.qualitySpearman(SparkDialect)).head

    // ---- independent: score, midrank both variables, Pearson ----
    val stopEn = Set("the", "and", "of", "to", "in", "is", "a")
    val stopId = Set("yang", "dan", "di", "ke", "itu", "untuk")
    val xy = docs.map { case (_, t) =>
      val toks = t.split(" ").toSeq; val n = toks.size
      val sr = toks.count(w => stopEn(w) || stopId(w)).toDouble / n
      val aw = t.replace(" ", "").length.toDouble / n
      val q = math.min(n / 100.0, 1.0) * 0.5 + (1.0 - sr) * 0.3 +
        math.min(aw / 8.0, 1.0) * 0.2
      (math.floor(q * 1.0e6 + 0.5).toLong, n.toLong)
    }
    def midranks(vs: Seq[Long]): Seq[Double] = {
      val pos = vs.sorted.zipWithIndex.groupBy(_._1)
        .map { case (v, g) => v -> g.map(_._2 + 1).sum.toDouble / g.size }
      vs.map(pos)
    }
    val u = midranks(xy.map(_._1)); val v = midranks(xy.map(_._2))
    val n = xy.size.toDouble
    val (su, sv) = (u.sum, v.sum)
    val num = n * u.zip(v).map { case (a, b) => a * b }.sum - su * sv
    val den = math.sqrt((n * u.map(a => a * a).sum - su * su) *
      (n * v.map(b => b * b).sum - sv * sv))
    val want = math.floor(num / den * 1e6 + 0.5) / 1e6
    assert(got.getAs[Long]("n_docs") === 6L)
    assert(got.getAs[Double]("spearman_rho") === want)
    // fixture guard: ties exist on both variables
    assert(xy.map(_._1).distinct.size < 6 && xy.map(_._2).distinct.size < 6)
    spark.catalog.dropTempView("documents")
  }

  test("Mann-Kendall: SQL S/var/z/verdict equal an independent computation; " +
    "planted monotone trend flags, tie-heavy flat series does not") {
    import spark.implicits._
    import java.sql.Date
    graft.functions.GraftFunctions.registerAll(spark)
    val base = java.time.LocalDate.of(1995, 6, 1)
    def run(prices: Seq[Double]): (Long, Long, Option[Double], Int, String) = {
      prices.zipWithIndex.map { case (p, i) =>
        (Date.valueOf(base.plusDays(i.toLong)), p) }
        .toDF("o_orderdate", "o_totalprice").createOrReplaceTempView("orders")
      val r = spark.sql(SqlOps.mannKendallRevenue(SparkDialect)).head
      val out = (r.getAs[Long]("s_stat"), r.getAs[Long]("var18"),
        Option(r.get(3)).map(_.asInstanceOf[Double]),
        r.getAs[Int]("significant"), r.getAs[String]("trend"))
      spark.catalog.dropTempView("orders")
      out
    }
    def ref(prices: Seq[Double]): (Long, Long, Double, Int) = {
      val y = prices.map(p => math.floor(p * 100 + 0.5).toLong)
      val n = y.size.toLong
      val s = (for { i <- y.indices; j <- y.indices if j > i }
        yield java.lang.Long.signum(y(j) - y(i)).toLong).sum
      val tt = y.groupBy(identity).values.map(_.size.toLong)
        .map(t => t * (t - 1) * (2 * t + 5)).sum
      val var18 = n * (n - 1) * (2 * n + 5) - tt
      val z = (s - java.lang.Long.signum(s)) / math.sqrt(var18 / 18.0)
      val sig = if (math.abs(s) > 1 &&
        180000L * (math.abs(s) - 1) * (math.abs(s) - 1) > 38416L * var18) 1 else 0
      (s, var18, math.floor(z * 1e6 + 0.5) / 1e6, sig)
    }
    // strictly increasing with one tie pair: must flag 'increasing'
    val up = (0 until 20).map(i => 10.0 + i) :+ 29.0 // tie with the max
    val gu = run(up); val ru = ref(up)
    assert((gu._1, gu._2, gu._3.get, gu._4) === ((ru._1, ru._2, ru._3, ru._4)))
    assert(gu._4 === 1 && gu._5 === "increasing")
    // tie-heavy alternating flat series: S near 0, must NOT flag
    val flat = (0 until 20).map(i => if (i % 2 == 0) 10.0 else 11.0)
    val gf = run(flat); val rf = ref(flat)
    assert((gf._1, gf._2, gf._4) === ((rf._1, rf._2, rf._4)))
    assert(gf._4 === 0)
  }

  test("adjusted Rand index: SQL pair-counting equals an independent computation " +
    "on a crafted contingency; random-like assignment scores ~0") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    // 12 vectors, 3 cells vs 2 labels: cell A pure-x, cell B pure-y,
    // cell C mixed — ARI must land strictly between 0 and 1
    val asg = Seq(
      (1L, "A"), (2L, "A"), (3L, "A"),
      (4L, "B"), (5L, "B"), (6L, "B"), (7L, "B"),
      (8L, "C"), (9L, "C"), (10L, "C"), (11L, "C"), (12L, "C"))
    val lab = Seq(1L -> "x", 2L -> "x", 3L -> "x",
      4L -> "y", 5L -> "y", 6L -> "y", 7L -> "y",
      8L -> "x", 9L -> "x", 10L -> "y", 11L -> "y", 12L -> "y")
    asg.toDF("vec_id", "cell")
      .createOrReplaceTempView(s"km_a${graft.ops.SqlOps.KmRounds}")
    lab.map { case (id, l) => (id, l) }.toDF("vec_id", "label")
      .createOrReplaceTempView("embeddings")
    val got = spark.sql(SqlOps.kmeansAri.body(SparkDialect)).head

    // ---- independent pair-counting ARI ----
    val labMap = lab.toMap
    def c2(x: Long) = x * (x - 1) / 2
    val ct = asg.map { case (id, c) => (c, labMap(id)) }
      .groupBy(identity).map { case (_, xs) => xs.size.toLong }
    val sij = ct.map(c2).sum
    val sa = asg.groupBy(_._2).map { case (_, xs) => c2(xs.size.toLong) }.sum
    val sb = lab.groupBy(_._2).map { case (_, xs) => c2(xs.size.toLong) }.sum
    val p = c2(asg.size.toLong)
    val ari = (2.0 * p * sij - 2.0 * sa * sb) / (p * (sa + sb) - 2.0 * sa * sb)
    def r6d(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(got.getAs[Long]("n_vectors") === 12L)
    assert(got.getAs[Long]("n_cells") === 3L && got.getAs[Long]("n_labels") === 2L)
    assert(got.getAs[Double]("ari") === r6d(ari))
    assert(ari > 0.0 && ari < 1.0, s"fixture must be imperfect but better than chance: $ari")
    Seq(s"km_a${graft.ops.SqlOps.KmRounds}", "embeddings")
      .foreach(spark.catalog.dropTempView)
  }

  test("modularity: SQL three-partition Q equals an independent Newman computation") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    // two-snapshot ids: base docs 0..4, corpus nodes 2b/2b+1. Edges:
    // a triangle {0,1,2}, a pendant (2,6) CROSSING a cluster boundary,
    // and an isolated edge (8,9) — the components partition is NOT all
    // of Q=ceiling-by-construction here because cluster map below
    // deliberately splits the pendant off (testing intra<total)
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 6L), (8L, 9L))
    edges.toDF("doc_a", "doc_b").createOrReplaceTempView("mh_cand")
    val clusters = Seq((0L, 0L), (1L, 0L), (2L, 0L), (6L, 6L), (8L, 8L), (9L, 8L))
    clusters.toDF("doc_id", "cluster_id").createOrReplaceTempView("clusters")
    val sources = Seq((0L, "A"), (1L, "A"), (3L, "B"), (4L, "B"))
    sources.map { case (id, s) => (id, s, s"text$id") }
      .toDF("doc_id", "source", "text").createOrReplaceTempView("documents")
    val got = spark.sql(SqlOps.clusterModularity(SparkDialect)).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]))).toMap

    // ---- independent Newman Q ----
    def q(label: Long => String): (Long, Double) = {
      val m = edges.size.toDouble
      val intra = edges.count(e => label(e._1) == label(e._2))
      // group degree sums = per-label endpoint occurrence counts
      val dsum = edges.flatMap(e => Seq(e._1, e._2)).map(n => (label(n), 1))
        .groupBy(_._1).map { case (_, xs) => xs.size.toLong }
      val sdd = dsum.map(d => d * d).sum.toDouble
      (intra.toLong, (4.0 * m * intra - sdd) / (4.0 * m * m))
    }
    val cmap = clusters.toMap
    val smap = sources.toMap
    def r6d(x: Double): Double = math.floor(x * 1.0e6 + 0.5) / 1.0e6
    val byPart = Map[String, Long => String](
      "components" -> (n => cmap(n).toString),
      "source" -> (n => smap(n / 2)),
      "singletons" -> (n => n.toString))
    byPart.foreach { case (part, lbl) =>
      val (intra, qq) = q(lbl)
      assert(got(part)._1 === 5L, s"$part n_edges")
      assert(got(part)._2 === intra, s"$part intra")
      assert(got(part)._3.get === r6d(qq), s"$part Q")
    }
    // the deliberately-split pendant makes components' intra < total
    assert(got("components")._2 === 4L)
    Seq("mh_cand", "clusters", "documents").foreach(spark.catalog.dropTempView)
  }

  test("4-truss: staged peel equals an independent support peeler; a fourth " +
    "round changes nothing (depth covers the fixpoint)") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    // 4-clique {1,2,3,4} (every edge in 2 triangles — survives),
    // triangle {5,6,7} (support 1 — peels), pendant (1,10) and
    // isolated (8,9) (support 0 — peel)
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (5L, 6L), (5L, 7L), (6L, 7L), (1L, 10L), (8L, 9L))
    edges.toDF("doc_a", "doc_b").createOrReplaceTempView("mh_cand")
    val trussStages = SqlOps.trussIter.stages.filter(_._1.startsWith("tt_"))
    trussStages.foreach { case (name, build) =>
      spark.sql(build(SparkDialect)).localCheckpoint().createOrReplaceTempView(name)
    }
    val got = spark.sql(SqlOps.trussIter.body(SparkDialect)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    // ---- independent peeler: iterate to the true fixpoint ----
    def support(es: Set[(Long, Long)]): Map[(Long, Long), Int] = {
      val adj = (es.toSeq.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1)))
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      es.map(e => e -> (adj(e._1) intersect adj(e._2)).size).toMap
    }
    var cur = edges.toSet
    var done = false
    while (!done) {
      val keep = support(cur).filter(_._2 >= 2).keySet
      done = keep == cur; cur = keep
    }
    val want = support(cur).map { case ((a, b), s) => (a, b, s.toLong) }.toSet
    assert(got === want)
    assert(got.map(e => Set(e._1, e._2)).flatten === Set(1L, 2L, 3L, 4L))
    // fixpoint coverage: a FOURTH peel round over tt_e3 must be a no-op
    val round4 = spark.sql(trussStages.last._2(SparkDialect)
      .replace("tt_e2", "tt_e3")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(round4 === got.map(e => (e._1, e._2)))
    Seq("mh_cand", "tt_e0", "tt_e1", "tt_e2", "tt_e3")
      .foreach(spark.catalog.dropTempView)
  }

  test("good-turing: SQL count-class table equals an independent frequency-of-frequencies pass") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    // planted global token counts: a×5 b×3 f×2 g×2 c,d,e×1
    // → N=15, V=7, N1=3, N2=2, N3=1, N5=1 (N4 empty → NULL r*)
    val docs = Seq(
      (0L, "a a a b c"),
      (1L, "a b f g d"),
      (2L, "a b f g e"))
    docs.toDF("doc_id", "text").createOrReplaceTempView("documents")
    val got = spark.sql(SqlOps.goodTuring.single(SparkDialect)).collect()

    // ---- independent implementation ----
    val toks = docs.flatMap(_._2.split(" ", -1))
    val cnt = toks.groupBy(identity).map { case (_, xs) => xs.size.toLong }
    val nn = toks.size.toLong
    val ff = cnt.groupBy(identity).map { case (r, xs) => r -> xs.size.toLong }
    val pUnseen = r6(ff(1L).toDouble / nn)
    assert(got.length === 8)
    got.foreach { row =>
      val r = row.getAs[Int]("r").toLong
      val n_r = ff.getOrElse(r, 0L)
      val n_r1 = ff.getOrElse(r + 1, 0L)
      assert(row.getAs[Long]("n_r") === n_r, s"n_r at r=$r")
      assert(row.getAs[Long]("n_r_next") === n_r1, s"n_r_next at r=$r")
      if (n_r == 0L) {
        assert(row.isNullAt(row.fieldIndex("r_star")), s"r_star at empty class r=$r")
        assert(row.isNullAt(row.fieldIndex("p_gt")), s"p_gt at empty class r=$r")
      } else {
        val rStar = ((r + 1) * n_r1).toDouble / n_r
        assert(row.getAs[Double]("r_star") === r6(rStar), s"r_star at r=$r")
        assert(row.getAs[Double]("p_gt") === r6(rStar / nn.toDouble), s"p_gt at r=$r")
      }
      assert(row.getAs[Long]("n_tokens") === nn)
      assert(row.getAs[Long]("vocab") === cnt.size.toLong)
      assert(row.getAs[Double]("p_unseen") === pUnseen)
    }
    // sanity: the singleton mass is the classic 3/15
    assert(pUnseen === 0.2)
    spark.catalog.dropTempView("documents")
  }

  test("kendall tau-b: SQL grid statistic equals an independent all-pairs pass") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    // crafted docs varying token count AND word length out of lockstep,
    // with stopwords on some docs so the quality components all move
    val stop = Set("the", "and", "of", "to", "in", "is", "a",
      "yang", "dan", "di", "ke", "itu", "untuk")
    val docs = (0 until 40).map { i =>
      val n = 3 + (i * 7) % 37
      val w = "abcdefgh".take(1 + (i * 3) % 8)
      val words = Seq.tabulate(n)(k =>
        if (i % 4 == 0 && k % 5 == 0) "the" else w)
      (i.toLong, words.mkString(" "))
    }
    docs.toDF("doc_id", "text").createOrReplaceTempView("documents")
    val got = spark.sql(SqlOps.qualityKendall.single(SparkDialect)).collect()
    assert(got.length === 1)

    // ---- independent implementation ----
    def buckets(text: String): (Long, Long) = {
      val toks = text.split(" ", -1)
      val nW = toks.length
      val sr = toks.count(stop).toDouble / nW
      val avgW = text.replace(" ", "").length.toDouble / nW
      val q = math.min(nW / 100.0, 1.0) * 0.5 + (1.0 - sr) * 0.3 +
        math.min(avgW / 8.0, 1.0) * 0.2
      (math.min(math.floor(q * 20.0).toLong, 19L), math.min(nW.toLong / 16L, 63L))
    }
    val bs = docs.map { case (_, t) => buckets(t) }
    var c = 0L; var dd = 0L
    for (i <- bs.indices; j <- (i + 1) until bs.size) {
      val ((x1, y1), (x2, y2)) = (bs(i), bs(j))
      if (x1 != x2 && y1 != y2) {
        if ((x1 < x2) == (y1 < y2)) c += 1 else dd += 1
      }
    }
    val n = bs.size.toLong
    def tie(key: ((Long, Long)) => Long): Long =
      bs.groupBy(key).values.map(g => g.size.toLong * (g.size - 1)).sum
    val a2 = n * (n - 1) - tie(_._1)
    val b2 = n * (n - 1) - tie(_._2)
    val tau = r6((2L * c - 2L * dd).toDouble / math.sqrt(a2.toDouble * b2))
    val row = got(0)
    assert(row.getAs[Long]("n_docs") === n)
    assert(row.getAs[Long]("concordant") === c)
    assert(row.getAs[Long]("discordant") === dd)
    assert(row.getAs[Double]("kendall_tau_b") === tau)
    // sanity: the fixture must exercise both concordant and discordant
    // mass and real ties, else the tie-correction terms prove nothing
    assert(c > 0 && dd > 0 && tie(_._1) > 0 && tie(_._2) > 0)
    spark.catalog.dropTempView("documents")
  }

  test("two-factor OLS: exact planted fit is recovered; noisy fit matches Gaussian elimination") {
    import spark.implicits._
    import java.sql.Date
    graft.functions.GraftFunctions.registerAll(spark)
    val base = java.time.LocalDate.of(1995, 1, 2)
    def wk(d: java.time.LocalDate): Boolean = {
      val dow = (d.toEpochDay + 4) % 7; dow == 0 || dow == 6
    }
    // exact plant: y = 1000 + 3·x1 + 50·weekend, one order per day
    val rows = (0 until 120).map { i =>
      val dt = base.plusDays(i.toLong)
      val y = 1000 + 3 * i + (if (wk(dt)) 50 else 0)
      (Date.valueOf(dt), y.toDouble)
    }
    rows.toDF("o_orderdate", "o_totalprice").createOrReplaceTempView("orders")
    val got = spark.sql(SqlOps.olsRevenue(SparkDialect)).collect()
    assert(got.length === 1)
    val r = got(0)
    assert(r.getAs[Long]("n_days") === 120L)
    assert(r.getAs[Long]("n_weekend_days") === rows.count { case (d, _) => wk(d.toLocalDate) }.toLong)
    assert(r.getAs[Double]("beta0") === 1000.0)
    assert(r.getAs[Double]("beta1_per_day") === 3.0)
    assert(r.getAs[Double]("beta2_weekend") === 50.0)
    assert(r.getAs[Double]("r2") === 1.0)

    // noisy plant: independent Gaussian-elimination solve must agree
    val noisy = (0 until 90).map { i =>
      val dt = base.plusDays(i.toLong)
      val y = 2000 + 5 * i + (if (wk(dt)) -40 else 0) + (i * 13) % 23
      (Date.valueOf(dt), y.toDouble)
    }
    noisy.toDF("o_orderdate", "o_totalprice").createOrReplaceTempView("orders")
    val got2 = spark.sql(SqlOps.olsRevenue(SparkDialect)).collect()(0)
    val xy = noisy.map { case (d, p) =>
      val ld = d.toLocalDate
      (ld.toEpochDay - base.toEpochDay, if (wk(ld)) 1L else 0L, p.toLong)
    }
    // Gaussian elimination on the 3×3 normal equations
    val n = xy.size.toDouble
    val s1 = xy.map(_._1).sum.toDouble; val s2 = xy.map(_._2).sum.toDouble
    val s11 = xy.map(t => t._1 * t._1).sum.toDouble
    val s12 = xy.map(t => t._1 * t._2).sum.toDouble
    val sy = xy.map(_._3).sum.toDouble
    val s1y = xy.map(t => t._1 * t._3).sum.toDouble
    val s2y = xy.map(t => t._2 * t._3).sum.toDouble
    val m = Array(
      Array(n, s1, s2, sy),
      Array(s1, s11, s12, s1y),
      Array(s2, s12, s2, s2y))
    for (p <- 0 until 3; q <- 0 until 3; if q != p) {
      val f = m(q)(p) / m(p)(p)
      for (k <- p to 3) m(q)(k) -= f * m(p)(k)
    }
    val beta = (0 until 3).map(i => m(i)(3) / m(i)(i))
    assert(math.abs(got2.getAs[Double]("beta0") - beta(0)) < 1e-4)
    assert(math.abs(got2.getAs[Double]("beta1_per_day") - beta(1)) < 1e-6)
    assert(math.abs(got2.getAs[Double]("beta2_weekend") - beta(2)) < 1e-5)
    assert(got2.getAs[Double]("r2") > 0.9)
    spark.catalog.dropTempView("orders")
  }

  test("day-of-week seasonality: SQL index equals an independent per-weekday pass") {
    import spark.implicits._
    import java.sql.Date
    graft.functions.GraftFunctions.registerAll(spark)
    val base = java.time.LocalDate.of(1996, 6, 3)
    // 4 full weeks, revenue a pure function of weekday plus a ramp so
    // per-weekday means differ from a single day's value
    val rows = (0 until 28).map { i =>
      val dt = base.plusDays(i.toLong)
      val dow = ((dt.toEpochDay + 4) % 7).toInt
      (Date.valueOf(dt), (100.0 * (dow + 1)) + i)
    }
    rows.toDF("o_orderdate", "o_totalprice").createOrReplaceTempView("orders")
    val got = spark.sql(SqlOps.seasonalityDow(SparkDialect)).collect()
    assert(got.length === 7)

    // ---- independent implementation ----
    val daily = rows.map { case (d, p) =>
      val ld = d.toLocalDate
      (((ld.toEpochDay + 4) % 7).toInt, math.floor(p * 100.0 + 0.5).toLong)
    }
    val byDow = daily.groupBy(_._1).map { case (k, v) =>
      k -> (v.size.toLong, v.map(_._2).sum)
    }
    val tc = daily.map(_._2).sum; val td = daily.size.toLong
    got.foreach { row =>
      val dow = row.getAs[Int]("dow")
      val (nd, cents) = byDow(dow)
      assert(row.getAs[Long]("n_days") === nd)
      assert(row.getAs[Long]("cents") === cents)
      val idx = r6((cents.toDouble / nd) / (tc.toDouble / td))
      assert(row.getAs[Double]("seasonal_index") === idx, s"index at dow=$dow")
    }
    // sanity: Sunday (highest planted level ... dow 0 = 100/day base)
    // and Saturday differ — the index is not vacuously flat
    assert(got.map(_.getAs[Double]("seasonal_index")).distinct.length > 1)
    spark.catalog.dropTempView("orders")
  }

  test("fellegi-sunter: SQL m/u/weights equal an independent pair-and-marginal pass") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    // 8 docs over 2 sources, 2 langs, 3 length buckets
    val docs = Seq(
      (0L, "s0", "en", 10L), (1L, "s0", "en", 40L),
      (2L, "s1", "en", 70L), (3L, "s1", "id", 10L),
      (4L, "s0", "id", 40L), (5L, "s1", "en", 12L),
      (6L, "s0", "en", 64L), (7L, "s1", "id", 90L))
    docs.toDF("doc_id", "source", "lang", "n_chars")
      .createOrReplaceTempView("documents")
    // candidate pairs in SNAPSHOT ids (underlying = id DIV 2):
    // (0,1)→(0,0) self-pair, (4,5)→(2,2) self-pair, (2,10)→(1,5),
    // (6,14)→(3,7) — a mix of trivially-agreeing and cross-doc pairs
    val cand = Seq((0L, 1L), (4L, 5L), (2L, 10L), (6L, 14L))
    cand.toDF("doc_a", "doc_b").createOrReplaceTempView("mh_cand")
    val got = spark.sql(SqlOps.linkageFs.body(SparkDialect)).collect()
      .map(r => r.getAs[String]("field") -> r).toMap
    assert(got.keySet === Set("source", "lang", "len_bucket"))

    // ---- independent implementation ----
    val att = docs.map { case (id, s, l, nc) => id -> ((s, l, nc / 32)) }.toMap
    val pairs = cand.map { case (a, b) => (att(a / 2), att(b / 2)) }
    def mPpm(f: (((String, String, Long)), ((String, String, Long))) => Boolean): Long =
      1000000L * pairs.count { case (a, b) => f(a, b) } / pairs.size
    def uPpm(key: ((String, String, Long)) => Any): Long = {
      val groups = docs.map { case (id, _, _, _) => key(att(id)) }
        .groupBy(identity).values.map(_.size.toLong)
      val nDocs = docs.size.toLong
      1000000L * groups.map(g => g * (g - 1)).sum / (nDocs * (nDocs - 1))
    }
    val expect = Seq(
      ("source", mPpm((a, b) => a._1 == b._1), uPpm(_._1)),
      ("lang", mPpm((a, b) => a._2 == b._2), uPpm(_._2)),
      ("len_bucket", mPpm((a, b) => a._3 == b._3), uPpm(_._3)))
    expect.foreach { case (f, m, u) =>
      val row = got(f)
      assert(row.getAs[Long]("m_ppm") === m, s"m at $f")
      assert(row.getAs[Long]("u_ppm") === u, s"u at $f")
      assert(row.getAs[Double]("weight_ratio") === r6(m.toDouble / u), s"w at $f")
      // sanity: every field must discriminate (m > u), else the
      // fixture exercises nothing
      assert(m > u, s"fixture sanity at $f")
    }
    Seq("documents", "mh_cand").foreach(spark.catalog.dropTempView)
  }

  test("cohort LTV: SQL curve equals an independent per-cohort cumulative pass") {
    import spark.implicits._
    import java.sql.Date
    graft.functions.GraftFunctions.registerAll(spark)
    // two cohorts; customer 1 buys in months 0,1,3 (gap at 2 must
    // carry the cumulative), customer 2 only at 0; customer 3 joins a
    // month later
    val rows = Seq(
      (1L, "1995-01-05", 100.0), (1L, "1995-02-10", 50.0), (1L, "1995-04-20", 25.0),
      (2L, "1995-01-15", 10.0),
      (3L, "1995-02-02", 40.0), (3L, "1995-03-03", 40.0))
      .map { case (c, d, p) => (c, Date.valueOf(d), p) }
    rows.toDF("o_custkey", "o_orderdate", "o_totalprice")
      .createOrReplaceTempView("orders")
    val got = spark.sql(SqlOps.cohortLtv(SparkDialect)).collect()
      .map(r => ((r.getAs[Int]("cohort_year"), r.getAs[Int]("cohort_month"),
        r.getAs[Int]("months_since_first")),
        (r.getAs[Long]("n_customers"), r.getAs[Long]("cum_cents"),
          r.getAs[Long]("ltv_cents")))).toMap

    // ---- independent implementation ----
    val om = rows.map { case (c, d, p) =>
      val ld = d.toLocalDate
      (c, ld.getYear * 12 + ld.getMonthValue - 1, math.floor(p * 100.0 + 0.5).toLong)
    }
    val cohort = om.groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2).min }
    val want = cohort.values.toSeq.distinct.flatMap { c0 =>
      val members = cohort.count(_._2 == c0).toLong
      (0 to 5).map { k =>
        val cum = om.filter { case (c, mk, _) =>
          cohort(c) == c0 && mk - cohort(c) <= k }.map(_._3).sum
        ((c0 / 12, c0 % 12 + 1, k), (members, cum, cum / members))
      }
    }.toMap
    assert(got.size === want.size)
    want.foreach { case (k, v) => assert(got(k) === v, s"at $k") }
    // fixture sanity: the month-2 gap row must exist and carry month 1's cum
    assert(got((1995, 1, 2)) === got((1995, 1, 1)))
    spark.catalog.dropTempView("orders")
  }

  test("markov stationary: SQL power iteration equals an independent exact-rational pass") {
    import spark.implicits._
    import java.sql.Timestamp
    graft.functions.GraftFunctions.registerAll(spark)
    // user 7 walks a planted recurrent sequence over {a, b}; user 8
    // walks "x y" planting a SINK: y receives mass and has no outgoing
    // transitions — the self-loop completion must HOLD y's mass (the
    // old transition-join-only iteration silently dropped it)
    val walk = "a a a b a a a b a".split(" ").toSeq
    val rows = walk.zipWithIndex.map { case (s, i) =>
      (i.toLong, Timestamp.valueOf(s"1995-01-01 00:00:${10 + i}"), 7L, s)
    } ++ Seq(
      (100L, Timestamp.valueOf("1995-01-01 00:01:00"), 8L, "x"),
      (101L, Timestamp.valueOf("1995-01-01 00:01:01"), 8L, "y"))
    rows.toDF("event_id", "ts", "user_id", "event_type")
      .createOrReplaceTempView("events")
    val got = spark.sql(SqlOps.markovStationary.single(SparkDialect)).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_outgoing"), r.getAs[Long]("pi_ppm"))).toMap

    // ---- independent implementation (BigInt floor arithmetic, sink
    // states self-loop: their mass carries forward unchanged) ----
    val trans = (walk.zip(walk.drop(1)) ++ Seq(("x", "y"))).groupBy(identity)
      .map { case (k, xs) => k -> xs.size.toLong }
    val states = (walk :+ "x" :+ "y").distinct.sorted
    val outTot = states.map(s => s -> trans.collect {
      case ((p, _), n) if p == s => n }.sum).toMap
    var pi = states.map(_ -> BigInt(1000000L / states.size)).toMap
    (1 to 3).foreach { _ =>
      pi = states.map { j =>
        val flow = states.map { i =>
          val n = trans.getOrElse((i, j), 0L)
          if (n == 0 || outTot(i) == 0) BigInt(0)
          else pi(i) * n / outTot(i)
        }.sum
        val hold = if (outTot(j) == 0) pi(j) else BigInt(0)
        j -> (flow + hold)
      }.toMap
    }
    states.foreach { s =>
      assert(got(s) === ((outTot(s), pi(s).toLong)), s"state $s")
    }
    // sanity: the chain spends most time in 'a'
    assert(got("a")._2 > got("b")._2)
    // the sink path: y drained x's seed in round 1 and must still hold
    // the combined mass at depth 3 (the old iteration decayed it to 0);
    // x sent everything away and receives nothing back
    assert(got("y") === ((0L, 500000L)), "sink must hold its accumulated mass")
    assert(got("x")._2 === 0L)
    spark.catalog.dropTempView("events")
  }

  test("markov entropy rate: SQL equals an independent floor-exact pass; sinks contribute zero") {
    import spark.implicits._
    import java.sql.Timestamp
    graft.functions.GraftFunctions.registerAll(spark)
    // same chain as the stationary test: recurrent {a,b} walk plus the
    // planted sink y (x -> y, y emits nothing) — y must be ABSENT from
    // the per-state rows (its self-loop completion is deterministic,
    // H_y = 0) and must not disturb the rate
    val walk = "a a a b a a a b a".split(" ").toSeq
    val rows = walk.zipWithIndex.map { case (s, i) =>
      (i.toLong, Timestamp.valueOf(s"1995-01-01 00:00:${10 + i}"), 7L, s)
    } ++ Seq(
      (100L, Timestamp.valueOf("1995-01-01 00:01:00"), 8L, "x"),
      (101L, Timestamp.valueOf("1995-01-01 00:01:01"), 8L, "y"))
    rows.toDF("event_id", "ts", "user_id", "event_type")
      .createOrReplaceTempView("events")
    val got = spark.sql(SqlOps.markovEntropyRate.single(SparkDialect)).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("pi_ppm"), r.getAs[Long]("cond_entropy_mu"),
          r.getAs[Long]("entropy_rate_mu"), r.getAs[Double]("entropy_rate_bits"))).toMap

    // ---- independent implementation ----
    def ql(x: Long): Long =
      math.floor(math.log(x.toDouble) / math.log(2.0) * 1e6 + 0.5).toLong
    val trans = (walk.zip(walk.drop(1)) ++ Seq(("x", "y"))).groupBy(identity)
      .map { case (k, xs) => k -> xs.size.toLong }
    val states = (walk :+ "x" :+ "y").distinct.sorted
    val outTot = states.map(s => s -> trans.collect {
      case ((p, _), n) if p == s => n }.sum).toMap
    var pi = states.map(_ -> BigInt(1000000L / states.size)).toMap
    (1 to 3).foreach { _ =>
      pi = states.map { j =>
        val flow = states.map { i =>
          val n = trans.getOrElse((i, j), 0L)
          if (n == 0 || outTot(i) == 0) BigInt(0)
          else pi(i) * n / outTot(i)
        }.sum
        j -> (flow + (if (outTot(j) == 0) pi(j) else BigInt(0)))
      }.toMap
    }
    val outStates = states.filter(outTot(_) > 0)
    val hmu = outStates.map { s =>
      s -> trans.toSeq.collect { case ((p, _), n) if p == s =>
        math.floor(n.toDouble * (ql(outTot(s)) - ql(n)) / outTot(s)).toLong
      }.sum
    }.toMap
    val rate = outStates.map(s =>
      math.floor(pi(s).toDouble * hmu(s) / 1000000).toLong).sum
    assert(got.keySet === outStates.toSet, "sink states must emit no row")
    outStates.foreach { s =>
      assert(got(s) === ((pi(s).toLong, hmu(s), rate, r6(rate.toDouble / 1e6))),
        s"state $s")
    }
    // the deterministic rows: b and x always transition to one state
    assert(hmu("b") === 0L && hmu("x") === 0L)
    // and the rate is carried by 'a' alone, strictly positive
    assert(rate > 0L)
    spark.catalog.dropTempView("events")
  }

  test("runs test: clustered and alternating arrangements flag with exact z2; " +
    "a balanced arrangement reads random") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    def runQ(langs: Seq[String]) = {
      langs.zipWithIndex.map { case (l, i) => (i.toLong, l) }
        .toDF("doc_id", "lang").createOrReplaceTempView("documents")
      val r = spark.sql(SqlOps.runsTest(SparkDialect)).collect()(0)
      (r.getAs[Long]("n"), r.getAs[Long]("n1"), r.getAs[Long]("n0"),
        r.getAs[Long]("runs"), r.getAs[Long]("expected_runs_mu"),
        r.getAs[Double]("z_squared"), r.getAs[String]("verdict"))
    }
    def replay(langs: Seq[String]) = {
      val x = langs.map(l => if (l == "en") 1L else 0L)
      val n = x.size.toLong
      val n1 = x.sum; val n0 = n - n1
      val runs = 1L + x.zip(x.drop(1)).count { case (a, b) => a != b }
      val a = runs * n - n - 2 * n1 * n0
      val expMu = math.floor((n + 2 * n1 * n0).toDouble * 1000000 / n).toLong
      val z2 = a.toDouble * a * (n - 1) / ((2 * n1 * n0).toDouble * (2 * n1 * n0 - n))
      val verdict =
        if (z2 <= 3.8416) "random" else if (a < 0) "clustered" else "alternating"
      (n, n1, n0, runs, expMu, r6(z2), verdict)
    }
    // sorted-by-label storage: 2 runs where chance expects 11 — the
    // bad-shuffle case a sequential loader must not be pointed at
    val clustered = Seq.fill(10)("en") ++ Seq.fill(10)("fr")
    // perfectly interleaved: 20 runs — "too regular" is also not random
    val alternating = Seq.tabulate(20)(i => if (i % 2 == 0) "en" else "fr")
    // a balanced arrangement with runs near the expectation
    val shuffled = Seq("en", "fr", "fr", "en", "en", "en", "fr", "en", "fr", "fr",
      "fr", "en", "en", "fr", "en", "fr", "fr", "en", "fr", "en")
    Seq(clustered -> "clustered", alternating -> "alternating",
        shuffled -> "random").foreach { case (arr, want) =>
      val got = runQ(arr)
      assert(got === replay(arr), s"arrangement $want")
      assert(got._7 === want, s"verdict for $want arrangement")
    }
    // gapped ids: the +1 adjacency join undercounts flips (here it sees
    // ZERO of them), which without the density guard would read as the
    // maximally-clustered arrangement — the guard must refuse to answer
    Seq.tabulate(20)(i => (i.toLong * 2, if (i % 2 == 0) "en" else "fr"))
      .toDF("doc_id", "lang").createOrReplaceTempView("documents")
    val gapped = spark.sql(SqlOps.runsTest(SparkDialect)).collect()(0)
    assert(gapped.getAs[String]("verdict") === "ids_not_dense")
    assert(gapped.isNullAt(gapped.fieldIndex("z_squared")))
    spark.catalog.dropTempView("documents")
  }

  test("ab sprt: planted daily conversions replay the exact integer LLR walk, " +
    "boundary crossings flip the decision, control arm and non-purchases don't count") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    def t(day: Int, s: Long) = new java.sql.Timestamp((day * 86400L + s) * 1000L)
    // treatment arm = odd user ids; conversions are value > 150.
    // day 0: 1/2 large → LLR day = L1 + L0; day 1: 0/3 → 3·L0;
    // day 2: 52 small purchases → 52·L0 pushes cum past +A (accept_h1:
    // 52·108060 − 1628906 + 324180 = 4314394 ≥ 4247928) — plus
    // control-arm and view noise that must not count
    val rows =
      Seq((1L, 1L, t(0, 10), "purchase", 200.0),
        (2L, 3L, t(0, 20), "purchase", 100.0),
        (3L, 2L, t(0, 30), "purchase", 999.0),   // control arm: ignored
        (4L, 1L, t(0, 40), "view", 999.0)) ++    // not a purchase: ignored
      (0 until 3).map(i => (10L + i, 5L, t(1, i * 7L), "purchase", 10.0 + i)) ++
      (0 until 52).map(i => (50L + i, 7L, t(2, i * 5L), "purchase", 20.0))
    rows.toDF("event_id", "user_id", "ts", "event_type", "value")
      .createOrReplaceTempView("events")
    val got = spark.sql(SqlOps.abSprt(SparkDialect)).collect()
      .map(r => r.getAs[Long]("day") ->
        ((r.getAs[Long]("trials"), r.getAs[Long]("successes"),
          r.getAs[Long]("llr_day_mu"), r.getAs[Long]("cum_llr_mu"),
          r.getAs[String]("decision")))).toMap
    // independent replay with the documented host-exact literals
    val (l1, l0, bound) = (-1736966L, 108060L, 4247928L)
    def dec(c: Long) =
      if (c >= bound) "accept_h1" else if (c <= -bound) "accept_h0" else "continue"
    val d0 = 1 * l1 + 1 * l0
    val d1 = 3 * l0
    val d2 = 52 * l0
    assert(got === Map(
      0L -> ((2L, 1L, d0, d0, dec(d0))),
      1L -> ((3L, 0L, d1, d0 + d1, dec(d0 + d1))),
      2L -> ((52L, 0L, d2, d0 + d1 + d2, dec(d0 + d1 + d2)))))
    assert(dec(d0 + d1 + d2) === "accept_h1", "fixture must cross the H1 boundary")
    assert(dec(d0) === "continue")
    spark.catalog.dropTempView("events")
  }

  test("james-stein shrinkage: four planted sources replay the closed-form " +
    "positive-part estimator with the exact quantization sequence") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    // quality formula inputs are (n_words, stop ratio, avg word len) —
    // instead of reverse-engineering it, replay it: read back the
    // per-doc quality Spark computes and push it through an
    // INDEPENDENT Scala implementation of the JS arithmetic,
    // mirroring each documented int64 quantization step.
    val texts = (0 until 4).flatMap { srcI =>
      (0 until 5).map { j =>
        val words = Seq.fill(8 + srcI + j % 2)("word") ++ Seq("the", "and")
        (srcI.toLong * 5 + j, words.mkString(" "), s"s$srcI", "en")
      }
    }
    texts.toDF("doc_id", "text", "source", "lang").createOrReplaceTempView("documents")
    val got = spark.sql(SqlOps.jsShrinkage(SparkDialect)).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n"), r.getAs[Double]("mean_q"),
          r.getAs[Double]("js_mean_q"), r.getAs[Double]("shrink_c")))).toMap
    // per-doc µ-quality from the engine's own scored CTE (the shared
    // formula), then an independent JS replay
    val q = spark.sql(
      s"WITH ${SqlOps.scoredCtes(SparkDialect, "documents")} " +
        "SELECT doc_id, CAST(FLOOR(quality * 1.0e6 + 5.0e-1) AS BIGINT) AS q FROM scored")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bySrc = texts.groupBy(_._3).view
      .mapValues(_.map(d => q(d._1))).toMap
    def fl(x: Double) = math.floor(x + 0.5).toLong
    val st = bySrc.toSeq.map { case (s, qs) =>
      val n = qs.size.toLong
      val s1 = qs.sum; val s2 = qs.map(x => x * x).sum
      val xbq = fl(s1.toDouble / n)
      val vmq = if (n < 2) 0L
        else fl((n.toDouble * s2 - s1.toDouble * s1) / (n.toDouble * (n - 1) * n))
      (s, n, xbq, vmq)
    }
    val k = st.size.toLong
    val sxb = st.map(_._3).sum; val svm = st.map(_._4).sum
    val ss2 = st.map(t => (k * t._3 - sxb) * (k * t._3 - sxb)).sum
    val c = if (k <= 3) 1.0 else if (ss2 == 0) 0.0
      else math.max(0.0,
        1.0 - (k - 3) * (svm.toDouble / k) / (ss2.toDouble / k / k))
    def r6d(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    st.foreach { case (s, n, xbq, _) =>
      val (gn, gm, gj, gc) = got(s)
      assert(gn === n)
      assert(gm === r6d(xbq.toDouble / 1e6), s"mean for $s")
      val m = sxb.toDouble / k
      assert(gj === r6d((m + c * (xbq - m)) / 1e6), s"js mean for $s")
      assert(gc === r6d(c))
    }
    // shrinkage must be ACTIVE (interior c), not a degenerate 0/1
    assert(c > 0.0 && c < 1.0,
      s"fixture must exercise an interior shrink factor, got c=$c")
    spark.catalog.dropTempView("documents")
  }

  test("token burstiness: hand-planted burst and uniform tokens give exact " +
    "fano ppm; below-df tokens drop") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    // 6 docs. 'puffin' bursts: 6 occurrences in doc0 + 1 in docs 1-4
    // (df 5, t 10, Σc² 40) → fano = (6·40 − 100)/(6·10) = 7/3.
    // 'the' is uniform: once everywhere (df 6, t 6, Σc² 6) → fano 0.
    // 'rare' has df 2 < 5 → must not appear.
    val docs = (0 until 6).map { i =>
      val words =
        (if (i == 0) Seq.fill(6)("puffin") else if (i <= 4) Seq("puffin") else Nil) ++
        Seq("the") ++ (if (i < 2) Seq("rare") else Nil) ++
        Seq("w" + i) // distinct filler, df 1
      (i.toLong, words.mkString(" "), "s0", "en")
    }
    docs.toDF("doc_id", "text", "source", "lang").createOrReplaceTempView("documents")
    // build the ulm_tf stage as a view (the sqlStaged test shape)
    SqlOps.tokenBurstiness.stages.foreach { case (name, build) =>
      spark.sql(build(SparkDialect)).localCheckpoint().createOrReplaceTempView(name)
    }
    val got = spark.sql(SqlOps.tokenBurstiness.body(SparkDialect)).collect()
      .map(r => r.getAs[String]("token") ->
        ((r.getAs[Long]("df"), r.getAs[Long]("total_tf"), r.getAs[Long]("fano_ppm"))))
      .toMap
    assert(got.keySet === Set("puffin", "the"))
    assert(got("puffin") === ((5L, 10L, (1000000L * (6 * 40 - 100)) / (6 * 10))))
    assert(got("the") === ((6L, 6L, 0L)))
    spark.catalog.dropTempView("documents")
  }

  test("capture-recapture: an independent md5+shingle replay reproduces the " +
    "chapman estimate on the fixture corpus") {
    // fully independent: java MD5 for the content buckets, a plain
    // split-based 3-gram shingler, set arithmetic for the captures,
    // BigInt for chapman — nothing shared with the SQL rendering
    // except the fixture itself (sf0.001 documents)
    val docs = graft.Tables.documents(spark, sf001)
      .selectExpr("doc_id", "text").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
    def bucket(text: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(text.getBytes("UTF-8"))
      ((md(0) & 0xff))
    }
    def shingles(text: String): Set[String] = {
      val w = text.split(" ").filter(_.nonEmpty)
      if (w.length < 3) Set.empty
      else w.sliding(3).map(_.mkString(" ")).toSet
    }
    val all = docs.map { case (_, t) => (bucket(t), shingles(t)) }
    val sa = all.filter(_._1 < 64).flatMap(_._2).toSet
    val sb = all.filter(x => x._1 >= 64 && x._1 < 128).flatMap(_._2).toSet
    val truth = all.flatMap(_._2).toSet.size.toLong
    val (n1, n2, m) = (sa.size.toLong, sb.size.toLong, sa.intersect(sb).size.toLong)
    val est = (n1 + 1) * (n2 + 1) / (m + 1) - 1
    val errPpm = 1000000L * math.abs(est - truth) / truth
    graft.functions.GraftFunctions.registerAll(spark)
    graft.Tables.documents(spark, sf001).createOrReplaceTempView("documents")
    val r = spark.sql(SqlOps.captureRecapture(SparkDialect)).collect()(0)
    assert((r.getAs[Long]("n1"), r.getAs[Long]("n2"), r.getAs[Long]("m")) ===
      ((n1, n2, m)))
    assert(r.getAs[Long]("est_universe") === est)
    assert(r.getAs[Long]("true_universe") === truth)
    assert(r.getAs[Long]("err_ppm") === errPpm)
    spark.catalog.dropTempView("documents")
  }

  test("levenshtein dedup: planted near-identical prefixes surface with " +
    "exact small distances; past-threshold and cross-block pairs drop") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    // the corpus fixture only ever exercises distance 0 (snapshot
    // copies; its near-dups differ at the TEXT START, past the ≤5
    // gate) — this plants the 1..5 path the shipped artifact can't
    // show. Same source + same length bucket + same first-3 chars
    // keeps all four docs in one block; texts are padded to one
    // 50-char bucket.
    val pad = " " + ("x" * 30)
    val docs = Seq(
      (0L, "alpha beta gamma" + pad, "s0", "en"),   // base
      (1L, "alpha beta gamma" + pad, "s0", "en"),   // exact copy → 0
      (2L, "alpha beta gamme" + pad, "s0", "en"),   // 1 substitution → 1
      (3L, "alpha bXtY gamZa" + pad, "s0", "en"),   // 3 substitutions → 3
      (4L, "alpha zzzz zzzzz" + pad, "s0", "en"),   // 9 subs: same block, gated out
      (5L, "alpha beta gamma" + pad, "s1", "en"))   // other source: other block
    docs.toDF("doc_id", "text", "source", "lang")
      .createOrReplaceTempView("documents")
    // edit_dist arrives as INT (levenshtein's return type) — go
    // through Number, the registry-wide getAs[Long] gotcha
    val got = spark.sql(SqlOps.dedupLevenshtein(SparkDialect)).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Number]("edit_dist").longValue).toMap
    // two-snapshot ids: original d → copies 2d, 2d+1. All originals
    // share one 50-char length bucket and first-3-chars "alp"; s0 is
    // one block, s1 another. Original 4 is in-block but every cross
    // pair exceeds the ≤5 gate, so only its own copy pair (distance
    // 0) survives; original 5's copy pair lives in the s1 block.
    val copies = Map(0L -> Seq(0L, 1L), 1L -> Seq(2L, 3L),
      2L -> Seq(4L, 5L), 3L -> Seq(6L, 7L))
    val wantDist = Map((0L, 0L) -> 0L, (0L, 1L) -> 0L, (1L, 1L) -> 0L,
      (0L, 2L) -> 1L, (1L, 2L) -> 1L, (2L, 2L) -> 0L,
      (0L, 3L) -> 3L, (1L, 3L) -> 3L, (2L, 3L) -> 4L, (3L, 3L) -> 0L)
    val expect = (for {
      ((oa, ob), dd) <- wantDist.toSeq
      a <- copies(oa); b <- copies(ob); if a < b
    } yield (a, b) -> dd).toMap ++ Map((8L, 9L) -> 0L, (10L, 11L) -> 0L)
    assert(got === expect)
    assert(got.values.exists(_ > 0), "the nonzero path must be exercised")
    spark.catalog.dropTempView("documents")
  }

  test("fd audit: a source with one language reads fd_holds=1 — the positive " +
    "path the fixture (where source → lang genuinely fails) never shows") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    val docs = Seq(
      (0L, "a", "mono", "en"), (1L, "b", "mono", "en"), (2L, "c", "mono", "en"),
      (3L, "d", "mixed", "en"), (4L, "e", "mixed", "fr"), (5L, "f", "mixed", "en"))
    docs.toDF("doc_id", "text", "source", "lang")
      .createOrReplaceTempView("documents")
    val got = spark.sql(SqlOps.fdAudit(SparkDialect)).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_langs"), r.getAs[String]("majority_lang"),
          r.getAs[Long]("majority_ppm"), r.getAs[Long]("fd_holds")))).toMap
    assert(got("mono") === ((1L, "en", 1000000L, 1L)))
    assert(got("mixed") === ((2L, "en", 666666L, 0L)))
    spark.catalog.dropTempView("documents")
  }

  test("ivf balance: a centroid that attracts zero vectors is a ROW (n=0), " +
    "not an absence") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    val dim = 64
    def vec(hot: Int): Seq[Float] =
      Seq.tabulate(dim)(i => if (i == hot) 1.0f else 0.0f)
    // labels 0 and 1 are tight unit clusters on axes 0 and 1; label 2's
    // two members sit ON those clusters, so its centroid lands at the
    // midpoint (0.5, 0.5, 0, …) and attracts NOBODY — the dead-capacity
    // cell the groupBy-over-assignments rendering could never see
    val vecs =
      (0L until 10L).map(i => (i, 0, vec(0))) ++
      (10L until 20L).map(i => (i, 1, vec(1))) ++
      Seq((20L, 2, vec(0)), (21L, 2, vec(1)))
    vecs.toDF("vec_id", "label", "embedding").createOrReplaceTempView("embeddings")
    val r = spark.sql(SqlOps.ivfBalance.single(SparkDialect)).collect()(0)
    assert(r.getAs[Long]("n_cells") === 3L, "empty cell must count")
    assert(r.getAs[Long]("n_vectors") === 22L)
    assert(r.getAs[Long]("min_n") === 0L, "empty cell must report n=0")
    assert(r.getAs[Long]("max_n") === 11L)
    // max/mean with the empty cell in the denominator's cell count:
    // 11 / (22/3) = 1.5 → 1_500_000 ppm
    assert(r.getAs[Long]("max_over_mean_ppm") === 1500000L)
    spark.catalog.dropTempView("embeddings")
  }

  test("hubness: SQL skewness equals an independent kNN + moments pass on a planted hub") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    val dim = 64 // nvStage's sign bands read dims 1-64
    // one central vector (all 0.5) plus satellites each bumped on one
    // of 7 rotating dims — every vector is all-positive (one sign-LSH
    // band, so the bucket join sees all pairs) and the center is most
    // satellites' nearest neighbor: a planted hub with positive skew
    val vecs = (0L until 12L).map { i =>
      val v = Array.fill(dim)(0.5f)
      if (i > 0) v((i % 7).toInt + 8) = 0.9f
      (i, v.toSeq)
    }
    vecs.toDF("vec_id", "embedding").createOrReplaceTempView("embeddings")
    val got = spark.sql(SqlOps.annHubness.single(SparkDialect)).collect()(0)

    // ---- independent implementation ----
    val byId = vecs.toMap
    def r6d(x: Double) = r6(x)
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = (0 until dim).map(i => a(i).toDouble * b(i).toDouble).sum
      def nrm(v: Seq[Float]) = math.sqrt((0 until dim).map(i => v(i).toDouble * v(i).toDouble).sum)
      r6d(dot / (nrm(a) * nrm(b)))
    }
    val ids = vecs.map(_._1)
    val top3 = ids.flatMap { q =>
      ids.filter(_ != q).map(t => (t, cos(byId(q), byId(t))))
        .sortBy { case (t, c) => (-c, t) }.take(3).map(_._1)
    }
    val indeg = ids.map(v => v -> top3.count(_ == v).toLong).toMap
    val n = ids.size.toLong
    val s1 = indeg.values.sum
    val s2 = indeg.values.map(d => d * d).sum
    val s3 = indeg.values.map(d => d * d * d).sum
    val m2 = n.toDouble * s2 - s1.toDouble * s1
    val m3 = n.toDouble * n * s3 - 3.0 * n.toDouble * s1 * s2 +
      2.0 * s1.toDouble * s1 * s1
    assert(got.getAs[Long]("n_vectors") === n)
    assert(got.getAs[Long]("total_edges") === s1)
    assert(got.getAs[Long]("max_indegree") === indeg.values.max)
    assert(got.getAs[Long]("antihub_count") === indeg.values.count(_ == 0).toLong)
    assert(got.getAs[Long]("hub_count") === indeg.values.count(_ >= 6).toLong)
    assert(got.getAs[Double]("indegree_skewness") === r6d(m3 / (m2 * math.sqrt(m2))))
    // the plant worked: the center is a hub and skew is decisively positive
    assert(indeg(0L) >= 6L)
    assert(got.getAs[Double]("indegree_skewness") > 0.5)
    spark.catalog.dropTempView("embeddings")
  }

  test("quantization recall: SQL int8 ranking equals an independent codes + cosine replay") {
    graft.functions.GraftFunctions.registerAll(spark)
    val got = graft.SparkEntry.queries("q_ann_quant_recall")(spark, sf001).collect()
      .map(r => r.getAs[Long]("query_id") ->
        (r.getAs[Long]("n_hit"), r.getAs[Double]("recall_at_3"))).toMap

    // ---- independent implementation over the real fixture ----
    val rows = spark.read.parquet(s"$sf001/embeddings.parquet")
      .selectExpr("vec_id", "embedding").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Seq[Float]]("embedding").toArray))
    def nrm(v: Array[Float]) =
      math.sqrt(v.indices.map(i => v(i).toDouble * v(i).toDouble).sum)
    val live = rows.filter { case (_, v) => nrm(v) > 0 }
    val byId = live.toMap
    def cos(a: Array[Float], b: Array[Float]): Double =
      r6(a.indices.map(i => a(i).toDouble * b(i).toDouble).sum / (nrm(a) * nrm(b)))
    def codes(v: Array[Float]): Array[Long] = {
      val mx = v.map(x => math.abs(x.toDouble)).max
      v.map(x => math.floor(x.toDouble * 127.0 / mx + 0.5).toLong)
    }
    val qcodes = live.map { case (id, v) => id -> codes(v) }.toMap
    def qcos(a: Array[Long], b: Array[Long]): Double = {
      val dq = a.indices.map(i => a(i) * b(i)).sum
      dq.toDouble / (math.sqrt(s2(a).toDouble) * math.sqrt(s2(b).toDouble))
    }
    def s2(a: Array[Long]): Long = a.map(c => c * c).sum
    val qids = live.map(_._1).filter(_ < 32)
    val want = qids.map { q =>
      def top3(score: Long => Double) = live.map(_._1).filter(_ != q)
        .map(t => (t, r6(score(t))))
        .sortBy { case (t, c) => (-c, t) }.take(3).map(_._1).toSet
      val ex = top3(t => cos(byId(q), byId(t)))
      val qx = top3(t => qcos(qcodes(q), qcodes(t)))
      val hit = (ex intersect qx).size.toLong
      q -> ((hit, r6(hit.toDouble / 3)))
    }.toMap
    assert(got === want)
    // non-vacuity: the quantizer is good but not perfect everywhere —
    // recall must average high while the audit stays able to see loss
    assert(want.values.map(_._1).sum >= 2 * want.size,
      "int8 quantization should preserve most top-3 neighbors")
  }

  test("multimodal spectrum: 8-point DFT powers equal an independent twiddle replay") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    // ASCII payloads: doc 1 (audio slice, 2 full windows at 500 B),
    // doc 4 (audio, exactly one window at 300 B), doc 7 (audio but
    // under 256 B — excluded), doc 2 (not on the audio slice)
    def payload(n: Int, seed: Int): String =
      (0 until n).map(i => ('A' + ((i * 7 + seed) % 58)).toChar).mkString
    val docs = Seq((1L, payload(500, 3)), (4L, payload(300, 11)),
      (7L, payload(200, 5)), (2L, payload(400, 1)))
    docs.toDF("doc_id", "text").createOrReplaceTempView("documents")
    val got = spark.sql(SqlOps.multimodalSpectrum(SparkDialect)).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("win_no"), r.getAs[Int]("k")) ->
        r.getAs[Long]("power_mu2")).toMap

    // ---- independent implementation ----
    val cosT = Map(0 -> 1000000L, 1 -> 707107L, 2 -> 0L, 3 -> -707107L,
      4 -> -1000000L, 5 -> -707107L, 6 -> 0L, 7 -> 707107L)
    val sinT = Map(0 -> 0L, 1 -> 707107L, 2 -> 1000000L, 3 -> 707107L,
      4 -> 0L, 5 -> -707107L, 6 -> -1000000L, 7 -> -707107L)
    val want = (for {
      (id, t) <- docs; if id % 3 == 1 && t.length >= 256
      win <- 0 to (t.length - 256) / 192
      k <- 0 to 4
    } yield {
      val xs = (0 to 7).map(j => t.charAt(win * 192 + 32 * j).toLong)
      val xr = (0 to 7).map(j => xs(j) * cosT((k * j) % 8)).sum
      val xi = (0 to 7).map(j => xs(j) * sinT((k * j) % 8)).sum
      (id, win, k) -> (xr * xr + xi * xi)
    }).toMap
    assert(got === want)
    // fixture sanity: doc 1 has two full windows, doc 4 one, 7/2 none
    assert(got.keys.map(_._1).toSet === Set(1L, 4L))
    assert(got.keys.count(_._1 == 1L) === 10 && got.keys.count(_._1 == 4L) === 5)
    // DC bin (k = 0) is (Σx·1e6)² — strictly positive on ASCII payloads
    assert(got((1L, 0, 0)) > 0L)
    spark.catalog.dropTempView("documents")
  }

  test("chao1 on planted singletons: the correction term and coverage follow the closed form") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    // the shared fixture has NO singletons (31 types, all frequent) —
    // plant some: 'rare1'..'rare3' once each, 'pair1'/'pair2' twice,
    // 'common' fills the mass. V=6, N1=3, N2=2.
    val docs = Seq(
      (0L, "common common common rare1 pair1"),
      (1L, "common common rare2 pair2 pair1"),
      (2L, "common common rare3 pair2 common"))
    docs.toDF("doc_id", "text").createOrReplaceTempView("documents")
    val r = spark.sql(SqlOps.chao1Richness.single(SparkDialect)).collect()(0)
    val (v, n, n1, n2) = (6L, 15L, 3L, 2L)
    assert(r.getAs[Long]("vocab") === v && r.getAs[Long]("n_tokens") === n)
    assert(r.getAs[Long]("singletons") === n1 && r.getAs[Long]("doubletons") === n2)
    // V + N1(N1−1)/(2(N2+1)) = 6 + 3·2/6 = 7
    assert(r.getAs[Double]("chao1") === 7.0)
    assert(r.getAs[Long]("coverage_ppm") === 1000000L * (n - n1) / n)
    spark.catalog.dropTempView("documents")
  }

  test("link prediction: SQL Adamic-Adar top list equals an independent 2-hop pass") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    // co-purchase fixture: orders as baskets, support >= 2 required —
    // pairs (1,2),(1,3),(2,3),(3,4) each co-ordered twice; (1,4),(2,4)
    // never co-ordered -> predicted through middles with degree 2 or 4
    // (powers of two keep log2 exact in both implementations)
    val baskets = Seq(
      Seq(1L, 2L, 3L), Seq(1L, 2L, 3L),  // clique support 2
      Seq(3L, 4L), Seq(3L, 4L),          // edge (3,4) support 2
      Seq(2L, 5L), Seq(2L, 5L), Seq(1L, 5L), Seq(1L, 5L),
      Seq(4L, 5L), Seq(4L, 5L))
    val rows = baskets.zipWithIndex.flatMap { case (ps, o) =>
      ps.map(p => (o.toLong, p))
    }
    rows.toDF("l_orderkey", "l_partkey").createOrReplaceTempView("lineitem")
    val got = spark.sql(SqlOps.linkPrediction.single(SparkDialect)).collect()
      .map(r => (r.getAs[Long]("part_a"), r.getAs[Long]("part_b"),
        r.getAs[Long]("common_neighbors"), r.getAs[Long]("aa_micro")))

    // ---- independent implementation ----
    val cnt = scala.collection.mutable.Map.empty[(Long, Long), Int]
    baskets.foreach { ps =>
      val s = ps.distinct.sorted
      for (i <- s.indices; j <- (i + 1) until s.size)
        cnt((s(i), s(j))) = cnt.getOrElse((s(i), s(j)), 0) + 1
    }
    val pairs = cnt.filter(_._2 >= 2).keySet.toSet
    val adj = pairs.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val nodes = adj.keySet.toSeq.sorted
    val want = (for {
      a <- nodes; b <- nodes; if a < b && !pairs((a, b))
      common = (adj(a) intersect adj(b)); if common.nonEmpty
    } yield {
      val aa = common.toSeq.map { m =>
        val q = math.floor(math.log(adj(m).size.toDouble) / math.log(2.0) * 1e6 + 0.5).toLong
        1000000000000L / math.max(q, 1000000L)
      }.sum
      (a, b, common.size.toLong, aa)
    }).sortBy { case (a, b, _, aa) => (-aa, a, b) }.take(20)
    assert(got.toSeq === want)
    assert(want.nonEmpty, "fixture must produce predictions")
    spark.catalog.dropTempView("lineitem")
  }

  test("forecast skill: SQL MAEs equal an independent weight-table backtest") {
    import spark.implicits._
    import java.sql.Date
    graft.functions.GraftFunctions.registerAll(spark)
    val base = java.time.LocalDate.of(1995, 5, 1)
    // a noisy-but-mean-reverting series: EWMA should beat persistence
    val ys = Seq(100L, 140L, 95L, 150L, 105L, 138L, 99L, 148L, 102L, 141L,
      97L, 152L, 104L, 139L)
    val rows = ys.zipWithIndex.map { case (y, i) =>
      (Date.valueOf(base.plusDays(i.toLong)), y.toDouble)
    }
    rows.toDF("o_orderdate", "o_totalprice").createOrReplaceTempView("orders")
    val got = spark.sql(SqlOps.forecastSkill.single(SparkDialect)).collect()(0)

    // ---- independent implementation of the truncated normalized EWMA ----
    val alpha = BigDecimal("0.3")
    val wq = (0 to 60).map(k =>
      (alpha * (BigDecimal(1) - alpha).pow(k) * BigDecimal(1000000000000L))
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLongExact)
    def ewmaQ(t: Int): Long = {
      val terms = (0 to math.min(t, 60)).map(k => (ys(t - k) * wq(k)) / 1000000L)
      val sw = (0 to math.min(t, 60)).map(wq).sum
      math.floor(terms.sum.toDouble * 1.0e12 / sw.toDouble + 0.5).toLong
    }
    val idx = ys.indices
    val pairs = idx.drop(1) // days with both a forecast (lag ewma) and y_prev
    val aeEwma = pairs.map(t => math.abs(ys(t) * 1000000L - ewmaQ(t - 1))).sum
    val aeNaive = pairs.map(t => math.abs(ys(t) - ys(t - 1)) * 1000000L).sum
    val n = pairs.size.toLong
    assert(got.getAs[Long]("n_days") === n)
    assert(got.getAs[Double]("mae_ewma") === r6(aeEwma.toDouble / 1.0e6 / n))
    assert(got.getAs[Double]("mae_naive") === r6(aeNaive.toDouble / 1.0e6 / n))
    assert(got.getAs[Double]("skill") === r6(1.0 - aeEwma.toDouble / aeNaive))
    // sanity: on an oscillating series the smoother must beat persistence
    assert(got.getAs[Double]("skill") > 0.0)
    spark.catalog.dropTempView("orders")
  }

  test("deseasonalized anomaly gate: a day abnormal FOR ITS WEEKDAY flags; " +
    "ordinary weekend peaks do not") {
    import spark.implicits._
    import java.sql.Date
    graft.functions.GraftFunctions.registerAll(spark)
    val base = java.time.LocalDate.of(1996, 9, 2) // a Monday
    def dow(d: java.time.LocalDate): Int = ((d.toEpochDay + 4) % 7).toInt
    // 16 weeks of 3x-Saturday seasonality with small deterministic
    // noise (the noise keeps MAD realistically nonzero — a noiseless
    // fixture has MAD = 0 and the floored threshold flags EVERY
    // deviation, including the index contamination the spike itself
    // causes on its weekday siblings), plus one mid-week spike in
    // week 5 — 1.5x its weekday level, abnormal FOR A WEDNESDAY but
    // far below an ordinary Saturday
    val rows = (0 until 112).map { i =>
      val dt = base.plusDays(i.toLong)
      val noise = (i * 3) % 9 - 4 // deterministic, range -4..4
      val lvl = (if (dow(dt) == 6) 300 else 100) + noise
      val y = if (i == 30) 150.0 else lvl.toDouble // day 30 is a Wednesday
      (Date.valueOf(dt), y)
    }
    assert(dow(base.plusDays(30L)) === 3, "fixture: day 30 must be a Wednesday")
    rows.toDF("o_orderdate", "o_totalprice").createOrReplaceTempView("orders")
    val got = spark.sql(SqlOps.anomalyDeseasonal(SparkDialect)).collect()
      .map(r => r.getAs[Long]("day") -> r.getAs[Int]("is_anomaly")).toMap
    val flagged = got.filter(_._2 == 1).keySet
    assert(flagged === Set(base.plusDays(30L).toEpochDay),
      "exactly the planted mid-week spike must flag")
    // raw Saturdays (3x level) stay quiet — the whole point of the gate
    val saturdays = (0 until 112).map(i => base.plusDays(i.toLong))
      .filter(dow(_) == 6).map(_.toEpochDay)
    assert(saturdays.forall(got(_) == 0))
    spark.catalog.dropTempView("orders")
  }

  test("PMI spectral embedding: the dominant component concentrates on the " +
    "tightly-ASSOCIATED rare pair, not the frequent block") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    // two disjoint token communities: {p,q,r} is FREQUENT (high
    // marginals → low PMI: their co-occurrence is what frequency
    // alone predicts), {x,y} is rare but perfectly associated (every
    // occurrence is together → PMI ≈ log2 of the corpus mass). PPMI
    // measures association, not volume — the dominant eigenvector
    // must live on the rare tight pair. This is exactly the property
    // that makes PMI the collocation statistic (the bigramPmi test's
    // "new york beats the cat" assertion, at the spectral level).
    val docs = Seq(
      (0L, "p q r p q r p q r p q r p q r p"),
      (1L, "q p r q p r q p r q p r q"),
      (2L, "x y x"))
    docs.toDF("doc_id", "text").createOrReplaceTempView("documents")
    val got = spark.sql(SqlOps.pmiSpectral.single(SparkDialect)).collect()
      .map(r => r.getAs[String]("token") -> math.abs(r.getAs[Double]("component")))
      .toMap
    assert(got.keySet === Set("p", "q", "r", "x", "y"))
    val associated = Seq("x", "y").map(got)
    val frequent = Seq("p", "q", "r").map(got)
    assert(associated.min > 0.1,
      s"the associated pair must carry the component: $associated")
    assert(frequent.max < associated.min / 10.0,
      s"the frequent block must be near zero: $frequent")
    spark.catalog.dropTempView("documents")
  }

  test("WAU/MAU stickiness: SQL ratio equals an independent distinct-count pass") {
    import spark.implicits._
    import java.sql.Timestamp
    graft.functions.GraftFunctions.registerAll(spark)
    // two weeks inside March, plus a MONTH-STRADDLING week (Mar 31 is
    // a Sunday; Apr 1-2 land in the same epoch-day-DIV-7 week) — the
    // review-caught case: each month slice of that week must be
    // ratio'd against its OWN month's MAU, never the other's
    val rows = Seq(
      (1L, "2024-03-04", 10L), (2L, "2024-03-05", 11L), (3L, "2024-03-06", 12L),
      (4L, "2024-03-11", 10L), (5L, "2024-03-12", 13L),
      (6L, "2024-03-13", 10L), // dup user in week 2
      (7L, "2024-03-31", 10L), // straddling week, March side
      (8L, "2024-04-01", 20L), (9L, "2024-04-02", 21L)) // April side
      .map { case (id, d, u) => (id, Timestamp.valueOf(s"$d 12:00:00"), u, "view") }
    rows.toDF("event_id", "ts", "user_id", "event_type")
      .createOrReplaceTempView("events")
    val got = spark.sql(SqlOps.dauMauStickiness(SparkDialect)).collect()
      .map(r => (r.getAs[Long]("week"), r.getAs[Int]("month_key")) ->
        (r.getAs[Long]("wau"), r.getAs[Long]("mau"),
          r.getAs[Long]("stickiness_ppm"))).toMap

    // ---- independent implementation ----
    val ev = rows.map { case (_, ts, u, _) =>
      val ld = ts.toLocalDateTime.toLocalDate
      (ld.toEpochDay / 7, ld.getYear * 12 + ld.getMonthValue - 1, u)
    }
    val mau = ev.groupBy(_._2).map { case (m, xs) => m -> xs.map(_._3).distinct.size.toLong }
    val want = ev.groupBy(e => (e._1, e._2)).map { case ((wk, m), xs) =>
      val wau = xs.map(_._3).distinct.size.toLong
      (wk, m.toInt) -> (wau, mau(m), 1000000L * wau / mau(m))
    }
    assert(got === want)
    // the straddling week yields one row per month, and every ratio
    // stays a genuine fraction
    val straddleWk = java.time.LocalDate.of(2024, 3, 31).toEpochDay / 7
    assert(got.keys.count(_._1 == straddleWk) === 2)
    assert(got.values.forall(_._3 <= 1000000L))
    spark.catalog.dropTempView("events")
  }

  test("power analysis: SQL sample size equals the independent two-proportion formula") {
    import spark.implicits._
    import java.sql.Timestamp
    graft.functions.GraftFunctions.registerAll(spark)
    // 1000 events, 200 purchases -> p1 = 0.2
    val rows = (0 until 1000).map { i =>
      (i.toLong, Timestamp.valueOf("2024-01-05 09:00:00"), (i % 50).toLong,
        if (i % 5 == 0) "purchase" else "view")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type")
      .createOrReplaceTempView("events")
    val got = spark.sql(SqlOps.powerAnalysis(SparkDialect)).collect()(0)
    assert(got.getAs[Long]("n_events") === 1000L)
    assert(got.getAs[Long]("p1_ppm") === 200000L)
    // ---- independent implementation ----
    val p1 = 0.2; val p2 = p1 * 1.1; val pbar = (p1 + p2) / 2
    val num = 1.96 * math.sqrt(2 * pbar * (1 - pbar)) +
      0.8416 * math.sqrt(p1 * (1 - p1) + p2 * (1 - p2))
    val n = math.ceil(num * num / ((p2 - p1) * (p2 - p1))).toLong
    assert(got.getAs[Long]("n_per_arm") === n)
    // textbook ballpark for p=0.2, 10% relative MDE, 80% power
    assert(n > 5000 && n < 9000, s"sanity: $n")
    spark.catalog.dropTempView("events")
  }

  test("label noise: confidently-English non-en docs (and vice versa) are the suspects") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    // en-labeled docs rich in en stopwords except one (suspect #1);
    // de-labeled docs free of them except one drenched in 'the'
    // (suspect #2)
    val docs = Seq(
      (0L, "en", "the cat is in the house and the dog is of note"),
      (1L, "en", "the sun and the moon is to rise in a sky"),
      (2L, "en", "blauer himmel ohne worte"), // mislabeled: no en signal
      (3L, "de", "der schnelle braune fuchs springt"),
      (4L, "de", "ein stiller morgen im wald"),
      (5L, "de", "the the the the the the")) // mislabeled: pure en signal
    docs.toDF("doc_id", "lang", "text").createOrReplaceTempView("documents")
    val got = spark.sql(SqlOps.labelNoise(SparkDialect)).collect()
      .map(r => r.getAs[String]("label") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_suspect"),
          r.getAs[Long]("suspect_ppm"))).toMap

    // ---- independent implementation ----
    val stopEn = Set("the", "and", "of", "to", "in", "is", "a")
    def sMu(text: String): Long = {
      val t = text.split(" ", -1)
      1000000L * t.count(stopEn) / math.max(t.length, 1)
    }
    val sc = docs.map { case (_, l, t) =>
      (if (l == "en") "en" else "non_en", sMu(t))
    }
    val mean = sc.groupBy(_._1).map { case (l, xs) =>
      l -> xs.map(_._2).sum / xs.size
    }
    val wantSus = Map(
      "en" -> sc.count { case (l, s) => l == "en" && s <= mean("non_en") }.toLong,
      "non_en" -> sc.count { case (l, s) => l == "non_en" && s >= mean("en") }.toLong)
    Seq("en", "non_en").foreach { l =>
      val n = sc.count(_._1 == l).toLong
      assert(got(l) === ((n, wantSus(l), 1000000L * wantSus(l) / n)), s"class $l")
    }
    // the two planted mislabels are exactly the suspects
    assert(wantSus("en") === 1L && wantSus("non_en") === 1L)
    spark.catalog.dropTempView("documents")
  }

  test("winnowing: SQL fingerprint pairs equal an independent MOSS pass; " +
    "the w+k-1 guarantee holds on a planted shared run") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    // docs 0 and 1 share an 8-token run (= w+k-1 with k=5, w=4: the
    // guarantee threshold); doc 2 is disjoint
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (0L, s"one two $shared three four"),
      (1L, s"nine ten $shared eleven"),
      (2L, "red green blue yellow purple orange pink brown black white"))
    docs.toDF("doc_id", "text").createOrReplaceTempView("documents")
    val got = spark.sql(SqlOps.dedupWinnow.single(SparkDialect)).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("n_shared")))

    // ---- independent implementation ----
    def hex32(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(8), 16)
    }
    // the SQL runs over the two-snapshot corpus (ids 2d, 2d+1)
    val corpus = docs.flatMap { case (id, t) => Seq((id * 2, t), (id * 2 + 1, t)) }
    val fps = corpus.map { case (id, t) =>
      val toks = t.split(" ", -1)
      val hs = toks.sliding(5).map(w => hex32(w.mkString(" "))).toVector
      // FULL w-length windows only — canonical winnowing never selects
      // from a truncated trailing frame (docs with < w k-grams emit
      // nothing: the below-guarantee region)
      id -> (0 to hs.size - 4).map(i => hs.slice(i, i + 4).min).toSet
    }.toMap
    val want = (for {
      a <- corpus.map(_._1); b <- corpus.map(_._1); if a < b
      // evidence floor ≥ 1: one shared fingerprint is the minimum the
      // w+k−1 guarantee produces for a threshold-length shared run
      n = (fps(a) intersect fps(b)).size; if n >= 1
    } yield (a, b, n.toLong))
      .sortBy { case (a, b, n) => (-n, a, b) }.take(50)
    assert(got.toSeq === want)
    // the guarantee: the planted 8-token run forces a shared
    // fingerprint between docs 0 and 1 (snapshot ids 0/2)
    assert((fps(0L) intersect fps(2L)).nonEmpty)
    // disjoint docs share nothing with anyone
    assert(got.forall { case (a, b, _) => a / 2 != 2L || b / 2 != 2L ||
      (a / 2 == 2L && b / 2 == 2L) })
    spark.catalog.dropTempView("documents")
  }

  test("cramers V: SQL equals an independent chi-square pass; perfect association scores 1") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    // mixed association: sources lean on different langs but overlap
    val docs = Seq.fill(8)(("s0", "en")) ++ Seq.fill(2)(("s0", "de")) ++
      Seq.fill(3)(("s1", "en")) ++ Seq.fill(7)(("s1", "de")) ++
      Seq.fill(5)(("s2", "zh"))
    docs.zipWithIndex.map { case ((s, l), i) => (i.toLong, s, l) }
      .toDF("doc_id", "source", "lang").createOrReplaceTempView("documents")
    val got = spark.sql(SqlOps.cramersV(SparkDialect)).collect()(0)

    // ---- independent implementation (FULL grid — zero cells count) ----
    val cells = docs.groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
    val rt = docs.groupBy(_._1).map { case (k, xs) => k -> xs.size.toLong }
    val ct = docs.groupBy(_._2).map { case (k, xs) => k -> xs.size.toLong }
    val n = docs.size.toLong
    // keys.toSeq, NOT keys: a for-comprehension over key SETS yields a
    // Set and silently dedups equal cell terms (two identical
    // zero-cell contributions collapsed to one — the groupBy-Map
    // re-keying gotcha in its for-comprehension costume)
    val chi2q = (for (s <- rt.keys.toSeq; l <- ct.keys.toSeq) yield {
      val o = cells.getOrElse((s, l), 0L)
      val e = rt(s).toDouble * ct(l) / n
      math.floor((o - e) * (o - e) / e * 1e6 + 0.5).toLong
    }).sum
    val chi2 = chi2q.toDouble / 1e6
    val v = math.sqrt(chi2 / (n.toDouble * math.min(rt.size - 1, ct.size - 1)))
    assert(got.getAs[Long]("n_docs") === n)
    assert(got.getAs[Double]("chi2") === r6(chi2))
    assert(got.getAs[Double]("cramers_v") === r6(v))

    // perfect association: every source has exactly one language
    Seq.tabulate(9)(i => (i.toLong, s"s${i % 3}", s"l${i % 3}"))
      .toDF("doc_id", "source", "lang").createOrReplaceTempView("documents")
    val perfect = spark.sql(SqlOps.cramersV(SparkDialect)).collect()(0)
    assert(perfect.getAs[Double]("cramers_v") === 1.0)
    spark.catalog.dropTempView("documents")
  }

  test("textrank: symmetric cycle ranks equal; star corpus ranks the hub first") {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    // 3-cycle with equalized adjacency counts (p q r p q r p → each
    // ordered pair appears exactly twice) — by symmetry all ranks equal
    Seq((0L, "p q r p q r p q r p"))
      .toDF("doc_id", "text").createOrReplaceTempView("documents")
    val cyc = spark.sql(SqlOps.textrankKeywords.single(SparkDialect)).collect()
    assert(cyc.length === 3)
    assert(cyc.map(_.getAs[Long]("rank_ppm")).distinct.length === 1,
      "symmetric cycle must produce identical ranks")

    // star: the hub co-occurs with every leaf; leaves only with the hub
    Seq((0L, "hub aa hub bb hub cc hub dd hub ee"))
      .toDF("doc_id", "text").createOrReplaceTempView("documents")
    val star = spark.sql(SqlOps.textrankKeywords.single(SparkDialect)).collect()
    assert(star.head.getAs[String]("token") === "hub")
    assert(star.length === 6)
    // hub strength = sum of all leaf strengths (every edge touches it)
    assert(star.head.getAs[Long]("strength") ===
      star.tail.map(_.getAs[Long]("strength")).sum)
    spark.catalog.dropTempView("documents")
  }
}
