package graft.etl

import graft.SparkSpec
import org.scalacheck.Gen
import org.apache.spark.sql.functions._

/** Property tests from SURVEY.md §5: price round-trip per unit, dedup
  * idempotence, merge idempotence, rolling-hash determinism.
  * (ScalaCheck `Gen` drives the sampling; samples are batched into one
  * Spark job per property instead of a job per sample.) */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def rawWithPrices(prices: Seq[String]) =
    prices.zipWithIndex.map { case (p, i) => (i.toLong, s"l$i", p) }
      .toDF("ingest_order", "link", "price_rp")
      .withColumn("name", lit("n")).withColumn("location", lit(""))
      .withColumn("lot_size", lit(null).cast("string"))
      .withColumn("building_size", lit(null).cast("string"))
      .withColumn("n_bedroom", lit(null).cast("string"))
      .withColumn("n_bathroom", lit(null).cast("string"))
      .withColumn("n_carport", lit(null).cast("string"))
      .withColumn("badge", lit("XCarport"))
      .withColumn("ads_type", lit("jual")).withColumn("property_type", lit("rumah"))

  test("price round-trip: format(n, unit) parses back to n × unit") {
    val units = Seq(("Miliar", 1_000_000_000L), ("Juta", 1_000_000L),
      ("Ribu", 1_000L), ("Triliun", 1_000_000_000_000L))
    val gen = for {
      n <- Gen.choose(1, 999)
      u <- Gen.oneOf(units)
    } yield (n, u)
    // batch the property samples into ONE Spark job per check run
    val samples = (1 to 40).flatMap(_ => gen.sample)
    val df = rawWithPrices(samples.map { case (n, (u, _)) => s"Rp $n $u" })
    val got = Transform.transform(df).orderBy("ingest_order")
      .select("price_rp").collect().map(_.getLong(0))
    samples.zip(got).foreach { case ((n, (_, mult)), actual) =>
      assert(actual === n * mult)
    }
  }

  test("price decimal-comma round-trip: 'x,y Miliar'") {
    val samples = for (x <- 1 to 9; y <- 0 to 9) yield (x, y)
    val df = rawWithPrices(samples.map { case (x, y) => s"Rp $x,$y Miliar" })
    val got = Transform.transform(df).orderBy("ingest_order")
      .select("price_rp").collect().map(_.getLong(0))
    samples.zip(got).foreach { case ((x, y), actual) =>
      assert(actual === x * 1_000_000_000L + y * 100_000_000L)
    }
  }

  test("dedup is idempotent") {
    val raw = Listings.raw(spark, sf001)
    val once = Transform.dedupKeepFirst(Transform.dropNullKeys(raw))
    val twice = Transform.dedupKeepFirst(once)
    assert(twice.exceptAll(once).isEmpty && once.exceptAll(twice).isEmpty)
  }

  test("merge is associative over batches: merge(merge(m,s1),s2) == sequential loads") {
    val m  = Seq(("a", 1L), ("b", 2L)).toDF("link", "v")
    val s1 = Seq(("b", 3L), ("c", 4L)).toDF("link", "v")
    val s2 = Seq(("c", 5L), ("d", 6L)).toDF("link", "v")
    val seq = Load.merge(Load.merge(m, s1, "link"), s2, "link")
    val expect = Set(("a", 1L), ("b", 3L), ("c", 5L), ("d", 6L))
    assert(seq.collect().map(r => (r.getString(0), r.getLong(1))).toSet === expect)
  }

  test("rolling hash: deterministic, bounded, order-sensitive") {
    val strs = (1 to 200).flatMap(_ => Gen.alphaNumStr.sample)
    strs.foreach { a =>
      val h = graft.functions.RollingHash.hash(a)
      assert(h === graft.functions.RollingHash.hash(a))
      assert(h >= 0 && h < graft.functions.RollingHash.Mod)
    }
    assert(graft.functions.RollingHash.hash("ab") !==
           graft.functions.RollingHash.hash("ba"))
  }
}
