package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RollingHashSpec extends SparkSpec {
  import spark.implicits._

  test("matches the reference fold on known values") {
    // h("ab") = (0*31+97)*31+98 mod 1e9+7 = 97*31+98
    assert(RollingHash.hash("ab") === 97L * 31 + 98)
    assert(RollingHash.hash("") === 0L)
  }

  test("expression evaluates under codegen and handles NULL") {
    RollingHash.register(spark)
    val out = Seq(Some("abc"), None, Some("")).toDF("s")
      .selectExpr("rolling_hash(s) AS h").collect()
    assert(out(0).getLong(0) === RollingHash.hash("abc"))
    assert(out(1).isNullAt(0))
    assert(out(2).getLong(0) === 0L)
  }

  test("whole-stage codegen result equals interpreted eval") {
    RollingHash.register(spark)
    val texts = graft.Tables.documents(spark, sf001).select("doc_id", "text")
    val viaExpr = texts.selectExpr("doc_id", "rolling_hash(text) AS h")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    texts.collect().foreach { r =>
      assert(viaExpr(r.getLong(0)) === RollingHash.hash(r.getString(1)))
    }
  }

  test("stays within [0, mod)") {
    val big = "z" * 10000
    val h = RollingHash.hash(big)
    assert(h >= 0 && h < RollingHash.Mod)
  }
}
