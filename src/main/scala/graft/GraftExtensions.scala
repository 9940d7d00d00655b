package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CmsEst, CountMinAgg, DotProduct, Md5Prefix32, MisraGriesAgg, NearestCentroid, RollingHash, SimHashAgg, WordShingles}

/** Session-extensions entry point: the production way to ship the
  * engine's custom expressions with a cluster instead of per-session
  * `createOrReplaceTempFunction` calls —
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * registers every graft function (`graft_dot`,
  * `graft_nearest_centroid`, `rolling_hash`, `word_shingles`,
  * `md5_prefix32`, `simhash_agg`) at session build
  * time, on every session of the cluster, including pure-SQL users.
  * (`GraftFunctions.registerAll` remains for programmatic use on an
  * already-built session — both paths bind the same expressions.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "scala_udf")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - float-vector dot product, codegen'd"),
      (es: Seq[Expression]) => DotProduct(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("graft_nearest_centroid"),
      info("graft_nearest_centroid",
        "graft_nearest_centroid(embedding, cents) - IVF cell argmin over packed centroids"),
      (es: Seq[Expression]) => NearestCentroid(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("rolling_hash"),
      info("rolling_hash", "rolling_hash(s) - polynomial rolling hash mod 1e9+7"),
      (es: Seq[Expression]) => RollingHash(es.head)))
    ext.injectFunction((FunctionIdentifier("word_shingles"),
      info("word_shingles", "word_shingles(text, n) - word n-gram array"),
      (es: Seq[Expression]) => WordShingles(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("md5_prefix32"),
      info("md5_prefix32", "md5_prefix32(s) - first 32 bits of md5 as unsigned long"),
      (es: Seq[Expression]) => Md5Prefix32(es.head)))
    // the RAW AggregateFunction, not a pre-wrapped AggregateExpression:
    // the analyzer wraps it itself, which is what makes DISTINCT and
    // FILTER clauses resolve (a pre-wrapped expression rejects them)
    ext.injectFunction((FunctionIdentifier("simhash_agg"),
      info("simhash_agg", "simhash_agg(token) - 32-bit SimHash digest aggregate"),
      (es: Seq[Expression]) => SimHashAgg(es.head)))
    // Catalyst's runtime-filter bloom sketch exposed to SQL (paired
    // with GraftFunctions.registerAll — both paths bind the same
    // expressions)
    ext.injectFunction((FunctionIdentifier("bloom_filter_agg"),
      info("bloom_filter_agg",
        "bloom_filter_agg(xxhash64(x)[, est_items[, num_bits]]) - bloom filter over a group"),
      (es: Seq[Expression]) => es match {
        case Seq(c)       => new expressions.aggregate.BloomFilterAggregate(c)
        case Seq(c, n)    => new expressions.aggregate.BloomFilterAggregate(c, n)
        case Seq(c, n, b) => new expressions.aggregate.BloomFilterAggregate(c, n, b)
        case _ => throw new IllegalArgumentException(
          s"bloom_filter_agg takes 1-3 arguments, got ${es.size}")
      }))
    ext.injectFunction((FunctionIdentifier("might_contain"),
      info("might_contain", "might_contain(bloom, xxhash64(x)) - bloom membership probe"),
      (es: Seq[Expression]) => expressions.BloomFilterMightContain(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("mg_topk"),
      info("mg_topk", "mg_topk(key, k) - Misra-Gries k-slot heavy-hitter summary"),
      (es: Seq[Expression]) => MisraGriesAgg(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("cms_sketch"),
      info("cms_sketch", "cms_sketch(key, w, d) - count-min sketch ([d, w, counters...])"),
      (es: Seq[Expression]) => CountMinAgg(es(0), es(1), es(2))))
    ext.injectFunction((FunctionIdentifier("cms_est"),
      info("cms_est", "cms_est(sketch, key) - count-min point-frequency estimate"),
      (es: Seq[Expression]) => CmsEst(es(0), es(1))))
  }
}
