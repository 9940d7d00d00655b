package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{aggregate, BinaryExpression, BloomFilterMightContain, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Float-vector dot product as a native Catalyst expression.
  *
  * Semantically identical to the higher-order-function form
  * `aggregate(zip_with(a, b, (x,y) -> double(x)*double(y)), 0d, +)` —
  * each float is widened to double, products summed in element order,
  * so oracle values are bit-identical — but HOF lambdas evaluate
  * interpreted per element with boxing; this compiles to a tight
  * primitive loop over the columnar ArrayData (`getFloat(i)`), inlined
  * into whole-stage codegen via a static call. The similarity-search
  * family (knn, sign-LSH, IVF, cosine near-dup) runs millions of these
  * per query at scale.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot needs two array<float> arguments, got (${left.dataType}, ${right.dataType})")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.DotProduct.dot($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

object DotProduct {
  /** Static so generated code calls it directly. Sums in element order
    * (parity with the fold the oracle computes). */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0d
    var i = 0
    while (i < n) {
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }
}

/** Session registration for all graft custom functions. */
object GraftFunctions {
  def registerAll(spark: SparkSession): Unit = {
    RollingHash.register(spark)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => DotProduct(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_nearest_centroid", exprs => NearestCentroid(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_shingles", exprs => WordShingles(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "md5_prefix32", exprs => Md5Prefix32(exprs.head), "scala_udf")
    // raw AggregateFunction: the analyzer wraps it, so DISTINCT/FILTER
    // clauses resolve instead of failing on a pre-wrapped expression
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash_agg", exprs => SimHashAgg(exprs.head), "scala_udf")
    // mergeable Misra-Gries heavy-hitter summary (gate-only — see the
    // class doc for why its raw output must never be a query result)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "mg_topk", exprs => MisraGriesAgg(exprs(0), exprs(1)), "scala_udf")
    // mergeable count-min sketch + its point-frequency estimator
    // (deterministic content — safe as a gate; estimates still
    // overcount, so exact verify remains the output path)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cms_sketch", exprs => CountMinAgg(exprs(0), exprs(1), exprs(2)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cms_est", exprs => CmsEst(exprs(0), exprs(1)), "scala_udf")
    // Spark's runtime-filter bloom sketch, exposed as SQL for the
    // bloom-gated decontamination op (Catalyst ships the expressions
    // but registers no SQL names for them)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_filter_agg", {
        case Seq(c)       => new aggregate.BloomFilterAggregate(c)
        case Seq(c, n)    => new aggregate.BloomFilterAggregate(c, n)
        case Seq(c, n, b) => new aggregate.BloomFilterAggregate(c, n, b)
        case exprs => throw new IllegalArgumentException(
          s"bloom_filter_agg takes 1-3 arguments, got ${exprs.size}")
      }, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "might_contain", exprs => BloomFilterMightContain(exprs(0), exprs(1)), "scala_udf")
  }
}
