package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Nearest-centroid (IVF cell) assignment as a native Catalyst
  * expression: `graft_nearest_centroid(embedding, cents)` where
  * `embedding` is the row's `array<float>` vector and `cents` is a
  * broadcast-sized `array<struct<label:int, qcs:array<bigint>>>` of
  * µ-quantized centroids (one value for the whole table, attached via
  * a 1-row cross join — a broadcast nested-loop join, so the big side
  * is never shuffled and assignment is a narrow projection).
  *
  * Arithmetic parity with the relational (oracle) form: each component
  * quantizes to ⌊v·1e6 + ½⌋ as int64, the distance is Σ(qv−qc)² in
  * int64 (max ~1.6e15 × 64 dims ≈ 1e17 < 2⁶³), and ties break to the
  * smallest label — exact, order-independent, identical across engines
  * regardless of the order `collect_list` packed the centroids in.
  *
  * Replaces the posexplode + per-(vector,label) groupBy assignment,
  * which shuffled N×labels partial-distance rows; this evaluates
  * inside whole-stage codegen via a static call (the
  * [[DotProduct]] pattern).
  */
case class NearestCentroid(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult = {
    val embOk = left.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    val centsOk = right.dataType match {
      case ArrayType(StructType(Array(f0, f1)), _) =>
        f0.dataType == IntegerType && (f1.dataType match {
          case ArrayType(LongType, _) => true
          case _ => false
        })
      case _ => false
    }
    if (embOk && centsOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_nearest_centroid needs (array<float>, array<struct<int, array<bigint>>>), " +
        s"got (${left.dataType}, ${right.dataType})")
  }

  // nullable beyond the children: an EMPTY embedding assigns to no
  // cell (null), mirroring the relational form where zero exploded
  // component rows produce no distance row and the vector drops out
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    NearestCentroid.nearest(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""java.lang.Integer ${ev.value}_r = graft.functions.NearestCentroid.nearest($a, $b);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r.intValue(); }
         |""".stripMargin)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): NearestCentroid =
    copy(left = l, right = r)
}

object NearestCentroid {
  /** Static so generated code calls it directly. Quantizes the vector
    * once, then a tight primitive loop per centroid; argmin with
    * smallest-label tie-break (order-independent). Returns null (no
    * cell) for an empty vector, an empty centroid table, or a centroid
    * whose dimensionality differs from the vector's — parity with the
    * relational rendering, where each of those produces no complete
    * distance row and the vector drops out (the expression is
    * registered session-wide, so a pure-SQL caller can hit all three;
    * before the guards, an empty table returned Int.MaxValue as a
    * "cell" and a short centroid silently scored a prefix distance). */
  def nearest(emb: ArrayData, cents: ArrayData): java.lang.Integer = {
    val n = emb.numElements()
    if (n == 0) return null
    val q = new Array[Long](n)
    var i = 0
    while (i < n) {
      q(i) = math.floor(emb.getFloat(i).toDouble * 1.0e6 + 0.5).toLong
      i += 1
    }
    var bestD = Long.MaxValue
    var bestL = Int.MaxValue
    var found = false
    var c = 0
    val m = cents.numElements()
    while (c < m) {
      val row = cents.getStruct(c, 2)
      val label = row.getInt(0)
      val qcs = row.getArray(1)
      if (qcs.numElements() == n) {
        found = true
        var d = 0L
        var j = 0
        while (j < n) {
          val diff = q(j) - qcs.getLong(j)
          d += diff * diff
          j += 1
        }
        if (d < bestD || (d == bestD && label < bestL)) {
          bestD = d
          bestL = label
        }
      }
      c += 1
    }
    if (found) bestL else null
  }
}
