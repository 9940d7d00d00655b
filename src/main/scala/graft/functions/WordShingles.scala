package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingle generation as a native Catalyst expression:
  * `word_shingles(text, n)` = the space-joined n-grams of
  * `split(text, ' ')`, in document order.
  *
  * Semantically identical to the relational form (posexplode the token
  * array, LEAD(n-1) window per document, drop tail rows) — which is
  * what the DuckDB oracle still computes — but that form forces a
  * shuffle+sort on (doc_id, pos) just to see adjacent tokens. This
  * expression produces the shingle array in one codegen'd pass over the
  * text, so shingling becomes a narrow projection: no window, no extra
  * exchange, and at 100 TB the shingle index build stays an
  * embarrassingly parallel scan→explode→distinct.
  */
case class WordShingles(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType || right.dataType != IntegerType || !right.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"word_shingles needs (string, literal int), got (${left.dataType}, ${right.dataType})")
    else right.eval() match {
      case n: Integer if n >= 1 => TypeCheckResult.TypeCheckSuccess
      case n => TypeCheckResult.TypeCheckFailure(
        s"word_shingles needs n >= 1, got $n")
    }

  override def nullSafeEval(text: Any, n: Any): Any =
    WordShingles.shingles(text.asInstanceOf[UTF8String], n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, n) => s"graft.functions.WordShingles.shingles($t, $n)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): WordShingles =
    copy(left = l, right = r)
}

object WordShingles {
  /** Static so generated code calls it directly. Tokenization matches
    * `split(text, ' ')` exactly (trailing empty tokens kept), so the
    * output matches the oracle's explode+LEAD rendering row for row. */
  def shingles(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val m = toks.length - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      val sb = new java.lang.StringBuilder(toks(i))
      var j = 1
      while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  def apply(child: Expression, n: Int): WordShingles =
    WordShingles(child, Literal(n))
}
