package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k aggregator: keeps the k largest (value, id) pairs per
  * group with a bounded buffer — the `Aggregator[IN, BUF, OUT]` shape
  * for custom aggregation state (SURVEY.md §2.10).
  *
  * Scale rationale vs a window `row_number`: the window form shuffles
  * every row to its group's partition and sorts; this aggregator keeps
  * only k entries per group in the partial-aggregate buffer, so the
  * shuffle carries at most k rows per group per map task. For top-k
  * over high-cardinality fact tables that is the difference between
  * shuffling the table and shuffling ~k×groups rows.
  *
  * Ties break toward the smaller id (deterministic output).
  */
class TopK(k: Int) extends Aggregator[(Long, Double), Seq[(Long, Double)], Seq[(Long, Double)]] {

  private def keep(buf: Seq[(Long, Double)]): Seq[(Long, Double)] =
    buf.sortBy { case (id, v) => (-v, id) }.take(k)

  override def zero: Seq[(Long, Double)] = Seq.empty
  // `keep` maintains the buffer sorted (value desc, id asc), so
  // buf.last is the weakest kept entry: a full buffer rejects a losing
  // row in O(1) instead of re-sorting the whole buffer per input row —
  // on a high-cardinality fact table almost every row loses, so the
  // partial-aggregate pass stays scan-bound
  override def reduce(buf: Seq[(Long, Double)], in: (Long, Double)): Seq[(Long, Double)] =
    if (buf.size >= k && {
      val (lastId, lastV) = buf.last
      in._2 < lastV || (in._2 == lastV && in._1 > lastId)
    }) buf
    else keep(buf :+ in)
  override def merge(a: Seq[(Long, Double)], b: Seq[(Long, Double)]): Seq[(Long, Double)] =
    keep(a ++ b)
  override def finish(buf: Seq[(Long, Double)]): Seq[(Long, Double)] = keep(buf)

  override def bufferEncoder: Encoder[Seq[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double)]]()
  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double)]]()
}
