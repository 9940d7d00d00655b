package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Misra-Gries k-slot heavy-hitter summary over int64 keys, as a
  * mergeable custom aggregate: `mg_topk(key, k)`.
  *
  * Semantics (Misra & Gries 1982; merge rule from Agarwal et al.,
  * "Mergeable Summaries", PODS 2012):
  *  - update: a tracked key increments its counter; an untracked key
  *    takes a free slot, or — when all k slots are busy — every
  *    counter pays 1 and zeroed slots are evicted (the arriving key is
  *    NOT stored).
  *  - merge: counters add; if more than k keys survive, the (k+1)-th
  *    largest count is subtracted from every counter and non-positive
  *    slots drop.
  *
  * Guarantee carried by both rules: a key's estimate undercounts its
  * true frequency by at most N/(k+1) of the total weight N, so ANY key
  * with true share > 1/(k+1) is guaranteed present in the summary —
  * which is what lets a query use the sketch as a result-invisible
  * candidate gate before an exact count (the [[graft.ops.SqlOps]]
  * heavy-hitters op; same pattern as the bloom-gated decontamination).
  *
  * The summary CONTENT (estimates, marginal keys) depends on partition
  * layout and merge order — only the retained-above-threshold property
  * is deterministic, so the sketch must never be a query's output.
  * State is O(k); partials are map-side combined and serialize to
  * 16·size+4 bytes.
  */
case class MisraGriesAgg(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[Long, Long]]
  with BinaryLike[Expression] {

  /** Slot budget: a foldable literal, like bloom_filter_agg's sizes. */
  private lazy val k: Int = {
    val v = right.eval().asInstanceOf[Number].intValue
    require(v > 0, s"mg_topk slot count must be positive, got $v")
    v
  }

  override def createAggregationBuffer(): mutable.HashMap[Long, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[Long, Long],
                      input: InternalRow): mutable.HashMap[Long, Long] = {
    val v = left.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[Long]
      buf.get(key) match {
        case Some(c) => buf.update(key, c + 1)
        case None if buf.size < k => buf.update(key, 1L)
        case None =>
          // decrement-all step: collect first, then mutate — removing
          // while iterating a mutable map is undefined
          val dead = mutable.ArrayBuffer.empty[Long]
          buf.foreach { case (kk, c) =>
            if (c == 1L) dead += kk else buf.update(kk, c - 1)
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(b1: mutable.HashMap[Long, Long],
                     b2: mutable.HashMap[Long, Long]): mutable.HashMap[Long, Long] = {
    b2.foreach { case (key, c) => b1.update(key, b1.getOrElse(key, 0L) + c) }
    if (b1.size > k) {
      val counts = b1.values.toArray
      java.util.Arrays.sort(counts)
      val t = counts(counts.length - k - 1) // (k+1)-th largest
      val entries = b1.toArray
      entries.foreach { case (key, c) =>
        if (c - t <= 0L) b1.remove(key) else b1.update(key, c - t)
      }
    }
    b1
  }

  /** Summary rows sorted by (estimate desc, key) — deterministic GIVEN
    * the summary, though the summary itself is layout-dependent (see
    * class doc: gate, never output). */
  override def eval(buf: mutable.HashMap[Long, Long]): Any = {
    val rows: Array[Any] = buf.toArray
      .sortBy { case (key, c) => (-c, key) }
      .map { case (key, c) => InternalRow(key, c): Any }
    new GenericArrayData(rows)
  }

  override def serialize(buf: mutable.HashMap[Long, Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    buf.foreach { case (key, c) => bb.putLong(key); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Long, Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = mutable.HashMap.empty[Long, Long]
    var i = 0
    while (i < n) { buf.update(bb.getLong(), bb.getLong()); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("key", LongType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "mg_topk"
  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MisraGriesAgg =
    copy(left = newLeft, right = newRight)
}
