package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 32-bit SimHash digest as a custom imperative aggregate.
  *
  * Semantics are exactly the relational form the DuckDB oracle runs
  * (per-token md5-prefix hash → per-bit ±1 majority vote → reassembled
  * digest), but as ONE aggregate with a fixed 32-counter buffer instead
  * of 32 separate SUM(CASE…) aggregate columns: the partial state per
  * (partition, doc) is 132 bytes, map-side combined, and the generated
  * aggregation code stays small (the 32-column form dominated the
  * digest stage's codegen).
  *
  * TypedImperativeAggregate is the right extension point for fixed-size
  * imperative state: update/merge are plain array ops, the buffer
  * serializes to 132 bytes for shuffle, and the final digest assembly
  * is branch-free.
  */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] with UnaryLike[Expression] {

  // slots 0-31: per-bit vote counters; slot 32: count of non-null
  // inputs (distinguishes the empty/all-NULL group from a genuinely
  // all-bits-tied one)
  override def createAggregationBuffer(): Array[Int] = new Array[Int](33)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = Md5Prefix32.hash(v.asInstanceOf[UTF8String])
      var j = 0
      while (j < 32) {
        buf(j) += (if (((h >> (31 - j)) & 1L) == 1L) 1 else -1)
        j += 1
      }
      buf(32) += 1
    }
    buf
  }

  override def merge(b1: Array[Int], b2: Array[Int]): Array[Int] = {
    var j = 0
    while (j < 33) { b1(j) += b2(j); j += 1 }
    b1
  }

  /** Majority vote per bit: counter ≥ 0 → bit set (ties set the bit,
    * matching the SQL `CASE WHEN b_j >= 0` rendering). A group with no
    * non-null input has a DEFINED value, 0 (not 0xFFFFFFFF, which the
    * all-ties rule would otherwise produce). Both dialect renderings
    * filter NULL tokens before the digest (Dialect.simhashDigestCtes),
    * so in the gated pipelines an all-NULL group simply has no row;
    * the 0 covers direct standalone use on a nullable column. */
  override def eval(buf: Array[Int]): Any = {
    if (buf(32) == 0) return 0L
    var out = 0L
    var j = 0
    while (j < 32) {
      if (buf(j) >= 0) out |= 1L << (31 - j)
      j += 1
    }
    out
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(132)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(33)(bb.getInt())
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SimHashAgg =
    copy(child = newChild)
}
