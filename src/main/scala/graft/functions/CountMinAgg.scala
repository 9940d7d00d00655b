package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Shared row-hash for the count-min sketch pair: depth-r bucket of an
  * int64 key is splitmix64(key + r·φ) mod w (Steele et al., "Fast
  * Splittable Pseudorandom Number Generators", OOPSLA 2014 — the
  * standard 64-bit finalizer; one odd-constant offset per depth gives
  * the d independent-enough hash rows CMS needs). Deterministic and
  * data-independent, so sketch and estimator agree by construction. */
private[graft] object CmsHash {
  final val PHI = 0x9E3779B97F4A7C15L
  def mix(z0: Long): Long = {
    var z = z0 + PHI
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
  def bucket(key: Long, r: Int, w: Int): Int =
    java.lang.Math.floorMod(mix(key + r.toLong * PHI), w.toLong).toInt
}

/** Count-min sketch over int64 keys as a mergeable custom aggregate:
  * `cms_sketch(key, w, d)` → d×w int64 counter matrix, self-described
  * as [d, w, counters…] (Cormode & Muthukrishnan, "An Improved Data
  * Stream Summary: The Count-Min Sketch and its Applications",
  * J. Algorithms 2005).
  *
  * update: +1 at one bucket per depth row; merge: element-wise add.
  * Both are commutative+associative integer adds, so — unlike the
  * Misra-Gries summary, whose content is merge-order-dependent — the
  * sketch VALUE is deterministic for a dataset regardless of
  * partition layout, and [[CmsEst]] point estimates are too.
  *
  * Guarantees: est ≥ exact always (counters only overcount), which is
  * what makes a CMS threshold gate a lossless candidate filter before
  * an exact count (the [[graft.ops.SqlOps]] top-users op — the
  * frequency analogue of the bloom-gated decontamination); and
  * est ≤ exact + εN with probability 1−δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.
  * State is O(d·w) regardless of key cardinality; partials map-side
  * combine and serialize as raw longs. */
case class CountMinAgg(
    first: Expression,
    second: Expression,
    third: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with TernaryLike[Expression] {

  /** Width/depth: foldable literals, like bloom_filter_agg's sizes. */
  private lazy val w: Int = {
    val v = second.eval().asInstanceOf[Number].intValue
    require(v > 0, s"cms_sketch width must be positive, got $v")
    v
  }
  private lazy val d: Int = {
    val v = third.eval().asInstanceOf[Number].intValue
    require(v > 0, s"cms_sketch depth must be positive, got $v")
    v
  }

  override def createAggregationBuffer(): Array[Long] = {
    val buf = new Array[Long](2 + d * w)
    buf(0) = d.toLong
    buf(1) = w.toLong
    buf
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = first.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[Long]
      var r = 0
      while (r < d) {
        buf(2 + r * w + CmsHash.bucket(key, r, w)) += 1L
        r += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 2
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "cms_sketch"
  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): CountMinAgg =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Point-frequency estimate off a [[CountMinAgg]] sketch:
  * `cms_est(sketch, key)` = min over depth rows of the key's bucket
  * counter — the self-described [d, w, …] layout means no shape
  * arguments to keep in sync. Runs once per DISTINCT candidate key in
  * the gate (never per row), so eval-mode execution is off the hot
  * path by construction. */
case class CmsEst(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(sketch: Any, key: Any): Any = {
    val arr = sketch.asInstanceOf[ArrayData]
    val d = arr.getLong(0).toInt
    val w = arr.getLong(1).toInt
    val k = key.asInstanceOf[Long]
    var est = Long.MaxValue
    var r = 0
    while (r < d) {
      val c = arr.getLong(2 + r * w + CmsHash.bucket(k, r, w))
      if (c < est) est = c
      r += 1
    }
    est
  }

  override def prettyName: String = "cms_est"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEst =
    copy(left = newLeft, right = newRight)
}
