package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Property test for the bounded top-k buffer: the O(1) fast-reject
  * path (added so full buffers don't re-sort per losing row) must be
  * invisible — any insertion order and any partial/merge split must
  * produce exactly the brute-force top-k with the (value desc, id asc)
  * tie-break. */
class TopKSpec extends AnyFunSuite {

  private def brute(xs: Seq[(Long, Double)], k: Int): Seq[(Long, Double)] =
    xs.sortBy { case (id, v) => (-v, id) }.take(k)

  test("reduce+merge equal brute-force top-k for random orders and splits") {
    val rnd = new scala.util.Random(7)
    (1 to 20).foreach { _ =>
      val k = 1 + rnd.nextInt(5)
      val agg = new TopK(k)
      val n = rnd.nextInt(40)
      // duplicate values force the id tie-break through the fast path
      val xs = (0 until n).map(i => (i.toLong, rnd.nextInt(6).toDouble))
      val shuffled = rnd.shuffle(xs)
      val direct = shuffled.foldLeft(agg.zero)(agg.reduce)
      assert(agg.finish(direct) === brute(xs, k))
      // arbitrary split, each side reduced independently, then merged
      val cut = if (shuffled.isEmpty) 0 else rnd.nextInt(shuffled.size + 1)
      val (l, r) = shuffled.splitAt(cut)
      val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce),
                             r.foldLeft(agg.zero)(agg.reduce))
      assert(agg.finish(merged) === brute(xs, k))
    }
  }
}
