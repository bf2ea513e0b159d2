package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Misra-Gries invariants: bounded state, the frequent-item recall
  * guarantee in the approximate regime, exactness in the small-domain
  * regime, merge-order independence where exact. The buffer is mutable
  * (updated in place per row), so assertions snapshot with `.toMap` and
  * the bounded-state check tracks the max size DURING the fold — a
  * scanLeft would collect aliases of one object.
  */
class FreqItemsSpec extends AnyFunSuite {

  private def feed(agg: FreqItems, xs: Seq[String]): scala.collection.mutable.Map[String, Long] =
    xs.foldLeft(agg.zero)(agg.reduce)

  test("exact counts when distinct items fit the capacity, any order") {
    val xs = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(5)("c")
    val want = Map("a" -> 40L, "b" -> 25L, "c" -> 5L)
    val agg = new FreqItems(8)
    assert(feed(agg, xs).toMap === want)
    assert(feed(agg, new scala.util.Random(7).shuffle(xs)).toMap === want)
    // arbitrary split + merge is also exact
    val (l, r) = xs.splitAt(17)
    assert(agg.merge(feed(agg, l), feed(agg, r)).toMap === want)
  }

  test("state never exceeds capacity (the bounded invariant)") {
    val rnd = new scala.util.Random(11)
    val xs = Seq.fill(5000)(s"k${rnd.nextInt(500)}")
    val agg = new FreqItems(10)
    var maxSize = 0
    val st = xs.foldLeft(agg.zero) { (m, x) =>
      val r = agg.reduce(m, x)
      maxSize = math.max(maxSize, r.size)
      r
    }
    assert(maxSize <= 10 && st.size <= 10)
    // merge of two full summaries is also bounded
    val (l, r) = xs.splitAt(2500)
    assert(agg.merge(feed(agg, l), feed(agg, r)).size <= 10)
  }

  test("every item above the n/(capacity+1) threshold survives, with a lower-bound estimate") {
    val rnd = new scala.util.Random(23)
    // one 40% heavy hitter buried in 400 distinct light items
    val heavy = Seq.fill(2000)("HOT")
    val light = Seq.fill(3000)(s"k${rnd.nextInt(400)}")
    val xs = rnd.shuffle(heavy ++ light)
    val agg = new FreqItems(10)
    val n = xs.size
    // single-pass and split-merge paths both keep the guarantee
    val summaries = Seq(
      feed(agg, xs).toMap,
      agg.merge(feed(agg, xs.take(n / 3)), feed(agg, xs.drop(n / 3))).toMap)
    summaries.foreach { got =>
      assert(got.contains("HOT"), got)
      assert(got("HOT") >= 2000L - n / 11, got("HOT"))
      assert(got("HOT") <= 2000L) // estimates never exceed truth
    }
  }

  test("nulls are ignored") {
    val agg = new FreqItems(4)
    assert(feed(agg, Seq("a", null, "a", null)).toMap === Map("a" -> 2L))
  }
}
