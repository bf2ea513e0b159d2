package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Pure-logic properties of the bounded MinK aggregator — the invariants
  * partial aggregation relies on (associativity, commutativity, bounded
  * sorted state) hold for ANY insertion order and merge tree. Seeded
  * randomized cases — 500 trials per property.
  */
class MinKSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(4242)

  private def ref(xs: Seq[HashedKey], k: Int): Seq[HashedKey] =
    xs.sortBy(h => (h.h, h.k)).take(k)

  private def randElems(n: Int): Seq[HashedKey] =
    Seq.fill(n)(HashedKey(f"${rnd.nextInt(1 << 24)}%08x", rnd.nextInt(1000).toString))

  test("reduce in any order equals sorted-take-k") {
    for (_ <- 1 to 500) {
      val k = 1 + rnd.nextInt(7)
      val xs = randElems(rnd.nextInt(30))
      val agg = new MinK(k)
      assert(xs.foldLeft(agg.zero)(agg.reduce) === ref(xs, k), s"k=$k xs=$xs")
    }
  }

  test("merge of arbitrary splits equals global sorted-take-k, commutatively") {
    for (_ <- 1 to 500) {
      val k = 1 + rnd.nextInt(7)
      val a = randElems(rnd.nextInt(20))
      val b = randElems(rnd.nextInt(20))
      val agg = new MinK(k)
      val ba = a.foldLeft(agg.zero)(agg.reduce)
      val bb = b.foldLeft(agg.zero)(agg.reduce)
      assert(agg.merge(ba, bb) === ref(a ++ b, k))
      assert(agg.merge(bb, ba) === ref(a ++ b, k))
    }
  }

  test("state never exceeds k and stays sorted (the bounded invariant)") {
    for (_ <- 1 to 200) {
      val k = 1 + rnd.nextInt(5)
      val xs = randElems(rnd.nextInt(40))
      val agg = new MinK(k)
      val states = xs.scanLeft(agg.zero)(agg.reduce)
      states.foreach { s =>
        assert(s.size <= k)
        assert(s === ref(s, k)) // sorted, deduped-by-position invariant
      }
    }
  }

  test("duplicate elements are kept, not collapsed (multiset semantics)") {
    val agg = new MinK(3)
    val e = HashedKey("aaaaaaaa", "1")
    val got = Seq(e, e, e, e).foldLeft(agg.zero)(agg.reduce)
    assert(got === Seq(e, e, e))
  }
}
