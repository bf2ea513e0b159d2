package graft.operators

import graft.SparkSpec

/** Context-window chunking boundaries. */
class ChunkSpec extends SparkSpec {
  import spark.implicits._

  private def chunksOf(text: String, size: Int, stride: Int): Seq[(Long, String)] =
    Chunk.chunkTokens(Seq((1L, text)).toDF("id", "text"), "id", "text", size, stride)
      .collect().map(r => (r.getLong(1), r.getString(2))).sortBy(_._1).toSeq

  test("windows are size-bounded, stride-spaced, last chunk short") {
    // 10 tokens, size 4, stride 3 → starts 0,3,6,9
    val got = chunksOf("a b c d e f g h i j", 4, 3)
    assert(got === Seq(
      0L -> "a b c d", 1L -> "d e f g", 2L -> "g h i j", 3L -> "j"))
  }

  test("no overlap when stride == size; every token appears exactly once") {
    val got = chunksOf("a b c d e f g", 3, 3)
    assert(got === Seq(0L -> "a b c", 1L -> "d e f", 2L -> "g"))
    assert(got.flatMap(_._2.split(" ")) === Seq("a", "b", "c", "d", "e", "f", "g"))
  }

  test("document shorter than one window emits a single chunk") {
    assert(chunksOf("only two", 50, 40) === Seq(0L -> "only two"))
  }

  test("consecutive chunks overlap by size - stride tokens") {
    val got = chunksOf((1 to 100).map("t" + _).mkString(" "), 10, 7)
    got.sliding(2).foreach {
      case Seq((_, a), (_, b)) =>
        val overlap = a.split(" ").toSeq.intersect(b.split(" ").toSeq)
        if (b.split(" ").length == 10) // full windows overlap exactly
          assert(overlap.size === 3, s"$a | $b")
      case _ =>
    }
  }

  test("invalid parameters are rejected") {
    intercept[IllegalArgumentException](chunksOf("a b", 3, 4)) // stride > size
    intercept[IllegalArgumentException](chunksOf("a b", 0, 0))
  }
}
