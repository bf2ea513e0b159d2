package graft.operators

import graft.SparkSpec

/** T5 span corruption: the round-trip invariant (input + target
  * reconstruct the original), sentinel numbering, and mask accounting.
  */
class SpanCorruptionSpec extends SparkSpec {

  private def corrupt(rows: Seq[(Long, String)], rateHex: String = "80000000") = {
    import spark.implicits._
    SpanCorruption
      .t5SpanCorrupt(rows.toDF("doc_id", "text"), "doc_id", "text",
        spanLen = 3, startRateHex = rateHex)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))
      .sortBy(_._1)
  }

  private val docs = (1L to 30L).map(i =>
    (i, (0 until 12).map(j => s"w${(i * 7 + j * 3) % 11}").mkString(" ")))

  test("input + target reconstruct the original text exactly") {
    val sentinel = "<extra_id_(\\d+)>".r
    corrupt(docs).foreach { case (id, _, _, input, target) =>
      // parse target into span id -> tokens
      val spans = scala.collection.mutable.Map.empty[Int, List[String]]
      var cur = -1
      target.split(" ").filter(_.nonEmpty).foreach {
        case sentinel(k) => cur = k.toInt; spans(cur) = Nil
        case w           => spans(cur) = spans(cur) :+ w
      }
      val rebuilt = input.split(" ").filter(_.nonEmpty).flatMap {
        case sentinel(k) => spans(k.toInt)
        case w           => Seq(w)
      }.mkString(" ")
      val original = docs.find(_._1 == id).get._2.toLowerCase
      assert(rebuilt === original, s"doc $id round-trip failed")
    }
  }

  test("sentinels are numbered 0..K-1 in order, identically in input and target") {
    val sentinel = "<extra_id_(\\d+)>".r
    corrupt(docs).foreach { case (id, _, nMasked, input, target) =>
      val inIds = sentinel.findAllMatchIn(input).map(_.group(1).toInt).toSeq
      val tgIds = sentinel.findAllMatchIn(target).map(_.group(1).toInt).toSeq
      assert(inIds === inIds.indices.toSeq, s"doc $id input sentinels $inIds")
      assert(tgIds === inIds, s"doc $id target sentinels differ")
      if (nMasked == 0) assert(inIds.isEmpty && target.isEmpty)
    }
  }

  test("mask accounting: n_masked = target tokens minus sentinels; input covers the rest") {
    corrupt(docs).foreach { case (id, nTok, nMasked, input, target) =>
      val tgWords = target.split(" ").filter(_.nonEmpty)
      val nSent = tgWords.count(_.startsWith("<extra_id_"))
      assert(tgWords.length - nSent === nMasked, s"doc $id target accounting")
      val inWords = input.split(" ").filter(_.nonEmpty)
      assert(inWords.length - nSent === nTok - nMasked, s"doc $id input accounting")
    }
  }

  test("rate 0 masks nothing; determinism across reruns") {
    val none = corrupt(docs, rateHex = "00000000")
    none.foreach { case (id, nTok, nMasked, input, target) =>
      assert(nMasked === 0L && target === "" && input.split(" ").length.toLong === nTok)
    }
    assert(corrupt(docs) === corrupt(docs))
    // the default fixture must actually exercise masking
    assert(corrupt(docs).map(_._3).sum > 0)
  }
}
