package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.ILog

/** Punkt-style abbreviation learning + sentence segmentation:
  * JVM-twin exactness, detection behavior on crafted corpora, the
  * load-bearing role of the learned set at split time, and degenerate
  * inputs.
  */
class PunktSpec extends SparkSpec {

  import spark.implicits._

  private def toks(rows: (Long, Long, String)*) =
    rows.toDF("doc_id", "pos", "w")

  test("threshold and p2 constants derive from the qlog2 system") {
    assert(Punkt.ScoreThresholdFp20 ===
      ILog.qlog2Fp20(3) - ILog.qlog2Fp20(10)) // log2(0.3) fp20
    assert(Punkt.Fp20Bias === 20L * 1048576L)
  }

  test("JVM twin matches the Spark scoring column-for-column") {
    val rows = Punkt.trainAbbrevs(Punkt.derivedTokens(
      Seq((0L, "key agg row scan slow fast table value part merge a the"),
        (1L, "batch window agg order data key merge row line part value"),
        (2L, "small fast slow filter value the part agg merge row scan"))
        .toDF("doc_id", "text")))
      .collect()
    assert(rows.nonEmpty)
    // Corpus scalars recomputed by hand from the same derived stream.
    val tok = Punkt.derivedTokens(
      Seq((0L, "key agg row scan slow fast table value part merge a the"),
        (1L, "batch window agg order data key merge row line part value"),
        (2L, "small fast slow filter value the part agg merge row scan"))
        .toDF("doc_id", "text")).collect()
    val nTok = tok.length.toLong
    val nPeriod = tok.count(_.getString(2).endsWith(".")).toLong
    rows.foreach { r =>
      val (llr, score, isAb) = Punkt.scoreType(
        r.getLong(1), r.getLong(2), nTok, nPeriod, r.getString(0))
      assert(llr === Option(r.get(3)).map(_.asInstanceOf[Long]),
        s"llr mismatch for ${r.getString(0)}")
      assert(score === Option(r.get(4)).map(_.asInstanceOf[Long]),
        s"score mismatch for ${r.getString(0)}")
      assert(isAb === r.getBoolean(5))
    }
  }

  test("always-period types are learned as abbreviations; sentence-rate types are not") {
    // 'ab' ends with a period in all 40 occurrences; 'word' in 4 of 40
    // (a sentence-final rate).
    val rows = (0L until 40L).flatMap { i =>
      Seq((i, 0L, "Word"), (i, 1L, "ab."),
        (i, 2L, if (i % 10 == 0) "word." else "word"), (i, 3L, "Tail"))
    }
    val m = Punkt.trainAbbrevs(toks(rows: _*))
      .collect().map(r => r.getString(0) -> r.getBoolean(5)).toMap
    assert(m("ab") === true)
    assert(m("word") === false)
    assert(!m.contains("tail")) // never period-final: not a candidate
  }

  test("learned abbreviations are load-bearing at split time") {
    // One document: "Start ab. Next word. End." — with the learned set
    // {ab} the period after 'ab.' is NOT a boundary (2 sentences);
    // with an empty set capital-after-period splits there too (3).
    val t = toks((1L, 0L, "Start"), (1L, 1L, "ab."), (1L, 2L, "Next"),
      (1L, 3L, "word."), (1L, 4L, "End."))
    val ab = Seq("ab").toDF("ty")
    val withModel = Punkt.sentenceStats(t, ab).collect().head
    assert(withModel.getLong(1) === 5L) // n_tokens
    assert(withModel.getLong(2) === 2L) // n_sentences
    assert(withModel.getLong(3) === 4L) // "Start ab. Next word."
    val noModel = Punkt.sentenceStats(t, ab.limit(0)).collect().head
    assert(noModel.getLong(2) === 3L)
  }

  test("starter JVM twin matches the Spark scoring; planted rates split cleanly") {
    // 'the' follows a boundary in 40 of 100 occurrences (planted rate),
    // 'word' in 12 of 100 (base); corpus base rate 520/4000 = 0.13.
    val stypes = Seq(("the", 100L, 40L), ("word", 100L, 12L))
      .toDF("ty", "cnt_total", "cnt_start")
    val scal = Seq((4000L, 520L)).toDF("n_tok", "n_ab")
    val rows = Punkt.scoreStarterTypes(stypes, scal)
      .collect().map(r => r.getString(0) ->
        (Option(r.get(3)).map(_.asInstanceOf[Long]), r.getBoolean(4))).toMap
    assert(rows("the") === Punkt.scoreStarter(100L, 40L, 4000L, 520L))
    assert(rows("word") === Punkt.scoreStarter(100L, 12L, 4000L, 520L))
    assert(rows("the")._2 === true)
    assert(rows("word")._2 === false)
  }

  test("starters re-open boundaries after abbreviations in full segmentation") {
    // "Start ab. The word" — base: 'ab.' is an abbreviation, 1 sentence;
    // full with starter {the}: the period re-opens, 2 sentences.
    val t = toks((1L, 0L, "Start"), (1L, 1L, "ab."), (1L, 2L, "The"),
      (1L, 3L, "word"))
    val ab = Seq("ab").toDF("ty")
    val base = Punkt.sentenceStats(t, ab).collect().head
    assert(base.getLong(2) === 1L)
    val full = Punkt.sentenceStatsFull(t, ab, Seq("the").toDF("ty"))
      .collect().head
    assert(full.getLong(2) === 2L)
    assert(full.getLong(3) === 2L)
    // An empty starter set makes full ≡ base.
    val none = Punkt.sentenceStatsFull(t, ab, Seq.empty[String].toDF("ty"))
      .collect().head
    assert(none.getLong(2) === 1L)
  }

  test("document tail without a period still closes a sentence") {
    val t = toks((7L, 0L, "One."), (7L, 1L, "trailing"), (7L, 2L, "words"))
    val r = Punkt.sentenceStats(t, Seq.empty[String].toDF("ty"))
      .collect().head
    // 'One.' is followed by lowercase → no boundary there; the last
    // token always closes → a single 3-token sentence.
    assert(r.getLong(2) === 1L)
    assert(r.getLong(3) === 3L)
  }

  test("derived corpus: every period is followed by a capital or end-of-doc") {
    val t = Punkt.derivedTokens(
      Seq((0L, "key agg row scan slow fast table value part merge a the or"),
        (8L, "batch window agg order data key merge row line part value x"))
        .toDF("doc_id", "text"))
      .orderBy("doc_id", "pos").collect()
    t.groupBy(_.getLong(0)).foreach { case (_, ws) =>
      ws.sliding(2).foreach {
        case Array(a, b) =>
          if (a.getString(2).endsWith("."))
            assert(b.getString(2).head.isUpper,
              s"${a.getString(2)} not followed by capital: ${b.getString(2)}")
        case _ =>
      }
      assert(ws.head.getString(2).head.isUpper) // doc start capitalized
    }
  }

  test("degenerate: empty corpus and periodless corpus") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Punkt.trainAbbrevs(Punkt.derivedTokens(empty)).count() === 0L)
    assert(Punkt.trainStarters(Punkt.derivedTokens(empty),
      Seq.empty[String].toDF("ty")).count() === 0L)
    assert(Punkt.sentenceStats(Punkt.derivedTokens(empty),
      Seq.empty[String].toDF("ty")).count() === 0L)
    // Periodless token stream: no candidates, one sentence per doc.
    val flat = toks((1L, 0L, "a"), (1L, 1L, "b"), (2L, 0L, "c"))
    assert(Punkt.trainAbbrevs(flat).count() === 0L)
    val s = Punkt.sentenceStats(flat, Seq.empty[String].toDF("ty"))
      .orderBy("doc_id").collect()
    assert(s.map(_.getLong(2)).toSeq === Seq(1L, 1L))
  }
}
