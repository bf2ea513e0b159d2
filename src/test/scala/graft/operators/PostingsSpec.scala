package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PostingsSpec extends SparkSpec {
  import spark.implicits._

  // 10 docs, segSize 4 → segments {0,1,2}; "the" appears in every doc
  // (the hot token), "rare" in doc 7 only, "twice" twice in doc 2.
  private lazy val docs = (0L until 10L).map { id =>
    val extra =
      if (id == 7) " rare" else if (id == 2) " twice twice" else ""
    (id, s"the quick doc $id$extra")
  }.toDF("doc_id", "text")

  private lazy val idx = Postings.segmented(docs, "doc_id", "text", 4)

  test("hot token shards into one bounded row per segment, never one global row") {
    val rows = idx.filter($"w" === "the").orderBy("seg").collect()
    assert(rows.map(_.getAs[Long]("seg")).toSeq === Seq(0L, 1L, 2L))
    assert(rows.map(_.getAs[Long]("seg_df")).toSeq === Seq(4L, 4L, 2L))
  }

  test("postings render docs ascending with positions ascending") {
    val r = idx.filter($"w" === "the" && $"seg" === 0).select("postings").head.getString(0)
    assert(r === "0:0,1:0,2:0,3:0")
    val tw = idx.filter($"w" === "twice").select("postings").head.getString(0)
    assert(tw === "2:4|5")
  }

  test("tokenDf aggregates segments to the global document frequency") {
    val df = Postings.tokenDf(idx).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(df("the") === 10L)
    assert(df("rare") === 1L)
    assert(df("twice") === 1L)
  }

  test("positionsOf round-trips the rendered encoding") {
    assert(Postings.positionsOf(idx, "twice", 2L).as[Long].collect().sorted.toSeq
      === Seq(4L, 5L))
    assert(Postings.positionsOf(idx, "the", 7L).as[Long].collect().toSeq === Seq(0L))
    assert(Postings.positionsOf(idx, "rare", 3L).count() === 0L)
  }

  test("segSize must be positive") {
    intercept[IllegalArgumentException] { Postings.segmented(docs, "doc_id", "text", 0) }
  }

  test("phraseMatches finds starts, overlapping matches, and case folds") {
    val d = Seq(
      (1L, "a b c a b"),    // "a b" at 0 and 3
      (2L, "A B x"),        // case-folded match at 0
      (3L, "a a a"),        // "a a" overlaps: starts 0 and 1
      (4L, "b a"),          // reversed — no match
      (5L, "a")             // first word ends the doc — no match
    ).toDF("doc_id", "text")
    val ab = Postings.phraseMatches(d, "doc_id", "text", Seq("a", "b"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(ab === Set((1L, 0), (1L, 3), (2L, 0)))
    val aa = Postings.phraseMatches(d, "doc_id", "text", Seq("a", "a"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(aa === Set((3L, 0), (3L, 1)))
  }

  test("phraseMatches three-word phrase never crosses document bounds") {
    val d = Seq((1L, "x a b"), (2L, "c y")).toDF("doc_id", "text")
    // "a b c" spans docs 1→2 in concatenation order but must not match
    assert(Postings.phraseMatches(d, "doc_id", "text", Seq("a", "b", "c")).count() === 0L)
    val e = Seq((9L, "q a b c q a b c")).toDF("doc_id", "text")
    val m = Postings.phraseMatches(e, "doc_id", "text", Seq("a", "b", "c"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(m === Set((9L, 1), (9L, 5)))
  }

  test("phraseMatches requires a non-empty phrase") {
    intercept[IllegalArgumentException] {
      Postings.phraseMatches(docs, "doc_id", "text", Nil)
    }
  }
}
