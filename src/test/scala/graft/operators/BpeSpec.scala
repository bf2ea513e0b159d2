package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // the classic Sennrich corpus: low×5 lower×2 newest×6 widest×3
  private lazy val vocab = Seq(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L)
  ).toDF("word", "freq")

  test("learns the classic merge sequence (hand-computed)") {
    val (merges, _) = Bpe.train(vocab, "word", "freq", rounds = 4)
    assert(merges.map(m => (m.lft, m.rgt, m.cnt)) === Seq(
      ("e", "s", 9L),   // es(newest 6 + widest 3); ties st via lft asc
      ("es", "t", 9L),
      ("l", "o", 7L),   // ties ow 7 via lft asc
      ("lo", "w", 7L)))
    assert(merges.map(_.round) === Seq(1, 2, 3, 4))
  }

  test("final segmentation applies merges greedily left-to-right") {
    val (_, words) = Bpe.train(vocab, "word", "freq", rounds = 4)
    val seg = words
      .select(col("word"), array_join(Bpe.symbols(col("w")), " ").as("pieces"))
      .as[(String, String)].collect().toMap
    assert(seg("low") === "low")
    assert(seg("lower") === "low e r")
    assert(seg("newest") === "n e w est")
    assert(seg("widest") === "w i d est")
  }

  test("encode→decode identity: segmentation is a partition of the word") {
    val (merges, _) = Bpe.train(vocab, "word", "freq", rounds = 4)
    val fresh = Seq("lowest", "newer", "widow", "a", "zz9").toDF("word")
    val rt = Bpe.encode(fresh, "word", merges)
      .select(col("word"), Bpe.decode(col("w")).as("back"),
        array_join(Bpe.symbols(col("w")), "").as("joined"))
      .as[(String, String, String)].collect()
    rt.foreach { case (w, back, joined) =>
      assert(back === w)
      assert(joined === w)
    }
    // and learned merges actually fire on unseen words
    val lowest = Bpe.encode(Seq("lowest").toDF("word"), "word", merges)
      .select(array_join(Bpe.symbols(col("w")), " ")).head.getString(0)
    assert(lowest === "low est")
  }

  test("overlapping self-pairs merge leftmost-first, non-overlapping") {
    val (merges, words) = Bpe.train(Seq(("aaa", 2L), ("aaaa", 1L)).toDF("word", "freq"),
      "word", "freq", rounds = 1)
    assert(merges.head.lft === "a" && merges.head.rgt === "a")
    // aaa has 2 overlapping (a,a) positions ×2 freq + aaaa has 3 ×1 = 7
    assert(merges.head.cnt === 7L)
    val seg = words
      .select(col("word"), array_join(Bpe.symbols(col("w")), " ").as("p"))
      .as[(String, String)].collect().toMap
    assert(seg("aaa") === "aa a")
    assert(seg("aaaa") === "aa aa")
  }

  test("stops early when no adjacent pair remains") {
    val (merges, _) = Bpe.train(Seq(("a", 3L), ("b", 1L)).toDF("word", "freq"),
      "word", "freq", rounds = 5)
    assert(merges.isEmpty)
  }

  test("persisted model round-trips exactly; loaded-model encode ≡ train's segmentation") {
    val vocab = Seq(("lower", 5L), ("low", 3L), ("newest", 6L), ("widest", 2L))
      .toDF("word", "freq")
    val (merges, words) = Bpe.train(vocab, "word", "freq", rounds = 6)
    Bpe.persistModel(spark, merges, "bpespec_model")
    val loaded = Bpe.loadModel(spark, "bpespec_model")
    assert(loaded === merges)
    // encode through the PERSISTED artifact reproduces the trainer's
    // final segmentation word for word — the retrain-free deploy path
    val fromModel = Bpe.encode(vocab.select("word"), "word", loaded)
      .select(col("word"), array_join(Bpe.symbols(col("w")), " ").as("p"))
      .as[(String, String)].collect().toMap
    val fromTrain = words
      .select(col("word"), array_join(Bpe.symbols(col("w")), " ").as("p"))
      .as[(String, String)].collect().toMap
    assert(fromModel === fromTrain)
  }
}
