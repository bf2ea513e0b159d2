package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Text + Vectors column builders. */
class FunctionsSpec extends SparkSpec {

  test("fingerprint is invariant to token order and duplication") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta gamma"),
      (2L, "gamma beta alpha alpha"),
      (3L, "alpha beta delta"))
      .toDF("id", "text")
      .select($"id", Text.fingerprint($"text").as("fp"))
    val fp = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp(1L) === fp(2L))
    assert(fp(1L) !== fp(3L))
  }

  test("langId flags stopword-rich text as en") {
    import spark.implicits._
    val df = Seq(
      (1L, "the cat is in the house and it is warm"),
      (2L, "foo bar baz qux quux corge grault garply waldo fred"))
      .toDF("id", "text")
      .select($"id", Text.langId($"text").as("lang"))
    val m = df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m === Map(1L -> "en", 2L -> "und"))
  }

  test("wordTokenize matches NLTK word_tokenize on fixture sentences") {
    import spark.implicits._
    // Expected outputs are real nltk.word_tokenize results (reference
    // cache.py:16,216 tokenizes lowercased text; mixed case included here
    // to pin case preservation).
    val fixtures = Seq(
      ("Hello, world!", Seq("Hello", ",", "world", "!")),
      ("don't", Seq("do", "n't")),
      ("i can't believe it's done.", Seq("i", "ca", "n't", "believe", "it", "'s", "done", ".")),
      ("we've seen they'll win; you're next!", Seq("we", "'ve", "seen", "they", "'ll", "win", ";", "you", "'re", "next", "!")),
      ("she'd go", Seq("she", "'d", "go")),
      ("i'm here", Seq("i", "'m", "here")),
      ("won't shan't ain't", Seq("wo", "n't", "sha", "n't", "ai", "n't")),
      ("the users' files", Seq("the", "users", "'", "files")),
      // URL tokens diverge (NLTK keeps '//t.co/x' whole) — documented in
      // Text.wordTokenize; hashtags/mentions split the same way.
      ("stay home #StaySafe @user", Seq("stay", "home", "#", "StaySafe", "@", "user")),
      // Treebank abbreviation cases: letter-dot sequences stay whole
      // mid-sentence; the final period detaches at string end.
      ("the U.S. economy is strong", Seq("the", "U.S.", "economy", "is", "strong")),
      ("he moved to the U.S.", Seq("he", "moved", "to", "the", "U.S", ".")),
      ("e.g. apples and pears", Seq("e.g.", "apples", "and", "pears")),
      ("the U.S.A. wins", Seq("the", "U.S.A.", "wins")),
      // Internal-period words stay attached whatever the head length —
      // Treebank only detaches the FINAL period (real NLTK outputs).
      ("visit example.com today", Seq("visit", "example.com", "today")),
      ("a.com is short", Seq("a.com", "is", "short")),
      ("see sub.example.com now", Seq("see", "sub.example.com", "now")),
      ("pi is 3.14", Seq("pi", "is", "3.14")),
      ("visit example.com.", Seq("visit", "example.com", ".")),
      // Treebank directional quote conversion: opening " → ``, closing " → ''
      ("He said \"hello\" to me", Seq("He", "said", "``", "hello", "''", "to", "me")),
      ("\"Go now\" she said", Seq("``", "Go", "now", "''", "she", "said")))
    for ((text, expected) <- fixtures) {
      val got = Seq(Tuple1(text)).toDF("text")
        .select(Text.wordTokenize($"text").as("t"))
        .collect().head.getSeq[String](0)
      assert(got === expected, s"input: $text")
    }
  }

  test("StopWords is NLTK's english list: 179 words, contractions included") {
    assert(Text.StopWords.size === 179)
    assert(Text.StopWords.take(4) === Seq("i", "me", "my", "myself"))
    assert(Text.StopWords.contains("don't"))
    assert(Text.StopWords.contains("wouldn't"))
    assert(Text.StopWords.contains("should've"))
    assert(!Text.StopWords.contains("house"))
    // SQL twin escapes apostrophes and keeps cardinality
    assert(Text.StopWordsSql.contains("'don''t'"))
    assert(Text.StopWordsSql.split(",").length === 179)
  }

  test("bpeish token count splits alpha and digit runs") {
    import spark.implicits._
    val df = Seq((1L, "abc123 def, 45x")).toDF("id", "text")
      .select(Text.bpeishTokenCount($"text").as("n"))
    // abc / 123 / def / 45 / x
    assert(df.collect().head.getLong(0) === 5L)
  }

  test("keywordTokens drops stopwords and non-alnum tokens") {
    import spark.implicits._
    val df = Seq((1L, "The quick-brown fox and 42 dogs")).toDF("id", "text")
      .select(Text.keywordTokens($"text").as("t"))
    // "quick-brown" is one whitespace token; '-' fails the alnum filter
    val toks = df.collect().head.getSeq[String](0)
    assert(toks === Seq("fox", "42", "dogs"))
  }

  test("scrub masks URLs before digit runs, leaves short numbers alone") {
    import spark.implicits._
    val out = Seq(
      (1L, "see https://example.com/p?id=123456 now"),
      (2L, "call 5551234567 or room 42"),
      (3L, "clean text stays"))
      .toDF("id", "text")
      .select($"id", Text.scrub($"text").as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "see <URL> now") // URL masked whole, digits not re-masked
    assert(out(2L) === "call <NUM> or room 42")
    assert(out(3L) === "clean text stays")
  }

  test("punctCount (translate scan) is bit-identical to the regex count") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = Seq(
      (1L, "Hello, World! 42."),          // upper→lower, ASCII punct
      (2L, "no punct here 123 abc"),      // zero
      (3L, "!!!,,,:::"),                  // all punct
      (4L, "tabs\tand\nnewlines count"),  // whitespace ≠ space counts
      (5L, "naïve café — em dash"),       // non-ASCII codepoints count
      (6L, ""))                           // empty
      .toDF("id", "text")
    val got = rows.select($"id", Text.punctCount($"text").as("p"),
      size(regexp_extract_all(lower($"text"), lit("[^a-z0-9 ]"), lit(0)))
        .cast("long").as("r"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (id, p, r) => assert(p === r, s"id $id: translate=$p regex=$r") }
    assert(got.find(_._1 == 3L).get._2 === 9L)
    assert(got.find(_._1 == 2L).get._2 === 0L)
  }

  test("dot / norm / cosine compute correct doubles") {
    import spark.implicits._
    val df = Seq((Array(3.0f, 4.0f), Array(4.0f, 3.0f))).toDF("a", "b")
      .select(
        Vectors.dot(Vectors.toDouble($"a"), Vectors.toDouble($"b")).as("dot"),
        Vectors.norm(Vectors.toDouble($"a")).as("na"),
        Vectors.cosine(Vectors.toDouble($"a"), Vectors.toDouble($"b")).as("cos"))
    val r = df.collect().head
    assert(r.getDouble(0) === 24.0)
    assert(r.getDouble(1) === 5.0)
    assert(math.abs(r.getDouble(2) - 24.0 / 25.0) < 1e-12)
  }

  test("lshBucket is deterministic and within range") {
    import spark.implicits._
    val df = Seq((1L, Array(1.0f, -2.0f, 0.5f)), (2L, Array(1.0f, -2.0f, 0.5f)))
      .toDF("id", "v")
      .select($"id", Vectors.lshBucket(Vectors.toDouble($"v"), 4).as("b"))
    val bs = df.collect().map(_.getLong(1))
    assert(bs(0) === bs(1))
    assert(bs(0) >= 0 && bs(0) < 16)
  }
}
