package graft.ingest

/** Deterministic synthetic raw capture in the FIXTURES.md §1 shape
  * (reference /root/reference/DataProcessing.ipynb cells 10/16/17: one
  * Twitter v1.1 status JSON per line, retweet lines carrying a full
  * `retweeted_status`, duplicate deliveries, and non-status noise for the
  * tolerant scan).
  *
  * Every structural property follows a CLOSED-FORM membership rule on the
  * original-tweet index i (0 until n), so an independent engine can
  * compute every golden count arithmetically without parsing a byte of
  * JSON — the trick that lets the full ingest + search spine be checked
  * by a SQL oracle:
  *
  *  - original tweet id i, author `1000 + i%50`, lang "tr" iff i%3==2
  *    else "en", text mentions "house" iff i%7==0;
  *  - i%5==0 lines are delivered TWICE (duplicate id_str → dedup);
  *  - i%4==0 originals have one retweet line (id `100000+i`, text
  *    "RT @…", author `10000+i`, full embedded retweeted_status);
  *  - i%9==0 originals carry a quoted_status (id `200000+i`, author
  *    `2000 + i%10`);
  *  - i%10==0 adds a delete record and a malformed line (skipped by the
  *    tolerant scan, reference cell 17's except-continue).
  *
  * The three author id spaces (1000-1049, 10000+, 2000-2009) are
  * disjoint, so the user count decomposes additively.
  */
object GoldenFixture {

  private def userJson(uid: Long): String =
    s"""{"id": $uid, "id_str": "$uid", "name": "user $uid", "screen_name": "u$uid", """ +
      s""""verified": ${uid % 2 == 0}, "followers_count": ${uid % 997}, "friends_count": ${uid % 491}, """ +
      s""""created_at": "Wed Mar 25 14:17:28 +0000 2020"}"""

  private def statusJson(id: Long, text: String, lang: String, uid: Long,
      isQuote: Boolean, quoted: Option[String], retweeted: Option[String],
      sec: Long): String = {
    val base =
      s""""id": $id, "id_str": "$id", "text": "$text", """ +
        s""""created_at": "Sun Apr 12 16:48:${"%02d".format(sec)} +0000 2020", "lang": "$lang", """ +
        s""""favorite_count": ${id % 100}, "retweet_count": ${id % 50}, """ +
        s""""quote_count": ${id % 10}, "reply_count": ${id % 7}, """ +
        s""""is_quote_status": $isQuote, "user": ${userJson(uid)}"""
    val q = quoted.map(s => s""", "quoted_status": $s""").getOrElse("")
    val r = retweeted.map(s => s""", "retweeted_status": $s""").getOrElse("")
    s"{$base$q$r}"
  }

  /** All raw lines for `n` original tweets, in deterministic order. */
  def rawLines(n: Int): Seq[String] = (0L until n).flatMap { i =>
    val lang = if (i % 3 == 2) "tr" else "en"
    val topic = if (i % 7 == 0) "the house on the hill" else "the news of the day"
    val isQuote = i % 9 == 0
    val quoted =
      if (isQuote)
        Some(statusJson(200000 + i, s"quoted insight $i", lang, 2000 + i % 10,
          isQuote = false, None, None, (i + 1) % 60))
      else None
    val orig = statusJson(i, s"tweet $i about $topic", lang, 1000 + i % 50,
      isQuote, quoted, None, i % 60)
    val dup = if (i % 5 == 0) Seq(orig) else Nil
    val rt =
      if (i % 4 == 0)
        Seq(statusJson(100000 + i, s"RT @u${1000 + i % 50}: tweet $i about $topic",
          lang, 10000 + i, isQuote = false, None, Some(orig), (i + 2) % 60))
      else Nil
    val noise =
      if (i % 10 == 0)
        Seq(s"""{"delete": {"status": {"id": $i, "id_str": "$i"}}}""",
          "this line is not json at all {{{")
      else Nil
    Seq(orig) ++ dup ++ rt ++ noise
  }

  /** Writes the fixture as one JSONL file at `path`. */
  def writeRaw(path: String, n: Int = 150): Unit =
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      (rawLines(n).mkString("\n") + "\n").getBytes("UTF-8"))
}
