package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** URL canonicalization: every noise class the canonicalizer claims to
  * strip, every value class it must preserve.
  */
class UrlsSpec extends SparkSpec {

  private def canon(urls: String*): Seq[String] = {
    import spark.implicits._
    urls.toDF("u").select(Urls.canonicalize(col("u")).as("c"))
      .collect().map(_.getString(0)).toSeq
  }

  test("scheme and host lowercase; www and fragment stripped") {
    assert(canon("HTTP://WWW.Example.COM/a#frag") === Seq("http://example.com/a"))
    assert(canon("https://Sub.WWW.example.com/a") === Seq("https://sub.www.example.com/a"))
  }

  test("default ports stripped, non-default ports kept") {
    assert(canon("http://ex.com:80/a") === Seq("http://ex.com/a"))
    assert(canon("https://ex.com:443/a") === Seq("https://ex.com/a"))
    assert(canon("http://ex.com:8080/a") === Seq("http://ex.com:8080/a"))
    // :443 is NOT default for http
    assert(canon("http://ex.com:443/a") === Seq("http://ex.com:443/a"))
  }

  test("trailing slashes trimmed from non-root paths only") {
    assert(canon("http://ex.com/a/b/") === Seq("http://ex.com/a/b"))
    assert(canon("http://ex.com/a//") === Seq("http://ex.com/a"))
    assert(canon("http://ex.com/") === Seq("http://ex.com/"))
    // empty path normalizes to '/' (RFC 3986 §6.2.3), so the root page
    // with and without the trailing slash lands in ONE dedup group
    assert(canon("http://ex.com") === Seq("http://ex.com/"))
    assert(canon("http://ex.com") === canon("http://ex.com/"))
    assert(canon("http://ex.com?a=1") === Seq("http://ex.com/?a=1"))
    // an ALL-SLASH path strips to empty and is the root too: all three
    // spellings of the root page land in one dedup group (the r13
    // ordering bug split '//' from the other two)
    assert(canon("http://ex.com//") === Seq("http://ex.com/"))
    assert(canon("http://ex.com///") === Seq("http://ex.com/"))
  }

  test("userinfo and bracketed IPv6 authorities pass through untouched") {
    // the ':'-splitting host/port regexes can't parse these shapes — the
    // contract is pass-through, never a silent truncation that would
    // merge distinct pages
    assert(canon("http://[2001:db8::1]/a") === Seq("http://[2001:db8::1]/a"))
    assert(canon("http://[2001:db8::2]/a") === Seq("http://[2001:db8::2]/a"))
    assert(canon("http://[2001:db8::1]/a") !== canon("http://[2001:db8::2]/a"))
    assert(canon("http://user:pw@Ex.COM/a") === Seq("http://user:pw@Ex.COM/a"))
    assert(canon("ftp://u@ex.com/f") === Seq("ftp://u@ex.com/f"))
  }

  test("tracking params dropped, survivors sorted, empty query dropped") {
    assert(canon("http://ex.com/a?utm_source=x&b=2&a=1") ===
      Seq("http://ex.com/a?a=1&b=2"))
    assert(canon("http://ex.com/a?b=2&a=1&ref=tw&fbclid=z&gclid=y") ===
      Seq("http://ex.com/a?a=1&b=2"))
    assert(canon("http://ex.com/a?utm_campaign=c") === Seq("http://ex.com/a"))
    assert(canon("http://ex.com/a?") === Seq("http://ex.com/a"))
    // a non-tracking param whose VALUE merely contains 'utm' survives
    assert(canon("http://ex.com/a?q=utm_test") === Seq("http://ex.com/a?q=utm_test"))
    // 'referrer=' is not 'ref=' — prefix match must not over-strip
    assert(canon("http://ex.com/a?referrer=x") === Seq("http://ex.com/a?referrer=x"))
  }

  test("fragment stripped before query parsing; query kept intact") {
    assert(canon("http://ex.com/a?b=2#sec?utm_source=x") === Seq("http://ex.com/a?b=2"))
  }

  test("non-URL strings pass through untouched") {
    assert(canon("not a url", "/relative/path", "ex.com/no-scheme") ===
      Seq("not a url", "/relative/path", "ex.com/no-scheme"))
  }

  test("idempotent: canonicalizing a canonical url is the identity") {
    val once = canon("HTTP://WWW.Ex.COM:80/a/b/?utm_source=x&z=1&a=2#f")
    assert(once === Seq("http://ex.com/a/b?a=2&z=1"))
    assert(canon(once.head) === once)
  }
}
