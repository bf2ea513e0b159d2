package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** PII detection/redaction: portable-regex matching and placeholder
  * substitution.
  */
class PiiSpec extends SparkSpec {

  private def run(texts: String*): Seq[(Long, Long, Long, String)] = {
    import spark.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
      .orderBy("id")
      .select(
        Pii.count(col("t"), Pii.EmailRe),
        Pii.count(col("t"), Pii.Ipv4Re),
        Pii.count(col("t"), Pii.PhoneRe),
        Pii.redact(col("t")))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq
  }

  test("each class detected and redacted with its placeholder") {
    val Seq(r) = run("mail bob.smith+x@mail.example.org or 192.168.0.1 or +1-555-123-4567 end")
    assert(r === ((1L, 1L, 1L, "mail <EMAIL> or <IP> or <PHONE> end")))
  }

  test("multiple occurrences all counted and replaced") {
    val Seq(r) = run("a@b.com c@d.net 10.0.0.1 10.0.0.2")
    assert(r === ((2L, 2L, 0L, "<EMAIL> <EMAIL> <IP> <IP>")))
  }

  test("no false positives on plain text, versions, short number runs") {
    val Seq(r) = run("version 1.2 costs 3.50 at example.com on port 8080")
    assert(r === ((0L, 0L, 0L, "version 1.2 costs 3.50 at example.com on port 8080")))
  }

  test("ip word boundary: no match inside longer digit runs") {
    val Seq(r) = run("serial 1234.5.6.78901 ok")
    assert(r._2 === 0L)
  }

  test("redaction order: phone is not re-matched as ip fragments") {
    val Seq(r) = run("dial +12-345-678-9012 now")
    assert(r === ((0L, 0L, 1L, "dial <PHONE> now")))
  }
}
