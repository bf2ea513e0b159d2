package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction — the masking pass every public training
  * corpus runs before release (the Dolma toolkit's email/phone/IP regex
  * masking, Soldaini et al. 2024, arXiv:2402.00159; CCNet and
  * BigScience ROOTS ship equivalents).
  *
  * The regexes use only the portable subset shared by Java's engine
  * (Spark) and RE2 (DuckDB): character classes, bounded repetition,
  * `\b` word boundaries — no lookaround, no backreferences — so the
  * oracle twin runs the SAME patterns verbatim.
  *
  * All column math (regexp_extract_all / regexp_replace) is map-side
  * and codegen'd: at 100 TB this pass is a pure scan-transform with
  * zero shuffle, bounded by read bandwidth.
  */
object Pii {

  /** Email addresses (lowercase corpus). */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"

  /** Dotted-quad IPv4 (word-bounded so it never fires inside longer
    * number runs).
    */
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** International-prefix phone numbers, +CC-NNN-NNN-NNNN. */
  val PhoneRe = "\\+\\d{1,2}-\\d{3}-\\d{3}-\\d{4}"

  /** Occurrence count of one pattern. */
  def count(c: Column, re: String): Column =
    size(regexp_extract_all(c, lit(re), lit(0))).cast("long")

  /** Redact all three PII classes with typed placeholders. Email runs
    * first (its local part may contain digit runs), then phone, then
    * IPv4 — the three patterns are disjoint over each other's
    * replacements, so the order only matters against raw text.
    */
  def redact(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      Ipv4Re, "<IP>")
}
