package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column builders.
  *
  * Re-expresses the reference's keyword pipeline (tokenize → lowercase →
  * alnum filter → stopword drop; `/root/reference/cache.py:215-218`) as pure
  * Catalyst column expressions (whole-stage-codegen friendly — no UDFs), plus
  * the training-data-pipeline text operators (language ID, quality scoring,
  * fingerprinting, shingling) that a 100 TB corpus job needs.
  *
  * All builders are deterministic and engine-portable: every formula has an
  * exact ANSI-SQL twin used by the DuckDB oracle (see [[graft.queries]]).
  */
object Text {

  /** NLTK's English stopword list (179 words), vendored as a resource for
    * parity with the reference (`cache.py:14,227` uses
    * `stopwords.words('english')`). Loaded once; order preserved.
    */
  val StopWords: Seq[String] = {
    val in = getClass.getResourceAsStream("/graft/nltk_english_stopwords.txt")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .map(_.trim).filter(_.nonEmpty).toList
    finally in.close()
  }

  /** SQL-literal form of [[StopWords]] for oracle formulations
    * (apostrophes in contractions like don't escaped as '' for ANSI SQL).
    */
  val StopWordsSql: String =
    StopWords.map(w => "'" + w.replace("'", "''") + "'").mkString("(", ",", ")")

  /** Whitespace tokenizer over lowercased text (reference C5/C6). */
  def tokens(text: Column): Column = split(lower(text), " ")

  /** Tokens that are alphanumeric and not stopwords (reference C7/C8). */
  def keywordTokens(text: Column): Column =
    filter(tokens(text), t => t.rlike("^[a-z0-9]+$") && !t.isin(StopWords: _*))

  /** Word bigram shingles, 1-based `element_at` to mirror DuckDB list
    * indexing: shingle i = tokens(i) ++ " " ++ tokens(i+1).
    */
  def shingles(text: Column): Column = {
    val ws = tokens(text)
    transform(
      sequence(lit(1), size(ws) - 1),
      i => concat_ws(" ", element_at(ws, i), element_at(ws, i + 1)))
  }

  /** MinHash component: min over shingles of md5(seed || shingle).
    * md5-hex is byte-identical across engines, unlike xxhash64/murmur.
    */
  def minhash(shingleArr: Column, seed: Int): Column =
    array_min(transform(shingleArr, s => md5(concat(lit(seed.toString), s))))

  /** Document fingerprint: md5 of the sorted distinct token set — robust to
    * token order and duplication (canonical "bag of words" identity).
    */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))))

  /** Count of tokens matching an English stopword — the language-ID signal. */
  def stopwordHits(text: Column): Column =
    size(filter(tokens(text), t => t.isin(StopWords: _*))).cast("long")

  /** Heuristic language ID: ≥10% of tokens are English stopwords → "en".
    * Integer arithmetic only, so the oracle twin is bit-identical.
    */
  def langId(text: Column): Column =
    when(stopwordHits(text) * 10 >= size(tokens(text)).cast("long"), lit("en"))
      .otherwise(lit("und"))

  /** NLTK-word_tokenize-compatible tokenizer for the common cases: word
    * runs and single punctuation marks become tokens; English clitic
    * contractions split the Treebank way — "don't" → [do, n't], "it's" →
    * [it, 's]; letter-dot abbreviations stay whole mid-sentence ("the
    * U.S. economy" → [the, U.S., economy]) with the Treebank final-period
    * detachment at string end ("to the U.S." → [to, the, U.S, .]);
    * internal-period words stay attached regardless of head length
    * ("example.com", "a.com", "3.14" are each one token — Treebank only
    * detaches the final period); and
    * straight double quotes convert directionally the Treebank way
    * (opening " → ``, closing " → '') (reference `cache.py:16,216`;
    * fixtures in FunctionsSpec assert real NLTK outputs). Remaining
    * documented divergence from Punkt+Treebank: Punkt's learned
    * sentence-boundary model — single-dot abbreviations like "Mr." and
    * sentence splits inside multi-sentence strings follow Punkt's corpus
    * statistics, which a closed-form regex intentionally doesn't emulate
    * (COVERAGE.md records this as the final tokenizer delta).
    */
  def wordTokenize(text: Column): Column = {
    // Treebank normalization pipeline, as column expressions:
    // 1. directional quotes: " after start/space/open-bracket opens (``),
    //    any other " closes ('')
    val quoted = regexp_replace(
      regexp_replace(text, "(^|[ \\(\\[{<])\"", "$1 `` "),
      "\"", " '' ")
    // 2. final-period detachment: a trailing abbreviation's last dot
    //    becomes its own token at string end (U.S. → U.S + .)
    val finalDot = regexp_replace(quoted,
      "([A-Za-z]\\.[A-Za-z]+)\\.\\s*$", "$1 .")
    // 3. detach clitics (space before n't / 's-family)
    val detached = regexp_replace(
      regexp_replace(finalDot, "(?i)(\\w)(n't)\\b", "$1 $2"),
      "(?i)(\\w)('s|'re|'ve|'ll|'d|'m)\\b", "$1 $2")
    // 4. extract: quote marks, clitics, letter-dot abbreviations, and
    //    internal-period words take precedence over the generic word run /
    //    single punctuation. `\w+(?:\.\w+)+` keeps ANY internal-period
    //    word attached (a.com, example.com, 3.14, e.g-without-final-dot)
    //    the way Treebank does — it only ever detaches the FINAL period
    //    (step 2 above); a single-letter-head-only alternative would split
    //    example.com but not a.com.
    regexp_extract_all(detached,
      lit("(?i)``|''|n't|'(?:s|re|ve|ll|d|m)\\b|(?:[a-z]\\.){2,}[a-z]?|\\w+(?:\\.\\w+)+|\\w+|[^\\w\\s]"),
      lit(0))
  }

  /** BPE-ish token count: alpha runs and digit runs count separately. */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+"), lit(0))).cast("long")

  /** PII/URL scrubbing: mask URLs then long digit runs (ids, phone
    * numbers) with placeholder tokens — the redaction pass a corpus takes
    * before training. Order matters: URL masking first so its digits
    * aren't half-replaced. Patterns are RE2-simple so Java and DuckDB
    * regex engines agree.
    */
  def scrub(text: Column): Column =
    regexp_replace(
      regexp_replace(text, "https?://[^ ]+", "<URL>"),
      "[0-9]{4,}", "<NUM>")

  /** Count of characters of lower(text) outside [a-z0-9 ] — the
    * punctuation-density quality signal. Computed as
    * `length(l) − |chars deleted by translate|`… i.e.
    * `length(translate(l, "a…z0…9 ", ""))`: translate DELETES the 37
    * listed chars in one codegen'd char-map pass, so what remains is
    * exactly the codepoints `[^a-z0-9 ]` matches — bit-identical to the
    * regex count, at none of its cost. The regex form
    * (`size(regexp_extract_all(l, "[^a-z0-9 ]", 0))`) materializes a
    * per-match UTF8String ARRAY — measured 69 s for 500 k docs at sf10
    * (the whole catalog's worst per-byte cost; round-11 bisection in
    * BASELINE.md, reproducible via `graft.tools.ProfileTQ`) vs ~1 s
    * for the translate scan.
    */
  def punctCount(text: Column): Column =
    length(translate(lower(text),
      "abcdefghijklmnopqrstuvwxyz0123456789 ", "")).cast("long")

}
