package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.ILog

/** Punkt-style unsupervised sentence-boundary learning — the type-based
  * abbreviation stage of Kiss & Strunk, "Unsupervised Multilingual
  * Sentence Boundary Detection" (Computational Linguistics 32(4), 2006)
  * — re-expressed as corpus aggregations in integer fixed point.
  *
  * The reference pipeline tokenizes with NLTK, whose default sentence
  * splitter is a PRE-TRAINED Punkt model (closing the standing C6
  * waiver direction in COVERAGE.md): Punkt decides whether a period
  * ends a sentence by first LEARNING, from nothing but corpus counts,
  * which period-final types are abbreviations. That stage is literally
  * a group-by over the token stream plus a per-type log-likelihood —
  * a perfect fit for distributed aggregation, and the model it emits
  * is vocabulary-bounded (broadcastable at any corpus scale).
  *
  * Deviations from the paper, chosen for cross-engine bit-exactness
  * (the same reasoning as [[graft.functions.ILog]] / text_lm_interp):
  *
  *  - all logs are Mitchell fp20 log2 ([[ILog.qlog2Fp20]]), so the
  *    Dunning log-likelihood ratio and the final score are BIGINTs that
  *    Spark and DuckDB compute bit-identically;
  *  - the paper's length factor exp(−len) becomes 2^−len (log2 domain:
  *    an exact integer subtraction; monotone-equivalent — it only
  *    rescales the score axis);
  *  - the abbreviation threshold 0.3 becomes qlog2(3) − qlog2(10),
  *    i.e. log2(0.3) in the SAME approximate log system
  *    ([[ScoreThresholdFp20]]);
  *  - only the type-based stage is modelled (abbreviation detection +
  *    orthographic capital-after-period evidence at split time); the
  *    token-based collocation/starter refinements are out of scope and
  *    documented in COVERAGE.md.
  *
  * Domain: the llr takes qlog2, so it must stay below 2^44 — that holds
  * to ~2^22 occurrences of one type (llr ≈ 2·cnt·Δlog2·2^20); corpora
  * past that shard their type counts first, and the SQL faces fail
  * LOUDLY (qlog2's raise), never silently.
  *
  * The test corpus is periodless word soup, so — exactly like the
  * synthetic image stats deriving pixel payloads from doc_id
  * ([[graft.multimodal.Multimodal]]) — a deterministic sentence
  * structure is injected in token space ([[derivedTokens]]): designated
  * vocabulary words always carry a trailing period (true abbreviations)
  * and a (doc_id·131 + pos) % 9 rule ends sentences, with the following
  * token capitalized in BOTH cases, so learned abbreviation knowledge —
  * not capitalization alone — is what separates boundaries from
  * abbreviations downstream.
  */
object Punkt {

  /** Vocabulary words the derived corpus always abbreviates (they occur
    * period-final ~100% of the time — the statistic must find them).
    */
  val AbbrevWords: Seq[String] = Seq("agg", "merge", "row")

  /** Vocabulary words the derived corpus plants as frequent sentence
    * STARTERS: an extra boundary lands before ~1/3 of their occurrences
    * ([[StarterMod]]), so they follow sentence ends far above the
    * corpus base rate — the token-stage statistic must find them.
    */
  val StarterWords: Seq[String] = Seq("the", "data")

  /** Sentence-end rule for the derived corpus. */
  val SentenceMod = 9

  /** Planted-starter rule modulus: a period also lands on the token at
    * position p when the NEXT token is a [[StarterWords]] member and
    * (doc_id·131 + p) % 3 == 1 (residue disjoint from [[SentenceMod]]'s
    * multiples, which are ≡ 0 mod 3).
    */
  val StarterMod = 3

  /** log2(0.3) in fp20, in the same approximate system as the scores:
    * qlog2(3) − qlog2(10).
    */
  val ScoreThresholdFp20: Long = ILog.qlog2Fp20(3) - ILog.qlog2Fp20(10)

  /** 20·2^20 — subtracted when taking qlog2 OF an fp20 quantity. */
  val Fp20Bias: Long = 20L * 1048576L

  /** Derived sentence-structured token stream: (doc_id, pos, w).
    * Tokens are the document's whitespace tokens with periods appended
    * by the two rules above and the first character uppercased at
    * document start and after every period (abbreviation or boundary —
    * as in real prose, "Mr. Smith", so capitalization alone cannot
    * separate the two).
    */
  def derivedTokens(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"),
      posexplode(split(lower(col("text")), " ")).as(Seq("pos", "w0")))
    val win = Window.partitionBy("doc_id").orderBy("pos")
    tok
      .withColumn("endp", col("w0").isin(AbbrevWords: _*) ||
        (col("doc_id") * 131 + col("pos")) % SentenceMod === 0 ||
        (lead(col("w0"), 1).over(win).isin(StarterWords: _*) &&
          (col("doc_id") * 131 + col("pos")) % StarterMod === 1))
      .withColumn("w1", concat(col("w0"),
        when(col("endp"), lit(".")).otherwise(lit(""))))
      .withColumn("cap", coalesce(lag(col("endp"), 1).over(win), lit(true)))
      .select(col("doc_id"), col("pos"),
        when(col("cap"),
          concat(upper(substring(col("w1"), 1, 1)), expr("substring(w1, 2)")))
          .otherwise(col("w1")).as("w"))
  }

  /** (doc_id, pos, w, hasp, ty): period-final flag and the normalized
    * type (lowercased, one trailing period stripped).
    */
  private def typedTokens(tokens: DataFrame): DataFrame =
    tokens
      .withColumn("hasp", col("w").endsWith("."))
      .withColumn("ty", lower(when(col("hasp"),
        expr("substring(w, 1, length(w) - 1)")).otherwise(col("w"))))

  /** Type-stage abbreviation model over a (doc_id, pos, w) token
    * stream. One row per type seen at least once period-final:
    * (ty, cnt_total, cnt_period, llr_fp20, score_fp20, is_abbrev) —
    * all counts BIGINT, scores fp20 BIGINT (NULL when the llr is
    * non-positive, i.e. the type co-occurs with the period LESS than
    * the null model expects — never an abbreviation).
    *
    * Shuffle shape: one vocabulary-keyed aggregation over the token
    * stream plus a 1-row corpus-scalar broadcast — type-space state,
    * scale-free in documents.
    */
  def trainAbbrevs(tokens: DataFrame): DataFrame = {
    val types = typedTokens(tokens).groupBy("ty").agg(
      count(lit(1)).as("cnt_total"),
      sum(when(col("hasp"), 1L).otherwise(0L)).as("cnt_period"))
    // Corpus scalars fold from the TYPE table (sums of per-type counts
    // over ALL types, candidates and not), not a second scan of the
    // token stream: the trainer reads the corpus exactly once.
    val scal = types.agg(
      sum("cnt_total").as("n_tok"),
      sum("cnt_period").as("n_period"))
    scoreTypes(types, scal)
  }

  /** Scores candidate types against corpus scalars — split out so the
    * spec can drive it with hand counts. `types`: (ty, cnt_total,
    * cnt_period); `scal`: one row (n_tok, n_period).
    */
  def scoreTypes(types: DataFrame, scal: DataFrame): DataFrame = {
    def L(e: String) = ILog.qlogSqlSpark(e)
    // log2(0.99) and log2(0.01) in fp20 via the same qlog2 system.
    val l99 = ILog.qlog2Fp20(99) - ILog.qlog2Fp20(100)
    val l01 = ILog.qlog2Fp20(1) - ILog.qlog2Fp20(100)
    types
      .filter(col("cnt_period") >= 1 && length(col("ty")) >= 1)
      .crossJoin(broadcast(scal))
      .withColumn("cwp", col("cnt_total") - col("cnt_period"))
      .withColumn("len",
        length(translate(col("ty"), ".", "")).cast("long"))
      .withColumn("np",
        (length(col("ty")) - length(translate(col("ty"), ".", "")) + 1)
          .cast("long"))
      // Dunning llr of "period follows this type at rate 0.99" vs the
      // corpus base rate, -2·(null − alt), in fp20.
      .withColumn("llr_fp20", expr(
        "CASE WHEN n_tok - n_period < 1 THEN NULL ELSE " +
          s"2 * ((cnt_period * $l99 + cwp * $l01) - " +
          s"(cnt_period * (${L("n_period")} - ${L("n_tok")}) + " +
          s"cwp * (${L("n_tok - n_period")} - ${L("n_tok")}))) END"))
      // score = llr · 2^−len · np · len^−cwp, log2 fp20 domain; the
      // qlog2 of the fp20 llr re-biases by 20·2^20.
      .withColumn("score_fp20", expr(
        "CASE WHEN llr_fp20 IS NULL OR llr_fp20 < 1 THEN NULL ELSE " +
          s"${L("llr_fp20")} - $Fp20Bias + ${L("np")} - len * 1048576 - " +
          s"cwp * ${L("len")} END"))
      .withColumn("is_abbrev",
        coalesce(col("score_fp20") >= ScoreThresholdFp20, lit(false)))
      .select("ty", "cnt_total", "cnt_period", "llr_fp20", "score_fp20",
        "is_abbrev")
  }

  /** Token-stage frequent-sentence-starter model (the Kiss & Strunk
    * refinement the type stage feeds): a type is a starter when it
    * follows UNAMBIGUOUS sentence boundaries — document starts and
    * periods whose type is NOT a learned abbreviation — well above the
    * corpus base rate. Dunning llr of "this type starts sentences at
    * rate ≥ 1/4" (log2(1/4) = −2 and log2(3/4) = qlog2(3) − qlog2(4),
    * both exact in the fp20 system) vs the base rate; is_starter when
    * the llr is positive — the planted-vs-ordinary rate gap
    * (~0.37 vs ~0.12 around a ~0.175 crossover) makes the sign
    * decisive, never a knife-edge.
    *
    * One row per type seen at least once after a boundary:
    * (ty, cnt_total, cnt_start, llr_fp20, is_starter). Same shuffle
    * shape as [[trainAbbrevs]] plus the per-document lag window:
    * vocabulary-keyed state, scale-free in documents.
    */
  def trainStarters(tokens: DataFrame, abbrevs: DataFrame): DataFrame = {
    val win = Window.partitionBy("doc_id").orderBy("pos")
    val ab = abbrevs.select(col("ty").as("prev_ty"), lit(true).as("p_ab"))
    val t = typedTokens(tokens)
      .withColumn("p_hasp", lag(col("hasp"), 1).over(win))
      .withColumn("prev_ty", lag(col("ty"), 1).over(win))
      .join(broadcast(ab), Seq("prev_ty"), "left")
      .withColumn("afb", col("p_hasp").isNull ||
        (col("p_hasp") && col("p_ab").isNull))
    val stypes = t.groupBy("ty").agg(
      count(lit(1)).as("cnt_total"),
      sum(when(col("afb"), 1L).otherwise(0L)).as("cnt_start"))
    val scal = stypes.agg(
      sum("cnt_total").as("n_tok"),
      sum("cnt_start").as("n_ab"))
    scoreStarterTypes(stypes, scal)
  }

  /** Starter scoring against corpus scalars — split out for the spec.
    * `stypes`: (ty, cnt_total, cnt_start); `scal`: (n_tok, n_ab).
    */
  def scoreStarterTypes(stypes: DataFrame, scal: DataFrame): DataFrame = {
    def L(e: String) = ILog.qlogSqlSpark(e)
    val l14 = -2L * 1048576L                              // log2(1/4)
    val l34 = ILog.qlog2Fp20(3) - ILog.qlog2Fp20(4)       // log2(3/4)
    stypes
      .filter(col("cnt_start") >= 1 && length(col("ty")) >= 1)
      .crossJoin(broadcast(scal))
      .withColumn("cns", col("cnt_total") - col("cnt_start"))
      .withColumn("llr_fp20", expr(
        "CASE WHEN n_tok - n_ab < 1 THEN NULL ELSE " +
          s"2 * ((cnt_start * $l14 + cns * $l34) - " +
          s"(cnt_start * (${L("n_ab")} - ${L("n_tok")}) + " +
          s"cns * (${L("n_tok - n_ab")} - ${L("n_tok")}))) END"))
      .withColumn("is_starter",
        coalesce(col("llr_fp20") >= 1, lit(false)))
      .select("ty", "cnt_total", "cnt_start", "llr_fp20", "is_starter")
  }

  /** Per-document sentence segmentation using a learned abbreviation
    * set: a boundary is a period-final token whose successor starts
    * with a capital and whose type is NOT a learned abbreviation (plus
    * the document's last token — an unterminated tail is a sentence).
    * Returns (doc_id, n_tokens, n_sentences, max_sent_tokens).
    *
    * `abbrevs` needs a `ty` column (pre-filtered to is_abbrev) — it is
    * vocabulary-bounded, so the join broadcasts; the windows partition
    * by doc_id, the standard per-document token-pipeline shape.
    */
  def sentenceStats(tokens: DataFrame, abbrevs: DataFrame): DataFrame =
    segment(tokens, abbrevs, None)

  /** [[sentenceStats]] plus the token-stage refinement: a period AFTER
    * a learned abbreviation still opens a boundary when the successor's
    * type is a learned frequent sentence starter ("He works at Merge.
    * The next day …"). `starters` needs a `ty` column (pre-filtered to
    * is_starter) — vocabulary-bounded, broadcast like the abbrev set.
    */
  def sentenceStatsFull(tokens: DataFrame, abbrevs: DataFrame,
      starters: DataFrame): DataFrame =
    segment(tokens, abbrevs, Some(starters))

  private def segment(tokens: DataFrame, abbrevs: DataFrame,
      starters: Option[DataFrame]): DataFrame = {
    val win = Window.partitionBy("doc_id").orderBy("pos")
    val ab = abbrevs.select(col("ty"), lit(true).as("is_ab"))
    val base = typedTokens(tokens)
      .join(broadcast(ab), Seq("ty"), "left")
      .withColumn("nxt", lead(col("w"), 1).over(win))
    val (joined, starterOverride) = starters match {
      case Some(st) =>
        val s = st.select(col("ty").as("nxt_ty"), lit(true).as("is_st"))
        (base.withColumn("nxt_ty", lead(col("ty"), 1).over(win))
          .join(broadcast(s), Seq("nxt_ty"), "left"),
          col("is_st").isNotNull)
      case None => (base, lit(false))
    }
    val b = joined
      .withColumn("boundary", col("nxt").isNull ||
        (col("hasp") && substring(col("nxt"), 1, 1).between("A", "Z") &&
          (col("is_ab").isNull || starterOverride)))
      .withColumn("sidx", coalesce(
        sum(when(col("boundary"), 1L).otherwise(0L))
          .over(win.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    b.groupBy("doc_id", "sidx").agg(count(lit(1)).as("stoks"))
      .groupBy("doc_id").agg(
        sum("stoks").as("n_tokens"),
        count(lit(1)).as("n_sentences"),
        max("stoks").as("max_sent_tokens"))
  }

  /** JVM twin of [[scoreTypes]]'s per-type arithmetic, for the spec:
    * returns (llr_fp20, score_fp20, is_abbrev) with None mirroring the
    * SQL NULLs.
    */
  def scoreType(cntTotal: Long, cntPeriod: Long, nTok: Long,
      nPeriod: Long, ty: String): (Option[Long], Option[Long], Boolean) = {
    val cwp = cntTotal - cntPeriod
    val len = ty.count(_ != '.').toLong
    val np = ty.count(_ == '.').toLong + 1
    val l99 = ILog.qlog2Fp20(99) - ILog.qlog2Fp20(100)
    val l01 = ILog.qlog2Fp20(1) - ILog.qlog2Fp20(100)
    if (nTok - nPeriod < 1) (None, None, false)
    else {
      def L(n: Long) = ILog.qlog2Fp20(n)
      val llr = 2 * ((cntPeriod * l99 + cwp * l01) -
        (cntPeriod * (L(nPeriod) - L(nTok)) +
          cwp * (L(nTok - nPeriod) - L(nTok))))
      if (llr < 1) (Some(llr), None, false)
      else {
        val score = L(llr) - Fp20Bias + L(np) - len * 1048576L -
          cwp * L(len)
        (Some(llr), Some(score), score >= ScoreThresholdFp20)
      }
    }
  }

  /** JVM twin of [[scoreStarterTypes]]'s per-type arithmetic. */
  def scoreStarter(cntTotal: Long, cntStart: Long, nTok: Long,
      nAb: Long): (Option[Long], Boolean) = {
    if (nTok - nAb < 1) (None, false)
    else {
      def L(n: Long) = ILog.qlog2Fp20(n)
      val l14 = -2L * 1048576L
      val l34 = ILog.qlog2Fp20(3) - ILog.qlog2Fp20(4)
      val cns = cntTotal - cntStart
      val llr = 2 * ((cntStart * l14 + cns * l34) -
        (cntStart * (L(nAb) - L(nTok)) + cns * (L(nTok - nAb) - L(nTok))))
      (Some(llr), llr >= 1)
    }
  }
}
