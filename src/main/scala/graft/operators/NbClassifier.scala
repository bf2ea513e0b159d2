package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.ILog

/** Model-based document quality classifier: multinomial Naive Bayes with
  * add-1 smoothing over unigram counts — the classic "train a cheap
  * classifier on a curated corpus, score the crawl" filtering step
  * (GPT-3 / LLaMA-style quality filters are linear models of exactly
  * this shape; fastText's supervised mode is the same bag-of-words
  * log-linear scorer).
  *
  * Everything is integer fixed-point: per-token class counts feed
  * [[graft.functions.ILog]]'s Mitchell qlog2, so the per-doc score
  *
  *   score(d) = qlog2(Dpos) − qlog2(Dneg)
  *            + Σ_t [ qlog2(c_pos(t)+1) − qlog2(Npos+V)
  *                  − qlog2(c_neg(t)+1) + qlog2(Nneg+V) ]
  *
  * is bit-identical on Spark, DuckDB, and the JVM — no libm, no FP sum.
  *
  * Scale shape (the 100 TB story): the class-count table is
  * VOCAB-bounded (one hash agg with map-side combine over the training
  * slice), the corpus scoring pass is one token-keyed equi-join against
  * that table plus one doc-keyed aggregation — the same two-shuffle
  * profile as the bigram LM scorer; scalars (class totals, vocab size,
  * doc priors) ride along as 1-row broadcasts. Nothing is quadratic in
  * documents and nothing collects to the driver.
  */
object NbClassifier {

  /** Vocab-bounded per-token class counts from a labeled token stream
    * `(doc_id, w, is_pos)`.
    */
  def tokenClassCounts(trainTokens: DataFrame): DataFrame =
    trainTokens.groupBy("w").agg(
      sum(when(col("is_pos"), 1L).otherwise(0L)).as("cp"),
      sum(when(col("is_pos"), 0L).otherwise(1L)).as("cn"))

  /** 1-row model scalars: class token totals, vocab size, doc priors. */
  def modelScalars(trainTokens: DataFrame): DataFrame =
    trainTokens.agg(
      sum(when(col("is_pos"), 1L).otherwise(0L)).as("npos"),
      sum(when(col("is_pos"), 0L).otherwise(1L)).as("nneg"),
      countDistinct(col("w")).as("vsz"),
      countDistinct(when(col("is_pos"), col("doc_id"))).as("dpos"),
      countDistinct(when(!col("is_pos"), col("doc_id"))).as("dneg"))

  /** Score every document of `tokens` (doc_id, w) against the trained
    * model. Unseen tokens fall back to the add-1 floor (qlog2(1) = 0, so
    * the OOV weight collapses to the constant qlog2(Nneg+V) −
    * qlog2(Npos+V)) through the left join's COALESCE.
    *
    * The qlog2 trees run once per VOCAB row (`wts`) and once per model
    * (`consts`) — never per corpus token: the hot scoring pass is a
    * plain lookup + coalesce + sum, which is the point at "score the
    * crawl" scale.
    *
    * Output: (doc_id, n_tokens, score_fp20, pred_pos).
    */
  def score(tokens: DataFrame, counts: DataFrame, scalars: DataFrame): DataFrame = {
    val wts = counts.crossJoin(broadcast(scalars))
      .select(col("w"),
        (expr(ILog.qlogSqlSpark("(cp + 1)")) -
          expr(ILog.qlogSqlSpark("(npos + vsz)")) -
          expr(ILog.qlogSqlSpark("(cn + 1)")) +
          expr(ILog.qlogSqlSpark("(nneg + vsz)"))).as("wt"))
    val consts = scalars.select(
      (expr(ILog.qlogSqlSpark("(nneg + vsz)")) -
        expr(ILog.qlogSqlSpark("(npos + vsz)"))).as("oov_wt"),
      (expr(ILog.qlogSqlSpark("dpos")) -
        expr(ILog.qlogSqlSpark("dneg"))).as("prior"))
    tokens
      .join(wts, Seq("w"), "left")
      .crossJoin(broadcast(consts))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        (first(col("prior")) +
          sum(coalesce(col("wt"), col("oov_wt")))).as("score_fp20"))
      .withColumn("pred_pos", col("score_fp20") > 0)
  }
}
