package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.ILog

/** Per-document token-entropy quality signal, in integer fixed point.
  *
  * Shannon entropy over the document's token histogram,
  * H = log2 N − (1/N)·Σ c·log2 c, kept as the INTEGER numerator
  *
  *   ent_fp20 = N·qlog2(N) − Σ c·qlog2(c)   (≈ N·H in 2^-20 bits)
  *
  * with [[ILog]]'s Mitchell fixed-point log2, so Spark and DuckDB agree
  * bit-for-bit (no libm). Low average entropy = repetitive/boilerplate
  * text (a template page re-using a handful of tokens scores near 0; a
  * document of all-distinct tokens scores exactly qlog2(N) per token) —
  * the information-theoretic complement of the Gopher repetition
  * coverage signals ([[Repetition]]): coverage catches ONE dominant
  * n-gram, entropy catches distributional collapse overall.
  *
  * Scale shape: one map-side explode, one (doc_id, token) count with
  * map-side combine, one per-doc sum — two shuffles, both keyed by
  * doc_id(+token), no windows, no driver state. N = Σc falls out of the
  * same aggregation, so the corpus is scanned once.
  */
object InfoStats {

  /** (idCol, n_tokens, ent_fp20, avg_fp20): total and per-token entropy
    * numerators in 2^-20-bit units. Empty docs (no tokens after split)
    * are absent from the output, like every tokenizing query here.
    */
  def tokenEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), explode(split(lower(col(textCol)), " ")).as("w"))
      .groupBy(idCol, "w").agg(count(lit(1)).as("c"))
      .withColumn("clogc", col("c") * expr(ILog.qlogSqlSpark("c")))
      .groupBy(idCol)
      .agg(sum("c").as("n_tokens"), sum("clogc").as("s"))
      .select(col(idCol), col("n_tokens"),
        (col("n_tokens") * expr(ILog.qlogSqlSpark("n_tokens")) - col("s"))
          .as("ent_fp20"))
      .withColumn("avg_fp20", expr("ent_fp20 div n_tokens"))
}
