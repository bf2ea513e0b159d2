package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.ILog

/** DSIR-style data selection: hashed n-gram importance weights
  * (Xie et al., "Data Selection for Language Models via Importance
  * Resampling", NeurIPS 2023). Each document is scored by how much more
  * likely its tokens are under a TARGET distribution (a trusted slice —
  * here: the high-quality/language-matched subset) than under the RAW
  * pool, using bag-of-hashed-unigram models:
  *
  *   log ŵ(doc) = Σ_tokens [ log p̂_target(bucket(tok))
  *                          − log p̂_raw(bucket(tok)) ]
  *
  * with add-1 smoothing over B hash buckets. High-scoring raw documents
  * "look like" the target domain and are kept/up-sampled.
  *
  * Determinism: buckets are md5-hashed ([[Shards.shardId]] — engine-
  * portable, unlike Spark's murmur `hash()`), and the log is [[ILog]]'s
  * fixed-point log2, so the scores are integers both engines compute
  * identically. With p̂(b) = (c(b)+1)/(N+B) the per-doc sum telescopes to
  *
  *   logw_fp20 = Σ_b∈doc [qlog2(ct(b)+1) − qlog2(cr(b)+1)]
  *             + n_tok · [qlog2(Nr+B) − qlog2(Nt+B)]
  *
  * — all-integer, no division at all.
  *
  * Scale shape: the two bucket-count tables are B rows (B=256 here —
  * the paper uses 10k buckets; both are broadcast-trivial), built by one
  * map-side-combined aggregation each; totals are ONE-row broadcasts;
  * scoring is a map-side explode + two broadcast-hash joins + one
  * per-doc sum. Nothing shuffles more than (doc_id) keys; the corpus is
  * scanned twice (model build, scoring) — the DSIR paper's own two-pass
  * shape.
  */
object Dsir {

  /** md5 hash bucket in [0, buckets) for a token column. */
  def bucket(tok: Column, buckets: Int): Column = Shards.shardId(tok, buckets)

  /** (idCol, n_tok, logw_fp20, avg_fp20) importance weights for every
    * document; `targetPred` marks the target slice (rows where the
    * predicate is true train the target model; ALL rows train the raw
    * model and are scored).
    */
  def importanceWeights(df: DataFrame, idCol: String, textCol: String,
      targetPred: Column, buckets: Int = 256): DataFrame = {
    val feats = df
      .select(col(idCol), targetPred.as("is_target"),
        explode(split(lower(col(textCol)), " ")).as("w"))
      .select(col(idCol), col("is_target"), bucket(col("w"), buckets).as("b"))
    val ct = feats.filter(col("is_target"))
      .groupBy("b").agg(count(lit(1)).as("ct"))
    val cr = feats.groupBy("b").agg(count(lit(1)).as("cr"))
    val totals = feats.agg(
      sum(when(col("is_target"), 1L).otherwise(0L)).as("nt"),
      count(lit(1)).as("nr"))
    feats
      .join(broadcast(ct), Seq("b"), "left")
      .join(broadcast(cr), Seq("b"), "left")
      .withColumn("ctp1", coalesce(col("ct"), lit(0L)) + 1L)
      .withColumn("crp1", coalesce(col("cr"), lit(0L)) + 1L)
      .withColumn("d",
        expr(ILog.qlogSqlSpark("ctp1")) - expr(ILog.qlogSqlSpark("crp1")))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tok"), sum("d").as("sd"))
      .crossJoin(broadcast(totals))
      .withColumn("ntb", col("nt") + buckets)
      .withColumn("nrb", col("nr") + buckets)
      .select(col(idCol), col("n_tok"),
        (col("sd") + col("n_tok") *
          (expr(ILog.qlogSqlSpark("nrb")) - expr(ILog.qlogSqlSpark("ntb"))))
          .as("logw_fp20"))
      .withColumn("avg_fp20", expr("logw_fp20 div n_tok"))
  }
}
