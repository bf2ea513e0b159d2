package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training: documents are (conceptually)
  * concatenated in a deterministic order and chunked into fixed
  * token-budget bins; each document is indexed by the bin its FIRST
  * token lands in (concat-and-chunk packing — the standard way training
  * pipelines fill fixed-length context windows without padding waste).
  *
  * Scale design: packing is SHARD-LOCAL. A single global running sum
  * would put the whole corpus through one task (the same single-task
  * window trap as unpartitioned pagination); instead rows hash into
  * `nShards` deterministic shards ([[Shards.shardId]] — md5, engine- and
  * partitioning-portable) and the running sum is a window per shard, so
  * the work distributes and each shard's packing is independently
  * reproducible. Each training worker then consumes its own shard's
  * bins — exactly how sharded corpora are packed in practice.
  *
  * All arithmetic is integer (token counts, floor division): any engine
  * reproduces the assignment bit-for-bit.
  */
object Pack {

  /** Adds `shard`, `bin` (shard-local, 0-based) and `bin_offset` (token
    * offset of the doc's first token within its bin) for each row.
    * `budget` is the context-window length in tokens.
    */
  def packSequences(df: DataFrame, idCol: String, tokensCol: String,
      budget: Long, nShards: Int): DataFrame =
    packSequencesBy(
      df.withColumn("shard", Shards.shardId(col(idCol), nShards)),
      idCol, tokensCol, budget)

  /** [[packSequences]] with a CALLER-SUPPLIED `shard` column — the
    * incremental-assembly shape, where the shard function must be
    * chosen so a nightly delta leaves most shards untouched (e.g. a
    * date- or id-range key) instead of the md5 spread that touches
    * every shard on any change. Packing semantics are identical:
    * shard-local running sum over the id order, integer bin math.
    */
  def packSequencesBy(df: DataFrame, idCol: String, tokensCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, s"token budget $budget must be positive")
    require(df.columns.contains("shard"),
      "packSequencesBy needs a caller-supplied shard column")
    val w = Window.partitionBy("shard").orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__cum", coalesce(sum(col(tokensCol)).over(w), lit(0L)))
      // long div + long mod: exact, portable (no doubles anywhere)
      .withColumn("bin", expr(s"__cum div ${budget}L"))
      .withColumn("bin_offset", col("__cum") % budget)
      .drop("__cum")
  }

  /** Per-bin packing report: documents and total tokens landing in each
    * (shard, bin) — the fill-efficiency view (a tot_tokens far below
    * `budget` in non-final bins means the order is fragmenting).
    */
  def binStats(packed: DataFrame, tokensCol: String): DataFrame =
    packed.groupBy("shard", "bin")
      .agg(count(lit(1)).as("n_docs"), sum(col(tokensCol)).as("tot_tokens"))
}
