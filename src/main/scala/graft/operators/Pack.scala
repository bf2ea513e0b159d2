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

  /** Per-EPOCH training order over the packed bins: every epoch, each
    * (shard, bin) context window gets a fresh pseudo-random position —
    * the global shuffle every multi-epoch run needs so batch
    * composition decorrelates across epochs — WITHOUT materializing a
    * shuffled copy of the corpus per epoch. The order is a pure
    * function of (epoch, shard, bin) via md5 (the [[Shards.shardId]] /
    * curriculum_order key family): any worker recomputes its own read
    * order and seeks to its bins by (shard, bin) pointer; re-running
    * the job, resizing the cluster, or re-partitioning never changes
    * who reads what when.
    *
    * `worker` re-shards the bins per epoch (first 8 md5 hex digits of
    * the SAME key, mod `workers`) so an epoch's order is also a fresh
    * bin→worker assignment; `pos` is the worker's 1-based sequential
    * read position. The rank window partitions by (epoch, worker) —
    * per-worker state, the honest distribution at cluster scale (one
    * worker's epoch playlist must serialize SOMEWHERE; it is bounded by
    * bins/workers, never the corpus).
    *
    * Input is [[binStats]] output (or anything carrying shard + bin);
    * all other columns pass through.
    */
  def epochOrder(bins: DataFrame, epochs: Int, workers: Int): DataFrame = {
    require(epochs > 0, s"epochs ($epochs) must be positive")
    require(workers > 0, s"workers ($workers) must be positive")
    val keyed = bins
      .withColumn("epoch",
        explode(array((0 until epochs).map(i => lit(i.toLong)): _*)))
      .withColumn("__okey", md5(concat(
        col("epoch").cast("string"), lit(":"),
        col("shard").cast("string"), lit(":"),
        col("bin").cast("string"))))
      .withColumn("worker",
        conv(substring(col("__okey"), 1, 8), 16, 10).cast("long") % workers)
    val w = Window.partitionBy("epoch", "worker")
      .orderBy(col("__okey"), col("shard"), col("bin"))
    keyed
      .withColumn("pos", row_number().over(w).cast("long"))
      .drop("__okey")
  }
}
