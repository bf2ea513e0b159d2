package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic training-shard assignment and the shard writer/reader.
  *
  * Shard id is a pure function of the row key via md5 (like
  * [[Sampling]]): re-running the job, changing cluster size, or
  * re-partitioning the input never moves a row to a different shard, and
  * any engine can recompute the assignment (Spark's `hash()` is
  * murmur3-specific). Training jobs read shards as directory partitions —
  * `shard=` pruning means a worker reads only its shard's files.
  */
object Shards {

  /** Shard id in [0, n): first 8 md5 hex digits as an integer, mod n.
    * (8 hex digits = 32 bits — exact in a long, uniform via md5
    * avalanche.)
    */
  def shardId(keyCol: Column, n: Int): Column = {
    require(n > 0, s"shard count $n must be positive")
    conv(substring(md5(keyCol.cast("string")), 1, 8), 16, 10).cast("long") % n
  }

  /** Write `df` as `n` directory-partitioned shards under `path`.
    * One shuffle (repartition by shard) so each shard is a small number
    * of whole files rather than `n` fragments per input task.
    */
  def writeShards(df: DataFrame, keyCol: String, n: Int, path: String): Unit =
    df.withColumn("shard", shardId(col(keyCol), n))
      .repartition(col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)

  /** Read one shard back — the `shard = i` filter prunes to that shard's
    * directory (assert: PartitionFilters in the scan).
    */
  def readShard(spark: SparkSession, path: String, shard: Int): DataFrame =
    spark.read.parquet(path).filter(col("shard") === shard)
}
