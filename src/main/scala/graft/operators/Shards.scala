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

  /** First-fit-decreasing bin packing of (name, bytes) into bins of
    * `target` bytes. Deterministic (size-desc, name tie-break); a file
    * larger than `target` gets its own bin; FFD guarantees every other
    * bin's load ≤ target and uses < 2× the optimal bin count.
    */
  def binPack(sizes: Seq[(String, Long)], target: Long): Map[String, Int] = {
    require(target > 0, s"target $target must be positive")
    val loads = scala.collection.mutable.ArrayBuffer.empty[Long]
    val assign = scala.collection.mutable.Map.empty[String, Int]
    sizes.sortBy { case (n, sz) => (-sz, n) }.foreach { case (n, sz) =>
      val i = loads.indexWhere(_ + sz <= target)
      if (i >= 0) { loads(i) += sz; assign(n) = i }
      else { loads += sz; assign(n) = loads.size - 1 }
    }
    assign.toMap
  }

  /** Small-file compaction: re-pack a parquet directory's files into
    * `pack_id` partitions of ~`targetBytes` each — the maintenance
    * rewrite every long-lived corpus store needs (a streaming sink or a
    * per-micro-batch writer leaves thousands of KB-scale files whose
    * open/footer cost dominates scans at 100 TB). Same granularity as
    * Delta/Iceberg OPTIMIZE: whole input FILES are bin-packed by their
    * on-disk size (first-fit decreasing, driver-side over file METADATA
    * only — bounded by file count, never row count), rows map to their
    * pack via a broadcast equi-join on the file name (no UDF), and ONE
    * shuffle co-locates each pack so it lands as a single file in its
    * partition directory (the [[writeShards]] layout). Content is
    * untouched — the `compact_roundtrip` oracle pins read-back equality
    * — and the move is restartable: overwrite semantics, deterministic
    * assignment from the input listing.
    *
    * Returns the pack count.
    */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      targetBytes: Long): Int = {
    val fs = new org.apache.hadoop.fs.Path(inPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(inPath))
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(st => st.getPath.getName -> st.getLen).toSeq
    require(files.nonEmpty, s"no parquet files under $inPath")
    val packOf = binPack(files, targetBytes)
    val nPacks = packOf.values.max + 1
    import spark.implicits._
    val packs = broadcast(packOf.toSeq.toDF("__file", "pack_id"))
    spark.read.parquet(inPath)
      .withColumn("__file", element_at(split(input_file_name(), "/"), -1))
      .join(packs, "__file")
      .drop("__file")
      .repartition(nPacks, col("pack_id"))
      .write.mode("overwrite").partitionBy("pack_id").parquet(outPath)
    nPacks
  }
}
