package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Deterministic shard assignment + partitioned shard IO. */
class ShardsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = (1L to 500L).map(i => (i, s"text $i")).toDF("id", "text")

  test("shard assignment is deterministic and partitioning-invariant") {
    val a = docs.select($"id", Shards.shardId($"id", 8).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = docs.repartition(13).select($"id", Shards.shardId($"id", 8).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
    assert(a.values.forall(s => s >= 0 && s < 8))
    assert(a.values.toSet.size === 8) // all shards populated at n=500
  }

  test("writeShards partitions the rows; shards are a disjoint cover") {
    val path = tmpDir("shards") + "/out"
    Shards.writeShards(docs, "id", 4, path)
    val back = spark.read.parquet(path)
    assert(back.count() === 500)
    val perShard = (0 until 4).map(i =>
      Shards.readShard(spark, path, i).select("id").collect().map(_.getLong(0)).toSet)
    assert(perShard.map(_.size).sum === 500) // disjoint
    assert(perShard.reduce(_ ++ _).size === 500) // cover
    // assignment on disk matches the pure-function assignment
    val disk = back.select($"id", $"shard".cast("long")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val pure = docs.select($"id", Shards.shardId($"id", 4).as("s")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(disk === pure)
  }

  test("readShard prunes to the shard's directory partition") {
    val path = tmpDir("shardprune") + "/out"
    Shards.writeShards(docs, "id", 4, path)
    val p = Shards.readShard(spark, path, 2).queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(shard"), p)
  }
}
