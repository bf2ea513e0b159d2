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

  test("binPack: deterministic FFD, loads bounded by target, oversize isolated") {
    val files = (1 to 30).map(i => (s"f$i", (i * 97L) % 50 + 10))
    val assign = Shards.binPack(files, target = 100)
    assert(assign === Shards.binPack(files.reverse, target = 100)) // order-free
    val loads = files.groupBy { case (n, _) => assign(n) }
      .map { case (b, fs) => b -> fs.map(_._2).sum }
    assert(loads.values.forall(_ <= 100), loads.toString)
    // a file bigger than the target gets a bin of its own
    val big = Shards.binPack(Seq(("huge", 500L), ("a", 40L), ("b", 50L)), 100)
    assert(Seq("a", "b").forall(n => big(n) != big("huge")))
  }

  test("compact: 48 small files re-pack into few ~target packs, content intact") {
    import spark.implicits._
    val base = tmpDir("compact")
    val in = s"$base/small"; val out = s"$base/packed"
    val rows = (1L to 2000L).map(i => (i, ("x" * 64) + i)).toDF("id", "text")
    rows.repartition(48).write.mode("overwrite").parquet(in)
    def parquetFiles(p: String) = new java.io.File(p).listFiles()
      .filter(f => f.isFile && f.getName.endsWith(".parquet"))
    val inFiles = parquetFiles(in)
    val target = 16 * 1024L
    val nPacks = Shards.compact(spark, in, out, target)
    // many small files became few packs, one file per pack directory
    assert(nPacks < inFiles.length, s"$nPacks packs from ${inFiles.length} files")
    val packDirs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("pack_id="))
    assert(packDirs.length === nPacks)
    packDirs.foreach(dir => assert(parquetFiles(dir.toString).length === 1, dir))
    // size envelope: each pack's summed INPUT bytes ≤ target (no input
    // file here exceeds the target, so no oversize singleton bins)
    val sizeOf = inFiles.map(f => f.getName -> f.length).toMap
    assert(sizeOf.values.forall(_ <= target), "test premise: small inputs")
    val packOf = Shards.binPack(sizeOf.toSeq, target)
    val loads = sizeOf.groupBy { case (n, _) => packOf(n) }.values.map(_.values.sum)
    assert(loads.forall(_ <= target), loads.toString)
    // content preservation, schema intact (plus the pack_id partition col)
    val back = spark.read.parquet(out)
    assert(back.columns.toSet === Set("id", "text", "pack_id"))
    val a = rows.collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val b = back.select("id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(a.toSeq === b.toSeq)
  }

  test("readShard prunes to the shard's directory partition") {
    val path = tmpDir("shardprune") + "/out"
    Shards.writeShards(docs, "id", 4, path)
    val p = Shards.readShard(spark, path, 2).queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(shard"), p)
  }
}
