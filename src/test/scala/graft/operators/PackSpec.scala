package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Concat-and-chunk sequence packing: hand-checked bin math, shard
  * locality, and partitioning invariance (the 100 TB property: the
  * assignment is a pure function of the rows, never of the layout).
  */
class PackSpec extends SparkSpec {
  import spark.implicits._

  test("bins follow the shard-local exclusive running sum") {
    val docs = Seq((1L, 1000L), (2L, 1000L), (3L, 1000L))
      .toDF("doc_id", "n_tokens")
    // nShards = 1 → one shard, pure sequential packing at budget 1500:
    // first-token offsets 0, 1000, 2000 → bins 0, 0, 1
    val p = Pack.packSequences(docs, "doc_id", "n_tokens", 1500L, 1)
      .orderBy("doc_id")
      .select("bin", "bin_offset").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(p === Array((0L, 0L), (0L, 1000L), (1L, 500L)))
  }

  test("packSequencesBy with the md5 shard column equals packSequences (one packing definition)") {
    val docs = (1L to 40L).map(i => (i, 100L + i)).toDF("doc_id", "n_tokens")
    val viaBy = Pack.packSequencesBy(
        docs.withColumn("shard", Shards.shardId(col("doc_id"), 4)),
        "doc_id", "n_tokens", 1024L)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val direct = Pack.packSequences(docs, "doc_id", "n_tokens", 1024L, 4)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(viaBy === direct)
    // a caller-supplied id-range shard localizes as promised: packing is
    // shard-local, so rows of one shard are unaffected by the others
    val custom = Pack.packSequencesBy(
        docs.withColumn("shard", col("doc_id") % 2),
        "doc_id", "n_tokens", 1024L)
    val solo = Pack.packSequencesBy(
        docs.filter(col("doc_id") % 2 === 1).withColumn("shard", col("doc_id") % 2),
        "doc_id", "n_tokens", 1024L)
    assert(custom.filter(col("shard") === 1).orderBy("doc_id")
      .collect().map(_.toSeq).toSeq ===
      solo.orderBy("doc_id").collect().map(_.toSeq).toSeq)
  }

  test("binStats reports per-bin doc and token totals") {
    val docs = Seq((1L, 1000L), (2L, 1000L), (3L, 1000L))
      .toDF("doc_id", "n_tokens")
    val stats = Pack.binStats(
      Pack.packSequences(docs, "doc_id", "n_tokens", 1500L, 1), "n_tokens")
      .orderBy("bin").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(stats === Array((0L, 2L, 2000L), (1L, 1L, 1000L)))
  }

  test("assignment is invariant under input partitioning") {
    val docs = (1L to 200L).map(i => (i, 100L + i)).toDF("doc_id", "n_tokens")
    def run(df: org.apache.spark.sql.DataFrame) =
      Pack.packSequences(df, "doc_id", "n_tokens", 2048L, 4)
        .select("doc_id", "shard", "bin", "bin_offset")
        .orderBy("doc_id").collect().toSeq
    assert(run(docs) === run(docs.repartition(13)))
    // shards actually spread (md5 uniformity on 200 keys)
    val nShards = Pack.packSequences(docs, "doc_id", "n_tokens", 2048L, 4)
      .select(countDistinct(col("shard"))).collect().head.getLong(0)
    assert(nShards === 4L)
  }

  test("epochOrder: each epoch is a fresh permutation of the same bin set") {
    val docs = (1L to 200L).map(i => (i, 100L + i)).toDF("doc_id", "n_tokens")
    val bins = Pack.binStats(
      Pack.packSequences(docs, "doc_id", "n_tokens", 1024L, 4), "n_tokens")
    val ord = Pack.epochOrder(bins, epochs = 3, workers = 4)
      .select("epoch", "worker", "pos", "shard", "bin")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val units = bins.select("shard", "bin").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    (0L to 2L).foreach { e =>
      val ep = ord.filter(_._1 == e)
      // every bin appears exactly once per epoch — a permutation
      assert(ep.map(t => (t._4, t._5)).toSet === units)
      assert(ep.length === units.size)
      // per-worker positions are contiguous 1..n
      ep.groupBy(_._2).foreach { case (w, rows) =>
        assert(rows.map(_._3).sorted.toSeq === (1L to rows.length).toSeq,
          s"epoch $e worker $w")
      }
    }
    // epochs genuinely differ: the (worker, pos) slot of at least one
    // bin moves between any two epochs (md5 avalanche on the epoch key)
    def slots(e: Long) =
      ord.filter(_._1 == e).map(t => (t._4, t._5) -> (t._2, t._3)).toMap
    assert(slots(0L) !== slots(1L))
    assert(slots(1L) !== slots(2L))
    // determinism: a rerun reproduces the order bit-for-bit
    val again = Pack.epochOrder(bins, epochs = 3, workers = 4)
      .select("epoch", "worker", "pos", "shard", "bin")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(ord.sortBy(t => (t._1, t._2, t._3)).toSeq ===
      again.sortBy(t => (t._1, t._2, t._3)).toSeq)
  }
}
