package graft

import org.apache.spark.sql.functions._

import graft.operators._

/** End-to-end curation pipeline: the operators compose the way a real
  * training-data job chains them — candidate pairs → duplicate clusters →
  * canonical keep-list → quality/sample gates → context chunks → shards.
  * Asserts cross-stage invariants, not just per-operator behavior.
  */
class PipelineSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("dedup → cluster → keep-list → sample → chunk → shard composes") {
    val docs = Tables.documents(spark, sf)
    val nDocs = docs.count()

    // 1. near-dup candidate pairs → duplicate clusters
    val pairs = Dedup.lshCandidatePairs(docs, "doc_id", "text", 4, 2)
    val clusters = Components.clusters(docs, "doc_id", pairs, "id_a", "id_b")
      .localCheckpoint()
    assert(clusters.count() === nDocs, "every doc gets a cluster label")

    // 2. canonical keep-list: one doc per cluster (the min id)
    val keep = clusters.filter(col("doc_id") === col("cluster_id"))
    val nKeep = keep.count()
    assert(nKeep === clusters.select("cluster_id").distinct().count())
    assert(nKeep <= nDocs)

    // 3. kept docs → deterministic 50% sample
    val kept = docs.join(keep.select("doc_id"), "doc_id")
    val sampled = Sampling.bernoulli(kept, "doc_id", 0.5).localCheckpoint()
    val nSampled = sampled.count()
    assert(nSampled > 0 && nSampled < nKeep)

    // 4. chunks: every sampled doc emits ≥1 chunk; chunk tokens ≤ size
    val chunks = Chunk.chunkTokens(sampled, "doc_id", "text", size = 40, stride = 30)
    assert(chunks.select("doc_id").distinct().count() === nSampled)
    val maxTokens = chunks
      .select(size(split(col("chunk"), " ")).as("n"))
      .agg(max("n")).collect().head.getInt(0)
    assert(maxTokens <= 40)

    // 5. shards partition the chunks deterministically
    val outPath = tmpDir("pipeshards") + "/shards"
    Shards.writeShards(chunks, "doc_id", 4, outPath)
    val back = spark.read.parquet(outPath)
    assert(back.count() === chunks.count())
    // a doc's chunks all land in the same shard (keyed by doc_id)
    val multiShardDocs = back.groupBy("doc_id")
      .agg(countDistinct("shard").as("ns"))
      .filter(col("ns") > 1).count()
    assert(multiShardDocs === 0)
  }

  test("decontamination composes with the keep-list") {
    val docs = Tables.documents(spark, sf)
    val bench = docs.filter(col("doc_id") < 5)
    val corpus = docs.filter(col("doc_id") >= 5)
    val flagged = Dedup.contaminated(corpus, bench, "doc_id", "text", minShared = 3)
      .select("doc_id")
    val clean = corpus.join(flagged, Seq("doc_id"), "left_anti")
    assert(clean.count() + flagged.count() === corpus.count())
    // flagged docs really do share ≥3 shingles — re-verify one against bench
    val one = flagged.limit(1).collect()
    if (one.nonEmpty) {
      val id = one.head.getLong(0)
      val docSh = Dedup.shingleRows(corpus.filter(col("doc_id") === id), "doc_id", "text")
        .select("sh").distinct().collect().map(_.getString(0)).toSet
      val benchSh = Dedup.shingleRows(bench, "doc_id", "text")
        .select("sh").distinct().collect().map(_.getString(0)).toSet
      assert(docSh.intersect(benchSh).size >= 3)
    }
  }
}
