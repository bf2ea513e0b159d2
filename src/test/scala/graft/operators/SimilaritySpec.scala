package graft.operators

import graft.SparkSpec

/** ANN search: brute-force baseline + LSH-bucketed scale path. */
class SimilaritySpec extends SparkSpec {

  private lazy val vecs = {
    import spark.implicits._
    Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.99f, 0.1f, 0.0f)),  // nearly parallel to 0
      (2L, Array(0.0f, 1.0f, 0.0f)),   // orthogonal
      (3L, Array(-1.0f, 0.0f, 0.0f)),  // opposite
      (4L, Array(0.7f, 0.7f, 0.0f)))   // 45 degrees
      .toDF("vec_id", "embedding")
  }

  test("brute-force top-k ranks by cosine similarity") {
    val got = Similarity.topKBruteForce(vecs, "vec_id", "embedding", 0L, 3)
      .collect().map(_.getLong(0))
    assert(got === Array(1L, 4L, 2L))
  }

  test("brute-force scores are true cosines") {
    val s = Similarity.topKBruteForce(vecs, "vec_id", "embedding", 0L, 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(s(2L) - 0.0) < 1e-12)
    assert(math.abs(s(3L) + 1.0) < 1e-12)
  }

  test("LSH top-k returns a ranked subset of the bucket-mates") {
    val brute = Similarity.topKBruteForce(vecs, "vec_id", "embedding", 0L, 4)
      .collect().map(_.getLong(0))
    val lsh = Similarity.topKLsh(vecs, "vec_id", "embedding", 0L, 4, planes = 2)
      .collect().map(_.getLong(0))
    assert(lsh.toSet.subsetOf(brute.toSet))
    // ranking order within the candidates must match the brute ranking order
    assert(lsh.sortBy(x => brute.indexOf(x)) === lsh)
  }

  test("ANN recall vs exact ground truth on real embeddings (sf0.001)") {
    val sf = "/root/testdata/sf0.001"
    val emb = graft.Tables.embeddings(spark, sf)
    val brute = Similarity.topKBruteForce(emb, "vec_id", "embedding", 0L, 10)
      .collect().map(_.getLong(0)).toSet
    assert(brute.size === 10)
    // catalog configs: sim_lsh_ann (planes=2, multi-probe h≤1) and
    // sim_ivf_ann (k=8, iters=2, nprobe=2). Measured recall is 9/10 and
    // 10/10; thresholds leave margin but would catch a bucketing or
    // probe regression (single-bucket LSH scored 4/10).
    val lsh = Similarity.topKLsh(emb, "vec_id", "embedding", 0L, 10, planes = 2)
      .collect().map(_.getLong(0)).toSet
    assert((lsh & brute).size >= 7, s"LSH recall ${(lsh & brute).size}/10")
    val cents = Ivf.train(emb, "vec_id", "embedding", k = 8, iters = 2)
    val ivf = Ivf.search(emb, "vec_id", "embedding", cents, 0L, k = 10, nprobe = 2)
      .collect().map(_.getLong(0)).toSet
    assert((ivf & brute).size >= 8, s"IVF recall ${(ivf & brute).size}/10")
    // IVF-SQ8: quantized first pass + full-precision rescoring must not
    // lose recall vs the probed full-precision search (the pool is 4×k,
    // so int8 ranking noise inside the pool is rescored away)
    val sq8 = Ivf.searchQuantized(emb, "vec_id", "embedding", cents, 0L, k = 10, nprobe = 2)
      .collect().map(_.getLong(0)).toSet
    assert((sq8 & ivf).size >= 9, s"SQ8 vs IVF overlap ${(sq8 & ivf).size}/10")
    assert((sq8 & brute).size >= 8, s"SQ8 recall ${(sq8 & brute).size}/10")
  }

  test("bucketing is stable: same vector → same bucket") {
    val b = Similarity.withLshBuckets(vecs.union(vecs), "embedding", 4)
      .groupBy("vec_id").agg(org.apache.spark.sql.functions.countDistinct("bucket").as("nb"))
      .collect().map(_.getLong(1))
    assert(b.forall(_ === 1L))
  }
}
