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

  test("bucketing is stable: same vector → same bucket") {
    val b = Similarity.withLshBuckets(vecs.union(vecs), "embedding", 4)
      .groupBy("vec_id").agg(org.apache.spark.sql.functions.countDistinct("bucket").as("nb"))
      .collect().map(_.getLong(1))
    assert(b.forall(_ === 1L))
  }
}
