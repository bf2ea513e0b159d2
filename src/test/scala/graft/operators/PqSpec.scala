package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Product quantization: codebook shapes, code determinism, and the ADC
  * pool → exact re-rank contract against the brute-force ground truth.
  */
class PqSpec extends SparkSpec {

  // 4-dim vectors in two well-separated groups so each 2-dim subspace
  // has obvious structure; 40 rows so the pool (k·poolFactor) can't
  // trivially cover everything at the default factor
  private lazy val vecs = {
    import spark.implicits._
    val a = (0 until 20).map(i =>
      (i.toLong, Array(10f + i % 3, (i % 5) * 0.1f, 5f + i % 2, 0.2f * (i % 4))))
    val b = (20 until 40).map(i =>
      (i.toLong, Array((i % 5) * 0.1f, 10f + i % 3, 0.2f * (i % 4), 5f + i % 2)))
    (a ++ b).toDF("vec_id", "embedding")
  }

  test("train: m codebooks of k subDim-wide centroids") {
    val books = Pq.train(vecs, "vec_id", "embedding", dim = 4, m = 2, k = 2, iters = 2)
    assert(books.length === 2)
    books.foreach { cb =>
      assert(cb.length === 2)
      cb.foreach(c => assert(c.length === 2))
    }
  }

  test("encode: deterministic codes in [0, k), one per subspace") {
    val books = Pq.train(vecs, "vec_id", "embedding", dim = 4, m = 2, k = 2, iters = 2)
    def codes() = Pq.encode(vecs, "embedding", books)
      .select("vec_id", "code0", "code1").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).sortBy(_._1)
    val c1 = codes()
    c1.foreach { case (id, a, b) =>
      assert(a >= 0 && a < 2 && b >= 0 && b < 2, s"id $id codes out of range")
    }
    assert(c1 === codes()) // bit-stable rerun
    // codes must discriminate the two groups in at least one subspace
    val groupA = c1.filter(_._1 < 20).map(t => (t._2, t._3)).toSet
    val groupB = c1.filter(_._1 >= 20).map(t => (t._2, t._3)).toSet
    assert(groupA.intersect(groupB).isEmpty)
  }

  test("search: exact re-rank inside the pool; full pool equals brute force") {
    val books = Pq.train(vecs, "vec_id", "embedding", dim = 4, m = 2, k = 2, iters = 2)
    // poolFactor large enough to pool EVERY candidate → the exact
    // re-rank must reproduce the brute-force top-k ordering exactly
    val all = Pq.search(vecs, "vec_id", "embedding", books, 0L, k = 5, poolFactor = 8)
      .collect().map(_.getLong(0))
    val brute = Similarity.topKBruteForce(vecs, "vec_id", "embedding", 0L, 5)
      .collect().map(_.getLong(0))
    assert(all === brute)
    // tight pool: results still come exclusively from vector space near
    // the query's group (ADC respects the coarse structure)
    val tight = Pq.search(vecs, "vec_id", "embedding", books, 0L, k = 5, poolFactor = 2)
      .collect().map(_.getLong(0))
    assert(tight.length === 5)
    assert(tight.forall(_ < 20L), s"ADC pool leaked cross-group: ${tight.mkString(",")}")
  }

  test("searchIvfPq: probing every cell equals plain PQ search; nprobe=1 stays in-cluster") {
    val coarse = Ivf.train(vecs, "vec_id", "embedding", k = 2, iters = 4)
    val books = Pq.train(vecs, "vec_id", "embedding", dim = 4, m = 2, k = 2, iters = 2)
    val all = Pq.searchIvfPq(vecs, "vec_id", "embedding", coarse, books, 0L,
      k = 5, nprobe = 2, poolFactor = 8).collect().map(_.getLong(0))
    val plain = Pq.search(vecs, "vec_id", "embedding", books, 0L,
      k = 5, poolFactor = 8).collect().map(_.getLong(0))
    assert(all === plain) // coarse gate open = pure PQ
    val one = Pq.searchIvfPq(vecs, "vec_id", "embedding", coarse, books, 0L,
      k = 5, nprobe = 1, poolFactor = 8).collect().map(_.getLong(0))
    assert(one.length === 5)
    assert(one.forall(_ < 20L), s"nprobe=1 leaked cross-cluster: ${one.mkString(",")}")
  }

  test("search recall floor on the catalog fixture (sf0.001 embeddings)") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val books = Pq.train(emb, "vec_id", "embedding", dim = 64, m = 4, k = 4, iters = 2)
    val pq = Pq.search(emb, "vec_id", "embedding", books, 0L, k = 10, poolFactor = 8)
      .collect().map(_.getLong(0)).toSet
    val brute = Similarity.topKBruteForce(emb, "vec_id", "embedding", 0L, 10)
      .collect().map(_.getLong(0)).toSet
    // ADC with a 16-byte code and an 80-candidate pool must keep most of
    // the true top-10 (empirical: 10/10 at this fixture; floor at 6
    // leaves headroom for codebook jitter without letting recall rot)
    assert(pq.intersect(brute).size >= 6,
      s"recall ${pq.intersect(brute).size}/10 below floor")
  }
}
