package graft.operators

import graft.SparkSpec

/** IVF-Flat: k-means training, cell assignment, probed search. */
class IvfSpec extends SparkSpec {

  // two well-separated clusters around (10,0) and (0,10)
  private lazy val vecs = {
    import spark.implicits._
    val a = (0 until 20).map(i => (i.toLong, Array(10f + i % 3, (i % 5) * 0.1f)))
    val b = (20 until 40).map(i => (i.toLong, Array((i % 5) * 0.1f, 10f + i % 3)))
    (a ++ b).toDF("vec_id", "embedding")
  }

  test("k-means separates the two clusters") {
    val cs = Ivf.train(vecs, "vec_id", "embedding", k = 2, iters = 4)
    val assigned = Ivf.assign(vecs, "embedding", cs)
      .select("vec_id", "centroid_id").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val cellsA = (0L until 20L).map(assigned).toSet
    val cellsB = (20L until 40L).map(assigned).toSet
    assert(cellsA.size === 1 && cellsB.size === 1 && cellsA != cellsB)
  }

  test("probed search finds in-cluster neighbors; nprobe=all equals brute force") {
    val cs = Ivf.train(vecs, "vec_id", "embedding", k = 2, iters = 4)
    val ivf1 = Ivf.search(vecs, "vec_id", "embedding", cs, queryId = 0L,
      k = 5, nprobe = 1).collect().map(_.getLong(0))
    assert(ivf1.forall(_ < 20L)) // cluster-local
    val ivfAll = Ivf.search(vecs, "vec_id", "embedding", cs, queryId = 0L,
      k = 5, nprobe = 2).collect().map(_.getLong(0))
    val brute = Similarity.topKBruteForce(vecs, "vec_id", "embedding", 0L, 5)
      .collect().map(_.getLong(0))
    assert(ivfAll === brute)
  }

  test("assignScoresByJoin matches assign's cells and the closed-form score") {
    val cs = Ivf.train(vecs, "vec_id", "embedding", k = 2, iters = 4)
    val literal = Ivf.assign(vecs, "embedding", cs)
      .select("vec_id", "centroid_id").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = Ivf.assignScoresByJoin(vecs, "vec_id", "embedding", cs).collect()
    assert(rows.length === 40)
    val raw = vecs.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    rows.foreach { r =>
      val (id, cid, s) = (r.getLong(0), r.getInt(1), r.getDouble(2))
      assert(cid === literal(id), s"cell mismatch for $id")
      // score = 2·dot(v,c) − |v|² − |c|², same left-to-right fold
      val v = raw(id); val c = cs(cid)
      val dot = v.zip(c).map { case (a, b) => a * b }.sum
      val expected = dot * 2 - v.map(x => x * x).sum - c.map(x => x * x).sum
      assert(s === expected, s"score mismatch for $id")
    }
  }
}
