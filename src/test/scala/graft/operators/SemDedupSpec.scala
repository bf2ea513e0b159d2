package graft.operators

import graft.SparkSpec

/** SemDeDup semantic dedup: cluster-scoped duplicate marking with
  * least-similar-to-centroid keep priority.
  */
class SemDedupSpec extends SparkSpec {

  // Two well-separated direction clusters. Ids 0 and 1 land one per
  // cluster so the deterministic k-means init (first k vectors by id)
  // seeds both. Inside cluster A, vectors {0,2,3} are near-identical
  // (cos ≈ 1) while 4/5 point elsewhere; cluster B's {1,20} duplicate
  // each other and 21 is distinct.
  private lazy val vecs = {
    import spark.implicits._
    Seq(
      0L  -> Array(10f, 0f, 0.0f),
      1L  -> Array(0f, 10f, 0f),
      2L  -> Array(10f, 0f, 0.1f),
      3L  -> Array(10f, 0f, 0.2f),
      4L  -> Array(10f, 4f, 0f),
      5L  -> Array(10f, 0f, 4f),
      20L -> Array(0f, 10f, 0.1f),
      21L -> Array(0f, 10f, 4f)
    ).toDF("vec_id", "embedding")
  }

  private lazy val cents = Ivf.train(vecs, "vec_id", "embedding", k = 2, iters = 4)

  private def marks(tau: Double): Map[Long, Boolean] =
    SemDedup.markDuplicates(vecs, "vec_id", "embedding", cents, tau)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap

  test("near-identical in-cluster members are marked, one survivor per group") {
    val marked = marks(tau = 0.99)
    // group {0,2,3}: exactly one survivor; group {1,20}: one survivor
    assert(Seq(0L, 2L, 3L).count(!marked(_)) === 1)
    assert(Seq(1L, 20L).count(!marked(_)) === 1)
    // the distinct-direction vectors survive everywhere
    assert(!marked(4L) && !marked(5L) && !marked(21L))
  }

  test("survivor is the group member least similar to its centroid") {
    val marked = marks(tau = 0.99)
    def cos(v: Array[Float], cc: Array[Double]): Double = {
      val dot = v.zip(cc).map { case (a, b) => a * b }.sum
      dot / (math.sqrt(v.map(x => x.toDouble * x).sum) * math.sqrt(cc.map(x => x * x).sum))
    }
    val groupA = Seq(0L -> Array(10f, 0f, 0f), 2L -> Array(10f, 0f, 0.1f), 3L -> Array(10f, 0f, 0.2f))
    val cA = cents.maxBy(cc => cos(Array(10f, 0f, 0f), cc)) // cluster A's centroid
    val expectedSurvivor = groupA.minBy { case (id, v) => (cos(v, cA), id) }._1
    assert(!marked(expectedSurvivor))
  }

  test("tau above every pair cosine marks nothing; all rows classified") {
    val marked = SemDedup.markDuplicates(vecs, "vec_id", "embedding", cents, tau = 1.1)
      .collect()
    assert(marked.forall(!_.getBoolean(2)))
    assert(marked.length === 8)
  }

  test("duplicate test never crosses clusters") {
    // vectors 5 (cluster A, z-heavy) and 21 (cluster B, z-heavy) are the
    // most similar CROSS-cluster pair (cos ≈ 0.14) — never compared
    // because candidates are cluster-scoped; both survive.
    val marked = marks(tau = 0.1)
    assert(!marked(5L) || !marked(21L)) // at least one survives its own cluster
    val markedHigh = marks(tau = 0.999)
    assert(!markedHigh(5L) && !markedHigh(21L))
  }
}
