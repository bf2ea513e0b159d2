package graft.operators

import graft.SparkSpec

/** Large-star/small-star connected components. */
class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def labelsOf(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components.componentLabels(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two components + a chain label with their minimum id") {
    // chain 1-2-3-4 (diameter 3, exercises multi-round contraction) and
    // triangle 10-11-12
    val labels = labelsOf(Seq((2L, 1L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L), (10L, 12L)))
    assert(labels === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("long path graph converges (logarithmic rounds, not diameter)") {
    // path 0-1-2-…-200: naive min-propagation needs 200 rounds; the
    // star-contraction bound is O(log n) — maxIter 25 must be plenty
    val edges = (0L until 200L).map(i => (i, i + 1))
    val labels = labelsOf(edges)
    assert(labels.size === 201 && labels.values.forall(_ === 0L))
  }

  test("duplicate and reversed edges, self-loops, are harmless") {
    val labels = labelsOf(Seq((1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L)))
    assert(labels === Map(1L -> 1L, 2L -> 1L)) // 3's self-loop is no edge
  }

  test("clusters labels every vertex; singletons label themselves") {
    val vertices = (1L to 6L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (5L, 6L)).toDF("id_a", "id_b")
    val out = Components.clusters(vertices, "doc_id", pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 4L, 5L -> 5L, 6L -> 5L))
  }

  test("empty edge list: all vertices are singletons") {
    val vertices = (1L to 3L).toDF("doc_id")
    val pairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val out = Components.clusters(vertices, "doc_id", pairs, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("labels are partitioning-invariant (shuffle order cannot change the fixpoint)") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L), (3L, 4L), (4L, 5L))
    val expected = labelsOf(edges)
    for (parts <- Seq(1, 3, 7)) {
      val got = Components.componentLabels(
        edges.toDF("a", "b").repartition(parts), "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected, s"parts=$parts")
    }
  }

  test("reliable-checkpoint mode produces identical labels to localCheckpoint mode") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (12L, 12L),
      (20L, 21L), (21L, 22L), (22L, 20L)).toDF("a", "b")
    val local = Components.componentLabels(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val reliable = Components.componentLabels(edges, "a", "b",
      checkpointDir = Some(tmpDir("ccckpt")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reliable === local)
  }

  test("agrees with a driver-side union-find on a random graph") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(120)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter { case (a, b) => a != b }
    // reference union-find
    val parent = scala.collection.mutable.Map((0L until 60L).map(i => i -> i): _*)
    def find(x: Long): Long = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
    edges.foreach { case (a, b) => parent(find(a)) = find(b) }
    val want = (0L until 60L).groupBy(find).flatMap { case (_, m) =>
      val lab = m.min; m.map(_ -> lab)
    }
    val got = Components.clusters((0L until 60L).toDF("id"), "id",
      edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
  }
}
