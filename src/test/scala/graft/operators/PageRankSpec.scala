package graft.operators

import graft.SparkSpec

/** Integer-exact PageRank: hand-computed fixed points and iteration
  * values, dangling/isolated behavior, and partitioning invariance (the
  * reason the arithmetic is integer in the first place).
  */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def ranksOf(nodes: Seq[Long], edges: Seq[(Long, Long)], iters: Int) = {
    val n = nodes.toDF("id")
    val e = edges.toDF("s", "t")
    PageRank.ranks(n, "id", e, "s", "t", iters = iters)
      .orderBy("id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("a symmetric pair is a fixed point at the unit rank") {
    // deg 1 each: pr = 150000 + 85% of 1000000 = 1000000 every round
    val pr = ranksOf(Seq(1L, 2L), Seq((1L, 2L), (2L, 1L)), iters = 3)
    assert(pr === Map(1L -> 1000000L, 2L -> 1000000L))
  }

  test("star graph matches the hand-unrolled integer recurrence") {
    // center 1 — leaves 2, 3 (symmetrized edges), two rounds:
    // r1: leaves get 1e6 div 2 = 5e5 → 150000 + 425000 = 575000;
    //     center gets 1e6 + 1e6 → 150000 + 1700000 = 1850000
    // r2: leaves: 1850000 div 2 = 925000 → 150000 + 786250 = 936250;
    //     center: 575000·2 = 1150000 → 150000 + 977500 = 1127500
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L))
    assert(ranksOf(Seq(1L, 2L, 3L), edges, iters = 1) ===
      Map(1L -> 1850000L, 2L -> 575000L, 3L -> 575000L))
    assert(ranksOf(Seq(1L, 2L, 3L), edges, iters = 2) ===
      Map(1L -> 1127500L, 2L -> 936250L, 3L -> 936250L))
  }

  test("isolated nodes settle at the damping base") {
    val pr = ranksOf(Seq(1L, 2L, 9L), Seq((1L, 2L), (2L, 1L)), iters = 2)
    assert(pr(9L) === 150000L)
  }

  test("ranks are invariant under edge partitioning") {
    val nodes = (1L to 50L).toDF("id")
    val edges = (1L until 50L).flatMap(i => Seq((i, i + 1), (i + 1, i)))
    val e = edges.toDF("s", "t")
    def run(df: org.apache.spark.sql.DataFrame) =
      PageRank.ranks(nodes, "id", df, "s", "t", iters = 3)
        .orderBy("id").collect().map(_.getLong(1)).toSeq
    assert(run(e) === run(e.repartition(17)))
  }
}
