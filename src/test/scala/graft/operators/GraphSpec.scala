package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def counts(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Graph.triangleCounts(edges.toDF("s", "t"), "s", "t")
      .as[(Long, Long)].collect().toMap

  test("a single triangle credits each of its three vertices once") {
    assert(counts(Seq((1L, 2L), (2L, 3L), (1L, 3L))) ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("K4 has four triangles; every vertex sits in three of them") {
    val k4 = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    assert(counts(k4) === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("paths and stars are triangle-free (hub does not inflate)") {
    assert(counts(Seq((1L, 2L), (2L, 3L), (3L, 4L))) === Map.empty)
    // star: hub 9 with 5 leaves — many wedges, zero triangles
    assert(counts((1L to 5L).map(l => (9L, l))) === Map.empty)
  }

  test("raw input is canonicalized: direction, duplicates, self-loops") {
    val messy = Seq((2L, 1L), (1L, 2L), (2L, 3L), (3L, 2L), (1L, 3L),
      (3L, 3L), (1L, 3L))
    assert(counts(messy) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("each triangle is generated exactly once (two sharing an edge)") {
    // triangles (1,2,3) and (2,3,4) share edge {2,3}
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 4L), (3L, 4L))
    assert(counts(edges) === Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
  }

  test("matches a brute-force oracle on a seeded random graph") {
    val rnd = new scala.util.Random(42)
    val n = 30
    val edges = (for (i <- 1L to n; j <- (i + 1) to n if rnd.nextInt(5) == 0)
      yield (i, j)).toSeq
    val es = edges.toSet
    val brute = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      (a, b) <- edges
      c <- (b + 1) to n
      if es.contains((a, c)) && es.contains((b, c))
    } { brute(a) += 1; brute(b) += 1; brute(c) += 1 }
    assert(counts(edges) === brute.toMap)
  }

  test("plan is all equi-joins: no cartesian product anywhere") {
    val plan = Graph.triangleCounts(Seq((1L, 2L)).toDF("s", "t"), "s", "t")
      .queryExecution.optimizedPlan.toString.toLowerCase
    assert(!plan.contains("cartesian"), plan)
  }
}
