package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Integer-exact PageRank over an edge list — duplicate-graph centrality
  * for training-data curation: in a near-dup cluster, the highest-rank
  * node is the natural canonical document (most-connected variant), and
  * rank mass flags template/boilerplate families that exact dedup
  * misses.
  *
  * Ranks are parts-per-`unit` LONGS, not doubles: every step is integer
  * arithmetic (floor division for the per-edge contribution, an exact
  * integer sum, floor division for damping), so the result is
  * independent of partitioning and shuffle order and any engine
  * reproduces it bit-for-bit — a float PageRank differs in the last ulp
  * per run, which makes regression-testing 100 TB runs miserable.
  *
  * Scale: each iteration is one join + one grouped sum, both keyed by
  * node id — shuffle-bounded, no driver-side graph state; per-iteration
  * materialization cuts the growing lineage (`localCheckpoint` by
  * default, reliable `checkpoint` when `checkpointDir` is passed — the
  * executor-loss-safe cluster mode). Dangling mass (nodes with no
  * out-edges) is dropped, not redistributed — fine for symmetrized
  * similarity graphs where every connected node has out-degree ≥ 1.
  */
object PageRank {

  /** One rank row per node in `nodes`: `pr` after `iters` rounds of
    * pr(v) = (1-d)·unit + d·Σ_{u→v} pr(u) div deg(u), with d =
    * `dampingPct`/100 applied as exact integer ops. Nodes absent from
    * `edges` settle at the base (1-d)·unit after the first round.
    */
  def ranks(nodes: DataFrame, nodeCol: String, edges: DataFrame,
      srcCol: String, dstCol: String, iters: Int = 3,
      dampingPct: Int = 85, unit: Long = 1000000L,
      checkpointDir: Option[String] = None): DataFrame = {
    require(iters >= 1 && dampingPct >= 0 && dampingPct <= 100)
    def materialize(df: DataFrame): DataFrame = checkpointDir match {
      case Some(dir) =>
        df.sparkSession.sparkContext.setCheckpointDir(dir)
        df.checkpoint(eager = false)
      case None => df.localCheckpoint(eager = false)
    }
    val n = materialize(nodes.select(col(nodeCol).as("id")).distinct())
    val e = materialize(edges.select(col(srcCol).as("src"), col(dstCol).as("dst")))
    val deg = materialize(e.groupBy("src").agg(count(lit(1)).as("deg")))
    val base = unit * (100 - dampingPct) / 100
    var pr = n.withColumn("pr", lit(unit))
    (1 to iters).foreach { _ =>
      val inbound = pr
        .join(deg, col("id") === col("src"))
        .select(col("src"), expr("pr div deg").as("c"))
        .join(e, "src")
        .groupBy(col("dst"))
        .agg(sum(col("c")).as("s"))
      pr = materialize(
        n.join(inbound, col("id") === col("dst"), "left")
          .select(col("id"),
            (lit(base) + expr(s"coalesce(s, 0L) * $dampingPct div 100")).as("pr")))
    }
    pr.select(col("id").as(nodeCol), col("pr"))
  }
}
