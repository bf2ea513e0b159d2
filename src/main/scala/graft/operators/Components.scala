package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over a candidate-pair edge list —
  * the clustering step of a dedup pipeline (LSH/SimHash pairs → duplicate
  * clusters → one canonical doc per cluster).
  *
  * Algorithm: alternating large-star / small-star contraction (Kiveris et
  * al., "Connected Components in MapReduce and Beyond", SoCC 2014).
  * Each round is two shuffle-bounded DataFrame jobs on compact (id, id)
  * edges; the edge graph contracts toward star graphs rooted at each
  * component's minimum id in O(log n) rounds REGARDLESS of graph
  * diameter — unlike naive min-label propagation, which needs
  * O(diameter) rounds and dies on chain-shaped duplicate clusters
  * (document A ~ B ~ C ~ … is exactly how near-dup chains look).
  *
  * Scale notes (100 TB):
  *  - no driver-side graph state: the only driver values are the
  *    per-round convergence checksum (2 longs);
  *  - each round's output is materialized to cut lineage (star
  *    contraction is iterative, lineage grows per round):
  *    `localCheckpoint` by default, or reliable `checkpoint` when a
  *    `checkpointDir` is passed — the executor-loss-safe cluster mode;
  *  - skew: the root of a huge component accumulates its members'
  *    edges; large-star emits (v, min) keyed by v — fan-in is bounded
  *    by each node's degree, not component size, which is the point of
  *    the two-phase scheme.
  */
object Components {

  // Both stars use a whole-partition window min instead of
  // groupBy+self-join: the per-node min and the per-edge emit come out of
  // ONE exchange on u (a groupBy+join recomputes and re-shuffles the edge
  // set for each side — measured ~7 exchanges/round vs 4 here). The
  // terminal distinct per star is load-bearing: without it duplicate
  // edges multiply through the next round's fan-out (measured 3× slower).

  private def largeStar(e: DataFrame): DataFrame = {
    // neighborhoods of u over symmetrized edges; emit (v, min(N⁺(u)))
    // for neighbors v > u
    val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
    val wn = org.apache.spark.sql.expressions.Window.partitionBy("u")
    sym.withColumn("mn", min("v").over(wn))
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), least(col("mn"), col("u")).as("v"))
      .distinct()
  }

  private def smallStar(e: DataFrame): DataFrame = {
    // point edges large→small; emit (v, min(N(u))) for all v in N(u),
    // plus (u, min(N(u))) — both from one windowed pass via a 2-way
    // explode, self-loops dropped
    val dir = e.select(greatest("u", "v").as("u"), least("u", "v").as("v"))
      .filter(col("u") =!= col("v"))
    val wn = org.apache.spark.sql.expressions.Window.partitionBy("u")
    dir.withColumn("m", min("v").over(wn))
      .select(explode(array(
        struct(col("v").as("u"), col("m").as("v")),
        struct(col("u"), col("m").as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** Per-round materialization: `localCheckpoint` by default (fast, but
    * blocks die with their executor), or RELIABLE `checkpoint` into
    * `checkpointDir` when provided — the cluster-grade option: round
    * outputs go to fault-tolerant storage (HDFS/object store), so an
    * executor loss mid-iteration recomputes from the last round, not from
    * the raw edge scan through an unbounded lineage. Lazy in both modes:
    * the caller's next action doubles as the materialization pass.
    */
  private def materialize(df: DataFrame, checkpointDir: Option[String]): DataFrame =
    checkpointDir match {
      case Some(dir) =>
        df.sparkSession.sparkContext.setCheckpointDir(dir)
        df.checkpoint(eager = false)
      case None => df.localCheckpoint(eager = false)
    }

  /** Component labels for an undirected edge list: one row per node that
    * appears in `edges`, labeled with the minimum node id reachable from
    * it. Nodes absent from `edges` are absent here — see [[clusters]] for
    * the all-vertices form. Pass `checkpointDir` for reliable per-round
    * checkpointing (see [[materialize]]).
    */
  def componentLabels(edges: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 25, checkpointDir: Option[String] = None): DataFrame = {
    // convergence = identical edge set; (count, xor-of-hashes) is an
    // order-free, overflow-free exact checksum for distinct edge sets
    // (up to hash collision). One cheap agg job per round — the previous
    // round's checksum is reused, not recomputed.
    def checksum(d: DataFrame) =
      d.agg(count(lit(1)), bit_xor(xxhash64(col("u"), col("v")))).collect().head
    // lazy localCheckpoint: the checksum action doubles as the
    // materialization pass (eager checkpointing would run an extra job
    // per round just to persist)
    var e = materialize(
      edges
        .select(col(aCol).as("u"), col(bCol).as("v"))
        .filter(col("u") =!= col("v") && col("u").isNotNull && col("v").isNotNull)
        .distinct(),
      checkpointDir)
    var chk = checksum(e)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val next = materialize(smallStar(largeStar(e)), checkpointDir)
      val nextChk = checksum(next)
      converged = chk == nextChk
      chk = nextChk
      e = next
      i += 1
    }
    require(converged, s"connected components did not converge in $maxIter rounds")
    // terminal star graphs: every non-root has exactly one edge to its
    // root; roots label themselves
    val roots = e.select(col("v")).distinct()
      .join(e.select(col("u")).distinct(), col("v") === col("u"), "left_anti")
      .select(col("v").as("u"), col("v"))
    e.union(roots).select(col("u").as("id"), col("v").as("component"))
  }

  /** Every vertex labeled with its duplicate-cluster id (= min id in its
    * connected component over `pairs`); singletons label themselves.
    * This is the "assign cluster ids" stage between candidate-pair
    * generation (LSH / SimHash blocking) and canonical-doc selection.
    */
  def clusters(vertices: DataFrame, idCol: String, pairs: DataFrame,
      aCol: String, bCol: String, maxIter: Int = 25,
      checkpointDir: Option[String] = None): DataFrame = {
    val labels = componentLabels(pairs, aCol, bCol, maxIter, checkpointDir)
      .select(col("id").as("__cc_id"), col("component").as("__cc_component"))
    vertices.select(col(idCol))
      .join(labels, col(idCol) === col("__cc_id"), "left")
      .select(col(idCol), coalesce(col("__cc_component"), col(idCol)).as("cluster_id"))
  }
}
