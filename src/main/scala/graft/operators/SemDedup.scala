package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Vectors

/** SemDeDup — semantic deduplication over an embedding column (Abbas et
  * al. 2023, "SemDeDup: Data-efficient learning at web-scale through
  * semantic deduplication", arXiv:2303.09540).
  *
  * Pipeline: k-means-cluster the embedding space with the SAME [[Ivf]]
  * coarse quantizer the ANN index trains (one model serves both), then
  * compare vectors only WITHIN their cluster and mark as a semantic
  * duplicate every member whose cosine to an earlier-priority member of
  * its cluster exceeds `tau`. Keep priority is ascending
  * cosine-to-own-centroid: from each duplicate group the survivor is the
  * example LEAST similar to the centroid — the paper's choice, because
  * fringe examples carry more diversity than the ball around the
  * centroid.
  *
  * The duplicate test joins each member against ALL earlier-ranked
  * members (one equi-keyed self-join), not the sequential "kept set only"
  * recurrence — that recurrence is an inherently ordered per-cluster
  * scan a distributed plan cannot express without a per-cluster
  * single-task loop. The one-join form removes at most the transitive
  * chains on top, which the paper's ε-ball grouping removes anyway, and
  * it is deterministic and shuffle-bounded.
  *
  * 100 TB posture: clustering bounds the candidate space — with
  * k ∝ corpus / cell_target the per-cell pair volume stays constant as
  * the corpus grows, the pair join is equi-keyed on `centroid_id` (no
  * cartesian), and the whole plan is two bounded shuffles (the
  * rank-within-cell window + the cell-keyed pair join). The k × dim
  * centroid model is driver-resident by design, exactly like [[Ivf]].
  */
object SemDedup {

  /** Classify every row: (idCol, cid, dup). `dup = true` means the row's
    * cosine to some same-cluster member with lower keep-rank exceeds
    * `tau`; downstream keeps `dup = false` rows.
    */
  def markDuplicates(df: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]], tau: Double): DataFrame = {
    val sp = df.sparkSession
    import sp.implicits._
    val v = col(vecCol)
    // Assignment is the row-based path ([[Ivf.assignByJoin]]) because
    // SemDeDup's k SCALES with the corpus (k ∝ n / cell_target keeps
    // per-cell pair volume constant) — a literal-array assign at k in
    // the hundreds would blow generated-code limits. Cosine to own
    // centroid comes from a broadcast join against the same k-row
    // centroid model; the centroid norm is a driver-side Scala left
    // fold — the same sequence of IEEE ops as the oracle's
    // sqrt(list_sum(...)) — so csim is bit-identical cross-engine and
    // safe to RANK on (it is never emitted).
    val cents = broadcast(centroids.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toSeq, math.sqrt(c.map(x => x * x).sum)) }
      .toDF("centroid_id", "__cv", "__cn"))
    val csim = Vectors.dot(v, col("__cv")) / (sqrt(Vectors.dot(v, v)) * col("__cn"))
    val ranked = Ivf.assignByJoin(df, idCol, vecCol, centroids)
      .join(cents, "centroid_id")
      .withColumn("__csim", csim)
      .drop("__cv", "__cn")
      .withColumn("__rk", row_number().over(
        Window.partitionBy("centroid_id").orderBy(col("__csim"), col(idCol))))
    val a = ranked.select(col("centroid_id"), col(vecCol).as("__va"), col("__rk").as("__rka"))
    val b = ranked.select(col("centroid_id"), col(idCol).as("__idb"),
      col(vecCol).as("__vb"), col("__rk").as("__rkb"))
    val dups = a.join(b, Seq("centroid_id"))
      .filter(col("__rka") < col("__rkb"))
      .filter(Vectors.dot(col("__va"), col("__vb")) /
        (sqrt(Vectors.dot(col("__va"), col("__va"))) *
          sqrt(Vectors.dot(col("__vb"), col("__vb")))) > tau)
      .select(col("__idb").as(idCol)).distinct()
    ranked.join(dups.withColumn("__d", lit(true)), Seq(idCol), "left")
      .select(col(idCol), col("centroid_id").as("cid"),
        coalesce(col("__d"), lit(false)).as("dup"))
  }
}
