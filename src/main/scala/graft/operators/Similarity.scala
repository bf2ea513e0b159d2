package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Vectors

/** Approximate-nearest-neighbor search over an embedding column
  * (beyond-reference north star).
  *
  * Scale design: the brute-force path is a broadcast of the (tiny) query
  * set against a map-side scored scan + TakeOrderedAndProject — no shuffle
  * of the corpus. The LSH path buckets the corpus once (deterministic
  * sign-bit hyperplanes, no fitted model to ship) so a query only scores
  * its own bucket — the 100 TB path, trading recall for a ~2^planes fanout
  * reduction. Embedding cosine near-dup pairs live in
  * [[Dedup]]-style form in the query catalog (dedup_embcos).
  */
object Similarity {

  /** Brute-force cosine top-k for one query vector (given as the row of
    * `df` with `idCol == queryId`). Exact baseline.
    */
  def topKBruteForce(df: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int = 10): DataFrame = {
    val qv = df.filter(col(idCol) === queryId)
      .select(col(vecCol).as("__qv"))
    val v = col(vecCol)
    df.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(qv))
      .select(col(idCol),
        (Vectors.dot(v, col("__qv")) / (Vectors.norm(v) * Vectors.norm(col("__qv"))))
          .as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Corpus bucketing for the ANN scale path: one pass, adds `bucket`. */
  def withLshBuckets(df: DataFrame, vecCol: String, planes: Int = 4): DataFrame =
    df.withColumn("bucket", Vectors.lshBucket(Vectors.toDouble(col(vecCol)), planes))

  /** LSH-bucketed ANN: score only vectors sharing the query's bucket.
    * Approximate — recall depends on `planes` (fewer planes → bigger
    * buckets → higher recall, more work).
    */
  def topKLsh(df: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int = 10, planes: Int = 4): DataFrame = {
    val bucketed = withLshBuckets(df, vecCol, planes)
    val qv = bucketed.filter(col(idCol) === queryId)
      .select(col(vecCol).as("__qv"), col("bucket").as("__qb"))
    val v = col(vecCol)
    bucketed.filter(col(idCol) =!= queryId)
      .join(broadcast(qv), col("bucket") === col("__qb"))
      .select(col(idCol),
        (Vectors.dot(v, col("__qv")) / (Vectors.norm(v) * Vectors.norm(col("__qv"))))
          .as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }
}
