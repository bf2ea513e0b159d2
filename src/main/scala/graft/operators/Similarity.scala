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

  /** LSH-bucketed ANN with multi-probe: score vectors in every bucket
    * whose key is within hamming distance `probeHamming` of the query's
    * bucket (a near-neighbor that flips one marginal hyperplane sign lands
    * one bit away — probing those buckets is the standard recall fix that
    * keeps the bucketed plan). probeHamming=1 scores planes+1 of the
    * 2^planes buckets; 0 is single-bucket. The probe-key table stays tiny
    * (one row per probed bucket), so the join is a broadcast against a
    * map-side bucketed scan — no corpus shuffle, the 100 TB path.
    */
  def topKLsh(df: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int = 10, planes: Int = 4,
      probeHamming: Int = 1): DataFrame = {
    val bucketed = withLshBuckets(df, vecCol, planes)
    val qv = bucketed.filter(col(idCol) === queryId)
      .select(col(vecCol).as("__qv"), col("bucket").as("__qb"))
    val masks = (0 until (1 << planes))
      .filter(m => Integer.bitCount(m) <= probeHamming)
    val probes = qv.select(col("__qv"),
      explode(array(masks.map(m => col("__qb").bitwiseXOR(lit(m.toLong))): _*))
        .as("__pb"))
    val v = col(vecCol)
    bucketed.filter(col(idCol) =!= queryId)
      .join(broadcast(probes), col("bucket") === col("__pb"))
      .select(col(idCol),
        (Vectors.dot(v, col("__qv")) / (Vectors.norm(v) * Vectors.norm(col("__qv"))))
          .as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }
}
