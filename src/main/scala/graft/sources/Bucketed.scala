package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed storage for co-located joins (the 100 TB join strategy).
  *
  * A fact⋈fact join (e.g. tweets ⋈ per-user aggregates, or curated tweets
  * ⋈ retweet assemblies) shuffles both sides on every query. Writing both
  * tables bucketed by the join key makes the join map-side: Spark reads
  * matching buckets pairwise — zero Exchange in the physical plan
  * (asserted in BucketedSpec). Bucket count is the scale knob: pick
  * ~(total size / healthy partition size); it must match on both sides.
  *
  * Bucketing requires the table catalog (saveAsTable), not bare parquet
  * paths — bucket metadata lives in the metastore.
  */
object Bucketed {

  /** Write `df` as a bucketed, sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, overwrite: Boolean = true): Unit = {
    val w = df.write
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
    (if (overwrite) w.mode("overwrite") else w).saveAsTable(table)
  }

  /** Co-located equi-join of two tables previously written with
    * [[writeBucketed]] on the same key and bucket count.
    */
  def colocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
