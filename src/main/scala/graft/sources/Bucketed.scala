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

  /** Write `df` as a bucketed, sorted managed table.
    *
    * Overwrite must also clear a STALE warehouse location: a fresh
    * session's in-memory catalog doesn't know about a directory left by
    * a previous JVM, so `mode(overwrite)` would take the CREATE path and
    * refuse the existing location.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, overwrite: Boolean = true): Unit = {
    // stale-location handling lives in Warehouse.dropWithLocation
    // (shared with the partitioned ANN-index writers)
    if (overwrite) Warehouse.dropWithLocation(df.sparkSession, table)
    val w = df.write
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
    (if (overwrite) w.mode("overwrite") else w).saveAsTable(table)
    // The session-wide FileStatusCache is keyed by PATH: if any earlier
    // query read a same-named table at this location, a rewrite would
    // otherwise serve the stale file list to the next scan
    // (FAILED_READ_FILE.FILE_NOT_EXIST on the old part files).
    df.sparkSession.catalog.refreshTable(table)
  }

  /** Co-located equi-join of two tables previously written with
    * [[writeBucketed]] on the same key and bucket count.
    *
    * `merge` hints pin the sort-merge path at test scale too (AQE would
    * legitimately broadcast a small side there, hiding the zero-exchange
    * bucket-pairwise read this layout exists for — j11's rationale).
    */
  def colocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable).hint("merge")
    val r = spark.table(rightTable).hint("merge")
    l.join(r, l(leftKey) === r(rightKey))
  }
}
