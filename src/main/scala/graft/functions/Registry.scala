package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.udaf

/** SQL-surface registration for the engine's typed aggregators, so the
  * sketches compose from `spark.sql(...)` exactly like built-ins — a
  * SQL user writes `kmv_uk(u52)` or `hdr_sketch(cents)` in a GROUP BY
  * the way they'd write `approx_count_distinct`.
  *
  * Registration is per-session and idempotent (re-registering a name
  * replaces the previous binding, Spark's documented `udf.register`
  * behavior).
  */
object Registry {

  /** Fixed default parameters — SQL callers can't pass constructor args
    * to a udaf, so the registered names pin the catalog defaults
    * (subBits=7, k=64). Scala callers needing other parameters construct
    * the aggregator directly.
    */
  val HdrSubBits = 7
  val KmvK = 64

  def register(spark: SparkSession): Unit = {
    spark.udf.register("hdr_sketch", udaf(HdrSketch(HdrSubBits)))
    spark.udf.register("kmv_uk", udaf(KmvSketch(KmvK)))
    spark.udf.register("kmv_buffer", udaf(KmvBuffer(KmvK)))
    registerSql(spark)
  }

  /** Runtime twin of [[graft.plans.GraftExtensions]] for a session that
    * already exists (notebooks, the driver harness — extensions can
    * only be installed at session BUILD time): registers the same
    * scalar expression builders (`canonical_url`, `simhash16`,
    * `minhash_sig`, `qlog2_fp20`, `dot_product`) as temp functions.
    * Each call expands to the identical built-in/codegen expression
    * tree the Scala Column API produces — SQL ≡ DataFrame is pinned in
    * FingerprintsSpec. Idempotent (createOrReplace).
    */
  def registerSql(spark: SparkSession): Unit =
    graft.plans.GraftExtensions.sqlFunctions.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
